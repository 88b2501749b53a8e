"""Argument-layout harmonization utilities.

XLA assigns its own entry layouts to compiled programs (auto layout
assignment), and jax dispatch relayouts ANY argument whose on-device layout
differs from the compiled layout on EVERY call. At DrivAerML scale the
difference is dramatic: at 2M nodes XLA picks transposed/tiled layouts for
the big point/slot arrays and the per-call relayout dominated the train step
(measured 11.7s/step vs 2.48s harmonized on v5e; see bench.py). The fix is
to place arguments in the compiled layouts ONCE (static data) or at
host-to-device transfer time (streamed batches) via
``compiled.input_formats``.

No reference counterpart: torch/CUDA tensors have no compiler-assigned
layouts; this is TPU/XLA-specific machinery.
"""
from __future__ import annotations

import jax

__all__ = ["put_to_formats"]


def put_to_formats(tree, formats):
    """``jax.device_put(tree, formats)``, but per-leaf, sequential, and
    deduplicated by buffer identity.

    Tree-level ``device_put`` has two failure modes for large inputs (both
    hit at 8M nodes in bench.py):

    - leaves that SHARE a buffer (e.g. encoder and decoder edge slots built
      from the same arrays) are relayouted into two separate copies,
      inflating HBM;
    - all relayouted copies are materialized before any source can be freed,
      doubling the transient footprint (``donate=True`` is NOT safe here —
      it frees a shared buffer while the second leaf's copy still reads it,
      surfacing as an async INVALID_ARGUMENT).

    Per-leaf puts with an id-dedup cache keep shared leaves shared and bound
    the transient to one leaf at a time.
    """
    flat, treedef = jax.tree.flatten(tree)
    fmt_flat = jax.tree.leaves(formats)
    if len(flat) != len(fmt_flat):
        raise ValueError(
            f"tree/format leaf mismatch: {len(flat)} vs {len(fmt_flat)}"
        )
    cache: dict = {}
    new_flat = []
    for i, f in enumerate(fmt_flat):
        x, flat[i] = flat[i], None
        # key by (buffer identity, target format): two leaves sharing a
        # buffer stay shared ONLY when the program wants them in the same
        # layout — reusing across differing formats would hand the program a
        # mislaid argument (relayouted again on every call, silently undoing
        # the harmonization)
        try:
            key = (id(x), f)
            y = cache.get(key)
        except TypeError:  # unhashable format spec
            key, y = None, None
        if y is None:
            on_device = isinstance(x, jax.Array)
            y = jax.device_put(x, f)
            if on_device:
                # device->device relayout: block so at most ONE extra copy is
                # transient (source + relayouted copy coexist until done)
                y.block_until_ready()
            # host (numpy) sources have no device-side copy to bound — the
            # destination IS the final buffer, and blocking per leaf would
            # serialize every transfer behind a full tunnel/PCIe round-trip
            # (measured: dominated the 8M host-staged step wall). In-flight
            # transfers are ordered by jax; the consumer's dispatch waits.
            # keying by id() is safe: every source leaf outlives its own
            # lookup (it is alive in `flat` until visited), and ids of dead
            # leaves are never looked up again
            if key is not None:
                cache[key] = y
        new_flat.append(y)
        del x
    return jax.tree.unflatten(treedef, new_flat)
