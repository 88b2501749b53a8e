"""Serving export: serialize a compiled GAOT3D inference function to disk.

The reference has no deployment story beyond `t.test()` (checkpoint + python
stack required at inference time, src/trainer/stat.py:575-788). For
production serving on TPU, the natural JAX artifact is an exported StableHLO
function (`jax.export`): a single file that any later process — or a C++
serving binary via the PJRT C API — can load and call without the model code,
flax, or this package.

The exported function is the EVAL forward: (params baked in as constants)
taking (pos [B,N,3], feats [B,N,C], mask [B,N]) plus optional precomputed
edge structures, returning predictions [B,N,out]. Shapes are static (the
framework's padded-batch invariant), so one export per deployment bucket.

Usage:
    from gaot3d_tpu.serve import export_inference, load_inference
    export_inference(model, params, example, "model.gaotx")           # once
    infer = load_inference("model.gaotx")                             # serve
    pred = infer(pos, feats, mask)

`platforms` cross-lowers from any host (e.g. export for 'tpu' on a CPU build
machine). Edge structures (EdgeSlots / FlatEdgeChunks) are passed as leading
pytree args at call time when `example` carries them — precomputed-graph
serving skips the on-device build.
"""
from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import jax

MAGIC = b"GAOTX001"


def _register_pytrees():
    """jax.export serializes call signatures, so the framework's NamedTuple
    pytrees (edge structures) need stable serialization names."""
    import json

    from jax import export as jax_export

    from .ops.grid_graph import EdgeSlots, FlatEdgeChunks, SectionedEdgeSlots

    for cls in (EdgeSlots, FlatEdgeChunks):
        try:
            jax_export.register_namedtuple_serialization(
                cls, serialized_name=f"gaot3d_tpu.{cls.__name__}"
            )
        except ValueError as e:
            # tolerate ONLY the benign re-registration under OUR name ("...
            # Previous registration was with serialized_name `X`"); a genuine
            # conflict (registered under another name) would otherwise surface
            # later as an opaque signature mismatch far from here
            if f"serialized_name `gaot3d_tpu.{cls.__name__}`" not in str(e):
                raise
    # SectionedEdgeSlots is a register_dataclass pytree (data: the sections
    # tuple; static auxdata: the `shards` int) — the degree-sectioned DEFAULT
    # layout (bench/trainer since round 5) must ride exports too. Auxdata is
    # JSON so the serialized signature stays stable and readable.
    try:
        jax_export.register_pytree_node_serialization(
            SectionedEdgeSlots,
            serialized_name="gaot3d_tpu.SectionedEdgeSlots",
            serialize_auxdata=lambda aux: json.dumps(list(aux)).encode(),
            deserialize_auxdata=lambda b: tuple(json.loads(b.decode())),
        )
    except ValueError as e:
        if "gaot3d_tpu.SectionedEdgeSlots" not in str(e):
            raise


def export_inference(
    model,
    params,
    example_args: Tuple,
    path: str,
    example_kwargs: Optional[dict] = None,
    platforms: Optional[Sequence[str]] = None,
) -> None:
    """Serialize `model.apply(params, *example_args, **example_kwargs,
    train=False)` (params baked in) at the example's exact shapes.

    example_kwargs may carry `encoder_slots` / `decoder_slots` — they are
    closed over (baked) if given here; to supply them at CALL time instead,
    put the structures into example_args via a wrapper before exporting.
    platforms: e.g. ["tpu"] to cross-lower for TPU serving from a CPU host
    (default: the current backend)."""
    from jax import export as jax_export

    _register_pytrees()
    kwargs = dict(example_kwargs or {})

    def infer(*args):
        return model.apply(params, *args, train=False, **kwargs)

    fn = jax.jit(infer)
    exp = jax_export.export(fn, platforms=platforms)(*example_args)
    blob = exp.serialize()
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(MAGIC)
        f.write(blob)
    os.replace(tmp, path)  # atomic, like every artifact write in this repo


def load_inference(path: str):
    """Load an exported inference function; returns a callable with the
    exported signature. Works without the model code or its params."""
    from jax import export as jax_export

    _register_pytrees()
    with open(path, "rb") as f:
        magic = f.read(len(MAGIC))
        if magic != MAGIC:
            raise ValueError(f"{path} is not a gaot3d_tpu export (bad magic)")
        blob = f.read()
    exported = jax_export.deserialize(blob)
    return exported.call


def make_edge_arg_model(model, num_scales: int = 1):
    """Wrap a GAOT3D so precomputed edge structures become CALL-TIME
    positional args of the exported function instead of baked constants:
    `apply(params, pos, feats, mask, enc_s0..enc_s{S-1}, dec_s0..dec_s{S-1})`.

    This is the precomputed-graph serving mode (one artifact serves many
    meshes of the padded shape, each with its own host-built EdgeSlots /
    FlatEdgeChunks) — without it, exports bake the on-device stencil build
    into the artifact, whose [N, K_window] transients are the expensive path
    at deployment scale (see MAGNOConfig.slot_budget notes)."""

    class _EdgeArgModel:
        def apply(self, p, pos, feats, mask, *edges, train=False):
            if len(edges) != 2 * num_scales:
                raise ValueError(
                    f"expected {2 * num_scales} edge structures "
                    f"(encoder+decoder per scale), got {len(edges)}")
            return model.apply(
                p, pos, feats, mask, train=train,
                encoder_slots=list(edges[:num_scales]),
                decoder_slots=list(edges[num_scales:]),
            )

    return _EdgeArgModel()


# -- multi-bucket bundles -----------------------------------------------------
#
# Exported functions are static-shaped, but deployment meshes vary in size.
# The trainer's answer is bucket padding (data/pipeline.py pad_multiple); the
# serving twin is a BUNDLE: one export per node bucket in a single file, plus
# a dispatcher that pads each request up to the smallest covering bucket and
# slices the prediction back. (The reference has no serving story at all —
# its `test()` requires the python stack per inference, stat.py:575-788.)

BUCKET_MAGIC = b"GAOTXB01"


def export_inference_buckets(
    model,
    params,
    examples: dict,
    path: str,
    example_kwargs: Optional[dict] = None,
    platforms: Optional[Sequence[str]] = None,
) -> None:
    """Serialize one export per node bucket into a single bundle file.

    examples: {padded_node_count: example_args_tuple} — each tuple as in
    export_inference ((pos [B,n,3], feats [B,n,C], mask [B,n]), optionally
    followed by edge-structure pytrees). example_kwargs are baked into every
    bucket's closure."""
    import struct

    from jax import export as jax_export

    _register_pytrees()
    kwargs = dict(example_kwargs or {})

    def infer(*args):
        return model.apply(params, *args, train=False, **kwargs)

    fn = jax.jit(infer)
    blobs = []
    for n in sorted(examples):
        exp = jax_export.export(fn, platforms=platforms)(*examples[n])
        blobs.append((int(n), exp.serialize()))
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(BUCKET_MAGIC)
        f.write(struct.pack("<I", len(blobs)))
        for n, blob in blobs:
            f.write(struct.pack("<QQ", n, len(blob)))
            f.write(blob)
    os.replace(tmp, path)


class BucketedInference:
    """Dispatcher over a bucket bundle: pads (pos, feats, mask) along the node
    axis to the smallest covering bucket (mask padding is False, so padded
    rows are inert end-to-end) and slices predictions back to the request
    size. Requests with extra args (call-time edge structures) must already
    be at an exact bucket size — edge pytrees are bucket-shaped by
    construction and are not padded here."""

    def __init__(self, calls: dict):
        self.calls = dict(sorted(calls.items()))
        self.buckets = list(self.calls)

    def __call__(self, pos, feats, mask, *extra):
        import jax.numpy as jnp

        n = pos.shape[1]
        bucket = next((b for b in self.buckets if b >= n), None)
        if bucket is None:
            raise ValueError(
                f"{n} nodes exceeds the largest bucket {self.buckets[-1]}")
        if extra and bucket != n:
            raise ValueError(
                f"call-time edge structures require an exact bucket size; "
                f"got {n} nodes, buckets {self.buckets}")
        if bucket != n:
            pad = bucket - n
            pos = jnp.pad(pos, ((0, 0), (0, pad), (0, 0)))
            feats = jnp.pad(feats, ((0, 0), (0, pad), (0, 0)))
            mask = jnp.pad(mask, ((0, 0), (0, pad)))  # False: padded rows inert
        out = self.calls[bucket](pos, feats, mask, *extra)
        return out[:, :n] if bucket != n else out


def load_inference_buckets(path: str) -> BucketedInference:
    """Load a bucket bundle; returns the padding dispatcher."""
    import struct

    from jax import export as jax_export

    _register_pytrees()
    calls = {}
    with open(path, "rb") as f:
        magic = f.read(len(BUCKET_MAGIC))
        if magic != BUCKET_MAGIC:
            raise ValueError(f"{path} is not a gaot3d_tpu bucket bundle")
        (count,) = struct.unpack("<I", f.read(4))
        for _ in range(count):
            n, length = struct.unpack("<QQ", f.read(16))
            calls[int(n)] = jax_export.deserialize(f.read(length)).call
    return BucketedInference(calls)
