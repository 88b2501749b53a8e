"""Checkpoint save/load.

Improves on the reference's weights-only torch.save checkpoints
(src/trainer/utils/setup.py:18-42 — which lose optimizer/schedule state, so
"resume" restarts the schedule): we store params + optimizer state + epoch +
best-tracking in one msgpack file via flax.serialization, with the same atomic
tmp+replace write discipline (stat.py:216-217). Loading only params from a full
checkpoint is supported (the reference's ckpt semantics).
"""
from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
from flax import serialization


def save_checkpoint(path: str, state: Dict[str, Any]) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    blob = serialization.to_bytes(state)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)


def load_checkpoint(path: str, template: Dict[str, Any]) -> Dict[str, Any]:
    """Restore into the same pytree structure as `template`."""
    with open(path, "rb") as f:
        blob = f.read()
    return serialization.from_bytes(template, blob)


def load_params_only(path: str, params_template) -> Any:
    """Load just model params from a full checkpoint (reference load_ckpt
    semantics, setup.py:44-86, incl. tolerating extra state)."""
    with open(path, "rb") as f:
        blob = f.read()
    state = serialization.msgpack_restore(blob)
    if "params" in state:
        raw = state["params"]
    else:
        raw = state
    return serialization.from_state_dict(params_template, raw)
