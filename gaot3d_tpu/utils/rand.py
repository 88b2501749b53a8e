"""Seeding utilities (reference: src/utils/rand.py, src/trainer/utils/setup.py:5-11).

JAX is functionally seeded; we keep a module-level root key for host-side
shuffling plus numpy seeding for the data pipeline.
"""
from __future__ import annotations

import random

import numpy as np


def manual_seed(seed: int) -> None:
    random.seed(seed)
    np.random.seed(seed)


def rng_for(seed: int, *stream: int) -> np.random.Generator:
    """Deterministic per-stream numpy generator (epoch shuffles, subsampling)."""
    return np.random.default_rng([seed, *stream])
