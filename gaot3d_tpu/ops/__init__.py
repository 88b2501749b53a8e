from .segment import (
    segment_sum,
    segment_mean,
    segment_max,
    segment_softmax,
    segment_count,
)
from .grid_graph import LatentGrid, EdgeSlots, build_edge_slots, brute_force_edges
from .eigh3 import eigvalsh3x3_desc
from .rope import apply_rope

__all__ = [
    "segment_sum",
    "segment_mean",
    "segment_max",
    "segment_softmax",
    "segment_count",
    "LatentGrid",
    "EdgeSlots",
    "build_edge_slots",
    "brute_force_edges",
    "eigvalsh3x3_desc",
    "apply_rope",
]
