from .segment import (
    segment_sum,
    segment_mean,
    segment_max,
    segment_softmax,
    segment_count,
    make_segment_fold,
    fold_sum,
    fold_mean,
    fold_max,
    fold_count,
    gather_table,
)
from .grid_graph import (
    LatentGrid,
    EdgeSlots,
    build_edge_slots,
    build_edge_slots_batched,
    build_edge_slots_np,
    brute_force_edges,
    compact_slots,
    max_slot_degree,
    stencil_base_cell,
)
from .attention import scaled_dot_product_attention, flash_attention_xla
from .eigh3 import eigvalsh3x3_desc
from .rope import apply_rope

__all__ = [
    "segment_sum",
    "segment_mean",
    "segment_max",
    "segment_softmax",
    "segment_count",
    "make_segment_fold",
    "fold_sum",
    "fold_mean",
    "fold_max",
    "fold_count",
    "gather_table",
    "LatentGrid",
    "EdgeSlots",
    "build_edge_slots",
    "build_edge_slots_batched",
    "build_edge_slots_np",
    "brute_force_edges",
    "compact_slots",
    "max_slot_degree",
    "stencil_base_cell",
    "scaled_dot_product_attention",
    "flash_attention_xla",
    "eigvalsh3x3_desc",
    "apply_rope",
]
