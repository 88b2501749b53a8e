from .schedule import make_lr_schedule, OptimizerargsConfig
from .metrics import compute_drivaernet_metric, compute_general_metrics, compute_poseidon_metric

__all__ = [
    "make_lr_schedule",
    "OptimizerargsConfig",
    "compute_drivaernet_metric",
    "compute_general_metrics",
    "compute_poseidon_metric",
]
