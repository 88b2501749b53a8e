from .dataclass_utils import shallow_asdict, dataclass_from_dict, merge_config
from .rand import manual_seed

__all__ = ["shallow_asdict", "dataclass_from_dict", "merge_config", "manual_seed"]
