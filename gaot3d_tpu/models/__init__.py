"""Model factory (reference: src/model/__init__.py:8-28 init_model)."""
from __future__ import annotations

from typing import Optional

from ..ops.grid_graph import LatentGrid
from .gaot3d import GAOT3D
from .magno import MAGNOConfig, MAGNODecoder, MAGNOEncoder
from .transformer import AttentionConfig, FFNConfig, TransformerConfig

SUPPORTED_MODELS = ["gaot_3d"]


def init_model(
    input_size: int,
    output_size: int,
    model: str = "gaot_3d",
    magno_config: Optional[MAGNOConfig] = None,
    attn_config: Optional[TransformerConfig] = None,
    latent_tokens=(32, 32, 32),
    grid: Optional[LatentGrid] = None,
) -> GAOT3D:
    if model.lower() == "gaot_3d":
        return GAOT3D(
            input_size=input_size,
            output_size=output_size,
            magno_config=magno_config or MAGNOConfig(),
            attn_config=attn_config or TransformerConfig(),
            latent_tokens=tuple(latent_tokens),
            grid=grid,
        )
    raise ValueError(f"model {model} not supported currently! supported: {SUPPORTED_MODELS}")


__all__ = [
    "GAOT3D",
    "MAGNOConfig",
    "MAGNOEncoder",
    "MAGNODecoder",
    "TransformerConfig",
    "AttentionConfig",
    "FFNConfig",
    "init_model",
    "SUPPORTED_MODELS",
]
