"""Multiscale Attentional Graph Neural Operator (MAGNO) encoder/decoder.

Behavior parity with the reference (src/model/layers/magno.py:377-798):
  encoder: per scale s -> edges (device-built here; optionally precomputed) ->
  edge sampling -> lift point features (1-layer MLP to lifting_channels) ->
  IntegralTransform -> optional GeometricEmbedding -> concat + recovery MLP ->
  scale aggregation (sum | learned softmax weights over latent coords,
  magno.py:585-596) -> [B, M, C].
  decoder: mirror with latent as source, queries = points; final projection
  MLP (in -> projection_channels -> out), magno.py:691-798.

Strategy / geoembed parsing accepts scalar-or-pair for encoder/decoder
asymmetry (magno.py:72-114). Config field names match the reference's
MAGNOConfig (magno.py:21-66) so reference YAML configs drop in unchanged.

TPU-first: graph building is the static stencil search (ops.grid_graph) run
on device inside the jitted step; 'precompute_edges' / 'asynchronous_graph_building'
remain supported input-pipeline modes but are no longer load-bearing.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, List, Optional, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.grid_graph import (
    EdgeSlots,
    LatentGrid,
    SectionedEdgeSlots,
    build_edge_slots_batched,
)
from ..ops.sampling import cap_per_query_gather, cap_per_query_scatter, dropout_edges
from .geoembed import GeometricEmbedding
from .integral_transform import IntegralTransform
from .mlp import TorchLinear


@dataclass
class MAGNOConfig:
    """Field names mirror the reference MAGNOConfig (magno.py:21-66)."""

    use_gno: bool = True
    gno_coord_dim: int = 3
    gno_radius: float = 0.033
    # encoder
    lifting_channels: int = 16
    encoder_feature_attr: Any = "x"  # str or list of str, e.g. ["pos", "c"]
    in_gno_channel_mlp_hidden_layers: List[int] = field(default_factory=lambda: [64, 64, 64])
    in_gno_transform_type: str = "linear"
    # decoder
    projection_channels: int = 256
    out_gno_channel_mlp_hidden_layers: List[int] = field(default_factory=lambda: [64, 64])
    out_gno_transform_type: str = "linear"
    mlp_type: str = "channel"  # ['channel','linear'] — identical math on TPU
    # multiscale
    scales: List[float] = field(default_factory=lambda: [1.0])
    use_scale_weights: bool = False
    use_graph_cache: bool = True  # kept for config parity (no-op: device build)
    gno_use_torch_cluster: bool = False  # parity no-op
    gno_use_torch_scatter: bool = True  # parity no-op
    node_embedding: bool = False
    use_attn: Optional[bool] = None
    attention_type: str = "cosine"  # ['cosine','dot_product']
    # geometric embedding
    use_geoembed: Any = field(default_factory=lambda: [True, True])
    embedding_method: str = "statistical"  # ['statistical','pointnet']
    pooling: str = "max"  # ['max','mean']
    # sampling
    sampling_strategy: Optional[str] = None  # ['max_neighbors','ratio']
    max_neighbors: Optional[int] = None
    sample_ratio: Optional[float] = None
    # neighbor strategy
    neighbor_strategy: Any = "radius"  # str or [encoder, decoder]
    k_neighbors: int = 1
    # dataset / pipeline flags (parity; edges are device-built by default)
    precompute_edges: bool = True
    asynchronous_graph_building: bool = False
    # TPU-specific knobs
    max_radius_neighbors: Optional[int] = None  # per-query cap (PyG radius
    # silently caps at 32; set 32 for strict reference parity experiments)
    edge_chunk_size: Optional[int] = None  # process the node axis in chunks of
    # this size inside GNO/geoembed (bounds transient HBM; pick a divisor of
    # the pipeline's pad_multiple). None = single chunk.
    remat: Any = True  # rematerialize per-chunk edge computations in backward
    # (bool, or [encoder, decoder] pair: encoder residuals are ~3GB at 500K
    # nodes and skipping its remat trades that HBM for the full fwd recompute)
    remat_policy: str = "nothing"  # 'nothing' (recompute all) | 'dots' (save
    # matmul outputs: trades HBM for less recompute in backward)
    slot_budget: Optional[int] = None  # compact the K stencil slots per point
    # down to this many (valid-first). EXACT when >= max per-point degree
    # (#grid points inside the radius ball; ~8 for the drivaernet recipe) —
    # cuts every per-edge cost ~K/budget-fold. Validated against the first
    # sample at trainer init.
    segment_impl: str = "scatter"  # encoder segment reductions: 'scatter'
    # (jax.ops.segment_sum; with the fused encoder the cost is ONE reduction
    # per chunk and scatter wins) | 'sort' (edge sort + cumsum folds) |
    # 'tile' (sort + Pallas MXU one-hot tile kernel, ops/pallas_kernels.py)
    payload_impl: str = "xla"  # fused-encoder payload: 'xla' (default) |
    # 'pallas'/'auto' (ops/pallas_encoder.py: exact-f32 VMEM kernel, validated
    # on chip vs float64 — 3.4e-7 rel err where the XLA path is 0.3%). The
    # kernel needs a ~38M scoped-vmem budget: raise it via AOT
    # compiler_options {'xla_tpu_scoped_vmem_limit_kib': 65536} (full-model
    # integration measured working on v5e; per-call CompilerParams(flags=...)
    # SIGABRTs the backend instead — never use those). It is an EXACTNESS
    # option: measured 0.90s vs 0.62s device step at 500K nodes (the unrolled
    # exact-f32 VPU matmuls cost ~46%), so 'xla' stays the perf default.
    # LIMITATION: the Pallas kernel's custom VJP returns ZERO cotangents for
    # point positions (they are data here; nothing in the framework
    # differentiates coordinates) — do not enable it for geometry
    # optimization (pallas_encoder.py module doc).
    fused_encoder: bool = True  # fuse GNO + statistical geoembed into one
    # chunked scan with one reduction per pass (fused_encoder.py); applies
    # when geoembed is statistical and per-edge attention is off
    fused_decoder: bool = True  # fuse the decoder GNO + statistical geoembed
    # into one pass over the edge slots (fused_decoder.py); same applicability
    kernel_dtype: str = "float32"  # 'bfloat16' runs the per-edge kernel MLP
    # matmuls in bf16 with f32 accumulation (2x MXU, half HBM on the hot path)
    flat_reduce_impl: str = "fold"  # flat_order='dst' presorted reduce:
    # 'fold' (XLA cumsum fold) | 'pallas' (sorted-segment one-hot MXU kernel)
    payload_layout: str = "nk"  # fused-encoder chunk-body shapes: 'nk'
    # (4D [B,n,K,d] elementwise) | 'flat' ([B,n*K,d] from the start — kills
    # the profiled mid-scan [n,K,C]<->[n*K,C] relayout copies; bit-identical
    # output; see fused_encoder.FusedEncoderScale.payload_layout)
    fused_head: bool = True  # decoder: run GNO + scale-combine + projection
    # head per node chunk inside ONE checkpointed scan body, so the only
    # full-N decode tensors are the [N, out] result (vs ~3 KiB/node of
    # [N, 256] projection intermediates saved for backward otherwise — the
    # difference between fitting and not fitting 8M-node DrivAerML on one
    # chip). Applies when the decoder has no geoembed (the DrivAerNet/
    # DrivAerML recipes); numerically identical to the unfused tail.
    flat_edges_per_chunk: Optional[int] = None  # pin the flat layout's static
    # per-chunk edge budget E. None = auto (max per-chunk valid count rounded
    # to 8192) — E can then drift across batches on variable-density data,
    # and EVERY new E is a fresh XLA compile of the train step (remote
    # compiles are 15-25 min). Pin it for production runs; the conversion
    # raises (never silently drops edges) if a chunk exceeds the pin.
    flat_order: str = "src"  # flat-layout ENCODER edge ordering: 'src'
    # (natural (node, slot) order; reduce = scatter segment-sum) | 'dst'
    # (chunk edges sorted by latent cell; reduce = presorted cumsum fold, no
    # scatter anywhere in the encoder). Decoder lists are always src-sorted
    # (its fold-by-node invariant). MUST match how the flat lists were built:
    # the presorted fold trusts the ordering (searchsorted boundaries), so
    # 'dst' over src-ordered lists produces WRONG results with no error. The
    # data pipeline and bench derive both sides from this one knob; only
    # hand-fed FlatEdgeChunks can mismatch.
    edge_layout: Any = "slots"  # precomputed-edge layout fed to the model:
    # 'slots' ([N, K] stencil windows) | 'flat' (per-chunk compacted edge
    # lists, ops/grid_graph.py FlatEdgeChunks — drops the ~52% masked slots
    # from every scatter/gather row and kernel-MLP flop; requires the fused
    # encoder + GNO-only decoder and precomputed edges, no edge sampling;
    # numerically identical to 'slots' on the same edges, asserted by
    # tests/test_flat_edges.py). Scalar-or-pair like neighbor_strategy:
    # ['flat', 'slots'] selects the layout PER SIDE (encoder, decoder) — the
    # measured optimum differs by direction (tools/microbench_flat.py: flat
    # encoder 2.15x fwd / 1.63x fwd+bwd, but flat decoder 1.29x SLOWER fwd
    # and 1.43x faster fwd+bwd, so inference wants flat enc + slotted dec
    # while training wants flat both). The data pipeline converts stored
    # slots per side at batch assembly. Node sharding: the [B, nc, E] chunk
    # axis shards alongside the point axis (src indices are chunk-local),
    # verified exact on the CPU mesh (tests/test_parallel.py).
    # 'sectioned' (both sides — see parse_edge_layout): degree-sectioned
    # slots (ops/grid_graph.py SectionedEdgeSlots). The pipeline sorts each
    # sample's nodes ascending by degree and gives each edge-chunk-aligned
    # range its own K = its max degree — 0.575x the slot rows of the uniform
    # budget at the 500K DrivAerNet geometry, keeping the node-aligned
    # broadcasts the flat layout loses. Requires precomputed/async slots, the
    # fused encoder, a GNO-only fused-head decoder, a single scale, and no
    # edge sampling. Node sharding IS supported via SHARD-ALIGNED sections
    # (SectionedEdgeSlots.shards: the trainer wires setup.node_shards to the
    # loader's section_shards; degree-sorted nodes are dealt round-robin to
    # equal shard ranges and section leaves come out shard-major, splitting
    # exactly at node-shard boundaries).
    sectioned_profile: Optional[List[int]] = None  # pinned per-chunk K list
    # for edge_layout='sectioned' (len = padded_N / edge_chunk_size, or
    # padded_N / section_shards / edge_chunk_size when node-sharded). Without
    # it the pipeline derives the section structure per batch, and a batch
    # whose per-chunk max degrees differ recompiles the step (the
    # flat_edges_per_chunk analogue). Must cover the observed per-chunk max
    # degree — the builder raises otherwise (edges would be dropped).


def parse_edge_layout(edge_layout: Union[str, List[str]]) -> Tuple[str, str]:
    """scalar-or-pair -> (encoder, decoder) layout, each 'slots' | 'flat' |
    'sectioned' (same polymorphism as neighbor_strategy, reference
    magno.py:72-91). 'sectioned' must cover BOTH sides: the degree-sort node
    permutation is a sample-level transform, so a mixed pair would feed one
    side permuted inputs against unpermuted edges."""
    if isinstance(edge_layout, str):
        pair = (edge_layout, edge_layout)
    elif isinstance(edge_layout, (list, tuple)) and len(edge_layout) == 2:
        pair = (edge_layout[0], edge_layout[1])
    else:
        raise ValueError(
            f"edge_layout must be str or list of length 2, got {edge_layout}"
        )
    for side in pair:
        if side not in ("slots", "flat", "sectioned"):
            raise ValueError(f"unknown edge_layout: {side!r}")
    if "sectioned" in pair and pair != ("sectioned", "sectioned"):
        raise ValueError(
            "edge_layout 'sectioned' applies to both sides (the degree-sort "
            f"permutation reorders the sample's nodes), got {pair}"
        )
    return pair


def parse_neighbor_strategy(neighbor_strategy: Union[str, List[str]]) -> Tuple[str, str]:
    """scalar-or-pair -> (encoder, decoder) (reference: magno.py:72-91)."""
    if isinstance(neighbor_strategy, str):
        return neighbor_strategy, neighbor_strategy
    if isinstance(neighbor_strategy, (list, tuple)) and len(neighbor_strategy) == 2:
        return neighbor_strategy[0], neighbor_strategy[1]
    raise ValueError(
        f"neighbor_strategy must be str or list of length 2, got {neighbor_strategy}"
    )


def parse_remat(remat) -> Tuple[bool, bool]:
    """(encoder, decoder) remat flags from a scalar or pair (the config's
    scalar-or-pair polymorphism, like neighbor_strategy/use_geoembed)."""
    if isinstance(remat, (list, tuple)):
        if len(remat) != 2:
            raise ValueError(
                f"remat must be a bool or a [encoder, decoder] pair, got {remat}")
        return bool(remat[0]), bool(remat[1])
    return bool(remat), bool(remat)


def parse_geoembed_strategy(use_geoembed: Union[bool, List[bool]]) -> Tuple[bool, bool]:
    """scalar-or-pair -> (encoder, decoder) (reference: magno.py:93-114)."""
    if isinstance(use_geoembed, bool):
        return use_geoembed, use_geoembed
    if isinstance(use_geoembed, (list, tuple)) and len(use_geoembed) == 2:
        return bool(use_geoembed[0]), bool(use_geoembed[1])
    raise ValueError(f"use_geoembed must be bool or list of length 2, got {use_geoembed}")


def apply_edge_sampling(
    slots: EdgeSlots,
    cfg: MAGNOConfig,
    direction: str,
    train: bool,
    rng: Optional[jax.Array],
    num_latent: int,
) -> EdgeSlots:
    """Edge sampling parity (reference magno.py:297-371): 'ratio' = Bernoulli
    edge dropout (train only); 'max_neighbors' = random per-query cap.
    Plus the optional deterministic radius cap (PyG max_num_neighbors parity)."""
    if cfg.max_radius_neighbors is not None:
        if direction == "encoder":
            slots = EdgeSlots(*jax.vmap(
                lambda s_lat, s_mask: cap_per_query_scatter(
                    EdgeSlots(s_lat, s_mask), cfg.max_radius_neighbors,
                    num_segments=num_latent,
                )
            )(slots.lat_idx, slots.mask))
        else:
            slots = cap_per_query_gather(slots, cfg.max_radius_neighbors)
    if cfg.sampling_strategy is None:
        return slots
    if cfg.sampling_strategy == "ratio":
        if cfg.sample_ratio is None:
            raise ValueError("sample_ratio must be provided for 'ratio' sampling")
        if cfg.sample_ratio >= 1.0 or not train or rng is None:
            return slots
        return dropout_edges(slots, rate=1.0 - cfg.sample_ratio, rng=rng)
    if cfg.sampling_strategy == "max_neighbors":
        if cfg.max_neighbors is None:
            raise ValueError("max_neighbors must be provided for 'max_neighbors' sampling")
        sub = rng if rng is not None else None
        if direction == "encoder":
            def cap_one(s_lat, s_mask, r):
                return cap_per_query_scatter(EdgeSlots(s_lat, s_mask),
                                             cfg.max_neighbors, rng=r,
                                             num_segments=num_latent)
            rngs = (
                jax.random.split(sub, slots.mask.shape[0]) if sub is not None else None
            )
            if rngs is None:
                out = jax.vmap(lambda a, b: cap_one(a, b, None))(slots.lat_idx, slots.mask)
            else:
                out = jax.vmap(cap_one)(slots.lat_idx, slots.mask, rngs)
            return EdgeSlots(*out)
        return cap_per_query_gather(slots, cfg.max_neighbors, rng=sub)
    raise ValueError(f"Invalid sampling strategy: {cfg.sampling_strategy}")


class MAGNOEncoder(nn.Module):
    """(reference: magno.py:377-600)"""

    in_channels: int
    out_channels: int
    config: MAGNOConfig
    grid: LatentGrid

    @nn.compact
    def __call__(
        self,
        point_pos: jnp.ndarray,  # [B, N, 3]
        point_feats: Optional[jnp.ndarray],  # [B, N, C_in]
        point_mask: jnp.ndarray,  # [B, N]
        latent_pos: jnp.ndarray,  # [M, 3]
        precomputed_slots: Optional[List[EdgeSlots]] = None,
        train: bool = False,
    ) -> jnp.ndarray:
        cfg = self.config
        enc_strategy, _ = parse_neighbor_strategy(cfg.neighbor_strategy)
        use_geo, _ = parse_geoembed_strategy(cfg.use_geoembed)
        C = cfg.lifting_channels
        M = latent_pos.shape[0]
        B = point_pos.shape[0]

        if cfg.use_gno:
            lifting = TorchLinear(C, use_bias=True)
            # NOTE deviation: the reference sizes the nonlinear kernel input
            # with the RAW in_channels (magno.py:403-405) yet feeds the LIFTED
            # features (magno.py:546-551), which only type-checks when
            # in_channels == lifting_channels. We size with the lifted width,
            # which is what actually flows through the kernel.
            gno_layers = (
                [cfg.gno_coord_dim * 2
                 + (C if cfg.in_gno_transform_type in ("nonlinear", "nonlinear_kernelonly") else 0)]
                + list(cfg.in_gno_channel_mlp_hidden_layers)
                + [C]
            )

        # ONE set of modules shared across scales (parity: the reference
        # creates self.gno/self.geoembed/self.recovery once and reuses them
        # for every scale, magno.py:411-458 + 501-581 — per-scale weights
        # would be a different, larger model)
        use_fused = (
            cfg.fused_encoder
            and use_geo
            and cfg.embedding_method == "statistical"
            and not cfg.use_attn
        )
        fused = gno = geoembed = recovery = None
        if use_fused:
            from .fused_encoder import FusedEncoderScale

            fused = FusedEncoderScale(
                lifting_channels=C,
                kernel_layers=tuple(gno_layers) if cfg.use_gno else (),
                transform_type=cfg.in_gno_transform_type,
                grid=self.grid,
                coord_dim=cfg.gno_coord_dim,
                edge_chunk_size=cfg.edge_chunk_size,
                remat=parse_remat(cfg.remat)[0],
                remat_policy=cfg.remat_policy,
                segment_impl=cfg.segment_impl,
                use_gno=cfg.use_gno,
                kernel_dtype=cfg.kernel_dtype,
                payload_impl=cfg.payload_impl,
                flat_dst_sorted=cfg.flat_order == "dst",
                flat_reduce_impl=cfg.flat_reduce_impl,
                payload_layout=cfg.payload_layout,
            )
        else:
            if cfg.use_gno:
                gno = IntegralTransform(
                    channel_mlp_layers=tuple(gno_layers),
                    transform_type=cfg.in_gno_transform_type,
                    use_attn=cfg.use_attn,
                    coord_dim=cfg.gno_coord_dim,
                    attention_type=cfg.attention_type,
                    edge_chunk_size=cfg.edge_chunk_size,
                    remat=parse_remat(cfg.remat)[0],
                    remat_policy=cfg.remat_policy,
                    segment_impl=cfg.segment_impl,
                    grid=self.grid,
                    kernel_dtype=cfg.kernel_dtype,
                )
            if use_geo:
                geoembed = GeometricEmbedding(
                    input_dim=cfg.gno_coord_dim,
                    output_dim=C,
                    method=cfg.embedding_method,
                    pooling=cfg.pooling,
                    edge_chunk_size=cfg.edge_chunk_size,
                    remat=parse_remat(cfg.remat)[0],
                    remat_policy=cfg.remat_policy,
                    segment_impl=cfg.segment_impl,
                    grid=self.grid,
                )
        if cfg.use_gno and use_geo:
            recovery = TorchLinear(C)

        # scale-independent lifting: hoisted out of the per-scale loop (the
        # loop traced an identical Dense per scale and relied on XLA CSE)
        lifted_pts = lifting(point_feats) if cfg.use_gno else None

        encoded_scales = []
        for scale_idx, scale in enumerate(cfg.scales):
            radius = cfg.gno_radius * scale
            if precomputed_slots is not None:
                slots = precomputed_slots[scale_idx]
            else:
                slots = build_edge_slots_batched(
                    point_pos, self.grid, radius,
                    k_neighbors=cfg.k_neighbors,
                    strategy=enc_strategy,
                    point_mask=point_mask,
                )
            from ..ops.grid_graph import FlatEdgeChunks

            if isinstance(slots, FlatEdgeChunks):
                # pre-compacted flat edge lists (flatten_slots_host): masked
                # slots were dropped at build time; sampling/compaction do not
                # apply. Fused-path only (the flagship recipe). Refuse ANY
                # edge-modifying config (incl. eval-time deterministic caps,
                # which the slotted path applies train AND eval) — silently
                # skipping them would diverge from the slotted layout.
                if not use_fused:
                    raise ValueError("flat edge layout requires the fused encoder")
                if cfg.sampling_strategy is not None or cfg.max_radius_neighbors is not None:
                    raise ValueError(
                        "edge sampling / radius caps are not supported with "
                        "flat edges (sampling_strategy and "
                        "max_radius_neighbors must be None)"
                    )
            elif isinstance(slots, SectionedEdgeSlots):
                # degree-sectioned slots (section_slots_by_degree_batched):
                # budget compaction happened at build time; sampling/caps
                # refuse like the flat layout (silently skipping them would
                # diverge from the uniform slotted layout)
                if not use_fused:
                    raise ValueError("sectioned slots require the fused encoder")
                if cfg.sampling_strategy is not None or cfg.max_radius_neighbors is not None:
                    raise ValueError(
                        "edge sampling / radius caps are not supported with "
                        "sectioned slots (sampling_strategy and "
                        "max_radius_neighbors must be None)"
                    )
            else:
                rng = (
                    self.make_rng("edges")
                    if (train and cfg.sampling_strategy in ("ratio", "max_neighbors"))
                    else None
                )
                slots = apply_edge_sampling(slots, cfg, "encoder", train, rng, M)
                if cfg.slot_budget is not None and cfg.slot_budget < slots.num_slots:
                    from ..ops.grid_graph import compact_slots

                    slots = compact_slots(slots, cfg.slot_budget)

            # fused fast path: GNO + statistical geoembed share one chunked
            # scan with one segment reduction per pass (see fused_encoder.py)
            if use_fused:
                encoded_gno, geo = fused(slots, point_pos, lifted_pts, latent_pos)
                if encoded_gno is not None:
                    combined = jnp.concatenate([encoded_gno, geo], axis=-1)
                    encoded = recovery(combined)  # recovery MLP
                else:
                    encoded = geo
                encoded_scales.append(encoded)
                continue

            encoded_gno = None
            if cfg.use_gno:
                encoded_gno = gno(slots, point_pos, latent_pos, lifted_pts,
                                  direction="encoder")

            geo = None
            if use_geo:
                geo = geoembed(slots, point_pos, latent_pos, direction="encoder")

            if encoded_gno is not None and geo is not None:
                combined = jnp.concatenate([encoded_gno, geo], axis=-1)
                encoded = recovery(combined)  # recovery MLP
            elif encoded_gno is not None:
                encoded = encoded_gno
            elif geo is not None:
                encoded = geo
            else:
                raise ValueError("GNO and GeoEmbed are both disabled.")
            encoded_scales.append(encoded)

        if len(encoded_scales) == 1:
            return encoded_scales[0]  # [B, M, C]
        stack = jnp.stack(encoded_scales, axis=0)  # [S, B, M, C]
        if cfg.use_scale_weights:
            w = TorchLinear(len(cfg.scales))(
                jax.nn.relu(TorchLinear(16)(latent_pos))
            )  # [M, S]
            w = jax.nn.softmax(w, axis=-1).T[:, None, :, None]  # [S,1,M,1]
            return (stack * w).sum(axis=0)
        return stack.sum(axis=0)


class MAGNODecoder(nn.Module):
    """(reference: magno.py:605-798)"""

    in_channels: int
    out_channels: int
    config: MAGNOConfig
    grid: LatentGrid

    @nn.compact
    def __call__(
        self,
        latent_feats: jnp.ndarray,  # [B, M, C_in]
        query_pos: jnp.ndarray,  # [B, N, 3]
        query_mask: jnp.ndarray,  # [B, N]
        latent_pos: jnp.ndarray,  # [M, 3]
        precomputed_slots: Optional[List[EdgeSlots]] = None,
        train: bool = False,
    ) -> jnp.ndarray:
        cfg = self.config
        _, dec_strategy = parse_neighbor_strategy(cfg.neighbor_strategy)
        _, use_geo = parse_geoembed_strategy(cfg.use_geoembed)
        C = self.in_channels
        M = latent_pos.shape[0]

        gno_layers = (
            [cfg.gno_coord_dim * 2
             + (C if cfg.out_gno_transform_type in ("nonlinear", "nonlinear_kernelonly") else 0)]
            + list(cfg.out_gno_channel_mlp_hidden_layers)
            + [C]
        )

        # ONE set of modules shared across scales (parity: reference
        # magno.py:605-690 creates gno/geoembed/recovery once)
        use_fused = (
            cfg.fused_decoder
            and use_geo
            and cfg.embedding_method == "statistical"
            and not cfg.use_attn
        )
        fused = gno = geoembed = recovery = None
        if use_fused:
            from .fused_decoder import FusedDecoderScale

            fused = FusedDecoderScale(
                channels=C,
                kernel_layers=tuple(gno_layers),
                transform_type=cfg.out_gno_transform_type,
                grid=self.grid,
                coord_dim=cfg.gno_coord_dim,
                edge_chunk_size=cfg.edge_chunk_size,
                remat=parse_remat(cfg.remat)[1],
                remat_policy=cfg.remat_policy,
                kernel_dtype=cfg.kernel_dtype,
                payload_layout=cfg.payload_layout,
            )
        else:
            gno = IntegralTransform(
                channel_mlp_layers=tuple(gno_layers),
                transform_type=cfg.out_gno_transform_type,
                use_attn=cfg.use_attn,
                coord_dim=cfg.gno_coord_dim,
                attention_type=cfg.attention_type,
                edge_chunk_size=cfg.edge_chunk_size,
                remat=parse_remat(cfg.remat)[1],
                remat_policy=cfg.remat_policy,
                segment_impl=cfg.segment_impl,
                grid=self.grid,
                kernel_dtype=cfg.kernel_dtype,
                payload_layout=cfg.payload_layout,
            )
            if use_geo:
                geoembed = GeometricEmbedding(
                    input_dim=cfg.gno_coord_dim,
                    output_dim=C,
                    method=cfg.embedding_method,
                    pooling=cfg.pooling,
                    edge_chunk_size=cfg.edge_chunk_size,
                    remat=parse_remat(cfg.remat)[1],
                    remat_policy=cfg.remat_policy,
                    segment_impl=cfg.segment_impl,
                    grid=self.grid,
                )
        if use_geo:
            recovery = TorchLinear(C)

        # per-scale slot preparation (build / sample / compact) — full-N [N,K]
        # tensors, same footprint class as the inputs
        scale_slots = []
        for scale_idx, scale in enumerate(cfg.scales):
            radius = cfg.gno_radius * scale
            if precomputed_slots is not None:
                slots = precomputed_slots[scale_idx]
            else:
                slots = build_edge_slots_batched(
                    query_pos, self.grid, radius,
                    k_neighbors=cfg.k_neighbors,
                    strategy=dec_strategy,
                    point_mask=query_mask,
                )
            from ..ops.grid_graph import FlatEdgeChunks

            if isinstance(slots, FlatEdgeChunks):
                # pre-compacted flat edge lists: no sampling/compaction; the
                # GNO-only decoder tail (fused head or plain) consumes them.
                # Any edge-modifying config (incl. eval-time caps) refuses —
                # see the encoder-side comment.
                if use_geo:
                    raise ValueError("flat edge layout: decoder geoembed unsupported")
                if cfg.sampling_strategy is not None or cfg.max_radius_neighbors is not None:
                    raise ValueError(
                        "edge sampling / radius caps are not supported with "
                        "flat edges (sampling_strategy and "
                        "max_radius_neighbors must be None)"
                    )
            elif isinstance(slots, SectionedEdgeSlots):
                if use_geo:
                    raise ValueError("sectioned slots: decoder geoembed unsupported")
                if cfg.sampling_strategy is not None or cfg.max_radius_neighbors is not None:
                    raise ValueError(
                        "edge sampling / radius caps are not supported with "
                        "sectioned slots (sampling_strategy and "
                        "max_radius_neighbors must be None)"
                    )
            else:
                rng = (
                    self.make_rng("edges")
                    if (train and cfg.sampling_strategy in ("ratio", "max_neighbors"))
                    else None
                )
                slots = apply_edge_sampling(slots, cfg, "decoder", train, rng, M)
                if cfg.slot_budget is not None and cfg.slot_budget < slots.num_slots:
                    from ..ops.grid_graph import compact_slots

                    slots = compact_slots(slots, cfg.slot_budget)
            scale_slots.append(slots)

        # module CONSTRUCTION order is shared by both tails below — flax
        # auto-names at construction, so the param tree is identical whether
        # the fused-head scan or the plain tail executes
        multi = len(cfg.scales) > 1
        sw_hidden = sw_out = None
        if multi and cfg.use_scale_weights:
            # construction order preserves the pre-refactor flax auto-names
            # (the inline `TorchLinear(S)(relu(TorchLinear(16)(pos)))` built
            # the outer module first)
            sw_out = TorchLinear(len(cfg.scales))
            sw_hidden = TorchLinear(16)
        proj = TorchLinear(cfg.projection_channels)
        final = TorchLinear(self.out_channels)

        def combine_scales(per_scale, pos):
            if len(per_scale) == 1:
                return per_scale[0]  # [B, n, C]
            stack = jnp.stack(per_scale, axis=0)
            if cfg.use_scale_weights:
                w = sw_out(jax.nn.relu(sw_hidden(pos)))  # [B, n, S]
                w = jax.nn.softmax(w, axis=-1)
                w = jnp.moveaxis(w, -1, 0)[..., None]  # [S,B,n,1]
                return (stack * w).sum(axis=0)
            return stack.sum(axis=0)

        def head(out):
            # final projection MLP: in -> projection_channels -> out
            # (magno.py:650-661)
            h = jax.nn.gelu(proj(out), approximate=False)
            return final(h)

        from ..ops.grid_graph import FlatEdgeChunks
        from .integral_transform import _ckpt, effective_chunk, reshape_chunks

        Nq = query_pos.shape[1]
        if any(isinstance(s, SectionedEdgeSlots) for s in scale_slots):
            # degree-sectioned decode: one fused-head scan per section (each
            # section has its own slot width K), outputs concatenated in node
            # order. Masked slots contribute exact zeros to the per-node
            # K-axis reduction; results match the uniform-K layout on the
            # same permuted inputs up to XLA matmul shape-dependent rounding
            # (~1e-7; see SectionedEdgeSlots).
            if not all(isinstance(s, SectionedEdgeSlots) for s in scale_slots):
                raise ValueError("all scales must share the edge layout")
            if len(scale_slots) != 1:
                raise ValueError(
                    "sectioned slots support a single scale (sections would "
                    "need one shared node permutation across scales)"
                )
            if not cfg.fused_head:
                raise ValueError("sectioned slots require fused_head=True")
            if self.is_initializing():
                raise ValueError(
                    "sectioned slots must not be passed at init (init on a "
                    "dummy batch without precomputed slots, like the trainer)"
                )
            sslots = scale_slots[0]
            if sslots.num_nodes != Nq:
                raise ValueError(
                    f"sectioned slots cover {sslots.num_nodes} nodes, "
                    f"queries have {Nq}"
                )
            B = query_pos.shape[0]
            S = sslots.shards
            if S > 1:
                # shard-aligned layout: slice section query rows through the
                # [B, S, Nq/S, 3] view and stitch outputs back shard-major
                # (see SectionedEdgeSlots.shards)
                nl = Nq // S
                qpos_v = query_pos.reshape(B, S, nl, query_pos.shape[-1])
            remat_dec = parse_remat(cfg.remat)[1]
            outs = []
            off = 0
            for sec in sslots.sections:
                Ns = int(sec.lat_idx.shape[-2])
                if S > 1:
                    ns = Ns // S
                    qsec = qpos_v[:, :, off:off + ns].reshape(
                        B, Ns, query_pos.shape[-1])
                    off += ns
                else:
                    qsec = query_pos[:, off:off + Ns]
                    off += Ns
                chunk_s = effective_chunk(Ns, cfg.edge_chunk_size)
                pos_cs, _ = reshape_chunks(qsec, chunk_s)
                idx_cs = reshape_chunks(sec.lat_idx, chunk_s)[0]
                msk_cs = reshape_chunks(sec.mask, chunk_s)[0]

                def body(pos_c, idx_c, msk_c):
                    dec = gno(EdgeSlots(lat_idx=idx_c, mask=msk_c), pos_c,
                              latent_pos, latent_feats, direction="decoder")
                    return head(combine_scales([dec], pos_c))

                body = _ckpt(remat_dec, cfg.remat_policy)(body)
                out = jax.lax.map(lambda a: body(*a), (pos_cs, idx_cs, msk_cs))
                outs.append(out.swapaxes(0, 1).reshape(B, Ns, self.out_channels))
            if S > 1:
                # outs[i] is [B, S*ns_i, out] shard-major: stitch per shard
                # then flatten back to the permuted global node order
                parts = [o.reshape(B, S, -1, self.out_channels) for o in outs]
                return jnp.concatenate(parts, axis=2).reshape(
                    B, Nq, self.out_channels)
            return jnp.concatenate(outs, axis=1)

        flat_mode = any(isinstance(s, FlatEdgeChunks) for s in scale_slots)
        if flat_mode:
            if not all(isinstance(s, FlatEdgeChunks) for s in scale_slots):
                raise ValueError("all scales must share the edge layout")
            ncs = {s.num_chunks for s in scale_slots}
            if len(ncs) != 1 or Nq % next(iter(ncs)) != 0:
                raise ValueError("flat scales must share one chunking that divides N")
            chunk = Nq // ncs.pop()
        else:
            chunk = effective_chunk(Nq, cfg.edge_chunk_size)
        fuse = (
            cfg.fused_head
            and not use_geo
            and chunk < Nq
            and not self.is_initializing()
        )
        if fuse:
            # fused decode head: GNO + scale-combine + projection for one node
            # chunk in ONE (checkpointed) scan body. The only full-N tensors
            # the decode leaves behind are the [N, out] result and the saved
            # body inputs (views of pos/slots) — vs [N, C]-sized gno output +
            # projection intermediates saved for backward on the plain tail.
            pos_cs, _ = reshape_chunks(query_pos, chunk)
            if flat_mode:
                def body(pos_c, src_cs, dst_cs, msk_cs):
                    per_scale = [
                        gno._decoder_chunk_flat(latent_feats, pos_c, s, d, m)
                        for s, d, m in zip(src_cs, dst_cs, msk_cs)
                    ]
                    return head(combine_scales(per_scale, pos_c))

                body = _ckpt(parse_remat(cfg.remat)[1], cfg.remat_policy)(body)
                xs = (
                    pos_cs,
                    [jnp.moveaxis(s.src, 1, 0) for s in scale_slots],
                    [jnp.moveaxis(s.dst, 1, 0) for s in scale_slots],
                    [jnp.moveaxis(s.mask, 1, 0) for s in scale_slots],
                )
            else:
                def body(pos_c, idx_cs, msk_cs):
                    per_scale = [
                        gno(EdgeSlots(lat_idx=i, mask=m), pos_c, latent_pos,
                            latent_feats, direction="decoder")
                        for i, m in zip(idx_cs, msk_cs)
                    ]
                    return head(combine_scales(per_scale, pos_c))

                body = _ckpt(parse_remat(cfg.remat)[1], cfg.remat_policy)(body)
                xs = (
                    pos_cs,
                    [reshape_chunks(s.lat_idx, chunk)[0] for s in scale_slots],
                    [reshape_chunks(s.mask, chunk)[0] for s in scale_slots],
                )
            out = jax.lax.map(lambda a: body(*a), xs)
            B = query_pos.shape[0]
            return out.swapaxes(0, 1).reshape(B, Nq, self.out_channels)

        decoded_scales = []
        for slots in scale_slots:
            if use_fused:
                decoded, geo = fused(slots, query_pos, latent_feats, latent_pos,
                                     query_mask=query_mask)
            else:
                decoded = gno(slots, query_pos, latent_pos, latent_feats,
                              direction="decoder")
                geo = (
                    geoembed(slots, query_pos, latent_pos, direction="decoder",
                             query_mask=query_mask)
                    if use_geo else None
                )
            if use_geo:
                combined = jnp.concatenate([decoded, geo], axis=-1)
                decoded = recovery(combined)  # recovery MLP
            decoded_scales.append(decoded)

        out = combine_scales(decoded_scales, query_pos)
        return head(out)
