"""Host-side input pipeline: transforms, padding/bucketing, batching, prefetch.

Replaces the reference's DataLoader + UnifiedCollateFunction + EnrichedData
batching (src/data/collate_functions.py, pyg_datasets.py:9-31):

  - PyG's ragged edge-index offsets -> fixed-shape padded [B, N, ...] arrays
    with node masks (static shapes for XLA).
  - The reference's three graph-building modes are all supported:
      * on-device (default; the stencil search is a cheap jitted op)
      * 'asynchronous_graph_building': edge slots built host-side by a
        background thread pool during batching (collate_functions.py:73-131)
      * 'update_pt_files_with_edges' (precompute): edge masks computed once
        and stored alongside samples (stat.py:126-224)
  - Double-buffered device prefetch overlaps host IO with TPU compute.
"""
from __future__ import annotations

import logging
import queue
import threading
import time
from dataclasses import dataclass
from typing import Dict, Iterator, List, NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..metadata import Metadata
from .dataset import DatasetConfig, MeshDataset
from .transforms import normalize, rescale, rescale_new

logger = logging.getLogger(__name__)


class PointBatch(NamedTuple):
    """Static-shape batch of point clouds (the PyG Batch replacement).

    enc_slots / dec_slots optionally carry precomputed edge structures, one
    (lat_idx [B,N,K], mask [B,N,K]) EdgeSlots per scale — the analogue of the
    reference's `encoder_edge_index_s{i}` batch attributes (EnrichedData,
    pyg_datasets.py:9-31) without ragged index offsets."""

    pos: jnp.ndarray  # [B, N, 3] rescaled coordinates
    feats: jnp.ndarray  # [B, N, C_in] encoder input features (normalized)
    target: jnp.ndarray  # [B, N, C_out] normalized targets
    node_mask: jnp.ndarray  # [B, N] valid-node mask
    num_nodes: jnp.ndarray  # [B] true node counts
    enc_slots: Optional[tuple] = None  # tuple[EdgeSlots] per scale
    dec_slots: Optional[tuple] = None


def round_up(n: int, multiple: int) -> int:
    return ((n + multiple - 1) // multiple) * multiple


@dataclass
class SamplePreprocessor:
    """Per-sample transform chain: coordinate rescale + feature normalization +
    encoder feature assembly (parity: stat.py:277-304 composed transforms and
    magno.py:485-499 feature_attr gathering)."""

    stats: Dict[str, np.ndarray]
    metadata: Metadata
    use_rescale_new: bool = False
    encoder_feature_attr: object = "x"  # str or list, e.g. ["pos", "c"]

    def __call__(self, sample: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
        if self.use_rescale_new:
            pos = rescale_new(sample["pos"].astype(np.float32), (-1, 1), self.metadata.domain_x)
        else:
            pos = rescale(sample["pos"].astype(np.float32), (-1, 1))
        pos = pos.astype(np.float32)
        x = normalize(sample["x"], self.stats["mean"], self.stats["std"]).astype(np.float32)
        out = {"pos": pos, "x": x}
        if "c" in sample and "c_mean" in self.stats:
            out["c"] = normalize(sample["c"], self.stats["c_mean"], self.stats["c_std"]).astype(np.float32)
        elif "c" in sample:
            out["c"] = sample["c"].astype(np.float32)

        attrs = (
            self.encoder_feature_attr
            if isinstance(self.encoder_feature_attr, (list, tuple))
            else [self.encoder_feature_attr]
        )
        feats = []
        for a in attrs:
            if a not in out:
                raise AttributeError(
                    f"encoder requires feature attribute '{a}' but it was not found in the sample"
                )
            feats.append(out[a])
        out["enc_feats"] = np.concatenate(feats, axis=-1)
        return out


class BatchLoader:
    """Iterates padded PointBatches over a MeshDataset split.

    Supports per-process sharding for multi-host data parallelism (the
    DistributedSampler replacement, stat.py:367-397): each process sees
    indices[shard_index::num_shards].
    """

    def __init__(
        self,
        dataset: MeshDataset,
        preprocessor: SamplePreprocessor,
        batch_size: int,
        pad_num_nodes: Optional[int] = None,
        pad_multiple: int = 1024,
        shuffle: bool = False,
        drop_last: bool = False,
        seed: int = 0,
        num_shards: int = 1,
        shard_index: int = 0,
        num_workers: int = 0,
        slot_mode: str = "device",  # 'device' | 'async' | 'precomputed'
        slot_builder=None,  # callable(rescaled_pos)->dict for 'async'
        num_scales: int = 1,
        edge_layout="slots",  # 'slots' | 'flat' | [enc, dec] pair
        # (MAGNOConfig.edge_layout scalar-or-pair polymorphism)
        edge_chunk_size: Optional[int] = None,  # model chunking (flat layout)
        flat_order: str = "src",  # encoder flat ordering (MAGNOConfig.flat_order)
        flat_edges_per_chunk: int = 0,  # pinned E (MAGNOConfig.flat_edges_per_chunk)
        sectioned_profile=None,  # pinned per-chunk K list for 'sectioned'
        # (MAGNOConfig.sectioned_profile; without it the section structure is
        # derived per batch, and differing batches recompile the step)
        section_shards: int = 1,  # shard-ALIGNED sectioning for node-sharded
        # runs: build sections so every [B, Ns, Ks] leaf splits exactly at
        # node-shard boundaries (SectionedEdgeSlots.shards; set to the mesh's
        # node axis size). 1 = the single-device layout.
        device_cache: bool = False,  # keep built batches resident across epochs
        cache_put=None,  # callable(PointBatch)->PointBatch applied before caching
        # (trainers pass their device/mesh placement so cached entries live in
        # HBM; DatasetConfig.device_cache documents the trade-offs)
        host_arrays: bool = False,  # assemble NUMPY batches (host-staged mode)
        # At DrivAerML scale (>=4M nodes/batch) the default jnp assembly puts
        # every batch in HBM from the producer thread, so the prefetch queue
        # keeps 2-4 batches device-resident on top of the train step's temp
        # HBM — an OOM at 8M nodes on one v5e chip (observed, round 4: the
        # producer races ahead during the 15-min first compile and stages the
        # whole epoch). host_arrays keeps batches on HOST; the trainer's
        # per-step put places exactly ONE batch on device, directly in the
        # compiled entry layouts.
    ):
        self.dataset = dataset
        self.preprocessor = preprocessor
        self.batch_size = batch_size
        self.pad_multiple = pad_multiple
        self.pad_num_nodes = pad_num_nodes
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.epoch = 0
        self.num_shards = num_shards
        self.shard_index = shard_index
        self.num_workers = num_workers
        self.slot_mode = slot_mode
        self.slot_builder = slot_builder
        self.num_scales = num_scales
        from ..models.magno import parse_edge_layout

        self.edge_layout = parse_edge_layout(edge_layout)  # (enc, dec)
        self.edge_chunk_size = edge_chunk_size
        self.flat_order = flat_order
        self.flat_edges_per_chunk = flat_edges_per_chunk
        self.sectioned_profile = sectioned_profile
        self.section_shards = section_shards
        if "flat" in self.edge_layout and slot_mode == "device":
            raise ValueError("edge_layout 'flat' needs host-built slots "
                             "(slot_mode 'async' or 'precomputed')")
        if "sectioned" in self.edge_layout and slot_mode == "device":
            raise ValueError("edge_layout 'sectioned' needs host-built slots "
                             "(slot_mode 'async' or 'precomputed')")
        if host_arrays and device_cache:
            raise ValueError(
                "host_arrays and device_cache are mutually exclusive: the "
                "device cache keeps batches HBM-resident, which is exactly "
                "what host staging exists to avoid")
        self.host_arrays = host_arrays
        self.device_cache = device_cache
        self.cache_put = cache_put
        self._dcache: Dict[tuple, PointBatch] = {}

    def set_epoch(self, epoch: int) -> None:
        """Reshuffle per epoch (parity: DistributedSampler.set_epoch,
        optimizers.py:137-139)."""
        self.epoch = epoch

    def __len__(self) -> int:
        n = self._per_shard_len()
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _per_shard_len(self) -> int:
        # EQUAL per shard (ceil), like torch DistributedSampler — see _indices
        return -(-len(self.dataset) // self.num_shards)

    def _indices(self) -> np.ndarray:
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            np.random.default_rng([self.seed, self.epoch]).shuffle(idx)
        if self.num_shards > 1:
            # pad by wrapping around so EVERY shard gets the same count
            # (torch DistributedSampler semantics, reference stat.py:367-397).
            # Unequal shards would make multi-host processes dispatch a
            # different number of collective SPMD steps -> deadlock at the
            # gradient psum, and desynchronize steps_per_epoch/LR schedules.
            total = self._per_shard_len() * self.num_shards
            if total > idx.shape[0]:
                idx = np.resize(idx, total)  # cyclic tiling (handles n < shards)
        return idx[self.shard_index :: self.num_shards]

    def _make_batch(self, samples: List[Dict[str, np.ndarray]]) -> PointBatch:
        n_max = max(s["pos"].shape[0] for s in samples)
        n_pad = self.pad_num_nodes or round_up(n_max, self.pad_multiple)
        B = self.batch_size  # always pad batch dim too (static shapes)
        cin = samples[0]["enc_feats"].shape[-1]
        cout = samples[0]["x"].shape[-1]
        counts = np.zeros((B,), np.int32)
        counts[: len(samples)] = [min(s["pos"].shape[0], n_pad) for s in samples]

        def padded(key: str, C: int):
            # threaded native memcpy+memset (native/gaot_io.cpp pad_batch_f32);
            # numpy fallback when the library isn't built
            from .native_io import pad_batch_native

            arrs = [np.ascontiguousarray(s[key][:n_pad], np.float32) for s in samples]
            arrs += [np.zeros((0, C), np.float32)] * (B - len(samples))
            res = pad_batch_native(arrs, counts, n_pad)
            if res is not None:
                return res
            out = np.zeros((B, n_pad, C), np.float32)
            msk = np.zeros((B, n_pad), bool)
            for i, a in enumerate(arrs):
                n = a.shape[0]
                out[i, :n] = a
                msk[i, :n] = True
            return out, msk

        pos, mask = padded("pos", 3)
        feats, _ = padded("enc_feats", cin)
        target, _ = padded("x", cout)
        enc_slots = dec_slots = None
        if self.slot_mode != "device" and "slots" in samples[0]:
            from ..ops.grid_graph import EdgeSlots

            def pad_slots_np(direction):
                """Padded HOST arrays — flat conversion consumes these before
                any device placement (a jnp.asarray here would round-trip the
                full [B,N,K] slots through the device per batch just to
                flatten them back on the host)."""
                per_scale = []
                for sidx in range(self.num_scales):
                    K = samples[0]["slots"][direction][sidx][0].shape[-1]
                    idx = np.zeros((B, n_pad, K), np.int32)
                    msk = np.zeros((B, n_pad, K), bool)
                    for i, s in enumerate(samples):
                        si, sm = s["slots"][direction][sidx]
                        n = min(si.shape[0], n_pad)
                        idx[i, :n] = si[:n]
                        msk[i, :n] = sm[:n]
                    per_scale.append((idx, msk))
                return per_scale

            enc_np = pad_slots_np("encoder")
            dec_np = pad_slots_np("decoder")
            # alias bitwise-identical directions: for symmetric recipes
            # (same strategy/radius/grid both ways — e.g. the DrivAerNet
            # bidirectional r=0.033 recipe) the encoder and decoder slots are
            # the SAME (point, cell) pairs stored twice by the precompute.
            # Sharing the array halves slot HBM (~210 MiB at 8M nodes) — the
            # conversion memo below and the id-deduplicating layout put
            # (utils/layout.put_to_formats) both preserve the aliasing on
            # device. np.array_equal is a host memcmp (~0.1 s at 8M),
            # overlapped by the prefetch producer.
            dec_np = [
                e if (d[0] is e[0] or np.array_equal(d[0], e[0]))
                and (d[1] is e[1] or np.array_equal(d[1], e[1])) else d
                for e, d in zip(enc_np, dec_np)
            ]

            def to_flat(pairs, order):
                # per-chunk compacted edge lists (FlatEdgeChunks): chunking
                # must match the model's edge scan (effective_chunk)
                from ..models.integral_transform import effective_chunk
                from ..ops.grid_graph import flatten_slots_host_batched

                chunk = effective_chunk(n_pad, self.edge_chunk_size)
                return tuple(
                    flatten_slots_host_batched(
                        idx, msk, chunk, order=order,
                        edges_per_chunk=self.flat_edges_per_chunk,
                        host_arrays=self.host_arrays,
                    )
                    for idx, msk in pairs
                )

            conv = (lambda a: a) if self.host_arrays else jnp.asarray
            slot_memo: Dict[tuple, "EdgeSlots"] = {}

            def to_slots(pairs):
                # memo keyed by source-array identity: aliased enc/dec
                # directions convert to ONE device array, not two copies
                out = []
                for i, m in pairs:
                    key = (id(i), id(m))
                    if key not in slot_memo:
                        slot_memo[key] = EdgeSlots(conv(i), conv(m))
                    out.append(slot_memo[key])
                return tuple(out)

            # layout per side (MAGNOConfig.edge_layout scalar-or-pair)
            enc_layout, dec_layout = self.edge_layout
            if enc_layout == "sectioned":  # parse guarantees both sides
                # degree-sectioned layout: ONE shared node permutation per
                # sample (ascending combined degree, pads last). With
                # section_shards == 1 pads stay a single global tail (the
                # valid-prefix property holds); with shards > 1 the round-
                # robin deal places pads at the tail of EACH shard's range,
                # so consumers must select valid rows by node_mask, not by
                # [:n] prefix (trainer.test() does). One shared section
                # structure for enc/dec (keeps the aliasing).
                # The sample arrays are permuted to match.
                from ..models.integral_transform import effective_chunk
                from ..ops.grid_graph import section_slots_shared

                if self.num_scales != 1:
                    raise ValueError(
                        "edge_layout 'sectioned' supports a single scale")
                S = self.section_shards
                if n_pad % S != 0:
                    raise ValueError(
                        f"section_shards {S} must divide the padded node "
                        f"count {n_pad} (set pad_multiple to a multiple of "
                        "section_shards x edge_chunk_size)")
                chunkn = effective_chunk(n_pad // S, self.edge_chunk_size)
                perms, (enc_sect, dec_sect) = section_slots_shared(
                    [enc_np[0], dec_np[0]], chunkn, node_mask=mask,
                    profile=self.sectioned_profile,
                    host_arrays=self.host_arrays, shards=S,
                )
                rows = np.arange(B)[:, None]
                pos = np.ascontiguousarray(pos[rows, perms])
                feats = np.ascontiguousarray(feats[rows, perms])
                target = np.ascontiguousarray(target[rows, perms])
                mask = np.ascontiguousarray(mask[rows, perms])
                enc_slots = (enc_sect,)
                dec_slots = (dec_sect,)
            else:
                enc_slots = (
                    to_flat(enc_np, self.flat_order)
                    if enc_layout == "flat" else to_slots(enc_np)
                )
                dec_slots = (
                    to_flat(dec_np, "src")  # decoder fold invariant
                    if dec_layout == "flat" else to_slots(dec_np)
                )
        if self.host_arrays:
            return PointBatch(
                pos=pos, feats=feats, target=target, node_mask=mask,
                num_nodes=counts, enc_slots=enc_slots, dec_slots=dec_slots,
            )
        return PointBatch(
            pos=jnp.asarray(pos),
            feats=jnp.asarray(feats),
            target=jnp.asarray(target),
            node_mask=jnp.asarray(mask),
            num_nodes=jnp.asarray(counts),
            enc_slots=enc_slots,
            dec_slots=dec_slots,
        )

    def _load_one(self, i: int) -> Dict[str, np.ndarray]:
        raw = self.dataset[int(i)]
        out = self.preprocessor(raw)
        if self.slot_mode == "precomputed":
            from .graph_precompute import extract_precomputed_slots

            slots = extract_precomputed_slots(raw, self.num_scales)
            if slots is None:
                raise AttributeError(
                    "sample is missing precomputed edge slots; run the "
                    "update_pt_files_with_edges precompute sweep first"
                )
            out["slots"] = slots
        elif self.slot_mode == "async":
            # online graph building while batching (reference
            # collate_functions.py:73-131, in a loader thread here)
            out["slots"] = self.slot_builder(out["pos"])
        return out

    def __iter__(self) -> Iterator[PointBatch]:
        idx = self._indices()
        nb = len(idx) // self.batch_size if self.drop_last else -(-len(idx) // self.batch_size)
        if self.drop_last:
            idx = idx[: nb * self.batch_size]
        if self.device_cache:
            # HBM-resident batch cache keyed by the batch's sample ids: after
            # the first epoch every same-composition batch is a zero-copy
            # yield (DatasetConfig.device_cache). Worker threads are skipped —
            # post-warm epochs never touch host IO at all.
            for b in range(nb):
                chunk = idx[b * self.batch_size : (b + 1) * self.batch_size]
                key = tuple(int(i) for i in chunk)
                batch = self._dcache.get(key)
                if batch is None:
                    batch = self._make_batch([self._load_one(i) for i in chunk])
                    if self.cache_put is not None:
                        batch = self.cache_put(batch)
                    self._dcache[key] = batch
                yield batch
            return
        if self.num_workers > 0:
            # async host-side loading+preprocessing (the reference hides graph
            # building in CPU dataloader workers; we hide IO + transforms —
            # graph building itself runs on device). Lookahead is BOUNDED: at
            # most ~2 batches of samples are in flight, so a slow consumer
            # never accumulates the whole epoch in host memory (at DrivAerNet
            # scale one epoch is tens of GB).
            from collections import deque
            from concurrent.futures import ThreadPoolExecutor

            depth = max(self.num_workers, 2 * self.batch_size)
            with ThreadPoolExecutor(max_workers=self.num_workers) as ex:
                futures = deque(ex.submit(self._load_one, i) for i in idx[:depth])
                submitted = min(depth, len(idx))
                buf: List[Dict[str, np.ndarray]] = []
                while futures:
                    buf.append(futures.popleft().result())
                    if submitted < len(idx):
                        futures.append(ex.submit(self._load_one, idx[submitted]))
                        submitted += 1
                    if len(buf) == self.batch_size or (not futures and buf):
                        yield self._make_batch(buf)
                        buf = []
        else:
            for b in range(nb):
                chunk = idx[b * self.batch_size : (b + 1) * self.batch_size]
                yield self._make_batch([self._load_one(i) for i in chunk])


def prefetch_to_device(iterator: Iterator[PointBatch], size: int = 2,
                       put_fn=None, stats: Optional[dict] = None) -> Iterator[PointBatch]:
    """Double-buffered background prefetch: overlaps host batch assembly with
    device compute (replaces pin_memory/num_workers prefetching).

    put_fn overrides the device placement — distributed trainers pass a
    mesh-sharding put so large batches go host->shards directly instead of
    staging the whole batch on one device first.

    stats (optional dict) accumulates consumer-side stall accounting:
    'wait_s' = total time the consumer blocked on the queue, 'first_wait_s'
    = the warm-up wait for batch 1 (unavoidable cold load), 'gets' = batches
    yielded. Steady-state loader stall = wait_s - first_wait_s; ≈0 means the
    loader + host->device placement sustains the device step rate (the
    reference reports the analogous data_loading_ratio in its timed test,
    stat.py:620-668 — this extends it to the train loop)."""
    q: "queue.Queue" = queue.Queue(maxsize=size)
    sentinel = object()
    put = put_fn if put_fn is not None else jax.device_put
    iterator = iter(iterator)

    class _PrefetchError:
        def __init__(self, exc):
            self.exc = exc

    def producer():
        # propagate loader/placement errors to the consumer — a swallowed
        # exception here would read as a clean (short or empty) epoch, and a
        # zero-batch epoch trains on nothing while reporting loss 0.0
        try:
            while True:
                t0 = time.time()
                try:
                    item = next(iterator)
                except StopIteration:
                    break
                t1 = time.time()
                placed = put(item)
                t2 = time.time()
                if stats is not None:
                    # producer-side breakdown (distinct keys from the
                    # consumer's wait_s, so no cross-thread races matter):
                    # host_load_s = disk/mmap + batch assembly,
                    # put_s = host->device placement (on tunneled dev
                    # environments this is the transfer artifact; on real
                    # hosts it is PCIe/local)
                    stats["host_load_s"] = stats.get("host_load_s", 0.0) + (t1 - t0)
                    stats["put_s"] = stats.get("put_s", 0.0) + (t2 - t1)
                q.put(placed)
            q.put(sentinel)
        except BaseException as e:  # noqa: BLE001 — re-raised on the consumer
            q.put(_PrefetchError(e))

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        t0 = time.time()
        item = q.get()
        if stats is not None:
            w = time.time() - t0
            stats["wait_s"] = stats.get("wait_s", 0.0) + w
            if stats.get("gets", 0) == 0:
                stats["first_wait_s"] = w
            stats["gets"] = stats.get("gets", 0) + 1
        if item is sentinel:
            return
        if isinstance(item, _PrefetchError):
            raise item.exc
        yield item
