import os

import numpy as np
import pytest

from gaot3d_tpu.data.dataset import (
    DatasetConfig,
    MeshDataset,
    compute_or_load_stats,
    generate_synthetic_dataset,
    load_sample,
    save_sample,
)
from gaot3d_tpu.data.pipeline import BatchLoader, SamplePreprocessor, round_up
from gaot3d_tpu.data.transforms import rescale, rescale_new
from gaot3d_tpu.metadata import DATASET_METADATA


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("synth"))
    cfg = DatasetConfig(
        name="t", metaname="synthetic/unit_cube", base_path=root,
        processed_folder="processed", train_size=6, val_size=2, test_size=2,
        synthetic_num_samples=10, synthetic_num_nodes=100, batch_size=2,
        pad_multiple=64,
    )
    generate_synthetic_dataset(cfg, root)
    return root, cfg


def test_rescale_quirks():
    # the reference rescale is GLOBAL scalar min-max, not per-axis
    x = np.array([[0.0, 10.0, 5.0], [2.0, 4.0, 6.0]])
    out = rescale(x, (-1, 1))
    np.testing.assert_allclose(out.min(), -1.0)
    np.testing.assert_allclose(out.max(), 1.0)
    np.testing.assert_allclose(out[0, 0], -1.0)  # global min -> -1
    assert out[:, 0].max() < 0  # axis 0 does NOT span to +1 (quirk)
    out2 = rescale_new(x, (-1, 1), ([0, 0, 0], [10, 10, 10]))
    np.testing.assert_allclose(out2, x / 5.0 - 1.0)


def test_split_semantics(synth_root):
    root, cfg = synth_root
    train = MeshDataset(cfg, "train")
    val = MeshDataset(cfg, "val")
    test = MeshDataset(cfg, "test")
    assert len(train) == 6 and len(val) == 2 and len(test) == 2
    # test = LAST test_size entries (reference pyg_datasets.py:116)
    assert test.filenames == ["sample_00008", "sample_00009"]
    assert train.filenames[0] == "sample_00000"
    # overlap only possible via the reference's own -test_size: indexing
    assert not set(train.filenames) & set(test.filenames)


def test_stats_computed_and_cached(synth_root):
    root, cfg = synth_root
    ds = MeshDataset(cfg, "train")
    stats = compute_or_load_stats(cfg, ds)
    # manual check: mean/std over concatenated train nodes (unbiased std)
    xs = np.concatenate([ds[i]["x"] for i in range(len(ds))], axis=0)
    np.testing.assert_allclose(stats["mean"], xs.mean(0), rtol=1e-4)
    np.testing.assert_allclose(stats["std"], xs.std(0, ddof=1), rtol=1e-4)
    assert os.path.exists(os.path.join(root, "t_norm_stats.json"))
    stats2 = compute_or_load_stats(cfg)  # cached path
    np.testing.assert_allclose(stats2["mean"], stats["mean"], rtol=1e-6)


def test_batch_loader_padding_and_masks(synth_root):
    root, cfg = synth_root
    ds = MeshDataset(cfg, "train")
    stats = compute_or_load_stats(cfg, ds)
    pre = SamplePreprocessor(stats=stats, metadata=DATASET_METADATA[cfg.metaname])
    loader = BatchLoader(ds, pre, batch_size=4, pad_multiple=64)
    batches = list(loader)
    assert len(batches) == 2
    b = batches[0]
    assert b.pos.shape == (4, round_up(100, 64), 3)
    assert b.node_mask.shape == (4, 128)
    assert int(b.num_nodes[0]) == 100
    assert bool(b.node_mask[0, :100].all()) and not bool(b.node_mask[0, 100:].any())
    # last batch is padded to full batch size with empty graphs
    b2 = batches[1]
    assert b2.pos.shape[0] == 4
    assert int(np.asarray(b2.num_nodes)[2]) == 0


def test_batch_loader_bounded_lookahead(synth_root):
    """Worker loading yields the same batches as serial loading, and never
    holds more than ~2 batches of samples in flight (the round-1 loader
    submitted the whole epoch up front — tens of GB at DrivAerNet scale)."""
    import threading

    root, cfg = synth_root
    ds = MeshDataset(cfg, "train")
    stats = compute_or_load_stats(cfg, ds)
    pre = SamplePreprocessor(stats=stats, metadata=DATASET_METADATA[cfg.metaname])

    serial = list(BatchLoader(ds, pre, batch_size=2, pad_multiple=64))

    class CountingLoader(BatchLoader):
        def __init__(self, *a, **k):
            super().__init__(*a, **k)
            self.outstanding = 0
            self.high_water = 0
            self._lock = threading.Lock()

        def _load_one(self, i):
            with self._lock:
                self.outstanding += 1
                self.high_water = max(self.high_water, self.outstanding)
            try:
                return super()._load_one(i)
            finally:
                with self._lock:
                    self.outstanding -= 1

    loader = CountingLoader(ds, pre, batch_size=2, pad_multiple=64, num_workers=2)
    threaded = []
    for b in loader:
        threaded.append(b)
        # consume slowly: lookahead must stay bounded regardless
    assert len(threaded) == len(serial)
    for s, t in zip(serial, threaded):
        np.testing.assert_array_equal(np.asarray(s.pos), np.asarray(t.pos))
        np.testing.assert_array_equal(np.asarray(s.feats), np.asarray(t.feats))
        np.testing.assert_array_equal(np.asarray(s.num_nodes), np.asarray(t.num_nodes))
    # depth = max(num_workers, 2*batch_size) = 4 concurrent loads at most
    assert loader.high_water <= 4


def test_batch_loader_sharding_and_epoch_shuffle(synth_root):
    root, cfg = synth_root
    ds = MeshDataset(cfg, "train")
    stats = compute_or_load_stats(cfg, ds)
    pre = SamplePreprocessor(stats=stats, metadata=DATASET_METADATA[cfg.metaname])
    l0 = BatchLoader(ds, pre, batch_size=1, shuffle=True, seed=3, num_shards=2, shard_index=0)
    l1 = BatchLoader(ds, pre, batch_size=1, shuffle=True, seed=3, num_shards=2, shard_index=1)
    i0 = l0._indices()
    i1 = l1._indices()
    assert len(set(i0) & set(i1)) == 0
    assert len(i0) + len(i1) == 6
    l0.set_epoch(1)
    assert list(l0._indices()) != list(i0)


def test_pt_sample_loading_roundtrip(tmp_path):
    """Reference-format .pt samples load via torch CPU."""
    torch = pytest.importorskip("torch")
    pos = np.random.default_rng(0).normal(size=(50, 3)).astype(np.float32)
    x = np.random.default_rng(1).normal(size=(50, 1)).astype(np.float32)
    p = str(tmp_path / "s.pt")
    torch.save({"pos": torch.tensor(pos), "x": torch.tensor(x)}, p)
    sample = load_sample(p)
    np.testing.assert_allclose(sample["pos"], pos)
    np.testing.assert_allclose(sample["x"], x)


def test_npz_save_atomic(tmp_path):
    p = str(tmp_path / "s.npz")
    save_sample(p, {"pos": np.zeros((3, 3), np.float32)})
    assert os.path.exists(p) and not os.path.exists(p + ".tmp.npz")
    out = load_sample(p)
    assert out["pos"].shape == (3, 3)


def test_shards_equal_length_with_wraparound(synth_root):
    """Per-process shards must have EQUAL batch counts (DistributedSampler
    semantics): unequal counts would make multi-host processes dispatch a
    different number of collective SPMD steps and deadlock at the psum."""
    import dataclasses

    root, cfg = synth_root
    cfg7 = dataclasses.replace(cfg, train_size=7)  # odd across 2 shards
    ds = MeshDataset(cfg7, "train")
    pre = SamplePreprocessor(stats={"mean": np.zeros(1, np.float32),
                                    "std": np.ones(1, np.float32)},
                             metadata=DATASET_METADATA[cfg.metaname])
    loaders = [
        BatchLoader(ds, preprocessor=pre, batch_size=2, pad_multiple=64,
                    num_shards=2, shard_index=i, drop_last=True, seed=3,
                    shuffle=True)
        for i in range(2)
    ]
    counts = [sum(1 for _ in ld) for ld in loaders]
    assert counts[0] == counts[1] == len(loaders[0]) == len(loaders[1])
    # every dataset index is still covered across shards (epoch coverage)
    seen = set()
    for ld in loaders:
        for idx in ld._indices():
            seen.add(int(idx))
    assert seen == set(range(7))


def test_prefetch_propagates_loader_errors():
    """A failing loader must raise in the consumer, not end the epoch silently
    (a swallowed error reads as loss 0.0 over zero batches)."""
    import jax

    from gaot3d_tpu.data.pipeline import prefetch_to_device

    def bad_iterator():
        yield jax.numpy.zeros(())
        raise RuntimeError("corrupt sample file")

    it = prefetch_to_device(bad_iterator())
    next(it)
    with pytest.raises(RuntimeError, match="corrupt sample file"):
        next(it)


def test_stats_active_variables_no_double_filter(tmp_path):
    """Computed stats are already in active-variable space (the dataset slices
    x at load); they must be cached per-selection and NOT re-indexed. The
    reference re-indexes its equally-pre-sliced stats (stat.py:283-286) — a
    latent bug that only works for prefix selections; not replicated."""
    import dataclasses

    root = str(tmp_path)
    processed = os.path.join(root, "processed")
    os.makedirs(processed)
    rng = np.random.default_rng(0)
    names = [f"s{i}" for i in range(4)]
    for name in names:
        save_sample(os.path.join(processed, name + ".npz"),
                    {"pos": rng.uniform(-1, 1, (50, 3)).astype(np.float32),
                     "x": rng.normal(size=(50, 2)).astype(np.float32)})
    with open(os.path.join(root, "order_processed.txt"), "w") as f:
        f.write("\n".join(names) + "\n")
    cfg = DatasetConfig(name="avt", metaname="synthetic/unit_cube",
                        base_path=root, processed_folder="processed",
                        train_size=2, val_size=1, test_size=1)
    full = compute_or_load_stats(cfg, MeshDataset(cfg, "train"))
    av = [1]  # NON-prefix selection: crashes under double-filtering
    cfg_av = dataclasses.replace(cfg, active_variables=av)
    stats = compute_or_load_stats(cfg_av, MeshDataset(cfg_av, "train"))
    assert stats["mean"].shape == (1,)
    np.testing.assert_allclose(stats["mean"], full["mean"][av], rtol=1e-6)
    # the selection-keyed cache must not collide with the full-width one
    import glob

    assert glob.glob(os.path.join(root, "*_av1.json"))


def test_device_cache_reyields_without_reload(synth_root):
    """device_cache=True (DatasetConfig.device_cache): epoch 2+ must re-yield
    the SAME cached batch objects with zero _load_one calls (the whole point —
    no host IO, no host->device upload post-warm), with cache_put applied
    exactly once per distinct batch, values identical to the uncached loader,
    and shuffle reordering (batch_size=1) still hitting the cache."""
    import threading

    root, cfg = synth_root
    ds = MeshDataset(cfg, "train")
    stats = compute_or_load_stats(cfg, ds)
    pre = SamplePreprocessor(stats=stats, metadata=DATASET_METADATA[cfg.metaname])

    class CountingLoader(BatchLoader):
        def __init__(self, *a, **k):
            super().__init__(*a, **k)
            self.loads = 0
            self._lock = threading.Lock()

        def _load_one(self, i):
            with self._lock:
                self.loads += 1
            return super()._load_one(i)

    puts = []
    loader = CountingLoader(ds, pre, batch_size=1, shuffle=True, seed=7,
                            pad_multiple=64, device_cache=True,
                            cache_put=lambda b: (puts.append(id(b)) or b))
    plain = BatchLoader(ds, pre, batch_size=1, shuffle=True, seed=7,
                        pad_multiple=64)

    loader.set_epoch(0)
    plain.set_epoch(0)
    e0 = list(loader)
    for got, want in zip(e0, list(plain)):
        np.testing.assert_array_equal(np.asarray(got.pos), np.asarray(want.pos))
        np.testing.assert_array_equal(np.asarray(got.feats), np.asarray(want.feats))
    assert loader.loads == len(ds) and len(puts) == len(e0)

    loader.set_epoch(1)  # reshuffles; batch_size=1 keys are order-invariant
    e1 = list(loader)
    assert loader.loads == len(ds), "epoch 2 must not touch host IO"
    assert len(puts) == len(e0), "cache_put must run once per distinct batch"
    assert {id(b) for b in e1} == {id(b) for b in e0}, "cached objects re-yielded"


def test_prefetch_stats_accounting():
    """prefetch_to_device(stats=...) must report gets == batches + 1 sentinel
    wait folded in, first_wait_s captured from batch 1, and steady-state
    stall (wait_s - first_wait_s) ~0 when the consumer is slower than the
    producer (the whole point of the train-loop stall metric)."""
    import time as _t

    from gaot3d_tpu.data.pipeline import prefetch_to_device

    items = [object() for _ in range(5)]

    def slow_first():
        for j, it in enumerate(items):
            if j == 0:
                _t.sleep(0.05)  # cold first load
            yield it

    stats = {}
    got = []
    for x in prefetch_to_device(iter(slow_first()), put_fn=lambda b: b,
                                stats=stats):
        _t.sleep(0.02)  # consumer slower than producer -> no steady stall
        got.append(x)
    assert got == items
    assert stats["gets"] == len(items) + 1  # + sentinel
    assert stats["first_wait_s"] >= 0.04
    steady = stats["wait_s"] - stats["first_wait_s"]
    assert steady < 0.03, f"unexpected steady-state stall {steady}"
    # producer-side breakdown: host_load_s captures the iterator time
    # (incl. the cold first load), put_s the placement time
    assert stats["host_load_s"] >= 0.04
    assert stats["put_s"] >= 0.0


def test_host_arrays_loader_matches_device_and_aliases_slots(synth_root):
    """host_arrays=True assembles NUMPY batches (the host-staged-prefetch
    contract: nothing touches the device until the trainer's single
    entry-layout put), with values identical to the default device assembly.
    Bitwise-equal encoder/decoder slot arrays must alias to ONE array in both
    modes — symmetric recipes (same strategy/radius both directions) store
    the same (point, cell) pairs twice, ~210 MiB of slot HBM at 8M nodes."""
    import jax

    root, cfg = synth_root
    ds = MeshDataset(cfg, "train")
    stats = compute_or_load_stats(cfg, ds)
    pre = SamplePreprocessor(stats=stats, metadata=DATASET_METADATA[cfg.metaname])

    def builder(pos):
        n = pos.shape[0]
        idx = ((np.arange(n, dtype=np.int32)[:, None] * 3) % 7
               + np.arange(2, dtype=np.int32))
        msk = np.ones((n, 2), bool)
        # distinct-but-equal decoder arrays: assembly must detect + alias
        return {"encoder": [(idx, msk)], "decoder": [(idx.copy(), msk.copy())]}

    kw = dict(batch_size=2, pad_multiple=64, slot_mode="async",
              slot_builder=builder, num_scales=1)
    dev = list(BatchLoader(ds, pre, **kw))
    host = list(BatchLoader(ds, pre, host_arrays=True, **kw))
    assert len(dev) == len(host) > 0
    for d, h in zip(dev, host):
        for leaf in jax.tree.leaves(h):
            assert isinstance(leaf, np.ndarray), type(leaf)
        for leaf in jax.tree.leaves(d):
            assert not isinstance(leaf, np.ndarray), type(leaf)
        np.testing.assert_array_equal(np.asarray(d.pos), h.pos)
        np.testing.assert_array_equal(np.asarray(d.feats), h.feats)
        np.testing.assert_array_equal(np.asarray(d.target), h.target)
        np.testing.assert_array_equal(np.asarray(d.num_nodes), h.num_nodes)
        np.testing.assert_array_equal(
            np.asarray(d.enc_slots[0].lat_idx), h.enc_slots[0].lat_idx)
        np.testing.assert_array_equal(
            np.asarray(d.enc_slots[0].mask), h.enc_slots[0].mask)
        # equal directions alias to the SAME EdgeSlots object (both modes)
        assert h.dec_slots[0] is h.enc_slots[0]
        assert d.dec_slots[0] is d.enc_slots[0]


def test_host_arrays_no_alias_when_directions_differ(synth_root):
    """Asymmetric enc/dec slots must NOT be aliased (correctness guard for
    the bitwise-equality check)."""
    root, cfg = synth_root
    ds = MeshDataset(cfg, "train")
    stats = compute_or_load_stats(cfg, ds)
    pre = SamplePreprocessor(stats=stats, metadata=DATASET_METADATA[cfg.metaname])

    def builder(pos):
        n = pos.shape[0]
        idx = ((np.arange(n, dtype=np.int32)[:, None] * 3) % 7
               + np.arange(2, dtype=np.int32))
        msk = np.ones((n, 2), bool)
        return {"encoder": [(idx, msk)], "decoder": [(idx + 1, msk)]}

    loader = BatchLoader(ds, pre, batch_size=2, pad_multiple=64,
                         slot_mode="async", slot_builder=builder,
                         num_scales=1, host_arrays=True)
    b = next(iter(loader))
    assert b.dec_slots[0] is not b.enc_slots[0]
    np.testing.assert_array_equal(
        b.dec_slots[0].lat_idx[b.dec_slots[0].mask],
        b.enc_slots[0].lat_idx[b.enc_slots[0].mask] + 1)


def test_host_arrays_rejects_device_cache(synth_root):
    root, cfg = synth_root
    ds = MeshDataset(cfg, "train")
    stats = compute_or_load_stats(cfg, ds)
    pre = SamplePreprocessor(stats=stats, metadata=DATASET_METADATA[cfg.metaname])
    with pytest.raises(ValueError, match="mutually exclusive"):
        BatchLoader(ds, pre, batch_size=2, pad_multiple=64,
                    host_arrays=True, device_cache=True)


def _varied_degree_builder(pos):
    """Deterministic valid-first slots with degree spread 0..3 (K=4)."""
    n = pos.shape[0]
    deg = (np.arange(n) % 4).astype(np.int64)
    idx = (((np.arange(n, dtype=np.int32)[:, None] * 5) % 7
            + np.arange(4, dtype=np.int32)) % 8)
    msk = np.arange(4)[None, :] < deg[:, None]
    return {"encoder": [(idx, msk)], "decoder": [(idx, msk)]}


def test_sectioned_loader_permutes_and_sections(synth_root):
    """edge_layout='sectioned': the loader degree-sorts each sample (pads
    last, valid prefix preserved), permutes pos/feats/target/mask together,
    builds one shared SectionedEdgeSlots for enc+dec (aliasing preserved),
    and preserves the per-sample edge set exactly."""
    from gaot3d_tpu.ops.grid_graph import SectionedEdgeSlots

    root, cfg = synth_root
    ds = MeshDataset(cfg, "train")
    stats = compute_or_load_stats(cfg, ds)
    pre = SamplePreprocessor(stats=stats, metadata=DATASET_METADATA[cfg.metaname])
    kw = dict(batch_size=2, pad_multiple=64, slot_mode="async",
              slot_builder=_varied_degree_builder, num_scales=1,
              edge_chunk_size=32, host_arrays=True)
    slotted = list(BatchLoader(ds, pre, **kw))
    sectioned = list(BatchLoader(ds, pre, edge_layout="sectioned", **kw))
    assert len(slotted) == len(sectioned) > 0
    for s0, s1 in zip(slotted, sectioned):
        B, N = s0.pos.shape[:2]
        sect = s1.enc_slots[0]
        assert isinstance(sect, SectionedEdgeSlots)
        assert s1.dec_slots[0] is sect  # symmetric directions stay aliased
        assert sect.num_nodes == N
        assert sect.num_slot_rows < N * 4  # degree spread -> fewer rows
        # valid-node prefix preserved (pads sort last)
        for b in range(B):
            nv = int(s0.node_mask[b].sum())
            assert int(s1.node_mask[b].sum()) == nv
            assert s1.node_mask[b, :nv].all()
            assert not s1.node_mask[b, nv:].any()
        for b in range(B):
            # Recover the permutation over the VALID prefix by matching pos
            # rows (unique random floats). Pad rows are identical zeros so
            # pos matching cannot distinguish them — check them separately:
            # pads sort last (asserted above) and carry no edges (mask all
            # False), so any pad ordering is equivalent.
            nv = int(s0.node_mask[b].sum())
            order = {tuple(r): i for i, r in enumerate(s0.pos[b][:nv])}
            perm_v = np.array([order[tuple(r)] for r in s1.pos[b][:nv]])
            assert sorted(perm_v.tolist()) == list(range(nv))
            np.testing.assert_array_equal(s1.pos[b][nv:], s0.pos[b][nv:])
            perm = np.concatenate([perm_v, np.arange(nv, N)])
            np.testing.assert_array_equal(s1.feats[b][:nv],
                                          s0.feats[b][perm_v])
            np.testing.assert_array_equal(s1.target[b][:nv],
                                          s0.target[b][perm_v])
            np.testing.assert_array_equal(s1.feats[b][nv:], s0.feats[b][nv:])
            np.testing.assert_array_equal(s1.target[b][nv:],
                                          s0.target[b][nv:])
            # edge set preserved: (original node, cell) pairs
            lat0 = s0.enc_slots[0].lat_idx[b]
            msk0 = s0.enc_slots[0].mask[b]
            want = {(i, int(lat0[i, k])) for i in range(N) for k in range(4)
                    if msk0[i, k]}
            got = set()
            degs_sorted = []
            off = 0
            for sec in sect.sections:
                Ns, Ks = sec.lat_idx.shape[1:]
                for i in range(Ns):
                    degs_sorted.append(int(sec.mask[b, i].sum()))
                    for k in range(Ks):
                        if sec.mask[b, i, k]:
                            got.add((int(perm[off + i]), int(sec.lat_idx[b, i, k])))
                off += Ns
            assert got == want
            # ascending degree over the valid prefix
            nv = int(s1.node_mask[b].sum())
            dv = degs_sorted[:nv]
            assert dv == sorted(dv)


def test_sectioned_profile_pinning(synth_root):
    """sectioned_profile pins the section structure (static compiled shapes
    across batches); a profile below the observed max degree refuses."""
    root, cfg = synth_root
    ds = MeshDataset(cfg, "train")
    stats = compute_or_load_stats(cfg, ds)
    pre = SamplePreprocessor(stats=stats, metadata=DATASET_METADATA[cfg.metaname])
    kw = dict(batch_size=2, pad_multiple=64, slot_mode="async",
              slot_builder=_varied_degree_builder, num_scales=1,
              edge_chunk_size=32, host_arrays=True, edge_layout="sectioned")
    # The profile is one entry per edge chunk of the ACTUAL padded N (the
    # ~100-node synth samples pad to 128 with pad_multiple=64, not to 64) —
    # probe a batch to get it rather than hardcoding.
    probe = next(iter(BatchLoader(ds, pre, **kw)))
    nc = probe.pos.shape[1] // 32
    pinned = list(BatchLoader(ds, pre, sectioned_profile=[4] * nc, **kw))
    for b in pinned:
        # one merged section at the pinned width
        assert len(b.enc_slots[0].sections) == 1
        assert b.enc_slots[0].sections[0].lat_idx.shape[-1] == 4
    with pytest.raises(ValueError, match="edges would be dropped"):
        list(BatchLoader(ds, pre, sectioned_profile=[1] * nc, **kw))


def test_sectioned_rejects_device_slot_mode(synth_root):
    root, cfg = synth_root
    ds = MeshDataset(cfg, "train")
    stats = compute_or_load_stats(cfg, ds)
    pre = SamplePreprocessor(stats=stats, metadata=DATASET_METADATA[cfg.metaname])
    with pytest.raises(ValueError, match="host-built slots"):
        BatchLoader(ds, pre, batch_size=2, pad_multiple=64,
                    edge_layout="sectioned")
