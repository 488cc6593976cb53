"""Native packed feature store: roundtrip, featurization parity with the
Python reference formula, batch gather, and missing-key handling."""

import numpy as np
import pytest

from vlp_tpu.data.example_builder import featurize_regions

native = pytest.importorskip("vlp_tpu.data.native_store")


@pytest.fixture(scope="module")
def packed(tmp_path_factory):
    rng = np.random.default_rng(0)
    nr, fd, cd, bd = 10, 32, 24, 6
    keys = [f"img{i:04d}" for i in range(20)]
    records = {}
    for k in keys:
        bbox = np.zeros((nr, bd), np.float32)
        xy = rng.uniform(0, 500, (nr, 2))
        wh = rng.uniform(5, 100, (nr, 2))
        bbox[:, :2] = xy
        bbox[:, 2:4] = xy + wh
        bbox[:, 5] = rng.uniform(0, 1, nr)
        records[k] = (rng.normal(size=(nr, fd)).astype(np.float32),
                      rng.uniform(size=(nr, cd)).astype(np.float32),
                      bbox)
    path = str(tmp_path_factory.mktemp("store") / "feats.vlps")
    native.pack_store(path, keys, records, n_regions=nr, feat_dim=fd,
                      cls_dim=cd, bbox_dim=bd)
    return path, keys, records


def test_roundtrip_raw(packed):
    path, keys, records = packed
    store = native.PackedFeatureStore(path)
    assert store.n_records == len(keys)
    feat, cls, bbox = store.raw(keys[3])
    np.testing.assert_array_equal(feat, records[keys[3]][0])
    np.testing.assert_array_equal(cls, records[keys[3]][1])
    np.testing.assert_array_equal(bbox, records[keys[3]][2])


def test_featurize_parity_with_python(packed):
    """C++ fused featurization must equal featurize_regions exactly
    (which is itself parity-tested against the torch reference)."""
    path, keys, records = packed
    store = native.PackedFeatureStore(path)
    for k in keys[:5]:
        feat, pe = store.get(k)
        want = featurize_regions(records[k][2], records[k][1])
        np.testing.assert_allclose(pe, want, rtol=2e-5, atol=2e-5)
        np.testing.assert_array_equal(feat, records[k][0])


def test_batch_get_threaded(packed):
    path, keys, records = packed
    store = native.PackedFeatureStore(path, n_threads=4)
    feat, pe = store.batch_get(keys)
    assert feat.shape == (len(keys), store.n_regions, store.feat_dim)
    for j, k in enumerate(keys):
        np.testing.assert_array_equal(feat[j], records[k][0])
        np.testing.assert_allclose(
            pe[j], featurize_regions(records[k][2], records[k][1]),
            rtol=2e-5, atol=2e-5)


def test_gather_into_matches_per_example(packed):
    """One-call batched gather into slabs (the loader hot path) must equal
    per-example get_into byte-for-byte."""
    path, keys, records = packed
    store = native.PackedFeatureStore(path, n_threads=4)
    sel = keys[3:9]
    fb = np.empty((len(sel), store.n_regions, store.feat_dim), np.float32)
    pb = np.empty((len(sel), store.n_regions, store.pe_dim), np.float32)
    store.gather_into(sel, fb, pb)
    for j, k in enumerate(sel):
        f1 = np.empty((store.n_regions, store.feat_dim), np.float32)
        p1 = np.empty((store.n_regions, store.pe_dim), np.float32)
        store.get_into(k, f1, p1)
        np.testing.assert_array_equal(fb[j], f1)
        np.testing.assert_array_equal(pb[j], p1)
    with pytest.raises(KeyError):
        store.gather_into(["nope"], fb[:1], pb[:1])


def test_trainloader_batched_gather_matches_per_example(packed):
    """TrainLoader with a gather_into-capable store + slabs (batched C++
    path) must yield exactly the batches of the per-example path."""
    from vlp_tpu.data.dataset import CaptionExample
    from vlp_tpu.data.example_builder import TrainExampleBuilder
    from vlp_tpu.data.loader import TrainLoader
    from vlp_tpu.config import VLPConfig

    path, keys, records = packed
    store = native.PackedFeatureStore(path, n_threads=2)
    cfg = VLPConfig.tiny(vocab_size=32, hidden_size=32, num_hidden_layers=1,
                         num_attention_heads=2, intermediate_size=32,
                         len_vis_input=store.n_regions, max_len_b=5,
                         max_pred=3, vis_feat_dim=store.feat_dim,
                         vis_cls_dim=store.cls_dim,
                         vis_pe_dim=store.pe_dim)
    vocab = {w: i for i, w in enumerate(
        ["[PAD]", "[UNK]", "[X_SEP]", "[CLS]", "[SEP]", "[MASK]", "a",
         "man", "dog", "rides"])}
    builders = [TrainExampleBuilder(cfg, vocab, mode="s2s"),
                TrainExampleBuilder(cfg, vocab, mode="bi")]
    exs = [CaptionExample(k, ["a", "man", "rides"], image_id=i)
           for i, k in enumerate(keys)]

    def run(slots):
        loader = TrainLoader(exs, store, builders, [0.75, 0.25],
                             batch_size=4, num_workers=2, seed=3,
                             feature_slab_slots=slots)
        return [{k2: v.copy() for k2, v in b.items()}
                for b in loader.epoch(0)]

    base = run(0)       # per-example store.get path
    fast = run(6)       # slab + gather_into path
    assert len(base) == len(fast) == 5
    for b1, b2 in zip(base, fast):
        for k2 in b1:
            np.testing.assert_array_equal(b1[k2], b2[k2], err_msg=k2)


def test_missing_key(packed):
    path, keys, _ = packed
    store = native.PackedFeatureStore(path)
    with pytest.raises(KeyError):
        store.get("nope")
    assert store.find("nope") == -1


def test_key_path_normalisation(packed):
    """Store keys are bare image ids; lookups accept full .npy paths."""
    path, keys, records = packed
    store = native.PackedFeatureStore(path)
    feat, _ = store.get(f"/data/coco/trainval/{keys[0]}.npy")
    np.testing.assert_array_equal(feat, records[keys[0]][0])


def test_make_store_packed_route(packed):
    from vlp_tpu.data.features import make_store
    path, keys, records = packed
    store = make_store(packed_file=path)
    feat, pe = store.get(keys[0])
    np.testing.assert_array_equal(feat, records[keys[0]][0])


@pytest.fixture(scope="module")
def packed16(packed, tmp_path_factory):
    """The same records in a half-precision (v2) file."""
    _, keys, records = packed
    nr, fd = records[keys[0]][0].shape
    cd = records[keys[0]][1].shape[1]
    bd = records[keys[0]][2].shape[1]
    path = str(tmp_path_factory.mktemp("store16") / "feats16.vlps")
    native.pack_store(path, keys, records, n_regions=nr, feat_dim=fd,
                      cls_dim=cd, bbox_dim=bd, dtype=np.float16)
    return path, keys, records


class TestHalfPrecisionStore:
    def test_meta_and_get_dtype(self, packed16):
        path, keys, records = packed16
        store = native.PackedFeatureStore(path)
        assert store.dtype == np.float16
        feat, pe = store.get(keys[0])
        assert feat.dtype == np.float16 and pe.dtype == np.float16

    def test_featurize_parity_fp16(self, packed16):
        """fp16 store, fp16 out: LN math is fp32 inside, so error is pure
        quantization (~1e-3 for unit-scale values)."""
        path, keys, records = packed16
        store = native.PackedFeatureStore(path)
        for k in keys[:5]:
            feat, pe = store.get(k)
            want = featurize_regions(records[k][2], records[k][1])
            np.testing.assert_allclose(pe.astype(np.float32), want,
                                       rtol=0, atol=4e-3)
            np.testing.assert_allclose(feat.astype(np.float32),
                                       records[k][0], rtol=0, atol=3e-3)

    def test_fp32_out_from_fp16_store(self, packed16):
        """get_into with float32 buffers upconverts (input precision is
        still fp16, so same tolerance)."""
        path, keys, records = packed16
        store = native.PackedFeatureStore(path)
        feat = np.empty((store.n_regions, store.feat_dim), np.float32)
        pe = np.empty((store.n_regions, store.pe_dim), np.float32)
        store.get_into(keys[2], feat, pe)
        want = featurize_regions(records[keys[2]][2], records[keys[2]][1])
        np.testing.assert_allclose(pe, want, rtol=0, atol=4e-3)

    def test_batch_dtype_override(self, packed16):
        path, keys, _ = packed16
        store = native.PackedFeatureStore(path, n_threads=2)
        f16, p16 = store.batch_get(keys[:4])
        f32, p32 = store.batch_get(keys[:4], dtype=np.float32)
        assert f16.dtype == np.float16 and f32.dtype == np.float32
        np.testing.assert_allclose(p16.astype(np.float32), p32, rtol=0,
                                   atol=1e-3)

    def test_raw_upconverts(self, packed16):
        path, keys, records = packed16
        store = native.PackedFeatureStore(path)
        feat, cls, bbox = store.raw(keys[1])
        assert feat.dtype == np.float32
        np.testing.assert_allclose(cls, records[keys[1]][1], rtol=0,
                                   atol=1e-3)

    def test_loader_slabs_follow_store_dtype(self, packed16):
        """TrainLoader slab recycling keeps halves end-to-end and the
        builder must not upcast them (vis_feats arrives fp16 on device,
        where the model casts to its compute dtype)."""
        from vlp_tpu.config import VLPConfig
        from vlp_tpu.data.dataset import CaptionExample
        from vlp_tpu.data.example_builder import TrainExampleBuilder
        from vlp_tpu.data.loader import TrainLoader

        path, keys, _ = packed16
        store = native.PackedFeatureStore(path)
        cfg = VLPConfig(len_vis_input=store.n_regions,
                        vis_feat_dim=store.feat_dim,
                        vis_cls_dim=store.cls_dim, max_pred=4)
        vocab = {"[PAD]": 0, "[UNK]": 1, "[CLS]": 2, "[SEP]": 3, "[MASK]": 4,
                 "a": 10, "b": 11}
        builder = TrainExampleBuilder(cfg, vocab, mode="s2s", mask_prob=0.15,
                                      max_pred=4, new_segment_ids=True)
        examples = [CaptionExample(k, ["a", "b"], image_id=i)
                    for i, k in enumerate(keys)]
        loader = TrainLoader(examples, store, [builder], [1.0], 4,
                             num_workers=1, prefetch=2,
                             feature_slab_slots=4)
        batch = next(loader.epoch(0))
        assert batch["vis_feats"].dtype == np.float16
        assert batch["vis_pe"].dtype == np.float16
        assert batch["input_ids"].shape == (4, cfg.seq_len)


@pytest.fixture(scope="module", params=[np.float32, np.float16],
                ids=["fp32", "fp16"])
def packed_pe(request, packed, tmp_path_factory):
    """The same records in a v3 file (featurization precomputed at pack
    time), in both precisions."""
    _, keys, records = packed
    nr, fd = records[keys[0]][0].shape
    cd = records[keys[0]][1].shape[1]
    path = str(tmp_path_factory.mktemp("storev3")
               / f"feats_pe_{np.dtype(request.param).name}.vlps")
    native.pack_store(path, keys, records, n_regions=nr, feat_dim=fd,
                      cls_dim=cd, dtype=request.param, precompute_pe=True)
    return path, keys, records, np.dtype(request.param)


class TestPrecomputedPeStore:
    def test_meta(self, packed_pe):
        path, keys, records, dtype = packed_pe
        store = native.PackedFeatureStore(path)
        assert store.version == 3 and store.precomputed_pe
        assert store.dtype == dtype
        assert store.pe_dim == 6 + records[keys[0]][1].shape[1]

    def test_get_matches_runtime_featurization(self, packed_pe):
        """A v3 gather (pure memcpy in C++) must return the same vis_pe the
        v1/v2 runtime featurization computes, up to storage quantization."""
        path, keys, records, dtype = packed_pe
        store = native.PackedFeatureStore(path)
        atol = 0 if dtype == np.float32 else 4e-3
        for k in keys[:5]:
            feat, pe = store.get(k)
            assert feat.dtype == dtype and pe.dtype == dtype
            want = featurize_regions(records[k][2], records[k][1])
            if dtype == np.float32:
                np.testing.assert_array_equal(pe, want)
            else:
                np.testing.assert_allclose(pe.astype(np.float32), want,
                                           rtol=0, atol=atol)

    def test_gather_into_and_dtype_conversion(self, packed_pe):
        """Batched slab gather works, including store->output dtype
        conversion both ways."""
        path, keys, records, dtype = packed_pe
        store = native.PackedFeatureStore(path, n_threads=2)
        for out_dtype in (np.float32, np.float16):
            fb = np.empty((4, store.n_regions, store.feat_dim), out_dtype)
            pb = np.empty((4, store.n_regions, store.pe_dim), out_dtype)
            store.gather_into(keys[2:6], fb, pb)
            for j, k in enumerate(keys[2:6]):
                want = featurize_regions(records[k][2], records[k][1])
                np.testing.assert_allclose(pb[j].astype(np.float32), want,
                                           rtol=0, atol=5e-3)
                np.testing.assert_allclose(fb[j].astype(np.float32),
                                           records[k][0], rtol=0, atol=3e-3)

    def test_raw_unavailable(self, packed_pe):
        path = packed_pe[0]
        store = native.PackedFeatureStore(path)
        with pytest.raises(RuntimeError, match="precompute_pe"):
            store.raw(packed_pe[1][0])

    def test_repack_from_v2(self, packed16, tmp_path):
        """v1/v2 -> v3 conversion preserves keys, feat bytes, and the
        featurized pe (recomputed from the stored cls/bbox)."""
        src_path, keys, records = packed16
        dst = str(tmp_path / "repacked.vlps")
        native.repack_precomputed(src_path, dst)
        src = native.PackedFeatureStore(src_path)
        store = native.PackedFeatureStore(dst)
        assert store.precomputed_pe and store.dtype == np.float16
        assert store.n_records == len(keys)
        for k in (keys[0], keys[-1]):
            f_src, pe_src = src.get(k)
            f_dst, pe_dst = store.get(k)
            np.testing.assert_array_equal(f_src, f_dst)
            # repack featurizes from the fp16-rounded cls/bbox; the v2
            # runtime path does the same — results agree to fp16 lsb
            np.testing.assert_allclose(pe_src.astype(np.float32),
                                       pe_dst.astype(np.float32),
                                       rtol=0, atol=1e-3)
        with pytest.raises(ValueError, match="already v3"):
            native.repack_precomputed(dst, str(tmp_path / "again.vlps"))

    def test_trainloader_on_v3(self, packed_pe):
        """The loader hot path (slabs + gather_into) runs unchanged on a
        v3 store and yields identical batches to the per-example path."""
        from vlp_tpu.data.dataset import CaptionExample
        from vlp_tpu.data.example_builder import TrainExampleBuilder
        from vlp_tpu.data.loader import TrainLoader
        from vlp_tpu.config import VLPConfig

        path, keys, records, dtype = packed_pe
        store = native.PackedFeatureStore(path, n_threads=2)
        cfg = VLPConfig.tiny(vocab_size=32, hidden_size=32,
                             num_hidden_layers=1, num_attention_heads=2,
                             intermediate_size=32,
                             len_vis_input=store.n_regions, max_len_b=5,
                             max_pred=3, vis_feat_dim=store.feat_dim,
                             vis_cls_dim=store.cls_dim,
                             vis_pe_dim=store.pe_dim)
        vocab = {w: i for i, w in enumerate(
            ["[PAD]", "[UNK]", "[X_SEP]", "[CLS]", "[SEP]", "[MASK]", "a",
             "man", "dog", "rides"])}
        builders = [TrainExampleBuilder(cfg, vocab, mode="s2s"),
                    TrainExampleBuilder(cfg, vocab, mode="bi")]
        exs = [CaptionExample(k, ["a", "man", "rides"], image_id=i)
               for i, k in enumerate(keys)]

        def run(slots):
            loader = TrainLoader(exs, store, builders, [0.75, 0.25],
                                 batch_size=4, num_workers=2, seed=3,
                                 feature_slab_slots=slots)
            return [{k2: v.copy() for k2, v in b.items()}
                    for b in loader.epoch(0)]

        base = run(0)
        fast = run(6)
        for b1, b2 in zip(base, fast):
            for k2 in b1:
                np.testing.assert_array_equal(b1[k2], b2[k2], err_msg=k2)
        assert base[0]["vis_feats"].dtype == dtype


def test_evalloader_batched_gather_matches_fresh(packed, packed_pe):
    """EvalLoader's one-call batched gather (gather_into) must yield the
    same batches as the allocate-per-batch store.get path, on both v1 and
    v3 stores (runs once per packed_pe precision)."""
    from vlp_tpu.config import VLPConfig
    from vlp_tpu.data.dataset import CaptionExample
    from vlp_tpu.data.example_builder import DecodeExampleBuilder
    from vlp_tpu.data.loader import EvalLoader

    for path, keys, records in (packed[:3], packed_pe[:3]):
        store = native.PackedFeatureStore(path, n_threads=2)
        cfg = VLPConfig.tiny(vocab_size=32, hidden_size=32, num_hidden_layers=1,
                             num_attention_heads=2, intermediate_size=32,
                             len_vis_input=store.n_regions, max_len_b=5,
                             vis_feat_dim=store.feat_dim,
                             vis_cls_dim=store.cls_dim,
                             vis_pe_dim=store.pe_dim)
        vocab = {w: i for i, w in enumerate(
            ["[PAD]", "[UNK]", "[X_SEP]", "[CLS]", "[SEP]", "[MASK]"])}
        builder = DecodeExampleBuilder(cfg, vocab, max_tgt_length=cfg.max_len_b)
        exs = [CaptionExample(k, [], image_id=i)
               for i, k in enumerate(keys[:9])]
        fresh = [({k2: v.copy() for k2, v in b.items()}, c, p)
                 for b, c, p in EvalLoader(exs, store, builder, batch_size=4)]
        slab = [({k2: v.copy() for k2, v in b.items()}, c, p)
                for b, c, p in EvalLoader(exs, store, builder, batch_size=4,
                                          feature_slab_slots=3)]
        assert len(fresh) == len(slab) == 3
        for (gb, gc, gp), (fb, fc, fp) in zip(slab, fresh):
            assert gp == fp
            for k2 in fb:
                np.testing.assert_array_equal(gb[k2], fb[k2], err_msg=k2)


def test_prefetch_noop_semantics(packed16):
    """prefetch is advisory: issuing it (incl. unknown keys) must not
    change subsequent gathers."""
    path, keys, records = packed16
    store = native.PackedFeatureStore(path, n_threads=2)
    fb = np.empty((3, store.n_regions, store.feat_dim), np.float16)
    pb = np.empty((3, store.n_regions, store.pe_dim), np.float16)
    store.gather_into(keys[:3], fb, pb)
    base_f, base_p = fb.copy(), pb.copy()
    store.prefetch(keys[:3] + ["no_such_key"])
    store.prefetch([])
    store.gather_into(keys[:3], fb, pb)
    np.testing.assert_array_equal(fb, base_f)
    np.testing.assert_array_equal(pb, base_p)
