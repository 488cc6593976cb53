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
