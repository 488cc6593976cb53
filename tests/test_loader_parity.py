"""Example-builder parity against the reference Preprocess4Seq2seq.

Runs the ACTUAL reference preprocessor (/root/reference/vlp/seq2seq_loader.py)
on an h5 fixture and checks that, for every produced example:
  * its materialised L x L attention mask equals our metadata reconstruction
    ``visibility(mode, text_end, vis_keep)`` — proving the structural-mask
    redesign is lossless;
  * its 1607-dim vis_pe equals our H5FeatureStore featurization;
  * segment ids / special-token layout / masked-position domain match our
    builder's invariants.
Skipped when the reference tree is not mounted.
"""

import importlib.util
import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference/vlp/seq2seq_loader.py"

pytestmark = pytest.mark.skipif(not os.path.isfile(REF),
                                reason="reference tree not mounted")


@pytest.fixture(scope="module")
def ref_loader():
    # stubs: torchvision (unused under enable_butd), imghdr (removed in 3.12)
    tv = types.ModuleType("torchvision")
    tv.transforms = types.ModuleType("torchvision.transforms")
    sys.modules.setdefault("torchvision", tv)
    sys.modules.setdefault("torchvision.transforms", tv.transforms)
    imghdr = types.ModuleType("imghdr")
    imghdr.what = lambda *a: "jpeg"
    sys.modules.setdefault("imghdr", imghdr)
    vlp_pkg = types.ModuleType("ref_vlp")
    vlp_pkg.__path__ = [os.path.dirname(REF)]
    sys.modules.setdefault("ref_vlp", vlp_pkg)
    # loader_utils is imported as `vlp.loader_utils`
    lu_spec = importlib.util.spec_from_file_location(
        "vlp.loader_utils", os.path.join(os.path.dirname(REF),
                                         "loader_utils.py"))
    lu = importlib.util.module_from_spec(lu_spec)
    vlp_mod = types.ModuleType("vlp")
    vlp_mod.__path__ = [os.path.dirname(REF)]
    sys.modules.setdefault("vlp", vlp_mod)
    sys.modules["vlp.loader_utils"] = lu
    lu_spec.loader.exec_module(lu)
    spec = importlib.util.spec_from_file_location("ref_vlp.seq2seq_loader",
                                                  REF)
    m = importlib.util.module_from_spec(spec)
    sys.modules["ref_vlp.seq2seq_loader"] = m
    spec.loader.exec_module(m)
    return m


@pytest.fixture(scope="module")
def h5_fixture(tmp_path_factory):
    import h5py
    d = tmp_path_factory.mktemp("h5")
    rng = np.random.default_rng(3)
    nr = 100
    img_id = "123456"
    feat = rng.normal(size=(nr, 2048)).astype(np.float32)
    cls = rng.uniform(size=(nr, 1601)).astype(np.float32)
    bbox = np.zeros((nr, 6), np.float32)
    xy = rng.uniform(0, 600, (nr, 2))
    wh = rng.uniform(10, 150, (nr, 2))
    bbox[:, :2] = xy
    bbox[:, 2:4] = xy + wh
    bbox[:, 5] = rng.uniform(0, 1, nr)
    prefix = str(d / "det")
    with h5py.File(f"{prefix}_feat{img_id[-3:]}.h5", "w") as f:
        f[img_id] = feat
    with h5py.File(f"{prefix}_cls{img_id[-3:]}.h5", "w") as f:
        f[img_id] = cls
    bbox_file = str(d / "bbox.h5")
    with h5py.File(bbox_file, "w") as f:
        f[img_id] = bbox
    return dict(prefix=prefix, bbox_file=bbox_file, img_id=img_id,
                feat=feat, cls=cls, bbox=bbox)


VOCAB_WORDS = (["[PAD]", "[X_SEP]"] + [f"[SEP_{i}]" for i in range(10)]
               + ["[UNK]", "[CLS]", "[SEP]", "[MASK]"]
               + [f"w{i}" for i in range(40)])
VOCAB = {w: i for i, w in enumerate(VOCAB_WORDS)}


def run_reference(ref_loader, h5, mode, vis_mask_prob=0.0, seed=0):
    import random
    random.seed(seed)
    np.random.seed(seed)
    proc = ref_loader.Preprocess4Seq2seq(
        max_pred=5, mask_prob=0.15, vocab_words=VOCAB_WORDS,
        indexer=lambda toks: [VOCAB[t] for t in toks],
        max_len=123, new_segment_ids=True,
        truncate_config={"max_len_b": 20, "trunc_seg": "b",
                         "always_truncate_tail": False},
        mask_image_regions=vis_mask_prob > 0, mode=mode, len_vis_input=100,
        vis_mask_prob=vis_mask_prob, enable_butd=True,
        region_bbox_file=h5["bbox_file"],
        region_det_file_prefix=h5["prefix"])
    tokens = ["w1", "w2", "w3", "w4", "w5", "w6"]
    return proc((f"/x/{h5['img_id']}.npy", tokens, {"answers": ["dummy"]}))


@pytest.mark.parametrize("mode", ["s2s", "bi"])
@pytest.mark.parametrize("vis_mask_prob", [0.0, 0.25])
def test_mask_matrix_equals_metadata_reconstruction(ref_loader, h5_fixture,
                                                    mode, vis_mask_prob):
    import jax.numpy as jnp
    from vlp_tpu.config import MODE_BI, MODE_S2S
    from vlp_tpu.ops.masks import visibility

    out = run_reference(ref_loader, h5_fixture, mode, vis_mask_prob)
    (input_ids, segment_ids, input_mask, masked_ids, masked_pos,
     masked_weights, _, task_idx, img, vis_masked_pos, vis_pe, _) = out

    L_ref = 123
    ids = np.asarray(input_ids)
    # derive our metadata from the reference example
    n_real = int((ids != 0).sum())          # non-pad tokens
    text_end = n_real                       # [CLS]..[SEP] contiguous from 0
    mode_id = MODE_S2S if mode == "s2s" else MODE_BI

    # NOTE: the reference's masked-region column blocking
    # (seq2seq_loader.py:303-304) writes into an advanced-indexing COPY and
    # is a silent no-op — the actual mask never blocks region columns, so
    # the metadata reconstruction uses vis_keep == ones.
    ours = np.asarray(visibility(
        jnp.asarray([mode_id]), jnp.asarray([text_end]),
        jnp.asarray(np.ones((1, 100), np.float32)), 102, L_ref))[0]
    ref_mask = np.asarray(input_mask).astype(bool)
    np.testing.assert_array_equal(ours, ref_mask)

    if vis_mask_prob > 0:
        # document the reference no-op: masked columns are still visible
        cols = np.asarray(vis_masked_pos, dtype=np.int64).reshape(-1)
        assert ref_mask[0, cols].all()

    # segment ids follow the 4/5 (s2s) or 0/1 (bi) split
    seg = np.asarray(segment_ids)
    hi, lo = (4, 5) if mode == "s2s" else (0, 1)
    assert (seg[:102] == hi).all()
    assert (seg[102:text_end] == lo).all()
    # masked positions live in the caption (+ final [SEP]) only
    mw = np.asarray(masked_weights)
    mp = np.asarray(masked_pos)[mw > 0]
    assert (mp >= 102).all() and (mp < text_end).all()


def test_vis_pe_matches_our_store(ref_loader, h5_fixture):
    from vlp_tpu.data.features import H5FeatureStore

    out = run_reference(ref_loader, h5_fixture, "s2s")
    ref_img = np.asarray(out[8])
    ref_vis_pe = np.asarray(out[10])

    store = H5FeatureStore(h5_fixture["prefix"], h5_fixture["bbox_file"])
    feat, pe = store.get(f"/x/{h5_fixture['img_id']}.npy")
    np.testing.assert_allclose(feat, ref_img, rtol=1e-6)
    np.testing.assert_allclose(pe, ref_vis_pe, rtol=2e-4, atol=2e-4)


def test_native_store_matches_reference_loading(ref_loader, h5_fixture,
                                                tmp_path):
    native = pytest.importorskip("vlp_tpu.data.native_store")
    out = run_reference(ref_loader, h5_fixture, "s2s")
    ref_vis_pe = np.asarray(out[10])

    packed = str(tmp_path / "p.vlps")
    native.pack_store(
        packed, [h5_fixture["img_id"]],
        {h5_fixture["img_id"]: (h5_fixture["feat"], h5_fixture["cls"],
                                h5_fixture["bbox"])})
    store = native.PackedFeatureStore(packed)
    feat, pe = store.get(h5_fixture["img_id"])
    np.testing.assert_allclose(pe, ref_vis_pe, rtol=2e-4, atol=2e-4)
