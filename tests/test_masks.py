"""Mask metadata -> visibility reconstruction vs a brute-force build that
follows the reference's host-side construction (seq2seq_loader.py:291-304)."""

import numpy as np

from vlp_tpu.config import MODE_BI, MODE_S2S, VLPConfig
from vlp_tpu.ops.masks import attention_bias, visibility


def reference_mask(mode, text_end, vis_keep, prefix, L):
    """Brute-force reimplementation of the reference semantics."""
    m = np.zeros((L, L), dtype=np.int64)
    if mode == MODE_S2S:
        m[:, :prefix] = 1
        for i in range(prefix, text_end):
            for j in range(prefix, i + 1):
                m[i, j] = 1
    else:
        m[:, :text_end] = 1
    # region-mask columns (1-based region positions)
    for r, keep in enumerate(vis_keep):
        if keep == 0:
            m[:, r + 1] = 0
    return m.astype(bool)


def test_visibility_matches_reference():
    cfg = VLPConfig.tiny(len_vis_input=6, max_len_b=5)
    prefix, L = cfg.prefix_len, cfg.seq_len
    rng = np.random.default_rng(0)
    for mode in (MODE_S2S, MODE_BI):
        for nb in (0, 3, cfg.max_len_b):
            text_end = prefix + nb + 1
            vis_keep = (rng.uniform(size=cfg.len_vis_input) > 0.3).astype(
                np.float32)
            got = np.asarray(visibility(
                np.array([mode]), np.array([text_end]), vis_keep[None],
                prefix, L))[0]
            want = reference_mask(mode, text_end, vis_keep, prefix, L)
            np.testing.assert_array_equal(got, want)


def test_bias_values():
    cfg = VLPConfig.tiny(len_vis_input=4, max_len_b=3)
    b = np.asarray(attention_bias(
        np.array([MODE_S2S]), np.array([cfg.prefix_len + 2]),
        np.ones((1, 4), np.float32), cfg.prefix_len, cfg.seq_len))
    assert b.shape == (1, 1, cfg.seq_len, cfg.seq_len)
    assert set(np.unique(b)) == {-10000.0, 0.0}
