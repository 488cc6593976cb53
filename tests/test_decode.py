"""Decoder correctness: KV-cache == full-sequence forward, beam-search parity
with a straight-line reimplementation of the reference algorithm, and the
n-gram forbid mask vs the reference's python set logic."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vlp_tpu.config import MODE_S2S, VLPConfig
from vlp_tpu.data.example_builder import DecodeExampleBuilder
from vlp_tpu.decode import DecodeParams, Decoder
from vlp_tpu.models.model import VLPModel
from vlp_tpu.parallel import train_step as ts

EOS = 4  # [SEP]-like id in the tiny vocab
MASK = 5


def tiny_cfg():
    return VLPConfig.tiny(vocab_size=32, hidden_size=32, num_hidden_layers=2,
                          num_attention_heads=2, intermediate_size=64,
                          len_vis_input=6, max_len_b=5)


def setup_model(seed=0):
    cfg = tiny_cfg()
    model = VLPModel(cfg)
    params = ts.init_params(model, cfg, jax.random.PRNGKey(seed))
    return cfg, model, params


def decode_batch(cfg, B, rng):
    vocab = {"[PAD]": 0, "[UNK]": 1, "[X_SEP]": 2, "[CLS]": 3, "[SEP]": EOS,
             "[MASK]": MASK}
    b = DecodeExampleBuilder(cfg, vocab, max_tgt_length=cfg.max_len_b)
    exs = [b(rng.normal(size=(cfg.len_vis_input, cfg.vis_feat_dim)),
             rng.normal(size=(cfg.len_vis_input, cfg.vis_pe_dim)))
           for _ in range(B)]
    from vlp_tpu.data.example_builder import collate
    return {k: jnp.asarray(v) for k, v in collate(exs).items()}


def oracle_logp(cfg, model, params, batch, b_idx, committed):
    """Next-token log-probs via a FULL-sequence forward with a [MASK] probe —
    no KV cache involved.  Ground truth for the incremental path."""
    prefix = cfg.prefix_len
    L = cfg.seq_len
    ids = np.zeros(L, np.int32)
    ids[:prefix] = np.asarray(batch["input_ids"][b_idx])
    for i, tok in enumerate(committed):
        ids[prefix + i] = tok
    probe_pos = prefix + len(committed)
    ids[probe_pos] = MASK
    seq, _ = model.apply(
        {"params": params},
        jnp.asarray(ids)[None], batch["segment_ids"][b_idx][None],
        jnp.asarray([MODE_S2S]), jnp.asarray([probe_pos + 1]),
        batch["vis_feats"][b_idx][None], batch["vis_pe"][b_idx][None],
        position_ids=batch["position_ids"][b_idx][None],
        method=VLPModel.encode)
    logits = model.apply({"params": params}, seq[:, probe_pos:probe_pos + 1],
                         batch["task_idx"][b_idx][None],
                         method=VLPModel.lm_logits)[0, 0]
    return np.asarray(jax.nn.log_softmax(logits))


class TestIncrementalConsistency:
    def test_greedy_matches_oracle(self, rng):
        """Each greedy step's choice must equal the argmax of a full-sequence
        forward over the committed prefix (validates KV cache + decode mask)."""
        cfg, model, params = setup_model()
        batch = decode_batch(cfg, 2, rng)
        dec = Decoder(model, cfg, DecodeParams(
            mask_id=MASK, eos_id=EOS, max_tgt_length=4))
        ids, lps = dec.greedy(params, batch)
        ids = np.asarray(ids)
        for b in range(2):
            committed = []
            for t in range(4):
                logp = oracle_logp(cfg, model, params, batch, b, committed)
                want = int(np.argmax(logp))
                assert ids[b, t] == want, (b, t, ids[b], want)
                np.testing.assert_allclose(float(lps[b, t]), logp[want],
                                           rtol=1e-3, atol=1e-3)
                committed.append(int(ids[b, t]))


def reference_beam(cfg, model, params, batch, b, K, T, dp):
    """Straight-line numpy reimplementation of the reference beam loop
    (modeling.py:1281-1429) driven by the full-sequence oracle."""
    beams = [[]]          # committed tokens per beam
    total_scores, beam_masks, step_ids, step_ptrs = [], [], [], []
    for t in range(T):
        logps = np.stack([oracle_logp(cfg, model, params, batch, b, s)
                          for s in beams])          # [n_beams, V]
        if dp.forbid_duplicate_ngrams and t >= dp.ngram_size:
            for bi, seq in enumerate(beams):
                n = dp.ngram_size
                tail = seq[-(n - 1):]
                if any(tok in dp.forbid_ignore_ids for tok in tail):
                    continue
                for i in range(len(seq) - (n - 1)):
                    if seq[i:i + n - 1] == tail and \
                            seq[i + n - 1] not in dp.forbid_ignore_ids:
                        logps[bi, seq[i + n - 1]] += -10000.0
        if dp.min_len and t + 1 <= dp.min_len:
            logps[:, dp.eos_id] = -10000.0
        order = np.argsort(-logps, axis=1)[:, :K]
        kk_scores = np.take_along_axis(logps, order, axis=1)
        kk_ids = order
        if t == 0:
            k_ids, k_scores = kk_ids[0], kk_scores[0]
            ptrs = np.zeros(K, np.int64)
        else:
            prev_eos = beam_masks[-1]
            prev_scores = total_scores[-1]
            comb = (kk_scores + prev_eos[:, None] * -10000.0
                    + prev_scores[:, None]).reshape(-1)
            idx = np.argsort(-comb)[:K]
            k_scores = comb[idx]
            ptrs = idx // K
            k_ids = kk_ids.reshape(-1)[idx]
        step_ids.append(k_ids.copy())
        step_ptrs.append(ptrs.copy())
        total_scores.append(k_scores.copy())
        beam_masks.append((k_ids == dp.eos_id).astype(np.float64))
        beams = [(beams[ptrs[i]] if t > 0 else beams[0]) + [int(k_ids[i])]
                 for i in range(K)]
    return (np.stack(step_ids), np.stack(step_ptrs),
            np.stack(total_scores))


class TestBeamParity:
    @pytest.mark.parametrize("dp_kw", [
        dict(),
        dict(min_len=2),
        dict(forbid_duplicate_ngrams=True, ngram_size=2),
    ])
    def test_trace_matches_reference(self, rng, dp_kw):
        cfg, model, params = setup_model()
        batch = decode_batch(cfg, 1, rng)
        K, T = 2, 5
        dp = DecodeParams(mask_id=MASK, eos_id=EOS, beam_size=K,
                          max_tgt_length=T, **dp_kw)
        dec = Decoder(model, cfg, dp)
        ids, ptrs, scores = jax.tree_util.tree_map(
            np.asarray, dec._beam(params, batch))
        rids, rptrs, rscores = reference_beam(cfg, model, params, batch, 0,
                                              K, T, dp)
        np.testing.assert_array_equal(ids[:, 0, :], rids)
        np.testing.assert_array_equal(ptrs[:, 0, :], rptrs)
        np.testing.assert_allclose(scores[:, 0, :], rscores, rtol=2e-3,
                                   atol=2e-3)

    def test_backtrace_and_api(self, rng):
        cfg, model, params = setup_model()
        batch = decode_batch(cfg, 2, rng)
        dp = DecodeParams(mask_id=MASK, eos_id=EOS, beam_size=3,
                          max_tgt_length=5, length_penalty=0.5)
        dec = Decoder(model, cfg, dp)
        traces = dec(params, batch)
        assert traces["pred_seq"].shape == (2, 5)
        assert traces["wids"].shape == (2, 5, 3)

    def test_beam1_matches_greedy_prefix(self, rng):
        cfg, model, params = setup_model()
        batch = decode_batch(cfg, 2, rng)
        T = 5
        dec_g = Decoder(model, cfg, DecodeParams(
            mask_id=MASK, eos_id=EOS, max_tgt_length=T))
        g_ids, _ = dec_g.greedy(params, batch)
        dec_b = Decoder(model, cfg, DecodeParams(
            mask_id=MASK, eos_id=EOS, beam_size=1, max_tgt_length=T))
        ids, ptrs, scores = jax.tree_util.tree_map(
            np.asarray, dec_b._beam(params, batch))
        np.testing.assert_array_equal(np.asarray(g_ids), ids[:, :, 0].T)

    def test_reorder_impls_identical(self, rng):
        """The one-hot MXU cache reorder (TPU fast path) and the row gather
        are the same permutation — traces must match token-for-token."""
        cfg, model, params = setup_model()
        batch = decode_batch(cfg, 3, rng)
        outs = {}
        for impl in ("onehot", "gather"):
            dp = DecodeParams(mask_id=MASK, eos_id=EOS, beam_size=3,
                              max_tgt_length=6, min_len=2,
                              forbid_duplicate_ngrams=True, ngram_size=2,
                              reorder_impl=impl)
            dec = Decoder(model, cfg, dp)
            outs[impl] = jax.tree_util.tree_map(
                np.asarray, dec._beam(params, batch))
        for a, b in zip(outs["onehot"], outs["gather"]):
            np.testing.assert_allclose(a, b, rtol=0, atol=1e-5)

    def test_stacked_carry_identical(self, rng):
        """carry_impl='stacked' (one [L,...] scan-carry buffer per k/v)
        is a memory-layout change only — traces must match the per-layer
        tuples carry bit-for-bit."""
        cfg, model, params = setup_model()
        batch = decode_batch(cfg, 3, rng)
        outs = {}
        for impl in ("tuples", "stacked"):
            dp = DecodeParams(mask_id=MASK, eos_id=EOS, beam_size=3,
                              max_tgt_length=6, min_len=2,
                              forbid_duplicate_ngrams=True, ngram_size=2,
                              carry_impl=impl)
            dec = Decoder(model, cfg, dp)
            outs[impl] = jax.tree_util.tree_map(
                np.asarray, dec._beam(params, batch))
        for a, b in zip(outs["tuples"], outs["stacked"]):
            np.testing.assert_array_equal(a, b)


class TestExactTopkBlocks:
    def test_matches_lax_topk(self, rng):
        from vlp_tpu.decode import _exact_topk_blocks
        for V, C in ((30522, 23), (5000, 8), (1024, 6), (4097, 30)):
            logits = jnp.asarray(rng.normal(size=(7, V)).astype(np.float32))
            rvals, rids = jax.lax.top_k(logits, C)
            for block in (32, 64, 512):
                vals, ids = _exact_topk_blocks(logits, C, block=block)
                np.testing.assert_array_equal(np.asarray(vals),
                                              np.asarray(rvals))
                np.testing.assert_array_equal(np.asarray(ids),
                                              np.asarray(rids))


class TestPallasDecodeKernel:
    """The fused decode-step kernel (ops/decode_attention.py, interpret mode
    on CPU) against the XLA einsum path: same model, same params, traces
    must agree."""

    def _pair(self, seed=0, prefill_kernel=True):
        """prefill_kernel=True also flips use_pallas_attention so the
        prefill routes through the training kernel (interpret on CPU);
        the dropout-active fallback test keeps it off (the kernel's
        dropout stream is distribution-equivalent, not bit-equal)."""
        import dataclasses
        cfg, model, params = setup_model(seed)
        cfg_k = dataclasses.replace(cfg, use_pallas_decode=True,
                                    use_pallas_attention=prefill_kernel)
        model_k = VLPModel(cfg_k)
        return cfg, model, cfg_k, model_k, params

    def test_greedy_matches_xla(self, rng):
        cfg, model, cfg_k, model_k, params = self._pair()
        batch = decode_batch(cfg, 3, rng)
        dp = DecodeParams(mask_id=MASK, eos_id=EOS, max_tgt_length=5)
        ids_x, lp_x = Decoder(model, cfg, dp).greedy(params, batch)
        ids_k, lp_k = Decoder(model_k, cfg_k, dp).greedy(params, batch)
        np.testing.assert_array_equal(np.asarray(ids_x), np.asarray(ids_k))
        np.testing.assert_allclose(np.asarray(lp_x), np.asarray(lp_k),
                                   rtol=1e-5, atol=1e-5)

    def test_beam_matches_xla(self, rng):
        cfg, model, cfg_k, model_k, params = self._pair(1)
        batch = decode_batch(cfg, 2, rng)
        dp = DecodeParams(mask_id=MASK, eos_id=EOS, beam_size=3,
                          max_tgt_length=5, min_len=2,
                          forbid_duplicate_ngrams=True, ngram_size=2)
        out_x = jax.tree_util.tree_map(
            np.asarray, Decoder(model, cfg, dp)._beam(params, batch))
        out_k = jax.tree_util.tree_map(
            np.asarray, Decoder(model_k, cfg_k, dp)._beam(params, batch))
        np.testing.assert_array_equal(out_x[0], out_k[0])
        np.testing.assert_array_equal(out_x[1], out_k[1])
        np.testing.assert_allclose(out_x[2], out_k[2], rtol=1e-4, atol=1e-4)

    def test_train_rollout_fallback_matches_xla(self, rng):
        """Dropout-active sampling runs the column-layout XLA step
        (model._incremental_cols, no cache transposes) — streams must be
        identical to the head-major path."""
        cfg, model, cfg_k, model_k, params = self._pair(
            2, prefill_kernel=False)
        batch = decode_batch(cfg, 2, rng)
        dp = DecodeParams(mask_id=MASK, eos_id=EOS, max_tgt_length=4)
        key = jax.random.PRNGKey(7)
        ids_x, lp_x = Decoder(model, cfg, dp).sample(params, batch, key,
                                                     train_mode=True)
        ids_k, lp_k = Decoder(model_k, cfg_k, dp).sample(params, batch, key,
                                                         train_mode=True)
        np.testing.assert_array_equal(np.asarray(ids_x), np.asarray(ids_k))
        np.testing.assert_allclose(np.asarray(lp_x), np.asarray(lp_k),
                                   rtol=1e-5, atol=1e-5)


class TestSample:
    def test_sample_logprobs_consistent(self, rng):
        cfg, model, params = setup_model()
        batch = decode_batch(cfg, 2, rng)
        dec = Decoder(model, cfg, DecodeParams(
            mask_id=MASK, eos_id=EOS, max_tgt_length=4))
        ids, lps = dec.sample(params, batch, jax.random.PRNGKey(7))
        ids = np.asarray(ids)
        # sampled tokens' logprobs must match the oracle distribution values
        for b in range(2):
            committed = []
            for t in range(4):
                logp = oracle_logp(cfg, model, params, batch, b, committed)
                np.testing.assert_allclose(float(lps[b, t]),
                                           logp[int(ids[b, t])],
                                           rtol=1e-3, atol=1e-3)
                committed.append(int(ids[b, t]))


class TestBacktrace:
    """Unit tests of the host-side trace reconstruction against hand-built
    traces (modeling.py:1436-1472 semantics)."""

    def make_dec(self, length_penalty=0.0):
        cfg, model, params = setup_model()
        return Decoder(model, cfg, DecodeParams(
            mask_id=MASK, eos_id=EOS, beam_size=2, max_tgt_length=3,
            length_penalty=length_penalty))

    def test_early_all_eos_frame(self):
        dec = self.make_dec()
        T, B, K = 3, 1, 2
        ids = np.array([[[7, 8]], [[EOS, EOS]], [[9, 9]]])
        ptrs = np.array([[[0, 0]], [[0, 1]], [[0, 0]]])
        scores = np.array([[[-1.0, -2.0]], [[-1.5, -2.5]], [[-9.0, -9.0]]])
        out = dec._backtrace(ids, ptrs, scores)
        # frame 1 is all-EOS -> frames beyond ignored; best is beam 0 at
        # frame 1 (score -1.5): seq = [7, EOS]
        np.testing.assert_array_equal(out["pred_seq"][0], [7, EOS, 0])

    def test_length_penalty_prefers_longer(self):
        dec = self.make_dec(length_penalty=5.0)
        ids = np.array([[[EOS, 7]], [[8, EOS]], [[EOS, 9]]])
        ptrs = np.array([[[0, 0]], [[1, 1]], [[0, 1]]])
        scores = np.array([[[-1.0, -1.2]], [[-2.0, -2.2]], [[-3.0, -3.5]]])
        out = dec._backtrace(ids, ptrs, scores)
        # with a huge per-step bonus the frame-2 EOS candidate wins:
        # frame 2 beam 0 (EOS, score -3+15=12); backtrack: ptr->beam 0 at
        # frame 1 -> token 8; ptr 1 -> frame 0 token 7
        np.testing.assert_array_equal(out["pred_seq"][0], [7, 8, EOS])

    def test_no_eos_takes_last_frame_best(self):
        dec = self.make_dec()
        ids = np.array([[[5, 6]], [[7, 8]], [[9, 10]]])
        ptrs = np.zeros((3, 1, 2), np.int64)
        scores = np.array([[[-1.0, -2.0]], [[-2.0, -3.0]], [[-2.5, -9.0]]])
        out = dec._backtrace(ids, ptrs, scores)
        np.testing.assert_array_equal(out["pred_seq"][0], [5, 7, 9])
