"""Legacy BERT heads, fine-tune-anchored optimizer, loss scaling,
cached_path."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vlp_tpu import optim as optim_lib
from vlp_tpu.config import VLPConfig
from vlp_tpu.data.file_utils import cached_path, url_to_filename
from vlp_tpu.models import heads_legacy as hl


def tiny_cfg():
    return VLPConfig.tiny(vocab_size=50, hidden_size=16,
                          num_hidden_layers=1, num_attention_heads=2,
                          intermediate_size=32, len_vis_input=4, max_len_b=4,
                          vis_feat_dim=8, vis_pe_dim=10, relax_projection=0,
                          type_vocab_size=2)


def text_inputs(rng, B=2, L=None, cfg=None):
    L = L or cfg.seq_len
    ids = jnp.asarray(rng.integers(1, cfg.vocab_size, (B, L)), jnp.int32)
    types = jnp.zeros((B, L), jnp.int32)
    return ids, types


class TestLegacyHeads:
    @pytest.mark.parametrize("cls,kw,out_check", [
        (hl.BertForMaskedLM, {}, lambda o, B, L, cfg: o.shape == (B, L, cfg.vocab_size)),
        (hl.BertForNextSentencePrediction, {},
         lambda o, B, L, cfg: o.shape == (B, 2)),
        (hl.BertForSequenceClassification, {"num_labels": 3},
         lambda o, B, L, cfg: o.shape == (B, 3)),
        (hl.BertForTokenClassification, {"num_labels": 5},
         lambda o, B, L, cfg: o.shape == (B, L, 5)),
    ])
    def test_shapes(self, rng, cls, kw, out_check):
        cfg = tiny_cfg()
        model = cls(cfg, **kw)
        ids, types = text_inputs(rng, cfg=cfg)
        params = model.init(jax.random.PRNGKey(0), ids, types)
        out = model.apply(params, ids, types)
        assert out_check(out, ids.shape[0], ids.shape[1], cfg)
        assert np.isfinite(np.asarray(out)).all()

    def test_pretraining_head(self, rng):
        cfg = tiny_cfg()
        model = hl.BertForPreTraining(cfg)
        ids, types = text_inputs(rng, cfg=cfg)
        params = model.init(jax.random.PRNGKey(0), ids, types)
        mlm, nsp = model.apply(params, ids, types)
        assert mlm.shape == (2, cfg.seq_len, cfg.vocab_size)
        assert nsp.shape == (2, 2)

    def test_multiple_choice(self, rng):
        cfg = tiny_cfg()
        model = hl.BertForMultipleChoice(cfg, num_choices=3)
        B, C, L = 2, 3, cfg.seq_len
        ids = jnp.asarray(rng.integers(1, cfg.vocab_size, (B, C, L)),
                          jnp.int32)
        params = model.init(jax.random.PRNGKey(0), ids)
        out = model.apply(params, ids)
        assert out.shape == (B, C)

    def test_question_answering_loss(self, rng):
        cfg = tiny_cfg()
        model = hl.BertForQuestionAnswering(cfg)
        ids, types = text_inputs(rng, cfg=cfg)
        params = model.init(jax.random.PRNGKey(0), ids, types)
        loss = model.apply(params, ids, types,
                           start_positions=jnp.asarray([1, 2]),
                           end_positions=jnp.asarray([3, 4]))
        assert np.isfinite(float(loss))

    def test_extractive_summarization(self, rng):
        cfg = tiny_cfg()
        model = hl.BertForExtractiveSummarization(cfg)
        ids, types = text_inputs(rng, cfg=cfg)
        pos = jnp.asarray([[0, 2, 4], [1, 3, 5]], jnp.int32)
        params = model.init(jax.random.PRNGKey(0), ids, types,
                            sentence_positions=pos)
        out = model.apply(params, ids, types, sentence_positions=pos)
        assert out.shape == (2, 3)

    def test_pair_rel(self, rng):
        cfg = tiny_cfg()
        model = hl.PairRelHead(cfg, num_rel=4)
        x = jnp.asarray(rng.normal(size=(2, 3, cfg.hidden_size)), jnp.float32)
        y = jnp.asarray(rng.normal(size=(2, 3, cfg.hidden_size)), jnp.float32)
        r = jnp.asarray(rng.integers(0, 4, (2, 3)), jnp.int32)
        mask = jnp.ones((2, 3))
        params = model.init(jax.random.PRNGKey(0), x, y, r, mask)
        out = model.apply(params, x, y, r, mask)
        assert out.shape == (2, 3)
        assert (np.asarray(out) >= 0).all()  # -log sigmoid >= 0


class TestFinetuneAdam:
    def test_decay_toward_anchor(self, rng):
        p0 = jnp.asarray(rng.normal(size=(4, 4)).astype(np.float32))
        params = {"w": {"kernel": p0}}
        tx = optim_lib.bert_adam_finetune(
            0.1, init_params=params, weight_decay=0.01, t_total=-1)
        state = tx.init(params)
        g = {"w": {"kernel": jnp.zeros((4, 4))}}
        # zero grads: update = wd * (2p - p0); at p == p0 that's wd * p0,
        # same as plain decay — after drifting, pulls toward p0 harder
        upd, state = tx.update(g, state, params)
        np.testing.assert_allclose(np.asarray(upd["w"]["kernel"]),
                                   -0.1 * 0.01 * np.asarray(p0), rtol=1e-5)
        drifted = {"w": {"kernel": p0 + 1.0}}
        upd2, _ = tx.update(g, state, drifted)
        want = -0.1 * 0.01 * (2 * (np.asarray(p0) + 1.0) - np.asarray(p0))
        np.testing.assert_allclose(np.asarray(upd2["w"]["kernel"]), want,
                                   rtol=1e-5)

    def test_missing_keys_zero_anchor(self, rng):
        params = {"vis_fc1": {"kernel": jnp.ones((2, 2))},
                  "layer_0": {"q_proj": {"kernel": jnp.ones((2, 2))}}}
        tx = optim_lib.bert_adam_finetune(
            1.0, init_params=params, missing_key_substrings=("vis_fc",),
            weight_decay=0.01, t_total=-1)
        state = tx.init(params)
        g = jax.tree_util.tree_map(jnp.zeros_like, params)
        upd, _ = tx.update(g, state, params)
        # vis_fc1 anchor zeroed -> update = wd * 2p; layer_0 -> wd*(2p-p0)=wd*p
        np.testing.assert_allclose(np.asarray(upd["vis_fc1"]["kernel"]),
                                   -0.02 * np.ones((2, 2)), rtol=1e-5)
        np.testing.assert_allclose(
            np.asarray(upd["layer_0"]["q_proj"]["kernel"]),
            -0.01 * np.ones((2, 2)), rtol=1e-5)

    def test_subset_recovery(self):
        opt = optim_lib.bert_adam(0.1).init(
            {"a": jnp.zeros((2,)), "b": jnp.zeros((3,))})
        restored = optim_lib.load_opt_state_subset(
            opt, {"a": jnp.ones((2,)), "c": jnp.ones((9,))},
            {"a": 2 * jnp.ones((2,)), "c": jnp.ones((9,))}, saved_step=7)
        np.testing.assert_allclose(np.asarray(restored.m["a"]), 1.0)
        np.testing.assert_allclose(np.asarray(restored.m["b"]), 0.0)
        np.testing.assert_allclose(np.asarray(restored.v["a"]), 2.0)
        assert int(restored.step) == 7


class TestLossScale:
    def test_skip_on_overflow_and_halve(self):
        ls = optim_lib.DynamicLossScale(init_scale=16.0, growth_interval=2)
        st = ls.init()
        grads = {"w": jnp.asarray([jnp.inf, 1.0])}
        grads, finite = ls.unscale_and_check(grads, st)
        assert not bool(finite)
        st = ls.update(st, finite)
        assert float(st["scale"]) == 8.0
        upd = ls.apply_or_skip(finite, {"w": jnp.ones(2)})
        np.testing.assert_allclose(np.asarray(upd["w"]), 0.0)

    def test_growth(self):
        ls = optim_lib.DynamicLossScale(init_scale=4.0, growth_interval=2)
        st = ls.init()
        fin = jnp.bool_(True)
        st = ls.update(st, fin)
        assert float(st["scale"]) == 4.0
        st = ls.update(st, fin)
        assert float(st["scale"]) == 8.0

    def test_static_never_adjusts(self):
        ls = optim_lib.DynamicLossScale(init_scale=128.0, growth_interval=1,
                                        static=True)
        st = ls.init()
        st = ls.update(st, jnp.bool_(False))
        assert float(st["scale"]) == 128.0
        st = ls.update(st, jnp.bool_(True))
        st = ls.update(st, jnp.bool_(True))
        assert float(st["scale"]) == 128.0

    def test_scale_unscale_roundtrip(self):
        ls = optim_lib.DynamicLossScale(init_scale=32.0)
        st = ls.init()
        assert float(ls.scale_loss(jnp.float32(2.0), st)) == 64.0
        g, finite = ls.unscale_and_check({"w": jnp.asarray([64.0])}, st)
        assert bool(finite)
        np.testing.assert_allclose(np.asarray(g["w"]), [2.0])


class TestTrueFp16TrainStep:
    """The --true_fp16 path: make_train_step(loss_scale=...) scales the loss
    before backward, unscales grads, skips the whole update on overflow."""

    def _setup(self, rng):
        from tests.test_model import make_batch, tiny_cfg
        from vlp_tpu.parallel import train_step as ts
        cfg = tiny_cfg()
        model = ts.create_model(cfg)
        state, tx = ts.create_train_state(
            model, cfg, jax.random.PRNGKey(0), lr=1e-3, warmup=0.1,
            t_total=100)
        batch = make_batch(cfg, 4, rng)
        return ts, model, tx, state, batch

    def test_scaled_step_matches_plain(self, rng):
        # a power-of-two scale is exact in fp32: the scaled path must land on
        # bit-identical parameters to the unscaled path
        ts, model, tx, state, batch = self._setup(rng)
        ls = optim_lib.DynamicLossScale(init_scale=8.0, growth_interval=3)
        scaled = jax.jit(ts.make_train_step(model, tx, loss_scale=ls))
        plain = jax.jit(ts.make_train_step(model, tx))
        st_s, m_s = scaled(state._replace(loss_scale=ls.init()), batch,
                           jax.random.PRNGKey(1), 0.0)
        st_p, m_p = plain(state, batch, jax.random.PRNGKey(1), 0.0)
        assert float(m_s["skipped_step"]) == 0.0
        assert float(m_s["loss_scale"]) == 8.0
        assert int(st_s.loss_scale["good_steps"]) == 1
        np.testing.assert_allclose(float(m_s["loss"]), float(m_p["loss"]),
                                   rtol=1e-6)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-6, atol=1e-7),
            st_s.params, st_p.params)

    def test_overflow_skips_update_and_halves(self, rng):
        ts, model, tx, state, batch = self._setup(rng)
        ls = optim_lib.DynamicLossScale(init_scale=8.0)
        scaled = jax.jit(ts.make_train_step(model, tx, loss_scale=ls))
        # an inf feature poisons the loss -> non-finite grads -> skipped
        # update + halved scale (apex FP16_Optimizer overflow handling)
        bad = dict(batch, vis_feats=jnp.asarray(
            batch["vis_feats"]).at[0, 0, 0].set(jnp.inf))
        blown = state._replace(loss_scale={"scale": jnp.float32(8.0),
                                           "good_steps": jnp.int32(5)})
        st, m = scaled(blown, bad, jax.random.PRNGKey(1), 0.0)
        assert float(m["skipped_step"]) == 1.0
        assert float(st.loss_scale["scale"]) == 4.0
        assert int(st.loss_scale["good_steps"]) == 0
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b)),
            st.params, state.params)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b)),
            st.opt_state.m, state.opt_state.m)


class TestCachedPath:
    def test_local_passthrough(self, tmp_path):
        p = tmp_path / "x.txt"
        p.write_text("hi")
        assert cached_path(str(p)) == str(p)

    def test_missing_raises(self):
        with pytest.raises(FileNotFoundError):
            cached_path("/no/such/file")

    def test_url_to_filename_etag(self):
        a = url_to_filename("http://x/y")
        b = url_to_filename("http://x/y", etag="abc")
        assert a != b and a in b
