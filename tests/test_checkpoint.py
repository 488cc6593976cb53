"""Checkpoint converter: surgery rules, mapping, and full numerical parity
of the converted model against a torch oracle of the reference forward."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from vlp_tpu import checkpoint as ckpt
from vlp_tpu.config import MODE_BI, MODE_S2S, VLPConfig
from vlp_tpu.models.model import VLPModel
from vlp_tpu.ops.masks import visibility
from vlp_tpu.parallel import train_step as ts
from tests.torch_oracle import TorchOracle


def make_ref_state_dict(cfg, rng, type_vocab=2, relax=1, with_vqa=True,
                        max_pos=None, use_gamma_beta=False):
    """Random reference-format (torch naming) state dict."""
    H, I, V = cfg.hidden_size, cfg.intermediate_size, cfg.vocab_size
    max_pos = max_pos or cfg.max_position_embeddings
    r = lambda *s: rng.normal(scale=0.05, size=s).astype(np.float32)
    ln_w, ln_b = ("gamma", "beta") if use_gamma_beta else ("weight", "bias")
    sd = {
        "bert.embeddings.word_embeddings.weight": r(V, H),
        "bert.embeddings.position_embeddings.weight": r(max_pos, H),
        "bert.embeddings.token_type_embeddings.weight": r(type_vocab, H),
        f"bert.embeddings.LayerNorm.{ln_w}": 1 + r(H) * 0.01,
        f"bert.embeddings.LayerNorm.{ln_b}": r(H) * 0.01,
        "bert.pooler.dense.weight": r(H, H),
        "bert.pooler.dense.bias": r(H),
        "cls.predictions.transform.dense.weight": r(relax * H, H),
        "cls.predictions.transform.dense.bias": r(relax * H),
        f"cls.predictions.transform.LayerNorm.{ln_w}": 1 + r(relax * H) * 0.01,
        f"cls.predictions.transform.LayerNorm.{ln_b}": r(relax * H) * 0.01,
        "cls.predictions.bias": r(V),
        "vis_embed.0.weight": r(cfg.vis_feat_dim, cfg.vis_feat_dim),
        "vis_embed.0.bias": r(cfg.vis_feat_dim),
        "vis_embed.2.weight": r(H, cfg.vis_feat_dim),
        "vis_embed.2.bias": r(H),
        "vis_pe_embed.0.weight": r(H, cfg.vis_pe_dim),
        "vis_pe_embed.0.bias": r(H),
    }
    if with_vqa:
        sd["ans_classifier.0.weight"] = r(2 * H, H)
        sd["ans_classifier.0.bias"] = r(2 * H)
        sd["ans_classifier.2.weight"] = r(cfg.num_answers, 2 * H)
        sd["ans_classifier.2.bias"] = r(cfg.num_answers)
    for i in range(cfg.num_hidden_layers):
        p = f"bert.encoder.layer.{i}."
        sd.update({
            p + "attention.self.query.weight": r(H, H),
            p + "attention.self.query.bias": r(H),
            p + "attention.self.key.weight": r(H, H),
            p + "attention.self.key.bias": r(H),
            p + "attention.self.value.weight": r(H, H),
            p + "attention.self.value.bias": r(H),
            p + "attention.output.dense.weight": r(H, H),
            p + "attention.output.dense.bias": r(H),
            p + f"attention.output.LayerNorm.{ln_w}": 1 + r(H) * 0.01,
            p + f"attention.output.LayerNorm.{ln_b}": r(H) * 0.01,
            p + "intermediate.dense.weight": r(I, H),
            p + "intermediate.dense.bias": r(I),
            p + "output.dense.weight": r(H, I),
            p + "output.dense.bias": r(H),
            p + f"output.LayerNorm.{ln_w}": 1 + r(H) * 0.01,
            p + f"output.LayerNorm.{ln_b}": r(H) * 0.01,
        })
    return sd


def tiny_cfg(**kw):
    base = dict(vocab_size=64, hidden_size=32, num_hidden_layers=2,
                num_attention_heads=2, intermediate_size=48,
                len_vis_input=6, max_len_b=5, max_pred=4,
                vis_feat_dim=16, vis_pe_dim=12, num_answers=10)
    base.update(kw)
    return VLPConfig.tiny(**base)


class TestSurgery:
    def test_gamma_beta_and_type_expansion(self, rng):
        cfg = tiny_cfg(type_vocab_size=6)
        sd = make_ref_state_dict(cfg, rng, type_vocab=2, use_gamma_beta=True)
        out = ckpt.apply_surgery(dict(sd), cfg)
        assert "bert.embeddings.LayerNorm.weight" in out
        tt = out["bert.embeddings.token_type_embeddings.weight"]
        assert tt.shape[0] == 6
        old = sd["bert.embeddings.token_type_embeddings.weight"]
        np.testing.assert_array_equal(tt[2], old[0])
        np.testing.assert_array_equal(tt[3], old[0])
        np.testing.assert_array_equal(tt[4], old[0])
        np.testing.assert_array_equal(tt[5], old[1])

    def test_position_tiling(self, rng):
        cfg = tiny_cfg(max_position_embeddings=100)
        sd = make_ref_state_dict(cfg, rng, max_pos=40)
        out = ckpt.apply_surgery(dict(sd), cfg)
        pe = out["bert.embeddings.position_embeddings.weight"]
        assert pe.shape[0] == 100
        np.testing.assert_array_equal(pe[40:80], pe[:40])
        np.testing.assert_array_equal(pe[80:100], pe[:20])

    def test_relax_replicate_and_select(self, rng):
        cfg4 = tiny_cfg(relax_projection=4)
        sd = make_ref_state_dict(cfg4, rng, relax=1)
        out = ckpt.apply_surgery(dict(sd), cfg4)
        w = out["cls.predictions.transform.dense.weight"]
        assert w.shape[0] == 4 * cfg4.hidden_size
        np.testing.assert_array_equal(
            w[:cfg4.hidden_size], w[cfg4.hidden_size:2 * cfg4.hidden_size])

        cfg1 = tiny_cfg(relax_projection=0)
        sd4 = make_ref_state_dict(cfg1, rng, relax=4)
        out = ckpt.apply_surgery(dict(sd4), cfg1, task_idx=2)
        w = out["cls.predictions.transform.dense.weight"]
        assert w.shape[0] == cfg1.hidden_size
        np.testing.assert_array_equal(
            w, sd4["cls.predictions.transform.dense.weight"].reshape(
                4, cfg1.hidden_size, cfg1.hidden_size)[2])


class TestOrbaxRelaxAdaptation:
    """``load_model_checkpoint`` adapts orbax checkpoints whose MLM head
    width disagrees with the template, in BOTH directions (orbax silently
    returns the STORED shapes, so shape checks after restore are the only
    guard): multi-head -> collapsed selects head task_idx (the reference
    decoder's from_pretrained surgery, modeling.py:723-732); collapsed ->
    multi-head tiles (the n_state_relax==1 branch, modeling.py:716-721)."""

    def _save(self, tree, path):
        import orbax.checkpoint as ocp
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(os.path.abspath(path), ckpt.jax_tree_to_numpy(tree),
                   force=True)
        ckptr.wait_until_finished()

    def test_both_directions(self, rng, tmp_path):
        H = 32
        cfg4 = tiny_cfg(relax_projection=4)
        cfg1 = tiny_cfg(relax_projection=0)
        params4 = ts.init_params(VLPModel(cfg4), cfg4, jax.random.PRNGKey(0))
        params1 = ts.init_params(VLPModel(cfg1), cfg1, jax.random.PRNGKey(1))

        p4_dir = str(tmp_path / "model4")
        self._save(params4, p4_dir)
        got = ckpt.load_model_checkpoint(p4_dir, cfg1, params1, task_idx=2)
        k4 = np.asarray(params4["mlm"]["transform_dense"]["kernel"])
        np.testing.assert_array_equal(
            got["mlm"]["transform_dense"]["kernel"], k4[:, 2 * H:3 * H])
        np.testing.assert_array_equal(
            got["mlm"]["transform_ln"]["scale"],
            np.asarray(params4["mlm"]["transform_ln"]["scale"])[2 * H:3 * H])

        p1_dir = str(tmp_path / "model1")
        self._save(params1, p1_dir)
        got4 = ckpt.load_model_checkpoint(p1_dir, cfg4, params4)
        k1 = np.asarray(params1["mlm"]["transform_dense"]["kernel"])
        np.testing.assert_array_equal(
            got4["mlm"]["transform_dense"]["kernel"], np.tile(k1, (1, 4)))
        np.testing.assert_array_equal(
            got4["mlm"]["transform_ln"]["bias"],
            np.tile(np.asarray(params1["mlm"]["transform_ln"]["bias"]), 4))
        # every leaf now matches the multi-head template's shape — the
        # restored tree is applyable, not a latent tree-mismatch
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_array_equal(
                np.shape(a), np.shape(b)), got4, params4)


class TestRoundTrip:
    def test_params_to_torch_to_params(self, rng):
        cfg = tiny_cfg(type_vocab_size=6, relax_projection=4)
        model = VLPModel(cfg, with_vqa=True)
        params = ts.init_params(model, cfg, jax.random.PRNGKey(0),
                                task="vqa2")
        sd = ckpt.params_to_torch(params, cfg)
        params2 = ckpt.torch_to_params(sd, cfg, params)
        flat1 = jax.tree_util.tree_leaves_with_path(
            ckpt.jax_tree_to_numpy(params))
        flat2 = jax.tree_util.tree_leaves_with_path(params2)
        for (p1, a), (p2, b) in zip(flat1, flat2):
            assert p1 == p2
            np.testing.assert_allclose(a, b, err_msg=str(p1))


class TestStepCheckpoints:
    """Step-level (mid-epoch) checkpoints: save/prune/latest-scan round-trip.
    An extension over the reference's per-epoch recovery
    (run_img2txt_dist.py:33-43)."""

    @staticmethod
    def _state(val):
        from vlp_tpu.parallel.train_step import TrainState
        from vlp_tpu.optim import BertAdamState
        p = {"w": np.full((2, 2), float(val), np.float32)}
        opt = BertAdamState(m={"w": np.zeros((2, 2), np.float32)},
                            v={"w": np.ones((2, 2), np.float32)},
                            step=np.asarray(val, np.int32))
        return TrainState(p, opt, np.asarray(val, np.int32))

    def test_save_prune_latest(self, tmp_path):
        out = str(tmp_path)
        for s in (4, 8, 12):
            ckpt.save_step_checkpoint(out, s, self._state(s), keep=2)
        ckpt.wait_for_saves()
        assert ckpt.get_latest_step_checkpoint(out) == 12
        # pruned to the latest two
        assert not os.path.isdir(os.path.join(out, "model.s4"))
        assert os.path.isdir(os.path.join(out, "model.s8"))
        # step ckpts must not be mistaken for epoch ckpts
        assert ckpt.get_max_epoch_model(out) is None
        st = self._state(0)
        params = ckpt.restore_params(os.path.join(out, "model.s12"),
                                     st.params)
        np.testing.assert_array_equal(params["w"], np.full((2, 2), 12.0))
        opt = ckpt.restore_optimizer(os.path.join(out, "optim.s12"),
                                     st.opt_state)
        assert int(opt["step"]) == 12

    def test_legacy_head_checkpoint_roundtrip(self, rng):
        """Reference-named legacy-head weights (cls.seq_relationship.*,
        classifier.*, qa_outputs.*, rel_emb.* — modeling.py:878-978,
        1497-1966) must load into heads_legacy params and convert back
        unchanged."""
        from vlp_tpu.models import heads_legacy as hl
        cfg = tiny_cfg()
        H = cfg.hidden_size
        r = lambda *s: rng.normal(scale=0.05, size=s).astype(np.float32)

        # -- BertForSequenceClassification: backbone + classifier ----------
        sd = make_ref_state_dict(cfg, rng, with_vqa=False)
        sd["cls.seq_relationship.weight"] = r(2, H)
        sd["cls.seq_relationship.bias"] = r(2)
        sd["classifier.weight"] = r(3, H)
        sd["classifier.bias"] = r(3)
        model = hl.BertForSequenceClassification(cfg, num_labels=3)
        ids = jnp.zeros((2, cfg.seq_len), jnp.int32)
        tpl = model.init(jax.random.PRNGKey(0), ids)["params"]
        params = ckpt.torch_to_legacy_head_params(dict(sd), cfg, tpl)
        np.testing.assert_array_equal(params["classifier"]["kernel"],
                                      sd["classifier.weight"].T)
        np.testing.assert_array_equal(
            params["backbone"]["vlp"]["pooler_dense"]["kernel"],
            sd["bert.pooler.dense.weight"].T)
        # value check: converted forward differs from template forward
        back = ckpt.legacy_head_params_to_torch(params, cfg)
        np.testing.assert_array_equal(back["classifier.weight"],
                                      sd["classifier.weight"])
        np.testing.assert_array_equal(
            back["bert.encoder.layer.0.attention.self.query.weight"],
            sd["bert.encoder.layer.0.attention.self.query.weight"])

        # -- BertForQuestionAnswering --------------------------------------
        sd["qa_outputs.weight"] = r(2, H)
        sd["qa_outputs.bias"] = r(2)
        qa = hl.BertForQuestionAnswering(cfg)
        tpl = qa.init(jax.random.PRNGKey(0), ids)["params"]
        params = ckpt.torch_to_legacy_head_params(dict(sd), cfg, tpl)
        np.testing.assert_array_equal(params["qa_outputs"]["kernel"],
                                      sd["qa_outputs.weight"].T)

        # -- BertForPreTraining (NSP head) ---------------------------------
        pre = hl.BertForPreTraining(cfg)
        tpl = pre.init(jax.random.PRNGKey(0), ids)["params"]
        params = ckpt.torch_to_legacy_head_params(dict(sd), cfg, tpl)
        np.testing.assert_array_equal(params["seq_relationship"]["kernel"],
                                      sd["cls.seq_relationship.weight"].T)

        # -- PairRelHead (BertPreTrainingPairRel) --------------------------
        prl = hl.PairRelHead(cfg, num_rel=4)
        px = jnp.zeros((2, 3, H), jnp.float32)
        tpl = prl.init(jax.random.PRNGKey(0), px, px,
                       jnp.zeros((2, 3), jnp.int32),
                       jnp.ones((2, 3), jnp.float32))["params"]
        sd2 = {"R_xy.dense.weight": r(H, 2 * H),
               "R_xy.dense.bias": r(H),
               "rel_emb.weight": r(4, H)}
        params = ckpt.torch_to_legacy_head_params(dict(sd2), cfg, tpl)
        np.testing.assert_array_equal(params["pair_dense"]["kernel"],
                                      sd2["R_xy.dense.weight"].T)
        np.testing.assert_array_equal(params["rel_emb"]["embedding"],
                                      sd2["rel_emb.weight"])
        back = ckpt.legacy_head_params_to_torch(params, cfg)
        np.testing.assert_array_equal(back["rel_emb.weight"],
                                      sd2["rel_emb.weight"])

    def test_step_list_robust_to_model_dot_in_dirname(self, tmp_path):
        """output_dir paths containing '/model.' (e.g. runs/model.v2) used to
        throw every optim.s* path into the models set, silently disabling
        mid-epoch resume and pruning for such dirs."""
        out = os.path.join(str(tmp_path), "model.v2")
        os.makedirs(os.path.join(out, "model.s5"))
        os.makedirs(os.path.join(out, "optim.s5"))
        os.makedirs(os.path.join(out, "optim.s9"))  # model.s9 missing
        assert ckpt.get_latest_step_checkpoint(out) == 5

    def test_async_epoch_save_visible_after_wait(self, tmp_path):
        out = str(tmp_path)
        ckpt.save_checkpoint(out, 1, self._state(7), wait=False)
        ckpt.wait_for_saves()
        st = self._state(0)
        params = ckpt.restore_params(os.path.join(out, "model.1"), st.params)
        np.testing.assert_array_equal(params["w"], np.full((2, 2), 7.0))
        assert ckpt.get_max_epoch_model(out) == 1


class TestOracleParity:
    """Converted reference checkpoint must reproduce the reference forward."""

    def _setup(self, rng, relax, type_vocab):
        cfg = tiny_cfg(relax_projection=relax,
                       type_vocab_size=type_vocab, dtype="float32")
        sd = make_ref_state_dict(cfg, rng, type_vocab=type_vocab,
                                 relax=max(relax, 1))
        model = VLPModel(cfg, with_vqa=True)
        tpl = ts.init_params(model, cfg, jax.random.PRNGKey(1), task="vqa2")
        params = ckpt.torch_to_params(dict(sd), cfg, tpl)
        return cfg, sd, model, params

    @pytest.mark.parametrize("relax,type_vocab", [(4, 6), (0, 2)])
    def test_encoder_and_heads(self, rng, relax, type_vocab):
        cfg, sd, model, params = self._setup(rng, relax, type_vocab)
        B, L, nv = 2, cfg.seq_len, cfg.len_vis_input
        prefix = cfg.prefix_len
        nb = 4
        ids = np.zeros((B, L), np.int64)
        ids[:, 0] = 3
        ids[:, 1:nv + 1] = 1
        ids[:, nv + 1] = 4
        ids[:, prefix:prefix + nb] = rng.integers(5, cfg.vocab_size, (B, nb))
        ids[:, prefix + nb] = 4
        seg = np.zeros((B, L), np.int64)
        hi = 4 if type_vocab == 6 else 0
        lo = 5 if type_vocab == 6 else 1
        seg[:, :prefix] = hi
        seg[:, prefix:prefix + nb + 1] = lo
        mode = np.array([MODE_S2S, MODE_BI], np.int32)
        text_end = np.full((B,), prefix + nb + 1, np.int32)
        vis_keep = np.ones((B, nv), np.float32)
        vis_feats = rng.normal(size=(B, nv, cfg.vis_feat_dim)).astype(np.float32)
        vis_pe = rng.normal(size=(B, nv, cfg.vis_pe_dim)).astype(np.float32)

        # torch oracle with the reference's materialised mask
        vis_bool = np.asarray(visibility(jnp.asarray(mode),
                                         jnp.asarray(text_end),
                                         jnp.asarray(vis_keep), prefix, L))
        oracle = TorchOracle(sd, cfg)
        with torch.no_grad():
            t_seq, t_pooled = oracle.encode(
                torch.as_tensor(ids), torch.as_tensor(seg),
                torch.as_tensor(vis_bool.astype(np.float32)),
                torch.as_tensor(vis_feats), torch.as_tensor(vis_pe))

        seq, pooled = model.apply(
            {"params": params}, jnp.asarray(ids, jnp.int32),
            jnp.asarray(seg, jnp.int32), jnp.asarray(mode),
            jnp.asarray(text_end), jnp.asarray(vis_feats),
            jnp.asarray(vis_pe), method=VLPModel.encode)

        np.testing.assert_allclose(np.asarray(seq), t_seq.numpy(),
                                   rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(pooled), t_pooled.numpy(),
                                   rtol=2e-4, atol=2e-4)

        # MLM head on gathered positions
        masked_pos = np.stack([np.arange(prefix, prefix + 3)] * B)
        task_idx = np.array([3, 0]) if relax else np.array([0, 0])
        hid = np.take_along_axis(np.asarray(seq), masked_pos[:, :, None],
                                 axis=1)
        with torch.no_grad():
            t_logits = oracle.mlm_logits(torch.as_tensor(hid),
                                         torch.as_tensor(task_idx))
        logits = model.apply(
            {"params": params}, jnp.asarray(hid), jnp.asarray(task_idx),
            method=VLPModel.lm_logits)
        np.testing.assert_allclose(np.asarray(logits), t_logits.numpy(),
                                   rtol=2e-4, atol=2e-4)

        # VQA head
        with torch.no_grad():
            t_vqa = oracle.vqa_logits(t_seq)
        import flax.linen as nn
        h = np.asarray(seq)
        vqa_logits = model.apply(
            {"params": params},
            method=lambda m: m.ans_fc2(nn.relu(m.ans_fc1(
                jnp.asarray(h[:, 0] * h[:, nv + 1])))))
        np.testing.assert_allclose(np.asarray(vqa_logits), t_vqa.numpy(),
                                   rtol=2e-4, atol=2e-4)
