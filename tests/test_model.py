"""Model forward, Pallas/XLA attention parity, and end-to-end training step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vlp_tpu.config import MODE_BI, MODE_S2S, VLPConfig
from vlp_tpu.models.model import VLPModel
from vlp_tpu.ops import attention as attn_ops
from vlp_tpu.ops import masks as mask_ops
from vlp_tpu.parallel import train_step as ts


def tiny_cfg(**kw):
    return VLPConfig.tiny(len_vis_input=6, max_len_b=5, max_pred=4, **kw)


def make_batch(cfg, B, rng, task="img2txt"):
    L, nv = cfg.seq_len, cfg.len_vis_input
    prefix = cfg.prefix_len
    nb = 4
    ids = np.zeros((B, L), np.int32)
    ids[:, 0] = 3  # CLS-ish
    ids[:, 1:nv + 1] = 1
    ids[:, nv + 1] = 4
    ids[:, prefix:prefix + nb] = rng.integers(5, cfg.vocab_size, (B, nb))
    ids[:, prefix + nb] = 4
    seg = np.zeros((B, L), np.int32)
    seg[:, :prefix] = 4
    seg[:, prefix:prefix + nb + 1] = 5
    masked_pos = np.zeros((B, cfg.max_pred), np.int32)
    masked_pos[:, 0] = prefix
    masked_pos[:, 1] = prefix + 1
    masked_ids = np.zeros((B, cfg.max_pred), np.int32)
    masked_ids[:, :2] = rng.integers(5, cfg.vocab_size, (B, 2))
    masked_weights = np.zeros((B, cfg.max_pred), np.float32)
    masked_weights[:, :2] = 1.0
    batch = dict(
        input_ids=jnp.asarray(ids),
        segment_ids=jnp.asarray(seg),
        mode=jnp.asarray(rng.integers(0, 2, B).astype(np.int32)),
        text_end=jnp.full((B,), prefix + nb + 1, jnp.int32),
        vis_keep=jnp.ones((B, nv), jnp.float32),
        vis_masked_pos=jnp.asarray(
            rng.integers(1, nv + 1, (B, 2)).astype(np.int32)),
        masked_pos=jnp.asarray(masked_pos),
        masked_ids=jnp.asarray(masked_ids),
        masked_weights=jnp.asarray(masked_weights),
        task_idx=jnp.full((B,), 3, jnp.int32),
        vis_feats=jnp.asarray(
            rng.normal(size=(B, nv, cfg.vis_feat_dim)).astype(np.float32)),
        vis_pe=jnp.asarray(
            rng.normal(size=(B, nv, cfg.vis_pe_dim)).astype(np.float32)),
    )
    if task == "vqa2":
        scores = np.zeros((B, cfg.num_answers), np.float32)
        scores[:, 5] = 1.0
        batch["ans_scores"] = jnp.asarray(scores)
    return batch


class TestAttentionParity:
    def test_pallas_matches_xla(self, rng):
        B, H, L, D = 2, 2, 128, 16
        prefix = 8
        q, k, v = (jnp.asarray(rng.normal(size=(B, H, L, D)).astype(np.float32))
                   for _ in range(3))
        mode = jnp.asarray([MODE_S2S, MODE_BI], jnp.int32)
        text_end = jnp.asarray([20, 15], jnp.int32)
        vis_keep = jnp.ones((B, prefix - 2), jnp.float32)
        vis_keep = vis_keep.at[0, 2].set(0.0)
        colkeep = attn_ops.colkeep_from_vis_keep(vis_keep, L)
        bias = mask_ops.attention_bias(mode, text_end, vis_keep, prefix, L)

        want = attn_ops.attention_xla(q, k, v, bias)
        got = attn_ops.attention_pallas(q, k, v, mode, text_end, colkeep,
                                        prefix=prefix)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)

    def test_blhd_layout_matches_bhld(self, rng):
        """layout="blhd" ([B,L,H,D] operands, head loop slices the middle
        dim) must be numerically identical to the canonical bhld kernel,
        values and grads."""
        B, H, L, D = 2, 2, 128, 16
        prefix = 8
        q, k, v = (jnp.asarray(rng.normal(size=(B, H, L, D)).astype(np.float32))
                   for _ in range(3))
        mode = jnp.asarray([MODE_S2S, MODE_BI], jnp.int32)
        text_end = jnp.asarray([20, 15], jnp.int32)
        vis_keep = jnp.ones((B, prefix - 2), jnp.float32)
        vis_keep = vis_keep.at[0, 2].set(0.0)
        colkeep = attn_ops.colkeep_from_vis_keep(vis_keep, L)

        want = attn_ops.attention_pallas(q, k, v, mode, text_end, colkeep,
                                         prefix=prefix)
        got = attn_ops.attention_pallas(
            q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
            v.transpose(0, 2, 1, 3), mode, text_end, colkeep,
            prefix=prefix, layout="blhd")
        np.testing.assert_allclose(np.asarray(got.transpose(0, 2, 1, 3)),
                                   np.asarray(want), rtol=2e-5, atol=2e-5)

        def f_bhld(q, k, v):
            return jnp.sum(attn_ops.attention_pallas(
                q, k, v, mode, text_end, colkeep, prefix=prefix) ** 2)

        def f_blhd(q, k, v):
            return jnp.sum(attn_ops.attention_pallas(
                q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
                v.transpose(0, 2, 1, 3), mode, text_end, colkeep,
                prefix=prefix, layout="blhd") ** 2)

        ga = jax.grad(f_bhld, argnums=(0, 1, 2))(q, k, v)
        gb = jax.grad(f_blhd, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(ga, gb):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=2e-4)

    def test_fused_qkv_matches_separate(self, rng):
        """fuse_qkv_proj=True (one block-column matmul over runtime-
        concatenated kernels) must match the three separate projections
        exactly — same params, same dot reduction order per column."""
        cfg = tiny_cfg().replace(use_pallas_attention=True)
        model_a = VLPModel(cfg)
        model_b = VLPModel(cfg.replace(fuse_qkv_proj=True))
        batch = make_batch(cfg, 2, rng)
        params = ts.init_params(model_a, cfg, jax.random.PRNGKey(0))
        out_a = model_a.apply({"params": params}, batch,
                              deterministic=True, drop_worst_ratio=0.0,
                              mask_image_regions=False, task="img2txt",
                              method=VLPModel.pretrain_losses)
        out_b = model_b.apply({"params": params}, batch,
                              deterministic=True, drop_worst_ratio=0.0,
                              mask_image_regions=False, task="img2txt",
                              method=VLPModel.pretrain_losses)
        np.testing.assert_array_equal(np.asarray(out_a["loss"]),
                                      np.asarray(out_b["loss"]))

    def test_pallas_grads_match_xla(self, rng):
        B, H, L, D = 1, 2, 128, 16
        prefix = 8
        q, k, v = (jnp.asarray(rng.normal(size=(B, H, L, D)).astype(np.float32))
                   for _ in range(3))
        mode = jnp.asarray([MODE_S2S], jnp.int32)
        text_end = jnp.asarray([20], jnp.int32)
        vis_keep = jnp.ones((B, prefix - 2), jnp.float32)
        colkeep = attn_ops.colkeep_from_vis_keep(vis_keep, L)
        bias = mask_ops.attention_bias(mode, text_end, vis_keep, prefix, L)

        def f_xla(q, k, v):
            return jnp.sum(attn_ops.attention_xla(q, k, v, bias) ** 2)

        def f_pl(q, k, v):
            return jnp.sum(attn_ops.attention_pallas(
                q, k, v, mode, text_end, colkeep, prefix=prefix) ** 2)

        gx = jax.grad(f_xla, argnums=(0, 1, 2))(q, k, v)
        gp = jax.grad(f_pl, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(gp, gx):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=2e-4)


class TestForward:
    def test_encode_shapes(self, rng):
        cfg = tiny_cfg()
        model = VLPModel(cfg)
        batch = make_batch(cfg, 2, rng)
        params = ts.init_params(model, cfg, jax.random.PRNGKey(0))
        seq, pooled = model.apply(
            {"params": params}, batch["input_ids"], batch["segment_ids"],
            batch["mode"], batch["text_end"], batch["vis_feats"],
            batch["vis_pe"], method=VLPModel.encode)
        assert seq.shape == (2, cfg.seq_len, cfg.hidden_size)
        assert pooled.shape == (2, cfg.hidden_size)

    def test_pretrain_losses_finite(self, rng):
        cfg = tiny_cfg()
        model = VLPModel(cfg)
        batch = make_batch(cfg, 2, rng)
        params = ts.init_params(model, cfg, jax.random.PRNGKey(0))
        out = model.apply({"params": params}, batch, deterministic=False,
                          drop_worst_ratio=0.0, mask_image_regions=True,
                          task="img2txt",
                          rngs={"dropout": jax.random.PRNGKey(1)},
                          method=VLPModel.pretrain_losses)
        assert np.isfinite(float(out["loss"]))
        assert float(out["pretext_loss"]) > 0
        assert float(out["vqa2_loss"]) == 0.0

    def test_vqa_loss_and_inference(self, rng):
        cfg = tiny_cfg()
        model = VLPModel(cfg, with_vqa=True)
        batch = make_batch(cfg, 2, rng, task="vqa2")
        params = ts.init_params(model, cfg, jax.random.PRNGKey(0),
                                task="vqa2")
        out = model.apply({"params": params}, batch, deterministic=True,
                          drop_worst_ratio=0.0, mask_image_regions=False,
                          task="vqa2", method=VLPModel.pretrain_losses)
        assert float(out["vqa2_loss"]) > 0
        assert float(out["masked_lm_loss"]) == 0.0
        ans = model.apply({"params": params}, batch,
                          method=VLPModel.vqa_inference)
        assert ans.shape == (2,)
        assert (np.asarray(ans) >= 1).all()

    def test_masked_region_zeroing_changes_output(self, rng):
        """vis_keep must block masked-region columns AND zero their features."""
        cfg = tiny_cfg()
        model = VLPModel(cfg)
        batch = make_batch(cfg, 1, rng)
        params = ts.init_params(model, cfg, jax.random.PRNGKey(0))

        def enc(vis_keep):
            seq, _ = model.apply(
                {"params": params}, batch["input_ids"], batch["segment_ids"],
                batch["mode"], batch["text_end"], batch["vis_feats"],
                batch["vis_pe"], vis_keep=vis_keep, method=VLPModel.encode)
            return np.asarray(seq)

        full = enc(jnp.ones((1, cfg.len_vis_input), jnp.float32))
        masked = enc(jnp.ones((1, cfg.len_vis_input), jnp.float32
                              ).at[0, 0].set(0.0))
        assert np.abs(full - masked).max() > 1e-6


class TestTrainStep:
    @pytest.mark.parametrize("task", ["img2txt", "vqa2"])
    def test_loss_decreases(self, rng, task):
        cfg = tiny_cfg()
        model = ts.create_model(cfg, task)
        state, tx = ts.create_train_state(
            model, cfg, jax.random.PRNGKey(0), lr=5e-3, warmup=0.01,
            t_total=100, task=task)
        step = jax.jit(ts.make_train_step(model, tx, task=task,
                                          mask_image_regions=(task == "img2txt")))
        batch = make_batch(cfg, 4, rng, task)
        losses = []
        for i in range(8):
            state, metrics = step(state, batch, jax.random.PRNGKey(i), 0.0)
            losses.append(float(metrics["loss"]))
        assert losses[-1] < losses[0], losses

    def test_grad_accum_equivalence(self, rng):
        cfg = tiny_cfg()
        model = ts.create_model(cfg)
        state, tx = ts.create_train_state(
            model, cfg, jax.random.PRNGKey(0), lr=1e-3, warmup=0.01,
            t_total=100)
        batch = make_batch(cfg, 4, rng)
        step1 = jax.jit(ts.make_train_step(model, tx))
        step2 = jax.jit(ts.make_train_step(model, tx, grad_accum=2))
        s1, _ = step1(state, batch, jax.random.PRNGKey(5), 0.0)
        s2, _ = step2(state, batch, jax.random.PRNGKey(5), 0.0)
        # parameters should be close (dropout rngs differ between paths)
        d = jax.tree_util.tree_map(
            lambda a, b: float(jnp.max(jnp.abs(a - b))), s1.params, s2.params)
        assert max(jax.tree_util.tree_leaves(d)) < 5e-2


class TestMultiStep:
    def test_matches_sequential_steps(self, rng):
        """K scanned device-loop steps == K sequential single steps."""
        cfg = tiny_cfg()
        model = ts.create_model(cfg)
        state, tx = ts.create_train_state(
            model, cfg, jax.random.PRNGKey(0), lr=1e-3, warmup=0.01,
            t_total=100)
        K = 3
        batches = [make_batch(cfg, 4, rng) for _ in range(K)]
        import numpy as np
        stacked = {k: jnp.stack([b[k] for b in batches]) for k in batches[0]}

        single = jax.jit(ts.make_train_step(model, tx))
        s_seq = state
        base_rng = jax.random.PRNGKey(9)
        for i in range(K):
            s_seq, _ = single(s_seq, batches[i],
                              jax.random.fold_in(base_rng, i), 0.0)

        multi = jax.jit(ts.make_multi_step(model, tx))
        s_multi, metrics = multi(state, stacked, base_rng, 0.0)
        assert metrics["loss"].shape == (K,)
        for a, b in zip(jax.tree_util.tree_leaves(s_seq.params),
                        jax.tree_util.tree_leaves(s_multi.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=2e-5)
