"""Multi-device training-step correctness on the virtual 8-device CPU mesh:
shard_map DP == single-device math; GSPMD dp x tp runs and matches."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vlp_tpu.config import VLPConfig
from vlp_tpu.parallel import mesh as mesh_lib
from vlp_tpu.parallel import pjit_step
from vlp_tpu.parallel import train_step as ts
from tests.test_model import make_batch, tiny_cfg


def cfg8():
    # dims divisible by the model axis (2)
    return VLPConfig.tiny(vocab_size=128, hidden_size=64,
                          num_hidden_layers=2, num_attention_heads=4,
                          intermediate_size=128, len_vis_input=6,
                          max_len_b=5, max_pred=4)


@pytest.fixture(scope="module")
def setup():
    cfg = cfg8()
    model = ts.create_model(cfg)
    state, tx = ts.create_train_state(model, cfg, jax.random.PRNGKey(0),
                                      lr=1e-3, warmup=0.1, t_total=100)
    return cfg, model, state, tx


class TestShardMapDP:
    def test_matches_single_device(self, setup, rng):
        cfg, model, state, tx = setup
        assert jax.device_count() >= 8
        mesh = mesh_lib.make_mesh(data=8, model=1)
        batch = make_batch(cfg, 16, rng)

        single = jax.jit(ts.make_train_step(model, tx))
        s1, m1 = single(state, batch, jax.random.PRNGKey(7), 0.0)

        make = pjit_step.make_shard_map_step(model, tx, mesh)
        sharded_step = make(state, batch)
        s2, m2 = sharded_step(state, batch, jax.random.PRNGKey(7), 0.0)

        # metrics won't match exactly (dropout rng folded per shard +
        # drop-worst applied per shard, like the reference's per-device
        # semantics) but must be finite and close in scale
        assert np.isfinite(float(m2["loss"]))
        assert abs(float(m2["loss"]) - float(m1["loss"])) < 1.0

    def test_deterministic_equivalence(self, setup, rng):
        """With dropout off and no drop-worst, per-shard grads pmean'd must
        equal the global-batch gradient exactly."""
        cfg, model, state, tx = setup
        mesh = mesh_lib.make_mesh(data=8, model=1)
        batch = make_batch(cfg, 16, rng)

        import functools
        import optax
        from vlp_tpu.models.model import VLPModel

        def det_loss(params, batch):
            out = model.apply({"params": params}, batch, deterministic=True,
                              drop_worst_ratio=0.0, mask_image_regions=True,
                              task="img2txt", method=VLPModel.pretrain_losses)
            # mean-style loss: drop-worst normalisation sums weights, which
            # differs between a global batch and shard-mean of shards; use
            # the per-position mean so DP equivalence is exact
            return out["pretext_loss"] + out["masked_lm_loss"] * 0.0

        g_single = jax.grad(det_loss)(state.params, batch)

        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        bs = jax.tree_util.tree_map(
            lambda x: P("data", *([None] * (x.ndim - 1))), batch)
        ps = jax.tree_util.tree_map(lambda _: P(), state.params)

        def local(params, b):
            g = jax.grad(det_loss)(params, b)
            return jax.lax.pmean(g, "data")

        g_sharded = jax.jit(shard_map(
            local, mesh=mesh, in_specs=(ps, bs),
            out_specs=ps, check_vma=False))(state.params, batch)

        for a, b in zip(jax.tree_util.tree_leaves(g_single),
                        jax.tree_util.tree_leaves(g_sharded)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-5, atol=2e-6)


class TestShardMapPallas:
    def test_pallas_kernel_under_shard_map(self, rng):
        """The flagship single-chip recipe (Pallas fused attention) must run
        per-shard under shard_map DP — the pod configuration.  Interpret
        mode on the virtual CPU mesh; compiled Mosaic on real chips."""
        cfg = cfg8().replace(use_pallas_attention=True)
        model = ts.create_model(cfg)
        state, tx = ts.create_train_state(model, cfg, jax.random.PRNGKey(0),
                                          lr=1e-3, warmup=0.1, t_total=100)
        mesh = mesh_lib.make_mesh(data=8, model=1)
        batch = make_batch(cfg, 8, rng)
        make = pjit_step.make_shard_map_step(model, tx, mesh,
                                             mask_image_regions=True)
        step = make(state, batch)
        state, m = step(state, batch, jax.random.PRNGKey(5), 0.0)
        assert np.isfinite(float(m["loss"]))


class TestGSPMD:
    @pytest.mark.parametrize("model_par", [1, 2])
    def test_dp_tp_step(self, setup, rng, model_par):
        cfg, model, state, tx = setup
        mesh = mesh_lib.make_mesh(data=8 // model_par, model=model_par)
        batch = make_batch(cfg, 16, rng)
        make = pjit_step.make_pjit_train_step(
            model, tx, mesh, tensor_parallel=(model_par > 1))
        step = make(state, batch)
        st = pjit_step.shard_state(state, mesh,
                                   tensor_parallel=(model_par > 1))
        b = pjit_step.shard_batch(batch, mesh)
        st, metrics = step(st, b, jax.random.PRNGKey(3), jnp.float32(0.0))
        assert np.isfinite(float(metrics["loss"]))

    def test_tp_matches_replicated(self, setup, rng):
        """Same rng, deterministic grads: tp-sharded step must equal the
        single-device step's parameters after one update."""
        cfg, model, state, tx = setup
        batch = make_batch(cfg, 8, rng)
        single = jax.jit(ts.make_train_step(model, tx))
        s_ref, _ = single(state, batch, jax.random.PRNGKey(11), 0.0)

        mesh = mesh_lib.make_mesh(data=4, model=2)
        make = pjit_step.make_pjit_train_step(model, tx, mesh,
                                              tensor_parallel=True)
        step = make(state, batch)
        st = pjit_step.shard_state(state, mesh, tensor_parallel=True)
        b = pjit_step.shard_batch(batch, mesh)
        s_tp, _ = step(st, b, jax.random.PRNGKey(11), jnp.float32(0.0))

        for a, bb in zip(jax.tree_util.tree_leaves(s_ref.params),
                         jax.tree_util.tree_leaves(s_tp.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                       rtol=5e-4, atol=5e-5)

    def test_param_pspec_rules(self):
        from jax.sharding import PartitionSpec as P
        assert mesh_lib.param_pspec(["layer_0", "q_proj", "kernel"],
                                    None) == P(None, "model")
        assert mesh_lib.param_pspec(["layer_0", "out_proj", "kernel"],
                                    None) == P("model", None)
        assert mesh_lib.param_pspec(["embeddings", "word_embeddings",
                                     "embedding"], None) == P("model", None)
        assert mesh_lib.param_pspec(["layer_0", "attn_ln", "scale"],
                                    None) == P()


class TestShardMapTP:
    """Manual Megatron f/g tensor parallelism under shard_map (ops/tp.py +
    pjit_step tensor_parallel=True) — unlike GSPMD TP this keeps the Pallas
    kernels, because every shard runs an ordinary single-device program."""

    def _setup_tp(self, dp, tp, pallas=False):
        cfg = cfg8().replace(hidden_dropout_prob=0.0,
                             attention_probs_dropout_prob=0.0,
                             use_pallas_attention=pallas)
        model = ts.create_model(cfg)
        # t_total=-1: constant lr so the step-0 update is non-zero
        state, tx = ts.create_train_state(model, cfg, jax.random.PRNGKey(0),
                                          lr=1e-3, warmup=0.1, t_total=-1)
        mesh = mesh_lib.make_mesh(data=dp, model=tp)
        model_tp = ts.create_model(cfg.replace(tp_axis="model"))
        tx_tp = ts.make_optimizer(cfg, state.params, lr=1e-3, warmup=0.1,
                                  t_total=-1, clip_psum_axis="model")
        return cfg, model, state, tx, mesh, model_tp, tx_tp

    @pytest.mark.parametrize("dp,tp", [(2, 4), (4, 2)])
    def test_tp_matches_single_device(self, rng, dp, tp):
        """With dropout off, the dp x tp shard_map step must reproduce the
        single-device update: column shards are disjoint (exact) and row
        shards only reorder the contraction, so tolerances are float-assoc
        tight."""
        cfg, model, state, tx, mesh, model_tp, tx_tp = self._setup_tp(dp, tp)
        batch = make_batch(cfg, 16, rng)

        single = jax.jit(ts.make_train_step(model, tx))
        s_ref, m_ref = single(state, batch, jax.random.PRNGKey(7), 0.0)

        make = pjit_step.make_shard_map_step(model_tp, tx_tp, mesh,
                                             tensor_parallel=True)
        step = make(state, batch)
        s_tp, m_tp = step(state, batch, jax.random.PRNGKey(7), 0.0)

        np.testing.assert_allclose(float(m_tp["loss"]), float(m_ref["loss"]),
                                   rtol=2e-5)
        ref_leaves = jax.tree_util.tree_leaves_with_path(s_ref.params)
        tp_leaves = dict(jax.tree_util.tree_leaves_with_path(s_tp.params))
        for path, a in ref_leaves:
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(tp_leaves[path]), rtol=2e-5,
                atol=2e-6, err_msg=jax.tree_util.keystr(path))

    def test_clip_sees_full_param_norm(self, rng):
        """The per-parameter clip must use the FULL parameter's gradient
        norm (reference clip_grad_norm_, optimization.py:146-147): a
        uniform gradient of norm > 1 on a tp-sharded leaf has local norm
        full/sqrt(tp), so a missing psum changes the clip scale by
        sqrt(tp)."""
        cfg, model, state, tx, mesh, model_tp, tx_tp = self._setup_tp(2, 4)
        grads = jax.tree_util.tree_map(
            lambda p: jnp.full_like(p, 0.37, dtype=jnp.float32),
            state.params)
        updates_ref, _ = tx.update(grads, state.opt_state, state.params)

        from jax import shard_map
        from jax.sharding import PartitionSpec as P
        tp_n = mesh.shape["model"]
        pspec = mesh_lib.tp_param_specs(state.params, tp_n)
        ospec = type(state.opt_state)(step=P(), m=pspec, v=pspec)

        fn = shard_map(
            lambda g, o, p: tx_tp.update(g, o, p)[0], mesh=mesh,
            in_specs=(pspec, ospec, pspec), out_specs=pspec,
            check_vma=False)
        updates_tp = jax.jit(fn)(grads, state.opt_state, state.params)

        for (path, a), b in zip(
                jax.tree_util.tree_leaves_with_path(updates_ref),
                jax.tree_util.tree_leaves(updates_tp)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-6,
                err_msg=jax.tree_util.keystr(path))

    def test_tp_multi_step_matches_single(self, rng):
        """K-step device loop under dp x tp tracks the single-device
        trajectory exactly with dropout off."""
        cfg, model, state, tx, mesh, model_tp, tx_tp = self._setup_tp(4, 2)
        K = 2
        batches = [make_batch(cfg, 8, rng) for _ in range(K)]
        stacked = {k: jnp.stack([b[k] for b in batches]) for k in batches[0]}

        single = jax.jit(ts.make_multi_step(model, tx))
        s1, m1 = single(state, stacked, jax.random.PRNGKey(9), 0.0)

        sharded = pjit_step.shard_stacked_batch(stacked, mesh)
        fn = pjit_step.make_shard_map_multi_step(
            model_tp, tx_tp, mesh, tensor_parallel=True)(state, sharded)
        s_in = jax.tree_util.tree_map(jnp.array, state)
        s2, m2 = fn(s_in, sharded, jax.random.PRNGKey(9), 0.0)

        assert int(s2.step) == K
        np.testing.assert_allclose(np.asarray(m2["loss"]),
                                   np.asarray(m1["loss"]), rtol=2e-5)
        for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                        jax.tree_util.tree_leaves(s2.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=3e-5, atol=3e-6)

    def test_tp_pallas_smoke(self, rng):
        """dp x tp with the fused Pallas kernel per shard (interpret mode on
        CPU; the per-shard head-slab shapes are chip-validated in
        tests/test_tpu_dropout.py-style real-TPU runs)."""
        cfg, model, state, tx, mesh, model_tp, tx_tp = self._setup_tp(
            4, 2, pallas=True)
        batch = make_batch(cfg, 8, rng)
        make = pjit_step.make_shard_map_step(model_tp, tx_tp, mesh,
                                             tensor_parallel=True,
                                             mask_image_regions=True)
        step = make(state, batch)
        s2, m = step(state, batch, jax.random.PRNGKey(5), 0.0)
        assert np.isfinite(float(m["loss"]))

    def test_tp_requires_matching_model(self, rng):
        cfg, model, state, tx, mesh, model_tp, tx_tp = self._setup_tp(2, 4)
        with pytest.raises(AssertionError):
            pjit_step.make_shard_map_step(model, tx_tp, mesh,
                                          tensor_parallel=True)
        with pytest.raises(AssertionError):
            pjit_step.make_shard_map_step(model_tp, tx_tp, mesh,
                                          tensor_parallel=False)


class TestDataParallelDecode:
    @pytest.mark.parametrize("pallas", [False, True],
                             ids=["xla", "pallas_kernels"])
    def test_sharded_beam_matches_single(self, rng, pallas):
        """Beam search with the batch sharded over an 8-device data mesh
        must reproduce the single-device traces exactly.  With a mesh the
        Decoder runs the loop under shard_map (GSPMD cannot auto-partition
        Mosaic custom calls) — the pallas variant certifies the production
        configuration: fused prefill + decode-step kernels per shard."""
        import dataclasses
        from vlp_tpu.decode import DecodeParams, Decoder
        from vlp_tpu.models.model import VLPModel
        from tests.test_decode import decode_batch, setup_model

        cfg, model, params = setup_model(seed=2)
        if pallas:
            cfg = dataclasses.replace(cfg, use_pallas_attention=True,
                                      use_pallas_decode=True)
            model = VLPModel(cfg)
        dp = DecodeParams(beam_size=3, eos_id=4, mask_id=5,
                          forbid_duplicate_ngrams=True, ngram_size=2,
                          max_tgt_length=cfg.max_len_b,
                          forbid_ignore_ids=(4,))
        batch = decode_batch(cfg, 8, rng)

        single = Decoder(model, cfg, dp)
        out1 = single.beam_search(params, batch)

        mesh = mesh_lib.make_mesh(data=8, model=1)
        sharded = Decoder(model, cfg, dp, mesh=mesh)
        p2, b2 = sharded.shard_inputs(params, batch)
        out2 = sharded.beam_search(p2, b2)

        np.testing.assert_array_equal(out1["pred_seq"], out2["pred_seq"])
        np.testing.assert_allclose(out1["scores"], out2["scores"],
                                   rtol=1e-5, atol=1e-6)


class TestDeviceLoopMultiChip:
    def test_multi_step_under_shard_map(self, setup, rng):
        """make_shard_map_multi_step (the train CLI's meshed device loop,
        Pallas-compatible) tracks the single-device K-step trajectory."""
        cfg, model, state, tx = setup
        mesh = mesh_lib.make_mesh(data=8, model=1)
        K = 2
        batches = [make_batch(cfg, 16, rng) for _ in range(K)]
        stacked = {k: jnp.stack([b[k] for b in batches]) for k in batches[0]}

        single = jax.jit(ts.make_multi_step(model, tx))
        s1, m1 = single(state, stacked, jax.random.PRNGKey(9), 0.0)

        sharded = pjit_step.shard_stacked_batch(stacked, mesh)
        fn = pjit_step.make_shard_map_multi_step(model, tx, mesh)(
            state, sharded)
        # the device-loop factory donates its state arg (CLI consumes it);
        # feed a copy so the module-scoped fixture stays alive
        s_in = jax.tree_util.tree_map(jnp.array, state)
        s2, m2 = fn(s_in, sharded, jax.random.PRNGKey(9), 0.0)

        assert m2["loss"].shape == (K,)
        assert np.isfinite(np.asarray(m2["loss"])).all()
        # dropout rng is folded per shard, so trajectories differ slightly
        np.testing.assert_allclose(np.asarray(m2["loss"]),
                                   np.asarray(m1["loss"]), atol=1.0)
        assert int(s2.step) == int(s1.step) == K

    def test_multi_step_under_gspmd(self, setup, rng):
        """The production shape: K-step device loop with the batch dim
        sharded over the data axis."""
        from jax.sharding import NamedSharding, PartitionSpec as P
        cfg, model, state, tx = setup
        mesh = mesh_lib.make_mesh(data=8, model=1)
        K = 2
        batches = [make_batch(cfg, 16, rng) for _ in range(K)]
        stacked = {k: jnp.stack([b[k] for b in batches]) for k in batches[0]}
        stacked = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, NamedSharding(
                mesh, P(None, "data", *([None] * (x.ndim - 2))))), stacked)
        rep = NamedSharding(mesh, P())
        st = jax.tree_util.tree_map(lambda x: jax.device_put(x, rep), state)
        multi = jax.jit(ts.make_multi_step(model, tx))
        st, metrics = multi(st, stacked, jax.random.PRNGKey(4), 0.0)
        assert metrics["loss"].shape == (K,)
        assert np.isfinite(np.asarray(metrics["loss"])).all()


class TestShardMapGradAccum:
    def test_accum_matches_full_batch(self, rng):
        """grad_accum=2 through the 8-device shard_map step must equal the
        single-device full-batch step exactly when dropout is off and every
        example carries the same masked weight (grad averaging then commutes
        with micro-batching) — the reference composes DDP with accumulation
        the same way (run_img2txt_dist.py:111-114, 566-575)."""
        cfg = cfg8().replace(hidden_dropout_prob=0.0,
                             attention_probs_dropout_prob=0.0)
        model = ts.create_model(cfg)
        # t_total=-1: constant lr, so the step-0 update is non-zero (under
        # the warmup schedule lr(step=0)==0 and the comparison would be
        # vacuous — both sides would return the params unchanged)
        state, tx = ts.create_train_state(model, cfg, jax.random.PRNGKey(0),
                                          lr=1e-3, warmup=0.1, t_total=-1)
        mesh = mesh_lib.make_mesh(data=8, model=1)
        batch = make_batch(cfg, 16, rng)

        single = jax.jit(ts.make_train_step(model, tx))
        s_ref, m_ref = single(state, batch, jax.random.PRNGKey(7), 0.0)

        make = pjit_step.make_shard_map_step(model, tx, mesh, grad_accum=2)
        step = make(state, batch)
        s_acc, m_acc = step(state, batch, jax.random.PRNGKey(7), 0.0)

        assert int(s_acc.step) == 1
        np.testing.assert_allclose(float(m_acc["loss"]),
                                   float(m_ref["loss"]), rtol=2e-5)
        for a, b in zip(jax.tree_util.tree_leaves(s_ref.params),
                        jax.tree_util.tree_leaves(s_acc.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-5, atol=2e-6)

    def test_accum_multi_step_runs(self, setup, rng):
        """K-step device loop with accumulation inside each optimizer step
        (the CLI's --device_loop_steps + --gradient_accumulation_steps)."""
        cfg, model, state, tx = setup
        mesh = mesh_lib.make_mesh(data=8, model=1)
        K = 2
        batches = [make_batch(cfg, 16, rng) for _ in range(K)]
        stacked = {k: jnp.stack([b[k] for b in batches]) for k in batches[0]}
        sharded = pjit_step.shard_stacked_batch(stacked, mesh)
        fn = pjit_step.make_shard_map_multi_step(model, tx, mesh,
                                                 grad_accum=2)(state, sharded)
        s_in = jax.tree_util.tree_map(jnp.array, state)
        s2, m2 = fn(s_in, sharded, jax.random.PRNGKey(9), 0.0)
        assert m2["loss"].shape == (K,)
        assert np.isfinite(np.asarray(m2["loss"])).all()
        assert int(s2.step) == K


class TestShardMapSCST:
    @pytest.mark.parametrize("replay", ["scan", "fused"])
    def test_scst_step_matches_single_device(self, rng, replay):
        """Data-parallel SCST (rollouts + forced-replay policy gradient per
        shard, grads pmean'd — the reference's 4-GPU DDP SCST recipe,
        run_img2txt_dist.py:379-387 + :486-523) must reproduce, with dropout
        off: (a) the single-device greedy baseline exactly, and (b) the
        parameter update implied by the mean of per-shard policy
        gradients.  Covers both replay implementations — ``fused`` is the
        shipping default (see DESIGN.md round-4 SCST chapter)."""
        import optax
        from vlp_tpu import scst as scst_lib
        from tests.test_decode import decode_batch, tiny_cfg as dec_tiny

        cfg = dec_tiny().replace(hidden_dropout_prob=0.0,
                                 attention_probs_dropout_prob=0.0)
        model = ts.create_model(cfg)
        # t_total=-1: constant lr (lr(step=0) would be 0 under warmup,
        # making the parameter comparison below vacuous)
        state, tx = ts.create_train_state(model, cfg, jax.random.PRNGKey(0),
                                          lr=1e-3, warmup=0.1, t_total=-1)
        mesh = mesh_lib.make_mesh(data=8, model=1)
        B = 8
        batch = decode_batch(cfg, B, rng)
        gt = rng.integers(6, cfg.vocab_size, (B, cfg.max_len_b)).astype(
            np.int32)
        gt[:, -1] = 4  # EOS

        kw = dict(mask_id=5, eos_id=4, pad_id=0,
                  max_tgt_length=cfg.max_len_b, replay=replay)
        tr_mesh = scst_lib.SCSTTrainer(model, cfg, tx=tx, mesh=mesh, **kw)
        tr_single = scst_lib.SCSTTrainer(model, cfg, tx=tx, **kw)

        st_m, b_m = tr_mesh.shard_inputs(state, batch)
        rng_key = jax.random.PRNGKey(3)
        greedy_m, sample_m, raw_m = tr_mesh.rollouts(st_m.params, b_m,
                                                     rng_key)
        greedy_s, _, _ = tr_single.rollouts(state.params, batch, rng_key)
        # greedy baseline is deterministic -> must match exactly
        np.testing.assert_array_equal(greedy_m, greedy_s)

        # expected update: mean of per-shard pg grads on the mesh's own
        # sampled rollout (DDP semantics), applied through the same tx
        reward = scst_lib.get_self_critical_reward(greedy_m, gt, sample_m)
        assert np.abs(reward).sum() > 0  # a zero reward would zero the
        # grads and make the parameter comparison below near-vacuous
        per_shard = []
        for sh in range(8):
            sl = slice(sh, sh + 1)
            shard_batch = {k: v[sl] for k, v in batch.items()}
            _, g = jax.value_and_grad(tr_single._pg_loss, has_aux=True)(
                state.params, shard_batch, jnp.asarray(raw_m[sl]),
                jnp.asarray(sample_m[sl]), jnp.asarray(reward[sl]),
                jax.random.PRNGKey(0))
            per_shard.append(g)
        mean_g = jax.tree_util.tree_map(
            lambda *gs: sum(gs) / len(gs), *per_shard)
        updates, _ = tx.update(mean_g, state.opt_state, state.params)
        expect = optax.apply_updates(state.params, updates)

        # host snapshots BEFORE the step: the mesh step donates its state
        # arg, and on CPU device_put(replicated) can alias the source
        # buffers, deleting state.params too
        before = [np.array(x) for x in
                  jax.tree_util.tree_leaves(state.params)]
        expect_np = [np.array(x) for x in jax.tree_util.tree_leaves(expect)]

        st2, loss, metrics = tr_mesh.step(st_m, b_m, gt, rng_key)
        assert np.isfinite(loss)
        assert "mean_reward" in metrics
        after = [np.asarray(x) for x in
                 jax.tree_util.tree_leaves(st2.params)]
        changed = any(not np.allclose(a, b)
                      for a, b in zip(before, after))
        assert changed, "SCST step left all params unchanged"
        for a, b in zip(expect_np, after):
            np.testing.assert_allclose(a, b, rtol=3e-5, atol=3e-6)


class TestShardMapSCSTDropout:
    def test_mesh_fused_replay_reproduces_sharded_rollout_logprobs(self,
                                                                   rng):
        """Dropout ON under shard_map: each shard's fused forced replay
        must reproduce its OWN explicit-dropout rollout's log-probs.  This
        pins the per-shard key derivation the sharded grad step relies on
        (scst.py: rollout body folds the data-axis index into the rng,
        replay body folds identically then takes split(.)[1]) — the
        single-device equivalence (test_pipeline.py) does not exercise the
        fold_in-by-shard leg.  On CPU the rollout rides the XLA
        explicit-dropout path; the TPU kernel twin is
        tests/test_tpu_dropout.py."""
        from jax import shard_map
        from jax.sharding import PartitionSpec as P
        from vlp_tpu import scst as scst_lib
        from tests.test_decode import decode_batch, tiny_cfg as dec_tiny

        cfg = dec_tiny()  # dropout 0.1 (config defaults)
        assert cfg.hidden_dropout_prob > 0
        model = ts.create_model(cfg)
        state, tx = ts.create_train_state(model, cfg, jax.random.PRNGKey(0),
                                          lr=1e-3, warmup=0.1, t_total=-1)
        mesh = mesh_lib.make_mesh(data=8, model=1)
        B = 8
        batch = decode_batch(cfg, B, rng)
        tr = scst_lib.SCSTTrainer(model, cfg, mask_id=5, eos_id=4, pad_id=0,
                                  max_tgt_length=cfg.max_len_b,
                                  replay="fused")
        rep = P()
        dspec = jax.tree_util.tree_map(
            lambda x: P("data", *([None] * (x.ndim - 1))), batch)
        pspec = jax.tree_util.tree_map(lambda _: rep, state.params)

        def roll_body(params, batch, key):
            r = jax.random.fold_in(key, jax.lax.axis_index("data"))
            return tr.decoder._run_greedy(params, batch, r, sample=True,
                                          train_mode=True,
                                          explicit_dropout=True)

        def replay_body(params, batch, raw, key):
            # the sharded grad step's exact derivation
            # (scst._make_sharded_grad_update.body)
            r = jax.random.fold_in(key, jax.lax.axis_index("data"))
            _, drop_rng = jax.random.split(r)
            return tr._forced_logprobs_fused(params, batch, raw, drop_rng)

        key = jax.random.PRNGKey(21)
        st_m, b_m = tr.shard_inputs(state, batch)
        ids, lps = jax.jit(shard_map(
            roll_body, mesh=mesh, in_specs=(pspec, dspec, rep),
            out_specs=(P("data"), P("data")), check_vma=False))(
                st_m.params, b_m, key)
        forced = jax.jit(shard_map(
            replay_body, mesh=mesh,
            in_specs=(pspec, dspec, P("data"), rep),
            out_specs=P("data"), check_vma=False))(
                st_m.params, b_m, ids, key)
        np.testing.assert_allclose(np.asarray(forced), np.asarray(lps),
                                   rtol=1e-5, atol=1e-6)

        # the shard fold is load-bearing: an UNFOLDED rollout (same key on
        # every shard -> same dropout streams) must differ on shards > 0
        def roll_nofold(params, batch, key):
            return tr.decoder._run_greedy(params, batch, key, sample=True,
                                          train_mode=True,
                                          explicit_dropout=True)

        _, lps_nf = jax.jit(shard_map(
            roll_nofold, mesh=mesh, in_specs=(pspec, dspec, rep),
            out_specs=(P("data"), P("data")), check_vma=False))(
                st_m.params, b_m, key)
        assert np.abs(np.asarray(lps_nf)[1:] - np.asarray(lps)[1:]).max() \
            > 1e-6


class TestStackBatches:
    def test_out_buffer_reuse(self, setup, rng):
        cfg, model, state, tx = setup
        b1 = [make_batch(cfg, 2, rng) for _ in range(3)]
        b2 = [make_batch(cfg, 2, rng) for _ in range(3)]
        fresh = ts.stack_batches(b1)
        pool = ts.stack_batches(b1, out=None)
        reused = ts.stack_batches(b2, out=pool)
        assert reused is pool  # same buffers, refilled in place
        for k in fresh:
            np.testing.assert_array_equal(fresh[k], np.stack(
                [np.asarray(b[k]) for b in b1]))
            np.testing.assert_array_equal(reused[k], np.stack(
                [np.asarray(b[k]) for b in b2]))

    def test_out_shape_mismatch_asserts(self, setup, rng):
        cfg, model, state, tx = setup
        pool = ts.stack_batches([make_batch(cfg, 2, rng)])
        import pytest as _pytest
        with _pytest.raises(AssertionError):
            ts.stack_batches([make_batch(cfg, 4, rng)], out=pool)


class TestFastPrngKeyPortable:
    def test_threefry_fallback_is_default_stream(self):
        """fast=False must be bit-identical to jax.random.PRNGKey usage
        (backend-portable reproducibility escape hatch)."""
        a = ts.fast_prng_key(7, fast=False)
        b = jax.random.PRNGKey(7)
        np.testing.assert_array_equal(
            jax.random.uniform(a, (4,)), jax.random.uniform(b, (4,)))

    def test_fast_default_follows_backend(self):
        key = ts.fast_prng_key(3)  # CPU in tests -> threefry
        assert "threefry" in str(jax.random.key_impl(key))


class TestFastPrngKey:
    def test_rbg_key_through_train_and_decode(self, setup, rng):
        """fast_prng_key(fast=True) (the default TPU dropout stream, XLA
        RngBitGenerator) must flow through fold_in/split, flax dropout, the
        multi-step scan, and the sampling decoder."""
        cfg, model, state, tx = setup
        key = ts.fast_prng_key(3, fast=True)
        batch = make_batch(cfg, 4, rng)

        step = jax.jit(ts.make_train_step(model, tx))
        s1, m1 = step(state, batch, key, 0.0)
        assert np.isfinite(float(m1["loss"]))

        stacked = {k: jnp.stack([v, v]) for k, v in batch.items()}
        multi = jax.jit(ts.make_multi_step(model, tx))
        s2, m2 = multi(state, stacked, jax.random.fold_in(key, 1), 0.0)
        assert np.isfinite(np.asarray(m2["loss"])).all()

        from vlp_tpu.decode import DecodeParams, Decoder
        from tests.test_decode import decode_batch
        dp = DecodeParams(mask_id=4, eos_id=5, max_tgt_length=4)
        dec = Decoder(model, cfg, dp)
        dbatch = decode_batch(cfg, 2, rng)
        ids, lps = dec.sample(s1.params, dbatch, jax.random.fold_in(key, 2),
                              train_mode=True)
        assert ids.shape == (2, 4) and np.isfinite(np.asarray(lps)).all()
