"""Data pipeline (stores, loaders) and SCST."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vlp_tpu import scst as scst_lib
from vlp_tpu.config import VLPConfig
from vlp_tpu.data.dataset import CaptionExample
from vlp_tpu.data.example_builder import (DecodeExampleBuilder,
                                          TrainExampleBuilder, collate)
from vlp_tpu.data.features import CachedStore, SyntheticFeatureStore
from vlp_tpu.data.loader import EvalLoader, TrainLoader
from vlp_tpu.models.model import VLPModel
from vlp_tpu.parallel import train_step as ts

VOCAB = {w: i for i, w in enumerate(
    ["[PAD]", "[UNK]", "[X_SEP]", "[CLS]", "[SEP]", "[MASK]", "a", "man",
     "dog", "horse", "rides", "runs", "fast"])}


def tiny_cfg():
    return VLPConfig.tiny(vocab_size=32, hidden_size=32, num_hidden_layers=2,
                          num_attention_heads=2, intermediate_size=64,
                          len_vis_input=6, max_len_b=5, max_pred=4,
                          vis_feat_dim=16, vis_cls_dim=8, vis_pe_dim=14)


def examples(n):
    return [CaptionExample(f"img_{i}.npy", ["a", "man", "rides"],
                           image_id=i) for i in range(n)]


def store(cfg):
    return SyntheticFeatureStore(num_regions=cfg.len_vis_input,
                                 feat_dim=cfg.vis_feat_dim,
                                 cls_dim=cfg.vis_pe_dim - 6)


class TestStores:
    def test_synthetic_deterministic(self):
        cfg = tiny_cfg()
        s = store(cfg)
        f1, p1 = s.get("k1")
        f2, p2 = s.get("k1")
        np.testing.assert_array_equal(f1, f2)
        assert f1.shape == (cfg.len_vis_input, cfg.vis_feat_dim)
        assert p1.shape == (cfg.len_vis_input, cfg.vis_pe_dim)
        f3, _ = s.get("k2")
        assert np.abs(f1 - f3).max() > 0

    def test_cached(self):
        cfg = tiny_cfg()
        calls = []
        inner = store(cfg)
        orig = inner.get
        inner.get = lambda k: (calls.append(k), orig(k))[1]
        c = CachedStore(inner)
        c.get("a")
        c.get("a")
        assert calls == ["a"]


class TestTrainLoader:
    def make(self, cfg, n=20, **kw):
        builders = [
            TrainExampleBuilder(cfg, VOCAB, mode="s2s"),
            TrainExampleBuilder(cfg, VOCAB, mode="bi"),
        ]
        return TrainLoader(examples(n), store(cfg), builders, [0.75, 0.25],
                           batch_size=4, num_workers=2, **kw)

    def test_batches(self):
        cfg = tiny_cfg()
        loader = self.make(cfg)
        batches = list(loader.epoch(0))
        assert len(batches) == len(loader) == 5
        b = batches[0]
        assert b["input_ids"].shape == (4, cfg.seq_len)
        assert b["vis_feats"].shape == (4, cfg.len_vis_input, cfg.vis_feat_dim)
        modes = np.concatenate([b["mode"] for b in batches])
        assert set(modes.tolist()) <= {0, 1}

    def test_deterministic_given_seed(self):
        cfg = tiny_cfg()
        b1 = next(iter(self.make(cfg, seed=7).epoch(3)))
        b2 = next(iter(self.make(cfg, seed=7).epoch(3)))
        for k in b1:
            np.testing.assert_array_equal(b1[k], b2[k])

    def test_start_batch_resumes_exact_stream(self):
        """epoch(start_batch=N) must continue the epoch stream exactly where
        an uninterrupted run would be after N batches (mid-epoch resume)."""
        cfg = tiny_cfg()
        full = [{k: v.copy() for k, v in b.items()}
                for b in self.make(cfg, seed=7).epoch(1)]
        resumed = list(self.make(cfg, seed=7).epoch(1, start_batch=2))
        assert len(resumed) == len(full) - 2
        for got, want in zip(resumed, full[2:]):
            for k in want:
                np.testing.assert_array_equal(got[k], want[k], err_msg=k)

    def test_external_feature_slabs_match_fresh(self):
        """feature_slabs = row views of [K, B, ...] stacked transfer
        buffers (the zero-copy device loop): consuming in K-groups must
        reproduce the fresh-allocation stream exactly, with each group's
        features landing in the right stack rows."""
        cfg = tiny_cfg()
        K, S, B = 2, 3, 4
        fresh = [{k: v.copy() for k, v in b.items()}
                 for b in self.make(cfg, seed=7).epoch(2)]
        st = store(cfg)
        f0, p0 = st.get("img_0.npy")
        stack_f = [np.empty((K, B) + f0.shape, f0.dtype) for _ in range(S)]
        stack_p = [np.empty((K, B) + p0.shape, p0.dtype) for _ in range(S)]
        slabs = [(stack_f[s][k], stack_p[s][k])
                 for s in range(S) for k in range(K)]
        loader = self.make(cfg, seed=7, feature_slabs=slabs, prefetch=2)
        pending = []
        got = 0
        for b_i, batch in enumerate(loader.epoch(2)):
            for k in batch:
                if k not in ("vis_feats", "vis_pe"):
                    np.testing.assert_array_equal(batch[k], fresh[b_i][k],
                                                  err_msg=k)
            pending.append(b_i)
            if len(pending) < K:
                continue
            s = (b_i // K) % S
            for row, fb in enumerate(pending):
                np.testing.assert_array_equal(stack_f[s][row],
                                              fresh[fb]["vis_feats"])
                np.testing.assert_array_equal(stack_p[s][row],
                                              fresh[fb]["vis_pe"])
            pending = []
            got += 1
        assert got == len(fresh) // K

    def test_example_seeds_collision_free(self):
        """No two examples in (or across) epochs may share a masking RNG
        stream.  The old affine seed formula let (i, j) and (i±1, j∓31)
        collide; SeedSequence spawning keys on the unique stream position."""
        cfg = tiny_cfg()
        loader = self.make(cfg)
        states = set()
        n = 0
        for epoch in range(3):
            for pos in range(200):
                ss = loader._example_seed(epoch, pos)
                states.add(tuple(ss.generate_state(2).tolist()))
                n += 1
        # and across hosts: same (epoch, pos) on another process differs
        other = self.make(cfg, process_index=1, process_count=2)
        for pos in range(200):
            states.add(tuple(other._example_seed(0, pos)
                             .generate_state(2).tolist()))
            n += 1
        assert len(states) == n

    def test_slab_mode_matches_fresh(self):
        """Recycled feature slabs must yield byte-identical batches to the
        allocate-per-batch path (consumed immediately, per the contract)."""
        cfg = tiny_cfg()
        fresh = [{k: v.copy() for k, v in b.items()}
                 for b in self.make(cfg, seed=7).epoch(2)]
        slab_loader = self.make(cfg, seed=7, feature_slab_slots=6)
        for i, b in enumerate(slab_loader.epoch(2)):
            for k in b:
                np.testing.assert_array_equal(b[k], fresh[i][k], err_msg=k)
        assert i == len(fresh) - 1

    def test_producer_error_propagates(self):
        """A failing feature fetch must raise in the consumer, not hang."""
        cfg = tiny_cfg()
        loader = self.make(cfg)

        class Boom(Exception):
            pass

        def explode(key):
            raise Boom(key)

        loader.store.get = explode
        import pytest as _pytest
        with _pytest.raises(Boom):
            list(loader.epoch(0))

    def test_epochs_reshuffle(self):
        cfg = tiny_cfg()
        loader = self.make(cfg)
        i0 = loader.epoch_indices(0)
        i1 = loader.epoch_indices(1)
        assert not np.array_equal(i0, i1)

    def test_process_sharding_disjoint(self):
        cfg = tiny_cfg()
        l0 = self.make(cfg, process_index=0, process_count=2)
        l1 = self.make(cfg, process_index=1, process_count=2)
        i0 = set(l0.epoch_indices(0).tolist())
        i1 = set(l1.epoch_indices(0).tolist())
        assert not (i0 & i1)
        assert len(i0) == len(i1) == 10


class TestEvalLoader:
    def test_tail_padding(self):
        cfg = tiny_cfg()
        builder = DecodeExampleBuilder(cfg, VOCAB,
                                       max_tgt_length=cfg.max_len_b)
        loader = EvalLoader(examples(5), store(cfg), builder, batch_size=4)
        out = list(loader)
        assert len(out) == 2
        batch, chunk, pad = out[1]
        assert pad == 3
        assert len(chunk) == 1
        assert batch["input_ids"].shape[0] == 4

    def test_slab_mode_matches_fresh(self):
        """Recycled eval slabs (incl. tail padding) must yield the same
        batches as the allocate-per-batch path when consumed immediately."""
        cfg = tiny_cfg()
        builder = DecodeExampleBuilder(cfg, VOCAB,
                                       max_tgt_length=cfg.max_len_b)
        fresh = [( {k: v.copy() for k, v in b.items()}, c, p)
                 for b, c, p in EvalLoader(examples(9), store(cfg), builder,
                                           batch_size=4)]
        for prefetch in (False, True):
            slab = EvalLoader(examples(9), store(cfg), builder, batch_size=4,
                              feature_slab_slots=3, prefetch=prefetch)
            got = [({k: v.copy() for k, v in b.items()}, c, p)
                   for b, c, p in slab]
            assert len(got) == len(fresh) == 3
            for (gb, gc, gp), (fb, fc, fp) in zip(got, fresh):
                assert gp == fp and [e.feature_key for e in gc] == \
                    [e.feature_key for e in fc]
                for k in fb:
                    np.testing.assert_array_equal(gb[k], fb[k], err_msg=k)


    def test_abandoned_iteration_does_not_wedge_producer(self):
        """A consumer that stops mid-stream (e.g. decode CLI hits an error)
        must not leave the prefetch producer blocked on its terminal
        sentinel put — that pinned the slab buffers and thread pool for the
        life of the process."""
        import threading
        import time

        cfg = tiny_cfg()
        builder = DecodeExampleBuilder(cfg, VOCAB,
                                       max_tgt_length=cfg.max_len_b)
        before = set(threading.enumerate())
        loader = EvalLoader(examples(20), store(cfg), builder, batch_size=4,
                            feature_slab_slots=3, prefetch=True)
        it = iter(loader)
        next(it)
        it.close()  # abandon with batches still queued/being built
        deadline = time.time() + 10
        while time.time() < deadline:
            alive = [t for t in set(threading.enumerate()) - before
                     if t.is_alive()]
            if not alive:
                break
            time.sleep(0.05)
        assert not alive, f"stuck producer threads: {alive}"


class TestSCST:
    def test_reward_and_grads(self, rng):
        cfg = tiny_cfg()
        model = VLPModel(cfg)
        params = ts.init_params(model, cfg, jax.random.PRNGKey(0))
        builder = DecodeExampleBuilder(cfg, VOCAB,
                                       max_tgt_length=cfg.max_len_b)
        s = store(cfg)
        batch = {k: jnp.asarray(v) for k, v in collate(
            [builder(*s.get(f"i{j}")) for j in range(2)]).items()}
        trainer = scst_lib.SCSTTrainer(
            model, cfg, mask_id=VOCAB["[MASK]"], eos_id=VOCAB["[SEP]"],
            max_tgt_length=cfg.max_len_b)
        gt = np.array([[6, 7, 10, 4, 0], [8, 11, 4, 0, 0]], np.int32)
        loss, grads, metrics = trainer.loss_and_grads(
            params, batch, gt, jax.random.PRNGKey(1))
        assert np.isfinite(float(loss))
        gnorm = sum(float(jnp.sum(jnp.abs(g)))
                    for g in jax.tree_util.tree_leaves(grads))
        assert gnorm > 0
        assert "mean_reward" in metrics

    def test_forced_logprobs_match_sample(self, rng):
        """Forced rollout must reproduce the sampling rollout's log-probs."""
        cfg = tiny_cfg()
        model = VLPModel(cfg)
        params = ts.init_params(model, cfg, jax.random.PRNGKey(0))
        builder = DecodeExampleBuilder(cfg, VOCAB,
                                       max_tgt_length=cfg.max_len_b)
        s = store(cfg)
        batch = {k: jnp.asarray(v) for k, v in collate(
            [builder(*s.get(f"i{j}")) for j in range(2)]).items()}
        trainer = scst_lib.SCSTTrainer(
            model, cfg, mask_id=VOCAB["[MASK]"], eos_id=VOCAB["[SEP]"],
            max_tgt_length=cfg.max_len_b)
        ids, lps = trainer.decoder.sample(params, batch, jax.random.PRNGKey(5))
        forced = trainer._forced_logprobs(params, batch, jnp.asarray(ids))
        np.testing.assert_allclose(np.asarray(forced), np.asarray(lps),
                                   rtol=1e-4, atol=1e-4)

    def test_remat_grads_equal(self, rng):
        """SCSTTrainer(remat=True) rematerialises the forced-replay scan
        body (jax.checkpoint — needed for per-chip batches >=256 on a 16G
        v5e); gradients must equal the non-remat path exactly."""
        cfg = tiny_cfg()
        model = VLPModel(cfg)
        params = ts.init_params(model, cfg, jax.random.PRNGKey(0))
        builder = DecodeExampleBuilder(cfg, VOCAB,
                                       max_tgt_length=cfg.max_len_b)
        s = store(cfg)
        batch = {k: jnp.asarray(v) for k, v in collate(
            [builder(*s.get(f"i{j}")) for j in range(2)]).items()}
        kw = dict(mask_id=VOCAB["[MASK]"], eos_id=VOCAB["[SEP]"],
                  max_tgt_length=cfg.max_len_b)
        gt = np.array([[6, 7, 10, 4, 0], [8, 11, 4, 0, 0]], np.int32)
        base = scst_lib.SCSTTrainer(model, cfg, **kw)
        rem = scst_lib.SCSTTrainer(model, cfg, remat=True, **kw)
        l0, g0, _ = base.loss_and_grads(params, batch, gt,
                                        jax.random.PRNGKey(1))
        l1, g1, _ = rem.loss_and_grads(params, batch, gt,
                                       jax.random.PRNGKey(1))
        np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6), g0, g1)

    def test_clean_rollout(self):
        ids = np.array([[5, 6, 4, 7, 8],     # EOS at 2 -> keep EOS, zero rest
                        [5, 0, 6, 7, 8],     # PAD at 1 -> stop without EOS
                        [5, 6, 7, 8, 9]])    # no stop
        out = scst_lib.clean_rollout(ids, eos_id=4, pad_id=0)
        np.testing.assert_array_equal(
            out, [[5, 6, 4, 0, 0], [5, 0, 0, 0, 0], [5, 6, 7, 8, 9]])

    def test_reward_criterion_torch_oracle(self):
        """losses.scst_reward_loss vs a direct torch transcription of the
        reference RewardCriterion (scst_utils.py:66-78)."""
        import torch
        from vlp_tpu.losses import scst_reward_loss

        def torch_reward_criterion(inp, seq, reward):
            inp = inp.contiguous().view(-1)
            reward = reward.contiguous().view(-1)
            mask = (seq > 0).float()
            mask = torch.cat(
                [mask.new(mask.size(0), 1).fill_(1), mask[:, :-1]],
                1).contiguous().view(-1)
            out = -inp * reward * mask
            return torch.sum(out) / torch.sum(mask)

        r = np.random.default_rng(3)
        B, T = 7, 12
        logp = r.normal(-2, 1, (B, T)).astype(np.float32)
        seq = r.integers(0, 6, (B, T)).astype(np.int64)
        seq[2, 5:] = 0  # a finished row
        rew = np.repeat(r.normal(0, 2, (B, 1)), T, 1).astype(np.float32)
        want = float(torch_reward_criterion(
            torch.tensor(logp), torch.tensor(seq), torch.tensor(rew)))
        got = float(scst_reward_loss(jnp.asarray(logp), jnp.asarray(seq),
                                     jnp.asarray(rew)))
        assert got == pytest.approx(want, rel=1e-6)

    def test_get_self_critical_reward_oracle(self):
        """scst.get_self_critical_reward vs a transcription of the
        reference function (scst_utils.py:36-63) scored with the
        independent pycocoevalcap-oracle CIDEr."""
        from pycoco_oracle import oracle_cider

        def ref_array_to_str(arr):
            out = ""
            for x in arr:
                out += str(int(x)) + " "
                if int(x) == 0:
                    break
            return out.strip()

        def ref_reward(greedy_res, gt_ids, gen_result):
            B, T = gen_result.shape
            res = {i: [ref_array_to_str(gen_result[i])] for i in range(B)}
            res.update({B + i: [ref_array_to_str(greedy_res[i])]
                        for i in range(B)})
            gts = {i: [ref_array_to_str(gt_ids[i])] for i in range(B)}
            gts.update({B + i: [ref_array_to_str(gt_ids[i])]
                        for i in range(B)})
            _, scores = oracle_cider(gts, res)
            scores = np.asarray(scores)
            return np.repeat((scores[:B] - scores[B:])[:, None], T, 1)

        r = np.random.default_rng(5)
        B, T = 6, 8
        gt = r.integers(1, 9, (B, T))
        greedy = gt.copy()
        greedy[::2, -3:] = r.integers(1, 9, (B // 2 + B % 2, 3))
        sample = r.integers(1, 9, (B, T))
        sample[1] = gt[1]  # one perfect sample
        want = ref_reward(greedy, gt, sample)
        got = scst_lib.get_self_critical_reward(greedy, gt, sample)
        np.testing.assert_allclose(got, want, atol=1e-9)

    def test_clean_rollout_matches_loop_oracle(self):
        """Vectorised cleanup vs the reference's per-token loop semantics
        (run_img2txt_dist.py:497-515) on random rollouts."""
        def oracle(ids, eos_id, pad_id):
            out = np.zeros_like(ids)
            for b in range(ids.shape[0]):
                for t in range(ids.shape[1]):
                    tok = ids[b, t]
                    if tok != eos_id and tok != pad_id:
                        out[b, t] = tok
                    else:
                        if tok == eos_id:
                            out[b, t] = eos_id
                        break
            return out

        r = np.random.default_rng(0)
        ids = r.integers(0, 8, size=(64, 24))
        np.testing.assert_array_equal(
            scst_lib.clean_rollout(ids, eos_id=4, pad_id=0),
            oracle(ids, eos_id=4, pad_id=0))

    def test_reward_sign(self):
        # batch of 2 distinct images so corpus idf is nonzero (a 1-image
        # batch degenerates to zero idf — same as the reference scorer)
        gt = np.array([[6, 7, 10, 4, 0], [8, 11, 12, 4, 0]])
        good = gt.copy()
        bad = np.array([[9, 9, 9, 9, 9], [3, 3, 3, 3, 3]])
        r = scst_lib.get_self_critical_reward(bad, gt, good)
        assert (r > 0).all()      # sample matches gt, greedy doesn't
        r2 = scst_lib.get_self_critical_reward(good, gt, bad)
        assert (r2 < 0).all()

    @pytest.mark.parametrize("pallas_dec", [False, True])
    def test_fused_replay_matches_rollout_dropout(self, rng, pallas_dec):
        """replay="fused": the teacher-forced dual-block pass
        (VLPModel.scst_replay_hidden) must reproduce the explicit-dropout
        sampled rollout's log-probs EXACTLY (same masks, re-drawn from the
        shared key contract) — on both cache layouts — and, deterministically
        (no dropout key), must equal the scan replay bit-for-bit."""
        import functools
        cfg = tiny_cfg().replace(use_pallas_decode=pallas_dec)
        model = VLPModel(cfg)
        params = ts.init_params(model, cfg, jax.random.PRNGKey(0))
        builder = DecodeExampleBuilder(cfg, VOCAB,
                                       max_tgt_length=cfg.max_len_b)
        s = store(cfg)
        batch = {k: jnp.asarray(v) for k, v in collate(
            [builder(*s.get(f"i{j}")) for j in range(3)]).items()}
        tr = scst_lib.SCSTTrainer(
            model, cfg, mask_id=VOCAB["[MASK]"], eos_id=VOCAB["[SEP]"],
            max_tgt_length=cfg.max_len_b, replay="fused")
        key = jax.random.PRNGKey(11)
        ids, lps = jax.jit(functools.partial(
            tr.decoder._run_greedy, sample=True, train_mode=True,
            explicit_dropout=True))(params, batch, key)
        _, drop_rng = jax.random.split(key)
        forced = tr._forced_logprobs_fused(params, batch, jnp.asarray(ids),
                                           drop_rng)
        np.testing.assert_allclose(np.asarray(forced), np.asarray(lps),
                                   rtol=1e-5, atol=1e-6)
        # dropout genuinely active: a different key changes the log-probs
        other = tr._forced_logprobs_fused(params, batch, jnp.asarray(ids),
                                          jax.random.PRNGKey(99))
        assert np.abs(np.asarray(other) - np.asarray(lps)).max() > 1e-4
        # deterministic: fused == scan replay (same function; tolerance is
        # fp reassociation between the two compiled structures)
        f0 = tr._forced_logprobs_fused(params, batch, jnp.asarray(ids))
        s0 = tr._forced_logprobs(params, batch, jnp.asarray(ids))
        np.testing.assert_allclose(np.asarray(f0), np.asarray(s0),
                                   rtol=1e-5, atol=1e-6)

    def test_fused_replay_grads_match_scan(self, rng):
        """With dropout off the fused and scan replays are the same
        function, so the full loss_and_grads pipelines must agree."""
        cfg = tiny_cfg().replace(hidden_dropout_prob=0.0,
                                 attention_probs_dropout_prob=0.0)
        model = VLPModel(cfg)
        params = ts.init_params(model, cfg, jax.random.PRNGKey(0))
        builder = DecodeExampleBuilder(cfg, VOCAB,
                                       max_tgt_length=cfg.max_len_b)
        s = store(cfg)
        batch = {k: jnp.asarray(v) for k, v in collate(
            [builder(*s.get(f"i{j}")) for j in range(2)]).items()}
        kw = dict(mask_id=VOCAB["[MASK]"], eos_id=VOCAB["[SEP]"],
                  max_tgt_length=cfg.max_len_b)
        gt = np.array([[6, 7, 10, 4, 0], [8, 11, 4, 0, 0]], np.int32)
        tr_scan = scst_lib.SCSTTrainer(model, cfg, **kw)
        tr_fused = scst_lib.SCSTTrainer(model, cfg, replay="fused", **kw)
        l0, g0, _ = tr_scan.loss_and_grads(params, batch, gt,
                                           jax.random.PRNGKey(1))
        l1, g1, _ = tr_fused.loss_and_grads(params, batch, gt,
                                            jax.random.PRNGKey(1))
        np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-6), g0, g1)

    def test_loss_uses_raw_logprobs_with_cleaned_mask(self, rng):
        """Reference rl_crit semantics (run_img2txt_dist.py:506-523): the
        loss pairs the RAW sampling pass's log-probs with the CLEANED
        sequence's mask — the one unmasked position after a terminating EOS
        contributes log p(raw continuation token), NOT log p(pad).
        ``loss_and_grads`` must therefore equal the loss computed directly
        from the rollout's own log-probs."""
        from vlp_tpu.losses import scst_reward_loss
        cfg = tiny_cfg()
        model = VLPModel(cfg)
        params = ts.init_params(model, cfg, jax.random.PRNGKey(0))
        builder = DecodeExampleBuilder(cfg, VOCAB,
                                       max_tgt_length=cfg.max_len_b)
        s = store(cfg)
        batch = {k: jnp.asarray(v) for k, v in collate(
            [builder(*s.get(f"i{j}")) for j in range(4)]).items()}
        trainer = scst_lib.SCSTTrainer(
            model, cfg, mask_id=VOCAB["[MASK]"], eos_id=VOCAB["[SEP]"],
            max_tgt_length=cfg.max_len_b)
        gt = np.array([[6, 7, 10, 4, 0], [8, 11, 4, 0, 0],
                       [6, 8, 9, 4, 0], [7, 10, 12, 4, 0]], np.int32)

        # find a seed whose sampled rollout terminates with EOS mid-row AND
        # keeps sampling a non-pad token right after — the position where
        # raw-vs-cleaned forcing genuinely differs
        eos = VOCAB["[SEP]"]
        for seed in range(40):
            key = jax.random.PRNGKey(seed)
            raw, lps = trainer.decoder.sample(params, batch, key,
                                              train_mode=True)
            raw = np.asarray(raw)
            hit = False
            for b in range(raw.shape[0]):
                eos_t = np.where(raw[b] == eos)[0]
                if eos_t.size and eos_t[0] < raw.shape[1] - 1 \
                        and raw[b, eos_t[0] + 1] != 0:
                    hit = True
            if hit:
                break
        assert hit, "no rollout with a live post-EOS continuation found"

        cleaned = scst_lib.clean_rollout(raw, eos, 0)
        greedy, sample, sample_raw = trainer.rollouts(params, batch, key)
        np.testing.assert_array_equal(sample_raw, raw)
        np.testing.assert_array_equal(sample, cleaned)
        reward = scst_lib.get_self_critical_reward(greedy, gt, sample)
        want = float(scst_reward_loss(jnp.asarray(lps),
                                      jnp.asarray(cleaned),
                                      jnp.asarray(reward)))
        loss, _, _ = trainer.loss_and_grads(params, batch, gt, key)
        np.testing.assert_allclose(float(loss), want, rtol=1e-5)
        # and the cleaned-forced loss is genuinely different here, so the
        # assertion above is non-vacuous
        (other, _), _ = trainer._loss_grad(
            params, batch, jnp.asarray(cleaned), jnp.asarray(cleaned),
            jnp.asarray(reward), jax.random.split(key)[1])
        assert abs(float(other) - want) > 1e-6

    def test_train_mode_forced_logprobs_replay_dropout(self, rng):
        """Forced replay with the rollout's dropout key must reproduce the
        train-mode (dropout-active) sampling rollout's log-probs exactly."""
        import jax
        import jax.numpy as jnp
        cfg = tiny_cfg()
        model = VLPModel(cfg)
        params = ts.init_params(model, cfg, jax.random.PRNGKey(0))
        builder = DecodeExampleBuilder(cfg, VOCAB,
                                       max_tgt_length=cfg.max_len_b)
        s = store(cfg)
        batch = {k: jnp.asarray(v) for k, v in collate(
            [builder(*s.get(f"i{j}")) for j in range(2)]).items()}
        trainer = scst_lib.SCSTTrainer(
            model, cfg, mask_id=VOCAB["[MASK]"], eos_id=VOCAB["[SEP]"],
            max_tgt_length=cfg.max_len_b)
        key = jax.random.PRNGKey(21)
        ids, lps = trainer.decoder.sample(params, batch, key, train_mode=True)
        _, drop_rng = jax.random.split(key)
        forced = trainer._forced_logprobs(params, batch, jnp.asarray(ids),
                                          drop_rng)
        np.testing.assert_allclose(np.asarray(forced), np.asarray(lps),
                                   rtol=1e-4, atol=1e-4)
        # and WITHOUT the key the logprobs differ (dropout really active)
        forced_det = trainer._forced_logprobs(params, batch, jnp.asarray(ids))
        assert np.abs(np.asarray(forced_det) - np.asarray(lps)).max() > 1e-4
