"""Losses vs torch reference math; BertAdam vs a manual reimplementation."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from vlp_tpu import losses as losses_lib
from vlp_tpu import optim as optim_lib


class TestMLMLoss:
    def test_plain_ce(self, rng):
        B, P, V = 3, 5, 11
        logits = rng.normal(size=(B, P, V)).astype(np.float32)
        targets = rng.integers(1, V, size=(B, P))
        got = losses_lib.mlm_position_loss(jnp.asarray(logits),
                                           jnp.asarray(targets), 0.0, V)
        want = F.cross_entropy(
            torch.from_numpy(logits).permute(0, 2, 1),
            torch.from_numpy(targets), reduction="none")
        np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=1e-4,
                                   atol=1e-4)

    def test_label_smoothing_matches_torch_kl(self, rng):
        """Parity with LabelSmoothingLoss (loss.py:12-48)."""
        B, P, V = 2, 4, 13
        ls = 0.1
        logits = rng.normal(size=(B, P, V)).astype(np.float32)
        targets = rng.integers(1, V, size=(B, P))
        targets[0, 1] = 0  # an ignored position
        got = losses_lib.mlm_position_loss(jnp.asarray(logits),
                                           jnp.asarray(targets), ls, V)

        logp = F.log_softmax(torch.from_numpy(logits), dim=-1)
        smoothing_value = ls / (V - 2)
        one_hot = torch.full((V,), smoothing_value)
        one_hot[0] = 0
        t = torch.from_numpy(targets).view(-1)
        model_prob = one_hot.unsqueeze(0).repeat(t.size(0), 1)
        model_prob.scatter_(1, t.unsqueeze(1), 1.0 - ls)
        model_prob.masked_fill_((t == 0).unsqueeze(1), 0)
        want = F.kl_div(logp.view(-1, V), model_prob,
                        reduction="none").view(B, P, V).sum(2)
        np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=1e-4,
                                   atol=1e-5)


class TestDropWorst:
    def test_matches_topk_reference(self, rng):
        """Parity with loss_mask_and_normalize (modeling.py:1083-1093)."""
        B, P = 8, 5
        loss = rng.uniform(size=(B, P)).astype(np.float32)
        mask = (rng.uniform(size=(B, P)) > 0.3).astype(np.float32)
        for ratio in (0.0, 0.25, 0.5):
            got = losses_lib.mask_and_normalize_loss(
                jnp.asarray(loss), jnp.asarray(mask), ratio)
            tl = torch.from_numpy(loss) * torch.from_numpy(mask)
            keep_loss, keep_ind = torch.topk(
                tl.sum(-1), int(B * (1 - ratio)), largest=False)
            denom = torch.from_numpy(mask).sum(-1)[keep_ind].sum() + 1e-5
            want = (keep_loss / denom).sum()
            np.testing.assert_allclose(float(got), float(want), rtol=1e-5)

    def test_traced_ratio(self):
        loss = jnp.ones((4, 3))
        mask = jnp.ones((4, 3))
        f = jax.jit(losses_lib.mask_and_normalize_loss)
        np.testing.assert_allclose(float(f(loss, mask, jnp.float32(0.5))),
                                   float(f(loss, mask, 0.5)), rtol=1e-6)


class TestSCSTLoss:
    def test_matches_reference(self, rng):
        """Parity with RewardCriterion (scst_utils.py:66-78)."""
        B, T = 4, 7
        logp = rng.normal(size=(B, T)).astype(np.float32)
        seq = rng.integers(0, 5, size=(B, T))
        reward = rng.normal(size=(B, T)).astype(np.float32)
        got = losses_lib.scst_reward_loss(jnp.asarray(logp), jnp.asarray(seq),
                                          jnp.asarray(reward))
        inp = torch.from_numpy(logp).reshape(-1)
        rew = torch.from_numpy(reward).reshape(-1)
        m = (torch.from_numpy(seq) > 0).float()
        m = torch.cat([m.new(m.size(0), 1).fill_(1), m[:, :-1]], 1).reshape(-1)
        want = (-inp * rew * m).sum() / m.sum()
        np.testing.assert_allclose(float(got), float(want), rtol=1e-5)


class TestBertAdam:
    def manual_step(self, p, g, m, v, step, lr, t_total, warmup, wd,
                    b1=0.9, b2=0.999, eps=1e-6, max_norm=1.0):
        """The reference update (optimization.py:112-175), in numpy."""
        norm = np.sqrt((g ** 2).sum())
        if norm > max_norm:
            g = g * (max_norm / (norm + 1e-6))
        m = b1 * m + (1 - b1) * g
        v = b2 * v + (1 - b2) * g * g
        u = m / (np.sqrt(v) + eps) + wd * p
        x = step / t_total
        sched = x / warmup if x < warmup else max((x - 1) / (warmup - 1), 0)
        return p - lr * sched * u, m, v

    def test_matches_manual(self, rng):
        params = {"w": {"kernel": jnp.asarray(
            rng.normal(size=(4, 3)).astype(np.float32))}}
        lr, warmup, t_total, wd = 0.1, 0.2, 10, 0.01
        tx = optim_lib.bert_adam(lr, warmup=warmup, t_total=t_total,
                                 weight_decay=wd)
        state = tx.init(params)
        p = np.asarray(params["w"]["kernel"])
        m = np.zeros_like(p)
        v = np.zeros_like(p)
        for step in range(4):
            g = rng.normal(size=p.shape).astype(np.float32) * 3  # force clip
            grads = {"w": {"kernel": jnp.asarray(g)}}
            updates, state = tx.update(grads, state, params)
            params = jax.tree_util.tree_map(lambda a, u: a + u, params, updates)
            p, m, v = self.manual_step(p, g, m, v, step, lr, t_total, warmup, wd)
            np.testing.assert_allclose(np.asarray(params["w"]["kernel"]), p,
                                       rtol=2e-5, atol=1e-6)

    def test_first_step_lr_is_zero(self, rng):
        """Reference uses step=0 for the first update => warmup lr 0."""
        params = {"w": jnp.ones((2, 2))}
        tx = optim_lib.bert_adam(0.1, warmup=0.1, t_total=100,
                                 weight_decay=0.0)
        state = tx.init(params)
        updates, _ = tx.update({"w": jnp.ones((2, 2))}, state, params)
        np.testing.assert_allclose(np.asarray(updates["w"]), 0.0)

    def test_no_decay_mask(self):
        params = {"layer_0": {"q_proj": {"kernel": jnp.ones((2, 2)),
                                         "bias": jnp.ones((2,))},
                              "attn_ln": {"scale": jnp.ones((2,)),
                                          "bias": jnp.ones((2,))}},
                  "embeddings": {"word_embeddings":
                                 {"embedding": jnp.ones((4, 2))}}}
        mask = optim_lib.default_weight_decay_mask(params)
        assert mask["layer_0"]["q_proj"]["kernel"] is True
        assert mask["layer_0"]["q_proj"]["bias"] is False
        assert mask["layer_0"]["attn_ln"]["scale"] is False
        assert mask["layer_0"]["attn_ln"]["bias"] is False
        assert mask["embeddings"]["word_embeddings"]["embedding"] is True

    def test_schedules(self):
        assert float(optim_lib.warmup_linear(0.05, 0.1)) == 0.5
        np.testing.assert_allclose(float(optim_lib.warmup_linear(0.55, 0.1)),
                                   0.5, rtol=1e-6)
        assert float(optim_lib.warmup_constant(0.5, 0.1)) == 1.0
        np.testing.assert_allclose(float(optim_lib.warmup_cosine(1.0, 0.1)),
                                   0.0, atol=1e-6)
