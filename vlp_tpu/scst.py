"""Self-critical sequence training (SCST).

Parity with the reference SCST branch
(/root/reference/vlp/run_img2txt_dist.py:486-523 and vlp/scst_utils.py):
greedy rollout as the baseline, multinomial sampled rollout, reward =
CIDEr(sample) - CIDEr(greedy) per example broadcast over timesteps, policy
gradient via ``losses.scst_reward_loss``.

TPU-first structure (the reference backprops through a python generation
loop; that does not exist under jit):
  1. sample a rollout with the jitted KV-cache decoder (no grad),
  2. clean + score it on host (native CIDEr — the reference's per-token
     EOS/pad cleanup loops become a vectorised mask),
  3. re-run the rollout *forced* to the sampled ids inside
     ``jax.value_and_grad`` — a differentiable ``lax.scan`` that yields the
     same log-probs with a gradient path to the parameters (REINFORCE treats
     the sampled ids as constants, so forcing is exact).

Dropout parity: the reference samples with dropout active (model.train(),
run_img2txt_dist.py:505-507).  The sampled rollout here runs in train mode
too, and the forced replay regenerates the SAME dropout masks (identical rng
fold structure), so the policy gradient matches the rollout that produced
the sample — exactly like the reference's single-pass autograd.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax

from vlp_tpu import losses as losses_lib
from vlp_tpu.config import VLPConfig
from vlp_tpu.decode import DecodeParams, Decoder
from vlp_tpu.evals.cider import CiderScorer
from vlp_tpu.models.model import VLPModel


def clean_rollout(ids: np.ndarray, eos_id: int, pad_id: int) -> np.ndarray:
    """Zero everything after the first EOS/PAD, keeping a terminating EOS
    (run_img2txt_dist.py:497-515 semantics, vectorised)."""
    ids = np.asarray(ids)
    B, T = ids.shape
    term = (ids == eos_id) | (ids == pad_id)
    first = np.where(term.any(axis=1), term.argmax(axis=1), T)
    out = np.where(np.arange(T)[None, :] < first[:, None], ids, 0)
    # a row whose first terminator is EOS keeps that EOS
    keeps_eos = (first < T) & (ids[np.arange(B), np.minimum(first, T - 1)]
                               == eos_id)
    out[keeps_eos, first[keeps_eos]] = eos_id
    return out


def array_to_str(arr) -> str:
    """Token-id serialisation stopping at 0 (scst_utils.py:27-33)."""
    out = []
    for x in arr:
        out.append(str(int(x)))
        if int(x) == 0:
            break
    return " ".join(out)


def get_self_critical_reward(greedy_res: np.ndarray, gt_ids: np.ndarray,
                             gen_result: np.ndarray) -> np.ndarray:
    """CIDEr(sample) - CIDEr(greedy) broadcast over timesteps
    (scst_utils.py:36-63)."""
    B, T = np.asarray(gen_result).shape
    res = {i: [array_to_str(gen_result[i])] for i in range(B)}
    res.update({B + i: [array_to_str(greedy_res[i])] for i in range(B)})
    gts = {i: [array_to_str(gt_ids[i])] for i in range(B)}
    gts.update({B + i: [array_to_str(gt_ids[i])] for i in range(B)})
    _, scores = CiderScorer().compute_score(gts, res)
    scores = np.asarray(scores)
    rewards = scores[:B] - scores[B:]
    return np.repeat(rewards[:, None], T, axis=1).astype(np.float32)


class SCSTTrainer:
    """SCST loss + grads for one batch (optimizer applied by the caller, or
    fused into the step when ``tx`` is given).

    Device-dispatch budget per step: the reference's loop body is dozens of
    kernel launches; here it is THREE dispatches (both rollouts fused in
    one, the host CIDEr reward in between, grads+update in one) — dispatch
    latency is real on remote TPU runtimes."""

    def __init__(self, model: VLPModel, cfg: VLPConfig, *, mask_id: int,
                 eos_id: int, pad_id: int = 0, max_tgt_length: int = 20,
                 tx=None):
        self.cfg = cfg
        self.model = model
        self.eos_id = eos_id
        self.pad_id = pad_id
        self.T = max_tgt_length
        self.dp = DecodeParams(mask_id=mask_id, eos_id=eos_id, pad_id=pad_id,
                               max_tgt_length=max_tgt_length)
        self.decoder = Decoder(model, cfg, self.dp)
        self._loss_grad = jax.jit(jax.value_and_grad(self._pg_loss,
                                                     has_aux=True))
        self._both_rollouts = jax.jit(self._run_both_rollouts)
        self.tx = tx
        if tx is not None:
            self._grad_update = jax.jit(self._run_grad_update,
                                        donate_argnums=(0,))

    def _run_both_rollouts(self, params, batch, rng):
        """Greedy baseline (eval mode) + sampled rollout (train mode, dropout
        on) in ONE compiled program (run_img2txt_dist.py:494-507)."""
        greedy_ids, _ = self.decoder._run_greedy(params, batch,
                                                 jax.random.PRNGKey(0),
                                                 sample=False,
                                                 train_mode=False)
        sample_ids, _ = self.decoder._run_greedy(params, batch, rng,
                                                 sample=True, train_mode=True)
        return greedy_ids, sample_ids

    def _run_grad_update(self, state, batch, gen_result, reward, drop_rng):
        (loss, metrics), grads = jax.value_and_grad(
            self._pg_loss, has_aux=True)(state.params, batch, gen_result,
                                         reward, drop_rng)
        updates, new_opt = self.tx.update(grads, state.opt_state,
                                          state.params)
        new_params = optax.apply_updates(state.params, updates)
        return state._replace(params=new_params, opt_state=new_opt,
                              step=state.step + 1), loss, metrics

    # -- differentiable forced rollout ------------------------------------
    def _forced_logprobs(self, params, batch, forced_ids, drop_rng=None):
        """Log-probs of ``forced_ids`` under the incremental decoder — same
        computation as Decoder.sample (incl. identical dropout masks when
        ``drop_rng`` is the rollout's dropout key) with the token choice
        pinned."""
        dp = self.dp

        def rngs_kw(i):
            if drop_rng is None:
                return {}
            return dict(rngs={"dropout": jax.random.fold_in(drop_rng, i)},
                        deterministic=False)

        hidden, pk, pv = self.model.apply(
            {"params": params}, batch["input_ids"], batch["segment_ids"],
            batch["position_ids"], batch["vis_feats"], batch["vis_pe"],
            dp.mask_id, method=VLPModel.prefill, **rngs_kw(0))
        gk, gv = self.decoder._init_gen_cache(batch["input_ids"].shape[0])
        logits0 = self.model.apply({"params": params}, hidden,
                                   batch["task_idx"],
                                   method=VLPModel.lm_logits)[:, 0, :]

        def logp_of(logits, ids):
            lp = jax.nn.log_softmax(logits, axis=-1)
            return jnp.take_along_axis(lp, ids[:, None], axis=1)[:, 0]

        lp0 = logp_of(logits0, forced_ids[:, 0])

        def body(carry, t):
            gk, gv = carry
            prev = jax.lax.dynamic_slice_in_dim(forced_ids, t, 1, axis=1)
            hidden, gk, gv = self.model.apply(
                {"params": params}, prev, batch["segment_ids"],
                batch["position_ids"], pk, pv, gk, gv, t,
                self.dp.mask_id, method=VLPModel.decode_step,
                **rngs_kw(t + 1))
            logits = self.model.apply(
                {"params": params}, hidden, batch["task_idx"],
                method=VLPModel.lm_logits)[:, 0, :]
            nxt = forced_ids[:, jnp.minimum(t + 1, self.T - 1)]
            return (gk, gv), logp_of(logits, nxt)

        (_, _), lp_rest = jax.lax.scan(body, (gk, gv), jnp.arange(self.T - 1))
        return jnp.concatenate([lp0[None], lp_rest], axis=0).T  # [B, T]

    def _pg_loss(self, params, batch, gen_result, reward, drop_rng):
        logprobs = self._forced_logprobs(params, batch, gen_result, drop_rng)
        loss = losses_lib.scst_reward_loss(logprobs, gen_result, reward)
        return loss, {"scst_loss": loss}

    # -- public API --------------------------------------------------------
    def rollouts(self, params, batch, rng):
        """Greedy baseline in eval mode, sample in train mode (dropout on),
        matching run_img2txt_dist.py:494-507 — one device dispatch."""
        greedy_ids, sample_ids = self._both_rollouts(params, batch, rng)
        greedy = clean_rollout(np.asarray(greedy_ids), self.eos_id, self.pad_id)
        sample = clean_rollout(np.asarray(sample_ids), self.eos_id, self.pad_id)
        return greedy, sample

    def loss_and_grads(self, params, batch, gt_ids: np.ndarray, rng):
        """Returns (loss, grads, metrics).  ``gt_ids`` are the ground-truth
        caption token ids [B, T] (input_ids[:, prefix:] in the reference,
        run_img2txt_dist.py:517)."""
        greedy, sample = self.rollouts(params, batch, rng)
        reward = get_self_critical_reward(greedy, gt_ids, sample)
        # the rollout derives its dropout key as split(rng)[1] (decode.py
        # _run_greedy); replay the same masks in the forced pass
        _, drop_rng = jax.random.split(rng)
        (loss, metrics), grads = self._loss_grad(
            params, batch, jnp.asarray(sample), jnp.asarray(reward),
            drop_rng)
        metrics = dict(metrics, mean_reward=float(reward[:, 0].mean()))
        return loss, grads, metrics

    def step(self, state, batch, gt_ids: np.ndarray, rng):
        """Full SCST update (requires ``tx`` at construction): rollouts ->
        host CIDEr reward -> fused policy-gradient + BertAdam dispatch.
        Returns (new_state, loss, metrics)."""
        assert self.tx is not None, "pass tx= to SCSTTrainer for step()"
        greedy, sample = self.rollouts(state.params, batch, rng)
        reward = get_self_critical_reward(greedy, gt_ids, sample)
        _, drop_rng = jax.random.split(rng)
        state, loss, metrics = self._grad_update(
            state, batch, jnp.asarray(sample), jnp.asarray(reward), drop_rng)
        metrics = dict(metrics, mean_reward=float(reward[:, 0].mean()))
        return state, float(loss), metrics
