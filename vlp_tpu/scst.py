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
  3. re-run the rollout *forced* to the RAW sampled ids inside
     ``jax.value_and_grad`` — a differentiable ``lax.scan`` that yields the
     same log-probs with a gradient path to the parameters (REINFORCE treats
     the sampled ids as constants, so forcing is exact).

Raw vs cleaned ids: the reference's ``rl_crit(sample_logprobs,
gen_result.data, reward)`` (run_img2txt_dist.py:506-523) pairs log-probs
from the RAW sampling pass with the CLEANED sequence's mask.  Because the
RewardCriterion mask is ``[1, (seq>0)[:, :-1]]`` (scst_utils.py:73-74), the
position immediately after a terminating EOS is still unmasked — and its
log-prob is that of the raw continuation token the policy actually sampled
there, NOT of the pad the cleanup wrote.  The replay therefore forces the
raw ids while the loss masks with the cleaned ids; conditioning up to that
position is identical either way (raw == cleaned through the EOS), and all
later positions are masked out.  Pinned against the actual reference module
in tests/test_reference_parity.py::TestSCSTEquivalence.

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
    latency is real on remote TPU runtimes.

    Data parallelism: pass ``mesh`` (with a ``data`` axis) and shard the
    batch with ``shard_inputs`` — both rollouts AND the forced-replay
    policy-gradient step then run per shard under ``shard_map`` (the decode
    path reaches Pallas kernels, which GSPMD cannot auto-partition), with
    gradients/metrics pmean'd on ICI and the host CIDEr reward computed on
    the gathered (small, int) rollout ids.  This matches the reference's
    4-GPU DDP SCST recipe (run_img2txt_dist.py:379-387 driving the SCST
    branch at :486-523; README.md:96)."""

    def __init__(self, model: VLPModel, cfg: VLPConfig, *, mask_id: int,
                 eos_id: int, pad_id: int = 0, max_tgt_length: int = 20,
                 tx=None, mesh=None, remat: bool = False,
                 replay: str = "scan"):
        assert replay in ("scan", "fused")
        self.cfg = cfg
        self.model = model
        self.eos_id = eos_id
        self.pad_id = pad_id
        self.T = max_tgt_length
        self.mesh = mesh
        # rematerialise the forced-replay scan body in the backward pass:
        # without it the policy-gradient step stores every decode step's
        # activations and OOMs HBM at B=256 on a 16G v5e (23.9G program);
        # with it the activations are recomputed per step
        self.remat = remat
        # replay="fused": the policy gradient runs the teacher-forced
        # dual-block pass (VLPModel.scst_replay_hidden) instead of the
        # per-step scan — no scan carry (the B>=512 memory wall), MXU-shaped
        # matmuls.  The sampled rollout then uses the explicit-dropout
        # contract so the one-pass replay re-draws its exact masks.
        self.replay = replay
        if replay == "fused":
            assert max_tgt_length >= 2, "fused replay needs T >= 2"
        self.dp = DecodeParams(mask_id=mask_id, eos_id=eos_id, pad_id=pad_id,
                               max_tgt_length=max_tgt_length)
        self.decoder = Decoder(model, cfg, self.dp)
        self._loss_grad = jax.jit(jax.value_and_grad(self._pg_loss,
                                                     has_aux=True))
        self.tx = tx
        if mesh is None:
            self._both_rollouts = jax.jit(self._run_both_rollouts)
            if tx is not None:
                self._grad_update = jax.jit(self._run_grad_update,
                                            donate_argnums=(0,))
        else:
            self._both_rollouts = None   # built lazily (needs batch pytree)
            self._grad_update = None

    # -- shard_map wrappers (mesh path) -------------------------------------
    def _fold_shard(self, rng):
        return jax.random.fold_in(rng, jax.lax.axis_index("data"))

    def _make_sharded_rollouts(self, params, batch):
        from jax import shard_map
        from jax.sharding import PartitionSpec as P
        rep = P()

        def body(params, batch, rng):
            # per-shard sampling stream; the replay body folds identically
            # so the forced pass regenerates the same dropout masks
            return self._run_both_rollouts(params, batch,
                                           self._fold_shard(rng))

        fn = shard_map(
            body, mesh=self.mesh,
            in_specs=(jax.tree_util.tree_map(lambda _: rep, params),
                      jax.tree_util.tree_map(
                          lambda x: P("data", *([None] * (x.ndim - 1))),
                          batch),
                      rep),
            out_specs=(P("data"), P("data")), check_vma=False)
        return jax.jit(fn)

    def _make_sharded_grad_update(self, state, batch):
        from jax import shard_map
        from jax.sharding import PartitionSpec as P
        rep = P()
        data = lambda x: P("data", *([None] * (x.ndim - 1)))  # noqa: E731

        def body(state, batch, gen_raw, gen_clean, reward, rng):
            # same fold + split structure as the rollout body: drop_rng is
            # split(rng_shard)[1], matching _run_greedy's internal split
            _, drop_rng = jax.random.split(self._fold_shard(rng))
            (loss, metrics), grads = jax.value_and_grad(
                self._pg_loss, has_aux=True)(state.params, batch, gen_raw,
                                             gen_clean, reward, drop_rng)
            grads = jax.lax.pmean(grads, "data")
            loss = jax.lax.pmean(loss, "data")
            metrics = jax.tree_util.tree_map(
                lambda x: jax.lax.pmean(x, "data"), metrics)
            updates, new_opt = self.tx.update(grads, state.opt_state,
                                              state.params)
            new_params = optax.apply_updates(state.params, updates)
            return state._replace(params=new_params, opt_state=new_opt,
                                  step=state.step + 1), loss, metrics

        # the aux-metrics out_spec is derived from the loss function's own
        # tree (via eval_shape, like pjit_step.make_shard_map_step) so a new
        # metric key cannot desynchronise the sharded path from the
        # single-device one
        bsz = next(iter(batch.values())).shape[0]
        aux_tree = jax.eval_shape(
            lambda p, b: self._pg_loss(
                p, b, jnp.zeros((bsz, self.T), jnp.int32),
                jnp.zeros((bsz, self.T), jnp.int32),
                jnp.zeros((bsz, self.T), jnp.float32),
                jax.random.PRNGKey(0))[1],
            state.params, batch)
        fn = shard_map(
            body, mesh=self.mesh,
            in_specs=(jax.tree_util.tree_map(lambda _: rep, state),
                      jax.tree_util.tree_map(lambda x: data(x), batch),
                      P("data"), P("data"), P("data"), rep),
            out_specs=(jax.tree_util.tree_map(lambda _: rep, state),
                       rep, jax.tree_util.tree_map(lambda _: rep, aux_tree)),
            check_vma=False)
        return jax.jit(fn, donate_argnums=(0,))

    def shard_inputs(self, state_or_params, batch):
        """Place params/state replicated and the batch sharded over the
        mesh's ``data`` axis (no-op without a mesh)."""
        if self.mesh is None:
            return state_or_params, batch
        from jax.sharding import PartitionSpec as P
        from vlp_tpu.parallel.pjit_step import put_on_mesh
        state_or_params = jax.tree_util.tree_map(
            lambda x: put_on_mesh(x, self.mesh, P()), state_or_params)
        batch = {
            k: put_on_mesh(v, self.mesh, P("data", *([None] * (v.ndim - 1))))
            for k, v in batch.items()}
        return state_or_params, batch

    def _run_both_rollouts(self, params, batch, rng):
        """Greedy baseline (eval mode) + sampled rollout (train mode, dropout
        on) in ONE compiled program (run_img2txt_dist.py:494-507).  With
        ``replay="fused"`` the sampled rollout draws its dropout masks via
        the explicit-dropout contract (same distribution; keys the
        dual-block replay can re-draw)."""
        greedy_ids, _ = self.decoder._run_greedy(params, batch,
                                                 jax.random.PRNGKey(0),
                                                 sample=False,
                                                 train_mode=False)
        sample_ids, _ = self.decoder._run_greedy(
            params, batch, rng, sample=True, train_mode=True,
            explicit_dropout=(self.replay == "fused"))
        return greedy_ids, sample_ids

    def _run_grad_update(self, state, batch, gen_raw, gen_clean, reward,
                         drop_rng):
        (loss, metrics), grads = jax.value_and_grad(
            self._pg_loss, has_aux=True)(state.params, batch, gen_raw,
                                         gen_clean, reward, drop_rng)
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

        if self.remat:
            body = jax.checkpoint(body)
        (_, _), lp_rest = jax.lax.scan(body, (gk, gv), jnp.arange(self.T - 1))
        return jnp.concatenate([lp0[None], lp_rest], axis=0).T  # [B, T]

    def _forced_logprobs_fused(self, params, batch, forced_ids,
                               drop_rng=None):
        """Log-probs of ``forced_ids`` via the teacher-forced dual-block
        pass: prefill (identical apply + rngs as the rollout's, so its
        dropout masks are bit-equal) + VLPModel.scst_replay_hidden (caption
        rows in ONE attention pass, masks re-drawn from the explicit-dropout
        rollout's keys) + one batched lm_logits.  Same function as the scan
        replay, with no scan carry in the backward."""
        dp = self.dp
        kw = {}
        if drop_rng is not None:
            kw = dict(rngs={"dropout": jax.random.fold_in(drop_rng, 0)},
                      deterministic=False)
        hidden0, pk, pv = self.model.apply(
            {"params": params}, batch["input_ids"], batch["segment_ids"],
            batch["position_ids"], batch["vis_feats"], batch["vis_pe"],
            dp.mask_id, method=VLPModel.prefill, **kw)
        hid = self.model.apply(
            {"params": params}, forced_ids, batch["segment_ids"],
            batch["position_ids"], pk, pv, dp.mask_id, drop_rng,
            method=VLPModel.scst_replay_hidden)
        hidden = jnp.concatenate([hidden0, hid], axis=1)      # [B, T, H]
        logits = self.model.apply({"params": params}, hidden,
                                  batch["task_idx"],
                                  method=VLPModel.lm_logits)  # [B, T, V]
        lp = jax.nn.log_softmax(logits, axis=-1)
        return jnp.take_along_axis(lp, forced_ids[..., None], axis=-1)[..., 0]

    def _pg_loss(self, params, batch, gen_raw, gen_clean, reward, drop_rng):
        # log-probs of the RAW rollout (what the sampling pass computed);
        # mask from the CLEANED sequence — reference rl_crit semantics, see
        # the module docstring
        replay = (self._forced_logprobs_fused if self.replay == "fused"
                  else self._forced_logprobs)
        logprobs = replay(params, batch, gen_raw, drop_rng)
        loss = losses_lib.scst_reward_loss(logprobs, gen_clean, reward)
        return loss, {"scst_loss": loss}

    # -- public API --------------------------------------------------------
    def rollouts(self, params, batch, rng):
        """Greedy baseline in eval mode, sample in train mode (dropout on),
        matching run_img2txt_dist.py:494-507 — one device dispatch.  With a
        mesh the rollouts run per shard and the (small, int) ids gather to
        host here.  Returns ``(greedy_clean, sample_clean, sample_raw)``:
        the cleaned pair feeds the CIDEr reward and the loss mask, the raw
        sample is what the forced replay must reproduce (module docstring)."""
        if self.mesh is not None and self._both_rollouts is None:
            self._both_rollouts = self._make_sharded_rollouts(params, batch)
        greedy_ids, sample_ids = self._both_rollouts(params, batch, rng)
        sample_raw = np.asarray(sample_ids)
        greedy = clean_rollout(np.asarray(greedy_ids), self.eos_id, self.pad_id)
        sample = clean_rollout(sample_raw, self.eos_id, self.pad_id)
        return greedy, sample, sample_raw

    def loss_and_grads(self, params, batch, gt_ids: np.ndarray, rng):
        """Returns (loss, grads, metrics).  ``gt_ids`` are the ground-truth
        caption token ids [B, T] (input_ids[:, prefix:] in the reference,
        run_img2txt_dist.py:517).  Single-device API (the mesh path is
        ``step``)."""
        assert self.mesh is None, "use step() on the mesh path"
        greedy, sample, sample_raw = self.rollouts(params, batch, rng)
        reward = get_self_critical_reward(greedy, gt_ids, sample)
        # the rollout derives its dropout key as split(rng)[1] (decode.py
        # _run_greedy); replay the same masks in the forced pass
        _, drop_rng = jax.random.split(rng)
        (loss, metrics), grads = self._loss_grad(
            params, batch, jnp.asarray(sample_raw), jnp.asarray(sample),
            jnp.asarray(reward), drop_rng)
        metrics = dict(metrics, mean_reward=float(reward[:, 0].mean()))
        return loss, grads, metrics

    def step(self, state, batch, gt_ids: np.ndarray, rng):
        """Full SCST update (requires ``tx`` at construction): rollouts ->
        host CIDEr reward -> fused policy-gradient + BertAdam dispatch.
        Returns (new_state, loss, metrics).  With a mesh, the replay step
        runs per shard with grads pmean'd (DDP-SCST semantics)."""
        assert self.tx is not None, "pass tx= to SCSTTrainer for step()"
        greedy, sample, sample_raw = self.rollouts(state.params, batch, rng)
        reward = get_self_critical_reward(greedy, gt_ids, sample)
        if self.mesh is None:
            _, drop_rng = jax.random.split(rng)
            state, loss, metrics = self._grad_update(
                state, batch, jnp.asarray(sample_raw), jnp.asarray(sample),
                jnp.asarray(reward), drop_rng)
        else:
            if self._grad_update is None:
                self._grad_update = self._make_sharded_grad_update(state,
                                                                   batch)
            # raw rng: the body folds by shard + splits, mirroring the
            # rollout body's key derivation exactly
            state, loss, metrics = self._grad_update(
                state, batch, jnp.asarray(sample_raw), jnp.asarray(sample),
                jnp.asarray(reward), rng)
        metrics = dict(metrics, mean_reward=float(reward[:, 0].mean()))
        return state, float(loss), metrics
