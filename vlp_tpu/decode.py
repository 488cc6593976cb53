"""Jit-compiled caption generation: greedy / multinomial sampling / beam search.

Re-implements the reference decoder
(/root/reference/pytorch_pretrained_bert/modeling.py:1147-1494) TPU-first:

  * the ragged python-list activation cache (modeling.py:1240-1250) becomes
    a preallocated SPLIT K/V cache carried as per-layer TUPLES (a stacked
    [layers, ...] carry costs a full-cache restack + per-layer slice reads
    every step) — the [CLS] regions [SEP] prompt K/V lives once per example
    (never beam-expanded, never reordered) while generated tokens get a
    small per-beam ~24-slot cache, the only part beam reordering touches;
    per-layer layouts are [B, P, H*D] / [rows, G, H*D] under the fused
    decode kernel (cfg.pallas_decode, ops/decode_attention.py) and
    [B, H, P, D] / [rows, H, G, D] on the XLA path; K/V are cached
    directly instead of re-projecting layer inputs every step;
  * each step feeds [prev_token, [MASK] probe] exactly like the reference's
    ``x_input_ids = cat(curr_ids, mask_ids)`` (modeling.py:1213), predicting
    at the probe and committing only the real token's K/V;
  * the whole generation loop is a ``lax.scan`` under jit — beam topk,
    back-pointer bookkeeping, EOS masking (-10000 for finished beams,
    modeling.py:1314), min-length EOS suppression (modeling.py:1302-1303) and
    the duplicate-n-gram forbid mask (modeling.py:1375-1428, rebuilt here as
    an in-graph sliding-window match + scatter) all run on device;
  * the final back-pointer trace reconstruction (modeling.py:1436-1472) runs
    on host over the small [T, B, K] trace arrays, exactly as upstream.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vlp_tpu.config import VLPConfig
from vlp_tpu.models.model import VLPModel

NEG = -10000.0


@dataclasses.dataclass(frozen=True)
class DecodeParams:
    mask_id: int = 103
    eos_id: int = 102
    pad_id: int = 0
    beam_size: int = 1
    length_penalty: float = 0.0
    forbid_duplicate_ngrams: bool = False
    ngram_size: int = 3
    min_len: int = 0
    max_tgt_length: int = 20
    # vocab-size bool mask of ids ignored by the ngram-forbid logic
    forbid_ignore_ids: Tuple[int, ...] = ()
    # Approximate first-stage vocab top-k (jax.lax.approx_max_k, TPU
    # PartialReduce) instead of exact top-k over the [B*K, V] logits.
    # Opt-in: a missed candidate can shift a beam, so the default stays
    # exact for reference trace parity; serving deployments that want the
    # last ~1.5 ms/step can enable it (recall_target 0.99).
    approx_topk: bool = False
    # exact first-stage impl: "blocks" (block-max prefilter, default —
    # _exact_topk_blocks) or "full" (one lax.top_k custom call).  The
    # profiled TopK custom call runs ~43x its read-bandwidth floor
    # (DESIGN.md r03 serving profile); the prefilter replaces it with a
    # max-reduce pass plus two narrow top-ks.  Block width matters
    # (candidate width = C * topk_block, and non-lane-divisor widths
    # lose): interleaved A/B on v5e, captions/sec —
    #   B=100: full 581, block32 645, block64 630
    #   B=400: full 616, block32 642, block64 641, block48 607,
    #          block96 614, block128 636, block256 625, block512 524(r2)
    # Re-swept under the round-4 fused reorder (step composition changed):
    #   B=100 block32 626 vs block64 616 — 32 stays the default;
    #   B=400 block64 669 vs block32 650 — serving deployments at large
    #   batch should pass --topk_block 64 (~+3%).
    topk_impl: str = "blocks"
    topk_block: int = 32
    # beam-reorder implementation for the generated K/V caches:
    #   "fused"  — (round 4) no physical reorder at all: the beam loop
    #              carries an ancestry map [B*K, G] int32 and the decode
    #              kernel selects each query beam's lineage rows via an
    #              additive one-hot bias in its in-register mask — the
    #              per-step 12-layer x k/v cache gathers (20% of the
    #              serving-batch step, DESIGN.md r03 profile) disappear;
    #              only the tiny int map is permuted.  Requires the decode
    #              kernel path (cfg.pallas_decode); falls back to "gather"
    #              otherwise.
    #   "gather" — row gather.  Lowers to a serialized per-row slice+update
    #              loop in HLO, but XLA's async pipelining overlaps it.
    #   "onehot" — batched one-hot MXU contraction over the cache: measured
    #              SLOWER than the gather (interleaved A/B,
    #              tools/bench_beam_ab.py: 229 vs 223 captions/sec; the
    #              cache-sized matmul sits on the critical path).
    # All three are trace-identical (tests/test_decode.py).
    reorder_impl: str = "fused"
    # Beam-scan gen-cache carry layout (round-5 A/B of the 18%-copies
    # scan-staging bucket, DESIGN.md round-4 trace):
    #   "tuples"  — 24 separate [B*K, G, HD] arrays (default).
    #   "stacked" — ONE [L, B*K, G, HD] array per k/v, unstacked into
    #               per-layer views inside the body and restacked from the
    #               kernel outputs each step.  Distinct from the rejected
    #               round-1 stacked design: the fused reorder never
    #               physically gathers the caches, so the only added work
    #               is the restack itself.  Trace-identical to "tuples".
    #               Measured SLOWER (interleaved A/B on v5e, B=400 beam-5:
    #               569.8 vs 688.5 captions/sec): the per-step restack +
    #               slice reads cost more than the scan staging they
    #               replace — tuples stay the default.
    carry_impl: str = "tuples"


def _expand_beams(x: jnp.ndarray, K: int) -> jnp.ndarray:
    """[B, ...] -> [B*K, ...] repeating each row K times (first_expand,
    modeling.py:1325-1332)."""
    B = x.shape[0]
    return jnp.repeat(x, K, axis=0).reshape((B * K,) + x.shape[1:])


def _gather_beams(x: jnp.ndarray, ptrs: jnp.ndarray, B: int, K: int
                  ) -> jnp.ndarray:
    """Reorder beam-major rows by back pointers (select_beam_items,
    modeling.py:1334-1348).  x: [B*K, ...]; ptrs: int[B, K]."""
    xs = x.reshape((B, K) + x.shape[1:])
    # advanced indexing lowers to a gather with [B, K] indices and whole
    # trailing slices (take_along_axis would materialise a full-shape index
    # array — pathological for the KV cache)
    out = xs[jnp.arange(B)[:, None], ptrs.astype(jnp.int32)]
    return out.reshape(x.shape)


def _reorder_cache_onehot(c: jnp.ndarray, w: jnp.ndarray, B: int, K: int
                          ) -> jnp.ndarray:
    """Beam-reorder one layer's K/V cache by one-hot contraction.

    c: [B*K, *cache_dims]; w: one-hot f32 [B, K_new, K_old]
    (``w[b, n, k] = 1`` iff new beam ``n`` of example ``b`` continues old
    beam ``k``).  Alternative to the row gather (which lowers to a
    serialized per-row slice+update loop in HLO, though XLA's async
    pipelining overlaps it well — see DecodeParams.reorder_impl).  Exact:
    each output element is a single-term sum, so accumulation happens in
    the cache dtype (an fp32 accumulator would materialise a cache-sized
    fp32 intermediate, measured slower).
    """
    shape = c.shape
    cb = c.reshape(B, K, -1)
    out = jnp.einsum("bnk,bkx->bnx", w.astype(c.dtype), cb,
                     preferred_element_type=c.dtype)
    return out.reshape(shape)


def _exact_topk_blocks(logits: jnp.ndarray, C: int, block: int = 512
                       ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact top-C via block-max prefilter: top-C blocks by per-block max,
    then exact top-C over just those blocks' columns.

    Correct because if x is in the global top-C but its block is not among
    the top-C blocks by max, C other blocks each contain an element
    > max(block(x)) >= x — contradiction.  The expensive full-width top-k
    custom call (1.5 ms/step over [B*K, V] at B=100 K=5) becomes one
    max-reduce pass plus two small top-ks and a gather.

    VALUE-exact only: under exactly-tied logits the returned ids can
    tie-break differently from ``lax.top_k``'s lowest-index rule (the
    second stage sorts a block-max-ordered candidate buffer).  Ties are
    measure-zero for real logits (the e2e interop test decodes a trained
    checkpoint through this path token-for-token against the reference
    beam search); ``topk_impl="full"`` restores lax.top_k exactly.
    """
    R, V = logits.shape
    nb = -(-V // block)
    pad = nb * block - V
    x = jnp.pad(logits, ((0, 0), (0, pad)),
                constant_values=-jnp.inf) if pad else logits
    xb = x.reshape(R, nb, block)
    bmax = jnp.max(xb, axis=-1)                                # [R, nb]
    nblk = min(C, nb)
    _, bidx = jax.lax.top_k(bmax, nblk)                        # [R, nblk]
    cand = jnp.take_along_axis(xb, bidx[:, :, None], axis=1)   # [R,nblk,blk]
    cand = cand.reshape(R, nblk * block)
    vals, flat = jax.lax.top_k(cand, C)
    # map flat candidate positions back to vocab ids
    blk_of = jnp.take_along_axis(bidx, flat // block, axis=1)
    ids = blk_of * block + flat % block
    return vals, ids


class Decoder:
    """Functional decoder bound to a model definition (params passed per call).

    Data-parallel decoding: pass ``mesh`` (with a ``data`` axis) and call
    ``shard_inputs`` on (params, batch) before decoding — the batch is
    placed sharded over the data axis, params replicated (the reference is
    single-GPU at inference, decode_img2txt.py:179-180 + README.md:205).
    With a mesh the generation loop runs under ``shard_map`` (params
    replicated, batch sharded): decoding is embarrassingly data-parallel
    (no cross-example collectives), and the Pallas prefill/decode kernels
    run per shard — GSPMD cannot auto-partition Mosaic custom calls, the
    same reason training's shard_map path exists (parallel/pjit_step.py:
    make_shard_map_step)."""

    def __init__(self, model: VLPModel, cfg: VLPConfig, dp: DecodeParams,
                 mesh=None):
        self.model = model
        self.cfg = cfg
        self.dp = dp
        self.mesh = mesh

        def dp_wrap(f, batch_out_axes):
            """jit(f) without a mesh; jit(shard_map(f)) over the data axis
            with one.  ``batch_out_axes``: the batch axis of each output
            (traces are [T, B, K] — axis 1; greedy ids/lps are [B, T] —
            axis 0)."""
            if mesh is None:
                return jax.jit(f)
            from jax import shard_map
            from jax.sharding import PartitionSpec

            def spec(axis):
                parts = [None] * (axis + 1)
                parts[axis] = "data"
                return PartitionSpec(*parts)

            def fold_shard(r):
                # de-correlate per-shard sampling streams (rng args are
                # replicated into every shard)
                return jax.random.fold_in(r, jax.lax.axis_index("data"))

            def per_shard(params, batch, *rest):
                return f(params, batch, *(fold_shard(r) for r in rest))

            def sharded(params, batch, *rest):
                in_specs = (
                    jax.tree_util.tree_map(lambda _: PartitionSpec(),
                                           params),
                    jax.tree_util.tree_map(lambda _: spec(0), batch),
                ) + tuple(PartitionSpec() for _ in rest)
                out_specs = jax.tree_util.tree_map(
                    lambda ax: spec(ax), batch_out_axes,
                    is_leaf=lambda x: isinstance(x, int))
                return shard_map(per_shard, mesh=mesh, in_specs=in_specs,
                                 out_specs=out_specs,
                                 check_vma=False)(params, batch, *rest)

            return jax.jit(sharded)

        self._greedy = dp_wrap(functools.partial(self._run_greedy,
                                                 sample=False,
                                                 train_mode=False), (0, 0))
        self._sample = dp_wrap(functools.partial(self._run_greedy,
                                                 sample=True,
                                                 train_mode=False), (0, 0))
        self._sample_train = dp_wrap(
            functools.partial(self._run_greedy, sample=True,
                              train_mode=True), (0, 0))
        self._beam = dp_wrap(self._run_beam, (1, 1, 1))

    # -- shared primitives -------------------------------------------------
    # ``dropout_rng`` enables train-mode rollouts (dropout active, as in the
    # reference SCST sampled rollout, run_img2txt_dist.py:505-507).  The rng
    # fold structure (prefill -> 0, step t -> t+1) is deterministic so a
    # forced replay regenerates identical masks.
    def _prefill(self, params, batch, dropout_rng=None):
        kw = {}
        if dropout_rng is not None:
            kw = dict(rngs={"dropout": jax.random.fold_in(dropout_rng, 0)},
                      deterministic=False)
        return self.model.apply(
            {"params": params}, batch["input_ids"], batch["segment_ids"],
            batch["position_ids"], batch["vis_feats"], batch["vis_pe"],
            self.dp.mask_id, method=VLPModel.prefill, **kw)

    def _step(self, params, prev_ids, seg, pos, pk, pv, gk, gv, gen_len,
              dropout_rng=None, t=None, beam_bias=None, explicit=False):
        kw = {}
        if dropout_rng is not None:
            if explicit:
                # explicit-dropout contract (SCST fused replay): masks are
                # drawn from caller-visible (key, shape) pairs so the
                # teacher-forced dual-block replay can re-draw them
                # (model.explicit_dropout / VLPModel._scst_replay_drop)
                kw = dict(dropout_key=jax.random.fold_in(dropout_rng, t + 1))
            else:
                kw = dict(
                    rngs={"dropout": jax.random.fold_in(dropout_rng, t + 1)},
                    deterministic=False)
        if beam_bias is not None:
            kw["beam_bias"] = beam_bias
        return self.model.apply(
            {"params": params}, prev_ids, seg, pos, pk, pv, gk, gv, gen_len,
            self.dp.mask_id, method=VLPModel.decode_step, **kw)

    def _init_gen_cache(self, rows: int):
        """Generated-token K/V caches: per-layer TUPLES of [rows, G, H*D]
        (decode-kernel column layout) or [rows, H, G, D] (XLA path) — never
        stacked (see VLPModel._split_stack)."""
        cfg = self.cfg
        G = VLPModel.gen_cache_slots(self.dp.max_tgt_length)
        if cfg.pallas_decode:
            shape = (rows, G, cfg.hidden_size)
        else:
            shape = (rows, cfg.num_attention_heads, G, cfg.head_dim)
        dt = jnp.dtype(cfg.dtype)
        L = cfg.num_hidden_layers
        return (tuple(jnp.zeros(shape, dt) for _ in range(L)),
                tuple(jnp.zeros(shape, dt) for _ in range(L)))

    def _logits(self, params, hidden, task_idx):
        out = self.model.apply({"params": params}, hidden, task_idx,
                               method=VLPModel.lm_logits)
        return out[:, 0, :]  # [B, V]

    def shard_inputs(self, params, batch):
        """Place params replicated and the batch sharded over the mesh's
        ``data`` axis (no-op without a mesh).  The data-axis size must
        divide the batch size."""
        if self.mesh is None:
            return params, batch
        from jax.sharding import PartitionSpec as P
        from vlp_tpu.parallel.pjit_step import put_on_mesh
        params = jax.tree_util.tree_map(
            lambda x: put_on_mesh(x, self.mesh, P()), params)
        batch = {
            k: put_on_mesh(v, self.mesh, P("data", *([None] * (v.ndim - 1))))
            for k, v in batch.items()}
        return params, batch

    # -- greedy / sample ---------------------------------------------------
    def _run_greedy(self, params, batch, rng, *, sample: bool,
                    train_mode: bool = False, explicit_dropout: bool = False):
        cfg, dp = self.cfg, self.dp
        B = batch["input_ids"].shape[0]
        T = dp.max_tgt_length

        rng, d_rng = jax.random.split(rng)
        drop_rng = d_rng if train_mode else None
        hidden, pk, pv = self._prefill(params, batch, dropout_rng=drop_rng)
        gk, gv = self._init_gen_cache(B)
        logits0 = self._logits(params, hidden, batch["task_idx"])

        def select(logits, rng):
            logp = jax.nn.log_softmax(logits, axis=-1)
            if sample:
                ids = jax.random.categorical(rng, logits, axis=-1)
            else:
                ids = jnp.argmax(logits, axis=-1)
            lp = jnp.take_along_axis(logp, ids[:, None], axis=1)[:, 0]
            return ids.astype(jnp.int32), lp

        rng0, rng_loop = jax.random.split(rng)
        ids0, lp0 = select(logits0, rng0)

        def body(carry, t):
            gk, gv, prev, rng = carry
            rng, sub = jax.random.split(rng)
            hidden, gk, gv = self._step(
                params, prev[:, None], batch["segment_ids"],
                batch["position_ids"], pk, pv, gk, gv, t,
                dropout_rng=drop_rng, t=t, explicit=explicit_dropout)
            logits = self._logits(params, hidden, batch["task_idx"])
            ids, lp = select(logits, sub)
            return (gk, gv, ids, rng), (ids, lp)

        (_, _, _, _), (ids_rest, lp_rest) = jax.lax.scan(
            body, (gk, gv, ids0, rng_loop), jnp.arange(T - 1))
        ids = jnp.concatenate([ids0[None], ids_rest], axis=0).T   # [B, T]
        lps = jnp.concatenate([lp0[None], lp_rest], axis=0).T
        return ids, lps

    def greedy(self, params, batch, rng=None):
        rng = jax.random.PRNGKey(0) if rng is None else rng
        return self._greedy(params, batch, rng)

    def sample(self, params, batch, rng, train_mode: bool = False):
        if train_mode:
            return self._sample_train(params, batch, rng)
        return self._sample(params, batch, rng)

    # -- beam search -------------------------------------------------------
    def _forbidden_candidates(self, seqs: jnp.ndarray, t: jnp.ndarray, V: int
                              ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Duplicate-ngram forbid set, as (candidate ids, flags) [B*K, W].

        seqs: int32[T, B*K] committed tokens, TIME-MAJOR (rows > t are
        stale; the layout makes the beam loop's per-step commit a
        leading-dim slab write instead of a serialised per-row update).
        Token ``cand[i, b] = seqs[i+n-1, b]`` is forbidden iff window i
        satisfies seqs[i:i+n-1] == seqs[t-n+2:t+1] (the current tail), with
        the reference's ignore-set exemptions (modeling.py:1391-1406).
        Returned as the (at most W = T-n+1 per row) candidate list instead of
        a scattered [B*K, V] mask — scatter serialises on TPU.
        """
        dp = self.dp
        n = dp.ngram_size
        T, BK = seqs.shape
        W = T - n + 1
        tail_start = t - (n - 2)  # index of first tail token; tail len = n-1
        tail = jax.lax.dynamic_slice_in_dim(seqs, tail_start, n - 1, axis=0)

        ignore = jnp.zeros((V,), bool)
        for tok in dp.forbid_ignore_ids:
            ignore = ignore.at[tok].set(True)
        tail_has_ignore = jnp.any(ignore[tail], axis=0)          # [BK]

        # eq[i, b] = window i matches the tail
        eq = jnp.ones((W, BK), bool)
        for j in range(n - 1):
            eq = eq & (seqs[j:j + W] == tail[j:j + 1])
        win_idx = jnp.arange(W)[:, None]
        valid = win_idx + (n - 1) <= t                           # i+n-1 <= t
        cand = seqs[n - 1:n - 1 + W]                             # seqs[i+n-1]
        flag = eq & valid & ~ignore[cand] & ~tail_has_ignore[None, :]
        return cand.T, flag.T

    def _candidate_topk(self, logits: jnp.ndarray, seqs: jnp.ndarray,
                        t: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Exact top-K of the masked log-probs without materialising a
        [B*K, V] mask or full log-softmax.

        At most W = T-n+1 tokens per row can be ngram-forbidden and one more
        (EOS) min-len-suppressed, so the true masked top-K always lies inside
        the unmasked top-(K+W+1): take those candidates, apply the penalties
        on the small [B*K, C] set, and re-top-K.  Log-probs come from
        subtracting one logsumexp (same values as log_softmax to fp
        rounding).  This replaces the reference's full-vocab mask add
        (modeling.py:1296-1303 + 1426-1428) whose scatter lowering serialised
        the TPU beam loop.
        """
        dp = self.dp
        K = dp.beam_size
        V = logits.shape[-1]
        m = jnp.max(logits, axis=-1)
        lse = m + jnp.log(jnp.sum(jnp.exp(logits - m[:, None]), axis=-1))

        C = K
        if dp.forbid_duplicate_ngrams:
            C += seqs.shape[0] - dp.ngram_size + 1
        if dp.min_len:
            C += 1
        C = min(C, V)
        if dp.approx_topk:
            topv, topi = jax.lax.approx_max_k(logits, C,
                                              recall_target=0.99)
        elif dp.topk_impl == "blocks" and V > 4096:
            topv, topi = _exact_topk_blocks(logits, C,
                                            block=dp.topk_block)  # [B*K, C]
        else:
            topv, topi = jax.lax.top_k(logits, C)                # [B*K, C]
        vals = topv - lse[:, None]
        if dp.forbid_duplicate_ngrams:
            cand, flag = self._forbidden_candidates(seqs, t - 1, V)
            flag = flag & (t >= dp.ngram_size)
            hit = jnp.any((topi[:, :, None] == cand[:, None, :])
                          & flag[:, None, :], axis=-1)
            vals = vals + hit * NEG
        if dp.min_len:
            vals = jnp.where((t + 1 <= dp.min_len) & (topi == dp.eos_id),
                             NEG, vals)
        kk_scores, idx = jax.lax.top_k(vals, K)                  # [B*K, K]
        kk_ids = jnp.take_along_axis(topi, idx, axis=1)
        return kk_scores, kk_ids

    def _run_beam(self, params, batch):
        cfg, dp = self.cfg, self.dp
        K = dp.beam_size
        B = batch["input_ids"].shape[0]
        T = dp.max_tgt_length

        hidden, pk, pv = self._prefill(params, batch)
        logits0 = self._logits(params, hidden, batch["task_idx"])
        logp0 = jax.nn.log_softmax(logits0, axis=-1)
        if dp.min_len and 1 <= dp.min_len:
            logp0 = logp0.at[:, dp.eos_id].set(NEG)
        k_scores0, k_ids0 = jax.lax.top_k(logp0, K)              # [B, K]

        # expand the small streams to beam-major B*K; the prompt K/V caches
        # stay [B, ...] (identical across an example's beams) and only the
        # generated-token caches live at beam granularity
        gk, gv = self._init_gen_cache(B * K)
        seg = _expand_beams(batch["segment_ids"], K)
        pos = _expand_beams(batch["position_ids"], K)
        task_idx = _expand_beams(batch["task_idx"], K)

        # committed tokens, TIME-MAJOR [T, B*K]: the per-step commit is then
        # a leading-dim slab write (a dynamic column write serialises into
        # B*K per-row updates on TPU)
        seqs = jnp.zeros((T, B * K), jnp.int32)
        seqs = seqs.at[0].set(k_ids0.reshape(-1))

        # fused reorder: carry an ancestry map instead of reordering caches
        # (anc[bk, j] = which in-example beam ROW holds beam bk's lineage
        # K/V at slot j); requires the decode kernel's ancestry mask
        fused = dp.reorder_impl == "fused" and cfg.pallas_decode
        G = VLPModel.gen_cache_slots(T)
        own = (jnp.arange(B * K, dtype=jnp.int32) % K)[:, None]  # [B*K, 1]
        anc0 = jnp.broadcast_to(own, (B * K, G))

        stacked = dp.carry_impl == "stacked"
        n_layers = cfg.num_hidden_layers
        if stacked:
            gk = jnp.stack(gk)
            gv = jnp.stack(gv)

        def body(carry, t):
            gk, gv, seqs, anc, prev_ids, last_scores, last_eos = carry
            if stacked:
                gk = tuple(gk[i] for i in range(n_layers))
                gv = tuple(gv[i] for i in range(n_layers))
            if fused:
                # slots t-1 (committed prev token) and t (probe) are written
                # to each beam's OWN row this step
                slots = jnp.arange(G)[None, :]
                anc = jnp.where((slots == t - 1) | (slots == t), own, anc)
                abias = jnp.where(
                    anc[:, None, :] == jnp.arange(K, dtype=jnp.int32)[
                        None, :, None],
                    0.0, NEG).reshape(B * K, K * G).astype(jnp.float32)
            else:
                abias = None
            hidden, gk, gv = self._step(
                params, prev_ids[:, None], seg, pos, pk, pv, gk, gv, t - 1,
                beam_bias=abias)
            logits = self.model.apply({"params": params}, hidden, task_idx,
                                      method=VLPModel.lm_logits)[:, 0, :]
            kk_scores, kk_ids = self._candidate_topk(logits, seqs, t)
            kk_scores = kk_scores + last_eos.reshape(-1, 1) * NEG \
                + last_scores.reshape(-1, 1)
            kk_scores = kk_scores.reshape(B, K * K)
            kk_ids = kk_ids.reshape(B, K * K)
            k_scores, k_idx = jax.lax.top_k(kk_scores, K)        # [B, K]
            back_ptrs = k_idx // K
            k_ids = jnp.take_along_axis(kk_ids, k_idx, axis=1)

            # reorder by back pointers, then commit (the prompt caches need
            # no reordering): fused mode permutes only the int32 ancestry
            # map; the other impls gather/contract every layer's k/v cache
            flat = (jnp.arange(B)[:, None] * K
                    + back_ptrs.astype(jnp.int32)).reshape(-1)
            if fused:
                anc = jnp.take(anc, flat, axis=0)
            elif dp.reorder_impl == "onehot":
                w = jax.nn.one_hot(back_ptrs, K,
                                   dtype=jnp.float32)        # [B, Kn, Ko]
                gk = tuple(_reorder_cache_onehot(c, w, B, K) for c in gk)
                gv = tuple(_reorder_cache_onehot(c, w, B, K) for c in gv)
            else:
                gk = tuple(_gather_beams(c, back_ptrs, B, K) for c in gk)
                gv = tuple(_gather_beams(c, back_ptrs, B, K) for c in gv)
            seqs = jnp.take(seqs, flat, axis=1)
            seqs = seqs.at[t].set(k_ids.reshape(-1))

            eos = (k_ids == dp.eos_id).astype(jnp.float32)
            if stacked:
                gk = jnp.stack(gk)
                gv = jnp.stack(gv)
            carry = (gk, gv, seqs, anc, k_ids.reshape(-1), k_scores, eos)
            return carry, (k_ids, back_ptrs, k_scores, eos)

        eos0 = (k_ids0 == dp.eos_id).astype(jnp.float32)
        carry0 = (gk, gv, seqs, anc0, k_ids0.reshape(-1), k_scores0, eos0)
        _, (ids_r, ptrs_r, scores_r, eos_r) = jax.lax.scan(
            body, carry0, jnp.arange(1, T))

        step_ids = jnp.concatenate([k_ids0[None], ids_r], axis=0)       # [T,B,K]
        step_ptrs = jnp.concatenate(
            [jnp.zeros((1, B, K), jnp.int32), ptrs_r], axis=0)
        step_scores = jnp.concatenate([k_scores0[None], scores_r], axis=0)
        return step_ids, step_ptrs, step_scores

    def beam_dispatch(self, params, batch):
        """Launch the jitted beam loop and return the DEVICE trace arrays
        without fetching.  Dispatch is asynchronous, so a caller can launch
        batch N+1 before collecting batch N — through a remote runtime the
        round-trip fetch latency otherwise serialises with device compute
        (measured on the axon tunnel: 391 -> 581 captions/sec at beam-5
        B=100 just from depth-1 pipelining).  Pair with ``beam_collect``."""
        return self._beam(params, batch)

    def beam_collect(self, handle) -> Dict[str, np.ndarray]:
        """Fetch a ``beam_dispatch`` result and run the host back-trace."""
        step_ids, step_ptrs, step_scores = jax.tree_util.tree_map(
            np.asarray, handle)
        return self._backtrace(step_ids, step_ptrs, step_scores)

    def beam_search(self, params, batch) -> Dict[str, np.ndarray]:
        return self.beam_collect(self.beam_dispatch(params, batch))

    def _backtrace(self, step_ids, step_ptrs, step_scores
                   ) -> Dict[str, np.ndarray]:
        """Host-side trace reconstruction (modeling.py:1436-1472)."""
        dp = self.dp
        T, B, K = step_ids.shape
        pred = np.zeros((B, T), np.int64)
        for b in range(B):
            wids = step_ids[:, b, :]
            ptrs = step_ptrs[:, b, :]
            scores = step_scores[:, b, :]
            last_frame = T - 1
            for t in range(T):
                if (wids[t] == dp.eos_id).all():
                    last_frame = t
                    break
            best, frame_id, pos = -np.inf, -1, -1
            for fid in range(last_frame + 1):
                for i in range(K):
                    if wids[fid, i] == dp.eos_id or fid == last_frame:
                        s = scores[fid, i] + dp.length_penalty * (fid + 1)
                        if s > best:
                            best, frame_id, pos = s, fid, i
            if frame_id == -1:
                pred[b, 0] = 0
                continue
            seq = [wids[frame_id, pos]]
            for fid in range(frame_id, 0, -1):
                pos = ptrs[fid, pos]
                seq.append(wids[fid - 1, pos])
            seq.reverse()
            pred[b, :len(seq)] = seq
        return {"pred_seq": pred, "wids": step_ids.transpose(1, 0, 2),
                "ptrs": step_ptrs.transpose(1, 0, 2),
                "scores": step_scores.transpose(1, 0, 2)}

    # -- unified entry (BertForSeq2SeqDecoder.forward parity) --------------
    def __call__(self, params, batch, rng=None, sample_mode: str = "greedy"):
        if self.dp.beam_size > 1:
            return self.beam_search(params, batch)
        if sample_mode == "greedy":
            return self.greedy(params, batch, rng)
        if sample_mode == "sample":
            return self.sample(params, batch, rng)
        raise NotImplementedError(sample_mode)
