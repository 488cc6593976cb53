"""Fused decode-step attention kernel (beam/greedy KV-cached generation).

The XLA formulation of one decode step (models/model.py:incremental_split)
is correct but fine-grained: per layer it emits 5-D batched einsums over
(B, K, H) batch dims, a score concat (a ConcatBitcast custom call), full
gen-cache one-hot rewrites in a transposed layout, and operand-staging
async slices — profiled at ~21 ms/step for B=100 K=5 on a v5e against a
~6 ms bandwidth+FLOP floor, and the cost scales LINEARLY with batch (it is
work, not dispatch overhead; measured B=100 vs B=400).

This kernel runs a BLOCK of E examples per grid step and fuses the whole
attention middle — gen-cache slot write, prompt scores, beam-local gen
scores, joint softmax, context — reading each operand once:

  * caches live in the projections' natural column layout ``[*, H*D]``
    (same philosophy as the training kernel's ``blhd`` layout —
    ops/attention.py:_fwd_kernel_blhd): no head transpose exists anywhere;
  * the prompt cache block ``[P, H*D]`` is shared by each example's K
    beams (it is stored once per example, never beam-expanded);
  * per head, ALL of the block's scores are TWO dots — queries
    ``[E*K*S, D]`` against the stacked prompt caches ``[E*P, D]`` and the
    stacked gen caches ``[E*K*G, D]`` — with an in-register block-diagonal
    (same example) x beam-diagonal (same beam) x committed-slot mask.
    Cross-example/-beam score entries are masked to -1e4, whose exp
    underflows to exactly 0.0 in fp32, so the joint softmax is numerically
    identical to per-example softmaxes while the dots are E-fold larger
    (MXU-shaped) and E-fold fewer (grid overhead amortised);
  * the softmax over the concatenated (prompt | gen) axis is computed
    flash-style from the two pieces (joint row max, joint denominator) —
    no concatenated score tensor is ever materialised;
  * probabilities are cast to the activation dtype before the PV dots with
    fp32 accumulation, matching the XLA path bit-for-bit in structure.

Masking semantics replicate incremental_split exactly: prompt positions
are fully visible (decode-time s2s mask, seq2seq_loader.py:423-429); gen
slot j of beam b is visible to query (b, s) iff ``j <= gen_len + s``
(query 0 is the committed previous token, query 1 the [MASK] probe; each
sees its own just-written slot).  Reference: the ragged python cache +
explicit mask of modeling.py:1207-1250.

Attention-prob dropout (SCST sampled rollouts, round 5): on TPU the kernel
draws keep/scale masks from the on-chip PRNG (``pltpu.prng_random_bits``,
the training kernel's pattern — ops/attention.py:_dropout_keep_scale),
seeded per example from the explicit-dropout contract's site key, so the
rollout rides the fused path instead of the column-layout XLA math.  The
SCST dual-block replay re-draws the kernel's exact bits via
``decode_dropout_scales`` (identical seed + draw sequence).  ``pltpu.prng_*``
has no CPU lowering even in interpret mode, so off-TPU the rollout keeps the
``jax.random`` XLA path (models/model.py:incremental_split routes on
``kernel_dropout_available``).  Beam search stays deterministic.
"""

from __future__ import annotations

import functools
import math

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vlp_tpu.ops.masks import NEG_INF


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def kernel_dropout_available() -> bool:
    """True when the decode kernel can apply attention-prob dropout: the
    on-chip PRNG has no CPU lowering (not even interpret mode), so this is
    exactly "running on real TPU"."""
    return not _interpret()


def _pad128(n: int) -> int:
    return -(-n // 128) * 128


def _keep_scale(shape, rate: float):
    """Keep/scale multiplier from the already-seeded on-chip PRNG (same
    construction as the training kernel's _dropout_keep_scale: bitcast to
    uint32 before the threshold compare)."""
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    threshold = np.uint32(min(int(rate * float(2 ** 32)), 2 ** 32 - 1))
    keep = bits >= threshold
    return jnp.where(keep, 1.0 / (1.0 - rate), 0.0).astype(jnp.float32)


def _draw_example_scales(H: int, S: int, P: int, G: int, rate: float):
    """The canonical per-example draw sequence: ONE prompt draw then ONE gen
    draw, both padded to full lanes, laid out [S, H*pad] so the per-head
    read is an aligned-offset column window (h*pad : h*pad+width).  The
    rollout kernel and the replay regenerator both call exactly this after
    seeding, which is what makes the masks reproducible."""
    dp = _keep_scale((S, H * _pad128(P)), rate)
    dg = _keep_scale((S, H * _pad128(G)), rate)
    return dp, dg


def _kernel(gen_len_ref, *args, H: int, K: int, S: int,
            G: int, P: int, E: int, scale: float, has_anc: bool = False,
            drop_rate: float = 0.0):
    if drop_rate > 0.0:
        seed_ref, *args = args
    q_ref, k_ref, v_ref, pk_ref, pv_ref, gk_ref, gv_ref, *rest = args
    if has_anc:
        ab_ref, out_ref, gk_out_ref, gv_out_ref = rest
    else:
        ab_ref = None
        out_ref, gk_out_ref, gv_out_ref = rest
    EKS, HD = q_ref.shape
    D = HD // H
    EK = E * K
    gl = gen_len_ref[0]

    # ---- gen-cache slot write (one-hot over the G dim, all rows at once)
    slot = jax.lax.broadcasted_iota(jnp.int32, (1, G, 1), 1)
    kb = k_ref[...].reshape(EK, S, HD)
    vb = v_ref[...].reshape(EK, S, HD)
    gk3 = gk_ref[...].reshape(EK, G, HD)
    gv3 = gv_ref[...].reshape(EK, G, HD)
    gk_new = jnp.where(slot == gl, kb[:, 0:1, :],
                       jnp.where(slot == gl + 1, kb[:, 1:2, :], gk3))
    gv_new = jnp.where(slot == gl, vb[:, 0:1, :],
                       jnp.where(slot == gl + 1, vb[:, 1:2, :], gv3))
    gk_new = gk_new.reshape(EK * G, HD)
    gv_new = gv_new.reshape(EK * G, HD)
    gk_out_ref[...] = gk_new
    gv_out_ref[...] = gv_new

    # ---- visibility masks (additive, fp32)
    # prompt: same example only (block diagonal over the E examples)
    rowp = jax.lax.broadcasted_iota(jnp.int32, (EKS, E * P), 0)
    colp = jax.lax.broadcasted_iota(jnp.int32, (EKS, E * P), 1)
    pvis = (rowp // (K * S)) == (colp // P)
    pbias = jnp.where(pvis, 0.0, NEG_INF).astype(jnp.float32)
    rowg = jax.lax.broadcasted_iota(jnp.int32, (EKS, EK * G), 0)
    colg = jax.lax.broadcasted_iota(jnp.int32, (EKS, EK * G), 1)
    if has_anc:
        # fused beam reorder: caches are never physically reordered; the
        # ancestry bias (0 where column-beam k2 holds query-beam k's
        # lineage at slot j, else NEG) replaces the same-beam diagonal.
        # gen: same example AND committed slot AND ancestor match
        gvis = (((rowg // (K * S)) == (colg // (K * G)))
                & ((colg % G) <= gl + rowg % S))
        ab = ab_ref[...]                                   # [EK, EK*G]
        ab2 = jnp.broadcast_to(ab[:, None, :],
                               (EK, S, EK * G)).reshape(EKS, EK * G)
        gbias = jnp.where(gvis, 0.0, NEG_INF).astype(jnp.float32) + ab2
    else:
        # gen: same example AND same beam AND committed slot (j <= gl + s)
        gvis = ((rowg // S) == (colg // G)) & ((colg % G) <= gl + rowg % S)
        gbias = jnp.where(gvis, 0.0, NEG_INF).astype(jnp.float32)

    # ---- attention-prob dropout draws (SCST sampled rollouts, K == 1):
    # one seed per example from the explicit-dropout site key, then the
    # canonical (prompt, gen) draw pair — the dual-block replay regenerates
    # these exact bits via decode_dropout_scales (same seed, same sequence)
    if drop_rate > 0.0:
        bidx = pl.program_id(0)
        PPAD, GPAD = _pad128(P), _pad128(G)
        draws = []
        for e in range(E):
            pltpu.prng_seed(seed_ref[bidx * E + e])
            draws.append(_draw_example_scales(H, S, P, G, drop_rate))

    dt = out_ref.dtype
    contract = (((1,), (1,)), ((), ()))
    for h in range(H):
        cols = slice(h * D, (h + 1) * D)
        qh = q_ref[:, cols]
        sp = jax.lax.dot_general(
            qh, pk_ref[:, cols], dimension_numbers=contract,
            preferred_element_type=jnp.float32) * scale + pbias  # [EKS, E*P]
        sg = jax.lax.dot_general(
            qh, gk_new[:, cols], dimension_numbers=contract,
            preferred_element_type=jnp.float32) * scale + gbias  # [EKS,EK*G]
        # joint softmax over (prompt | gen) without concatenating
        m = jnp.maximum(jnp.max(sp, axis=-1, keepdims=True),
                        jnp.max(sg, axis=-1, keepdims=True))
        ep = jnp.exp(sp - m)
        eg = jnp.exp(sg - m)
        denom = (jnp.sum(ep, axis=-1, keepdims=True)
                 + jnp.sum(eg, axis=-1, keepdims=True))
        pp = ep / denom
        pg = eg / denom
        if drop_rate > 0.0:
            # rows are (e, s); own-example column blocks pick up that row's
            # keep/scale; cross-example blocks read a repeated pattern whose
            # probabilities are exact zeros (the -1e4 mask underflows)
            rows_p = jnp.concatenate(
                [d[0][:, h * PPAD:h * PPAD + P] for d in draws], axis=0)
            rows_g = jnp.concatenate(
                [d[1][:, h * GPAD:h * GPAD + G] for d in draws], axis=0)
            pp = pp * jnp.concatenate([rows_p] * E, axis=1)
            pg = pg * jnp.concatenate([rows_g] * E, axis=1)
        pp = pp.astype(dt)
        pg = pg.astype(dt)
        ctx = jnp.dot(pp, pv_ref[:, cols],
                      preferred_element_type=jnp.float32)
        ctx = ctx + jnp.dot(pg, gv_new[:, cols],
                            preferred_element_type=jnp.float32)
        out_ref[:, cols] = ctx.astype(dt)


def _block_examples(B: int, K: int, G: int, P: int, HD: int,
                    itemsize: int = 2) -> int:
    """Examples per grid step: amortise per-step overhead while keeping the
    gen-score tile (E*K*G lanes) moderate AND the streamed blocks inside
    the 16 MB scoped-VMEM limit.  Mosaic double-buffers every block, so the
    footprint is 2x the per-step block bytes (4 q/k/v/out rows-blocks +
    2 prompt + 4 gen-cache); budget 14 MB, leaving headroom for the
    kernel's fp32 score/context intermediates.  Measured necessity: B=200
    beam-5 would pick E=8 under the old lane-only rule and OOM scoped vmem
    (17.8 MB > 16 MB, 'exceeded scoped vmem limit by 68.0K')."""
    S = 2
    for e in (8, 4, 2):
        rows = 4 * e * K * S + 2 * e * P + 4 * e * K * G
        if B % e == 0 and e * K * G <= 1024 \
                and rows * HD * itemsize * 2 <= (14 << 20):
            return e
    return 1


def dropout_seeds(key, B: int):
    """Per-example int32 seeds for the kernel's on-chip PRNG, derived from
    an explicit-dropout site key.  The rollout (incremental_split) and the
    replay regenerator (_scst_replay_drop) MUST both use this function so
    the two streams coincide."""
    return jax.random.randint(key, (B,), 0, 2 ** 31 - 1, dtype=jnp.int32)


def _regen_kernel(seed_ref, dp_ref, dg_ref, *, H: int, S: int, P: int,
                  G: int, Eb: int, rate: float):
    b = pl.program_id(0)
    for e in range(Eb):
        pltpu.prng_seed(seed_ref[b * Eb + e])
        dp, dg = _draw_example_scales(H, S, P, G, rate)
        dp_ref[e] = dp
        dg_ref[e] = dg


def decode_dropout_scales(seeds, *, n_heads: int, S: int, P: int, G: int,
                          rate: float):
    """Regenerate the decode kernel's attention-prob keep/scale draws.

    ``seeds``: int32 [N] (one per (step, example) pair as derived by
    ``dropout_seeds``).  Returns fp32 [N, H, S, P+G] — entry 0.0 where the
    kernel dropped the probability, 1/(1-rate) where it kept it — EXACTLY
    the multipliers the rollout kernel applied (same pltpu.prng seed and
    draw sequence; cross-checked on real TPU).  TPU-only (pltpu.prng has no
    CPU lowering)."""
    assert kernel_dropout_available(), \
        "decode_dropout_scales regenerates on-chip PRNG bits; off-TPU the " \
        "rollout uses the jax.random path and needs no regeneration"
    H = n_heads
    N = seeds.shape[0]
    PPAD, GPAD = _pad128(P), _pad128(G)
    Eb = 8
    Np = -(-N // Eb) * Eb
    if Np != N:
        seeds = jnp.concatenate(
            [seeds, jnp.zeros((Np - N,), jnp.int32)])
    nblk = Np // Eb
    kernel = functools.partial(_regen_kernel, H=H, S=S, P=P, G=G, Eb=Eb,
                               rate=rate)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(nblk,), in_specs=[],
        out_specs=(pl.BlockSpec((None, Eb, S, H * PPAD),
                                lambda b, *_: (b, 0, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((None, Eb, S, H * GPAD),
                                lambda b, *_: (b, 0, 0, 0),
                                memory_space=pltpu.VMEM)))
    dp, dg = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((nblk, Eb, S, H * PPAD),
                                        jnp.float32),
                   jax.ShapeDtypeStruct((nblk, Eb, S, H * GPAD),
                                        jnp.float32)),
        interpret=_interpret(),
    )(seeds)
    dp = dp.reshape(Np, S, H, PPAD)[:N, ..., :P].transpose(0, 2, 1, 3)
    dg = dg.reshape(Np, S, H, GPAD)[:N, ..., :G].transpose(0, 2, 1, 3)
    return jnp.concatenate([dp, dg], axis=-1)  # [N, H, S, P+G]


def decode_attention(q, k, v, pk, pv, gk, gv, gen_len, *, n_heads: int,
                     beam_bias=None, drop_seed=None, drop_rate: float = 0.0):
    """One KV-cached generation step, fused.

    q/k/v: [B*K, S, HD] — the new tokens' projection outputs (S=2:
    [prev_token, MASK probe]); pk/pv: [B, P, HD] prompt caches (shared per
    example across beams); gk/gv: [B*K, G, HD] generated-token caches;
    gen_len: int32 scalar (committed tokens so far).

    ``beam_bias`` (fused beam reorder, round 4): fp32 [B*K, K*G] additive
    ancestry bias — entry (bk, k2*G+j) is 0 when in-example beam row k2
    holds beam bk's lineage K/V at slot j, else NEG_INF.  With it the
    caches are NEVER physically reordered between steps (the per-step
    [B*K, G, HD] x 12-layer x k/v gathers were 20% of the serving-batch
    step, DESIGN.md round-3 profile); the gen-score dot was ALREADY over
    all of an example's beams, so selecting ancestors costs only this bias
    in the in-register mask.

    ``drop_seed``/``drop_rate`` (SCST sampled rollouts, round 5): int32 [B]
    per-example PRNG seeds (``dropout_seeds``) + the attention-prob dropout
    rate.  The kernel draws keep/scale masks on-chip and applies them to
    the post-softmax probabilities (flax Dropout numerics: kept entries
    scaled by 1/keep).  Requires K == 1 (sampling, not beam search) and
    real TPU (``kernel_dropout_available``).

    Returns (ctx [B*K, S, HD], gk', gv') with the new tokens' K/V written
    into slots gen_len / gen_len+1.
    """
    BK, S, HD = q.shape
    B, P, _ = pk.shape
    G = gk.shape[1]
    K = BK // B
    D = HD // n_heads
    if drop_seed is not None:
        assert drop_rate > 0.0
        assert beam_bias is None, "dropout is for sampling, not beam search"
        assert K == 1, "kernel dropout requires K == 1 (sampled rollouts)"
        assert kernel_dropout_available(), \
            "pltpu.prng has no CPU lowering; route XLA off-TPU"
    E = _block_examples(B, K, G, P, HD, jnp.dtype(q.dtype).itemsize)
    kernel = functools.partial(_kernel, H=n_heads, K=K, S=S, G=G, P=P, E=E,
                               scale=1.0 / math.sqrt(D),
                               has_anc=beam_bias is not None,
                               drop_rate=drop_rate if drop_seed is not None
                               else 0.0)

    def row_spec(rows, width=HD):
        return pl.BlockSpec((None, rows, width), lambda b, *_: (b, 0, 0),
                            memory_space=pltpu.VMEM)

    nblk = B // E
    qv = q.reshape(nblk, E * K * S, HD)
    kv_ = k.reshape(nblk, E * K * S, HD)
    vv = v.reshape(nblk, E * K * S, HD)
    pkv = pk.reshape(nblk, E * P, HD)
    pvv = pv.reshape(nblk, E * P, HD)
    gkv = gk.reshape(nblk, E * K * G, HD)
    gvv = gv.reshape(nblk, E * K * G, HD)
    in_specs = [row_spec(E * K * S), row_spec(E * K * S),
                row_spec(E * K * S), row_spec(E * P), row_spec(E * P),
                row_spec(E * K * G), row_spec(E * K * G)]
    operands = [qv, kv_, vv, pkv, pvv, gkv, gvv]
    if beam_bias is not None:
        # tile the per-example [K*G] bias across the E examples of a block
        # (cross-example columns are NEG-masked by the block diagonal, so
        # the repeated pattern is never misread)
        ab = jnp.tile(beam_bias.astype(jnp.float32), (1, E))
        operands.append(ab.reshape(nblk, E * K, E * K * G))
        in_specs.append(row_spec(E * K, E * K * G))
    scalars = [jnp.asarray(gen_len, jnp.int32).reshape(1)]
    if drop_seed is not None:
        scalars.append(jnp.asarray(drop_seed, jnp.int32))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=len(scalars),  # gen_len (+ dropout seeds)
        grid=(nblk,),
        in_specs=in_specs,
        out_specs=(row_spec(E * K * S), row_spec(E * K * G),
                   row_spec(E * K * G)),
    )
    out, gk_new, gv_new = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((nblk, E * K * S, HD), q.dtype),
                   jax.ShapeDtypeStruct((nblk, E * K * G, HD), gk.dtype),
                   jax.ShapeDtypeStruct((nblk, E * K * G, HD), gv.dtype)),
        interpret=_interpret(),
    )(*scalars, *operands)
    return (out.reshape(BK, S, HD), gk_new.reshape(BK, G, HD),
            gv_new.reshape(BK, G, HD))
