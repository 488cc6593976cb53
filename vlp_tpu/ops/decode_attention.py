"""Fused decode-step attention kernel (beam/greedy KV-cached generation).

The XLA formulation of one decode step (models/model.py:incremental_split)
is correct but fine-grained: per layer it emits 5-D batched einsums over
(B, K, H) batch dims, a score concat (a ConcatBitcast custom call), full
gen-cache one-hot rewrites in a transposed layout, and operand-staging
async slices — profiled at ~21 ms/step for B=100 K=5 on a v5e against a
~6 ms bandwidth+FLOP floor, and the cost scales LINEARLY with batch (it is
work, not dispatch overhead; measured B=100 vs B=400).

This kernel runs one example per grid step and fuses the whole attention
middle — gen-cache slot write, prompt scores, beam-local gen scores,
joint softmax, context — reading each operand once:

  * caches live in the projections' natural column layout ``[*, H*D]``
    (same philosophy as the training kernel's ``blhd`` layout —
    ops/attention.py:_fwd_kernel_blhd): no head transpose exists anywhere;
  * the prompt cache block ``[P, H*D]`` is shared by the example's K beams
    (it is stored once per example, never beam-expanded);
  * gen scores are ONE ``[K*S, D] x [D, K*G]`` dot per head with an
    in-register beam-diagonal + committed-slot visibility mask instead of
    K separate tiny dots (the off-beam FLOPs are free next to the DMA);
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

No PRNG is used (decode is deterministic), so the kernel runs under CPU
interpret mode unchanged — SCST's dropout-active sampled rollouts route
through the XLA path instead (models/model.py:incremental_split).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vlp_tpu.ops.masks import NEG_INF


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _kernel(gen_len_ref, q_ref, k_ref, v_ref, pk_ref, pv_ref, gk_ref, gv_ref,
            out_ref, gk_out_ref, gv_out_ref, *, H: int, K: int, S: int,
            G: int, scale: float):
    KS, HD = q_ref.shape
    D = HD // H
    gl = gen_len_ref[0]

    # ---- gen-cache slot write (one-hot over the G dim, all beams at once)
    slot = jax.lax.broadcasted_iota(jnp.int32, (1, G, 1), 1)
    kb = k_ref[...].reshape(K, S, HD)
    vb = v_ref[...].reshape(K, S, HD)
    gk3 = gk_ref[...].reshape(K, G, HD)
    gv3 = gv_ref[...].reshape(K, G, HD)
    gk_new = jnp.where(slot == gl, kb[:, 0:1, :],
                       jnp.where(slot == gl + 1, kb[:, 1:2, :], gk3))
    gv_new = jnp.where(slot == gl, vb[:, 0:1, :],
                       jnp.where(slot == gl + 1, vb[:, 1:2, :], gv3))
    gk_new = gk_new.reshape(K * G, HD)
    gv_new = gv_new.reshape(K * G, HD)
    gk_out_ref[...] = gk_new
    gv_out_ref[...] = gv_new

    # ---- visibility of gen slots: same beam AND committed (j <= gl + s)
    row = jax.lax.broadcasted_iota(jnp.int32, (KS, K * G), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (KS, K * G), 1)
    row_beam, row_s = row // S, row % S
    col_beam, col_slot = col // G, col % G
    gvis = (row_beam == col_beam) & (col_slot <= gl + row_s)
    gbias = jnp.where(gvis, 0.0, NEG_INF).astype(jnp.float32)

    dt = out_ref.dtype
    contract = (((1,), (1,)), ((), ()))
    for h in range(H):
        cols = slice(h * D, (h + 1) * D)
        qh = q_ref[:, cols]
        sp = jax.lax.dot_general(
            qh, pk_ref[:, cols], dimension_numbers=contract,
            preferred_element_type=jnp.float32) * scale          # [KS, P]
        sg = jax.lax.dot_general(
            qh, gk_new[:, cols], dimension_numbers=contract,
            preferred_element_type=jnp.float32) * scale + gbias  # [KS, K*G]
        # joint softmax over (prompt | gen) without concatenating
        m = jnp.maximum(jnp.max(sp, axis=-1, keepdims=True),
                        jnp.max(sg, axis=-1, keepdims=True))
        ep = jnp.exp(sp - m)
        eg = jnp.exp(sg - m)
        denom = (jnp.sum(ep, axis=-1, keepdims=True)
                 + jnp.sum(eg, axis=-1, keepdims=True))
        pp = (ep / denom).astype(dt)
        pg = (eg / denom).astype(dt)
        ctx = jnp.dot(pp, pv_ref[:, cols],
                      preferred_element_type=jnp.float32)
        ctx = ctx + jnp.dot(pg, gv_new[:, cols],
                            preferred_element_type=jnp.float32)
        out_ref[:, cols] = ctx.astype(dt)


def decode_attention(q, k, v, pk, pv, gk, gv, gen_len, *, n_heads: int):
    """One KV-cached generation step, fused.

    q/k/v: [B*K, S, HD] — the new tokens' projection outputs (S=2:
    [prev_token, MASK probe]); pk/pv: [B, P, HD] prompt caches (shared per
    example across beams); gk/gv: [B*K, G, HD] generated-token caches;
    gen_len: int32 scalar (committed tokens so far).

    Returns (ctx [B*K, S, HD], gk', gv') with the new tokens' K/V written
    into slots gen_len / gen_len+1.
    """
    BK, S, HD = q.shape
    B, P, _ = pk.shape
    G = gk.shape[1]
    K = BK // B
    D = HD // n_heads
    kernel = functools.partial(_kernel, H=n_heads, K=K, S=S, G=G,
                               scale=1.0 / math.sqrt(D))

    def row_spec(rows):
        return pl.BlockSpec((None, rows, HD), lambda b, *_: (b, 0, 0),
                            memory_space=pltpu.VMEM)

    qv = q.reshape(B, K * S, HD)
    kv_ = k.reshape(B, K * S, HD)
    vv = v.reshape(B, K * S, HD)
    gkv = gk.reshape(B, K * G, HD)
    gvv = gv.reshape(B, K * G, HD)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # gen_len
        grid=(B,),
        in_specs=[row_spec(K * S), row_spec(K * S), row_spec(K * S),
                  row_spec(P), row_spec(P),
                  row_spec(K * G), row_spec(K * G)],
        out_specs=(row_spec(K * S), row_spec(K * G), row_spec(K * G)),
    )
    out, gk_new, gv_new = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((B, K * S, HD), q.dtype),
                   jax.ShapeDtypeStruct((B, K * G, HD), gk.dtype),
                   jax.ShapeDtypeStruct((B, K * G, HD), gv.dtype)),
        interpret=_interpret(),
    )(jnp.asarray(gen_len, jnp.int32).reshape(1), qv, kv_, vv, pk, pv,
      gkv, gvv)
    return (out.reshape(BK, S, HD), gk_new.reshape(BK, G, HD),
            gv_new.reshape(BK, G, HD))
