"""Multi-head attention for the VLP unified transformer.

Two interchangeable implementations (numerics-diff tested against each other):

  * ``attention_xla``   — plain jnp einsum path (reference semantics of
                          modeling.py:244-303 with the additive -10000 mask of
                          modeling.py:807-833).  Used on CPU and as autodiff
                          ground truth.
  * ``attention_pallas``— fused TPU kernel: builds the structural s2s/bi mask
                          in-register from (mode, text_end, colkeep) metadata,
                          computes QK^T -> masked fp32 softmax -> PV in VMEM,
                          applies attention-prob dropout with the on-chip PRNG,
                          and exposes a custom VJP whose backward kernel
                          recomputes probabilities (flash-style, no L x L
                          residuals in HBM).

Shapes: q, k, v are [B, H, L, D] (L = padded seq len, D = head dim).
The mask metadata replaces the reference's host-built B x L x L matrix.
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vlp_tpu.config import MODE_S2S
from vlp_tpu.ops.masks import NEG_INF


# ---------------------------------------------------------------------------
# XLA reference path
# ---------------------------------------------------------------------------

def attention_xla(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                  bias: jnp.ndarray, *, dropout_rate: float = 0.0,
                  dropout_rng=None) -> jnp.ndarray:
    """bias: additive [B, 1, L, L] (0 / -10000)."""
    d = q.shape[-1]
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32)
    scores = scores / math.sqrt(d) + bias
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
    if dropout_rate > 0.0 and dropout_rng is not None:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, probs.shape)
        probs = jnp.where(keep, probs / (1.0 - dropout_rate), 0.0)
    return jnp.einsum("bhqk,bhkd->bhqd", probs.astype(q.dtype), v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


# ---------------------------------------------------------------------------
# Pallas fused kernel
# ---------------------------------------------------------------------------

def _mask_bias(mode, text_end, colkeep_row, prefix: int, L: int):
    """Build the additive [L, L] mask for one example, in-register."""
    i = jax.lax.broadcasted_iota(jnp.int32, (L, L), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (L, L), 1)
    te = text_end
    bi_vis = j < te
    causal = (j >= prefix) & (j <= i) & (i < te)
    s2s_vis = (j < prefix) | causal
    # scalar-predicate select over i1 vectors doesn't legalize in Mosaic;
    # express the mode switch as boolean algebra instead.
    is_s2s = mode == MODE_S2S
    vis = (s2s_vis & is_s2s) | (bi_vis & jnp.logical_not(is_s2s))
    vis = vis & (colkeep_row[None, :] > 0.5)
    return jnp.where(vis, 0.0, NEG_INF).astype(jnp.float32)


def _softmax_probs(scores_f32):
    m = jnp.max(scores_f32, axis=-1, keepdims=True)
    e = jnp.exp(scores_f32 - m)
    return e / jnp.sum(e, axis=-1, keepdims=True)


def _dropout_keep_scale(shape, rate: float):
    """Draw a keep/scale multiplier from the already-seeded on-chip PRNG.

    prng_random_bits yields int32-typed bits — bitcast to uint32 before the
    threshold compare, or the keep probability silently becomes
    ~(0.5 - rate/2) instead of (1 - rate)."""
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    threshold = np.uint32(min(int(rate * float(2 ** 32)), 2 ** 32 - 1))
    keep = bits >= threshold
    return jnp.where(keep, 1.0 / (1.0 - rate), 0.0).astype(jnp.float32)


def _fwd_kernel(mode_ref, te_ref, seed_ref, q_ref, k_ref, v_ref, colkeep_ref,
                out_ref, *, prefix: int, drop_rate: float, scale: float):
    H, L = q_ref.shape[1], q_ref.shape[2]
    b = pl.program_id(0)
    bias = _mask_bias(mode_ref[b], te_ref[b], colkeep_ref[b, :], prefix, L)
    if drop_rate > 0.0:
        pltpu.prng_seed(seed_ref[b])
    for h in range(H):
        q = q_ref[0, h]
        k = k_ref[0, h]
        v = v_ref[0, h]
        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale + bias
        p = _softmax_probs(s)
        if drop_rate > 0.0:
            p = p * _dropout_keep_scale((L, L), drop_rate)
        out_ref[0, h] = jnp.dot(
            p.astype(q_ref.dtype), v,
            preferred_element_type=jnp.float32).astype(out_ref.dtype)


def _fwd_kernel_blhd(mode_ref, te_ref, seed_ref, q_ref, k_ref, v_ref,
                     colkeep_ref, out_ref, *, prefix: int, drop_rate: float,
                     scale: float, H: int, L: int, E: int):
    """[B,L,H*D] layout — the QKV projections' LITERAL output, so no head
    transpose exists anywhere (the [B,H,L,D] custom-call operands otherwise
    cost XLA one physical copy per q/k/v/out/do/dq/dk/dv per layer, ~15% of
    the whole pretraining step, measured in the trace).  Refs are 2-D
    [E*L, H*D] blocks holding E examples per grid step (the per-example
    grid left the kernel well above its DMA floor on grid-step overhead;
    the inner loop keeps per-example masks, dropout streams, and numerics
    bit-identical); heads are static column slices — per-head [L,1,D]
    squeezes of a 4-D block are vector shape casts Mosaic cannot legalize
    (and squeezed middle block dims are rejected outright)."""
    D = q_ref.shape[1] // H
    blk = pl.program_id(0)
    for e in range(E):
        b = blk * E + e
        # E == 1 keeps the exact original full-block indexing (the form
        # long-validated on hardware); row slices only appear for E > 1
        rows = slice(None) if E == 1 else slice(e * L, (e + 1) * L)
        bias = _mask_bias(mode_ref[b], te_ref[b], colkeep_ref[b, :],
                          prefix, L)
        if drop_rate > 0.0:
            pltpu.prng_seed(seed_ref[b])
        for h in range(H):
            cols = slice(h * D, (h + 1) * D)
            s = jax.lax.dot_general(
                q_ref[rows, cols], k_ref[rows, cols],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale + bias
            p = _softmax_probs(s)
            if drop_rate > 0.0:
                p = p * _dropout_keep_scale((L, L), drop_rate)
            out_ref[rows, cols] = jnp.dot(
                p.astype(q_ref.dtype), v_ref[rows, cols],
                preferred_element_type=jnp.float32).astype(out_ref.dtype)


def _bwd_kernel(mode_ref, te_ref, seed_ref, q_ref, k_ref, v_ref, colkeep_ref,
                do_ref, dq_ref, dk_ref, dv_ref, *, prefix: int,
                drop_rate: float, scale: float):
    H, L = q_ref.shape[1], q_ref.shape[2]
    b = pl.program_id(0)
    bias = _mask_bias(mode_ref[b], te_ref[b], colkeep_ref[b, :], prefix, L)
    if drop_rate > 0.0:
        pltpu.prng_seed(seed_ref[b])  # same seed => same per-head draws as fwd
    for h in range(H):
        q = q_ref[0, h].astype(jnp.float32)
        k = k_ref[0, h].astype(jnp.float32)
        v = v_ref[0, h].astype(jnp.float32)
        do = do_ref[0, h].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale + bias
        p = _softmax_probs(s)
        if drop_rate > 0.0:
            keep = _dropout_keep_scale((L, L), drop_rate)
            pd = p * keep
        else:
            keep = None
            pd = p
        # dv = pd^T @ do
        dv = jax.lax.dot_general(
            pd, do, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        # dpd = do @ v^T
        dpd = jax.lax.dot_general(
            do, v, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        dp = dpd * keep if keep is not None else dpd
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        dq = jnp.dot(ds, k, preferred_element_type=jnp.float32) * scale
        dk = jax.lax.dot_general(
            ds, q, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        dq_ref[0, h] = dq.astype(dq_ref.dtype)
        dk_ref[0, h] = dk.astype(dk_ref.dtype)
        dv_ref[0, h] = dv.astype(dv_ref.dtype)


def _bwd_kernel_blhd(mode_ref, te_ref, seed_ref, q_ref, k_ref, v_ref,
                     colkeep_ref, do_ref, dq_ref, dk_ref, dv_ref,
                     *, prefix: int, drop_rate: float, scale: float, H: int,
                     L: int, E: int):
    """[B,L,H*D] backward, E examples per grid step (see
    _fwd_kernel_blhd)."""
    D = q_ref.shape[1] // H
    blk = pl.program_id(0)
    for e in range(E):
        b = blk * E + e
        rows = slice(None) if E == 1 else slice(e * L, (e + 1) * L)
        bias = _mask_bias(mode_ref[b], te_ref[b], colkeep_ref[b, :],
                          prefix, L)
        if drop_rate > 0.0:
            pltpu.prng_seed(seed_ref[b])  # same stream as _fwd_kernel_blhd
        for h in range(H):
            cols = slice(h * D, (h + 1) * D)
            q = q_ref[rows, cols].astype(jnp.float32)
            k = k_ref[rows, cols].astype(jnp.float32)
            v = v_ref[rows, cols].astype(jnp.float32)
            do = do_ref[rows, cols].astype(jnp.float32)
            s = jax.lax.dot_general(
                q, k, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale + bias
            p = _softmax_probs(s)
            if drop_rate > 0.0:
                keep = _dropout_keep_scale((L, L), drop_rate)
                pd = p * keep
            else:
                keep = None
                pd = p
            dv = jax.lax.dot_general(
                pd, do, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dpd = jax.lax.dot_general(
                do, v, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            dp = dpd * keep if keep is not None else dpd
            ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
            dq = jnp.dot(ds, k, preferred_element_type=jnp.float32) * scale
            dk = jax.lax.dot_general(
                ds, q, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            dq_ref[rows, cols] = dq.astype(dq_ref.dtype)
            dk_ref[rows, cols] = dk.astype(dk_ref.dtype)
            dv_ref[rows, cols] = dv.astype(dv_ref.dtype)


def _interpret() -> bool:
    # Pallas compiles natively on TPU; elsewhere (CPU tests) run interpreted.
    return jax.default_backend() != "tpu"


def _qkv_spec(shape3):
    # index map receives (grid idx, *scalar_prefetch_refs)
    return pl.BlockSpec((1,) + tuple(shape3), lambda b, *_: (b, 0, 0, 0),
                        memory_space=pltpu.VMEM)


def _row_spec(L, HD):
    # squeezed per-example block of a [B, L, H*D] array: 2-D [L, H*D] ref
    return pl.BlockSpec((None, L, HD), lambda b, *_: (b, 0, 0),
                        memory_space=pltpu.VMEM)


_BLHD_E_OVERRIDE = None  # bench hook: force examples-per-grid-step


def _blhd_block_examples(B: int) -> int:
    """Examples per grid step for the blhd kernels.

    Default 1: unlike the decode kernel (10-row blocks, where E=4 example
    blocking bought 27%), the training kernel's [128, 768] per-example
    blocks already saturate the grid pipeline — measured on v5e
    (tools/bench_attn_block.py, interleaved best-of-4): E=1 1339, E=2
    1293, E=4 1310 samples/sec/chip; E=8 OOMs the 16MB scoped-vmem stack
    in the backward.  The machinery stays for experiments via the
    override."""
    if _BLHD_E_OVERRIDE is not None and B % _BLHD_E_OVERRIDE == 0:
        return _BLHD_E_OVERRIDE
    return 1


def _pallas_fwd(q, k, v, mode, text_end, colkeep, seed, prefix, drop_rate,
                blhd):
    B = q.shape[0]
    D = q.shape[-1]
    scale = 1.0 / math.sqrt(D)
    if blhd:
        L, H = q.shape[1], q.shape[2]
        HD = H * D
        E = _blhd_block_examples(B)
        nblk = B // E
        q, k, v = (x.reshape(nblk, E * L, HD) for x in (q, k, v))  # bitcasts
        kernel = functools.partial(_fwd_kernel_blhd, prefix=prefix,
                                   drop_rate=drop_rate, scale=scale, H=H,
                                   L=L, E=E)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,  # mode, text_end, seed
            grid=(nblk,),
            in_specs=[
                _row_spec(E * L, HD), _row_spec(E * L, HD),
                _row_spec(E * L, HD),
                pl.BlockSpec(memory_space=pltpu.VMEM),  # colkeep [B, L]
            ],
            out_specs=_row_spec(E * L, HD),
        )
        out = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((nblk, E * L, HD), q.dtype),
            interpret=_interpret(),
        )(mode, text_end, seed, q, k, v, colkeep)
        return out.reshape(B, L, H, D)
    H, L = q.shape[1], q.shape[2]
    kernel = functools.partial(_fwd_kernel, prefix=prefix,
                               drop_rate=drop_rate, scale=scale)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,  # mode, text_end, seed
        grid=(B,),
        in_specs=[
            _qkv_spec((H, L, D)), _qkv_spec((H, L, D)), _qkv_spec((H, L, D)),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # colkeep [B, L]
        ],
        out_specs=_qkv_spec((H, L, D)),
    )
    # scalar-prefetch index maps receive the scalar refs as trailing args;
    # block index maps above ignore them via *_
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        interpret=_interpret(),
    )(mode, text_end, seed, q, k, v, colkeep)


def _pallas_bwd_call(q, k, v, mode, text_end, colkeep, seed, do, prefix,
                     drop_rate, blhd):
    B = q.shape[0]
    D = q.shape[-1]
    scale = 1.0 / math.sqrt(D)
    if blhd:
        L, H = q.shape[1], q.shape[2]
        HD = H * D
        E = _blhd_block_examples(B)
        nblk = B // E
        q, k, v, do = (x.reshape(nblk, E * L, HD) for x in (q, k, v, do))
        kernel = functools.partial(_bwd_kernel_blhd, prefix=prefix,
                                   drop_rate=drop_rate, scale=scale, H=H,
                                   L=L, E=E)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(nblk,),
            in_specs=[
                _row_spec(E * L, HD), _row_spec(E * L, HD),
                _row_spec(E * L, HD),
                pl.BlockSpec(memory_space=pltpu.VMEM),  # colkeep [B, L]
                _row_spec(E * L, HD),
            ],
            out_specs=(_row_spec(E * L, HD), _row_spec(E * L, HD),
                       _row_spec(E * L, HD)),
        )
        dq, dk, dv = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=(jax.ShapeDtypeStruct((nblk, E * L, HD), q.dtype),
                       jax.ShapeDtypeStruct((nblk, E * L, HD), q.dtype),
                       jax.ShapeDtypeStruct((nblk, E * L, HD), q.dtype)),
            interpret=_interpret(),
        )(mode, text_end, seed, q, k, v, colkeep, do)
        return (dq.reshape(B, L, H, D), dk.reshape(B, L, H, D),
                dv.reshape(B, L, H, D))
    H, L = q.shape[1], q.shape[2]
    kernel = functools.partial(_bwd_kernel, prefix=prefix,
                               drop_rate=drop_rate, scale=scale)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B,),
        in_specs=[
            _qkv_spec((H, L, D)), _qkv_spec((H, L, D)), _qkv_spec((H, L, D)),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # colkeep [B, L]
            _qkv_spec((H, L, D)),
        ],
        out_specs=(_qkv_spec((H, L, D)), _qkv_spec((H, L, D)),
                   _qkv_spec((H, L, D))),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct(q.shape, q.dtype),
                   jax.ShapeDtypeStruct(q.shape, q.dtype),
                   jax.ShapeDtypeStruct(q.shape, q.dtype)),
        interpret=_interpret(),
    )(mode, text_end, seed, q, k, v, colkeep, do)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _fused_attention(static: Tuple[int, float, bool], q, k, v, mode, text_end,
                     colkeep, seed):
    prefix, drop_rate, blhd = static
    return _pallas_fwd(q, k, v, mode, text_end, colkeep, seed, prefix,
                       drop_rate, blhd)


def _fused_fwd(static, q, k, v, mode, text_end, colkeep, seed):
    out = _fused_attention(static, q, k, v, mode, text_end, colkeep, seed)
    return out, (q, k, v, mode, text_end, colkeep, seed)


def _fused_bwd(static, res, do):
    prefix, drop_rate, blhd = static
    q, k, v, mode, text_end, colkeep, seed = res
    dq, dk, dv = _pallas_bwd_call(q, k, v, mode, text_end, colkeep, seed, do,
                                  prefix, drop_rate, blhd)

    def _f0(x):
        return np.zeros(x.shape, dtype=jax.dtypes.float0)

    return (dq, dk, dv, _f0(mode), _f0(text_end),
            jnp.zeros_like(colkeep), _f0(seed))


_fused_attention.defvjp(_fused_fwd, _fused_bwd)


def attention_pallas(q, k, v, mode, text_end, colkeep, *, prefix: int,
                     dropout_rate: float = 0.0, dropout_seed=None,
                     layout: str = "bhld"):
    """Fused attention. q/k/v: [B,H,L,D] (``layout="bhld"``) or [B,L,H,D]
    (``layout="blhd"`` — the QKV projections' natural layout, which turns
    the surrounding head transposes into bitcasts; see _fwd_kernel).
    colkeep: float[B,L]; dropout_seed: int32[B] (required when
    dropout_rate > 0).  Output layout matches the input layout."""
    assert layout in ("bhld", "blhd"), layout
    B = q.shape[0]
    if dropout_rate > 0.0 and _interpret():
        # pltpu's PRNG primitives have no CPU lowering even in interpret
        # mode, so off-TPU the dropout-active path routes through
        # attention_xla with the identical mask semantics (the dropout
        # stream is distribution-equivalent, not bit-equal — on TPU the
        # kernel draws from the on-chip hardware PRNG).  Keeps the
        # shard_map+Pallas training configuration runnable on the virtual
        # CPU mesh (tests, driver dryrun).
        from vlp_tpu.ops import masks as mask_ops
        if layout == "blhd":
            qb, kb, vb = (x.transpose(0, 2, 1, 3) for x in (q, k, v))
        else:
            qb, kb, vb = q, k, v
        L = qb.shape[2]
        vis_keep = colkeep[:, 1:prefix - 1]
        bias = mask_ops.attention_bias(mode.astype(jnp.int32),
                                       text_end.astype(jnp.int32),
                                       vis_keep, prefix, L)
        seed_scalar = (jnp.sum(dropout_seed.astype(jnp.int32))
                       if dropout_seed is not None else 0)
        out = attention_xla(qb, kb, vb, bias, dropout_rate=dropout_rate,
                            dropout_rng=jax.random.PRNGKey(seed_scalar))
        return out.transpose(0, 2, 1, 3) if layout == "blhd" else out
    if dropout_seed is None:
        dropout_seed = jnp.zeros((B,), jnp.int32)
    return _fused_attention((prefix, float(dropout_rate), layout == "blhd"),
                            q, k, v,
                            mode.astype(jnp.int32), text_end.astype(jnp.int32),
                            colkeep, dropout_seed.astype(jnp.int32))


def colkeep_from_vis_keep(vis_keep: jnp.ndarray, seq_len: int) -> jnp.ndarray:
    """Expand float[B, nv] region-keep into float[B, L] column-keep."""
    B, nv = vis_keep.shape
    colkeep = jnp.ones((B, seq_len), jnp.float32)
    return colkeep.at[:, 1:nv + 1].set(vis_keep)
