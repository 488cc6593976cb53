"""On-chip validation of the Pallas attention-dropout path.

Requires a real TPU (the on-chip PRNG is not available in interpret mode);
skipped in the CPU test environment.  Run manually with:
    python -m pytest tests/test_tpu_dropout.py --no-header -q
after unsetting the conftest CPU force (JAX_REQUIRE_TPU=1).

Checks:
  * keep probability == 1 - rate and the inverted-scale is unbiased
    (guards the int32-vs-uint32 prng_random_bits threshold bug);
  * the forward kernel's dropout mask is exactly reproduced by an external
    debug kernel with the same seed (seed-replay determinism — what the
    custom VJP backward relies on);
  * fwd and grads match an XLA implementation given the same mask.
"""

import functools
import os

import numpy as np
import pytest

requires_tpu = pytest.mark.skipif(
    os.environ.get("JAX_REQUIRE_TPU") != "1",
    reason="real-TPU test; set JAX_REQUIRE_TPU=1 (conftest forces CPU)")


@requires_tpu
def test_dropout_keep_probability_and_parity():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from vlp_tpu.ops import attention as attn_ops
    from vlp_tpu.ops.masks import attention_bias

    assert jax.default_backend() == "tpu"
    B, H, L, D = 2, 3, 128, 128
    prefix, RATE = 8, 0.3
    rng = np.random.default_rng(0)
    q, k, v = (jnp.asarray(rng.normal(size=(B, H, L, D)).astype(np.float32))
               for _ in range(3))
    mode = jnp.asarray([1, 0], jnp.int32)
    text_end = jnp.asarray([20, 15], jnp.int32)
    vis_keep = jnp.ones((B, prefix - 2), jnp.float32)
    colkeep = attn_ops.colkeep_from_vis_keep(vis_keep, L)
    seed = jnp.asarray([1234, 77], jnp.int32)

    def mask_kernel(seed_ref, out_ref, *, drop_rate, H, L):
        b = pl.program_id(0)
        pltpu.prng_seed(seed_ref[b])
        for h in range(H):
            out_ref[0, h] = attn_ops._dropout_keep_scale((L, L), drop_rate)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(B,), in_specs=[],
        out_specs=pl.BlockSpec((1, H, L, L), lambda b, *_: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM))
    keep = pl.pallas_call(
        functools.partial(mask_kernel, drop_rate=RATE, H=H, L=L),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, H, L, L), jnp.float32))(seed)

    frac = float(np.asarray(keep).astype(bool).mean())
    assert abs(frac - (1 - RATE)) < 0.01, frac
    assert abs(float(np.asarray(keep).mean()) - 1.0) < 0.01

    import math
    bias = attention_bias(mode, text_end, vis_keep, prefix, L)

    def xla_with_mask(q, k, v):
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                       preferred_element_type=jnp.float32)
        s = s / math.sqrt(D) + bias
        p = jax.nn.softmax(s.astype(jnp.float32), axis=-1) * keep
        return jnp.einsum("bhqk,bhkd->bhqd", p.astype(q.dtype), v,
                          preferred_element_type=jnp.float32).astype(q.dtype)

    def pallas_f(q, k, v):
        return attn_ops.attention_pallas(
            q, k, v, mode, text_end, colkeep, prefix=prefix,
            dropout_rate=RATE, dropout_seed=seed)

    np.testing.assert_array_equal(np.asarray(pallas_f(q, k, v)),
                                  np.asarray(xla_with_mask(q, k, v)))
    co = jnp.asarray(rng.normal(size=(B, H, L, D)).astype(np.float32))
    gp = jax.grad(lambda *a: jnp.sum(pallas_f(*a) * co),
                  argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(lambda *a: jnp.sum(xla_with_mask(*a) * co),
                  argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-2, atol=2e-2)

    # ---- blhd (the production layout): same keep mask as bhld (both seed
    # per example and draw H sequential (L,L) masks), same fwd values,
    # grads consistent with the shared mask ------------------------------
    def pallas_blhd(q, k, v):
        out = attn_ops.attention_pallas(
            q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
            v.transpose(0, 2, 1, 3), mode, text_end, colkeep, prefix=prefix,
            dropout_rate=RATE, dropout_seed=seed, layout="blhd")
        return out.transpose(0, 2, 1, 3)

    np.testing.assert_array_equal(np.asarray(pallas_blhd(q, k, v)),
                                  np.asarray(xla_with_mask(q, k, v)))
    gb = jax.grad(lambda *a: jnp.sum(pallas_blhd(*a) * co),
                  argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gb, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-2, atol=2e-2)
