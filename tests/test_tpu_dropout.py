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


@requires_tpu
def test_decode_kernel_dropout_rollout_replay_equality():
    """SCST explicit-dropout sampled rollouts on the fused decode kernel
    (on-chip PRNG attention-prob dropout): the teacher-forced dual-block
    replay regenerates the kernel's exact keep/scale bits
    (ops/decode_attention.decode_dropout_scales — same per-example seeds,
    same draw sequence), so the forced log-probs reproduce the rollout's.
    This is the round-5 site-key-contract extension: off-TPU the rollout
    keeps the jax.random XLA path (pltpu.prng has no CPU lowering), which
    tests/test_pipeline.py covers; THIS is the kernel-path twin."""
    import functools

    import jax
    import jax.numpy as jnp

    from vlp_tpu import scst as scst_lib
    from vlp_tpu.config import VLPConfig
    from vlp_tpu.data.example_builder import DecodeExampleBuilder, collate
    from vlp_tpu.data.features import SyntheticFeatureStore
    from vlp_tpu.models import model as model_lib
    from vlp_tpu.models.model import VLPModel
    from vlp_tpu.parallel import train_step as ts

    assert jax.default_backend() == "tpu"
    VOCAB = {w: i for i, w in enumerate(
        ["[PAD]", "[UNK]", "[X_SEP]", "[CLS]", "[SEP]", "[MASK]", "a",
         "man", "dog", "horse", "rides", "runs", "fast"])}
    # TPU-legal tiny model: head_dim 64 (the kernel's per-head column
    # slices must be lane-aligned), real prefix length 102
    cfg = VLPConfig.tiny(
        vocab_size=32, hidden_size=128, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=256,
        len_vis_input=100, max_len_b=5, max_pred=4,
        vis_feat_dim=64, vis_cls_dim=8, vis_pe_dim=14,
        use_pallas_attention=False, use_pallas_decode=True)
    assert model_lib.kernel_decode_dropout(cfg)
    model = VLPModel(cfg)
    params = ts.init_params(model, cfg, jax.random.PRNGKey(0))
    builder = DecodeExampleBuilder(cfg, VOCAB, max_tgt_length=cfg.max_len_b)
    s = SyntheticFeatureStore(num_regions=cfg.len_vis_input,
                              feat_dim=cfg.vis_feat_dim,
                              cls_dim=cfg.vis_pe_dim - 6)
    batch = {k: jnp.asarray(v) for k, v in collate(
        [builder(*s.get(f"i{j}")) for j in range(4)]).items()}
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
    # tolerance is fp32 reassociation between the jitted scan rollout and
    # the unjitted op-by-op replay (measured max 5.4e-5 rel); a single
    # differing keep bit would shift a log-prob by orders more — the exact
    # mask contract is pinned bit-level by
    # test_decode_kernel_dropout_mask_contract below
    np.testing.assert_allclose(np.asarray(forced), np.asarray(lps),
                               rtol=2e-4, atol=2e-5)
    # dropout genuinely active: a different key changes the log-probs
    other = tr._forced_logprobs_fused(params, batch, jnp.asarray(ids),
                                      jax.random.PRNGKey(99))
    assert np.abs(np.asarray(other) - np.asarray(lps)).max() > 1e-4

    # the kernel path genuinely diverges from the XLA draw path (different
    # PRNG streams -> different masks), while each matches ITS OWN replay:
    cfg_x = cfg.replace(decode_dropout_impl="xla")
    model_x = VLPModel(cfg_x)
    tr_x = scst_lib.SCSTTrainer(
        model_x, cfg_x, mask_id=VOCAB["[MASK]"], eos_id=VOCAB["[SEP]"],
        max_tgt_length=cfg_x.max_len_b, replay="fused")
    ids_x, lps_x = jax.jit(functools.partial(
        tr_x.decoder._run_greedy, sample=True, train_mode=True,
        explicit_dropout=True))(params, batch, key)
    forced_x = tr_x._forced_logprobs_fused(params, batch,
                                           jnp.asarray(ids_x), drop_rng)
    np.testing.assert_allclose(np.asarray(forced_x), np.asarray(lps_x),
                               rtol=2e-4, atol=2e-5)
    assert (np.abs(np.asarray(lps_x) - np.asarray(lps)).max() > 1e-4
            or not np.array_equal(np.asarray(ids_x), np.asarray(ids)))


@requires_tpu
def test_decode_kernel_dropout_mask_contract():
    """Bit-level contract: decode_attention(drop_seed=...) must equal an
    XLA emulation of the same math applying the REGENERATED multipliers
    (decode_dropout_scales) — same seeds, same on-chip draw sequence.  If
    regeneration produced even one differing keep bit, the corresponding
    probability would flip between 0 and 1/(1-rate) and the outputs would
    disagree at percent level; agreement at fp-reassociation tolerance
    pins the (head, s, column) coordinate mapping exactly."""
    import jax
    import jax.numpy as jnp

    from vlp_tpu.ops import decode_attention as da

    assert jax.default_backend() == "tpu"
    B, H, D, S, P, G = 4, 2, 64, 2, 102, 8
    HD = H * D
    RATE = 0.3
    gen_len = 3
    r = np.random.default_rng(5)
    q, k, v = (jnp.asarray(r.normal(size=(B, S, HD)).astype(np.float32))
               for _ in range(3))
    pk, pv = (jnp.asarray(r.normal(size=(B, P, HD)).astype(np.float32))
              for _ in range(2))
    gk, gv = (jnp.asarray(r.normal(size=(B, G, HD)).astype(np.float32))
              for _ in range(2))
    seeds = jnp.asarray(r.integers(0, 2 ** 31 - 1, B), jnp.int32)

    ctx_k, gk2, gv2 = da.decode_attention(
        q, k, v, pk, pv, gk, gv, gen_len, n_heads=H,
        drop_seed=seeds, drop_rate=RATE)
    scales = da.decode_dropout_scales(seeds, n_heads=H, S=S, P=P, G=G,
                                      rate=RATE)          # [B, H, S, P+G]

    # XLA emulation (the _incremental_cols math with the multipliers)
    slots = jnp.arange(G)
    gk_new, gv_new = gk, gv
    for s in range(S):
        sel = (slots == gen_len + s)[None, :, None]
        gk_new = jnp.where(sel, k[:, s:s + 1], gk_new)
        gv_new = jnp.where(sel, v[:, s:s + 1], gv_new)
    scale = 1.0 / np.sqrt(D)
    qb = q.reshape(B, S, H, D)
    sp = jnp.einsum("bshd,bjhd->bhsj", qb, pk.reshape(B, P, H, D),
                    preferred_element_type=jnp.float32) * scale
    sg = jnp.einsum("bshd,bjhd->bhsj", qb, gk_new.reshape(B, G, H, D),
                    preferred_element_type=jnp.float32) * scale
    jpos = jnp.arange(G)[None, :]
    spos = gen_len + jnp.arange(S)[:, None]
    gbias = jnp.where(jpos <= spos, 0.0, -1e4)[None, None]
    probs = jax.nn.softmax(jnp.concatenate([sp, sg + gbias], -1), -1)
    probs = probs * scales
    ctx = jnp.einsum("bhsj,bjhd->bshd", probs[..., :P],
                     pv.reshape(B, P, H, D),
                     preferred_element_type=jnp.float32)
    ctx = ctx + jnp.einsum("bhsj,bjhd->bshd", probs[..., P:],
                           gv_new.reshape(B, G, H, D),
                           preferred_element_type=jnp.float32)
    np.testing.assert_allclose(np.asarray(ctx.reshape(B, S, HD)),
                               np.asarray(ctx_k), rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(gk2), np.asarray(gk_new))
    np.testing.assert_array_equal(np.asarray(gv2), np.asarray(gv_new))
    # dropout was genuinely applied (some multipliers are zero)
    sc = np.asarray(scales)
    assert (sc == 0.0).mean() > 0.2 and (sc > 1.0).mean() > 0.5
