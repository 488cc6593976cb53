"""The unified VLP transformer, TPU-native (Flax/JAX).

Re-implements the capabilities of the reference model stack
(/root/reference/pytorch_pretrained_bert/modeling.py):
  * multimodal embeddings with the 100-region splice   (modeling.py:195-241)
  * 12-layer post-LN BERT encoder                      (modeling.py:244-402)
  * pooler                                             (modeling.py:405-417)
  * tied MLM head with relax-projection task select    (modeling.py:420-482)
  * region-feature / geometry projections              (modeling.py:1002-1018)
  * pretraining losses: masked-LM (+label smoothing, drop-worst), Selfie-like
    region pretext, VQA2 BCE                           (modeling.py:1033-1143)
  * incremental (KV-cached) encoder for generation     (modeling.py:268-277,
    375-402) — here a preallocated cache updated by dynamic_update_slice
    instead of ragged python lists.

TPU-first design notes:
  * activations in bfloat16 (cfg.dtype), parameters/optimizer fp32, layer norm
    and softmax in fp32;
  * attention runs the fused Pallas kernel (vlp_tpu/ops/attention.py) on TPU,
    with the structural mask computed from metadata — never a host-built
    B x L x L tensor;
  * everything is shape-static and jit-compatible; the region splice is a
    concatenation, not an in-place write.
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from vlp_tpu.config import MODE_S2S, VLPConfig
from vlp_tpu.ops import attention as attn_ops
from vlp_tpu.ops import decode_attention as decode_attn_ops
from vlp_tpu.ops import masks as mask_ops
from vlp_tpu.ops import tp as tp_ops

Array = jnp.ndarray

_dense_init = nn.initializers.normal(stddev=0.02)
_embed_init = nn.initializers.normal(stddev=0.02)


def gelu_exact(x: Array) -> Array:
    """erf-based gelu (modeling.py:62-67)."""
    return (x * 0.5 * (1.0 + jax.lax.erf(x.astype(jnp.float32) / math.sqrt(2.0)))
            ).astype(x.dtype)


ACT = {"gelu": gelu_exact, "relu": nn.relu,
       "swish": lambda x: x * nn.sigmoid(x)}


def explicit_dropout(x: Array, key, rate: float) -> Array:
    """Dropout from a CALLER-supplied key (flax ``nn.Dropout`` numerics:
    bernoulli keep mask, kept entries scaled by 1/keep).

    The SCST fused-replay path uses this in BOTH the sampled rollout's
    incremental steps and the teacher-forced dual-block replay so the two
    draw IDENTICAL masks from identical (key, shape) pairs — flax
    ``make_rng`` folds the module path and a per-apply call count into the
    key, which a one-pass replay cannot reproduce.  Site-key scheme (shared
    contract with ``_scst_replay_drop`` below): step key ``k_t =
    fold_in(drop_rng, t+1)``; embeddings site ``fold_in(k_t, 0)``; layer
    ``l`` base ``fold_in(k_t, 1+l)`` with attention-probs/attn-out/ffn-out
    at folds 0/1/2 of the base."""
    if rate == 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, x.shape)
    return jnp.where(mask, x / keep, jnp.zeros_like(x))


def kernel_decode_dropout(cfg: VLPConfig) -> bool:
    """True when SCST sampled rollouts apply attention-prob dropout inside
    the fused decode kernel (on-chip PRNG).  The rollout
    (TransformerLayer.incremental_split) and the replay mask regeneration
    (VLPModel._scst_replay_drop) MUST evaluate this identically — both call
    this one predicate, which is trace-time constant within a process."""
    return (cfg.pallas_decode and cfg.decode_dropout_impl != "xla"
            and decode_attn_ops.kernel_dropout_available())


def masked_dropout(x: Array, mask: Array, rate: float) -> Array:
    """Apply a PRE-DRAWN keep mask with flax Dropout's scaling — the replay
    side of the explicit-dropout contract (masks assembled by
    ``_scst_replay_drop`` from the rollout's per-step draws)."""
    if rate == 0.0:
        return x
    return jnp.where(mask, x / (1.0 - rate), jnp.zeros_like(x))


def _layer_norm(cfg: VLPConfig, name: str) -> nn.LayerNorm:
    # fp32 layer norm regardless of activation dtype (eps matches reference 1e-5)
    return nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                        param_dtype=jnp.float32, name=name)


def _dense(features: int, cfg: VLPConfig, name: str) -> nn.Dense:
    return nn.Dense(features, dtype=jnp.dtype(cfg.dtype),
                    param_dtype=jnp.float32, kernel_init=_dense_init,
                    name=name)


class Embeddings(nn.Module):
    """Word + position + type embeddings with the region splice
    (modeling.py:217-241)."""
    cfg: VLPConfig

    def setup(self):
        cfg = self.cfg
        self.word_embeddings = nn.Embed(
            cfg.vocab_size, cfg.hidden_size, embedding_init=_embed_init,
            dtype=jnp.dtype(cfg.dtype), param_dtype=jnp.float32,
            name="word_embeddings")
        self.position_embeddings = nn.Embed(
            cfg.max_position_embeddings, cfg.hidden_size,
            embedding_init=_embed_init, dtype=jnp.dtype(cfg.dtype),
            param_dtype=jnp.float32, name="position_embeddings")
        self.token_type_embeddings = nn.Embed(
            cfg.type_vocab_size, cfg.hidden_size, embedding_init=_embed_init,
            dtype=jnp.dtype(cfg.dtype), param_dtype=jnp.float32,
            name="token_type_embeddings")
        self.ln = _layer_norm(self.cfg, "LayerNorm")
        self.dropout = nn.Dropout(self.cfg.hidden_dropout_prob)

    def __call__(self, input_ids: Array, segment_ids: Array,
                 position_ids: Array, vis_feats: Optional[Array],
                 vis_pe: Optional[Array], deterministic: bool) -> Array:
        cfg = self.cfg
        words = self.word_embeddings(input_ids)
        pos = self.position_embeddings(position_ids)
        if vis_feats is not None:
            nv = cfg.len_vis_input
            # splice projected region features / geometry into slots 1..nv
            words = jnp.concatenate(
                [words[:, :1], vis_feats.astype(words.dtype),
                 words[:, nv + 1:]], axis=1)
            pos = jnp.concatenate(
                [pos[:, :1], vis_pe.astype(pos.dtype), pos[:, nv + 1:]],
                axis=1)
        types = self.token_type_embeddings(segment_ids)
        x = words + pos + types
        x = self.ln(x).astype(jnp.dtype(cfg.dtype))
        return self.dropout(x, deterministic=deterministic)


class TransformerLayer(nn.Module):
    """Post-LN BERT block (modeling.py:360-372)."""
    cfg: VLPConfig

    def setup(self):
        cfg = self.cfg
        H = cfg.hidden_size
        self.q_proj = _dense(H, cfg, "q_proj")
        self.k_proj = _dense(H, cfg, "k_proj")
        self.v_proj = _dense(H, cfg, "v_proj")
        self.out_proj = _dense(H, cfg, "out_proj")
        self.attn_ln = _layer_norm(cfg, "attn_ln")
        self.ffn_in = _dense(cfg.intermediate_size, cfg, "ffn_in")
        self.ffn_out = _dense(H, cfg, "ffn_out")
        self.ffn_ln = _layer_norm(cfg, "ffn_ln")
        self.dropout = nn.Dropout(cfg.hidden_dropout_prob)
        self.attn_dropout = nn.Dropout(cfg.attention_probs_dropout_prob)
        self.act = ACT[cfg.hidden_act]

    def _heads(self, x: Array) -> Array:
        # head count derived from the projection width, not cfg: under
        # shard_map tensor parallelism (cfg.tp_axis) each shard holds
        # num_attention_heads / tp heads and the kernels are the local
        # column shards
        B, L, HD = x.shape
        D = self.cfg.head_dim
        return x.reshape(B, L, HD // D, D).transpose(0, 2, 1, 3)  # [B,H,L,D]

    def _merge(self, x: Array) -> Array:
        B, H, L, D = x.shape
        return x.transpose(0, 2, 1, 3).reshape(B, L, H * D)

    def _attn_seed(self, B: int, rate: float):
        """Per-example int32 seeds for the kernel's on-chip PRNG dropout
        (None when dropout is off)."""
        if rate <= 0.0:
            return None
        key = self.make_rng("dropout")
        if self.cfg.tp_axis is not None:
            # distinct in-kernel dropout streams per head shard; the
            # hidden-dropout streams must stay IDENTICAL across the model
            # axis (they mask replicated activations), so only the
            # attention-kernel seeds fold the axis index
            key = jax.random.fold_in(key,
                                     jax.lax.axis_index(self.cfg.tp_axis))
        return jax.random.randint(key, (B,), 0, 2 ** 31 - 1)

    def _col_parallel(self, dense: nn.Dense, x: Array) -> Array:
        """Column-parallel matmul under shard_map TP: the kernel/bias the
        scope holds are the local output-column shards, which plain Dense
        rejects (apply-time shape validation against ``features``); the
        manual dot accepts any width.  Input must already be wrapped by
        ``_branch``.  Plain Dense when TP is off or at init."""
        if self.cfg.tp_axis is None or self.is_initializing():
            return dense(x)
        kern = dense.variables["params"]["kernel"].astype(x.dtype)
        b = dense.variables["params"]["bias"].astype(x.dtype)
        return jnp.dot(x, kern) + b

    def _row_parallel(self, dense: nn.Dense, x: Array) -> Array:
        """Row-parallel matmul under shard_map TP: local partial product,
        psum over the model axis (Megatron "g", ops/tp.py), bias added once
        AFTER the reduction (the plain Dense would add its bias per shard
        and the psum would multiply it by tp).  Plain Dense when TP is off
        or at init (kernel variables don't exist yet; init always runs on
        full shapes outside the mesh)."""
        axis = self.cfg.tp_axis
        if axis is None or self.is_initializing():
            return dense(x)
        kern = dense.variables["params"]["kernel"].astype(x.dtype)
        b = dense.variables["params"]["bias"].astype(x.dtype)
        return tp_ops.sum_partial(jnp.dot(x, kern), axis) + b

    def _branch(self, x: Array) -> Array:
        """Mark a replicated activation entering a column-parallel branch
        (Megatron "f"): identity forward, psum of cotangents backward, so
        gradients of everything upstream stay exact under TP."""
        if self.cfg.tp_axis is None:
            return x
        return tp_ops.replicate_for_branch(x, self.cfg.tp_axis)

    def _post_attention(self, ctx: Array, residual: Array,
                        deterministic: bool, dropout_key=None,
                        drop_masks=None) -> Array:
        """Output projection + FFN.  Three dropout modes: flax rng (default),
        explicit per-site keys (``dropout_key`` = the layer base key,
        attn-out/ffn-out at folds 1/2 — the SCST explicit rollout), or
        pre-drawn keep masks (``drop_masks`` = (attn_out, ffn_out) — the
        SCST dual-block replay)."""
        rate = self.cfg.hidden_dropout_prob

        def hdrop(y, idx):
            if drop_masks is not None:
                return masked_dropout(y, drop_masks[idx], rate)
            if dropout_key is not None:
                return explicit_dropout(
                    y, jax.random.fold_in(dropout_key, idx + 1), rate)
            return self.dropout(y, deterministic=deterministic)

        h = hdrop(self._row_parallel(self.out_proj, ctx), 0)
        h = self.attn_ln(h + residual).astype(ctx.dtype)
        f = hdrop(self._row_parallel(self.ffn_out, self.act(
            self._col_parallel(self.ffn_in, self._branch(h)))), 1)
        return self.ffn_ln(f + h).astype(ctx.dtype)

    def __call__(self, x: Array, mode: Array, text_end: Array,
                 colkeep: Array, bias: Optional[Array],
                 deterministic: bool) -> Array:
        """Full-sequence attention (training / single-shot encode).

        ``bias`` (additive [B,1,L,L]) is used by the XLA path; the Pallas path
        rebuilds the mask from metadata in-register.
        """
        cfg = self.cfg
        rate = cfg.attention_probs_dropout_prob if not deterministic else 0.0
        xb = self._branch(x)  # no-op unless shard_map TP is active
        if cfg.use_pallas_attention:
            # [B,L,H,D] straight off the projections (reshape = bitcast):
            # the kernel loops heads internally, so the [B,H,L,D] transpose
            # — one physical copy per q/k/v/out and per backward tensor per
            # layer, ~15% of the pretraining step — never materialises.
            B, L, _ = x.shape
            if cfg.fuse_qkv_proj and not self.is_initializing():
                # one [768, 3*768] matmul instead of three: reads x once.
                # Block-column dot == three separate dots bitwise (same
                # per-column reduction order); the concat reads the fp32
                # kernels once per step — params/grad tree unchanged, so
                # checkpoint interop is unaffected.
                dt = jnp.dtype(cfg.dtype)
                kern = jnp.concatenate(
                    [self.q_proj.variables["params"]["kernel"],
                     self.k_proj.variables["params"]["kernel"],
                     self.v_proj.variables["params"]["kernel"]],
                    axis=1).astype(dt)
                bias3 = jnp.concatenate(
                    [self.q_proj.variables["params"]["bias"],
                     self.k_proj.variables["params"]["bias"],
                     self.v_proj.variables["params"]["bias"]]).astype(dt)
                qkv = jnp.dot(xb.astype(dt), kern) + bias3
                w = kern.shape[1] // 3  # local width (= hidden/tp under TP)
                hd = (w // cfg.head_dim, cfg.head_dim)
                q, k, v = (qkv[..., i * w:(i + 1) * w].reshape(B, L, *hd)
                           for i in range(3))
            else:
                q = self._col_parallel(self.q_proj, xb)
                hd = (q.shape[-1] // cfg.head_dim, cfg.head_dim)
                q = q.reshape(B, L, *hd)
                k = self._col_parallel(self.k_proj, xb).reshape(B, L, *hd)
                v = self._col_parallel(self.v_proj, xb).reshape(B, L, *hd)
            ctx = attn_ops.attention_pallas(
                q, k, v, mode, text_end, colkeep, prefix=cfg.prefix_len,
                dropout_rate=rate,
                dropout_seed=self._attn_seed(B, rate), layout="blhd")
            ctx = ctx.reshape(B, L, hd[0] * hd[1])
        else:
            q = self._heads(self._col_parallel(self.q_proj, xb))
            k = self._heads(self._col_parallel(self.k_proj, xb))
            v = self._heads(self._col_parallel(self.v_proj, xb))
            rng = self.make_rng("dropout") if rate > 0.0 else None
            if rng is not None and cfg.tp_axis is not None:
                # distinct attention-dropout streams per head shard (the
                # [B,H_local,L,L] mask covers different heads on each model
                # shard), mirroring the Pallas path's _attn_seed fold
                rng = jax.random.fold_in(
                    rng, jax.lax.axis_index(cfg.tp_axis))
            ctx = self._merge(attn_ops.attention_xla(
                q, k, v, bias, dropout_rate=rate, dropout_rng=rng))
        return self._post_attention(ctx, x, deterministic)

    def prefill_attend(self, x: Array, prefix: int,
                       deterministic: bool = True
                       ) -> Tuple[Array, Array, Array]:
        """Prompt-window attention without a cache: ``x`` is [B, P+1, H]
        (prompt + [MASK] probe) at absolute positions 0..P.  Returns
        (layer_out, k, v) — k/v ARE the cache content (no zeros-buffer
        dynamic_update_slice copy; profiled at ~24 full-buffer copies per
        prefill with the cache-based path)."""
        cfg = self.cfg
        B, L, _ = x.shape
        rate = (cfg.attention_probs_dropout_prob
                if not deterministic else 0.0)
        qc = self.q_proj(x)               # [B,L,H*D] (cache-natural layout)
        kc = self.k_proj(x)
        vc = self.v_proj(x)
        # The decode-time visibility (prompt bidirectional, probe causal —
        # seq2seq_loader.py:423-429) is EXACTLY the training kernel's s2s
        # mask with text_end = L and prefix = prompt length, so the fused
        # kernel serves prefill too (in the blhd layout: no head transpose).
        if cfg.use_pallas_attention:
            hd = (cfg.num_attention_heads, cfg.head_dim)
            ctx = attn_ops.attention_pallas(
                qc.reshape(B, L, *hd), kc.reshape(B, L, *hd),
                vc.reshape(B, L, *hd),
                jnp.full((B,), MODE_S2S, jnp.int32),
                jnp.full((B,), L, jnp.int32),
                jnp.ones((B, L), jnp.float32), prefix=prefix,
                dropout_rate=rate,
                dropout_seed=self._attn_seed(B, rate), layout="blhd")
            ctx = ctx.reshape(B, L, cfg.hidden_size)
        else:
            q, k, v = (self._heads(c) for c in (qc, kc, vc))  # [B,Hh,L,D]
            i = jnp.arange(L)[:, None]
            j = jnp.arange(L)[None, :]
            bias = jnp.where((j < prefix) | (j <= i), 0.0,
                             mask_ops.NEG_INF)[None, None]
            scores = jnp.einsum("bhsd,bhjd->bhsj", q, k,
                                preferred_element_type=jnp.float32)
            scores = scores / math.sqrt(cfg.head_dim) + bias
            probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
            probs = self.attn_dropout(probs, deterministic=deterministic)
            ctx = self._merge(jnp.einsum(
                "bhsj,bhjd->bhsd", probs.astype(x.dtype), v,
                preferred_element_type=jnp.float32).astype(x.dtype))
        out = self._post_attention(ctx, x, deterministic=deterministic)
        if cfg.pallas_decode:
            # column-layout caches [B, prefix, H*D] for the decode kernel —
            # the projections' literal output, no head transpose anywhere
            return out, kc[:, :prefix], vc[:, :prefix]
        kh = self._heads(kc)
        vh = self._heads(vc)
        return out, kh[:, :, :prefix], vh[:, :, :prefix]

    def incremental_split(self, x: Array, pk: Array, pv: Array, gk: Array,
                          gv: Array, gen_len,
                          deterministic: bool = True,
                          beam_bias: Optional[Array] = None,
                          dropout_key=None
                          ) -> Tuple[Array, Array, Array]:
        """KV-cached step over a split cache (TPU-first decode layout).

        Two implementations behind ``cfg.pallas_decode``:

          * kernel path (default on TPU): caches live in the projections'
            column layout (pk/pv [B, P, H*D], gk/gv [B*K, G, H*D]) and the
            whole attention middle — slot write, prompt+gen scores, joint
            softmax, context — is ONE fused Pallas call per layer
            (ops/decode_attention.py).  Deterministic only.
          * XLA path (``_incremental_bhpd`` below): head-major caches,
            reference einsum semantics, supports attention-prob dropout
            (SCST sampled rollouts).
          * column-layout XLA path (``_incremental_cols``): the same math
            directly on the kernel-layout caches — used when the kernel
            layout is active but dropout is requested (SCST rollouts with
            pallas_decode).  Round 3 transposed every cache through the
            head-major path per step per layer; this keeps heads as a
            reshape of the trailing dim, so no transpose materialises.
        """
        cfg = self.cfg
        if dropout_key is not None:
            # SCST explicit-dropout rollout (fused-replay contract): the
            # layer draws its masks from caller-visible keys so the
            # dual-block replay can re-draw them (see explicit_dropout)
            assert beam_bias is None, \
                "explicit dropout is for sampled rollouts, not beam search"
            # unlike the flax paths' _attn_seed/fold, these keys do NOT
            # fold the model-axis index — SCST runs data-parallel only
            assert cfg.tp_axis is None, \
                "explicit dropout does not compose with shard_map TP"
            rate = cfg.attention_probs_dropout_prob
            if (cfg.pallas_decode and rate > 0.0
                    and kernel_decode_dropout(cfg)):
                # fused kernel with on-chip PRNG dropout: seeds derived
                # from the same site key the XLA path folds (fold 0); the
                # dual-block replay regenerates the kernel's exact bits
                # (decode_attn_ops.decode_dropout_scales)
                B = pk.shape[0]
                assert x.shape[0] == B, "sampled rollouts have K == 1"
                seeds = decode_attn_ops.dropout_seeds(
                    jax.random.fold_in(dropout_key, 0), B)
                q = self.q_proj(x)
                k = self.k_proj(x)
                v = self.v_proj(x)
                ctx, gk, gv = decode_attn_ops.decode_attention(
                    q, k, v, pk, pv, gk, gv, gen_len,
                    n_heads=cfg.num_attention_heads, drop_seed=seeds,
                    drop_rate=rate)
                out = self._post_attention(ctx, x, deterministic=True,
                                           dropout_key=dropout_key)
                return out, gk, gv
            impl = (self._incremental_cols if cfg.pallas_decode
                    else self._incremental_bhpd)
            return impl(x, pk, pv, gk, gv, gen_len, deterministic=True,
                        dropout_key=dropout_key)
        if not cfg.pallas_decode:
            assert beam_bias is None, \
                "fused beam reorder requires the decode kernel path"
            return self._incremental_bhpd(x, pk, pv, gk, gv, gen_len,
                                          deterministic)
        if deterministic:
            q = self.q_proj(x)            # [B*K, S, H*D], cache layout
            k = self.k_proj(x)
            v = self.v_proj(x)
            ctx, gk, gv = decode_attn_ops.decode_attention(
                q, k, v, pk, pv, gk, gv, gen_len,
                n_heads=cfg.num_attention_heads, beam_bias=beam_bias)
            out = self._post_attention(ctx, x, deterministic=deterministic)
            return out, gk, gv
        assert beam_bias is None, \
            "fused beam reorder is deterministic-only (beam search)"
        return self._incremental_cols(x, pk, pv, gk, gv, gen_len,
                                      deterministic)

    def _incremental_cols(self, x: Array, pk: Array, pv: Array, gk: Array,
                          gv: Array, gen_len,
                          deterministic: bool = True,
                          dropout_key=None
                          ) -> Tuple[Array, Array, Array]:
        """KV-cached step on COLUMN-layout caches (pk/pv [B, P, H*D],
        gk/gv [B*K, G, H*D]) with attention-prob dropout support.

        Same attention math as ``_incremental_bhpd`` (dropout mask shape
        [B, K, Hh, S, P+G] is identical, so a given rng draws the same
        mask), but heads stay a reshape of the trailing dim: the caches are
        never transposed.  This is the SCST sampled-rollout fast path when
        ``cfg.pallas_decode`` is active — the deterministic kernel cannot
        apply dropout (ops/decode_attention.py), and round 3's fallback
        round-tripped [*, H*D] -> [*, H, G, D] -> [*, H*D] per step per
        layer (reference workload: 3 hr/epoch of SCST rollouts,
        README.md:96)."""
        cfg = self.cfg
        B, P = pk.shape[0], pk.shape[1]
        BK, S, _ = x.shape
        K = BK // B
        D = cfg.head_dim
        HD = pk.shape[-1]
        Hh = HD // D                       # kernel width under TP too
        q = self.q_proj(x)                 # [B*K, S, H*D]
        k = self.k_proj(x)
        v = self.v_proj(x)
        G = gk.shape[1]
        slots = jnp.arange(G)
        for s in range(S):
            sel = (slots == gen_len + s)[None, :, None]
            gk = jnp.where(sel, k[:, s:s + 1].astype(gk.dtype), gk)
            gv = jnp.where(sel, v[:, s:s + 1].astype(gv.dtype), gv)
        scale = 1.0 / math.sqrt(D)
        qb = q.reshape(B, K, S, Hh, D)
        sp = jnp.einsum("bkshd,bjhd->bkhsj", qb, pk.reshape(B, P, Hh, D),
                        preferred_element_type=jnp.float32) * scale
        sg = jnp.einsum("bkshd,bkjhd->bkhsj", qb,
                        gk.reshape(B, K, G, Hh, D),
                        preferred_element_type=jnp.float32) * scale
        jpos = jnp.arange(G)[None, :]
        spos = gen_len + jnp.arange(S)[:, None]
        gbias = jnp.where(jpos <= spos, 0.0,
                          mask_ops.NEG_INF)[None, None, None]
        scores = jnp.concatenate([sp, sg + gbias], axis=-1)
        probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
        if dropout_key is not None:
            probs = explicit_dropout(
                probs, jax.random.fold_in(dropout_key, 0),
                cfg.attention_probs_dropout_prob)
        else:
            probs = self.attn_dropout(probs, deterministic=deterministic)
        probs = probs.astype(x.dtype)
        ctx = jnp.einsum("bkhsj,bjhd->bkshd", probs[..., :P],
                         pv.reshape(B, P, Hh, D),
                         preferred_element_type=jnp.float32)
        ctx = ctx + jnp.einsum("bkhsj,bkjhd->bkshd", probs[..., P:],
                               gv.reshape(B, K, G, Hh, D),
                               preferred_element_type=jnp.float32)
        ctx = ctx.astype(x.dtype).reshape(BK, S, HD)
        out = self._post_attention(ctx, x, deterministic=deterministic,
                                   dropout_key=dropout_key)
        return out, gk, gv

    def _incremental_bhpd(self, x: Array, pk: Array, pv: Array, gk: Array,
                          gv: Array, gen_len,
                          deterministic: bool = True,
                          dropout_key=None
                          ) -> Tuple[Array, Array, Array]:
        """KV-cached step, head-major XLA einsum path.

        The reference grows one ragged python cache per layer
        (modeling.py:1240-1250) and beam search reorders *all* of it every
        step (modeling.py:1352-1365).  Here the cache is split:

          * ``pk``/``pv``  [B, H, P, D]   — the [CLS] regions [SEP] prompt.
            Identical across the K beams of an example by construction
            (written at prefill, before any beam divergence), so it is stored
            once per example, never reordered, and its HBM read is amortised
            K-fold via an einsum over a [B, K, ...] query layout.
          * ``gk``/``gv``  [B*K, H, G, D] — generated tokens only (G ≈ 24
            slots instead of the padded 128-token sequence), the only part
            beam reordering has to gather.  The per-step write uses a fused
            one-hot select over the G dim instead of dynamic_update_slice: a
            dynamic offset on an interior dim lowers to a serial per-row loop
            on TPU (profiled at ~40% of the beam step), while the select is
            one elementwise pass over the small cache.

        ``x``: [B*K, S, hidden] new tokens at generated positions
        ``gen_len .. gen_len+S-1`` (absolute ``prefix_len + gen_len`` ...).
        All S tokens' K/V are written into ``gk``/``gv`` (the trailing [MASK]
        probe slot is overwritten next step).
        """
        cfg = self.cfg
        B = pk.shape[0]
        BK, S, _ = x.shape
        K = BK // B
        q = self._heads(self.q_proj(x))   # [B*K, Hh, S, D]
        k = self._heads(self.k_proj(x))
        v = self._heads(self.v_proj(x))
        G = gk.shape[2]
        # fused one-hot update of slots gen_len..gen_len+S-1
        slots = jnp.arange(G)
        for s in range(S):
            sel = (slots == gen_len + s)[None, None, :, None]
            gk = jnp.where(sel, k[:, :, s:s + 1].astype(gk.dtype), gk)
            gv = jnp.where(sel, v[:, :, s:s + 1].astype(gv.dtype), gv)
        Hh, D = gk.shape[1], gk.shape[3]
        P = pk.shape[2]
        scale = 1.0 / math.sqrt(cfg.head_dim)

        qb = q.reshape(B, K, Hh, S, D)
        # prompt tokens are all real and visible to every query
        # (seq2seq_loader.py:423-429)
        sp = jnp.einsum("bkhsd,bhjd->bkhsj", qb, pk,
                        preferred_element_type=jnp.float32) * scale
        gkb = gk.reshape(B, K, Hh, G, D)
        sg = jnp.einsum("bkhsd,bkhjd->bkhsj", qb, gkb,
                        preferred_element_type=jnp.float32) * scale
        # generated slot j is visible to query s iff committed (j <= gen_len+s)
        jpos = jnp.arange(G)[None, :]
        spos = gen_len + jnp.arange(S)[:, None]
        gbias = jnp.where(jpos <= spos, 0.0, mask_ops.NEG_INF)[None, None, None]
        scores = jnp.concatenate([sp, sg + gbias], axis=-1)
        probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
        if dropout_key is not None:
            probs = explicit_dropout(
                probs, jax.random.fold_in(dropout_key, 0),
                cfg.attention_probs_dropout_prob)
        else:
            probs = self.attn_dropout(probs, deterministic=deterministic)
        probs = probs.astype(x.dtype)
        ctx = jnp.einsum("bkhsj,bhjd->bkhsd", probs[..., :P], pv,
                         preferred_element_type=jnp.float32)
        ctx = ctx + jnp.einsum("bkhsj,bkhjd->bkhsd", probs[..., P:],
                               gv.reshape(B, K, Hh, G, D),
                               preferred_element_type=jnp.float32)
        ctx = ctx.astype(x.dtype).reshape(BK, Hh, S, D)
        out = self._post_attention(self._merge(ctx), x,
                                   deterministic=deterministic,
                                   dropout_key=dropout_key)
        return out, gk, gv

    def dual_block_attend(self, x: Array, pk: Array, pv: Array, bias: Array,
                          drop=None) -> Array:
        """SCST teacher-forced replay attention (one pass, no cache, no
        scan): queries are the 2(T-1) caption rows [w_0..w_{T-2} |
        m_1..m_{T-1}], keys/values are the prompt caches plus the caption
        rows' own projections, visibility via the static dual-block ``bias``
        [R, P+R] (VLPModel.scst_replay_hidden builds it).

        ``drop``: None (deterministic) or a dict with PRE-DRAWN keep masks
        that bit-match the explicit-dropout rollout's draws (assembled by
        VLPModel._scst_replay_drop): ``probs`` [B, Hh, R, P+R], ``hidden``
        ([B, R, H], [B, R, H]).  The einsum split (prompt block + caption
        block) mirrors ``_incremental_cols`` so the fp32 accumulation
        structure matches the rollout's."""
        cfg = self.cfg
        B, R, HD = x.shape
        D = cfg.head_dim
        q = self.q_proj(x)
        k = self.k_proj(x)
        v = self.v_proj(x)
        # normalize prompt caches to [B, P, Hh, D] from either cache layout
        if pk.ndim == 3:                       # column layout [B, P, H*D]
            P = pk.shape[1]
            pk4 = pk.reshape(B, P, HD // D, D)
            pv4 = pv.reshape(B, P, HD // D, D)
        else:                                  # head-major [B, Hh, P, D]
            P = pk.shape[2]
            pk4 = pk.transpose(0, 2, 1, 3)
            pv4 = pv.transpose(0, 2, 1, 3)
        Hh = HD // D
        scale = 1.0 / math.sqrt(D)
        qb = q.reshape(B, R, Hh, D)
        sp = jnp.einsum("brhd,bjhd->bhrj", qb, pk4,
                        preferred_element_type=jnp.float32) * scale
        sg = jnp.einsum("brhd,bjhd->bhrj", qb, k.reshape(B, R, Hh, D),
                        preferred_element_type=jnp.float32) * scale
        scores = jnp.concatenate([sp, sg], axis=-1) + bias[None, None]
        probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
        if drop is not None:
            if "probs_scale" in drop:
                # kernel-dropout rollout: pre-computed 0-or-1/keep
                # multipliers (regenerated on-chip bits), applied exactly
                # as the kernel does — a multiply, not a where/divide
                probs = probs * drop["probs_scale"]
            else:
                probs = masked_dropout(probs, drop["probs"],
                                       cfg.attention_probs_dropout_prob)
        probs = probs.astype(x.dtype)
        ctx = jnp.einsum("bhrj,bjhd->brhd", probs[..., :P], pv4,
                         preferred_element_type=jnp.float32)
        ctx = ctx + jnp.einsum("bhrj,bjhd->brhd", probs[..., P:],
                               v.reshape(B, R, Hh, D),
                               preferred_element_type=jnp.float32)
        ctx = ctx.astype(x.dtype).reshape(B, R, HD)
        return self._post_attention(
            ctx, x, deterministic=True,
            drop_masks=None if drop is None else drop["hidden"])


class MLMHead(nn.Module):
    """Transform + relax-projection select + tied decode
    (modeling.py:420-482)."""
    cfg: VLPConfig

    def setup(self):
        cfg = self.cfg
        r = max(cfg.relax_projection, 1)
        self.transform_dense = _dense(cfg.hidden_size * r, cfg,
                                      "transform_dense")
        self.transform_ln = _layer_norm(cfg, "transform_ln")
        self.bias = self.param("bias", nn.initializers.zeros,
                               (cfg.vocab_size,), jnp.float32)
        self.act = ACT[cfg.hidden_act]

    def __call__(self, hidden: Array, task_idx: Array,
                 word_embedding: Array) -> Array:
        """hidden: [B, P, H]; task_idx: int32[B]; returns fp32 logits [B,P,V]."""
        cfg = self.cfg
        r = max(cfg.relax_projection, 1)
        h = self.act(self.transform_dense(hidden))
        h = self.transform_ln(h).astype(hidden.dtype)  # LN over r*H dims
        if cfg.relax_projection > 1:
            B, P, _ = h.shape
            h = h.reshape(B, P, r, cfg.hidden_size)
            h = jnp.take_along_axis(
                h, task_idx[:, None, None, None].astype(jnp.int32), axis=2
            )[:, :, 0, :]
        # vocab matmul in the activation dtype with fp32 accumulation: on TPU
        # this runs the MXU at bf16 rate and halves the embedding-table HBM
        # read (the reference's fp16 path decodes in half precision too,
        # modeling.py:455-462); under float32 activations it is bit-identical
        # to an fp32 matmul.
        logits = jnp.einsum("bph,vh->bpv", h,
                            word_embedding.astype(h.dtype),
                            preferred_element_type=jnp.float32)
        return logits.astype(jnp.float32) + self.bias[None, None, :]


class VLPModel(nn.Module):
    """Unified VLP model: backbone + all heads.

    Methods:
      encode           — full-sequence forward -> (seq_out, pooled, vis proj)
      pretrain_losses  — masked-LM / pretext / VQA loss tuple (training)
      vqa_inference    — argmax answer ids
      prefill / decode_step — incremental generation primitives
    """
    cfg: VLPConfig
    with_vqa: bool = False

    def setup(self):
        cfg = self.cfg
        self.embeddings = Embeddings(cfg, name="embeddings")
        self.layers = [TransformerLayer(cfg, name=f"layer_{i}")
                       for i in range(cfg.num_hidden_layers)]
        self.pooler_dense = _dense(cfg.hidden_size, cfg, "pooler_dense")
        # region-feature projection (modeling.py:1003-1014)
        self.vis_fc1 = _dense(cfg.vis_feat_dim, cfg, "vis_fc1")
        self.vis_fc2 = _dense(cfg.hidden_size, cfg, "vis_fc2")
        # geometry projection (modeling.py:1016-1018)
        self.vis_pe_fc = _dense(cfg.hidden_size, cfg, "vis_pe_fc")
        self.vis_dropout = nn.Dropout(cfg.hidden_dropout_prob)
        self.mlm = MLMHead(cfg, name="mlm")
        if self.with_vqa:
            self.ans_fc1 = _dense(cfg.hidden_size * 2, cfg, "ans_fc1")
            self.ans_fc2 = _dense(cfg.num_answers, cfg, "ans_fc2")

    # ------------------------------------------------------------------
    def project_regions(self, vis_feats: Array, vis_pe: Array,
                        deterministic: bool) -> Tuple[Array, Array]:
        cfg = self.cfg
        f = vis_feats.astype(jnp.dtype(cfg.dtype))
        f = nn.relu(self.vis_fc2(nn.relu(self.vis_fc1(f))))
        f = self.vis_dropout(f, deterministic=deterministic)
        p = nn.relu(self.vis_pe_fc(vis_pe.astype(jnp.dtype(cfg.dtype))))
        p = self.vis_dropout(p, deterministic=deterministic)
        return f, p

    def pooled(self, seq_out: Array) -> Array:
        return jnp.tanh(self.pooler_dense(seq_out[:, 0]))

    def encode(self, input_ids: Array, segment_ids: Array, mode: Array,
               text_end: Array, vis_feats: Array, vis_pe: Array,
               vis_keep: Optional[Array] = None,
               position_ids: Optional[Array] = None,
               deterministic: bool = True,
               return_projections: bool = False):
        cfg = self.cfg
        B, L = input_ids.shape
        if position_ids is None:
            position_ids = jnp.broadcast_to(jnp.arange(L, dtype=jnp.int32),
                                            (B, L))
        if vis_keep is None:
            vis_keep = jnp.ones((B, cfg.len_vis_input), jnp.float32)

        vf, vp = self.project_regions(vis_feats, vis_pe, deterministic)
        # zero out masked regions AFTER projection (modeling.py:1050-1057);
        # the pretext loss uses the pre-zeroing projections.
        keep = vis_keep[..., None]
        vf_in = vf * keep.astype(vf.dtype)
        vp_in = vp * keep.astype(vp.dtype)

        x = self.embeddings(input_ids, segment_ids, position_ids, vf_in,
                            vp_in, deterministic)
        # attention columns of masked regions are blocked only under the
        # intended-semantics flag; the reference's column blocking is a
        # silent no-op (see VLPConfig.block_masked_regions_in_attention)
        attn_keep = (vis_keep if cfg.block_masked_regions_in_attention
                     else jnp.ones_like(vis_keep))
        colkeep = attn_ops.colkeep_from_vis_keep(attn_keep, L)
        bias = None
        if not cfg.use_pallas_attention:
            bias = mask_ops.attention_bias(mode, text_end, attn_keep,
                                           cfg.prefix_len, L)
        for layer in self.layers:
            x = layer(x, mode, text_end, colkeep, bias, deterministic)
        if return_projections:
            return x, self.pooled(x), vf, vp
        return x, self.pooled(x)

    # ------------------------------------------------------------------
    def pretrain_losses(self, batch: Dict[str, Array], *,
                        deterministic: bool = False,
                        drop_worst_ratio: Array | float = 0.0,
                        mask_image_regions: bool = False,
                        task: str = "img2txt") -> Dict[str, Array]:
        """Training forward (BertForPreTrainingLossMask.forward parity,
        modeling.py:1033-1143)."""
        cfg = self.cfg
        seq_out, pooled, vf, vp = self.encode(
            batch["input_ids"], batch["segment_ids"], batch["mode"],
            batch["text_end"], batch["vis_feats"], batch["vis_pe"],
            vis_keep=batch.get("vis_keep"), deterministic=deterministic,
            return_projections=True)

        out: Dict[str, Array] = {}
        word_emb = self.embeddings.word_embeddings.embedding

        if task == "vqa2":
            vqa_embed = seq_out[:, 0] * seq_out[:, cfg.len_vis_input + 1]
            logits = self.ans_fc2(nn.relu(self.ans_fc1(vqa_embed)))
            logits = logits.astype(jnp.float32)
            labels = batch["ans_scores"].astype(jnp.float32)
            bce = jnp.maximum(logits, 0) - logits * labels + jnp.log1p(
                jnp.exp(-jnp.abs(logits)))
            # BCEWithLogitsLoss (mean over all) * num_answers == batch-mean of
            # per-example sums (modeling.py:1140)
            out["vqa2_loss"] = jnp.mean(jnp.sum(bce, axis=-1))
            out["masked_lm_loss"] = jnp.zeros((), jnp.float32)
        else:
            hidden_masked = jnp.take_along_axis(
                seq_out, batch["masked_pos"][:, :, None].astype(jnp.int32),
                axis=1)
            logits = self.mlm(hidden_masked, batch["task_idx"], word_emb)
            from vlp_tpu import losses as losses_lib
            per_pos = losses_lib.mlm_position_loss(
                logits, batch["masked_ids"], cfg.label_smoothing,
                cfg.vocab_size)
            out["masked_lm_loss"] = losses_lib.mask_and_normalize_loss(
                per_pos, batch["masked_weights"], drop_worst_ratio)
            out["vqa2_loss"] = jnp.zeros((), jnp.float32)

        if mask_image_regions:
            pos = (batch["vis_masked_pos"] - 1).astype(jnp.int32)  # [B,M]
            mf = jnp.take_along_axis(vf, pos[:, :, None], axis=1)
            me = jnp.take_along_axis(vp, pos[:, :, None], axis=1)
            me = me + pooled[:, None, :].astype(me.dtype)
            sim = jnp.einsum("bmh,bnh->bmn", me.astype(jnp.float32),
                             mf.astype(jnp.float32))
            logp = jax.nn.log_softmax(sim, axis=-1)
            diag = jnp.diagonal(logp, axis1=1, axis2=2)
            out["pretext_loss"] = -jnp.mean(jnp.mean(diag, axis=-1))
        else:
            out["pretext_loss"] = jnp.zeros((), jnp.float32)

        out["loss"] = (out["masked_lm_loss"] + out["pretext_loss"]
                       + out["vqa2_loss"])
        return out

    # ------------------------------------------------------------------
    def init_all(self, batch: Dict[str, Array]) -> Dict[str, Array]:
        """Initialization-only forward touching every parameterised head
        (flax creates params lazily; task-specific forwards would leave the
        unused heads without parameters)."""
        out = self.pretrain_losses(batch, deterministic=True,
                                   drop_worst_ratio=0.0,
                                   mask_image_regions=True, task="img2txt")
        if self.with_vqa:
            z = jnp.zeros((1, self.cfg.hidden_size), jnp.dtype(self.cfg.dtype))
            _ = self.ans_fc2(nn.relu(self.ans_fc1(z)))
        return out

    # ------------------------------------------------------------------
    def vqa_inference(self, batch: Dict[str, Array]) -> Array:
        """Answer-id argmax over answers 1.. (modeling.py:1039-1047)."""
        cfg = self.cfg
        seq_out, _ = self.encode(
            batch["input_ids"], batch["segment_ids"], batch["mode"],
            batch["text_end"], batch["vis_feats"], batch["vis_pe"],
            deterministic=True)
        vqa_embed = seq_out[:, 0] * seq_out[:, cfg.len_vis_input + 1]
        logits = self.ans_fc2(nn.relu(self.ans_fc1(vqa_embed)))
        return jnp.argmax(logits[:, 1:], axis=-1) + 1

    # ------------------------------------------------------------------
    # Incremental generation primitives (BertForSeq2SeqDecoder parity).
    # ------------------------------------------------------------------
    @staticmethod
    def gen_cache_slots(max_tgt_length: int) -> int:
        """Generated-token cache size: max committed tokens + probe slot,
        rounded up for TPU-friendly tiling."""
        return -(-(max_tgt_length) // 8) * 8

    def _split_stack(self, x: Array, pk: Array, pv: Array, gk: Array,
                     gv: Array, gen_len,
                     deterministic: bool = True,
                     beam_bias: Optional[Array] = None,
                     dropout_key=None) -> Tuple[Array, Array, Array]:
        new_k, new_v = [], []
        for i, layer in enumerate(self.layers):
            lkey = (None if dropout_key is None
                    else jax.random.fold_in(dropout_key, 1 + i))
            x, k, v = layer.incremental_split(x, pk[i], pv[i], gk[i], gv[i],
                                              gen_len,
                                              deterministic=deterministic,
                                              beam_bias=beam_bias,
                                              dropout_key=lkey)
            new_k.append(k)
            new_v.append(v)
        # per-layer TUPLES, never stacked: a stacked [L, ...] cache costs a
        # full-cache dynamic-update-slice restack + per-layer slice reads
        # every step (~2 ms/step at B=100 K=5, measured in the trace)
        return x, tuple(new_k), tuple(new_v)

    def prefill(self, input_ids: Array, segment_ids: Array,
                position_ids: Array, vis_feats: Array, vis_pe: Array,
                mask_id: int,
                deterministic: bool = True) -> Tuple[Array, Array, Array]:
        """Encode the [CLS] regions [SEP] prompt plus the first [MASK] probe.

        Returns (hidden_of_probe [B,1,H], prompt_k, prompt_v) where the
        prompt caches are per-layer tuples of [B, prefix_len, H*D] (decode
        kernel layout) or [B, H, prefix_len, D] (XLA path) — the probe's
        K/V is dropped (it is a [MASK] that must not be attended to later;
        the reference likewise overwrites its cache slot next step,
        modeling.py:1213/1240-1250).
        """
        cfg = self.cfg
        B = input_ids.shape[0]
        prefix = cfg.prefix_len
        probe = jnp.full((B, 1), mask_id, dtype=input_ids.dtype)
        ids = jnp.concatenate([input_ids[:, :prefix], probe], axis=1)
        seg = segment_ids[:, :prefix + 1]
        pos = position_ids[:, :prefix + 1]
        vf, vp = self.project_regions(vis_feats, vis_pe,
                                      deterministic=deterministic)
        x = self.embeddings(ids, seg, pos, vf, vp,
                            deterministic=deterministic)
        ks, vs = [], []
        for layer in self.layers:
            # prefill_attend returns the prompt K/V already sliced to
            # ``prefix`` (the probe's [MASK] K/V is dropped) in the cache
            # layout chosen by cfg.pallas_decode
            x, k, v = layer.prefill_attend(x, prefix,
                                           deterministic=deterministic)
            ks.append(k)
            vs.append(v)
        return x[:, -1:, :], tuple(ks), tuple(vs)

    def decode_step(self, prev_ids: Array, segment_ids: Array,
                    position_ids: Array, pk: Array, pv: Array, gk: Array,
                    gv: Array, gen_len, mask_id: int,
                    deterministic: bool = True,
                    beam_bias: Optional[Array] = None,
                    dropout_key=None
                    ) -> Tuple[Array, Array, Array]:
        """One generation step: feed [prev_token, MASK probe] at absolute
        positions (prefix+gen_len, prefix+gen_len+1); returns probe hidden +
        the updated generated-token caches (prompt caches are read-only).

        prev_ids: int[B*K, 1]; segment_ids/position_ids: int[B*K, L] full
        streams; pk/pv/gk/gv: per-layer cache tuples (see prefill /
        Decoder._init_gen_cache for the per-layer layouts).
        """
        BK = prev_ids.shape[0]
        cache_len = self.cfg.prefix_len + gen_len
        probe = jnp.full((BK, 1), mask_id, dtype=prev_ids.dtype)
        ids = jnp.concatenate([prev_ids, probe], axis=1)
        seg = jax.lax.dynamic_slice_in_dim(segment_ids, cache_len, 2, axis=1)
        pos = jax.lax.dynamic_slice_in_dim(position_ids, cache_len, 2, axis=1)
        x = self.embeddings(ids, seg, pos, None, None,
                            deterministic=(deterministic
                                           or dropout_key is not None))
        if dropout_key is not None:
            # explicit-dropout rollout (SCST fused-replay contract): the
            # Embeddings module applies dropout LAST, so applying it here
            # after a deterministic call is the identical computation
            x = explicit_dropout(x, jax.random.fold_in(dropout_key, 0),
                                 self.cfg.hidden_dropout_prob)
        x, gk, gv = self._split_stack(x, pk, pv, gk, gv, gen_len,
                                      deterministic=deterministic,
                                      beam_bias=beam_bias,
                                      dropout_key=dropout_key)
        return x[:, -1:, :], gk, gv

    def lm_logits(self, hidden: Array, task_idx: Array) -> Array:
        """MLM logits for generation (fp32, [B, S, V])."""
        word_emb = self.embeddings.word_embeddings.embedding
        return self.mlm(hidden, task_idx, word_emb)

    # ------------------------------------------------------------------
    # SCST teacher-forced replay (one dual-block pass, no scan).
    # ------------------------------------------------------------------
    def _scst_replay_drop(self, drop_rng, B: int, T: int):
        """Re-draw, in dual-block row coordinates, EXACTLY the dropout masks
        the explicit-dropout rollout draws step by step.

        Rollout step t (key ``fold_in(drop_rng, t+1)``) feeds rows
        (w_t [s=0], m_{t+1} [s=1]); its attention-probs draw covers columns
        [prompt P | gen cache slots G] where slot j holds w_j and slot t+1
        holds the step's own probe.  The replay's column mapping is
        therefore row-independent: prompt identity, w_j -> P+j, and probe
        m_{u+1}'s self column -> rollout slot u+1.  Invisible columns'
        mask values are irrelevant (their probabilities are exact zeros).

        Returns (emb_mask [B,R,H], layer_drop(l) -> dict) with R = 2(T-1),
        rows ordered [w_0..w_{T-2} | m_1..m_{T-1}]."""
        cfg = self.cfg
        W = T - 1
        P = cfg.prefix_len
        G = VLPModel.gen_cache_slots(T)
        Hh = cfg.num_attention_heads
        Hd = cfg.hidden_size
        keep_h = 1.0 - cfg.hidden_dropout_prob
        keep_p = 1.0 - cfg.attention_probs_dropout_prob
        keys_t = jax.vmap(
            lambda t: jax.random.fold_in(drop_rng, t + 1))(jnp.arange(W))

        def rows2(draws):          # [W, B, 2, H] -> [B, 2W, H]
            return jnp.concatenate([draws[:, :, 0].transpose(1, 0, 2),
                                    draws[:, :, 1].transpose(1, 0, 2)], 1)

        def draw2(keys):           # per-step [B, 2, H] hidden-site draws
            return jax.vmap(lambda k: jax.random.bernoulli(
                k, keep_h, (B, 2, Hd)))(keys)

        emb_mask = rows2(draw2(jax.vmap(
            lambda k: jax.random.fold_in(k, 0))(keys_t)))

        row_step = jnp.concatenate([jnp.arange(W), jnp.arange(W)])
        row_s = jnp.concatenate([jnp.zeros(W, jnp.int32),
                                 jnp.ones(W, jnp.int32)])
        col_src = jnp.concatenate([jnp.arange(P + W),
                                   P + 1 + jnp.arange(W)])

        use_kernel = (cfg.attention_probs_dropout_prob > 0.0
                      and kernel_decode_dropout(cfg))

        def layer_drop(layer_idx: int):
            base = jax.vmap(lambda k: jax.random.fold_in(
                k, 1 + layer_idx))(keys_t)
            if use_kernel:
                # the rollout rode the fused kernel: regenerate its on-chip
                # PRNG keep/scale draws (exact bits — same seeds, same draw
                # sequence) and hand the replay the MULTIPLIERS, matching
                # the kernel's probs * scale application order
                seeds = jax.vmap(lambda k: decode_attn_ops.dropout_seeds(
                    jax.random.fold_in(k, 0), B))(base)      # [W, B]
                scales = decode_attn_ops.decode_dropout_scales(
                    seeds.reshape(-1), n_heads=Hh, S=2, P=P, G=G,
                    rate=cfg.attention_probs_dropout_prob)
                pdraw = scales.reshape(W, B, Hh, 2, P + G)
                key_name = "probs_scale"
            else:
                pdraw = jax.vmap(lambda k: jax.random.bernoulli(
                    jax.random.fold_in(k, 0), keep_p,
                    (B, 1, Hh, 2, P + G)))(base)[:, :, 0]   # [W,B,Hh,2,P+G]
                key_name = "probs"
            sel = pdraw[row_step, :, :, row_s]          # [R, B, Hh, P+G]
            probs = jnp.take(sel, col_src, axis=-1).transpose(1, 2, 0, 3)
            mh = rows2(draw2(jax.vmap(
                lambda k: jax.random.fold_in(k, 1))(base)))
            mf = rows2(draw2(jax.vmap(
                lambda k: jax.random.fold_in(k, 2))(base)))
            return {key_name: probs, "hidden": (mh, mf)}

        return emb_mask, layer_drop

    def scst_replay_hidden(self, forced_ids: Array, segment_ids: Array,
                           position_ids: Array, pk, pv, mask_id: int,
                           drop_rng=None) -> Array:
        """Teacher-forced SCST replay as ONE dual-block pass: rows
        [w_0..w_{T-2} | m_1..m_{T-1}] attend to [prompt caches | those same
        rows] under the decode visibility (w_t sees prompt + w_<=t; m_t
        sees prompt + w_<t + itself), reproducing the incremental decoder's
        probe hiddens without the per-step scan — no scan carry, no
        per-step cache snapshots in the backward (the round-4 B>=512 SCST
        memory wall), and the matmuls are MXU-shaped instead of S=2 rows.

        With ``drop_rng`` the pass applies EXACTLY the masks the
        explicit-dropout sampled rollout drew (see _scst_replay_drop), so
        gradients match the rollout that produced the sample — the same
        guarantee the scan replay provides, reference
        run_img2txt_dist.py:505-523 semantics.

        Returns [B, T-1, H] hiddens of probes m_1..m_{T-1} (m_0's hidden is
        the prefill probe output, exactly as in the scan replay)."""
        cfg = self.cfg
        B, T = forced_ids.shape
        assert T >= 2, "teacher-forced replay needs at least 2 tokens"
        W = T - 1
        R = 2 * W
        P = cfg.prefix_len

        ids = jnp.concatenate(
            [forced_ids[:, :W],
             jnp.full((B, W), mask_id, forced_ids.dtype)], axis=1)
        seg = jnp.concatenate(
            [jax.lax.dynamic_slice_in_dim(segment_ids, P, W, axis=1),
             jax.lax.dynamic_slice_in_dim(segment_ids, P + 1, W, axis=1)],
            axis=1)
        pos = jnp.concatenate(
            [jax.lax.dynamic_slice_in_dim(position_ids, P, W, axis=1),
             jax.lax.dynamic_slice_in_dim(position_ids, P + 1, W, axis=1)],
            axis=1)
        x = self.embeddings(ids, seg, pos, None, None, deterministic=True)

        emb_mask, layer_drop = (None, None)
        if drop_rng is not None:
            emb_mask, layer_drop = self._scst_replay_drop(drop_rng, B, T)
            x = masked_dropout(x, emb_mask, cfg.hidden_dropout_prob)

        # static dual-block visibility -> additive bias [R, P+R]
        r = jnp.arange(R)[:, None]
        c = jnp.arange(P + R)[None, :]
        step = jnp.where(r < W, r, r - W)
        is_m = r >= W
        vis = ((c < P)
               | ((c >= P) & (c < P + W) & (c - P <= step))
               | (is_m & (c == P + W + step)))
        bias = jnp.where(vis, 0.0, mask_ops.NEG_INF).astype(jnp.float32)

        for i, layer in enumerate(self.layers):
            drop = None if layer_drop is None else layer_drop(i)
            x = layer.dual_block_attend(x, pk[i], pv[i], bias, drop)
        return x[:, W:, :]
