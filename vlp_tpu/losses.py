"""Loss functions for VLP pretraining / fine-tuning.

Parity targets:
  * masked-LM cross entropy with optional label smoothing
    (/root/reference/pytorch_pretrained_bert/loss.py:12-48 — KL(q_smoothed||p)
    with smoothing mass ``ls/(V-2)`` and ignore_index 0)
  * drop-worst loss filtering + mask normalisation
    (/root/reference/pytorch_pretrained_bert/modeling.py:1083-1093)
  * SCST policy-gradient reward criterion
    (/root/reference/vlp/scst_utils.py:66-78)

All functions are pure and jit-friendly; ``drop_worst_ratio`` may be a traced
scalar (the reference flips it on after ``--drop_after`` epochs).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jnp.ndarray


def mlm_position_loss(logits: Array, targets: Array, label_smoothing: float,
                      vocab_size: int, ignore_index: int = 0) -> Array:
    """Per-position masked-LM loss [B, P] (reduction='none').

    logits: fp32 [B, P, V]; targets: int [B, P].
    With smoothing: KL(q||p) summed over vocab, where q puts ``confidence`` on
    the target, ``ls/(V-2)`` elsewhere, 0 on ignore_index; positions whose
    target IS ignore_index get exactly 0 loss (loss.py:46).
    """
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    if label_smoothing and label_smoothing > 0.0:
        ls = float(label_smoothing)
        smooth = ls / (vocab_size - 2)
        confidence = 1.0 - ls
        # sum_v q_v*(log q_v - log p_v), with 0 log 0 := 0
        tgt_logp = jnp.take_along_axis(logp, targets[..., None], axis=-1
                                       )[..., 0]
        ign_logp = logp[..., ignore_index]
        sum_logp = jnp.sum(logp, axis=-1)
        # cross term: -(smooth * (sum_logp - tgt_logp - ign_logp)
        #              + confidence * tgt_logp)
        cross = -(smooth * (sum_logp - tgt_logp - ign_logp)
                  + confidence * tgt_logp)
        # entropy term of q (constant per non-ignored position): q has
        # `confidence` at the target, 0 at ignore_index, and `smooth` at the
        # remaining V-2 slots.
        ent = (confidence * jnp.log(jnp.maximum(confidence, 1e-20))
               + (vocab_size - 2) * smooth * jnp.log(jnp.maximum(smooth, 1e-20)))
        loss = cross + ent
        return jnp.where(targets == ignore_index, 0.0, loss)
    tgt_logp = jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    return -tgt_logp


def mask_and_normalize_loss(loss: Array, weights: Array,
                            drop_worst_ratio) -> Array:
    """Weighted masked-LM reduction with drop-worst filtering
    (modeling.py:1083-1093).

    loss, weights: [B, P].  Keeps the ``floor(B*(1-ratio))`` examples with the
    smallest per-example loss sums; normalises by the kept examples' total
    mask weight + 1e-5.  Implemented with a dynamic keep-mask so ``ratio`` may
    be a traced scalar.
    """
    w = weights.astype(loss.dtype)
    loss = loss * w
    per_ex = jnp.sum(loss, axis=-1)                       # [B]
    B = per_ex.shape[0]
    k = jnp.floor(B * (1.0 - jnp.asarray(drop_worst_ratio, loss.dtype))
                  ).astype(jnp.int32)
    order = jnp.argsort(per_ex)                            # ascending
    rank = jnp.zeros(B, jnp.int32).at[order].set(jnp.arange(B, dtype=jnp.int32))
    keep = (rank < k).astype(loss.dtype)                   # [B]
    denom = jnp.sum(jnp.sum(w, axis=-1) * keep) + 1e-5
    return jnp.sum(per_ex * keep) / denom


def scst_reward_loss(sample_logprobs: Array, gen_result: Array,
                     reward: Array) -> Array:
    """Policy-gradient SCST loss (scst_utils.py:66-78).

    sample_logprobs, reward: [B, T]; gen_result: int [B, T] sampled ids.
    Mask is (seq > 0) shifted right by one with a leading 1, so the first EOS
    step is still rewarded.
    """
    mask = (gen_result > 0).astype(jnp.float32)
    mask = jnp.concatenate([jnp.ones_like(mask[:, :1]), mask[:, :-1]], axis=1)
    out = -sample_logprobs.astype(jnp.float32) * reward.astype(jnp.float32) * mask
    return jnp.sum(out) / jnp.sum(mask)
