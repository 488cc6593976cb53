"""BertAdam optimizer, TPU-native (optax).

Bit-faithful to the reference optimizer
(/root/reference/pytorch_pretrained_bert/optimization.py:33-182):
  * per-parameter gradient clipping to max_grad_norm INSIDE the step
    (clip scale = max_norm / (||g|| + 1e-6), applied only when ||g|| > max_norm)
  * Adam moments WITHOUT bias correction
  * decoupled weight decay added to the update (not the gradient), masked off
    for biases and LayerNorm parameters (run_img2txt_dist.py:394-401)
  * lr schedule (warmup_linear/constant/cosine) evaluated from the step count
    inside the update; the first update uses step=0 (lr==0 under warmup)

State is fp32 regardless of parameter/gradient dtype.
"""

from __future__ import annotations

import math
from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

Schedule = Callable[[jnp.ndarray], jnp.ndarray]


# --- schedules (optimization.py:33-55); x = step / t_total ------------------

def warmup_linear(x, warmup=0.002):
    x = jnp.asarray(x, jnp.float32)
    return jnp.where(x < warmup, x / warmup,
                     jnp.maximum((x - 1.0) / (warmup - 1.0), 0.0))


def warmup_constant(x, warmup=0.002):
    x = jnp.asarray(x, jnp.float32)
    return jnp.where(x < warmup, x / warmup, 1.0)


def warmup_cosine(x, warmup=0.002):
    x = jnp.asarray(x, jnp.float32)
    return jnp.where(x < warmup, x / warmup,
                     0.5 * (1.0 + jnp.cos(math.pi * x)))


SCHEDULES = {
    "warmup_linear": warmup_linear,
    "warmup_constant": warmup_constant,
    "warmup_cosine": warmup_cosine,
}


class BertAdamState(NamedTuple):
    step: jnp.ndarray     # int32, number of completed updates
    m: Any                # first moments (fp32)
    v: Any                # second moments (fp32)


def default_weight_decay_mask(params) -> Any:
    """Decay everything except biases and LayerNorm scales/biases
    (run_img2txt_dist.py:395: no_decay = bias / LayerNorm.*)."""
    def _is_decay(path, leaf) -> bool:
        names = [p.key for p in path if hasattr(p, "key")]
        # biases (Dense + LayerNorm + MLM output bias) and LayerNorm scales
        # are exempt; kernels and embedding tables decay.
        return bool(names) and names[-1] not in ("bias", "scale")
    return jax.tree_util.tree_map_with_path(_is_decay, params)


def default_tp_clip_mask(params) -> Any:
    """True for leaves the shard_map TP step shards over the model axis
    (mesh.shard_map_tp_pspec): their per-parameter clip must compute the
    FULL parameter's gradient norm, i.e. psum the squared norm across
    shards — a local-shard norm would clip differently than the reference's
    whole-parameter ``clip_grad_norm_`` (optimization.py:146-147)."""
    from vlp_tpu.parallel.mesh import shard_map_tp_pspec

    def _is_sharded(path, leaf) -> bool:
        names = [p.key for p in path if hasattr(p, "key")]
        return any(d == "model" for d in shard_map_tp_pspec(names))
    return jax.tree_util.tree_map_with_path(_is_sharded, params)


def _make_clip(max_grad_norm: float, clip_psum_axis: Optional[str],
               clip_psum_mask: Optional[Any]):
    """Per-parameter clip closure shared by bert_adam / bert_adam_finetune.
    Returns grads_fn(grads, params) -> clipped fp32 grads."""
    def clip(g, sharded=False):
        g32 = g.astype(jnp.float32)
        if max_grad_norm <= 0:
            return g32
        sumsq = jnp.sum(g32 * g32)
        if sharded:
            sumsq = jax.lax.psum(sumsq, clip_psum_axis)
        norm = jnp.sqrt(sumsq)
        scale = jnp.where(norm > max_grad_norm,
                          max_grad_norm / (norm + 1e-6), 1.0)
        return g32 * scale

    def grads_fn(grads, params):
        if clip_psum_axis is None:
            return jax.tree_util.tree_map(clip, grads)
        mask = (clip_psum_mask if clip_psum_mask is not None
                else default_tp_clip_mask(params))
        return jax.tree_util.tree_map(clip, grads, mask)

    return grads_fn


def bert_adam(lr: float, *, warmup: float = -1.0, t_total: int = -1,
              schedule: str = "warmup_linear", b1: float = 0.9,
              b2: float = 0.999, eps: float = 1e-6,
              weight_decay: float = 0.01, max_grad_norm: float = 1.0,
              weight_decay_mask: Optional[Any] = None,
              clip_psum_axis: Optional[str] = None,
              clip_psum_mask: Optional[Any] = None
              ) -> optax.GradientTransformation:
    """Build the BertAdam gradient transformation.

    ``weight_decay_mask`` is a pytree of bools (True = apply decay); if None,
    `default_weight_decay_mask` is computed from the params at init.

    ``clip_psum_axis`` (shard_map TP only): mesh-axis name over which
    tensor-parallel-sharded leaves' clip norms are psum'd so the clip sees
    the full parameter's norm; ``clip_psum_mask`` marks those leaves
    (None = `default_tp_clip_mask`).  Every other part of the update is
    elementwise and therefore shard-exact without collectives.
    """
    sched = SCHEDULES[schedule]
    clip_grads = _make_clip(max_grad_norm, clip_psum_axis, clip_psum_mask)

    def init_fn(params):
        zeros = jax.tree_util.tree_map(
            lambda p: jnp.zeros_like(p, dtype=jnp.float32), params)
        return BertAdamState(step=jnp.zeros((), jnp.int32), m=zeros,
                             v=jax.tree_util.tree_map(jnp.copy, zeros))

    def update_fn(grads, state, params):
        assert params is not None, "bert_adam requires params"
        mask = (weight_decay_mask if weight_decay_mask is not None
                else default_weight_decay_mask(params))

        grads = clip_grads(grads, params)
        new_m = jax.tree_util.tree_map(
            lambda m, g: b1 * m + (1 - b1) * g, state.m, grads)
        new_v = jax.tree_util.tree_map(
            lambda v, g: b2 * v + (1 - b2) * g * g, state.v, grads)

        if t_total > 0 and warmup >= 0:
            lr_t = lr * sched(state.step.astype(jnp.float32) / t_total, warmup)
        else:
            lr_t = jnp.asarray(lr, jnp.float32)

        def upd(m, v, p, decay):
            u = m / (jnp.sqrt(v) + eps)
            if weight_decay > 0:
                u = u + jnp.where(decay, weight_decay, 0.0) * p.astype(jnp.float32)
            return (-lr_t * u).astype(p.dtype)

        updates = jax.tree_util.tree_map(upd, new_m, new_v, params, mask)
        return updates, BertAdamState(step=state.step + 1, m=new_m, v=new_v)

    return optax.GradientTransformation(init_fn, update_fn)


def bert_adam_finetune(lr: float, *, init_params, missing_key_substrings=(),
                       warmup: float = -1.0, t_total: int = -1,
                       schedule: str = "warmup_linear", b1: float = 0.9,
                       b2: float = 0.999, eps: float = 1e-6,
                       weight_decay: float = 0.01, max_grad_norm: float = 1.0,
                       weight_decay_mask=None,
                       clip_psum_axis: Optional[str] = None,
                       clip_psum_mask: Optional[Any] = None
                       ) -> optax.GradientTransformation:
    """Fine-tune-anchored BertAdam (reference BertAdamFineTune,
    optimization.py:185-283): the decay term becomes
    ``wd * (2*p - p_init)`` — decaying toward the initial weights instead of
    zero.  Parameters whose path contains any of ``missing_key_substrings``
    (freshly initialized heads, reference optimization.py:196-201) use a
    zeroed anchor, i.e. plain decay.

    ``clip_psum_axis``/``clip_psum_mask``: see `bert_adam` (shard_map TP).
    """
    sched = SCHEDULES[schedule]
    clip_grads = _make_clip(max_grad_norm, clip_psum_axis, clip_psum_mask)

    def _anchor(path, leaf):
        names = "/".join(p.key for p in path if hasattr(p, "key"))
        if any(mk in names for mk in missing_key_substrings):
            return jnp.zeros_like(leaf, dtype=jnp.float32)
        return jnp.asarray(leaf, jnp.float32)

    anchors = jax.tree_util.tree_map_with_path(_anchor, init_params)

    def init_fn(params):
        zeros = jax.tree_util.tree_map(
            lambda p: jnp.zeros_like(p, dtype=jnp.float32), params)
        return BertAdamState(step=jnp.zeros((), jnp.int32), m=zeros,
                             v=jax.tree_util.tree_map(jnp.copy, zeros))

    def update_fn(grads, state, params):
        assert params is not None
        mask = (weight_decay_mask if weight_decay_mask is not None
                else default_weight_decay_mask(params))

        grads = clip_grads(grads, params)
        new_m = jax.tree_util.tree_map(
            lambda m, g: b1 * m + (1 - b1) * g, state.m, grads)
        new_v = jax.tree_util.tree_map(
            lambda v, g: b2 * v + (1 - b2) * g * g, state.v, grads)
        if t_total > 0 and warmup >= 0:
            lr_t = lr * sched(state.step.astype(jnp.float32) / t_total, warmup)
        else:
            lr_t = jnp.asarray(lr, jnp.float32)

        def upd(m, v, p, a, decay):
            u = m / (jnp.sqrt(v) + eps)
            if weight_decay > 0:
                u = u + jnp.where(decay, weight_decay, 0.0) * (
                    2.0 * p.astype(jnp.float32) - a)
            return (-lr_t * u).astype(p.dtype)

        updates = jax.tree_util.tree_map(upd, new_m, new_v, params, anchors,
                                         mask)
        return updates, BertAdamState(step=state.step + 1, m=new_m, v=new_v)

    return optax.GradientTransformation(init_fn, update_fn)


def load_opt_state_subset(opt_state: BertAdamState, saved_m, saved_v,
                          saved_step=None) -> BertAdamState:
    """Partial optimizer-state recovery (reference
    find_state_dict_subset_finetune, optimization.py:285-405 capability):
    restore moments only for parameters present in the saved trees (matched
    by path); new parameters keep fresh zeros."""
    flat_saved_m = dict(jax.tree_util.tree_flatten_with_path(saved_m)[0])
    flat_saved_v = dict(jax.tree_util.tree_flatten_with_path(saved_v)[0])

    def merge(saved_flat):
        def _leaf(path, cur):
            got = saved_flat.get(path)
            if got is not None and got.shape == cur.shape:
                return jnp.asarray(got, cur.dtype)
            return cur
        return _leaf

    new_m = jax.tree_util.tree_map_with_path(merge(flat_saved_m), opt_state.m)
    new_v = jax.tree_util.tree_map_with_path(merge(flat_saved_v), opt_state.v)
    step = (jnp.asarray(saved_step, jnp.int32) if saved_step is not None
            else opt_state.step)
    return BertAdamState(step=step, m=new_m, v=new_v)


class DynamicLossScale:
    """fp16-style dynamic loss scaling (reference FP16_Optimizer_State,
    optimization_fp16.py:7-80 capability).

    Unnecessary for bf16 TPU training (no scaling in the default path) but
    provided for numerical parity experiments with fp16-like dtypes:
    scale the loss, unscale grads, skip the update on non-finite grads and
    halve the scale; double it after ``growth_interval`` good steps.

    ``static=True`` freezes the scale at ``init_scale`` (apex
    ``static_loss_scale``, run_img2txt_dist.py:419-420): overflow still
    skips the update, but the scale never halves or grows.
    """

    def __init__(self, init_scale: float = 2.0 ** 15,
                 growth_interval: int = 2000, factor: float = 2.0,
                 static: bool = False):
        self.init_scale = init_scale
        self.growth_interval = growth_interval
        self.factor = factor
        self.static = static

    def init(self):
        return {"scale": jnp.float32(self.init_scale),
                "good_steps": jnp.int32(0)}

    def scale_loss(self, loss, state):
        return loss * state["scale"]

    def unscale_and_check(self, grads, state):
        inv = 1.0 / state["scale"]
        grads = jax.tree_util.tree_map(
            lambda g: g.astype(jnp.float32) * inv, grads)
        finite = jnp.all(jnp.asarray(
            [jnp.all(jnp.isfinite(g))
             for g in jax.tree_util.tree_leaves(grads)]))
        return grads, finite

    def update(self, state, finite):
        if self.static:
            return state
        scale = jnp.where(finite, state["scale"], state["scale"] / self.factor)
        good = jnp.where(finite, state["good_steps"] + 1, 0)
        grow = good >= self.growth_interval
        scale = jnp.where(grow, scale * self.factor, scale)
        good = jnp.where(grow, 0, good)
        return {"scale": scale, "good_steps": good}

    def apply_or_skip(self, finite, updates):
        """Zero the updates when grads were non-finite (skip step)."""
        return jax.tree_util.tree_map(
            lambda u: jnp.where(finite, u, jnp.zeros_like(u)), updates)
