"""Manual tensor-parallel collectives for shard_map (Megatron f/g pattern).

The GSPMD tensor-parallel path (parallel/pjit_step.make_pjit_train_step)
lets XLA insert collectives, but GSPMD cannot partition Mosaic custom
calls, so it abandons the fused Pallas attention kernel.  These two
primitives are the manual-collective alternative: inside shard_map the
model inserts them itself, every device runs an ordinary single-device
program (Pallas kernels included), and autodiff stays exact.

They are the classic Megatron-LM "f"/"g" conjugate operators
(arXiv:1909.08053 §3; the reference framework has no TP at all — its
110M BERT-base is replicated whole, see SURVEY.md §2.3):

  * ``replicate_for_branch`` (f): identity forward, psum backward.  Wrap
    a REPLICATED activation where it enters column-parallel branches
    (q/k/v projections, ffn_in).  Each shard's backward only sees the
    gradient contribution through its own columns; the psum of cotangents
    restores the full gradient, keeping every upstream replicated
    parameter's gradient exact and identical on all shards.
  * ``sum_partial`` (g): psum forward, identity backward.  Wrap the
    OUTPUT of row-parallel matmuls (out_proj, ffn_out) before the bias
    add.  Each shard holds a partial sum over its input rows; the psum
    reconstitutes the full activation, and since the reconstituted value
    is replicated, its cotangent is already what every shard's local
    graph needs — backward is the identity.

With f and g placed this way, ALL parameter gradients come out exact
without any post-hoc gradient collectives over the model axis: sharded
parameters get exactly their shard of the full gradient, replicated
parameters get the full gradient replicated.  (The optimizer's
per-parameter clip still needs the FULL parameter's norm — see
``optim.bert_adam(clip_psum_axis=...)``.)

Both must be called under ``shard_map`` with the axis name bound; with
``check_vma=False`` the raw ``lax.psum`` transpose is unsound for
replicated cotangents, which is exactly why these are ``custom_vjp``
wrappers instead of bare collectives.
"""

from __future__ import annotations

import functools

import jax


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def replicate_for_branch(x, axis_name: str):
    """Megatron "f": identity forward; backward psums cotangents over
    ``axis_name``.  Place on a replicated activation feeding a
    column-parallel branch."""
    del axis_name
    return x


def _f_fwd(x, axis_name):
    del axis_name
    return x, None


def _f_bwd(axis_name, _, ct):
    return (jax.lax.psum(ct, axis_name),)


replicate_for_branch.defvjp(_f_fwd, _f_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def sum_partial(x, axis_name: str):
    """Megatron "g": psum forward; backward is the identity.  Place on the
    partial output of a row-parallel matmul (before the bias add)."""
    return jax.lax.psum(x, axis_name)


def _g_fwd(x, axis_name):
    return jax.lax.psum(x, axis_name), None


def _g_bwd(axis_name, _, ct):
    del axis_name
    return (ct,)


sum_partial.defvjp(_g_fwd, _g_bwd)
