"""Structural attention-mask construction on device.

The reference materialises a ``B x L x L`` long-tensor mask per example on the
host (seq2seq_loader.py:291-304) and converts it to an additive ``-10000``
bias (modeling.py:807-833).  Here the mask is a pure function of three small
per-example quantities — ``mode``, ``text_end``, ``vis_keep`` — evaluated on
device (and, in the fused-attention kernel, in-register).

Semantics (see seq2seq_loader.py:295-304):
  * MODE_S2S: every row attends the prefix ``[CLS] regions [SEP]`` (cols
    ``< prefix``); caption rows ``prefix <= i < text_end`` additionally attend
    causally within the caption (cols ``prefix <= j <= i``).
  * MODE_BI: every row attends every non-pad col (``j < text_end``).
  * region masking: columns of masked regions are blocked for all rows
    (``vis_keep[j-1] == 0`` for ``1 <= j <= len_vis``).
"""

from __future__ import annotations

import jax.numpy as jnp

from vlp_tpu.config import MODE_S2S

NEG_INF = -10000.0  # matches the reference's additive-mask constant


def visibility(mode: jnp.ndarray, text_end: jnp.ndarray, vis_keep: jnp.ndarray,
               prefix: int, seq_len: int) -> jnp.ndarray:
    """Boolean visibility mask.

    Args:
      mode:      int32[B]       MODE_BI / MODE_S2S
      text_end:  int32[B]       one past the last real token
      vis_keep:  float32[B, nv] 1 = region visible, 0 = masked out
      prefix:    static int     len_vis_input + 2
      seq_len:   static int     padded L

    Returns: bool[B, L, L] — [b, i, j] True iff query i may attend key j.
    """
    L = seq_len
    i = jnp.arange(L)[:, None]          # queries
    j = jnp.arange(L)[None, :]          # keys
    te = text_end[:, None, None]        # [B,1,1]

    bi_vis = (j < te)                                   # [B,L,L] via broadcast
    causal = (j >= prefix) & (j <= i) & (i[None] < te)  # caption-causal block
    s2s_vis = (j < prefix) | causal

    vis = jnp.where((mode == MODE_S2S)[:, None, None], s2s_vis, bi_vis)

    # block masked-region columns (cols 1..nv) for all rows
    nv = vis_keep.shape[-1]
    col_keep = jnp.ones((vis_keep.shape[0], L), dtype=bool)
    col_keep = col_keep.at[:, 1:nv + 1].set(vis_keep > 0.5)
    return vis & col_keep[:, None, :]


def attention_bias(mode: jnp.ndarray, text_end: jnp.ndarray,
                   vis_keep: jnp.ndarray, prefix: int, seq_len: int,
                   dtype=jnp.float32) -> jnp.ndarray:
    """Additive attention bias [B, 1, L, L]: 0 where visible, -10000 where not."""
    vis = visibility(mode, text_end, vis_keep, prefix, seq_len)
    return jnp.where(vis, 0.0, NEG_INF).astype(dtype)[:, None, :, :]


def decode_visibility_row(step_pos: jnp.ndarray, prefix: int,
                          seq_len: int) -> jnp.ndarray:
    """Visibility row for one decode query at absolute position ``step_pos``:
    prefix always visible, generated region causally visible."""
    j = jnp.arange(seq_len)
    return (j < prefix) | ((j >= prefix) & (j <= step_pos))
