"""Device mesh + sharding rules.

The reference scales with one process per GPU + NCCL DDP
(/root/reference/vlp/run_img2txt_dist.py:232-234, 379-387).  The TPU-native
equivalent is a ``jax.sharding.Mesh`` with jit-level sharding annotations:
gradients are reduced by XLA collectives over ICI, the per-host input pipeline
shards the global batch by ``jax.process_index()``, and
``multihost_utils.sync_global_devices`` replaces ``torch.distributed.barrier``.

Axes:
  * ``data``  — data parallelism (the reference's only strategy)
  * ``model`` — optional tensor parallelism over hidden/FFN/vocab dims; a
    110M-parameter BERT does not need it, but the sharding rules keep the
    framework honest at larger scale.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: Optional[int] = None, model: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        data = n // model
    assert data * model == n, f"mesh {data}x{model} != {n} devices"
    dev_array = np.asarray(devices).reshape(data, model)
    return Mesh(dev_array, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading batch dim over 'data'; everything else replicated."""
    return NamedSharding(mesh, P("data"))


def batch_spec_tree(batch, mesh: Mesh):
    return jax.tree_util.tree_map(
        lambda x: NamedSharding(mesh, P("data", *([None] * (x.ndim - 1)))),
        batch)


def param_pspec(path_names: Sequence[str], leaf) -> P:
    """Tensor-parallel partition spec for a parameter.

    Column-parallel: q/k/v and FFN-in kernels shard their output dim; the
    vocab/type/position embedding tables shard the vocab dim.  Row-parallel:
    attention-out and FFN-out kernels shard their input dim.  Biases and
    LayerNorm params are replicated.
    """
    name = "/".join(path_names)
    last = path_names[-1] if path_names else ""
    if last == "embedding":
        return P("model", None)
    if last != "kernel":
        return P()  # biases, LN scales
    if any(k in name for k in ("q_proj", "k_proj", "v_proj", "ffn_in",
                               "transform_dense", "ans_fc1", "vis_fc1")):
        return P(None, "model")
    if any(k in name for k in ("out_proj", "ffn_out", "ans_fc2", "vis_fc2")):
        return P("model", None)
    return P()


def param_sharding_tree(params, mesh: Mesh, tensor_parallel: bool = True):
    def _shard(path, leaf):
        names = [p.key for p in path if hasattr(p, "key")]
        spec = param_pspec(names, leaf) if tensor_parallel else P()
        # drop specs that don't divide evenly
        dims = [d for d in spec]
        for axis, d in enumerate(dims):
            if d == "model" and leaf.shape[axis] % mesh.shape["model"] != 0:
                return NamedSharding(mesh, P())
        return NamedSharding(mesh, spec)
    return jax.tree_util.tree_map_with_path(_shard, params)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


# --- manual (shard_map) tensor parallelism ---------------------------------
# Megatron-style head/FFN sharding for the shard_map TP step, which keeps
# the Pallas kernels (the model inserts the f/g collectives itself,
# ops/tp.py).  Narrower than the GSPMD rules above on purpose: embeddings
# and every head stay replicated (a vocab-sharded embedding lookup needs
# masked-gather + psum machinery that a 23M-row table doesn't justify), and
# row-parallel biases stay replicated because the model adds them AFTER the
# psum.

_TP_COL = ("q_proj", "k_proj", "v_proj", "ffn_in")    # shard output dim
_TP_ROW = ("out_proj", "ffn_out")                     # shard input dim


def shard_map_tp_pspec(path_names: Sequence[str]) -> P:
    """Partition spec of one parameter under the manual shard_map TP step."""
    if len(path_names) < 2:
        return P()
    parent, last = path_names[-2], path_names[-1]
    if parent in _TP_COL:
        # kernel [in, out] shards out; the bias rides the same output dim
        return P(None, "model") if last == "kernel" else P("model")
    if parent in _TP_ROW and last == "kernel":
        return P("model", None)
    return P()


def tp_param_specs(params, tp: int):
    """PartitionSpec pytree for shard_map in/out_specs (params or a
    same-structure moment tree).  Asserts divisibility instead of silently
    replicating: a replicated q_proj next to sharded k_proj would change
    the attention width mid-layer."""
    def _spec(path, leaf):
        names = [p.key for p in path if hasattr(p, "key")]
        spec = shard_map_tp_pspec(names)
        for axis, d in enumerate(spec):
            if d == "model":
                assert leaf.shape[axis] % tp == 0, (
                    f"{'/'.join(names)} dim {axis} ({leaf.shape[axis]}) "
                    f"not divisible by tensor_parallel={tp}")
        return spec
    return jax.tree_util.tree_map_with_path(_spec, params)
