"""GSPMD (jit + sharding) training step over a device mesh.

Data parallelism + optional tensor parallelism via sharding annotations; XLA
inserts the gradient reductions and TP collectives over ICI.  This is the
multi-chip analogue of the reference's DDP loop
(/root/reference/vlp/run_img2txt_dist.py:379-387, 566-586).

Note: the Pallas fused-attention kernel is a single-device kernel; under
GSPMD tensor parallelism the XLA attention path is used instead (XLA
partitions the einsums over heads).  shard_map keeps Pallas in BOTH
regimes: data-parallel (``make_shard_map_step``) and, since round 3,
dp x tp with manual Megatron f/g collectives (``tensor_parallel=True`` on
the shard_map factories — the model inserts the collectives itself, see
ops/tp.py and VLPConfig.tp_axis).
"""

from __future__ import annotations

import functools

import jax
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vlp_tpu.models.model import VLPModel
from vlp_tpu.parallel import mesh as mesh_lib
from vlp_tpu.parallel import train_step as ts


def state_shardings(state: ts.TrainState, mesh: Mesh,
                    tensor_parallel: bool = True):
    p_shard = mesh_lib.param_sharding_tree(state.params, mesh,
                                           tensor_parallel)
    opt = state.opt_state
    m_shard = mesh_lib.param_sharding_tree(opt.m, mesh, tensor_parallel)
    v_shard = mesh_lib.param_sharding_tree(opt.v, mesh, tensor_parallel)
    rep = mesh_lib.replicated(mesh)
    return ts.TrainState(
        params=p_shard,
        opt_state=type(opt)(step=rep, m=m_shard, v=v_shard),
        step=rep)


def shard_state(state: ts.TrainState, mesh: Mesh,
                tensor_parallel: bool = True) -> ts.TrainState:
    sh = state_shardings(state, mesh, tensor_parallel)
    return jax.tree_util.tree_map(jax.device_put, state, sh)


def put_on_mesh(x, mesh: Mesh, spec: P):
    """Place host data on the mesh.  Single-process: plain device_put.
    Multi-process: ``x`` is this host's LOCAL block (the per-host loader
    shard, run_img2txt_dist.py's one-process-per-GPU pattern) and is
    assembled into the global array — device_put cannot target
    non-addressable devices."""
    sh = NamedSharding(mesh, spec)
    if jax.process_count() == 1:
        return jax.device_put(x, sh)
    import numpy as np
    return jax.make_array_from_process_local_data(sh, np.asarray(x))


def replicate_to_mesh(tree, mesh: Mesh):
    """Replicate a host-resident pytree over every mesh device (works
    across processes, unlike a bare device_put to a replicated sharding)."""
    return jax.tree_util.tree_map(lambda x: put_on_mesh(x, mesh, P()), tree)


def shard_batch(batch, mesh: Mesh):
    return jax.tree_util.tree_map(
        lambda x: put_on_mesh(x, mesh, P("data", *([None] * (x.ndim - 1)))),
        batch)


def make_pjit_train_step(model: VLPModel, tx: optax.GradientTransformation,
                         mesh: Mesh, *, tensor_parallel: bool = True,
                         mask_image_regions: bool = False,
                         task: str = "img2txt", grad_accum: int = 1):
    """Jit the full train step with mesh shardings; returns
    step(state, batch, rng, drop_worst_ratio) -> (state, metrics)."""
    base = ts.make_train_step(model, tx, mask_image_regions=mask_image_regions,
                              task=task, grad_accum=grad_accum)
    rep = mesh_lib.replicated(mesh)

    def wrapped(state, batch, rng, ratio):
        return base(state, batch, rng, ratio)

    def make(state, batch):
        st_sh = state_shardings(state, mesh, tensor_parallel)
        b_sh = jax.tree_util.tree_map(
            lambda x: NamedSharding(mesh, P("data", *([None] * (x.ndim - 1)))),
            batch)
        # out_shardings pinned to the input layout: left free, GSPMD may
        # return opt-state leaves with compiler-chosen shardings, and the
        # next step's in_shardings check then rejects its own output
        return jax.jit(wrapped, in_shardings=(st_sh, b_sh, rep, rep),
                       out_shardings=(st_sh, rep))

    return make


def _shard_map_state_specs(state: ts.TrainState, mesh: Mesh,
                           tensor_parallel: bool):
    """PartitionSpec pytree for the TrainState under shard_map: fully
    replicated for pure DP; head/FFN-sharded params + moments for manual
    TP (mesh.tp_param_specs — the optimizer is elementwise, so m/v shard
    exactly like their parameters)."""
    if not tensor_parallel:
        return jax.tree_util.tree_map(lambda _: P(), state)
    tp = mesh.shape["model"]
    opt = state.opt_state
    return ts.TrainState(
        params=mesh_lib.tp_param_specs(state.params, tp),
        opt_state=type(opt)(step=P(),
                            m=mesh_lib.tp_param_specs(opt.m, tp),
                            v=mesh_lib.tp_param_specs(opt.v, tp)),
        step=P())


def shard_state_shard_map_tp(state: ts.TrainState, mesh: Mesh
                             ) -> ts.TrainState:
    """Place a full (replicated-shape) TrainState onto the mesh with the
    manual-TP layout (mesh.tp_param_specs), so the first shard_map TP step
    doesn't pay a resharding transfer.  Multi-process: goes through
    ``put_on_mesh`` (device_put cannot target non-addressable devices);
    every host holds the full host-side value, and the 'model' axis must be
    within-host (cli/train.py validates), so the process-local block IS the
    full array."""
    specs = _shard_map_state_specs(state, mesh, tensor_parallel=True)
    return jax.tree_util.tree_map(
        lambda x, s: put_on_mesh(x, mesh, s), state, specs)


def _check_tp_args(model: VLPModel, mesh: Mesh, tensor_parallel: bool):
    if tensor_parallel:
        assert mesh.shape.get("model", 1) > 1, \
            "tensor_parallel=True needs a 'model' mesh axis > 1"
        assert model.cfg.tp_axis == "model", \
            "build the step model with cfg.replace(tp_axis='model') so it " \
            "inserts the f/g collectives (and the tx with " \
            "clip_psum_axis='model' for reference-exact per-param clipping)"
    else:
        assert model.cfg.tp_axis is None, \
            "model has tp_axis set but tensor_parallel=False"


def _meta_model(model: VLPModel) -> VLPModel:
    """tp-off twin used only for `jax.eval_shape` metrics-structure traces:
    the TP model's f/g collectives cannot be traced outside shard_map (no
    bound axis), and the metrics pytree structure is identical."""
    if model.cfg.tp_axis is None:
        return model
    return VLPModel(model.cfg.replace(tp_axis=None),
                    with_vqa=model.with_vqa)


def make_shard_map_multi_step(model: VLPModel,
                              tx: optax.GradientTransformation, mesh: Mesh,
                              *, mask_image_regions: bool = False,
                              task: str = "img2txt", grad_accum: int = 1,
                              tensor_parallel: bool = False):
    """Device-loop analogue of ``make_shard_map_step``: K optimizer steps
    scanned per dispatch (train_step.make_multi_step) with the batch dim
    sharded over the mesh's ``data`` axis and grads pmean'd on ICI each
    step.  Params/optimizer replicated; Pallas attention runs per shard.
    Returns ``make(state, stacked_batch) -> fn`` like the single-step
    factory; ``stacked_batch`` is ``[K, B_global, ...]``.
    ``grad_accum`` composes as in ``make_shard_map_step``; so does
    ``tensor_parallel`` (manual TP — see ``make_shard_map_step``).
    """
    from jax import shard_map
    _check_tp_args(model, mesh, tensor_parallel)

    def local_multi(state, stacked, rng, ratio):
        rng = jax.random.fold_in(rng, jax.lax.axis_index("data"))

        def body(st, xs):
            batch, i = xs
            grads, metrics = ts.grads_with_accum(
                model, st.params, batch, jax.random.fold_in(rng, i),
                drop_worst_ratio=ratio,
                mask_image_regions=mask_image_regions, task=task,
                grad_accum=grad_accum)
            grads = jax.lax.pmean(grads, "data")
            metrics = jax.lax.pmean(metrics, "data")
            updates, new_opt = tx.update(grads, st.opt_state, st.params)
            return ts.TrainState(optax.apply_updates(st.params, updates),
                                 new_opt, st.step + 1), metrics

        K = jax.tree_util.tree_leaves(stacked)[0].shape[0]
        return jax.lax.scan(body, state, (stacked, jax.numpy.arange(K)))

    rep = P()

    def make(state, stacked):
        one_batch = jax.tree_util.tree_map(lambda x: x[0], stacked)
        _, metrics_tree = jax.eval_shape(
            functools.partial(ts.loss_fn, _meta_model(model), task=task,
                              mask_image_regions=mask_image_regions,
                              drop_worst_ratio=0.0),
            state.params, one_batch, jax.random.PRNGKey(0))
        st_specs = _shard_map_state_specs(state, mesh, tensor_parallel)
        fn = shard_map(
            local_multi, mesh=mesh,
            in_specs=(st_specs,
                      jax.tree_util.tree_map(
                          lambda x: P(None, "data",
                                      *([None] * (x.ndim - 2))), stacked),
                      rep, rep),
            out_specs=(st_specs,
                       jax.tree_util.tree_map(lambda _: rep, metrics_tree)),
            check_vma=False)
        return jax.jit(fn, donate_argnums=(0,))

    return make


def shard_stacked_batch(stacked, mesh: Mesh):
    """Place a ``[K, B, ...]`` stacked batch with B sharded over 'data'."""
    return jax.tree_util.tree_map(
        lambda x: put_on_mesh(x, mesh, P(None, "data", *([None] * (x.ndim - 2)))),
        stacked)


def make_shard_map_step(model: VLPModel, tx: optax.GradientTransformation,
                        mesh: Mesh, *, mask_image_regions: bool = False,
                        task: str = "img2txt", grad_accum: int = 1,
                        tensor_parallel: bool = False):
    """Data-parallel step via shard_map: params replicated, batch sharded over
    'data', grads pmean'd explicitly.  Pallas attention runs per-shard, so
    this path keeps the fused kernel in the multi-chip regime.

    ``grad_accum > 1`` scans micro-batches INSIDE the local step (each
    shard's batch leading dim must be ``grad_accum * local_micro``) before
    the single pmean — composing accumulation with data parallelism like the
    reference's DDP + accumulation (run_img2txt_dist.py:111-114, 566-575),
    with one gradient reduction per optimizer step (DDP likewise all-reduces
    once, on the non-no_sync backward).

    ``tensor_parallel=True`` (manual Megatron TP, beyond the reference):
    attention heads + FFN columns shard over the mesh's 'model' axis per
    mesh.tp_param_specs, the batch shards over 'data' and replicates over
    'model', and the model — built with ``cfg.tp_axis='model'`` — inserts
    the f/g collectives itself (ops/tp.py), which keeps every gradient
    exact WITHOUT any model-axis gradient reduction here: sharded leaves'
    grads are exactly their shard of the full gradient, replicated leaves'
    grads are full and identical on every shard.  Unlike the GSPMD TP path
    (make_pjit_train_step) this keeps the fused Pallas kernels, because
    every shard runs an ordinary single-device program.  Build the tx with
    ``clip_psum_axis='model'`` so BertAdam's per-parameter clip sees full-
    parameter norms."""
    from jax import shard_map
    _check_tp_args(model, mesh, tensor_parallel)

    def local_step(state, batch, rng, ratio):
        rng = jax.random.fold_in(rng, jax.lax.axis_index("data"))
        grads, metrics = ts.grads_with_accum(
            model, state.params, batch, rng, drop_worst_ratio=ratio,
            mask_image_regions=mask_image_regions, task=task,
            grad_accum=grad_accum)
        grads = jax.lax.pmean(grads, "data")
        metrics = jax.lax.pmean(metrics, "data")
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return ts.TrainState(new_params, new_opt, state.step + 1), metrics

    rep = P()
    data = P("data")

    def batch_specs(batch):
        return jax.tree_util.tree_map(
            lambda x: P("data", *([None] * (x.ndim - 1))), batch)

    def make(state, batch):
        # metrics pytree derived abstractly from loss_fn so adding/renaming
        # a key in pretrain_losses can never desynchronise these out_specs
        # from the single-chip path (was a hard-coded key list)
        _, metrics_tree = jax.eval_shape(
            functools.partial(ts.loss_fn, _meta_model(model), task=task,
                              mask_image_regions=mask_image_regions,
                              drop_worst_ratio=0.0),
            state.params, batch, jax.random.PRNGKey(0))
        st_specs = _shard_map_state_specs(state, mesh, tensor_parallel)
        fn = shard_map(
            local_step, mesh=mesh,
            in_specs=(st_specs, batch_specs(batch), rep, rep),
            out_specs=(st_specs,
                       jax.tree_util.tree_map(lambda _: rep, metrics_tree)),
            check_vma=False)
        return jax.jit(fn)

    return make
