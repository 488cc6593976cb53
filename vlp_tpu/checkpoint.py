"""Checkpointing: orbax save/restore + PyTorch ``.bin`` converter.

The converter re-implements the reference ``from_pretrained`` surgery
(/root/reference/pytorch_pretrained_bert/modeling.py:553-764):
  * ``gamma``/``beta`` -> ``weight``/``bias`` rename          (651-663)
  * token-type table expansion 2 -> 6 (rows 2,3,4 copy row 0;
    row 5 copies row 1) or truncation                         (665-683)
  * position-table tiling to a larger ``max_position_embeddings``
    or truncation                                             (685-702)
  * relax-projection replicate 1 -> R / select R -> 1 of the MLM
    transform dense + LayerNorm                               (704-732)
then maps torch parameter names onto the vlp_tpu flax tree (dense kernels
transposed).  Epoch-checkpoint scanning mirrors ``_get_max_epoch_model``
(run_img2txt_dist.py:33-43).
"""

from __future__ import annotations

import glob
import os
import re
from typing import Any, Dict, Optional

import numpy as np

from vlp_tpu.config import VLPConfig


# ---------------------------------------------------------------------------
# torch .bin -> numpy state dict + surgery
# ---------------------------------------------------------------------------

def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return {k: v.detach().numpy() if hasattr(v, "detach") else np.asarray(v)
            for k, v in sd.items()}


def apply_surgery(sd: Dict[str, np.ndarray], cfg: VLPConfig,
                  task_idx: Optional[int] = None) -> Dict[str, np.ndarray]:
    """Rename + reshape a reference state dict to match ``cfg``."""
    out = {}
    for k, v in sd.items():
        k = k.replace("gamma", "weight").replace("beta", "bias")
        out[k] = np.asarray(v)
    sd = out

    _k = "bert.embeddings.token_type_embeddings.weight"
    if _k in sd and sd[_k].shape[0] != cfg.type_vocab_size:
        old = sd[_k]
        if cfg.type_vocab_size > old.shape[0]:
            new = np.zeros((cfg.type_vocab_size, old.shape[1]), old.dtype)
            new[:old.shape[0]] = old
            if cfg.type_vocab_size >= 6:
                new[2] = old[0]   # L2R
                new[3] = old[0]   # R2L
                new[4] = old[0]   # S2S source
                new[5] = old[1]   # S2S target
            sd[_k] = new
        else:
            sd[_k] = old[:cfg.type_vocab_size]

    _k = "bert.embeddings.position_embeddings.weight"
    if _k in sd and sd[_k].shape[0] != cfg.max_position_embeddings:
        old = sd[_k]
        if cfg.max_position_embeddings > old.shape[0]:
            reps = -(-cfg.max_position_embeddings // old.shape[0])
            sd[_k] = np.concatenate([old] * reps)[:cfg.max_position_embeddings]
        else:
            sd[_k] = old[:cfg.max_position_embeddings]

    _k = "cls.predictions.transform.dense.weight"
    r = max(cfg.relax_projection, 1)
    H = cfg.hidden_size
    if _k in sd and sd[_k].shape[0] != r * H:
        n_state = sd[_k].shape[0] // H
        assert (n_state == 1) != (r == 1), (n_state, r)
        vec_keys = ("cls.predictions.transform.dense.bias",
                    "cls.predictions.transform.LayerNorm.weight",
                    "cls.predictions.transform.LayerNorm.bias")
        if n_state == 1:      # replicate 1 -> r
            sd[_k] = np.tile(sd[_k], (r, 1))
            for vk in vec_keys:
                sd[vk] = np.tile(sd[vk], r)
        else:                 # select r -> 1
            ti = task_idx if task_idx is not None and 0 <= task_idx <= 3 else 0
            sd[_k] = sd[_k].reshape(n_state, H, H)[ti]
            for vk in vec_keys:
                sd[vk] = sd[vk].reshape(n_state, H)[ti]
    return sd


# torch name -> (flax path, transpose?)
def _torch_to_flax_map(cfg: VLPConfig) -> Dict[str, tuple]:
    m: Dict[str, tuple] = {
        "bert.embeddings.word_embeddings.weight":
            (("embeddings", "word_embeddings", "embedding"), False),
        "bert.embeddings.position_embeddings.weight":
            (("embeddings", "position_embeddings", "embedding"), False),
        "bert.embeddings.token_type_embeddings.weight":
            (("embeddings", "token_type_embeddings", "embedding"), False),
        "bert.embeddings.LayerNorm.weight":
            (("embeddings", "LayerNorm", "scale"), False),
        "bert.embeddings.LayerNorm.bias":
            (("embeddings", "LayerNorm", "bias"), False),
        "bert.pooler.dense.weight": (("pooler_dense", "kernel"), True),
        "bert.pooler.dense.bias": (("pooler_dense", "bias"), False),
        "cls.predictions.transform.dense.weight":
            (("mlm", "transform_dense", "kernel"), True),
        "cls.predictions.transform.dense.bias":
            (("mlm", "transform_dense", "bias"), False),
        "cls.predictions.transform.LayerNorm.weight":
            (("mlm", "transform_ln", "scale"), False),
        "cls.predictions.transform.LayerNorm.bias":
            (("mlm", "transform_ln", "bias"), False),
        "cls.predictions.bias": (("mlm", "bias"), False),
        "vis_embed.0.weight": (("vis_fc1", "kernel"), True),
        "vis_embed.0.bias": (("vis_fc1", "bias"), False),
        "vis_embed.2.weight": (("vis_fc2", "kernel"), True),
        "vis_embed.2.bias": (("vis_fc2", "bias"), False),
        "vis_pe_embed.0.weight": (("vis_pe_fc", "kernel"), True),
        "vis_pe_embed.0.bias": (("vis_pe_fc", "bias"), False),
        "ans_classifier.0.weight": (("ans_fc1", "kernel"), True),
        "ans_classifier.0.bias": (("ans_fc1", "bias"), False),
        "ans_classifier.2.weight": (("ans_fc2", "kernel"), True),
        "ans_classifier.2.bias": (("ans_fc2", "bias"), False),
    }
    for i in range(cfg.num_hidden_layers):
        p = f"bert.encoder.layer.{i}."
        li = f"layer_{i}"
        for tname, fname in (("attention.self.query", "q_proj"),
                             ("attention.self.key", "k_proj"),
                             ("attention.self.value", "v_proj"),
                             ("attention.output.dense", "out_proj"),
                             ("intermediate.dense", "ffn_in"),
                             ("output.dense", "ffn_out")):
            m[p + tname + ".weight"] = ((li, fname, "kernel"), True)
            m[p + tname + ".bias"] = ((li, fname, "bias"), False)
        m[p + "attention.output.LayerNorm.weight"] = ((li, "attn_ln", "scale"),
                                                      False)
        m[p + "attention.output.LayerNorm.bias"] = ((li, "attn_ln", "bias"),
                                                    False)
        m[p + "output.LayerNorm.weight"] = ((li, "ffn_ln", "scale"), False)
        m[p + "output.LayerNorm.bias"] = ((li, "ffn_ln", "bias"), False)
    return m


def torch_to_params(sd: Dict[str, np.ndarray], cfg: VLPConfig,
                    params_template: Dict[str, Any],
                    task_idx: Optional[int] = None,
                    strict: bool = False) -> Dict[str, Any]:
    """Convert a reference state dict into a flax params tree.

    Keys absent from the checkpoint keep the template's (fresh) values —
    matching the reference behavior where vis_embed / ans_classifier are not
    in BERT checkpoints (modeling.py:1001 'will not be initialized').
    """
    import copy

    sd = apply_surgery(sd, cfg, task_idx)
    mapping = _torch_to_flax_map(cfg)
    params = copy.deepcopy(jax_tree_to_numpy(params_template))
    missing, unexpected = [], []
    for tk, (path, transpose) in mapping.items():
        if tk not in sd:
            missing.append(tk)
            continue
        v = sd.pop(tk)
        if transpose:
            v = v.T
        node = params
        for p in path[:-1]:
            node = node[p]
        want = node[path[-1]].shape
        assert v.shape == want, f"{tk}: {v.shape} != {want}"
        node[path[-1]] = v.astype(node[path[-1]].dtype)
    unexpected = [k for k in sd
                  if not k.startswith("cls.predictions.decoder")]  # tied
    if strict and (missing or unexpected):
        raise ValueError(f"missing={missing} unexpected={unexpected}")
    return params


# reference legacy-head parameter names (modeling.py:878-978, 1497-1966)
# -> flax paths inside the heads_legacy modules.  The two structurally
# divergent heads are intentionally absent: BertForExtractiveSummarization
# (reference uses a secondary 2-row embedding + a second BertPreTrainingHeads,
# modeling.py:1500-1504; here a single extract dense) — capability-only.
LEGACY_HEAD_MAP: Dict[str, tuple] = {
    "cls.seq_relationship.weight": (("seq_relationship", "kernel"), True),
    "cls.seq_relationship.bias": (("seq_relationship", "bias"), False),
    "classifier.weight": (("classifier", "kernel"), True),
    "classifier.bias": (("classifier", "bias"), False),
    "qa_outputs.weight": (("qa_outputs", "kernel"), True),
    "qa_outputs.bias": (("qa_outputs", "bias"), False),
    "R_xy.dense.weight": (("pair_dense", "kernel"), True),
    "R_xy.dense.bias": (("pair_dense", "bias"), False),
    "rel_emb.weight": (("rel_emb", "embedding"), False),
}


def _tree_get(tree, path):
    node = tree
    for p in path:
        if not isinstance(node, dict) or p not in node:
            return None
        node = node[p]
    return node


def _tree_set(tree, path, value):
    node = tree
    for p in path[:-1]:
        node = node[p]
    node[path[-1]] = value


def _legacy_mapping(cfg: VLPConfig, params_template) -> Dict[str, tuple]:
    """torch name -> (flax path, transpose) for a heads_legacy module:
    backbone keys under ('backbone', 'vlp') plus whichever LEGACY_HEAD_MAP
    paths exist in this head's template."""
    m = {tk: ((("backbone", "vlp") + path), t)
         for tk, (path, t) in _torch_to_flax_map(cfg).items()}
    for tk, (path, t) in LEGACY_HEAD_MAP.items():
        if _tree_get(params_template, path) is not None:
            m[tk] = (path, t)
    return m


def torch_to_legacy_head_params(sd: Dict[str, np.ndarray], cfg: VLPConfig,
                                params_template: Dict[str, Any],
                                task_idx: Optional[int] = None
                                ) -> Dict[str, Any]:
    """Load a reference-named legacy-head checkpoint (BertForPreTraining,
    BertForSequenceClassification, BertForQuestionAnswering, ... —
    modeling.py:878-978, 1497-1966) into a ``models.heads_legacy`` module's
    param tree.  Backbone keys go through the same surgery as the VLP path;
    head keys follow LEGACY_HEAD_MAP; anything absent from the checkpoint
    keeps the template's fresh values (reference from_pretrained
    semantics)."""
    import copy

    sd = apply_surgery(sd, cfg, task_idx)
    params = copy.deepcopy(jax_tree_to_numpy(params_template))
    for tk, (path, transpose) in _legacy_mapping(cfg, params).items():
        if tk not in sd:
            continue
        tpl = _tree_get(params, path)
        if tpl is None:
            continue  # this head doesn't have the (backbone) submodule
        v = sd[tk].T if transpose else sd[tk]
        assert v.shape == tpl.shape, f"{tk}: {v.shape} != {tpl.shape}"
        _tree_set(params, path, v.astype(tpl.dtype))
    return params


def legacy_head_params_to_torch(params: Dict[str, Any], cfg: VLPConfig
                                ) -> Dict[str, np.ndarray]:
    """Reverse: heads_legacy params -> reference-named state dict."""
    params = jax_tree_to_numpy(params)
    out: Dict[str, np.ndarray] = {}
    for tk, (path, transpose) in _legacy_mapping(cfg, params).items():
        v = _tree_get(params, path)
        if v is None:
            continue
        out[tk] = np.asarray(v).T if transpose else np.asarray(v)
    return out


def params_to_torch(params: Dict[str, Any], cfg: VLPConfig
                    ) -> Dict[str, np.ndarray]:
    """Reverse mapping: flax params -> reference-format state dict (so
    checkpoints trained here load in the reference stack)."""
    params = jax_tree_to_numpy(params)
    out: Dict[str, np.ndarray] = {}
    for tk, (path, transpose) in _torch_to_flax_map(cfg).items():
        node = params
        ok = True
        for p in path:
            if not isinstance(node, dict) or p not in node:
                ok = False
                break
            node = node[p]
        if not ok:
            continue
        v = np.asarray(node)
        out[tk] = v.T if transpose else v
    if "embeddings" in params:
        out["cls.predictions.decoder.weight"] = np.asarray(
            params["embeddings"]["word_embeddings"]["embedding"])
    return out


def jax_tree_to_numpy(tree):
    import jax

    def to_np(x):
        if isinstance(x, jax.Array) and not x.is_fully_addressable \
                and not x.is_fully_replicated:
            # multi-process tensor parallelism: the value is sharded over a
            # within-host 'model' axis and replicated over the cross-host
            # 'data' axis, so THIS host's addressable shards cover the full
            # array even though np.asarray refuses (shards also live on
            # other hosts).  Assemble from the addressable shards; fail
            # loudly if they genuinely don't cover the value.
            out = np.empty(x.shape, x.dtype)
            seen = np.zeros(x.shape, bool)
            for sh in x.addressable_shards:
                out[sh.index] = np.asarray(sh.data)
                seen[sh.index] = True
            assert seen.all(), (
                "checkpoint save needs every shard addressable on this "
                "host (shard params over a within-host mesh axis)")
            return out
        return np.asarray(x)

    return jax.tree_util.tree_map(to_np, tree)


# ---------------------------------------------------------------------------
# orbax-based native checkpoints
# ---------------------------------------------------------------------------

_CKPTR = None  # shared StandardCheckpointer (async under the hood)


def _checkpointer():
    global _CKPTR
    if _CKPTR is None:
        import jax
        import orbax.checkpoint as ocp
        if jax.process_count() > 1:
            # checkpoints are written by process 0 ONLY (cli/train.py
            # mirrors the reference's rank-0 torch.save,
            # run_img2txt_dist.py:588-599); the default checkpointer runs
            # cross-process barriers inside save, which mismatches against
            # hosts that never call it — scope the barrier set to process 0
            _CKPTR = ocp.AsyncCheckpointer(
                ocp.StandardCheckpointHandler(),
                multiprocessing_options=ocp.options.MultiprocessingOptions(
                    primary_host=0, active_processes={0},
                    barrier_sync_key_prefix="proc0ckpt"))
        else:
            _CKPTR = ocp.StandardCheckpointer()
    return _CKPTR


def wait_for_saves():
    """Block until all in-flight async checkpoint writes have committed.
    Call before process exit / before reading back a just-written ckpt."""
    if _CKPTR is not None:
        _CKPTR.wait_until_finished()


def save_checkpoint(output_dir: str, epoch: int, state, keep_optimizer=True,
                    wait: bool = True):
    """Write model.{epoch} (+ optim.{epoch}) under output_dir
    (run_img2txt_dist.py:588-599 naming, orbax format).

    ``wait=False`` returns as soon as the host snapshot is taken and lets
    orbax commit to disk in the background (training continues; a
    subsequent save or ``wait_for_saves()`` joins the writer)."""
    ckptr = _checkpointer()
    path = os.path.abspath(os.path.join(output_dir, f"model.{epoch}"))
    ckptr.save(path, jax_tree_to_numpy(state.params), force=True)
    if keep_optimizer:
        opath = os.path.abspath(os.path.join(output_dir, f"optim.{epoch}"))
        opt_tree = {"m": state.opt_state.m, "v": state.opt_state.v,
                    "step": state.opt_state.step}
        if getattr(state, "loss_scale", None) is not None:
            # true-fp16 runs persist the dynamic-loss-scale state, like the
            # reference FP16_Optimizer_State (optimization_fp16.py:17-80)
            opt_tree["loss_scale"] = state.loss_scale
        ckptr.save(opath, jax_tree_to_numpy(opt_tree), force=True)
    if wait:
        ckptr.wait_until_finished()


# -- step-level checkpoints (an extension over the reference's per-epoch
#    recovery, run_img2txt_dist.py:33-43): model.s{N}/optim.s{N} written
#    every --save_steps optimizer steps, pruned to the latest few, resumed
#    mid-epoch by skipping already-consumed loader batches.

_STEP_RE = re.compile(r"\.s(\d+)$")


def save_step_checkpoint(output_dir: str, step: int, state,
                         keep: int = 2) -> None:
    """Async-write model.s{step}/optim.s{step}; prune older step ckpts
    beyond ``keep``.  Pruning only touches saves that have already
    committed (the shared checkpointer serialises in-flight writes)."""
    import shutil
    save_checkpoint(output_dir, f"s{step}", state, wait=False)
    # the just-issued save is still in flight (not yet on disk), so count
    # it explicitly; anything older has committed (the shared checkpointer
    # serialises saves) and is safe to delete
    steps = sorted(_list_step_checkpoints(output_dir) | {step})
    for old in steps[:-keep]:
        if old == step:
            continue
        for prefix in ("model", "optim"):
            p = os.path.join(output_dir, f"{prefix}.s{old}")
            shutil.rmtree(p, ignore_errors=True)


def _list_step_checkpoints(output_dir: str):
    models = set()
    optims = set()
    for p in glob.glob(os.path.join(output_dir, "model.s*")) + glob.glob(
            os.path.join(output_dir, "optim.s*")):
        m = _STEP_RE.search(p)
        if m:
            # classify on the basename: an output_dir whose PATH contains
            # '/model.' (e.g. runs/model.v2) must not swallow optim.s* paths
            (models if os.path.basename(p).startswith("model.")
             else optims).add(int(m.group(1)))
    return models & optims


def get_latest_step_checkpoint(output_dir: str) -> Optional[int]:
    """Largest step N with BOTH model.sN and optim.sN present."""
    both = _list_step_checkpoints(output_dir)
    return max(both) if both else None


def restore_params(path: str, params_template):
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path),
                         jax_tree_to_numpy(params_template))


def restore_optimizer(path: str, opt_template, loss_scale_template=None):
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    tpl = {"m": jax_tree_to_numpy(opt_template.m),
           "v": jax_tree_to_numpy(opt_template.v),
           "step": np.asarray(opt_template.step)}
    if loss_scale_template is not None:
        # true-fp16 runs also round-trip the dynamic-loss-scale state
        tpl["loss_scale"] = jax_tree_to_numpy(loss_scale_template)
    return ckptr.restore(os.path.abspath(path), tpl)


def get_max_epoch_model(output_dir: str) -> Optional[int]:
    """Largest epoch with BOTH model.N and optim.N present
    (run_img2txt_dist.py:33-43)."""
    models = {int(re.search(r"model\.(\d+)$", p).group(1))
              for p in glob.glob(os.path.join(output_dir, "model.*"))
              if re.search(r"model\.(\d+)$", p)}
    optims = {int(re.search(r"optim\.(\d+)$", p).group(1))
              for p in glob.glob(os.path.join(output_dir, "optim.*"))
              if re.search(r"optim\.(\d+)$", p)}
    both = models & optims
    return max(both) if both else None


def _relax_select_tree(params, H: int, task_idx: int):
    """Collapse a relax-projection MLM head (r heads) to head ``task_idx``:
    select rows of transform_dense kernel/bias and transform_ln scale/bias.
    The orbax analogue of the reference from_pretrained select surgery
    (modeling.py:704-732) — note the collapsed head then LayerNorms over H
    dims (the reference decoder's post-surgery math), NOT over r*H as the
    training forward does."""
    mlm = dict(params["mlm"])
    td = dict(mlm["transform_dense"])
    k = np.asarray(td["kernel"])                     # [H, r*H]
    r = k.shape[1] // H
    ti = task_idx if 0 <= task_idx < r else 0
    td["kernel"] = k.reshape(H, r, H)[:, ti, :]
    td["bias"] = np.asarray(td["bias"]).reshape(r, H)[ti]
    ln = dict(mlm["transform_ln"])
    ln["scale"] = np.asarray(ln["scale"]).reshape(r, H)[ti]
    ln["bias"] = np.asarray(ln["bias"]).reshape(r, H)[ti]
    mlm["transform_dense"] = td
    mlm["transform_ln"] = ln
    out = dict(params)
    out["mlm"] = mlm
    return out


def _relax_tile_tree(params, H: int, r: int):
    """Expand a collapsed MLM head (1 head) to ``r`` heads by replication —
    the orbax analogue of the reference from_pretrained n_state_relax==1
    branch (modeling.py:704-720 repeats the single head r times)."""
    mlm = dict(params["mlm"])
    td = dict(mlm["transform_dense"])
    k = np.asarray(td["kernel"])                     # [H, H]
    td["kernel"] = np.tile(k, (1, r))
    td["bias"] = np.tile(np.asarray(td["bias"]), r)
    ln = dict(mlm["transform_ln"])
    ln["scale"] = np.tile(np.asarray(ln["scale"]), r)
    ln["bias"] = np.tile(np.asarray(ln["bias"]), r)
    mlm["transform_dense"] = td
    mlm["transform_ln"] = ln
    out = dict(params)
    out["mlm"] = mlm
    return out


def load_model_checkpoint(path: str, cfg: VLPConfig, params_template,
                          task_idx: Optional[int] = None):
    """Load either an orbax dir or a reference torch .bin.

    Relax-projection mismatch on the orbax path: a checkpoint trained with
    relax_projection=r restores into a collapsed (relax=0) template by
    selecting head ``task_idx`` — the same surgery the reference's decoder
    from_pretrained applies to .bin files (modeling.py:704-732), so
    decoding our own multi-head training checkpoints follows the exact
    reference decode semantics."""
    if os.path.isdir(path):
        restored = restore_params(path, jax_tree_to_numpy(params_template))
        if "mlm" in restored:
            H = cfg.hidden_size
            want = params_template["mlm"]["transform_dense"]["kernel"].shape
            got = np.asarray(
                restored["mlm"]["transform_dense"]["kernel"]).shape
            # orbax restores the STORED shapes even when the template
            # disagrees — adapt multi-head -> collapsed (select) and
            # collapsed -> multi-head (tile) here
            if want[1] == H and got[1] != H:
                restored = _relax_select_tree(
                    restored, H, task_idx if task_idx is not None else 0)
            elif want[1] != H and got[1] == H:
                restored = _relax_tile_tree(restored, H, want[1] // H)
        return restored
    sd = load_torch_state_dict(path)
    return torch_to_params(sd, cfg, params_template, task_idx)
