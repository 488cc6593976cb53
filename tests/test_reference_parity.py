"""End-to-end numerical parity against the ACTUAL reference implementation.

Loads /root/reference/pytorch_pretrained_bert/modeling.py (module file,
bypassing the package __init__), instantiates the real
``BertForPreTrainingLossMask`` with random weights, converts its state dict
through vlp_tpu.checkpoint, and compares:

  * masked-LM loss (CE and label-smoothing variants, incl. drop-worst)
  * Selfie-like region-pretext loss
  * VQA2 loss and vqa_inference answer ids

on identical inputs.  This validates the whole model + loss + converter
stack against the reference code itself (not a re-derivation).  Skipped when
the reference tree is not mounted.
"""

import importlib.util
import os
import pickle
import sys
import types

import numpy as np
import pytest

REF_DIR = "/root/reference/pytorch_pretrained_bert"

pytestmark = pytest.mark.skipif(
    not os.path.isfile(os.path.join(REF_DIR, "modeling.py")),
    reason="reference tree not mounted")


@pytest.fixture(scope="module")
def ref_modeling(tmp_path_factory):
    import torch
    for name in ("boto3", "requests"):
        sys.modules.setdefault(name, types.ModuleType(name))
    exc = types.ModuleType("botocore.exceptions")
    exc.ClientError = Exception
    sys.modules.setdefault("botocore", types.ModuleType("botocore"))
    sys.modules.setdefault("botocore.exceptions", exc)
    pkg = types.ModuleType("ref_ppb2")
    pkg.__path__ = [REF_DIR]
    sys.modules.setdefault("ref_ppb2", pkg)
    for mod in ("file_utils", "loss", "modeling"):
        spec = importlib.util.spec_from_file_location(
            f"ref_ppb2.{mod}", os.path.join(REF_DIR, f"{mod}.py"))
        m = importlib.util.module_from_spec(spec)
        sys.modules[f"ref_ppb2.{mod}"] = m
        spec.loader.exec_module(m)

    # the reference targets torch 1.1: byte masks for masked_fill
    _orig_masked_fill = torch.Tensor.masked_fill

    def _mf(self, mask, value):
        if mask.dtype == torch.uint8:
            mask = mask.bool()
        return _orig_masked_fill(self, mask, value)

    torch.Tensor.masked_fill = _mf

    # ...and torch-1.1 integer division semantics for torch.div
    # (modeling.py:1317 back_ptrs = torch.div(k_ids, K))
    _orig_div = torch.div

    def _div(a, b, *args, **kw):
        if (not kw and not args and isinstance(a, torch.Tensor)
                and a.dtype in (torch.int32, torch.int64)
                and isinstance(b, int)):
            return _orig_div(a, b, rounding_mode="floor")
        return _orig_div(a, b, *args, **kw)

    torch.div = _div

    # the reference hard-requires detectron fc7 pickles in cwd
    # (modeling.py:1008-1014); provide random ones
    d = tmp_path_factory.mktemp("detectron")
    w = np.random.default_rng(0).normal(
        scale=0.02, size=(2048, 2048)).astype(np.float32)
    b = np.zeros(2048, np.float32)
    os.makedirs(d / "detectron_weights", exist_ok=True)
    with open(d / "detectron_weights" / "fc7_w.pkl", "wb") as f:
        pickle.dump(w, f)
    with open(d / "detectron_weights" / "fc7_b.pkl", "wb") as f:
        pickle.dump(b, f)
    old = os.getcwd()
    os.chdir(d)
    yield sys.modules["ref_ppb2.modeling"]
    os.chdir(old)


@pytest.fixture(scope="module")
def ref_optimization(ref_modeling):
    """The reference's actual BertAdam (optimization.py), loaded the same
    way as modeling.py.  ``torch._six`` (removed in torch 2.x) is shimmed to
    ``collections.abc``, the only member the module uses."""
    import collections.abc

    six = types.ModuleType("torch._six")
    six.container_abcs = collections.abc
    sys.modules.setdefault("torch._six", six)
    spec = importlib.util.spec_from_file_location(
        "ref_ppb2.optimization", os.path.join(REF_DIR, "optimization.py"))
    m = importlib.util.module_from_spec(spec)
    sys.modules["ref_ppb2.optimization"] = m
    spec.loader.exec_module(m)
    return m


def _vlp_cfg(label_smoothing=0.0):
    from vlp_tpu.config import VLPConfig
    return VLPConfig(
        vocab_size=64, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=48,
        type_vocab_size=6, relax_projection=4, label_smoothing=label_smoothing,
        len_vis_input=100, max_len_b=20, max_pred=5,
        hidden_dropout_prob=0.1, attention_probs_dropout_prob=0.1,
        dtype="float32", use_pallas_attention=False)


def _make_inputs(cfg, B, rng, n_vis_masked=25):
    prefix = cfg.prefix_len
    L = cfg.seq_len
    nb = 6
    ids = np.zeros((B, L), np.int64)
    ids[:, 0] = 3
    ids[:, 1:101] = 1
    ids[:, 101] = 4
    ids[:, prefix:prefix + nb] = rng.integers(6, cfg.vocab_size, (B, nb))
    ids[:, prefix + nb] = 4
    seg = np.zeros((B, L), np.int64)
    seg[:, :prefix] = 4
    seg[:, prefix:prefix + nb + 1] = 5
    text_end = np.full((B,), prefix + nb + 1, np.int32)
    mode = np.array([1, 0] * (B // 2), np.int32)[:B]
    masked_pos = np.stack([rng.permutation(np.arange(prefix, prefix + nb))
                           [:cfg.max_pred] for _ in range(B)])
    n_real = 3
    masked_pos[:, n_real:] = 0
    masked_ids = rng.integers(6, cfg.vocab_size, (B, cfg.max_pred))
    masked_ids[:, n_real:] = 0
    masked_weights = np.zeros((B, cfg.max_pred), np.float32)
    masked_weights[:, :n_real] = 1
    vis_masked = np.stack([rng.choice(100, n_vis_masked, replace=False) + 1
                           for _ in range(B)])
    vis_keep = np.ones((B, 100), np.float32)
    for b in range(B):
        vis_keep[b, vis_masked[b] - 1] = 0
    vis_feats = rng.normal(size=(B, 100, 2048)).astype(np.float32)
    vis_pe = rng.normal(size=(B, 100, 1607)).astype(np.float32)
    task_idx = np.where(mode == 1, 3, 0).astype(np.int64)
    return dict(ids=ids, seg=seg, text_end=text_end, mode=mode,
                masked_pos=masked_pos, masked_ids=masked_ids,
                masked_weights=masked_weights, vis_masked=vis_masked,
                vis_keep=vis_keep, vis_feats=vis_feats, vis_pe=vis_pe,
                task_idx=task_idx)


def _build_pair(ref_modeling, cfg, tasks="img2txt"):
    """Reference model (random init) + converted vlp_tpu params."""
    import jax
    import torch
    from vlp_tpu import checkpoint as ckpt
    from vlp_tpu.models.model import VLPModel
    from vlp_tpu.parallel import train_step as ts

    torch.manual_seed(0)
    ref_cfg = ref_modeling.BertConfig(
        vocab_size_or_config_json_file=cfg.vocab_size,
        hidden_size=cfg.hidden_size,
        num_hidden_layers=cfg.num_hidden_layers,
        num_attention_heads=cfg.num_attention_heads,
        intermediate_size=cfg.intermediate_size,
        hidden_dropout_prob=cfg.hidden_dropout_prob,
        attention_probs_dropout_prob=cfg.attention_probs_dropout_prob,
        type_vocab_size=cfg.type_vocab_size,
        relax_projection=cfg.relax_projection,
        label_smoothing=cfg.label_smoothing or None,
        fp32_embedding=False)
    ref = ref_modeling.BertForPreTrainingLossMask(
        ref_cfg, enable_butd=True, len_vis_input=100, tasks=tasks)
    ref.eval()

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    model = VLPModel(cfg, with_vqa=(tasks == "vqa2"))
    tpl = ts.init_params(model, cfg, jax.random.PRNGKey(1), task=tasks)
    params = ckpt.torch_to_params(dict(sd), cfg, tpl)
    return ref, model, params


@pytest.mark.parametrize("label_smoothing,drop_worst",
                         [(0.0, 0.0), (0.1, 0.0), (0.0, 0.25)])
def test_img2txt_loss_parity(ref_modeling, rng, label_smoothing, drop_worst):
    import jax.numpy as jnp
    import torch
    from vlp_tpu.models.model import VLPModel
    from vlp_tpu.ops.masks import visibility

    cfg = _vlp_cfg(label_smoothing)
    ref, model, params = _build_pair(ref_modeling, cfg)
    B = 4
    x = _make_inputs(cfg, B, rng)

    # the reference pipeline's masked-region column blocking is a no-op
    # (seq2seq_loader.py:303-304 writes to an indexing copy) — the actual
    # attention mask never blocks region columns
    vis = np.asarray(visibility(
        jnp.asarray(x["mode"]), jnp.asarray(x["text_end"]),
        jnp.asarray(np.ones_like(x["vis_keep"])), cfg.prefix_len,
        cfg.seq_len))

    with torch.no_grad():
        mlm_loss, pretext, vqa_loss = ref(
            torch.from_numpy(x["vis_feats"]), torch.from_numpy(x["vis_pe"]),
            torch.from_numpy(x["ids"]), torch.from_numpy(x["seg"]),
            torch.from_numpy(vis.astype(np.float32)),
            torch.from_numpy(x["masked_ids"]).long(), None,
            torch.full((B,), -1).long(),
            masked_pos=torch.from_numpy(x["masked_pos"]).long(),
            masked_weights=torch.from_numpy(x["masked_weights"]),
            task_idx=torch.from_numpy(x["task_idx"]),
            vis_masked_pos=torch.from_numpy(x["vis_masked"]).long(),
            mask_image_regions=True, drop_worst_ratio=drop_worst)

    batch = dict(
        input_ids=jnp.asarray(x["ids"], jnp.int32),
        segment_ids=jnp.asarray(x["seg"], jnp.int32),
        mode=jnp.asarray(x["mode"]), text_end=jnp.asarray(x["text_end"]),
        vis_keep=jnp.asarray(x["vis_keep"]),
        vis_masked_pos=jnp.asarray(x["vis_masked"], jnp.int32),
        masked_pos=jnp.asarray(x["masked_pos"], jnp.int32),
        masked_ids=jnp.asarray(x["masked_ids"], jnp.int32),
        masked_weights=jnp.asarray(x["masked_weights"]),
        task_idx=jnp.asarray(x["task_idx"], jnp.int32),
        vis_feats=jnp.asarray(x["vis_feats"]),
        vis_pe=jnp.asarray(x["vis_pe"]))
    out = model.apply({"params": params}, batch, deterministic=True,
                      drop_worst_ratio=drop_worst, mask_image_regions=True,
                      task="img2txt", method=VLPModel.pretrain_losses)

    np.testing.assert_allclose(float(out["masked_lm_loss"]),
                               float(mlm_loss), rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(float(out["pretext_loss"]), float(pretext),
                               rtol=2e-3, atol=2e-4)


def test_vqa_parity(ref_modeling, rng):
    import jax.numpy as jnp
    import torch
    from vlp_tpu.models.model import VLPModel
    from vlp_tpu.ops.masks import visibility

    cfg = _vlp_cfg()
    ref, model, params = _build_pair(ref_modeling, cfg, tasks="vqa2")
    B = 4
    x = _make_inputs(cfg, B, rng)
    x["mode"][:] = 0  # bi mode for VQA
    x["task_idx"][:] = 0
    ans = np.zeros((B, 3129), np.float32)
    ans[np.arange(B), rng.integers(1, 3129, B)] = 1.0

    vis = np.asarray(visibility(
        jnp.asarray(x["mode"]), jnp.asarray(x["text_end"]),
        jnp.asarray(np.ones((B, 100), np.float32)), cfg.prefix_len,
        cfg.seq_len))

    with torch.no_grad():
        _, _, ref_vqa_loss = ref(
            torch.from_numpy(x["vis_feats"]), torch.from_numpy(x["vis_pe"]),
            torch.from_numpy(x["ids"]), torch.from_numpy(x["seg"]),
            torch.from_numpy(vis.astype(np.float32)),
            torch.from_numpy(x["masked_ids"]).long(),
            torch.from_numpy(ans),
            torch.full((B,), -1).long(),
            masked_pos=torch.from_numpy(x["masked_pos"]).long(),
            masked_weights=torch.from_numpy(x["masked_weights"]),
            task_idx=torch.from_numpy(x["task_idx"]),
            mask_image_regions=False, drop_worst_ratio=0.0)
        ref_ans = ref(
            torch.from_numpy(x["vis_feats"]), torch.from_numpy(x["vis_pe"]),
            torch.from_numpy(x["ids"]), torch.from_numpy(x["seg"]),
            torch.from_numpy(vis.astype(np.float32)),
            None, None, None, vqa_inference=True)

    batch = dict(
        input_ids=jnp.asarray(x["ids"], jnp.int32),
        segment_ids=jnp.asarray(x["seg"], jnp.int32),
        mode=jnp.asarray(x["mode"]), text_end=jnp.asarray(x["text_end"]),
        vis_keep=jnp.asarray(np.ones((B, 100), np.float32)),
        vis_masked_pos=jnp.asarray(x["vis_masked"], jnp.int32),
        masked_pos=jnp.asarray(x["masked_pos"], jnp.int32),
        masked_ids=jnp.asarray(x["masked_ids"], jnp.int32),
        masked_weights=jnp.asarray(x["masked_weights"]),
        task_idx=jnp.asarray(x["task_idx"], jnp.int32),
        vis_feats=jnp.asarray(x["vis_feats"]),
        vis_pe=jnp.asarray(x["vis_pe"]),
        ans_scores=jnp.asarray(ans))
    out = model.apply({"params": params}, batch, deterministic=True,
                      drop_worst_ratio=0.0, mask_image_regions=False,
                      task="vqa2", method=VLPModel.pretrain_losses)
    ours_ans = model.apply({"params": params}, batch,
                           method=VLPModel.vqa_inference)

    np.testing.assert_allclose(float(out["vqa2_loss"]),
                               float(ref_vqa_loss), rtol=2e-3, atol=2e-4)
    np.testing.assert_array_equal(np.asarray(ours_ans),
                                  ref_ans.numpy())


class TestTrainingEquivalence:
    """N-step training-trajectory equivalence against the ACTUAL reference
    stack — the strongest in-environment proxy for the <=0.5-CIDEr quality
    gate (BASELINE.md): real COCO features don't exist here, but if N
    optimizer steps of vlp_tpu stay on the reference's loss curve from the
    same init on the same batches, quality parity follows from the proven
    decode parity rather than from composition arguments.

    Covers the full reference hot loop (run_img2txt_dist.py:453-586): the
    actual ``BertForPreTrainingLossMask`` forward + backward + the actual
    ``BertAdam`` (optimization.py:112-182, incl. the no-decay param groups
    of run_img2txt_dist.py:394-401) vs vlp_tpu's jitted train step with
    ``optim.bert_adam``, both fp32, dropout 0.  Batches cycle so the loss
    genuinely descends (memorization), then both final models beam-decode
    (beam 5) identical captions."""

    N_STEPS = 40
    LR = 1e-4

    def test_nstep_curve_and_final_decode(self, ref_modeling,
                                          ref_optimization, rng):
        import jax
        import jax.numpy as jnp
        import torch
        from vlp_tpu import checkpoint as ckpt
        from vlp_tpu.decode import DecodeParams, Decoder
        from vlp_tpu.models.model import VLPModel
        from vlp_tpu.ops.masks import visibility
        from vlp_tpu.parallel import train_step as ts

        N, B = self.N_STEPS, 4
        cfg = _vlp_cfg().replace(relax_projection=0,
                                 hidden_dropout_prob=0.0,
                                 attention_probs_dropout_prob=0.0)
        ref, model, params0 = _build_pair(ref_modeling, cfg)
        ref.train()

        # --- reference optimizer, exactly as the train CLI builds it ------
        no_decay = ["bias", "LayerNorm.bias", "LayerNorm.weight"]
        named = list(ref.named_parameters())
        groups = [
            {"params": [p for n, p in named
                        if not any(nd in n for nd in no_decay)],
             "weight_decay": 0.01},
            {"params": [p for n, p in named
                        if any(nd in n for nd in no_decay)],
             "weight_decay": 0.0},
        ]
        ref_opt = ref_optimization.BertAdam(
            groups, lr=self.LR, warmup=0.1, t_total=N,
            schedule="warmup_linear")

        # --- vlp_tpu optimizer + jitted step from the converted init ------
        tx = ts.make_optimizer(cfg, params0, lr=self.LR, warmup=0.1,
                               t_total=N, schedule="warmup_linear",
                               weight_decay=0.01)
        state = ts.TrainState(params=params0, opt_state=tx.init(params0),
                              step=jnp.zeros((), jnp.int32))
        step_fn = jax.jit(ts.make_train_step(model, tx,
                                             mask_image_regions=True))

        # --- shared fixture batches (cycled -> the loss actually descends)
        raw = [_make_inputs(cfg, B, rng) for _ in range(5)]
        batches = []
        for x in raw:
            vis = np.asarray(visibility(
                jnp.asarray(x["mode"]), jnp.asarray(x["text_end"]),
                jnp.asarray(np.ones_like(x["vis_keep"])), cfg.prefix_len,
                cfg.seq_len))
            jb = dict(
                input_ids=jnp.asarray(x["ids"], jnp.int32),
                segment_ids=jnp.asarray(x["seg"], jnp.int32),
                mode=jnp.asarray(x["mode"]),
                text_end=jnp.asarray(x["text_end"]),
                vis_keep=jnp.asarray(x["vis_keep"]),
                vis_masked_pos=jnp.asarray(x["vis_masked"], jnp.int32),
                masked_pos=jnp.asarray(x["masked_pos"], jnp.int32),
                masked_ids=jnp.asarray(x["masked_ids"], jnp.int32),
                masked_weights=jnp.asarray(x["masked_weights"]),
                task_idx=jnp.asarray(x["task_idx"], jnp.int32),
                vis_feats=jnp.asarray(x["vis_feats"]),
                vis_pe=jnp.asarray(x["vis_pe"]))
            batches.append((x, vis, jb))

        losses_ref, losses_ours = [], []
        key = jax.random.PRNGKey(0)
        for i in range(N):
            x, vis, jb = batches[i % len(batches)]
            mlm, pretext, ans = ref(
                torch.from_numpy(x["vis_feats"]),
                torch.from_numpy(x["vis_pe"]),
                torch.from_numpy(x["ids"]), torch.from_numpy(x["seg"]),
                torch.from_numpy(vis.astype(np.float32)),
                torch.from_numpy(x["masked_ids"]).long(), None,
                torch.full((B,), -1).long(),
                masked_pos=torch.from_numpy(x["masked_pos"]).long(),
                masked_weights=torch.from_numpy(x["masked_weights"]),
                task_idx=torch.from_numpy(x["task_idx"]),
                vis_masked_pos=torch.from_numpy(x["vis_masked"]).long(),
                mask_image_regions=True, drop_worst_ratio=0)
            loss = mlm + pretext + ans
            loss.backward()
            ref_opt.step()
            ref_opt.zero_grad()
            losses_ref.append(float(loss.detach()))

            state, metrics = step_fn(state, jb, jax.random.fold_in(key, i),
                                     0.0)
            losses_ours.append(float(metrics["loss"]))

        losses_ref = np.asarray(losses_ref)
        losses_ours = np.asarray(losses_ours)
        # the two trajectories must agree pointwise along the whole curve
        np.testing.assert_allclose(losses_ours, losses_ref,
                                   rtol=1e-3, atol=1e-4)
        # ...and the curve must be a real training signal, not a flat line:
        # the last visit to each fixture batch beats the first visit
        assert losses_ref[-5:].mean() < losses_ref[:5].mean() - 1e-3

        # --- final weights agree parameter-by-parameter --------------------
        sd_final = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
        tpl = jax.tree_util.tree_map(np.asarray, state.params)
        converted = ckpt.torch_to_params(dict(sd_final), cfg, tpl)
        for (p1, a), (_, b) in zip(
                jax.tree_util.tree_leaves_with_path(converted),
                jax.tree_util.tree_leaves_with_path(tpl)):
            np.testing.assert_allclose(a, b, rtol=1e-3, atol=5e-4,
                                       err_msg=str(p1))

        # --- both trained models beam-decode identically -------------------
        T = 5
        cfg_dec = cfg.replace(max_len_b=T)
        MASK_ID, EOS_ID = 5, 4
        ref_dec = ref_modeling.BertForSeq2SeqDecoder(
            ref.config,
            mask_word_id=MASK_ID, search_beam_size=5, length_penalty=0.5,
            eos_id=EOS_ID, min_len=2, enable_butd=True, len_vis_input=100)
        missing, _ = ref_dec.load_state_dict(
            {k: torch.as_tensor(v) for k, v in sd_final.items()},
            strict=False)
        assert not [m for m in missing
                    if m.startswith(("bert.", "cls.", "vis_"))], missing
        ref_dec.eval()

        helper = TestDecoderParity()
        ids, seg, pos, mask, vf, vp, task = helper._decode_inputs(
            cfg_dec, 3, T, rng)
        with torch.no_grad():
            traces = ref_dec(torch.from_numpy(vf), torch.from_numpy(vp),
                             torch.from_numpy(ids), torch.from_numpy(seg),
                             torch.from_numpy(pos), torch.from_numpy(mask),
                             task_idx=torch.from_numpy(task))
        model_dec = VLPModel(cfg_dec)
        dec = Decoder(model_dec, cfg_dec, DecodeParams(
            mask_id=MASK_ID, eos_id=EOS_ID, beam_size=5,
            length_penalty=0.5, min_len=2, max_tgt_length=T))
        L = cfg_dec.seq_len
        jbatch = dict(
            input_ids=jnp.asarray(ids, jnp.int32),
            segment_ids=jnp.asarray(
                np.pad(seg, ((0, 0), (0, L - seg.shape[1]))), jnp.int32),
            position_ids=jnp.asarray(
                np.tile(np.arange(L, dtype=np.int32), (3, 1))),
            task_idx=jnp.asarray(task, jnp.int32),
            vis_feats=jnp.asarray(vf), vis_pe=jnp.asarray(vp))
        ours = dec.beam_search(state.params, jbatch)
        ref_pred = traces["pred_seq"].numpy()
        got = ours["pred_seq"]
        for b in range(3):
            n = min(ref_pred.shape[1], got.shape[1])
            np.testing.assert_array_equal(got[b, :n], ref_pred[b, :n], b)


class TestVQA2TrainingEquivalence:
    """N-step training equivalence for the ``--tasks vqa2`` branch against
    the ACTUAL reference stack: the real ``BertForPreTrainingLossMask``
    with ``tasks='vqa2'`` (BCE-with-logits x 3129 answer scaling, zeroed
    masked-LM term, ``vqa2_embed = h[CLS] * h[SEP_after_img]`` —
    modeling.py:1135-1141) + the real ``BertAdam``, vs vlp_tpu's jitted
    vqa2 train step from the same converted init.  Loss curve pointwise
    equal, final weights equal, and both trained models produce identical
    argmax answer ids (the eval_vqa2 CLI's prediction path)."""

    N_STEPS = 40
    LR = 1e-4

    def test_nstep_vqa2_curve_weights_answers(self, ref_modeling,
                                              ref_optimization, rng):
        import jax
        import jax.numpy as jnp
        import torch
        from vlp_tpu import checkpoint as ckpt
        from vlp_tpu.models.model import VLPModel
        from vlp_tpu.ops.masks import visibility
        from vlp_tpu.parallel import train_step as ts

        N, B = self.N_STEPS, 4
        cfg = _vlp_cfg().replace(relax_projection=0,
                                 hidden_dropout_prob=0.0,
                                 attention_probs_dropout_prob=0.0)
        ref, model, params0 = _build_pair(ref_modeling, cfg, tasks="vqa2")
        ref.train()

        no_decay = ["bias", "LayerNorm.bias", "LayerNorm.weight"]
        named = list(ref.named_parameters())
        groups = [
            {"params": [p for n, p in named
                        if not any(nd in n for nd in no_decay)],
             "weight_decay": 0.01},
            {"params": [p for n, p in named
                        if any(nd in n for nd in no_decay)],
             "weight_decay": 0.0},
        ]
        ref_opt = ref_optimization.BertAdam(
            groups, lr=self.LR, warmup=0.1, t_total=N,
            schedule="warmup_linear")
        tx = ts.make_optimizer(cfg, params0, lr=self.LR, warmup=0.1,
                               t_total=N, schedule="warmup_linear",
                               weight_decay=0.01)
        state = ts.TrainState(params=params0, opt_state=tx.init(params0),
                              step=jnp.zeros((), jnp.int32))
        step_fn = jax.jit(ts.make_train_step(model, tx,
                                             mask_image_regions=False,
                                             task="vqa2"))

        # fixture batches: bi mode (VQA), per-example soft answer labels
        # with a multi-hot row (VQA2 scores are not one-hot in general)
        raw = [_make_inputs(cfg, B, rng) for _ in range(5)]
        batches = []
        for x in raw:
            x["mode"][:] = 0
            x["task_idx"][:] = 0
            ans = np.zeros((B, 3129), np.float32)
            ans[np.arange(B), rng.integers(1, 3129, B)] = 1.0
            ans[0, rng.integers(1, 3129)] = 0.6  # soft secondary answer
            vis = np.asarray(visibility(
                jnp.asarray(x["mode"]), jnp.asarray(x["text_end"]),
                jnp.asarray(np.ones_like(x["vis_keep"])), cfg.prefix_len,
                cfg.seq_len))
            jb = dict(
                input_ids=jnp.asarray(x["ids"], jnp.int32),
                segment_ids=jnp.asarray(x["seg"], jnp.int32),
                mode=jnp.asarray(x["mode"]),
                text_end=jnp.asarray(x["text_end"]),
                vis_keep=jnp.asarray(np.ones_like(x["vis_keep"])),
                vis_masked_pos=jnp.asarray(x["vis_masked"], jnp.int32),
                masked_pos=jnp.asarray(x["masked_pos"], jnp.int32),
                masked_ids=jnp.asarray(x["masked_ids"], jnp.int32),
                masked_weights=jnp.asarray(x["masked_weights"]),
                task_idx=jnp.asarray(x["task_idx"], jnp.int32),
                vis_feats=jnp.asarray(x["vis_feats"]),
                vis_pe=jnp.asarray(x["vis_pe"]),
                ans_scores=jnp.asarray(ans))
            batches.append((x, vis, ans, jb))

        losses_ref, losses_ours = [], []
        key = jax.random.PRNGKey(0)
        for i in range(N):
            x, vis, ans, jb = batches[i % len(batches)]
            mlm, pretext, vqa2 = ref(
                torch.from_numpy(x["vis_feats"]),
                torch.from_numpy(x["vis_pe"]),
                torch.from_numpy(x["ids"]), torch.from_numpy(x["seg"]),
                torch.from_numpy(vis.astype(np.float32)),
                torch.from_numpy(x["masked_ids"]).long(),
                torch.from_numpy(ans),
                torch.full((B,), -1).long(),
                masked_pos=torch.from_numpy(x["masked_pos"]).long(),
                masked_weights=torch.from_numpy(x["masked_weights"]),
                task_idx=torch.from_numpy(x["task_idx"]),
                vis_masked_pos=torch.from_numpy(x["vis_masked"]).long(),
                mask_image_regions=False, drop_worst_ratio=0)
            loss = mlm + pretext + vqa2
            loss.backward()
            ref_opt.step()
            ref_opt.zero_grad()
            losses_ref.append(float(loss.detach()))

            state, metrics = step_fn(state, jb, jax.random.fold_in(key, i),
                                     0.0)
            losses_ours.append(float(metrics["loss"]))

        losses_ref = np.asarray(losses_ref)
        losses_ours = np.asarray(losses_ours)
        np.testing.assert_allclose(losses_ours, losses_ref,
                                   rtol=1e-3, atol=1e-4)
        # a real training signal: the BCE descends on revisited batches
        assert losses_ref[-5:].mean() < losses_ref[:5].mean() - 1e-3

        # final weights agree parameter-by-parameter
        sd_final = {k: v.detach().numpy()
                    for k, v in ref.state_dict().items()}
        tpl = jax.tree_util.tree_map(np.asarray, state.params)
        converted = ckpt.torch_to_params(dict(sd_final), cfg, tpl)
        for (p1, a), (_, b) in zip(
                jax.tree_util.tree_leaves_with_path(converted),
                jax.tree_util.tree_leaves_with_path(tpl)):
            np.testing.assert_allclose(a, b, rtol=1e-3, atol=5e-4,
                                       err_msg=str(p1))

        # both trained models answer identically (argmax over 3129)
        x, vis, ans, jb = batches[0]
        ref.eval()
        with torch.no_grad():
            ref_ans = ref(
                torch.from_numpy(x["vis_feats"]),
                torch.from_numpy(x["vis_pe"]),
                torch.from_numpy(x["ids"]), torch.from_numpy(x["seg"]),
                torch.from_numpy(vis.astype(np.float32)),
                None, None, None, vqa_inference=True)
        ours_ans = model.apply({"params": state.params}, jb,
                               method=VLPModel.vqa_inference)
        np.testing.assert_array_equal(np.asarray(ours_ans), ref_ans.numpy())


class TestDecoderParity:
    """Token-for-token generation parity against the reference's actual
    BertForSeq2SeqDecoder (greedy + beam search)."""

    def _decode_setup(self, ref_modeling, rng, beam, T=5):
        import jax
        import torch
        from vlp_tpu import checkpoint as ckpt
        from vlp_tpu.decode import DecodeParams, Decoder
        from vlp_tpu.models.model import VLPModel
        from vlp_tpu.parallel import train_step as ts

        MASK_ID, EOS_ID = 5, 4
        # decode-time reference collapses relax-projection to a single
        # selected head (from_pretrained surgery) — its beam loop cannot
        # gather per-beam task_idx over B*K rows.  Mirror that here.
        cfg = _vlp_cfg().replace(max_len_b=T, relax_projection=0)
        torch.manual_seed(1)
        ref_cfg = ref_modeling.BertConfig(
            vocab_size_or_config_json_file=cfg.vocab_size,
            hidden_size=cfg.hidden_size,
            num_hidden_layers=cfg.num_hidden_layers,
            num_attention_heads=cfg.num_attention_heads,
            intermediate_size=cfg.intermediate_size,
            type_vocab_size=cfg.type_vocab_size,
            relax_projection=0)
        ref = ref_modeling.BertForSeq2SeqDecoder(
            ref_cfg, mask_word_id=MASK_ID, search_beam_size=beam,
            length_penalty=0.5, eos_id=EOS_ID, min_len=2,
            enable_butd=True, len_vis_input=100)
        ref.eval()

        sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
        model = VLPModel(cfg)
        tpl = ts.init_params(model, cfg, jax.random.PRNGKey(2))
        params = ckpt.torch_to_params(dict(sd), cfg, tpl)
        dec = Decoder(model, cfg, DecodeParams(
            mask_id=MASK_ID, eos_id=EOS_ID, beam_size=beam,
            length_penalty=0.5, min_len=2, max_tgt_length=T))
        return cfg, ref, model, params, dec, T

    def _decode_inputs(self, cfg, B, T, rng):
        prefix = cfg.prefix_len
        L_out = prefix + T
        ids = np.zeros((B, prefix), np.int64)
        ids[:, 0] = 3
        ids[:, 1:101] = 1
        ids[:, 101] = 4
        seg = np.zeros((B, L_out), np.int64)
        seg[:, :prefix] = 4
        seg[:, prefix:] = 5
        pos = np.tile(np.arange(L_out, dtype=np.int64), (B, 1))
        mask = np.zeros((L_out, L_out), np.int64)
        mask[:, :prefix] = 1
        for i in range(prefix, L_out):
            mask[i, prefix:i + 1] = 1
        mask = np.tile(mask[None], (B, 1, 1))
        vis_feats = rng.normal(size=(B, 100, 2048)).astype(np.float32)
        vis_pe = rng.normal(size=(B, 100, 1607)).astype(np.float32)
        task = np.full((B,), 3, np.int64)
        return ids, seg, pos, mask, vis_feats, vis_pe, task

    def test_greedy_parity(self, ref_modeling, rng):
        import jax.numpy as jnp
        import torch
        cfg, ref, model, params, dec, T = self._decode_setup(
            ref_modeling, rng, beam=1)
        B = 2
        ids, seg, pos, mask, vf, vp, task = self._decode_inputs(
            cfg, B, T, rng)
        with torch.no_grad():
            ref_ids, _ = ref(torch.from_numpy(vf), torch.from_numpy(vp),
                             torch.from_numpy(ids), torch.from_numpy(seg),
                             torch.from_numpy(pos), torch.from_numpy(mask),
                             task_idx=torch.from_numpy(task))
        L = cfg.seq_len
        batch = dict(
            input_ids=jnp.asarray(ids, jnp.int32),
            segment_ids=jnp.asarray(
                np.pad(seg, ((0, 0), (0, L - seg.shape[1]))), jnp.int32),
            position_ids=jnp.asarray(
                np.tile(np.arange(L, dtype=np.int32), (B, 1))),
            task_idx=jnp.asarray(task, jnp.int32),
            vis_feats=jnp.asarray(vf), vis_pe=jnp.asarray(vp))
        ours, _ = dec.greedy(params, batch)
        np.testing.assert_array_equal(np.asarray(ours), ref_ids.numpy())

    def test_beam_parity(self, ref_modeling, rng):
        import jax.numpy as jnp
        import torch
        cfg, ref, model, params, dec, T = self._decode_setup(
            ref_modeling, rng, beam=2)
        B = 2
        ids, seg, pos, mask, vf, vp, task = self._decode_inputs(
            cfg, B, T, rng)
        with torch.no_grad():
            traces = ref(torch.from_numpy(vf), torch.from_numpy(vp),
                         torch.from_numpy(ids), torch.from_numpy(seg),
                         torch.from_numpy(pos), torch.from_numpy(mask),
                         task_idx=torch.from_numpy(task))
        L = cfg.seq_len
        batch = dict(
            input_ids=jnp.asarray(ids, jnp.int32),
            segment_ids=jnp.asarray(
                np.pad(seg, ((0, 0), (0, L - seg.shape[1]))), jnp.int32),
            position_ids=jnp.asarray(
                np.tile(np.arange(L, dtype=np.int32), (B, 1))),
            task_idx=jnp.asarray(task, jnp.int32),
            vis_feats=jnp.asarray(vf), vis_pe=jnp.asarray(vp))
        ours = dec.beam_search(params, batch)
        ref_pred = traces["pred_seq"].numpy()
        got = ours["pred_seq"]
        for b in range(B):
            n = min(len(ref_pred[b]), got.shape[1])
            np.testing.assert_array_equal(got[b, :n], ref_pred[b, :n])
        # the reference pads traces to output_length; compare the T real frames
        np.testing.assert_array_equal(
            ours["wids"], traces["wids"].numpy()[:, :T, :])
        np.testing.assert_array_equal(
            ours["ptrs"], traces["ptrs"].numpy()[:, :T, :])


@pytest.fixture(scope="module")
def ref_scst_utils(ref_modeling):
    """The reference's actual scst_utils module (RewardCriterion).  Its
    pycocoevalcap import (empty coco-caption submodule) is stubbed — the
    CIDEr scorer is never invoked here because rewards are injected; reward
    computation parity is pinned separately in
    tests/test_pipeline.py::TestSCST::test_get_self_critical_reward_oracle."""
    for name in ("pycocoevalcap", "pycocoevalcap.cider"):
        sys.modules.setdefault(name, types.ModuleType(name))
    cider_mod = types.ModuleType("pycocoevalcap.cider.cider")

    class _Cider:
        def __init__(self, *a, **k):
            pass

    cider_mod.Cider = _Cider
    sys.modules.setdefault("pycocoevalcap.cider.cider", cider_mod)
    spec = importlib.util.spec_from_file_location(
        "ref_scst_utils", "/root/reference/vlp/scst_utils.py")
    m = importlib.util.module_from_spec(spec)
    sys.modules["ref_scst_utils"] = m
    spec.loader.exec_module(m)
    return m


class TestSCSTEquivalence:
    """N-step SCST training equivalence against the ACTUAL reference stack:
    the real ``BertForSeq2SeqDecoder(search_beam_size=1)`` (the class the
    reference's --scst branch trains, run_img2txt_dist.py:357-362), its
    sampling forward (modeling.py:1227-1236), the real
    ``scst_utils.RewardCriterion`` and the real ``BertAdam`` — vs
    ``SCSTTrainer``'s forced-replay policy gradient and ``optim.bert_adam``
    from the same converted init.

    Sampling is pinned on both sides to prescribed raw token ids
    (``torch.multinomial`` monkeypatched to emit them; our side forces the
    replay to them), rewards are injected identically, dropout 0.  The
    prescription deliberately includes rows that terminate with EOS
    mid-sequence followed by live continuation tokens — the exact spot where
    the reference pairs RAW-rollout log-probs with the CLEANED sequence's
    mask (run_img2txt_dist.py:506-523), so this test pins that semantics
    end-to-end: per-step losses equal along the whole curve, final weights
    equal parameter-by-parameter."""

    N_STEPS = 8
    LR = 1e-3
    T = 5
    B = 3

    @pytest.mark.parametrize("replay", ["scan", "fused"])
    def test_nstep_scst_curve_and_weights(self, ref_modeling,
                                          ref_optimization, ref_scst_utils,
                                          rng, monkeypatch, replay):
        import jax
        import jax.numpy as jnp
        import torch
        from vlp_tpu import checkpoint as ckpt
        from vlp_tpu import scst as scst_lib
        from vlp_tpu.parallel import train_step as ts

        N, B, T = self.N_STEPS, self.B, self.T
        MASK_ID, EOS_ID = 5, 4
        cfg = _vlp_cfg().replace(max_len_b=T, relax_projection=0,
                                 hidden_dropout_prob=0.0,
                                 attention_probs_dropout_prob=0.0)
        torch.manual_seed(7)
        ref_cfg = ref_modeling.BertConfig(
            vocab_size_or_config_json_file=cfg.vocab_size,
            hidden_size=cfg.hidden_size,
            num_hidden_layers=cfg.num_hidden_layers,
            num_attention_heads=cfg.num_attention_heads,
            intermediate_size=cfg.intermediate_size,
            hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
            type_vocab_size=cfg.type_vocab_size, relax_projection=0)
        ref = ref_modeling.BertForSeq2SeqDecoder(
            ref_cfg, mask_word_id=MASK_ID, search_beam_size=1,
            eos_id=EOS_ID, enable_butd=True, len_vis_input=100)
        ref.train()
        rl_crit = ref_scst_utils.RewardCriterion()

        sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
        from vlp_tpu.models.model import VLPModel
        model = VLPModel(cfg)
        tpl = ts.init_params(model, cfg, jax.random.PRNGKey(2))
        params0 = ckpt.torch_to_params(dict(sd), cfg, tpl)

        # optimizers, both exactly as the train CLIs build them
        no_decay = ["bias", "LayerNorm.bias", "LayerNorm.weight"]
        named = list(ref.named_parameters())
        groups = [
            {"params": [p for n, p in named
                        if not any(nd in n for nd in no_decay)],
             "weight_decay": 0.01},
            {"params": [p for n, p in named
                        if any(nd in n for nd in no_decay)],
             "weight_decay": 0.0},
        ]
        ref_opt = ref_optimization.BertAdam(
            groups, lr=self.LR, warmup=0.1, t_total=N,
            schedule="warmup_linear")
        tx = ts.make_optimizer(cfg, params0, lr=self.LR, warmup=0.1,
                               t_total=N, schedule="warmup_linear",
                               weight_decay=0.01)
        state = ts.TrainState(params=params0, opt_state=tx.init(params0),
                              step=jnp.zeros((), jnp.int32))
        trainer = scst_lib.SCSTTrainer(model, cfg, mask_id=MASK_ID,
                                       eos_id=EOS_ID, pad_id=0,
                                       max_tgt_length=T, tx=tx,
                                       replay=replay)

        helper = TestDecoderParity()
        ids, seg, pos, mask, vf, vp, task = helper._decode_inputs(
            cfg, B, T, rng)
        L = cfg.seq_len
        batch = dict(
            input_ids=jnp.asarray(ids, jnp.int32),
            segment_ids=jnp.asarray(
                np.pad(seg, ((0, 0), (0, L - seg.shape[1]))), jnp.int32),
            position_ids=jnp.asarray(
                np.tile(np.arange(L, dtype=np.int32), (B, 1))),
            task_idx=jnp.asarray(task, jnp.int32),
            vis_feats=jnp.asarray(vf), vis_pe=jnp.asarray(vp))
        t_vf, t_vp = torch.from_numpy(vf), torch.from_numpy(vp)
        t_ids, t_seg = torch.from_numpy(ids), torch.from_numpy(seg)
        t_pos, t_mask = torch.from_numpy(pos), torch.from_numpy(mask)
        t_task = torch.from_numpy(task)

        # prescribed raw rollouts: row 0 hits EOS mid-row with live
        # continuations after it (the raw-vs-cleaned spot), row 1 samples a
        # raw pad, row 2 never terminates
        def make_raw(step_rng):
            raw = step_rng.integers(6, cfg.vocab_size, (B, T))
            raw[0, 2] = EOS_ID
            raw[1, 3] = 0
            return raw.astype(np.int64)

        losses_ref, losses_ours = [], []
        for i in range(N):
            step_rng = np.random.default_rng(100 + i)
            raw = make_raw(step_rng)
            cleaned = scst_lib.clean_rollout(raw, EOS_ID, 0)
            assert (cleaned != raw).any()
            reward = np.repeat(
                step_rng.normal(0, 1.5, (B, 1)), T, 1).astype(np.float32)

            # --- reference: pinned multinomial, real sampling forward ----
            cols = iter(raw.T)

            def fake_multinomial(probs, num_samples=1, replacement=True):
                assert probs.shape == (B, cfg.vocab_size)
                return torch.from_numpy(
                    np.ascontiguousarray(next(cols)[:, None]))

            monkeypatch.setattr(torch, "multinomial", fake_multinomial)
            gen_raw, sample_logprobs = ref(
                t_vf, t_vp, t_ids, t_seg, t_pos, t_mask, task_idx=t_task,
                sample_mode='sample')
            monkeypatch.undo()
            np.testing.assert_array_equal(gen_raw.detach().numpy(), raw)
            ref_loss = rl_crit(sample_logprobs,
                               torch.from_numpy(cleaned),
                               torch.from_numpy(reward))
            ref_loss.backward()
            ref_opt.step()
            ref_opt.zero_grad()
            losses_ref.append(float(ref_loss.detach()))

            # --- ours: forced replay of the same raw ids -----------------
            if i == 0:
                replay_fn = (trainer._forced_logprobs_fused
                             if replay == "fused"
                             else trainer._forced_logprobs)
                forced = replay_fn(
                    state.params, batch, jnp.asarray(raw, jnp.int32))
                np.testing.assert_allclose(
                    np.asarray(forced), sample_logprobs.detach().numpy(),
                    rtol=1e-4, atol=1e-5)
            state, loss, _ = trainer._grad_update(
                state, batch, jnp.asarray(raw, jnp.int32),
                jnp.asarray(cleaned, jnp.int32), jnp.asarray(reward), None)
            losses_ours.append(float(loss))

        np.testing.assert_allclose(np.asarray(losses_ours),
                                   np.asarray(losses_ref),
                                   rtol=1e-3, atol=1e-4)

        sd_final = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
        tpl_f = jax.tree_util.tree_map(np.asarray, state.params)
        converted = ckpt.torch_to_params(dict(sd_final), cfg, tpl_f)
        for (p1, a), (_, b) in zip(
                jax.tree_util.tree_leaves_with_path(converted),
                jax.tree_util.tree_leaves_with_path(tpl_f)):
            np.testing.assert_allclose(a, b, rtol=1e-3, atol=5e-4,
                                       err_msg=str(p1))
