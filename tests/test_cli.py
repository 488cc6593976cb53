"""End-to-end CLI tests on CPU: train -> resume -> decode -> vqa -> scst,
tiny model via --config_path, synthetic data; plus the full checkpoint
interop loop against the actual reference torch stack."""

import json
import os

import numpy as np
import pytest

from vlp_tpu.cli import common as cli_common
from vlp_tpu.cli import decode as decode_cli
from vlp_tpu.cli import eval_vqa2 as vqa_cli
from vlp_tpu.cli import train as train_cli
# reference-module loader fixture (skips itself when /root/reference is
# not mounted)
from tests.test_reference_parity import ref_modeling  # noqa: F401


@pytest.fixture(scope="module")
def fixtures(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli")
    vocab = str(d / "vocab.txt")
    cli_common.write_synthetic_vocab(vocab, size=120)
    cfg_json = str(d / "bert_config.json")
    with open(cfg_json, "w") as f:
        json.dump({"vocab_size": 120, "hidden_size": 32,
                   "num_hidden_layers": 2, "num_attention_heads": 2,
                   "intermediate_size": 64, "max_position_embeddings": 512,
                   "vis_feat_dim": 24, "vis_cls_dim": 10, "vis_pe_dim": 16},
                  f)
    answers = str(d / "answers.txt")
    with open(answers, "w") as f:
        f.write("<unk>\nyes\nno\n1\n2\ncat\n")
    return dict(dir=str(d), vocab=vocab, cfg=cfg_json, answers=answers)


def base_train_args(fx, out, extra=()):
    return ["--do_train", "--synthetic_data", "--enable_butd",
            "--bert_model", fx["vocab"], "--config_path", fx["cfg"],
            "--output_dir", out, "--train_batch_size", "4",
            "--steps_per_epoch", "2", "--new_segment_ids",
            "--relax_projection", "--len_vis_input", "6", "--max_len_b", "5",
            "--max_pred", "3", "--s2s_prob", "0.75", "--bi_prob", "0.25",
            "--learning_rate", "1e-3", *extra]


class TestTrainCLI:
    def test_train_and_resume(self, fixtures):
        out = os.path.join(fixtures["dir"], "out_train")
        state = train_cli.main(base_train_args(
            fixtures, out, ["--num_train_epochs", "2"]))
        assert os.path.isdir(os.path.join(out, "model.2"))
        assert os.path.isdir(os.path.join(out, "optim.2"))
        opts = json.load(open(os.path.join(out, "opt.json")))
        assert opts["train_batch_size"] == 4
        # resume: epoch 3 only
        state2 = train_cli.main(base_train_args(
            fixtures, out, ["--num_train_epochs", "3"]))
        assert os.path.isdir(os.path.join(out, "model.3"))
        log = open(os.path.join(out, "training.log")).read()
        assert "Recover model: 2" in log

    def test_true_fp16_train_and_resume(self, fixtures):
        """--true_fp16 trains with fp16 activations + loss scaling; the
        scale state round-trips through optim.N on resume."""
        out = os.path.join(fixtures["dir"], "out_fp16")
        state = train_cli.main(base_train_args(
            fixtures, out, ["--num_train_epochs", "1", "--true_fp16",
                            "--loss_scale", "4"]))
        assert state.loss_scale is not None
        assert float(state.loss_scale["scale"]) == 4.0  # static
        log = open(os.path.join(out, "training.log")).read()
        assert "true-fp16: fp16 activations + static 4 loss scaling" in log
        state2 = train_cli.main(base_train_args(
            fixtures, out, ["--num_train_epochs", "2", "--true_fp16",
                            "--loss_scale", "4"]))
        assert "Recover model: 1" in open(
            os.path.join(out, "training.log")).read()
        assert int(state2.step) == 4
        assert float(state2.loss_scale["scale"]) == 4.0

    def test_train_data_parallel_mesh(self, fixtures):
        """With multiple visible devices and a divisible batch, the CLI
        trains under shard_map (batch sharded over 'data', params
        replicated, Pallas-compatible) — both the per-step path and the
        K-step device loop."""
        for tag, extra in (("dp_step", []),
                           ("dp_loop", ["--device_loop_steps", "2"])):
            out = os.path.join(fixtures["dir"], f"out_{tag}")
            train_cli.main(base_train_args(
                fixtures, out, ["--num_train_epochs", "1",
                                "--train_batch_size", "8",
                                "--steps_per_epoch", "2", *extra]))
            assert os.path.isdir(os.path.join(out, "model.1"))
            log = open(os.path.join(out, "training.log")).read()
            assert "data-parallel training over 8 devices" in log, tag

    def test_optimizer_flags_plumbed(self, fixtures, monkeypatch):
        """--weight_decay/--learning_rate/--sche_mode must reach the
        constructed optimizer (weight_decay used to be silently dropped on
        the main path and hard-defaulted to 0.01)."""
        from vlp_tpu.parallel import train_step as ts
        seen = {}
        real = ts.make_optimizer

        def spy(cfg, params, **kw):
            seen.update(kw)
            return real(cfg, params, **kw)

        monkeypatch.setattr(ts, "make_optimizer", spy)
        out = os.path.join(fixtures["dir"], "out_optflags")
        train_cli.main(base_train_args(fixtures, out, [
            "--weight_decay", "0.07", "--sche_mode", "warmup_cosine",
            "--learning_rate", "5e-4"])[1:])  # drop --do_train: no training
        assert seen["weight_decay"] == pytest.approx(0.07)
        assert seen["schedule"] == "warmup_cosine"
        assert seen["lr"] == pytest.approx(5e-4)

    def test_finetune_decay_survives_resume(self, fixtures, monkeypatch):
        """A resumed --finetune_decay run must rebuild the anchored
        optimizer (it used to silently fall back to plain BertAdam on
        epoch-checkpoint recovery)."""
        from vlp_tpu import optim as optim_lib
        base_out = os.path.join(fixtures["dir"], "out_ft_base")
        train_cli.main(base_train_args(
            fixtures, base_out, ["--num_train_epochs", "1"]))
        anchor_path = os.path.join(base_out, "model.1")

        calls = []
        real = optim_lib.bert_adam_finetune

        def spy(*a, **kw):
            calls.append(kw)
            return real(*a, **kw)

        monkeypatch.setattr(optim_lib, "bert_adam_finetune", spy)
        out = os.path.join(fixtures["dir"], "out_ft")
        ft_args = ["--num_train_epochs", "1", "--finetune_decay",
                   "--model_recover_path", anchor_path]
        train_cli.main(base_train_args(fixtures, out, ft_args))
        assert len(calls) == 1  # fresh run: anchored tx built once
        # resume epoch 2: the anchored tx must be rebuilt, not dropped
        train_cli.main(base_train_args(
            fixtures, out, ["--num_train_epochs", "2", "--finetune_decay",
                            "--model_recover_path", anchor_path]))
        assert len(calls) == 2
        log = open(os.path.join(out, "training.log")).read()
        assert "Recover model: 1" in log

    def test_step_checkpoint_midepoch_resume(self, fixtures):
        """--save_steps writes model.sN mid-epoch; after a crash the run
        resumes INSIDE the epoch (the reference can only restart at epoch
        boundaries, run_img2txt_dist.py:33-43)."""
        import shutil
        out = os.path.join(fixtures["dir"], "out_stepckpt")
        args = base_train_args(
            fixtures, out, ["--num_train_epochs", "1", "--steps_per_epoch",
                            "4", "--save_steps", "2"])
        train_cli.main(args)
        assert os.path.isdir(os.path.join(out, "model.s2"))
        assert os.path.isdir(os.path.join(out, "model.s4"))
        assert os.path.isdir(os.path.join(out, "model.1"))
        # simulate a crash after step 2: epoch ckpt + later step ckpt gone
        for name in ("model.1", "optim.1", "model.s4", "optim.s4"):
            shutil.rmtree(os.path.join(out, name))
        train_cli.main(args)
        log = open(os.path.join(out, "training.log")).read()
        assert "Recover model: step 2" in log
        assert os.path.isdir(os.path.join(out, "model.1"))
        assert os.path.isdir(os.path.join(out, "model.s4"))

    def test_vqa_train(self, fixtures):
        out = os.path.join(fixtures["dir"], "out_vqa")
        # vqa2 synthetic: ans_scores come from the builder's zero default
        train_cli.main(base_train_args(
            fixtures, out, ["--num_train_epochs", "1", "--tasks", "vqa2",
                            "--answer_vocab_file", fixtures["answers"]]))
        assert os.path.isdir(os.path.join(out, "model.1"))

    def test_train_with_fp16_packed_store(self, fixtures, tmp_path):
        """Non-synthetic path: Karpathy JSON index + half-precision packed
        feature store through the train CLI (--packed_feature_file)."""
        pytest.importorskip("vlp_tpu.data.native_store")
        from vlp_tpu.data.native_store import pack_store

        rng = np.random.default_rng(0)
        nr, fd, cd = 6, 24, 10
        names = [f"img_{i:04d}.jpg" for i in range(8)]

        def rec(_k):
            bbox = np.zeros((nr, 6), np.float32)
            xy = rng.uniform(0, 500, (nr, 2))
            wh = rng.uniform(5, 100, (nr, 2))
            bbox[:, :2] = xy
            bbox[:, 2:4] = xy + wh
            bbox[:, 5] = rng.uniform(0, 1, nr)
            return (rng.normal(size=(nr, fd)).astype(np.float32),
                    rng.uniform(size=(nr, cd)).astype(np.float32), bbox)

        packed = str(tmp_path / "feats16.vlps")
        pack_store(packed, [n[:-4] for n in names], rec, n_regions=nr,
                   feat_dim=fd, cls_dim=cd, dtype=np.float16)
        src = str(tmp_path / "dataset_coco.json")
        with open(src, "w") as f:
            json.dump({"images": [
                {"split": "train", "filename": n, "filepath": "trainval",
                 "cocoid": i,
                 "sentences": [{"raw": "tok1 tok2 tok3"}]}
                for i, n in enumerate(names)]}, f)

        out = os.path.join(fixtures["dir"], "out_packed16")
        args = [a for a in base_train_args(
            fixtures, out, ["--num_train_epochs", "1", "--steps_per_epoch",
                            "2", "--src_file", src,
                            "--packed_feature_file", packed,
                            "--dataset", "coco", "--split", "train"])
                if a != "--synthetic_data"]
        train_cli.main(args)
        assert os.path.isdir(os.path.join(out, "model.1"))
        log = open(os.path.join(out, "training.log")).read()
        assert "mean loss" in log

    @pytest.mark.parametrize("replay", ["scan", "fused"])
    def test_scst_train(self, fixtures, replay):
        out = os.path.join(fixtures["dir"], f"out_scst_{replay}")
        train_cli.main(base_train_args(
            fixtures, out, ["--num_train_epochs", "1", "--scst",
                            "--max_pred", "0", "--mask_prob", "0",
                            "--dataset", "coco", "--train_batch_size", "4",
                            "--scst_replay", replay,
                            "--learning_rate", "1e-6"]))
        assert os.path.isdir(os.path.join(out, "model.1"))

    def test_scst_train_data_parallel(self, fixtures):
        """SCST with a divisible batch engages the 8-device shard_map mesh
        (the reference's 4-GPU DDP SCST recipe, run_img2txt_dist.py:379-387
        + :486-523); round 2 silently fell back to one device."""
        out = os.path.join(fixtures["dir"], "out_scst_dp")
        train_cli.main(base_train_args(
            fixtures, out, ["--num_train_epochs", "1", "--scst",
                            "--max_pred", "0", "--mask_prob", "0",
                            "--dataset", "coco", "--train_batch_size", "8",
                            "--steps_per_epoch", "1",
                            "--learning_rate", "1e-6"]))
        assert os.path.isdir(os.path.join(out, "model.1"))
        log = open(os.path.join(out, "training.log")).read()
        assert "data-parallel training over 8 devices" in log

    def test_grad_accum_data_parallel(self, fixtures):
        """--gradient_accumulation_steps > 1 no longer drops the mesh: the
        micro-batch scan runs inside the shard_map local step
        (run_img2txt_dist.py:111-114, 566-575 composes DDP + accum)."""
        out = os.path.join(fixtures["dir"], "out_accum_dp")
        train_cli.main(base_train_args(
            fixtures, out, ["--num_train_epochs", "1",
                            "--train_batch_size", "16",
                            "--gradient_accumulation_steps", "2",
                            "--steps_per_epoch", "2"]))
        assert os.path.isdir(os.path.join(out, "model.1"))
        log = open(os.path.join(out, "training.log")).read()
        assert "data-parallel training over 8 devices" in log
        assert "grad_accum=2" in log

    def test_train_tensor_parallel(self, fixtures):
        """--tensor_parallel N defaults to the shard_map Megatron impl
        (ops/tp.py; keeps the Pallas kernels per shard on real chips — XLA
        attention here on the CPU mesh)."""
        out = os.path.join(fixtures["dir"], "out_tp")
        train_cli.main(base_train_args(
            fixtures, out, ["--num_train_epochs", "1",
                            "--train_batch_size", "8",
                            "--steps_per_epoch", "2",
                            "--tensor_parallel", "2"]))
        assert os.path.isdir(os.path.join(out, "model.1"))
        log = open(os.path.join(out, "training.log")).read()
        assert "shard_map training: dp=4 x tp=2" in log

    def test_train_tensor_parallel_gspmd(self, fixtures):
        """--tp_impl gspmd keeps the compiler-partitioned TP step
        reachable (XLA attention by construction)."""
        out = os.path.join(fixtures["dir"], "out_tp_gspmd")
        train_cli.main(base_train_args(
            fixtures, out, ["--num_train_epochs", "1",
                            "--train_batch_size", "8",
                            "--steps_per_epoch", "2",
                            "--tensor_parallel", "2",
                            "--tp_impl", "gspmd"]))
        assert os.path.isdir(os.path.join(out, "model.1"))
        log = open(os.path.join(out, "training.log")).read()
        assert "GSPMD training: dp=4 x tp=2" in log

    def test_train_tensor_parallel_device_loop(self, fixtures):
        """shard_map TP composes with the K-step device loop (the GSPMD
        impl falls back to per-step dispatch)."""
        out = os.path.join(fixtures["dir"], "out_tp_loop")
        train_cli.main(base_train_args(
            fixtures, out, ["--num_train_epochs", "1",
                            "--train_batch_size", "8",
                            "--steps_per_epoch", "2",
                            "--device_loop_steps", "2",
                            "--tensor_parallel", "2"]))
        assert os.path.isdir(os.path.join(out, "model.1"))
        log = open(os.path.join(out, "training.log")).read()
        assert "shard_map training: dp=4 x tp=2" in log


class TestDecodeCLI:
    def test_beam_decode_with_checkpoint(self, fixtures):
        out = os.path.join(fixtures["dir"], "out_train")
        if not os.path.isdir(os.path.join(out, "model.2")):
            train_cli.main(base_train_args(
                fixtures, out, ["--num_train_epochs", "2"]))
        dec_out = os.path.join(fixtures["dir"], "dec")
        decode_cli.main([
            "--synthetic_data", "--enable_butd", "--bert_model",
            fixtures["vocab"], "--config_path", fixtures["cfg"],
            "--new_segment_ids", "--batch_size", "3", "--beam_size", "2",
            "--length_penalty", "0.5", "--forbid_duplicate_ngrams",
            "--min_len", "2", "--max_tgt_length", "5", "--len_vis_input",
            "6", "--num_synthetic", "5",
            "--model_recover_path", os.path.join(out, "model.2"),
            "--output_dir", dec_out])
        preds = json.load(open(os.path.join(
            dec_out, "preds-model.2-val.json")))
        assert len(preds) == 5
        assert all("caption" in p for p in preds)

    def test_greedy_decode_random_params(self, fixtures):
        dec_out = os.path.join(fixtures["dir"], "dec2")
        decode_cli.main([
            "--synthetic_data", "--enable_butd", "--bert_model",
            fixtures["vocab"], "--config_path", fixtures["cfg"],
            "--new_segment_ids", "--batch_size", "2", "--beam_size", "1",
            "--max_tgt_length", "4", "--len_vis_input", "6",
            "--num_synthetic", "3", "--output_dir", dec_out])
        preds = json.load(open(os.path.join(dec_out,
                                            "preds-random-val.json")))
        assert len(preds) == 3


class TestDataParallelCLI:
    """batch_size divisible by the 8 virtual devices triggers the
    data-parallel mesh branches in both eval CLIs."""

    def test_decode_data_parallel(self, fixtures, capsys):
        dec_out = os.path.join(fixtures["dir"], "dec_dp")
        decode_cli.main([
            "--synthetic_data", "--enable_butd", "--bert_model",
            fixtures["vocab"], "--config_path", fixtures["cfg"],
            "--new_segment_ids", "--batch_size", "8", "--beam_size", "2",
            "--max_tgt_length", "4", "--len_vis_input", "6",
            "--num_synthetic", "9", "--output_dir", dec_out])
        assert "data-parallel decode over 8 devices" in capsys.readouterr().out
        preds = json.load(open(os.path.join(dec_out,
                                            "preds-random-val.json")))
        assert len(preds) == 9

    def test_vqa_data_parallel(self, fixtures, capsys):
        out = os.path.join(fixtures["dir"], "vqa_dp")
        vqa_cli.main([
            "--synthetic_data", "--enable_butd", "--bert_model",
            fixtures["vocab"], "--config_path", fixtures["cfg"],
            "--new_segment_ids", "--batch_size", "8", "--len_vis_input", "6",
            "--num_synthetic", "9", "--answer_vocab_file",
            fixtures["answers"], "--output_dir", out])
        assert ("data-parallel VQA eval over 8 devices"
                in capsys.readouterr().out)
        preds = json.load(open(os.path.join(out,
                                            "vqa2-results-random-val.json")))
        assert len(preds) == 9


class TestVQACLI:
    def test_eval(self, fixtures):
        out = os.path.join(fixtures["dir"], "vqa_out")
        vqa_cli.main([
            "--synthetic_data", "--enable_butd", "--bert_model",
            fixtures["vocab"], "--config_path", fixtures["cfg"],
            "--new_segment_ids", "--batch_size", "3", "--len_vis_input", "6",
            "--num_synthetic", "5", "--answer_vocab_file",
            fixtures["answers"], "--output_dir", out])
        preds = json.load(open(os.path.join(out,
                                            "vqa2-results-random-val.json")))
        assert len(preds) == 5
        assert all(p["answer"] for p in preds)


class TestConvertCLI:
    def test_roundtrip(self, fixtures, tmp_path):
        import numpy as np
        import jax
        from vlp_tpu.cli import convert as convert_cli
        from vlp_tpu import checkpoint as ckpt
        from vlp_tpu.parallel import train_step as ts

        cfg = convert_cli.make_cfg(convert_cli.build_parser().parse_args([
            "--input", "x", "--output", "y", "--direction", "jax2torch",
            "--vocab_size", "120", "--new_segment_ids", "--relax_projection",
            "--len_vis_input", "6", "--config_path", fixtures["cfg"]]))
        model = ts.create_model(cfg)
        params = ts.init_params(model, cfg, jax.random.PRNGKey(0))
        import orbax.checkpoint as ocp
        src = str(tmp_path / "orbax_in")
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(src, ckpt.jax_tree_to_numpy(params), force=True)
        ckptr.wait_until_finished()

        bin_path = str(tmp_path / "model.bin")
        convert_cli.main(["--input", src, "--output", bin_path,
                          "--direction", "jax2torch", "--vocab_size", "120",
                          "--new_segment_ids", "--relax_projection",
                          "--len_vis_input", "6",
                          "--config_path", fixtures["cfg"]])
        back = str(tmp_path / "orbax_out")
        convert_cli.main(["--input", bin_path, "--output", back,
                          "--direction", "torch2jax", "--vocab_size", "120",
                          "--new_segment_ids", "--relax_projection",
                          "--len_vis_input", "6",
                          "--config_path", fixtures["cfg"]])
        restored = ckpt.restore_params(back, params)
        for (p1, a), (p2, b) in zip(
                jax.tree_util.tree_leaves_with_path(
                    ckpt.jax_tree_to_numpy(params)),
                jax.tree_util.tree_leaves_with_path(restored)):
            # vis/ans heads are not part of the reference format mapping for
            # layers absent from it; everything mapped must round-trip
            np.testing.assert_allclose(a, b, err_msg=str(p1))


class TestDeviceLoop:
    def test_train_with_device_loop(self, fixtures):
        out = os.path.join(fixtures["dir"], "out_devloop")
        train_cli.main(base_train_args(
            fixtures, out, ["--num_train_epochs", "1", "--steps_per_epoch",
                            "4", "--device_loop_steps", "2"]))
        assert os.path.isdir(os.path.join(out, "model.1"))
        log = open(os.path.join(out, "training.log")).read()
        assert "mean loss" in log


class TestE2ECheckpointInterop:
    """The full user path for the <=0.5-CIDEr gate, proven end to end:
    train the ACTUAL reference torch model a few steps -> torch.save a real
    model.bin -> convert CLI (torch2jax, incl. the from_pretrained surgery)
    -> decode CLI (beam 5) -> captions identical to the reference's own
    BertForSeq2SeqDecoder.from_pretrained beam search on the same inputs
    (/root/reference/vlp/decode_img2txt.py:161-264)."""

    def test_torch_train_convert_decode_beam5(self, ref_modeling, tmp_path):
        import torch
        from vlp_tpu.cli import convert as convert_cli
        from vlp_tpu.config import VLPConfig
        from vlp_tpu.data.example_builder import (DecodeExampleBuilder,
                                                  collate)
        from vlp_tpu.data.features import make_store
        from vlp_tpu.data.tokenization import detokenize

        d = str(tmp_path)
        vocab_path = cli_common.write_synthetic_vocab(
            os.path.join(d, "vocab.txt"), size=120)
        cfg_json = os.path.join(d, "bert_config.json")
        with open(cfg_json, "w") as f:
            json.dump({"vocab_size": 120, "hidden_size": 32,
                       "num_hidden_layers": 2, "num_attention_heads": 2,
                       "intermediate_size": 48,
                       "max_position_embeddings": 512}, f)
        tokenizer = cli_common.resolve_tokenizer(vocab_path, False, 108)
        sp = tokenizer.vocab
        CLS, SEP, MASK, UNK = (sp["[CLS]"], sp["[SEP]"], sp["[MASK]"],
                               sp["[UNK]"])

        # ---- 1. train the actual reference model a few steps ------------
        torch.manual_seed(7)
        ref_cfg = ref_modeling.BertConfig(
            vocab_size_or_config_json_file=120, hidden_size=32,
            num_hidden_layers=2, num_attention_heads=2,
            intermediate_size=48, type_vocab_size=6, relax_projection=4)
        ref = ref_modeling.BertForPreTrainingLossMask(
            ref_cfg, enable_butd=True, len_vis_input=100)
        ref.train()
        # gentle lr: the tiny model collapses to a near-degenerate unigram
        # distribution at 1e-3, and near-tied beam scores then flip on fp
        # noise instead of exercising real decode parity
        opt = torch.optim.Adam(ref.parameters(), lr=1e-4)
        rng = np.random.default_rng(3)
        B, L, prefix, nb = 2, 128, 102, 6
        for _ in range(3):
            ids = np.zeros((B, L), np.int64)
            ids[:, 0] = CLS
            ids[:, 1:101] = UNK
            ids[:, 101] = SEP
            ids[:, prefix:prefix + nb] = rng.integers(16, 120, (B, nb))
            ids[:, prefix + nb] = SEP
            seg = np.zeros((B, L), np.int64)
            seg[:, :prefix] = 4
            seg[:, prefix:prefix + nb + 1] = 5
            mask = np.ones((B, L, L), np.float32)
            masked_pos = np.tile(np.arange(prefix, prefix + 3)[None], (B, 1))
            masked_ids = rng.integers(16, 120, (B, 3))
            mlm_loss, _, _ = ref(
                torch.from_numpy(rng.normal(size=(B, 100, 2048))
                                 .astype(np.float32)),
                torch.from_numpy(rng.normal(size=(B, 100, 1607))
                                 .astype(np.float32)),
                torch.from_numpy(ids), torch.from_numpy(seg),
                torch.from_numpy(mask),
                torch.from_numpy(masked_ids), None,
                torch.full((B,), -1).long(),
                masked_pos=torch.from_numpy(masked_pos),
                masked_weights=torch.ones((B, 3)),
                task_idx=torch.full((B,), 3).long(),
                drop_worst_ratio=0)
            opt.zero_grad()
            mlm_loss.mean().backward()
            opt.step()
        ref.eval()
        bin_path = os.path.join(d, "model.3.bin")
        torch.save(ref.state_dict(), bin_path)

        # ---- 2. convert CLI: model.bin -> orbax --------------------------
        ckpt_dir = os.path.join(d, "model.3")
        convert_cli.main(["--input", bin_path, "--output", ckpt_dir,
                          "--direction", "torch2jax", "--new_segment_ids",
                          "--relax_projection", "--config_path", cfg_json,
                          "--vocab_size", "120"])

        # ---- 3. decode CLI: beam 5 over the synthetic store --------------
        T = 5
        dec_out = os.path.join(d, "dec")
        decode_cli.main([
            "--synthetic_data", "--enable_butd", "--bert_model", vocab_path,
            "--config_path", cfg_json, "--new_segment_ids",
            "--batch_size", "3", "--beam_size", "5",
            "--length_penalty", "0.5", "--min_len", "2",
            "--max_tgt_length", str(T), "--num_synthetic", "3",
            "--model_recover_path", ckpt_dir, "--output_dir", dec_out])
        preds = {p["image_id"]: p["caption"] for p in json.load(
            open(os.path.join(dec_out, "preds-model.3-val.json")))}
        assert set(preds) == {0, 1, 2}

        # ---- 4. the reference's own decode on the same inputs ------------
        cfg = VLPConfig.from_reference_json(
            cfg_json, type_vocab_size=6, relax_projection=4,
            len_vis_input=100, max_len_b=T, dtype="float32",
            use_pallas_attention=False)
        store = make_store(synthetic=True, num_regions=100,
                           feat_dim=cfg.vis_feat_dim,
                           cls_dim=cfg.vis_cls_dim)
        builder = DecodeExampleBuilder(cfg, sp, new_segment_ids=True,
                                       max_tgt_length=T)
        batch = collate([builder(*store.get(f"synthetic_{i}.npy"))
                         for i in range(3)])
        nb_, L_out = 3, cfg.prefix_len + T
        s2s = np.zeros((L_out, L_out), np.float32)
        s2s[:, :cfg.prefix_len] = 1
        for i in range(cfg.prefix_len, L_out):
            s2s[i, cfg.prefix_len:i + 1] = 1
        ref_dec = ref_modeling.BertForSeq2SeqDecoder.from_pretrained(
            d, state_dict=torch.load(bin_path), config_path=cfg_json,
            max_position_embeddings=512, type_vocab_size=6, task_idx=3,
            mask_word_id=MASK, search_beam_size=5, length_penalty=0.5,
            eos_id=SEP, forbid_duplicate_ngrams=False,
            forbid_ignore_set=None, ngram_size=3, min_len=2,
            enable_butd=True, len_vis_input=100)
        ref_dec.eval()
        with torch.no_grad():
            traces = ref_dec(
                torch.from_numpy(batch["vis_feats"]),
                torch.from_numpy(batch["vis_pe"]),
                torch.from_numpy(batch["input_ids"].astype(np.int64)),
                torch.from_numpy(
                    batch["segment_ids"][:, :L_out].astype(np.int64)),
                torch.from_numpy(
                    batch["position_ids"][:, :L_out].astype(np.int64)),
                torch.from_numpy(np.tile(s2s[None], (nb_, 1, 1))),
                task_idx=torch.from_numpy(
                    batch["task_idx"].astype(np.int64)))
        ref_pred = traces["pred_seq"].numpy()

        def caption_of(row):
            words = []
            for t in tokenizer.convert_ids_to_tokens(
                    [int(x) for x in row]):
                if t in ("[SEP]", "[PAD]"):
                    break
                words.append(t)
            return " ".join(detokenize(words))

        for i in range(3):
            assert preds[i] == caption_of(ref_pred[i]), i

    def test_our_train_convert_reference_decodes_identically(
            self, ref_modeling, tmp_path):
        """The REVERSE migration path: a checkpoint trained by THIS
        framework's CLI, exported by the convert CLI (jax2torch), loads
        through the reference's own ``BertForSeq2SeqDecoder.from_pretrained``
        (whose surgery collapses the multi-head relax projection to task 3)
        and beam-decodes captions identical to our decode CLI on the same
        inputs — users can come back."""
        import torch
        from vlp_tpu.cli import convert as convert_cli
        from vlp_tpu.config import VLPConfig
        from vlp_tpu.data.example_builder import (DecodeExampleBuilder,
                                                  collate)
        from vlp_tpu.data.features import make_store
        from vlp_tpu.data.tokenization import detokenize

        d = str(tmp_path)
        vocab_path = cli_common.write_synthetic_vocab(
            os.path.join(d, "vocab.txt"), size=120)
        cfg_json = os.path.join(d, "bert_config.json")
        with open(cfg_json, "w") as f:
            json.dump({"vocab_size": 120, "hidden_size": 32,
                       "num_hidden_layers": 2, "num_attention_heads": 2,
                       "intermediate_size": 48,
                       "max_position_embeddings": 512}, f)
        tokenizer = cli_common.resolve_tokenizer(vocab_path, False, 128)
        sp = tokenizer.vocab
        SEP, MASK = sp["[SEP]"], sp["[MASK]"]

        # ---- 1. train with OUR CLI (multi-head relax, default 100 regions)
        out = os.path.join(d, "run")
        train_cli.main([
            "--do_train", "--synthetic_data", "--enable_butd",
            "--bert_model", vocab_path, "--config_path", cfg_json,
            "--output_dir", out, "--train_batch_size", "4",
            "--steps_per_epoch", "2", "--num_train_epochs", "2",
            "--new_segment_ids", "--relax_projection",
            "--max_len_b", "5", "--max_pred", "3",
            "--learning_rate", "1e-4"])
        ckpt_dir = os.path.join(out, "model.2")
        assert os.path.isdir(ckpt_dir)

        # ---- 2. export to the reference format -----------------------------
        bin_path = os.path.join(d, "model.2.bin")
        convert_cli.main(["--input", ckpt_dir, "--output", bin_path,
                          "--direction", "jax2torch", "--new_segment_ids",
                          "--relax_projection", "--config_path", cfg_json,
                          "--vocab_size", "120"])

        # ---- 3. OUR decode CLI on the native checkpoint --------------------
        T = 5
        dec_out = os.path.join(d, "dec")
        decode_cli.main([
            "--synthetic_data", "--enable_butd", "--bert_model", vocab_path,
            "--config_path", cfg_json, "--new_segment_ids",
            "--batch_size", "3", "--beam_size", "5",
            "--length_penalty", "0.5", "--min_len", "2",
            "--max_tgt_length", str(T), "--num_synthetic", "3",
            "--model_recover_path", ckpt_dir, "--output_dir", dec_out])
        preds = {p["image_id"]: p["caption"] for p in json.load(
            open(os.path.join(dec_out, "preds-model.2-val.json")))}
        assert set(preds) == {0, 1, 2}

        # ---- 4. the reference's own from_pretrained + beam search ----------
        cfg = VLPConfig.from_reference_json(
            cfg_json, type_vocab_size=6, relax_projection=4,
            len_vis_input=100, max_len_b=T, dtype="float32",
            use_pallas_attention=False)
        store = make_store(synthetic=True, num_regions=100,
                           feat_dim=cfg.vis_feat_dim,
                           cls_dim=cfg.vis_cls_dim)
        builder = DecodeExampleBuilder(cfg, sp, new_segment_ids=True,
                                       max_tgt_length=T)
        batch = collate([builder(*store.get(f"synthetic_{i}.npy"))
                         for i in range(3)])
        nb, L_out = 3, cfg.prefix_len + T
        s2s = np.zeros((L_out, L_out), np.float32)
        s2s[:, :cfg.prefix_len] = 1
        for i in range(cfg.prefix_len, L_out):
            s2s[i, cfg.prefix_len:i + 1] = 1
        ref_dec = ref_modeling.BertForSeq2SeqDecoder.from_pretrained(
            d, state_dict=torch.load(bin_path), config_path=cfg_json,
            max_position_embeddings=512, type_vocab_size=6, task_idx=3,
            mask_word_id=MASK, search_beam_size=5, length_penalty=0.5,
            eos_id=SEP, forbid_duplicate_ngrams=False,
            forbid_ignore_set=None, ngram_size=3, min_len=2,
            enable_butd=True, len_vis_input=100)
        ref_dec.eval()
        with torch.no_grad():
            traces = ref_dec(
                torch.from_numpy(batch["vis_feats"]),
                torch.from_numpy(batch["vis_pe"]),
                torch.from_numpy(batch["input_ids"].astype(np.int64)),
                torch.from_numpy(
                    batch["segment_ids"][:, :L_out].astype(np.int64)),
                torch.from_numpy(
                    batch["position_ids"][:, :L_out].astype(np.int64)),
                torch.from_numpy(np.tile(s2s[None], (nb, 1, 1))),
                task_idx=torch.from_numpy(
                    batch["task_idx"].astype(np.int64)))
        ref_pred = traces["pred_seq"].numpy()

        def caption_of(row):
            words = []
            for t in tokenizer.convert_ids_to_tokens([int(x) for x in row]):
                if t in ("[SEP]", "[PAD]"):
                    break
                words.append(t)
            return " ".join(detokenize(words))

        for i in range(3):
            assert preds[i] == caption_of(ref_pred[i]), i
