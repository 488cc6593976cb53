"""Two-process ``jax.distributed`` smoke test on CPU.

The virtual 8-device mesh exercises sharding but is ONE process; the
multi-host branches (--jax_distributed, per-host loader split, the resume
broadcast at cli/train.py and the epoch barrier) need real processes.
This spawns two OS processes on localhost — the reference's hand-launched
one-process-per-GPU pattern (run_img2txt_dist.py:224-234, README.md:139-155)
— trains 2 synthetic epochs data-parallel over the 2-device global mesh,
then resumes for a third epoch through the recover-step broadcast.
"""

import json
import os
import socket
import subprocess
import sys

import pytest

from vlp_tpu.cli import common as cli_common

CHILD = """
import sys
import jax
jax.config.update("jax_platforms", "cpu")
from vlp_tpu.cli import train as train_cli
train_cli.main(sys.argv[1:])
"""


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.fixture(scope="module")
def fx(tmp_path_factory):
    d = tmp_path_factory.mktemp("mp")
    vocab = str(d / "vocab.txt")
    cli_common.write_synthetic_vocab(vocab, size=120)
    cfg_json = str(d / "bert_config.json")
    with open(cfg_json, "w") as f:
        json.dump({"vocab_size": 120, "hidden_size": 32,
                   "num_hidden_layers": 2, "num_attention_heads": 2,
                   "intermediate_size": 64, "max_position_embeddings": 512,
                   "vis_feat_dim": 24, "vis_cls_dim": 10, "vis_pe_dim": 16},
                  f)
    child = str(d / "child.py")
    with open(child, "w") as f:
        f.write(CHILD)
    return dict(dir=str(d), vocab=vocab, cfg=cfg_json, child=child)


def _launch(fx, out, epochs, port, extra=(), devices_per_proc=1):
    """Spawn the 2-process group; returns the two completed processes."""
    env = dict(os.environ)
    # pytest's conftest forces an 8-device CPU mesh via XLA_FLAGS; the
    # children must see devices_per_proc local devices each
    env.pop("XLA_FLAGS", None)
    if devices_per_proc > 1:
        env["XLA_FLAGS"] = ("--xla_force_host_platform_device_count="
                            f"{devices_per_proc}")
    env["JAX_PLATFORMS"] = "cpu"
    import vlp_tpu
    repo = os.path.dirname(os.path.dirname(os.path.abspath(
        vlp_tpu.__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    base = ["--do_train", "--synthetic_data", "--enable_butd",
            "--bert_model", fx["vocab"], "--config_path", fx["cfg"],
            "--output_dir", out, "--train_batch_size", "4",
            "--steps_per_epoch", "2", "--new_segment_ids",
            "--len_vis_input", "6", "--max_len_b", "5", "--max_pred", "3",
            "--num_workers", "1", "--learning_rate", "1e-3",
            "--num_train_epochs", str(epochs),
            "--jax_distributed",
            "--coordinator_address", f"localhost:{port}",
            "--num_processes", "2", *extra]
    procs = [subprocess.Popen(
        [sys.executable, fx["child"], *base, "--process_id", str(i)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for i in range(2)]
    return _collect(procs)


def _collect(procs):
    outs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(stdout.decode(errors="replace"))
    return procs, outs


def test_two_process_train_and_resume(fx):
    # first leg also exercises the K-step device loop across processes
    # (shard_stacked_batch assembles each host's [K, local_B, ...] stack
    # into global arrays; the zero-copy feature slabs are per-host)
    out = os.path.join(fx["dir"], "out")
    procs, logs = _launch(fx, out, epochs=2, port=_free_port(),
                          extra=("--device_loop_steps", "2"))
    for p, text in zip(procs, logs):
        assert p.returncode == 0, text[-4000:]
    assert os.path.isdir(os.path.join(out, "model.2"))
    assert os.path.isdir(os.path.join(out, "optim.2"))
    log = open(os.path.join(out, "training.log")).read()
    assert "data-parallel training over 2 devices / 2 processes" in log

    # resume: epoch 3 only; the recover step travels through the
    # broadcast_one_to_all agreement (cli/train.py) on BOTH hosts
    procs, logs = _launch(fx, out, epochs=3, port=_free_port())
    for p, text in zip(procs, logs):
        assert p.returncode == 0, text[-4000:]
    assert os.path.isdir(os.path.join(out, "model.3"))
    log = open(os.path.join(out, "training.log")).read()
    assert "Recover model: 2" in log


def test_two_process_tensor_parallel_train_and_resume(fx):
    """dp2 x tp2 over 2 processes x 2 local CPU devices (round 5): the
    manual shard_map TP collectives (Megatron f/g, ops/tp.py, plus
    BertAdam's clip psum over 'model') execute across an OS-process
    boundary, the TP-sharded TrainState is placed via put_on_mesh
    (device_put cannot target non-addressable devices — exactly where the
    round-4 multi-process DP bugs bit), and the epoch checkpoint is
    assembled from host-addressable shards
    (checkpoint.jax_tree_to_numpy).  The resume leg restores and re-shards
    the TP state."""
    out = os.path.join(fx["dir"], "out_tp")
    procs, logs = _launch(fx, out, epochs=1, port=_free_port(),
                          extra=("--tensor_parallel", "2"),
                          devices_per_proc=2)
    for p, text in zip(procs, logs):
        assert p.returncode == 0, text[-4000:]
    assert os.path.isdir(os.path.join(out, "model.1"))
    assert os.path.isdir(os.path.join(out, "optim.1"))
    log = open(os.path.join(out, "training.log")).read()
    assert "shard_map training: dp=2 x tp=2" in log

    procs, logs = _launch(fx, out, epochs=2, port=_free_port(),
                          extra=("--tensor_parallel", "2"),
                          devices_per_proc=2)
    for p, text in zip(procs, logs):
        assert p.returncode == 0, text[-4000:]
    assert os.path.isdir(os.path.join(out, "model.2"))
    log = open(os.path.join(out, "training.log")).read()
    assert "Recover model: 1" in log
