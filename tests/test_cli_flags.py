"""CLI flag-surface parity: every argparse flag the reference CLIs define
must exist in ours, except documented GPU-era exceptions."""

import os
import re

import pytest

from vlp_tpu.cli import decode as decode_cli
from vlp_tpu.cli import eval_vqa2 as vqa_cli
from vlp_tpu.cli import train as train_cli

REF_VLP = "/root/reference/vlp"

pytestmark = pytest.mark.skipif(not os.path.isdir(REF_VLP),
                                reason="reference tree not mounted")

# flags that exist only because of CUDA/torch process mechanics or dead
# features — PER CLI, so an exemption for one surface can't silently hide a
# missing flag on another; each entry must be justified here.  Absorbed
# no-op flags (--amp, --fp32_embedding, --trunc_seg, --world_size) are NOT
# exempt: they must exist on the parser with a "no-op" help note.
EXEMPT = {
    "run_img2txt_dist.py": {
        "--no_cuda",        # device selection is jax-automatic
        "--local_rank",     # NCCL process mechanics; mesh-derived on TPU
        "--global_rank",    # ditto (jax.process_index)
        "--dist_url",       # file:// NCCL rendezvous; --jax_distributed
        "--enable_visdom",  # visdom plots -> metrics.jsonl + plot_metrics.py
        "--visdom_port",    # ditto
    },
    "decode_img2txt.py": set(),
    "eval_vqa2.py": set(),
}


def ref_flags(fname):
    lines = [l for l in open(os.path.join(REF_VLP, fname))
             if not l.lstrip().startswith("#")]
    return set(re.findall(r"add_argument\(\s*[\"'](--[\w\-]+)[\"']",
                          "".join(lines)))


def our_flags(parser):
    out = set()
    for a in parser._actions:
        out.update(o for o in a.option_strings if o.startswith("--"))
    return out


@pytest.mark.parametrize("ref_file,parser", [
    ("run_img2txt_dist.py", train_cli.build_parser()),
    ("decode_img2txt.py", decode_cli.build_parser()),
    ("eval_vqa2.py", vqa_cli.build_parser()),
])
def test_flag_surface(ref_file, parser):
    missing = ref_flags(ref_file) - our_flags(parser) - EXEMPT[ref_file]
    assert not missing, f"{ref_file}: flags missing from our CLI: {missing}"
    stale = EXEMPT[ref_file] - ref_flags(ref_file)
    assert not stale, f"{ref_file}: exemptions no longer upstream: {stale}"
