"""Interleaved A/B of beam-decode variants (one process, best-of-reps).

This box carries bursty external load and tunnel-side compile/dispatch
variance, so numbers from separate runs minutes apart are not comparable
(see .claude/skills/verify/SKILL.md).  This tool compiles N decode variants
once each, then interleaves timed reps and reports best-of per variant.

Usage: python tools/bench_beam_ab.py [--batch 100] [--beam 5] [--reps 4]
       [--variants onehot,gather]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from tools.common import fresh_features, setup_decode


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=100)
    ap.add_argument("--beam", type=int, default=5)
    ap.add_argument("--max_tgt_length", type=int, default=20)
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--variants", default="kernel,xla",
                    help="comma list: kernel (fused Pallas decode step), "
                         "xla (einsum path); suffixes -onehot (one-hot "
                         "cache reorder), -approx (approx_max_k first "
                         "stage), -blocktopkN (block-max-prefilter exact "
                         "top-k, width N), -fulltopk (lax.top_k custom "
                         "call), -stackcarry (one stacked [L,...] carry "
                         "per k/v instead of 24 per-layer arrays).  No "
                         "suffix = shipped defaults.")
    args = ap.parse_args()

    import dataclasses
    from vlp_tpu.decode import Decoder
    from vlp_tpu.models.model import VLPModel

    cfg, model, params, dec0, batch = setup_decode(
        args.batch, args.beam, args.max_tgt_length, forbid_ngrams=True)

    import re

    variants = {}
    for name in args.variants.split(","):
        reorder = ("onehot" if "onehot" in name
                   else "fused" if "fused" in name else "gather")
        blk = re.search(r"blocktopk(\d*)$", name)
        kw = {}
        if blk:
            kw = dict(topk_impl="blocks",
                      topk_block=int(blk.group(1)) if blk.group(1)
                      else dec0.dp.topk_block)
        elif name.endswith("fulltopk"):
            kw = dict(topk_impl="full")
        if "stackcarry" in name:
            kw["carry_impl"] = "stacked"
        dp = dataclasses.replace(
            dec0.dp, reorder_impl=reorder,
            approx_topk=name.endswith("approx"), **kw)
        cfg_v = dataclasses.replace(
            cfg, use_pallas_decode=name.startswith("kernel"))
        variants[name] = Decoder(VLPModel(cfg_v), cfg_v, dp)

    def run(dec, i):
        o = dec._beam(params, fresh_features(cfg, batch, i))
        float(np.asarray(o[2])[-1, 0, 0])  # force completion

    for name, dec in variants.items():
        t0 = time.perf_counter()
        run(dec, -1)
        print(f"{name}: compile+first {time.perf_counter() - t0:.1f}s",
              flush=True)

    best = {name: 1e9 for name in variants}
    for rep in range(args.reps):
        for name, dec in variants.items():
            t0 = time.perf_counter()
            run(dec, 100 + rep)
            best[name] = min(best[name], time.perf_counter() - t0)
    for name, t in best.items():
        print(f"{name:8s}: best {t * 1000:7.1f} ms/batch "
              f"= {args.batch / t:7.1f} captions/sec")


if __name__ == "__main__":
    main()
