"""Phase breakdown of beam decode: device scan vs host backtrace vs fetch.

Also optionally writes a jax.profiler trace (--trace DIR) for op-level
inspection (summarize with tools/trace_summary.py).
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
    ap.add_argument("--outer", type=int, default=3)
    ap.add_argument("--trace", default="")
    args = ap.parse_args()
    assert args.outer >= 1

    import jax

    cfg, model, params, dec, batch = setup_decode(
        args.batch, args.beam, args.max_tgt_length, forbid_ngrams=True)

    def run_device(i):
        o = dec._beam(params, fresh_features(cfg, batch, i))
        # force full completion: a scalar from the last scan step
        float(np.asarray(o[2])[-1, 0, 0])
        return o

    run_device(-1)  # compile

    t0 = time.perf_counter()
    for i in range(args.outer):
        o = run_device(i)
    t_dev = (time.perf_counter() - t0) / args.outer

    step_ids, step_ptrs, step_scores = [np.asarray(x) for x in o]
    t0 = time.perf_counter()
    for _ in range(args.outer):
        dec._backtrace(step_ids, step_ptrs, step_scores)
    t_bt = (time.perf_counter() - t0) / args.outer

    t0 = time.perf_counter()
    for i in range(args.outer):
        dec.beam_search(params, fresh_features(cfg, batch, 100 + i))
    t_all = (time.perf_counter() - t0) / args.outer

    print(f"device beam scan : {t_dev * 1000:7.1f} ms")
    print(f"host backtrace   : {t_bt * 1000:7.1f} ms")
    print(f"full beam_search : {t_all * 1000:7.1f} ms")

    if args.trace:
        with jax.profiler.trace(args.trace):
            run_device(999)
        print("trace written to", args.trace)


if __name__ == "__main__":
    main()
