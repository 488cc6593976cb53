"""Decode throughput at the reference eval recipe: beam 5, batch 100.

Reference context: caption decoding in the reference is its own eval
bottleneck (README.md:205 recommends single-GPU inference because custom
batching makes data loading dominate).  Here the whole beam loop is one
jitted `lax.scan`; this tool times it honestly through the axon tunnel:
each iteration decodes DIFFERENT region features (generated on device) so no
dispatch can be served from the remote execution cache, and the host-side
trace fetch forces completion.

Usage: python tools/bench_decode.py [--batch 100] [--beam 5] [--outer 3]
       [--no-forbid_ngrams]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.common import fresh_features, setup_decode


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=100)
    ap.add_argument("--beam", type=int, default=5)
    ap.add_argument("--max_tgt_length", type=int, default=20)
    ap.add_argument("--outer", type=int, default=3)
    ap.add_argument("--forbid_ngrams", action=argparse.BooleanOptionalAction,
                    default=True)
    args = ap.parse_args()
    assert args.outer >= 1

    cfg, model, params, dec, batch = setup_decode(
        args.batch, args.beam, args.max_tgt_length, args.forbid_ngrams)

    t0 = time.perf_counter()
    out = dec.beam_search(params, fresh_features(cfg, batch, -1))
    print(f"compile+first batch: {time.perf_counter() - t0:.1f}s "
          f"pred_seq shape {out['pred_seq'].shape}")

    batches = [fresh_features(cfg, batch, i) for i in range(args.outer)]
    # depth-1 pipelined dispatch/collect, matching the decode CLI's
    # steady-state loop (cli/decode.py): the trace round-trip overlaps
    # device compute; the final collect forces full completion
    t0 = time.perf_counter()
    pending = None
    for b in batches:
        handle = dec.beam_dispatch(params, b)
        if pending is not None:
            dec.beam_collect(pending)
        pending = handle
    out = dec.beam_collect(pending)
    dt = time.perf_counter() - t0
    cps = args.batch * args.outer / dt
    print(f"beam-{args.beam} batch={args.batch}: {cps:.1f} captions/sec "
          f"({dt / args.outer * 1000:.0f} ms/batch)")


if __name__ == "__main__":
    main()
