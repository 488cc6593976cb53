"""Round-over-round inference throughput artifact.

Measures the two inference paths at the reference's published eval recipes
and APPENDS one record to ``INFER_BENCH.json`` at the repo root, so decode/
VQA regressions are caught round-over-round like BENCH does for training:
  * beam-5 caption decoding at batch 100 (reference README.md:209-216) —
    captions/sec;
  * VQA ``vqa_inference`` argmax at batch 256 (eval_vqa2.py:237-241) —
    questions/sec.
Inputs are generated on device (the axon tunnel's ~2 MB/s h2d link and the
1-core host must not bottleneck a device measurement); every iteration uses
different features so no dispatch is served from the remote execution
cache; host-side fetches force completion.

Methodology (round 3): the remote TPU runtime has documented 13s-500s
compile variance and bursty dispatch latency (CLAUDE.md), so a single
timing window can undershoot the sustained rate by >1.7x (the r02 records
192/326 vs the 560 the same code sustains in a quiet window).  Each metric
now times ``--windows`` independent windows of ``--outer`` batches and
reports the BEST window (the sustained-capability number — same discipline
as ``bench.py:_bench_host_loader``), with every per-window number and the
median recorded in the JSON so round-over-round noise is visible instead of
masquerading as a regression.

Round 3 adds an opt-in serving-batch sweep (``--serving_batches 200,400``):
the reference's recipe is B=100, but a serving deployment wants the
max-throughput batch, and the decode kernel's VMEM-aware block sizing
(ops/decode_attention.py:_block_examples) is what makes B>128 compile at
all — the sweep keeps that scaling a tracked artifact.

Usage: python tools/bench_inference.py [--label r03] [--windows 5]
"""

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

OUT_PATH = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "INFER_BENCH.json")


def _window_stats(per_window, converge=0.10):
    best = max(per_window)
    steady = [x for x in per_window if x >= best * (1 - converge)]
    return {
        "best": round(best, 1),
        "median": round(statistics.median(per_window), 1),
        "windows": [round(x, 1) for x in per_window],
        # steady-state view (round-5 hygiene): windows within `converge` of
        # best — the reproducible number.  `stable` asserts at least three
        # such windows, i.e. the best was sustained, not a lucky burst.
        "steady_median": round(statistics.median(steady), 1),
        "steady_windows": len(steady),
        "stable": len(steady) >= 3,
    }


def _run_windows(run_window, windows, converge=0.10):
    """Steady-state discipline: ONE untimed warmup window (post-compile
    remote-runtime warmup made the r04 greedy windows span 206.9->1460.4,
    a 7x spread under best-of reporting), then timed windows until the
    three fastest agree within ``converge``, capped at 3x the requested
    count.  Returns every timed window; _window_stats summarises."""
    run_window()  # warmup: first post-compile window is burst-prone
    rates = []
    cap = 3 * windows
    while True:
        rates.append(run_window())
        if len(rates) >= windows:
            top = sorted(rates, reverse=True)[:3]
            if len(top) >= 3 and (top[0] - top[2]) / top[0] <= converge:
                break
            if len(rates) >= cap:
                break
    return rates


def measure_decode(batch_size=100, beam=5, max_tgt=20, outer=3, windows=5):
    """Times the decode CLI's steady-state discipline: depth-1 pipelined
    dispatch/collect (cli/decode.py) — dispatch batch N+1, then fetch +
    back-trace batch N, so the trace round-trip overlaps device compute.
    The final collect forces completion of everything dispatched in the
    window."""
    from tools.common import fresh_features, setup_decode
    cfg, model, params, dec, batch = setup_decode(batch_size, beam, max_tgt,
                                                  True)
    dec.beam_search(params, fresh_features(cfg, batch, -1))  # compile
    batches = [fresh_features(cfg, batch, i) for i in range(outer)]

    def run_window():
        t0 = time.perf_counter()
        pending = None
        for b in batches:
            handle = dec.beam_dispatch(params, b)
            if pending is not None:
                dec.beam_collect(pending)
            pending = handle
        dec.beam_collect(pending)
        return batch_size * outer / (time.perf_counter() - t0)

    return _window_stats(_run_windows(run_window, windows))


def measure_greedy(batch_size=100, max_tgt=20, outer=3, windows=5):
    """Beam-1 (greedy) decode — the reference's VAL-split setting
    (README.md:209-216 decodes val with beam 1, test with beam 5); same
    depth-1 pipelined discipline as measure_decode."""
    from tools.common import fresh_features, setup_decode
    cfg, model, params, dec, batch = setup_decode(batch_size, 1, max_tgt,
                                                  False)
    dec.greedy(params, fresh_features(cfg, batch, -1))  # compile
    batches = [fresh_features(cfg, batch, i) for i in range(outer)]

    def run_window():
        t0 = time.perf_counter()
        pending = None
        for b in batches:
            ids, _ = dec.greedy(params, b)
            if pending is not None:
                np.asarray(pending)  # materialise previous (depth-1)
            pending = ids
        np.asarray(pending)
        return batch_size * outer / (time.perf_counter() - t0)

    return _window_stats(_run_windows(run_window, windows))


def measure_vqa(batch_size=256, outer=5, windows=5):
    import jax
    import jax.numpy as jnp
    from vlp_tpu.config import MODE_BI, VLPConfig
    from vlp_tpu.models.model import VLPModel
    from vlp_tpu.parallel import train_step as ts

    on_tpu = jax.default_backend() == "tpu"
    B = batch_size if on_tpu else 8
    cfg = VLPConfig(use_pallas_attention=on_tpu)
    model = ts.create_model(cfg, task="vqa2")
    params = ts.init_params(model, cfg, jax.random.PRNGKey(0), task="vqa2")
    rng = np.random.default_rng(0)
    L, nv, prefix = cfg.seq_len, cfg.len_vis_input, cfg.prefix_len
    nb = 12
    ids = np.zeros((B, L), np.int32)
    ids[:, 0] = 101
    ids[:, 1:nv + 1] = 100
    ids[:, nv + 1] = 102
    ids[:, prefix:prefix + nb] = rng.integers(200, cfg.vocab_size, (B, nb))
    ids[:, prefix + nb] = 102
    seg = np.zeros((B, L), np.int32)
    seg[:, prefix:prefix + nb + 1] = 1
    batch = dict(
        input_ids=jnp.asarray(ids), segment_ids=jnp.asarray(seg),
        mode=jnp.full((B,), MODE_BI, jnp.int32),
        text_end=jnp.full((B,), prefix + nb + 1, jnp.int32),
        task_idx=jnp.zeros((B,), jnp.int32),
        vis_feats=jnp.zeros((B, nv, cfg.vis_feat_dim), jnp.float32),
        vis_pe=jnp.zeros((B, nv, cfg.vis_pe_dim), jnp.float32),
    )
    infer = jax.jit(lambda p, b: model.apply({"params": p}, b,
                                             method=VLPModel.vqa_inference))

    def fresh(i):
        b = dict(batch)
        b["vis_feats"] = jax.random.normal(
            jax.random.PRNGKey(i), (B, nv, cfg.vis_feat_dim), jnp.float32)
        return b

    int(np.asarray(infer(params, fresh(0)))[0])  # compile + force
    wct = [0]

    def run_window():
        # depth-1 pipelined dispatch/collect, matching the VQA eval CLI's
        # steady-state loop (cli/eval_vqa2.py trails the fetch one batch
        # behind the dispatch); measured 3143 -> 4412 q/s vs serialized
        wct[0] += 1
        t0 = time.perf_counter()
        pending = None
        for i in range(1, outer + 1):
            h = infer(params, fresh(wct[0] * outer + i))
            if pending is not None:
                int(np.asarray(pending)[0])
            pending = h
        int(np.asarray(pending)[0])
        return B * outer / (time.perf_counter() - t0)

    return _window_stats(_run_windows(run_window, windows))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--label", default="")
    ap.add_argument("--outer", type=int, default=3)
    ap.add_argument("--windows", type=int, default=5,
                    help="independent timing windows per metric; the record "
                         "reports best-of (sustained capability) plus the "
                         "per-window numbers and median")
    ap.add_argument("--serving_batches", default="",
                    help="comma-separated extra decode batch sizes to sweep "
                         "(e.g. 200,400); each adds beam5_b{B}_* fields")
    ap.add_argument("--greedy", action="store_true",
                    help="also record beam-1 decode at B=100 (the "
                         "reference's val-split setting)")
    args = ap.parse_args()

    import jax
    dec = measure_decode(outer=args.outer, windows=args.windows)
    serving = {}
    for b in (int(x) for x in args.serving_batches.split(",") if x):
        serving[b] = measure_decode(batch_size=b, outer=args.outer,
                                    windows=args.windows)
    greedy = (measure_greedy(outer=args.outer, windows=args.windows)
              if args.greedy else None)
    vqa = measure_vqa(outer=max(args.outer, 3), windows=args.windows)
    rec = {
        "label": args.label,
        "backend": jax.default_backend(),
        "time": time.strftime("%Y-%m-%d %H:%M:%S"),
        "methodology": (f"warmup window + >= {args.windows} windows x "
                        f"{args.outer} batches, extended until the 3 "
                        "fastest agree within 10% (see _run_windows)"),
    }

    def put(prefix, st):
        # "beam5_b100_captions_per_sec" -> aux keys on "beam5_b100_*",
        # matching the historical record schema
        rec[f"{prefix}"] = st["best"]
        for k in ("median", "windows", "steady_median", "steady_windows",
                  "stable"):
            rec[f"{prefix.rsplit('_', 3)[0]}_{k}"] = st[k]

    put("beam5_b100_captions_per_sec", dec)
    put("vqa_b256_questions_per_sec", vqa)
    for b, st in serving.items():
        put(f"beam5_b{b}_captions_per_sec", st)
    if greedy is not None:
        put("greedy_b100_captions_per_sec", greedy)
    hist = []
    if os.path.exists(OUT_PATH):
        with open(OUT_PATH) as f:
            hist = json.load(f)
    hist.append(rec)
    with open(OUT_PATH, "w") as f:
        json.dump(hist, f, indent=1)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
