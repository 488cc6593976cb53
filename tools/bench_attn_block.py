"""Interleaved A/B over examples-per-grid-step (E) in the blhd kernels.

Compiles the full pretraining multi-step once per E (the kernel grid is a
trace-time constant via ops.attention._BLHD_E_OVERRIDE), then interleaves
timed reps in ONE process and reports best-of per variant — separate runs
on this box vary 2-4x with external load.

Usage: python tools/bench_attn_block.py [--es 1,2,4,8] [--batch 128]
       [--k 10] [--reps 4]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--es", default="1,4")
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--reps", type=int, default=4)
    args = ap.parse_args()

    from vlp_tpu.config import VLPConfig
    from vlp_tpu.ops import attention as attn
    from vlp_tpu.parallel import train_step as ts
    from __graft_entry__ import _example_batch

    on_tpu = jax.default_backend() == "tpu"
    cfg = VLPConfig(use_pallas_attention=on_tpu)
    model = ts.create_model(cfg)
    B, K = args.batch, args.k
    batch = _example_batch(cfg, B, seed=0)
    stacked = {k: jnp.broadcast_to(v[None], (K,) + v.shape)
               for k, v in batch.items()}
    stacked["vis_feats"] = jax.random.normal(
        jax.random.PRNGKey(7), (K, B, cfg.len_vis_input, cfg.vis_feat_dim),
        jnp.float32)

    # ONE shared state: E only changes the kernel grid, never the param
    # tree, and per-variant resident states (params + BertAdam moments)
    # would OOM the chip (see tools/bench_dropout_prng.py).  Updated states
    # are dropped after each timed call — throughput only.
    state, tx = ts.create_train_state(model, cfg, jax.random.PRNGKey(0),
                                      lr=1e-4, warmup=0.1, t_total=100000)
    variants = {}
    for e in [int(x) for x in args.es.split(",")]:
        attn._BLHD_E_OVERRIDE = e
        multi = jax.jit(ts.make_multi_step(model, tx,
                                           mask_image_regions=True))
        t0 = time.perf_counter()
        _, m = multi(state, stacked, ts.fast_prng_key(0), 0.0)
        float(m["loss"][-1])
        print(f"E={e}: compile+first {time.perf_counter() - t0:.1f}s",
              flush=True)
        variants[e] = multi
    attn._BLHD_E_OVERRIDE = None

    best = {e: 1e9 for e in variants}
    for rep in range(args.reps):
        for e, multi in variants.items():
            t0 = time.perf_counter()
            _, m = multi(state, stacked, ts.fast_prng_key(rep + 1), 0.0)
            float(m["loss"][-1])
            best[e] = min(best[e], time.perf_counter() - t0)
    for e, t in sorted(best.items()):
        print(f"E={e}: best {B * K / t:8.1f} samples/sec/chip "
              f"({t / K * 1000:.2f} ms/step)")


if __name__ == "__main__":
    main()
