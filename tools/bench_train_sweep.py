"""Training-throughput sweep over per-chip batch size (device-loop steps).

Same benchmarked computation as bench.py (full pretraining update, Pallas
attention, BertAdam) — sweeps B to find the chip's throughput knee.

Usage: python tools/bench_train_sweep.py [--batches 64,128,192,256] [--k 10]
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
    ap.add_argument("--batches", default="64,128,192,256")
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--outer", type=int, default=3)
    args = ap.parse_args()

    from vlp_tpu.config import VLPConfig
    from vlp_tpu.parallel import train_step as ts
    from __graft_entry__ import _example_batch

    on_tpu = jax.default_backend() == "tpu"
    cfg = VLPConfig(use_pallas_attention=on_tpu)
    model = ts.create_model(cfg)

    K = args.k
    for B in [int(b) for b in args.batches.split(",")]:
        state, tx = ts.create_train_state(model, cfg, jax.random.PRNGKey(0),
                                          lr=1e-4, warmup=0.1, t_total=100000)
        multi = jax.jit(ts.make_multi_step(model, tx,
                                           mask_image_regions=True),
                        donate_argnums=(0,))
        batch = _example_batch(cfg, B, seed=0)
        stacked = {k: jnp.broadcast_to(v[None], (K,) + v.shape)
                   for k, v in batch.items()}
        stacked["vis_feats"] = jax.random.normal(
            jax.random.PRNGKey(7), (K, B, cfg.len_vis_input, cfg.vis_feat_dim),
            jnp.float32)
        state, m = multi(state, stacked, ts.fast_prng_key(0), 0.0)
        float(m["loss"][-1])  # force completion through the tunnel
        t0 = time.perf_counter()
        for i in range(args.outer):
            state, m = multi(state, stacked, ts.fast_prng_key(i + 1), 0.0)
            float(m["loss"][-1])
        dt = time.perf_counter() - t0
        sps = B * K * args.outer / dt
        print(f"B={B:4d}: {sps:8.1f} samples/sec/chip "
              f"({dt / (K * args.outer) * 1000:.2f} ms/step)", flush=True)


if __name__ == "__main__":
    main()
