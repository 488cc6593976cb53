"""Trace the full SCST step (rollouts + host CIDEr + fused-replay update)
on the real chip and summarise where the time goes.

Captures a jax.profiler trace around a few steady-state steps, then points
tools/trace_summary.py at it.  Wall-clock decomposition of the three
dispatches (both-rollouts program, grad+update program) plus the host
CIDEr interval is printed directly — the device trace alone cannot show
the host reward share.

Usage: python tools/profile_scst.py [--batch 256] [--steps 3]
       [--out /tmp/scst_profile]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--out", default="/tmp/scst_profile")
    args = ap.parse_args()

    import jax.numpy as jnp
    from tools.bench_scst import build_trainer
    from vlp_tpu.config import VLPConfig
    from vlp_tpu.data.example_builder import DecodeExampleBuilder, collate
    from vlp_tpu.parallel import train_step as ts
    from vlp_tpu.scst import get_self_critical_reward

    on_tpu = jax.default_backend() == "tpu"
    cfg = VLPConfig(use_pallas_attention=on_tpu)
    B, T = args.batch, cfg.max_len_b
    rng_np = np.random.default_rng(0)
    builder = DecodeExampleBuilder(cfg, {}, max_tgt_length=T)
    exs = [builder(rng_np.normal(size=(cfg.len_vis_input, cfg.vis_feat_dim)),
                   rng_np.normal(size=(cfg.len_vis_input, cfg.vis_pe_dim)))
           for _ in range(B)]
    batch = {k: jnp.asarray(v) for k, v in collate(exs).items()}
    gt_ids = rng_np.integers(1000, 5000, (B, T)).astype(np.int64)
    gt_ids[:, 10:] = 0

    trainer, state = build_trainer(cfg, batch, T, replay="fused")

    # warmup/compile
    state, loss, m = trainer.step(state, batch, gt_ids,
                                  ts.fast_prng_key(0))
    leaf = jax.tree_util.tree_leaves(state.params)[0]
    float(leaf.ravel()[0])
    print(f"warmup done (loss {loss:.4f})")

    # wall-clock decomposition: time the phases of trainer.step manually
    for i in range(2):
        t0 = time.perf_counter()
        greedy, sample, sample_raw = trainer.rollouts(
            state.params, batch, ts.fast_prng_key(10 + i))
        t1 = time.perf_counter()
        reward = get_self_critical_reward(greedy, gt_ids, sample)
        t2 = time.perf_counter()
        _, drop_rng = jax.random.split(ts.fast_prng_key(10 + i))
        state, loss2, m2 = trainer._grad_update(
            state, batch, jnp.asarray(sample_raw), jnp.asarray(sample),
            jnp.asarray(reward), drop_rng)
        float(jax.tree_util.tree_leaves(state.params)[0].ravel()[0])
        t3 = time.perf_counter()
        tot = t3 - t0
        print(f"step {i}: total {tot*1e3:7.1f} ms | "
              f"rollouts(dispatch+fetch ids) {100*(t1-t0)/tot:4.1f}% | "
              f"host CIDEr reward {100*(t2-t1)/tot:4.1f}% | "
              f"replay grad+BertAdam {100*(t3-t2)/tot:4.1f}%")

    # device trace for the kernel-level view
    jax.profiler.start_trace(args.out)
    for i in range(args.steps):
        state, loss3, _ = trainer.step(state, batch, gt_ids,
                                       ts.fast_prng_key(100 + i))
        float(jax.tree_util.tree_leaves(state.params)[0].ravel()[0])
    jax.profiler.stop_trace()
    print(f"trace written to {args.out}; summarise with\n"
          f"  python tools/trace_summary.py {args.out}")


if __name__ == "__main__":
    main()
