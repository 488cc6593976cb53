"""SCST training throughput (full self-critical step).

Reference recipe (BASELINE.md): COCO SCST fine-tune, batch 16x4, 3 hr/epoch
on 4x Titan Xp.  The Karpathy train split is ~113k images, so that is
    113287 / (3*3600) / 4  =  2.62 samples/sec per GPU.

One benchmarked step = greedy rollout (eval mode) + sampled rollout (train
mode, dropout on) + host CIDEr reward + differentiable forced-rollout policy
gradient + BertAdam update — the full run_img2txt_dist.py:486-523 loop body.

Usage: python tools/bench_scst.py [--batch 64] [--outer 5]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

BASELINE_SCST_SPS_PER_GPU = 113287 / (3 * 3600) / 4  # 2.62


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--outer", type=int, default=5)
    args = ap.parse_args()

    import jax.numpy as jnp
    from vlp_tpu.config import VLPConfig
    from vlp_tpu.data.example_builder import DecodeExampleBuilder, collate
    from vlp_tpu.parallel import train_step as ts
    from vlp_tpu.scst import SCSTTrainer

    on_tpu = jax.default_backend() == "tpu"
    cfg = VLPConfig(use_pallas_attention=on_tpu)
    model = ts.create_model(cfg)
    state, tx = ts.create_train_state(model, cfg, jax.random.PRNGKey(0),
                                      lr=1e-6, warmup=0.1, t_total=100000)
    trainer = SCSTTrainer(model, cfg, mask_id=103, eos_id=102, pad_id=0,
                          max_tgt_length=cfg.max_len_b, tx=tx)

    B, T = args.batch, cfg.max_len_b
    rng_np = np.random.default_rng(0)
    builder = DecodeExampleBuilder(cfg, {}, max_tgt_length=T)
    exs = [builder(rng_np.normal(size=(cfg.len_vis_input, cfg.vis_feat_dim)),
                   rng_np.normal(size=(cfg.len_vis_input, cfg.vis_pe_dim)))
           for _ in range(B)]
    batch = {k: jnp.asarray(v) for k, v in collate(exs).items()}
    gt_ids = rng_np.integers(1000, 5000, (B, T)).astype(np.int64)
    gt_ids[:, 10:] = 0  # captions ~10 tokens

    def one_step(st, i):
        rng = ts.fast_prng_key(i)
        st, loss, metrics = trainer.step(st, batch, gt_ids, rng)
        # fetch a scalar from the updated params: block_until_ready is NOT a
        # barrier over the axon tunnel (see .claude/skills/verify/SKILL.md)
        leaf = jax.tree_util.tree_leaves(st.params)[0]
        float(leaf.ravel()[0])
        return st, loss, metrics

    state, loss, m = one_step(state, 0)  # compile
    print(f"warmup loss {loss:.4f} mean_reward {m['mean_reward']:.3f}")

    t0 = time.perf_counter()
    for i in range(args.outer):
        state, loss, _ = one_step(state, i + 1)
    dt = time.perf_counter() - t0
    sps = B * args.outer / dt
    print(f"scst: {sps:.1f} samples/sec/chip "
          f"({dt / args.outer * 1000:.0f} ms/step at B={B}) — "
          f"{sps / BASELINE_SCST_SPS_PER_GPU:.1f}x the per-GPU baseline")


if __name__ == "__main__":
    main()
