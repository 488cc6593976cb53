"""A/B: cost of dropout mask generation in the pretraining step.

Quantifies (interleaved in ONE process, best-of-N — the dev box carries
bursty external load, see .claude/skills/verify/SKILL.md):

  A. full dropout (hidden 0.1 + attention 0.1, on-chip PRNG in the kernel)
  B. attention dropout off (hidden 0.1)   -> isolates the kernel PRNG cost
  C. all dropout off                      -> isolates hidden-dropout cost

Run on the real chip: `python tools/bench_dropout_prng.py`.
"""

import dataclasses
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vlp_tpu.config import VLPConfig
from vlp_tpu.parallel import train_step as ts
from __graft_entry__ import _example_batch

B, K, REPS = 128, 20, 3


def main():
    on_tpu = jax.default_backend() == "tpu"
    base = VLPConfig(use_pallas_attention=on_tpu)
    variants = {
        "A_full_dropout": base,
        "B_no_attn_dropout": dataclasses.replace(
            base, attention_probs_dropout_prob=0.0),
        "C_no_dropout": dataclasses.replace(
            base, attention_probs_dropout_prob=0.0, hidden_dropout_prob=0.0),
    }
    # ONE shared train state (the param tree is config-independent): three
    # resident states + the K-stacked batch OOM a single v5e chip.  No
    # donation — each call's output state is discarded.
    model0 = ts.create_model(base)
    state, tx = ts.create_train_state(model0, base, jax.random.PRNGKey(0),
                                      lr=1e-4, warmup=0.1, t_total=100000)
    steps = {}
    batch = _example_batch(base, B, seed=0)
    stacked = {k: jnp.broadcast_to(v[None], (K,) + v.shape)
               for k, v in batch.items()}
    stacked["vis_feats"] = jax.random.normal(
        jax.random.PRNGKey(7), (K, B, base.len_vis_input, base.vis_feat_dim),
        jnp.float32)
    for name, cfg in variants.items():
        model = ts.create_model(cfg)
        multi = jax.jit(ts.make_multi_step(model, tx,
                                           mask_image_regions=True))
        out, m = multi(state, stacked, ts.fast_prng_key(0), 0.0)
        float(m["loss"][-1])  # compile + warm
        del out
        steps[name] = multi
        print(f"compiled {name}", flush=True)

    best = {name: float("inf") for name in variants}
    for rep in range(REPS):
        for name in variants:
            t0 = time.perf_counter()
            out, m = steps[name](state, stacked, ts.fast_prng_key(rep + 1),
                                 0.0)
            float(m["loss"][-1])
            best[name] = min(best[name], time.perf_counter() - t0)
            del out
    for name, dt in best.items():
        print(f"{name}: {dt*1e3:.1f} ms / {K} steps "
              f"-> {B*K/dt:.0f} samples/s", flush=True)
    a, b, c = (best[n] for n in variants)
    print(f"attention-PRNG cost: {(a-b)/a*100:.1f}% of full step")
    print(f"hidden-dropout cost: {(b-c)/a*100:.1f}% of full step")


if __name__ == "__main__":
    main()
