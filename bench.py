"""Benchmark: CC-pretraining training throughput per chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline (BASELINE.md): the reference pretrains Conceptual Captions at
5 hr/epoch on 8x V100 with per-GPU batch 64 (README.md:91).  Taking the CC
train split as ~3.0M image-text pairs, that is
    3.0e6 / (5*3600) / 8  =  20.8 samples/sec per V100.
``vs_baseline`` is our measured samples/sec on ONE TPU chip divided by that
per-GPU number.

The benchmarked step is the full pretraining update: bert-base VLP model,
joint s2s/bi batch, masked-LM + region-pretext losses, region masking,
Pallas fused attention, bf16 activations, BertAdam — jitted end to end.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_SAMPLES_PER_SEC_PER_GPU = 3.0e6 / (5 * 3600) / 8  # 20.83


def main():
    from vlp_tpu.config import VLPConfig
    from vlp_tpu.parallel import train_step as ts
    from __graft_entry__ import _example_batch

    on_tpu = jax.default_backend() == "tpu"
    cfg = VLPConfig(use_pallas_attention=on_tpu)
    model = ts.create_model(cfg)
    state, tx = ts.create_train_state(model, cfg, jax.random.PRNGKey(0),
                                      lr=1e-4, warmup=0.1, t_total=100000)
    step = jax.jit(ts.make_train_step(model, tx, mask_image_regions=True))

    B = 64 if on_tpu else 8
    batch = _example_batch(cfg, B, seed=0)

    # warmup/compile (fetch the scalar: through the axon tunnel,
    # block_until_ready alone does not guarantee completion)
    state, m = step(state, batch, jax.random.PRNGKey(0), 0.0)
    float(m["loss"])

    iters = 30 if on_tpu else 3
    t0 = time.perf_counter()
    for i in range(iters):
        state, m = step(state, batch, jax.random.PRNGKey(i + 1), 0.0)
        float(m["loss"])  # force completion every step
    dt = time.perf_counter() - t0

    sps = B * iters / dt
    print(json.dumps({
        "metric": "cc_pretrain_samples_per_sec_per_chip",
        "value": round(sps, 2),
        "unit": "samples/sec/chip",
        "vs_baseline": round(sps / BASELINE_SAMPLES_PER_SEC_PER_GPU, 2),
    }))


if __name__ == "__main__":
    main()
