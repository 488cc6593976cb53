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
Pallas fused attention, bf16 activations, BertAdam — jitted end to end,
K=20 steps scanned per dispatch, dropout masks from the hardware rbg
PRNG stream (train_step.fast_prng_key).
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_SAMPLES_PER_SEC_PER_GPU = 3.0e6 / (5 * 3600) / 8  # 20.83


def main():
    import functools

    import jax.numpy as jnp

    from vlp_tpu.config import VLPConfig
    from vlp_tpu.parallel import train_step as ts
    from __graft_entry__ import _example_batch

    on_tpu = jax.default_backend() == "tpu"
    cfg = VLPConfig(use_pallas_attention=on_tpu)
    model = ts.create_model(cfg)
    state, tx = ts.create_train_state(model, cfg, jax.random.PRNGKey(0),
                                      lr=1e-4, warmup=0.1, t_total=100000)
    # production path: K training steps scanned on device per dispatch
    # (the per-call dispatch overhead of remote runtimes would otherwise
    # dominate; see parallel/train_step.make_multi_step)
    multi = jax.jit(ts.make_multi_step(model, tx, mask_image_regions=True),
                    donate_argnums=(0,))

    B = 128 if on_tpu else 8
    K = 20 if on_tpu else 2
    batch = _example_batch(cfg, B, seed=0)
    # stack K per-step batches on device (features re-drawn per step so the
    # memory traffic is realistic; host->device transfer happens once)
    stacked = {k: jnp.broadcast_to(v[None], (K,) + v.shape)
               for k, v in batch.items()}
    stacked["vis_feats"] = jax.random.normal(
        jax.random.PRNGKey(7), (K, B, cfg.len_vis_input, cfg.vis_feat_dim),
        jnp.float32)

    # warmup/compile (fetch the scalar: through the axon tunnel,
    # block_until_ready alone does not guarantee completion)
    state, m = multi(state, stacked, ts.fast_prng_key(0), 0.0)
    float(m["loss"][-1])

    outer = 3 if on_tpu else 1
    t0 = time.perf_counter()
    for i in range(outer):
        state, m = multi(state, stacked, ts.fast_prng_key(i + 1), 0.0)
        float(m["loss"][-1])  # force completion
    dt = time.perf_counter() - t0

    sps = B * K * outer / dt
    print(json.dumps({
        "metric": "cc_pretrain_samples_per_sec_per_chip",
        "value": round(sps, 2),
        "unit": "samples/sec/chip",
        "vs_baseline": round(sps / BASELINE_SAMPLES_PER_SEC_PER_GPU, 2),
    }))


if __name__ == "__main__":
    main()
