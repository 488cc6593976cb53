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

Usage: python tools/bench_inference.py [--label r02]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

OUT_PATH = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "INFER_BENCH.json")


def measure_decode(batch_size=100, beam=5, max_tgt=20, outer=3):
    from tools.common import fresh_features, setup_decode
    cfg, model, params, dec, batch = setup_decode(batch_size, beam, max_tgt,
                                                  True)
    dec.beam_search(params, fresh_features(cfg, batch, -1))  # compile
    batches = [fresh_features(cfg, batch, i) for i in range(outer)]
    t0 = time.perf_counter()
    for b in batches:
        dec.beam_search(params, b)  # np fetch inside forces completion
    return batch_size * outer / (time.perf_counter() - t0)


def measure_vqa(batch_size=256, outer=5):
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
    t0 = time.perf_counter()
    for i in range(1, outer + 1):
        int(np.asarray(infer(params, fresh(i)))[0])
    return B * outer / (time.perf_counter() - t0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--label", default="")
    ap.add_argument("--outer", type=int, default=3)
    args = ap.parse_args()

    import jax
    rec = {
        "label": args.label,
        "backend": jax.default_backend(),
        "time": time.strftime("%Y-%m-%d %H:%M:%S"),
        "beam5_b100_captions_per_sec": round(
            measure_decode(outer=args.outer), 1),
        "vqa_b256_questions_per_sec": round(
            measure_vqa(outer=max(args.outer, 3)), 1),
    }
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
