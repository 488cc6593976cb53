"""Decode throughput at the reference eval recipe: beam 5, batch 100.

Reference context: caption decoding in the reference is its own eval
bottleneck (README.md:205 recommends single-GPU inference because custom
batching makes data loading dominate).  Here the whole beam loop is one
jitted `lax.scan`; this tool times it honestly through the axon tunnel
(fetching the trace arrays each batch forces completion).

Usage: python tools/bench_decode.py [--batch 100] [--beam 5] [--outer 3]
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
    ap.add_argument("--batch", type=int, default=100)
    ap.add_argument("--beam", type=int, default=5)
    ap.add_argument("--max_tgt_length", type=int, default=20)
    ap.add_argument("--outer", type=int, default=3)
    ap.add_argument("--forbid_ngrams", action="store_true", default=True)
    args = ap.parse_args()

    from vlp_tpu.config import VLPConfig
    from vlp_tpu.data.example_builder import DecodeExampleBuilder, collate
    from vlp_tpu.decode import DecodeParams, Decoder
    from vlp_tpu.parallel import train_step as ts

    on_tpu = jax.default_backend() == "tpu"
    cfg = VLPConfig(use_pallas_attention=on_tpu)
    model = ts.create_model(cfg)
    params = ts.init_params(model, cfg, jax.random.PRNGKey(0))
    dp = DecodeParams(beam_size=args.beam, length_penalty=0.0,
                      forbid_duplicate_ngrams=args.forbid_ngrams,
                      ngram_size=3, min_len=0,
                      max_tgt_length=args.max_tgt_length,
                      forbid_ignore_ids=(102,))
    dec = Decoder(model, cfg, dp)

    rng = np.random.default_rng(0)
    builder = DecodeExampleBuilder(cfg, {}, max_tgt_length=args.max_tgt_length)
    exs = [builder(rng.normal(size=(cfg.len_vis_input, cfg.vis_feat_dim)),
                   rng.normal(size=(cfg.len_vis_input, cfg.vis_pe_dim)))
           for _ in range(args.batch)]
    import jax.numpy as jnp
    batch = {k: jnp.asarray(v) for k, v in collate(exs).items()}

    # warmup/compile; np.asarray fetch inside beam_search forces completion
    t0 = time.perf_counter()
    out = dec.beam_search(params, batch)
    print(f"compile+first batch: {time.perf_counter() - t0:.1f}s "
          f"pred_seq shape {out['pred_seq'].shape}")

    t0 = time.perf_counter()
    for i in range(args.outer):
        out = dec.beam_search(params, batch)
    dt = time.perf_counter() - t0
    cps = args.batch * args.outer / dt
    print(f"beam-{args.beam} batch={args.batch}: {cps:.1f} captions/sec "
          f"({dt / args.outer * 1000:.0f} ms/batch)")


if __name__ == "__main__":
    main()
