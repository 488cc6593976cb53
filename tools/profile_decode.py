"""Phase breakdown of beam decode: device scan vs host backtrace vs fetch.

Also optionally writes a jax.profiler trace (--trace DIR) for op-level
inspection.
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
    ap.add_argument("--outer", type=int, default=3)
    ap.add_argument("--trace", default="")
    args = ap.parse_args()

    from vlp_tpu.config import VLPConfig
    from vlp_tpu.data.example_builder import DecodeExampleBuilder, collate
    from vlp_tpu.decode import DecodeParams, Decoder
    from vlp_tpu.parallel import train_step as ts

    on_tpu = jax.default_backend() == "tpu"
    cfg = VLPConfig(use_pallas_attention=on_tpu)
    model = ts.create_model(cfg)
    params = ts.init_params(model, cfg, jax.random.PRNGKey(0))
    dp = DecodeParams(beam_size=args.beam, forbid_duplicate_ngrams=True,
                      ngram_size=3, max_tgt_length=20,
                      forbid_ignore_ids=(102,))
    dec = Decoder(model, cfg, dp)

    rng = np.random.default_rng(0)
    builder = DecodeExampleBuilder(cfg, {}, max_tgt_length=20)
    exs = [builder(rng.normal(size=(cfg.len_vis_input, cfg.vis_feat_dim)),
                   rng.normal(size=(cfg.len_vis_input, cfg.vis_pe_dim)))
           for _ in range(args.batch)]
    import jax.numpy as jnp
    batch = {k: jnp.asarray(v) for k, v in collate(exs).items()}

    # compile
    out = dec._beam(params, batch)
    float(np.asarray(out[2])[-1, 0, 0])

    def run_device():
        o = dec._beam(params, batch)
        # force full completion: a scalar from the last scan step
        float(np.asarray(o[2])[-1, 0, 0])
        return o

    t0 = time.perf_counter()
    for _ in range(args.outer):
        o = run_device()
    t_dev = (time.perf_counter() - t0) / args.outer

    step_ids, step_ptrs, step_scores = [np.asarray(x) for x in o]
    t0 = time.perf_counter()
    for _ in range(args.outer):
        dec._backtrace(step_ids, step_ptrs, step_scores)
    t_bt = (time.perf_counter() - t0) / args.outer

    t0 = time.perf_counter()
    for _ in range(args.outer):
        dec.beam_search(params, batch)
    t_all = (time.perf_counter() - t0) / args.outer

    print(f"device beam scan : {t_dev * 1000:7.1f} ms")
    print(f"host backtrace   : {t_bt * 1000:7.1f} ms")
    print(f"full beam_search : {t_all * 1000:7.1f} ms")

    if args.trace:
        with jax.profiler.trace(args.trace):
            run_device()
        print("trace written to", args.trace)


if __name__ == "__main__":
    main()
