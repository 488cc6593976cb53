"""SCST training throughput (full self-critical step) — tracked artifact.

Reference recipe (BASELINE.md): COCO SCST fine-tune, batch 16x4, 3 hr/epoch
on 4x Titan Xp.  The Karpathy train split is ~113k images, so that is
    113287 / (3*3600) / 4  =  2.62 samples/sec per GPU.

One benchmarked step = greedy rollout (eval mode) + sampled rollout (train
mode, dropout on) + host CIDEr reward + differentiable forced-rollout policy
gradient + BertAdam update — the full run_img2txt_dist.py:486-523 loop body.

Methodology (verify notes): the box carries bursty external load, so the
result is best-of-``--windows`` windows of ``--outer`` steps each, appended
to SCST_BENCH.json round-over-round like INFER_BENCH.  ``--ab`` additionally
interleaves the kernel-layout rollout path (pallas_decode: deterministic
fused kernel + column-layout XLA dropout steps) against the head-major XLA
path in ONE process — cross-run comparisons on this host are meaningless.

Usage: python tools/bench_scst.py [--batch 64] [--outer 5] [--windows 5]
       [--label r04] [--ab] [--no_artifact]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

BASELINE_SCST_SPS_PER_GPU = 113287 / (3 * 3600) / 4  # 2.62
ARTIFACT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "SCST_BENCH.json")


def build_trainer(cfg, batch, T, lr=1e-6, remat=False, replay="scan",
                  state=None):
    from vlp_tpu.parallel import train_step as ts
    from vlp_tpu.scst import SCSTTrainer
    model = ts.create_model(cfg)
    if state is None:
        state, tx = ts.create_train_state(model, cfg, jax.random.PRNGKey(0),
                                          lr=lr, warmup=0.1, t_total=100000)
    else:
        # A/B variant sharing the first variant's state (identical tree):
        # a second resident params+moments set OOMed HBM at B=256
        tx = ts.make_optimizer(cfg, state.params, lr=lr, warmup=0.1,
                               t_total=100000)
    trainer = SCSTTrainer(model, cfg, mask_id=103, eos_id=102, pad_id=0,
                          max_tgt_length=T, tx=tx, remat=remat,
                          replay=replay)
    return trainer, state


def bench_windows(trainer, state, batch, gt_ids, B, outer, windows):
    from vlp_tpu.parallel import train_step as ts

    def one_step(st, i):
        rng = ts.fast_prng_key(i)
        st, loss, metrics = trainer.step(st, batch, gt_ids, rng)
        # fetch a scalar from the updated params: block_until_ready is NOT a
        # barrier over the axon tunnel (see .claude/skills/verify/SKILL.md)
        leaf = jax.tree_util.tree_leaves(st.params)[0]
        float(leaf.ravel()[0])
        return st, loss, metrics

    state, loss, m = one_step(state, 0)  # compile
    print(f"  warmup loss {loss:.4f} mean_reward {m['mean_reward']:.3f}")
    rates = []
    step_i = 1
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(outer):
            state, loss, _ = one_step(state, step_i)
            step_i += 1
        rates.append(B * outer / (time.perf_counter() - t0))
    return rates, state


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--outer", type=int, default=5)
    ap.add_argument("--windows", type=int, default=5)
    ap.add_argument("--label", default="")
    ap.add_argument("--ab", action="store_true",
                    help="interleave kernel-layout vs head-major rollout "
                         "paths in this one process")
    ap.add_argument("--no_artifact", action="store_true")
    ap.add_argument("--remat", action="store_true",
                    help="jax.checkpoint the forced-replay scan body "
                         "(needed to fit B>=256 on a 16G chip; no-op for "
                         "--replay fused, which has no scan body)")
    ap.add_argument("--replay", default="fused", choices=("scan", "fused"),
                    help="policy-gradient replay implementation (fused is "
                         "the CLI's shipping default)")
    ap.add_argument("--ab_replay", action="store_true",
                    help="interleave replay='fused' vs replay='scan' (same "
                         "rollout layout) in this one process")
    ap.add_argument("--ab_dropout", action="store_true",
                    help="interleave the fused-kernel on-chip-PRNG rollout "
                         "dropout (decode_dropout_impl=auto) vs the "
                         "column-layout XLA dropout math (=xla), both with "
                         "the fused replay, in this one process")
    args = ap.parse_args()
    if args.remat and args.replay == "fused" and not args.ab_replay:
        print("note: --remat is a no-op with --replay fused "
              "(no scan body to checkpoint)")

    import jax.numpy as jnp
    from vlp_tpu.config import VLPConfig
    from vlp_tpu.data.example_builder import DecodeExampleBuilder, collate

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
    gt_ids[:, 10:] = 0  # captions ~10 tokens

    if args.ab_replay:
        variants = [("kernel_layout", cfg, "fused"),
                    ("scan_replay", cfg, "scan")]
    elif args.ab_dropout:
        variants = [("kernel_dropout", cfg, "fused"),
                    ("xla_dropout",
                     cfg.replace(decode_dropout_impl="xla"), "fused")]
    else:
        variants = [("kernel_layout", cfg, args.replay)]
        if args.ab:
            variants.append(
                ("head_major", cfg.replace(use_pallas_decode=False),
                 args.replay))

    # A/B variants SHARE one TrainState (identical tree shapes): holding a
    # per-variant state OOMed HBM at B=256 (params+moments ~1.3G each on
    # top of two compiled program sets); throughput timing doesn't care
    # whose update advanced the weights
    built = []
    shared_state = None
    for name, vcfg, replay in variants:
        trainer, shared_state = build_trainer(
            vcfg, batch, T, remat=args.remat, replay=replay,
            state=shared_state)
        built.append((name, trainer))

    # interleave variants window by window (A/B discipline)
    results = {name: [] for name, _ in built}
    state = shared_state
    for w in range(args.windows):
        for name, trainer in built:
            rates, state = bench_windows(
                trainer, state, batch, gt_ids, B,
                args.outer, 1) if w == 0 else bench_windows_nowarm(
                trainer, state, batch, gt_ids, B, args.outer)
            results[name].extend(rates)

    entry = {"label": args.label or "scst", "backend": jax.default_backend(),
             "time": time.strftime("%Y-%m-%d %H:%M:%S"),
             "replay": "fused-vs-scan" if args.ab_replay else args.replay,
             "methodology": (f"best of {args.windows} windows x "
                             f"{args.outer} steps, B={B} (interleaved A/B)"
                             if (args.ab or args.ab_replay) else
                             f"best of {args.windows} windows x "
                             f"{args.outer} steps, B={B}")}
    for name, rates in results.items():
        best, med = max(rates), float(np.median(rates))
        entry[f"scst_{name}_samples_per_sec"] = round(best, 1)
        entry[f"scst_{name}_median"] = round(med, 1)
        entry[f"scst_{name}_windows"] = [round(r, 1) for r in rates]
        print(f"{name}: best {best:.1f} median {med:.1f} samples/sec/chip "
              f"({best / BASELINE_SCST_SPS_PER_GPU:.1f}x the per-GPU "
              f"baseline) windows={[round(r, 1) for r in rates]}")
    head = variants[0][0]
    entry["vs_baseline"] = round(
        max(results[head]) / BASELINE_SCST_SPS_PER_GPU, 1)

    if not args.no_artifact:
        hist = []
        if os.path.exists(ARTIFACT):
            hist = json.load(open(ARTIFACT))
        hist.append(entry)
        with open(ARTIFACT, "w") as f:
            json.dump(hist, f, indent=1)
        print(f"appended to {ARTIFACT}")


def bench_windows_nowarm(trainer, state, batch, gt_ids, B, outer):
    """One additional timed window on an already-compiled trainer."""
    from vlp_tpu.parallel import train_step as ts
    t0 = time.perf_counter()
    for i in range(outer):
        state, loss, _ = trainer.step(state, batch, gt_ids,
                                      ts.fast_prng_key(1000 + i))
        leaf = jax.tree_util.tree_leaves(state.params)[0]
        float(leaf.ravel()[0])
    return [B * outer / (time.perf_counter() - t0)], state


if __name__ == "__main__":
    main()
