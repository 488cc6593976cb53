"""Host data-pipeline throughput: can the loader feed the chip?

The TPU train step consumes ~1080 samples/sec/chip (bench.py); the reference
was input-bound at eval (README.md:205).  This measures TrainLoader
end-to-end (index shuffle -> feature store gather -> tokenize/mask/build ->
collate) in samples/sec on this host, with the synthetic store (no disk) and
optionally a packed native store (--packed FILE).

Usage: python tools/bench_loader.py [--batch 128] [--batches 30]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--batches", type=int, default=30)
    ap.add_argument("--num_workers", type=int, default=4)
    ap.add_argument("--packed", default="")
    ap.add_argument("--pack_dtype", default="",
                    help="float16|float32: (re)create --packed from the "
                         "synthetic store in this dtype before benching "
                         "(fp16 halves host memory traffic)")
    ap.add_argument("--slab_slots", type=int, default=0,
                    help="recycled feature-buffer pool size (0 = allocate "
                         "fresh arrays per batch)")
    ap.add_argument("--ab", action="store_true",
                    help="interleaved A/B: per-example get_into vs one-call "
                         "batched gather_into (needs --packed + "
                         "--slab_slots)")
    ap.add_argument("--ab_format", action="store_true",
                    help="interleaved A/B: v2 (featurize at gather time) vs "
                         "v3 (vis_pe precomputed at pack time) on the "
                         "zero-copy path; packs {--packed}.v2/.v3 in "
                         "--pack_dtype")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from vlp_tpu.config import VLPConfig
    from vlp_tpu.data.dataset import CaptionExample
    from vlp_tpu.data.example_builder import TrainExampleBuilder
    from vlp_tpu.data.features import make_store
    from vlp_tpu.data.loader import TrainLoader

    cfg = VLPConfig(max_pred=20)
    rng = np.random.default_rng(0)
    n_examples = args.batch * args.batches
    n_keys = 512  # packed fixture size; cycle keys beyond it
    words = [f"w{i}" for i in range(1000)]
    examples = [
        CaptionExample(f"img_{i % n_keys}.npy",
                       [words[rng.integers(0, 1000)] for _ in range(12)],
                       image_id=i)
        for i in range(n_examples)]
    def synth_rec(key):
        """Deterministic per-key synthetic record (so two packs of the same
        key set hold identical data)."""
        i = int(key.rsplit("_", 1)[-1])
        srng = np.random.default_rng(1_000_000 + i)
        feat = srng.normal(size=(cfg.len_vis_input,
                                 cfg.vis_feat_dim)).astype(np.float32)
        cls = srng.uniform(size=(cfg.len_vis_input,
                                 cfg.vis_cls_dim)).astype(np.float32)
        bbox = np.zeros((cfg.len_vis_input, 6), np.float32)
        xy = srng.uniform(0, 600, (cfg.len_vis_input, 2))
        wh = srng.uniform(10, 200, (cfg.len_vis_input, 2))
        bbox[:, :2] = xy
        bbox[:, 2:4] = xy + wh
        bbox[:, 5] = srng.uniform(0.2, 1.0, cfg.len_vis_input)
        return feat, cls, bbox

    if args.packed and not args.ab_format:
        from vlp_tpu.data.native_store import PackedFeatureStore, pack_store
        if args.pack_dtype and not os.path.exists(args.packed):
            print(f"packing {n_keys} records ({args.pack_dtype}) "
                  f"-> {args.packed}")
            pack_store(args.packed, [f"img_{i}" for i in range(n_keys)],
                       synth_rec, n_regions=cfg.len_vis_input,
                       feat_dim=cfg.vis_feat_dim, cls_dim=cfg.vis_cls_dim,
                       dtype=np.dtype(args.pack_dtype))
        store = PackedFeatureStore(args.packed)
        print(f"packed store dtype: {store.dtype}")
    elif args.ab_format:
        store = None
    else:
        store = make_store(synthetic=True, num_regions=cfg.len_vis_input,
                           feat_dim=cfg.vis_feat_dim,
                           cls_dim=cfg.vis_cls_dim)

    vocab = {w: i + 10 for i, w in enumerate(words)}
    vocab.update({"[PAD]": 0, "[UNK]": 1, "[CLS]": 2, "[SEP]": 3,
                  "[MASK]": 4})
    builders = [
        TrainExampleBuilder(cfg, vocab, mode="s2s", mask_prob=0.15,
                            max_pred=cfg.max_pred, new_segment_ids=True),
        TrainExampleBuilder(cfg, vocab, mode="bi", mask_prob=0.15,
                            max_pred=cfg.max_pred, new_segment_ids=True),
    ]
    if store is not None:
        loader = TrainLoader(examples, store, builders, [0.75, 0.25],
                             args.batch, num_workers=args.num_workers,
                             feature_slab_slots=args.slab_slots)

    def run_epoch(ldr, epoch, stack_k=0, token_only=False):
        """Timed epoch after warm-up batches (slab pool first-touch).
        ``stack_k`` > 0 adds the device-loop consumer's stacking step
        (K batches -> one [K, B, ...] transfer-ready dict); ``token_only``
        skips the feature keys (zero-copy wiring, where the loader already
        wrote them into the stacked buffers)."""
        from vlp_tpu.parallel.train_step import stack_batches
        it = ldr.epoch(epoch)
        if not stack_k:  # warmup irrelevant to group alignment
            for _ in range((ldr.feature_slab_slots or 0) + 1):
                next(it)
        t0 = time.perf_counter()
        n = 0
        pending = []
        pool = [None, None]
        g = 0
        skip = ("vis_feats", "vis_pe") if token_only else ()
        for b in it:
            n += args.batch
            if not stack_k:
                continue
            pending.append(b)
            if len(pending) == stack_k:
                pool[g % 2] = stack_batches(pending, out=pool[g % 2],
                                            skip=skip)
                pending = []
                g += 1
        return n / (time.perf_counter() - t0)

    if args.ab_format:
        # v2 (featurize per gather) vs v3 (precomputed pe) on the zero-copy
        # device-loop wiring, interleaved in one process (best-of-reps:
        # the dev box carries bursty external load)
        from vlp_tpu.data.native_store import PackedFeatureStore, pack_store
        from vlp_tpu.data.loader import stacked_feature_slabs
        if not args.packed:
            args.packed = os.path.join(os.path.dirname(__file__), "..",
                                       ".cache", "ab_format.vlps")
            os.makedirs(os.path.dirname(args.packed), exist_ok=True)
        dtype = np.dtype(args.pack_dtype or "float16")
        keys = [f"img_{i}" for i in range(n_keys)]
        paths = {}
        for tag, pre in (("v2", False), ("v3", True)):
            p = f"{args.packed}.{dtype.name}.{tag}"
            if not os.path.exists(p):
                print(f"packing {n_keys} records ({dtype.name}, {tag}) "
                      f"-> {p}")
                pack_store(p, keys, synth_rec,
                           n_regions=cfg.len_vis_input,
                           feat_dim=cfg.vis_feat_dim,
                           cls_dim=cfg.vis_cls_dim, dtype=dtype,
                           precompute_pe=pre)
            paths[tag] = p
        K = 8
        best = {"v2": 0.0, "v3": 0.0}
        loaders = {}
        for tag, p in paths.items():
            st = PackedFeatureStore(p)
            _, _, slabs = stacked_feature_slabs(
                st, examples[0].feature_key, K, args.batch)
            loaders[tag] = TrainLoader(examples, st, builders, [0.75, 0.25],
                                       args.batch,
                                       num_workers=args.num_workers,
                                       feature_slabs=slabs)
        for rep in range(args.reps):
            for tag, ldr in loaders.items():
                best[tag] = max(best[tag],
                                run_epoch(ldr, rep, stack_k=K,
                                          token_only=True))
        print(f"format A/B best-of-{args.reps} (zero-copy, {dtype.name}): "
              f"v2 featurize-at-gather {best['v2']:.1f} vs "
              f"v3 precomputed-pe {best['v3']:.1f} samples/sec "
              f"({best['v3'] / max(best['v2'], 1e-9):.2f}x)")
        return

    if args.ab and args.slab_slots:
        # A/B: per-example get_into vs one-call batched gather_into,
        # interleaved in ONE process (this box carries external load;
        # separate runs vary 2-4x — compare best-of interleaved reps)
        if not hasattr(store, "gather_into"):
            print("store has no gather_into; --ab needs --packed")
            return

        class NoGather:  # proxy hiding gather_into -> per-example path
            def __init__(self, inner):
                self._inner = inner

            def __getattr__(self, k):
                if k == "gather_into":
                    raise AttributeError(k)
                return getattr(self._inner, k)

        # retention contract: the stacking consumer holds K batches while
        # drawing the K-th, so the internal pools need K + prefetch + 2
        K = 8
        slots = max(args.slab_slots, K + 4 + 2 + 1)
        slow = TrainLoader(examples, NoGather(store), builders, [0.75, 0.25],
                           args.batch, num_workers=args.num_workers,
                           feature_slab_slots=slots)
        loader = TrainLoader(examples, store, builders, [0.75, 0.25],
                             args.batch, num_workers=args.num_workers,
                             feature_slab_slots=slots)
        # zero-copy variant: slabs are row views of [K, B, ...] stacked
        # transfer buffers (the cli/train.py device-loop wiring) — measures
        # the rate at which transfer-READY [K, B, ...] dicts are produced
        from vlp_tpu.data.loader import stacked_feature_slabs
        _, _, slabs = stacked_feature_slabs(
            store, examples[0].feature_key, K, args.batch)
        zc = TrainLoader(examples, store, builders, [0.75, 0.25],
                         args.batch, num_workers=args.num_workers,
                         feature_slabs=slabs)
        best = {"per_example": 0.0, "batched": 0.0, "zero_copy": 0.0}
        for rep in range(args.reps):
            best["per_example"] = max(best["per_example"],
                                      run_epoch(slow, rep, stack_k=K))
            best["batched"] = max(best["batched"],
                                  run_epoch(loader, rep, stack_k=K))
            best["zero_copy"] = max(best["zero_copy"],
                                    run_epoch(zc, rep, stack_k=K,
                                              token_only=True))
        print(f"A/B best-of-{args.reps}: per-example "
              f"{best['per_example']:.1f} vs batched-gather "
              f"{best['batched']:.1f} vs zero-copy-stack "
              f"{best['zero_copy']:.1f} samples/sec "
              f"({best['batched'] / max(best['per_example'], 1e-9):.2f}x / "
              f"{best['zero_copy'] / max(best['per_example'], 1e-9):.2f}x)")
        return

    sps = run_epoch(loader, 0)
    print(f"loader: {sps:.1f} samples/sec on host "
          f"({args.num_workers} workers, B={args.batch}); "
          f"chip consumes ~1334/s -> "
          f"{'OK' if sps > 1334 else 'INPUT-BOUND'}")


if __name__ == "__main__":
    main()
