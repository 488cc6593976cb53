#!/usr/bin/env python
"""End-to-end convergence check on a learnable synthetic captioning task.

Images belong to one of C clusters; each cluster has a fixed caption and its
region features are drawn around a cluster centroid.  A model trained with
the real pipeline (TrainLoader -> device-loop steps -> greedy decode ->
native CIDEr) must learn the mapping: CIDEr should approach 10 (identical
captions), while an untrained model scores ~0.

Usage: python tools/e2e_synthetic.py [--steps 300] [--clusters 8]
Exits nonzero if trained CIDEr fails to beat the untrained baseline by a
wide margin.

``--scst_steps N`` adds a self-critical phase after the (deliberately
partial) MLE phase: SCST must measurably raise greedy-decode CIDEr and the
mean sampled-vs-greedy reward trend over N steps — the convergence proof
for the SCST loop (rollouts -> native CIDEr reward -> forced-rollout policy
gradient), mirroring run_img2txt_dist.py:486-523.
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--clusters", type=int, default=8)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--device_loop", type=int, default=10)
    ap.add_argument("--eval_images", type=int, default=32)
    ap.add_argument("--scst_steps", type=int, default=0)
    ap.add_argument("--scst_lr", type=float, default=1e-4,
                    help="SCST-phase lr (the reference restarts SCST with a "
                         "much smaller lr than MLE, README.md:96 — too "
                         "high collapses the greedy policy while the "
                         "relative reward still rises)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from vlp_tpu.config import VLPConfig
    from vlp_tpu.data.dataset import CaptionExample
    from vlp_tpu.data.example_builder import (DecodeExampleBuilder,
                                              TrainExampleBuilder, collate,
                                              featurize_regions)
    from vlp_tpu.data.loader import TrainLoader
    from vlp_tpu.decode import DecodeParams, Decoder
    from vlp_tpu.evals.cider import CiderScorer
    from vlp_tpu.parallel import train_step as ts

    words = [f"w{i}" for i in range(40)]
    vocab = {w: i for i, w in enumerate(
        ["[PAD]"] + [f"[unused{i}]" for i in range(1, 12)]
        + ["[UNK]", "[CLS]", "[SEP]", "[MASK]"] + words)}
    rngn = np.random.default_rng(0)

    C = args.clusters
    cluster_caption = {c: [words[(3 * c + j) % len(words)] for j in range(4)]
                       for c in range(C)}

    cfg = VLPConfig(
        vocab_size=len(vocab), hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=128, type_vocab_size=6,
        relax_projection=4, len_vis_input=10, vis_feat_dim=32,
        vis_cls_dim=10, vis_pe_dim=16, max_len_b=6, max_pred=4,
        dtype="bfloat16" if jax.default_backend() == "tpu" else "float32",
        use_pallas_attention=False)  # tiny dims — XLA path

    centroids = rngn.normal(size=(C, cfg.len_vis_input, cfg.vis_feat_dim))

    class ClusterStore:
        def get(self, key):
            i = int(key.split("_")[1])
            c = i % C
            r = np.random.default_rng(1000 + i)
            feat = (centroids[c]
                    + 0.1 * r.normal(size=centroids[c].shape)).astype(
                        np.float32)
            bbox = np.zeros((cfg.len_vis_input, 6), np.float32)
            bbox[:, 2:4] = 10
            cls = r.uniform(size=(cfg.len_vis_input,
                                  cfg.vis_cls_dim)).astype(np.float32)
            return feat, featurize_regions(bbox, cls)

    n_train = 512
    examples = [CaptionExample(f"img_{i}", cluster_caption[i % C],
                               image_id=i) for i in range(n_train)]
    store = ClusterStore()
    builder = TrainExampleBuilder(cfg, vocab, mode="s2s", mask_prob=0.5)
    loader = TrainLoader(examples, store, [builder], [1.0],
                         batch_size=args.batch, num_workers=2, seed=1)

    model = ts.create_model(cfg)
    state, tx = ts.create_train_state(
        model, cfg, jax.random.PRNGKey(0), lr=2e-3, warmup=0.05,
        t_total=args.steps)
    multi = jax.jit(ts.make_multi_step(model, tx), donate_argnums=(0,))
    params0 = state.params

    # ---- decode + score helper -------------------------------------------
    dec_builder = DecodeExampleBuilder(cfg, vocab,
                                       max_tgt_length=cfg.max_len_b)
    dp = DecodeParams(mask_id=vocab["[MASK]"], eos_id=vocab["[SEP]"],
                      max_tgt_length=cfg.max_len_b)
    decoder = Decoder(model, cfg, dp)
    id2tok = {i: w for w, i in vocab.items()}

    def score(params):
        exs, gts = [], {}
        for i in range(args.eval_images):
            feat, pe = store.get(f"img_{100000 + i}")
            exs.append(dec_builder(feat, pe))
            gts[i] = [" ".join(cluster_caption[(100000 + i) % C])]
        batch = {k: jnp.asarray(v) for k, v in collate(exs).items()}
        ids, _ = decoder.greedy(params, batch)
        res = {}
        for i, row in enumerate(np.asarray(ids)):
            toks = []
            for t in row:
                tok = id2tok[int(t)]
                if tok in ("[SEP]", "[PAD]"):
                    break
                toks.append(tok)
            res[i] = [" ".join(toks)]
        cider, _ = CiderScorer().compute_score(gts, res)
        return cider, res

    base_cider, _ = score(params0)
    print(f"untrained CIDEr: {base_cider:.3f}", flush=True)

    # ---- train ------------------------------------------------------------
    K = args.device_loop
    done = 0
    t0 = time.time()
    rng = jax.random.PRNGKey(7)
    epoch = 0
    pending = []
    losses = []
    while done < args.steps:
        for batch in loader.epoch(epoch):
            pending.append(batch)
            if len(pending) < K:
                continue
            stacked = {k: jnp.asarray(v)
                       for k, v in ts.stack_batches(pending).items()}
            pending = []
            state, m = multi(state, stacked,
                             jax.random.fold_in(rng, done), 0.0)
            losses.append(float(np.asarray(m["loss"])[-1]))
            done += K
            if done >= args.steps:
                break
        epoch += 1
    print(f"trained {done} steps in {time.time() - t0:.1f}s; "
          f"loss {losses[0]:.3f} -> {losses[-1]:.3f}", flush=True)

    cider, res = score(state.params)
    print(f"trained CIDEr: {cider:.3f}  (sample: {res[0][0]!r} vs "
          f"{' '.join(cluster_caption[100000 % C])!r})", flush=True)

    ok = cider > max(1.0, base_cider + 1.0) and losses[-1] < losses[0]

    # ---- SCST phase -------------------------------------------------------
    if args.scst_steps:
        from vlp_tpu.scst import SCSTTrainer
        prefix = cfg.prefix_len
        # SCST recipe: no masking (run_img2txt_dist.py asserts
        # max_pred == 0 and mask_prob == 0 under --scst)
        scst_builder = TrainExampleBuilder(cfg, vocab, mode="s2s",
                                           mask_prob=0.0, max_pred=0)
        scst_loader = TrainLoader(examples, store, [scst_builder], [1.0],
                                  batch_size=args.batch, num_workers=2,
                                  seed=2)
        # fresh optimizer for the SCST phase: the MLE warmup_linear schedule
        # is exhausted at its t_total, which would silently zero the lr
        # (the reference likewise restarts training with SCST-specific lr,
        # README.md:96)
        tx_scst = ts.make_optimizer(cfg, state.params, lr=args.scst_lr,
                                    warmup=0.1, t_total=args.scst_steps)
        state = state._replace(opt_state=tx_scst.init(state.params),
                               step=jnp.zeros((), jnp.int32))
        trainer = SCSTTrainer(model, cfg, mask_id=vocab["[MASK]"],
                              eos_id=vocab["[SEP]"], pad_id=vocab["[PAD]"],
                              max_tgt_length=cfg.max_len_b, tx=tx_scst)
        pre_cider = cider
        rewards = []
        done_s = 0
        epoch_s = 0
        t0 = time.time()
        while done_s < args.scst_steps:
            for batch in scst_loader.epoch(epoch_s):
                jb = {k: jnp.asarray(v) for k, v in batch.items()}
                B2, L2 = jb["input_ids"].shape
                dec_b = dict(
                    input_ids=jb["input_ids"][:, :prefix],
                    segment_ids=jb["segment_ids"],
                    position_ids=jnp.broadcast_to(
                        jnp.arange(L2, dtype=jnp.int32), (B2, L2)),
                    task_idx=jb["task_idx"],
                    vis_feats=jb["vis_feats"], vis_pe=jb["vis_pe"])
                gt = np.asarray(batch["input_ids"][
                    :, prefix:prefix + cfg.max_len_b + 1])
                state, loss, m = trainer.step(
                    state, dec_b, gt,
                    jax.random.fold_in(jax.random.PRNGKey(11), done_s))
                rewards.append(m["mean_reward"])
                done_s += 1
                if done_s >= args.scst_steps:
                    break
            epoch_s += 1
        post_cider, _ = score(state.params)
        k = max(len(rewards) // 4, 1)
        early, late = (sum(rewards[:k]) / k,
                       sum(rewards[-k:]) / k)
        print(f"SCST {done_s} steps in {time.time() - t0:.1f}s: CIDEr "
              f"{pre_cider:.3f} -> {post_cider:.3f}; mean reward "
              f"{early:+.3f} -> {late:+.3f}", flush=True)
        ok = ok and post_cider > pre_cider + 0.25

    print("PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
