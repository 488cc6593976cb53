"""Benchmark: CC-pretraining training throughput per chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

Baseline (BASELINE.md): the reference pretrains Conceptual Captions at
5 hr/epoch on 8x V100 with per-GPU batch 64 (README.md:91).  Taking the CC
train split as ~3.0M image-text pairs, that is
    3.0e6 / (5*3600) / 8  =  20.8 samples/sec per V100.
``vs_baseline`` is our measured samples/sec on ONE TPU chip divided by that
per-GPU number.

Two measurements:

1. ``value`` (headline, comparable round-over-round): the device-resident
   full pretraining update — bert-base VLP model, joint s2s/bi batch,
   masked-LM + region-pretext losses, region masking, Pallas fused
   attention, bf16 activations, BertAdam — jitted end to end, K steps
   scanned per dispatch, batches already in HBM.

2. The REAL training path (extras): TrainLoader (packed fp16 v3 native
   feature store — vis_pe precomputed at pack time, so the batched C++
   gather is pure memcpy — recycled slabs) -> stack_batches ->
   the same jitted multi-step, pipelined exactly like cli/train.py's
   device loop (deferred metric fetch).
   * ``host_loader_sps`` — the loader alone sustained >=15s: the rate at
     which this host can produce ready-to-transfer batches.  This is the
     host-gap check: >= ``value`` means the host can feed the chip.
   * ``loader_sps_under_load`` — the same loader window timed WHILE the
     jitted device loop is executing (async dispatches in flight).  On a
     real TPU VM loader and chip run on different silicon and this stays
     near ``host_loader_sps``; on the CPU backend they share this box's
     single core, which is why the CPU entry's measured
     ``sustained_e2e_sps`` lands well below min(host_loader_sps,
     device_sps) — the min() projection assumes no host contention and
     this field quantifies that assumption per run.
   * ``h2d_mbps`` — measured host->device bandwidth.
   * ``sustained_e2e_sps`` — the full loader->device pipeline sustained
     >=60s, measured ONLY when the device link is real (CPU backend, or
     h2d >= 100 MB/s).  The dev harness reaches its TPU through an axon
     network tunnel at ~2 MB/s (measured; a stacked fp16 batch would take
     minutes — see .claude/skills/verify/SKILL.md), 3-4 orders of
     magnitude below a TPU VM's PCIe DMA, so through the tunnel the line
     instead reports ``sustained_e2e_projected_sps`` =
     min(host_loader_sps, value), the rate the same pipeline sustains
     when the link is not the dev tunnel.
"""

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_SAMPLES_PER_SEC_PER_GPU = 3.0e6 / (5 * 3600) / 8  # 20.83

# bf16 MXU peak per chip, by device_kind prefix (for the MFU field)
PEAK_BF16_FLOPS = {
    "TPU v5 lite": 197e12,   # v5e
    "TPU v5": 459e12,        # v5p
    "TPU v4": 275e12,
}


def _train_flops_per_sample(cfg) -> float:
    """Analytic FLOP model for one pretraining sample (fwd + bwd ~= 3x fwd,
    2 FLOPs per MAC).  Encoder matmuls + attention scores/PV + MLM head on
    max_pred positions (transform + tied vocab matmul) + the region/geometry
    projections.  Elementwise/LN/softmax FLOPs are excluded (sub-1%), so the
    MFU derived from this is slightly conservative."""
    H, L = cfg.hidden_size, cfg.seq_len
    I, V = cfg.intermediate_size, cfg.vocab_size
    per_layer = 4 * L * H * H + 2 * L * I * H + 2 * L * L * H
    enc = cfg.num_hidden_layers * per_layer
    r = max(cfg.relax_projection, 1)
    head = cfg.max_pred * (H * H * r + H * V)
    vis = cfg.len_vis_input * (cfg.vis_feat_dim * cfg.vis_feat_dim
                               + cfg.vis_feat_dim * H + cfg.vis_pe_dim * H)
    return 3.0 * 2.0 * (enc + head + vis)


def _peak_flops() -> float:
    kind = jax.devices()[0].device_kind
    for prefix, peak in PEAK_BF16_FLOPS.items():
        if kind.startswith(prefix):
            return peak
    return 0.0

STORE_KEYS = 256
STORE_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           ".cache", "bench_feat_fp16_pe.vlps")


def _ensure_store(cfg):
    """Packed fp16 v3 feature store (vis_pe precomputed at pack time — the
    production-recommended format; the per-epoch gather is pure memcpy)
    with synthetic records, built once and reused across rounds."""
    from vlp_tpu.data.native_store import PackedFeatureStore, pack_store
    if not os.path.exists(STORE_CACHE):
        os.makedirs(os.path.dirname(STORE_CACHE), exist_ok=True)
        rng = np.random.default_rng(1)

        def rec(_k):
            feat = rng.normal(size=(cfg.len_vis_input, cfg.vis_feat_dim)
                              ).astype(np.float32)
            cls = rng.uniform(size=(cfg.len_vis_input, cfg.vis_cls_dim)
                              ).astype(np.float32)
            bbox = np.zeros((cfg.len_vis_input, 6), np.float32)
            xy = rng.uniform(0, 600, (cfg.len_vis_input, 2))
            wh = rng.uniform(10, 200, (cfg.len_vis_input, 2))
            bbox[:, :2] = xy
            bbox[:, 2:4] = xy + wh
            bbox[:, 5] = rng.uniform(0.2, 1.0, cfg.len_vis_input)
            return feat, cls, bbox

        pack_store(STORE_CACHE, [f"img_{i}" for i in range(STORE_KEYS)], rec,
                   n_regions=cfg.len_vis_input, feat_dim=cfg.vis_feat_dim,
                   cls_dim=cfg.vis_cls_dim, dtype=np.float16,
                   precompute_pe=True)
    return PackedFeatureStore(STORE_CACHE)


def _make_loader(cfg, store, batch_size, k_loop, n_examples=40000):
    """TrainLoader wired exactly like cli/train.py's zero-copy device loop:
    the recycled feature slabs are row views of [K, B, ...] stacked
    transfer buffers.  Returns (loader, stack_feat, stack_pe)."""
    from vlp_tpu.data.dataset import CaptionExample
    from vlp_tpu.data.example_builder import TrainExampleBuilder
    from vlp_tpu.data.loader import TrainLoader
    words = [f"w{i}" for i in range(1000)]
    vocab = {"[PAD]": 0, "[UNK]": 1, "[X_SEP]": 2, "[CLS]": 3, "[SEP]": 4,
             "[MASK]": 5}
    vocab.update({w: i + 10 for i, w in enumerate(words)})
    rng = np.random.default_rng(0)
    examples = [
        CaptionExample(f"img_{i % STORE_KEYS}.npy",
                       [words[rng.integers(0, 1000)]
                        for _ in range(int(rng.integers(5, 16)))],
                       image_id=i)
        for i in range(n_examples)]
    builders = [TrainExampleBuilder(cfg, vocab, mode="s2s",
                                    max_pred=cfg.max_pred,
                                    new_segment_ids=True),
                TrainExampleBuilder(cfg, vocab, mode="bi",
                                    max_pred=cfg.max_pred,
                                    new_segment_ids=True)]
    from vlp_tpu.data.loader import stacked_feature_slabs
    stack_feat, stack_pe, slabs = stacked_feature_slabs(
        store, examples[0].feature_key, k_loop, batch_size)
    loader = TrainLoader(examples, store, builders, [0.75, 0.25],
                         batch_size=batch_size, num_workers=4,
                         feature_slabs=slabs)
    return loader, stack_feat, stack_pe


def _bench_host_loader(loader, batch_size, min_seconds=15.0, epoch=0):
    """Loader-only sustained rate (the host-gap check: can this host
    produce batches at least as fast as the chip consumes them?).
    Best-of-3 windows: the dev host carries bursty external load
    (single windows vary 2-4x — see verify notes)."""
    it = loader.epoch(epoch)
    for _ in range(loader.feature_slab_slots + 1):  # slab first-touch warmup
        next(it)
    best = 0.0
    window = max(min_seconds / 3.0, 1.0)
    for _ in range(3):
        t0 = time.perf_counter()
        n = 0
        for _ in it:
            n += batch_size
            if time.perf_counter() - t0 >= window:
                break
        dt = time.perf_counter() - t0
        if n:
            best = max(best, n / dt)
    return best


def _bench_sustained(loader, stacks, multi, state, ts, batch_size, k_loop,
                     min_seconds=60.0):
    """Full pipeline: loader (features straight into the stacked transfer
    buffers) -> token stack -> transfer -> K-step device loop, pipelined
    one dispatch deep (cli/train.py device-loop pattern)."""
    stack_feat, stack_pe = stacks
    stack_pool = [None, None]
    pending = []
    pending_ms = None
    dispatches = 0
    grp = 0
    warmed = False
    it = loader.epoch(1)
    t0 = None
    for step_i, batch in enumerate(it):
        pending.append(batch)
        if len(pending) < k_loop:
            continue
        slot = grp % 2
        stack_pool[slot] = ts.stack_batches(pending, out=stack_pool[slot],
                                            skip=("vis_feats", "vis_pe"))
        stacked = {k: jnp.asarray(v) for k, v in stack_pool[slot].items()}
        s = grp % len(stack_feat)
        stacked["vis_feats"] = jnp.asarray(stack_feat[s])
        stacked["vis_pe"] = jnp.asarray(stack_pe[s])
        grp += 1
        pending = []
        state, ms = multi(state, stacked, ts.fast_prng_key(step_i), 0.0)
        if not warmed:
            # first dispatch compiles (K2-shaped program) — keep it out of
            # the timed window
            float(np.asarray(ms["loss"])[-1])
            warmed = True
            t0 = time.perf_counter()
            continue
        if pending_ms is not None:
            float(np.asarray(pending_ms["loss"])[-1])  # force completion
        pending_ms = ms
        dispatches += 1
        if time.perf_counter() - t0 >= min_seconds and dispatches >= 2:
            break
    if pending_ms is not None:
        float(np.asarray(pending_ms["loss"])[-1])
    if t0 is None or dispatches == 0:
        return 0.0, state
    dt = time.perf_counter() - t0
    return batch_size * k_loop * dispatches / dt, state


def _bench_h2d(nbytes_target):
    x = np.zeros(nbytes_target, np.uint8)
    jax.device_put(x[:1024]).block_until_ready()  # path warmup
    best = 0.0
    for _ in range(2):
        t0 = time.perf_counter()
        d = jax.device_put(x)
        float(jnp.sum(d[:: len(x) // 16].astype(jnp.int32)))  # force
        best = max(best, x.nbytes / 1e6 / (time.perf_counter() - t0))
    return best


def _probe_backend():
    """The axon TPU tunnel can go down for hours, and jax backend init then
    HANGS with no error (.claude/skills/verify/SKILL.md).  Probe device init
    in a SUBPROCESS with a hard timeout before touching the backend in this
    process; if the probe hangs or dies, force the CPU backend so the round
    still produces an artifact (marked ``tpu_unavailable`` — the value is
    then a 1-core CPU number, not comparable to the TPU headline).

    Returns (backend_name, tpu_unavailable).
    """
    import subprocess
    import sys
    for _ in range(2):
        try:
            r = subprocess.run(
                [sys.executable, "-c",
                 "import jax; print(jax.default_backend())"],
                capture_output=True, timeout=150, text=True)
        except subprocess.TimeoutExpired:
            continue
        if r.returncode == 0 and r.stdout.strip():
            return r.stdout.strip().splitlines()[-1], False
    jax.config.update("jax_platforms", "cpu")
    return "cpu", True


def main():
    from vlp_tpu.config import VLPConfig
    from vlp_tpu.parallel import train_step as ts
    from __graft_entry__ import _example_batch

    backend, tpu_unavailable = _probe_backend()
    on_tpu = backend == "tpu"
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

    out = {
        "metric": "cc_pretrain_samples_per_sec_per_chip",
        "value": round(sps, 2),
        "unit": "samples/sec/chip",
        "vs_baseline": round(sps / BASELINE_SAMPLES_PER_SEC_PER_GPU, 2),
    }
    flops = _train_flops_per_sample(cfg)
    out["train_flops_per_sample"] = round(flops / 1e9, 2)  # GFLOP
    peak = _peak_flops() if on_tpu else 0.0
    if peak:
        out["mfu"] = round(sps * flops / peak, 3)
    if tpu_unavailable:
        # backend init probe hung twice: the dev tunnel is in one of its
        # hours-long outages.  This run's value is the 1-core CPU fallback;
        # see BENCH_r03.json for the most recent real-chip measurement.
        out["tpu_unavailable"] = True
        out["fallback_backend"] = jax.default_backend()

    # ---- sustained end-to-end (real TrainLoader path) --------------------
    try:
        K2 = 8 if on_tpu else 2  # smaller K: bounds per-dispatch transfer
        store = _ensure_store(cfg)
        loader, stack_feat, stack_pe = _make_loader(cfg, store, B, K2)
        out["host_loader_sps"] = round(
            _bench_host_loader(loader, B, 15.0 if on_tpu else 3.0), 1)
        # the same loader window with the device loop IN FLIGHT: queue a
        # few async multi-step dispatches (device-resident batches, no
        # fetch) and time the loader against them — quantifies the host
        # contention the min() projection assumes away (see docstring)
        n_bg = 4 if on_tpu else 1
        bg_state, bg_metrics = state, []
        for i in range(n_bg):
            bg_state, mbg = multi(bg_state, stacked,
                                  ts.fast_prng_key(100 + i), 0.0)
            bg_metrics.append(mbg)
        out["loader_sps_under_load"] = round(_bench_host_loader(
            loader, B, 6.0 if on_tpu else 3.0, epoch=2), 1)
        for mbg in bg_metrics:
            float(np.asarray(mbg["loss"])[-1])  # force completion
        out["h2d_mbps"] = round(_bench_h2d(8 << 20 if on_tpu else 64 << 20),
                                1)
        if not on_tpu or out["h2d_mbps"] >= 100.0:
            # real device link (TPU VM PCIe, or CPU memcpy): measure the
            # genuinely-transferred pipeline
            multi2 = jax.jit(ts.make_multi_step(model, tx,
                                                mask_image_regions=True),
                             donate_argnums=(0,))
            # fresh state: the donated one above is consumed
            state2, _ = ts.create_train_state(
                model, cfg, jax.random.PRNGKey(1), lr=1e-4, warmup=0.1,
                t_total=100000)
            e2e, _ = _bench_sustained(loader, (stack_feat, stack_pe),
                                      multi2, state2, ts, B, K2,
                                      60.0 if on_tpu else 5.0)
            out["sustained_e2e_sps"] = round(e2e, 1)
        else:
            # axon dev tunnel (~2 MB/s measured): a stacked batch takes
            # minutes to transfer — project instead (see module docstring)
            out["sustained_e2e_projected_sps"] = round(
                min(out["host_loader_sps"], sps), 1)
    except Exception as e:  # the headline metric must still report
        out["sustained_error"] = f"{type(e).__name__}: {e}"

    # round-over-round e2e artifact: the genuinely-transferred pipeline
    # number exists only on a real device link (CPU memcpy or TPU-VM PCIe);
    # persist every run's pipeline health (loader rate, link bandwidth,
    # measured-or-projected e2e) so it is tracked like INFER_BENCH instead
    # of living in a transient stdout line
    try:
        hist_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 "E2E_BENCH.json")
        hist = []
        if os.path.exists(hist_path):
            with open(hist_path) as f:
                hist = json.load(f)
        hist.append({
            "backend": jax.default_backend(),
            "time": time.strftime("%Y-%m-%d %H:%M:%S"),
            "device_sps": out["value"],
            **{k: out[k] for k in ("host_loader_sps",
                                   "loader_sps_under_load", "h2d_mbps",
                                   "sustained_e2e_sps",
                                   "sustained_e2e_projected_sps",
                                   "sustained_error") if k in out},
        })
        with open(hist_path, "w") as f:
            json.dump(hist, f, indent=1)
    except Exception as e:
        out["e2e_history_error"] = f"{type(e).__name__}: {e}"

    print(json.dumps(out))


if __name__ == "__main__":
    main()
