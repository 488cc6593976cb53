"""Shared setup for the decode-side benchmark/profiling tools."""

import numpy as np


def setup_decode(batch_size: int, beam: int, max_tgt_length: int,
                 forbid_ngrams: bool, seed: int = 0):
    """Build (cfg, model, params, decoder, device_batch) for the bert-base
    decode recipe on the current backend."""
    import jax
    import jax.numpy as jnp

    from vlp_tpu.config import VLPConfig
    from vlp_tpu.data.example_builder import DecodeExampleBuilder, collate
    from vlp_tpu.decode import DecodeParams, Decoder
    from vlp_tpu.parallel import train_step as ts

    on_tpu = jax.default_backend() == "tpu"
    # max_len_b must track max_tgt_length or decode_step's segment/position
    # dynamic_slice clamps at the sequence end (cli/decode.py does the same)
    cfg = VLPConfig(use_pallas_attention=on_tpu, max_len_b=max_tgt_length)
    model = ts.create_model(cfg)
    params = ts.init_params(model, cfg, jax.random.PRNGKey(seed))
    dp = DecodeParams(beam_size=beam, length_penalty=0.0,
                      forbid_duplicate_ngrams=forbid_ngrams,
                      ngram_size=3, min_len=0, max_tgt_length=max_tgt_length,
                      forbid_ignore_ids=(102,))
    dec = Decoder(model, cfg, dp)

    rng = np.random.default_rng(seed)
    builder = DecodeExampleBuilder(cfg, {}, max_tgt_length=max_tgt_length)
    exs = [builder(rng.normal(size=(cfg.len_vis_input, cfg.vis_feat_dim)),
                   rng.normal(size=(cfg.len_vis_input, cfg.vis_pe_dim)))
           for _ in range(batch_size)]
    batch = {k: jnp.asarray(v) for k, v in collate(exs).items()}
    return cfg, model, params, dec, batch


def fresh_features(cfg, batch, i: int):
    """Per-iteration input variation, generated ON device (large host->device
    transfers are minutes-slow over remote runtimes, and repeating an
    identical dispatch can be served from a cache)."""
    import jax
    import jax.numpy as jnp

    B = batch["input_ids"].shape[0]
    feats = jax.random.normal(
        jax.random.PRNGKey(1000 + i),
        (B, cfg.len_vis_input, cfg.vis_feat_dim), jnp.float32)
    return {**batch, "vis_feats": feats}
