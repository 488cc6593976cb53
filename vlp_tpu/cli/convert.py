"""Checkpoint conversion CLI: reference torch .bin <-> vlp_tpu orbax.

Covers the reference's checkpoint interop surface (from_pretrained surgery,
modeling.py:553-764) as an explicit offline tool:

  # torch -> orbax (with type-vocab / position / relax-projection surgery)
  python -m vlp_tpu.cli.convert --input model.30.bin --output runs/model.30 \
      --direction torch2jax --new_segment_ids --relax_projection \
      --vocab_size 28996

  # orbax -> torch state dict (loadable by the reference stack)
  python -m vlp_tpu.cli.convert --input runs/model.5 --output model.5.bin \
      --direction jax2torch ...
"""

from __future__ import annotations

import argparse

import jax
import numpy as np

from vlp_tpu import checkpoint as ckpt
from vlp_tpu.config import VLPConfig
from vlp_tpu.parallel import train_step as ts


def build_parser():
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--direction", choices=("torch2jax", "jax2torch"),
                   required=True)
    p.add_argument("--vocab_size", type=int, default=28996)
    p.add_argument("--new_segment_ids", action="store_true")
    p.add_argument("--relax_projection", action="store_true")
    p.add_argument("--task_idx", type=int, default=3)
    p.add_argument("--tasks", default="img2txt", choices=("img2txt", "vqa2"))
    p.add_argument("--len_vis_input", type=int, default=100)
    p.add_argument("--max_position_embeddings", type=int, default=512)
    p.add_argument("--config_path", default=None,
                   help="reference bert_config.json overriding dims")
    return p


def make_cfg(args) -> VLPConfig:
    cfg = VLPConfig(
        vocab_size=args.vocab_size,
        type_vocab_size=6 if args.new_segment_ids else 2,
        relax_projection=4 if args.relax_projection else 0,
        len_vis_input=args.len_vis_input,
        max_position_embeddings=args.max_position_embeddings)
    if args.config_path:
        cfg = VLPConfig.from_reference_json(
            args.config_path, type_vocab_size=cfg.type_vocab_size,
            relax_projection=cfg.relax_projection,
            len_vis_input=cfg.len_vis_input)
    return cfg


def main(argv=None):
    args = build_parser().parse_args(argv)
    cfg = make_cfg(args)
    model = ts.create_model(cfg, args.tasks)
    template = ts.init_params(model, cfg, jax.random.PRNGKey(0), args.tasks)

    if args.direction == "torch2jax":
        sd = ckpt.load_torch_state_dict(args.input)
        params = ckpt.torch_to_params(sd, cfg, template,
                                      task_idx=args.task_idx)
        import orbax.checkpoint as ocp
        import os
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(os.path.abspath(args.output), params, force=True)
        ckptr.wait_until_finished()
        print(f"wrote orbax checkpoint: {args.output}")
    else:
        params = ckpt.restore_params(args.input, template)
        sd = ckpt.params_to_torch(params, cfg)
        import torch
        torch.save({k: torch.from_numpy(np.asarray(v))
                    for k, v in sd.items()}, args.output)
        print(f"wrote torch state dict: {args.output} "
              f"({len(sd)} tensors)")


if __name__ == "__main__":
    main()
