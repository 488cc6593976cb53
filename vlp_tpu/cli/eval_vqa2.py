"""VQA 2.0 evaluation CLI — rebuild of /root/reference/vlp/eval_vqa2.py:
bi-mode pipeline with max_pred=0, batched ``vqa_inference`` argmax, native
accuracy scoring (the reference shells out to pythia's legacy evaluator).
"""

from __future__ import annotations

import argparse
import glob
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from vlp_tpu import checkpoint as ckpt
from vlp_tpu.cli import common
from vlp_tpu.cli.train import make_config
from vlp_tpu.data.dataset import CaptionExample, load_vqa_index
from vlp_tpu.data.example_builder import TrainExampleBuilder
from vlp_tpu.data.features import make_store
from vlp_tpu.models.model import VLPModel
from vlp_tpu.parallel import train_step as ts


def build_parser():
    p = argparse.ArgumentParser()
    p.add_argument("--bert_model", default="bert-base-cased", type=str)
    p.add_argument("--model_recover_path", default=None, type=str)
    p.add_argument("--fp16", action="store_true")
    p.add_argument("--amp", action="store_true",
                   help="no-op, covered by design: apex amp autocast "
                        "(eval_vqa2.py upstream); inference runs bf16 "
                        "activations / fp32 LN+softmax always on TPU")
    p.add_argument("--seed", type=int, default=123)
    p.add_argument("--do_lower_case", action="store_true")
    p.add_argument("--new_segment_ids", action="store_true")
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--max_tgt_length", type=int, default=20)
    # decode-only flags accepted for reference CLI parity (unused in VQA,
    # present in eval_vqa2.py:76-86 upstream)
    p.add_argument("--beam_size", type=int, default=1)
    p.add_argument("--length_penalty", type=float, default=0)
    p.add_argument("--forbid_duplicate_ngrams", action="store_true")
    p.add_argument("--forbid_ignore_word", type=str, default=None)
    p.add_argument("--min_len", default=None, type=int)
    p.add_argument("--ngram_size", type=int, default=3)
    p.add_argument("--file_valid_jpgs", default="", type=str)
    p.add_argument("--src_file", default=None, type=str)
    p.add_argument("--ref_file", default="", type=str,
                   help="v2_mscoco_*_annotations.json for local scoring")
    p.add_argument("--dataset", default="coco", type=str)
    p.add_argument("--len_vis_input", type=int, default=100)
    p.add_argument("--image_root", type=str, default="")
    p.add_argument("--split", type=str, default="val")
    p.add_argument("--drop_prob", default=0.1, type=float)
    p.add_argument("--enable_butd", action="store_true")
    p.add_argument("--region_bbox_file", default="", type=str)
    p.add_argument("--region_det_file_prefix", default="", type=str)
    p.add_argument("--packed_feature_file", default="", type=str,
                   help="native packed feature store (.vlps) built by "
                        "vlp_tpu.data.native_store.pack_from_h5 — fast-path "
                        "replacement for the h5 shards")
    p.add_argument("--output_dir", default="tmp", type=str)
    p.add_argument("--answer_vocab_file", required=True, type=str)
    p.add_argument("--synthetic_data", action="store_true")
    p.add_argument("--num_synthetic", type=int, default=16)
    p.add_argument("--no_pallas", action="store_true")
    p.add_argument("--config_path", default=None, type=str)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    args.max_seq_length = args.max_tgt_length + args.len_vis_input + 3
    args.label_smoothing = 0
    args.max_len_b = args.max_tgt_length
    args.max_pred = 0
    args.relax_projection = False
    args.vis_mask_prob = 0
    args.max_position_embeddings = 512

    from vlp_tpu.evals.vqa import VQAAnswerProcessor, load_vqa_annotations, \
        vqa_accuracy
    tokenizer = common.resolve_tokenizer(args.bert_model, args.do_lower_case,
                                         args.max_seq_length)
    cfg = make_config(args, vocab_size=len(tokenizer.vocab))
    ans_proc = VQAAnswerProcessor(args.answer_vocab_file)
    cfg = cfg.replace(num_answers=len(ans_proc))

    if args.synthetic_data:
        rng_np = np.random.default_rng(args.seed)
        words = [w for w in tokenizer.vocab_words if not w.startswith("[")]
        eval_list = []
        for i in range(args.num_synthetic):
            q = [words[rng_np.integers(0, len(words))] for _ in range(6)]
            ex = CaptionExample(f"synthetic_{i}.npy", q, image_id=i)
            ex.question_id = i
            eval_list.append(ex)
        store = make_store(synthetic=True, num_regions=cfg.len_vis_input,
                           feat_dim=cfg.vis_feat_dim, cls_dim=cfg.vis_cls_dim)
    else:
        eval_list = load_vqa_index([args.src_file], tokenizer,
                                   args.image_root)
        for i, ex in enumerate(eval_list):
            ex.question_id = getattr(ex, "question_id", i)
        store = make_store(args.region_det_file_prefix, args.region_bbox_file,
                           packed_file=args.packed_feature_file)

    # bi-mode, max_pred=0, always_truncate_tail (eval_vqa2.py:138-144);
    # arrays stay width >=1 for static shapes, the cap disables masking
    builder = TrainExampleBuilder(
        cfg.replace(max_pred=1), tokenizer.vocab, mode="bi", mask_prob=0.0,
        max_pred=0, new_segment_ids=args.new_segment_ids,
        always_truncate_tail=True, load_vqa_ann=True)

    model = ts.create_model(cfg, task="vqa2")
    template = ts.init_params(model, cfg, jax.random.PRNGKey(args.seed),
                              task="vqa2")

    def _infer(p, b):
        return model.apply({"params": p}, b, method=VLPModel.vqa_inference)

    # data-parallel eval over all local devices via shard_map (keeps the
    # Pallas attention kernel per-shard; the reference evaluates on one GPU)
    n_dev = len(jax.devices())
    if n_dev > 1 and args.batch_size % n_dev == 0:
        from jax import shard_map
        from jax.sharding import PartitionSpec as P
        from vlp_tpu.parallel.mesh import make_mesh
        mesh = make_mesh(data=n_dev, model=1)
        print(f"data-parallel VQA eval over {n_dev} devices")
        infer = jax.jit(shard_map(_infer, mesh=mesh,
                                  in_specs=(P(), P("data")),
                                  out_specs=P("data"), check_vma=False))
    else:
        infer = jax.jit(_infer)

    for model_recover_path in (glob.glob(args.model_recover_path.strip())
                               if args.model_recover_path else [None]):
        if model_recover_path:
            print(f"***** Recover model: {model_recover_path} *****")
            params = ckpt.load_model_checkpoint(model_recover_path, cfg,
                                                template, task_idx=0)
            params = jax.tree_util.tree_map(jnp.asarray, params)
        else:
            params = template

        predictions = []
        rng_np = np.random.default_rng(args.seed)
        B = args.batch_size
        # recycled per-row feature buffers (first-touch page faults on
        # fresh ~1.4MB/example allocations otherwise throttle the host
        # far below the chip's inference rate); 2 slots suffice — each
        # batch is device-transferred before the next is built
        slabs = None
        if eval_list:
            f0, p0 = store.get(eval_list[0].feature_key)
            slabs = [(np.empty((B,) + f0.shape, f0.dtype),
                      np.empty((B,) + p0.shape, p0.dtype)) for _ in range(2)]

        def flush(pending):
            ans_idx = np.asarray(pending[0])  # forces completion
            for i, ex in enumerate(pending[1]):
                predictions.append({
                    "question_id": getattr(ex, "question_id",
                                           pending[2] + i),
                    "answer": ans_proc.idx2word(ans_idx[i])})

        # the result fetch trails one batch behind the dispatch, so the
        # host-side build of batch i+1 overlaps the device's batch i
        # (per-dispatch latency is ~35 ms through remote runtimes —
        # cli/train.py's device loop applies the same pattern)
        pending = None
        for bi, lo in enumerate(range(0, len(eval_list), B)):
            chunk = eval_list[lo:lo + B]
            fs, ps = slabs[bi % 2]
            exs = []
            for j, ex in enumerate(chunk):
                if hasattr(store, "get_into"):
                    store.get_into(ex.feature_key, fs[j], ps[j])
                else:
                    feat, pe = store.get(ex.feature_key)
                    fs[j] = feat
                    ps[j] = pe
                exs.append(builder(ex.tokens, fs[j], ps[j], rng_np))
            pad = B - len(exs)
            for j in range(len(chunk), B):  # tail pad in place
                fs[j] = fs[len(chunk) - 1]
                ps[j] = ps[len(chunk) - 1]
            exs += [exs[-1]] * pad
            # features come straight from the slabs (collate would np.stack
            # a fresh copy, reintroducing the allocation cost)
            batch = {k: jnp.asarray(np.stack([e[k] for e in exs]))
                     for k in exs[0] if k not in ("vis_feats", "vis_pe")}
            batch["vis_feats"] = jnp.asarray(fs)
            batch["vis_pe"] = jnp.asarray(ps)
            out = infer(params, batch)
            if pending is not None:
                flush(pending)
            pending = (out, chunk, lo)
        if pending is not None:
            flush(pending)

        os.makedirs(args.output_dir, exist_ok=True)
        tag = os.path.basename(model_recover_path or "random")
        results_file = os.path.join(
            args.output_dir, f"vqa2-results-{tag}-{args.split}.json")
        with open(results_file, "w") as f:
            json.dump(predictions, f)
        print("predictions ->", results_file)

        if args.split == "test2015":
            print("[WARNING] test split: submit", results_file,
                  "to the EvalAI VQA 2.0 server")
        elif args.ref_file:
            anns = load_vqa_annotations(args.ref_file)
            stats = vqa_accuracy(predictions, anns)
            print(json.dumps(stats, indent=2))
            return stats
    return None


if __name__ == "__main__":
    main()
