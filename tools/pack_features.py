"""Offline conversion: reference HDF5 region-feature shards -> packed store.

The packed .vlps file replaces the reference's 3-file-per-example h5 reads
(/root/reference/vlp/seq2seq_loader.py:325-336).  ``--dtype float16`` writes
half-precision records — the host pipeline is memory-bandwidth bound, so
halving the element size roughly doubles loader throughput and halves
host->device transfer (featurization math stays fp32 in the C++ kernel).

Usage:
  python tools/pack_features.py --out feats.vlps \
      --region_det_file_prefix /data/coco/region_feat_gvd_wo_bgd/..._gvd \
      --region_bbox_file /data/coco/..._bbox.h5 \
      --keys keys.txt [--dtype float16]

``keys.txt``: one image id (or feature path) per line.
"""

import argparse
import sys
import os

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--region_det_file_prefix", required=True)
    ap.add_argument("--region_bbox_file", required=True)
    ap.add_argument("--keys", required=True,
                    help="text file with one image id / feature path per line")
    ap.add_argument("--dtype", default="float32",
                    choices=["float32", "float16"])
    ap.add_argument("--precompute_pe", action="store_true",
                    help="store vis_pe featurized (v3): the per-epoch "
                         "gather becomes pure memcpy — fastest host "
                         "pipeline; raw cls/bbox are not retained")
    ap.add_argument("--n_regions", type=int, default=100)
    ap.add_argument("--feat_dim", type=int, default=2048)
    ap.add_argument("--cls_dim", type=int, default=1601)
    args = ap.parse_args()

    from vlp_tpu.data.native_store import pack_from_h5

    with open(args.keys) as f:
        keys = [ln.strip() for ln in f if ln.strip()]
    print(f"packing {len(keys)} records ({args.dtype}"
          f"{', precomputed pe' if args.precompute_pe else ''}) "
          f"-> {args.out}")
    pack_from_h5(args.out, args.region_det_file_prefix,
                 args.region_bbox_file, keys,
                 n_regions=args.n_regions, feat_dim=args.feat_dim,
                 cls_dim=args.cls_dim, dtype=np.dtype(args.dtype),
                 precompute_pe=args.precompute_pe)
    print("done")


if __name__ == "__main__":
    main()
