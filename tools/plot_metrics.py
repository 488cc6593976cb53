#!/usr/bin/env python
"""Plot training curves from metrics.jsonl (the visdom-replacement
observability sink written by vlp_tpu.cli.train).

Usage: python tools/plot_metrics.py runs/coco/metrics.jsonl [out.png]
Writes a PNG (matplotlib, headless) or falls back to an ASCII summary.
"""

import json
import sys


def load(path):
    rows = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                rows.append(json.loads(line))
    return rows


def main():
    path = sys.argv[1]
    out = sys.argv[2] if len(sys.argv) > 2 else path + ".png"
    rows = load(path)
    if not rows:
        print("no metrics")
        return
    keys = [k for k in rows[0] if k not in ("epoch", "step", "time")]
    xs = list(range(len(rows)))
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        fig, ax = plt.subplots(figsize=(8, 4.5))
        for k in keys:
            ax.plot(xs, [r.get(k, float("nan")) for r in rows], label=k)
        ax.set_xlabel("log step")
        ax.set_ylabel("value")
        ax.legend()
        ax.set_title(path)
        fig.tight_layout()
        fig.savefig(out, dpi=120)
        print("wrote", out)
    except ImportError:
        for k in keys:
            vals = [r.get(k) for r in rows if k in r]
            print(f"{k}: first={vals[0]:.4f} last={vals[-1]:.4f} "
                  f"min={min(vals):.4f}")


if __name__ == "__main__":
    main()
