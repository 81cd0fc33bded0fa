#!/usr/bin/env python
"""Training-log analysis — equivalent of the reference
``tools/analysis_tools/analyze_logs.py`` over this framework's JSONL
metrics: per-key summary statistics and a coarse text sparkline of the loss
curve (no plotting dependencies).
"""
import argparse
import json


def sparkline(values, width=60):
    if not values:
        return ""
    blocks = "▁▂▃▄▅▆▇█"
    if len(values) > width:
        stride = len(values) / width
        values = [values[int(i * stride)] for i in range(width)]
    lo, hi = min(values), max(values)
    rng = (hi - lo) or 1.0
    return "".join(blocks[int((v - lo) / rng * (len(blocks) - 1))]
                   for v in values)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("metrics_jsonl")
    p.add_argument("--keys", nargs="*", default=None)
    args = p.parse_args()

    rows = [json.loads(l) for l in open(args.metrics_jsonl)]
    if not rows:
        raise SystemExit("empty log")
    keys = args.keys or [k for k in rows[-1] if k not in ("step", "time")]
    print(f"{len(rows)} log points, steps {rows[0]['step']}.."
          f"{rows[-1]['step']}, {rows[-1]['time']:.0f}s")
    for k in keys:
        vals = [r[k] for r in rows if k in r]
        if not vals:
            continue
        print(f"{k:>24}: first={vals[0]:.4g} last={vals[-1]:.4g} "
              f"min={min(vals):.4g} max={max(vals):.4g}")
        print(f"{'':>24}  {sparkline(vals)}")


if __name__ == "__main__":
    main()
