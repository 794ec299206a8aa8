"""One-config 1024px train-step throughput probe (separate process per
config because a RESOURCE_EXHAUSTED can wedge the axon backend — run the
risky configs last; BASELINE.md 1024px grid is assembled from these rows).

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/bench_train1024_grid.py \
           --batch 16 --remat --reg_input_size 256 --content_input_size 256
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--remat_mode", type=str, default=None,
                    help="'block' = per-synthesis-block checkpoints")
    ap.add_argument("--reg_input_size", type=int, default=None)
    ap.add_argument("--content_input_size", type=int, default=None)
    ap.add_argument("--iters", type=int, default=6)
    args = ap.parse_args()
    remat = args.remat_mode or args.remat
    steps_s, samples_s, flops = bench.bench_train(
        size=args.size, batch=args.batch,
        remat=remat,
        iters=args.iters, warmup=2, reg_input_size=args.reg_input_size,
        content_input_size=args.content_input_size,
    )
    print(json.dumps({
        "batch": args.batch, "size": args.size, "remat": remat,
        "reg_input_size": args.reg_input_size,
        "content_input_size": args.content_input_size,
        "steps_per_s": round(steps_s, 3),
        "samples_per_s": round(samples_s, 3),
        "flops_per_step_tf": round(flops / 1e12, 3) if flops else None,
    }))


if __name__ == "__main__":
    main()
