"""upfirdn2d_pallas end-to-end train-step measurement (VERDICT r4 item 4).

The Pallas upfirdn kernel (ops/pallas_kernels.py) qualifies only at
C%128==0 (pallas_supported), which excludes every RGB-skip site — but the
D blur-downsample sites and the G low-res blur sites in the TRAIN step run
at C in {128..512}. This script gives the kernel its one fair end-to-end
shot: the full walk-training step at 256px and 1024px with
kernel_impl='pallas_ufd' (upfirdn routed to Pallas at qualifying sites,
everything else — including fused_act — unchanged) vs the default XLA conv
formulation. Matches the envelope of the reference's CUDA kernel at
graphs/stylegan_v2_real/op/upfirdn2d_kernel.cu:177-211.

Result goes into the BASELINE.md negative/positive ledger: win -> enable
per-site; loss -> freeze the kernel as a documented worked example.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/bench_pallas_ufd.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (repo-root bench.py)


def main() -> None:
    rows = {}
    for label, kwargs in [
        ("train256_b16_xla", dict(size=256, batch=16)),
        ("train256_b16_pallas_ufd", dict(size=256, batch=16,
                                         kernel_impl="pallas_ufd")),
        ("train1024_b8_remat_xla", dict(size=1024, batch=8, remat=True,
                                        iters=6, warmup=2)),
        ("train1024_b8_remat_pallas_ufd",
         dict(size=1024, batch=8, remat=True, iters=6, warmup=2,
              kernel_impl="pallas_ufd")),
    ]:
        steps_s, samples_s, flops = bench.bench_train(**kwargs)
        rows[label] = {
            "steps_per_s": round(steps_s, 3),
            "samples_per_s": round(samples_s, 3),
            "flops_per_step_tf": round(flops / 1e12, 3) if flops else None,
        }
        print(label, json.dumps(rows[label]), flush=True)
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
