"""Profile the 1024px walk-training step (VERDICT r4 item 2).

Runs the exact bench.py train1024 configuration (B=8, --remat_g, bf16, full
towers) under jax.profiler.trace and prints the top device ops by total
time — the same table BASELINE.md carries for the 256px step — so the
23.9% MFU number gets a committed profile and a verdict (recoverable vs
honest ceiling). Matches the training envelope of the reference's
train.py:25-134 at networks.py:384-394 scales.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/profile_train1024.py
       [--reg_input_size 256] [--steps 6]
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import sys
import tempfile
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_trace(trace_dir: str) -> list[tuple[str, float, int, str]]:
    """[(op_key, total_ms, count, src)] sorted by total time, device track
    only (host python/runtime rows carry no long_name)."""
    rows: dict[str, list] = defaultdict(lambda: [0.0, 0, ""])
    for path in glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                          recursive=True):
        with gzip.open(path, "rt") as f:
            data = json.load(f)
        for ev in data.get("traceEvents", []):
            if ev.get("ph") != "X":
                continue
            args = ev.get("args") or {}
            long = args.get("long_name")
            if not long:
                continue
            key = ev.get("name", "?")
            rows[key][0] += float(ev.get("dur", 0.0)) / 1e3
            rows[key][1] += 1
            src = args.get("source", "")
            if src and not rows[key][2]:
                rows[key][2] = src
    return sorted(
        ((k, v[0], v[1], v[2]) for k, v in rows.items()),
        key=lambda r: -r[1],
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=6)
    ap.add_argument("--reg_input_size", type=int, default=None)
    ap.add_argument("--content_input_size", type=int, default=None)
    ap.add_argument("--top", type=int, default=15)
    args = ap.parse_args()

    import jax

    import bench

    # warm build+compile outside the trace (bench_train compiles internally;
    # we re-run the timed body under the profiler with its own towers)
    from latent2im_tpu.engine.editor import Editor, EditorConfig
    from latent2im_tpu.engine.train import make_optimizer, make_train_step
    from latent2im_tpu.models import resnet as rn
    from latent2im_tpu.models import stylegan2 as sg2
    from latent2im_tpu.models import vgg as vggm
    from latent2im_tpu.tasks.transforms import get_task
    from latent2im_tpu.walks import init_walk
    import jax.numpy as jnp

    key = jax.random.PRNGKey(0)
    kg, kd, kr, kv, kw = jax.random.split(key, 5)
    g = sg2.init_generator(kg, 1024, style_dim=512, n_mlp=8)
    d = sg2.init_discriminator(kd, 1024)
    reg = rn.init_resnet50(kr, num_outputs=40)
    vgg = vggm.init_vgg(kv, "vgg19")
    cfg = EditorConfig(
        attr_list=("Smiling",), attr_idx=(31,), size=1024,
        compute_dtype=jnp.bfloat16, remat_g=True,
        reg_input_size=args.reg_input_size,
        content_input_size=args.content_input_size,
    )
    ed = Editor(cfg, g, reg_params=reg, vgg_params=vgg, d_params=d)
    walk = init_walk(kw, "linear_w", 512, cfg.n_latent, ["Smiling"])
    opt = make_optimizer(1e-4)
    state = opt.init(walk)
    step = make_train_step(ed, get_task("face"), opt)
    z = jax.random.normal(jax.random.PRNGKey(1), (8, 512))
    compiled = step.jit_fn.lower(
        walk, state, z, jax.random.PRNGKey(0), step.frozen_dev
    ).compile()
    for i in range(2):  # warmup
        walk, state, metrics = compiled(walk, state, z, jax.random.PRNGKey(i),
                                        step.frozen_dev)
        float(metrics["loss"])

    trace_dir = tempfile.mkdtemp(prefix="l2i_prof_1024_")  # FRESH dir
    with jax.profiler.trace(trace_dir):
        for i in range(args.steps):
            walk, state, metrics = compiled(
                walk, state, z, jax.random.PRNGKey(i), step.frozen_dev
            )
        float(metrics["loss"])

    rows = parse_trace(trace_dir)
    total = sum(r[1] for r in rows)
    per_step = total / args.steps
    print(f"\ndevice total {total:.1f} ms over {args.steps} steps "
          f"= {per_step:.1f} ms/step "
          f"(reg_input_size={args.reg_input_size}, "
          f"content_input_size={args.content_input_size})\n")
    print(f"{'ms/step':>9}  {'%step':>6}  {'n':>4}  op / source")
    for key, ms, n, src in rows[:args.top]:
        print(f"{ms / args.steps:9.2f}  {100 * ms / total:6.2f}  "
              f"{n // args.steps:4d}  {key[:80]}  {src}")


if __name__ == "__main__":
    main()
