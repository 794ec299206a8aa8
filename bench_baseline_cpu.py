"""Same-host measured PyTorch baseline for the edit-inference pipeline.

SURVEY §6: the reference publishes no numbers, so the build must measure its
own PyTorch baseline. No A100 is reachable from this environment; what IS
measurable on the same host is the two stacks on identical CPU hardware:

  * torch: the inline rosinality-layout StyleGAN2 G (tests/
    test_stylegan2_torch_oracle.py — the same module layout and math as the
    reference's networks.py) + torchvision-layout ResNet-50, full-size
    channel table, running the edit pipeline (style MLP -> synth -> regress
    -> walk -> synth) under torch.no_grad on CPU.
  * jax: this framework's Editor pipeline jitted on the CPU backend.

This gives a measured torch-vs-this-framework ratio with hardware held
constant (CPU), complementing BENCH's TPU numbers and BASELINE.md's
A100-class estimate. Run: python bench_baseline_cpu.py [--size 256]
(1024 default is slow on CPU: minutes per iteration).

Prints one JSON line: {"torch_cpu_img_s": ..., "jax_cpu_img_s": ..., ...}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "tests"))


def full_channels(size: int) -> dict[int, int]:
    """rosinality channel table, multiplier 2 (networks.py:384-394)."""
    base = {4: 512, 8: 512, 16: 512, 32: 512, 64: 512, 128: 256, 256: 128,
            512: 64, 1024: 32}
    return {r: c for r, c in base.items() if r <= size}


def bench_torch(size: int, batch: int, iters: int) -> float:
    import numpy as np
    import torch

    from test_stylegan2_torch_oracle import TGenerator
    from test_towers_convert import TorchResNet50

    torch.manual_seed(0)
    g = TGenerator(size, 512, 8, full_channels(size)).eval()
    r = TorchResNet50(num_outputs=40).eval()
    walk = torch.randn(1, g.n_latent, 512) * 0.02
    z = torch.from_numpy(
        np.random.RandomState(0).randn(batch, 512).astype(np.float32))
    noise = [getattr(g.noises, f"noise_{i}") for i in range(g.num_layers)]

    def synth(latent):
        out = g.input["input"].repeat(latent.shape[0], 1, 1, 1)
        out = g.conv1(out, latent[:, 0], noise[0])
        skip = g.to_rgb1(out, latent[:, 1])
        i = 1
        for c1, c2, n1, n2, trgb in zip(g.convs[::2], g.convs[1::2],
                                        noise[1::2], noise[2::2], g.to_rgbs):
            out = c1(out, latent[:, i], n1)
            out = c2(out, latent[:, i + 1], n2)
            skip = trgb(out, latent[:, i + 2], skip)
            i += 2
        return skip

    def edit():
        with torch.no_grad():
            w = g.map_style(z)
            latent = w.unsqueeze(1).repeat(1, g.n_latent, 1)
            orig = synth(latent)
            alpha_org = r(orig)[:, :1]
            delta = 0.9 - alpha_org
            latent_new = latent + delta[:, :, None] * walk
            return synth(latent_new)

    edit()  # warmup
    t0 = time.perf_counter()
    for _ in range(iters):
        out = edit()
    float(out.sum())
    return batch * iters / (time.perf_counter() - t0)


def bench_jax(size: int, batch: int, iters: int) -> float:
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from latent2im_tpu.engine.editor import Editor, EditorConfig
    from latent2im_tpu.models import resnet as rn
    from latent2im_tpu.models import stylegan2 as sg2
    from latent2im_tpu.walks import init_walk

    key = jax.random.PRNGKey(0)
    kg, kr, kw = jax.random.split(key, 3)
    g = sg2.init_generator(kg, size, style_dim=512, n_mlp=8,
                           channels=full_channels(size))
    reg = rn.init_resnet50(kr, num_outputs=40)
    cfg = EditorConfig(attr_list=("Smiling",), attr_idx=(31,), size=size)
    ed = Editor(cfg, g, reg_params=reg)
    walk = init_walk(kw, "linear_w", 512, cfg.n_latent, ["Smiling"])
    frozen = jax.device_put(ed.frozen_params())

    @jax.jit
    def edit_step(wp, z, at, fr):
        e = ed.with_params(fr)
        latent = e.get_w(z)
        orig = e.synthesize(latent)
        ao = e.regress(orig)
        return e.synthesize(e.edit(wp, latent, at - ao))

    z = jax.random.normal(jax.random.PRNGKey(1), (batch, 512))
    alpha = jnp.full((batch, 1), 0.9, jnp.float32)
    out = edit_step(walk, z, alpha, frozen)
    float(jnp.sum(out))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = edit_step(walk, z, alpha, frozen)
    float(jnp.sum(out))
    return batch * iters / (time.perf_counter() - t0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    jax_s = bench_jax(args.size, args.batch, args.iters)
    torch_s = bench_torch(args.size, args.batch, args.iters)
    print(json.dumps({
        "size_px": args.size,
        "batch": args.batch,
        "torch_cpu_img_s": round(torch_s, 3),
        "jax_cpu_img_s": round(jax_s, 3),
        "jax_over_torch": round(jax_s / torch_s, 2),
    }))


if __name__ == "__main__":
    main()
