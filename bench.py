"""Benchmark: 1024px StyleGAN2 edit-inference throughput on one TPU chip.

Measures the full editing pipeline per output image — style MLP, synthesis of
the original, ResNet-50 attribute regression, walk, synthesis of the edit —
i.e. the work vis_w.py does per panel (two generator forwards + one regressor
forward), at 1024px, bf16 compute, batch BATCH.

Prints ONE JSON line; the headline metric stays the edit-inference
throughput, with the 256px full-tower walk-TRAINING throughput carried as
extra fields (train_steps_per_s / train_samples_per_s @ train_batch):
  {"metric": ..., "value": imgs/sec, "unit": "img/s", "vs_baseline": ratio,
   "train_steps_per_s": ..., "train_samples_per_s": ..., "train_batch": N}

Baseline: BASELINE.md documents the A100-class estimate for the same pipeline
(A100_EDIT_IMG_S below). The reference repo publishes no numbers (SURVEY §6),
so this is the north-star target ratio, not a measured torch run.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp

# A100-class estimate for the same 1024px edit pipeline (2x G fwd + R fwd,
# fp16, batch inference, PyTorch with the reference's custom CUDA ops).
# See BASELINE.md "Measured baselines" for the derivation.
A100_EDIT_IMG_S = 12.0

# Dense bf16 peak per chip, by jax device_kind. MFU denominator; see
# BASELINE.md "FLOP accounting".
PEAK_TFLOPS = {
    "TPU v5 lite": 197.0,   # v5e
    "TPU v4": 275.0,
    "TPU v5": 459.0,        # v5p
    "TPU v5p": 459.0,
    "TPU v6 lite": 918.0,   # Trillium
}


def _program_flops(compiled) -> float | None:
    """Total FLOPs of a compiled XLA program (MACs counted as 2, i.e. the
    standard model-FLOP convention) via XLA's own cost model."""
    try:
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, list) else ca
        f = float(ca.get("flops", 0.0))
        return f if f > 0 else None
    except Exception:
        return None


def _mfu_fields(prefix: str, flops_per_call, calls_per_s) -> dict:
    dev = jax.devices()[0].device_kind
    peak = PEAK_TFLOPS.get(dev)
    out = {}
    if flops_per_call:
        tflops_s = flops_per_call * calls_per_s / 1e12
        out[f"{prefix}tflops_per_s"] = round(tflops_s, 2)
        if peak:
            out[f"{prefix}mfu"] = round(tflops_s / peak, 4)
    if peak:
        out["peak_tflops"] = peak
        out["device_kind"] = dev
    return out

# B=8 was the pre-fast-tail HBM limit; the s2d tail freed enough activation
# memory for 16 (round 1) and now 32 (measured 137.7 vs 130.0 img/s at 16).
BATCH = 32
SIZE = 1024
ITERS = 20
WARMUP = 3


TRAIN_SIZE = 256
TRAIN_BATCH = 16
TRAIN_ITERS = 10
TRAIN_WARMUP = 2


def bench_train(size=TRAIN_SIZE, batch=TRAIN_BATCH, remat=False,
                remat_towers=False, iters=TRAIN_ITERS, warmup=TRAIN_WARMUP,
                reg_input_size=None, content_input_size=None,
                kernel_impl=None):
    """Full-tower walk-training step throughput (two G fwds + R + VGG
    + D fwds, backward through the frozen graph into the walk, Adam).

    At 1024px the step is memory-bound: plain fails to fit at B>=8 and
    remat_g unlocks B=8 at ~2x the B=4-plain throughput (grid in
    BASELINE.md) — the crossover the 256px grid predicted."""
    from latent2im_tpu.engine.editor import Editor, EditorConfig
    from latent2im_tpu.engine.train import make_optimizer, make_train_step
    from latent2im_tpu.models import resnet as rn
    from latent2im_tpu.models import stylegan2 as sg2
    from latent2im_tpu.models import vgg as vggm
    from latent2im_tpu.tasks.transforms import get_task
    from latent2im_tpu.walks import init_walk

    key = jax.random.PRNGKey(0)
    kg, kd, kr, kv, kw = jax.random.split(key, 5)
    g = sg2.init_generator(kg, size, style_dim=512, n_mlp=8)
    d = sg2.init_discriminator(kd, size)
    reg = rn.init_resnet50(kr, num_outputs=40)
    vgg = vggm.init_vgg(kv, "vgg19")
    cfg = EditorConfig(
        attr_list=("Smiling",), attr_idx=(31,), size=size,
        compute_dtype=jnp.bfloat16, remat_g=remat,
        remat_towers=remat_towers, reg_input_size=reg_input_size,
        content_input_size=content_input_size, kernel_impl=kernel_impl,
    )
    ed = Editor(cfg, g, reg_params=reg, vgg_params=vgg, d_params=d)
    walk = init_walk(kw, "linear_w", 512, cfg.n_latent, ["Smiling"])
    opt = make_optimizer(1e-4)
    state = opt.init(walk)
    step = make_train_step(ed, get_task("face"), opt)

    z = jax.random.normal(jax.random.PRNGKey(1), (batch, 512))
    # ONE compile, used for the timed loop AND the FLOP accounting (a second
    # lower().compile() would double the dominant compile cost)
    compiled = step.jit_fn.lower(
        walk, state, z, jax.random.PRNGKey(0), step.frozen_dev
    ).compile()
    flops = _program_flops(compiled)
    for i in range(warmup):
        walk, state, metrics = compiled(walk, state, z, jax.random.PRNGKey(i),
                                        step.frozen_dev)
        float(metrics["loss"])
    t0 = time.perf_counter()
    for i in range(iters):
        walk, state, metrics = compiled(walk, state, z, jax.random.PRNGKey(i),
                                        step.frozen_dev)
    float(metrics["loss"])  # host sync; steps serialize on the device queue
    dt = time.perf_counter() - t0
    return iters / dt, iters * batch / dt, flops


SWEEP_PANELS = 10  # BASELINE config #1: 10-panel Smiling sweep
SWEEP_ITERS = 8


def bench_sweep(ed, walk, batch: int, chunk=None):
    """vis_w panel-sweep throughput (panel-img/s) at 1024px: one sweep =
    get_w + orig synthesis + regress + P edited syntheses, flattened into
    chip-filling programs (engine/editor.py:sweep)."""
    import numpy as np

    z = np.random.RandomState(2).randn(batch, 512).astype("float32")
    panels = np.linspace(0.0, 1.0, SWEEP_PANELS)[:, None] * np.ones(
        (SWEEP_PANELS, batch), np.float32
    )
    # u8=True is the production vis/serve configuration: in-graph uint8
    # conversion, 4x smaller output buffers
    imgs, _, _ = ed.sweep(walk, z, panels, chunk=chunk, u8=True)  # warm
    float(jnp.sum(imgs.astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(SWEEP_ITERS):
        imgs, _, _ = ed.sweep(walk, z, panels, chunk=chunk, u8=True)
    float(jnp.sum(imgs.astype(jnp.float32)))  # host sync
    dt = time.perf_counter() - t0
    rate = SWEEP_PANELS * batch * SWEEP_ITERS / dt
    del imgs  # free the [P,B,1024,1024,3] stack before the next section
    return rate


SERVE_BATCH = 8


def bench_serve(ed, walk) -> dict:
    """Real-chip serving numbers over live HTTP (VERDICT r4 weak #5): warm
    /edit p50/p95 latency (sequential single-sample requests), micro-batched
    /edit throughput under 8 concurrent clients, and warm /sweep latency —
    1024px, serve_batch=8, the cli/serve.py production path (fixed-width
    programs + MicroBatcher + compress_level-1 PNG). Reuses the sweep
    section's warm towers, so only the width-8 edit program compiles here."""
    import threading
    import urllib.request

    from latent2im_tpu.cli.serve import EditService, make_server
    from latent2im_tpu.tasks.transforms import get_task

    svc = EditService(ed, walk, get_task("face"), batch=SERVE_BATCH,
                      num_panels=SWEEP_PANELS, min_alpha=0.0, max_alpha=1.0)
    svc.warmup()
    svc.enable_batching(8.0)
    srv = make_server(svc, "127.0.0.1", 0)
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()

    def post(path: str, obj: dict) -> float:
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}{path}",
            data=json.dumps(obj).encode(),
            headers={"Content-Type": "application/json"},
        )
        t0 = time.perf_counter()
        with urllib.request.urlopen(req, timeout=600) as resp:
            resp.read()
        return time.perf_counter() - t0

    try:
        # warm sequential single-sample /edit latency
        lats = sorted(post("/edit", {"seed": i, "alpha": 0.8})
                      for i in range(12))
        out = {
            "serve_edit_p50_ms": round(lats[len(lats) // 2] * 1e3, 1),
            "serve_edit_p95_ms": round(lats[-1] * 1e3, 1),
            "serve_batch": SERVE_BATCH,
        }

        # micro-batched throughput: 8 concurrent clients, single-sample
        # requests coalescing into fixed-width programs
        n_cli, per_cli = 8, 6
        errs: list[Exception] = []

        def client(k: int) -> None:
            try:
                for i in range(per_cli):
                    post("/edit", {"seed": 100 + k * 31 + i, "alpha": 0.8})
            except Exception as e:  # noqa: BLE001
                errs.append(e)

        threads = [threading.Thread(target=client, args=(k,))
                   for k in range(n_cli)]
        t0 = time.perf_counter()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        dt = time.perf_counter() - t0
        if errs:
            raise errs[0]
        out["serve_edit_concurrent_rps"] = round(n_cli * per_cli / dt, 2)
        out["serve_device_calls"] = svc.device_calls

        # warm /sweep (P=10 panels of one sample)
        slats = sorted(post("/sweep", {"seed": s}) for s in range(3))
        out["serve_sweep_p50_ms"] = round(slats[1] * 1e3, 1)
        return out
    finally:
        srv.shutdown()


def _await_backend() -> None:
    """The axon remote has gone UNAVAILABLE for hours after killed 1024px
    runs (backend init itself fails after ~25 min; docs/NEXT.md ops note).
    If the unattended driver bench lands mid-outage, one long retry is a
    better outcome than an immediate crash. L2I_BENCH_RETRIES=0 disables.

    The probe runs in a SUBPROCESS: jax caches backend init per process, so
    after one in-process failure a retry would either no-op or silently
    return the CPU fallback registry — and a 1024px 'TPU' bench quietly
    measured on CPU is worse than a crash. The subprocess also checks the
    default platform is not cpu (L2I_BENCH_ALLOW_CPU=1 overrides, for
    deliberate CPU smoke runs); only after a clean probe does THIS process
    initialize its own (fresh) backend."""
    import os
    import subprocess

    if os.environ.get("L2I_BENCH_ALLOW_CPU") == "1":
        return
    retries = int(os.environ.get("L2I_BENCH_RETRIES", "1"))
    probe = ("import jax, sys; d = jax.devices(); "
             "sys.exit(0 if d[0].platform != 'cpu' else 3)")
    for attempt in range(retries + 1):
        try:
            rc = subprocess.run(
                [sys.executable, "-c", probe], timeout=2400
            ).returncode
        except subprocess.TimeoutExpired:
            rc = -1
        if rc == 0:
            return
        msg = ("default backend is CPU" if rc == 3
               else f"backend probe failed (rc={rc})")
        if attempt == retries:
            raise RuntimeError(
                f"{msg} after {retries + 1} probes; not benching "
                "(set L2I_BENCH_ALLOW_CPU=1 for a deliberate CPU run)"
            )
        print(f"{msg}; retrying in 120s", file=sys.stderr, flush=True)
        time.sleep(120)


def _build_edit_setup():
    """1024px edit-pipeline towers: (editor, walk, frozen-on-device)."""
    from latent2im_tpu.engine.editor import Editor, EditorConfig
    from latent2im_tpu.models import resnet as rn
    from latent2im_tpu.models import stylegan2 as sg2
    from latent2im_tpu.walks import init_walk

    key = jax.random.PRNGKey(0)
    kg, kr, kw = jax.random.split(key, 3)
    g = sg2.init_generator(kg, SIZE, style_dim=512, n_mlp=8)
    reg = rn.init_resnet50(kr, num_outputs=40)
    cfg = EditorConfig(
        attr_list=("Smiling",),
        attr_idx=(31,),
        size=SIZE,
        compute_dtype=jnp.bfloat16,
    )
    ed = Editor(cfg, g, reg_params=reg)
    walk = init_walk(kw, "linear_w", 512, cfg.n_latent, ["Smiling"])
    # Frozen towers travel as jit ARGUMENTS: closing over them embeds every
    # weight as an HLO constant, which made tracing alone take ~220s at
    # 1024px (and risks the compile tunnel's payload limit).
    frozen = jax.device_put(ed.frozen_params())
    return ed, walk, frozen


def main():
    _await_backend()
    import gc

    ed, walk, frozen = _build_edit_setup()

    @jax.jit
    def edit_step(walk_params, z, alpha_target, fr):
        e = ed.with_params(fr)
        latent = e.get_w(z)
        orig = e.synthesize(latent)
        alpha_org = e.regress(orig)
        delta = alpha_target - alpha_org
        edited = e.synthesize(e.edit(walk_params, latent, delta))
        # the image is a jit OUTPUT, so every iteration fully materializes
        # it; the host-scalar sync happens once after the timed loop (an
        # in-graph per-iter checksum was 2.8 ms of pure reduction overhead)
        return edited

    z = jax.random.normal(jax.random.PRNGKey(1), (BATCH, 512))
    alpha = jnp.full((BATCH, 1), 0.9, jnp.float32)

    # single AOT compile reused for the timed loop and the FLOP accounting
    compiled = edit_step.lower(walk, z, alpha, frozen).compile()
    edit_flops = _program_flops(compiled)

    for _ in range(WARMUP):
        out = compiled(walk, z, alpha, frozen)
    float(jnp.sum(out.astype(jnp.float32)))  # host sync

    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = compiled(walk, z, alpha, frozen)
    # sync once at the end; steps serialize on the device queue
    float(jnp.sum(out.astype(jnp.float32)))
    dt = time.perf_counter() - t0

    imgs_per_sec = BATCH * ITERS / dt
    rec = {
        "metric": f"stylegan2_{SIZE}px_edit_inference_throughput",
        "value": round(imgs_per_sec, 3),
        "unit": "img/s",
        "vs_baseline": round(imgs_per_sec / A100_EDIT_IMG_S, 3),
    }
    rec.update(_mfu_fields("", edit_flops, imgs_per_sec / BATCH if edit_flops
                           else 0))
    if edit_flops:
        rec["flops_per_img"] = round(edit_flops / BATCH / 1e9, 2)  # GFLOP

    # free the B=32 buffers AND the edit towers for the trains — bench_train
    # builds its own full towers, and the 1024px remat config needs the
    # headroom the retained edit-path G+resnet copies would eat
    out = compiled = frozen = ed = walk = None  # noqa: F841
    gc.collect()
    train_steps_s, train_samples_s, train_flops = bench_train()
    rec.update({
        "train_steps_per_s": round(train_steps_s, 3),
        "train_samples_per_s": round(train_samples_s, 3),
        "train_batch": TRAIN_BATCH,
        "train_size_px": TRAIN_SIZE,
    })
    rec.update(_mfu_fields("train_", train_flops, train_steps_s))

    # 1024px training envelope: plain OOMs the 16G HBM at B>=8; remat_g
    # (jax.checkpoint on the edited-path G forward) is the enabling config
    # (BASELINE.md batch/remat grid, 2026-08-17)
    s1024, sa1024, f1024 = bench_train(size=1024, batch=8, remat=True,
                                       iters=6, warmup=2)
    rec.update({
        "train1024_steps_per_s": round(s1024, 3),
        "train1024_samples_per_s": round(sa1024, 3),
        "train1024_batch": 8,
        "train1024_remat_g": True,
    })
    rec.update(_mfu_fields("train1024_", f1024, s1024))
    gc.collect()

    # reg_input_size=256 variant: regress at the regressor's own TRAINING
    # resolution (engine/editor.py reg_input_size doc) — statistically truer
    # AND it deletes the two most expensive non-G towers of the 1024px step
    # (full-res ResNet passes). Reported side by side with the full-res row
    # above; the profile table in BASELINE.md explains the gap.
    sr, sar, fr2 = bench_train(size=1024, batch=8, remat=True,
                               iters=6, warmup=2, reg_input_size=256)
    rec.update({
        "train1024_reg256_steps_per_s": round(sr, 3),
        "train1024_reg256_samples_per_s": round(sar, 3),
    })
    rec.update(_mfu_fields("train1024_reg256_", fr2, sr))
    gc.collect()

    # full-remedy variant (round-5 profile finding, BASELINE.md): the 1024px
    # step's biggest cost block is the full-res VGG content tower; resizing
    # BOTH loss towers to their statistically-native 256px
    # (reg_input_size=256 + content_input_size=256) leaves a G-dominated
    # profile at ~1.6x the plain-row throughput.
    sm, sam, fm = bench_train(size=1024, batch=8, remat=True, iters=6,
                              warmup=2, reg_input_size=256,
                              content_input_size=256)
    rec.update({
        "train1024_remedy_steps_per_s": round(sm, 3),
        "train1024_remedy_samples_per_s": round(sam, 3),
    })
    rec.update(_mfu_fields("train1024_remedy_", fm, sm))

    # vis/eval panel-sweep throughput at the batch sizes vis actually uses:
    # the flattened-batch sweep (engine/editor.py:sweep) replaced the
    # lax.map-at-width-B form that starved the chip (103 panel-img/s at B=1
    # in round 3). Round 5 restructured the sweep into HOST-dispatched
    # per-chunk synthesis programs with in-graph uint8 outputs, so no single
    # program ever holds the P*B f32 stack — the form whose width-20 program
    # OOM'd AND wedged the axon backend for the rest of the process in round
    # 4 (BASELINE.md; this section still runs last as cheap insurance).
    # Default chunking is _balanced_chunk(P*B, 32): widths 10/20/27 at
    # B=1/2/8 instead of the round-4 flat 10.
    sweep_ed_base, sweep_walk, sweep_frozen = _build_edit_setup()
    sweep_ed = sweep_ed_base.with_params(sweep_frozen)
    wedged = False
    for b in (1, 2, 8):
        if wedged:
            rec[f"sweep_b{b}_skipped"] = True
            continue
        for chunk in (None, 10):
            try:
                rec[f"sweep_panel_imgs_per_s_b{b}"] = round(
                    bench_sweep(sweep_ed, sweep_walk, b, chunk=chunk), 2
                )
                rec[f"sweep_b{b}_chunk"] = chunk or "balanced"
                break
            except Exception as e:  # noqa: PERF203, BLE001 — OOM surfaces as
                # JaxRuntimeError OR ValueError depending on the sync point
                if "RESOURCE_EXHAUSTED" not in str(e):
                    raise
                if chunk == 10:
                    # post-OOM the backend is wedged (see above): record the
                    # miss, skip the remaining batches, still print the JSON
                    print(f"sweep B={b}: RESOURCE_EXHAUSTED; backend wedged, "
                          "skipping remaining sweeps", file=sys.stderr)
                    rec[f"sweep_b{b}_oom"] = True
                    wedged = True
                    break
                sweep_ed = sweep_ed_base.with_params(sweep_frozen)

    if not wedged:
        try:
            rec.update(bench_serve(sweep_ed, sweep_walk))
        except Exception as e:  # noqa: BLE001 — serving numbers are extra
            # fields; never let them take the headline metric down
            print(f"serve bench failed: {type(e).__name__}: {e}",
                  file=sys.stderr)
            rec["serve_error"] = f"{type(e).__name__}: {e}"

    print(json.dumps(rec))


if __name__ == "__main__":
    main()
