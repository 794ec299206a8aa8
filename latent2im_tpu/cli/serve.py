"""Production serving CLI: HTTP edit/sweep endpoints over a warm Editor.

The reference has no serving story (its inference surface is the vis_w.py
batch script); this is the deployment-shaped counterpart for the TPU
runtime. The TPU-native serving rules it encodes:

- **Static program widths.** XLA compiles one executable per shape; a naive
  server recompiles (20-120s at 1024px) whenever a request batch differs.
  Every request pads to the fixed ``--serve_batch`` width and slices the
  answer back, so after warmup NO request ever compiles.
- **Warm start.** The edit and sweep programs compile once at startup (the
  listener only opens afterwards), so the first user request is fast.
- **One device queue.** A single chip runs one program at a time; a
  threading.Lock serializes device work while the stdlib ThreadingHTTPServer
  overlaps request parsing / PNG encoding with the next device call.
- **Multi-chip.** --n_devices / --sp_devices reuse the inference mesh policy
  (parallel/spatial.setup_inference_mesh): dp shards the padded batch,
  sp spatially partitions synthesis rows; the spatial context is entered
  once for the server lifetime (the context object is reusable by design).

Endpoints (JSON in, JSON out; images as base64 PNG):
  GET  /healthz          -> {"status": "ok", ...}
  POST /edit   {"z": [[...]] | "seed": int, "alpha": float | [floats],
                "index": optional regressor-table attr id}
               -> {"images": [b64 png], "alpha_org": [[...]]}
  POST /sweep  {"z" | "seed", "num_panels": P, "min_alpha", "max_alpha"}
               -> {"panels": [[b64 png] * P], "alpha_org": [[...]]}

Usage:
  python -m latent2im_tpu.cli.serve <run_dir>/opt.yml \
      --save_path_w <ckpt> --port 8642 [--serve_batch 4]
"""

from __future__ import annotations

import base64
import io as _io
import json
import threading

import numpy as np

from ..config.options import VisOptions
from ..engine.build import load_editor_for_inference


def _png_b64(img_u8: np.ndarray) -> str:
    from PIL import Image

    buf = _io.BytesIO()
    # compress_level=1: ~4x faster encode than the default 6 for ~15% larger
    # payloads — at 1024px the encode otherwise rivals the device time in the
    # request latency (serving trades bytes for tail latency)
    Image.fromarray(img_u8).save(buf, format="png", compress_level=1)
    return base64.b64encode(buf.getvalue()).decode("ascii")


class MicroBatcher:
    """Cross-request micro-batching for single-sample edits.

    A chip runs one fixed-width program per launch whether 1 or
    serve_batch rows are real; with concurrent users the padding rows
    might as well carry other requests. Single-sample /edit requests
    enqueue here; a worker thread waits `window_ms` for company, packs up
    to serve_batch rows into ONE `_edit_batch` launch, and hands each
    requester its own row back. Latency cost: at most window_ms; program
    count: up to serve_batch-fold fewer.
    """

    def __init__(self, service: "EditService", window_ms: float = 8.0):
        self.svc = service
        self.window_s = window_ms / 1000.0
        self._lock = threading.Lock()
        self._cond = threading.Condition(self._lock)
        self._pending: list[dict] = []
        self._worker = threading.Thread(target=self._loop, daemon=True)
        self._worker.start()

    def edit_one(self, z_row: np.ndarray, alpha: float):
        if not self._worker.is_alive():
            raise RuntimeError(
                "micro-batch worker died; restart the server or disable "
                "--batch_window_ms"
            )
        box = {"z": z_row, "alpha": alpha, "done": threading.Event()}
        with self._lock:
            self._pending.append(box)
            self._cond.notify()
        if not box["done"].wait(timeout=300):
            raise RuntimeError("micro-batch worker timed out")
        if "err" in box:
            raise box["err"]
        if "img" not in box:  # worker died mid-batch on a BaseException
            raise RuntimeError("micro-batch worker aborted")
        return box["img"], box["alpha_org"]

    def _loop(self):
        import time as _time

        while True:
            with self._lock:
                while not self._pending:
                    self._cond.wait()
                # accumulation window: wait for company, but launch EARLY
                # the moment a full program width is queued — under load the
                # window must not cap throughput at batch/(window + launch)
                deadline = _time.monotonic() + self.window_s
                while len(self._pending) < self.svc.batch:
                    remaining = deadline - _time.monotonic()
                    if remaining <= 0:
                        break
                    self._cond.wait(timeout=remaining)
                batch = self._pending[: self.svc.batch]
                del self._pending[: len(batch)]
            try:
                z = np.stack([b["z"] for b in batch]).astype(np.float32)
                a = np.asarray([b["alpha"] for b in batch], np.float32)
                imgs, alpha_org = self.svc._edit_batch(z, a)
                for i, b in enumerate(batch):
                    b["img"], b["alpha_org"] = imgs[i], alpha_org[i]
            except BaseException as e:  # noqa: BLE001 — waiters must never
                # block 300s because the worker died mid-batch; give every
                # box the error, then re-raise non-Exception signals
                err = e if isinstance(e, Exception) else RuntimeError(
                    f"micro-batch worker aborted: {type(e).__name__}: {e}"
                )
                for b in batch:
                    b["err"] = err
                if not isinstance(e, Exception):
                    for b in batch:
                        b["done"].set()
                    raise
            finally:
                for b in batch:
                    b["done"].set()


class EditService:
    """Warm, fixed-width edit/sweep programs over one Editor."""

    def __init__(self, editor, walk_params, task, batch: int,
                 num_panels: int, min_alpha: float, max_alpha: float,
                 mesh=None):
        self.ed = editor
        self.walk = walk_params
        self.task = task
        self.batch = batch
        self.num_panels = num_panels
        self.min_alpha, self.max_alpha = min_alpha, max_alpha
        self.mesh = mesh
        self.dim_z = editor.cfg.dim_z
        self._dev_lock = threading.Lock()  # one device queue
        self.device_calls = 0  # observability: program launches
        self.batcher: MicroBatcher | None = None

    def enable_batching(self, window_ms: float = 8.0) -> None:
        self.batcher = MicroBatcher(self, window_ms=window_ms)

    # -- padding ------------------------------------------------------------
    def _pad(self, z: np.ndarray) -> tuple[np.ndarray, int]:
        n = z.shape[0]
        if n > self.batch:
            raise ValueError(
                f"request batch {n} exceeds --serve_batch {self.batch}"
            )
        if n < self.batch:
            z = np.concatenate(
                [z, np.repeat(z[-1:], self.batch - n, axis=0)]
            )
        if self.mesh is not None:
            from ..parallel import mesh as meshlib

            z = meshlib.shard_batch(self.mesh, z, pad=True)
        return z, n

    def _zs(self, req: dict) -> np.ndarray:
        if "z" in req:
            z = np.asarray(req["z"], np.float32)
            if z.ndim == 1:
                z = z[None]
            if z.shape[-1] != self.dim_z:
                raise ValueError(
                    f"z must have dim {self.dim_z}, got {z.shape[-1]}"
                )
            if not 1 <= z.shape[0] <= self.batch:
                raise ValueError(
                    f"request batch must be 1..{self.batch} (serve_batch), "
                    f"got {z.shape[0]}"
                )
            return z
        seed = int(req.get("seed", 0))
        n = int(req.get("num_samples", 1))
        # validate BEFORE allocating: a huge num_samples would try to build
        # the host array first, and n=0 would slip an (unwarmed) zero-width
        # program past _pad's fixed-width padding
        if not 1 <= n <= self.batch:
            raise ValueError(
                f"num_samples must be 1..{self.batch} (serve_batch), got {n}"
            )
        return np.random.RandomState(seed).randn(n, self.dim_z).astype(
            np.float32
        )

    # -- endpoints ----------------------------------------------------------
    def warmup(self) -> None:
        z = np.zeros((self.batch, self.dim_z), np.float32)
        # Every client-reachable result width n has its own device-side [:n]
        # slice program on the fetch path (its compile was the p95 outlier
        # in the first real-chip measurement, BASELINE.md serving section) —
        # and the micro-batcher coalesces ANY 1..batch pending requests into
        # one launch, so every width is reachable. Warm them all, widest
        # first (the full padded program compiles once, on the first call;
        # the remaining widths only compile their tiny slices).
        for n in range(self.batch, 0, -1):
            self.edit({"z": z[:n].tolist(), "alpha": 0.5})
            self.sweep({"z": z[:n].tolist()})

    def _edit_batch(self, z: np.ndarray, a: np.ndarray, index=None):
        """Raw fixed-width edit: z [n,D], a [n] -> (uint8 imgs [n,...],
        alpha_org [n,...]). The single device-program path every edit route
        (direct or micro-batched) funnels through.

        The fetch is the serving bottleneck, not the program: a padded
        batch-8 1024px f32 result is ~100 MB of device→host traffic per
        request (measured ~10 s p50 over the axon tunnel; on a local host
        it's still 100 MB of PCIe per request). u8=True converts in-graph
        (4x) and the [:n] slice runs ON DEVICE before the transfer, so only
        the real rows ever cross — 3 MB for a single-sample request, a
        measured ~30x latency win (BASELINE.md serving section)."""
        zp, n = self._pad(z)
        ap = np.concatenate(
            [a, np.repeat(a[-1:], zp.shape[0] - n, axis=0)]
        )[:, None]
        with self._dev_lock:
            self.device_calls += 1
            edited, alpha_org, _ = self.ed.apply_alpha(
                self.walk, zp, ap,
                index=None if index is None else int(index), u8=True,
            )
        return (np.asarray(edited[:n]), np.asarray(alpha_org[:n]))

    def edit(self, req: dict) -> dict:
        z = self._zs(req)
        alpha = req.get("alpha", 1.0)
        a = np.asarray(alpha, np.float32).reshape(-1)
        if a.shape[0] == 1:
            a = np.repeat(a, z.shape[0])
        if a.shape[0] != z.shape[0]:
            raise ValueError("alpha length must be 1 or match the z batch")
        index = req.get("index")
        if self.batcher is not None and z.shape[0] == 1 and index is None:
            # single-sample request: coalesce with concurrent ones into one
            # fixed-width program launch (the chip fills lanes either way —
            # padding rows are pure waste, other users' rows are free)
            img, alpha_org = self.batcher.edit_one(z[0], float(a[0]))
            return {"images": [_png_b64(img)],
                    "alpha_org": [alpha_org.tolist()]}
        imgs, alpha_org = self._edit_batch(z, a, index)
        return {
            "images": [_png_b64(im) for im in imgs],
            "alpha_org": alpha_org.tolist(),
        }

    def sweep(self, req: dict) -> dict:
        z = self._zs(req)
        # a num_panels different from the warmed default is a DIFFERENT
        # program shape: it compiles under the device lock (20-120s at
        # 1024px) and the executable is cached forever. A client must opt
        # in explicitly; otherwise the "no request ever recompiles"
        # invariant holds and the panel-count program space stays bounded.
        p = int(req.get("num_panels", self.num_panels))
        if p != self.num_panels and not bool(req.get("allow_compile")):
            raise ValueError(
                f"num_panels={p} differs from the warmed {self.num_panels}; "
                "a new panel count compiles a new device program — pass "
                '"allow_compile": true to accept the one-time cost'
            )
        if not 1 <= p <= 64:
            raise ValueError(f"num_panels must be 1..64, got {p}")
        lo = float(req.get("min_alpha", self.min_alpha))
        hi = float(req.get("max_alpha", self.max_alpha))
        zp, n = self._pad(z)
        alphas = np.linspace(lo, hi, p)
        panels = np.stack(
            [self.task.scale_test_alpha(a_, zp.shape[0]) for a_ in alphas]
        ).astype(np.float32)
        with self._dev_lock:
            self.device_calls += 1
            # in-graph uint8: 4x smaller device buffers AND device->host fetch
            imgs, alpha_org, _ = self.ed.sweep(self.walk, zp, panels, u8=True)
        # slice the pad rows off ON DEVICE before fetching: only the real
        # [P, n] panels cross the device→host link (same rule as _edit_batch)
        imgs = np.asarray(imgs[:, :n])  # [P, n, H, W, 3] uint8
        return {
            "panels": [
                [_png_b64(imgs[pi, bi]) for bi in range(n)]
                for pi in range(p)
            ],
            "alphas": alphas.tolist(),
            "alpha_org": np.asarray(alpha_org)[:n].tolist(),
        }


def make_server(service: EditService, host: str, port: int):
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    class Handler(BaseHTTPRequestHandler):
        def _reply(self, code: int, obj: dict) -> None:
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):  # noqa: N802 — stdlib API
            if self.path == "/healthz":
                self._reply(200, {
                    "status": "ok",
                    "serve_batch": service.batch,
                    "attr_list": list(service.ed.cfg.attr_list),
                    "size": service.ed.cfg.size,
                    "device_calls": service.device_calls,
                    "micro_batching": service.batcher is not None,
                })
            else:
                self._reply(404, {"error": "unknown path"})

        def do_POST(self):  # noqa: N802 — stdlib API
            try:
                length = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(length) or b"{}")
                if self.path == "/edit":
                    self._reply(200, service.edit(req))
                elif self.path == "/sweep":
                    self._reply(200, service.sweep(req))
                else:
                    self._reply(404, {"error": "unknown path"})
            except ValueError as e:
                self._reply(400, {"error": str(e)})
            except Exception as e:  # noqa: BLE001 — serving boundary
                self._reply(500, {"error": f"{type(e).__name__}: {e}"})

        def log_message(self, fmt, *args):  # quiet access log
            pass

    return ThreadingHTTPServer((host, port), Handler)


def build_service(opt, conf) -> EditService:
    editor, walk_params, info = load_editor_for_inference(opt, conf)

    from ..parallel.spatial import setup_inference_mesh
    from ..tasks.transforms import get_task, task_kwargs_from_options

    editor, walk_params, mesh, sp_ctx = setup_inference_mesh(
        opt, editor, walk_params
    )
    # reusable context: enter once for the server lifetime
    sp_ctx.__enter__()

    task = get_task(conf.transform, walk_type=conf.walk_type,
                    nsliders=len(info["attr_list"]),
                    **task_kwargs_from_options(conf))
    return EditService(
        editor, walk_params, task,
        batch=getattr(opt, "serve_batch", None) or 4,
        num_panels=opt.num_panels,
        min_alpha=opt.min_alpha, max_alpha=opt.max_alpha,
        mesh=mesh,
    )


def main():
    vo = VisOptions()
    vo.parser.add_argument("--port", type=int, default=8642)
    vo.parser.add_argument("--host", type=str, default="127.0.0.1")
    vo.parser.add_argument("--serve_batch", type=int, default=4,
                           help="fixed request-program width; requests pad "
                                "up and slice back so nothing recompiles")
    vo.parser.add_argument("--batch_window_ms", type=float, default=8.0,
                           help="micro-batching window: concurrent "
                                "single-sample /edit requests coalesce into "
                                "one program launch (0 disables)")
    opt, conf = vo.parse()
    service = build_service(opt, conf)
    print("warming the edit/sweep programs ...", flush=True)
    service.warmup()
    if opt.batch_window_ms > 0:
        service.enable_batching(opt.batch_window_ms)
    srv = make_server(service, opt.host, opt.port)
    print(f"serving on http://{opt.host}:{opt.port} "
          f"(batch {service.batch}, {service.ed.cfg.size}px)", flush=True)
    srv.serve_forever()


if __name__ == "__main__":
    main()
