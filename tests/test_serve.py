"""Serving CLI (cli/serve.py): warm fixed-width programs behind HTTP.

Drives the real ThreadingHTTPServer on an ephemeral port with a tiny
editor: health check, /edit and /sweep round-trips (base64 PNGs decode to
the right shapes), pad-and-slice semantics (request batch < serve_batch),
and the 400 path for an oversized batch."""

import base64
import io
import json
import os
import threading
import urllib.request

import numpy as np
import pytest


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    from latent2im_tpu.cli.serve import build_service, make_server
    from latent2im_tpu.config.options import TrainOptions, VisOptions

    tmp_path = tmp_path_factory.mktemp("serve")
    topt = TrainOptions().parse(
        [
            "--model", "stylegan_v2_real", "--transform", "face",
            "--walk_type", "linear", "--attrList", "Smiling",
            "--attrPath", "/root/repo/dataset/attributes_celeba.txt",
            "--models_dir", str(tmp_path / "models"), "--overwrite_config",
            "--dev_tiny", "--resolution", "32",
        ],
        print_opt=True,
    )
    opt_yml = os.path.join(topt.output_dir, "opt.yml")

    vo = VisOptions()
    vo.parser.add_argument("--port", type=int, default=0)
    vo.parser.add_argument("--host", type=str, default="127.0.0.1")
    vo.parser.add_argument("--serve_batch", type=int, default=2)
    opt, conf = vo.parse([opt_yml, "--serve_batch", "2", "--num_panels", "3"])

    service = build_service(opt, conf)
    service.warmup()
    srv = make_server(service, "127.0.0.1", 0)  # ephemeral port
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}", service
    srv.shutdown()


def _post(url, path, obj):
    req = urllib.request.Request(
        url + path, data=json.dumps(obj).encode(),
        headers={"Content-Type": "application/json"},
    )
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def _decode(b64):
    from PIL import Image

    return np.asarray(Image.open(io.BytesIO(base64.b64decode(b64))))


def test_healthz(server):
    url, service = server
    with urllib.request.urlopen(url + "/healthz") as r:
        data = json.loads(r.read())
    assert data["status"] == "ok"
    assert data["serve_batch"] == 2
    assert data["attr_list"] == ["Smiling"]


def test_edit_roundtrip_pads_and_slices(server):
    url, service = server
    z = np.random.RandomState(0).randn(1, service.dim_z).tolist()  # < batch
    code, out = _post(url, "/edit", {"z": z, "alpha": 0.8})
    assert code == 200, out
    assert len(out["images"]) == 1  # sliced back to the request batch
    img = _decode(out["images"][0])
    assert img.shape == (32, 32, 3)
    assert len(out["alpha_org"]) == 1


def test_sweep_roundtrip(server):
    url, service = server
    code, out = _post(url, "/sweep", {"seed": 3, "num_samples": 2})
    assert code == 200, out
    assert len(out["panels"]) == 3  # num_panels
    assert len(out["panels"][0]) == 2
    assert _decode(out["panels"][2][1]).shape == (32, 32, 3)
    assert len(out["alphas"]) == 3


def test_micro_batching_coalesces_concurrent_edits(server):
    """K concurrent single-sample /edit requests must coalesce into fewer
    program launches than requests (ideally ceil(K / serve_batch))."""
    url, service = server
    service.enable_batching(window_ms=150.0)  # wide window: test determinism
    try:
        calls_before = service.device_calls
        results = [None] * 4
        errs = []

        def one(i):
            try:
                z = np.random.RandomState(100 + i).randn(
                    1, service.dim_z
                ).tolist()
                results[i] = _post(url, "/edit", {"z": z, "alpha": 0.5})
            except Exception as e:  # noqa: BLE001
                errs.append(e)

        ts = [threading.Thread(target=one, args=(i,)) for i in range(4)]
        for t in ts:
            t.start()
        for t in ts:
            t.join(timeout=120)
        assert not errs
        for code, out in results:
            assert code == 200, out
            assert len(out["images"]) == 1
            assert _decode(out["images"][0]).shape == (32, 32, 3)
        launches = service.device_calls - calls_before
        # 4 single requests on a serve_batch=2 service: perfect packing = 2
        # launches; the hard guarantee is strictly fewer than 4
        assert launches < 4, f"no coalescing: {launches} launches"
        # distinct z rows must get distinct images (no row mix-up)
        imgs = [np.asarray(_decode(out["images"][0]), int)
                for _, out in results]
        assert any(np.abs(imgs[0] - im).max() > 0 for im in imgs[1:])
    finally:
        service.batcher = None  # later tests use the direct path


def test_oversized_batch_is_400(server):
    url, service = server
    z = np.zeros((5, service.dim_z)).tolist()
    code, out = _post(url, "/edit", {"z": z, "alpha": 0.5})
    assert code == 400
    assert "serve_batch" in out["error"]


def test_bad_z_dim_is_400(server):
    url, service = server
    code, out = _post(url, "/edit", {"z": [[0.0] * 7], "alpha": 0.5})
    assert code == 400
    assert "dim" in out["error"]
