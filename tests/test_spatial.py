"""Spatial partitioning (sp): H-axis activation sharding over a 'spatial'
mesh axis (parallel/spatial.py).

Equivalence is the contract: a synthesis spatially partitioned over the
virtual 8-device mesh must bit-track the single-device run (GSPMD inserts
the 3x3 halo exchanges; the math is unchanged). Additive vs the reference
(single-GPU, SURVEY §2.9).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from latent2im_tpu.engine.editor import Editor, EditorConfig
from latent2im_tpu.models import resnet as rn
from latent2im_tpu.models import hooks as sph
from latent2im_tpu.models import stylegan2 as sg2
from latent2im_tpu.parallel import spatial as sp
from latent2im_tpu.parallel import mesh as meshlib
from latent2im_tpu.walks import init_walk

# every test here builds an 8-device (data x spatial) mesh; on the real
# single-chip TPU run (L2I_TEST_TPU=1) they must skip, not fail
pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 devices (virtual CPU mesh)"
)

TINY = {4: 16, 8: 16, 16: 8, 32: 8, 64: 8}


def _tiny_g(size=32):
    key = jax.random.PRNGKey(0)
    return sg2.init_generator(key, size, style_dim=32, n_mlp=2, channels=TINY)


def _tiny_editor():
    key = jax.random.PRNGKey(0)
    kg, kr, kw = jax.random.split(key, 3)
    g = sg2.init_generator(kg, 32, style_dim=32, n_mlp=2, channels=TINY)
    cfg = EditorConfig(size=32, dim_z=32, walk_kind="linear_w",
                       attr_list=("Smiling",), attr_idx=(31,))
    ed = Editor(cfg, g, reg_params=rn.init_resnet50(kr, num_outputs=40))
    walk = init_walk(kw, "linear_w", 32, cfg.n_latent, ["Smiling"])
    return ed, walk


def _latent(g, batch=2):
    z = np.random.RandomState(1).randn(batch, 32).astype(np.float32)
    w = sg2.style_forward(g, jnp.asarray(z))
    nl = 2 * len(g["to_rgbs"]) + 2
    return jnp.repeat(w[:, None, :], nl, axis=1)


def test_synthesize_spatial_equals_single_device():
    g = _tiny_g()
    latent = _latent(g)
    ref = np.asarray(jax.jit(sg2.synthesize)(g, latent))

    mesh = sp.make_mesh_spatial(n_spatial=4, n_data=2)
    with sp.spatial_partitioning(mesh, min_rows_per_device=2):
        out = np.asarray(jax.jit(sg2.synthesize)(g, latent))
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=2e-5)


def test_spatial_hint_actually_partitions():
    """The compiled program must contain cross-device halo collectives —
    proof the constraint partitioned the convs rather than being folded
    into a replicated layout. The unhinted warm-up trace first makes this
    a regression test for the stale-trace-cache hazard: JAX's jaxpr cache
    keys on (fn, avals), not on the hint global, so without the context's
    cache clear a same-shape unhinted program would be silently reused."""
    g = _tiny_g()
    latent = _latent(g)
    jax.jit(sg2.synthesize)(g, latent)  # poison the (fn, avals) trace cache
    mesh = sp.make_mesh_spatial(n_spatial=8, n_data=1)
    with sp.spatial_partitioning(mesh, min_rows_per_device=2):
        txt = (
            jax.jit(sg2.synthesize)
            .lower(g, latent)
            .compile()
            .as_text()
        )
    assert ("collective-permute" in txt) or ("all-gather" in txt) or (
        "all-to-all" in txt
    ), "no cross-device collectives in the spatially-hinted program"


def test_hint_restored_and_token_bumped():
    mesh = sp.make_mesh_spatial(n_spatial=4, n_data=2)
    t0 = sph.spatial_token()
    ctx = sp.spatial_partitioning(mesh)
    with ctx:
        t_in = sph.spatial_token()
        assert t_in != t0
        assert sph._HINT is not None
    # the hint restores; the token only ever increments so no two installs
    # can alias a jit-cache key
    assert sph.spatial_token() not in (t0, t_in)
    assert sph._HINT is None
    # the context object is REUSABLE (spatial_editor hands it to callers who
    # may open it once per batch loop) — a second with-block must work
    with ctx:
        assert sph._HINT is not None
    assert sph._HINT is None


def test_make_mesh_spatial_validates_device_count():
    import pytest

    with pytest.raises(ValueError, match="devices"):
        sp.make_mesh_spatial(n_spatial=16, n_data=2)  # 32 > 8 virtual devs
    with pytest.raises(ValueError, match="spatial"):
        sp.make_mesh_spatial(n_spatial=1, n_data=2)


def test_pggan_synthesis_spatial_equals_single_device():
    """The sp hook is shared across generator families: the pggan forward
    under the hint must match single-device (same contract as stylegan2)."""
    from latent2im_tpu.models import pggan

    g = pggan.init_generator(jax.random.PRNGKey(3))
    z = jnp.asarray(  # dim_z = 502: the label embedding pads z to 512
        np.random.RandomState(4).randn(2, 502).astype(np.float32)
    )
    step = 4  # 64px — enough rows for a 4-way spatial axis
    ref = np.asarray(jax.jit(
        lambda zz: pggan.generator_forward(g, zz, step=step)
    )(z))

    mesh = sp.make_mesh_spatial(n_spatial=4, n_data=2)
    with sp.spatial_partitioning(mesh, min_rows_per_device=2):
        out = np.asarray(jax.jit(
            lambda zz: pggan.generator_forward(g, zz, step=step)
        )(z))
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=2e-5)


def test_stylegan1_and_zoo_spatial_equal_single_device():
    """The hook also covers the StyleGAN1 (model.py) and hub GAN-zoo PGAN
    generator families."""
    from latent2im_tpu.models import pgan_zoo, stylegan1

    mesh = sp.make_mesh_spatial(n_spatial=4, n_data=2)

    g1 = stylegan1.init_styled_generator(jax.random.PRNGKey(5), code_dim=32,
                                         n_mlp=2)
    z1 = jnp.asarray(np.random.RandomState(6).randn(2, 32).astype(np.float32))
    noise = [
        jnp.asarray(
            np.random.RandomState(10 + i).randn(2, 4 * 2**i, 4 * 2**i, 1)
            .astype(np.float32)
        )
        for i in range(5)
    ]
    f1 = lambda zz: stylegan1.styled_generator_forward(  # noqa: E731
        g1, zz, noise=noise, step=4
    )
    ref1 = np.asarray(jax.jit(f1)(z1))
    with sp.spatial_partitioning(mesh, min_rows_per_device=2):
        out1 = np.asarray(jax.jit(f1)(z1))
    np.testing.assert_allclose(out1, ref1, atol=3e-5, rtol=3e-5)

    gz = pgan_zoo.init_generator(jax.random.PRNGKey(7), dim_latent=32,
                                 depths=(16, 16, 8, 8))
    zz0 = jnp.asarray(np.random.RandomState(8).randn(2, 32).astype(np.float32))
    fz = lambda zz: pgan_zoo.generator_forward(gz, zz)  # noqa: E731
    refz = np.asarray(jax.jit(fz)(zz0))
    with sp.spatial_partitioning(mesh, min_rows_per_device=2):
        outz = np.asarray(jax.jit(fz)(zz0))
    np.testing.assert_allclose(outz, refz, atol=3e-5, rtol=3e-5)


def test_vis_w_sp_devices_cli(tmp_path):
    """vis_w --sp_devices 4 --n_devices 2 (a 2x4 data x spatial mesh)
    produces the same panels as the single-device run (uint8 within 1)."""
    import os

    from latent2im_tpu.cli.vis_w import run as vis_run
    from latent2im_tpu.config.options import TrainOptions, VisOptions
    from PIL import Image

    models_dir = str(tmp_path / "models")
    topt = TrainOptions().parse(
        [
            "--model", "stylegan_v2_real", "--transform", "face",
            "--walk_type", "linear", "--attrList", "Smiling",
            "--attrPath", "/root/repo/dataset/attributes_celeba.txt",
            "--models_dir", models_dir, "--overwrite_config",
            "--dev_tiny", "--resolution", "32",
        ],
        print_opt=True,
    )
    opt_yml = os.path.join(topt.output_dir, "opt.yml")

    outs = {}
    for tag, extra in {
        "single": [],
        "sp": ["--n_devices", "2", "--sp_devices", "4"],
    }.items():
        vopt, conf = VisOptions().parse(
            [opt_yml, "--output_dir", str(tmp_path / f"vis_{tag}"),
             "--num_samples", "2", "--num_panels", "3"] + extra
        )
        out_dir = vis_run(vopt, conf)
        pngs = sorted(f for f in os.listdir(out_dir) if f.endswith(".png"))
        assert len(pngs) == 2
        outs[tag] = [
            np.asarray(Image.open(os.path.join(out_dir, f))) for f in pngs
        ]
    for a, b in zip(outs["single"], outs["sp"]):
        assert a.shape == b.shape
        assert np.max(np.abs(a.astype(int) - b.astype(int))) <= 1


def test_train_cli_sp_devices(tmp_path):
    """cli.train --sp_devices 4 --n_devices 2: one tiny epoch trains on the
    2x4 (data x spatial) mesh with finite losses and a moved walk."""
    import os

    from latent2im_tpu.cli.train import run as train_run
    from latent2im_tpu.config.options import TrainOptions

    opt = TrainOptions().parse(
        [
            "--model", "stylegan_v2_real", "--transform", "face",
            "--num_samples", "8", "--learning_rate", "1e-3",
            "--walk_type", "linear", "--loss", "l2", "--attrList", "Smiling",
            "--attrPath", "/root/repo/dataset/attributes_celeba.txt",
            "--models_dir", str(tmp_path / "models"), "--overwrite_config",
            "--dev_tiny", "--resolution", "32", "--n_epochs", "1",
            "--batch_size", "2", "--n_devices", "2", "--sp_devices", "4",
        ],
        print_opt=True,
    )
    walk, history = train_run(opt)
    assert len(history) > 0 and all(np.isfinite(h) for h in history)
    assert np.abs(np.asarray(walk["w"])).max() > 0
    assert os.path.isfile(
        os.path.join(opt.output_dir, "model_w_1_final_walk_module.ckpt")
    )
    # the context must have been exited cleanly
    assert sph._HINT is None


def test_serve_service_under_sp():
    """EditService with the sp mesh policy: build_service enters the
    (reusable) spatial context for the service lifetime; edit + sweep work
    and slice back to the request batch."""
    from latent2im_tpu.cli.serve import EditService
    from latent2im_tpu.tasks.transforms import get_task

    ed, walk = _tiny_editor()
    mesh = sp.make_mesh_spatial(n_spatial=4, n_data=2)
    ed_m, walk_m, ctx = sp.spatial_editor(ed, walk, mesh,
                                          min_rows_per_device=2)
    ctx.__enter__()
    try:
        svc = EditService(ed_m, walk_m, get_task("face"), batch=2,
                          num_panels=3, min_alpha=0.0, max_alpha=1.0,
                          mesh=mesh)
        out = svc.edit({"seed": 1, "num_samples": 1, "alpha": 0.7})
        assert len(out["images"]) == 1
        out = svc.sweep({"seed": 2, "num_samples": 2})
        assert len(out["panels"]) == 3 and len(out["panels"][0]) == 2
    finally:
        ctx.__exit__(None, None, None)
    assert sph._HINT is None


def test_eval_report_sp_equals_single(tmp_path):
    """cli.eval with --sp_devices 4 produces the identical report."""
    import json
    import os

    import pytest

    from latent2im_tpu.cli.eval import run as eval_run
    from latent2im_tpu.config.options import TrainOptions, VisOptions

    pytest.importorskip("yaml")
    models_dir = str(tmp_path / "models")
    topt = TrainOptions().parse(
        [
            "--model", "stylegan_v2_real", "--transform", "face",
            "--walk_type", "linear", "--attrList", "Smiling",
            "--attrPath", "/root/repo/dataset/attributes_celeba.txt",
            "--models_dir", models_dir, "--overwrite_config",
            "--dev_tiny", "--resolution", "32",
        ],
        print_opt=True,
    )
    opt_yml = os.path.join(topt.output_dir, "opt.yml")

    reports = {}
    for tag, extra in {"single": [], "sp": ["--sp_devices", "4"]}.items():
        vo = VisOptions()
        vo.parser.add_argument("--facenet_path", type=str, default="")
        vo.parser.add_argument("--ref_parity", action="store_true")
        eopt, econf = vo.parse(
            [opt_yml, "--output_dir", str(tmp_path / f"eval_{tag}"),
             "--num_samples", "6"] + extra
        )
        reports[tag] = eval_run(eopt, econf)
        data = json.load(
            open(tmp_path / f"eval_{tag}" / "eval_report.json")
        )
        assert data["results"]["Smiling"]["bucket_counts"] is not None

    r1, rs = reports["single"]["Smiling"], reports["sp"]["Smiling"]
    assert r1["bucket_counts"] == rs["bucket_counts"]
    for k in ("identity_preservation", "attribute_preservation"):
        for b1, b2 in zip(r1[k], rs[k]):
            if np.isnan(b1):
                assert np.isnan(b2)
            else:
                assert abs(b1 - b2) < 2e-4, (k, r1[k], rs[k])


def test_train_step_spatial_matches_single_device():
    """dp x sp over a ('data','spatial') mesh: the FULL walk-train step
    (2x G fwd + R + VGG + D fwd + bwd) traced under the hint — forward AND
    backward convs spatially partitioned, with_sharding_constraint transposes
    through the VJP — must reproduce the single-device loss and walk update
    (the same ground truth as the dp / dp+tp tests in test_engine.py).

    SGD instead of Adam: the update is LINEAR in the gradient, so a tight
    tolerance proves gradient parity. (Adam's first step is ~±lr*sign(g);
    halo-exchange reassociation noise of ~1e-7 flips signs of near-zero
    gradient elements and turns into O(lr) param noise — observed, and not
    a correctness signal.)"""
    import optax
    import pytest

    from latent2im_tpu.engine.train import make_train_step, sample_epoch_z
    from latent2im_tpu.models import vgg as vggm
    from latent2im_tpu.tasks.transforms import get_task

    if jax.device_count() < 8:
        pytest.skip("needs 8 devices (virtual CPU mesh)")
    key = jax.random.PRNGKey(0)
    kg, kr, kv, kd = jax.random.split(key, 4)
    g = sg2.init_generator(kg, 32, style_dim=32, n_mlp=2, channels=TINY)
    d = sg2.init_discriminator(kd, 32, channels=TINY)
    cfg = EditorConfig(size=32, dim_z=32, walk_kind="linear_w",
                       attr_list=("Smiling",), attr_idx=(31,))
    ed = Editor(cfg, g, reg_params=rn.init_resnet50(kr, num_outputs=40),
                vgg_params=vggm.init_vgg(kv, "vgg19"), d_params=d)
    task = get_task("face")
    opt = optax.sgd(1e-3)
    z = sample_epoch_z(8, 32, seed=0)

    def run(mesh, ctx, editor=ed):
        walk = init_walk(jax.random.PRNGKey(7), "linear_w", 32,
                         cfg.n_latent, ["Smiling"])
        state = opt.init(walk)
        if mesh is not None:
            walk = meshlib.replicate(mesh, walk)
            state = meshlib.replicate(mesh, state)
        with ctx:
            step = make_train_step(editor, task, opt, mesh=mesh)
            losses = []
            for i in range(2):
                zb = (meshlib.shard_batch(mesh, z) if mesh is not None
                      else jnp.asarray(z))
                walk, state, m = step(walk, state, zb, jax.random.PRNGKey(i))
                losses.append(float(m["loss"]))
        return np.asarray(jax.device_get(walk)["w"]), losses

    import contextlib
    import dataclasses

    w_1, loss_1 = run(None, contextlib.nullcontext())
    mesh = sp.make_mesh_spatial(n_spatial=4, n_data=2)
    w_m, loss_m = run(mesh, sp.spatial_partitioning(mesh,
                                                    min_rows_per_device=2))
    np.testing.assert_allclose(loss_m, loss_1, rtol=2e-4)
    np.testing.assert_allclose(w_m, w_1, rtol=1e-4, atol=1e-6)

    # per-block remat under the same dp x sp mesh: jax.checkpoint'ed blocks
    # carry with_sharding_constraint hints INSIDE the rematted region, and
    # their backward re-runs under GSPMD — must still match single-device
    ed_block = Editor(dataclasses.replace(cfg, remat_g="block"), g,
                      reg_params=ed.reg_params, vgg_params=ed.vgg_params,
                      d_params=d)
    w_b, loss_b = run(mesh, sp.spatial_partitioning(mesh,
                                                    min_rows_per_device=2),
                      editor=ed_block)
    np.testing.assert_allclose(loss_b, loss_1, rtol=2e-4)
    np.testing.assert_allclose(w_b, w_1, rtol=1e-4, atol=1e-6)


def test_editor_sweep_spatial_equals_single_device():
    """The full vis sweep path (get_w + orig + regress + panel synthesis)
    under dp x sp: 2-way data over the batch, 4-way spatial over rows."""
    key = jax.random.PRNGKey(0)
    kg, kr, kw = jax.random.split(key, 3)
    g = sg2.init_generator(kg, 32, style_dim=32, n_mlp=2, channels=TINY)
    cfg = EditorConfig(size=32, dim_z=32, walk_kind="linear_w",
                       attr_list=("Smiling",), attr_idx=(31,))
    ed = Editor(cfg, g, reg_params=rn.init_resnet50(kr, num_outputs=40))
    walk = init_walk(kw, "linear_w", 32, cfg.n_latent, ["Smiling"])

    z = np.random.RandomState(0).randn(2, 32).astype(np.float32)
    panels = np.linspace(0, 1, 3)[:, None] * np.ones((3, 2), np.float32)
    imgs_1, ao_1, orig_1 = ed.sweep(walk, z, panels)

    mesh = sp.make_mesh_spatial(n_spatial=4, n_data=2)
    ed_m, walk_m, ctx = sp.spatial_editor(ed, walk, mesh,
                                          min_rows_per_device=2)
    z_sh = meshlib.shard_batch(mesh, z)
    with ctx:
        imgs_m, ao_m, orig_m = ed_m.sweep(walk_m, z_sh, panels)

    np.testing.assert_allclose(np.asarray(imgs_m), np.asarray(imgs_1),
                               atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(ao_m), np.asarray(ao_1), atol=1e-5)
    np.testing.assert_allclose(np.asarray(orig_m), np.asarray(orig_1),
                               atol=2e-5, rtol=2e-5)
