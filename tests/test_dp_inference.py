"""Data-parallel inference/eval (VERDICT r3 item 6): sweeps and eval reports
sharded over the virtual 8-device mesh must equal the single-device run.

Additive vs the reference (single-GPU, SURVEY §2.9): replicate_editor
replicates the frozen towers + walk, shard_batch(pad=True) shards z, and jit
propagates the argument shardings through every Editor program.
"""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from latent2im_tpu.engine.editor import Editor, EditorConfig
from latent2im_tpu.models import resnet as rn
from latent2im_tpu.models import stylegan2 as sg2
from latent2im_tpu.parallel import mesh as meshlib
from latent2im_tpu.walks import init_walk

TINY = {4: 16, 8: 16, 16: 8, 32: 8}


def _tiny():
    key = jax.random.PRNGKey(0)
    kg, kr, kw = jax.random.split(key, 3)
    g = sg2.init_generator(kg, 32, style_dim=32, n_mlp=2, channels=TINY)
    cfg = EditorConfig(size=32, dim_z=32, walk_kind="linear_w",
                       attr_list=("Smiling",), attr_idx=(31,))
    ed = Editor(cfg, g, reg_params=rn.init_resnet50(kr, num_outputs=40))
    walk = init_walk(kw, "linear_w", 32, cfg.n_latent, ["Smiling"])
    return ed, walk


def test_sweep_sharded_equals_single_device():
    ed, walk = _tiny()
    z = np.random.RandomState(0).randn(6, 32).astype(np.float32)  # pads to 8
    panels = (np.linspace(0, 1, 3)[:, None] * np.ones((3, 8), np.float32))

    mesh = meshlib.make_mesh(8)
    ed_m, walk_m = meshlib.replicate_editor(ed, walk, mesh)
    z_sh = meshlib.shard_batch(mesh, z, pad=True)
    imgs_m, ao_m, orig_m = ed_m.sweep(walk_m, z_sh, panels)

    imgs_1, ao_1, orig_1 = ed.sweep(
        walk, z, np.ascontiguousarray(panels[:, :6])
    )
    np.testing.assert_allclose(np.asarray(imgs_m)[:, :6], np.asarray(imgs_1),
                               atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(ao_m)[:6], np.asarray(ao_1),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(orig_m)[:6], np.asarray(orig_1),
                               atol=2e-5, rtol=2e-5)


@pytest.mark.slow
def test_eval_report_mesh_equals_single(tmp_path):
    """cli.eval with --n_devices 8 produces the identical report."""
    from latent2im_tpu.cli.eval import run as eval_run
    from latent2im_tpu.config.options import TrainOptions, VisOptions

    models_dir = str(tmp_path / "models")
    topt = TrainOptions().parse(
        [
            "--model", "stylegan_v2_real", "--transform", "face",
            "--walk_type", "linear", "--attrList", "Smiling",
            "--attrPath", "/root/repo/dataset/attributes_celeba.txt",
            "--models_dir", models_dir, "--overwrite_config",
            "--dev_tiny", "--resolution", "32",
        ],
        print_opt=True,  # the print path writes opt.yml
    )
    opt_yml = os.path.join(topt.output_dir, "opt.yml")
    assert os.path.isfile(opt_yml)

    reports = {}
    for n_dev in (1, 8):
        vo = VisOptions()
        vo.parser.add_argument("--facenet_path", type=str, default="")
        vo.parser.add_argument("--ref_parity", action="store_true")
        eopt, econf = vo.parse(
            [opt_yml, "--output_dir", str(tmp_path / f"eval{n_dev}"),
             "--num_samples", "6", "--n_devices", str(n_dev)]
        )
        reports[n_dev] = eval_run(eopt, econf)
        data = json.load(open(tmp_path / f"eval{n_dev}" / "eval_report.json"))
        assert data["results"]["Smiling"]["bucket_counts"] is not None

    r1, r8 = reports[1]["Smiling"], reports[8]["Smiling"]
    assert r1["bucket_counts"] == r8["bucket_counts"]
    for k in ("identity_preservation", "attribute_preservation"):
        for b1, b8 in zip(r1[k], r8[k]):
            if np.isnan(b1):
                assert np.isnan(b8)
            else:
                assert abs(b1 - b8) < 2e-4, (k, r1[k], r8[k])
