"""Compat-layer test: reference-style call sequence runs unchanged."""

import numpy as np

from latent2im_tpu.compat import batch_input, find_model_using_name
from latent2im_tpu.walks import REGISTRY, apply_walk, init_walk


def test_batch_input():
    gi = {"z": np.arange(10).reshape(5, 2), "meta": "x"}
    out = batch_input(gi, slice(1, 3))
    assert out["z"].shape == (2, 2)
    assert out["meta"] == "x"


def test_new_z_walk_variants():
    import jax

    for kind in ("linear_z_dir", "mlp_z_norm"):
        p = init_walk(jax.random.PRNGKey(0), kind, 16, 1, ["a", "b"])
        z = jax.random.normal(jax.random.PRNGKey(1), (3, 16))
        al = np.full((3, 2), 0.5, np.float32)
        out = apply_walk(kind, p, z, al)
        assert out.shape == z.shape
    # mlp_z_norm delta: norm == 3 * alpha
    import jax.numpy as jnp

    p = init_walk(jax.random.PRNGKey(0), "mlp_z_norm", 16, 1, ["a"])
    z = jax.random.normal(jax.random.PRNGKey(1), (2, 16))
    out = apply_walk("mlp_z_norm", p, z, jnp.full((2, 1), 0.5))
    norms = np.linalg.norm(np.asarray(out - z), axis=-1)
    np.testing.assert_allclose(norms, 1.5, rtol=1e-4)


def test_reference_style_call_sequence(tmp_path):
    """The reference train-loop body (train.py:48-108), verbatim shape."""
    factory = find_model_using_name("stylegan_v2_real", "face")
    g = factory(
        attrList="Smiling",
        attrPath="/root/repo/dataset/attributes_celeba.txt",
        walk_type="linear",
        dev_tiny=True,
        resolution=32,
        no_gan_loss=True,
        no_content_loss=True,
    )
    zs = np.random.RandomState(0).randn(2, g.dim_z).astype(np.float32)
    inputs = batch_input({"z": zs}, slice(0, 2))

    w = g.get_w(inputs["z"])
    out_zs = g.get_logits({"w": w})
    alpha_org = g.get_reg_preds(out_zs)
    ag, at, _ = g.get_train_alpha(zs, N_attr=len(g.attrList))
    target, epsilon = g.get_alphas(alpha_org, ag)
    w_new = g.get_w_new_tensor(w, epsilon)
    transformed = g.get_logits({"w": w_new})
    assert transformed.shape == out_zs.shape
    assert not np.allclose(np.asarray(transformed), np.asarray(out_zs))

    edited, a_org, orig = g.apply_alpha({"z": zs}, np.full((2, 1), 0.9))
    assert edited.shape == (2, 32, 32, 3)
    u8 = g.clip_ims(edited)
    assert u8.dtype == np.uint8

    path = str(tmp_path / "model_w_0")
    g.save_multi_models(path)
    g.load_multi_models(path + "_walk_module.ckpt")
