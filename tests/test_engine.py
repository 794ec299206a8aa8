"""Engine tests: editor surface, losses, and the multi-chip train step on the
virtual 8-device CPU mesh — walk params must actually move and losses drop on
a learnable toy objective."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from latent2im_tpu.engine import losses as L
from latent2im_tpu.engine.editor import Editor, EditorConfig, clip_ims
from latent2im_tpu.engine.train import (
    make_optimizer,
    make_train_step,
    sample_epoch_z,
    train_loop,
)
from latent2im_tpu.models import resnet as rn
from latent2im_tpu.models import stylegan2 as sg2
from latent2im_tpu.models import vgg as vggm
from latent2im_tpu.parallel import mesh as meshlib
from latent2im_tpu.tasks.transforms import get_task
from latent2im_tpu.walks import init_walk

TINY_CHANNELS = {4: 16, 8: 16, 16: 8, 32: 8}
SIZE = 32
STYLE_DIM = 32


def _tiny_resnet_like(key, n_out=40):
    """A small stand-in regressor with the resnet50 call signature is too
    costly to build here; use the real resnet50 but at tiny input — it works
    at 32px because of global average pooling."""
    return rn.init_resnet50(key, num_outputs=n_out)


@pytest.fixture(scope="module")
def editor():
    key = jax.random.PRNGKey(0)
    kg, kd, kr, kv = jax.random.split(key, 4)
    g = sg2.init_generator(kg, SIZE, style_dim=STYLE_DIM, n_mlp=2, channels=TINY_CHANNELS)
    d = sg2.init_discriminator(kd, SIZE, channels=TINY_CHANNELS)
    r = _tiny_resnet_like(kr)
    v = vggm.init_vgg(kv, "vgg19")
    cfg = EditorConfig(
        attr_list=("Smiling",),
        attr_idx=(31,),
        size=SIZE,
        dim_z=STYLE_DIM,
        walk_kind="linear_w",
    )
    return Editor(cfg, g, reg_params=r, vgg_params=v, d_params=d)


def test_bce_matches_reference_formula():
    pred = jnp.asarray([0.3, 0.9, 1.5, -0.2])  # raw regressor outputs, unbounded
    y = jnp.asarray([1.0, 0.0, 1.0, 0.0])
    got = float(L.raw_bce(pred, y))
    eps = 1e-12
    p = np.asarray(pred)
    want = -np.mean(
        np.asarray(y) * np.log(np.clip(p, eps, None))
        + (1 - np.asarray(y)) * np.log(np.clip(1 - p, eps, None))
    )
    np.testing.assert_allclose(got, want, rtol=1e-4)  # TPU log differs ~3e-5


def test_loss_combination_gating():
    r, c, g = 1.0, 2.0, 3.0
    assert L.combine(r, c, g) == pytest.approx(10 * r + 0.05 * c + 0.05 * g)
    assert L.combine(r, c, g, no_content_loss=True) == pytest.approx(10 * r + 0.05 * g)
    # stylegan: bare reg only when BOTH dropped
    assert L.combine(r, c, g, no_content_loss=True, no_gan_loss=True) == pytest.approx(r)
    # pggan: bare reg when EITHER dropped
    assert L.combine(r, c, g, no_content_loss=True, pggan_gating=True) == pytest.approx(
        r + 0.05 * g
    )


def test_unified_alphas_modes(editor):
    org = jnp.asarray([[0.8], [0.2]])
    sampled = jnp.asarray([[0.5], [0.9]])
    t, d = editor.unified_alphas(org, sampled)
    np.testing.assert_allclose(np.asarray(t), np.asarray(sampled))
    np.testing.assert_allclose(np.asarray(d), np.asarray(sampled - org))

    import dataclasses

    ed2 = Editor(
        dataclasses.replace(editor.cfg, alpha_mode="delta"),
        editor.g_params,
        editor.reg_params,
        editor.vgg_params,
        editor.d_params,
    )
    t2, d2 = ed2.unified_alphas(org, sampled)
    np.testing.assert_allclose(np.asarray(t2), np.clip(np.asarray(org + sampled), 0, 1))
    np.testing.assert_allclose(np.asarray(t2 - org), np.asarray(d2))


def test_apply_alpha_roundtrip(editor):
    walk = init_walk(
        jax.random.PRNGKey(5), "linear_w", STYLE_DIM, editor.cfg.n_latent, ["Smiling"]
    )
    z = np.random.RandomState(0).randn(2, STYLE_DIM).astype(np.float32)
    edited, alpha_org, orig = editor.apply_alpha(walk, z, np.full((2, 1), 0.9))
    assert edited.shape == (2, SIZE, SIZE, 3)
    assert alpha_org.shape == (2, 1)
    assert orig.shape == (2, SIZE, SIZE, 3)
    u8 = clip_ims(edited)
    assert u8.dtype == np.uint8
    # u8=True converts in-graph with the exact to_uint8 semantics — the
    # serving fetch path (cli/serve.py _edit_batch) relies on value parity
    edited8, alpha_org8, orig8 = editor.apply_alpha(
        walk, z, np.full((2, 1), 0.9), u8=True
    )
    assert edited8.dtype == jnp.uint8 and orig8.dtype == jnp.uint8
    np.testing.assert_array_equal(np.asarray(edited8), u8)
    np.testing.assert_array_equal(np.asarray(orig8), clip_ims(orig))
    np.testing.assert_allclose(np.asarray(alpha_org8), np.asarray(alpha_org))


def test_sweep_panels(editor):
    walk = init_walk(
        jax.random.PRNGKey(5), "linear_w", STYLE_DIM, editor.cfg.n_latent, ["Smiling"]
    )
    z = np.random.RandomState(0).randn(2, STYLE_DIM).astype(np.float32)
    panels = np.linspace(0, 1, 5)[:, None] * np.ones((5, 2))  # [P, B]
    imgs, alpha_org, orig = editor.sweep(walk, z, panels)
    assert imgs.shape == (5, 2, SIZE, SIZE, 3)
    # different panel alphas must give different images
    assert not np.allclose(np.asarray(imgs[0]), np.asarray(imgs[-1]))


def test_sweep_matches_apply_alpha_and_chunking(editor):
    """The flattened-batch sweep must agree panel-for-panel with apply_alpha
    (same delta-to-target semantics), and the chunked synthesis path — which
    pads the flattened [P*B] stack up to a chunk multiple — must agree with
    the single-call path."""
    walk = init_walk(
        jax.random.PRNGKey(5), "linear_w", STYLE_DIM, editor.cfg.n_latent, ["Smiling"]
    )
    z = np.random.RandomState(1).randn(2, STYLE_DIM).astype(np.float32)
    alphas = np.linspace(0, 1, 3)
    panels = alphas[:, None] * np.ones((3, 2), np.float32)  # [P, B]
    imgs, alpha_org, orig = editor.sweep(walk, z, panels)
    for p, a in enumerate(alphas):
        edited, ao, og = editor.apply_alpha(walk, z, np.full((2, 1), a, np.float32))
        np.testing.assert_allclose(np.asarray(imgs[p]), np.asarray(edited),
                                   atol=1e-5, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(alpha_org), np.asarray(ao),
                                   atol=1e-6)
    # chunk=4 over P*B=6 -> 2 chunks with 2 pad rows discarded
    imgs_c, _, _ = editor.sweep(walk, z, panels, chunk=4)
    np.testing.assert_allclose(np.asarray(imgs_c), np.asarray(imgs),
                               atol=1e-5, rtol=1e-5)


def test_sweep_u8_matches_host_conversion(editor):
    """sweep(u8=True)'s in-graph uint8 conversion must be BIT-identical to
    the host-side to_uint8 of the f32 sweep (same clip + truncate), through
    both the single-call and the chunked host-dispatched synthesis paths —
    and to_uint8 must pass uint8 input through unchanged (idempotence)."""
    from latent2im_tpu.utils.image import to_uint8

    walk = init_walk(
        jax.random.PRNGKey(5), "linear_w", STYLE_DIM, editor.cfg.n_latent, ["Smiling"]
    )
    z = np.random.RandomState(2).randn(2, STYLE_DIM).astype(np.float32)
    panels = np.linspace(0, 1, 3)[:, None] * np.ones((3, 2), np.float32)
    f32, ao_f, orig_f = editor.sweep(walk, z, panels)
    u8, ao_u, _ = editor.sweep(walk, z, panels, u8=True)
    assert np.asarray(u8).dtype == np.uint8
    np.testing.assert_array_equal(np.asarray(u8), to_uint8(f32))
    np.testing.assert_array_equal(to_uint8(np.asarray(u8)), to_uint8(f32))
    np.testing.assert_allclose(np.asarray(ao_u), np.asarray(ao_f), atol=1e-6)
    u8_c, _, _ = editor.sweep(walk, z, panels, chunk=4, u8=True)
    np.testing.assert_array_equal(np.asarray(u8_c), np.asarray(u8))


def test_train_step_single_device(editor):
    task = get_task("face")
    walk = init_walk(
        jax.random.PRNGKey(7), "linear_w", STYLE_DIM, editor.cfg.n_latent, ["Smiling"]
    )
    opt = make_optimizer(1e-3)
    state = opt.init(walk)
    step = make_train_step(editor, task, opt)
    z = jnp.asarray(sample_epoch_z(4, STYLE_DIM, seed=0))
    w0 = np.asarray(walk["w"]).copy()
    walk, state, metrics = step(walk, state, z, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    assert not np.allclose(np.asarray(walk["w"]), w0), "walk params did not move"


def test_train_step_multichip_matches_single_device(editor):
    """The property that makes data parallelism CORRECT (SURVEY §5.8): the
    8-device sharded step must produce the same loss and the same walk-param
    update as the unsharded step on the identical global batch and key — the
    reference's single-GPU loop semantics (train.py:48-116) are the ground
    truth. Two steps, so optimizer-state divergence is caught too."""
    if jax.device_count() < 8:
        pytest.skip("needs 8 devices (virtual CPU mesh)")
    task = get_task("face")
    opt = make_optimizer(1e-3)
    z = sample_epoch_z(16, STYLE_DIM, seed=0)

    def run(mesh):
        walk = init_walk(
            jax.random.PRNGKey(7), "linear_w", STYLE_DIM,
            editor.cfg.n_latent, ["Smiling"],
        )
        state = opt.init(walk)
        if mesh is not None:
            walk = meshlib.replicate(mesh, walk)
            state = meshlib.replicate(mesh, state)
        step = make_train_step(editor, task, opt, mesh=mesh)
        losses = []
        for i in range(2):
            zb = meshlib.shard_batch(mesh, z) if mesh is not None else jnp.asarray(z)
            walk, state, metrics = step(walk, state, zb, jax.random.PRNGKey(i))
            losses.append(float(metrics["loss"]))
        return np.asarray(jax.device_get(walk)["w"]), losses

    w_single, loss_single = run(None)
    w_mesh, loss_mesh = run(meshlib.make_mesh(8))
    np.testing.assert_allclose(loss_mesh, loss_single, rtol=2e-4)
    np.testing.assert_allclose(w_mesh, w_single, rtol=1e-4, atol=1e-6)


def test_train_step_tensor_parallel_matches_single_device(editor):
    """dp x tp over a 2-D ('data','model') mesh: G weights/activations shard
    over 'model' (Megatron column/row per block, meshlib.stylegan2_tp_specs)
    and GSPMD inserts the per-block psums — the step must still produce the
    single-device loss and walk update exactly (same ground truth as the DP
    test)."""
    if jax.device_count() < 8:
        pytest.skip("needs 8 devices (virtual CPU mesh)")
    task = get_task("face")
    opt = make_optimizer(1e-3)
    z = sample_epoch_z(8, STYLE_DIM, seed=0)

    def run(mesh):
        walk = init_walk(
            jax.random.PRNGKey(7), "linear_w", STYLE_DIM,
            editor.cfg.n_latent, ["Smiling"],
        )
        state = opt.init(walk)
        fr_sh = None
        if mesh is not None:
            walk = meshlib.replicate(mesh, walk)
            state = meshlib.replicate(mesh, state)
            fr_sh = meshlib.frozen_tp_shardings(mesh, editor.frozen_params())
        step = make_train_step(editor, task, opt, mesh=mesh,
                               frozen_shardings=fr_sh)
        losses = []
        for i in range(2):
            zb = (meshlib.shard_batch(mesh, z) if mesh is not None
                  else jnp.asarray(z))
            walk, state, metrics = step(walk, state, zb, jax.random.PRNGKey(i))
            losses.append(float(metrics["loss"]))
        return np.asarray(jax.device_get(walk)["w"]), losses

    w_single, loss_single = run(None)
    w_tp, loss_tp = run(meshlib.make_mesh_2d(n_data=2, n_model=4))
    np.testing.assert_allclose(loss_tp, loss_single, rtol=2e-4)
    np.testing.assert_allclose(w_tp, w_single, rtol=1e-4, atol=1e-6)


def test_shard_batch_uneven_pads_or_raises():
    if jax.device_count() < 8:
        pytest.skip("needs 8 devices (virtual CPU mesh)")
    mesh = meshlib.make_mesh(8)
    z = sample_epoch_z(10, STYLE_DIM, seed=1)
    with pytest.raises(ValueError, match="does not divide"):
        meshlib.shard_batch(mesh, z)
    zb = meshlib.shard_batch(mesh, z, pad=True)
    assert zb.shape[0] == meshlib.pad_to_devices(10, 8) == 16
    got = np.asarray(jax.device_get(zb))
    np.testing.assert_allclose(got[:10], z)
    np.testing.assert_allclose(got[10:], np.repeat(z[-1:], 6, axis=0))


def test_train_loop_smoke(editor):
    task = get_task("face")
    walk = init_walk(
        jax.random.PRNGKey(7), "linear_w", STYLE_DIM, editor.cfg.n_latent, ["Smiling"]
    )
    logs = []
    walk, history = train_loop(
        editor,
        task,
        walk,
        num_samples=8,
        batch_size=4,
        n_epochs=1,
        lr=1e-3,
        log_every=1,
        on_step=lambda e, i, m, dt, wp: logs.append(m),
    )
    assert len(history) == 2
    assert all(np.isfinite(h) for h in history)


def test_remat_g_step_matches_plain_step(editor):
    """cfg.remat_g only changes the backward's memory schedule — one step
    must produce identical losses and walk updates."""
    import dataclasses

    task = get_task("face")
    walk = init_walk(jax.random.PRNGKey(9), "linear_w", STYLE_DIM,
                     editor.cfg.n_latent, ["Smiling"])
    opt = make_optimizer(1e-3)
    z = jnp.asarray(np.random.RandomState(0).randn(4, STYLE_DIM), jnp.float32)
    key = jax.random.PRNGKey(4)

    results = {}
    # (remat_g, remat_towers) grid: towers alone and composed with block
    # remat — the 1024px production config is ("block", True)
    for remat, towers in ((False, False), (True, False), ("block", False),
                          (False, True), ("block", True)):
        ed = Editor(dataclasses.replace(editor.cfg, remat_g=remat,
                                        remat_towers=towers),
                    editor.g_params, reg_params=editor.reg_params,
                    vgg_params=editor.vgg_params, d_params=editor.d_params)
        step = make_train_step(ed, task, opt)
        w2, _, m = step(jax.tree_util.tree_map(jnp.copy, walk),
                        opt.init(walk), z, key)
        results[(remat, towers)] = (float(m["loss"]), np.asarray(w2["w"]))
    from helpers import assert_close

    # strict on CPU; TPU's bf16x3 matmul recompute may reorder rounding
    base = results[(False, False)]
    for k, got in results.items():
        if k == (False, False):
            continue
        assert_close(np.asarray([base[0]]), np.asarray([got[0]]),
                     rtol=1e-5, atol=1e-7)
        assert_close(base[1], got[1], rtol=1e-4, atol=1e-7)


def test_content_input_size_step(editor):
    """cfg.content_input_size resizes BOTH images before the VGG content
    loss only: at the generator resolution it is a no-op (bit-identical
    step); at half resolution the content term changes while reg/gan terms
    (full-res images) are untouched."""
    import dataclasses

    task = get_task("face")
    walk = init_walk(jax.random.PRNGKey(11), "linear_w", STYLE_DIM,
                     editor.cfg.n_latent, ["Smiling"])
    opt = make_optimizer(1e-3)
    z = jnp.asarray(np.random.RandomState(2).randn(4, STYLE_DIM), jnp.float32)
    key = jax.random.PRNGKey(6)

    def run(cis):
        ed = Editor(dataclasses.replace(editor.cfg, content_input_size=cis),
                    editor.g_params, reg_params=editor.reg_params,
                    vgg_params=editor.vgg_params, d_params=editor.d_params)
        step = make_train_step(ed, task, opt)
        w2, _, m = step(jax.tree_util.tree_map(jnp.copy, walk),
                        opt.init(walk), z, key)
        return {k: float(m[k]) for k in
                ("loss", "reg_loss", "content_loss", "gan_loss")}, w2

    plain, w_plain = run(None)
    noop, w_noop = run(SIZE)  # resize to own size short-circuits
    assert plain == noop
    np.testing.assert_array_equal(np.asarray(w_plain["w"]),
                                  np.asarray(w_noop["w"]))
    half, _ = run(SIZE // 2)
    assert all(np.isfinite(v) for v in half.values())
    assert half["reg_loss"] == plain["reg_loss"]
    assert half["gan_loss"] == plain["gan_loss"]
    assert half["content_loss"] != plain["content_loss"]


def test_content_input_resizes_like_reg_input(editor):
    """Editor._content_input mirrors _reg_input's bilinear semantics."""
    import dataclasses

    from latent2im_tpu.engine.editor import _bilinear_resize

    ed = Editor(dataclasses.replace(editor.cfg, content_input_size=16),
                editor.g_params, reg_params=editor.reg_params,
                vgg_params=editor.vgg_params, d_params=editor.d_params)
    img = jax.random.normal(jax.random.PRNGKey(1), (2, SIZE, SIZE, 3))
    np.testing.assert_allclose(
        np.asarray(ed._content_input(img)),
        np.asarray(_bilinear_resize(img, 16, 16)), rtol=1e-6, atol=1e-6)
    # no-op when already at size
    small = jax.random.normal(jax.random.PRNGKey(2), (2, 16, 16, 3))
    assert ed._content_input(small) is small


def test_train_loop_dsprites_subset_host_alpha_fallback():
    """A dsprites --attrList subset the device sampler can't express must
    fall back to host-numpy alpha sampling (train_loop probes the sampler),
    not hard-error (VERDICT r2 Weak #7)."""
    key = jax.random.PRNGKey(3)
    kg, kr, kw = jax.random.split(key, 3)
    g = sg2.init_generator(kg, SIZE, style_dim=STYLE_DIM, n_mlp=2,
                           channels=TINY_CHANNELS)
    cfg = EditorConfig(
        attr_list=("scale", "posx"), attr_idx=(0, 3), size=SIZE,
        dim_z=STYLE_DIM, walk_kind="linear_w",
        no_content_loss=True, no_gan_loss=True,
    )
    ed = Editor(cfg, g, reg_params=_tiny_resnet_like(kr, n_out=5))
    task = get_task("dsprites")
    walk = init_walk(kw, "linear_w", STYLE_DIM, cfg.n_latent,
                     ["scale", "posx"])
    walk, history = train_loop(
        ed, task, walk, num_samples=4, batch_size=2, n_epochs=1, lr=1e-3,
        log_every=1,
    )
    assert len(history) == 2
    assert all(np.isfinite(h) for h in history)


def test_epoch_z_matches_reference_rng():
    """Reference: np.random.RandomState(seed).randn (graph_util.py:5-8)."""
    z = sample_epoch_z(4, 8, seed=3)
    want = np.random.RandomState(3).randn(4, 8).astype(np.float32)
    np.testing.assert_allclose(z, want)


def test_tower_swap_reissues_frozen_device_copy():
    """Rebinding a tower (eval.py/vis_w.py `editor.g_params = g_new` on
    --save_path_gan) must invalidate the cached device copy — the jitted
    inference paths would otherwise keep editing with the OLD generator. The
    cache also retains the host trees it was keyed on so a freed tree's id()
    can't be reused to fake a hit."""
    key = jax.random.PRNGKey(7)
    kg, kg2, kr = jax.random.split(key, 3)
    g = sg2.init_generator(kg, SIZE, style_dim=STYLE_DIM, n_mlp=2,
                           channels=TINY_CHANNELS)
    r = _tiny_resnet_like(kr)
    cfg = EditorConfig(attr_list=("Smiling",), attr_idx=(31,), size=SIZE,
                       dim_z=STYLE_DIM, walk_kind="linear_w")
    ed = Editor(cfg, g, reg_params=r)
    walk = init_walk(jax.random.PRNGKey(5), "linear_w", STYLE_DIM,
                     cfg.n_latent, ["Smiling"])
    z = np.random.RandomState(0).randn(2, STYLE_DIM).astype(np.float32)
    alpha = np.full((2, 1), 0.9, np.float32)

    out1, _, _ = ed.apply_alpha(walk, z, alpha)
    cache1 = ed._frozen_dev_cache
    assert cache1[1][0] is g  # retains the host tree it was keyed on

    ed.g_params = sg2.init_generator(kg2, SIZE, style_dim=STYLE_DIM, n_mlp=2,
                                     channels=TINY_CHANNELS)
    out2, _, _ = ed.apply_alpha(walk, z, alpha)
    assert ed._frozen_dev_cache is not cache1  # re-issued, not served stale
    assert not np.allclose(np.asarray(out1), np.asarray(out2))
