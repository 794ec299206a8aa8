"""Reverse walk export: walks trained here -> the reference's pickled
``*_walk_module.ckpt`` format (transform_base.py:492-505) -> re-imported
through the torch-checkpoint reader -> identical params and identical edit.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from latent2im_tpu.io.torch_convert import (  # noqa: E402
    convert_walk_state,
    export_walk_torch,
    load_walk_checkpoint,
)
from latent2im_tpu.walks import init_walk
from latent2im_tpu.walks.walks import apply_walk

DIM = 32
ATTRS = ["Smiling", "Young"]

EXPECTED_CLS = {
    "linear_w": "WalkLinearMultiW",
    "mlp_w": "WalkMlpMultiW",
    "nn_w": "WalkNonLinearW",
    "mlp_z": "WalkMlpMultiZ",
    "linear_z_dir": "WalkLinear",
    "embed": "WalkEmbed",
    "linear_z_free": "WalkLinearZ_free",
    "linear_z": "WalkLinearZ",
    "mlp_z_norm": "WalkMlpZ2",
    "mlp_z3": "WalkMlpZ3",
}


def _trees_equal(a, b):
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-7)


@pytest.mark.parametrize("kind", sorted(EXPECTED_CLS))
def test_export_roundtrip(kind, tmp_path):
    attrs = ATTRS if kind in ("linear_w", "linear_z_dir", "embed",
                              "linear_z_free") else ATTRS[:1]
    walk = init_walk(jax.random.PRNGKey(0), kind, DIM, 6, attrs)
    path = str(tmp_path / "model_w_3_final_walk_module.ckpt")
    export_walk_torch(path, kind, walk, attr_list=attrs)

    cls, state = load_walk_checkpoint(path)
    assert cls == EXPECTED_CLS[kind]
    back = convert_walk_state(cls, state, attrs)
    _trees_equal(back, walk)

    # identical edit through the re-imported params
    z = np.random.RandomState(0).randn(2, DIM).astype(np.float32)
    latent = (jnp.asarray(np.random.RandomState(1).randn(2, 6, DIM),
                          jnp.float32)
              if kind in ("linear_w", "mlp_w", "nn_w") else jnp.asarray(z))
    alpha = jnp.asarray(np.full((2, len(attrs)), 0.7, np.float32))
    kw = {"index": 1} if kind == "embed" else {}
    out_a = apply_walk(kind, walk, latent, alpha, **kw)
    out_b = apply_walk(kind, back, latent, alpha, **kw)
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b),
                               atol=1e-6)


def test_exported_pickle_carries_reference_class_path(tmp_path):
    """The pickle must reference the reference package's qualified class
    name so torch.load in the reference environment resolves the REAL
    class."""
    import zipfile

    walk = init_walk(jax.random.PRNGKey(0), "linear_w", DIM, 6, ATTRS)
    path = str(tmp_path / "w_walk_module.ckpt")
    export_walk_torch(path, "linear_w", walk, attr_list=ATTRS)

    with zipfile.ZipFile(path) as zf:
        names = [n for n in zf.namelist() if n.endswith("data.pkl")]
        blob = zf.read(names[0])
    assert b"graphs.stylegan_v2_real.transform_base" in blob
    assert b"WalkLinearMultiW" in blob
