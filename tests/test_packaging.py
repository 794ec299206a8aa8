"""Packaging (VERDICT r4 item 7): the framework installs as a library —
pyproject.toml metadata, console entry points, and the optional native
extension folded into the wheel (setup.py OptionalBuildExt).

The reference has nothing here (PYTHONPATH scripts only); a framework should.
"""

import os
import subprocess
import sys
import sysconfig

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

ENTRY_POINTS = [
    "l2i-train", "l2i-train-multi", "l2i-vis", "l2i-eval",
    "l2i-bp", "l2i-serve", "l2i-train-regressor", "l2i-parity-check",
]


@pytest.mark.slow
def test_wheel_install_and_entry_points(tmp_path):
    """Build the wheel offline (--no-build-isolation), install into a scratch
    --target, and check: package importable, all 8 console scripts generated,
    native extension compiled INTO the package and loadable."""
    target = str(tmp_path / "pkg")
    subprocess.run(
        [sys.executable, "-m", "pip", "install", "--quiet", "--no-deps",
         "--no-build-isolation", "--target", target, REPO],
        check=True, timeout=600,
    )
    bin_dir = os.path.join(target, "bin")
    for ep in ENTRY_POINTS:
        assert os.path.isfile(os.path.join(bin_dir, ep)), ep

    probe = (
        "import sys; sys.path.insert(0, %r); "
        "import latent2im_tpu; "
        "from latent2im_tpu.config.options import TrainOptions; "
        "from latent2im_tpu.native import _l2i_native; "
        "from latent2im_tpu.config.attributes import default_attr_path; "
        "assert latent2im_tpu.__file__.startswith(%r), latent2im_tpu.__file__; "
        "p = default_attr_path('face'); "
        "assert p.startswith(%r), p; "
        "assert sum(1 for l in open(p) if l.strip()) == 40, p; "
        "print('ok')" % (target, target, target)
    )
    out = subprocess.run(
        [sys.executable, "-c", probe], capture_output=True, text=True,
        timeout=120, env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )
    assert out.returncode == 0, out.stderr
    assert "ok" in out.stdout

    so = [f for f in os.listdir(os.path.join(target, "latent2im_tpu", "native"))
          if f.endswith(".so")]
    assert so, "native extension missing from the installed package"
    # vocabulary data ships INSIDE the package — never as a top-level
    # site-packages 'dataset' dir that could collide with other dists
    assert not os.path.isdir(os.path.join(target, "dataset"))


def test_attr_vocab_copies_in_sync():
    """The packaged vocabulary files (latent2im_tpu/dataset/) must stay
    byte-identical to the reference-layout repo-root dataset/ copies."""
    for name in ("attributes_celeba.txt", "attributes_scene.txt"):
        root = open(os.path.join(REPO, "dataset", name), "rb").read()
        pkg = open(
            os.path.join(REPO, "latent2im_tpu", "dataset", name), "rb"
        ).read()
        assert root == pkg, f"{name}: repo-root and packaged copies differ"


def test_console_script_help():
    """The editable-installed entry point parses --help (argparse wiring)."""
    scripts = sysconfig.get_path("scripts")
    exe = os.path.join(scripts, "l2i-train")
    if not os.path.isfile(exe):
        pytest.skip("editable install not present (pip install -e .)")
    out = subprocess.run(
        [exe, "--help"], capture_output=True, text=True, timeout=120,
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )
    assert out.returncode == 0, out.stderr
    assert "--walk_type" in out.stdout
