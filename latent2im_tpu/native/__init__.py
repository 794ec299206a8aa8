"""Loader shim for the native extension (built from native/l2i_native.cpp).

Import `_l2i_native` from here; builds lazily on first use if a compiler is
present, else raises ImportError so callers fall back to pure Python.
"""

from __future__ import annotations

import glob
import os
import subprocess
import sys

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)


def _find_so():
    # installed form first (setup.py builds _l2i_native_ext INTO the package),
    # then the source-checkout in-place build under repo-root native/
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    hits = glob.glob(os.path.join(pkg_dir, "_l2i_native*.so")) + glob.glob(
        os.path.join(_NATIVE_DIR, "_l2i_native*.so")
    )
    return hits[0] if hits else None


def _load():
    so = _find_so()
    if so is None:
        # try a one-time in-place build (cheap, idempotent)
        try:
            subprocess.run(
                [sys.executable, os.path.join(_NATIVE_DIR, "setup.py")],
                cwd=_NATIVE_DIR,
                check=True,
                capture_output=True,
                timeout=300,
            )
        except Exception as e:  # no compiler / headers: fall back
            raise ImportError(f"native build failed: {e}") from e
        so = _find_so()
        if so is None:
            raise ImportError("native build produced no _l2i_native*.so")
    import importlib.util

    spec = importlib.util.spec_from_file_location("_l2i_native", so)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


_mod = _load()


class _Wrapper:
    """numpy-facing wrappers over the raw byte APIs."""

    Loader = _mod.Loader
    load_resize_raw = staticmethod(_mod.load_resize)
    imgrid_raw = staticmethod(_mod.imgrid_raw)

    @staticmethod
    def imgrid(imarray, cols: int, pad: int):
        import numpy as np

        n, h, w, c = imarray.shape
        raw, gh, gw = _mod.imgrid_raw(imarray.tobytes(), n, h, w, c, cols, pad)
        return np.frombuffer(raw, np.uint8).reshape(gh, gw, c)

    @staticmethod
    def load_resize(path: str, size: int):
        import numpy as np

        raw = _mod.load_resize(path, size)
        return np.frombuffer(raw, np.uint8).reshape(size, size, 3)


_l2i_native = _Wrapper()
