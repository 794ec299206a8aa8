"""Package build — metadata lives in pyproject.toml; this file only adds the
OPTIONAL native extension (native/l2i_native.cpp: libjpeg/libpng decode,
threaded prefetch loader, imgrid). The extension builds into the package as
``latent2im_tpu.native._l2i_native_ext``; if the toolchain or image headers
are missing the build warns and proceeds — every native call site has a
pure-Python fallback, and ``latent2im_tpu/native/__init__.py`` can still
lazy-build in a source checkout.
"""

import os

from setuptools import Extension, setup
from setuptools.command.build_ext import build_ext

here = os.path.dirname(os.path.abspath(__file__))


class OptionalBuildExt(build_ext):
    """Build the native extension best-effort: a missing compiler or image
    library must not block installing the (fully functional) Python package."""

    def run(self):
        try:
            super().run()
        except Exception as e:  # noqa: BLE001
            self._warn(e)

    def build_extension(self, ext):
        try:
            super().build_extension(ext)
        except Exception as e:  # noqa: BLE001
            self._warn(e)

    @staticmethod
    def _warn(e):
        print(
            f"WARNING: native extension build failed ({e}); installing with "
            "pure-Python fallbacks (image decode/grid run on PIL/numpy)"
        )


setup(
    ext_modules=[
        Extension(
            "latent2im_tpu.native._l2i_native_ext",
            sources=[os.path.join("native", "l2i_native.cpp")],
            libraries=["jpeg", "png", "z"],
            extra_compile_args=["-O3", "-std=c++17", "-pthread"],
            extra_link_args=["-pthread"],
            optional=True,
        )
    ],
    cmdclass={"build_ext": OptionalBuildExt},
)
