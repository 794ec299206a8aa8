"""Build the native extension in place:

    python native/setup.py build_ext --inplace

Produces _l2i_native*.so next to this file; latent2im_tpu/native/__init__.py
loads it from here (pure-Python fallbacks engage when it is absent).
"""

import os

from setuptools import Extension, setup

here = os.path.dirname(os.path.abspath(__file__))

setup(
    name="l2i_native",
    ext_modules=[
        Extension(
            "_l2i_native",
            sources=[os.path.join(here, "l2i_native.cpp")],
            libraries=["jpeg", "png", "z"],
            extra_compile_args=["-O3", "-std=c++17", "-pthread"],
            extra_link_args=["-pthread"],
        )
    ],
    script_args=["build_ext", "--inplace"],
)
