from . import upfirdn2d as upfirdn2d_mod  # module alias (the fn below shadows the name)
from .fused_act import SQRT2, fused_leaky_relu
from .upfirdn2d import (
    blur2d,
    downsample2d,
    make_kernel,
    upfirdn2d,
    upfirdn2d_ref,
    upsample2d,
)

__all__ = [
    "SQRT2",
    "fused_leaky_relu",
    "make_kernel",
    "upfirdn2d",
    "upfirdn2d_ref",
    "upsample2d",
    "downsample2d",
    "blur2d",
]
