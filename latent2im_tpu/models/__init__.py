from . import stylegan2

__all__ = ["stylegan2"]
