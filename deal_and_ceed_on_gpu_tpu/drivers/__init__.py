from . import bp5, step64

__all__ = ["bp5", "step64"]
