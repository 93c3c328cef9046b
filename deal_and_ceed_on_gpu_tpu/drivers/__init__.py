from . import bp, bp5, step64

__all__ = ["bp", "bp5", "step64"]
