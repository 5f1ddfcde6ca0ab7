from .numeric import dsum, davg

__all__ = ["dsum", "davg"]
