from .asof import asof_join

__all__ = ["asof_join"]
