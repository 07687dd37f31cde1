from . import kirk

__all__ = ["kirk"]
