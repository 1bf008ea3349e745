from . import semantics, text, vectors

__all__ = ["semantics", "text", "vectors"]
