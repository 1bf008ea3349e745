from . import asof, dedup, smoothers, topk, windows

__all__ = ["asof", "dedup", "smoothers", "topk", "windows"]
