from . import losses, metrics, uncertainty

__all__ = ["losses", "metrics", "uncertainty"]
