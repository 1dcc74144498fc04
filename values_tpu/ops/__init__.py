from . import aggregation, losses, metrics, uncertainty, window

__all__ = ["aggregation", "losses", "metrics", "uncertainty", "window"]
