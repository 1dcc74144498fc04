from .carrier import VolumeCarrier
from .engine import SlidingWindowEngine
from .predictors import make_predictor, stack_params

__all__ = ["VolumeCarrier", "SlidingWindowEngine", "make_predictor",
           "stack_params"]
