from .experiment import Experiment, TrainState
from .loops import fit
from .checkpoint import (save_checkpoint, load_checkpoint,
                         load_any_checkpoint)

__all__ = ["Experiment", "TrainState", "fit", "save_checkpoint",
           "load_checkpoint", "load_any_checkpoint"]
