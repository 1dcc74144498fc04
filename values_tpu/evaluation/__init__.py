from .experiment_version import ExperimentVersion
from .experiment_dataloader import ExperimentDataloader
from .eval_experiments import EvalExperiments, deep_update

__all__ = ["ExperimentVersion", "ExperimentDataloader", "EvalExperiments",
           "deep_update"]
