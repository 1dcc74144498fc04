"""``_target_``-driven object instantiation (Hydra-compatible subset).

The reference instantiates models, datamodules, loggers, optimizers and eval
task functions from config nodes carrying a ``_target_`` dotted path
(reference: uncertainty_modeling/main.py:64-83,
uncertainty_modeling/lightning_experiment.py:63-68,
evaluation/eval_experiments.py:55-91). Checkpoints embed those reference
module paths in their hyper_parameters, so :data:`TARGET_ALIASES` maps the
reference's import paths onto this framework's equivalents — a converted
reference checkpoint instantiates the JAX model without editing its config.
"""
from __future__ import annotations

import functools
import importlib
from typing import Any, Dict

from .node import Config

# reference import path -> values_tpu import path
TARGET_ALIASES: Dict[str, str] = {
    # models (C0)
    "uncertainty_modeling.models.unet3D_module.UNet3D":
        "values_tpu.models.unet3d.UNet3D",
    "uncertainty_modeling.models.ssn_unet3D_module.SsnUNet3D":
        "values_tpu.models.ssn_unet3d.SsnUNet3D",
    "uncertainty_modeling.models.hrnet_module.get_seg_model":
        "values_tpu.models.hrnet.get_seg_model",
    # datamodules (L1)
    "uncertainty_modeling.toy_datamodule_3D.ToyDataModule3D":
        "values_tpu.data.toy_datamodule.ToyDataModule3D",
    "uncertainty_modeling.lidc_idri_datamodule_3D.LidcIdriDataModule3D":
        "values_tpu.data.lidc_datamodule.LidcIdriDataModule3D",
    "uncertainty_modeling.data.torch_dataloader.BaseDataModule":
        "values_tpu.data.base_datamodule.BaseDataModule",
    "uncertainty_modeling.data.cityscapes_dataset.Cityscapes_dataset":
        "values_tpu.data.cityscapes_dataset.CityscapesDataset",
    # augmentations
    "uncertainty_modeling.augmentations.StochasticLabelSwitches":
        "values_tpu.data.augment2d.StochasticLabelSwitches",
    # training-side infra: loggers / progress bars map to our loggers
    "pytorch_lightning.loggers.TensorBoardLogger":
        "values_tpu.training.tb_logging.TensorBoardLogger",
    "pytorch_lightning.callbacks.TQDMProgressBar":
        "values_tpu.training.tb_logging.ProgressBar",
    # optimizers / schedulers -> optax-backed factories
    "torch.optim.SGD": "values_tpu.training.optim.sgd",
    "torch.optim.Adam": "values_tpu.training.optim.adam",
    "torch.optim.RMSprop": "values_tpu.training.optim.rmsprop",
    "torch.optim.lr_scheduler.PolynomialLR":
        "values_tpu.training.optim.polynomial_lr",
    "torch.optim.lr_scheduler.ReduceLROnPlateau":
        "values_tpu.training.optim.reduce_lr_on_plateau",
    # eval task functions (keep reference paths working in eval configs)
    "evaluation.uncertainty_aggregation.aggregate_uncertainties.aggregate_uncertainties":
        "values_tpu.evaluation.aggregate_uncertainties.aggregate_uncertainties",
    "evaluation.uncertainty_aggregation.aggregate_uncertainties.patch_level_aggregation":
        "values_tpu.evaluation.aggregate_uncertainties.patch_level_aggregation",
    "evaluation.uncertainty_aggregation.aggregate_uncertainties.image_level_aggregation":
        "values_tpu.evaluation.aggregate_uncertainties.image_level_aggregation",
    "evaluation.uncertainty_aggregation.aggregate_uncertainties.threshold_aggregation":
        "values_tpu.evaluation.aggregate_uncertainties.threshold_aggregation",
    "evaluation.uncertainty_aggregation.find_threshold.get_foreground_quantile":
        "values_tpu.evaluation.find_threshold.get_foreground_quantile",
    "evaluation.uncertainty_aggregation.find_threshold.save_foreground_quantiles":
        "values_tpu.evaluation.find_threshold.save_foreground_quantiles",
    "evaluation.uncertainty_aggregation.find_threshold.threshold_images_paths":
        "values_tpu.evaluation.find_threshold.threshold_images_paths",
    "evaluation.uncertainty_aggregation.find_threshold.find_threshold":
        "values_tpu.evaluation.find_threshold.find_threshold",
    "evaluation.metrics.auroc.ood_detection":
        "values_tpu.evaluation.metrics.auroc.ood_detection",
    "evaluation.metrics.aurc.main": "values_tpu.evaluation.metrics.aurc.main",
    "evaluation.metrics.ace.main": "values_tpu.evaluation.metrics.ace.main",
    "evaluation.metrics.ncc.main": "values_tpu.evaluation.metrics.ncc.main",
    "evaluation.metrics.al_improvement.main":
        "values_tpu.evaluation.metrics.al_improvement.main",
    "evaluation.split_file_generation.split_files_second_cycle.generate_split_file":
        "values_tpu.evaluation.split_file_generation.second_cycle.generate_split_file",
    "evaluation.split_file_generation.split_files_second_cycle_random.generate_split_file":
        "values_tpu.evaluation.split_file_generation.second_cycle_random.generate_split_file",
}


def locate(path: str) -> Any:
    """Import a dotted path, applying reference->values_tpu aliases."""
    path = TARGET_ALIASES.get(path, path)
    parts = path.split(".")
    for split in range(len(parts) - 1, 0, -1):
        module_name = ".".join(parts[:split])
        try:
            module = importlib.import_module(module_name)
        except ImportError:
            continue
        obj: Any = module
        try:
            for attr in parts[split:]:
                obj = getattr(obj, attr)
        except AttributeError:
            continue
        return obj
    raise ImportError(f"Could not locate '{path}'")


def instantiate(node: Any, *args: Any, **kwargs: Any) -> Any:
    """Instantiate a config node carrying ``_target_``.

    Supports ``_partial_: true`` (returns functools.partial) and recursive
    instantiation of nested ``_target_`` nodes, matching hydra.utils
    defaults (_recursive_=True) as used throughout the reference.
    """
    if node is None:
        return None
    if not isinstance(node, dict):
        return node
    if "_target_" not in node:
        return {k: instantiate(v) for k, v in node.items()}

    node = dict(node)
    target = node.pop("_target_")
    partial = bool(node.pop("_partial_", False))
    recursive = bool(node.pop("_recursive_", True))
    node.pop("_convert_", None)

    fn = locate(str(target))
    call_kwargs = {}
    for key, val in node.items():
        if recursive and isinstance(val, dict) and "_target_" in val:
            call_kwargs[key] = instantiate(val)
        elif isinstance(val, Config):
            call_kwargs[key] = val.to_container()
        elif isinstance(val, list):
            call_kwargs[key] = [
                v.to_container() if isinstance(v, Config) else v for v in val
            ]
        else:
            call_kwargs[key] = val
    call_kwargs.update(kwargs)
    if partial:
        return functools.partial(fn, *args, **call_kwargs)
    return fn(*args, **call_kwargs)
