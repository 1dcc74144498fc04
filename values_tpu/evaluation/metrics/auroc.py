"""OoD detection: AUROC over aggregated uncertainty scores + detection rate
within the top-50% acquisition (reference: evaluation/metrics/auroc.py).

Toy fallback keeps the reference's hardcoded rule (samples with numeric id
<= 20 are OoD, :17-23, 21 OoD samples total); LIDC/GTA use the first-cycle
splits' unlabeled pools.
"""
from __future__ import annotations

import json
from pathlib import Path
from typing import Optional

import numpy as np
from sklearn.metrics import auc, roc_curve

from ..experiment_dataloader import ExperimentDataloader
from ..sorting import sort_uncertainties
from ..split_file_generation.second_cycle import (
    get_aggregated_uncertainties, get_samples_to_query,
    get_splits_first_cycle)


def is_ood_toy(sample: str) -> bool:
    return not int(sample.split(".")[0]) > 20


def is_ood_split(sample, splits, fold: int = 0) -> Optional[bool]:
    id_pool = splits[fold]["id_unlabeled_pool"]
    if len(id_pool) and isinstance(id_pool[0], tuple):
        id_pool = [image[0] for image in id_pool]
    ood_pool = splits[fold]["ood_unlabeled_pool"]
    if len(ood_pool) and isinstance(ood_pool[0], tuple):
        ood_pool = [image[0] for image in ood_pool]
    if sample in id_pool:
        return False
    if sample in ood_pool:
        return True
    print(f"Could not find sample {sample}!")
    return None


def is_ood(sample, splits=None, fold: int = 0):
    if splits is None:
        return is_ood_toy(sample)
    return is_ood_split(sample, splits, fold)


def get_ood_detection_rate(samples_to_query, splits=None,
                           fold: int = 0) -> float:
    samples_to_query = [f"{s.split('.')[0]}.npy" for s in samples_to_query]
    ood = sum(1 for s in samples_to_query
              if is_ood(sample=s, splits=splits, fold=fold))
    if splits is None:
        num_ood_samples = 21  # toy hardcode kept (auroc.py:67-73)
    else:
        num_ood_samples = len(splits[fold]["ood_unlabeled_pool"])
    return ood / num_ood_samples


def get_auroc_input(uncertainties, aggregation, splits=None, fold: int = 0):
    y_labels, unc_scores = [], []
    for sample, unc in uncertainties.items():
        sample = f"{sample.split('.')[0]}.npy"
        flag = is_ood(sample=sample, splits=splits, fold=fold)
        if flag is None:
            print(f"Error for sample {sample}!")
            continue
        y_labels.append(1 if flag else 0)
        unc_scores.append(unc[aggregation]["max_score"])
    return y_labels, unc_scores


def ood_detection(exp_dataloader: ExperimentDataloader,
                  base_splits_path=None) -> None:
    base_splits_path = (Path(base_splits_path)
                        if base_splits_path is not None else None)
    shift = exp_dataloader.exp_version.version_params.get("shift")
    fold = exp_dataloader.exp_version.version_params.get("fold", 0)
    ood_det_dict = {"mean": {}}
    for unc, aggregated_unc_path in (
            exp_dataloader.get_aggregated_unc_files_dict().items()):
        ood_det_dict["mean"][unc] = {}
        for aggregation in exp_dataloader.exp_version.aggregations:
            splits = (get_splits_first_cycle(base_splits_path, shift=shift)
                      if base_splits_path is not None else None)
            uncertainties = get_aggregated_uncertainties(aggregated_unc_path)
            sorted_uncertainties = sort_uncertainties(uncertainties,
                                                      aggregation)
            samples_to_query = get_samples_to_query(sorted_uncertainties, 0.5)
            ood_detection_rate = get_ood_detection_rate(
                samples_to_query=samples_to_query, splits=splits, fold=fold)
            y_true, y_score = get_auroc_input(
                uncertainties=uncertainties, aggregation=aggregation,
                splits=splits, fold=fold)
            fpr, tpr, _ = roc_curve(y_true, y_score)
            roc_auc = auc(fpr, tpr)
            ood_det_dict["mean"][unc][aggregation] = {"metrics": {
                "ood_detection_rate": ood_detection_rate,
                "auroc": float(roc_auc)}}
            with open(exp_dataloader.exp_version.exp_path /
                      "ood_detection.json", "w") as f:
                json.dump(ood_det_dict, f, indent=4)
