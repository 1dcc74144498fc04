"""Subprocess driver: execute the REFERENCE's composed inference + eval
pipeline (reference: test_3D.py:625-701, evaluation/*) on CPU under the
dependency shims in this directory, at float64.

Usage: python run_reference_pipeline.py <jobspec.json>

The job spec drives N inference runs (`run_test`) followed by the eval
task chain (threshold finding -> aggregation -> OoD/failure/calibration/
ambiguity). Torch device requests for "cuda" are redirected to CPU
(the reference hardcodes .to("cuda") in predict_cases/calculate_metrics).
"""
import json
import os
import sys
from argparse import Namespace
from pathlib import Path

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(os.path.dirname(HERE))


def setup_paths(ref_root: str) -> None:
    sys.path.insert(0, REPO)  # values_tpu (the medpy shim uses its nifti)
    sys.path.insert(0, HERE)  # dependency shims
    sys.path.insert(0, ref_root)
    sys.path.insert(0, os.path.join(ref_root, "uncertainty_modeling"))
    sys.path.insert(0, os.path.join(ref_root, "evaluation"))


def patch_cuda_to_cpu() -> None:
    import torch

    def remap(x):
        return "cpu" if x == "cuda" else x

    orig_tensor_to = torch.Tensor.to

    def tensor_to(self, *args, **kwargs):
        args = tuple(remap(a) for a in args)
        if "device" in kwargs:
            kwargs["device"] = remap(kwargs["device"])
        return orig_tensor_to(self, *args, **kwargs)

    orig_module_to = torch.nn.Module.to

    def module_to(self, *args, **kwargs):
        args = tuple(remap(a) for a in args)
        if "device" in kwargs:
            kwargs["device"] = remap(kwargs["device"])
        return orig_module_to(self, *args, **kwargs)

    torch.Tensor.to = tensor_to
    torch.nn.Module.to = module_to


def run_inference(spec: dict) -> None:
    import test_3D
    for job in spec.get("inference", []):
        args = Namespace(
            checkpoint_paths=job["checkpoint_paths"],
            data_input_dir=job.get("data_input_dir"),
            save_dir=job.get("save_dir"),
            exp_name=job.get("exp_name"),
            test_data_dir=None,
            subject_ids=None,
            n_pred=job.get("n_pred", 1),
            n_reference_samples=job.get("n_reference_samples", 5),
            test_batch_size=job.get("test_batch_size", 12),
            test_split=job["test_split"],
            tta=job.get("tta", False),
        )
        test_3D.run_test(args)


def deep_merge(dst: dict, src: dict) -> dict:
    for k, v in src.items():
        if isinstance(v, dict) and isinstance(dst.get(k), dict):
            deep_merge(dst[k], v)
        else:
            dst[k] = v
    return dst


def run_eval(spec: dict) -> None:
    ev = spec.get("eval")
    if not ev:
        return
    from experiment_version import ExperimentVersion
    from evaluation.experiment_dataloader import ExperimentDataloader
    from evaluation.uncertainty_aggregation import (aggregate_uncertainties
                                                    as agg_mod)
    from evaluation.uncertainty_aggregation import find_threshold as ft
    from evaluation.metrics import ace, aurc, auroc, ncc

    aggregations = ev["aggregations"]
    versions = {}
    for v in ev["versions"]:
        versions[v["pred_model"]] = ExperimentVersion(
            base_path=Path(v["base_path"]),
            naming_scheme_version=v.get("naming_scheme_version",
                                        "{version}"),
            pred_model=v["pred_model"],
            image_ending=".nii.gz",
            unc_ending=".nii.gz",
            unc_types=v["unc_types"],
            aggregations=list(aggregations.keys()),
            n_reference_segs=v.get("n_reference_segs", 3),
            naming_scheme_pred_model=v.get("naming_scheme_pred_model",
                                           "{pred_model}"),
            seed=v.get("seed", 123),
            fold=v.get("fold", 0),
            version=v.get("version", "0"),
        )

    base_path = ev["base_path"]
    val_split = ev.get("val_split", "val")

    # The reference's find_threshold is broken AS SHIPPED: it calls
    # calculate_threshold_image(np.array(unc_images), pred_model) against
    # the signature (quantile_path, image, method) -> TypeError always
    # (find_threshold.py:63-94; documented quirk, SURVEY.md §7). Repair
    # with the INTENDED behavior — threshold = quantile of the pooled
    # val uncertainty at the model's foreground quantile — which is the
    # spec both implementations follow.
    import json as _json

    import numpy as _np
    _qfile = Path(base_path) / "quantile_analysis.json"

    def _fixed_threshold(images, method):
        with open(_qfile) as f:
            quantiles = _json.load(f)
        return _np.quantile(images, quantiles[method])

    ft.calculate_threshold_image = _fixed_threshold
    # accumulated threshold tasks over the val split
    # (reference: configs/tasks/threshold.yaml)
    quantiles = {}
    thresh_paths = {}
    for exp_version in versions.values():
        val_dl = ExperimentDataloader(exp_version, val_split)
        deep_merge(quantiles, ft.get_foreground_quantile(val_dl))
        deep_merge(thresh_paths, ft.threshold_images_paths(val_dl))
    ft.save_foreground_quantiles(quantiles, base_path)
    ft.find_threshold(thresh_paths, base_path, base_path)

    for exp_version in versions.values():
        for split in ev["eval_splits"]:
            dl = ExperimentDataloader(exp_version, split)
            agg_mod.aggregate_uncertainties(dl, aggregations)
            aurc.main(dl)
            ace.main(dl)
            ncc.main(dl)
            auroc.ood_detection(dl)  # toy id>20 rule (auroc.py:17-23)


def main() -> None:
    with open(sys.argv[1]) as f:
        spec = json.load(f)
    setup_paths(spec.get("reference_root", "/root/reference"))
    patch_cuda_to_cpu()
    run_inference(spec)
    run_eval(spec)
    print("REFERENCE PIPELINE OK")


if __name__ == "__main__":
    main()
