"""Golden end-to-end regression: the toy pipeline's numeric outputs are
pinned (VERDICT r1 item 7). Any drift in training, inference stitching,
uncertainty, aggregation, or downstream metrics fails this test.

The pipeline: deterministic toy generation -> 2-epoch softmax training ->
ensemble-2 sliding-window inference -> C2 uncertainty -> C3 aggregation ->
failure detection (AURC) + calibration (ACE) + ambiguity (NCC).

Regenerate the golden file after an *intended* numeric change with:
    VALUES_GOLDEN_UPDATE=1 python -m pytest tests/test_golden_e2e.py
and justify the diff in the commit message. Values are compared at
rtol 2e-4 (CPU float32 reproducibility across XLA versions).
"""
import json
import os
import random
from pathlib import Path

import numpy as np
import pytest

from values_tpu.config import compose

P = 16
GOLDEN = Path(__file__).parent / "golden" / "toy_e2e.json"


@pytest.fixture(scope="module")
def pipeline(tmp_path_factory):
    from values_tpu.data.toy_generation import ToyGenConfig, generate_samples
    from values_tpu.training.loops import fit
    from values_tpu.inference.test_3d import run_test, test_cli

    work = tmp_path_factory.mktemp("golden")
    case = work / "data" / "Case_1"
    for split, n, seed in (("Tr", 6, 21), ("Ts", 4, 22)):
        cfg = ToyGenConfig(
            input_files=["ballSphere.stl"],
            save_path=str(case / f"images{split}"), n_samples=n,
            image_size=(P, P, P), min_object_ratio=5, max_object_ratio=2,
            gauss_sigma=2, blur=True, segmentation=True, n_raters=3,
            seed=seed)
        random.seed(cfg.seed)
        np.random.seed(cfg.seed)
        generate_samples(cfg)
        seg = case / f"images{split}" / "segmentation"
        (case / f"labels{split}").mkdir(exist_ok=True)
        for f in seg.iterdir():
            f.rename(case / f"labels{split}" / f.name)
        seg.rmdir()

    ckpts = []
    train_losses = []
    for seed in (123, 124):
        cfg = compose("configs", "softmax_config", [
            f"data_input_dir={work / 'data'}",
            f"save_dir={work / 'exp'}",
            f"exp_name=Golden", f"seed={seed}", f"version=s{seed}",
            "max_epochs=2", "batch_size=2", "datamodule.patch_size=16",
            "datamodule.batch_size=2", "datamodule.data_num_folds=3",
            "model.initial_filter_size=2",
        ])
        ckpts.append(fit(cfg))

    args = test_cli([
        "--checkpoint_paths", *ckpts,
        "-i", str(work / "data"), "--save_dir", str(work / "out"),
        "--test_split", "val", "--test_batch_size", "4"])
    run_test(args)
    version_dir = (work / "out" / "Golden" / "test_results" / "s123"
                   / "val")
    return {"work": work, "version_dir": version_dir}


def _collect(pipeline):
    from values_tpu.evaluation.aggregate_uncertainties import (
        image_level_aggregation, patch_level_aggregation)
    from values_tpu.evaluation.metrics.aurc import rc_curve_stats
    from values_tpu.evaluation.metrics.ncc import compute_ncc
    from values_tpu.core.nifti import load

    vdir = pipeline["version_dir"]
    metrics = json.loads((vdir / "metrics.json").read_text())
    out = {"mean_metrics": metrics["mean"]}

    image_ids = sorted(p.name.split(".")[0]
                       for p in (vdir / "pred_entropy").iterdir())
    risks, scores, patch_scores, nccs = [], [], [], []
    per_image = {k: v for k, v in metrics.items() if k != "mean"}
    keys = sorted(per_image)
    for iid, mkey in zip(image_ids, keys):
        unc = load(vdir / "pred_entropy" / f"{iid}.nii.gz")[0]
        agg = patch_level_aggregation(unc, patch_size=4)
        patch_scores.append(agg["max_score"])
        scores.append(float(image_level_aggregation(unc, mean=True)))
        risks.append(1.0 - per_image[mkey]["dice"])
        gts = [load(p)[0] for p in sorted(
            (vdir / "gt_seg").glob(f"{iid}_*.nii.gz"))]
        gt_var = np.var(np.stack(gts), axis=0)
        nccs.append(float(compute_ncc(gt_var, unc)))
    coverages, sel_risks, weights = rc_curve_stats(
        np.asarray(risks), -np.asarray(scores))
    aurc = float(sum(
        (sel_risks[i] + sel_risks[i + 1]) * 0.5 * weights[i]
        for i in range(len(weights))))
    out["image_level_scores"] = scores
    out["patch_level_scores"] = patch_scores
    out["aurc"] = aurc
    out["ncc"] = nccs
    return out


def test_golden_e2e(pipeline):
    got = _collect(pipeline)
    if os.environ.get("VALUES_GOLDEN_UPDATE") == "1":
        GOLDEN.parent.mkdir(exist_ok=True)
        GOLDEN.write_text(json.dumps(got, indent=2, sort_keys=True))
        pytest.skip("golden file regenerated")
    assert GOLDEN.exists(), ("no golden file; run with "
                             "VALUES_GOLDEN_UPDATE=1 to create it")
    want = json.loads(GOLDEN.read_text())

    def walk(a, b, path=""):
        assert type(a) is type(b) or (
            isinstance(a, (int, float)) and isinstance(b, (int, float))), \
            path
        if isinstance(a, dict):
            assert sorted(a) == sorted(b), path
            for k in a:
                walk(a[k], b[k], f"{path}.{k}")
        elif isinstance(a, list):
            assert len(a) == len(b), path
            for i, (x, y) in enumerate(zip(a, b)):
                walk(x, y, f"{path}[{i}]")
        else:
            np.testing.assert_allclose(a, b, rtol=2e-4, atol=1e-6,
                                       err_msg=path)

    walk(got, want)
