"""Evaluation layer (C3 + downstream tasks) against closed-form oracles and
a synthetic reference-layout results tree."""
import json
import pickle

import numpy as np
import pytest

from values_tpu.core import nifti
from values_tpu.evaluation import aggregate_uncertainties as AGG
from values_tpu.evaluation import find_threshold as FT
from values_tpu.evaluation.experiment_version import ExperimentVersion
from values_tpu.evaluation.experiment_dataloader import ExperimentDataloader
from values_tpu.evaluation.metrics import aurc as AURC
from values_tpu.evaluation.metrics import ace as ACE
from values_tpu.evaluation.metrics import ncc as NCC
from values_tpu.evaluation.metrics import auroc as AUROC
from values_tpu.evaluation.sorting import sort_uncertainties

V = 12  # small volume edge


# ---------------------------------------------------------------------
# aggregation numerics
# ---------------------------------------------------------------------
def test_patch_level_matches_scipy_bruteforce(rng):
    image = rng.rand(9, 9, 9)
    out = AGG.patch_level_aggregation(image, patch_size=4)
    # brute force all windows
    best = -np.inf
    for i in range(6):
        for j in range(6):
            for k in range(6):
                s = image[i:i + 4, j:j + 4, k:k + 4].sum()
                best = max(best, s)
    assert out["max_score"] == pytest.approx(best, rel=1e-12)
    assert len(out["bounding_box"]) == 3
    i0, i1 = out["bounding_box"][0]
    assert i1 - i0 == 4


def test_patch_level_device_path_close(rng):
    image = rng.rand(9, 9, 9).astype(np.float32)
    host = AGG.patch_level_aggregation(image, patch_size=4)
    dev = AGG.patch_level_aggregation(image, patch_size=4, use_device=True)
    assert dev["max_score"] == pytest.approx(host["max_score"], rel=1e-5)


def test_image_level_aggregation(rng):
    image = rng.rand(5, 5)
    assert AGG.image_level_aggregation(image)["max_score"] == pytest.approx(
        image.sum())
    assert AGG.image_level_aggregation(image, mean=True) == pytest.approx(
        image.mean())


def test_threshold_aggregation_and_zero_count_quirk():
    image = np.array([0.1, 0.5, 0.9, 0.2])
    out = AGG.threshold_aggregation(image, threshold=0.4)
    assert out["max_score"] == pytest.approx((0.5 + 0.9) / 2)
    # count==0: returns the SUM (0.0) even though mean=True (reference quirk)
    out = AGG.threshold_aggregation(image, threshold=2.0)
    assert out["max_score"] == 0.0


# ---------------------------------------------------------------------
# AURC / E-AURC
# ---------------------------------------------------------------------
def test_aurc_hand_case():
    # risks [0, 1], confidence ranks them correctly
    risks = np.array([0.0, 1.0])
    confids = np.array([1.0, 0.0])
    # trace of the reference algorithm (aurc.py:14-58): curve points
    # (cov 1, risk .5) -> (cov .5, risk 0) with weight .5
    # => trapezoid (0.5 + 0) * 0.5 * 0.5 = 0.125
    assert AURC.aurc(risks, confids) == pytest.approx(0.125)
    # optimal-CSF aurc per eaurc formula: sum([0, .5])/2 = 0.25
    assert AURC.eaurc(risks, confids) == pytest.approx(0.125 - 0.25)
    # anti-correlated confidence is worse
    assert AURC.aurc(risks, confids[::-1]) > AURC.aurc(risks, confids)


def test_aurc_ties_handling():
    risks = np.array([0.2, 0.4, 0.6, 0.8])
    confids = np.array([0.5, 0.5, 0.5, 0.5])  # all tied
    a = AURC.aurc(risks, confids)
    assert np.isfinite(a) and a > 0
    # all tied => one point after the first drop, then the trailing
    # zero-coverage point absorbing the remaining two drops
    cov, sel, w = AURC.rc_curve_stats(risks, confids)
    assert cov == [1.0, 0.75, 0.0] and w == [0.25, 0.5]


def _rc_curve_simulation(risks, confids):
    """Independent drop-by-drop simulation of the RC-curve contract, used
    as an oracle for the vectorized rc_curve_stats."""
    n = len(risks)
    order = np.argsort(confids)
    kept = list(order)
    cov = [1.0]
    sel = [float(np.sum(risks)) / n]
    w = []
    pending = 0
    for step, drop in enumerate(order[:-1]):
        kept.remove(drop)
        pending += 1
        starts_group = step == 0 or confids[drop] != confids[order[step - 1]]
        if starts_group:
            cov.append(len(kept) / n)
            sel.append(float(np.sum(risks[kept])) / len(kept))
            w.append(pending / n)
            pending = 0
    if pending:
        cov.append(0.0)
        sel.append(sel[-1])
        w.append(pending / n)
    return cov, sel, w


def test_rc_curve_stats_matches_simulation():
    rng = np.random.RandomState(0)
    for trial in range(20):
        n = rng.randint(1, 40)
        risks = rng.rand(n)
        # mix of unique and tied confidences (quantized draws create ties)
        confids = np.round(rng.rand(n), 1 if trial % 2 else 8)
        got = AURC.rc_curve_stats(risks, confids)
        want = _rc_curve_simulation(risks, confids)
        for g, e in zip(got, want):
            np.testing.assert_allclose(g, e, atol=1e-12)


# ---------------------------------------------------------------------
# ACE / calibration
# ---------------------------------------------------------------------
def test_calib_stats_bins():
    correct = np.array([1, 1, 0, 0])
    confids = np.array([0.9, 0.85, 0.1, 0.15])
    disc, _, num_nonzero = ACE.calib_stats(correct, confids)
    assert num_nonzero == 4  # bins (0.05-0.1],(0.1-0.15],(0.8-0.85],(0.85-0.9]
    ace = ACE.calc_ace(correct, confids)
    # acc=1 vs conf≈0.875/0.9 high bins; acc=0 vs conf≈0.1/0.15
    assert 0 < ace < 0.2


def test_calc_ace_matches_manual():
    correct = np.array([1, 0, 1, 0, 1])
    confids = np.array([0.81, 0.12, 0.78, 0.33, 0.97])
    bins = np.linspace(0, 1 + 1e-8, 21)
    binids = np.digitize(confids, bins) - 1
    accs, confs = [], []
    for b in np.unique(binids):
        mask = binids == b
        accs.append(correct[mask].mean())
        confs.append(confids[mask].mean())
    want = np.mean(np.abs(np.array(accs) - np.array(confs)))
    assert ACE.calc_ace(correct, confids) == pytest.approx(want)


# ---------------------------------------------------------------------
# NCC
# ---------------------------------------------------------------------
def test_ncc_perfect_correlation(rng):
    x = rng.rand(10, 10)
    # ddof=1 stds with a 1/N normalization give (N-1)/N at perfect
    # correlation (reference: ncc.py:9-25)
    n = x.size
    assert NCC.compute_ncc(x, 2 * x + 1) == pytest.approx((n - 1) / n)
    assert NCC.compute_ncc(x, -x) == pytest.approx(-(n - 1) / n)
    y = rng.rand(10, 10)
    assert abs(NCC.compute_ncc(x, y)) < 0.5


# ---------------------------------------------------------------------
# synthetic results tree -> dataloader, aggregation driver, tasks
# ---------------------------------------------------------------------
@pytest.fixture(scope="module")
def results_tree(tmp_path_factory):
    """Reference-layout tree for pred_model 'Ensemble' + 'Softmax'."""
    rng = np.random.RandomState(3)
    base = tmp_path_factory.mktemp("FirstCycle")
    for pred_model in ("Ensemble", "Softmax"):
        for split in ("val", "id", "ood"):
            root = (base / f"{pred_model}-Case-1" / "test_results"
                    / "epochs2_seed123" / split)
            metrics = {}
            for idx in range(4):
                image_id = f"{idx:04d}"
                gt = (rng.rand(V, V, V) > 0.6).astype(np.uint8)
                pred = (rng.rand(V, V, V) > 0.6).astype(np.uint8)
                for r in range(2):
                    nifti.save(gt, root / "gt_seg"
                               / f"{image_id}_{r:02d}.nii.gz")
                nifti.save(pred, root / "pred_seg"
                           / f"{image_id}_mean.nii.gz")
                nifti.save(pred, root / "pred_seg"
                           / f"{image_id}_01.nii.gz")
                prob1 = rng.rand(V, V, V) * 0.5
                nifti.save(1 - prob1, root / "pred_prob"
                           / f"{image_id}_01_01.nii.gz")
                nifti.save(prob1, root / "pred_prob"
                           / f"{image_id}_01_02.nii.gz")
                if pred_model != "Softmax":
                    for unc_dir in ("pred_entropy", "aleatoric_uncertainty",
                                    "epistemic_uncertainty"):
                        nifti.save(rng.rand(V, V, V) * 0.7,
                                   root / unc_dir / f"{image_id}.nii.gz")
                metrics[f"/fake/{image_id}.npy"] = {
                    "dice": float(rng.uniform(0.3, 0.9)), "loss": 1.0}
            metrics["mean"] = {
                "dice": float(np.mean([m["dice"] for k, m in metrics.items()
                                       if k != "mean"])), "loss": 1.0}
            (root / "metrics.json").write_text(json.dumps(metrics))
    return base


def _version(results_tree, pred_model="Ensemble"):
    unc_types = (["predictive_uncertainty"] if pred_model == "Softmax" else
                 ["predictive_uncertainty", "aleatoric_uncertainty",
                  "epistemic_uncertainty"])
    return ExperimentVersion(
        base_path=results_tree,
        naming_scheme_version="epochs{epochs}_seed{seed}",
        naming_scheme_pred_model="{pred_model}-Case-{case}",
        pred_model=pred_model, image_ending=".nii.gz", unc_ending=".nii.gz",
        unc_types=unc_types,
        aggregations=["patch_level", "image_level", "threshold"],
        n_reference_segs=2, case=1, epochs=2, seed="123")


def test_dataloader_discovery_and_softmax_lazy_entropy(results_tree):
    dl = ExperimentDataloader(_version(results_tree, "Softmax"), "id")
    assert dl.image_ids == ["0000", "0001", "0002", "0003"]
    # lazy pred_entropy materialized as 1 - max softmax
    assert (dl.dataset_path / "pred_entropy" / "0000.nii.gz").exists()
    ent = dl.get_unc_map("0000", "predictive_uncertainty")
    p2, _ = nifti.load(dl.dataset_path / "pred_prob" / "0000_01_02.nii.gz")
    np.testing.assert_allclose(ent, 1 - np.maximum(1 - p2, p2), atol=1e-6)


def test_gt_unc_map_is_rater_variance(results_tree):
    dl = ExperimentDataloader(_version(results_tree), "id")
    gt_map = dl.get_gt_unc_map("0000")
    refs = dl.get_reference_segs("0000")
    np.testing.assert_allclose(gt_map, np.var(refs, axis=0))


def test_full_task_chain(results_tree):
    """threshold -> aggregation -> failure detection / calibration / ncc /
    AL splits on the synthetic tree."""
    version = _version(results_tree)

    # 1. threshold pipeline (accumulated over val)
    dl_val = ExperimentDataloader(version, "val")
    qdict = FT.get_foreground_quantile(dl_val)
    FT.save_foreground_quantiles(qdict, results_tree)
    paths = FT.threshold_images_paths(dl_val)
    FT.find_threshold(paths, results_tree, results_tree)
    tjson = json.loads((results_tree / "threshold_analysis.json").read_text())
    assert "Ensemble" in tjson and "Mean predictive threshold" in tjson["Ensemble"]

    # 2. aggregation on id split
    dl_id = ExperimentDataloader(version, "id")
    aggregations = {
        "patch_level": {
            "_target_": "values_tpu.evaluation.aggregate_uncertainties."
                        "patch_level_aggregation", "patch_size": 4},
        "image_level": {
            "_target_": "values_tpu.evaluation.aggregate_uncertainties."
                        "image_level_aggregation"},
        "threshold": {
            "_target_": "values_tpu.evaluation.aggregate_uncertainties."
                        "threshold_aggregation",
            "threshold_path": str(results_tree / "threshold_analysis.json")},
    }
    AGG.aggregate_uncertainties(dl_id, aggregations)
    agg_file = dl_id.dataset_path / "aggregated_predictive_uncertainty.json"
    assert agg_file.exists()
    agg = json.loads(agg_file.read_text())
    assert len(agg) == 4
    first = next(iter(agg.values()))
    assert {"patch_level", "image_level", "threshold"} <= set(first)

    # 3. failure detection
    AURC.main(dl_id)
    fd = json.loads((dl_id.dataset_path
                     / "failure_detection.json").read_text())
    entry = fd["mean"]["predictive_uncertainty"]["patch_level"]["metrics"]
    assert {"aurc", "eaurc"} <= set(entry)
    assert entry["aurc"] == pytest.approx(
        entry["eaurc"] + (entry["aurc"] - entry["eaurc"]))

    # 4. calibration (platt fit on val happens internally)
    ACE.main(dl_id)
    calib = json.loads((dl_id.dataset_path / "calibration.json").read_text())
    assert 0 <= calib["mean"]["predictive_uncertainty"]["metrics"]["ace"] <= 1
    assert (version.exp_path / "platt_scale_params.json").exists()

    # 5. ambiguity modeling
    NCC.main(dl_id)
    amb = json.loads((dl_id.dataset_path
                      / "ambiguity_modeling.json").read_text())
    assert "predictive_uncertainty" in amb["mean"]

    # 6. sorting + acquisition
    sorted_ids = sort_uncertainties(agg, "image_level")
    scores = [agg[i]["image_level"]["max_score"] for i in sorted_ids]
    assert scores == sorted(scores, reverse=True)


def test_second_cycle_split_generation(results_tree, tmp_path):
    from values_tpu.evaluation.split_file_generation import second_cycle as SC
    splits_dir = tmp_path / "splits" / "firstCycle"
    splits_dir.mkdir(parents=True)
    splits = [{
        "train": np.array(["a.npy", "b.npy"]),
        "val": np.array(["v.npy"]),
        "id_test": np.array(["t.npy"]),
        "ood_test": np.array(["o.npy"]),
        "id_unlabeled_pool": np.array(["0000.npy", "0001.npy"]),
        "ood_unlabeled_pool": np.array(["0002.npy", "0003.npy"]),
    }]
    with open(splits_dir / "splits.pkl", "wb") as f:
        pickle.dump(splits, f)

    version = _version(results_tree)
    dl = ExperimentDataloader(version, "id")
    SC.generate_split_file(dl, tmp_path / "splits")
    out = (tmp_path / "splits" / "secondCycle" / "Ensemble"
           / "predictive_uncertainty" / "patch_level" / "splits_seed123.pkl")
    assert out.exists()
    with open(out, "rb") as f:
        new_splits = pickle.load(f)
    assert len(new_splits[0]["train"]) == 4  # 2 + 50% of 4 unlabeled


def test_ood_toy_rule():
    assert AUROC.is_ood_toy("0005.npy") is True
    assert AUROC.is_ood_toy("0021.npy") is False
    assert AUROC.is_ood_toy("0100.npy") is False


def test_eval_experiments_driver(results_tree):
    """EvalExperiments through the composed-config path: version grid,
    accumulated threshold tasks, aggregation, downstream metrics."""
    from values_tpu.config import make_config
    from values_tpu.evaluation.eval_experiments import EvalExperiments

    cfg = make_config({
        "base_path": str(results_tree),
        "experiments": [{
            "iter_params": {"pred_model": ["Ensemble", "Softmax"],
                            "seed": ["123"]},
            "case": 1, "epochs": 2, "image_ending": ".nii.gz",
            "unc_ending": ".nii.gz", "n_reference_segs": 2,
            "naming_scheme_pred_model": "{pred_model}-Case-{case}",
            "prediction_models": {
                "Ensemble": {
                    "naming_scheme_version": "epochs{epochs}_seed{seed}",
                    "unc_types": ["predictive_uncertainty",
                                  "aleatoric_uncertainty",
                                  "epistemic_uncertainty"],
                    "aggregations": ["patch_level", "threshold"]},
                "Softmax": {
                    "naming_scheme_version": "epochs{epochs}_seed{seed}",
                    "unc_types": ["predictive_uncertainty"],
                    "aggregations": ["patch_level", "threshold"]},
            },
        }],
        "tasks": ["threshold", "aggregation", "failure_detection"],
        "task_params": {
            "threshold": [
                {"datasets": ["val"], "accumulated": True,
                 "function": {"_target_":
                              "values_tpu.evaluation.find_threshold."
                              "get_foreground_quantile"},
                 "postprocess_function": {
                     "_target_": "values_tpu.evaluation.find_threshold."
                                 "save_foreground_quantiles",
                     "save_path": str(results_tree)}},
                {"datasets": ["val"], "accumulated": True,
                 "function": {"_target_":
                              "values_tpu.evaluation.find_threshold."
                              "threshold_images_paths"},
                 "postprocess_function": {
                     "_target_": "values_tpu.evaluation.find_threshold."
                                 "find_threshold",
                     "quantile_path": str(results_tree),
                     "save_path": str(results_tree)}},
            ],
            "aggregation": {
                "datasets": ["id", "ood"],
                "function": {
                    "_target_": "values_tpu.evaluation."
                                "aggregate_uncertainties."
                                "aggregate_uncertainties",
                    "aggregations": {
                        "patch_level": {
                            "_target_": "values_tpu.evaluation."
                                        "aggregate_uncertainties."
                                        "patch_level_aggregation",
                            "patch_size": 4},
                        "threshold": {
                            "_target_": "values_tpu.evaluation."
                                        "aggregate_uncertainties."
                                        "threshold_aggregation",
                            "threshold_path": str(
                                results_tree / "threshold_analysis.json")},
                    }}},
            "failure_detection": {
                "datasets": ["id", "ood"],
                "function": {"_target_":
                             "values_tpu.evaluation.metrics.aurc.main"}},
        },
    })
    EvalExperiments(cfg).analyse()
    assert (results_tree / "threshold_analysis.json").exists()
    for model in ("Ensemble", "Softmax"):
        base = (results_tree / f"{model}-Case-1" / "test_results"
                / "epochs2_seed123")
        for split in ("id", "ood"):
            assert (base / split
                    / "aggregated_predictive_uncertainty.json").exists()
            assert (base / split / "failure_detection.json").exists()
