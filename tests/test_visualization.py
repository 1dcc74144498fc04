"""Results table + barplot generation on a synthetic JSON results tree."""
import json

import numpy as np
import pytest

from values_tpu.evaluation.visualization.ds_task_table import DsTaskTable
from values_tpu.evaluation.visualization.ds_task_barplots import (
    generate_barplot, run_plots)

UNC_TYPES = ["predictive_uncertainty", "aleatoric_uncertainty",
             "epistemic_uncertainty"]
AGGS = ["patch_level", "threshold"]
SEEDS = ["123", "124"]
MODELS = ["Softmax", "Ensemble", "SSN"]

DS_TASKS = {
    "seg_performance": {
        "dice": {"metrics_file_name": "metrics.json", "metrics_key": "dice",
                 "dataset_splits": ["id"], "levels": ["pred_model"],
                 "higher_better": True},
    },
    "failure_detection": {
        "aurc": {"metrics_file_name": "failure_detection.json",
                 "metrics_key": "aurc", "dataset_splits": ["id"],
                 "levels": ["pred_model", "unc_type", "aggregation"],
                 "higher_better": False},
    },
    "calibration": {
        "ace": {"metrics_file_name": "calibration.json",
                "metrics_key": "ace", "dataset_splits": ["id"],
                "levels": ["pred_model", "unc_type"],
                "higher_better": False},
    },
}


@pytest.fixture(scope="module")
def json_tree(tmp_path_factory):
    rng = np.random.RandomState(0)
    base = tmp_path_factory.mktemp("FirstCycle")
    values = {}
    for model in MODELS:
        uncs = (["predictive_uncertainty"] if model == "Softmax"
                else UNC_TYPES)
        for seed in SEEDS:
            split_dir = (base / f"{model}-Case-1" / "test_results"
                         / f"epochs2_seed{seed}" / "id")
            split_dir.mkdir(parents=True)
            dice = float(rng.uniform(0.5, 0.9))
            values.setdefault((model, "dice"), []).append(dice)
            (split_dir / "metrics.json").write_text(json.dumps(
                {"mean": {"dice": dice, "ged": 0.3}}))
            fd = {"mean": {}}
            calib = {"mean": {}}
            for unc in uncs:
                calib["mean"][unc] = {"metrics": {
                    "ace": float(rng.uniform(0, 0.2))}}
                fd["mean"][unc] = {
                    agg: {"metrics": {"aurc": float(rng.uniform(0, 0.5)),
                                      "eaurc": 0.0}}
                    for agg in AGGS}
            (split_dir / "failure_detection.json").write_text(json.dumps(fd))
            (split_dir / "calibration.json").write_text(json.dumps(calib))
    return base, values


def _config(base):
    experiments = [{
        "iter_params": {"pred_model": MODELS, "seed": SEEDS},
        "case": 1, "image_ending": ".nii.gz", "unc_ending": ".nii.gz",
        "n_reference_segs": 2, "epochs": 2,
        "naming_scheme_pred_model": "{pred_model}-Case-{case}",
        "prediction_models": {
            model: {
                "naming_scheme_version": "epochs{epochs}_seed{seed}",
                "unc_types": (["predictive_uncertainty"]
                              if model == "Softmax" else UNC_TYPES),
                "aggregations": AGGS,
            } for model in MODELS},
    }]
    return {"base_path": str(base), "experiments": experiments,
            "ds_tasks": DS_TASKS}


def test_table_mean_std_and_relabeling(json_tree):
    base, values = json_tree
    table = DsTaskTable(_config(base))
    mean_df, std_df = table.create()

    # mean over seeds, x100 scaling
    want = np.mean(values[("Ensemble", "dice")]) * 100
    got = mean_df.loc[("Ensemble",), ("seg_performance", "dice id")].iloc[0]
    assert got == pytest.approx(want)
    want_std = np.std(values[("Ensemble", "dice")], ddof=1) * 100
    got_std = std_df.loc[("Ensemble",), ("seg_performance", "dice id")].iloc[0]
    assert got_std == pytest.approx(want_std)

    # unc_measure relabeling incl. the SSN swap
    measures = mean_df.index.to_frame(index=False)
    sm = measures[measures.iloc[:, 0] == "Softmax"].iloc[0, 1]
    assert sm == "MSR"
    ssn_rows = measures[measures.iloc[:, 0] == "SSN"]
    ssn_alea = ssn_rows[ssn_rows.iloc[:, 2] == "aleatoric_uncertainty"]
    assert (ssn_alea.iloc[:, 1] == "MI").all()
    ens_rows = measures[measures.iloc[:, 0] == "Ensemble"]
    ens_alea = ens_rows[ens_rows.iloc[:, 2] == "aleatoric_uncertainty"]
    assert (ens_alea.iloc[:, 1] == "EE").all()


def test_table_latex_output(json_tree, capsys):
    base, _ = json_tree
    table = DsTaskTable(_config(base))
    mean_df, std_df = table.create()
    latex = table.to_latex(mean_df, std_df)
    assert "\\begin{tabular}" in latex
    assert "±" in latex
    assert "cellcolor" in latex  # gradients applied


def test_barplots(json_tree, tmp_path):
    base, _ = json_tree
    table = DsTaskTable(_config(base))
    mean_df, _ = table.create()
    out = generate_barplot(
        ds_task="failure_detection", metric="aurc id",
        dimension="pred_model", dataset_dfs={"LIDC": mean_df},
        results_plot_dir=tmp_path, lower_better=True,
        ordering={"pred_model": MODELS},
        filter_index=[("unc_type", "aleatoric_uncertainty")])
    assert out.exists()
    assert out.suffix == ".png"
