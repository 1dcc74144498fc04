"""AL second-cycle orchestration (values_tpu.evaluation.al_driver)."""
import pickle
from pathlib import Path

import numpy as np


def _fake_second_cycle_tree(base: Path):
    trees = [
        ("texture", "secondCycle", "Softmax", "pred_entropy",
         "patch_level"),
        ("texture", "secondCycle", "Softmax", "mutual_information",
         "image_level"),
        ("texture", "secondCycle", "random", "random"),
    ]
    files = []
    for parts in trees:
        d = base.joinpath(*parts)
        d.mkdir(parents=True, exist_ok=True)
        f = d / "splits_seed123.pkl"
        with open(f, "wb") as fh:
            pickle.dump([{"train": ["a.npy"], "val": ["b.npy"],
                          "unlabeled_pool": []}], fh)
        files.append(f)
    return files


def test_discovery_and_version_names(tmp_path):
    from values_tpu.evaluation.al_driver import (
        discover_second_cycle_splits, version_name_for_splits)

    _fake_second_cycle_tree(tmp_path)
    found = discover_second_cycle_splits(tmp_path)
    assert len(found) == 3
    names = sorted(version_name_for_splits(f) for f in found)
    assert names == [
        "secondCycle-Softmax-mutual_information-image_level-seed123",
        "secondCycle-Softmax-pred_entropy-patch_level-seed123",
        "secondCycle-random-random-seed123",
    ]


def test_run_second_cycle_composes_training_runs(tmp_path):
    """Every discovered splits file becomes one fit() call whose config
    carries datamodule.splits_path and the provenance version."""
    from values_tpu.evaluation.al_driver import run_second_cycle

    _fake_second_cycle_tree(tmp_path)
    calls = []

    def fake_fit(cfg):
        calls.append((cfg["datamodule"]["splits_path"], cfg["version"]))
        return f"/ckpt/{cfg['version']}/last.ckpt"

    results = run_second_cycle(
        tmp_path, "softmax_config_lidc",
        overrides=["data_input_dir=/tmp/x", "max_epochs=1"],
        fit_fn=fake_fit)
    assert len(results) == 3
    for (splits_path, version), (rv, rckpt) in zip(
            sorted(calls), sorted(results.items())):
        assert version == rv
        assert Path(splits_path).name == "splits_seed123.pkl"
        assert rckpt.endswith(f"{version}/last.ckpt")

    dry = run_second_cycle(tmp_path, "softmax_config_lidc", dry_run=True)
    assert set(dry.values()) == {"(dry-run)"}


def test_generate_and_run_full_loop(tmp_path, monkeypatch):
    """generate_and_run drives query-split generation (uncertainty +
    random baselines) then trains on everything produced."""
    import values_tpu.evaluation.al_driver as drv
    from values_tpu.evaluation.split_file_generation import (second_cycle,
                                                             second_cycle_random)

    calls = {"unc": 0, "rand": 0, "fits": []}

    def fake_unc(exp_dl, base):
        calls["unc"] += 1
        _fake_second_cycle_tree(Path(base))  # pretend files were written

    def fake_rand(exp_dl, base, random_types):
        calls["rand"] += 1
        assert random_types == ["random", "best", "worst"]

    monkeypatch.setattr(second_cycle, "generate_split_file", fake_unc)
    monkeypatch.setattr(second_cycle_random, "generate_split_file",
                        fake_rand)

    from values_tpu.evaluation.experiment_dataloader import (
        ExperimentDataloader)

    class FakeDL(ExperimentDataloader):  # bypass the heavy __init__
        def __init__(self):
            pass

    def fake_fit(cfg):
        calls["fits"].append(cfg["version"])
        return "ck"

    results = drv.generate_and_run(
        FakeDL(), tmp_path, "softmax_config_lidc",
        overrides=["data_input_dir=/tmp/x"], fit_fn=fake_fit)
    assert calls["unc"] == 1 and calls["rand"] == 1
    assert len(results) == 3 and len(calls["fits"]) == 3
