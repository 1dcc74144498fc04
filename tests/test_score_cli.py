"""Scores-only CLI (values_tpu.inference.score): train a tiny model,
score the val split, check the JSON contract and that the scores match
the scoring API's grouped composition already pinned in
tests/test_scoring.py."""
import json
import os
import random

import numpy as np
import pytest

import jax

from values_tpu.config import compose
from values_tpu.data.toy_generation import ToyGenConfig, generate_samples
from values_tpu.inference.score import run_score, score_cli
from values_tpu.inference.scoring import score_rows
from values_tpu.training.loops import fit

P = 16


@pytest.fixture(scope="module")
def toy_ckpt(tmp_path_factory):
    root = tmp_path_factory.mktemp("ScoreToy")
    case = root / "Case_1"
    for split, n in (("Tr", 6), ("Ts", 2)):
        cfg = ToyGenConfig(
            input_files=["ballSphere.stl"],
            save_path=str(case / f"images{split}"),
            n_samples=n, image_size=(P, P, P), min_object_ratio=5,
            max_object_ratio=2, gauss_sigma=2, blur=True,
            segmentation=True, n_raters=3, seed=1 if split == "Tr" else 2)
        random.seed(cfg.seed)
        np.random.seed(cfg.seed)
        generate_samples(cfg)
        seg = case / f"images{split}" / "segmentation"
        (case / f"labels{split}").mkdir(exist_ok=True)
        for f in seg.iterdir():
            f.rename(case / f"labels{split}" / f.name)
        seg.rmdir()
    cfg = compose("configs", "softmax_config", overrides=[
        f"data_input_dir={root}", f"save_dir={root}/exp",
        "max_epochs=1", "batch_size=2", "datamodule.patch_size=16",
        "datamodule.batch_size=2", "datamodule.data_num_folds=3",
        "model.initial_filter_size=2", "version=0"])
    return root, fit(cfg)


def test_score_cli_json_contract(toy_ckpt, tmp_path):
    root, ckpt = toy_ckpt
    out = str(tmp_path / "scores.json")
    args = score_cli([
        "--checkpoint_paths", ckpt, ckpt,  # 2-member ensemble
        "-i", str(root), "--out", out, "--test_split", "val",
        "--dtype", "float32"])
    results = run_score(args)
    assert os.path.exists(out)
    on_disk = json.loads(open(out).read())
    assert on_disk.keys() == results.keys()
    assert len(results) == 2  # 6 train images, 3 folds -> 2 val subjects
    rows = score_rows()
    for subject, scores in results.items():
        assert set(scores.keys()) == set(rows)
        assert all(np.isfinite(v) for v in scores.values())
        assert 0.0 <= scores["dice"] <= 1.0


def test_score_cli_rejects_multiwindow(toy_ckpt, tmp_path):
    """Volumes larger than the patch (multi-window) must be rejected
    with a pointer to the stitching engine."""
    root, ckpt = toy_ckpt
    from values_tpu.training.checkpoint import load_any_checkpoint
    hparams, _ = load_any_checkpoint(ckpt)
    import pickle
    big = np.zeros((P * 2, P * 2, P * 2), np.float32)
    pre = root / "Case_1" / "preprocessed"
    np.save(str(pre / "imagesTr" / "zz_big.npy"), big)
    for rater in range(3):
        np.save(str(pre / "labelsTr" / f"zz_big_{rater:02d}.npy"),
                big.astype(np.int16))
    splits_path = root / "Case_1" / "splits.pkl"
    orig = splits_path.read_bytes()
    try:
        args = score_cli([
            "--checkpoint_paths", ckpt, "-i", str(root),
            "--out", str(tmp_path / "s.json"), "--test_split", "val",
            "--dtype", "float32"])
        splits = pickle.loads(orig)
        fold = hparams["datamodule"]["data_fold_id"]
        splits[fold]["val"] = list(splits[fold]["val"]) + ["zz_big.npy"]
        with open(splits_path, "wb") as f:
            pickle.dump(splits, f)
        with pytest.raises(ValueError, match="sliding window"):
            run_score(args)
    finally:
        splits_path.write_bytes(orig)
        os.remove(str(pre / "imagesTr" / "zz_big.npy"))
        for rater in range(3):
            os.remove(str(pre / "labelsTr" / f"zz_big_{rater:02d}.npy"))


def test_score_cli_data_sharded_matches_single_device(toy_ckpt, tmp_path):
    """--devices N runs the scorer data-sharded over an N-chip mesh
    (parallel.mesh.make_sharded_scorer); the deterministic ensemble's
    scores must match the single-device run to kernel-tiling float
    tolerance."""
    if len(jax.devices()) < 2:
        pytest.skip("needs 2 virtual devices")
    root, ckpt = toy_ckpt
    single = str(tmp_path / "single.json")
    run_score(score_cli([
        "--checkpoint_paths", ckpt, ckpt, "-i", str(root),
        "--out", single, "--test_split", "val", "--dtype", "float32"]))
    sharded = str(tmp_path / "sharded.json")
    run_score(score_cli([
        "--checkpoint_paths", ckpt, ckpt, "-i", str(root),
        "--out", sharded, "--test_split", "val", "--dtype", "float32",
        "--devices", "2"]))
    a = json.loads(open(single).read())
    b = json.loads(open(sharded).read())
    assert a.keys() == b.keys()
    for subject in a:
        for row, v in a[subject].items():
            assert b[subject][row] == pytest.approx(v, rel=1e-4,
                                                    abs=1e-5), (
                subject, row)
