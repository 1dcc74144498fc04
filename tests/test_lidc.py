"""LIDC data layer: ID/OoD labeling, first-cycle splits, datamodule."""
import pickle

import numpy as np
import pandas as pd
import pytest

from values_tpu.core import nifti
from values_tpu.data.lidc import (calculate_rater_agreement,
                                  create_first_cycle_splits,
                                  get_feature_dict)
from values_tpu.data.lidc_datamodule import LidcIdriDataModule3D


@pytest.fixture(scope="module")
def lidc_root(tmp_path_factory):
    """Synthetic cropped-nodule dataset with metadata, 12 patients."""
    rng = np.random.RandomState(0)
    root = tmp_path_factory.mktemp("LIDC")
    (root / "images").mkdir()
    (root / "labels").mkdir()
    rows = []
    P = 16
    for scan_id in range(12):
        patient = f"LIDC-{scan_id:04d}"
        for nod_idx in range(3):
            image_id = f"{scan_id:04d}_{nod_idx:02d}"
            vol = rng.rand(P, P, P)
            nifti.save(vol, root / "images" / f"{image_id}.nii.gz")
            seg_paths = []
            for r in range(4):
                mask = (rng.rand(P, P, P) > 0.8).astype(np.intc)
                path = root / "labels" / f"{image_id}_{r:02d}_mask.nii.gz"
                nifti.save(mask, path)
                seg_paths.append(str(path))
            # texture ratings: first 9 patients ID (3-5), rest OoD (1-2)
            if scan_id < 9:
                texture = [int(x) for x in rng.randint(3, 6, size=4)]
            else:
                texture = [int(x) for x in rng.randint(1, 3, size=4)]
            row = {
                "Patient ID": patient, "Scan ID": f"{scan_id:04d}",
                "Nodule Index": f"{nod_idx:02d}",
                "Image Save Path": str(root / "images"
                                       / f"{image_id}.nii.gz"),
                "Segmentation Save Paths": str(seg_paths),
                "subtlety": str([3, 3, 3, 3]),
                "internal Structure": str([1, 1, 1, 1]),
                "calcification": str([6, 6, 6, 6]),
                "sphericity": str([4, 4, 4, 4]),
                "margin": str([3, 3, 3, 3]),
                "lobulation": str([1, 1, 1, 1]),
                "spiculation": str([1, 1, 1, 1]),
                "texture": str(texture),
                "malignancy": str([2, 2, 2, 2]),
            }
            rows.append(row)
    pd.DataFrame(rows).to_csv(root / "metadata.csv", index=False)
    return root


def test_feature_dict_values():
    fd = get_feature_dict()
    assert fd["texture"] == ((3, 4, 5), (1, 2))
    assert fd["malignancy"] == ((1, 2, 3), (4, 5))


def test_rater_agreement_majority(lidc_root):
    df = calculate_rater_agreement(lidc_root, save_df=True)
    assert (lidc_root / "id_ood.csv").exists()
    assert "texture_id" in df.columns
    # ID patients labeled True, OoD labeled False (all raters agree here)
    first = df[df["Patient ID"] == "LIDC-0000"]["texture_id"].iloc[0]
    last = df[df["Patient ID"] == "LIDC-0011"]["texture_id"].iloc[0]
    assert first is True or first == True  # noqa: E712
    assert last is False or last == False  # noqa: E712


def test_first_cycle_splits_structure(lidc_root, tmp_path):
    calculate_rater_agreement(lidc_root, save_df=True)
    out = tmp_path / "splits_texture.pkl"
    create_first_cycle_splits(out, "texture", lidc_root / "id_ood.csv",
                              seed=123, n_splits=3)
    with open(out, "rb") as f:
        splits = pickle.load(f)
    assert len(splits) == 3
    fold = splits[0]
    assert {"train", "val", "id_test", "ood_test", "id_unlabeled_pool",
            "ood_unlabeled_pool"} == set(fold.keys())
    # ~2:1 id:ood unlabeled pool
    assert len(fold["id_unlabeled_pool"]) >= len(fold["ood_unlabeled_pool"])
    # no overlap between train and pools/test
    train = set(fold["train"])
    for key in ("val", "id_test", "id_unlabeled_pool"):
        assert not train & set(fold[key])
    # patient disjointness: a patient's nodules never straddle
    # train vs id_test
    patient = lambda name: name.split("_")[0]
    train_pat = {patient(p) for p in fold["train"]} | {
        patient(p) for p in fold["val"]}
    test_pat = {patient(p) for p in fold["id_test"]}
    assert not train_pat & test_pat


def test_lidc_datamodule_end_to_end(lidc_root):
    calculate_rater_agreement(lidc_root, save_df=True)
    dm = LidcIdriDataModule3D(
        data_input_dir=str(lidc_root), shift_feature="texture",
        num_raters=4, data_num_folds=3, batch_size=2, patch_size=16,
        seed=123)
    dm.prepare_data()
    dm.setup()
    assert (lidc_root / "preprocessed" / "images").exists()
    assert (lidc_root / "splits_texture.pkl").exists()
    batch = next(iter(dm.train_dataloader()))
    assert batch["data"].shape[1:] == (16, 16, 16, 1)
    assert batch["seg"].shape[1:] == (16, 16, 16)
    val_batch = next(iter(dm.val_dataloader()))
    assert val_batch["data"].shape == (1, 16, 16, 16, 1)
