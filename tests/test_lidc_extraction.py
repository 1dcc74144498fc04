"""Execute the LIDC extraction stage (data/lidc.py::save_cropped_nodules)
against a synthetic in-memory pylidc shim.

The VERDICT r2 caveat on SURVEY §2.6 was that the pylidc extraction stage
had never executed in this environment (pylidc + the DICOM archive are
absent). The shim below implements exactly the pylidc API surface the
extraction uses (reference: datasets/lidc-idri/save_cropped_nodules.py:
26-131) — `pl.query(pl.Scan)`, `scan.cluster_annotations()`,
`pylidc.utils.consensus`, `Annotation.uniform_cubic_resample` — with
deterministic synthetic volumes, so the full chain
extract -> id_ood -> first-cycle splits runs end to end in-process.
"""
import sys
import types
from pathlib import Path

import numpy as np
import pytest

pd = pytest.importorskip("pandas")

from values_tpu.core import nifti
from values_tpu.data import lidc

FEATURE_ATTRS = ["subtlety", "internalStructure", "calcification",
                 "sphericity", "margin", "lobulation", "spiculation",
                 "texture", "malignancy"]


class FakeAnnotation:
    def __init__(self, scan, rng, ratings):
        self.scan = scan
        self._rng = rng
        for attr, val in zip(FEATURE_ATTRS, ratings):
            setattr(self, attr, val)

    def uniform_cubic_resample(self, side, return_irp_pts=False,
                               resample_vol=True, irp_pts=None):
        assert side == 63
        rs = np.random.RandomState(self._rng)
        mask = rs.rand(64, 64, 64) > 0.8
        if resample_vol:
            vol = rs.rand(64, 64, 64).astype(np.float64)
            return vol, mask, ("irp", self._rng)
        assert irp_pts is not None and irp_pts[0] == "irp"
        return mask


class FakeScan:
    def __init__(self, scan_id, patient_id, nodules):
        self.id = scan_id
        self.patient_id = patient_id
        self._nodules = nodules

    def cluster_annotations(self):
        return self._nodules


def _build_dataset():
    """24 patients, 1-2 nodules each. A quarter of patients are OoD on
    the texture feature (ratings 1-2); the rest are ID (3-5). Two
    nodules have <4 raters (zero-filled masks at extraction; dropped by
    calculate_rater_agreement, matching the reference's all-None-free
    filter). One nodule's consensus mask is oversized and must be
    dropped at extraction."""
    scans = []
    rng = 0
    for p in range(24):
        patient = f"LIDC-IDRI-{p:04d}"
        nodules = []
        for n in range(1 + p % 2):
            # two specific nodules exercise the missing-rater path
            n_raters = 4 if (p, n) not in ((3, 0), (10, 1)) else 2 + n
            ood = p % 4 == 0
            ratings_list = []
            for r in range(n_raters):
                ratings = [((p + n + r) % 5) + 1 for _ in FEATURE_ATTRS]
                # consistent per-nodule texture side (no 2-2 rater ties)
                ratings[FEATURE_ATTRS.index("texture")] = (
                    1 + r % 2 if ood else 3 + r % 3)
                ratings_list.append(ratings)
            nodules.append((ratings_list, [rng + i for i in
                                           range(n_raters)]))
            rng += n_raters
        scan = FakeScan(len(scans) + 1, patient, [])
        for ratings_list, seeds in nodules:
            nod = [FakeAnnotation(scan, s, r)
                   for s, r in zip(seeds, ratings_list)]
            scan._nodules.append(nod)
        scans.append(scan)
    # one extra scan whose single nodule is oversized -> dropped
    big = FakeScan(len(scans) + 1, "LIDC-IDRI-9999", [])
    big._nodules.append([FakeAnnotation(big, 10_000, [1] * 9)])
    scans.append(big)
    return scans, big


@pytest.fixture()
def pylidc_shim(monkeypatch):
    scans, big_scan = _build_dataset()

    pylidc_mod = types.ModuleType("pylidc")
    utils_mod = types.ModuleType("pylidc.utils")

    class Scan:  # query sentinel
        pass

    def query(cls):
        assert cls is Scan
        return list(scans)

    def consensus(nod, clevel):
        if nod[0].scan is big_scan:
            return np.ones((80, 64, 64), bool), None, None
        return np.ones((32, 32, 32), bool), None, None

    pylidc_mod.Scan = Scan
    pylidc_mod.query = query
    pylidc_mod.utils = utils_mod
    utils_mod.consensus = consensus
    monkeypatch.setitem(sys.modules, "pylidc", pylidc_mod)
    monkeypatch.setitem(sys.modules, "pylidc.utils", utils_mod)
    return scans


@pytest.mark.slow
def test_extraction_pipeline(pylidc_shim, tmp_path):
    root = tmp_path / "lidc"
    lidc.save_cropped_nodules(str(root))

    meta = pd.read_csv(root / "metadata.csv")
    # 24 real scans with 1-2 nodules each; the oversized nodule is dropped
    expected_nodules = sum(1 + p % 2 for p in range(24))
    assert len(meta) == expected_nodules
    assert "LIDC-IDRI-9999" not in set(meta["Patient ID"])

    # every nodule: one image + exactly 4 rater masks (missing raters
    # zero-filled), and the rating lists are per-rater with None padding
    for _, row in meta.iterrows():
        img, _ = nifti.load(row["Image Save Path"])
        assert img.shape == (64, 64, 64)
        seg_paths = eval(row["Segmentation Save Paths"])
        assert len(seg_paths) == 4
        ratings = eval(str(row["texture"]).replace("nan", "None"))
        assert len(ratings) == 4
        n_real = sum(r is not None for r in ratings)
        assert 2 <= n_real <= 4
        for i, sp in enumerate(seg_paths):
            m, _ = nifti.load(sp)
            assert m.shape == (64, 64, 64)
            if i >= n_real:  # zero-filled missing rater
                assert not m.any()
            else:
                assert m.any()

    # stage 2: majority-vote ID/OoD labeling runs on the real metadata
    df = lidc.calculate_rater_agreement(str(root), save_df=True)
    assert "texture_id" in df.columns
    assert (root / "id_ood.csv").exists()
    assert set(map(type, df["texture_id"].tolist())) <= {bool, type(None)}

    # stage 3: patient-disjoint first-cycle splits from the executed chain
    splits_path = root / "splits" / "texture" / "firstCycle" / "splits.pkl"
    lidc.create_first_cycle_splits(
        str(splits_path), "texture", str(root / "id_ood.csv"), seed=123)
    import pickle
    with open(splits_path, "rb") as f:
        splits = pickle.load(f)
    assert len(splits) == 5
    stem_to_patient = {
        Path(p).name.replace(".nii.gz", ".npy"): pid
        for p, pid in zip(meta["Image Save Path"], meta["Patient ID"])}
    for s in splits:
        for key in ("train", "val", "id_test", "ood_test",
                    "id_unlabeled_pool", "ood_unlabeled_pool"):
            assert key in s
        train_pat = {stem_to_patient[p] for p in s["train"]}
        val_pat = {stem_to_patient[p] for p in s["val"]}
        test_pat = {stem_to_patient[p] for p in list(s["id_test"])
                    + list(s["ood_test"])}
        # train/val nodules never share a patient with test
        assert not (train_pat | val_pat) & test_pat
