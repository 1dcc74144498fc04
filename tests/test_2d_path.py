"""2D GTA path end-to-end: augmentations, dataset, datamodule, tester."""
import json
import pickle

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from values_tpu.data import cityscapes_labels as cs_labels
from values_tpu.data.augment2d import (StochasticLabelSwitches,
                                       get_augmentations_from_config)
from values_tpu.data.gta_preprocess import (color_mask_to_train_ids,
                                            label_ids_to_train_ids,
                                            train_ids_to_color)

H, W = 32, 48
NUM_CLASSES = 24

AUG_CONFIG = {
    "TRAIN": [{"Compose": {"transforms": [
        {"HorizontalFlip": {"p": 0.5}},
        {"Rotate": {"limit": 22.5, "border_mode": 0, "mask_value": 255}},
        {"RandomScale": {"scale_limit": [-0.2, 0.2], "p": 1.0}},
        {"PadIfNeeded": {"min_height": H, "min_width": W,
                         "border_mode": 0, "mask_value": 255}},
        {"RandomCrop": {"height": H, "width": W}},
        {"GaussNoise": None},
        {"Normalize": {"mean": [0.485, 0.456, 0.406],
                       "std": [0.229, 0.224, 0.225]}},
        {"StochasticLabelSwitches": {"always_apply": True, "p": 1.0}},
        {"ToTensorV2": None},
    ]}}],
    "VALIDATION": [{"Compose": {"transforms": [
        {"Normalize": {"mean": [0.485, 0.456, 0.406],
                       "std": [0.229, 0.224, 0.225]}},
        {"StochasticLabelSwitches": {"always_apply": True, "p": 1.0}},
        {"ToTensorV2": None},
    ]}}],
}
AUG_CONFIG["TEST"] = AUG_CONFIG["VALIDATION"]


def test_label_tables():
    assert cs_labels.name2trainId["road"] == 0
    assert cs_labels.name2trainId["road_2"] == 23
    assert cs_labels.id2trainId[7] == 0
    assert cs_labels.color2trainId[(128, 64, 128)] == 0
    # 24 classes total (19 + 5 switches)
    train_ids = {l.trainId for l in cs_labels.labels if l.trainId != 255}
    assert train_ids == set(range(24))


def test_color_roundtrip(rng):
    ids = rng.choice([0, 1, 8, 11, 13, 19, 23], size=(8, 8))
    color = train_ids_to_color(ids)
    back = color_mask_to_train_ids(color)
    np.testing.assert_array_equal(back, ids)


def test_label_id_mapping():
    ids = np.array([[0, 7, 8], [26, 33, 5]], dtype=np.uint8)
    train = label_ids_to_train_ids(ids)
    np.testing.assert_array_equal(train, [[255, 0, 1], [13, 18, 255]])


def test_stochastic_label_switches_statistics():
    np.random.seed(0)
    mask = np.zeros((20, 20), dtype=np.int64)  # all "road" (trainId 0)
    switch = StochasticLabelSwitches(always_apply=True, p=1.0)
    switched = sum(
        int(switch(image=None, mask=mask)["mask"].max() == 23)
        for _ in range(300))
    assert 60 < switched < 140  # p = 1/3


def test_switches_multi_reference():
    np.random.seed(0)
    mask = np.zeros((4, 4), dtype=np.int64)
    out = StochasticLabelSwitches(always_apply=True, p=1.0,
                                  n_reference_samples=5)(
        image=None, mask=mask)
    assert out["mask"].shape == (5, 4, 4)


def test_train_pipeline_output_shapes(rng):
    np.random.seed(1)
    import random
    random.seed(1)
    pipeline = get_augmentations_from_config(AUG_CONFIG["TRAIN"])[0]
    img = (rng.rand(H + 8, W + 8, 3) * 255).astype(np.uint8)
    mask = rng.randint(0, 19, size=(H + 8, W + 8)).astype(np.int64)
    out = pipeline(image=img, mask=mask)
    assert out["image"].shape == (H, W, 3)
    assert out["image"].dtype == np.float32
    assert out["mask"].shape == (H, W)
    # normalized roughly to imagenet stats range
    assert -3 < out["image"].mean() < 3


def make_gta_tree(root):
    """Synthetic preprocessed GTA/CS tree + splits (deterministic)."""
    rng = np.random.RandomState(0)
    root = __import__("pathlib").Path(root)
    names = {"gta": [f"{i:05d}.npy" for i in range(4)],
             "cs": [f"city_{i:03d}.npy" for i in range(4)]}
    for ds, sub in (("gta", "OriginalData"),
                    ("cs", "CityScapesOriginalData")):
        img_dir = root / sub / "preprocessed" / "images"
        lbl_dir = root / sub / "preprocessed" / "labels"
        img_dir.mkdir(parents=True)
        lbl_dir.mkdir(parents=True)
        for name in names[ds]:
            np.save(img_dir / name,
                    (rng.rand(H, W, 3) * 255).astype(np.uint8))
            mask = rng.randint(0, 19, size=(H, W)).astype(np.int64)
            mask[:2] = 255  # some ignore pixels
            np.save(lbl_dir / name, mask)
    splits = [{
        "train": [(n, "gta") for n in names["gta"][:2]],
        "val": [(names["gta"][2], "gta")],
        "id_test": [(names["gta"][3], "gta")],
        "ood_test": [(names["cs"][0], "cs")],
        "id_unlabeled_pool": [(names["cs"][1], "cs")],
        "ood_unlabeled_pool": [(names["cs"][2], "cs"),
                               (names["cs"][3], "cs")],
    }]
    splits_dir = root / "splits" / "firstCycle"
    splits_dir.mkdir(parents=True)
    with open(splits_dir / "splits.pkl", "wb") as f:
        pickle.dump(splits, f)
    return root


@pytest.fixture(scope="module")
def gta_tree(tmp_path_factory):
    return make_gta_tree(tmp_path_factory.mktemp("GTA"))


def _hrnet_hparams(gta_tree, tmp_path):
    from tests.test_hrnet import small_cfg
    cfg = small_cfg(num_classes=NUM_CLASSES)
    return {
        "exp_name": "Softmax-GTA", "version": 0, "seed": 123,
        "save_dir": str(tmp_path / "results"),
        "data_input_dir": str(gta_tree),
        "MODEL": cfg["MODEL"],
        "model": {
            "_target_": "values_tpu.models.hrnet.get_seg_model",
            "cfg": cfg,
        },
        "datamodule": {
            "_target_": "values_tpu.data.base_datamodule.BaseDataModule",
            "num_classes": NUM_CLASSES, "ignore_index": 255,
            "num_workers": 0, "batch_size": 2, "val_batch_size": 2,
            "data_fold_id": 0,
            "dataset": {
                "_target_":
                    "values_tpu.data.cityscapes_dataset.CityscapesDataset",
                "splits_path": str(gta_tree / "splits" / "firstCycle"
                                   / "splits.pkl"),
            },
        },
        "AUGMENTATIONS": AUG_CONFIG,
    }


def test_tester_2d_end_to_end(gta_tree, tmp_path):
    from values_tpu.inference import test_2d
    from values_tpu.models.hrnet import HighResolutionNet
    from values_tpu.training.checkpoint import save_checkpoint
    from tests.test_hrnet import small_cfg

    hparams = _hrnet_hparams(gta_tree, tmp_path)
    model = HighResolutionNet(cfg=small_cfg(num_classes=NUM_CLASSES))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0),
                                    jnp.zeros((1, H, W, 3)))
    ckpt = tmp_path / "hrnet.ckpt"
    save_checkpoint(str(ckpt), variables, hparams)

    args = test_2d.test_cli([
        "--checkpoint_paths", str(ckpt),
        "--test_split", "ood",
        "--n_pred", "2",
        "--n_reference_samples", "3",
    ])
    tester = test_2d.run_test(args)

    base = (tmp_path / "results" / "Softmax-GTA" / "test_results" / "0"
            / "ood")
    assert (base / "metrics.json").exists()
    metrics = json.loads((base / "metrics.json").read_text())
    image_id = [k for k in metrics if k != "mean"][0]
    assert {"dice", "ged"} <= set(metrics[image_id]["metrics"])
    assert 0 <= metrics["mean"]["metrics"]["dice"] <= 1
    # prediction PNGs: mean + 2 preds
    assert (base / "pred_seg" / f"{image_id}_mean.png").exists()
    assert (base / "pred_seg" / f"{image_id}_02.png").exists()
    # uncertainty TIFs for n_pred=2
    assert (base / "pred_entropy" / f"{image_id}.tif").exists()
    assert (base / "aleatoric_uncertainty" / f"{image_id}.tif").exists()
    # reference masks got 3 switched variants
    assert tester is not None


def test_tester_2d_tta_mode(gta_tree, tmp_path):
    """TTA 2D path: 4 dataset-provided variants, hflip outputs un-flipped."""
    from values_tpu.inference import test_2d
    from values_tpu.models.hrnet import HighResolutionNet
    from values_tpu.training.checkpoint import save_checkpoint
    from tests.test_hrnet import small_cfg

    hparams = _hrnet_hparams(gta_tree, tmp_path)
    model = HighResolutionNet(cfg=small_cfg(num_classes=NUM_CLASSES))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0),
                                    jnp.zeros((1, H, W, 3)))
    ckpt = tmp_path / "hrnet_tta.ckpt"
    save_checkpoint(str(ckpt), variables, hparams)

    args = test_2d.test_cli([
        "--checkpoint_paths", str(ckpt), "--test_split", "id",
        "-tta", "--n_reference_samples", "2",
    ])
    test_2d.run_test(args)
    base = (tmp_path / "results" / "Softmax-GTA" / "test_results" / "0"
            / "id")
    metrics = json.loads((base / "metrics.json").read_text())
    image_id = [k for k in metrics if k != "mean"][0]
    # 4 TTA variants -> mean + 4 prediction PNGs and full uncertainty set
    assert (base / "pred_seg" / f"{image_id}_mean.png").exists()
    assert (base / "pred_seg" / f"{image_id}_04.png").exists()
    assert (base / "epistemic_uncertainty" / f"{image_id}.tif").exists()


def test_tester_2d_sliding_window(gta_tree, tmp_path):
    """--sliding_window through the 2D tester CLI: 32x48 images, 16x24
    windows (3x3 regular grid after quilt padding) — drives the
    parity-quilt stitch end-to-end and checks the metrics/artifact
    contract matches the whole-image path's."""
    from values_tpu.inference import test_2d
    from values_tpu.models.hrnet import HighResolutionNet
    from values_tpu.training.checkpoint import save_checkpoint
    from tests.test_hrnet import small_cfg

    hparams = _hrnet_hparams(gta_tree, tmp_path)
    model = HighResolutionNet(cfg=small_cfg(num_classes=NUM_CLASSES))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0),
                                    jnp.zeros((1, H, W, 3)))
    ckpt = tmp_path / "hrnet_sw.ckpt"
    save_checkpoint(str(ckpt), variables, hparams)

    args = test_2d.test_cli([
        "--checkpoint_paths", str(ckpt), "--test_split", "id",
        "--n_pred", "2", "--n_reference_samples", "2",
        "--sliding_window", "16", "24",
    ])
    test_2d.run_test(args)
    base = (tmp_path / "results" / "Softmax-GTA" / "test_results" / "0"
            / "id")
    metrics = json.loads((base / "metrics.json").read_text())
    image_id = [k for k in metrics if k != "mean"][0]
    assert 0 <= metrics["mean"]["metrics"]["dice"] <= 1
    assert (base / "pred_seg" / f"{image_id}_mean.png").exists()
    assert (base / "pred_entropy" / f"{image_id}.tif").exists()


def test_tester_2d_bfloat16(gta_tree, tmp_path):
    """--dtype bfloat16: bf16 compute, f32 softmax/statistics (the 2D
    analog of the 3D engine's bf16 mode). The artifact contract is
    unchanged and the softmax deviation from the f32 path stays small
    (the bench cross-checks the full-size W48 the same way)."""
    from values_tpu.inference import test_2d
    from values_tpu.models.hrnet import HighResolutionNet
    from values_tpu.training.checkpoint import save_checkpoint
    from tests.test_hrnet import small_cfg

    hparams = _hrnet_hparams(gta_tree, tmp_path)
    model = HighResolutionNet(cfg=small_cfg(num_classes=NUM_CLASSES))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0),
                                    jnp.zeros((1, H, W, 3)))
    # bf16-compute forward stays close to f32 on the same weights
    m16 = HighResolutionNet(cfg=small_cfg(num_classes=NUM_CLASSES),
                            dtype=jnp.bfloat16)
    x = jnp.asarray(np.random.RandomState(0)
                    .rand(2, H, W, 3).astype(np.float32))
    p32 = jax.nn.softmax(model.apply(variables, x, train=False), axis=-1)
    p16 = jax.nn.softmax(
        m16.apply(variables, x.astype(jnp.bfloat16),
                  train=False).astype(jnp.float32), axis=-1)
    assert float(jnp.mean(jnp.abs(p32 - p16))) < 5e-3

    ckpt = tmp_path / "hrnet_bf16.ckpt"
    save_checkpoint(str(ckpt), variables, hparams)
    args = test_2d.test_cli([
        "--checkpoint_paths", str(ckpt), "--test_split", "id",
        "--n_pred", "2", "--n_reference_samples", "2",
        "--dtype", "bfloat16",
    ])
    test_2d.run_test(args)
    base = (tmp_path / "results" / "Softmax-GTA" / "test_results" / "0"
            / "id")
    metrics = json.loads((base / "metrics.json").read_text())
    image_id = [k for k in metrics if k != "mean"][0]
    assert 0 <= metrics["mean"]["metrics"]["dice"] <= 1
    assert (base / "pred_seg" / f"{image_id}_mean.png").exists()
    assert (base / "pred_entropy" / f"{image_id}.tif").exists()


def test_tester_2d_float64_requires_x64(gta_tree, tmp_path):
    """--dtype float64 without x64 mode raises loudly instead of
    silently demoting the parity harness to f32 (jnp drops f64 to f32
    when jax_enable_x64 is off)."""
    from values_tpu.inference import test_2d
    from values_tpu.models.hrnet import HighResolutionNet
    from values_tpu.training.checkpoint import save_checkpoint
    from tests.test_hrnet import small_cfg

    hparams = _hrnet_hparams(gta_tree, tmp_path)
    model = HighResolutionNet(cfg=small_cfg(num_classes=NUM_CLASSES))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0),
                                    jnp.zeros((1, H, W, 3)))
    ckpt = tmp_path / "hrnet_f64.ckpt"
    save_checkpoint(str(ckpt), variables, hparams)
    args = test_2d.test_cli([
        "--checkpoint_paths", str(ckpt), "--test_split", "id",
        "--n_pred", "1", "--dtype", "float64",
    ])
    assert not jax.config.jax_enable_x64
    with pytest.raises(ValueError, match="JAX_ENABLE_X64"):
        test_2d.run_test(args)
