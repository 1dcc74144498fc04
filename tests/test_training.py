"""End-to-end toy training: generate -> preprocess -> fit -> checkpoint.

The JAX analog of SURVEY.md §4 item (5): a tiny end-to-end pipeline test on
generated toy data (16^3 volumes, patch 16, filter size 2 for CPU speed).
"""
import os
import pickle

import numpy as np
import pytest

from values_tpu.config import compose, make_config
from values_tpu.data.toy_generation import ToyGenConfig, generate_samples
from values_tpu.training.loops import fit
from values_tpu.training.checkpoint import load_any_checkpoint

P = 16


@pytest.fixture(scope="module")
def toy_dataset(tmp_path_factory):
    """A miniature Case_1-style dataset: 6 train + 2 test images."""
    import random
    root = tmp_path_factory.mktemp("ToyData")
    case = root / "Case_1"
    for split, n in (("Tr", 6), ("Ts", 2)):
        cfg = ToyGenConfig(
            input_files=["ballSphere.stl"], save_path=str(case / f"images{split}"),
            n_samples=n, image_size=(P, P, P), min_object_ratio=5,
            max_object_ratio=2, gauss_sigma=2, blur=True, segmentation=True,
            n_raters=3, seed=1 if split == "Tr" else 2)
        random.seed(cfg.seed)
        np.random.seed(cfg.seed)
        generate_samples(cfg)
        seg = case / f"images{split}" / "segmentation"
        (case / f"labels{split}").mkdir(exist_ok=True)
        for f in seg.iterdir():
            f.rename(case / f"labels{split}" / f.name)
        seg.rmdir()
    return root


def _tiny_cfg(toy_dataset, tmp_path, config_name="softmax_config",
              **extra):
    overrides = [
        f"data_input_dir={toy_dataset}",
        f"save_dir={tmp_path}/exp",
        "max_epochs=2",
        "batch_size=2",
        "datamodule.patch_size=16",
        "datamodule.batch_size=2",
        "datamodule.data_num_folds=3",
        "model.initial_filter_size=2",
        "version=0",
    ] + [f"{k}={v}" for k, v in extra.items()]
    return compose("configs", config_name, overrides)


def test_toy_generation_properties(toy_dataset):
    import glob
    images = sorted(glob.glob(str(toy_dataset / "Case_1/imagesTr/*.nii.gz")))
    labels = sorted(glob.glob(str(toy_dataset / "Case_1/labelsTr/*.nii.gz")))
    assert len(images) == 6
    assert len(labels) == 18  # 3 raters
    from values_tpu.core import nifti
    img, _ = nifti.load(images[0])
    assert img.shape == (P, P, P)
    seg, _ = nifti.load(labels[0])
    assert set(np.unique(seg)) <= {0, 1}
    assert seg.sum() > 0  # object present


def test_fit_softmax_and_checkpoint(toy_dataset, tmp_path):
    cfg = _tiny_cfg(toy_dataset, tmp_path)
    ckpt_path = fit(cfg)
    assert os.path.exists(ckpt_path)
    hparams, variables = load_any_checkpoint(ckpt_path)
    assert hparams["exp_name"] == "Softmax-Case-1"
    assert hparams["datamodule"]["patch_size"] == 16
    assert "params" in variables
    # splits file created with expected schema
    with open(toy_dataset / "Case_1" / "splits.pkl", "rb") as f:
        splits = pickle.load(f)
    assert len(splits) == 3
    assert {"train", "val", "test"} == set(splits[0].keys())
    # checkpoint round-trips into the inference engine
    from values_tpu.config import instantiate
    from values_tpu.inference.engine import SlidingWindowEngine
    model = instantiate(make_config(hparams["model"]))
    engine = SlidingWindowEngine(model, [variables], mode="default",
                                 n_pred=1, patch_size=16)
    vol = np.load(str(toy_dataset / "Case_1/preprocessed/imagesTs/0000.npy"))
    softmax_sums, *_ = engine.run_volume(vol.astype(np.float32))
    assert softmax_sums.shape == (1, 2, P, P, P)
    np.testing.assert_allclose(softmax_sums[0].sum(0), 1.0, atol=1e-5)


def test_inference_cli_from_checkpoint(toy_dataset, tmp_path):
    """Full reference workflow: train -> test_3D-style CLI -> output tree."""
    from values_tpu.inference import test_3d

    cfg = _tiny_cfg(toy_dataset, tmp_path)
    ckpt_path = fit(cfg)
    args = test_3d.test_cli([
        "--checkpoint_paths", ckpt_path, ckpt_path,   # 2-member ensemble
        "--test_split", "test",
        "--save_dir", str(tmp_path / "results"),
    ])
    carrier = test_3d.run_test(args)
    base = (tmp_path / "results" / "Softmax-Case-1" / "test_results"
            / "0" / "test")
    assert (base / "metrics.json").exists()
    assert (base / "pred_entropy").is_dir()  # ensemble => uncertainty
    assert (base / "pred_seg" / "0000_mean.nii.gz").exists()
    import json
    metrics = json.loads((base / "metrics.json").read_text())
    assert "ged" in metrics["mean"]
    assert 0.0 <= metrics["mean"]["dice"] <= 1.0
    # every test image covered
    assert len(carrier.data) == 2


@pytest.mark.slow
def test_fit_ssn(toy_dataset, tmp_path):
    cfg = _tiny_cfg(toy_dataset, tmp_path, config_name="ssn_config",
                    pretrain_epochs=1, n_aleatoric_samples=3)
    ckpt_path = fit(cfg)
    hparams, variables = load_any_checkpoint(ckpt_path)
    assert "mean_conv" in variables["params"]


def test_fit_resume(toy_dataset, tmp_path):
    cfg = _tiny_cfg(toy_dataset, tmp_path, max_epochs=1)
    ckpt1 = fit(cfg)
    hp1, _ = load_any_checkpoint(ckpt1)
    from values_tpu.training.checkpoint import load_checkpoint
    payload1 = load_checkpoint(ckpt1)
    assert payload1["epoch"] == 0 and payload1["opt_state"] is not None

    cfg2 = _tiny_cfg(toy_dataset, tmp_path, max_epochs=2)
    ckpt2 = fit(cfg2, resume_from=ckpt1)
    payload2 = load_checkpoint(ckpt2)
    assert payload2["epoch"] == 1
    assert payload2["global_step"] > payload1["global_step"]


@pytest.mark.slow
def test_aleatoric_train_and_inference(toy_dataset, tmp_path):
    """Aleatoric logit-sampling path end to end: train with
    aleatoric_loss=True, infer in 'aleatoric' mode, sigma volumes saved."""
    from values_tpu.inference import test_3d

    cfg = _tiny_cfg(toy_dataset, tmp_path, max_epochs=1,
                    **{"+aleatoric_loss": "true",
                       "+n_aleatoric_samples": 3})
    ckpt = fit(cfg)
    args = test_3d.test_cli([
        "--checkpoint_paths", ckpt, "--test_split", "test",
        "--n_pred", "3", "--save_dir", str(tmp_path / "res")])
    test_3d.run_test(args)
    base = (tmp_path / "res" / "Softmax-Case-1" / "test_results" / "0"
            / "test")
    assert (base / "sigma" / "0000_01.nii.gz").exists()
    assert (base / "pred_entropy" / "0000.nii.gz").exists()


@pytest.mark.slow
def test_ssn_inference_from_checkpoint(toy_dataset, tmp_path):
    """SSN engine mode through the 3D CLI: distribution sampling, swapped
    aleatoric/epistemic labeling."""
    from values_tpu.inference import test_3d

    cfg = _tiny_cfg(toy_dataset, tmp_path, config_name="ssn_config",
                    pretrain_epochs=1, max_epochs=1, n_aleatoric_samples=2)
    ckpt = fit(cfg)
    args = test_3d.test_cli([
        "--checkpoint_paths", ckpt, "--test_split", "test",
        "--n_pred", "4", "--save_dir", str(tmp_path / "res")])
    carrier = test_3d.run_test(args)
    base = (tmp_path / "res" / "SSN-Case-1" / "test_results" / "0"
            / "test")
    assert (base / "pred_seg" / "0000_04.nii.gz").exists()
    assert (base / "aleatoric_uncertainty" / "0000.nii.gz").exists()
    first = next(iter(carrier.data.values()))
    assert first["softmax_pred"].shape[0] == 4


def test_gradient_clip_matches_torch_transcript():
    """optim.clip_grads_by_global_norm must reproduce
    torch.nn.utils.clip_grad_norm_ on a fixed gradient pytree (the PL
    Trainer behavior behind gradient_clip_val, reference main.py:66-74)."""
    import jax.numpy as jnp
    import torch
    from values_tpu.training.optim import clip_grads_by_global_norm

    rs = np.random.RandomState(0)
    leaves = [rs.randn(3, 4).astype(np.float32) * 5,
              rs.randn(7).astype(np.float32) * 0.1,
              rs.randn(2, 2, 2).astype(np.float32) * 2]
    for max_norm in (0.5, 5.0, 1000.0):  # clipping active and inactive
        tparams = [torch.nn.Parameter(torch.zeros(l.shape)) for l in leaves]
        for p, g in zip(tparams, leaves):
            p.grad = torch.from_numpy(g.copy())
        torch.nn.utils.clip_grad_norm_(tparams, max_norm)
        expect = [p.grad.numpy() for p in tparams]
        got = clip_grads_by_global_norm(
            [jnp.asarray(l) for l in leaves], max_norm)
        for e, g in zip(expect, got):
            np.testing.assert_allclose(np.asarray(g), e, atol=1e-6)


def test_gradient_clip_applied_in_train_step(toy_dataset, tmp_path):
    """A config with gradient_clip_val must produce a different first-step
    update than one without (and still train to finite loss)."""
    import jax
    import jax.numpy as jnp
    from values_tpu.training.experiment import Experiment

    cfg = _tiny_cfg(toy_dataset, tmp_path)
    cfg["gradient_clip_val"] = 1e-3  # aggressive so the step visibly shrinks
    clipped = Experiment(cfg)
    assert clipped.gradient_clip_val == 1e-3
    plain = Experiment(_tiny_cfg(toy_dataset, tmp_path))
    assert plain.gradient_clip_val is None

    rng = jax.random.PRNGKey(0)
    batch = {
        "data": jnp.asarray(np.random.RandomState(1).rand(2, P, P, P, 1),
                            dtype=jnp.float32),
        "seg": jnp.asarray(
            (np.random.RandomState(2).rand(2, P, P, P) > 0.5).astype(
                np.int32)),
    }
    state_c = clipped.init_state(rng, P)
    state_p = plain.init_state(rng, P)
    # train_step donates its state; snapshot initial params first
    init_c = jax.tree_util.tree_map(np.asarray, state_c.params)
    init_p = jax.tree_util.tree_map(np.asarray, state_p.params)
    new_c, loss_c = clipped.train_step(state_c, dict(batch), rng)
    new_p, loss_p = plain.train_step(state_p, dict(batch), rng)
    np.testing.assert_allclose(float(loss_c), float(loss_p), atol=1e-6)
    delta_c = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(np.asarray(a) - b).max()), new_c.params,
        init_c)
    delta_p = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(np.asarray(a) - b).max()), new_p.params,
        init_p)
    # Adam normalizes step size, but the very first step's bias-corrected
    # moments make the clipped update strictly smaller on some leaf
    c_max = max(jax.tree_util.tree_leaves(delta_c))
    p_max = max(jax.tree_util.tree_leaves(delta_p))
    assert np.isfinite(c_max) and np.isfinite(p_max)
    assert c_max != p_max


def test_loader_worker_count_independence(tmp_path):
    """num_workers >= 1 batches are bit-identical regardless of worker
    count (per-sample RNG streams), across epochs."""
    from values_tpu.data.pipeline import NumpyBatchLoader

    rs = np.random.RandomState(3)
    samples = []
    for i in range(7):
        img = tmp_path / f"img{i}.npy"
        np.save(img, rs.rand(12, 12, 12).astype(np.float32))
        raters = []
        for r in range(3):
            lab = tmp_path / f"img{i}_{r:02d}.npy"
            np.save(lab, (rs.rand(12, 12, 12) > 0.5).astype(np.int32))
            raters.append(str(lab))
        samples.append({"image_path": str(img), "label_paths": raters})

    def epochs(workers):
        loader = NumpyBatchLoader(samples, batch_size=2, patch_size=8,
                                  training=True, augment=True, seed=7,
                                  num_workers=workers)
        return [[b for b in loader] for _ in range(2)]

    a, b = epochs(1), epochs(4)
    for ea, eb in zip(a, b):
        assert len(ea) == len(eb)
        for ba, bb in zip(ea, eb):
            np.testing.assert_array_equal(ba["data"], bb["data"])
            np.testing.assert_array_equal(ba["seg"], bb["seg"])
            assert ba["label_paths"] == bb["label_paths"]
    # and the two epochs differ from each other (per-epoch reshuffle/crops)
    assert not np.array_equal(a[0][0]["data"], a[1][0]["data"])


def test_fit_mixed_precision_bf16(toy_dataset, tmp_path):
    """precision=bf16: params stay f32 (master weights), training runs and
    tracks the f32 loss closely over the first steps."""
    import jax

    losses = {}
    for precision in ("32", "bf16"):
        cfg = _tiny_cfg(toy_dataset, tmp_path / precision,
                        **{"precision": precision, "max_epochs": 1,
                           "datamodule.num_workers": 2})
        from values_tpu.training.experiment import Experiment
        exp = Experiment(cfg)
        assert exp.mixed_bf16 == (precision == "bf16")
        state = exp.init_state(jax.random.PRNGKey(0), 16, 1)
        leaves = jax.tree_util.tree_leaves(state.params)
        assert all(l.dtype == np.float32 for l in leaves)
        batch = {
            "data": np.random.RandomState(0).rand(2, 16, 16, 16, 1)
            .astype(np.float32),
            "seg": (np.random.RandomState(1).rand(2, 16, 16, 16) > 0.5)
            .astype(np.int32)}
        import jax.numpy as jnp
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        ls = []
        rng = jax.random.PRNGKey(42)
        for i in range(3):
            state, loss = exp.train_step(state, batch, rng)
            ls.append(float(loss))
        losses[precision] = ls
        # master weights still f32 after updates
        assert all(l.dtype == np.float32
                   for l in jax.tree_util.tree_leaves(state.params))
    np.testing.assert_allclose(losses["bf16"], losses["32"],
                               rtol=2e-2, atol=2e-2)


def test_fit_hybrid_dcn_mesh(tmp_path):
    """devices=8 + dcn_granules=2 trains through the granule-major
    hybrid mesh on the virtual 8-device CPU mesh (the multi-slice
    production config shape). Needs >= 8 train images per batch, so it
    generates its own 16-image toy set."""
    import random
    from values_tpu.config import compose
    root = tmp_path / "data"
    case = root / "Case_1"
    for split, n in (("Tr", 16), ("Ts", 2)):
        gen = ToyGenConfig(
            input_files=["ballSphere.stl"],
            save_path=str(case / f"images{split}"), n_samples=n,
            image_size=(P, P, P), min_object_ratio=5, max_object_ratio=2,
            gauss_sigma=2, blur=True, segmentation=True, n_raters=2,
            seed=5 if split == "Tr" else 6)
        random.seed(gen.seed)
        np.random.seed(gen.seed)
        generate_samples(gen)
        seg = case / f"images{split}" / "segmentation"
        (case / f"labels{split}").mkdir(exist_ok=True)
        for f in seg.iterdir():
            f.rename(case / f"labels{split}" / f.name)
        seg.rmdir()
    cfg = compose("configs", "softmax_config", [
        f"data_input_dir={root}", f"save_dir={tmp_path}/exp",
        "max_epochs=1", "batch_size=8", "datamodule.patch_size=16",
        "datamodule.batch_size=8", "datamodule.data_num_folds=3",
        "datamodule.num_raters=2", "model.initial_filter_size=2",
        "version=0", "+devices=8", "+dcn_granules=2"])
    ckpt = fit(cfg)
    assert os.path.exists(ckpt)
