"""Real-scale end-to-end demo on actual hardware: toy Case_1 at 64^3.

generate -> preprocess -> train (2 seeds) -> ensemble inference ->
aggregation -> OoD/failure-detection/calibration/ambiguity evaluation.
Writes a summary JSON. Run: python scripts/demo_toy_e2e.py <workdir>
"""
import json
import random
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main(workdir: str) -> None:
    t_start = time.time()
    work = Path(workdir)
    data_dir = work / "ToyData"
    exp_dir = work / "Experiments"

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      str(Path(__file__).resolve().parents[1] / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    print("devices:", jax.devices(), flush=True)

    # 1. generate a reduced Case_1 (64^3, 16 train / 24 test with ids
    #    spanning the toy OoD rule boundary id>20)
    from values_tpu.data.toy_generation import ToyGenConfig, generate_samples
    case = data_dir / "Case_1"
    for split, n, seed in (("Tr", 16, 16), ("Ts", 24, 5)):
        cfg = ToyGenConfig(save_path=str(case / f"images{split}"),
                           n_samples=n, image_size=(64, 64, 64),
                           min_object_ratio=5, max_object_ratio=2,
                           gauss_sigma=2, blur=True, segmentation=True,
                           n_raters=3, seed=seed)
        random.seed(cfg.seed)
        np.random.seed(cfg.seed)
        generate_samples(cfg)
        seg = case / f"images{split}" / "segmentation"
        (case / f"labels{split}").mkdir(exist_ok=True)
        for f in seg.iterdir():
            f.rename(case / f"labels{split}" / f.name)
        seg.rmdir()
    print(f"[{time.time()-t_start:.0f}s] generated", flush=True)

    # 2. train two ensemble members (different seeds); on a real chip the
    #    packed custom-VJP conv backend carries the step (ROADMAP: 31.5 ms
    #    bf16 at batch 8 vs 79.2 XLA)
    on_tpu = jax.devices()[0].platform == "tpu"
    backend = ["train_backend=packed"] if on_tpu else []
    from values_tpu.config import compose
    ckpts = []
    for seed in (123, 124):
        cfg = compose("configs", "softmax_config", overrides=[
            f"data_input_dir={data_dir}", f"save_dir={exp_dir}",
            "max_epochs=3", "batch_size=4", "datamodule.batch_size=4",
            "datamodule.data_num_folds=4", f"seed={seed}",
            f"version=seed{seed}"] + backend)
        from values_tpu.training.loops import fit
        ckpts.append(fit(cfg))
        print(f"[{time.time()-t_start:.0f}s] trained seed {seed}", flush=True)

    # 3. ensemble-2 inference on the test split (grouped-conv path)
    from values_tpu.inference import test_3d
    args = test_3d.test_cli([
        "--checkpoint_paths", *ckpts, "--test_split", "test",
        "--exp_name", "Ensemble-Case-1", "--save_dir", str(exp_dir)])
    test_3d.run_test(args)
    print(f"[{time.time()-t_start:.0f}s] inference done", flush=True)

    version_dir = exp_dir / "Ensemble-Case-1" / "test_results" / "seed123"
    split_dir = version_dir / "test"
    metrics = json.loads((split_dir / "metrics.json").read_text())

    # 3.5 scores-only API (TPU): the fully-packed per-volume scorer — one
    #     compiled program, 10 scalars per volume leave the chip
    scoring_vps = None
    if on_tpu:
        import jax.numpy as jnp
        from values_tpu.inference.scoring import make_packed_scorer
        from values_tpu.models.ensemble_unet3d import group_member_variables
        from values_tpu.training.checkpoint import load_any_checkpoint
        member_vars = []
        for c in ckpts:
            hparams, variables = load_any_checkpoint(c)
            member_vars.append(variables)
        stacked = group_member_variables(member_vars)
        # the PREPROCESSED (z-scored) volumes the model was trained on
        pre = case / "preprocessed"
        imgs = sorted((pre / "imagesTs").glob("*.npy"))[:8]
        labs = [pre / "labelsTs" / f"{p.name.split('.')[0]}_00.npy"
                for p in imgs]
        vols = jnp.asarray(np.stack(
            [np.load(str(p)) for p in imgs])[..., None], jnp.float32)
        gt = jnp.asarray(np.stack(
            [np.load(str(p)) for p in labs]).astype(np.int32))
        score, rows = make_packed_scorer(len(ckpts), 64)
        out = np.asarray(score(stacked, vols, gt, jax.random.PRNGKey(0)))
        t0 = time.time()
        out = np.asarray(score(stacked, vols, gt, jax.random.PRNGKey(0)))
        scoring_vps = round(len(imgs) / (time.time() - t0), 1)
        print(f"[{time.time()-t_start:.0f}s] packed scorer: "
              f"{scoring_vps} vol/s; dice={out[0].round(3).tolist()}",
              flush=True)

    # 4. evaluation chain on the test split (as both val + analysis split)
    from values_tpu.evaluation.experiment_version import ExperimentVersion
    from values_tpu.evaluation.experiment_dataloader import ExperimentDataloader
    from values_tpu.evaluation import aggregate_uncertainties as AGG
    from values_tpu.evaluation import find_threshold as FT
    from values_tpu.evaluation.metrics import aurc, ace, ncc, auroc

    version = ExperimentVersion(
        base_path=exp_dir, naming_scheme_version="seed{seed}",
        naming_scheme_pred_model="{pred_model}-Case-{case}",
        pred_model="Ensemble", image_ending=".nii.gz", unc_ending=".nii.gz",
        unc_types=["predictive_uncertainty", "aleatoric_uncertainty",
                   "epistemic_uncertainty"],
        aggregations=["patch_level", "image_level", "threshold"],
        n_reference_segs=3, case=1, seed="123", fold=0)
    dl = ExperimentDataloader(version, "test")
    qdict = FT.get_foreground_quantile(dl)
    FT.save_foreground_quantiles(qdict, exp_dir)
    FT.find_threshold(FT.threshold_images_paths(dl), exp_dir, exp_dir)
    AGG.aggregate_uncertainties(dl, {
        "patch_level": {"_target_": "values_tpu.evaluation."
                        "aggregate_uncertainties.patch_level_aggregation",
                        "patch_size": 10},
        "image_level": {"_target_": "values_tpu.evaluation."
                        "aggregate_uncertainties.image_level_aggregation"},
        "threshold": {"_target_": "values_tpu.evaluation."
                      "aggregate_uncertainties.threshold_aggregation",
                      "threshold_path": str(exp_dir /
                                            "threshold_analysis.json")},
    })
    aurc.main(dl)
    ncc.main(dl)
    auroc.ood_detection(dl)  # toy id>20 rule
    ace.platt_scale_params(dl)  # fit on same split (demo)
    ace.calibration_error(dl)
    print(f"[{time.time()-t_start:.0f}s] evaluation done", flush=True)

    fd = json.loads((split_dir / "failure_detection.json").read_text())
    amb = json.loads((split_dir / "ambiguity_modeling.json").read_text())
    ood = json.loads((version_dir / "ood_detection.json").read_text())
    calib = json.loads((split_dir / "calibration.json").read_text())
    summary = {
        "wall_s": round(time.time() - t_start, 1),
        "packed_scorer_vol_per_s": scoring_vps,
        "dice_mean": metrics["mean"]["dice"],
        "ged_mean": metrics["mean"].get("ged"),
        "aurc_pe_patch": fd["mean"]["predictive_uncertainty"][
            "patch_level"]["metrics"]["aurc"],
        "ncc_pe": amb["mean"]["predictive_uncertainty"]["metrics"]["ncc"],
        "auroc_pe_image": ood["mean"]["predictive_uncertainty"][
            "image_level"]["metrics"]["auroc"],
        "ace_pe": calib["mean"]["predictive_uncertainty"]["metrics"]["ace"],
    }
    (work / "summary.json").write_text(json.dumps(summary, indent=2))
    print(json.dumps(summary, indent=2), flush=True)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/values_tpu_demo")
