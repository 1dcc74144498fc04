"""Golden end-to-end regression for the 2D (GTA/HRNet) path: numeric
outputs of the 2D tester pinned from a deterministic run (companion to
tests/test_golden_e2e.py for 3D). Regenerate after INTENDED changes:

    VALUES_GOLDEN_UPDATE=1 python -m pytest tests/test_golden_2d.py
"""
import json
import os
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

GOLDEN = Path(__file__).parent / "golden" / "gta_2d.json"


@pytest.fixture(scope="module")
def run_2d(tmp_path_factory):
    from tests.test_2d_path import (NUM_CLASSES, _hrnet_hparams,
                                    make_gta_tree)
    from tests.test_hrnet import small_cfg
    from values_tpu.inference import test_2d
    from values_tpu.models.hrnet import HighResolutionNet
    from values_tpu.training.checkpoint import save_checkpoint

    work = tmp_path_factory.mktemp("golden2d")
    gta = make_gta_tree(work / "GTA")
    hparams = _hrnet_hparams(gta, work)
    model = HighResolutionNet(cfg=small_cfg(num_classes=NUM_CLASSES))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0),
                                    jnp.zeros((1, 32, 48, 3)))
    ckpt = work / "hrnet.ckpt"
    save_checkpoint(str(ckpt), variables, hparams)
    args = test_2d.test_cli([
        "--checkpoint_paths", str(ckpt), "--test_split", "ood",
        "--n_pred", "2", "--n_reference_samples", "3"])
    test_2d.run_test(args)
    return (work / "results" / "Softmax-GTA" / "test_results" / "0"
            / "ood")


def test_golden_2d(run_2d):
    import cv2  # the tester writes float TIFs via cv2

    metrics = json.loads((run_2d / "metrics.json").read_text())
    image_id = [k for k in metrics if k != "mean"][0]
    pe = cv2.imread(str(run_2d / "pred_entropy" / f"{image_id}.tif"),
                    cv2.IMREAD_UNCHANGED)
    au = cv2.imread(str(run_2d / "aleatoric_uncertainty"
                        / f"{image_id}.tif"), cv2.IMREAD_UNCHANGED)
    got = {
        "mean": metrics["mean"]["metrics"],
        "image": metrics[image_id]["metrics"],
        "pred_entropy_sum": float(np.sum(pe)),
        "pred_entropy_max": float(np.max(pe)),
        "aleatoric_sum": float(np.sum(au)),
    }
    if os.environ.get("VALUES_GOLDEN_UPDATE") == "1":
        GOLDEN.parent.mkdir(exist_ok=True)
        GOLDEN.write_text(json.dumps(got, indent=2, sort_keys=True))
        pytest.skip("golden file regenerated")
    assert GOLDEN.exists(), ("no golden file; run with "
                             "VALUES_GOLDEN_UPDATE=1 to create it")
    want = json.loads(GOLDEN.read_text())

    def walk(a, b, path=""):
        if isinstance(a, dict):
            assert sorted(a) == sorted(b), path
            for k in a:
                walk(a[k], b[k], f"{path}.{k}")
        else:
            np.testing.assert_allclose(a, b, rtol=2e-4, atol=1e-6,
                                       err_msg=path)

    walk(got, want)
