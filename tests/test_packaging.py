"""Packaging + plateau-LR parity tests (VERDICT r2 items 9 and 10).

Entry points mirror the reference's setup.py console surface
(reference: setup.py:1); plateau semantics mirror torch's
ReduceLROnPlateau rel-threshold (reference: lightning_experiment.py
optimizer fallback).
"""
import importlib

import numpy as np
import pytest

from values_tpu.training import optim

try:
    import tomllib
except ImportError:  # pragma: no cover
    tomllib = None


@pytest.mark.skipif(tomllib is None, reason="tomllib unavailable")
def test_entry_points_resolve():
    import pathlib
    root = pathlib.Path(__file__).resolve().parents[1]
    with open(root / "pyproject.toml", "rb") as f:
        meta = tomllib.load(f)
    scripts = meta["project"]["scripts"]
    assert len(scripts) >= 9
    for name, target in scripts.items():
        mod_name, func_name = target.split(":")
        mod = importlib.import_module(mod_name)
        assert callable(getattr(mod, func_name)), f"{name} -> {target}"


def _torch_plateau_transcript(losses, patience, factor, threshold,
                              base_lr):
    """Run torch's ReduceLROnPlateau over the loss sequence, return the
    per-epoch LR transcript."""
    torch = pytest.importorskip("torch")
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=base_lr)
    sched = torch.optim.lr_scheduler.ReduceLROnPlateau(
        opt, mode="min", patience=patience, factor=factor,
        threshold=threshold, threshold_mode="rel")
    out = []
    for loss in losses:
        sched.step(loss)
        out.append(opt.param_groups[0]["lr"])
    return out


@pytest.mark.parametrize("losses", [
    # plateaus exactly at the rel threshold: strict < would call 0.99995
    # an improvement; torch's rel mode does not
    [1.0, 0.99995, 0.99995, 0.99995, 0.99994],
    # monotone decrease, never reduces
    [1.0, 0.9, 0.8, 0.7],
    # long plateau forcing two reductions
    [1.0] + [1.0] * 9,
    # noise around a plateau
    [0.5, 0.6, 0.49, 0.5, 0.6, 0.7, 0.489, 0.6],
])
def test_plateau_tracker_matches_torch(losses):
    patience, factor, threshold, base_lr = 2, 0.1, 1e-4, 0.01
    sched = optim.reduce_lr_on_plateau(
        patience=patience, factor=factor, threshold=threshold)(base_lr)
    tracker = optim.PlateauTracker(sched)
    ours = [tracker.step(v) for v in losses]
    theirs = _torch_plateau_transcript(losses, patience, factor,
                                       threshold, base_lr)
    np.testing.assert_allclose(ours, theirs, rtol=1e-12)


def test_plateau_default_threshold_is_torch_default():
    sched = optim.reduce_lr_on_plateau()(0.1)
    assert sched.threshold == 1e-4
