"""TensorBoard logging + experiment-version bookkeeping.

The reference logs scalars, hparams and validation segmentation grids via
PL's TensorBoardLogger (reference: uncertainty_modeling/main.py:64-65,
lightning_experiment.py:127-160, 267-375). tensorboardX writes the same
event-file format; version directories follow the logger's
``save_dir/name/version_N`` (or explicit version) convention so the
evaluation layer's naming schemes keep working.
"""
from __future__ import annotations

import os
from typing import Dict

import numpy as np


class TensorBoardLogger:
    def __init__(self, save_dir: str, name: str = "default",
                 version=None, **_ignored):
        self.save_dir = save_dir
        self.name = name
        self._version = version
        self._writer = None

    @property
    def version(self):
        if self._version is None:
            self._version = self._next_version()
        return self._version

    def _next_version(self) -> int:
        root = os.path.join(self.save_dir, self.name)
        if not os.path.isdir(root):
            return 0
        versions = []
        for d in os.listdir(root):
            if d.startswith("version_"):
                try:
                    versions.append(int(d.split("_")[1]))
                except ValueError:
                    pass
        return max(versions) + 1 if versions else 0

    @property
    def log_dir(self) -> str:
        version = self.version
        dirname = (f"version_{version}" if isinstance(version, int)
                   else str(version))
        return os.path.join(self.save_dir, self.name, dirname)

    @property
    def writer(self):
        if self._writer is None:
            from tensorboardX import SummaryWriter
            os.makedirs(self.log_dir, exist_ok=True)
            self._writer = SummaryWriter(self.log_dir)
        return self._writer

    def log_scalars(self, metrics: Dict[str, float], step: int) -> None:
        for key, value in metrics.items():
            self.writer.add_scalar(key, float(value), step)

    def log_hparams(self, hparams: Dict) -> None:
        flat = _flatten(hparams)
        try:
            self.writer.add_hparams(
                {k: v for k, v in flat.items()
                 if isinstance(v, (int, float, str, bool))}, {})
        except Exception:
            pass

    def log_image(self, tag: str, image: np.ndarray, step: int) -> None:
        self.writer.add_image(tag, image, step, dataformats="HWC")

    def finalize(self) -> None:
        if self._writer is not None:
            self._writer.close()


class ProgressBar:
    """Interface stub for the reference's TQDMProgressBar config node."""

    def __init__(self, refresh_rate: int = 10, **_ignored):
        self.refresh_rate = refresh_rate


def _flatten(d: Dict, prefix: str = "") -> Dict:
    out = {}
    for k, v in d.items():
        key = f"{prefix}{k}"
        if isinstance(v, dict):
            out.update(_flatten(v, key + "/"))
        else:
            out[key] = v
    return out
