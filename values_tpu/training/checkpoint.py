"""Self-describing checkpoints.

Contract parity with the reference (SURVEY.md §5 "Checkpoint / resume"):
a checkpoint carries the model state *and* the complete experiment config
(``hyper_parameters``) so that inference reconstructs the model,
datamodule, splits and save paths from the file alone (reference:
test_3D.py:635-668). Two formats load transparently:

- native ``values_tpu`` checkpoints (pickled numpy pytrees + config),
- reference PyTorch-Lightning ``.ckpt`` files, converted on the fly via
  values_tpu.models.torch_import.
"""
from __future__ import annotations

import pickle
from pathlib import Path
from typing import Any, Dict, Tuple

import jax
import numpy as np

FORMAT_KEY = "values_tpu_checkpoint"


def _to_numpy_tree(tree: Any) -> Any:
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(path: str, variables: Any, hyper_parameters: Dict,
                    epoch: int = 0, global_step: int = 0,
                    opt_state: Any = None) -> None:
    payload = {
        "format": FORMAT_KEY,
        "state_dict": _to_numpy_tree(variables),
        "hyper_parameters": hyper_parameters,
        "epoch": epoch,
        "global_step": global_step,
    }
    if opt_state is not None:
        payload["opt_state"] = _to_numpy_tree(opt_state)
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump(payload, f)


def load_checkpoint(path: str) -> Dict:
    with open(path, "rb") as f:
        payload = pickle.load(f)
    if not (isinstance(payload, dict) and payload.get("format") == FORMAT_KEY):
        raise ValueError(f"{path} is not a values_tpu checkpoint")
    return payload


def _is_torch_zipfile(path: str) -> bool:
    with open(path, "rb") as f:
        magic = f.read(4)
    return magic[:2] == b"PK"


def load_any_checkpoint(path: str) -> Tuple[Dict, Any]:
    """Return (hyper_parameters, variables) from a native or reference
    checkpoint."""
    if _is_torch_zipfile(path):
        from ..models.torch_import import load_reference_checkpoint
        hparams, variables = load_reference_checkpoint(path)
        if hasattr(hparams, "items"):
            hparams = {k: v for k, v in hparams.items()}
        return hparams, variables
    try:
        payload = load_checkpoint(path)
        return payload["hyper_parameters"], payload["state_dict"]
    except (ValueError, pickle.UnpicklingError):
        # legacy torch pickle (non-zip) checkpoints
        from ..models.torch_import import load_reference_checkpoint
        return load_reference_checkpoint(path)
