"""Import reference torch checkpoints into values_tpu parameter pytrees.

The reference's inference reconstructs everything from a PyTorch-Lightning
``.ckpt`` holding ``state_dict`` (keys prefixed ``model.``) and
``hyper_parameters`` (the full hydra config) — reference:
uncertainty_modeling/test_3D.py:222-247,635-668. This module converts those
torch tensors into the flax parameter trees of
:class:`values_tpu.models.unet3d.UNet3D` (and its SSN variant) so trained
reference models run unchanged on TPU.

Weight layout conversions:
- Conv3d weight (O, I, kd, kh, kw)          -> kernel (kd, kh, kw, I, O)
- ConvTranspose3d weight (I, O, kd, kh, kw) -> kernel (kd, kh, kw, I, O)
"""
from __future__ import annotations

import re
from typing import Any, Dict, Mapping, Tuple

import numpy as np

# torch sequential-index -> flax submodule name inside the UNet3D
_CENTER_MAP = {"0": "center_conv1", "2": "center_conv2", "4": "center_up"}
_PARAM_MAP = {"weight": "kernel", "bias": "bias"}

_BLOCK_RE = re.compile(r"^(contr_\d_\d|expand_\d_\d)\.0\.(weight|bias)$")
_CENTER_RE = re.compile(r"^center\.(\d)\.(weight|bias)$")
_PLAIN_CONV_RE = re.compile(
    r"^(final|final_aleatoric|output_reconstruction_map|mean_conv|"
    r"log_cov_diag_conv|cov_factor_conv)\.(weight|bias)$")
_UPSCALE_RE = re.compile(r"^(upscale\d)\.(weight|bias)$")


def _to_numpy(tensor: Any) -> np.ndarray:
    if hasattr(tensor, "detach"):
        return tensor.detach().cpu().numpy()
    return np.asarray(tensor)


def _convert_conv_weight(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 4, 1, 0))


def _convert_convtranspose_weight(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 4, 0, 1))


def strip_model_prefix(state_dict: Mapping[str, Any]) -> Dict[str, Any]:
    """Strip the Lightning ``model.`` key prefix (test_3D.py:236-238)."""
    return {
        (k[len("model."):] if k.startswith("model.") else k): v
        for k, v in state_dict.items()
    }


def unet3d_params_from_torch(state_dict: Mapping[str, Any],
                             dtype: Any = np.float32) -> Dict[str, Any]:
    """Convert a (possibly ``model.``-prefixed) UNet3D/SsnUNet3D torch
    state_dict into a flax ``{"params": ...}`` variables dict."""
    state_dict = strip_model_prefix(state_dict)
    params: Dict[str, Any] = {}

    def put(module: str, leaf: str, value: np.ndarray) -> None:
        params.setdefault(module, {})[leaf] = value.astype(dtype)

    for key, tensor in state_dict.items():
        arr = _to_numpy(tensor)
        m = _BLOCK_RE.match(key)
        if m:
            block, leaf = m.groups()
            value = _convert_conv_weight(arr) if leaf == "weight" else arr
            params.setdefault(block, {}).setdefault("conv", {})[
                _PARAM_MAP[leaf]] = value.astype(dtype)
            continue
        m = _CENTER_RE.match(key)
        if m:
            idx, leaf = m.groups()
            module = _CENTER_MAP[idx]
            if leaf == "weight":
                value = (_convert_convtranspose_weight(arr)
                         if module == "center_up"
                         else _convert_conv_weight(arr))
            else:
                value = arr
            put(module, _PARAM_MAP[leaf], value)
            continue
        m = _UPSCALE_RE.match(key)
        if m:
            module, leaf = m.groups()
            value = (_convert_convtranspose_weight(arr)
                     if leaf == "weight" else arr)
            put(module, _PARAM_MAP[leaf], value)
            continue
        m = _PLAIN_CONV_RE.match(key)
        if m:
            module, leaf = m.groups()
            value = _convert_conv_weight(arr) if leaf == "weight" else arr
            put(module, _PARAM_MAP[leaf], value)
            continue
        raise KeyError(f"Unrecognized UNet3D state_dict key: {key}")

    return {"params": params}


def hrnet_params_from_torch(state_dict: Mapping[str, Any],
                            dtype: Any = np.float32) -> Dict[str, Any]:
    """Convert an HRNet torch state_dict (reference hrnet_module.py, or
    the public ImageNet-pretrained weights after the reference's key remap
    at hrnet_module.py:682-737) into flax variables.

    Module names in values_tpu.models.hrnet mirror the torch prefixes with
    '.' -> '_', so conversion is mechanical:
    Conv weight (O, I, kh, kw) -> kernel (kh, kw, I, O); BatchNorm
    weight/bias/running_mean/running_var -> scale/bias + batch_stats.
    """
    state_dict = strip_model_prefix(state_dict)
    # classify prefixes: BN prefixes carry running stats
    bn_prefixes = {k[:-len(".running_mean")] for k in state_dict
                   if k.endswith(".running_mean")}
    params: Dict[str, Any] = {}
    batch_stats: Dict[str, Any] = {}
    for key, tensor in state_dict.items():
        if key.endswith("num_batches_tracked"):
            continue
        prefix, leaf = key.rsplit(".", 1)
        name = prefix.replace(".", "_")
        arr = _to_numpy(tensor).astype(dtype)
        if prefix in bn_prefixes:
            if leaf == "weight":
                params.setdefault(name, {})["scale"] = arr
            elif leaf == "bias":
                params.setdefault(name, {})["bias"] = arr
            elif leaf == "running_mean":
                batch_stats.setdefault(name, {})["mean"] = arr
            elif leaf == "running_var":
                batch_stats.setdefault(name, {})["var"] = arr
        else:
            if leaf == "weight":
                if arr.ndim != 4:
                    raise ValueError(f"Unexpected weight rank for {key}")
                params.setdefault(name, {})["kernel"] = np.transpose(
                    arr, (2, 3, 1, 0))
            elif leaf == "bias":
                params.setdefault(name, {})["bias"] = arr
            else:
                raise KeyError(f"Unrecognized HRNet state_dict key: {key}")
    return {"params": params, "batch_stats": batch_stats}


def merge_pretrained_hrnet(variables: Dict[str, Any],
                           pretrained: Dict[str, Any]) -> Dict[str, Any]:
    """Merge converted pretrained weights into freshly initialized
    variables with the reference's filtering semantics
    (hrnet_module.py:703-737): keep only keys that exist in the model with
    matching shapes; everything else stays initialized."""
    import jax

    merged = jax.tree_util.tree_map(lambda x: x, variables)  # copy
    for collection in ("params", "batch_stats"):
        tgt = merged.get(collection, {})
        src = pretrained.get(collection, {})
        for module, leaves in src.items():
            if module not in tgt:
                continue
            for leaf, value in leaves.items():
                if leaf in tgt[module] and (
                        tuple(tgt[module][leaf].shape)
                        == tuple(value.shape)):
                    tgt[module][leaf] = value
    return merged


def unet3d_params_to_torch(variables: Mapping[str, Any]) -> Dict[str, Any]:
    """Reverse conversion: flax UNet3D variables -> a reference-layout torch
    state_dict (``model.``-prefixed keys, torch tensor layouts). Lets users
    migrate trained values_tpu checkpoints back into the reference stack."""
    import torch
    params = variables["params"] if "params" in variables else variables
    reverse_center = {v: k for k, v in _CENTER_MAP.items()}
    state: Dict[str, Any] = {}

    def to_tensor(arr):
        return torch.tensor(np.asarray(arr))

    for module, leaves in params.items():
        if "conv" in leaves:  # contr_*/expand_* blocks
            kernel = np.transpose(np.asarray(leaves["conv"]["kernel"]),
                                  (4, 3, 0, 1, 2))
            state[f"model.{module}.0.weight"] = to_tensor(kernel)
            state[f"model.{module}.0.bias"] = to_tensor(
                leaves["conv"]["bias"])
        elif module in reverse_center:
            idx = reverse_center[module]
            kernel = np.asarray(leaves["kernel"])
            if module == "center_up":
                kernel = np.transpose(kernel, (3, 4, 0, 1, 2))
            else:
                kernel = np.transpose(kernel, (4, 3, 0, 1, 2))
            state[f"model.center.{idx}.weight"] = to_tensor(kernel)
            state[f"model.center.{idx}.bias"] = to_tensor(leaves["bias"])
        elif module.startswith("upscale"):
            kernel = np.transpose(np.asarray(leaves["kernel"]),
                                  (3, 4, 0, 1, 2))
            state[f"model.{module}.weight"] = to_tensor(kernel)
            state[f"model.{module}.bias"] = to_tensor(leaves["bias"])
        else:  # 1x1x1 head convs (final, SSN heads, AE head)
            kernel = np.transpose(np.asarray(leaves["kernel"]),
                                  (4, 3, 0, 1, 2))
            state[f"model.{module}.weight"] = to_tensor(kernel)
            state[f"model.{module}.bias"] = to_tensor(leaves["bias"])
    if "final_aleatoric" in params and "model.final.weight" not in state:
        # the reference's aleatoric UNet3D still constructs the plain
        # `final` head (unet3D_module.py:199) even though only
        # final_aleatoric runs; flax never materializes it
        k = np.asarray(params["final_aleatoric"]["kernel"])
        f, two_c = k.shape[-2], k.shape[-1]
        state["model.final.weight"] = to_tensor(
            np.zeros((two_c // 2, f, 1, 1, 1), dtype=np.float32))
        state["model.final.bias"] = to_tensor(
            np.zeros((two_c // 2,), dtype=np.float32))
    if "mean_conv" in params and "model.final.weight" not in state:
        # the reference SsnUNet3D inherits an UNUSED `final` head sized
        # num_classes*2 + num_classes*rank (ssn_unet3D_module.py:19-27);
        # flax never materializes it (the SSN trunk runs last_layer=False)
        # but torch's strict load_state_dict requires the keys
        f = np.asarray(params["mean_conv"]["kernel"]).shape[-2]
        c = np.asarray(params["mean_conv"]["kernel"]).shape[-1]
        cr = np.asarray(params["cov_factor_conv"]["kernel"]).shape[-1]
        state["model.final.weight"] = to_tensor(
            np.zeros((2 * c + cr, f, 1, 1, 1), dtype=np.float32))
        state["model.final.bias"] = to_tensor(
            np.zeros((2 * c + cr,), dtype=np.float32))
    if "model.output_reconstruction_map.weight" not in state:
        # flax only materializes params on traced paths, so the unused
        # autoencoder head (unet3D_module.py:207-209) has no variables
        # after ordinary training; torch's strict load_state_dict still
        # requires the keys — synthesize zeros of the reference shape
        # (nn.Conv3d(initial_filter_size, 1, kernel_size=1))
        init_filters = np.asarray(
            params["contr_1_1"]["conv"]["kernel"]).shape[-1]
        state["model.output_reconstruction_map.weight"] = to_tensor(
            np.zeros((1, init_filters, 1, 1, 1), dtype=np.float32))
        state["model.output_reconstruction_map.bias"] = to_tensor(
            np.zeros((1,), dtype=np.float32))
    return state


def export_reference_checkpoint(path: str, variables: Mapping[str, Any],
                                hyper_parameters: Dict[str, Any]) -> None:
    """Write a reference-compatible Lightning-style ``.ckpt``."""
    import torch
    torch.save({
        "state_dict": unet3d_params_to_torch(variables),
        "hyper_parameters": hyper_parameters,
    }, path)


def load_reference_checkpoint(path: str) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Read a reference ``.ckpt``; returns (hyper_parameters, variables).
    The importer is picked from the checkpoint's model target (UNet3D
    family vs HRNet)."""
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    hparams = ckpt["hyper_parameters"]
    target = ""
    try:
        target = str(hparams["model"].get("_target_", ""))
    except (KeyError, AttributeError, TypeError):
        pass
    if "hrnet" in target.lower():
        variables = hrnet_params_from_torch(ckpt["state_dict"])
    else:
        variables = unet3d_params_from_torch(ckpt["state_dict"])
    return hparams, variables
