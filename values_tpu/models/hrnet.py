"""HRNet-W48 2D backbone (C0) — flax/linen, channels-last NHWC.

Architecture parity with the reference's torch module (reference:
uncertainty_modeling/models/hrnet_module.py:44-745, itself derived from the
public Microsoft HRNet): stem (two stride-2 3x3 convs), stage1 bottleneck
layer, 3 multi-branch stages of ``HighResolutionModule``s with
transition layers, bilinear multi-scale fuse (align_corners=False per the
shipped configs), head = concat of 4 upsampled branches -> 1x1 conv
classifier upsampled to input size. Options:

- per-branch Dropout inside BasicBlocks (configs' STAGE3/4 ``DROPOUT``),
- ``DROPOUT_FINAL``: p=0.5 dropout on the four branch outputs applied with
  ``training=True`` even at inference — the 2D MC-dropout mechanism
  (hrnet_module.py:642-646); reproduced by always running these dropouts
  stochastically (a 'dropout' RNG is required whenever it is enabled),
- ``SSN`` head: rank-R low-rank MVN over flattened (class, pixel) logits;
  NOTE the reference derives cov_diag by exp'ing the SAME ``last_layer``
  output used for the mean (hrnet_module.py:559-573) — preserved.

Module names mirror the torch state_dict key prefixes with '.' -> '_'
(e.g. ``stage2.0.branches.0.1.conv2`` -> ``stage2_0_branches_0_1_conv2``),
so the weight importer is a mechanical key rewrite; ImageNet-pretrained
torch weights load through values_tpu.models.torch_import.
"""
from __future__ import annotations

from typing import Any, Dict, List

import flax.linen as nn
import jax
import jax.numpy as jnp

BN_MOMENTUM = 0.1  # torch convention; flax momentum = 1 - this


def _resize_bilinear(x: jnp.ndarray, size) -> jnp.ndarray:
    """F.interpolate(mode='bilinear', align_corners=False) equivalent."""
    return jax.image.resize(
        x, (x.shape[0], size[0], size[1], x.shape[-1]), method="bilinear")


class HighResolutionNet(nn.Module):
    """Config-driven HRNet. ``cfg`` follows the reference's layout:
    {MODEL: {INPUT_CHANNELS, ALIGN_CORNERS, EXTRA: {STAGE1..4, ...},
    [SSN, SSN_RANK, SSN_EPS]}, DATASET: {NUM_CLASSES}}."""
    cfg: Any
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @property
    def num_classes(self) -> int:
        return int(self.cfg["DATASET"]["NUM_CLASSES"])

    @property
    def extra(self) -> Dict:
        return self.cfg["MODEL"]["EXTRA"]

    @property
    def ssn(self) -> bool:
        return bool(self.cfg["MODEL"].get("SSN", False))

    @property
    def rank(self) -> int:
        return int(self.cfg["MODEL"].get("SSN_RANK", 10))

    @property
    def epsilon(self) -> float:
        return float(self.cfg["MODEL"].get("SSN_EPS", 1e-5))

    @property
    def dropout_final(self) -> bool:
        return bool(self.extra.get("DROPOUT_FINAL", False))

    # -- primitive layers ----------------------------------------------
    def _conv(self, x, name, features, kernel, stride=1, bias=False):
        pad = (kernel - 1) // 2
        return nn.Conv(features, (kernel, kernel), strides=(stride, stride),
                       padding=[(pad, pad), (pad, pad)], use_bias=bias,
                       name=name, dtype=self.dtype,
                       param_dtype=self.param_dtype)(x)

    def _bn(self, x, name, train):
        return nn.BatchNorm(use_running_average=not train,
                            momentum=1.0 - BN_MOMENTUM, epsilon=1e-5,
                            name=name, dtype=self.dtype,
                            param_dtype=self.param_dtype)(x)

    def _dropout(self, x, deterministic, rate=0.5):
        return nn.Dropout(rate=rate)(x, deterministic=deterministic)

    # -- blocks ---------------------------------------------------------
    def _basic_block(self, x, prefix, planes, stride, downsample,
                     dropout, train, det):
        residual = x
        out = self._conv(x, f"{prefix}_conv1", planes, 3, stride)
        out = self._bn(out, f"{prefix}_bn1", train)
        out = nn.relu(out)
        if dropout:
            out = self._dropout(out, det)
        out = self._conv(out, f"{prefix}_conv2", planes, 3)
        out = self._bn(out, f"{prefix}_bn2", train)
        if downsample:
            residual = self._conv(x, f"{prefix}_downsample_0", planes, 1,
                                  stride)
            residual = self._bn(residual, f"{prefix}_downsample_1", train)
        return nn.relu(out + residual)

    def _bottleneck(self, x, prefix, planes, stride, downsample, train, det):
        expansion = 4
        residual = x
        out = self._conv(x, f"{prefix}_conv1", planes, 1)
        out = nn.relu(self._bn(out, f"{prefix}_bn1", train))
        out = self._conv(out, f"{prefix}_conv2", planes, 3, stride)
        out = nn.relu(self._bn(out, f"{prefix}_bn2", train))
        out = self._conv(out, f"{prefix}_conv3", planes * expansion, 1)
        out = self._bn(out, f"{prefix}_bn3", train)
        if downsample:
            residual = self._conv(x, f"{prefix}_downsample_0",
                                  planes * expansion, 1, stride)
            residual = self._bn(residual, f"{prefix}_downsample_1", train)
        return nn.relu(out + residual)

    def _layer(self, x, prefix, block, planes, n_blocks, train, det,
               dropout=False, stride=1):
        expansion = 4 if block == "BOTTLENECK" else 1
        inplanes = x.shape[-1]
        for i in range(n_blocks):
            needs_down = i == 0 and (stride != 1
                                     or inplanes != planes * expansion)
            if block == "BOTTLENECK":
                x = self._bottleneck(x, f"{prefix}_{i}", planes,
                                     stride if i == 0 else 1, needs_down,
                                     train, det)
            else:
                x = self._basic_block(x, f"{prefix}_{i}", planes,
                                      stride if i == 0 else 1, needs_down,
                                      dropout, train, det)
        return x

    def _transition(self, xs: List, prefix, pre_channels, cur_channels,
                    train):
        """_make_transition_layer equivalent (hrnet_module.py:457-502)."""
        out = []
        n_pre, n_cur = len(pre_channels), len(cur_channels)
        for i in range(n_cur):
            if i < n_pre:
                if cur_channels[i] != pre_channels[i]:
                    y = self._conv(xs[i], f"{prefix}_{i}_0",
                                   cur_channels[i], 3)
                    y = nn.relu(self._bn(y, f"{prefix}_{i}_1", train))
                    out.append(y)
                else:
                    out.append(xs[i])
            else:
                y = xs[-1]
                for j in range(i + 1 - n_pre):
                    features = (cur_channels[i] if j == i - n_pre
                                else pre_channels[-1])
                    y = self._conv(y, f"{prefix}_{i}_{j}_0", features, 3, 2)
                    y = nn.relu(self._bn(y, f"{prefix}_{i}_{j}_1", train))
                out.append(y)
        return out

    def _hr_module(self, xs: List, prefix, stage_cfg, channels, dropout,
                   train, det):
        """One HighResolutionModule (hrnet_module.py:122-336)."""
        n_branches = stage_cfg["NUM_BRANCHES"]
        n_blocks = stage_cfg["NUM_BLOCKS"]
        block = stage_cfg["BLOCK"]
        xs = [
            self._layer(xs[b], f"{prefix}_branches_{b}", block, channels[b],
                        n_blocks[b], train, det, dropout=dropout[b])
            for b in range(n_branches)]
        if n_branches == 1:
            return xs
        fused = []
        for i in range(n_branches):
            y = None
            for j in range(n_branches):
                fp = f"{prefix}_fuse_layers_{i}_{j}"
                if j == i:
                    t = xs[j]
                elif j > i:
                    t = self._conv(xs[j], f"{fp}_0", xs[i].shape[-1], 1)
                    t = self._bn(t, f"{fp}_1", train)
                    t = _resize_bilinear(t, xs[i].shape[1:3])
                else:
                    t = xs[j]
                    for k in range(i - j):
                        last = k == i - j - 1
                        features = (xs[i].shape[-1] if last
                                    else xs[j].shape[-1])
                        t = self._conv(t, f"{fp}_{k}_0", features, 3, 2)
                        t = self._bn(t, f"{fp}_{k}_1", train)
                        if not last:
                            t = nn.relu(t)
                y = t if y is None else y + t
            fused.append(nn.relu(y))
        return fused

    def _stage(self, xs, name, stage_cfg, train, det):
        channels = [
            c * (4 if stage_cfg["BLOCK"] == "BOTTLENECK" else 1)
            for c in stage_cfg["NUM_CHANNELS"]]
        dropout = stage_cfg.get("DROPOUT",
                                [False] * stage_cfg["NUM_BRANCHES"])
        for m in range(stage_cfg["NUM_MODULES"]):
            xs = self._hr_module(xs, f"{name}_{m}", stage_cfg,
                                 stage_cfg["NUM_CHANNELS"], dropout, train,
                                 det)
        return xs, channels

    def _last_layer(self, x, prefix, out_channels, train):
        k = int(self.extra["FINAL_CONV_KERNEL"])
        y = self._conv(x, f"{prefix}_0", x.shape[-1], 1, bias=True)
        y = nn.relu(self._bn(y, f"{prefix}_1", train))
        y = self._conv(y, f"{prefix}_3", out_channels, k, bias=True)
        return y

    # -- forward --------------------------------------------------------
    @nn.compact
    def __call__(self, x: jnp.ndarray, mean_only: bool = False,
                 train: bool = False, deterministic: bool = True):
        det = deterministic
        x_size = x.shape[1:3]
        extra = self.extra

        x = self._conv(x, "conv1", 64, 3, 2)
        x = nn.relu(self._bn(x, "bn1", train))
        x = self._conv(x, "conv2", 64, 3, 2)
        x = nn.relu(self._bn(x, "bn2", train))

        s1 = extra["STAGE1"]
        x = self._layer(x, "layer1", s1["BLOCK"], s1["NUM_CHANNELS"][0],
                        s1["NUM_BLOCKS"][0], train, det)
        expansion1 = 4 if s1["BLOCK"] == "BOTTLENECK" else 1
        stage1_out = [s1["NUM_CHANNELS"][0] * expansion1]

        s2 = extra["STAGE2"]
        ch2 = [c for c in s2["NUM_CHANNELS"]]
        xs = self._transition([x], "transition1", stage1_out, ch2, train)
        xs, pre = self._stage(xs, "stage2", s2, train, det)

        s3 = extra["STAGE3"]
        ch3 = [c for c in s3["NUM_CHANNELS"]]
        xs = self._transition(xs, "transition2", pre, ch3, train)
        xs, pre = self._stage(xs, "stage3", s3, train, det)

        s4 = extra["STAGE4"]
        ch4 = [c for c in s4["NUM_CHANNELS"]]
        xs = self._transition(xs, "transition3", pre, ch4, train)
        xs, pre = self._stage(xs, "stage4", s4, train, det)

        x0, x1, x2, x3 = xs
        if self.dropout_final:
            # applied with training=True even at inference
            # (hrnet_module.py:642-646)
            x0 = self._dropout(x0, deterministic=False)
            x1 = self._dropout(x1, deterministic=False)
            x2 = self._dropout(x2, deterministic=False)
            x3 = self._dropout(x3, deterministic=False)

        size0 = x0.shape[1:3]
        x = jnp.concatenate([
            x0, _resize_bilinear(x1, size0), _resize_bilinear(x2, size0),
            _resize_bilinear(x3, size0)], axis=-1)

        if self.ssn:
            return self._ssn_head(x, x_size, mean_only, train)

        y = self._last_layer(x, "last_layer", self.num_classes, train)
        return _resize_bilinear(y, x_size)

    def _ssn_head(self, x, x_size, mean_only, train):
        from .ssn_unet3d import LowRankMVN
        batch = x.shape[0]
        logits = self._last_layer(x, "last_layer", self.num_classes, train)
        mean_map = _resize_bilinear(logits, x_size)
        mean = jnp.moveaxis(mean_map, -1, 1).reshape(batch, -1)
        # reference quirk: cov_diag = exp(last_layer output) with the SAME
        # weights as the mean head (hrnet_module.py:568-573)
        diag_map = _resize_bilinear(jnp.exp(logits), x_size) + self.epsilon
        cov_diag = jnp.moveaxis(diag_map, -1, 1).reshape(batch, -1)
        if mean_only:
            cov_factor = jnp.zeros(mean.shape + (self.rank,),
                                   dtype=mean.dtype)
        else:
            raw = self._last_layer(x, "cov_factor_conv",
                                   self.num_classes * self.rank, train)
            raw = _resize_bilinear(raw, x_size)
            raw = jnp.moveaxis(raw, -1, 1)  # (B, C*R, H, W)
            raw = raw.reshape(batch, self.rank, self.num_classes, -1)
            raw = raw.reshape(batch, self.rank, -1)
            cov_factor = jnp.swapaxes(raw, 1, 2)
        return LowRankMVN(mean=mean, cov_diag=cov_diag,
                          cov_factor=cov_factor,
                          event_shape=(self.num_classes,) + tuple(x_size))


def get_seg_model(cfg: Dict, pretrained_loader=None, **kwargs):
    """Reference factory (hrnet_module.py:740-745). Weight loading is done
    by the caller via values_tpu.models.torch_import.hrnet_params_from_torch
    (the flax model is stateless, so pretrained weights merge into the
    initialized variables at experiment setup)."""
    return HighResolutionNet(cfg=cfg, **kwargs)
