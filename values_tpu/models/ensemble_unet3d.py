"""Ensemble-grouped 3D U-Net: M members fused into grouped convolutions.

Motivation (TPU performance): the reference UNet3D has 8-128 channels per
conv — vmapping M ensemble members runs M narrow convolutions whose output
-channel dimension badly underutilizes the 128-lane MXU. Folding the
member axis into ``feature_group_count=M`` grouped convolutions multiplies
the channel dimension by M (e.g. 8 -> 40 for the LIDC ensemble-5) while
computing exactly the same per-member math:

- grouped Conv3d: kernel (k,k,k, Cin, M*Cout), feature_group_count=M,
- instance norm: per-channel over spatial dims — member-independent by
  construction,
- skip concats reshape to (..., M, C) so member channel groups stay
  contiguous,
- k2s2 transpose conv as member-batched einsum + pixel shuffle.

``group_member_variables`` converts a list of M standard UNet3D variable
trees into one grouped tree; outputs match the vmapped reference path to
float tolerance (see tests/test_ensemble_unet3d.py).
"""
from __future__ import annotations

from typing import Any, Dict, List

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .unet3d import UNet3D


class GroupedConvTransposeK2S2(nn.Module):
    """Per-member ConvTranspose(k=2, s=2) via member-batched einsum."""
    features: int  # per member
    members: int
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, d, h, w, mc = x.shape
        cin = mc // self.members
        kernel = self.param("kernel", nn.initializers.zeros,
                            (self.members, 2, 2, 2, cin, self.features),
                            self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.members, self.features), self.param_dtype)
        # ConvTranspose(k=2, s=2) as a grouped conv over the 2x-dilated
        # input with the spatially flipped kernel: XLA's native conv
        # emitter handles the interleave in-layout, where the previous
        # einsum formulation materialized an 8.5 ms transpose copy of the
        # full L1 activation (xplane copy.123, batch 128). Bit-equal on
        # f32 (same MXU f32 accumulation); 16.6 -> 9.2 ms at L1 geometry.
        k = jnp.transpose(kernel, (1, 2, 3, 4, 0, 5)).reshape(
            2, 2, 2, cin, self.members * self.features)
        k = k[::-1, ::-1, ::-1].astype(self.dtype)
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), k, window_strides=(1, 1, 1),
            padding=[(1, 1)] * 3, lhs_dilation=(2, 2, 2),
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            feature_group_count=self.members)
        return y + bias.astype(self.dtype).reshape(-1)


class EnsembleUNet3D(nn.Module):
    """M-member grouped UNet3D; input (B, D, H, W, 1) is tiled across
    members internally; output (B, D, H, W, M, num_classes).

    ``do_dropout`` reproduces MC-dropout in the grouped layout: dropout is
    elementwise-iid, so a p=0.5 mask over the M-wide grouped activations is
    exactly M independent per-member masks — tiling one member's weights M
    times turns M sequential MC passes into one grouped forward
    (test_3D.py:417-483's n_pred loop collapsed onto the channel axis).
    """
    num_classes: int
    members: int
    in_channels: int = 1
    initial_filter_size: int = 8
    kernel_size: int = 3
    do_instancenorm: bool = True
    do_dropout: bool = False
    aleatoric: bool = False  # final head emits (mu, s): 2C per member
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    def _conv(self, x, name, features_per_member, kernel):
        return nn.Conv(self.members * features_per_member,
                       (kernel,) * 3, padding="SAME",
                       feature_group_count=self.members, name=name,
                       dtype=self.dtype, param_dtype=self.param_dtype)(x)

    def _instance_norm(self, x):
        mean = jnp.mean(x, axis=(1, 2, 3), keepdims=True)
        var = jnp.var(x, axis=(1, 2, 3), keepdims=True)
        return (x - mean) * jax.lax.rsqrt(var + 1e-5)

    def _block(self, x, name, features, norm=True, relu="leaky",
               dropout=True):
        x = self._conv(x, name, features, self.kernel_size)
        if norm and self.do_instancenorm:
            x = self._instance_norm(x)
        x = (nn.leaky_relu(x, negative_slope=0.01) if relu == "leaky"
             else nn.relu(x))
        # reference placement: dropout after every contract/expand block,
        # once at the END of the center sequential, never after upscales
        # (unet3D_module.py:97-146, 212-268)
        if self.do_dropout and dropout:
            x = nn.Dropout(rate=0.5)(x, deterministic=False)
        return x

    def _concat_members(self, a, b):
        """Channel concat keeping member groups contiguous."""
        sh = a.shape[:-1]
        am = a.reshape(*sh, self.members, a.shape[-1] // self.members)
        bm = b.reshape(*sh, self.members, b.shape[-1] // self.members)
        out = jnp.concatenate([am, bm], axis=-1)
        return out.reshape(*sh, out.shape[-2] * out.shape[-1])

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 last_layer: bool = True) -> jnp.ndarray:
        f = self.initial_filter_size
        if x.shape[-1] == self.in_channels:
            x = jnp.tile(x, (1,) * (x.ndim - 1) + (self.members,))
        pool = lambda v: nn.max_pool(v, (2, 2, 2), strides=(2, 2, 2))

        contr_1 = self._block(self._block(x, "contr_1_1", f),
                              "contr_1_2", f)
        p1 = pool(contr_1)
        contr_2 = self._block(self._block(p1, "contr_2_1", f * 2),
                              "contr_2_2", f * 2)
        p2 = pool(contr_2)
        contr_3 = self._block(self._block(p2, "contr_3_1", f * 4),
                              "contr_3_2", f * 4)
        p3 = pool(contr_3)
        contr_4 = self._block(self._block(p3, "contr_4_1", f * 8),
                              "contr_4_2", f * 8)
        p4 = pool(contr_4)

        c = self._block(p4, "center_conv1", f * 16, norm=False, relu="relu",
                        dropout=False)
        c = self._block(c, "center_conv2", f * 16, norm=False, relu="relu",
                        dropout=False)
        c = GroupedConvTransposeK2S2(f * 8, self.members, name="center_up",
                                     dtype=self.dtype,
                                     param_dtype=self.param_dtype)(c)
        center = nn.relu(c)
        if self.do_dropout:
            center = nn.Dropout(rate=0.5)(center, deterministic=False)

        e = self._concat_members(center, contr_4)
        e = self._block(self._block(e, "expand_4_1", f * 8, norm=False),
                        "expand_4_2", f * 8, norm=False)
        up = GroupedConvTransposeK2S2(f * 4, self.members, name="upscale4",
                                      dtype=self.dtype,
                                      param_dtype=self.param_dtype)(e)
        e = self._concat_members(up, contr_3)
        e = self._block(self._block(e, "expand_3_1", f * 4, norm=False),
                        "expand_3_2", f * 4, norm=False)
        up = GroupedConvTransposeK2S2(f * 2, self.members, name="upscale3",
                                      dtype=self.dtype,
                                      param_dtype=self.param_dtype)(e)
        e = self._concat_members(up, contr_2)
        e = self._block(self._block(e, "expand_2_1", f * 2, norm=False),
                        "expand_2_2", f * 2, norm=False)
        up = GroupedConvTransposeK2S2(f, self.members, name="upscale2",
                                      dtype=self.dtype,
                                      param_dtype=self.param_dtype)(e)
        e = self._concat_members(up, contr_1)
        expand = self._block(self._block(e, "expand_1_1", f, norm=False),
                             "expand_1_2", f, norm=False)

        if not last_layer:  # SSN trunk: pre-head features (B,*sp,M*f)
            return expand
        if self.aleatoric:
            out = self._conv(expand, "final_aleatoric",
                             2 * self.num_classes, 1)
            b, d, h, w, _ = out.shape
            return out.reshape(b, d, h, w, self.members,
                               2 * self.num_classes)
        out = self._conv(expand, "final", self.num_classes, 1)
        b, d, h, w, _ = out.shape
        return out.reshape(b, d, h, w, self.members, self.num_classes)


def group_member_variables(member_variables: List[Dict],
                           dtype=np.float32) -> Dict:
    """Convert M standard UNet3D variable trees into the grouped tree.

    Grouped conv kernels stack members along the OUTPUT channel axis
    (XLA grouped-conv convention: kernel (k,k,k, Cin, M*Cout) where group
    m consumes input block m and produces output block m).
    """
    members = len(member_variables)
    params: Dict[str, Any] = {}
    member_params = [v["params"] if "params" in v else v
                     for v in member_variables]

    conv_blocks = [k for k in member_params[0]
                   if k.startswith(("contr_", "expand_"))]
    for block in conv_blocks:
        kernels = [np.asarray(p[block]["conv"]["kernel"])
                   for p in member_params]
        biases = [np.asarray(p[block]["conv"]["bias"])
                  for p in member_params]
        params[block] = {
            "kernel": np.concatenate(kernels, axis=-1).astype(dtype),
            "bias": np.concatenate(biases, axis=-1).astype(dtype),
        }
    # bottleneck convs and whichever 1x1x1 heads the member model carries
    # (plain / aleatoric / SSN heads all stack along the output channels)
    head_names = ("center_conv1", "center_conv2", "final",
                  "final_aleatoric", "mean_conv", "log_cov_diag_conv",
                  "cov_factor_conv")
    for name in (n for n in head_names if n in member_params[0]):
        kernels = [np.asarray(p[name]["kernel"]) for p in member_params]
        biases = [np.asarray(p[name]["bias"]) for p in member_params]
        params[name] = {
            "kernel": np.concatenate(kernels, axis=-1).astype(dtype),
            "bias": np.concatenate(biases, axis=-1).astype(dtype),
        }
    for name in ("center_up", "upscale4", "upscale3", "upscale2"):
        kernels = [np.asarray(p[name]["kernel"]) for p in member_params]
        biases = [np.asarray(p[name]["bias"]) for p in member_params]
        params[name] = {
            "kernel": np.stack(kernels, axis=0).astype(dtype),
            "bias": np.stack(biases, axis=0).astype(dtype),
        }
    return {"params": params}


def ungroup_member_variables(grouped: Dict, members: int,
                             dtype=np.float32) -> List[Dict]:
    """Inverse of :func:`group_member_variables`: split the grouped tree
    back into M standard flax UNet3D variable trees (for per-member
    checkpoint export after joint ensemble training — the reference's
    test_3D.py consumes one checkpoint per member)."""
    params = grouped["params"] if "params" in grouped else grouped
    trees: List[Dict] = [dict() for _ in range(members)]
    for name, leaves in params.items():
        kernel = np.asarray(leaves["kernel"])
        bias = np.asarray(leaves["bias"])
        if name in ("center_up", "upscale4", "upscale3", "upscale2"):
            parts = [(kernel[m], bias[m]) for m in range(members)]
        else:
            ks = np.split(kernel, members, axis=-1)
            bs = np.split(bias, members, axis=-1)
            parts = list(zip(ks, bs))
        for m, (k, b) in enumerate(parts):
            leaf = {"kernel": k.astype(dtype), "bias": b.astype(dtype)}
            if name.startswith(("contr_", "expand_")):
                trees[m][name] = {"conv": leaf}
            else:
                trees[m][name] = leaf
    return [{"params": t} for t in trees]


def make_grouped_ensemble_predictor(num_classes: int, members: int,
                                    initial_filter_size: int = 8,
                                    dtype=jnp.float32,
                                    do_dropout: bool = False):
    """(grouped_variables, x, rng) -> (M, B, *sp, C) softmax stack, same
    contract as values_tpu.inference.predictors factories.

    With ``do_dropout`` the M "members" are one model's weights tiled M
    times and the grouped dropout mask realizes M independent MC passes.
    """
    model = EnsembleUNet3D(num_classes=num_classes, members=members,
                           initial_filter_size=initial_filter_size,
                           dtype=dtype, do_dropout=do_dropout)

    def predict(grouped_variables, x, rng):
        kwargs = {"rngs": {"dropout": rng}} if do_dropout else {}
        out = model.apply(grouped_variables, x, **kwargs)
        probs = jax.nn.softmax(out, axis=-1)  # (B, D, H, W, M, C)
        return jnp.moveaxis(probs, -2, 0), None  # (M, B, D, H, W, C)

    return model, predict


def make_grouped_aleatoric_predictor(num_classes: int, members: int,
                                     initial_filter_size: int = 8,
                                     n_aleatoric_samples: int = 10,
                                     dtype=jnp.float32):
    """Aleatoric deep ensemble as ONE grouped forward: M members' (mu, s)
    heads fused into the channel dimension, then per-member logit
    sampling mu + sigma*eps (reference loop: test_3D.py:458-469).

    Sampling draws per-member keys exactly like the vmapped
    make_aleatoric_predictor (same split tree, same shapes), so the two
    paths agree bitwise in their epsilon draws and to float tolerance in
    the forwards. Returns (model, predict) with predict -> ((M*S, B, *sp,
    C) softmax stack, (M*S, ...) sigma stack, same ordering: model-major).
    """
    model = EnsembleUNet3D(num_classes=num_classes, members=members,
                           initial_filter_size=initial_filter_size,
                           aleatoric=True, dtype=dtype)

    def predict(grouped_variables, x, rng):
        out = model.apply(grouped_variables, x)   # (B, *sp, M, 2C)
        mu, s = jnp.split(out, 2, axis=-1)
        mu = jnp.moveaxis(mu, -2, 0)              # (M, B, *sp, C)
        sigma = jnp.exp(jnp.moveaxis(s, -2, 0) / 2.0)
        keys = jax.random.split(rng, members)

        def per_member(mu_m, sigma_m, key):
            eps = jax.random.normal(
                key, (n_aleatoric_samples,) + mu_m.shape,
                dtype=mu_m.dtype)
            logits = mu_m[None] + sigma_m[None] * eps
            sigma_rep = jnp.broadcast_to(
                sigma_m[None], (n_aleatoric_samples,) + sigma_m.shape)
            return jax.nn.softmax(logits, axis=-1), sigma_rep

        probs, sigmas = jax.vmap(per_member)(mu, sigma, keys)
        s_total = members * n_aleatoric_samples
        return (probs.reshape((s_total,) + probs.shape[2:]),
                sigmas.reshape((s_total,) + sigmas.shape[2:]))

    return model, predict


def make_grouped_ssn_predictor(num_classes: int, members: int,
                               initial_filter_size: int = 8,
                               n_pred: int = 1, rank: int = 10,
                               epsilon: float = 1e-5, dtype=jnp.float32):
    """SSN deep ensemble as one grouped trunk forward + per-member heads.

    The reference's SSN path is single-model (test_3D.py:361-396); this
    lowering extends it to M members: the UNet trunks fuse into grouped
    convolutions, the three 1x1x1 heads stay per-member (einsum over the
    member axis), and ONE batched LowRankMVN over batch M*B draws
    ``n_pred`` samples per member. Output ordering is model-major like
    every other predictor: (M * n_pred, B, *sp, C).
    """
    from .ssn_unet3d import LowRankMVN

    trunk = EnsembleUNet3D(num_classes=num_classes, members=members,
                           initial_filter_size=initial_filter_size,
                           dtype=dtype)

    def predict(grouped_variables, x, rng):
        feats = trunk.apply(grouped_variables, x, last_layer=False)
        b = x.shape[0]
        spatial = feats.shape[1:-1]
        f = feats.shape[-1] // members
        fm = feats.reshape(feats.shape[:-1] + (members, f))
        p = grouped_variables["params"]

        def head(name, cout):   # per-member 1x1x1 conv -> (M, B, *sp, cout)
            k = p[name]["kernel"].reshape(f, members, cout)
            bias = p[name]["bias"].reshape(members, cout)
            out = jnp.einsum("b...mi,imo->b...mo", fm, k) + bias
            return jnp.moveaxis(out, -2, 0)

        def flatten_cf(t):      # (M, B, *sp, C) -> (M*B, C*V) torch order
            t = jnp.moveaxis(t, -1, 2)
            return t.reshape((members * b, -1))

        mean = flatten_cf(head("mean_conv", num_classes))
        cov_diag = jnp.exp(flatten_cf(
            head("log_cov_diag_conv", num_classes))) + epsilon
        raw = head("cov_factor_conv", num_classes * rank)
        raw = jnp.moveaxis(raw, -1, 2)            # (M, B, C*R, *sp)
        raw = raw.reshape(members * b, rank, num_classes, -1)
        cov_factor = jnp.swapaxes(raw.reshape(members * b, rank, -1), 1, 2)

        dist = LowRankMVN(mean=mean, cov_diag=cov_diag,
                          cov_factor=cov_factor,
                          event_shape=(num_classes,) + spatial)
        samples = dist.sample(rng, (n_pred,))     # (S, M*B, C*V)
        samples = samples.reshape((n_pred, members, b, num_classes)
                                  + spatial)
        samples = jnp.moveaxis(samples, 1, 0)     # (M, S, B, C, *sp)
        logits = samples.reshape((members * n_pred, b, num_classes)
                                 + spatial)
        logits = jnp.moveaxis(logits, 2, -1)
        return jax.nn.softmax(logits, axis=-1), None

    return trunk, predict


def make_grouped_tta_predictor(num_classes: int, members: int,
                               initial_filter_size: int = 8,
                               dtype=jnp.float32):
    """TTA as grouped convolutions: the 16 clean/noise x flip variants (per
    member) become channel groups, filling the MXU lanes (16 x 8 = 128
    channels at level 1 for the shipped UNet). Same variant set and
    ordering as the reference loop (test_3D.py:427-456): [clean,
    clean-flips..., noise, noise-flips...] per member; outputs un-flipped
    before stacking.

    Returns (model, predict) with predict(grouped_tta_variables, x, rng) ->
    ((members * 16, B, *sp, C), None). ``grouped_tta_variables`` must tile
    each member's weights 16x (group_member_variables(sum([[v]*16 for v in
    members], []))).
    """
    from ..inference.predictors import FLIP_COMBOS

    groups = members * 16
    model = EnsembleUNet3D(num_classes=num_classes, members=groups,
                           initial_filter_size=initial_filter_size,
                           dtype=dtype)

    def predict(grouped_variables, x, rng):
        var_key, noise_key = jax.random.split(rng)
        # batchgenerators' "variance"-as-scale quirk (see predictors.py)
        variance = jax.random.uniform(var_key, (), minval=0.0, maxval=0.1)
        noise = jax.random.normal(noise_key, x.shape, dtype=x.dtype)
        x_noise = x + noise * variance

        def variants(inp):  # 8 spatially transformed copies
            outs = [inp]
            for axes in FLIP_COMBOS:
                outs.append(jnp.flip(inp, axis=axes))
            return outs

        per_member = variants(x) + variants(x_noise)   # 16 x (B,*sp,1)
        stacked_in = jnp.concatenate(per_member * members, axis=-1)
        out = model.apply(grouped_variables, stacked_in)
        probs = jax.nn.softmax(out, axis=-1)           # (B,*sp,groups,C)
        probs = jnp.moveaxis(probs, -2, 0)             # (groups, B, *sp, C)
        unflipped = []
        for m in range(members):
            for half in range(2):
                base = m * 16 + half * 8
                unflipped.append(probs[base])
                for fi, axes in enumerate(FLIP_COMBOS):
                    # spatial axes shift by one (leading batch axis here)
                    unflipped.append(jnp.flip(probs[base + 1 + fi],
                                              axis=axes))
        return jnp.stack(unflipped), None

    return model, predict
