"""Joint packed training of a deep ensemble — M members in ONE step.

The reference trains each Deep Ensemble member as an independent run
(reference: uncertainty_modeling/main.py with a different ``seed`` per
member; test_3D.py:424 then loads the N checkpoints). Training runs
back-to-back on one GPU, so an M-member ensemble costs M full trainings.

TPU-native restructuring: the M members train SIMULTANEOUSLY inside one
grouped packed forward/backward. Member m's weights form channel group m
of every grouped conv (the same layout the inference engine uses,
``ensemble_unet3d.group_member_variables``), and member m's OWN batch
rides in input-channel slot m — so the step computes exactly the M
independent forward/backwards of the reference's M runs, but as grouped
GEMMs at the packed kernel's efficient geometry (cout 8 -> 8*M per
band) instead of M sequential small-GEMM steps.

Member independence is structural, not approximate:

- grouped convs never mix channel groups, so ``d loss_m / d params_k = 0``
  for k != m, and summing the per-member losses yields per-member
  gradients identical to M separate runs;
- Adam is elementwise, so the update of member m's block depends only on
  member m's gradients;
- each member draws its init from its own fold of the seed (parity with
  the reference's per-member ``seed`` override), sees its own
  independently shuffled data stream, and dropout masks over the grouped
  tensor are elementwise-independent across member channel blocks.

After training, :meth:`EnsembleTrainer.member_variables` splits the
grouped tree back into M standard flax trees and
:meth:`save_member_checkpoints` writes one self-describing checkpoint
per member, so the unchanged 3D inference CLI (test_3d
``--checkpoint_paths a b c``) consumes the jointly trained ensemble.
"""
from __future__ import annotations

import functools
from typing import Any, Dict, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..ops import losses as L
from . import optim
from .experiment import _to_channel_first


class EnsembleTrainState(NamedTuple):
    params: Any          # grouped tree (ensemble_unet3d grouping)
    opt_state: Any
    step: jnp.ndarray


class EnsembleTrainer:
    """Step-level API for joint packed deep-ensemble training.

    ``cfg`` is the standard training config (softmax_config /
    dropout_config schema); the model must be a 3D UNet3D family member
    (plain, dropout, or aleatoric head). SSN and 2D models keep their
    per-run training path (``Experiment``).
    """

    def __init__(self, cfg: Config, members: int):
        from ..config.instantiate import instantiate
        from ..models.unet3d import UNet3D

        if members < 1:
            raise ValueError(f"members must be >= 1, got {members}")
        self.cfg = cfg
        self.members = int(members)
        extra_kwargs = {}
        if cfg.get("aleatoric_loss") is not None:
            extra_kwargs["aleatoric_loss"] = cfg.get("aleatoric_loss")
        from ..models.ssn_unet3d import SsnUNet3D
        self.model = instantiate(cfg.model, **extra_kwargs)
        if not isinstance(self.model, UNet3D) or isinstance(
                self.model, SsnUNet3D):
            raise ValueError(
                "EnsembleTrainer supports the 3D UNet3D family only "
                f"(got {type(self.model).__name__}); train SSN/2D models "
                "per member via Experiment")
        if cfg.get("gradient_clip_val") is not None:
            raise ValueError(
                "gradient_clip_val couples members through the global "
                "grad norm; none of the 3D reference configs set it — "
                "use per-member Experiment runs if you need clipping")
        self.num_classes = int(getattr(self.model, "num_classes"))
        self.ignore_index = int(cfg.select("datamodule.ignore_index", 0))
        self.learning_rate = float(cfg.get("learning_rate", 1e-4))
        self.weight_decay = float(cfg.get("weight_decay", 1e-6))
        self.has_dropout = bool(getattr(self.model, "do_dropout", False))
        self.aleatoric = bool(cfg.get("aleatoric_loss") or False)
        self.n_aleatoric_samples = int(cfg.get("n_aleatoric_samples", 10))
        precision = str(cfg.get("precision", "32")).lower()
        self.mixed_bf16 = precision in ("bf16", "16", "mixed", "bf16-mixed")
        self.optimizer = optim.adam(lr=self.learning_rate,
                                    weight_decay=self.weight_decay)

    # ------------------------------------------------------------------
    def init_state(self, rng: jax.Array, patch_size: int,
                   in_channels: int = 1) -> EnsembleTrainState:
        from ..models.ensemble_unet3d import group_member_variables
        from ..models.ensemble_unet3d_pallas import LANES

        if LANES % patch_size != 0:
            raise ValueError(
                f"packed ensemble training requires patch_size to divide "
                f"{LANES} (got {patch_size})")
        sample = jnp.zeros((1,) + (patch_size,) * 3 + (in_channels,))
        init = jax.jit(self.model.init)
        trees = [init(jax.random.fold_in(rng, m), sample)
                 for m in range(self.members)]
        grouped = group_member_variables(trees)
        params = jax.tree_util.tree_map(jnp.asarray, grouped["params"])
        return EnsembleTrainState(params=params,
                                  opt_state=self.optimizer.init(params),
                                  step=jnp.zeros((), jnp.int32))

    # ------------------------------------------------------------------
    def _member_logits(self, gparams, data: jnp.ndarray,
                      rng: Optional[jax.Array]):
        """data (M, B, D, H, W, Cin) -> per-member logits
        (M, B, D, H, W, C_out) through ONE grouped packed forward."""
        from ..models.ensemble_unet3d_pallas import (LANES, pack_ndhwc,
                                                     unpack_ndhwc)
        from ..models.ensemble_unet3d_pallas import grouped_forward_packed

        m, b, d, h, w, cin = data.shape
        assert m == self.members, (m, self.members)
        bp = LANES // w
        pad_b = (-b) % bp
        # member m's batch occupies input-channel block m
        x = jnp.moveaxis(data, 0, -2).reshape(b, d, h, w, m * cin)
        if pad_b:
            x = jnp.concatenate(
                [x, jnp.zeros((pad_b,) + x.shape[1:], x.dtype)], axis=0)
        cast = (lambda t: t.astype(jnp.bfloat16)) if self.mixed_bf16 \
            else (lambda t: t)
        gv = {"params": jax.tree_util.tree_map(cast, gparams)}
        xp = pack_ndhwc(cast(x), bp)
        out = grouped_forward_packed(
            gv, xp, m, w, do_dropout=self.has_dropout, rng=rng,
            trainable=True,
            interpret=jax.devices()[0].platform != "tpu")
        nb, d_, h_, _m, c, lanes = out.shape
        flat = unpack_ndhwc(out.reshape(nb, d_, h_, _m * c, lanes), bp)[:b]
        flat = flat.reshape(b, d, h, w, m, c)
        return jnp.moveaxis(flat, -2, 0)      # (M, B, D, H, W, c)

    def _loss(self, gparams, batch: Dict, rng: jax.Array):
        """Sum of per-member losses; aux = (M,) per-member losses.

        batch: ``data`` (M, B, D, H, W, Cin) float, ``seg`` (M, B, D, H, W)
        int — member m's own stream in row m.
        """
        data = batch["data"]
        target = batch["seg"].astype(jnp.int32)
        rng, drop_rng = jax.random.split(rng)
        logits = self._member_logits(
            gparams, data, drop_rng if self.has_dropout else None)
        f32 = lambda t: t.astype(jnp.float32)
        if self.aleatoric:
            mu, s = jnp.split(logits, 2, axis=-1)
            member_rngs = jax.random.split(rng, self.members)
            loss_m = jax.vmap(
                lambda mu_m, s_m, tg, k: L.aleatoric_sampling_loss(
                    _to_channel_first(f32(mu_m)),
                    _to_channel_first(f32(s_m)), tg, k,
                    n_samples=self.n_aleatoric_samples))(
                mu, s, target, member_rngs)
        else:
            loss_m = jax.vmap(
                lambda lg, tg: L.dice_ce_loss(
                    _to_channel_first(f32(lg)), tg,
                    ignore_index=self.ignore_index))(logits, target)
        return jnp.sum(loss_m), loss_m

    # ------------------------------------------------------------------
    def train_step_fn(self, state: EnsembleTrainState, batch: Dict,
                      rng: jax.Array
                      ) -> Tuple[EnsembleTrainState, jnp.ndarray]:
        (_, loss_m), grads = jax.value_and_grad(
            self._loss, has_aux=True)(state.params, batch, rng)
        updates, opt_state = self.optimizer.update(
            grads, state.opt_state, state.params)
        params = jax.tree_util.tree_map(
            lambda p, u: p + u, state.params, updates)
        return EnsembleTrainState(params, opt_state,
                                  state.step + 1), loss_m

    @functools.partial(jax.jit, static_argnums=(0,), donate_argnums=(1,))
    def train_step(self, state: EnsembleTrainState, batch: Dict,
                   rng: jax.Array
                   ) -> Tuple[EnsembleTrainState, jnp.ndarray]:
        """Jitted joint update; returns (state, per-member losses (M,))."""
        return self.train_step_fn(state, batch, rng)

    # ------------------------------------------------------------------
    def member_variables(self, state: EnsembleTrainState) -> List[Dict]:
        from ..models.ensemble_unet3d import ungroup_member_variables
        return ungroup_member_variables({"params": state.params},
                                        self.members)

    def save_member_checkpoints(self, state: EnsembleTrainState,
                                ckpt_dir: str, *, epoch: int = 0,
                                extra_hparams: Optional[Dict] = None
                                ) -> List[str]:
        """One self-describing checkpoint per member (the L3->L4 contract:
        inference reconstructs everything from the checkpoint,
        test_3D.py:635-668); member m's file carries seed fold m."""
        import os

        from .checkpoint import save_checkpoint
        hp = dict(self.cfg.to_container())
        hp.update(extra_hparams or {})
        os.makedirs(ckpt_dir, exist_ok=True)
        paths = []
        for m, variables in enumerate(self.member_variables(state)):
            hp_m = dict(hp)
            hp_m["ensemble_member"] = m
            path = os.path.join(ckpt_dir, f"member_{m}.ckpt")
            save_checkpoint(path, variables, hp_m, epoch=epoch,
                            global_step=int(state.step))
            paths.append(path)
        return paths
