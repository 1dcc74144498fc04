"""The fit loop: epochs over the host pipeline feeding the jitted step.

Mirrors the reference's Trainer wiring (reference:
uncertainty_modeling/main.py:33-88): datamodule prepare/setup, per-epoch
train + validation, TensorBoard scalar logging, LR scheduling (polynomial
per-step / plateau per-epoch), and self-describing checkpoints saved under
``save_dir/<exp_name>/<version>/checkpoints/``.
"""
from __future__ import annotations

import os
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config, instantiate
from ..core.seed import set_seed
from . import optim
from .checkpoint import CheckpointRetention
from .experiment import Experiment
from .tb_logging import TensorBoardLogger


def _device_batch(batch: Dict, sharding=None) -> Dict:
    """Stage a host batch on device, sharded when a mesh is active.

    Multi-host: every process assembles the IDENTICAL global batch (the
    loaders' per-sample RNG streams are deterministic), and
    ``make_array_from_callback`` lets each host contribute only its
    addressable shards — ``device_put`` alone cannot build an array that
    spans non-addressable devices. Single-process meshes take the same
    path (the callback just slices locally)."""
    if sharding is not None:
        def put(x):
            x = np.asarray(x)
            return jax.make_array_from_callback(
                x.shape, sharding, lambda idx: x[idx])
    else:
        put = jnp.asarray
    out = {"data": put(batch["data"])}
    if "seg" in batch:
        out["seg"] = put(batch["seg"])
    return out


def _log_val_image(logger, experiment, state, batch, rng,
                   step: int) -> None:
    """Log one validation segmentation panel (input / GT / prediction),
    mirroring the reference's TensorBoard image grids
    (lightning_experiment.py:332-372). Best-effort: failures never break
    training."""
    try:
        data = jnp.asarray(batch["data"][:1])
        variables = {"params": state.params, **(state.model_state or {})}
        out = experiment.model.apply(variables, data) \
            if not experiment.needs_dropout_rng else \
            experiment.model.apply(variables, data, rngs={"dropout": rng})
        if isinstance(out, tuple):
            out = out[0]
        if hasattr(out, "rsample"):  # SSN distribution (not a jnp array:
            # hasattr(out, "mean") is true for arrays too — the .mean METHOD)
            event = (experiment.num_classes,) + data.shape[1:-1]
            out = jnp.moveaxis(out.mean.reshape((1,) + event), 1, -1)
        pred = np.asarray(jnp.argmax(out, axis=-1))[0]
        img = np.asarray(data)[0]
        if img.ndim == 4:  # 3D volume -> central slice
            mid = img.shape[0] // 2
            img2d, pred2d = img[mid, ..., 0], pred[mid]
            seg2d = np.asarray(batch["seg"])[0][mid] if "seg" in batch \
                else np.zeros_like(pred2d)
        else:
            img2d = img.mean(axis=-1)
            pred2d = pred
            seg2d = (np.asarray(batch["seg"])[0] if "seg" in batch
                     else np.zeros_like(pred2d))
        def norm(x):
            x = x.astype(np.float32)
            lo, hi = x.min(), x.max()
            return (x - lo) / (hi - lo + 1e-8)
        panel = np.concatenate(
            [norm(img2d), norm(seg2d), norm(pred2d)], axis=1)[..., None]
        logger.log_image("validation/example", np.repeat(panel, 3, axis=-1),
                         step)
    except Exception as exc:  # best-effort, but never silently
        if not getattr(_log_val_image, "_warned", False):
            _log_val_image._warned = True
            import warnings
            warnings.warn(f"validation image logging failed: {exc!r} "
                          "(further failures suppressed)")


def fit(cfg: Config, max_steps_override: Optional[int] = None,
        resume_from: Optional[str] = None) -> str:
    """Train per the config; returns the final checkpoint path.

    ``resume_from``: path to a native checkpoint — model params, optimizer
    state, epoch and global step are restored (the reference relies on
    PL's resume; here the checkpoint is fully self-describing).
    """
    # multi-host init must precede ANY XLA-backend touch (set_seed
    # creates PRNG arrays); no-op without COORDINATOR_ADDRESS
    from ..parallel.mesh import initialize_distributed
    initialize_distributed()
    set_seed(int(cfg.get("seed", 123)))

    if "DATASET_LOCATION" in os.environ:
        cfg["data_input_dir"] = os.environ["DATASET_LOCATION"]
    if "EXPERIMENT_LOCATION" in os.environ:
        cfg["save_dir"] = os.environ["EXPERIMENT_LOCATION"]
    if "LSB_JOBID" in os.environ and not cfg.get("version"):
        cfg["version"] = os.environ["LSB_JOBID"]

    logger_cfg = cfg.get("logger")
    if logger_cfg:
        logger = instantiate(dict(logger_cfg, version=cfg.get("version")))
    else:
        logger = TensorBoardLogger(cfg.get("save_dir", "."),
                                   cfg.get("exp_name", "default"),
                                   version=cfg.get("version"))
    if not cfg.get("version"):
        cfg["version"] = logger.version

    is_2d = "AUGMENTATIONS" in cfg
    if is_2d:
        dm_cfg = dict(cfg.datamodule.to_container(), _recursive_=False)
        datamodule = instantiate(
            dm_cfg, data_input_dir=cfg.get("data_input_dir"),
            augmentations=cfg["AUGMENTATIONS"],
            batch_size=cfg.get("batch_size",
                               cfg.datamodule.get("batch_size", 6)),
            max_epochs=cfg.get("max_epochs", 1), seed=cfg.get("seed", 123))
    else:
        datamodule = instantiate(
            cfg.datamodule,
            data_input_dir=cfg.get("data_input_dir"),
            batch_size=cfg.get("batch_size",
                               cfg.datamodule.get("batch_size", 8)))
    if jax.process_index() == 0:
        datamodule.prepare_data()  # one writer for preprocessing output
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices("values_tpu_prepare_data")
    datamodule.setup()

    experiment = Experiment(cfg)

    # -- device mesh (production data parallelism) ----------------------
    # `devices` (ours) or `gpus` (reference schema, configs/*.yaml:13)
    # selects the data-parallel width; "all"/-1 takes every visible chip.
    from ..parallel.mesh import (batch_sharding, make_hybrid_mesh,
                                 make_mesh, make_parallel_train_step,
                                 replicated, resolve_device_count)
    n_devices = resolve_device_count(
        cfg.get("devices", cfg.get("gpus")), available=len(jax.devices()))
    if n_devices > len(jax.devices()):
        print(f"requested {n_devices} devices but only "
              f"{len(jax.devices())} visible on "
              f"{jax.devices()[0].platform}; clamping")
        n_devices = len(jax.devices())
    mesh = None
    train_sharding = None
    dcn = int(cfg.get("dcn_granules", 0) or 0)
    if n_devices > 1:
        if dcn > 1:
            # multi-slice/multi-host: data axis granule-major over DCN,
            # always spanning EVERY visible device — a devices/gpus
            # restriction cannot be honored here, so reject it loudly
            if n_devices != len(jax.devices()):
                raise ValueError(
                    f"dcn_granules={dcn} spans all "
                    f"{len(jax.devices())} devices; it cannot be "
                    f"combined with devices={n_devices} — drop the "
                    "devices restriction or the dcn_granules key")
            mesh = make_hybrid_mesh(n_sample=1, dcn_data=dcn)
            n_devices = mesh.shape["data"]
        else:
            mesh = make_mesh(n_data=n_devices, n_sample=1,
                             devices=jax.devices()[:n_devices])
        train_sharding = batch_sharding(mesh)
        val_sharding = replicated(mesh)
        parallel_step = make_parallel_train_step(experiment, mesh)
        print(f"data-parallel over {mesh.shape} mesh"
              + (f" ({dcn} DCN granules)" if dcn > 1 else ""))

    rng = jax.random.PRNGKey(int(cfg.get("seed", 123)))
    rng, init_rng = jax.random.split(rng)
    if is_2d:
        aug = cfg["AUGMENTATIONS"]
        state = experiment.init_state_2d(
            init_rng, int(aug["height"]), int(aug["width"]),
            int(cfg.select("MODEL.INPUT_CHANNELS", 3)))
    else:
        patch_size = int(cfg.select("datamodule.patch_size", 64))
        in_channels = int(cfg.select("model.in_channels", 1))
        state = experiment.init_state(init_rng, patch_size, in_channels)

    start_epoch = 0
    global_step = 0
    if resume_from:
        from .checkpoint import load_checkpoint
        payload = load_checkpoint(resume_from)
        variables = payload["state_dict"]
        resumed = experiment.state_from_variables(variables)
        opt_state = (jax.tree_util.tree_map(jnp.asarray,
                                            payload["opt_state"])
                     if payload.get("opt_state") is not None
                     else resumed.opt_state)
        state = resumed._replace(
            opt_state=opt_state,
            step=jnp.asarray(payload.get("global_step", 0),
                             dtype=jnp.int32))
        start_epoch = int(payload.get("epoch", -1)) + 1
        global_step = int(payload.get("global_step", 0))
        print(f"Resumed from {resume_from} at epoch {start_epoch}, "
              f"step {global_step}")
    if mesh is not None:
        state = jax.device_put(state, replicated(mesh))

    max_epochs = int(cfg.get("max_epochs", 1))
    train_loader = datamodule.train_dataloader()
    val_loader = datamodule.val_dataloader()
    steps_per_epoch = len(train_loader)
    max_steps = (max_steps_override
                 or steps_per_epoch * max_epochs)

    schedule = experiment.lr_schedule
    if schedule.kind == "polynomial" and schedule.total_iters <= 0:
        schedule = schedule._replace(total_iters=max_steps)
    plateau = optim.PlateauTracker(schedule)

    # multi-host: exactly one process touches the shared filesystem
    # (checkpoints, TensorBoard events, validation panels)
    is_main_process = jax.process_index() == 0
    if is_main_process:
        logger.log_hparams(cfg.to_container())
    ckpt_dir = os.path.join(logger.log_dir, "checkpoints")
    ckpt_fmt = str(cfg.get("checkpoint_format", "pickle"))
    # orbax saves are COLLECTIVE on multi-host: every process calls
    # retention.save (checkpoint.save_checkpoint_orbax barriers + one
    # committer). orbax-async is collective too (r4): all processes
    # enqueue with AsyncCheckpointer and the commit thread barriers over
    # the coordination service, never device collectives.
    collective_ckpt = jax.process_count() > 1 and ckpt_fmt in (
        "orbax", "orbax-async")
    retention = CheckpointRetention(
        ckpt_dir, save_top_k=int(cfg.get("save_top_k", 0) or 0),
        every_n_epochs=int(cfg.get("checkpoint_every_n_epochs", 0) or 0),
        monitor="val_loss", fmt=ckpt_fmt)
    # gradient_clip_val is applied inside Experiment.train_step_fn
    # (torch clip_grad_norm_ semantics, optim.clip_grads_by_global_norm)

    t_start = time.time()
    for epoch in range(start_epoch, max_epochs):
        experiment.current_epoch = epoch
        pretrain = experiment.is_ssn and epoch < experiment.pretrain_epochs
        epoch_losses = []
        for batch in train_loader:
            if mesh is not None and len(batch["data"]) % n_devices:
                # PL's DistributedSampler analog: a ragged tail batch
                # cannot shard evenly; drop it (deterministic, logged once)
                if not getattr(fit, "_ragged_warned", False):
                    fit._ragged_warned = True
                    print(f"dropping ragged batch of {len(batch['data'])} "
                          f"(not divisible by {n_devices} devices)")
                continue
            if schedule.kind == "polynomial":
                state = state._replace(opt_state=optim.set_learning_rate(
                    state.opt_state, schedule.value(global_step)))
            rng, step_rng = jax.random.split(rng)
            if mesh is not None:
                state, loss = parallel_step(
                    state, _device_batch(batch, train_sharding), step_rng,
                    pretrain)
            else:
                state, loss = experiment.train_step(
                    state, _device_batch(batch), step_rng, pretrain)
            epoch_losses.append(loss)
            global_step += 1
            if max_steps_override and global_step >= max_steps_override:
                break
        if not epoch_losses:
            raise RuntimeError(
                f"epoch {epoch} ran zero steps: every batch was smaller "
                f"than the {n_devices}-device mesh width (train set too "
                "small for the configured batch_size/devices)")
        train_loss = float(jnp.mean(jnp.stack(epoch_losses)))
        if is_main_process:
            logger.log_scalars(
                {"training/train_loss": train_loss,
                 "lr": optim.get_learning_rate(state.opt_state)},
                global_step)

        # validation
        val_metrics: Dict[str, list] = {}
        logged_image = False
        for batch in val_loader:
            rng, val_rng = jax.random.split(rng)
            # mesh runs stage val batches replicated: a host-local array
            # cannot meet globally-replicated params across processes
            out = experiment.val_step(
                state.params, state.model_state,
                _device_batch(batch,
                              val_sharding if mesh is not None else None),
                val_rng)
            for k, v in out.items():
                val_metrics.setdefault(k, []).append(float(v))
            if not logged_image and is_main_process:
                _log_val_image(logger, experiment, state, batch, val_rng,
                               global_step)
                logged_image = True
        val_means = {f"validation/{k}": float(np.mean(v))
                     for k, v in val_metrics.items()}
        if is_main_process:
            logger.log_scalars(val_means, global_step)
        val_loss = val_means.get("validation/val_loss", train_loss)
        if jax.process_count() > 1:
            # the plateau-LR decision and the retention top-k decision
            # must be process-uniform: val batches are staged replicated,
            # but any host-side float drift here would desynchronize the
            # collective orbax barrier sequence (a hang) or the learning
            # rates (param divergence) — pin every process to process
            # 0's value
            from jax.experimental import multihost_utils
            val_loss = float(multihost_utils.broadcast_one_to_all(
                np.float32(val_loss)))
        print(f"epoch {epoch}: train_loss={train_loss:.4f} "
              + " ".join(f"{k.split('/')[-1]}={v:.4f}"
                         for k, v in val_means.items())
              + f" [{time.time() - t_start:.1f}s]")

        # plateau LR scheduling (torch ReduceLROnPlateau semantics incl.
        # the rel threshold 1e-4; optim.PlateauTracker)
        if schedule.kind == "plateau":
            state = state._replace(opt_state=optim.set_learning_rate(
                state.opt_state, plateau.step(val_loss)))

        if is_main_process or collective_ckpt:
            # pickle: one writer; orbax multi-host: collective save
            retention.save(
                {"params": state.params, **(state.model_state or {})},
                cfg.to_container(), epoch=epoch, global_step=global_step,
                opt_state=state.opt_state, monitored=val_loss)
        if max_steps_override and global_step >= max_steps_override:
            break

    logger.finalize()
    from .checkpoint import wait_for_async_checkpoints
    wait_for_async_checkpoints()
    return os.path.join(ckpt_dir, "last.ckpt")
