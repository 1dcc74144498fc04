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
    if is_orbax_checkpoint(path):
        return load_checkpoint_orbax(path)
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
    if is_orbax_checkpoint(path):
        payload = load_checkpoint_orbax(path)
        return payload["hyper_parameters"], payload["state_dict"]
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


class CheckpointRetention:
    """Retention policy around :func:`save_checkpoint`.

    The reference relies on PL's default ModelCheckpoint (last epoch
    only); production TPU training wants bounded history plus best-k by a
    monitored metric (SURVEY.md §5 checkpoint/resume; VERDICT r1 item 10).

    - ``last.ckpt`` is always (re)written at every save point.
    - ``every_n_epochs > 0`` additionally keeps ``epoch=<E>.ckpt``
      snapshots at that cadence (never pruned).
    - ``save_top_k > 0`` keeps the k best ``epoch=<E>-<monitor>=<v>.ckpt``
      by the monitored value (lower is better, e.g. ``val_loss``); worse
      ones are deleted as better ones arrive.
    """

    def __init__(self, ckpt_dir: str, save_top_k: int = 0,
                 every_n_epochs: int = 0, monitor: str = "val_loss",
                 fmt: str = "pickle", async_save: bool = False):
        if fmt not in ("pickle", "orbax", "orbax-async"):
            raise ValueError(f"unknown checkpoint format {fmt!r}")
        if fmt == "orbax-async":
            fmt, async_save = "orbax", True
        self.async_save = bool(async_save) and fmt == "orbax"
        self.ckpt_dir = Path(ckpt_dir)
        self.save_top_k = int(save_top_k)
        self.every_n_epochs = int(every_n_epochs)
        self.monitor = monitor
        self.fmt = fmt
        self._best: list = []  # (value, path), sorted ascending

    def save(self, variables: Any, hyper_parameters: Dict, *, epoch: int,
             global_step: int, opt_state: Any = None,
             monitored: float = None) -> str:
        # one device->host copy per save() even when several files are
        # written this epoch (last + every-n + top-k)
        variables = _to_numpy_tree(variables)
        if opt_state is not None:
            opt_state = _to_numpy_tree(opt_state)
        primary = jax.process_index() == 0

        def write(name: str) -> str:
            path = str(self.ckpt_dir / name)
            if self.fmt == "orbax":
                # collective on multi-host (all processes call)
                save_checkpoint_orbax(
                    path, variables, hyper_parameters, epoch=epoch,
                    global_step=global_step, opt_state=opt_state,
                    async_save=self.async_save)
            elif primary:  # pickle: single writer
                save_checkpoint(path, variables, hyper_parameters,
                                epoch=epoch, global_step=global_step,
                                opt_state=opt_state)
            return path

        last = write("last.ckpt")
        if self.every_n_epochs > 0 and (epoch + 1) % self.every_n_epochs == 0:
            write(f"epoch={epoch}.ckpt")
        if self.save_top_k > 0 and monitored is not None \
                and np.isfinite(monitored):
            value = float(monitored)
            if len(self._best) < self.save_top_k \
                    or value < self._best[-1][0]:
                path = write(
                    f"epoch={epoch}-{self.monitor}={value:.4f}.ckpt")
                self._best.append((value, path))
                self._best.sort(key=lambda t: t[0])
                while len(self._best) > self.save_top_k:
                    _, worst = self._best.pop()
                    if not primary:  # shared fs: one deleter
                        continue
                    if Path(worst).is_dir():
                        import shutil
                        shutil.rmtree(worst, ignore_errors=True)
                    else:
                        Path(worst).unlink(missing_ok=True)
        return last

    @property
    def best_path(self) -> str:
        return self._best[0][1] if self._best else str(
            self.ckpt_dir / "last.ckpt")


# -- orbax backend (large states, async-capable, zarr-sharded) --------------

_ASYNC_CHECKPOINTER = None
_ASYNC_SAVE_SEQ = 0


def _coordination_client():
    """The jax distributed coordination-service client (None when the
    process was not started under jax.distributed.initialize)."""
    try:
        from jax._src import distributed
        return distributed.global_state.client
    except Exception:  # pragma: no cover - jax internals moved
        return None


def _coord_barrier(name: str, timeout_ms: int = 600_000) -> None:
    """Cross-process barrier over the coordination service — device-free,
    so it is safe on background threads running concurrently with
    training-step collectives (the reason device-collective barriers like
    multihost_utils.sync_global_devices are banned on the async commit
    path)."""
    client = _coordination_client()
    if client is not None:
        client.wait_at_barrier(name, timeout_in_ms=timeout_ms)


def _async_checkpointer():
    global _ASYNC_CHECKPOINTER
    if _ASYNC_CHECKPOINTER is None:
        import orbax.checkpoint as ocp
        _ASYNC_CHECKPOINTER = ocp.AsyncCheckpointer(
            ocp.PyTreeCheckpointHandler())
    return _ASYNC_CHECKPOINTER


def wait_for_async_checkpoints() -> None:
    """Block until in-flight async orbax writes are durable AND committed
    (meta + rename); called at fit() teardown and before read-back.
    Re-raises any background commit failure — a silently lost checkpoint
    must never look like success."""
    if _ASYNC_CHECKPOINTER is not None:
        _ASYNC_CHECKPOINTER.wait_until_finished()
    errors = []
    while _ASYNC_COMMIT_THREADS:
        t, holder = _ASYNC_COMMIT_THREADS.pop()
        t.join()
        if holder:
            errors.append(holder[0])
    if errors:
        raise RuntimeError(
            f"async checkpoint commit failed: {errors[0]!r}"
        ) from errors[0]


def save_checkpoint_orbax(path: str, variables: Any, hyper_parameters: Dict,
                          epoch: int = 0, global_step: int = 0,
                          opt_state: Any = None,
                          async_save: bool = False) -> None:
    """Directory-based orbax checkpoint with the same self-describing
    payload as the pickle format. For multi-GB states orbax writes
    zarr-sharded arrays (parallel IO, partial restore) — the production
    choice the pickle format cannot scale to.

    ``async_save``: hand the (host-copied) state to orbax's background
    thread so the training loop continues while zarr shards hit disk;
    the temp-dir + rename commit happens after the write completes, so
    the durable-checkpoint invariant of the sync path is preserved.
    Call :func:`wait_for_async_checkpoints` before reading back.
    """
    import shutil
    import orbax.checkpoint as ocp
    multi = jax.process_count() > 1
    primary = jax.process_index() == 0
    if multi and async_save and _coordination_client() is None:
        # without a coordination service the background commit barrier
        # would need device collectives — unsafe concurrent with
        # training-step collectives on the main thread; degrade to the
        # sync collective path (jax multi-process normally always has
        # the service via jax.distributed.initialize)
        async_save = False
    path = Path(path).absolute()
    # write-to-temp + rename: the multi-second zarr write must never
    # leave a window with NO valid checkpoint on disk (preemption during
    # the every-epoch last.ckpt overwrite would otherwise lose the run)
    tmp = path.parent / (path.name + ".writing")
    if async_save:
        wait_for_async_checkpoints()  # one in-flight write at a time
    if primary and tmp.exists():
        shutil.rmtree(tmp)
    payload = {"state_dict": _to_numpy_tree(variables)}
    if opt_state is not None:
        payload["opt_state"] = _to_numpy_tree(opt_state)
    meta = {"format": FORMAT_KEY, "hyper_parameters": hyper_parameters,
            "epoch": epoch, "global_step": global_step,
            "has_opt_state": opt_state is not None}

    def commit():
        with open(tmp / "values_tpu_meta.pkl", "wb") as f:
            pickle.dump(meta, f)
        if path.exists():
            shutil.rmtree(path)
        tmp.rename(path)

    if async_save:
        # COLLECTIVE when multi (VERDICT r3 item 10): every process
        # enqueues with orbax's AsyncCheckpointer — its internal barriers
        # ride the distributed coordination service (client.wait_at_barrier
        # via get_barrier_sync_fn), NOT device collectives, so the
        # background write cannot interleave with training-step
        # collectives on the main thread. Numpy trees are written by the
        # primary host only; ONE committer (primary) renames behind a
        # coordination-service barrier.
        global _ASYNC_SAVE_SEQ
        _ASYNC_SAVE_SEQ += 1
        seq = _ASYNC_SAVE_SEQ
        ckptr = _async_checkpointer()
        ckptr.save(tmp, payload, force=True)
        # orbax finalizes the write on its background thread; commit
        # (meta + rename) rides a follow-up thread gated on completion
        import threading

        holder: list = []

        def waiter():
            try:
                ckptr.wait_until_finished()
                if multi:
                    _coord_barrier(f"vt_async_written_{seq}")
                if primary:
                    commit()
                if multi:
                    # non-primaries must not observe pre-rename state
                    _coord_barrier(f"vt_async_committed_{seq}")
            except BaseException as exc:  # surfaced by wait_for_async_*
                holder.append(exc)
        t = threading.Thread(target=waiter, daemon=False)
        t.start()
        _ASYNC_COMMIT_THREADS.append((t, holder))
        return
    if multi:
        # COLLECTIVE save (VERDICT r2 item 6): every process calls
        # orbax's save (its internal barriers require it; numpy trees
        # are written by the primary host), then exactly one process
        # commits meta + rename behind a global barrier.
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices(f"orbax_pre:{path.name}")
        with ocp.PyTreeCheckpointer() as ckptr:
            ckptr.save(tmp, payload, force=True)
        multihost_utils.sync_global_devices(f"orbax_written:{path.name}")
        if primary:
            commit()
        multihost_utils.sync_global_devices(f"orbax_commit:{path.name}")
        return
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(tmp, payload)
    commit()


_ASYNC_COMMIT_THREADS: list = []


def load_checkpoint_orbax(path: str) -> Dict:
    """Load an orbax checkpoint dir into the pickle-format payload dict."""
    import orbax.checkpoint as ocp
    path = Path(path).absolute()
    with open(path / "values_tpu_meta.pkl", "rb") as f:
        meta = pickle.load(f)
    with ocp.PyTreeCheckpointer() as ckptr:
        payload = ckptr.restore(path)
    out = {"format": FORMAT_KEY,
           "state_dict": payload["state_dict"],
           "hyper_parameters": meta["hyper_parameters"],
           "epoch": meta["epoch"], "global_step": meta["global_step"]}
    if meta.get("has_opt_state"):
        out["opt_state"] = payload["opt_state"]
    return out


def is_orbax_checkpoint(path: str) -> bool:
    return (Path(path).is_dir()
            and (Path(path) / "values_tpu_meta.pkl").exists())
