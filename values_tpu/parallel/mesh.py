"""Device-mesh parallelism: the framework's first-class scaling layer.

The reference has no distributed framework (SURVEY.md §2.7) — its latent
data-parallelism was never configured and its N stochastic passes run as
Python loops. Here parallelism is structural:

- mesh axes ``(data, sample)``: ``data`` shards the training batch /
  inference window batch (DP), ``sample`` shards ensemble members, MC
  passes and TTA variants (the embarrassingly-parallel C1 axis). Tensor/
  pipeline/expert parallelism are deliberately absent: at 1-65M params
  they would only add collective latency (SURVEY.md §2.7).
- gradient reduction, metric reductions and volume assembly compile to XLA
  collectives (psum / all_gather) over ICI — no hand-written NCCL analog.
- spatial ("space") sharding for volumes beyond one chip's HBM is the CP
  analog: windows are scattered along ``data`` and stitched with a final
  all_gather at the assembly boundary.
"""
from __future__ import annotations

from functools import partial
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
SAMPLE_AXIS = "sample"


def make_mesh(n_data: Optional[int] = None, n_sample: int = 1,
              devices=None) -> Mesh:
    """Build a (data, sample) mesh over the available devices."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    n_total = devices.size
    if n_data is None:
        n_data = n_total // n_sample
    if n_data * n_sample != n_total:
        raise ValueError(
            f"mesh {n_data}x{n_sample} != {n_total} devices")
    return Mesh(devices.reshape(n_data, n_sample), (DATA_AXIS, SAMPLE_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def sample_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (sample/member) axis over the sample axis."""
    return NamedSharding(mesh, P(SAMPLE_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Place a host batch dict with its arrays sharded along ``data``."""
    sharding = batch_sharding(mesh)
    return {k: jax.device_put(jnp.asarray(v), sharding)
            for k, v in batch.items()
            if isinstance(v, (np.ndarray, jnp.ndarray))}


def resolve_device_count(value, available: Optional[int] = None) -> int:
    """Parse a ``devices`` / reference ``gpus`` config value: int, numeric
    string (the reference uses ``gpus: '1'``), or "all"/-1 for every
    visible device."""
    if value is None:
        return 1
    if isinstance(value, str) and value.strip().lower() in ("all", "-1"):
        return available if available is not None else len(jax.devices())
    n = int(value)
    if n == -1:
        return available if available is not None else len(jax.devices())
    return max(1, n)


def make_parallel_train_step(experiment, mesh: Mesh):
    """jit the experiment's update over the mesh: batch sharded along
    ``data``, params/opt-state replicated. XLA inserts the gradient psum
    across data shards automatically (SPMD). ``pretrain`` (SSN
    pretrain-then-sample phase) is a static argument."""
    rep = replicated(mesh)
    data_shard = batch_sharding(mesh)

    def step(state, batch, rng, pretrain=False):
        return experiment.train_step_fn(state, batch, rng, pretrain)

    return jax.jit(
        step, static_argnums=(3,),
        in_shardings=(rep, {"data": data_shard, "seg": data_shard}, rep),
        out_shardings=(rep, rep))


def make_parallel_sample_predict(model, n_models: int, mesh: Mesh,
                                 n_pred: int = 1,
                                 stochastic: bool = False):
    """Shard a deep ensemble's members over the ``sample`` axis with
    shard_map: each chip runs its member shard's forwards; only the stacked
    softmax (or downstream fused statistics) crosses ICI.

    Plain jit sharding cannot partition a vmapped conv along the stacked-
    params axis (GSPMD would try to re-express it as a grouped conv), so
    the member loop is made explicitly local per shard.
    """
    from jax.sharding import PartitionSpec as P
    from ..inference.predictors import make_default_predictor

    n_shards = mesh.shape[SAMPLE_AXIS]
    if n_models % n_shards:
        raise ValueError(f"{n_models} members not divisible by "
                         f"{n_shards} sample shards")
    local_predict = make_default_predictor(
        model, n_models // n_shards, n_pred, stochastic)

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(P(SAMPLE_AXIS), P(), P()),
             out_specs=P(SAMPLE_AXIS), check_vma=False)
    def predict(local_members, x, rng):
        # decorrelate per-shard RNG streams
        rng = jax.random.fold_in(rng, jax.lax.axis_index(SAMPLE_AXIS))
        stack, _ = local_predict(local_members, x, rng)
        return stack

    return jax.jit(predict)


def make_parallel_pass_predict(model, mode: str, n_models: int, mesh: Mesh,
                               n_pred: int = 1,
                               n_aleatoric_samples: int = 10,
                               stochastic=None):
    """Generalized sample-axis sharding (VERDICT r2 item 5): shard the
    GLOBAL stochastic-pass space — ensemble members x MC-dropout passes,
    TTA's 16 variants, aleatoric/SSN sample draws — over the mesh
    ``sample`` axis. Params replicate (they are tiny at these model
    sizes; the activations are the memory), and every random draw is
    keyed by the global pass index, so outputs are bit-identical for ANY
    shard count (tests/test_parallel.py proves 1 == 2 == 4 shards).

    Returns a jitted (stacked_variables, x, rng) -> (stack, sigma|None)
    with stack (S_total, B, *spatial, C) assembled along the sample axis.
    """
    from jax.sharding import PartitionSpec as P
    from ..inference.predictors import (make_pass_range_predictor,
                                        total_passes)

    n_shards = mesh.shape[SAMPLE_AXIS]
    s_total = total_passes(mode, n_models, n_pred, n_aleatoric_samples)
    if s_total % n_shards:
        raise ValueError(
            f"mode={mode!r}: {s_total} stochastic passes not divisible "
            f"by {n_shards} sample shards")
    n_local = s_total // n_shards
    local = make_pass_range_predictor(
        model, mode, n_models, n_pred=n_pred,
        n_aleatoric_samples=n_aleatoric_samples, stochastic=stochastic)
    has_sigma = mode == "aleatoric"

    if has_sigma:
        @partial(jax.shard_map, mesh=mesh, in_specs=(P(), P(), P()),
                 out_specs=(P(SAMPLE_AXIS), P(SAMPLE_AXIS)),
                 check_vma=False)
        def predict(stacked_variables, x, rng):
            start = jax.lax.axis_index(SAMPLE_AXIS) * n_local
            return local(stacked_variables, x, rng, start, n_local)
        return jax.jit(predict)

    @partial(jax.shard_map, mesh=mesh, in_specs=(P(), P(), P()),
             out_specs=P(SAMPLE_AXIS), check_vma=False)
    def predict_stack(stacked_variables, x, rng):
        start = jax.lax.axis_index(SAMPLE_AXIS) * n_local
        stack, _ = local(stacked_variables, x, rng, start, n_local)
        return stack

    fn = jax.jit(predict_stack)
    return lambda v, x, rng: (fn(v, x, rng), None)


def make_sharded_scorer(score_fn, mesh: Mesh):
    """Data-parallel scores-only pipeline: shard the volume batch over
    the mesh ``data`` axis with shard_map, replicate the stacked member
    params, and run the packed scorer per shard — only the (10, B)
    score matrix crosses ICI at the output gather, matching the
    scorer's only-scalars-leave-the-chip contract
    (values_tpu.inference.scoring). Pallas kernels are single-device
    programs GSPMD cannot partition, so the batch split is explicit.

    Per-shard RNG folds in the ``data`` axis index, so the stochastic
    families (MC-dropout, TTA, aleatoric, SSN) draw decorrelated
    per-shard streams (statistically identical to unsharded, not
    bitwise); the deterministic softmax-ensemble scorer matches the
    unsharded run to kernel-tiling float association, ~1e-5
    (tests/test_parallel.py). The wrapped
    scorer accepts any batch size — it zero-pads up to a shard
    multiple and slices the pad back off, like the scorers themselves
    do for the pack multiple.
    """
    n_data = mesh.shape[DATA_AXIS]

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(P(), P(DATA_AXIS), P(DATA_AXIS), P()),
             out_specs=P(None, DATA_AXIS), check_vma=False)
    def sharded(stacked_variables, volumes, gt, rng):
        rng = jax.random.fold_in(rng, jax.lax.axis_index(DATA_AXIS))
        return score_fn(stacked_variables, volumes, gt, rng)

    jitted = jax.jit(sharded)

    def score(stacked_variables, volumes, gt, rng):
        b = volumes.shape[0]
        pad = (-b) % n_data
        if pad:
            volumes = jnp.concatenate(
                [volumes, jnp.zeros((pad,) + volumes.shape[1:],
                                    volumes.dtype)])
            gt = jnp.concatenate(
                [gt, jnp.zeros((pad,) + gt.shape[1:], gt.dtype)])
        return jitted(stacked_variables, volumes, gt, rng)[:, :b]

    return score


# -- multi-host (DCN) meshes -------------------------------------------------

def initialize_distributed() -> int:
    """Initialize JAX's multi-process runtime when launched as one process
    per host (GKE/TPU-VM pods), driven by standard env vars
    (``COORDINATOR_ADDRESS``, ``NUM_PROCESSES``, ``PROCESS_ID``).

    MUST run before anything initializes the XLA backend (device queries,
    array creation, PRNGKey) — ``values_tpu.training.main`` calls it
    first thing, and ``fit()`` calls it before its first JAX touch. A
    no-op when the env vars are absent or the runtime is already
    distributed; raises a clear error if the backend was initialized
    first (relaunch through the training CLI in that case)."""
    import os
    if not os.environ.get("COORDINATOR_ADDRESS"):
        return 1
    from jax._src import distributed as _distributed
    if getattr(_distributed.global_state, "client", None) is not None:
        return jax.process_count()  # already initialized
    try:
        jax.distributed.initialize(
            coordinator_address=os.environ["COORDINATOR_ADDRESS"],
            num_processes=int(os.environ["NUM_PROCESSES"]),
            process_id=int(os.environ["PROCESS_ID"]))
    except RuntimeError as exc:
        raise RuntimeError(
            "jax.distributed.initialize failed — the XLA backend was "
            "probably touched before initialize_distributed(); launch "
            "multi-host training via `python -m values_tpu.training.main` "
            "which initializes first") from exc
    return jax.process_count()


def make_hybrid_mesh(n_sample: int = 1,
                     dcn_data: Optional[int] = None) -> Mesh:
    """A (data, sample) mesh spanning multiple slices/hosts.

    The ``data`` axis is laid out hierarchically — slow DCN granules outer,
    fast ICI inner — via ``mesh_utils.create_hybrid_device_mesh``, so the
    gradient psum decomposes into an ICI reduce-scatter + small DCN
    all-reduce + ICI all-gather (the scaling-book recipe for
    data-parallelism across slices). ``sample`` stays inside one slice
    (ensemble members never need to talk across DCN).

    Single-slice (or CPU-virtual) runs fall back to :func:`make_mesh`
    transparently, so config plumbing is identical from 1 chip to a
    multi-slice pod.
    """
    n_total = len(jax.devices())
    granules = getattr(jax.devices()[0], "slice_index", None)
    num_slices = (len({d.slice_index for d in jax.devices()})
                  if granules is not None else jax.process_count())
    if dcn_data is None:
        dcn_data = num_slices
    if dcn_data <= 1:
        return make_mesh(n_data=n_total // n_sample, n_sample=n_sample)
    if n_total % (dcn_data * n_sample):
        raise ValueError(f"{n_total} devices not divisible into "
                         f"{dcn_data} DCN granules x {n_sample} sample")

    # granule-major device order: all of DCN granule 0 first, then 1, ...
    # so the outer blocks of the `data` axis align with DCN boundaries and
    # every (data-inner, sample) collective stays on ICI.
    all_devices = sorted(jax.devices(), key=lambda d: d.id)
    raw = [getattr(d, "slice_index", getattr(d, "process_index", 0))
           for d in all_devices]
    if len(set(raw)) != dcn_data:
        # virtual/CPU devices carry no granule attribute: synthesize
        # contiguous granules (id-order blocks), preserving the contract
        raw = [i * dcn_data // n_total for i in range(n_total)]
    devices = [d for _, d in sorted(zip(raw, all_devices),
                                    key=lambda t: (t[0], t[1].id))]
    arr = np.asarray(devices).reshape(n_total // n_sample, n_sample)
    return Mesh(arr, (DATA_AXIS, SAMPLE_AXIS))
