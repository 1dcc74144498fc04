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
