"""Fused C2 uncertainty kernel (Pallas/TPU): one VMEM pass over the sample
axis producing mean softmax + PE + EE + MI per voxel.

The reference computes these as separate full-volume torch passes on host
(test_3D.py:486-534). The XLA path (values_tpu.ops.uncertainty.
fused_sample_statistics) already fuses well; this kernel guarantees the
single-pass schedule and keeps the (S*C, N) stack tile resident in VMEM —
the sample axis never touches HBM between statistics.

Layout: softmax stack flattened to (S*C, N) rows (sample-major), N tiled
along the lane dimension; the small S and C axes unroll as Python loops
over 2D (1, TILE_N) row vectors — the Mosaic-friendly shape. Numerics
match the reference's 0*log0-guard semantics (p == 0 contributes 0).
"""
from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


def _make_kernel(s: int, c: int):
    def kernel(stack_ref, mean_ref, pe_ref, ee_ref, mi_ref):
        def guarded_plogp(p):
            return jnp.where(p > 0,
                             p * jnp.log(jnp.where(p > 0, p, 1.0)), 0.0)

        inv_s = 1.0 / s
        pe_acc = None
        ee_acc = None
        for ci in range(c):
            mean_row = stack_ref[ci, :] * inv_s
            for si in range(1, s):
                mean_row = mean_row + stack_ref[si * c + ci, :] * inv_s
            mean_ref[ci, :] = mean_row
            term = guarded_plogp(mean_row)
            pe_acc = term if pe_acc is None else pe_acc + term
        for si in range(s):
            ent = None
            for ci in range(c):
                term = guarded_plogp(stack_ref[si * c + ci, :])
                ent = term if ent is None else ent + term
            ee_acc = ent if ee_acc is None else ee_acc + ent
        pe = -pe_acc
        ee = -(ee_acc * inv_s)
        pe_ref[0, :] = pe
        ee_ref[0, :] = ee
        mi_ref[0, :] = pe - ee

    return kernel


@functools.partial(jax.jit, static_argnames=("tile_n", "interpret"))
def fused_entropy_pallas(softmax_stack: jnp.ndarray, tile_n: int = 8 * LANE,
                         interpret: bool = False) -> Dict[str, jnp.ndarray]:
    """softmax_stack: (S, C, N) with N a multiple of ``tile_n``
    (pad beforehand; the engine's flattened volumes are 128-multiples).
    Returns mean_softmax (C, N), pred_entropy/expected_entropy/
    mutual_information (N,)."""
    s, c, n = softmax_stack.shape
    if n % tile_n:
        raise ValueError(f"N={n} must be a multiple of tile_n={tile_n}")
    flat = softmax_stack.reshape(s * c, n)
    grid = (n // tile_n,)
    mem = pl.ANY if interpret else pltpu.VMEM
    row_spec = lambda rows: pl.BlockSpec((rows, tile_n), lambda i: (0, i),
                                         memory_space=mem)
    mean, pe, ee, mi = pl.pallas_call(
        _make_kernel(s, c),
        grid=grid,
        in_specs=[row_spec(s * c)],
        out_specs=[row_spec(c), row_spec(1), row_spec(1), row_spec(1)],
        out_shape=[
            jax.ShapeDtypeStruct((c, n), softmax_stack.dtype),
            jax.ShapeDtypeStruct((1, n), softmax_stack.dtype),
            jax.ShapeDtypeStruct((1, n), softmax_stack.dtype),
            jax.ShapeDtypeStruct((1, n), softmax_stack.dtype),
        ],
        interpret=interpret,
    )(flat)
    return {
        "mean_softmax": mean,
        "pred_entropy": pe[0],
        "expected_entropy": ee[0],
        "mutual_information": mi[0],
    }


def fused_entropy(softmax_stack: jnp.ndarray,
                  use_pallas: bool = True) -> Dict[str, jnp.ndarray]:
    """Dispatch: Pallas on TPU (shape permitting), XLA fusion elsewhere."""
    s, c, n = softmax_stack.shape
    on_tpu = jax.default_backend() == "tpu"
    if use_pallas and on_tpu and n % LANE == 0:
        tile = 8 * LANE if n % (8 * LANE) == 0 else LANE
        return fused_entropy_pallas(softmax_stack, tile_n=tile)
    from ..uncertainty import fused_sample_statistics
    return fused_sample_statistics(softmax_stack, class_axis=1)
