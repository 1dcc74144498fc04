"""Platform plumbing for environments that pre-import JAX.

The axon sitecustomize imports jax at interpreter startup and bakes
JAX_PLATFORMS into jax.config before user code runs, so the standard
environment variable silently loses. Every CLI entry point calls
:func:`honor_jax_platforms_env` first so `JAX_PLATFORMS=cpu python -m
values_tpu.training.main ...` behaves as documented.
"""
from __future__ import annotations

import os


def resolve_interpret(interpret: bool | None = None) -> bool:
    """Resolve a Pallas ``interpret`` kwarg: ``None`` means auto —
    compiled kernels on a real TPU, interpret mode everywhere else
    (CPU tests, the bench smoke mode). Library constructors take
    ``interpret=None`` so every caller works on any backend without
    plumbing the platform check themselves."""
    if interpret is None:
        import jax
        return jax.devices()[0].platform != "tpu"
    return bool(interpret)


def honor_jax_platforms_env() -> None:
    env_platforms = os.environ.get("JAX_PLATFORMS")
    if not env_platforms:
        return
    import jax
    try:
        jax.config.update("jax_platforms", env_platforms)
    except Exception:
        pass
