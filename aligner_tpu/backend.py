"""Backend/platform helpers.

The framework has three compute engines for the DP fill, all implementing
the same exact semantics (SURVEY.md §2.3):

* ``oracle``  — scalar NumPy float64 (ground truth, host only).
* ``xla``     — batched ``lax.scan`` engine (this runs on CPU and TPU).
* ``pallas``  — the TPU Pallas kernel (lanes = problems, VMEM-resident
  columns); falls back to interpret mode off-TPU.

Default dtype is float32 on TPU (f64 is not supported by the hardware;
scores in all reference workloads are small sums of matrix entries, exact
in f32 for integer matrices) and float64 on CPU when x64 is enabled.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.cache
def default_platform() -> str:
    return jax.devices()[0].platform


def on_tpu() -> bool:
    return default_platform() == "tpu"


def default_dtype() -> jnp.dtype:
    if on_tpu():
        return jnp.float32
    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32


def pick_backend(backend: str | None = None) -> str:
    """Resolve a backend name; ``None``/"auto" → pallas on TPU, xla off."""
    if backend in (None, "auto"):
        return "pallas" if on_tpu() else "xla"
    if backend not in ("oracle", "xla", "pallas"):
        raise ValueError(f"unknown backend {backend!r}")
    return backend
