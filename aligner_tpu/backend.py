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
import os

import jax
import jax.numpy as jnp

# ALIGNER_PLATFORM=cpu forces the CPU backend even when a TPU platform
# plugin registered itself with higher priority (such plugins can override
# the JAX_PLATFORMS environment variable).
_forced = os.environ.get("ALIGNER_PLATFORM")
if _forced:
    jax.config.update("jax_platforms", _forced)

# Persistent compilation cache: DP-fill kernels recompile per (shape,
# params) tuple; caching them across processes matters when device
# compilation is remote.  Opt out with ALIGNER_NO_COMPILE_CACHE=1.
if not os.environ.get("ALIGNER_NO_COMPILE_CACHE"):
    _cache = os.environ.get(
        "ALIGNER_COMPILE_CACHE", os.path.expanduser("~/.cache/jax-aligner")
    )
    try:
        os.makedirs(_cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", _cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass


@functools.cache
def default_platform() -> str:
    return jax.devices()[0].platform


def on_tpu() -> bool:
    return default_platform() == "tpu"


def default_dtype() -> jnp.dtype:
    if on_tpu():
        return jnp.float32
    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32


# Below this many DP cells a single problem runs faster on the host than
# the device round-trip + compile; batch paths ignore this.  With the C++
# scalar engine available the host wins far longer than pure Python does.
SMALL_PROBLEM_CELLS = 64 * 64
SMALL_PROBLEM_CELLS_NATIVE = 768 * 768


def pick_backend(backend: str | None = None, cells: int | None = None) -> str:
    """Resolve a backend name; ``None``/"auto" → pallas on TPU, xla off.

    ``cells`` (problem area) lets single-pair entry points route small
    problems to the host engine — identical results, no device launch.
    """
    if backend in (None, "auto"):
        if cells is not None:
            from . import native

            limit = (
                SMALL_PROBLEM_CELLS_NATIVE
                if native.available()
                else SMALL_PROBLEM_CELLS
            )
            if cells <= limit:
                return "oracle"
        return "pallas" if on_tpu() else "xla"
    if backend not in ("oracle", "xla", "pallas"):
        raise ValueError(f"unknown backend {backend!r}")
    return backend
