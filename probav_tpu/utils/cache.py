"""Persistent XLA compilation cache for the CLIs.

TPU compiles are the dominant cold-start cost of every entry point: the
first batched-FFT registration graph alone takes ~3 min to compile on a
v5e (steady-state execution of the same call is ~0.3 s), and the train
step another ~20-40 s.  JAX can persist compiled executables to disk and
reload them across processes; enabling that turns every run after the
first into a warm start — per stage shape, per backend.

Called by the CLIs (data_generator/train/test/evaluate) before the first
device computation.  Opt out with ``PROBAV_COMPILE_CACHE=off``; point the
cache somewhere else by setting the same variable to a path.
"""

from __future__ import annotations

import logging
import os

logger = logging.getLogger("probav_tpu.utils")

_DEFAULT = os.path.join(os.path.expanduser("~"), ".cache", "probav_tpu",
                        "xla")


def enable_compile_cache(path: str | None = None) -> str | None:
    """Turn on JAX's persistent compilation cache; returns the dir (or
    None when disabled).  Safe to call more than once.
    """
    env = os.environ.get("PROBAV_COMPILE_CACHE", "")
    if env.lower() in ("off", "none", "0"):
        return None
    path = path or env or _DEFAULT
    try:
        os.makedirs(path, exist_ok=True)
        import jax

        jax.config.update("jax_compilation_cache_dir", path)
        # Persist EVERY compile, even sub-second ones: on the tunneled
        # backend each tiny eager-op compile costs ~0.4 s of RPC round
        # trips, and a cold start issues dozens of them — with the default
        # 1 s threshold they were re-compiled every process (measured:
        # 66 s of a 107 s warm start, tools/coldstart_probe.py).
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception as e:   # cache is an optimization, never a failure
        logger.warning("persistent compile cache unavailable: %s", e)
        return None
    return path
