"""Persistent XLA compilation cache for the CLI drivers.

First-touch compiles through the remote TPU tunnel are expensive (tens of
seconds to minutes per executable); the persistent cache brings a fresh
process's cold start down ~8x (measured 343 s -> 43 s for one executable).
Generation especially profits: the first 60 s mixture costs minutes of
compiles, every subsequent one ~4 s — the cache moves later *runs* straight
to steady state.

Enabled by default from every scripts/ driver. Opt out by setting
SONICSIM_XLA_CACHE=0; point elsewhere with SONICSIM_XLA_CACHE=/path.
"""

from __future__ import annotations

import os
from pathlib import Path

_DEFAULT = Path.home() / ".cache" / "sonicsim_tpu" / "xla"


def enable_compilation_cache(cache_dir: str | Path | None = None) -> Path | None:
    """Point JAX's persistent compilation cache at ``cache_dir``.

    Resolution order: explicit arg > SONICSIM_XLA_CACHE env var (``0`` or
    empty disables) > ~/.cache/sonicsim_tpu/xla. Safe to call more than
    once; returns the directory in use (None if disabled).
    """
    import jax

    if cache_dir is None:
        env = os.environ.get("SONICSIM_XLA_CACHE")
        if env is not None:
            if env in ("", "0", "off"):
                return None
            cache_dir = env
        else:
            cache_dir = _DEFAULT
    cache_dir = Path(cache_dir)
    cache_dir.mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache_dir))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    return cache_dir
