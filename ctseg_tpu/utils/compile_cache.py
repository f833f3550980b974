"""Persistent XLA compilation cache for CLI entry points.

The reference pays no compile cost (eager torch); this framework's jitted
programs cost 30-90s each to compile on a remote TPU. Enabling JAX's
persistent compilation cache makes every CLI after the first invocation skip
those compiles entirely (measured: ~0.5s -> 0.03s for a probe program; the
Model-L train step drops from minutes to milliseconds of compile on a warm
cache), which is most of the "cold path" cost in `evaluate`/`predict`.

Controlled by `CTSEG_COMPILATION_CACHE`:
  unset      -> `<data storage>/xla_cache` (see ctseg_tpu.paths)
  a path     -> that directory
  "off"/"0"  -> disabled
"""

import os
from pathlib import Path

_ENV = "CTSEG_COMPILATION_CACHE"
_enabled_dir = None


def enable_compilation_cache() -> "Path | None":
    """Idempotently turn on JAX's persistent compilation cache.

    Returns the cache directory, or None when disabled. Call this at the top
    of CLI `main()`s (library imports stay side-effect free: tests and
    embedding applications keep full control of jax.config).
    """
    global _enabled_dir
    env = os.environ.get(_ENV, "")
    if env.lower() in ("off", "0", "false", "none"):
        return None
    if _enabled_dir is not None:
        return _enabled_dir

    from ctseg_tpu.paths import DEFAULT_DATA_STORAGE

    cache_dir = Path(env) if env else Path(DEFAULT_DATA_STORAGE) / "xla_cache"
    cache_dir.mkdir(parents=True, exist_ok=True)

    import jax

    jax.config.update("jax_compilation_cache_dir", str(cache_dir))
    # Cache everything: entry-size and compile-time floors would skip the
    # many small jitted helpers (metric reductions, transforms) whose
    # aggregate compile time still dominates short CLI runs.
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    _enabled_dir = cache_dir
    return cache_dir
