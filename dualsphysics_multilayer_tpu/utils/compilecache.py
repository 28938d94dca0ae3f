"""Persistent XLA compilation cache.

The TPU backend's compile time for this framework's divide/step graphs
scales superlinearly with array size (measured on the 3D dam break divide:
2M particles ~2 min, 4M ~12 min, compiled program unchanged at ~2k HLO
lines — the cost is in backend passes, not HLO growth; the same graph
compiles on the CPU backend in 6 s).  At 10M particles a cold compile is
~an hour, so every entry point enables JAX's persistent compilation cache:
the first run pays the compile, every later process reuses the serialized
executable (measured 750 s -> 20 s on the 4M divide).

Opt out with DSPH_COMPCACHE=0; override the directory with
DSPH_COMPCACHE_DIR.
"""

import os


def enable_cache() -> None:
    """Enable the persistent compilation cache (call before first jit)."""
    if os.environ.get("DSPH_COMPCACHE", "1") != "1":
        return
    cachedir = os.environ.get(
        "DSPH_COMPCACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "dsph-jaxcomp"))
    try:
        os.makedirs(cachedir, exist_ok=True)
        import jax
        jax.config.update("jax_compilation_cache_dir", cachedir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass  # cache is an optimization; never fail a run over it
