"""Persistent XLA compilation cache.

Every (core bucket, length bucket) pair costs one kernel compile — tens
of seconds per compile on a remote-compile TPU relay — so the CLI and the
daemon enable jax's persistent compilation cache by default: a repeat
scan of similar shapes skips compilation entirely (measured 197 s -> 3.6 s
for a cold vs cached kernel on the v5e tunnel).

Override the location with DCP_XLA_CACHE_DIR; set it empty to disable.
"""

from __future__ import annotations

import os


def enable() -> str | None:
    """Turn on the persistent compilation cache. Returns the dir or None."""
    cache_dir = os.environ.get(
        "DCP_XLA_CACHE_DIR",
        os.path.join(
            os.environ.get(
                "XDG_CACHE_HOME",
                os.path.join(os.path.expanduser("~"), ".cache"),
            ),
            "deciphon-tpu",
            "xla",
        ),
    )
    if not cache_dir:
        return None
    import jax

    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # cache EVERYTHING: on a remote-compile relay even sub-second eager
    # ops (the scan epilogue's transpose/reshape/slice shapes) cost
    # multi-second first-call round trips per process, and the default
    # 1.0 s floor silently excluded them from the cache
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    # Pallas/Mosaic kernels embed FULL caller tracebacks in their MLIR
    # locations, and those live inside the custom-call backend_config —
    # which the cache-key canonicalizer does NOT strip (it only strips
    # HLO metadata).  With full tracebacks on, the same kernel invoked
    # from two different scripts (daemon vs CLI vs bench) hashes to two
    # different keys and every process recompiles from scratch
    # (measured: 23.6 s vs 1.9 s for one kpad-64 variant).  Truncating
    # locations to the jit-local frame makes keys caller-independent.
    jax.config.update("jax_include_full_tracebacks_in_locations", False)
    return cache_dir
