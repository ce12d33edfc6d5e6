"""Persistent XLA compilation cache.

The reference's analogue is torch.compile's in-process cache (INFERENCE.md
recommends `torch.compile`, paying recompilation per process). On TPU the jit
compile of the fused generate loop is ~2 minutes cold; a persistent on-disk
cache turns that into a one-time cost per machine — subsequent processes
deserialize the compiled executable in seconds.

Opt-out with PARLER_TTS_TPU_NO_CACHE=1; override the location with
PARLER_TTS_TPU_CACHE_DIR.
"""

from __future__ import annotations

import os

_ENABLED = False


def enable_compilation_cache(cache_dir: str | None = None) -> str | None:
    """Idempotently enable JAX's persistent compilation cache.

    Returns the cache dir in use, or None when disabled/unavailable.
    """
    global _ENABLED
    if os.environ.get("PARLER_TTS_TPU_NO_CACHE"):
        return None
    if _ENABLED:
        import jax

        return jax.config.jax_compilation_cache_dir
    cache_dir = (
        cache_dir
        or os.environ.get("PARLER_TTS_TPU_CACHE_DIR")
        or os.path.join(
            os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
            "parler_tts_tpu",
            "xla_cache",
        )
    )
    try:
        import jax

        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # cache everything that took non-trivial time to build; the generate
        # loop is minutes, the codec decode tens of seconds
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        _ENABLED = True
        return cache_dir
    except Exception:  # pragma: no cover - config names vary across jax versions
        return None


def cache_entries(cache_dir: str | None) -> set[str]:
    """Current set of compiled-executable entries in the on-disk cache."""
    if not cache_dir or not os.path.isdir(cache_dir):
        return set()
    return {f for f in os.listdir(cache_dir) if not f.startswith(".")}


def report_cache_misses(cache_dir: str | None, before: set[str]) -> list[str]:
    """Entries written since `before` — i.e. programs that MISSED the shipped
    cache this process and paid a real XLA compile. A bench run on an
    unchanged tree should report zero; a non-empty list means the shipped
    cache is stale for the current programs and needs a refresh commit."""
    return sorted(cache_entries(cache_dir) - before)
