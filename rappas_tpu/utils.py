"""Logging / timing utilities.

Replaces the reference's verbosity-gated ``Infos.println``
(``/root/reference/src/etc/Infos.java``): verbosity -1 silences
everything, 0 prints progress, 1 prints debug detail.
"""

from __future__ import annotations

import sys
import time

VERBOSITY = 0
_CACHE_ENABLED = False


def enable_compile_cache(path: str = "/tmp/rappas_tpu_jax_cache") -> None:
    """Turn on JAX's persistent compilation cache so repeated CLI
    invocations skip the 20-40s first-compile cost."""
    global _CACHE_ENABLED
    if _CACHE_ENABLED:
        return
    try:
        import jax
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        _CACHE_ENABLED = True
    except Exception:
        pass


def set_verbosity(v: int) -> None:
    global VERBOSITY
    VERBOSITY = v


def log(msg: str, level: int = 0) -> None:
    if VERBOSITY >= level:
        print(msg, file=sys.stderr if level > 0 else sys.stdout)


class Timer:
    def __init__(self, label: str = ""):
        self.label = label

    def __enter__(self):
        self.t0 = time.time()
        return self

    def __exit__(self, *exc):
        self.elapsed = time.time() - self.t0
        if self.label:
            log(f"{self.label}: {self.elapsed * 1000:.1f} ms", level=1)
