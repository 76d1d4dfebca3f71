"""JAX runtime setup: persistent compilation cache.

First compilation of the encode program costs tens of seconds (more over
remote-compile links); the persistent cache makes every later process start
warm. Safe to call multiple times; respects an existing user configuration.
"""

from __future__ import annotations

import os
from typing import Optional

DEFAULT_CACHE_DIR = os.path.expanduser("~/.cache/cbas_tpu/jax_cache")


def enable_compilation_cache(cache_dir: Optional[str] = None) -> Optional[str]:
    """Point JAX's persistent compilation cache at a writable directory."""
    import jax

    cache_dir = cache_dir or os.environ.get("CBAS_TPU_JAX_CACHE", DEFAULT_CACHE_DIR)
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # Cache every compilation, including fast ones (defaults skip tiny ones).
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        return cache_dir
    except Exception as e:  # cache is an optimization, never a requirement
        print(f"Could not enable JAX compilation cache: {e}")
        return None
