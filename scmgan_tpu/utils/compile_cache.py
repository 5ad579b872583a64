"""One shared persistent-compile-cache setup.

Every entry point (CLI, bench scripts, sweeps) wants the same thing: a
persistent XLA compile cache so repeat runs skip the ~5-min remote
compiles, overridable via ``SCMGAN_COMPILE_CACHE``.  Keeping the snippet
in one place stops the cache-dir/threshold drift that a dozen copies had.
"""

from __future__ import annotations

import os


def setup_compile_cache(default_dir: str = "/tmp/jax_tpu_cache",
                        min_compile_secs: float = 0.5) -> None:
    """Point JAX's persistent compilation cache at ``SCMGAN_COMPILE_CACHE``
    (fallback ``default_dir``).  Call before the first compile; safe to
    call on any backend (errors are swallowed — a read-only filesystem or
    pinned config must not kill a benchmark)."""
    import jax

    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ.get("SCMGAN_COMPILE_CACHE", default_dir))
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", min_compile_secs)
    except Exception:
        pass
