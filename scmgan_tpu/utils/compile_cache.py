"""One shared persistent-compile-cache setup.

Every entry point (CLI, bench scripts, sweeps) wants the same thing: a
persistent XLA compile cache so repeat runs skip the ~5-min remote
compiles, overridable via ``SCMGAN_COMPILE_CACHE``.  Keeping the snippet
in one place stops the cache-dir/threshold drift that a dozen copies had.

Cache dirs are suffixed with a MACHINE FINGERPRINT (round-4 root-cause
find): JAX's cache key does not include the host CPU's feature/tuning
set, so XLA:CPU AOT entries written on one machine get loaded on another
— the loader logs "Machine type used for XLA:CPU compilation doesn't
match the machine type for execution ... could lead to execution errors
such as SIGILL".  This repo's working directory persists across rounds
while the attached VM changes, which is exactly that hazard (and the
prime suspect behind the rounds-2/3 full-suite crashes in the cache
path).  A per-fingerprint subdir means a machine only ever loads AOT
code it compiled itself.
"""

from __future__ import annotations

import hashlib
import os
import platform


def machine_fingerprint() -> str:
    """Short stable id of (arch, CPU model + stepping + feature flags,
    jax version).

    The CPU MODEL lines matter, not just the flags: XLA:CPU bakes
    model-derived LLVM tuning preferences (e.g. ``+prefer-no-gather`` on
    Downfall-mitigated Intel parts) into AOT executables, so two
    machines with identical /proc/cpuinfo flags can still produce
    mutually incompatible cache entries (observed round 5: a
    flags-keyed fingerprint collided across VMs and the loader warned
    "Machine type used for XLA:CPU compilation doesn't match ... could
    lead to execution errors such as SIGILL")."""
    import jax

    ident = []
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features", "model name",
                                    "model\t", "stepping", "vendor_id",
                                    "cpu family", "microcode")):
                    ident.append(line.strip())
                if len(ident) >= 7:
                    break
    except OSError:
        pass
    blob = f"{platform.machine()}|{'|'.join(ident)}|{jax.__version__}"
    return hashlib.sha256(blob.encode()).hexdigest()[:12]


def setup_compile_cache(default_dir: str = "/tmp/jax_tpu_cache",
                        min_compile_secs: float = 0.5) -> None:
    """Point JAX's persistent compilation cache at ``SCMGAN_COMPILE_CACHE``
    (fallback ``default_dir``), keyed by machine fingerprint.  Call before
    the first compile; safe to call on any backend (errors are swallowed —
    a read-only filesystem or pinned config must not kill a benchmark)."""
    import jax

    try:
        base = os.environ.get("SCMGAN_COMPILE_CACHE", default_dir)
        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.join(base, machine_fingerprint()))
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", min_compile_secs)
    except Exception:
        pass
