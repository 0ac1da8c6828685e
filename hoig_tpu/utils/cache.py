"""Persistent XLA compile-cache location, keyed by host CPU.

The cache stores XLA:CPU AOT executables specialized to the compile
machine's ISA. /tmp can outlive a machine migration in this environment,
and executing another machine's AOT code aborts the process mid-run
(observed: the flagship mesh test died with `Fatal Python error: Aborted`
until the stale entries were purged). Keying the directory by a hash of
the host's CPU feature flags makes a migrated /tmp start a fresh cache
instead of poisoning every CPU test run. TPU entries are keyed by
topology inside the cache and are not feature-sensitive, so the split
only costs an occasional cold TPU compile.
"""

from __future__ import annotations

import hashlib


def cache_dir() -> str:
    try:
        with open("/proc/cpuinfo") as fp:
            for line in fp:
                if line.startswith("flags"):
                    key = hashlib.md5(line.encode()).hexdigest()[:10]
                    break
            else:
                key = "nocpuflags"
    except OSError:
        key = "nocpuinfo"
    return f"/tmp/hoig_xla_cache_{key}"


def enable(jax_module) -> str:
    """Point jax's persistent compile cache at the host-keyed dir."""
    d = cache_dir()
    jax_module.config.update("jax_compilation_cache_dir", d)
    jax_module.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    return d
