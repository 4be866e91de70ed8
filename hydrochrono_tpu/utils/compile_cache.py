"""Persistent XLA compilation cache wiring (round-3, VERDICT r2 item 1).

The driver benchmarks in a FRESH process, so without an on-disk cache every
run pays the full (remote) compile cost — 184.8 s at B=512 in BENCH_r02
against 0.08 s of simulation. JAX's persistent compilation cache serializes
compiled executables keyed by an HLO + backend-config hash; enabling it in
every entry point (cli.py, bench.py, __graft_entry__.py) means any program
compiled once in this workspace loads from disk afterwards.

The reference has no compile step at all (C++ ahead-of-time build), so this
is pure gap-closing between "fast once compiled" and "usable end to end".

Call `enable_persistent_cache()` BEFORE the first jit compilation; it is a
no-op on failure (the cache is an optimization, never a correctness
dependency) and idempotent.
"""

from __future__ import annotations

import os

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

#: default on-disk location; override with HYDROCHRONO_TPU_CACHE_DIR.
DEFAULT_DIR = os.environ.get(
    "HYDROCHRONO_TPU_CACHE_DIR", os.path.join(_REPO_ROOT, ".jax_cache"))

_enabled: str | None = None


def enable_persistent_cache(path: str | None = None) -> str | None:
    """Point jax's persistent compilation cache at `path` (default:
    <repo>/.jax_cache). Returns the directory in use, or None when the
    cache could not be enabled."""
    global _enabled
    if _enabled is not None and path in (None, _enabled):
        return _enabled
    import jax

    path = path or DEFAULT_DIR
    try:
        if jax.default_backend() != "tpu":
            # CPU compiles are cheap, and XLA:CPU AOT artifacts are keyed
            # to exact host CPU features — reloading one on a different
            # host risks SIGILL (observed 'prefer-no-scatter' feature
            # mismatch warnings). Cache only the expensive TPU programs.
            return None
        # Key the cache directory on the backend's platform/libtpu build:
        # an AOT executable serialized under one libtpu is a *fatal*
        # runtime error when reloaded under another (observed as the
        # MULTICHIP_r03 "libtpu version mismatch" crash). A version bump
        # must mean a cold cache, never a poisoned one.
        try:
            import hashlib

            import jax.extend.backend as jeb

            ver = jeb.get_backend().platform_version
            path = os.path.join(
                path, hashlib.sha256(ver.encode()).hexdigest()[:12])
        except Exception:
            pass
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # cache everything that took >=1 s to compile, regardless of size —
        # the step-program executables are small but expensive to build
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        return None
    _enabled = path
    return path
