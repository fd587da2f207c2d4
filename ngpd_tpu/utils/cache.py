"""Persistent XLA compilation-cache setup shared by the CLI, bench, and
tests.

Flagship runs are compile-bound (minutes of XLA work per new mesh
shape, re-paid on every invocation without a persistent cache). The
cache directory defaults to a per-user location — NOT a fixed
world-shared /tmp path, which another local user could pre-create and
poison (advisor, round 3)."""

from __future__ import annotations

import os
from pathlib import Path


def default_cache_dir() -> str:
    base = os.environ.get("XDG_CACHE_HOME") or str(
        Path.home() / ".cache"
    )
    return str(Path(base) / "ngpd_jax_cache")


def enable_compilation_cache(path: str | None = None) -> str:
    """Point JAX's persistent compilation cache at ``path`` (default:
    per-user ``~/.cache/ngpd_jax_cache``). Must run before the first
    backend use — JAX reads these env vars at client initialization.
    Explicit ``JAX_COMPILATION_CACHE_DIR`` in the environment wins."""
    os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR", path or default_cache_dir()
    )
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
    return os.environ["JAX_COMPILATION_CACHE_DIR"]
