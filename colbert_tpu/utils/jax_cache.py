"""Persistent XLA compilation cache.

The reference has no compile step at all (Julia JIT warms per-session); on
TPU, XLA compiles of the 12-layer scan program are expensive (observed in the
minutes range per shape on a tunneled chip), so every entry point enables a
persistent on-disk compilation cache. Subsequent processes reuse compiled
executables keyed by (program, shapes, flags), cutting warmup from O(minutes)
to O(seconds).

Set ``COLBERT_TPU_XLA_CACHE`` to override the location, or to ``0``/``off``
to disable.
"""

from __future__ import annotations

import os

_DEFAULT = os.path.join(
    os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
    "colbert_tpu", "xla",
)

_enabled = False


def enable_persistent_cache(path: str | None = None) -> None:
    """Idempotently point jax at an on-disk compilation cache directory."""
    global _enabled
    if _enabled:
        return
    loc = path or os.environ.get("COLBERT_TPU_XLA_CACHE", _DEFAULT)
    if loc.lower() in ("0", "off", "none", ""):
        _enabled = True
        return
    # the cache is an optimization; never let it break `import colbert_tpu`
    # (read-only HOME / locked-down hosts)
    try:
        import jax

        os.makedirs(loc, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", loc)
        # cache even fast compiles: one chip-seconds build has many shapes
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        try:
            jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        except AttributeError:  # older jax
            pass
    except Exception:
        pass
    _enabled = True
