"""Persistent XLA compilation cache (VERDICT r4 ask #4: the compile tax).

The windowed-gather SOLVE programs cost 26-79 s of compile on a cold start
(TPU_MATVEC_r04) — it is the solve-program composition (inner-CG while +
banded scans + several kernel instances), not the kernel body (a single
instance compiles in ~3 s, experiments/roll_ab.py). The remote compile
server caches HLO-identical programs across processes, but the client
still pays the compile RPC round trip and the server cache is outside our
control. JAX's persistent compilation cache
(``jax_compilation_cache_dir``) serializes compiled executables to local
disk keyed on the HLO hash, so a SECOND process running the same solve
skips compilation entirely — the reference compiles once at build time and
never again (CMake, SURVEY.md L7); this is the closest TPU equivalent.

Requires the same jit-discipline the program caches already enforce
(CLAUDE.md): operands as arguments, never closure constants — an embedded
constant changes the HLO hash and defeats this cache exactly like it
defeats the server-side one.

Enabled by default in the CLI (``ev.compile_cache=0`` opts out) and in the
long-compile experiments. Safe to call before or after backend init; a
backend that cannot serialize executables simply leaves the cache empty
(JAX logs a warning, runs proceed uncached).
"""

from __future__ import annotations

import os
from typing import Optional

_DEFAULT_DIR = os.environ.get(
    "DUNE_TPU_COMPILE_CACHE",
    os.path.expanduser("~/.cache/dune_eigensolver_tpu/xla"),
)

_enabled_dir: Optional[str] = None


def enable_compile_cache(
    path: Optional[str] = None, min_compile_secs: float = 1.0
) -> Optional[str]:
    """Point JAX's persistent compilation cache at ``path`` (default:
    ``~/.cache/dune_eigensolver_tpu/xla`` or ``$DUNE_TPU_COMPILE_CACHE``).
    Idempotent; returns the cache dir or None if configuration failed."""
    global _enabled_dir
    if _enabled_dir is not None and path in (None, _enabled_dir):
        return _enabled_dir
    import jax

    d = path or _DEFAULT_DIR
    try:
        os.makedirs(d, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", d)
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs",
            float(min_compile_secs),
        )
        # cache every sufficiently-slow compile regardless of entry size
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception as e:  # config name drift across jax versions
        import sys

        print(f"compile cache unavailable: {e!r}", file=sys.stderr)
        return None
    _enabled_dir = d
    return d
