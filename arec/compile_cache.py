"""Persistent XLA compilation cache — one call from every entry point.

The remote-TPU tunnel's compile latency is the dominant cold-start cost
and swings wildly with service load (measured this repo: the SAME
flagship bench program compiled in 9.5 min at one hour and timed out past
20 min two hours later). JAX's on-disk compilation cache works through
the axon PJRT plugin (verified: a 4.3 s remote compile replays in 0.0 s
from a fresh process), so every entry point enables it: the first
successful compile of a program makes every later run of the same
program — same shapes, flags, jax version — immune to tunnel compile
weather. CPU test runs benefit too (the suite is compile-heavy).

Cache location: $AREC_COMPILE_CACHE, else ~/.cache/arec_jax — outside the
repo so benchmark/driver runs never sweep binary artifacts into git.
Set AREC_COMPILE_CACHE=off to disable.
"""

from __future__ import annotations

import os


def enable_compile_cache() -> str | None:
    """Idempotent; call before (or after) first jax use."""
    loc = os.environ.get("AREC_COMPILE_CACHE")
    if loc == "off":
        return None
    if not loc:
        loc = os.path.join(os.path.expanduser("~"), ".cache", "arec_jax")
    os.makedirs(loc, exist_ok=True)
    import jax
    jax.config.update("jax_compilation_cache_dir", loc)
    # default threshold (1 s) skips tiny programs; keep it — the wins are
    # the multi-minute train-step compiles
    return loc
