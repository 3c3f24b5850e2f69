"""Profiling / tracing helpers.

The reference has no profiling in the main path (SURVEY §5 — vestigial
perf_counter hooks behind a hardcoded flag).  Here:

* ``trace(logdir)``  — context manager around jax.profiler for
  TensorBoard-viewable device traces.
* ``Timer``          — wall-clock stage timing that *forces execution*
  before reading the clock.  On remote-tunnelled TPUs,
  ``block_until_ready`` can return before the device finishes; the only
  reliable barrier is fetching bytes, so ``sync`` reduces to a scalar
  and pulls it to the host.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict

import jax
import jax.numpy as jnp


def sync(tree) -> float:
    """Force execution of every array in the pytree; returns a checksum."""
    leaves = [l for l in jax.tree_util.tree_leaves(tree)
              if hasattr(l, "dtype")]
    if not leaves:
        return 0.0
    total = sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)
    return float(total)


@contextlib.contextmanager
def trace(logdir: str):
    """Device trace for TensorBoard (jax.profiler)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Timer:
    """Accumulating stage timer with forced device sync.

        t = Timer()
        with t("encode"):
            z = vae.encode(x).mode()
            t.sync(z)
        print(t.report())
    """

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def __call__(self, name: str):
        t0 = time.perf_counter()
        yield
        dt = time.perf_counter() - t0
        self.totals[name] = self.totals.get(name, 0.0) + dt
        self.counts[name] = self.counts.get(name, 0) + 1

    @staticmethod
    def sync(tree):
        sync(tree)

    def report(self) -> str:
        lines = []
        for name, total in sorted(self.totals.items(), key=lambda kv: -kv[1]):
            n = self.counts[name]
            lines.append(f"{name:<24s} {total:8.3f}s  x{n}"
                         f"  ({1000 * total / n:.1f} ms/call)")
        return "\n".join(lines)


def enable_compilation_cache(path: str = "~/.cache/cvvae_tpu_xla") -> None:
    """Persistent XLA compilation cache — the tiled 720p programs take
    minutes to compile; cached reruns are near-instant (verified to work
    through the axon remote-compile tunnel)."""
    import os
    d = os.path.expanduser(path)
    os.makedirs(d, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", d)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
