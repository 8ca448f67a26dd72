"""Tracing and phase timing.

Capability parity with the reference's profiling hooks (SURVEY.md §5):
  * `--profile` per-iteration autograd profiler + Chrome trace export
    (`train.py:129-151`) -> `trace(logdir)` context manager around
    `jax.profiler` (view in TensorBoard / Perfetto)
  * `speed_benchmark` per-phase wall timers with explicit
    `cuda.synchronize` (`trainers/base.py:876-940`) -> `PhaseTimer`
    with `block_until_ready` barriers
"""
import contextlib
import time

import jax
import jax.numpy as jnp


def host_sync(tree):
    """Force REAL device completion by fetching one scalar that depends
    on every leaf. `jax.block_until_ready` can return early over the
    axon tunnel (~0.1 ms for seconds of work — CLAUDE.md); a value
    fetch cannot."""
    acc = None
    for leaf in jax.tree_util.tree_leaves(tree):
        if hasattr(leaf, 'dtype'):
            s = jnp.sum(leaf.astype(jnp.float32))
            acc = s if acc is None else acc + s
    if acc is not None:
        float(acc)


@contextlib.contextmanager
def trace(logdir):
    """Profile a code region to a TensorBoard/Perfetto trace."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name):
    """Named sub-span inside an active trace."""
    with jax.profiler.TraceAnnotation(name):
        yield


class PhaseTimer:
    """Accumulates wall time per named phase across iterations
    (`trainers/base.py:876-940` speed_benchmark)."""

    def __init__(self):
        self.totals = {}
        self.counts = {}

    @contextlib.contextmanager
    def phase(self, name, sync=None):
        """Times a phase; pass the phase's output (or any array pytree)
        via `sync` inside the block by calling `.stop(sync=...)`, or
        rely on the implicit barrier on exit."""
        t0 = time.perf_counter()
        box = {}
        try:
            yield box
        finally:
            out = box.get('out', sync)
            if out is not None:
                host_sync(out)
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def reset(self):
        """Start a fresh window (drop accumulated totals — e.g. after a
        report, so the next window excludes this one's compile time)."""
        self.totals = {}
        self.counts = {}

    def means(self):
        return {k: self.totals[k] / max(self.counts[k], 1)
                for k in self.totals}

    def report(self):
        lines = [f'{k}: {v * 1000:.2f} ms/iter'
                 for k, v in sorted(self.means().items())]
        return '\n'.join(lines)
