"""Profiling helpers for the jitted MC drivers.

The reference prints per-block move/accumulate wall times
(pyqmc/method/mc.py:150-152). Here a block is ONE fused XLA computation, so
the split cannot be read off the host clock mid-block; instead:

  * `trace(logdir)` wraps block execution in `jax.profiler.trace` — the
    resulting XProf/TensorBoard trace shows the on-device per-op timeline
    (HLO names carry the wavefunction/accumulator structure).
  * `measure_phase_split` compiles a move-only variant of the block and
    times both, attributing the difference to accumulation. One-time cost;
    the returned split is attached to every block record.

On the axon TPU tunnel `block_until_ready` does not guarantee device-side
completion — both helpers force a host transfer before reading clocks.
"""

from __future__ import annotations

import contextlib
import time

import numpy as np
import jax


def sync(tree):
    """Force device-side completion (host transfer of one leaf)."""
    leaves = jax.tree.leaves(tree)
    if leaves:
        np.asarray(jax.device_get(leaves[0])).ravel()[:1]
    return tree


@contextlib.contextmanager
def trace(logdir: str):
    """jax.profiler trace scope with a completion barrier on exit."""
    with jax.profiler.trace(logdir):
        yield
        # ensure queued computations land inside the trace window
        jax.effects_barrier()


def median_time(fn, *args, nrep: int = 3):
    """Median wall time of fn(*args), synced; compiles on the first call."""
    sync(fn(*args))
    ts = []
    for _ in range(nrep):
        t0 = time.perf_counter()
        sync(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def measure_phase_split(block_fn, move_only_fn, args, nrep: int = 3):
    """Returns {"move time", "accumulate time", "block time"} estimates.

    move_only_fn must be the same block kernel built without accumulators.
    The accumulate share is the (non-negative) difference.
    """
    t_full = median_time(block_fn, *args, nrep=nrep)
    t_move = median_time(move_only_fn, *args, nrep=nrep)
    return {
        "block time": t_full,
        "move time": min(t_move, t_full),
        "accumulate time": max(t_full - t_move, 0.0),
    }
