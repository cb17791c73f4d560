"""Tracing, profiling and throughput measurement.

The reference has no profiler hooks at all — progress is ``print`` every N
epochs (SURVEY.md section 5.1, utils/final_vaesimca.py:397-398).  The
TPU-native equivalents:

- ``trace(logdir)`` — context manager around ``jax.profiler`` producing a
  TensorBoard/Perfetto trace of everything dispatched inside;
- ``annotate(name)`` — named TraceAnnotation so fit/score phases are
  attributable inside a trace;
- ``timeit`` — wall-clock timing with ``jax.block_until_ready`` and a
  compile-excluding warmup: the measurement discipline behind every number
  in BENCH_r*.json;
- ``throughput`` — items/sec from ``timeit`` (the BASELINE.json
  spectra-per-second metric);
- ``debug_nans`` re-export — the sanitizer-mode equivalent
  (SURVEY.md section 5.2).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Optional

import jax

from ocm_tpu.config import debug_nans as debug_nans  # noqa: PLC0414


@contextlib.contextmanager
def trace(logdir: str, create_perfetto_link: bool = False):
    """Capture a device trace of the enclosed block (view in TensorBoard)."""
    jax.profiler.start_trace(logdir,
                             create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named annotation appearing on the trace timeline."""
    return jax.profiler.TraceAnnotation(name)


def timeit(fn: Callable, *args, warmup: int = 2, repeats: int = 5,
           **kwargs) -> dict:
    """Wall-clock stats of ``fn(*args)`` with compile excluded.

    Blocks on all output leaves, so async dispatch cannot fake speed.
    Returns {'best', 'mean', 'times'} in seconds.

    The warmup FETCHES the output values (device->host), not just
    block_until_ready: on the hosted-TPU (axon) platform, execution —
    including compilation — is lazy until a value is materialized, and
    ``block_until_ready`` on a never-materialized array returns
    immediately.  After the first fetch forces the compile, per-call
    ``block_until_ready`` waits correctly (measured: ~31 ms steady-state
    tunnel round trip, scale workloads accordingly).
    """
    import numpy as _np

    for _ in range(max(warmup, 1)):
        out = fn(*args, **kwargs)
    jax.tree.map(_np.asarray, out)   # force compile + execution + fetch
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args, **kwargs))
        times.append(time.perf_counter() - t0)
    return {"best": min(times), "mean": sum(times) / len(times),
            "times": times}


def throughput(fn: Callable, n_items: int, *args, warmup: int = 2,
               repeats: int = 5, **kwargs) -> float:
    """items/sec at best-of-N wall clock (the BASELINE.json metric shape)."""
    stats = timeit(fn, *args, warmup=warmup, repeats=repeats, **kwargs)
    return n_items / stats["best"]


class EpochLogger:
    """Structured replacement for the reference's print-every-N-epochs
    (utils/final_vaesimca.py:397-398): records (epoch, train, val) rows and
    optionally prints at a cadence."""

    def __init__(self, print_every: Optional[int] = None):
        self.print_every = print_every
        self.rows: list[dict] = []

    def log(self, epoch: int, train_loss: float, val_loss: float,
            **extra) -> None:
        row = {"epoch": epoch, "train_loss": float(train_loss),
               "val_loss": float(val_loss), **extra}
        self.rows.append(row)
        if self.print_every and ((epoch + 1) % self.print_every == 0
                                 or epoch == 0):
            print(f"Epoch {epoch + 1} | Train: {train_loss:.6f} | "
                  f"Val: {val_loss:.6f}")

    def history(self) -> dict:
        return {
            "train_losses": [r["train_loss"] for r in self.rows],
            "val_losses": [r["val_loss"] for r in self.rows],
        }
