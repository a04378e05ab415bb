"""Wall-clock timing utilities.

``Timer`` mirrors the reference's accumulator semantics
(/root/reference/src/utils/utility.h:11-48: start/stop/pause/elapsed_ms);
``bench_fn`` adds device-aware timing: it block_until_ready()s results so
async dispatch doesn't fake speedups, and separates compile (first call)
from steady-state.
"""
from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Any, Callable, Dict

import jax

__all__ = ["Timer", "bench_fn", "BenchResult"]


class Timer:
    def __init__(self):
        self._start = None
        self._accum = 0.0

    def start(self):
        self._accum = 0.0
        self._start = time.perf_counter()
        return self

    def pause(self):
        if self._start is not None:
            self._accum += time.perf_counter() - self._start
            self._start = None
        return self

    def resume(self):
        self._start = time.perf_counter()
        return self

    def stop(self) -> float:
        self.pause()
        return self._accum * 1e3

    @property
    def elapsed_ms(self) -> float:
        extra = time.perf_counter() - self._start if self._start is not None else 0.0
        return (self._accum + extra) * 1e3


@dataclass
class BenchResult:
    mean_ms: float
    min_ms: float
    compile_ms: float
    iters: int
    extras: Dict[str, Any] = field(default_factory=dict)


def _block(x):
    for leaf in jax.tree_util.tree_leaves(x):
        if hasattr(leaf, "block_until_ready"):
            leaf.block_until_ready()
    return x


def bench_fn(fn: Callable, *args, iters: int = 20, warmup: int = 3) -> BenchResult:
    t0 = time.perf_counter()
    _block(fn(*args))
    compile_ms = (time.perf_counter() - t0) * 1e3
    for _ in range(warmup):
        _block(fn(*args))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        _block(fn(*args))
        times.append((time.perf_counter() - t0) * 1e3)
    return BenchResult(
        mean_ms=sum(times) / len(times),
        min_ms=min(times),
        compile_ms=compile_ms,
        iters=iters,
    )
