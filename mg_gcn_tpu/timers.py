"""Per-phase timing registry with CSV export.

Replaces the reference's CUDA-event timer registry + dump_timers CSV
(``matrix.hpp:107-157``, dump format ``prefix+name:ms`` consumed at
main.cpp:111/131/168). On TPU, fine-grained device phase timing comes from
``jax.profiler`` traces (see :func:`trace`); this registry covers the
host-visible wall-clock phases and writes the same ``name:ms`` CSV lines so
downstream tooling stays compatible.
"""

from __future__ import annotations

import contextlib
import time
from collections import OrderedDict
from typing import Iterator, TextIO


class TimerRegistry:
    def __init__(self) -> None:
        self._entries: "OrderedDict[str, float]" = OrderedDict()

    def record(self, name: str, milliseconds: float) -> None:
        self._entries[name] = self._entries.get(name, 0.0) + milliseconds

    @contextlib.contextmanager
    def span(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.record(name, (time.perf_counter() - t0) * 1e3)

    def measure(self, name: str) -> float:
        return self._entries[name]

    def dump(self, out: TextIO, prefix: str = "") -> None:
        """matrix.hpp:150-157 format: one ``<prefix><name>:<ms>`` per line."""
        for name, ms in self._entries.items():
            out.write(f"{prefix}{name}:{ms}\n")

    def clear(self) -> None:
        self._entries.clear()


@contextlib.contextmanager
def trace(log_dir: str | None) -> Iterator[None]:
    """Optional jax.profiler trace around a region (TPU timeline capture)."""
    if not log_dir:
        yield
        return
    import jax

    with jax.profiler.trace(log_dir):
        yield
