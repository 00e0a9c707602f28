"""Named phase timers (profile/ptiming analog).

Reference: ~120 enum'd phase timers written per-rank into each snapshot
(/root/reference/src/ptiming.h:10-36, profile.c:468).  Here: a process-
global registry of named accumulating timers + counters, dumped as a
`profile` table into snapshot dirs.  Device work is asynchronous under
XLA, so timers bracket DISPATCH spans; per-kernel truth comes from
jax.profiler traces (start_trace/stop_trace below).
"""

from __future__ import annotations

import os
import time
from contextlib import contextmanager
from dataclasses import dataclass, field


@dataclass
class Timer:
    name: str
    total: float = 0.0
    calls: int = 0
    _t0: float = 0.0

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self):
        self.total += time.perf_counter() - self._t0
        self.calls += 1


class Profile:
    def __init__(self):
        self.timers: dict[str, Timer] = {}
        self.counters: dict[str, float] = {}
        self.t_init = time.perf_counter()

    def timer(self, name: str) -> Timer:
        if name not in self.timers:
            self.timers[name] = Timer(name)
        return self.timers[name]

    @contextmanager
    def phase(self, name: str):
        t = self.timer(name)
        t.start()
        try:
            yield
        finally:
            t.stop()

    def count(self, name: str, value: float = 1.0):
        self.counters[name] = self.counters.get(name, 0.0) + value

    def table(self) -> str:
        total = time.perf_counter() - self.t_init
        lines = [f"{'phase':<28} {'calls':>10} {'total(s)':>12} {'avg(ms)':>12} {'%':>7}"]
        for t in sorted(self.timers.values(), key=lambda t: -t.total):
            avg = t.total / t.calls * 1e3 if t.calls else 0.0
            lines.append(f"{t.name:<28} {t.calls:>10d} {t.total:>12.4f} "
                         f"{avg:>12.3f} {100 * t.total / total:>6.1f}%")
        for k, v in sorted(self.counters.items()):
            lines.append(f"{k:<28} {v:>10.0f}")
        lines.append(f"{'WALL':<28} {'':>10} {total:>12.4f}")
        return "\n".join(lines)

    def write(self, snapdir: str):
        """dumpprofile analog (/root/reference/src/ddcMD.c:209-223)."""
        with open(os.path.join(snapdir, "profile"), "w") as f:
            f.write(self.table() + "\n")


#: process-global instance (the reference's profile() is global too)
PROFILE = Profile()


def start_trace(logdir: str = "/tmp/ddcmd_trace"):
    """jax.profiler trace for per-kernel device timing."""
    import jax

    jax.profiler.start_trace(logdir)
    return logdir


def stop_trace():
    import jax

    jax.profiler.stop_trace()
