"""Profiler: named time/count/memory accumulators
(reference: pygsti/baseobjs/profiler.py:68).  Adds a jax.profiler trace hook
for TPU timeline capture."""

from __future__ import annotations

import contextlib
import time

import numpy as np


class Profiler(object):
    """Named accumulators for timing, counts and memory checks."""

    def __init__(self, comm=None, default_print_memcheck=False):
        self.timers = {}
        self.counters = {}
        self.mem_checkpoints = {}
        self._start_times = {}
        self.print_memchecks = default_print_memcheck

    def add_time(self, name, start_time=None, prefix=0):
        if start_time is not None:
            elapsed = time.time() - start_time
        else:
            elapsed = 0.0
        self.timers[name] = self.timers.get(name, 0.0) + elapsed

    @contextlib.contextmanager
    def timing(self, name):
        t0 = time.time()
        try:
            yield
        finally:
            self.add_time(name, t0)

    def add_count(self, name, inc=1, prefix=0):
        self.counters[name] = self.counters.get(name, 0) + inc

    def memory_check(self, name, printme=None, prefix=0):
        try:
            import resource
            usage = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0  # MB
        except Exception:
            usage = np.nan
        self.mem_checkpoints.setdefault(name, []).append(usage)
        if printme or (printme is None and self.print_memchecks):
            print("MEM USAGE [%s] = %.1f MB" % (name, usage))

    def format_times(self, sort_by="name"):
        items = sorted(self.timers.items(),
                       key=(lambda kv: kv[0]) if sort_by == "name" else (lambda kv: -kv[1]))
        return "\n".join("  %-40s %.3fs" % (k, v) for k, v in items)

    @contextlib.contextmanager
    def jax_trace(self, log_dir="/tmp/jax-trace"):
        """Capture a jax profiler trace (viewable with TensorBoard/xprof)."""
        import jax
        jax.profiler.start_trace(log_dir)
        try:
            yield
        finally:
            jax.profiler.stop_trace()


class DummyProfiler(object):
    """No-op profiler (reference: profiler.DummyProfiler:403)."""

    def add_time(self, name, start_time=None, prefix=0):
        pass

    def add_count(self, name, inc=1, prefix=0):
        pass

    def memory_check(self, name, printme=None, prefix=0):
        pass

    @contextlib.contextmanager
    def timing(self, name):
        yield
