"""Multiprocessing helpers (reference: pygsti/tools/mptools.py).

The reference uses multiprocessing.Pool for RB circuit sampling; here the
same API runs a threads/serial map (heavy parallelism belongs to jax/XLA
in this architecture, and sampling is cheap relative to simulation).
"""

from __future__ import annotations

import multiprocessing as _mp


def starmap_with_kwargs(fn, num_runs, num_processors, args_list, kwargs_list):
    """Run `fn(*args_list[i], **kwargs_list[i])` for i in range(num_runs),
    optionally with a process pool (reference:
    mptools.starmap_with_kwargs:18)."""
    assert len(args_list) == num_runs and len(kwargs_list) == num_runs
    if num_processors is None or num_processors <= 1:
        return [fn(*a, **k) for a, k in zip(args_list, kwargs_list)]
    with _mp.Pool(processes=min(num_processors, num_runs)) as pool:
        results = [pool.apply_async(fn, a, k)
                   for a, k in zip(args_list, kwargs_list)]
        return [r.get() for r in results]
