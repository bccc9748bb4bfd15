"""SmartCache: argument-digest memoization used by the report layer
(reference: pygsti/baseobjs/smartcache.py:110)."""

from __future__ import annotations

import functools
import hashlib
import pickle


def _digest(obj):
    try:
        return hashlib.sha1(pickle.dumps(obj)).hexdigest()
    except Exception:
        return str(id(obj))


class SmartCache(object):
    """Cache keyed on digests of the (fn, args) pair, with hit/miss stats."""

    def __init__(self, decorating=()):
        self.cache = {}
        self.hits = 0
        self.misses = 0
        self.unpickleable = set()

    def cached_compute(self, fn, arg_vals, kwargs=None):
        kwargs = kwargs or {}
        key = (fn.__name__, tuple(_digest(a) for a in arg_vals),
               tuple(sorted((k, _digest(v)) for k, v in kwargs.items())))
        if key in self.cache:
            self.hits += 1
            return key, self.cache[key]
        self.misses += 1
        val = fn(*arg_vals, **kwargs)
        self.cache[key] = val
        return key, val

    def status(self):
        return {'hits': self.hits, 'misses': self.misses,
                'size': len(self.cache)}


def smart_cached(fn):
    """Decorator attaching a SmartCache to a function."""
    cache = SmartCache()

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        _, val = cache.cached_compute(fn, args, kwargs)
        return val

    wrapper.cache = cache
    return wrapper
