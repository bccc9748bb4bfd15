"""cProfile decorator (reference: pygsti/tools/profile.py). The reference
keys dump filenames by MPI rank; here the single-controller JAX runtime has
one process per host, so we key by `jax.process_index()` when distributed."""

import cProfile as _cProfile


def _rank():
    try:
        import jax
        return jax.process_index()
    except Exception:
        return 0


def profile(filename=None, comm=None):
    """Decorator profiling a function with cProfile. With `filename`, stats
    dump to '<filename>.out.<rank>'; otherwise they print. `comm` is
    accepted for reference-signature parity (rank comes from
    jax.process_index())."""
    def prof_decorator(f):
        def wrap_f(*args, **kwargs):
            pr = _cProfile.Profile()
            pr.enable()
            result = f(*args, **kwargs)
            pr.disable()
            if filename is None:
                pr.print_stats()
            else:
                pr.dump_stats('{}.out.{}'.format(filename, _rank()))
            return result
        return wrap_f
    return prof_decorator
