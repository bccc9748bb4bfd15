"""Functions-of-a-model with confidence-region error-bar propagation
(reference: pygsti/report/modelfunction.py).

A ModelFunction wraps `f(model, ...)` so a ConfidenceRegionFactoryView can
propagate parameter uncertainty through it (linearized); used by the
reportables machinery.
"""

from __future__ import annotations

import numpy as np


class ModelFunction(object):
    """Base: evaluate(model) -> value; subclasses override evaluate
    (reference: modelfunction.ModelFunction)."""

    def __init__(self, model, dependencies=('all',)):
        self.base_model = model
        self.dependencies_ = dependencies

    def evaluate(self, model):
        raise NotImplementedError()

    def evaluate_nearby(self, nearby_model):
        """Default: full re-evaluation (subclasses may linearize)."""
        return self.evaluate(nearby_model)

    def dependencies(self):
        return self.dependencies_


def modelfn_factory(fn):
    """Wrap a plain function f(model, *args) into a ModelFunction subclass
    factory (reference: modelfunction.modelfn_factory)."""
    class _WrappedModelFunction(ModelFunction):
        def __init__(self, model, *args, **kwargs):
            super().__init__(model)
            self.args = args
            self.kwargs = kwargs

        def evaluate(self, model):
            return fn(model, *self.args, **self.kwargs)

    _WrappedModelFunction.__name__ = fn.__name__ + "_modelfn"
    return _WrappedModelFunction


def evaluate_with_error_bars(model_fn, crf_view, eps=1e-7):
    """(value, error_bar) of a ModelFunction under a confidence-region view
    (linear propagation through the projected inverse Hessian)."""
    val = model_fn.evaluate(model_fn.base_model)
    eb = crf_view.compute_uncertainty(
        lambda m: model_fn.evaluate_nearby(m), model_fn.base_model, eps=eps)
    return val, eb
