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


# ---------------------------------------------------------------------------
# Factory functions wrapping plain metric functions into ModelFunction
# classes, keyed by which model pieces they depend on (reference:
# report/modelfunction.py:124-470).
# ---------------------------------------------------------------------------

def _named(fn, cls):
    cls.__name__ = fn.__name__ + "_class"
    return cls


def spamfn_factory(fn):
    """Class evaluating fn(preps, povms, ...) on a model's SPAM members
    (reference: modelfunction.spamfn_factory:124)."""
    class _F(ModelFunction):
        def __init__(self, model, *args, **kwargs):
            self.args, self.kwargs = args, kwargs
            super().__init__(model, ["spam"])

        def evaluate(self, model):
            return fn(list(model.preps.values()),
                      list(model.povms.values()), *self.args, **self.kwargs)
    return _named(fn, _F)


def opfn_factory(fn):
    """Class evaluating fn(gate_matrix, basis, ...) on one model operation
    (reference: modelfunction.opfn_factory:167)."""
    class _F(ModelFunction):
        def __init__(self, model, gl, *args, **kwargs):
            self.gl, self.args, self.kwargs = gl, args, kwargs
            super().__init__(model, [("gate", gl)])

        def evaluate(self, model):
            import numpy as _np
            return fn(_np.asarray(model.operations[self.gl].to_dense()),
                      model.basis, *self.args, **self.kwargs)
    return _named(fn, _F)


def opsfn_factory(fn):
    """Class evaluating fn(op1, op2, basis, ...) where op2 comes from a
    second (target) model (reference: modelfunction.opsfn_factory:207)."""
    class _F(ModelFunction):
        def __init__(self, model1, model2, gl, *args, **kwargs):
            self.other_model, self.gl = model2, gl
            self.args, self.kwargs = args, kwargs
            super().__init__(model1, [("gate", gl)])

        def evaluate(self, model):
            import numpy as _np
            return fn(_np.asarray(model.operations[self.gl].to_dense()),
                      _np.asarray(
                          self.other_model.operations[self.gl].to_dense()),
                      model.basis, *self.args, **self.kwargs)
    return _named(fn, _F)


def instrumentfn_factory(fn):
    """Class evaluating fn(instrument1, instrument2, basis, ...)
    (reference: modelfunction.instrumentfn_factory:266)."""
    class _F(ModelFunction):
        def __init__(self, model1, model2, instrument_lbl, *args, **kwargs):
            self.other_model, self.il = model2, instrument_lbl
            self.args, self.kwargs = args, kwargs
            super().__init__(model1, [("instrument", instrument_lbl)])

        def evaluate(self, model):
            return fn(model.instruments[self.il],
                      self.other_model.instruments[self.il],
                      model.basis, *self.args, **self.kwargs)
    return _named(fn, _F)


def vecfn_factory(fn):
    """Class evaluating fn(vec, basis, ...) on one SPAM vector; `typ` is
    'prep' or 'effect' (reference: modelfunction.vecfn_factory:307)."""
    class _F(ModelFunction):
        def __init__(self, model, lbl, typ, *args, **kwargs):
            self.lbl, self.typ = lbl, typ
            self.args, self.kwargs = args, kwargs
            assert typ in ('prep', 'effect'), "typ must be 'prep' or 'effect'"
            super().__init__(model, [(typ, lbl)])

        def _get_vec(self, model):
            import numpy as _np
            if self.typ == 'prep':
                return _np.asarray(model.preps[self.lbl].to_dense())
            povm_lbl, elbl = str(self.lbl).split(':')                 if ':' in str(self.lbl) else (self.lbl, None)
            povm = model.povms[povm_lbl]
            mx = _np.asarray(povm.to_dense())
            if elbl is not None:
                return mx[list(povm.keys()).index(elbl)]                     if hasattr(povm, 'keys') else mx
            return mx

        def evaluate(self, model):
            return fn(self._get_vec(model), model.basis,
                      *self.args, **self.kwargs)
    return _named(fn, _F)


def vecsfn_factory(fn):
    """Class evaluating fn(vec1, vec2, basis, ...) comparing a SPAM vector
    with a second model's (reference: modelfunction.vecsfn_factory:358)."""
    class _F(ModelFunction):
        def __init__(self, model1, model2, lbl, typ, *args, **kwargs):
            self.other_model, self.lbl, self.typ = model2, lbl, typ
            self.args, self.kwargs = args, kwargs
            self._single = vecfn_factory(lambda v, b: v)
            super().__init__(model1, [(typ, lbl)])

        def evaluate(self, model):
            v1 = self._single(model, self.lbl, self.typ).evaluate(model)
            v2 = self._single(self.other_model, self.lbl,
                              self.typ).evaluate(self.other_model)
            return fn(v1, v2, model.basis, *self.args, **self.kwargs)
    return _named(fn, _F)


def povmfn_factory(fn):
    """Class evaluating fn(model, ...) but dependent only on its POVMs
    (reference: modelfunction.povmfn_factory:415)."""
    class _F(ModelFunction):
        def __init__(self, model, *args, **kwargs):
            self.args, self.kwargs = args, kwargs
            dependencies = [("povm", l) for l in model.povms]
            super().__init__(model, dependencies)

        def evaluate(self, model):
            return fn(model, *self.args, **self.kwargs)
    return _named(fn, _F)
