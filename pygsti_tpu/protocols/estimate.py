"""Estimate: one GST estimate with its gauge-opt variants and metadata
(reference: pygsti/protocols/estimate.py:37)."""

from __future__ import annotations

import collections

import numpy as np


class Estimate(object):
    """A GST estimate: models dict (target/seed/iteration/final + gauge-opt
    variants), fit parameters, and goodness-of-fit access."""

    def __init__(self, parent=None, models=None, parameters=None):
        self.parent = parent
        self.models = collections.OrderedDict(models or {})
        self.parameters = dict(parameters or {})
        self.goparameters = collections.OrderedDict()
        self.confidence_region_factories = {}

    @classmethod
    def create_gst_estimate(cls, parent, target_model, seed_model, models_by_iter,
                            parameters):
        models = collections.OrderedDict()
        models['target'] = target_model
        models['seed'] = seed_model
        for i, m in enumerate(models_by_iter):
            models['iteration %d estimate' % i] = m
        models['final iteration estimate'] = models_by_iter[-1] if models_by_iter else seed_model
        return cls(parent, models, parameters)

    def add_gaugeoptimized(self, goparams, model=None, label=None, comm=None, verbosity=0):
        """Add a gauge-optimized version of the final model."""
        from pygsti_tpu.algorithms.gaugeopt import gaugeopt_to_target
        if label is None:
            label = "go%d" % len(self.goparameters)
        if model is None:
            gop = dict(goparams)
            gop.pop('verbosity', None)
            target = gop.pop('target_model', self.models.get('target'))
            mdl = self.models['final iteration estimate']
            model = gaugeopt_to_target(mdl, target, **gop)
        self.models[label] = model
        self.goparameters[label] = goparams
        return model

    def misfit_sigma(self, resource_alloc=None):
        """N_sigma of the final fit (reference: estimate.misfit_sigma:835).
        The expected-fit dof uses the model's TOTAL parameter count, the
        reference's effective behavior when num_modeltest_params is unset
        (model.py:128 falls back to num_params with a warning)."""
        p = self.parameters
        fit = p.get('final_objfn_value')
        k = p.get('final_dof')
        if fit is None or k is None:
            return None
        expected = k
        return (fit - expected) / np.sqrt(2 * expected) if expected > 0 else np.inf

    def create_confidence_region_factory(self, model_label='final iteration estimate',
                                         circuits_label='final'):
        from pygsti_tpu.protocols.confidenceregionfactory import ConfidenceRegionFactory
        crf = ConfidenceRegionFactory(self, model_label, circuits_label)
        self.confidence_region_factories[(model_label, circuits_label)] = crf
        return crf

    def __getitem__(self, key):
        return self.models[key]

    def __contains__(self, key):
        return key in self.models

    def keys(self):
        return self.models.keys()


import collections as _collections

# key type for confidence_region_factories (reference: estimate.py:34);
# a namedtuple compares equal to the plain (model, circuit_list) tuples
# used as keys above, so both forms interoperate.
CRFkey = _collections.namedtuple('CRFkey', ['model', 'circuit_list'])
