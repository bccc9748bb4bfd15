"""Structured circuit collections: plaquettes indexed on a (germ, L) grid,
used by GST experiment designs and the report layer's nested color box plots
(reference: pygsti/circuits/circuitstructure.py:24 CircuitPlaquette, :257
FiducialPairPlaquette, :435 GermFiducialPairPlaquette, :609
PlaquetteGridCircuitStructure).
"""

from __future__ import annotations

import collections

from pygsti_tpu.circuits.circuit import Circuit
from pygsti_tpu.circuits.circuitlist import CircuitList


class CircuitPlaquette(object):
    """A single sub-matrix of circuits for a (x, y) cell of a circuit-structure
    plot: elements keyed by (row, col)."""

    def __init__(self, elements, num_rows=None, num_cols=None,
                 op_label_aliases=None):
        self.elements = collections.OrderedDict(elements)
        self.op_label_aliases = op_label_aliases
        if num_rows is None:
            num_rows = max([i for i, _ in self.elements], default=-1) + 1
        if num_cols is None:
            num_cols = max([j for _, j in self.elements], default=-1) + 1
        self.num_rows = num_rows
        self.num_cols = num_cols

    def __iter__(self):
        return iter(self.elements.items())

    def __len__(self):
        return len(self.elements)

    @property
    def circuits(self):
        return list(self.elements.values())

    def elementvec_to_matrix(self, elementvec, layout, mergeop="sum"):
        """Arrange a per-element vector (e.g. per-circuit chi2 contributions)
        into this plaquette's (num_rows, num_cols) matrix for box plots."""
        import numpy as np
        mx = np.full((self.num_rows, self.num_cols), np.nan)
        for (i, j), c in self.elements.items():
            sl = layout.indices(c) if hasattr(layout, 'indices') else None
            if sl is None:
                continue
            vals = elementvec[sl]
            mx[i, j] = float(np.sum(vals)) if mergeop == "sum" else float(vals)
        return mx

    def process_circuits(self, processor_fn, updated_aliases=None):
        return CircuitPlaquette(
            {k: processor_fn(c) for k, c in self.elements.items()},
            self.num_rows, self.num_cols, updated_aliases)

    def summary_label(self):
        return "%d circuits" % len(self)


class FiducialPairPlaquette(CircuitPlaquette):
    """Plaquette whose elements are prep_fid + base + meas_fid, keyed
    (meas_index, prep_index) (reference: circuitstructure.py:257)."""

    def __init__(self, base, fidpairs, num_rows=None, num_cols=None,
                 op_label_aliases=None):
        self.base = base
        self.fidpairs = collections.OrderedDict(fidpairs)
        elements = collections.OrderedDict(
            ((i, j), prep + base + meas)
            for (i, j), (prep, meas) in self.fidpairs.items())
        super().__init__(elements, num_rows, num_cols, op_label_aliases)

    def process_circuits(self, processor_fn, updated_aliases=None):
        return FiducialPairPlaquette(
            processor_fn(self.base),
            {k: (processor_fn(p), processor_fn(m))
             for k, (p, m) in self.fidpairs.items()},
            self.num_rows, self.num_cols, updated_aliases)

    def summary_label(self):
        return "{}" if len(self.base) == 0 else "%s" % self.base.str


class GermFiducialPairPlaquette(FiducialPairPlaquette):
    """FiducialPairPlaquette whose base = germ^power
    (reference: circuitstructure.py:435)."""

    def __init__(self, germ, power, fidpairs, num_rows=None, num_cols=None,
                 op_label_aliases=None):
        self.germ = germ
        self.power = power
        base = germ.repeat(power) if power > 0 else Circuit((), germ.line_labels)
        super().__init__(base, fidpairs, num_rows, num_cols, op_label_aliases)

    def summary_label(self):
        if len(self.germ) == 0 or self.power == 0:
            return "{}"
        return "(%s)^%d" % (self.germ.str, self.power)


class PlaquetteGridCircuitStructure(CircuitList):
    """A CircuitList with plaquette structure: indexable by (x, y) grid cells
    (typically x = max-length L, y = germ) (reference:
    circuitstructure.py:609)."""

    @classmethod
    def cast(cls, circuits_or_structure):
        if isinstance(circuits_or_structure, PlaquetteGridCircuitStructure):
            return circuits_or_structure
        if isinstance(circuits_or_structure, CircuitList):
            return cls({}, [], [], '', '', circuits_or_structure,
                       circuits_or_structure.op_label_aliases,
                       name=circuits_or_structure.name)
        return cls({}, [], [], '', '', circuits_or_structure)

    def __init__(self, plaquettes, x_values, y_values, xlabel, ylabel,
                 additional_circuits=None, op_label_aliases=None,
                 circuit_weights_dict=None, additional_circuits_location='start',
                 name=None):
        self._plaquettes = collections.OrderedDict(plaquettes)
        self.xs = list(x_values)
        self.ys = list(y_values)
        self.xlabel = xlabel
        self.ylabel = ylabel
        self._addl_location = additional_circuits_location

        circuits = collections.OrderedDict()
        additional = list(additional_circuits or [])
        if additional_circuits_location == 'start':
            circuits.update([(c, None) for c in additional])
        for plaq in self._plaquettes.values():
            circuits.update([(c, None) for c in plaq.circuits])
        if additional_circuits_location == 'end':
            circuits.update([(c, None) for c in additional])
        in_plaquettes = set()
        for p in self._plaquettes.values():
            in_plaquettes.update(p.elements.values())
        self._additional_circuits = [c for c in additional
                                     if c not in in_plaquettes]
        weights = None
        if circuit_weights_dict is not None:
            import numpy as np
            weights = np.array([circuit_weights_dict.get(c, 0.0)
                                for c in circuits], 'd')
        super().__init__(list(circuits.keys()), op_label_aliases, weights, name)

    @property
    def plaquettes(self):
        return self._plaquettes

    def plaquette(self, x, y, empty_if_missing=False):
        if empty_if_missing and (x, y) not in self._plaquettes:
            return CircuitPlaquette({}, 0, 0)
        return self._plaquettes[(x, y)]

    @property
    def used_xs(self):
        return [x for x in self.xs
                if any(len(self.plaquette(x, y, True)) > 0 for y in self.ys)]

    @property
    def used_ys(self):
        return [y for y in self.ys
                if any(len(self.plaquette(x, y, True)) > 0 for x in self.xs)]

    def truncate(self, xs_to_keep=None, ys_to_keep=None):
        xs = self.xs if xs_to_keep is None else [x for x in self.xs
                                                 if x in xs_to_keep]
        ys = self.ys if ys_to_keep is None else [y for y in self.ys
                                                 if y in ys_to_keep]
        plaq = collections.OrderedDict(
            (k, v) for k, v in self._plaquettes.items()
            if k[0] in xs and k[1] in ys)
        return PlaquetteGridCircuitStructure(
            plaq, xs, ys, self.xlabel, self.ylabel,
            self._additional_circuits, self.op_label_aliases,
            additional_circuits_location=self._addl_location, name=self.name)

    def process_circuits(self, processor_fn, updated_aliases=None):
        plaq = collections.OrderedDict(
            (k, v.process_circuits(processor_fn, updated_aliases))
            for k, v in self._plaquettes.items())
        return PlaquetteGridCircuitStructure(
            plaq, self.xs, self.ys, self.xlabel, self.ylabel,
            [processor_fn(c) for c in self._additional_circuits],
            updated_aliases, additional_circuits_location=self._addl_location,
            name=self.name)
