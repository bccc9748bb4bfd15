"""Circuit compilation: circuits -> padded index tensors + element maps.

This replaces the reference's COPA layout / EvalTree / PrefixTable machinery
(pygsti/layouts/copalayout.py:27, evaltree.py:31, prefixtable.py:20) with the
TPU-native staging step: every circuit becomes a fixed-length row of int32
operation indices (padded with a virtual identity op), and the
(circuit, outcome) -> flat-element-index contract is realized as gather
index arrays.  Prefix sharing is intentionally dropped: on TPU, batched
matmul FLOPs are cheap while divergent control flow is not (SURVEY.md §5
"long-context" notes).
"""

from __future__ import annotations

import numpy as np

from pygsti_tpu.baseobjs.label import Label, LabelStr
from pygsti_tpu.circuits.circuit import Circuit


class CircuitOutcomeProbabilityLayout(object):
    """Compiled layout for a list of circuits against a model's structure.

    Attributes (host numpy; simulators convert to device arrays):
      op_indices   : int32 [n_circuits, max_depth], padded with `identity_index`
      depths       : int32 [n_circuits]
      prep_index   : int32 [n_circuits]  (row into stacked preps tensor)
      elem_circuit : int32 [n_elements]  (circuit index per element)
      elem_effect  : int32 [n_elements]  (row into stacked effects tensor)
      element_slices : list of slice, per circuit
      outcomes     : list (per circuit) of outcome tuples
    """

    def __init__(self, circuits, model, dataset=None, observed_outcomes_only=False,
                 pad_to_multiple=None):
        self.circuits = [c if isinstance(c, Circuit) else Circuit(c) for c in circuits]
        self.model = model
        # pad the circuit batch to a multiple (for even sharding across a
        # device mesh); padded circuits replicate circuit 0 but get zero
        # counts/total-counts so they contribute nothing to objectives.
        self.num_real_circuits = len(self.circuits)
        if pad_to_multiple and self.num_real_circuits % pad_to_multiple != 0:
            n_pad = pad_to_multiple - self.num_real_circuits % pad_to_multiple
            self.circuits = self.circuits + [self.circuits[0]] * n_pad

        # implicit models register their unique circuit layers first
        if hasattr(model, 'register_circuit_layers'):
            model.register_circuit_layers(self.circuits)

        op_keys = model.op_keys
        op_index_map = {k: i for i, k in enumerate(op_keys)}
        # Legacy-pack circuits carry sslbl-free labels on line '*' (e.g. bare
        # 'Gx') while explicit models may key operations with state-space
        # labels ('Gx:T0').  When a bare name matches exactly one operation,
        # alias it (the reference's old implicit-sslbls Label matching).
        by_name = {}
        for k, i in list(op_index_map.items()):
            name = getattr(k, 'name', None)
            if name is not None and name != k:
                by_name.setdefault(name, []).append(i)
        for name, idxs in by_name.items():
            if len(idxs) == 1 and name not in op_index_map:
                op_index_map[Label(name)] = idxs[0]
        prep_keys = model.prep_keys
        prep_index_map = {k: i for i, k in enumerate(prep_keys)}
        povm_rows = model.povm_effect_rows()

        self.identity_index = len(op_keys)  # virtual identity appended by sims
        self.num_ops = len(op_keys)

        B = len(self.circuits)
        seqs = []           # op-index sequences, one per EXPANDED row
        prep_rows = []      # prep index per row
        povm_rows_lbls = [] # povm label per row
        inst_prefixes = []  # instrument-outcome prefix tuple per row
        row_circuit = []    # original-circuit index per row
        import itertools
        has_instruments = len(getattr(model, 'instruments', {})) > 0
        op_keys_full = op_keys  # includes instrument pseudo-keys for explicit models

        for b, c in enumerate(self.circuits):
            layers = list(c.layertup)
            # explicit prep label at front?
            if layers and isinstance(layers[0], LabelStr) and layers[0] in model.preps:
                prep_lbl = layers.pop(0)
            else:
                prep_lbl = model._default_prep_label()
            # explicit povm label at end?
            if layers and isinstance(layers[-1], LabelStr) and layers[-1] in model.povms:
                povm_lbl = layers.pop()
            else:
                povm_lbl = model._default_povm_label()

            inst_positions = []
            if has_instruments:
                inst_positions = [(t, l) for t, l in enumerate(layers)
                                  if l in model.instruments]

            if not inst_positions:
                try:
                    seqs.append([op_index_map[l] for l in layers])
                except KeyError as e:
                    raise KeyError("Circuit layer %s is not an operation of the "
                                   "model (circuit %s)" % (e.args[0], c.str))
                prep_rows.append(prep_index_map[prep_lbl])
                povm_rows_lbls.append(povm_lbl)
                inst_prefixes.append(())
                row_circuit.append(b)
            else:
                # expand: one row per combination of instrument members
                # (reference: model.expand_instruments_and_separate_povm,
                # models/model.py:1600)
                member_lists = [list(model.instruments[l].member_labels)
                                for (_, l) in inst_positions]
                for combo in itertools.product(*member_lists):
                    seq = []
                    combo_iter = iter(zip(inst_positions, combo))
                    next_pos, next_member = next(combo_iter, ((None, None), None))
                    ci = 0
                    for t, l in enumerate(layers):
                        if next_pos[0] == t:
                            seq.append(op_index_map[('INSTRUMENT', next_pos[1],
                                                     next_member)])
                            next_pos, next_member = next(combo_iter,
                                                         ((None, None), None))
                        else:
                            seq.append(op_index_map[l])
                    seqs.append(seq)
                    prep_rows.append(prep_index_map[prep_lbl])
                    povm_rows_lbls.append(povm_lbl)
                    inst_prefixes.append(tuple(combo))
                    row_circuit.append(b)

        n_rows = len(seqs)
        self.depths = np.array([len(s) for s in seqs], dtype=np.int32)
        D = int(self.depths.max()) if n_rows > 0 else 0
        op_indices = np.full((n_rows, D), self.identity_index, dtype=np.int32)
        for r, s in enumerate(seqs):
            op_indices[r, :len(s)] = s
        self.op_indices = op_indices
        self.prep_index = np.array(prep_rows, dtype=np.int32)
        self.max_depth = D
        self.num_rows = n_rows

        # -- element map -------------------------------------------------------
        elem_circuit = []   # row index per element (for the rho gather)
        elem_effect = []
        elem_to_circuit = []  # ORIGINAL circuit index per element
        self.element_slices = []   # per ORIGINAL circuit
        self.outcomes = []         # per ORIGINAL circuit
        omitted_firsts = []        # first element index of circuits w/ omitted
        omitted_circuits = []      # original index of those circuits
        off = 0
        row_nouts = set()
        r = 0
        for b, c in enumerate(self.circuits):
            circ_outcomes = []
            start_off = off
            full_n = 0
            while r < n_rows and row_circuit[r] == b:
                row_slice, outcome_labels = povm_rows[povm_rows_lbls[r]]
                rows_idx = list(range(row_slice.start, row_slice.stop))
                outs = [inst_prefixes[r] + (ol,) for ol in outcome_labels]
                full_n += len(rows_idx)
                if observed_outcomes_only and dataset is not None and c in dataset:
                    # outcomes with zero counts are treated as OMITTED even
                    # when the dataset records them (simulate_data defaults
                    # record_zero_counts=True): the objective's
                    # omitted-probability correction (objectivefns.py
                    # _terms_of_p; reference objectivefns.py:1015
                    # add_omitted_freqs) contributes exactly the same
                    # zero-freq terms those elements would, so dropping them
                    # preserves the logL while shrinking the element count --
                    # the point of the sparse mode at >3 qubits.
                    row_counts = dataset[c].counts
                    keep = [i for i, o in enumerate(outs)
                            if row_counts.get(o, 0) > 0]
                    rows_idx = [rows_idx[i] for i in keep]
                    outs = [outs[i] for i in keep]
                n = len(rows_idx)
                row_nouts.add(n)
                elem_circuit.extend([r] * n)
                elem_effect.extend(rows_idx)
                elem_to_circuit.extend([b] * n)
                circ_outcomes.extend(outs)
                off += n
                r += 1
            self.element_slices.append(slice(start_off, off))
            self.outcomes.append(circ_outcomes)
            # circuits with omitted (unobserved) outcomes need the
            # omitted-probability logL correction (reference:
            # objectivefns.py:1015 add_omitted_freqs -- "firsts")
            if 0 < (off - start_off) < full_n:
                omitted_firsts.append(start_off)
                omitted_circuits.append(b)
        self.elem_circuit = np.array(elem_circuit, dtype=np.int32)
        self.elem_effect = np.array(elem_effect, dtype=np.int32)
        self.elem_to_circuit = np.array(elem_to_circuit, dtype=np.int32)
        self.num_elements = off
        self.rows_uniform_n_out = (len(row_nouts) <= 1)
        self.omitted_firsts = np.array(omitted_firsts, dtype=np.int32)
        self.omitted_circuits = np.array(omitted_circuits, dtype=np.int32)
        self.has_omitted = len(omitted_firsts) > 0

    # -- factorization (germ-power product cache) -------------------------------
    @property
    def factorization(self):
        """Lazily-built germ-power product-cache plan (layouts/prodcache.py),
        or None when disabled/inapplicable.  The TPU-native EvalTree
        (reference: layouts/evaltree.py:31-90): repeated blocks (germ powers)
        become cached subproducts built by repeated squaring, collapsing the
        depth-D propagation scan into ~log(D) batched-matmul levels."""
        import os
        if os.environ.get('PYGSTI_TPU_FACTORIZED', '1') == '0':
            return None
        if not hasattr(self, '_factorization'):
            from pygsti_tpu.layouts.prodcache import factorize_layout
            self._factorization = factorize_layout(self)
        return self._factorization

    # -- COPA contract ---------------------------------------------------------
    def __len__(self):
        return self.num_elements

    @property
    def num_circuits(self):
        return len(self.circuits)

    def indices_for_index(self, i):
        """Element slice for circuit number i."""
        return self.element_slices[i]

    def outcomes_for_index(self, i):
        return self.outcomes[i]

    def indices(self, circuit):
        return self.element_slices[self.circuits.index(circuit)]

    def outcomes_for_circuit(self, circuit):
        return self.outcomes[self.circuits.index(circuit)]

    def allocate_local_array(self, array_type='e', dtype='d'):
        if array_type == 'e':
            return np.zeros(self.num_elements, dtype)
        if array_type == 'ep':
            return np.zeros((self.num_elements, self.model.num_params), dtype)
        raise ValueError("Unknown array type %r" % array_type)

    # -- counts extraction -----------------------------------------------------
    def counts_arrays(self, dataset):
        """Extract (counts, total_counts) flat element arrays from a dataset.

        total_counts is per-element (each element of a circuit shares the
        circuit's total), matching the objective-function contract
        (reference: objectivefns.py:912 ModelDatasetCircuitsStore).  Cached
        per dataset: iterative GST builds one objective per stage against
        the same shared layout, and re-extracting 10^5-element count arrays
        in Python per stage is measurable host time.
        """
        cache = getattr(self, '_counts_cache', None)
        if cache is None:
            cache = self._counts_cache = {}
        hit = cache.get(id(dataset))
        if hit is not None:
            return hit
        counts = np.zeros(self.num_elements)
        totals = np.zeros(self.num_elements)
        for b, c in enumerate(self.circuits):
            if b >= self.num_real_circuits:
                break  # padded circuits keep zero counts AND zero totals
            row = dataset[c]
            total = row.total
            sl = self.element_slices[b]
            for k, outcome in enumerate(self.outcomes[b]):
                cnt = row.counts.get(outcome, 0)
                counts[sl.start + k] = cnt
                totals[sl.start + k] = total
        cache[id(dataset)] = (counts, totals)
        return counts, totals


# Reference layout-class names: in the TPU design one layout type serves all
# simulators (sharding happens at the jax level, not in the layout), so the
# map/matrix/distributable layout classes are the same object
# (reference: layouts/maplayout.py:171 MapCOPALayout,
#  layouts/matrixlayout.py MatrixCOPALayout, layouts/copalayout.py).
COPALayout = CircuitOutcomeProbabilityLayout
MapCOPALayout = CircuitOutcomeProbabilityLayout
