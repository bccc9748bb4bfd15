"""GST circuit-list construction (reference: pygsti/circuits/gstcircuits.py:272).

Builds the nested per-max-length circuit lists of long-sequence GST:
  prep_fiducial + germ^(L // len(germ)) + meas_fiducial   ('whole germ powers')
with duplicates removed (circuits compare by layer content).
"""

from __future__ import annotations

from pygsti_tpu.circuits.circuit import Circuit
from pygsti_tpu.circuits.circuitlist import CircuitList


def create_lgst_circuits(prep_fiducials, meas_fiducials, op_label_src):
    """The LGST circuit set: all fiducial pairs + fid/gate/fid sandwiches
    (reference: circuitconstruction / gstcircuits create_lgst_circuits)."""
    if hasattr(op_label_src, 'operations'):
        op_labels = list(op_label_src.operations.keys())
    else:
        op_labels = list(op_label_src)
    seen = set()
    out = []

    def add(c):
        if c not in seen:
            seen.add(c)
            out.append(c)

    for f1 in prep_fiducials:
        for f2 in meas_fiducials:
            add(f1 + f2)
    for g in op_labels:
        gc = Circuit((g,), prep_fiducials[0].line_labels if prep_fiducials else None)
        for f1 in prep_fiducials:
            for f2 in meas_fiducials:
                add(f1 + gc + f2)
    return out


def repeat_with_max_length(circuit, max_length):
    """germ^(max_length // len(germ)) -- 'whole germ powers' truncation."""
    if circuit.depth == 0:
        return circuit
    return circuit.repeat(max_length // circuit.depth)


def repeat_and_truncate(circuit, max_length):
    """Repeat then truncate to exactly max_length layers."""
    if circuit.depth == 0:
        return circuit
    reps = -(-max_length // circuit.depth)
    return (circuit.repeat(reps))[:max_length]


def make_lsgst_structs(op_label_src, prep_fiducials, meas_fiducials, germs,
                       max_lengths, fid_pairs=None, trunc_scheme="whole germ powers",
                       nest=True, include_lgst=True, germ_length_limits=None,
                       op_label_aliases=None, dscheck=None,
                       action_if_missing="raise", verbosity=0,
                       keep_fraction=1, keep_seed=None):
    """Create the series of nested GST circuit structures, one per max-length
    (reference: gstcircuits.make_lsgst_structs:259).  Each returned object is
    a PlaquetteGridCircuitStructure (a CircuitList with a (L, germ) plaquette
    grid used by report color-box plots).

    ``keep_fraction < 1`` keeps a random round(keep_fraction * n_pairs)
    subset of fiducial pairs per (germ, L), drawn with ``keep_seed``
    (reference :172-233); when combined with ``fid_pairs``, the given
    pairs are always kept and random extras top the count up."""
    from pygsti_tpu.circuits.circuitstructure import (
        GermFiducialPairPlaquette, PlaquetteGridCircuitStructure)
    germ_length_limits = germ_length_limits or {}
    import collections as _collections
    plaquettes = _collections.OrderedDict()  # (L, germ) -> plaquette
    lgst_circuits = []
    germs = list(germs)
    line_labels = germs[0].line_labels if len(germs) > 0 else \
        (list(prep_fiducials) + list(meas_fiducials))[0].line_labels
    empty_germ = Circuit((), line_labels)
    struct_germs = ([empty_germ] + germs) \
        if (include_lgst and empty_germ not in germs) else germs

    running = []
    seen = set()

    if keep_fraction < 1.0:
        import numpy as _np
        _rndm = _np.random.RandomState(keep_seed)
        _n_pairs = len(prep_fiducials) * len(meas_fiducials)
        _n_keep = int(round(float(keep_fraction) * _n_pairs))
    else:
        _rndm = None

    def add(c):
        if c not in seen:
            seen.add(c)
            running.append(c)

    if include_lgst and (len(max_lengths) == 0 or max_lengths[0] != 0):
        # the full LGST set: fiducial pairs AND per-gate sandwiches (exempt
        # from fiducial-pair reduction; reference gstcircuits include_lgst)
        for c in create_lgst_circuits(prep_fiducials, meas_fiducials, op_label_src):
            add(c)
            lgst_circuits.append(c)

    def pairs_for_germ(germ):
        if fid_pairs is None:
            return [(f1, f2) for f1 in prep_fiducials for f2 in meas_fiducials]
        if isinstance(fid_pairs, dict):
            pair_idxs = fid_pairs.get(germ, None)
            if pair_idxs is None:
                return [(f1, f2) for f1 in prep_fiducials for f2 in meas_fiducials]
        else:
            pair_idxs = fid_pairs
        return [(prep_fiducials[i], meas_fiducials[j]) for (i, j) in pair_idxs]

    lists = []
    for L in max_lengths:
        if not nest:
            running = []
            seen = set()
            if include_lgst:
                for f1 in prep_fiducials:
                    for f2 in meas_fiducials:
                        add(f1 + f2)
        if L == 0:
            # "0" means the LGST strings (already added above)
            lists.append(PlaquetteGridCircuitStructure(
                dict(plaquettes), [l for l in max_lengths if l <= L], struct_germs,
                "L", "germ", lgst_circuits, op_label_aliases))
            continue
        if include_lgst and L == next((l for l in max_lengths if l != 0), None):
            # LGST fiducial pairs as an empty-germ plaquette at the first L
            # (reference: gstcircuits.py:571-575; no FPR on LGST strings)
            fidpairs0 = _collections.OrderedDict(
                ((j, i), (f1, f2))
                for (i, f1) in enumerate(prep_fiducials)
                for (j, f2) in enumerate(meas_fiducials))
            for (j, i), (f1, f2) in fidpairs0.items():
                add(f1 + f2)
            plaquettes[(L, empty_germ)] = GermFiducialPairPlaquette(
                empty_germ, 1, fidpairs0, len(meas_fiducials),
                len(prep_fiducials), op_label_aliases)
        for germ in germs:
            Lg = min(L, germ_length_limits.get(germ, L))
            if trunc_scheme == "whole germ powers":
                reps = Lg // germ.depth if germ.depth > 0 else 0
                if reps == 0:
                    continue
                base = germ.repeat(reps)
            elif trunc_scheme == "truncated germ powers":
                reps = 0
                base = repeat_and_truncate(germ, Lg)
            elif trunc_scheme == "length as exponent":
                reps = Lg
                base = germ.repeat(Lg)
            else:
                raise ValueError("Unknown trunc_scheme %r" % trunc_scheme)
            germ_pairs = set(pairs_for_germ(germ))
            if _rndm is not None:
                # random per-(germ, L) pair subset (reference :215-233):
                # EXPLICITLY-given pairs are always kept with random extras
                # topping up the keep count; germs without explicit pairs
                # (absent from a fid_pairs dict, or no fid_pairs at all)
                # get a pure random keep-count subset
                has_explicit = (fid_pairs is not None
                                and (not isinstance(fid_pairs, dict)
                                     or germ in fid_pairs))
                base_pairs = germ_pairs if has_explicit else set()
                all_pairs = [(f1, f2) for f1 in prep_fiducials
                             for f2 in meas_fiducials]
                remaining = [pr for pr in all_pairs if pr not in base_pairs]
                n_choose = max(0, min(_n_keep - len(base_pairs),
                                      len(remaining)))
                chosen = _rndm.choice(len(remaining), n_choose,
                                      replace=False) if n_choose else []
                germ_pairs = set(base_pairs) | {remaining[int(k)]
                                                for k in chosen}
            fidpairs = _collections.OrderedDict()
            for (i, f1), (j, f2) in ((iv, jv) for iv in enumerate(prep_fiducials)
                                     for jv in enumerate(meas_fiducials)):
                if (f1, f2) not in germ_pairs:
                    continue
                c = f1 + base + f2
                if dscheck is not None and c not in dscheck:
                    if action_if_missing == "raise":
                        raise ValueError("Circuit %s missing from dataset" % c.str)
                    continue
                add(c)
                fidpairs[(j, i)] = (f1, f2)
            plaq = GermFiducialPairPlaquette(
                germ, reps, fidpairs, len(meas_fiducials), len(prep_fiducials),
                op_label_aliases)
            if reps == 0 and base.depth > 0:  # truncated-germ-power scheme
                from pygsti_tpu.circuits.circuitstructure import FiducialPairPlaquette
                plaq = FiducialPairPlaquette(base, fidpairs, len(meas_fiducials),
                                             len(prep_fiducials), op_label_aliases)
            plaquettes[(L, germ)] = plaq
        lists.append(PlaquetteGridCircuitStructure(
            dict(plaquettes), [l for l in max_lengths if l <= L], struct_germs,
            "L", "germ", lgst_circuits, op_label_aliases))
    return lists


def create_lsgst_circuit_lists(op_label_src, prep_fiducials, meas_fiducials, germs,
                               max_lengths, fid_pairs=None, trunc_scheme="whole germ powers",
                               nest=True, include_lgst=True, germ_length_limits=None,
                               op_label_aliases=None, dscheck=None,
                               action_if_missing="raise", verbosity=0,
                               keep_fraction=1, keep_seed=None):
    """Create the series of nested GST circuit lists (one per max-length).
    Returns PlaquetteGridCircuitStructure objects (CircuitList subclasses)."""
    return make_lsgst_structs(op_label_src, prep_fiducials, meas_fiducials,
                              germs, max_lengths, fid_pairs, trunc_scheme,
                              nest, include_lgst, germ_length_limits,
                              op_label_aliases, dscheck, action_if_missing,
                              verbosity, keep_fraction, keep_seed)


def create_lsgst_circuits(op_label_src, prep_fiducials, meas_fiducials, germs,
                          max_lengths, fid_pairs=None,
                          trunc_scheme="whole germ powers", keep_fraction=1,
                          keep_seed=None, include_lgst=True):
    """The final (longest) LSGST circuit list: all circuits needed for the
    full experiment (reference: gstcircuits.create_lsgst_circuits:681)."""
    lists = create_lsgst_circuit_lists(
        op_label_src, prep_fiducials, meas_fiducials, germs, max_lengths,
        fid_pairs=fid_pairs, trunc_scheme=trunc_scheme,
        include_lgst=include_lgst, keep_fraction=keep_fraction,
        keep_seed=keep_seed)
    return list(lists[-1])


def create_elgst_lists(op_label_src, germs, max_lengths,
                       trunc_scheme="whole germ powers", nest=True,
                       include_lgst=True):
    """Nested circuit lists for eLGST (no fiducials: bare germ powers;
    reference: gstcircuits.create_elgst_lists:765)."""
    from pygsti_tpu.circuits.circuit import Circuit
    from pygsti_tpu.circuits.circuitlist import CircuitList
    if hasattr(op_label_src, 'operations'):
        op_labels = list(op_label_src.operations.keys())
    else:
        op_labels = list(op_label_src)
    single_ops = [Circuit((lbl,)) for lbl in op_labels] if include_lgst else []
    lists = []
    current = list(single_ops)
    for L in max_lengths:
        if L == 0:
            new = list(single_ops)
        else:
            if trunc_scheme == "whole germ powers":
                new = [repeat_with_max_length(g, L) for g in germs]
            elif trunc_scheme == "truncated germ powers":
                new = [repeat_and_truncate(g, L) for g in germs]
            elif trunc_scheme == "length as exponent":
                new = [g * L for g in germs]
            else:
                raise ValueError("Invalid trunc_scheme: %r" % trunc_scheme)
        if nest:
            seen = set(c.layertup for c in current)
            current = current + [c for c in new if c.layertup not in seen]
            lists.append(CircuitList(list(current)))
        else:
            lists.append(CircuitList(list(dict.fromkeys(single_ops + new))))
    return lists


def create_elgst_experiment_list(op_label_src, germs, max_lengths,
                                 trunc_scheme="whole germ powers",
                                 include_lgst=True):
    """All circuits needed for an eLGST experiment (reference:
    gstcircuits.create_elgst_experiment_list)."""
    lists = create_elgst_lists(op_label_src, germs, max_lengths,
                               trunc_scheme, nest=True,
                               include_lgst=include_lgst)
    return list(lists[-1])
