"""Tests for error-generator propagation through Clifford circuits."""

import numpy as np
import pytest
import scipy.linalg as spl

from pygsti_tpu.circuits import Circuit
from pygsti_tpu.errorgenpropagation import (ErrorGeneratorPropagator, PauliLabel,
                                            ElementaryErrorgenLabel)
from pygsti_tpu.tools import optools as _ot
from pygsti_tpu.tools import lindbladtools as _lt
from pygsti_tpu.tools.basistools import change_basis
from pygsti_tpu.tools.internalgates import standard_gatename_unitaries


def _dense_noisy_channel(circuit, gate_errorgens, n):
    """Reference dense computation: per layer, exp(L_layer) after the ideal
    layer superop."""
    from pygsti_tpu.errorgenpropagation.errorpropagator import _embed_unitary
    std = standard_gatename_unitaries()
    d2 = 4 ** n
    norm = np.sqrt(2.0 ** n)
    S = np.eye(d2)
    q_labels = list(circuit.line_labels)
    qindex = {q: i for i, q in enumerate(q_labels)}
    for layer in circuit.layertup:
        comps = layer.components if not layer.is_simple else (layer,)
        layer_u = np.eye(2 ** n, dtype=complex)
        L = np.zeros((d2, d2))
        for comp in comps:
            u = std[comp.name]
            targets = [qindex[q] for q in comp.sslbls]
            layer_u = _embed_unitary(u, targets, n) @ layer_u
            spec = gate_errorgens.get(comp.name, {})
            for (typ, *paulis), coeff in spec.items():
                # embed pauli strings on targets
                full = []
                for pstr in paulis:
                    chars = ['I'] * n
                    for li, ch in enumerate(pstr):
                        chars[targets[li]] = ch
                    # gate-local normalization (pyGSTi coefficient convention)
                    full.append(PauliLabel.from_str("".join(chars)).to_dense()
                                / np.sqrt(2.0 ** len(pstr)))
                eg = _lt.create_elementary_errorgen(typ, *full) if typ in 'CA' else \
                    _lt.create_elementary_errorgen(typ, full[0])
                L += coeff * np.real(change_basis(eg, 'std', 'pp'))
        S = spl.expm(L) @ np.real(_ot.unitary_to_pauligate(layer_u)) @ S
    return S


class TestPauliLabel:
    def test_roundtrip(self):
        for s in ['XIZ', 'YYI', 'IIII', 'XYZI']:
            assert str(PauliLabel.from_str(s)) == s

    def test_commutes(self):
        X = PauliLabel.from_str('X')
        Z = PauliLabel.from_str('Z')
        assert not X.commutes_with(Z)
        XX = PauliLabel.from_str('XX')
        ZZ = PauliLabel.from_str('ZZ')
        assert XX.commutes_with(ZZ)


class TestPropagation:
    def test_identity_suffix(self):
        """Error on the last layer propagates unchanged."""
        prop = ErrorGeneratorPropagator.from_errorgen_dict(
            {'Gxpi2': {('H', 'Z'): 0.01}}, 1, (0,))
        errs = prop.propagate_errorgens(Circuit('Gxpi2:0@(0)'))
        assert len(errs) == 1
        (lbl, coeff), = errs.items()
        # rates are stored in unnormalized-Pauli units: 0.01 / sqrt(2)
        assert lbl.errorgen_type == 'H'
        assert abs(abs(coeff) - 0.01 / np.sqrt(2)) < 1e-12

    def test_conjugation_through_gate(self):
        """H_Z before an X(pi/2) maps to +/-H_Y at the end; verify densely."""
        prop = ErrorGeneratorPropagator.from_errorgen_dict(
            {'Gxpi2': {('H', 'Z'): 0.02}}, 1, (0,))
        c = Circuit('Gxpi2:0Gxpi2:0@(0)')
        # dense truth
        S_true = _dense_noisy_channel(c, {'Gxpi2': {('H', 'Z'): 0.02}}, 1)
        S_approx = prop.approximate_circuit_channel(c, bch_order=2)
        assert np.max(np.abs(S_true - S_approx)) < 5e-4

    def test_2q_propagation_first_order(self):
        gate_errs = {'Gxpi2': {('H', 'Z'): 0.01, ('S', 'X'): 0.002},
                     'Gcnot': {('S', 'ZZ'): 0.005}}
        prop = ErrorGeneratorPropagator.from_errorgen_dict(gate_errs, 2, (0, 1))
        c = Circuit('Gxpi2:0Gcnot:0:1Gxpi2:1Gcnot:0:1@(0,1)')
        S_true = _dense_noisy_channel(c, gate_errs, 2)
        S_approx = prop.approximate_circuit_channel(c, bch_order=1)
        err1 = np.max(np.abs(S_true - S_approx))
        assert err1 < 2e-3, "first-order BCH error too large: %g" % err1

    def test_s_error_sign_invariance(self):
        """S errors keep positive coefficients through propagation (CP)."""
        prop = ErrorGeneratorPropagator.from_errorgen_dict(
            {'Gxpi2': {('S', 'Z'): 0.01}}, 1, (0,))
        for circ in ['Gxpi2:0@(0)', 'Gxpi2:0Gxpi2:0Gxpi2:0@(0)']:
            errs = prop.propagate_errorgens(Circuit(circ))
            assert all(c > 0 for l, c in errs.items() if l.errorgen_type == 'S')

    def test_transform_map_dense_conjugation(self):
        """errorgen_transform_map's (label, phase) pairs match dense
        conjugation by the suffix superop at 2 qubits (reference:
        errorpropagator.errorgen_transform_map:394)."""
        from pygsti_tpu.tools.internalgates import standard_gatename_unitaries
        from pygsti_tpu.errorgenpropagation.errorpropagator import _embed_unitary
        n = 2
        prop = ErrorGeneratorPropagator(num_qubits=n)
        c = Circuit('Gxpi2:0Gcnot:0:1Gzpi2:1Gh:0@(0,1)')
        labels = [ElementaryErrorgenLabel('H', PauliLabel.from_str('ZI')),
                  ElementaryErrorgenLabel('S', PauliLabel.from_str('XY')),
                  ElementaryErrorgenLabel('C', PauliLabel.from_str('XI'),
                                          PauliLabel.from_str('ZZ')),
                  ElementaryErrorgenLabel('A', PauliLabel.from_str('YI'),
                                          PauliLabel.from_str('IZ'))]
        layers = list(c.layertup)
        tmap = prop.errorgen_transform_map(
            c, input_labels_by_layer=[labels] * len(layers))
        assert set(tmap) == {(l, t) for l in labels
                             for t in range(len(layers))}

        std = standard_gatename_unitaries()
        qindex = {q: i for i, q in enumerate(c.line_labels)}
        # dense suffix superops
        layer_supers = []
        for layer in layers:
            comps = layer.components if not layer.is_simple else (layer,)
            u = np.eye(2 ** n, dtype=complex)
            for comp in comps:
                u = _embed_unitary(std[comp.name],
                                   [qindex[q] for q in comp.sslbls], n) @ u
            layer_supers.append(np.real(_ot.unitary_to_pauligate(u)))
        for t in range(len(layers)):
            S_suf = np.eye(4 ** n)
            for s in layer_supers[t + 1:]:
                S_suf = s @ S_suf
            for lbl in labels:
                new_lbl, phase = tmap[(lbl, t)]
                lhs = S_suf @ prop.errorgen_to_dense({lbl: 1.0}) \
                    @ np.linalg.inv(S_suf)
                rhs = phase * prop.errorgen_to_dense({new_lbl: 1.0})
                assert np.max(np.abs(lhs - rhs)) < 1e-10, \
                    "layer %d label %s" % (t, lbl)

    def test_transform_maps_per_layer(self):
        """errorgen_transform_maps splits the flat map by input layer and
        the last layer's map is the identity transform."""
        prop = ErrorGeneratorPropagator.from_errorgen_dict(
            {'Gxpi2': {('H', 'Z'): 0.01}}, 1, (0,))
        c = Circuit('Gxpi2:0Gxpi2:0@(0)')
        maps = prop.errorgen_transform_maps(c)
        assert len(maps) == 2
        flat = prop.errorgen_transform_map(c)
        assert flat == {k: v for m in maps for k, v in m.items()}
        # last layer: identity suffix -> label unchanged, phase +1
        ((lbl, t), (out_lbl, phase)), = maps[-1].items()
        assert t == 1 and out_lbl == lbl and phase == 1

    def test_scales_to_many_qubits(self):
        """Propagation cost is polynomial: works fine at 12 qubits."""
        gate_errs = {'Gxpi2': {('H', 'Z'): 0.001}, 'Gcnot': {('S', 'ZZ'): 0.002}}
        prop = ErrorGeneratorPropagator.from_errorgen_dict(gate_errs, 12,
                                                           tuple(range(12)))
        layers = []
        for i in range(12):
            layers.append(('Gxpi2', i))
        for i in range(11):
            layers.append(('Gcnot', i, i + 1))
        c = Circuit(layers, tuple(range(12)))
        errs = prop.propagate_errorgens(c)
        assert len(errs) >= 12
        assert all(np.isfinite(v) for v in errs.values())


class TestCanonicalization:
    """ADVICE r4: C/A labels canonicalize operand order so mathematically
    equal generators accumulate under one key (C(P,Q)==C(Q,P),
    A(P,Q)==-A(Q,P)); include_spam and input_labels_by_layer are honest."""

    def test_canonical_label_merging(self):
        from pygsti_tpu.errorgenpropagation.errorpropagator import (
            ElementaryErrorgenLabel, PauliLabel, canonicalize_errorgen_label)
        P = PauliLabel.from_str('X')
        Q = PauliLabel.from_str('Z')
        # (x,z)-lex: X=(1,0) sorts after Z=(0,1), so C(X,Z) flips to C(Z,X)
        c1, s1 = canonicalize_errorgen_label(
            ElementaryErrorgenLabel('C', P, Q))
        c2, s2 = canonicalize_errorgen_label(
            ElementaryErrorgenLabel('C', Q, P))
        assert c1 == c2 and s1 == s2 == 1
        a1, s1 = canonicalize_errorgen_label(
            ElementaryErrorgenLabel('A', P, Q))
        a2, s2 = canonicalize_errorgen_label(
            ElementaryErrorgenLabel('A', Q, P))
        assert a1 == a2 and s1 == -s2
        # H/S and already-canonical labels pass through unchanged
        h, sh = canonicalize_errorgen_label(ElementaryErrorgenLabel('H', P))
        assert h == ElementaryErrorgenLabel('H', P) and sh == 1

    def test_include_spam_raises(self):
        from pygsti_tpu.errorgenpropagation.errorpropagator import \
            ErrorGeneratorPropagator
        import pytest
        prop = ErrorGeneratorPropagator.from_errorgen_dict(
            {'Gxpi2': {('H', 'Z'): 0.001}}, 1, (0,))
        c = Circuit([('Gxpi2', 0)], (0,))
        with pytest.raises(NotImplementedError):
            prop.propagate_errorgens(c, include_spam=True)

    def test_input_labels_by_layer_validated(self):
        from pygsti_tpu.errorgenpropagation.errorpropagator import (
            ErrorGeneratorPropagator, ElementaryErrorgenLabel, PauliLabel)
        import pytest
        prop = ErrorGeneratorPropagator.from_errorgen_dict(
            {'Gxpi2': {('H', 'Z'): 0.001}}, 1, (0,))
        c = Circuit([('Gxpi2', 0), ('Gxpi2', 0)], (0,))
        lbl = ElementaryErrorgenLabel('H', PauliLabel.from_str('Z'))
        with pytest.raises(AssertionError):
            prop.errorgen_transform_maps(c, input_labels_by_layer=[[lbl]])
