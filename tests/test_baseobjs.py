"""Tests for labels, state spaces and bases — including parity vs the reference."""

import numpy as np
import pytest

from pygsti_tpu.baseobjs import Label, QubitSpace, ExplicitStateSpace, Basis, BuiltinBasis
from pygsti_tpu.baseobjs.basis import TensorProdBasis


class TestLabel:
    def test_simple_label(self):
        l = Label('Gxpi2', 0)
        assert l.name == 'Gxpi2'
        assert l.sslbls == (0,)
        assert str(l) == 'Gxpi2:0'
        assert l == ('Gxpi2', 0)
        assert hash(l) == hash(('Gxpi2', 0))

    def test_str_label(self):
        l = Label('rho0')
        assert l.name == 'rho0'
        assert l.sslbls is None
        assert l == 'rho0'

    def test_empty_layer(self):
        l = Label(())
        assert str(l) == '[]'
        assert l.components == ()
        assert l == ()

    def test_composite(self):
        l = Label([('Gxpi2', 0), ('Gypi2', 1)])
        assert len(l.components) == 2
        assert l.components[0] == ('Gxpi2', 0)
        assert l.sslbls == (0, 1)
        assert str(l) == '[Gxpi2:0Gypi2:1]'

    def test_tuple_init(self):
        l = Label(('Gcnot', 0, 1))
        assert l.name == 'Gcnot'
        assert l.sslbls == (0, 1)

    def test_dict_key(self):
        d = {Label('Gxpi2', 0): 1}
        assert d[('Gxpi2', 0)] == 1
        assert d[Label(('Gxpi2', 0))] == 1


class TestStateSpace:
    def test_qubit_space(self):
        ss = QubitSpace(2)
        assert ss.udim == 4
        assert ss.dim == 16
        assert ss.num_qubits == 2
        assert ss.qubit_labels == (0, 1)

    def test_explicit(self):
        ss = ExplicitStateSpace(('Q0',))
        assert ss.udim == 2 and ss.dim == 4


class TestBasis:
    def test_pp_1q(self):
        b = BuiltinBasis('pp', 4)
        els = b.elements
        assert els.shape == (4, 2, 2)
        # orthonormality
        g = np.einsum('aij,bij->ab', els.conj(), els)
        assert np.allclose(g, np.eye(4))
        # first element = I/sqrt(2)
        assert np.allclose(els[0], np.eye(2) / np.sqrt(2))

    def test_pp_labels(self):
        assert BuiltinBasis('pp', 4).labels == ['I', 'X', 'Y', 'Z']
        assert BuiltinBasis('pp', 16).labels[:5] == ['II', 'IX', 'IY', 'IZ', 'XI']

    def test_gm_orthonormal(self):
        for d2 in (4, 9, 16):
            b = BuiltinBasis('gm', d2)
            assert b.is_normalized()

    def test_std(self):
        b = BuiltinBasis('std', 4)
        assert np.allclose(b.elements[1], [[0, 1], [0, 0]])

    def test_transform_roundtrip(self):
        pp = BuiltinBasis('pp', 16)
        M = pp.create_transform_matrix('std')
        Minv = BuiltinBasis('std', 16).create_transform_matrix(pp)
        assert np.allclose(M @ Minv, np.eye(16))

    def test_tensorprod(self):
        tb = TensorProdBasis([BuiltinBasis('pp', 4), BuiltinBasis('pp', 4)])
        b2 = BuiltinBasis('pp', 16)
        assert np.allclose(tb.elements, b2.elements)


class TestBasisParity:
    """Element-wise parity with the reference's basis constructors."""

    @pytest.mark.parametrize("name,dim", [('pp', 4), ('pp', 16), ('gm', 4),
                                          ('gm', 9), ('std', 4), ('std', 16)])
    def test_elements_match(self, ref_pygsti, name, dim):
        ref_basis = ref_pygsti.baseobjs.Basis.cast(name, dim)
        mine = BuiltinBasis(name, dim)
        ref_els = np.array([e for e in ref_basis.elements])
        assert np.allclose(ref_els, mine.elements), "basis %s dim %d mismatch" % (name, dim)


class TestErrorgenLabelsAndBasis:
    def test_label_conversions(self):
        from pygsti_tpu.baseobjs.errorgenlabel import (
            LocalElementaryErrorgenLabel, GlobalElementaryErrorgenLabel)
        loc = LocalElementaryErrorgenLabel('S', ('IXI',))
        assert loc.support_indices() == (1,)
        glob = GlobalElementaryErrorgenLabel.cast(loc, (0, 1, 2))
        assert glob.sslbls == (1,) and glob.basis_element_labels == ('X',)
        back = LocalElementaryErrorgenLabel.cast(glob, (0, 1, 2))
        assert back == loc
        ca = LocalElementaryErrorgenLabel('C', ('XI', 'IZ'))
        g2 = GlobalElementaryErrorgenLabel.cast(ca, ('Q0', 'Q1'))
        assert g2.sslbls == ('Q0', 'Q1')

    def test_complete_basis(self):
        import numpy as np
        from pygsti_tpu.baseobjs.errorgenbasis import (
            CompleteElementaryErrorgenBasis)
        b = CompleteElementaryErrorgenBasis(num_qubits=1)
        # 1Q: 3 H + 3 S + 3 C + 3 A = 12
        assert len(b) == 12
        b2 = CompleteElementaryErrorgenBasis(
            num_qubits=2, elementary_errorgen_types=('H', 'S'),
            max_ham_weight=1, max_other_weight=1)
        assert len(b2) == 12  # 6 weight-1 paulis x (H, S)
        mats = b.elemgen_matrices('pp')
        assert len(mats) == 12 and mats[0].shape == (4, 4)
        # H(Z) generator acts nontrivially
        assert np.linalg.norm(mats[2]) > 0
        sub = b2.create_subbasis([0])
        assert all(0 in l.support_indices() for l in sub.labels)


class TestErrorgenSpace:
    def test_intersection_union(self):
        import numpy as np
        from pygsti_tpu.baseobjs.errorgenbasis import CompleteElementaryErrorgenBasis
        from pygsti_tpu.baseobjs.errorgenspace import ErrorgenSpace
        b = CompleteElementaryErrorgenBasis(num_qubits=1,
                                            elementary_errorgen_types=('H', 'S'))
        n = len(b)
        e = np.eye(n)
        A = ErrorgenSpace(e[:, :3], b)    # span(e0,e1,e2)
        B = ErrorgenSpace(e[:, 2:5], b)   # span(e2,e3,e4)
        inter = A.intersection(B)
        assert inter.vectors.shape[1] == 1
        v = inter.vectors[:, 0] / np.linalg.norm(inter.vectors[:, 0])
        assert abs(abs(v[2]) - 1.0) < 1e-9
        uni = A.union(B)
        assert uni.vectors.shape[1] == 5
        A.normalize()
        assert np.allclose(np.linalg.norm(A.vectors, axis=0), 1.0)
