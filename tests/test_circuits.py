"""Tests for Circuit and the circuit-string parser, incl. parity vs reference."""

import numpy as np
import pytest

from pygsti_tpu.baseobjs import Label
from pygsti_tpu.circuits import Circuit, parse_circuit_str


class TestCircuit:
    def test_from_labels(self):
        c = Circuit([Label('Gxpi2', 0), Label('Gypi2', 0)])
        assert c.depth == 2
        assert c.line_labels == (0,)
        assert c.str == 'Gxpi2:0Gypi2:0@(0)'

    def test_from_string(self):
        c = Circuit('Gxpi2:0Gypi2:0@(0)')
        assert c.depth == 2
        assert c[0] == ('Gxpi2', 0)
        assert c.line_labels == (0,)

    def test_empty_circuit(self):
        c = Circuit('{}@(0)')
        assert c.depth == 0
        assert c.line_labels == (0,)
        assert c.str == '{}@(0)'

    def test_empty_layer(self):
        c = Circuit('[]@(0)')
        assert c.depth == 1
        assert c[0] == ()
        assert str(c[0]) == '[]'

    def test_parallel_layer(self):
        c = Circuit('[Gxpi2:0Gypi2:1]@(0,1)')
        assert c.depth == 1
        assert len(c[0].components) == 2
        assert c.str == '[Gxpi2:0Gypi2:1]@(0,1)'

    def test_repetition(self):
        c = Circuit('(Gxpi2:0Gypi2:0)^2@(0)')
        assert c.depth == 4
        assert c[2] == ('Gxpi2', 0)
        c2 = Circuit('Gxpi2:0^3@(0)')
        assert c2.depth == 3

    def test_add_and_pow(self):
        a = Circuit('Gxpi2:0@(0)')
        b = Circuit('Gypi2:0@(0)')
        assert (a + b).str == 'Gxpi2:0Gypi2:0@(0)'
        assert (a ** 3).depth == 3

    def test_hash_eq(self):
        a = Circuit('Gxpi2:0Gypi2:0@(0)')
        b = Circuit([('Gxpi2', 0), ('Gypi2', 0)], line_labels=(0,))
        assert a == b and hash(a) == hash(b)
        d = {a: 1}
        assert d[b] == 1

    def test_two_qubit_gate(self):
        c = Circuit('Gcnot:0:1@(0,1)')
        assert c[0] == ('Gcnot', 0, 1)

    def test_roundtrip_strings(self):
        for s in ['{}@(0)', '[]@(0)', 'Gxpi2:0@(0)', 'Gxpi2:0Gxpi2:0Gypi2:0@(0)',
                  '[Gxpi2:0Gypi2:1]Gcnot:0:1@(0,1)']:
            assert Circuit(s).str == s


class TestParserParity:
    """Parse the same strings as the reference and compare layer structure."""

    STRINGS = ['{}@(0)', '[]@(0)', 'Gxpi2:0@(0)', 'Gxpi2:0Gypi2:0@(0)',
               '(Gxpi2:0Gypi2:0)^2@(0)', 'Gxpi2:0^4@(0)',
               '[Gxpi2:0Gypi2:1]@(0,1)', 'Gcnot:0:1@(0,1)']

    @pytest.mark.parametrize("s", STRINGS)
    def test_layers_match(self, ref_pygsti, s):
        ref_c = ref_pygsti.circuits.Circuit(s)
        my_c = Circuit(s)
        assert my_c.depth == ref_c.depth, s
        assert my_c.str == ref_c.str, s
        for my_l, ref_l in zip(my_c, ref_c.layertup):
            assert str(my_l) == str(ref_l), s

    def test_germ_fiducial_strings(self, ref_pygsti):
        """All smq1Q_XYI pack circuit strings parse identically."""
        from pygsti.modelpacks import smq1Q_XYI as mp
        for c in list(mp.germs()) + list(mp.prep_fiducials()) + list(mp.meas_fiducials()):
            mine = Circuit(c.str)
            assert mine.str == c.str
            assert mine.depth == c.depth


class TestCircuitStructure:
    def test_lsgst_structs_plaquettes(self):
        """make_lsgst_structs returns plaquette grids with LGST empty-germ
        plaquette first (reference: gstcircuits.py:527-575)."""
        from pygsti_tpu.modelpacks import smq1Q_XYI as mp
        from pygsti_tpu.circuits.gstcircuits import make_lsgst_structs
        from pygsti_tpu.circuits.circuitstructure import (
            PlaquetteGridCircuitStructure, GermFiducialPairPlaquette)
        structs = make_lsgst_structs(mp.target_model('static'),
                                     mp.prep_fiducials(), mp.meas_fiducials(),
                                     mp.germs(), [1, 2, 4])
        st = structs[-1]
        assert isinstance(st, PlaquetteGridCircuitStructure)
        assert st.xs == [1, 2, 4] and len(st.ys) == len(mp.germs()) + 1
        keys = list(st.plaquettes.keys())
        assert keys[0][0] == 1 and keys[0][1].depth == 0  # empty-germ LGST plaq
        p = st.plaquettes[keys[0]]
        assert isinstance(p, GermFiducialPairPlaquette)
        assert len(p) == len(mp.prep_fiducials()) * len(mp.meas_fiducials())
        # every circuit in a plaquette appears in the struct's circuit list
        all_circuits = set(st)
        for plaq in st.plaquettes.values():
            for c in plaq.circuits:
                assert c in all_circuits
        # truncation keeps structure consistent
        st2 = st.truncate(xs_to_keep=[1, 2])
        assert st2.xs == [1, 2] and len(st2) < len(st)


class TestReferenceCircuitCorpus:
    """Golden-corpus behavioral test: parse the reference's ~23k-circuit
    fingerprint corpus and check circuit semantics (depth, length,
    line labels, string round-trip, concatenation) against the committed
    fingerprints (reference: test/performance/circuit_corpus.py,
    circuit_corpus_baseline.jsonl.gz)."""

    CORPUS = "/root/reference/test/performance/circuit_corpus_baseline.jsonl.gz"

    def _iter_sample(self, stride=20):
        import ast
        import gzip
        import json
        import os
        if not os.path.exists(self.CORPUS):
            pytest.skip("reference corpus not available")
        with gzip.open(self.CORPUS, "rt") as f:
            for i, line in enumerate(f):
                if i % stride:
                    continue
                d = json.loads(line)
                fp = d["fp"]
                if isinstance(fp, str):
                    fp = ast.literal_eval(fp)
                    fp = {k: ast.literal_eval(v) if isinstance(v, str)
                          and v[:1] in "'\"(" else v for k, v in fp.items()}
                yield d["src"], fp

    def test_corpus_semantics(self):
        import ast
        from pygsti_tpu.circuits import Circuit
        n_checked = 0
        for src, fp in self._iter_sample():
            s = fp["str"]
            if isinstance(s, str) and s.startswith("'"):
                s = ast.literal_eval(s)
            c = Circuit(s)
            assert c.depth == int(fp["depth"]), \
                "depth mismatch for %r: %d != %s" % (s, c.depth, fp["depth"])
            assert len(c) == int(fp["len"]), \
                "len mismatch for %r" % s
            lls = fp["line_labels"]
            if isinstance(lls, str):
                lls = ast.literal_eval(lls)
            assert tuple(c.line_labels) == tuple(lls), \
                "line_labels mismatch for %r: %s != %s" % (
                    s, c.line_labels, lls)
            # round-trip through OUR string form
            c2 = Circuit(c.str)
            assert c2 == c and c2.depth == c.depth, \
                "string round-trip failed for %r -> %r" % (s, c.str)
            # concatenation semantics vs the reference's concat string
            if "concat_str" in fp:
                cs = fp["concat_str"]
                if isinstance(cs, str) and cs.startswith("'"):
                    cs = ast.literal_eval(cs)
                cc_ref = Circuit(cs)
                cc = c + c
                assert cc == cc_ref and cc.depth == 2 * c.depth, \
                    "concat mismatch for %r" % s
            n_checked += 1
        assert n_checked > 1000, "corpus sample too small (%d)" % n_checked


class TestCircuitManipulation:
    def test_editing_methods(self):
        from pygsti_tpu.circuits import Circuit
        c = Circuit([('Gxpi2', 0), ('Gypi2', 1), ('Gcnot', 0, 1)],
                    line_labels=(0, 1))
        assert c.num_gates == 3
        assert c.num_multiq_gates == 1
        assert c.num_nq_gates(1) == 2
        c2 = c.insert_layer(('Gzpi2', 0), 1)
        assert c2.depth == 4 and c2.layer(1).name == 'Gzpi2'
        assert c2.delete_layers(1) == c
        r = c.replace_gatename('Gxpi2', 'Gzpi2')
        assert r.layer(0).name == 'Gzpi2' and r.layer(0).sslbls == (0,)
        assert c.append_circuit(c).depth == 6
        assert c.prefix_circuit(c) == c + c

    def test_idling_and_parallelize(self):
        from pygsti_tpu.circuits import Circuit
        c = Circuit([('Gxpi2', 0), ('Gypi2', 1)], line_labels=(0, 1, 2))
        assert c.idling_lines() == (2,)
        assert c.delete_idling_lines().line_labels == (0, 1)
        # parallelize: the two 1Q gates on different qubits share a layer
        p = c.parallelize()
        assert p.depth == 1 and len(p.layer(0).components) == 2
        # gates on the same qubit stay ordered
        c3 = Circuit([('Gxpi2', 0), ('Gypi2', 0)], line_labels=(0,))
        assert c3.parallelize().depth == 2
        # idle layers removable
        c4 = Circuit("Gxpi2:0[]Gypi2:0@(0)")
        assert c4.depth == 3 and c4.delete_idle_layers().depth == 2

    def test_openqasm_conversion(self):
        from pygsti_tpu.circuits import Circuit
        c = Circuit([('Gxpi', 0), ('Gcnot', 0, 1), ('Gh', 1)],
                    line_labels=(0, 1))
        qasm = c.convert_to_openqasm()
        assert 'OPENQASM 2.0' in qasm
        assert 'x q[0];' in qasm and 'cx q[0], q[1];' in qasm \
            and 'h q[1];' in qasm
        assert 'measure' in qasm


class TestCircuitConstruction:
    def test_enumeration(self):
        from pygsti_tpu.circuits.circuitconstruction import (
            list_all_circuits, list_all_circuits_without_powers_and_cycles,
            translate_circuit, list_partial_circuits,
            repeat_count_with_max_length)
        from pygsti_tpu.baseobjs.label import Label
        from pygsti_tpu.circuits import Circuit
        ops = [Label('Gx'), Label('Gy')]
        all2 = list_all_circuits(ops, 1, 2)
        assert len(all2) == 2 + 4
        germs = list_all_circuits_without_powers_and_cycles(ops, 2)
        # length-1: Gx, Gy; length-2: GxGy only (GyGx is a rotation,
        # GxGx/GyGy are powers)
        assert len(germs) == 3
        c = Circuit([Label('Ga')])
        t = translate_circuit(c, {Label('Ga'): (Label('Gx'), Label('Gy'))})
        assert t.depth == 2
        assert len(list_partial_circuits(all2[2])) == 3
        assert repeat_count_with_max_length(all2[2], 7) == 3


class TestSubcircuitSelection:
    def test_sampling(self):
        import numpy as np
        from pygsti_tpu.circuits import Circuit
        from pygsti_tpu.circuits.subcircuit_selection import (
            sample_subcircuits, restrict_circuit)
        layers = []
        rng = np.random.RandomState(0)
        for _ in range(8):
            q = rng.randint(4)
            layers.append(('Gxpi2', q))
        full = Circuit(layers, line_labels=(0, 1, 2, 3))
        sub = restrict_circuit(full, (0, 1), (2, 6))
        assert sub.depth == 4 and sub.line_labels == (0, 1)
        out = sample_subcircuits(full, widths=(2,), depths=(3,),
                                 num_samples_per_shape=2, seed=1)
        assert len(out[(2, 3)]) == 2
        for c in out[(2, 3)]:
            assert c.depth == 3 and c.num_lines == 2
        edges = [(0, 1), (1, 2), (2, 3)]
        out2 = sample_subcircuits(full, widths=(3,), depths=(2,),
                                  graph_edges=edges, seed=2)
        for c in out2[(3, 2)]:
            assert c.num_lines == 3


class TestKeepFraction:
    """Round-5: keep_fraction/keep_seed random per-(germ, L) pair reduction
    (reference gstcircuits:172-233) is now implemented."""

    def test_keep_fraction_reduces_and_is_deterministic(self):
        from pygsti_tpu.modelpacks import smq1Q_XYI as mp
        from pygsti_tpu.circuits.gstcircuits import create_lsgst_circuit_lists
        t = mp.target_model('full TP')
        full = create_lsgst_circuit_lists(t, mp.prep_fiducials(),
                                          mp.meas_fiducials(), mp.germs(),
                                          [1, 2, 4])
        half = create_lsgst_circuit_lists(t, mp.prep_fiducials(),
                                          mp.meas_fiducials(), mp.germs(),
                                          [1, 2, 4], keep_fraction=0.5,
                                          keep_seed=7)
        assert len(half[-1]) < len(full[-1])
        again = create_lsgst_circuit_lists(t, mp.prep_fiducials(),
                                           mp.meas_fiducials(), mp.germs(),
                                           [1, 2, 4], keep_fraction=0.5,
                                           keep_seed=7)
        assert list(again[-1]) == list(half[-1])
        # all reduced circuits exist in the full design
        assert set(half[-1]) <= set(full[-1])

    def test_keep_fraction_keeps_explicit_pairs(self):
        from pygsti_tpu.modelpacks import smq1Q_XYI as mp
        from pygsti_tpu.circuits.gstcircuits import create_lsgst_circuit_lists
        t = mp.target_model('full TP')
        pairs = [(0, 0), (1, 1)]
        red = create_lsgst_circuit_lists(t, mp.prep_fiducials(),
                                         mp.meas_fiducials(), mp.germs(),
                                         [1], fid_pairs=pairs,
                                         keep_fraction=0.3, keep_seed=3)
        preps, meas = mp.prep_fiducials(), mp.meas_fiducials()
        germ = mp.germs()[1]
        circs = set(red[-1])
        for (i, j) in pairs:
            assert preps[i] + germ + meas[j] in circs
