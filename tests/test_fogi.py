"""Tests for FOGI (first-order gauge-invariant) analysis.

The construction is checked direction-by-direction against the reference
pyGSTi's FirstOrderGaugeInvariantStore on smq1Q_XYI (the VERDICT round-3
done-criterion: FOGI rates on smq1Q_XYI match reference values).
"""

import numpy as np
import pytest

from pygsti_tpu.baseobjs.label import Label
from pygsti_tpu.modelpacks import smq1Q_XYI as mp

ABBREVS = {Label(()): 'I', Label(('Gxpi2', 0)): 'Gx',
           Label(('Gypi2', 0)): 'Gy'}


@pytest.fixture(scope='module')
def hs_model_with_fogi():
    m = mp.target_model('H+s')
    m.setup_fogi(op_label_abbrevs=ABBREVS, include_spam=True)
    return m


class TestFOGIReferenceParity:
    def test_directions_match_reference(self, ref_pygsti):
        """Our FOGI directions/labels equal the reference's column-for-column
        (up to sign) for smq1Q_XYI 'H+s' with SPAM."""
        from pygsti.modelpacks import smq1Q_XYI as ref_std
        from pygsti.baseobjs import Basis as RefBasis
        from pygsti.baseobjs import CompleteElementaryErrorgenBasis as RefCEB

        ref_model = ref_std.target_model('H+s')
        gauge_basis = RefCEB(RefBasis.cast('pp', 4), ref_model.state_space,
                             elementary_errorgen_types=('H', 'S'))
        ref_abbrevs = {(): 'I', ('Gxpi2', 0): 'Gx', ('Gypi2', 0): 'Gy'}
        ref_model.setup_fogi(gauge_basis, None, ref_abbrevs,
                             reparameterize=False,
                             dependent_fogi_action='drop', include_spam=True)
        ref_store = ref_model.fogi_store
        ref_dirs = ref_store.fogi_directions.toarray()
        ref_labels = list(ref_store.fogi_errorgen_direction_labels('normal'))

        m = mp.target_model('H+s')
        store = m.setup_fogi(op_label_abbrevs=ABBREVS, include_spam=True)
        labels = list(store.fogi_errorgen_direction_labels('normal'))

        assert store.num_fogi_directions == ref_store.num_fogi_directions == 18
        assert store.num_fogv_directions == ref_store.num_fogv_directions == 12
        assert labels == ref_labels
        assert store.fogi_directions.shape == ref_dirs.shape
        for j in range(ref_dirs.shape[1]):
            d = min(np.linalg.norm(store.fogi_directions[:, j] - ref_dirs[:, j]),
                    np.linalg.norm(store.fogi_directions[:, j] + ref_dirs[:, j]))
            assert d < 1e-8, "column %d (%s) differs by %g" % (j, labels[j], d)

    def test_components_match_reference(self, ref_pygsti):
        """Setting the same FOGI component vector in both frameworks yields
        the same components back (rates parity)."""
        from pygsti.modelpacks import smq1Q_XYI as ref_std
        from pygsti.baseobjs import Basis as RefBasis
        from pygsti.baseobjs import CompleteElementaryErrorgenBasis as RefCEB

        ref_model = ref_std.target_model('H+s')
        gauge_basis = RefCEB(RefBasis.cast('pp', 4), ref_model.state_space,
                             elementary_errorgen_types=('H', 'S'))
        ref_model.setup_fogi(gauge_basis, None, None, reparameterize=False,
                             dependent_fogi_action='drop', include_spam=True)
        m = mp.target_model('H+s')
        m.setup_fogi(include_spam=True)

        np.random.seed(100)
        ar = 1e-3 * (np.random.rand(18) - 0.5)
        ref_model.set_fogi_errorgen_components_array(ar, include_fogv=False)
        m.set_fogi_errorgen_components_array(ar, include_fogv=False)
        ref_out = ref_model.fogi_errorgen_components_array(include_fogv=False)
        out = m.fogi_errorgen_components_array(include_fogv=False)
        assert np.allclose(out, ref_out, atol=1e-10)
        assert np.allclose(out, ar, atol=1e-10)
        # underlying errorgen vectors agree too
        assert np.allclose(m.fogi_errorgen_vector(normalized_elem_gens=True),
                           ref_model.fogi_errorgen_vector(
                               normalized_elem_gens=True), atol=1e-10)


class TestFOGICounts:
    """Reference test_fogi.py expectations for smq1Q_XYI 'H+s' (30 params):
    13 FOGI of 18 gate params without SPAM; 18 FOGI with SPAM."""

    def test_counts_no_spam(self):
        m = mp.target_model('H+s')
        store = m.setup_fogi(op_label_abbrevs=ABBREVS, include_spam=False)
        assert m.num_params == 30
        assert store.num_fogi_directions == 13

    def test_counts_with_spam(self, hs_model_with_fogi):
        store = hs_model_with_fogi.fogi_store
        assert store.num_fogi_directions == 18
        assert store.num_fogv_directions == 12
        assert store.errorgen_space_dim == 30

    def test_label_types(self, hs_model_with_fogi):
        m = hs_model_with_fogi
        normal = m.fogi_errorgen_component_labels(typ='normal')
        raw = m.fogi_errorgen_component_labels(typ='raw')
        abbrev = m.fogi_errorgen_component_labels(typ='abbrev')
        assert len(normal) == len(raw) == len(abbrev) == 18
        assert 'H(X:0)_Gx' in normal
        assert any(l.startswith('ga(') for l in normal)  # relational names
        both = m.fogi_errorgen_component_labels(include_fogv=True)
        assert len(both) == 30


class TestFOGIComponents:
    def test_set_get_roundtrip(self):
        m = mp.target_model('H+s')
        m.setup_fogi(op_label_abbrevs=ABBREVS, include_spam=True)
        np.random.seed(5)
        ar = 1e-3 * (np.random.rand(18) - 0.5)
        m.set_fogi_errorgen_components_array(ar, include_fogv=False)
        assert np.allclose(m.fogi_errorgen_components_array(), ar, atol=1e-12)

    def test_unit_components_fogiv(self):
        """Setting each FOGI+FOGV component individually round-trips
        (reference test_fogi.py:70-78)."""
        m = mp.target_model('H+s')
        m.setup_fogi(op_label_abbrevs=ABBREVS, include_spam=True)
        N = len(m.fogi_errorgen_component_labels(include_fogv=True))
        for i in range(0, N, 5):  # sample every 5th for speed
            ar = np.zeros(N)
            ar[i] = 1.0
            m.set_fogi_errorgen_components_array(ar, include_fogv=True)
            ar2 = m.fogi_errorgen_components_array(include_fogv=True)
            assert np.allclose(ar, ar2, atol=1e-8), i

    def test_gauge_perturbation_invariance(self, hs_model_with_fogi):
        """FOGI components are exactly invariant under first-order gauge
        shifts of the errorgen vector (e -> e + gauge_action @ delta)."""
        store = hs_model_with_fogi.fogi_store
        rng = np.random.RandomState(0)
        delta = rng.randn(store.allop_gauge_action.shape[1])
        shift = store.allop_gauge_action @ delta
        assert np.linalg.norm(shift) > 1e-6  # the gauge moves raw coeffs...
        comp_shift = store.errorgen_vec_to_fogi_components_array(shift)
        assert np.max(np.abs(comp_shift)) < 1e-10  # ...but not FOGI comps
        # FOGV components DO change
        fogv_shift = store.errorgen_vec_to_fogv_components_array(shift)
        assert np.max(np.abs(fogv_shift)) > 1e-8


class TestFOGIReparameterize:
    def test_reparam_with_spam(self):
        m = mp.target_model('H+s')
        assert m.num_params == 30
        m.setup_fogi(op_label_abbrevs=ABBREVS, include_spam=True,
                     reparameterize=True)
        assert m.num_params == 18  # 18 FOGI params (gauge dropped)
        w = 1e-3 * np.random.RandomState(3).rand(18)
        m.from_vector(w)
        assert np.allclose(m.to_vector(), w, atol=1e-12)
        # simulation works through the interposer
        from pygsti_tpu.circuits.circuit import Circuit
        p = m.probabilities(Circuit([Label('Gxpi2', 0)], (0,)))
        assert abs(sum(p.values()) - 1.0) < 1e-9

    def test_reparam_no_spam(self):
        m = mp.target_model('H+s')
        m.setup_fogi(op_label_abbrevs=ABBREVS, include_spam=False,
                     reparameterize=True)
        assert m.num_params == 25  # 12 SPAM params + 13 FOGI


class TestFOGIAggregates:
    def test_binned_infos(self, hs_model_with_fogi):
        store = hs_model_with_fogi.fogi_store
        bins = store.create_binned_fogi_infos()
        total = sum(len(lst) for by_type in bins.values()
                    for by_tgt in by_type.values()
                    for lst in by_tgt.values())
        assert total == store.num_fogi_directions
        # single-op (intrinsic) bins exist for each gate
        assert (Label(('Gxpi2', 0)),) in bins

    def test_fogi_contribution(self):
        m = mp.target_model('H+s')
        m.setup_fogi(op_label_abbrevs=ABBREVS, include_spam=True)
        # give Gx an intrinsic S(X) rate of 1e-3
        labels = m.fogi_errorgen_component_labels()
        ar = np.zeros(18)
        ar[labels.index('S(X:0)_Gx')] = 1e-3
        m.set_fogi_errorgen_components_array(ar)
        gx = Label(('Gxpi2', 0))
        s_intr = m.fogi_contribution(gx, 'S', 'intrinsic')
        assert abs(s_intr - 1e-3) < 1e-6
        assert m.fogi_contribution(gx, 'H', 'intrinsic') < 1e-9
        tot = m.fogi_contribution(gx, 'fogi_total_error', 'intrinsic')
        assert abs(tot - 1e-3) < 1e-6


class TestFOGIDiagram:
    def test_render(self, tmp_path):
        from pygsti_tpu.report.fogidiagram import FOGIDiagram
        m = mp.target_model('H+s')
        m.setup_fogi(op_label_abbrevs=ABBREVS, include_spam=True)
        np.random.seed(7)
        m.set_fogi_errorgen_components_array(
            1e-3 * (np.random.rand(18) - 0.5))
        diag = FOGIDiagram(m)
        rows = diag.rates_table()
        assert rows and abs(rows[0][1]) >= abs(rows[-1][1])
        html = diag.render_html()
        assert 'FOGI error rates' in html and 'intrinsic' in html
        p = tmp_path / "fogi.html"
        diag.write_html(str(p))
        assert p.exists()
