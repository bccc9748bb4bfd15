"""Tests for FOGI (first-order gauge-invariant) analysis."""

import numpy as np
import pytest

from pygsti_tpu.baseobjs.basis import Basis
from pygsti_tpu.modelpacks import smq1Q_XYI as mp
from pygsti_tpu.tools.fogitools import (FOGIStore, compute_gauge_action_matrix,
                                        compute_fogi_directions)
from pygsti_tpu.models.gaugegroup import UnitaryGaugeGroup


@pytest.fixture(scope='module')
def store():
    target = mp.target_model('static')
    target_ops = {lbl: op.to_dense() for lbl, op in target.operations.items()}
    rho0 = target.preps['rho0'].to_dense()
    effects = target.povms['Mdefault'].to_dense()
    return FOGIStore(target_ops, Basis.cast('pp', 4), rho0_vec=rho0,
                     effect_stack=effects)


class TestFOGI:
    def test_counts(self, store):
        """n_fogi = n_coeffs - rank(gauge action) > 0 and < n_coeffs."""
        n_total = len(store.errorgen_space_labels)
        n_fogi = store.num_fogi_quantities
        assert 0 < n_fogi < n_total
        # 1Q H+S: 6 coeffs/op x 3 ops + 12 SPAM = 30 coeffs; 6 gauge dirs
        assert n_total == 30
        assert n_fogi >= n_total - 6

    def test_directions_annihilate_gauge(self, store):
        target = mp.target_model('static')
        target_ops = {lbl: op.to_dense() for lbl, op in target.operations.items()}
        M, _, _ = compute_gauge_action_matrix(
            target_ops, Basis.cast('pp', 4),
            rho0_vec=target.preps['rho0'].to_dense(),
            effect_stack=target.povms['Mdefault'].to_dense())
        assert np.max(np.abs(store.fogi_directions @ M)) < 1e-8

    def test_fogi_rates_gauge_invariant(self, store):
        """Gauge-transforming a noisy model changes FOGI rates only at
        second order in the gauge strength."""
        noisy = mp.target_model('full').depolarize(op_noise=0.02)
        base_rates = store.fogi_errorgen_rates(noisy)

        gg = UnitaryGaugeGroup(noisy.state_space, noisy.basis)
        eps = 1e-4
        x = gg.initial_params()
        x[1] += eps  # a small unitary gauge rotation
        el = gg.compute_element(x)
        gauged = noisy.copy()
        gauged.transform_inplace(el)
        gauged_rates = store.fogi_errorgen_rates(gauged)

        # FOGI rates: invariant to first order
        fogi_change = np.max(np.abs(gauged_rates - base_rates))
        assert fogi_change < 10 * eps ** 2 + 1e-9, fogi_change

        # sanity: NON-invariant quantities (raw coefficients) change at O(eps)
        raw_change = np.max(np.abs(store.errorgen_vector(gauged)
                                   - store.errorgen_vector(noisy)))
        assert raw_change > eps / 10


class TestFOGIModelAPI:
    def test_model_fogi_api(self):
        """setup_fogi + components/labels/contribution on a noisy model."""
        target = mp.target_model('static')
        noisy = mp.target_model('full TP').depolarize(op_noise=0.02)
        noisy.setup_fogi(target_model=target)
        labels = noisy.fogi_errorgen_component_labels()
        comps = noisy.fogi_errorgen_components_array()
        assert len(labels) == len(comps) == noisy.fogi_store.num_fogi_quantities
        assert all(isinstance(s, str) and s for s in labels)
        # depolarization is gauge-invariant noise: some components nonzero
        assert np.max(np.abs(comps)) > 1e-4
        # contribution query runs and is nonnegative
        c = noisy.fogi_contribution(('Gxpi2', 0), 'S', 'intrinsic')
        assert c >= 0

    def test_intrinsic_relational_partition(self, store):
        kinds = [store.fogi_quantity_is_intrinsic(k)
                 for k in range(store.num_fogi_quantities)]
        # both kinds exist for the XYI gate set
        assert any(kinds) and not all(kinds)

    def test_labels_nonempty(self, store):
        for s in store.fogi_quantity_labels():
            assert s and s != "(null)"


class TestFOGIDiagram:
    def test_render(self, tmp_path):
        from pygsti_tpu.report.fogidiagram import FOGIDiagram
        target = mp.target_model('static')
        noisy = mp.target_model('full TP').depolarize(op_noise=0.02)
        noisy.setup_fogi(target_model=target)
        diag = FOGIDiagram(noisy)
        rows = diag.rates_table()
        assert rows and abs(rows[0][1]) >= abs(rows[-1][1])
        html = diag.render_html()
        assert 'FOGI error rates' in html and 'intrinsic' in html
        p = tmp_path / "fogi.html"
        diag.write_html(str(p))
        assert p.exists()
