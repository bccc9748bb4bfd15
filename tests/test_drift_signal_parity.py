"""Parity of extras.drift.signal's user-facing surface vs the reference
(reference: pygsti/extras/drift/signal.py:26-820).

Covers the deterministic transforms and statistics; `lsp` is excluded
(the reference delegates to astropy, unavailable here -- ours is a native
Zechmeister-Kuerster floating-mean implementation, unit-checked in
test_drift_depth.py).
"""

import numpy as np
import pytest

from pygsti_tpu.extras.drift import signal as sig


@pytest.fixture(scope="module")
def ref_signal(ref_pygsti):
    # the reference's drift package imports plotly at module scope; stub it
    import sys
    import types
    added = []
    if 'plotly' not in sys.modules:
        plotly = types.ModuleType('plotly')
        graph_objs = types.ModuleType('plotly.graph_objs')
        graph_objs.__getattr__ = lambda name: type(name, (), {})
        tools = types.ModuleType('plotly.tools')
        plotly.graph_objs = graph_objs
        plotly.tools = tools
        sys.modules['plotly'] = plotly
        sys.modules['plotly.graph_objs'] = graph_objs
        sys.modules['plotly.tools'] = tools
        added = ['plotly', 'plotly.graph_objs', 'plotly.tools']
    try:
        from pygsti.extras.drift import signal as ref_sig
        yield ref_sig
    finally:
        for m in added:
            sys.modules.pop(m, None)


@pytest.fixture(scope="module")
def clickstream():
    rng = np.random.RandomState(7)
    return (rng.rand(128) < 0.42).astype(float)


def test_standardizer_parity(ref_signal, clickstream):
    x = clickstream
    ours = sig.standardizer(x)
    ref = ref_signal.standardizer(x)
    assert np.allclose(ours, ref)
    p0 = np.full(len(x), 0.4)
    assert np.allclose(sig.standardizer(x, p0), ref_signal.standardizer(x, p0))
    z = sig.standardizer(x, p0)
    assert np.allclose(sig.unstandardizer(z, p0), ref_signal.unstandardizer(z, p0))
    assert np.allclose(sig.unstandardizer(z, p0), x)


def test_dct_idct_parity(ref_signal, clickstream):
    x = clickstream
    assert np.allclose(sig.dct(x), ref_signal.dct(x))
    p0 = np.full(len(x), 0.45)
    modes = sig.dct(x, p0)
    assert np.allclose(modes, ref_signal.dct(x, p0))
    assert np.allclose(sig.idct(modes, p0), ref_signal.idct(modes, p0))
    assert np.allclose(sig.idct(modes, p0), x)


def test_dft_idft_parity(ref_signal, clickstream):
    x = clickstream
    ours = sig.dft(x)
    ref = ref_signal.dft(x)
    assert np.allclose(ours, ref)
    p0 = np.full(len(x), 0.45)
    modes = sig.dft(x, p0)
    assert np.allclose(sig.idft(modes, p0), ref_signal.idft(modes, p0))


def test_spectrum_parity(ref_signal, clickstream):
    x = clickstream
    times = np.arange(len(x), dtype=float)
    f_r, m_r, p_r = ref_signal.spectrum(x, times=times, transform='dct')
    f_o, m_o, p_o = sig.spectrum(x, times=times, transform='dct')
    assert np.allclose(p_o, p_r) and np.allclose(m_o, m_r)
    assert np.allclose(f_o, f_r)
    m_r, p_r = ref_signal.spectrum(x, transform='dft', returnfrequencies=False)
    m_o, p_o = sig.spectrum(x, transform='dft', returnfrequencies=False)
    assert np.allclose(p_o, p_r)


def test_bartlett_spectrum_parity(ref_signal, clickstream):
    x = clickstream
    ours = sig.bartlett_spectrum(x, 4)
    ref = ref_signal.bartlett_spectrum(x, 4)
    assert np.allclose(ours, ref)


def test_threshold_and_pvalue_parity(ref_signal):
    for args in [(0.05, 100, 1), (0.01, 7, 2)]:
        assert np.isclose(sig.power_significance_threshold(*args),
                          ref_signal.power_significance_threshold(*args))
    assert np.isclose(sig.power_to_pvalue(8.3, 1),
                      ref_signal.power_to_pvalue(8.3, 1))
    assert np.isclose(sig.maxpower_pvalue(11.0, 128, 1),
                      ref_signal.maxpower_pvalue(11.0, 128, 1))


def test_frequencies_parity(ref_signal):
    assert np.allclose(sig.frequencies_from_timestep(0.1, 64),
                       ref_signal.frequencies_from_timestep(0.1, 64))
    times = np.cumsum(np.full(32, 2.5)) + 10
    assert np.allclose(sig.fourier_frequencies_from_times(times),
                       ref_signal.fourier_frequencies_from_times(times))


def test_amplitudes_at_frequencies_parity(ref_signal, clickstream):
    x = clickstream
    ts = {'0': x, '1': 1.0 - x}
    ours = sig.amplitudes_at_frequencies([1, 3, 5], ts, transform='dct')
    ref = ref_signal.amplitudes_at_frequencies([1, 3, 5], ts, transform='dct')
    for o in ts:
        assert np.allclose(ours[o], ref[o])


def test_filters_parity(ref_signal, clickstream):
    x = clickstream
    assert np.allclose(sig.lowpass_filter(x, max_freq=10),
                       ref_signal.lowpass_filter(x, max_freq=10))
    assert np.allclose(sig.moving_average(x, width=11),
                       ref_signal.moving_average(x, width=11))


def test_renormalizer_parity(ref_signal):
    p = np.linspace(-0.4, 1.3, 50)
    for method in ('logistic', 'sharp'):
        assert np.allclose(sig.renormalizer(p, method=method),
                           ref_signal.renormalizer(p, method=method))
    assert np.isclose(sig.sparsity(np.array([0.5, 0.25, 0.25])),
                      ref_signal.sparsity(np.array([0.5, 0.25, 0.25])))


def test_generate_signals_parity(ref_signal):
    # seeded: both implementations draw from np.random's global state
    np.random.seed(11)
    ours = sig.generate_flat_signal(1.5, 4, 100, base=0.5, method='sharp')
    np.random.seed(11)
    ref = ref_signal.generate_flat_signal(1.5, 4, 100, base=0.5, method='sharp')
    assert np.allclose(ours, ref)
    np.random.seed(12)
    ours = sig.generate_gaussian_signal(1.0, 10, 3, 100, base=0.5, method='sharp')
    np.random.seed(12)
    ref = ref_signal.generate_gaussian_signal(1.0, 10, 3, 100, base=0.5, method='sharp')
    assert np.allclose(ours, ref)
