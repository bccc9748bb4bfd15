"""RB decay-constant <-> error-rate conversions (reference:
pygsti/tools/rbtools.py)."""

from __future__ import annotations


def p_to_r(p, d, rtype='EI'):
    """Decay constant -> error rate.  'EI' (entanglement infidelity):
    r = (1 - p)(d^2 - 1)/d^2;  'AGI': r = (1 - p)(d - 1)/d (reference:
    rbtools.p_to_r:16)."""
    if rtype == 'EI':
        return (1 - p) * (d ** 2 - 1) / d ** 2
    if rtype == 'AGI':
        return (1 - p) * (d - 1) / d
    raise ValueError("Unknown rtype %r" % rtype)


def r_to_p(r, d, rtype='EI'):
    """Inverse of p_to_r (reference: rbtools.r_to_p:66)."""
    if rtype == 'EI':
        return 1 - d ** 2 * r / (d ** 2 - 1)
    if rtype == 'AGI':
        return 1 - d * r / (d - 1)
    raise ValueError("Unknown rtype %r" % rtype)
