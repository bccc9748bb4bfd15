"""Taylor-term objects import-path parity (reference:
pygsti/modelmembers/term.py).

The term simulator (forwardsims/termforwardsim.py) represents terms as
(coefficient-Polynomial, pre/post op-index words) tuples built during
layout; this module provides the reference's RankOneTerm name for code
that constructs terms directly."""

from __future__ import annotations


class RankOneTerm(object):
    """A rank-one term: polynomial coefficient x pre/post operation words
    (reference: term.RankOneTerm)."""

    def __init__(self, coeff, pre_ops=(), post_ops=(), magnitude=1.0):
        self.coeff = coeff
        self.pre_ops = tuple(pre_ops)
        self.post_ops = tuple(post_ops)
        self.magnitude = magnitude

    def scalar_mult(self, x):
        out = RankOneTerm(self.coeff, self.pre_ops, self.post_ops,
                          self.magnitude * abs(x))
        try:
            out.coeff = self.coeff * x
        except TypeError:
            pass
        return out

    def __repr__(self):
        return "RankOneTerm(%r, pre=%r, post=%r)" % (self.coeff,
                                                     self.pre_ops,
                                                     self.post_ops)
