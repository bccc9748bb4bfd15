"""Error-generator subspaces (reference: pygsti/baseobjs/errorgenspace.py).

An ErrorgenSpace is a linear subspace of error-generator space: a matrix of
column vectors expressed in an elementary-errorgen basis.
"""

from __future__ import annotations

import numpy as np


class ErrorgenSpace(object):
    """A subspace of errorgen space: `vectors` [dim_of_basis, n_vectors]
    over `basis` (an ElementaryErrorgenBasis) (reference:
    errorgenspace.ErrorgenSpace)."""

    def __init__(self, vectors, basis):
        self.vectors = np.asarray(vectors)
        self.elemgen_basis = basis

    def intersection(self, other_space, free_on_unspecified_space=False,
                     use_nice_nullspace=False):
        """The intersection of this space with another (via the nullspace of
        the stacked complement projectors)."""
        assert self.elemgen_basis.labels == other_space.elemgen_basis.labels, \
            "Spaces must share an elementary-errorgen basis"
        VW = np.concatenate([self.vectors, -other_space.vectors], axis=1)
        ns = _nullspace(VW)
        inter = self.vectors @ ns[:self.vectors.shape[1], :]
        return ErrorgenSpace(inter, self.elemgen_basis)

    def union(self, other_space):
        """The span of the union of the two spaces."""
        assert self.elemgen_basis.labels == other_space.elemgen_basis.labels
        stacked = np.concatenate([self.vectors, other_space.vectors], axis=1)
        u, s, _ = np.linalg.svd(stacked, full_matrices=False)
        rank = int(np.sum(s > 1e-10 * max(s[0] if len(s) else 1.0, 1e-30)))
        return ErrorgenSpace(u[:, :rank], self.elemgen_basis)

    def normalize(self, norm_order=2):
        """Normalize the spanning vectors in place."""
        for j in range(self.vectors.shape[1]):
            n = np.linalg.norm(self.vectors[:, j], ord=norm_order)
            if n > 1e-15:
                self.vectors[:, j] /= n
        return self


def _nullspace(m, tol=1e-10):
    u, s, vh = np.linalg.svd(m, full_matrices=True)
    rank = int(np.sum(s > tol * (s[0] if len(s) else 1.0)))
    return vh[rank:, :].T.conj()
