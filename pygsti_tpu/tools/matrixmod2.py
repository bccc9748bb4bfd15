"""GF(2) linear algebra (reference: pygsti/tools/matrixmod2.py)."""

from __future__ import annotations

import numpy as np


def dot_mod2(m1, m2):
    return np.dot(m1, m2) % 2


def multidot_mod2(mats):
    out = mats[0]
    for m in mats[1:]:
        out = dot_mod2(out, m)
    return out


def det_mod2(m):
    return int(round(np.linalg.det(np.asarray(m)))) % 2


def matrix_directsum(m1, m2):
    n1, n2 = m1.shape[0], m2.shape[0]
    out = np.zeros((n1 + n2, m1.shape[1] + m2.shape[1]), dtype=m1.dtype)
    out[:n1, :m1.shape[1]] = m1
    out[n1:, m1.shape[1]:] = m2
    return out


def inv_mod2(m):
    """Inverse of a matrix over GF(2) via Gaussian elimination."""
    m = np.array(m, dtype=np.int64) % 2
    n = m.shape[0]
    aug = np.concatenate([m, np.identity(n, np.int64)], axis=1)
    for col in range(n):
        pivot = None
        for row in range(col, n):
            if aug[row, col] == 1:
                pivot = row
                break
        if pivot is None:
            raise ValueError("Matrix is singular over GF(2)")
        if pivot != col:
            aug[[col, pivot]] = aug[[pivot, col]]
        for row in range(n):
            if row != col and aug[row, col] == 1:
                aug[row] = (aug[row] + aug[col]) % 2
    return aug[:, n:]


def gaussian_elimination_mod2(m):
    """Row-reduce over GF(2) (in place on a copy; returns the result)."""
    m = np.array(m, dtype=np.int64) % 2
    rows, cols = m.shape
    r = 0
    for c in range(cols):
        if r >= rows:
            break
        pivot = None
        for row in range(r, rows):
            if m[row, c] == 1:
                pivot = row
                break
        if pivot is None:
            continue
        if pivot != r:
            m[[r, pivot]] = m[[pivot, r]]
        for row in range(rows):
            if row != r and m[row, c] == 1:
                m[row] = (m[row] + m[r]) % 2
        r += 1
    return m


def rank_mod2(m):
    red = gaussian_elimination_mod2(m)
    return int(np.sum(red.any(axis=1)))


def solve_mod2(A, b):
    """Solve A x = b over GF(2); returns one solution or None."""
    A = np.array(A, dtype=np.int64) % 2
    b = np.array(b, dtype=np.int64).reshape(-1, 1) % 2
    rows, cols = A.shape
    aug = np.concatenate([A, b], axis=1)
    pivots = []
    r = 0
    for c in range(cols):
        if r >= rows:
            break
        pivot = None
        for row in range(r, rows):
            if aug[row, c] == 1:
                pivot = row
                break
        if pivot is None:
            continue
        if pivot != r:
            aug[[r, pivot]] = aug[[pivot, r]]
        for row in range(rows):
            if row != r and aug[row, c] == 1:
                aug[row] = (aug[row] + aug[r]) % 2
        pivots.append((r, c))
        r += 1
    x = np.zeros(cols, dtype=np.int64)
    for (row, col) in pivots:
        x[col] = aug[row, cols]
    # check consistency
    if np.any((A @ x) % 2 != b.ravel()):
        return None
    return x


def strictly_upper_triangle(m):
    return np.triu(m, 1)


def diagonal_as_vec(m):
    return np.diagonal(m).copy()


def diagonal_as_matrix(m):
    return np.diag(np.diagonal(m))


def random_invertible_matrix(n, rand_state=None):
    rng = rand_state if rand_state is not None else np.random.RandomState()
    while True:
        m = rng.randint(0, 2, (n, n))
        if det_mod2(m) == 1 or rank_mod2(m) == n:
            return m


def random_bitstring(n, p=0.5, rand_state=None):
    rng = rand_state if rand_state is not None else np.random.RandomState()
    return np.array(rng.binomial(1, p, n), dtype=np.int64)
