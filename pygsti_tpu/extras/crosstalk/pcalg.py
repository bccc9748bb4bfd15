"""Native PC-algorithm causal discovery for crosstalk detection.

The reference (pygsti/extras/crosstalk/core.py:382-388) delegates skeleton
and CPDAG estimation to the external ``pcalg`` package with the discrete
G-squared conditional-independence test from ``gsq``.  Neither package is a
dependency here, so this module implements both natively:

- :func:`g_square_dis` -- the discrete (multinomial) G^2 CI test,
- :func:`estimate_skeleton` -- PC-stable skeleton search,
- :func:`estimate_cpdag` -- v-structure orientation + Meek rules 1-3.

Graphs are ``networkx`` objects; in the returned CPDAG an *undirected* edge
is represented as a 2-cycle (both directions present), matching the pcalg
package convention that the reference's edge-classification loop relies on.
"""

from __future__ import annotations

import itertools

import networkx as nx
import numpy as np
from scipy import stats


def g_square_dis(data, x, y, s, levels=None):
    """Discrete G^2 conditional-independence test: p-value for
    "column x independent of column y given the columns in s".

    data : int ndarray [n_samples, n_cols] with values 0..levels[c]-1.
    s : tuple of conditioning column indices.
    levels : per-column category counts (computed if None).

    Follows the ``gsq.ci_tests.ci_test_dis`` semantics, including the
    heuristic that returns p=1 (independence) when there are fewer than
    10 * dof samples, which keeps the PC search from over-rejecting on
    sparse strata.
    """
    data = np.asarray(data, dtype=int)
    if levels is None:
        levels = [int(data[:, c].max()) + 1 for c in range(data.shape[1])]
    lx, ly = levels[x], levels[y]
    dof = (lx - 1) * (ly - 1) * int(np.prod([levels[c] for c in s], initial=1))
    if dof == 0:
        return 1.0
    if data.shape[0] < 10 * dof:
        return 1.0  # insufficient data to test reliably

    # encode the conditioning configuration of each sample as one integer
    if len(s) > 0:
        key = np.zeros(data.shape[0], dtype=np.int64)
        for c in s:
            key = key * levels[c] + data[:, c]
        n_cfg = int(np.prod([levels[c] for c in s]))
    else:
        key = np.zeros(data.shape[0], dtype=np.int64)
        n_cfg = 1

    # joint counts n[cfg, x, y] via a single bincount
    joint = np.bincount((key * lx + data[:, x]) * ly + data[:, y],
                        minlength=n_cfg * lx * ly).reshape(n_cfg, lx, ly)
    nk = joint.sum(axis=(1, 2), keepdims=True).astype(float)     # [cfg,1,1]
    nik = joint.sum(axis=2, keepdims=True).astype(float)         # [cfg,lx,1]
    njk = joint.sum(axis=1, keepdims=True).astype(float)         # [cfg,1,ly]
    with np.errstate(divide='ignore', invalid='ignore'):
        expected = nik * njk / nk
        ratio = np.where((joint > 0) & (expected > 0),
                         joint / np.where(expected > 0, expected, 1.0), 1.0)
        g2 = 2.0 * float(np.sum(joint * np.log(ratio)))
    return float(stats.chi2.sf(max(g2, 0.0), dof))


def estimate_skeleton(indep_test_func, data_matrix, alpha, ignore_edges=None,
                      max_reach=None):
    """PC-stable skeleton estimation.

    Starts from the complete undirected graph over columns (minus
    ``ignore_edges``, which the crosstalk pipeline uses to declare the
    experiment's settings mutually independent by design) and removes the
    edge (i, j) whenever x_i is found conditionally independent of x_j
    given some subset of i's neighbours, recording that subset in
    ``sep_set[i][j]``.

    Returns (networkx.Graph skeleton, sep_set) where sep_set is an
    [n][n] nested list of sets (the pcalg return contract consumed by
    :func:`estimate_cpdag`).
    """
    data_matrix = np.asarray(data_matrix, dtype=int)
    n_cols = data_matrix.shape[1]
    levels = [int(data_matrix[:, c].max()) + 1 for c in range(n_cols)]
    g = nx.complete_graph(n_cols)
    for (i, j) in (ignore_edges or []):
        if g.has_edge(i, j):
            g.remove_edge(i, j)
    sep_set = [[set() for _ in range(n_cols)] for _ in range(n_cols)]

    l = 0
    while True:
        cont = False
        # PC-stable: neighbourhoods frozen for this level
        adj = {i: set(g.neighbors(i)) for i in g.nodes()}
        removed = set()
        for (i, j) in list(g.edges()):
            for (a, b) in ((i, j), (j, i)):
                if (i, j) in removed or (j, i) in removed:
                    break
                others = adj[a] - {b}
                if len(others) < l:
                    continue
                cont = True
                for k_set in itertools.combinations(sorted(others), l):
                    p = indep_test_func(data_matrix, a, b, k_set, levels)
                    if p > alpha:
                        if g.has_edge(i, j):
                            g.remove_edge(i, j)
                        removed.add((i, j))
                        sep_set[a][b] |= set(k_set)
                        sep_set[b][a] |= set(k_set)
                        break
        l += 1
        if max_reach is not None and l > max_reach:
            break
        if not cont:
            break
    return g, sep_set


def estimate_cpdag(skel_graph, sep_set):
    """Orient the skeleton into a CPDAG: v-structure rule then Meek rules
    1-3 to closure.  Undirected edges remain as 2-cycles in the returned
    ``networkx.DiGraph``."""
    dag = skel_graph.to_directed()
    node_ids = list(skel_graph.nodes())

    def _has_both(d, i, j):
        return d.has_edge(i, j) and d.has_edge(j, i)

    # v-structures: i - k - j with i,j non-adjacent and k not in sep_set[i][j]
    for (i, j) in itertools.combinations(node_ids, 2):
        if skel_graph.has_edge(i, j):
            continue
        common = set(skel_graph.neighbors(i)) & set(skel_graph.neighbors(j))
        for k in common:
            if k not in sep_set[i][j]:
                if dag.has_edge(k, i):
                    dag.remove_edge(k, i)
                if dag.has_edge(k, j):
                    dag.remove_edge(k, j)

    # Meek rules to closure
    changed = True
    while changed:
        changed = False
        for (i, j) in list(dag.edges()):
            if not _has_both(dag, i, j):
                continue  # already oriented
            # Rule 1: k -> i, i - j, k and j non-adjacent  =>  i -> j
            for k in dag.predecessors(i):
                if dag.has_edge(i, k):
                    continue  # k-i undirected
                if not (dag.has_edge(k, j) or dag.has_edge(j, k)):
                    dag.remove_edge(j, i)
                    changed = True
                    break
            if not _has_both(dag, i, j):
                continue
            # Rule 2: i -> k -> j and i - j  =>  i -> j
            for k in dag.successors(i):
                if dag.has_edge(k, i):
                    continue
                if dag.has_edge(k, j) and not dag.has_edge(j, k):
                    dag.remove_edge(j, i)
                    changed = True
                    break
            if not _has_both(dag, i, j):
                continue
            # Rule 3: i - k -> j and i - l -> j with k,l non-adjacent, i-j
            und_nbrs = [k for k in dag.successors(i) if dag.has_edge(k, i)]
            directing = [k for k in und_nbrs
                         if dag.has_edge(k, j) and not dag.has_edge(j, k)]
            done = False
            for (k, l) in itertools.combinations(directing, 2):
                if not (dag.has_edge(k, l) or dag.has_edge(l, k)):
                    dag.remove_edge(j, i)
                    changed = True
                    done = True
                    break
            if done:
                continue
    return dag
