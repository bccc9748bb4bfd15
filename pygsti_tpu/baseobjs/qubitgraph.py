"""Device connectivity graphs (reference: pygsti/baseobjs/qubitgraph.py:21).

A small undirected/directed graph over qubit labels with shortest-path
queries, used by processor specs, cloud-noise models and RB samplers.
"""

from __future__ import annotations

import collections

import numpy as np


class QubitGraph(object):
    """Graph of qubit connectivity."""

    def __init__(self, qubit_labels, initial_edges=None, directed=False):
        self.nqubits = len(qubit_labels)
        self._nodes = tuple(qubit_labels)
        self._node_index = {q: i for i, q in enumerate(self._nodes)}
        self.directed = directed
        self._edges = set()
        if initial_edges is not None:
            for e in initial_edges:
                self.add_edge(e[0], e[1])
        self._dists = None

    @classmethod
    def common_graph(cls, num_qubits, geometry="line", directed=False, qubit_labels=None):
        """Build a standard graph: 'line', 'ring', 'grid' (approx square), or
        'fully_connected' (reference: QubitGraph.common_graph)."""
        qlbls = tuple(qubit_labels) if qubit_labels is not None else tuple(range(num_qubits))
        edges = []
        if geometry in ("line", "chain"):
            edges = [(qlbls[i], qlbls[i + 1]) for i in range(num_qubits - 1)]
        elif geometry == "ring":
            edges = [(qlbls[i], qlbls[(i + 1) % num_qubits]) for i in range(num_qubits)]
        elif geometry in ("fully_connected", "all"):
            edges = [(qlbls[i], qlbls[j]) for i in range(num_qubits) for j in range(i + 1, num_qubits)]
        elif geometry == "grid":
            ncols = int(np.ceil(np.sqrt(num_qubits)))
            for i in range(num_qubits):
                r, c = divmod(i, ncols)
                if c + 1 < ncols and i + 1 < num_qubits:
                    edges.append((qlbls[i], qlbls[i + 1]))
                if i + ncols < num_qubits:
                    edges.append((qlbls[i], qlbls[i + ncols]))
        else:
            raise ValueError("Unknown geometry %r" % geometry)
        return cls(qlbls, edges, directed=directed)

    @property
    def node_names(self):
        return self._nodes

    def add_edge(self, q1, q2):
        i, j = self._node_index[q1], self._node_index[q2]
        self._edges.add((i, j))
        if not self.directed:
            self._edges.add((j, i))
        self._dists = None

    def edges(self, double_for_undirected=False):
        out = []
        seen = set()
        for (i, j) in sorted(self._edges):
            if not self.directed and not double_for_undirected:
                key = (min(i, j), max(i, j))
                if key in seen:
                    continue
                seen.add(key)
            out.append((self._nodes[i], self._nodes[j]))
        return out

    def is_connected(self, q1, q2):
        return (self._node_index[q1], self._node_index[q2]) in self._edges

    def neighbors(self, q):
        i = self._node_index[q]
        return [self._nodes[j] for (a, j) in self._edges if a == i]

    def _all_pairs_dists(self):
        if self._dists is None:
            n = self.nqubits
            INF = np.inf
            d = np.full((n, n), INF)
            np.fill_diagonal(d, 0)
            for (i, j) in self._edges:
                d[i, j] = 1
            for k in range(n):
                d = np.minimum(d, d[:, k:k + 1] + d[k:k + 1, :])
            self._dists = d
        return self._dists

    def shortest_path_distance(self, q1, q2):
        d = self._all_pairs_dists()[self._node_index[q1], self._node_index[q2]]
        return int(d) if np.isfinite(d) else None

    def shortest_path(self, q1, q2):
        """BFS shortest path (list of node labels, inclusive of endpoints)."""
        src, dst = self._node_index[q1], self._node_index[q2]
        prev = {src: None}
        queue = collections.deque([src])
        while queue:
            u = queue.popleft()
            if u == dst:
                break
            for (a, v) in self._edges:
                if a == u and v not in prev:
                    prev[v] = u
                    queue.append(v)
        if dst not in prev:
            return None
        path = []
        node = dst
        while node is not None:
            path.append(self._nodes[node])
            node = prev[node]
        return list(reversed(path))

    def radius(self, base_nodes, max_hops):
        """All nodes within `max_hops` of any node in `base_nodes`."""
        dists = self._all_pairs_dists()
        idxs = [self._node_index[q] for q in base_nodes]
        out = []
        for j in range(self.nqubits):
            if any(dists[i, j] <= max_hops for i in idxs):
                out.append(self._nodes[j])
        return out

    def connected_combos(self, possible_nodes, size):
        """Count of connected subsets of `possible_nodes` with given size."""
        import itertools
        count = 0
        for combo in itertools.combinations(possible_nodes, size):
            if self.subgraph_connected(combo):
                count += 1
        return count

    def subgraph_connected(self, nodes):
        nodes = list(nodes)
        if len(nodes) <= 1:
            return True
        nodeset = set(self._node_index[q] for q in nodes)
        start = self._node_index[nodes[0]]
        seen = {start}
        queue = collections.deque([start])
        while queue:
            u = queue.popleft()
            for (a, v) in self._edges:
                if a == u and v in nodeset and v not in seen:
                    seen.add(v)
                    queue.append(v)
        return len(seen) == len(nodeset)

    def __len__(self):
        return self.nqubits
