"""MultiDataSet: several datasets sharing one circuit index (reference:
pygsti/data/multidataset.py)."""

from __future__ import annotations

import collections

from pygsti_tpu.data.dataset import DataSet


class MultiDataSet(object):
    """An ordered dict of named DataSets over a common circuit list."""

    def __init__(self, outcome_labels=None):
        self._datasets = collections.OrderedDict()
        self._outcome_labels = outcome_labels

    def add_dataset(self, name, dataset):
        if self._datasets:
            first = next(iter(self._datasets.values()))
            if set(first.keys()) != set(dataset.keys()):
                raise ValueError("All datasets in a MultiDataSet must share circuits")
        self._datasets[name] = dataset

    def __getitem__(self, name):
        return self._datasets[name]

    def __setitem__(self, name, ds):
        self.add_dataset(name, ds)

    def __contains__(self, name):
        return name in self._datasets

    def __len__(self):
        return len(self._datasets)

    def keys(self):
        return list(self._datasets.keys())

    def items(self):
        return self._datasets.items()

    def datasets_aggregate(self):
        """Sum counts across all member datasets into a single DataSet."""
        out = DataSet()
        for ds in self._datasets.values():
            for c in ds:
                out.add_count_dict(c, dict(ds[c].counts))
        return out
