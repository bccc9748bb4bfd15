"""TreeNode base for nested edesign/data/results trees (reference:
pygsti/protocols/treenode.py).

The working tree behavior (keys/items/getitem over nested designs, dir
read/write) is implemented directly on ExperimentDesign / ProtocolData /
ProtocolResultsDir in pygsti_tpu/protocols/protocol.py; this module
provides the reference's base-class name."""

from __future__ import annotations


class TreeNode(object):
    """Minimal tree-node mixin (reference: treenode.TreeNode:20)."""

    def keys(self):
        return ()

    def items(self):
        return iter(())

    def __getitem__(self, key):
        raise KeyError(key)

    def __contains__(self, key):
        return key in list(self.keys())

    def iterate_over_nodes(self):
        yield self
        for _, child in self.items():
            if isinstance(child, TreeNode):
                yield from child.iterate_over_nodes()
            else:
                yield child
