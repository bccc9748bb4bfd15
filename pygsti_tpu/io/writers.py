"""Text-format writers (reference: pygsti/io/writers.py)."""

from __future__ import annotations


def write_circuit_list(filename, circuits, header=None):
    with open(filename, 'w') as f:
        if header:
            f.write("# %s\n" % header)
        for c in circuits:
            f.write(c.str + "\n")


def write_dataset(filename, dataset, circuits=None, outcome_label_order=None,
                  fixed_column_mode="auto", with_times="auto"):
    circuits = circuits if circuits is not None else dataset.keys()
    outcome_labels = outcome_label_order if outcome_label_order is not None \
        else dataset.outcome_labels
    with open(filename, 'w') as f:
        f.write("## Columns = " + ", ".join(
            "%s count" % ("".join(o) if isinstance(o, tuple) else o)
            for o in outcome_labels) + "\n")
        from pygsti_tpu.baseobjs.outcomelabeldict import OutcomeLabelDict
        for c in circuits:
            row = dataset[c]
            counts = [row.counts.get(OutcomeLabelDict.to_outcome(o), 0)
                      for o in outcome_labels]
            f.write(c.str + "  " + "  ".join(str(x) for x in counts) + "\n")
