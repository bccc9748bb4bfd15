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
    """Write a text-format dataset (reference: io/writers.py:90).  Circuits
    with time-series data are written as 'with_times' blocks (circuit line
    followed by times:/outcomes:/repetitions: lines) unless with_times is
    False."""
    from pygsti_tpu.baseobjs.outcomelabeldict import OutcomeLabelDict
    circuits = list(circuits) if circuits is not None else list(dataset.keys())
    outcome_labels = outcome_label_order if outcome_label_order is not None \
        else dataset.outcome_labels
    if with_times == "auto":
        with_times = dataset.has_timestamps

    def _ol_str(o):
        return ":".join(o) if isinstance(o, tuple) else str(o)

    with open(filename, 'w') as f:
        if not with_times:
            f.write("## Columns = " + ", ".join(
                "%s count" % _ol_str(o) for o in outcome_labels) + "\n")
        else:
            f.write("## Outcomes = " + ", ".join(
                _ol_str(o) for o in outcome_labels) + "\n")
        for c in circuits:
            row = dataset[c]
            if with_times and row.time is not None and len(row.time) > 0:
                f.write(c.str + "\n")
                f.write("times: " + " ".join("%g" % t for t in row.time) + "\n")
                series = row.outcome_series if row.outcome_series is not None \
                    else list(row.counts.keys())
                f.write("outcomes: " + " ".join(_ol_str(o) for o in series)
                        + "\n")
                if row.reps is not None:
                    f.write("repetitions: " + " ".join(
                        str(int(r)) if float(r).is_integer() else str(r)
                        for r in row.reps) + "\n")
                f.write("\n")
            else:
                counts = [row.counts.get(OutcomeLabelDict.to_outcome(o), 0)
                          for o in outcome_labels]
                f.write(c.str + "  " + "  ".join(str(x) for x in counts) + "\n")


def write_multidataset(filename, multidataset, circuits=None,
                       outcome_label_order=None):
    """Write a multi-dataset text file (reference: io/writers.py:205)."""
    from pygsti_tpu.baseobjs.outcomelabeldict import OutcomeLabelDict
    ds_labels = list(multidataset.keys())
    if circuits is None:
        circuits = list(multidataset[ds_labels[0]].keys())
    cols = []
    col_map = []  # (ds_label, outcome)
    for dl in ds_labels:
        ds = multidataset[dl]
        ols = outcome_label_order if outcome_label_order is not None \
            else ds.outcome_labels
        for o in ols:
            os_ = ":".join(o) if isinstance(o, tuple) else str(o)
            cols.append("%s %s count" % (dl, os_))
            col_map.append((dl, OutcomeLabelDict.to_outcome(o)))
    with open(filename, 'w') as f:
        f.write("## Columns = " + ", ".join(cols) + "\n")
        for c in circuits:
            vals = [multidataset[dl][c].counts.get(o, 0) for dl, o in col_map]
            f.write(c.str + "  " + "  ".join(str(v) for v in vals) + "\n")


def write_empty_dataset(filename, circuits, header_string='## Columns = 0 count, 1 count',
                        num_zero_cols=None, append_weights_column=False):
    """Write an empty dataset template for manual filling (reference:
    io/writers.py:37)."""
    with open(filename, 'w') as f:
        f.write(header_string + "\n")
        if num_zero_cols is None:
            num_zero_cols = header_string.count(',') + 1 \
                if 'Columns' in header_string else 0
        for c in circuits:
            zeros = "  ".join(['0'] * num_zero_cols)
            f.write(c.str + ("  " + zeros if zeros else "") + "\n")
