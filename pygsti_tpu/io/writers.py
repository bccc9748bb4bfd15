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


def convert_circuits_to_strings(obj):
    """Convert (possibly nested) lists/dicts containing Circuits into a
    JSON-able structure with 'circuit/<str>' markers (reference:
    writers.convert_circuits_to_strings:706)."""
    from pygsti_tpu.circuits.circuit import Circuit

    def convert(x):
        if isinstance(x, Circuit):
            return 'circuit/' + x.str
        if isinstance(x, (list, tuple)):
            return [convert(v) for v in x]
        if isinstance(x, dict):
            return {(('circuit/' + k.str) if isinstance(k, Circuit) else k):
                    convert(v) for k, v in x.items()}
        return x

    return convert(obj)


def write_circuit_strings(filename, obj):
    """Write a Circuit-containing structure as json with circuits replaced
    by their string reps (reference: writers.write_circuit_strings:733)."""
    import json
    json_dict = convert_circuits_to_strings(obj)
    if str(filename).endswith('.json'):
        with open(filename, 'w') as f:
            json.dump(json_dict, f, indent=4)
    else:
        raise ValueError("Cannot determine format from extension of "
                         "filename: %s" % str(filename))


def write_empty_protocol_data(dirname, edesign, sparse="auto",
                              clobber_ok=False):
    """Write an edesign directory tree plus an EMPTY dataset template file
    the user fills with real data (reference:
    writers.write_empty_protocol_data:480)."""
    import os
    dirname = str(dirname)
    data_dir = os.path.join(dirname, 'data')
    if os.path.exists(os.path.join(data_dir, 'dataset.txt')) \
       and not clobber_ok:
        raise ValueError("Would clobber %s; pass clobber_ok=True"
                         % os.path.join(data_dir, 'dataset.txt'))
    edesign.write(dirname)
    os.makedirs(data_dir, exist_ok=True)
    circuits = edesign.all_circuits_needing_data
    if sparse == "auto":
        nq = len(getattr(edesign, 'qubit_labels', None) or (0,))
        sparse = nq > 3
    if sparse:
        header = "## Outcomes = --"  # sparse (outcome-labeled) format
        write_empty_dataset(os.path.join(data_dir, 'dataset.txt'), circuits,
                            header_string=header)
    else:
        write_empty_dataset(os.path.join(data_dir, 'dataset.txt'), circuits)


def fill_in_empty_dataset_with_fake_data(dataset_filename, model, num_samples,
                                         sample_error="multinomial",
                                         seed=None, rand_state=None,
                                         alias_dict=None,
                                         collision_action="aggregate",
                                         record_zero_counts=True, comm=None,
                                         mem_limit=None, times=None,
                                         fixed_column_mode="auto"):
    """Replace an empty dataset template's counts with simulated data from
    `model` (reference: writers.fill_in_empty_dataset_with_fake_data:600).
    Arguments may also be given as (model, dataset_filename, ...) -- the
    reference supports both orders."""
    from pygsti_tpu.data.datasetconstruction import simulate_data
    from pygsti_tpu.io.stdinput import StdInputParser
    import os as _os
    if hasattr(dataset_filename, 'probabilities') and \
       isinstance(model, (str, _os.PathLike)):
        model, dataset_filename = dataset_filename, model  # swapped order
    dataset_filename = _os.fspath(dataset_filename)
    # template lines are "circuit  <count columns...>": parse the circuit
    # token only
    parser = StdInputParser()
    circuits = []
    with open(dataset_filename) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith('#'):
                continue
            circuits.append(parser.parse_circuit(line.split()[0]))
    ds = simulate_data(model, circuits, num_samples,
                       sample_error=sample_error, seed=seed,
                       record_zero_counts=record_zero_counts, times=times)
    write_dataset(dataset_filename, ds, circuits,
                  fixed_column_mode=(len(ds.outcome_labels) <= 8
                                     if fixed_column_mode == "auto"
                                     else fixed_column_mode))
    return ds


def write_model(model, filename, title=None):
    """Write an explicit model as a text-format model file -- PREP/POVM/
    GATE blocks of Liouville vectors/matrices plus STATESPACE/BASIS/
    GAUGEGROUP footer lines (reference: io/writers.write_model:305)."""
    import numpy as _np

    def _fmt_vec(v):
        return " ".join("%.8g" % el for el in _np.asarray(v).ravel())

    def _fmt_mx(m):
        m = _np.asarray(m)
        return "\n".join("".join("%16.8g" % el for el in row)
                         for row in m) + "\n"

    gate_type = str(getattr(model, 'default_gate_type', 'full'))
    tp = gate_type.endswith('TP') or gate_type == 'TP'
    prep_typ = "TP-PREP" if tp else "PREP"
    povm_typ = "TP-POVM" if tp else "POVM"
    gate_typ = "TP-GATE" if tp else "GATE"

    with open(str(filename), 'w') as f:
        if title is not None:
            f.write("# %s\n" % title)
        f.write("\n")
        for lbl, rho in model.preps.items():
            f.write("%s: %s\n" % (prep_typ, lbl))
            f.write("LiouvilleVec\n%s\n\n" % _fmt_vec(rho.to_dense()))
        for plbl, povm in model.povms.items():
            f.write("%s: %s\n\n" % (povm_typ, plbl))
            effects = _np.asarray(povm.to_dense())
            keys = list(povm.keys()) if hasattr(povm, 'keys') \
                else [str(i) for i in range(effects.shape[0])]
            for elbl, evec in zip(keys, effects):
                f.write("EFFECT: %s\nLiouvilleVec\n%s\n\n"
                        % (elbl, _fmt_vec(evec)))
            f.write("END POVM\n\n")
        for lbl, op in model.operations.items():
            f.write("%s: %s\nLiouvilleMx\n%s\n"
                    % (gate_typ, lbl, _fmt_mx(op.to_dense())))
        udim = model.state_space.udim
        f.write("STATESPACE: 0(%d)\n" % model.dim)
        basis_name = getattr(model.basis, 'name', 'pp')
        f.write("BASIS: %s %d\n" % (basis_name, model.dim))
        f.write("GAUGEGROUP: %s\n" % ("TP" if tp else "Full"))
