"""Pandas dataframe post-processing helpers (reference:
pygsti/tools/dataframetools.py)."""

from __future__ import annotations


def _drop_constant_cols(df):
    to_drop = [col for col in df.columns if len(df[col].unique()) == 1]
    return df.drop(columns=to_drop)


def _reset_index(df):
    """Replace the index with 0...N keeping the old index as a column."""
    df = df.reset_index()
    return df


def _process_dataframe(df, pivot_valuename, pivot_value, drop_columns,
                       preserve_order=False):
    """Optionally pivot and drop columns from a dataframe (reference:
    dataframetools._process_dataframe)."""
    if drop_columns:
        for col in (drop_columns if not isinstance(drop_columns, (bool,))
                    else []):
            df = df.drop(columns=[col])
        if drop_columns is True:
            df = _drop_constant_cols(df)
    if pivot_valuename is not None or pivot_value is not None:
        assert pivot_valuename is not None and pivot_value is not None, \
            "Both pivot_valuename and pivot_value must be given"
        index_cols = [c for c in df.columns
                      if c not in (pivot_valuename, pivot_value)]
        df = df.pivot_table(index=index_cols, columns=pivot_valuename,
                            values=pivot_value, sort=not preserve_order)
        df = df.reset_index()
    return df


def starmap_with_kwargs(fn, num_runs, num_processors, args_list, kwargs_list):
    """Run fn over args/kwargs lists (serially here: the single-controller
    model replaces the reference's multiprocessing pool; reference:
    mptools.starmap_with_kwargs)."""
    return [fn(*args, **kwargs)
            for args, kwargs in zip(args_list, kwargs_list)]
