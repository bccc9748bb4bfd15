"""Meta-based directory serialization helpers (reference:
pygsti/io/metadir.py).

The working directory-tree protocol lives on the protocol objects
themselves (`ExperimentDesign.write/from_dir`, `ProtocolData`,
`ProtocolResults*` in pygsti_tpu/protocols/protocol.py); this module
provides the reference's function-level entry points.
"""

from __future__ import annotations

import importlib
import json
import pathlib


def _full_class_name(obj):
    return type(obj).__module__ + "." + type(obj).__name__


def _class_for_name(name):
    mod, cls = name.rsplit(".", 1)
    return getattr(importlib.import_module(mod), cls)


def write_meta_based_dir(root_dir, valuedict, auxfile_types=None,
                         init_meta=None):
    """Write an object's state dict as `meta.json` in root_dir (reference:
    metadir.write_meta_based_dir -- the reference also spills large members
    to sidecar files; here NicelySerializable states are JSON-complete)."""
    from pygsti_tpu.serialization import encode_obj
    root = pathlib.Path(root_dir)
    root.mkdir(parents=True, exist_ok=True)
    meta = dict(init_meta or {})
    meta.update({k: encode_obj(v) for k, v in valuedict.items()})
    with open(root / "meta.json", "w") as f:
        json.dump(meta, f, indent=1)


def load_meta_based_dir(root_dir, auxfile_types_member='auxfile_types',
                        ignore_meta=('type',), separate_auxfiletypes=False):
    """Load a meta.json state dict written by write_meta_based_dir."""
    from pygsti_tpu.serialization import decode_obj
    root = pathlib.Path(root_dir)
    with open(root / "meta.json") as f:
        meta = json.load(f)
    out = {k: decode_obj(v) for k, v in meta.items()
           if k not in (ignore_meta or ())}
    if separate_auxfiletypes:
        return out, {}
    return out


def _cls_from_meta_json(dirname):
    """The class recorded in a directory's meta.json (reference:
    metadir._cls_from_meta_json)."""
    with open(pathlib.Path(dirname) / "meta.json") as f:
        meta = json.load(f)
    return _class_for_name(meta['type'])


def write_obj_to_meta_based_dir(obj, dirname, auxfile_types_member,
                                omit_attributes=(), include_attributes=None,
                                additional_meta=None):
    """Write `obj.__dict__` (minus omissions) to `dirname` as a meta.json
    directory, with auxfile types taken from the named attribute
    (reference: metadir.write_obj_to_meta_based_dir:553)."""
    if include_attributes is not None:
        valuedict = {k: v for k, v in obj.__dict__.items()
                     if k in include_attributes}
    else:
        valuedict = {k: v for k, v in obj.__dict__.items()
                     if k not in omit_attributes}
    auxtypes = getattr(obj, auxfile_types_member, None) \
        if auxfile_types_member else None
    meta = {'type': _full_class_name(obj)}
    if additional_meta:
        meta.update(additional_meta)
    valuedict = dict(valuedict)
    valuedict.update(meta)
    write_meta_based_dir(dirname, valuedict, auxfile_types=auxtypes)


def write_dict_to_json_or_pkl_files(d, dirname):
    """Write each element of `d` to its own file under `dirname`: .json
    when JSON-able, .pkl otherwise (reference:
    metadir.write_dict_to_json_or_pkl_files:653)."""
    import json
    import os
    import pickle
    os.makedirs(str(dirname), exist_ok=True)
    for key, val in d.items():
        try:
            s = json.dumps(val, indent=1)
            with open(os.path.join(str(dirname), '%s.json' % key), 'w') as f:
                f.write(s)
        except TypeError:
            with open(os.path.join(str(dirname), '%s.pkl' % key), 'wb') as f:
                pickle.dump(val, f)
