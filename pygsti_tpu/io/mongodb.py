"""MongoDB persistence (reference: pygsti/io/mongodb.py).

Works against a real pymongo database when available or the built-in mock
collection (baseobjs/mongoserializable.py) otherwise.
"""

from __future__ import annotations

from pygsti_tpu.baseobjs.mongoserializable import (MongoSerializable,
                                                   create_mongodb_collection)
from pygsti_tpu.serialization import encode_obj, decode_obj


def write_obj_to_mongodb_auxtree(obj, mongodb_collection, doc_id,
                                 auxfile_types_member=None,
                                 omit_attributes=(), include_attributes=None,
                                 additional_meta=None, session=None,
                                 overwrite_existing=False):
    """Write an object's serialized state as a mongo document (reference:
    io/mongodb.write_obj_to_mongodb_auxtree:285; sidecar aux-documents are
    folded into the single JSON-able document here)."""
    doc = {'_id': doc_id, 'state': encode_obj(obj)}
    if additional_meta:
        doc.update(additional_meta)
    existing = mongodb_collection.find_one({'_id': doc_id}, session=session)
    if existing is not None:
        if not overwrite_existing:
            raise ValueError("Document %r already exists" % (doc_id,))
        mongodb_collection.delete_one({'_id': doc_id}, session=session)
    mongodb_collection.insert_one(doc, session=session)
    return doc_id


def read_auxtree_from_mongodb(mongodb_collection, doc_id,
                              auxfile_types_member=None, ignore_meta=('_id',),
                              quick_load=False):
    """Read an object previously written with
    write_obj_to_mongodb_auxtree (reference:
    io/mongodb.read_auxtree_from_mongodb:32)."""
    doc = mongodb_collection.find_one({'_id': doc_id})
    if doc is None:
        raise KeyError("No document with id %r" % (doc_id,))
    return decode_obj(doc['state'])


def remove_auxtree_from_mongodb(mongodb_collection, doc_id, session=None):
    """Delete a stored object document."""
    mongodb_collection.delete_one({'_id': doc_id}, session=session)


# -- reference function-name surface (reference: io/mongodb.py).  MongoDB
#    is optional; these are thin layers over pymongo collections that
#    serialize via the same nice-serialization dicts the directory format
#    uses.

def write_dict_to_mongodb(d, mongodb, collection_name, doc_identifier,
                          overwrite_existing=False, session=None):
    """Write each element of `d` as a document in the named collection
    (reference: mongodb.write_dict_to_mongodb)."""
    from pygsti_tpu.baseobjs.nicelyserializable import encode_value
    coll = mongodb[collection_name]
    for key, val in d.items():
        doc_id = dict(doc_identifier, member_name=str(key)) \
            if isinstance(doc_identifier, dict) \
            else {'parent': doc_identifier, 'member_name': str(key)}
        doc = dict(doc_id)
        doc['value'] = encode_value(val)
        if overwrite_existing:
            coll.replace_one(doc_id, doc, upsert=True, session=session)
        else:
            coll.insert_one(doc, session=session)


def add_dict_to_mongodb_write_ops(d, write_ops, mongodb, collection_name,
                                  doc_identifier, overwrite_existing=False):
    """Append the write operations :func:`write_dict_to_mongodb` would
    perform to `write_ops` (reference:
    mongodb.add_dict_to_mongodb_write_ops)."""
    from pygsti_tpu.baseobjs.nicelyserializable import encode_value
    for key, val in d.items():
        doc_id = {'parent': doc_identifier, 'member_name': str(key)}
        doc = dict(doc_id)
        doc['value'] = encode_value(val)
        write_ops.append((collection_name, doc_id, doc,
                          overwrite_existing))


def read_dict_from_mongodb(mongodb, collection_name, identifying_metadata):
    """Read a dict written by :func:`write_dict_to_mongodb` (reference:
    mongodb.read_dict_from_mongodb)."""
    from pygsti_tpu.baseobjs.nicelyserializable import decode_value
    coll = mongodb[collection_name]
    out = {}
    query = {'parent': identifying_metadata} \
        if not isinstance(identifying_metadata, dict) \
        else identifying_metadata
    for doc in coll.find(query):
        out[doc['member_name']] = decode_value(doc['value'])
    return out


def remove_dict_from_mongodb(mongodb, collection_name,
                             identifying_metadata, session=None):
    """Remove a dict written by :func:`write_dict_to_mongodb` (reference:
    mongodb.remove_dict_from_mongodb)."""
    query = {'parent': identifying_metadata} \
        if not isinstance(identifying_metadata, dict) \
        else identifying_metadata
    mongodb[collection_name].delete_many(query, session=session)


def write_auxtree_to_mongodb(obj, mongodb, collection_name, doc_id,
                             auxfile_types_member='auxfile_types',
                             omit_attributes=(), include_attributes=None,
                             additional_meta=None, session=None,
                             overwrite_existing=False):
    """Write an auxfile-typed object tree into MongoDB (reference:
    mongodb.write_auxtree_to_mongodb); document layout mirrors the
    meta.json directory format."""
    return write_obj_to_mongodb_auxtree(
        obj, mongodb[collection_name], doc_id,
        auxfile_types_member=auxfile_types_member,
        omit_attributes=omit_attributes, session=session)


def add_obj_auxtree_write_ops_and_update_doc(obj, doc, write_ops, mongodb,
                                             collection_name, doc_id,
                                             auxfile_types_member='auxfile_types',
                                             omit_attributes=(),
                                             include_attributes=None,
                                             additional_meta=None):
    """Accumulate the write ops for an object auxtree and update its main
    document (reference:
    mongodb.add_obj_auxtree_write_ops_and_update_doc)."""
    from pygsti_tpu.baseobjs.nicelyserializable import encode_value
    if include_attributes is not None:
        valuedict = {k: v for k, v in obj.__dict__.items()
                     if k in include_attributes}
    else:
        valuedict = {k: v for k, v in obj.__dict__.items()
                     if k not in omit_attributes}
    if additional_meta:
        doc.update(additional_meta)
    doc['value'] = encode_value(valuedict)
    write_ops.append((collection_name, doc_id, doc, True))
    return doc


def add_auxtree_write_ops_and_update_doc(doc, write_ops, mongodb,
                                         collection_name, doc_id,
                                         valuedict, auxfile_types=None,
                                         init_meta=None):
    """Dict-level variant of
    :func:`add_obj_auxtree_write_ops_and_update_doc` (reference:
    mongodb.add_auxtree_write_ops_and_update_doc)."""
    from pygsti_tpu.baseobjs.nicelyserializable import encode_value
    if init_meta:
        doc.update(init_meta)
    doc['value'] = encode_value(dict(valuedict))
    write_ops.append((collection_name, doc_id, doc, True))
    return doc


def read_auxtree_from_mongodb_doc(mongodb, doc, auxfile_types_member='auxfile_types',
                                  ignore_meta=('_id', 'type'),
                                  separate_auxfiletypes=False,
                                  quick_load=False):
    """Reconstruct an auxtree value dict from an already-fetched document
    (reference: mongodb.read_auxtree_from_mongodb_doc)."""
    from pygsti_tpu.baseobjs.nicelyserializable import decode_value
    out = {k: v for k, v in doc.items() if k not in ignore_meta}
    if 'value' in out:
        out = decode_value(out['value'])
    if separate_auxfiletypes:
        aux = out.pop(auxfile_types_member, {})
        return out, aux
    return out


def create_mongodb_indices_for_pygsti_collections(mongodb):
    """Create the indices pygsti_tpu's MongoDB documents query on
    (reference:
    mongodb.create_mongodb_indices_for_pygsti_collections)."""
    for name in ('pygsti_experiment_designs', 'pygsti_data',
                 'pygsti_results', 'pygsti_dirs'):
        try:
            mongodb[name].create_index('parent')
            mongodb[name].create_index('member_name')
        except Exception:
            pass
