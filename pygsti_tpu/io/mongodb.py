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
    existing = mongodb_collection.find_one({'_id': doc_id})
    if existing is not None:
        if not overwrite_existing:
            raise ValueError("Document %r already exists" % (doc_id,))
        mongodb_collection.delete_one({'_id': doc_id})
    mongodb_collection.insert_one(doc)
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
    mongodb_collection.delete_one({'_id': doc_id})
