"""MongoDB document serialization protocol (reference:
pygsti/baseobjs/mongoserializable.py:18 MongoSerializable; pygsti/io/mongodb.py).

The TPU framework stores the same nicely-serializable JSON documents; pymongo
is an optional dependency -- when absent, an in-memory mock collection
supports the full read/write round trip (and tests).
"""

from __future__ import annotations

import collections


class _MockCollection(object):
    """Dict-backed stand-in for a pymongo collection (used when pymongo is
    not installed; also handy for tests)."""

    def __init__(self):
        self._docs = {}
        self._next_id = 0

    def insert_one(self, doc, session=None):
        doc = dict(doc)
        if '_id' not in doc:
            doc['_id'] = self._next_id
            self._next_id += 1
        self._docs[doc['_id']] = doc

        class _Result:
            inserted_id = doc['_id']
        return _Result()

    def find_one(self, query, session=None):
        if isinstance(query, dict):
            for doc in self._docs.values():
                if all(doc.get(k) == v for k, v in query.items()):
                    return dict(doc)
            return None
        return dict(self._docs.get(query)) if query in self._docs else None

    def replace_one(self, query, doc, upsert=False, session=None):
        found = self.find_one(query)
        if found is not None:
            doc = dict(doc)
            doc['_id'] = found['_id']
            self._docs[found['_id']] = doc
        elif upsert:
            self.insert_one(doc)

    def delete_one(self, query, session=None):
        found = self.find_one(query)
        if found is not None:
            del self._docs[found['_id']]


class MongoSerializable(object):
    """Mixin: objects whose nice-serialization dict can round-trip through a
    MongoDB collection (reference: mongoserializable.py:18)."""

    collection_name = 'pygsti_objects'

    def write_to_mongodb(self, collection, doc_id=None, session=None,
                         overwrite_existing=False):
        state = self.to_nice_serialization()
        doc = {'object_state': state,
               'type': type(self).__name__}
        if doc_id is not None:
            doc['_id'] = doc_id
            if overwrite_existing:
                collection.replace_one({'_id': doc_id}, doc, upsert=True,
                                       session=session)
                return doc_id
        result = collection.insert_one(doc, session=session)
        return result.inserted_id

    @classmethod
    def from_mongodb(cls, collection, doc_id, session=None):
        doc = collection.find_one({'_id': doc_id}, session=session)
        if doc is None:
            raise KeyError("No document with id %r" % (doc_id,))
        from pygsti_tpu.baseobjs.nicelyserializable import NicelySerializable
        return NicelySerializable.from_nice_serialization(doc['object_state'])


def create_mongodb_collection(db=None, collection_name='pygsti_objects'):
    """A collection to write to: a real pymongo collection when `db` is
    given (requires pymongo), else an in-memory mock."""
    if db is not None:
        return db[collection_name]
    return _MockCollection()
