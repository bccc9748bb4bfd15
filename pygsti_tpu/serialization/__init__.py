"""JSON serialization of framework objects (reference:
pygsti/serialization/jsoncodec.py).

Objects implementing the NicelySerializable protocol round-trip through
plain JSON dicts; numpy arrays are encoded as nested lists with a dtype
tag.
"""

from pygsti_tpu.serialization.jsoncodec import (encode_obj, decode_obj,
                                                dumps, loads, dump, load)
