"""Member-dict import-path parity (reference: pygsti/models/memberdict.py).
The working container is explicitmodel._MemberDict (an OrderedDict that
marks its parent model for parameter-vector rebuilds on mutation)."""

from pygsti_tpu.models.explicitmodel import _MemberDict as OrderedMemberDict
