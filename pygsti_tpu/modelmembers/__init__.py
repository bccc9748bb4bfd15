"""Model members: pure-function parameterizations of operations/states/POVMs."""

from pygsti_tpu.modelmembers.modelmember import ModelMember
from pygsti_tpu.modelmembers import operations
from pygsti_tpu.modelmembers import states
from pygsti_tpu.modelmembers import povms
from pygsti_tpu.modelmembers import instruments
from pygsti_tpu.modelmembers.modelmembergraph import ModelMemberGraph
