"""Legacy config-driven robust phase estimation (reference:
pygsti/extras/rpe/)."""

from pygsti_tpu.extras.rpe.rpeconfig import RPEconfig
from pygsti_tpu.extras.rpe.rpeconfig_gxpi2_gypi2_00 import (
    rpeconfig_gxpi2_gypi2_00)
from pygsti_tpu.extras.rpe import rpetools
from pygsti_tpu.extras.rpe import rpeconstruction
