"""Implicit-model import-path parity (reference:
pygsti/models/implicitmodel.py).  The working implicit models are
LocalNoiseModel and CloudNoiseModel (layer operators built on demand from
block recipes)."""

from pygsti_tpu.models.localnoisemodel import LocalNoiseModel as ImplicitOpModel
from pygsti_tpu.models.localnoisemodel import LocalNoiseModel
from pygsti_tpu.models.cloudnoisemodel import CloudNoiseModel
