"""U3-compilation helpers import-path parity (reference:
pygsti/tools/compilationtools.py); implementations in
processors/random_compilation.py."""

from pygsti_tpu.processors.random_compilation import (mod_2pi,
                                                      u3_angles_from_unitary,
                                                      inverse_u3)
