"""pygsti_tpu — a TPU-native (JAX/XLA/Pallas) quantum characterization framework.

A ground-up rebuild of the capabilities of sandialabs/pyGSTi (Gate Set
Tomography, Randomized Benchmarking, Robust Phase Estimation, model testing,
drift analysis, volumetric benchmarks and reporting) designed for TPU
hardware: model parameterizations are pure ``theta -> operator tensor``
functions, circuit evaluation is batched ``lax.scan`` state propagation over
compiled circuit index tensors, derivatives come from ``jax.jacfwd`` and
parallelism is expressed with ``jax.sharding`` device meshes instead of MPI.

Reference layer map: see SURVEY.md; top-level API mirrors pyGSTi's
(pygsti/__init__.py in the reference) where it makes sense.
"""

import os as _os

import jax as _jax

# GST is a precision instrument: on TPU, jax's DEFAULT f32 matmul precision
# uses bf16 passes, which measurably limits LM convergence (the 2Q benchmark
# stalls at Nsigma ~220 instead of reaching the statistical optimum ~2).
# Full-precision f32 matmuls cost nothing measurable on the hot paths here
# (small-dimension PTM algebra; the f64 paths are unaffected), so default to
# 'highest'.  Override with PYGSTI_TPU_MATMUL_PRECISION=default|high|highest.
_jax.config.update('jax_default_matmul_precision',
                   _os.environ.get('PYGSTI_TPU_MATMUL_PRECISION', 'highest'))

from pygsti_tpu import baseobjs
from pygsti_tpu import tools
from pygsti_tpu import circuits
from pygsti_tpu import processors
from pygsti_tpu import modelmembers
from pygsti_tpu import models
from pygsti_tpu import layouts
from pygsti_tpu import forwardsims
from pygsti_tpu import objectivefns
from pygsti_tpu import optimize
from pygsti_tpu import algorithms
from pygsti_tpu import data
from pygsti_tpu import protocols
from pygsti_tpu import drivers
from pygsti_tpu import io
from pygsti_tpu import report
from pygsti_tpu import serialization
from pygsti_tpu import leakage

# reference-style short aliases (pygsti/__init__.py)
from pygsti_tpu import algorithms as alg
from pygsti_tpu import modelmembers as mm
from pygsti_tpu import report as rpt

# headline algorithm entry points at the top level (reference exposes
# algorithms.core/gaugeopt/contract/grammatrix via star-imports)
from pygsti_tpu.algorithms.core import run_lgst, run_iterative_gst
from pygsti_tpu.algorithms.gaugeopt import gaugeopt_to_target
from pygsti_tpu.algorithms.contract import contract
from pygsti_tpu.algorithms.grammatrix import (max_gram_basis,
                                              max_gram_rank_and_eigenvalues)

from pygsti_tpu.baseobjs.label import Label
from pygsti_tpu.circuits.circuit import Circuit
from pygsti_tpu.data.dataset import DataSet
from pygsti_tpu.data.datasetconstruction import simulate_data

# one-call drivers (reference: pygsti/__init__.py exposes these at top level)
from pygsti_tpu.drivers.longsequence import (run_long_sequence_gst,
                                             run_stdpractice_gst,
                                             run_model_test,
                                             run_linear_gst)

__version__ = "0.1.0"
