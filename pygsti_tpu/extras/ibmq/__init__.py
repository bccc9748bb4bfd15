"""IBM Q interface (reference: pygsti/extras/ibmq/ibmqexperiment.py).

Requires qiskit / qiskit-ibm-runtime at runtime; the experiment container
and its checkpointing work without them so that designs can be staged and
results ingested offline.
"""

from pygsti_tpu.extras.ibmq.ibmqexperiment import IBMQExperiment
