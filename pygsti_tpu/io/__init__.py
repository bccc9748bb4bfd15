"""I/O: text formats for datasets and circuit lists (reference: pygsti/io/)."""

from pygsti_tpu.io.readers import (read_dataset, read_circuit_list, load_dataset,
                                   load_circuit_list, read_multidataset,
                                   load_multidataset, read_time_dependent_dataset)
from pygsti_tpu.io.writers import (write_dataset, write_circuit_list,
                                   write_multidataset, write_empty_dataset)
from pygsti_tpu.io.stdinput import StdInputParser
from pygsti_tpu.io import metadir
from pygsti_tpu.io import mongodb
