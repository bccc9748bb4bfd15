"""Data: outcome-count datasets and simulated data generation."""

from pygsti_tpu.data.dataset import DataSet
from pygsti_tpu.data.datasetconstruction import simulate_data
from pygsti_tpu.data.multidataset import MultiDataSet
