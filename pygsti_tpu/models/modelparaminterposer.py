"""Parameter interposers: a linear map between a model's parameter vector
and its members' parameters (reference:
pygsti/models/modelparaminterposer.py).

In pygsti_tpu a model's `tensors_fn` is already an arbitrary pure function
of theta, so an interposer composes as a plain linear transform applied
before member evaluation."""

from __future__ import annotations

import numpy as np


class ModelParamsInterposer(object):
    """Base interposer (reference: modelparaminterposer.py:17)."""

    def __init__(self, num_params, num_op_params):
        self.num_params = num_params
        self.num_op_params = num_op_params

    def model_paramvec_to_ops_paramvec(self, v):
        return v

    def ops_paramvec_to_model_paramvec(self, w):
        return w

    def deriv_op_params_wrt_model_params(self):
        return np.eye(self.num_op_params, self.num_params)


class LinearInterposer(ModelParamsInterposer):
    """w = M v linear interposer (reference:
    modelparaminterposer.LinearInterposer)."""

    def __init__(self, transform_matrix):
        M = np.asarray(transform_matrix)
        super().__init__(M.shape[1], M.shape[0])
        self.transform_matrix = M
        self._pinv = np.linalg.pinv(M)

    def model_paramvec_to_ops_paramvec(self, v):
        return self.transform_matrix @ np.asarray(v)

    def ops_paramvec_to_model_paramvec(self, w):
        return self._pinv @ np.asarray(w)

    def deriv_op_params_wrt_model_params(self):
        return self.transform_matrix
