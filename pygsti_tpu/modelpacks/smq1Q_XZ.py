"""Model pack: 1 qubit, X(pi/2) and Z(pi/2) gates
(reference: pygsti/modelpacks/smq1Q_XZ.py)."""

from pygsti_tpu.modelpacks._modelpack import GSTModelPack


class _Pack(GSTModelPack):
    _nqubits = 1
    _gates = ['Gxpi2', 'Gzpi2']
    _include_idle = False
    _germs = ['Gxpi2:0@(0)', 'Gzpi2:0@(0)', 'Gxpi2:0Gzpi2:0@(0)',
              'Gxpi2:0Gxpi2:0Gzpi2:0@(0)']
    _germs_lite = _germs
    _prep_fids = ['{}@(0)', 'Gxpi2:0@(0)', 'Gxpi2:0Gzpi2:0@(0)', 'Gxpi2:0Gxpi2:0@(0)',
                  'Gxpi2:0Gzpi2:0Gzpi2:0@(0)', 'Gxpi2:0Gzpi2:0Gzpi2:0Gzpi2:0@(0)']
    _meas_fids = ['{}@(0)', 'Gxpi2:0@(0)', 'Gzpi2:0Gxpi2:0@(0)', 'Gxpi2:0Gxpi2:0@(0)',
                  'Gzpi2:0Gzpi2:0Gxpi2:0@(0)', 'Gzpi2:0Gzpi2:0Gzpi2:0Gxpi2:0@(0)']


target_model = _Pack.target_model
processor_spec = _Pack.processor_spec
germs = _Pack.germs
prep_fiducials = _Pack.prep_fiducials
meas_fiducials = _Pack.meas_fiducials
create_gst_experiment_design = _Pack.create_gst_experiment_design
