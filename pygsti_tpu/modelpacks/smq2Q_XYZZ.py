"""Model pack: 1Q X/Y(pi/2) + ZZ(pi/2) entangling gate
(reference: pygsti/modelpacks/smq2Q_XYZZ.py; germ/fiducial data dumped from the
reference implementation for parity)."""

from pygsti_tpu.modelpacks._modelpack import GSTModelPack


class _Pack(GSTModelPack):
    _nqubits = 2
    _gates = ['Gxpi2', 'Gypi2', 'Gzz']
    _include_idle = False

    _germs = ['Gxpi2:0@(0,1)', 'Gypi2:0@(0,1)', 'Gxpi2:1@(0,1)',
              'Gypi2:1@(0,1)', 'Gzz:0:1@(0,1)', 'Gxpi2:0Gypi2:0@(0,1)',
              'Gxpi2:1Gypi2:1@(0,1)', 'Gxpi2:0Gxpi2:0Gypi2:0@(0,1)',
              'Gxpi2:1Gxpi2:1Gypi2:1@(0,1)',
              'Gzz:0:1Gxpi2:1Gxpi2:0Gxpi2:0@(0,1)',
              'Gxpi2:0Gxpi2:1Gypi2:1Gxpi2:0Gypi2:1Gypi2:0@(0,1)',
              'Gxpi2:0Gypi2:1Gxpi2:1Gypi2:0Gxpi2:1Gxpi2:1@(0,1)',
              'Gypi2:0Gypi2:1Gxpi2:0Gypi2:0Gxpi2:0Gzz:0:1@(0,1)',
              'Gypi2:0Gxpi2:0Gypi2:1Gxpi2:0Gxpi2:1Gxpi2:0Gypi2:0Gypi2:1@(0,1)']

    _germs_lite = ['Gxpi2:0@(0,1)', 'Gypi2:0@(0,1)', 'Gxpi2:1@(0,1)',
              'Gypi2:1@(0,1)', 'Gzz:0:1@(0,1)', 'Gxpi2:0Gypi2:0@(0,1)',
              'Gxpi2:1Gypi2:1@(0,1)', 'Gxpi2:0Gxpi2:0Gypi2:0@(0,1)',
              'Gxpi2:1Gxpi2:1Gypi2:1@(0,1)',
              'Gzz:0:1Gxpi2:1Gxpi2:0Gxpi2:0@(0,1)',
              'Gxpi2:0Gxpi2:1Gypi2:1Gxpi2:0Gypi2:1Gypi2:0@(0,1)',
              'Gxpi2:0Gypi2:1Gxpi2:1Gypi2:0Gxpi2:1Gxpi2:1@(0,1)',
              'Gypi2:0Gypi2:1Gxpi2:0Gypi2:0Gxpi2:0Gzz:0:1@(0,1)',
              'Gypi2:0Gxpi2:0Gypi2:1Gxpi2:0Gxpi2:1Gxpi2:0Gypi2:0Gypi2:1@(0,1)']

    _prep_fids = ['{}@(0,1)', 'Gxpi2:1@(0,1)', 'Gypi2:1@(0,1)',
              'Gxpi2:1Gxpi2:1@(0,1)', 'Gxpi2:0@(0,1)',
              'Gxpi2:0Gxpi2:1@(0,1)', 'Gxpi2:0Gypi2:1@(0,1)',
              'Gxpi2:0Gxpi2:1Gxpi2:1@(0,1)', 'Gypi2:0@(0,1)',
              'Gypi2:0Gxpi2:1@(0,1)', 'Gypi2:0Gypi2:1@(0,1)',
              'Gypi2:0Gxpi2:1Gxpi2:1@(0,1)', 'Gxpi2:0Gxpi2:0@(0,1)',
              'Gxpi2:0Gxpi2:0Gxpi2:1@(0,1)', 'Gxpi2:0Gxpi2:0Gypi2:1@(0,1)',
              'Gxpi2:0Gxpi2:0Gxpi2:1Gxpi2:1@(0,1)']

    _meas_fids = ['{}@(0,1)', 'Gxpi2:1@(0,1)', 'Gypi2:1@(0,1)',
              'Gxpi2:1Gxpi2:1@(0,1)', 'Gxpi2:0@(0,1)', 'Gypi2:0@(0,1)',
              'Gxpi2:0Gxpi2:0@(0,1)', 'Gxpi2:0Gxpi2:1@(0,1)',
              'Gxpi2:0Gypi2:1@(0,1)', 'Gypi2:0Gxpi2:1@(0,1)',
              'Gypi2:0Gypi2:1@(0,1)']


target_model = _Pack.target_model
processor_spec = _Pack.processor_spec
germs = _Pack.germs
prep_fiducials = _Pack.prep_fiducials
meas_fiducials = _Pack.meas_fiducials
create_gst_experiment_design = _Pack.create_gst_experiment_design
