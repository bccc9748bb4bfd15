"""Legacy model packs with positional gate names ('Gx', 'Gix', ...)
and sslbl-free circuits (reference: pygsti/modelpacks/legacy/).

Import the individual modules, e.g.::

    from pygsti_tpu.modelpacks.legacy import std1Q_XYI
"""
