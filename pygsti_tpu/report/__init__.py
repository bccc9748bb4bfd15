"""Reporting: reportable metrics + HTML report generation."""

from pygsti_tpu.report import reportables
from pygsti_tpu.report.factory import construct_standard_report, Report
from pygsti_tpu.report.fogidiagram import FOGIDiagram
from pygsti_tpu.report import vbplot
from pygsti_tpu.report.modelfunction import ModelFunction, modelfn_factory
from pygsti_tpu.report import colormaps
from pygsti_tpu.report.reportableqty import ReportableQty
