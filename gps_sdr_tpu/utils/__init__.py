"""Utilities: metrics, report formatting."""

from gps_sdr_tpu.utils.metrics import cn0_series, format_acquisition_table

__all__ = ["cn0_series", "format_acquisition_table"]
