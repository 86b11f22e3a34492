"""Numeric kernels: series algebra, (co)moment reduction, conversions, bootstrap."""

from . import convert, moments, resample, series

__all__ = ["convert", "moments", "resample", "series"]
