"""Scalar function layer: pure kernels, native column fns, pandas UDFs."""

from . import hashing, kernels, native  # noqa: F401
