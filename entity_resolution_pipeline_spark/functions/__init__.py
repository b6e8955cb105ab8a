"""Scalar/vectorized function layer.

Pure-Python kernels (hashing, similarity, year regexes, text normalization)
plus their pandas-UDF wrappers. Kernels are kept importable without Spark so
unit tests stay fast.
"""
