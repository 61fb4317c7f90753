"""Vectorized numpy kernels for the A5 pentagonal DGGS.

Pure-numpy layer (no Spark imports): these kernels are consumed by
Arrow-batched pandas UDFs in a5spark.functions and are independently
testable against the reference fixtures.
"""
