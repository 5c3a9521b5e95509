"""gorilla_tsc_spark — a PySpark-native time-series rollup/downsample/
retention engine whose core is a bit-exact reimplementation of the
gorilla-tsc compression codec as vectorized Arrow UDF kernels.
"""

__version__ = "0.1.0"
