"""a5spark: a PySpark-native spatial-join + tiling engine on the A5 DGGS."""

__version__ = "0.1.0"
