"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)    — flagship spatial aggregation over the synthetic image table
                  derived from /root/testdata/sf0.001.
queries()       — operator registry (see a5spark/entry_queries.py).
oracle_sql()    — DuckDB oracles for the ANSI-SQL-expressible queries;
                  cell-encode queries are pinned instead by the kernel fixture
                  tests (tests/test_kernels.py) since the A5 projection chain
                  is not SQL-expressible.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from a5spark.entry_queries import QUERIES

    return QUERIES["cell_density_r7"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from a5spark import cache
    from a5spark.entry_queries import QUERIES

    def wrap(fn):
        def run(spark, sf_dir):
            # release the PREVIOUS query's registered persists before building
            # the next pipeline, so a driver running the whole registry in one
            # session doesn't accumulate executor storage (the frames a query
            # persists stay cached until its successor starts)
            cache.release_persisted()
            return fn(spark, sf_dir)

        return run

    return {name: wrap(fn) for name, fn in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    from a5spark.entry_queries import ORACLES

    return dict(ORACLES)
