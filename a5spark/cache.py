"""Registry for DataFrames persisted inside lazily-returned query pipelines.

Query builders can't unpersist before their result is collected, so they
register persisted frames here and the caller (bench loop, tests, pipeline
driver) releases them once the result has been materialized.
"""

from pyspark.sql import DataFrame

_PERSISTED: list[DataFrame] = []


def persist(df: DataFrame) -> DataFrame:
    """persist() + register for deferred release."""
    df.persist()
    _PERSISTED.append(df)
    return df


def release_persisted() -> int:
    """Unpersist every registered frame; returns how many were released."""
    n = 0
    while _PERSISTED:
        df = _PERSISTED.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:
            pass
    return n
