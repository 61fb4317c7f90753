"""Scoped registry for DataFrames persisted inside lazily-returned pipelines.

Query builders can't unpersist before their result is collected, so they
register persisted frames here and the caller (bench loop, tests, pipeline
driver) releases them once the result has been materialized.

The registry is a SCOPE STACK, not one process-global list: `persist()`
registers into the innermost open scope, and `release_persisted()` (or
leaving a `with cache.scope():` block) only unpersists frames registered in
that scope. That makes interleaving safe — materialize query A, release it,
then materialize independently-built query B — where a flat global list
would have silently dropped B's persisted intermediates mid-use.
"""

from contextlib import contextmanager

from pyspark.sql import DataFrame

# innermost scope is _SCOPES[-1]; the root scope always exists so bare
# persist()/release_persisted() keep working without an explicit scope()
_SCOPES: list[list[DataFrame]] = [[]]


def persist(df: DataFrame) -> DataFrame:
    """persist() + register in the innermost scope for deferred release."""
    df.persist()
    _SCOPES[-1].append(df)
    return df


def register_broadcast(bc):
    """Register a SparkContext Broadcast handle in the innermost scope; it is
    unpersist()ed with the scope so long-lived sessions (bench loops,
    services) don't accumulate broadcast blocks on driver/executors.
    unpersist — NOT destroy: a returned DataFrame whose lineage closes over
    the broadcast (matmul scorers, ivf listers, PIP refine) stays
    recomputable after release (Spark re-broadcasts on demand); destroy()
    would make any re-collect fail with 'Broadcast used after destroy'.
    Callers that truly tear down own the explicit bc.destroy()."""
    _SCOPES[-1].append(bc)
    return bc


def _release(frames: list) -> int:
    n = 0
    while frames:
        obj = frames.pop()
        try:
            if isinstance(obj, DataFrame):
                obj.unpersist()
            elif hasattr(obj, "unpersist"):  # Broadcast handle (duck-typed)
                obj.unpersist(blocking=False)
            n += 1
        except Exception:
            pass
    return n


def release_persisted() -> int:
    """Unpersist every frame registered in the INNERMOST scope only."""
    return _release(_SCOPES[-1])


@contextmanager
def scope():
    """Context manager: frames persisted inside are released on exit, and a
    release inside the block cannot touch frames of any enclosing pipeline."""
    frames: list[DataFrame] = []
    _SCOPES.append(frames)
    try:
        yield frames
    finally:
        _SCOPES.pop()
        _release(frames)
