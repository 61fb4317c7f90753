"""Custom stateful streaming operator: exact content dedup with canonical
mapping.

Structured Streaming's built-in `dropDuplicates` can only DROP duplicate
rows; a training-data pipeline wants the MAPPING — every incoming row tagged
with the canonical (first-seen) row of its content digest, so duplicates can
be counted, audited, or redirected instead of silently vanishing.

applyInPandasWithState keyed by the content digest keeps (canonical_id,
n_seen) per digest and emits one output row per INPUT row: the first arrival
becomes the canonical, later arrivals emit as duplicates pointing at it.
Replays of a micro-batch are deterministic (rows sort by id before the scan).

State is O(#distinct digests) — the inherent price of EXACT streaming dedup
(the batch job pays the same as a shuffle). For time-keyed sources,
`streaming_dedup_ttl` bounds it with an event-time digest TTL (the
sessions.py timeout pattern): a digest with no arrivals for `ttl` past the
watermark drops its state, so a later replica becomes a NEW canonical —
state is O(#digests active within one TTL window), the standard
sliding-window relaxation of exact dedup. `streaming_dedup` (no event time)
keeps NoTimeout and unbounded state.

Upgrade note: round 4 changed the group key from (digest) to the composite
(digest, is_null_text) — a state-store KEY SCHEMA change. A stream resuming
from a pre-change checkpointLocation will abort with a state schema
incompatibility; restart with a fresh checkpoint (the canonical mapping
re-bootstraps from the first post-restart arrivals).
"""

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StructField,
    StructType,
)

DEDUP_SCHEMA = StructType(
    [
        StructField("digest", LongType()),
        StructField("doc_id", LongType()),
        StructField("canonical_id", LongType()),
        StructField("is_dup", IntegerType()),
    ]
)

_STATE_SCHEMA = StructType(
    [StructField("canonical_id", LongType()), StructField("n_seen", LongType())]
)


def _make_dedup_fn(ttl_ms: int | None = None):
    """Stateful per-digest worker. With ttl_ms set, rows must carry an
    event-time `ts` column: the digest's timeout re-arms at max(ts) + ttl on
    every arrival, and a watermark-fired timeout removes the state (the
    mapping rows were already emitted — removal only forgets the canonical,
    so a post-TTL replica starts a fresh group)."""

    def fn(key, pdfs, state: GroupState):
        if ttl_ms is not None and state.hasTimedOut:
            state.remove()
            return iter([])
        digest = int(key[0])
        chunks = list(pdfs)
        rows = chunks[0] if len(chunks) == 1 else pd.concat(chunks)
        import numpy as np

        ids = rows["doc_id"].to_numpy(dtype=np.int64)
        if state.exists:
            canon, n = state.get
        else:
            # first-seen canonical == min(doc_id) of the arrival batch —
            # order-independent, so the historic sort_values pass (a pure
            # per-key Python cost at scale) is unnecessary
            canon = int(ids.min())
            n = 0
        n += len(ids)
        state.update((int(canon), int(n)))
        if ttl_ms is not None:
            # NaT (NULL event time) must not poison the max: the int64 view
            # of NaT is -2^63, which would arm a hugely negative timeout and
            # crash the micro-batch. Rows that are all-NULL on ts fall back
            # to the current watermark.
            ts = rows["ts"]
            notna = ts.notna()
            if bool(notna.any()):
                last_ms = (
                    int(ts[notna].to_numpy().view("int64").max()) // 1_000_000
                )
            else:
                last_ms = state.getCurrentWatermarkMs()
            # setTimeoutTimestamp raises (killing the whole stream) for a
            # timestamp at or below the current watermark — reachable when
            # a row within allowed lateness arrives more than ttl behind
            # the watermark, or when ttl < watermark delay. Clamp to just
            # past the watermark: the state then times out at the next
            # watermark advance, the correct semantics for an entry whose
            # TTL has already elapsed in event time.
            wm = state.getCurrentWatermarkMs()
            state.setTimeoutTimestamp(max(last_ms + ttl_ms, wm + 1))
        return iter(
            [
                pd.DataFrame(
                    {
                        "digest": pd.Series(
                            np.full(len(ids), digest), dtype="int64"
                        ),
                        "doc_id": pd.Series(ids, dtype="int64"),
                        "canonical_id": pd.Series(
                            np.full(len(ids), canon), dtype="int64"
                        ),
                        "is_dup": pd.Series(
                            (ids != canon).astype(np.int32), dtype="int32"
                        ),
                    }
                )
            ]
        )

    return fn


_dedup_fn = _make_dedup_fn(None)


def streaming_dedup(
    spark: SparkSession,
    source_dir: str,
    schema,
    text: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Streaming exact-dedup canonical mapping over a parquet document
    stream: one state entry per distinct content digest; every row emits
    tagged with its digest's canonical id."""
    from a5spark.operators.dedup import content_digest

    stream = spark.readStream.schema(schema).parquet(source_dir)
    # NULL text -> NULL digest would form a null group key and
    # int(key[0]) would fail the whole micro-batch; route nulls to a
    # sentinel digest instead. The group key is the COMPOSITE
    # (digest, is_null_text): xxhash-style digests span the full int64
    # range, so a legitimate content digest of -1 must not silently merge
    # with the null-text group — the flag keeps them separate state entries
    # while the emitted `digest` column stays a plain long.
    keyed = stream.select(
        F.col(id_col).alias("doc_id"),
        F.coalesce(content_digest(F.col(text)), F.lit(-1)).alias("digest"),
        F.col(text).isNull().cast("int").alias("is_null_text"),
    )
    return keyed.groupBy("digest", "is_null_text").applyInPandasWithState(
        _dedup_fn,
        outputStructType=DEDUP_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_dedup_ttl(
    spark: SparkSession,
    source_dir: str,
    schema,
    text: str = "text",
    id_col: str = "doc_id",
    ts_col: str = "ts",
    ttl: str = "1 hour",
    watermark: str = "10 minutes",
    source_options: dict | None = None,
) -> DataFrame:
    """Streaming exact-dedup canonical mapping with BOUNDED state for
    time-keyed sources: one state entry per content digest seen within the
    trailing `ttl` window. A digest idle past the watermark for `ttl` drops
    its state (sessions.py's EventTimeTimeout pattern) — a replica arriving
    after that becomes a new canonical, the standard sliding-window
    relaxation that keeps state O(#digests per TTL window) at any corpus
    size."""
    import pandas as _pd

    from a5spark.operators.dedup import content_digest

    ttl_ms = int(_pd.Timedelta(ttl).total_seconds() * 1000)
    # source_options passes file-source tuning through (e.g.
    # maxFilesPerTrigger to bound micro-batch size — with AvailableNow this
    # is what caps per-batch state-update volume in a backfill)
    reader = spark.readStream.schema(schema)
    for k, v in (source_options or {}).items():
        reader = reader.option(k, v)
    stream = reader.parquet(source_dir)
    keyed = stream.select(
        F.col(id_col).alias("doc_id"),
        F.col(ts_col).cast("timestamp").alias("ts"),
        F.coalesce(content_digest(F.col(text)), F.lit(-1)).alias("digest"),
        F.col(text).isNull().cast("int").alias("is_null_text"),
    )
    return (
        keyed.withWatermark("ts", watermark)
        .groupBy("digest", "is_null_text")
        .applyInPandasWithState(
            _make_dedup_fn(ttl_ms),
            outputStructType=DEDUP_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
