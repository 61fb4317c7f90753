"""Similarity search over embedding columns (array<float>).

Operators:
  brute_force_topk      exact cosine top-k: blocked numpy matmul per Arrow
                        batch against the broadcast query matrix, per-batch
                        partial top-k, global window reduction;
  quantized_topk        int64-quantized dot-product top-k — scores bit-exact
                        across engines (the oracle-checked variant);
  lsh_bucket_topk       random-hyperplane LSH bucketing: candidates only from
                        matching buckets — the 100 TB scale path (bucket
                        equi-join instead of a cross join).

Scale notes: brute force shuffles only |Q| * k * n_batches candidate rows —
usable while the query matrix broadcasts; the LSH path shuffles each side
once on (bucket) and joins per bucket. JVM-side zip_with/aggregate helpers
(dot/norm/cosine) remain for per-pair column expressions.
"""

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from a5spark.operators.dedup import content_digest


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0).cast("double"), lambda acc, v: acc + v * v)
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def _matmul_candidates(
    queries: DataFrame,
    points: DataFrame,
    k: int,
    query_id: str,
    point_id: str,
    vec: str,
    quantized: bool,
    scale: int = 1000,
) -> DataFrame:
    """Blocked-matmul scoring: the (small) query matrix is broadcast to every
    task; each Arrow batch of points scores against ALL queries with one
    numpy matmul and emits only its per-query top-k — candidates are then
    reduced by a global window. Shuffle volume: |Q| * k * n_batches rows.

    quantized=True scores with exact int64 dot products of round(x * scale)
    vectors (engine-portable); otherwise float64 cosine."""
    import pandas as pd
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    qpdf = queries.select(query_id, vec).toPandas()
    q_ids = qpdf[query_id].to_numpy()
    q_mat = np.stack(qpdf[vec].to_numpy()).astype(np.float64)
    if quantized:
        q_mat = np.round(q_mat * scale).astype(np.int64)
    else:
        q_mat = q_mat / np.linalg.norm(q_mat, axis=1, keepdims=True)
    spark = queries.sparkSession
    bc = spark.sparkContext.broadcast((q_ids, q_mat))

    schema = StructType(
        [
            StructField(query_id, LongType()),
            StructField(point_id, LongType()),
            StructField("score", DoubleType() if not quantized else LongType()),
        ]
    )

    def score(batches):
        ids, mat = bc.value
        for pdf in batches:
            p_ids = pdf[point_id].to_numpy()
            p_mat = np.stack(pdf[vec].to_numpy()).astype(np.float64)
            if quantized:
                p_mat = np.round(p_mat * scale).astype(np.int64)
            else:
                norms = np.linalg.norm(p_mat, axis=1, keepdims=True)
                p_mat = p_mat / np.where(norms > 0, norms, 1.0)
            out_q, out_p, out_s = [], [], []
            for lo in range(0, p_mat.shape[0], 8192):
                chunk = p_mat[lo : lo + 8192]
                scores = mat @ chunk.T  # (Q, B)
                kk = min(k, chunk.shape[0])
                top = np.argpartition(-scores, kk - 1, axis=1)[:, :kk]
                for qi in range(mat.shape[0]):
                    sel = top[qi]
                    out_q.extend([ids[qi]] * len(sel))
                    out_p.extend(p_ids[lo + sel])
                    out_s.extend(scores[qi, sel])
            yield pd.DataFrame({query_id: out_q, point_id: out_p, "score": out_s})

    return points.select(point_id, vec).mapInPandas(score, schema)


def brute_force_topk(
    queries: DataFrame,
    points: DataFrame,
    k: int,
    query_id: str = "q_id",
    point_id: str = "vec_id",
    vec: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k of each query against all points: blocked numpy
    matmul per Arrow batch + global window reduction."""
    cand = _matmul_candidates(queries, points, k, query_id, point_id, vec, False)
    w = Window.partitionBy(query_id).orderBy(F.desc("score"), F.asc(point_id))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .withColumnRenamed("score", "cos_sim")
    )


def quantize(vec: Column, scale: int = 1000) -> Column:
    """array<float> -> array<long> by round(x * scale) — exact cross-engine."""
    return F.transform(vec, lambda x: F.round(x.cast("double") * scale).cast("long"))


def quantized_topk(
    queries: DataFrame,
    points: DataFrame,
    k: int,
    query_id: str = "q_id",
    point_id: str = "vec_id",
    vec: str = "embedding",
) -> DataFrame:
    """Integer-quantized dot-product top-k (deterministic tie-break by id):
    exact int64 scores, bit-identical to the ANSI-SQL formulation (the
    oracle-checked ANN variant)."""
    cand = _matmul_candidates(queries, points, k, query_id, point_id, vec, True)
    w = Window.partitionBy(query_id).orderBy(F.desc("score"), F.asc(point_id))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .withColumnRenamed("score", "qdot")
    )


def hyperplane_bucket(vec: Column, n_bits: int = 8, dim: int = 0) -> Column:
    """Random-hyperplane LSH bucket id: bit b = sign of dot(vec, h_b) where
    h_b components derive from digest(b, i) — deterministic, engine-portable.

    Uses +-1 hyperplane components (digest parity), so the dot product is a
    signed sum of vector components — cheap and SQL-reproducible."""
    bits = []
    for b in range(n_bits):
        # component sign for (b, i): parity of digest
        signed_sum = F.aggregate(
            F.transform(
                vec,
                lambda x, i: F.when(
                    content_digest(
                        F.concat(F.lit(f"{b}|"), i.cast("string"))
                    ).bitwiseAND(F.lit(1))
                    == 1,
                    x.cast("double"),
                ).otherwise(-x.cast("double")),
            ),
            F.lit(0.0).cast("double"),
            lambda acc, v: acc + v,
        )
        bits.append(F.when(signed_sum > 0, F.lit(1 << b)).otherwise(F.lit(0)))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def lsh_bucket_topk(
    queries: DataFrame,
    points: DataFrame,
    k: int,
    n_bits: int = 8,
    query_id: str = "q_id",
    point_id: str = "vec_id",
    vec: str = "embedding",
) -> DataFrame:
    """ANN top-k restricted to the query's LSH bucket (single-probe).
    Recall is tunable via n_bits; multi-probe = union over neighbor buckets."""
    q = queries.select(
        F.col(query_id),
        F.col(vec).alias("q_vec"),
        hyperplane_bucket(F.col(vec), n_bits).alias("bucket"),
    )
    p = points.select(
        F.col(point_id),
        F.col(vec),
        hyperplane_bucket(F.col(vec), n_bits).alias("bucket"),
    )
    cand = q.join(p, "bucket")
    cand = cand.withColumn("cos_sim", cosine(F.col("q_vec"), F.col(vec)))
    w = Window.partitionBy(query_id).orderBy(F.desc("cos_sim"), F.asc(point_id))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .drop("q_vec", vec)
    )
