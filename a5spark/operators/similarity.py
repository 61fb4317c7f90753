"""Similarity search over embedding columns (array<float>).

Operators:
  brute_force_topk      exact cosine top-k, JVM-side zip_with/aggregate dot
                        products (no Python in the hot path);
  quantized_topk        int-quantized dot-product top-k — bit-exact across
                        engines (the oracle-checked variant);
  lsh_bucket_topk       random-hyperplane LSH bucketing: candidates only from
                        matching buckets — the 100 TB scale path (bucket
                        equi-join instead of a cross join).

Scale notes: brute force is O(|Q| x |P|) — usable only when Q is broadcast-
small; the LSH path shuffles each side once on (bucket) and joins per bucket.
"""

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


def brute_force_topk(
    queries: DataFrame,
    points: DataFrame,
    k: int,
    query_id: str = "q_id",
    point_id: str = "vec_id",
    vec: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k of each query against all points (queries broadcast)."""
    q = F.broadcast(
        queries.select(F.col(query_id), F.col(vec).alias("q_vec"))
    )
    cand = q.crossJoin(points.select(F.col(point_id), F.col(vec)))
    cand = cand.withColumn("cos_sim", cosine(F.col("q_vec"), F.col(vec)))
    w = Window.partitionBy(query_id).orderBy(F.desc("cos_sim"), F.asc(point_id))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .drop("q_vec", vec)
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
    """Integer-quantized dot-product top-k (deterministic tie-break by id)."""
    q = F.broadcast(
        queries.select(F.col(query_id), quantize(F.col(vec)).alias("q_vec"))
    )
    p = points.select(F.col(point_id), quantize(F.col(vec)).alias("p_vec"))
    cand = q.crossJoin(p)
    idot = F.aggregate(
        F.zip_with("q_vec", "p_vec", lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    cand = cand.withColumn("qdot", idot)
    w = Window.partitionBy(query_id).orderBy(F.desc("qdot"), F.asc(point_id))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .drop("q_vec", "p_vec")
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
