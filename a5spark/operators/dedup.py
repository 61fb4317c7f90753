"""Deduplication operators for large-scale training-data pipelines.

All hash derivations use md5 (available identically in Spark, DuckDB and
Python) with integers taken from the leading 15 hex chars — deterministic,
engine-portable, and overflow-safe in int64. Every operator is a declarative
DataFrame transform:

  exact:    hash-groupBy on content digest (two-phase agg, no skew risk —
            digests are uniform);
  minhash:  shingle explode -> per-(doc, seed) min over hashed shingles ->
            band signature -> bucket equi-join for candidate pairs;
  simhash:  token explode -> per-bit weighted sums -> sign -> Hamming bucket;
  ngram-jaccard: shingle-set overlap of candidate pairs (exact verify step).

Scale notes: minhash shuffle volume = docs x n_hashes rows (grouped
map-side); candidate-pair generation joins on (band_idx, band_hash) which is
uniformly distributed by construction. Self-joins use id< id ordering to halve
the pair space.
"""

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from a5spark.functions.native import _shl, _shru
from a5spark.operators.util import spread as _spread


def content_digest(col) -> Column:
    """Portable 60-bit integer digest of a string column."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def exact_dedup(df: DataFrame, text: str = "text", id_col: str = "doc_id") -> DataFrame:
    """One row per distinct content: keeps the smallest id, counts copies."""
    return (
        df.groupBy(content_digest(F.col(text)).alias("digest"))
        .agg(
            F.min(id_col).alias("keeper_id"),
            F.count(F.lit(1)).cast("long").alias("n_copies"),
        )
    )


def shingles(df: DataFrame, text: str = "text", k: int = 5, id_col: str = "doc_id") -> DataFrame:
    """Character k-gram shingle relation (doc_id, shingle). JVM-side:
    sequence + substring explode, no UDF."""
    pos = F.explode(
        F.sequence(F.lit(1), F.greatest(F.lit(1), F.length(F.col(text)) - (k - 1)))
    ).alias("pos")
    return df.select(F.col(id_col), F.col(text), pos).select(
        F.col(id_col), F.substring(F.col(text), F.col("pos"), k).alias("shingle")
    )


_MH_PRIME = 2147483647  # 2^31 - 1: a*h + b stays under 2^63 for 31-bit a, h


def minhash_params(n_hashes: int) -> list:
    """Deterministic (a, b) coefficients of the n universal-hash
    permutations h -> (a*h + b) mod P, derived from md5 seeds exactly like
    hyperplane_signs — reproducible in any engine as baked literals."""
    import hashlib

    def _d(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    return [
        (_d(f"mh:a:{i}") % (_MH_PRIME - 1) + 1, _d(f"mh:b:{i}") % _MH_PRIME)
        for i in range(n_hashes)
    ]


def minhash_signatures(
    df: DataFrame,
    n_hashes: int = 16,
    k: int = 5,
    text: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, seed, minhash): min over shingles of the seed-th universal
    hash (a_seed * digest(shingle) + b_seed) mod 2^31-1.

    ONE md5 digest per distinct (doc, shingle); the n_hashes permutations
    are integer multiply-adds folded into n parallel min() aggregates of a
    single groupBy(doc) — no per-seed row explode. The earlier
    digest(seed || shingle) formulation evaluated an md5 + string concat +
    base conversion per (shingle, seed) row: measured 38-50 s of
    minhash_lsh's 43 s at sf1 (117M interpreted hash rows); this form is
    arithmetic after the one digest pass and map-side-combines to
    docs x n_hashes rows of shuffle.

    No shingle dedup: min() is idempotent over duplicates, so the signature
    of the shingle multiset equals that of the set — the historic
    dropDuplicates paid a full (doc, shingle-string) shuffle (measured
    ~29 s of the signature stage at sf1) for nothing. The exact-jaccard
    verify step keeps its own distinct (set semantics matter there)."""
    params = minhash_params(n_hashes)
    sh = shingles(_spread(df), text, k, id_col)
    base = sh.select(
        F.col(id_col),
        (content_digest(F.col("shingle")) % F.lit(_MH_PRIME)).alias("__h"),
    )
    wide = base.groupBy(id_col).agg(
        *[
            F.min((F.lit(a) * F.col("__h") + F.lit(b)) % F.lit(_MH_PRIME)).alias(
                f"__mh{i}"
            )
            for i, (a, b) in enumerate(params)
        ]
    )
    return wide.select(
        F.col(id_col),
        F.posexplode(F.array(*[F.col(f"__mh{i}") for i in range(n_hashes)])).alias(
            "seed", "minhash"
        ),
    )


def minhash_bands(
    signatures: DataFrame, band_size: int = 4, id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, band_idx, band_hash): concatenated per-band signature hash."""
    banded = signatures.withColumn(
        "band_idx", (F.col("seed") / band_size).cast("int")
    )
    return (
        banded.groupBy(id_col, "band_idx")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("seed", "minhash"))
            ).alias("sig")
        )
        .select(
            F.col(id_col),
            F.col("band_idx"),
            content_digest(
                F.array_join(F.transform("sig", lambda s: s["minhash"].cast("string")), ",")
            ).alias("band_hash"),
        )
    )


def lsh_candidate_pairs(bands: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Near-duplicate candidate pairs: docs sharing any LSH band bucket."""
    from a5spark import cache

    # both self-join sides reference `bands` — persist so the full
    # signature pipeline (shingle explode -> n_hashes mins -> band hash)
    # evaluates once, not once per side (docs x n_bands rows, tiny)
    bands = cache.persist(bands)
    a = bands.select(
        F.col("band_idx"), F.col("band_hash"), F.col(id_col).alias("id_a")
    )
    b = bands.select(
        F.col("band_idx"), F.col("band_hash"), F.col(id_col).alias("id_b")
    )
    return (
        a.join(b, ["band_idx", "band_hash"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def simhash(
    df: DataFrame, bits: int = 16, text: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """bits-wide simhash over whitespace tokens: bit b set iff the sum of
    (+-1 per token, sign of token-hash bit b) is positive."""
    tokens = _spread(df).select(
        F.col(id_col),
        F.explode(F.split(F.trim(F.col(text)), r"\s+")).alias("tok"),
    ).filter(F.length("tok") > 0)
    tokens = tokens.withColumn("h", content_digest(F.col("tok")))
    bit = F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("bit")
    contrib = tokens.select(F.col(id_col), F.col("h"), bit).withColumn(
        "delta",
        (_shru(F.col("h"), F.col("bit")).bitwiseAND(F.lit(1)) * 2 - 1),
    )
    sums = contrib.groupBy(id_col, "bit").agg(F.sum("delta").alias("s"))
    return sums.groupBy(id_col).agg(
        F.sum(
            F.when(F.col("s") > 0, _shl(F.lit(1), F.col("bit"))).otherwise(0)
        ).alias("simhash")
    )


def simhash_neardup(
    df: DataFrame,
    bits: int = 16,
    bands: int = 4,
    max_hamming: int = 3,
    text: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """SimHash near-duplicate JOIN: band each signature into `bands` slices
    (pigeonhole: any pair within max_hamming < bands differs in at most
    bands-1 slices, so it collides on at least one band), bucket-join on
    (band_idx, slice), then verify hamming distance exactly via
    bit_count(xor). All JVM bit arithmetic — no all-pairs comparison."""
    assert bits % bands == 0, "bits must split evenly into bands"
    assert max_hamming < bands, (
        "pigeonhole completeness requires max_hamming < bands: a pair may "
        "differ in up to max_hamming distinct band slices"
    )
    width = bits // bands
    sig = simhash(df, bits, text, id_col)
    band_idx = F.explode(F.sequence(F.lit(0), F.lit(bands - 1))).alias("band_idx")
    from a5spark import cache

    # persisted: the banded signature relation feeds BOTH self-join sides —
    # without it each side re-runs the token explode + per-bit aggregation
    banded = cache.persist(
        sig.select(F.col(id_col), F.col("simhash"), band_idx).withColumn(
            "slice",
            _shru(F.col("simhash"), F.col("band_idx") * width).bitwiseAND(
                F.lit((1 << width) - 1)
            ),
        )
    )
    a = banded.select(
        "band_idx", "slice", F.col(id_col).alias("id_a"), F.col("simhash").alias("sig_a")
    )
    b = banded.select(
        "band_idx", "slice", F.col(id_col).alias("id_b"), F.col("simhash").alias("sig_b")
    )
    cand = (
        a.join(b, ["band_idx", "slice"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sig_a", "sig_b")
        .distinct()
    )
    return (
        cand.withColumn(
            "hamming", F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b"))).cast("int")
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def jaccard_pairs(
    pairs: DataFrame, docs: DataFrame, k: int = 5, text: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact shingle-Jaccard similarity for candidate pairs (verify step).
    Shingles are computed only for docs that appear in a candidate pair —
    the verify cost scales with the candidate set, not the corpus.

    The set algebra runs on 60-bit shingle DIGESTS held as one sorted array
    per doc: each pair evaluates size(array_intersect(sa, sb)) inline — no
    47M-row shingle-join explosion and no per-pair groupBy (measured 6.6 s
    vs 19.9 s for the join form at sf1, 317k pairs). Counts are exact up to
    md5 collisions — deterministic, and the oracle SQL's equivalent
    distinct-join formulation produces identical values."""
    from a5spark import cache

    # persisted: `pairs` is referenced THREE times (both candidate-id arms
    # and the final pair join) and each reference otherwise re-runs the
    # whole LSH pipeline; `sets_df` feeds both join sides of the verify
    pairs = cache.persist(pairs)
    cand_ids = (
        pairs.select(F.col("id_a").alias(id_col))
        .unionByName(pairs.select(F.col("id_b").alias(id_col)))
        .distinct()
    )
    # no forced broadcast: the candidate-id set is unbounded (it scales with
    # near-dup density), so let the optimizer pick broadcast vs shuffle
    docs = _spread(docs.join(cand_ids, id_col, "left_semi"))
    sets_df = cache.persist(
        shingles(docs, text, k, id_col)
        .select(F.col(id_col), content_digest(F.col("shingle")).alias("__sh"))
        .groupBy(id_col)
        .agg(F.array_sort(F.collect_set("__sh")).alias("__set"))
    )
    a = sets_df.select(F.col(id_col).alias("id_a"), F.col("__set").alias("__sa"))
    b = sets_df.select(F.col(id_col).alias("id_b"), F.col("__set").alias("__sb"))
    return (
        pairs.join(a, "id_a")
        .join(b, "id_b")
        .select(
            "id_a",
            "id_b",
            F.size(F.array_intersect("__sa", "__sb")).alias("n_inter"),
            F.size("__sa").alias("n_a"),
            F.size("__sb").alias("n_b"),
        )
        .withColumn(
            "jaccard",
            F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")),
        )
    )
