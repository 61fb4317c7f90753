"""Query registry backing __spark_entry__.py.

Each query is a (spark, sf_dir) -> DataFrame callable paired (where ANSI-SQL
expressible) with a DuckDB oracle statement over the same parquet tables.
Column names and types are aligned on both sides — the driver's comparator
sorts columns by name and value-hashes them.

Conventions for oracle-checked queries touching cell IDs: cells are built
with integer arithmetic kept strictly below 2^62 (quintant < 30) so the same
formulas evaluate identically in Spark and DuckDB without overflow, and all
cell values stay positive.
"""

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from a5spark.functions import native
from a5spark.operators import spatial
from a5spark.sources.images import images_from_sf_dir


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _snapshot(df: DataFrame, path: str, reuse: bool = False) -> DataFrame:
    """Materialize an oracle snapshot: write `df` to parquet and return the
    parquet-backed frame (the DuckDB oracle reads the same files — that is
    what makes these queries value-checkable end-to-end).

    With SPARK_GRAFT_SKIP_SNAPSHOT set (engine-only benchmarking: the
    snapshot write+read exists purely for the oracle, not for the answer)
    the round-trip is skipped and `df` is returned as-is; `reuse=True` marks
    frames referenced more than once downstream — those persist into the
    current cache scope in BOTH modes so the upstream computation still runs
    exactly once."""
    from a5spark import cache

    if os.environ.get("SPARK_GRAFT_SKIP_SNAPSHOT"):
        return cache.persist(df) if reuse else df
    df.write.mode("overwrite").parquet(path)
    out = df.sparkSession.read.parquet(path)
    return cache.persist(out) if reuse else out


def _oracle_export(df: DataFrame, path: str) -> None:
    """Write a snapshot consumed ONLY by the oracle (never read back by the
    query itself) — skipped entirely in engine-only benchmark mode."""
    if not os.environ.get("SPARK_GRAFT_SKIP_SNAPSHOT"):
        df.write.mode("overwrite").parquet(path)


# --- synthetic-cell construction shared by the hierarchy queries ------------
# res 9 cell from an integer key: quintant = key % 30, S = (key % 65536) *
# 7919 % 65536, marker bit 41. SQL: q * 2^58 + S * 2^42 + 2^41.

_SQL_CELL9 = (
    "((l_orderkey % 30) * 288230376151711744"  # q << 58
    " + (((l_orderkey % 65536) * 7919) % 65536) * 4398046511104"  # S << 42
    " + 2199023255552)"  # 1 << 41
)


def _spark_cell9(df: DataFrame) -> DataFrame:
    k = F.col("l_orderkey")
    q = (k % 30).cast("long")
    s = ((k % 65536) * 7919) % 65536
    cell = (
        native._shl(q, F.lit(58))
        + native._shl(s, F.lit(42))
        + native._shl(F.lit(1), F.lit(41))
    )
    return df.withColumn("cell", cell)


# --- queries ----------------------------------------------------------------

def q_hier_parent_rollup(spark, sf_dir):
    """Hierarchical rollup: synthetic res-9 cells -> native parent at res 4 ->
    count per parent. Validates cell_to_parent as a Catalyst expression."""
    li = _t(spark, sf_dir, "lineitem")
    df = _spark_cell9(li)
    parent = native.cell_to_parent(F.col("cell"), 4).alias("parent_cell")
    return (
        df.groupBy(parent)
        .agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
        .orderBy("parent_cell")
    )


def oracle_hier_parent_rollup():
    return f"""
    SELECT (c // 4503599627370496) * 4503599627370496
           + 2251799813685248 AS parent_cell,
           CAST(count(*) AS BIGINT) AS n_rows
    FROM (SELECT {_SQL_CELL9} AS c FROM lineitem)
    GROUP BY 1 ORDER BY 1
    """


def q_hier_resolution(spark, sf_dir):
    """Mixed-resolution cells -> native resolution extraction -> histogram."""
    li = _t(spark, sf_dir, "lineitem")
    k = F.col("l_orderkey")
    r = (k % 28 + 2).cast("int")
    q = (k % 30).cast("long")
    sbits = (F.lit(2) * (r - 1)).cast("int")
    s = ((k % 65536) * 7919).cast("long") % native._shl(F.lit(1), sbits)
    cell = (
        native._shl(q, F.lit(58))
        + native._shl(s, F.lit(58) - sbits)
        + native._shl(F.lit(1), F.lit(59) - F.lit(2) * r)
    )
    df = li.withColumn("cell", cell)
    return (
        df.groupBy(native.cell_resolution(F.col("cell")).alias("resolution"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
        .orderBy("resolution")
    )


def oracle_hier_resolution():
    return """
    WITH cells AS (
      SELECT (l_orderkey % 30) * 288230376151711744
             + (((l_orderkey % 65536) * 7919) % (1::BIGINT << (2 * ((l_orderkey % 28 + 2) - 1))))
               * (1::BIGINT << (58 - 2 * ((l_orderkey % 28 + 2) - 1)))
             + (1::BIGINT << (59 - 2 * (l_orderkey % 28 + 2))) AS c
      FROM lineitem
    )
    SELECT CAST(CASE WHEN lsb = 56 THEN 1 WHEN lsb = 57 THEN 0
                ELSE (59 - lsb) // 2 END AS INT) AS resolution,
           CAST(count(*) AS BIGINT) AS n_rows
    FROM (SELECT bit_count((c & -c) - 1) AS lsb FROM cells)
    GROUP BY 1 ORDER BY 1
    """


def q_hier_children(spark, sf_dir):
    """Children expansion: distinct res-5 cells from nation keys, exploded to
    res 7 (native sequence); count + extrema validate base/stride layout."""
    na = _t(spark, sf_dir, "nation")
    k = F.col("n_nationkey").cast("long")
    q = (k % 30).cast("long")
    s = (k * 13) % 256
    cell = (
        native._shl(q, F.lit(58))
        + native._shl(s, F.lit(50))
        + native._shl(F.lit(1), F.lit(49))
    )
    cells = na.select(cell.alias("cell")).distinct()
    ch = cells.select(
        F.col("cell"),
        F.explode(native.cell_children(F.col("cell"), 5, 7)).alias("child"),
    )
    return ch.groupBy("cell").agg(
        F.count(F.lit(1)).cast("long").alias("n_children"),
        F.min("child").alias("first_child"),
        F.max("child").alias("last_child"),
    ).orderBy("cell")


def oracle_hier_children():
    # children of a res-5 cell at res 7: marker moves from bit 49 to bit 45;
    # 16 children with stride 2^46.
    return """
    WITH cells AS (
      SELECT DISTINCT (n_nationkey % 30) * 288230376151711744
             + ((n_nationkey * 13) % 256) * 1125899906842624
             + (1::BIGINT << 49) AS cell
      FROM nation
    ), ch AS (
      SELECT cell,
             (cell - (1::BIGINT << 49)) + (1::BIGINT << 45) + i * (1::BIGINT << 46) AS child
      FROM cells, unnest(generate_series(0, 15)) AS t(i)
    )
    SELECT cell, CAST(count(*) AS BIGINT) AS n_children,
           min(child) AS first_child, max(child) AS last_child
    FROM ch GROUP BY cell ORDER BY cell
    """


def q_hier_child_join(spark, sf_dir):
    """Multi-resolution containment join: res-9 point cells vs res-4 parent
    cover via unsigned prefix equality (the is_child_of predicate)."""
    li = _spark_cell9(_t(spark, sf_dir, "lineitem"))
    cover = (
        _t(spark, sf_dir, "supplier")
        .select(((F.col("s_suppkey") % 30).cast("long")).alias("q"))
        .distinct()
        .select(
            (
                native._shl(F.col("q"), F.lit(58))
                + native._shl(F.lit(1), F.lit(51))
            ).alias("parent")
        )
    )
    j = spatial.child_of_join(li, cover, parent_resolution=4)
    return j.groupBy("parent").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows")
    ).orderBy("parent")


def oracle_hier_child_join():
    return f"""
    WITH pts AS (SELECT {_SQL_CELL9} AS c FROM lineitem),
    cover AS (
      SELECT DISTINCT (s_suppkey % 30) * 288230376151711744
             + (1::BIGINT << 51) AS parent
      FROM supplier
    )
    SELECT parent, CAST(count(*) AS BIGINT) AS n_rows
    FROM pts JOIN cover ON (c // (1::BIGINT << 52)) = (parent // (1::BIGINT << 52))
    GROUP BY parent ORDER BY parent
    """


def q_hex_roundtrip(spark, sf_dir):
    """Hex-keyed ingestion: synthetic cells over the FULL quintant range
    (0..59 — half have bit 63 set) -> cell_to_hex -> hex_to_cell decode,
    verifying the native u64 hex codec round-trips sign-bit cells
    (reference a5/core/hex.py:5-10)."""
    li = _t(spark, sf_dir, "lineitem")
    k = F.col("l_orderkey")
    q = (k % 60).cast("long")
    s = ((k % 65536) * 7919).cast("long") % 65536
    cell = (
        native._shl(q, F.lit(58))
        .bitwiseOR(native._shl(s, F.lit(42)))
        .bitwiseOR(native._shl(F.lit(1), F.lit(41)))
    )
    df = li.select(cell.alias("cell"), (q >= 32).alias("sign_bit"))
    df = df.withColumn("decoded", native.hex_to_cell(native.cell_to_hex(F.col("cell"))))
    return (
        df.groupBy("sign_bit")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum((F.col("decoded") == F.col("cell")).cast("long")).alias("n_ok"),
            F.min("decoded").alias("min_cell"),
            F.max("decoded").alias("max_cell"),
        )
        .orderBy("sign_bit")
    )


def oracle_hex_roundtrip():
    return """
    WITH cells AS (
      SELECT (l_orderkey % 60) >= 32 AS sign_bit,
             CAST(CASE WHEN u >= 9223372036854775808::HUGEINT
                       THEN u - 18446744073709551616::HUGEINT ELSE u END AS BIGINT) AS cell
      FROM (
        SELECT l_orderkey,
               (l_orderkey % 60)::HUGEINT * 288230376151711744::HUGEINT
               + (((l_orderkey % 65536) * 7919) % 65536)::HUGEINT * 4398046511104::HUGEINT
               + 2199023255552::HUGEINT AS u
        FROM lineitem
      )
    )
    SELECT sign_bit, CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(*) AS BIGINT) AS n_ok,
           min(cell) AS min_cell, max(cell) AS max_cell
    FROM cells GROUP BY sign_bit ORDER BY sign_bit
    """


def q_images_derivation(spark, sf_dir):
    """The deterministic image+caption synthesis chain (w/h/caption/phash and
    lon) grouped by caption — validates the images source end-to-end."""
    img = images_from_sf_dir(spark, sf_dir)
    return (
        img.groupBy("caption")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_images"),
            F.sum(F.col("w").cast("long") * F.col("h")).alias("total_px"),
            F.sum("phash").alias("phash_sum"),
            F.min("image_id").alias("first_image"),
            F.round(F.sum("lon"), 6).alias("lon_sum"),
        )
        .orderBy("caption")
    )


def oracle_images_derivation():
    a = "['aerial','street','satellite','drone','night','winter']"
    b = "['view','scene','photo','capture','shot','frame','image']"
    c = ("['of a harbor','of a forest','of a city block','of farmland',"
         "'of a coastline','of a mountain pass','of a river delta',"
         "'of an airport','of a stadium','of a desert road']")
    return f"""
    WITH img AS (
      SELECT o_orderkey AS k,
             printf('img_%012d', o_orderkey) AS image_id,
             CAST(32 + (o_orderkey % 8) * 8 AS BIGINT) AS w,
             CAST(32 + (o_orderkey % 5) * 8 AS BIGINT) AS h,
             ((o_orderkey % 1048576) * 2654435761 + o_orderkey % 997)
               % 4611686018427387903 AS phash,
             {a}[CAST(o_orderkey % 6 + 1 AS INT)] || ' ' ||
             {b}[CAST(o_orderkey % 7 + 1 AS INT)] || ' ' ||
             {c}[CAST(o_orderkey % 10 + 1 AS INT)] AS caption,
             ((o_orderkey % 1048576) * 9973 + 12345) % 360000 / 1000.0 - 180.0 AS lon
      FROM orders
    )
    SELECT caption, CAST(count(*) AS BIGINT) AS n_images,
           CAST(sum(w * h) AS BIGINT) AS total_px,
           CAST(sum(phash) AS BIGINT) AS phash_sum,
           min(image_id) AS first_image,
           round(sum(lon), 6) AS lon_sum
    FROM img GROUP BY caption ORDER BY caption
    """


_FLAGSHIP_SNAPSHOT = "/tmp/a5spark_oracle/flagship_assign_r7"


def q_cell_density_r7(spark, sf_dir):
    """Flagship spatial aggregation: encode image centroids at res 7 (Arrow
    kernel UDF — fixture-pinned, not SQL-expressible), per-cell density with
    EXACT distinct-phash and integer milli-mean width, top 50 hot cells with
    a deterministic (n DESC, cell) tie-break. The (cell, phash, w)
    assignment is snapshot to parquet so DuckDB reproduces the density +
    top-k independently — the oracle chain is fixture(encode) ∘
    oracle(aggregation). Scale note: exact count(distinct) is a standard
    two-phase expand aggregation keyed by (cell, phash) — shuffle volume is
    #distinct pairs, the honest form at 100 TB (approx_count_distinct's HLL
    sketch is not cross-engine comparable)."""
    img = images_from_sf_dir(spark, sf_dir)
    df = spatial.assign_cells(img, 7)
    snap = _snapshot(df.select("cell", "phash", "w"), _FLAGSHIP_SNAPSHOT)
    dens = snap.groupBy("cell").agg(
        F.count(F.lit(1)).cast("long").alias("n_images"),
        F.countDistinct("phash").alias("n_uniq_phash"),
        F.expr("(1000 * sum(w)) div count(1)").alias("avg_w_milli"),
    )
    return dens.orderBy(F.desc("n_images"), F.asc("cell")).limit(50)


def oracle_cell_density_r7():
    return f"""
    SELECT cell, CAST(count(*) AS BIGINT) AS n_images,
           CAST(count(DISTINCT phash) AS BIGINT) AS n_uniq_phash,
           CAST((1000 * sum(w)) // count(*) AS BIGINT) AS avg_w_milli
    FROM read_parquet('{_FLAGSHIP_SNAPSHOT}/*.parquet')
    GROUP BY cell ORDER BY n_images DESC, cell LIMIT 50
    """


_MULTIRES_SNAPSHOT = "/tmp/a5spark_oracle/multires_r9"


def q_multires_rollup(spark, sf_dir):
    """Multi-resolution density pyramid: encode once at res 9 (written to a
    snapshot parquet so the oracle can roll it up independently — the encode
    itself is pinned by the kernel fixture tests), derive res 5/7 parents
    JVM-side via one explode (single pass, map-side combined), count per
    (resolution, cell)."""
    img = images_from_sf_dir(spark, sf_dir)
    enc = _snapshot(
        spatial.assign_cells(img, 9).select("image_id", "cell"), _MULTIRES_SNAPSHOT
    )
    levels = F.array(
        *[
            F.struct(
                F.lit(r).cast("int").alias("resolution"),
                (
                    native.cell_to_parent(F.col("cell"), r) if r < 9 else F.col("cell")
                ).alias("cell"),
            )
            for r in (5, 7, 9)
        ]
    )
    return (
        enc.select(F.explode(levels).alias("l"))
        .groupBy(F.col("l.resolution").alias("resolution"), F.col("l.cell").alias("cell"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_images"))
        .orderBy("resolution", "cell")
    )


def _sql_parent(col: str, res: int) -> str:
    """Two's-complement low-bit clear + marker for a res-`res` parent,
    sign-safe: DuckDB's // truncates toward zero, so clear the low bits with
    a floor-mod (c - ((c % S + S) % S)) which matches the unsigned shift for
    negative (bit-63) cells too."""
    shift = 1 << (60 - 2 * res)
    marker = 1 << (59 - 2 * res)
    return f"({col} - ((({col} % {shift}) + {shift}) % {shift}) + {marker})"


def oracle_multires_rollup():
    return f"""
    WITH enc AS (SELECT cell FROM read_parquet('{_MULTIRES_SNAPSHOT}/*.parquet')),
    lv AS (
      SELECT 5 AS resolution, {_sql_parent("cell", 5)} AS cell FROM enc
      UNION ALL
      SELECT 7, {_sql_parent("cell", 7)} FROM enc
      UNION ALL
      SELECT 9, cell FROM enc
    )
    SELECT CAST(resolution AS INT) AS resolution, cell,
           CAST(count(*) AS BIGINT) AS n_images
    FROM lv GROUP BY resolution, cell ORDER BY resolution, cell
    """


# --- distributed compact / cover set ops -------------------------------------
# Synthetic res-6 cover: the DATA decides which (q = k % 30, s = md5(k) % 256)
# cells are hit, and a seed-keyed hash of the CELL id keeps ~threshold/97 of
# them (scale-independent sparsity, so sibling groups complete with controlled
# probability at every sf) — plus one DETERMINISTICALLY complete quintant
# block (all 256 s values of q = full_q) that collapses res 6 -> 5 -> 4 -> 3
# -> 2, exercising the multi-level descent.

_SQL_CELL6 = (
    "(q * 288230376151711744 + s * 281474976710656 + 140737488355328)"
)  # q << 58 | s << 48 | 1 << 47


def _sql_cover6(seed: str, threshold: int, full_q: int) -> str:
    # the keep-filter hashes the CELL (q*256+s), not the key, so the kept
    # subset has the same ~threshold/97 sparsity at EVERY scale factor
    # (a per-key filter saturates to full coverage once keys >> cells)
    return f"""
      SELECT DISTINCT c FROM (
        SELECT {_SQL_CELL6} AS c
        FROM (SELECT q, s FROM (
                SELECT l_orderkey % 30 AS q,
                       CAST(('0x' || substring(md5('k|' || l_orderkey::VARCHAR), 1, 15)) AS BIGINT) % 256 AS s
                FROM lineitem)
              WHERE CAST(('0x' || substring(md5('{seed}|' || (q * 256 + s)::VARCHAR), 1, 15)) AS BIGINT) % 97 < {threshold})
        UNION ALL
        SELECT {full_q} * 288230376151711744 + i * 281474976710656 + 140737488355328
        FROM unnest(generate_series(0, 255)) AS t(i)
      )
    """


def _spark_cover_qs(li):
    """Distinct (q, s) base of the synthetic covers — the ONE lineitem scan
    both covers (and both md5 predicates) derive from. A cover cell depends
    only on (q, s) = (orderkey % 30, row-digest % 256), at most 7,680
    combinations: reducing to the distinct pairs FIRST turns the per-row
    work into one md5 (the s digest) and moves the per-cover keep digest
    onto the tiny distinct relation instead of the fact table (previously
    each cover paid its own full scan + two md5s per row — 2 scans and
    ~24M md5 evaluations at sf1 for what one scan and 6M + 15k does)."""
    k = F.col("l_orderkey")
    digest = F.conv(
        F.substring(F.md5(F.concat(F.lit("k|"), k.cast("string"))), 1, 15),
        16,
        10,
    ).cast("long")
    return li.select(
        (k % 30).cast("long").alias("__q"), (digest % 256).alias("__s")
    ).distinct()


def _spark_cover6(spark, qs, seed: str, threshold: int, full_q: int):
    q, s = F.col("__q"), F.col("__s")
    cell_digest = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(f"{seed}|"), (q * 256 + s).cast("string"))), 1, 15
        ),
        16,
        10,
    ).cast("long")
    keep = (cell_digest % 97) < threshold
    cell = (
        native._shl(q, F.lit(58))
        + native._shl(s, F.lit(48))
        + native._shl(F.lit(1), F.lit(47))
    )
    rand_part = qs.filter(keep).select(cell.alias("cell"))
    full = spark.range(256).select(
        (
            native._shl(F.lit(full_q), F.lit(58))
            + native._shl(F.col("id"), F.lit(48))
            + native._shl(F.lit(1), F.lit(47))
        ).alias("cell")
    )
    return rand_part.unionByName(full).distinct()


def _sql_compact_chain(src: str, r_hi: int) -> str:
    """CTE chain replicating the finest->coarsest complete-sibling collapse:
    4 Hilbert siblings per level down to child res 2 (res-1 parents use the
    quintant marker at bit 56), then 5 quintants of one origin collapse to a
    res-0 cell (origin << 58 | 1 << 57) — same descent as compact_cover.
    `src` must select a column c of res-r_hi cells; returns SQL whose final
    CTE `compacted` selects column c."""
    parts = [f"src AS ({src})"]
    prev = "src"
    survivors = []
    for r in range(r_hi, 0, -1):
        if r >= 3:
            shift = 1 << (60 - 2 * (r - 1))
            marker = 1 << (59 - 2 * (r - 1))
            size = 4
        elif r == 2:  # child res 2 -> res-1 parent: quintant bits + marker 56
            shift = 1 << 58
            marker = 1 << 56
            size = 4
        else:  # child res 1 -> res-0 parent: 5 quintants of one origin
            shift = None
            size = 5
        # sign-safe low-bit clear (DuckDB // truncates toward zero, which
        # breaks bit-63 cells; the floor-mod form matches the unsigned shift)
        if shift is not None:
            parent = f"c - ((c % {shift} + {shift}) % {shift}) + {marker}"
        else:
            sh58 = 1 << 58
            qu = f"(((c - ((c % {sh58} + {sh58}) % {sh58})) // {sh58} + 64) % 64)"
            parent = f"({qu} // 5) * {sh58} + {1 << 57}"
        parts.append(f"lvl{r} AS (SELECT c, {parent} AS p FROM {prev})")
        parts.append(f"g{r} AS (SELECT p, count(*) AS n FROM lvl{r} GROUP BY p)")
        parts.append(
            f"s{r} AS (SELECT c FROM lvl{r} JOIN g{r} USING (p) WHERE n < {size})"
        )
        parts.append(f"p{r} AS (SELECT p AS c FROM g{r} WHERE n = {size})")
        survivors.append(f"SELECT c FROM s{r}")
        prev = f"p{r}"
    survivors.append(f"SELECT c FROM {prev}")
    parts.append("compacted AS (" + " UNION ALL ".join(survivors) + ")")
    return ",\n".join(parts)


_SQL_RES_OF_C = """
    CAST(CASE WHEN lsb = 56 THEN 1 WHEN lsb = 57 THEN 0
         ELSE (59 - lsb) // 2 END AS INT)
"""


def q_compact_cover(spark, sf_dir):
    """Distributed compact: synthetic res-6 cover (91% sibling coverage)
    collapses across several levels; per-resolution stats of the compacted
    cover. Validates operators.spatial.compact_cover (reference
    a5/core/compact.py:69-142) against a pure-SQL collapse chain."""
    from a5spark.operators.spatial import compact_cover

    cells = _spark_cover6(
        spark, _spark_cover_qs(_t(spark, sf_dir, "lineitem")), "a", 88, 3
    )
    out = compact_cover(cells, resolution_bounds=(6, 6))
    return (
        out.groupBy(native.cell_resolution(F.col("cell")).alias("resolution"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_cells"),
            F.min("cell").alias("min_cell"),
            F.max("cell").alias("max_cell"),
        )
        .orderBy("resolution")
    )


def oracle_compact_cover():
    chain = _sql_compact_chain(_sql_cover6("a", 88, 3), 6)
    return f"""
    WITH {chain}
    SELECT {_SQL_RES_OF_C} AS resolution,
           CAST(count(*) AS BIGINT) AS n_cells,
           min(c) AS min_cell, max(c) AS max_cell
    FROM (SELECT c, bit_count((c & -c) - 1) AS lsb FROM compacted)
    GROUP BY 1 ORDER BY 1
    """


def q_cover_set_ops(spark, sf_dir):
    """Compact-aware cover set ops: union / intersect / difference of two
    res-6 covers at a common resolution, re-compacted; per-(op, resolution)
    counts."""
    from a5spark.operators.spatial import compact_cover, uncompact_cover

    from a5spark import cache

    li = _t(spark, sf_dir, "lineitem")
    # ONE persisted lineitem scan feeds both covers (the per-cover keep
    # digests run on the tiny distinct (q, s) relation); the covers stay
    # persisted too since uncompact_cover references its input twice
    # (hilbert/low regime branches)
    qs = cache.persist(_spark_cover_qs(li))
    a = cache.persist(_spark_cover6(spark, qs, "a", 88, 3))
    b = cache.persist(_spark_cover6(spark, qs, "b", 60, 4))
    # tag every cell of a / b with the set ops it belongs to, then run ONE
    # compact descent partitioned by op (group_cols) — a third of the
    # stages of three separate compacts, identical results. The membership
    # flags come from union + max-flag aggregation rather than the historic
    # FULL OUTER self-join: one hash-agg exchange instead of a two-sided
    # join shuffle + merge (round 8; same (cell, in-a, in-b) relation)
    # min_resolution=6: both synthetic covers are built at res 6 exactly
    # (q<<58 | s<<48 | marker), so the res-0/1 kernel branch can be omitted
    af = uncompact_cover(a, 6, min_resolution=6).select(
        "cell", F.lit(1).alias("__a"), F.lit(0).alias("__b")
    )
    bf = uncompact_cover(b, 6, min_resolution=6).select(
        "cell", F.lit(0).alias("__a"), F.lit(1).alias("__b")
    )
    both = (
        af.unionByName(bf)
        .groupBy("cell")
        .agg(F.max("__a").alias("__a"), F.max("__b").alias("__b"))
    )
    tags = F.array_compact(
        F.array(
            F.lit("union"),
            F.when((F.col("__a") == 1) & (F.col("__b") == 1), F.lit("intersect")),
            F.when((F.col("__a") == 1) & (F.col("__b") == 0), F.lit("difference")),
        )
    )
    tagged = both.select(F.explode(tags).alias("op"), "cell")
    cover = compact_cover(tagged, group_cols=["op"], resolution_bounds=(6, 6))
    return (
        cover.groupBy("op", native.cell_resolution(F.col("cell")).alias("resolution"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_cells"))
        .orderBy("op", "resolution")
    )


def oracle_cover_set_ops():
    a = _sql_cover6("a", 88, 3)
    b = _sql_cover6("b", 60, 4)
    blocks = []
    for name, op_sql in (
        ("union", f"SELECT c FROM ({a}) UNION SELECT c FROM ({b})"),
        ("intersect", f"SELECT c FROM ({a}) INTERSECT SELECT c FROM ({b})"),
        ("difference", f"SELECT c FROM ({a}) EXCEPT SELECT c FROM ({b})"),
    ):
        chain = _sql_compact_chain(op_sql, 6)
        blocks.append(f"""
        SELECT '{name}' AS op, {_SQL_RES_OF_C} AS resolution,
               CAST(count(*) AS BIGINT) AS n_cells
        FROM (WITH {chain}
              SELECT c, bit_count((c & -c) - 1) AS lsb FROM compacted)
        GROUP BY 1, 2
        """)
    return " UNION ALL ".join(blocks) + " ORDER BY op, resolution"


# --- training-data pipeline operators (documents / embeddings tables) -------

def q_dedup_exact(spark, sf_dir):
    """Exact dedup summary: distribution of copy-group sizes on content digest."""
    from a5spark.operators.dedup import exact_dedup

    docs = _t(spark, sf_dir, "documents")
    groups = exact_dedup(docs)
    return (
        groups.groupBy("n_copies")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_groups"),
            F.min("keeper_id").alias("min_keeper"),
        )
        .orderBy("n_copies")
    )


def oracle_dedup_exact():
    return """
    WITH g AS (
      SELECT CAST(('0x' || substring(md5(text), 1, 15)) AS BIGINT) AS digest,
             min(doc_id) AS keeper_id, CAST(count(*) AS BIGINT) AS n_copies
      FROM documents GROUP BY 1
    )
    SELECT n_copies, CAST(count(*) AS BIGINT) AS n_groups,
           min(keeper_id) AS min_keeper
    FROM g GROUP BY n_copies ORDER BY n_copies
    """


def q_minhash_lsh(spark, sf_dir):
    """MinHash + LSH near-dup candidate pairs (8 hashes, 4-row bands, k=5
    shingles) over the documents table."""
    from a5spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_bands,
        minhash_signatures,
    )

    docs = _t(spark, sf_dir, "documents")
    sig = minhash_signatures(docs, n_hashes=8, k=5)
    bands = minhash_bands(sig, band_size=4)
    return lsh_candidate_pairs(bands).orderBy("id_a", "id_b")


def oracle_minhash_lsh():
    return """
    WITH sh AS (
      SELECT DISTINCT doc_id,
             substring(text, CAST(i AS INT), 5) AS shingle
      FROM documents,
           unnest(generate_series(1, greatest(1, length(text) - 4))) AS t(i)
    ), hsh AS (
      SELECT doc_id,
             CAST(('0x' || substring(md5(shingle), 1, 15)) AS BIGINT) % 2147483647 AS h
      FROM sh
    ), mh AS (
      SELECT hsh.doc_id, p.seed, min((p.a * hsh.h + p.b) % 2147483647) AS minhash
      FROM hsh CROSS JOIN (VALUES (0, 451940047, 249645783), (1, 1171012526, 653375317), (2, 1027538907, 1150717276), (3, 1179441586, 1038339061), (4, 1871381210, 1617964168), (5, 200357322, 669649390), (6, 1104202906, 996913377), (7, 680702085, 2110779854)) AS p(seed, a, b)
      GROUP BY hsh.doc_id, p.seed
    ), bands AS (
      SELECT doc_id, seed // 4 AS band_idx,
             CAST(('0x' || substring(md5(string_agg(minhash::VARCHAR, ',' ORDER BY seed)), 1, 15)) AS BIGINT) AS band_hash
      FROM mh GROUP BY doc_id, seed // 4
    )
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
    FROM bands a JOIN bands b
      ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id
    ORDER BY id_a, id_b
    """


def q_simhash(spark, sf_dir):
    """16-bit simhash per document."""
    from a5spark.operators.dedup import simhash

    docs = _t(spark, sf_dir, "documents")
    return simhash(docs, bits=16).orderBy("doc_id")


def oracle_simhash():
    return """
    WITH toks AS (
      SELECT doc_id,
             CAST(('0x' || substring(md5(tok), 1, 15)) AS BIGINT) AS h
      FROM (SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS tok
            FROM documents)
      WHERE length(tok) > 0
    ), contrib AS (
      SELECT doc_id, bit,
             sum(((h >> CAST(bit AS INT)) & 1) * 2 - 1) AS s
      FROM toks, unnest(generate_series(0, 15)) AS b(bit)
      GROUP BY doc_id, bit
    )
    SELECT doc_id,
           CAST(sum(CASE WHEN s > 0 THEN (1::BIGINT << CAST(bit AS INT)) ELSE 0 END) AS BIGINT) AS simhash
    FROM contrib GROUP BY doc_id ORDER BY doc_id
    """


def q_simhash_neardup(spark, sf_dir):
    """SimHash near-duplicate join over 32-bit signatures: banded
    (pigeonhole-complete for hamming <= 3 over 4 bands) bucket self-join +
    exact bit_count(xor) verify — the scalable simhash dedup JOIN, not just
    signatures."""
    from a5spark.operators.dedup import simhash_neardup

    docs = _t(spark, sf_dir, "documents")
    return simhash_neardup(docs, bits=32, bands=4, max_hamming=3).orderBy(
        "id_a", "id_b"
    )


def oracle_simhash_neardup():
    return """
    WITH toks AS (
      SELECT doc_id,
             CAST(('0x' || substring(md5(tok), 1, 15)) AS BIGINT) AS h
      FROM (SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS tok
            FROM documents)
      WHERE length(tok) > 0
    ), contrib AS (
      SELECT doc_id, bit,
             sum(((h >> CAST(bit AS INT)) & 1) * 2 - 1) AS s
      FROM toks, unnest(generate_series(0, 31)) AS b(bit)
      GROUP BY doc_id, bit
    ), sig AS (
      SELECT doc_id,
             CAST(sum(CASE WHEN s > 0 THEN (1::BIGINT << CAST(bit AS INT)) ELSE 0 END) AS BIGINT) AS simhash
      FROM contrib GROUP BY doc_id
    ), banded AS (
      SELECT doc_id, simhash, b AS band_idx,
             (simhash >> CAST(b * 8 AS INT)) & 255 AS slice
      FROM sig, unnest(generate_series(0, 3)) AS t(b)
    ), cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
             a.simhash AS sa, b.simhash AS sb
      FROM banded a JOIN banded b
        ON a.band_idx = b.band_idx AND a.slice = b.slice AND a.doc_id < b.doc_id
    )
    SELECT id_a, id_b, CAST(bit_count(xor(sa, sb)) AS INT) AS hamming
    FROM cand WHERE bit_count(xor(sa, sb)) <= 3
    ORDER BY id_a, id_b
    """


def q_crossmodal_neardup(spark, sf_dir):
    """Cross-modal dedup confirmation: text near-dup candidate pairs (banded
    simhash, hamming <= 3) verified against the EMBEDDING modality — each
    pair is scored with the integer-exact quantized dot product of the two
    docs' vectors (scale 127, int64) and flagged when the quantized cosine
    clears sqrt(4/25). The training-pipeline pattern of requiring agreement
    between modalities before dropping a row; every value cross-engine exact."""
    from a5spark.operators.dedup import simhash_neardup
    from a5spark.operators.similarity import _broadcast_pair_scorer, quantize

    docs = _t(spark, sf_dir, "documents")
    emb = _t(spark, sf_dir, "embeddings")
    pairs = simhash_neardup(docs, bits=32, bands=4, max_hamming=3)
    # broadcast-lookup scoring (round 8): pairs carry only ids; the
    # quantized matrix broadcasts and pairs missing from the embeddings
    # table drop, exactly like the inner joins of the over-cap fallback
    scorer = _broadcast_pair_scorer(
        emb, "vec_id", emb, "vec_id", "id_a", "id_b", "embedding", 127
    )
    if scorer is not None:
        scored = scorer(pairs)
    else:
        qv = emb.select(
            F.col("vec_id"), quantize(F.col("embedding"), 127).alias("__v")
        ).withColumn(
            "__n2",
            F.aggregate(
                F.zip_with(F.col("__v"), F.col("__v"), lambda a, b: a * b),
                F.lit(0).cast("long"),
                lambda acc, v: acc + v,
            ),
        )
        a_side = qv.select(
            F.col("vec_id").alias("id_a"), F.col("__v").alias("__va"), F.col("__n2").alias("__na")
        )
        b_side = qv.select(
            F.col("vec_id").alias("id_b"), F.col("__v").alias("__vb"), F.col("__n2").alias("__nb")
        )
        scored = (
            pairs.join(a_side, "id_a")
            .join(b_side, "id_b")
            .withColumn(
                "qdot",
                F.aggregate(
                    F.zip_with(F.col("__va"), F.col("__vb"), lambda a, b: a * b),
                    F.lit(0).cast("long"),
                    lambda acc, v: acc + v,
                ),
            )
        )
    confirmed = (F.col("qdot") > 0) & (
        F.col("qdot") * F.col("qdot") * 25 >= F.lit(4) * F.col("__na") * F.col("__nb")
    )
    return scored.select(
        "id_a", "id_b", "hamming", "qdot",
        confirmed.cast("int").alias("embed_confirms"),
    ).orderBy("id_a", "id_b")


def oracle_crossmodal_neardup():
    return """
    WITH toks AS (
      SELECT doc_id,
             CAST(('0x' || substring(md5(tok), 1, 15)) AS BIGINT) AS h
      FROM (SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS tok
            FROM documents)
      WHERE length(tok) > 0
    ), contrib AS (
      SELECT doc_id, bit,
             sum(((h >> CAST(bit AS INT)) & 1) * 2 - 1) AS s
      FROM toks, unnest(generate_series(0, 31)) AS b(bit)
      GROUP BY doc_id, bit
    ), sig AS (
      SELECT doc_id,
             CAST(sum(CASE WHEN s > 0 THEN (1::BIGINT << CAST(bit AS INT)) ELSE 0 END) AS BIGINT) AS simhash
      FROM contrib GROUP BY doc_id
    ), banded AS (
      SELECT doc_id, simhash, b AS band_idx,
             (simhash >> CAST(b * 8 AS INT)) & 255 AS slice
      FROM sig, unnest(generate_series(0, 3)) AS t(b)
    ), cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
             a.simhash AS sa, b.simhash AS sb
      FROM banded a JOIN banded b
        ON a.band_idx = b.band_idx AND a.slice = b.slice AND a.doc_id < b.doc_id
    ), txt AS (
      SELECT id_a, id_b, CAST(bit_count(xor(sa, sb)) AS INT) AS hamming
      FROM cand WHERE bit_count(xor(sa, sb)) <= 3
    ), qv AS (
      SELECT vec_id,
             list_transform(embedding, x -> round(CAST(x AS DOUBLE) * 127)) AS v
      FROM embeddings
    ), n AS (
      SELECT vec_id, v, CAST(list_dot_product(v, v) AS BIGINT) AS n2 FROM qv
    )
    SELECT t.id_a, t.id_b, t.hamming,
           CAST(list_dot_product(na.v, nb.v) AS BIGINT) AS qdot,
           CAST(CASE WHEN list_dot_product(na.v, nb.v) > 0
                      AND CAST(list_dot_product(na.v, nb.v) AS BIGINT)
                          * CAST(list_dot_product(na.v, nb.v) AS BIGINT) * 25
                          >= 4 * na.n2 * nb.n2
                THEN 1 ELSE 0 END AS INT) AS embed_confirms
    FROM txt t
    JOIN n na ON na.vec_id = t.id_a
    JOIN n nb ON nb.vec_id = t.id_b
    ORDER BY t.id_a, t.id_b
    """


def q_embed_neardup(spark, sf_dir):
    """Embedding-cosine near-duplicate pairs: banded hyperplane-LSH candidate
    self-join + integer-exact cosine >= 0.4 threshold (int8-scale quantized,
    dot^2 * 25 >= 4 * |a|^2 * |b|^2) — the embedding dedup mode."""
    from a5spark.operators.similarity import cosine_neardup_pairs

    emb = _t(spark, sf_dir, "embeddings")
    return cosine_neardup_pairs(
        emb, dim=_LSH_DIM, threshold_num=4, threshold_den=25,
        n_bits=_LSH_BITS, n_tables=_LSH_TABLES, scale=127,
        bucket_cap=_LSH_BUCKET_CAP, extra_bits=_LSH_EXTRA_BITS,
    ).orderBy("id_a", "id_b")


def oracle_embed_neardup():
    return f"""
    WITH qv AS (
      SELECT vec_id,
             list_transform(embedding, x -> round(CAST(x AS DOUBLE) * 127)) AS v
      FROM embeddings
    ), n AS (
      SELECT vec_id, v, CAST(list_dot_product(v, v) AS BIGINT) AS n2 FROM qv
    ), {_sql_lsh_keyed_ctes(probe=True)},
    pairs AS (
      SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
      FROM keyed_q a JOIN keyed b ON a.t = b.t AND a.bucket = b.bucket
      WHERE a.vec_id < b.vec_id
    ), scored AS (
      SELECT p.id_a, p.id_b,
             CAST(list_dot_product(na.v, nb.v) AS BIGINT) AS qdot,
             na.n2 AS n2a, nb.n2 AS n2b
      FROM pairs p
      JOIN n na ON na.vec_id = p.id_a
      JOIN n nb ON nb.vec_id = p.id_b
    )
    SELECT id_a, id_b, qdot FROM scored
    WHERE qdot > 0 AND qdot * qdot * 25 >= 4 * n2a * n2b
    ORDER BY id_a, id_b
    """


def q_text_profile(spark, sf_dir):
    """Token counts, sub-token counts and content fingerprint per document."""
    from a5spark.operators.text import bpe_ish_token_count, fingerprint, token_count

    docs = _t(spark, sf_dir, "documents")
    t = F.col("text")
    return docs.select(
        F.col("doc_id"),
        token_count(t).cast("long").alias("n_tokens"),
        bpe_ish_token_count(t).cast("long").alias("n_subtokens"),
        fingerprint(t).alias("fingerprint"),
    ).orderBy("doc_id")


def oracle_text_profile():
    return r"""
    SELECT doc_id,
           CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                ELSE len(string_split_regex(trim(text), '\s+')) END AS BIGINT) AS n_tokens,
           CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS n_subtokens,
           CAST(('0x' || substring(md5(
               trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), '\s+', ' ', 'g'))
           ), 1, 15)) AS BIGINT) AS fingerprint
    FROM documents ORDER BY doc_id
    """


def q_doc_quality(spark, sf_dir):
    """Per-document quality scoring (the training-data filter stage): length
    / punctuation / stopword / shouting components and the combined [0, 1]
    heuristic of operators/text.quality_score, recast in PURE INTEGER
    micro-units — the rational terms share the common denominator
    D = 500 * len * n_tok so every output is an exact int64 (float rounding
    of the double form ties at the 6th decimal between engines)."""
    docs = _t(spark, sf_dir, "documents")
    t = F.col("text")
    n_chars = F.length(t).cast("long")
    len1 = F.greatest(n_chars, F.lit(1))
    n_tok1 = F.greatest(
        F.when(
            F.length(F.trim(t)) == 0, F.lit(0)
        ).otherwise(F.size(F.split(F.trim(t), r"\s+"))).cast("long"),
        F.lit(1),
    )
    n_punct = F.size(F.regexp_extract_all(t, F.lit(r"[.,;:!?]"), 0)).cast("long")
    n_upper = F.size(F.regexp_extract_all(t, F.lit(r"[A-Z]"), 0)).cast("long")
    padded = F.concat(F.lit(" "), F.lower(t), F.lit(" "))
    n_stop = None
    for w in ["the", "and", "of", "to", "is"]:
        c = F.size(F.regexp_extract_all(padded, F.lit(w), 0)).cast("long")
        n_stop = c if n_stop is None else n_stop + c
    d = F.lit(500) * len1 * n_tok1
    terms = docs.select(
        F.col("doc_id"),
        n_chars.alias("n_chars"),
        len1.alias("len1"),
        n_tok1.alias("n_tok1"),
        n_punct.alias("n_punct"),
        n_upper.alias("n_upper"),
        n_stop.alias("n_stop"),
        d.alias("d"),
        F.least(n_chars * len1 * n_tok1, d).alias("lt"),
        F.least(F.lit(10_000) * n_punct * n_tok1, d).alias("pt"),
        F.least(F.lit(2_500) * n_stop * len1, d).alias("st"),
        F.greatest(
            F.lit(0).cast("long"), d - F.lit(2_000) * n_upper * n_tok1
        ).alias("sh"),
    )
    # `div` = integral division, bit-identical to DuckDB's `//` on positives
    return terms.selectExpr(
        "doc_id",
        "n_chars",
        "(1000000 * n_punct) div len1 AS punct_micro",
        "(1000000 * n_upper) div len1 AS upper_micro",
        "(1000000 * n_stop) div n_tok1 AS stop_micro",
        "(1000000 * (lt + pt + st + sh)) div (4 * d) AS quality_micro",
    ).orderBy("doc_id")


def oracle_doc_quality():
    stop_hits = " + ".join(
        f"len(regexp_extract_all(' ' || lower(text) || ' ', '{w}'))"
        for w in ["the", "and", "of", "to", "is"]
    )
    return r"""
    WITH base AS (
      SELECT doc_id,
             CAST(length(text) AS BIGINT) AS n_chars,
             CAST(greatest(length(text), 1) AS BIGINT) AS len1,
             CAST(greatest(CASE WHEN length(trim(text)) = 0 THEN 0
                  ELSE len(string_split_regex(trim(text), '\s+')) END, 1) AS BIGINT) AS n_tok1,
             CAST(len(regexp_extract_all(text, '[.,;:!?]')) AS BIGINT) AS n_punct,
             CAST(len(regexp_extract_all(text, '[A-Z]')) AS BIGINT) AS n_upper,
             CAST(""" + stop_hits + r""" AS BIGINT) AS n_stop
      FROM documents
    ), terms AS (
      SELECT doc_id, n_chars, len1, n_tok1, n_punct, n_upper, n_stop,
             500 * len1 * n_tok1 AS d,
             least(n_chars * len1 * n_tok1, 500 * len1 * n_tok1) AS lt,
             least(10000 * n_punct * n_tok1, 500 * len1 * n_tok1) AS pt,
             least(2500 * n_stop * len1, 500 * len1 * n_tok1) AS st,
             greatest(0, 500 * len1 * n_tok1 - 2000 * n_upper * n_tok1) AS sh
      FROM base
    )
    SELECT doc_id, n_chars,
           (1000000 * n_punct) // len1 AS punct_micro,
           (1000000 * n_upper) // len1 AS upper_micro,
           (1000000 * n_stop) // n_tok1 AS stop_micro,
           (1000000 * (lt + pt + st + sh)) // (4 * d) AS quality_micro
    FROM terms ORDER BY doc_id
    """


def q_lang_id(spark, sf_dir):
    """Marker-based language guess histogram."""
    from a5spark.operators.text import lang_id

    docs = _t(spark, sf_dir, "documents")
    return (
        docs.select(lang_id(F.col("text")).alias("lang_guess"))
        .groupBy("lang_guess")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
        .orderBy("lang_guess")
    )


def oracle_lang_id():
    def cnt(words):
        parts = " + ".join(
            f"len(regexp_extract_all(' ' || lower(text) || ' ', '{w}'))" for w in words
        )
        return parts

    from a5spark.operators.text import LANG_MARKERS

    en = cnt(LANG_MARKERS["en"])
    de = cnt(LANG_MARKERS["de"])
    fr = cnt(LANG_MARKERS["fr"])
    es = cnt(LANG_MARKERS["es"])
    return f"""
    WITH scored AS (
      SELECT {en} AS s_en, {de} AS s_de, {fr} AS s_fr, {es} AS s_es
      FROM documents
    ), tagged AS (
      SELECT CASE WHEN greatest(s_en, s_de, s_fr, s_es) = 0 THEN 'und'
                  WHEN s_en = greatest(s_en, s_de, s_fr, s_es) THEN 'en'
                  WHEN s_de = greatest(s_en, s_de, s_fr, s_es) THEN 'de'
                  WHEN s_fr = greatest(s_en, s_de, s_fr, s_es) THEN 'fr'
                  ELSE 'es' END AS lang_guess
      FROM scored
    )
    SELECT lang_guess, CAST(count(*) AS BIGINT) AS n_docs
    FROM tagged GROUP BY lang_guess ORDER BY lang_guess
    """


def q_jaccard_verify(spark, sf_dir):
    """Exact shingle-Jaccard verification of the LSH candidate pairs
    (the dedup verify step: candidates -> exact similarity)."""
    from a5spark.operators.dedup import (
        jaccard_pairs,
        lsh_candidate_pairs,
        minhash_bands,
        minhash_signatures,
    )

    docs = _t(spark, sf_dir, "documents")
    sig = minhash_signatures(docs, n_hashes=8, k=5)
    pairs = lsh_candidate_pairs(minhash_bands(sig, band_size=4))
    jac = jaccard_pairs(pairs, docs, k=5)
    return jac.select(
        "id_a", "id_b",
        F.col("n_inter").cast("long").alias("n_inter"),
        F.round("jaccard", 9).alias("jaccard"),
    ).orderBy("id_a", "id_b")


def oracle_jaccard_verify():
    return """
    WITH sh AS (
      SELECT DISTINCT doc_id, substring(text, CAST(i AS INT), 5) AS shingle
      FROM documents,
           unnest(generate_series(1, greatest(1, length(text) - 4))) AS t(i)
    ), hsh AS (
      SELECT doc_id,
             CAST(('0x' || substring(md5(shingle), 1, 15)) AS BIGINT) % 2147483647 AS h
      FROM sh
    ), mh AS (
      SELECT hsh.doc_id, p.seed, min((p.a * hsh.h + p.b) % 2147483647) AS minhash
      FROM hsh CROSS JOIN (VALUES (0, 451940047, 249645783), (1, 1171012526, 653375317), (2, 1027538907, 1150717276), (3, 1179441586, 1038339061), (4, 1871381210, 1617964168), (5, 200357322, 669649390), (6, 1104202906, 996913377), (7, 680702085, 2110779854)) AS p(seed, a, b)
      GROUP BY hsh.doc_id, p.seed
    ), bands AS (
      SELECT doc_id, seed // 4 AS band_idx,
             CAST(('0x' || substring(md5(string_agg(minhash::VARCHAR, ',' ORDER BY seed)), 1, 15)) AS BIGINT) AS band_hash
      FROM mh GROUP BY doc_id, seed // 4
    ), pairs AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bands a JOIN bands b
        ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id
    ), shd AS (
      SELECT DISTINCT doc_id,
             CAST(('0x' || substring(md5(shingle), 1, 15)) AS BIGINT) AS shingle
      FROM sh
    ), sizes AS (
      SELECT doc_id, count(*) AS n FROM shd GROUP BY doc_id
    ), inter AS (
      SELECT p.id_a, p.id_b, count(*) AS n_inter
      FROM pairs p
      JOIN shd a ON a.doc_id = p.id_a
      JOIN shd b ON b.doc_id = p.id_b AND b.shingle = a.shingle
      GROUP BY p.id_a, p.id_b
    )
    SELECT i.id_a, i.id_b, CAST(i.n_inter AS BIGINT) AS n_inter,
           round(CAST(i.n_inter AS DOUBLE) / (sa.n + sb.n - i.n_inter), 9) AS jaccard
    FROM inter i
    JOIN sizes sa ON sa.doc_id = i.id_a
    JOIN sizes sb ON sb.doc_id = i.id_b
    ORDER BY i.id_a, i.id_b
    """


def q_event_sessions(spark, sf_dir):
    """Event sessionization: per-user sessions split at 30-minute gaps,
    session stats rollup (the relational window-function surface)."""
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    w = Window.partitionBy("user_id").orderBy("ts")
    gap = F.unix_micros(F.col("ts")) - F.lag(F.unix_micros(F.col("ts"))).over(w)
    sess = (
        ev.withColumn("new_session", (gap.isNull() | (gap > 1800 * 1000000)).cast("int"))
        .withColumn("session_idx", F.sum("new_session").over(w))
    )
    return (
        sess.groupBy("user_id", "session_idx")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
        .groupBy("n_events")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_sessions"),
            F.round(F.sum("total_value"), 6).alias("value_sum"),
        )
        .orderBy("n_events")
    )


def oracle_event_sessions():
    return """
    WITH gaps AS (
      SELECT user_id, value,
             CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w IS NULL
                       OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800 * 1000000
                  THEN 1 ELSE 0 END AS new_session, ts
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), sess AS (
      SELECT user_id, value,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts) AS session_idx
      FROM gaps
    ), per_session AS (
      SELECT user_id, session_idx, CAST(count(*) AS BIGINT) AS n_events,
             round(sum(value), 6) AS total_value
      FROM sess GROUP BY user_id, session_idx
    )
    SELECT n_events, CAST(count(*) AS BIGINT) AS n_sessions,
           round(sum(total_value), 6) AS value_sum
    FROM per_session GROUP BY n_events ORDER BY n_events
    """


def q_ann_quantized(spark, sf_dir):
    """Int-quantized brute-force top-5 similarity search: every 10th vector
    queries the full embeddings table (engine-exact integer dot products)."""
    from a5spark.operators.similarity import quantized_topk

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 10 == 0).select(
        F.col("vec_id").alias("q_id"), F.col("embedding")
    )
    out = quantized_topk(queries, emb, k=5)
    return out.select("q_id", "rank", "vec_id", "qdot").orderBy("q_id", "rank")


def oracle_ann_quantized():
    return """
    WITH q AS (
      SELECT vec_id AS q_id,
             list_transform(embedding, x -> round(CAST(x AS DOUBLE) * 1000)) AS q_vec
      FROM embeddings WHERE vec_id % 10 = 0
    ), p AS (
      SELECT vec_id,
             list_transform(embedding, x -> round(CAST(x AS DOUBLE) * 1000)) AS p_vec
      FROM embeddings
    ), scored AS (
      SELECT q_id, vec_id,
             CAST(list_dot_product(q_vec, p_vec) AS BIGINT) AS qdot,
             row_number() OVER (PARTITION BY q_id ORDER BY list_dot_product(q_vec, p_vec) DESC, vec_id ASC) AS rank
      FROM q, p
    )
    SELECT q_id, CAST(rank AS INT) AS rank, vec_id, qdot
    FROM scored WHERE rank <= 5 ORDER BY q_id, rank
    """


def q_ann_cosine(spark, sf_dir):
    """Float cosine brute-force top-5, oracle-ranked on the MICRO-COSINE:
    candidates come from the float scorer with a 19-slot buffer (top-24 per
    query — the float order can only disagree with the micro order INSIDE a
    1e-6 bucket, so the true micro top-5 is preserved unless more than 19
    extra rows share the rank-5 boundary bucket; duplicate clusters in the
    corpus are far smaller, and the margin costs ~nothing since candidates
    are per-batch top-k rows only), then the final rank is row_number over
    (round(cos * 1e6) DESC, vec_id ASC) — a deterministic integer ordering
    both engines compute identically. ROUND, not floor: exact-duplicate
    pairs score cos = 1.0 ± 1e-14 — precisely a truncation grid line, which
    floor splits across engines — while round's half-micro boundaries carry
    no degenerate values (cross-engine float noise ~1e-14 only flips round
    within 1e-14 of an x.5e-6 point; both engines round doubles HALF_UP)."""
    from pyspark.sql import Window

    from a5spark.operators.similarity import brute_force_topk

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 25 == 0).select(
        F.col("vec_id").alias("q_id"), F.col("embedding")
    )
    cand = brute_force_topk(queries, emb, k=24).withColumn(
        "cos_micro", F.round(F.col("cos_sim") * 1e6).cast("long")
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos_micro"), F.asc("vec_id"))
    return (
        cand.select("q_id", "vec_id", "cos_micro")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("q_id", F.col("rank").cast("int").alias("rank"), "vec_id", "cos_micro")
        .orderBy("q_id", "rank")
    )


def oracle_ann_cosine():
    return """
    WITH q AS (
      SELECT vec_id AS q_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
      FROM embeddings WHERE vec_id % 25 = 0
    ), p AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS pv
      FROM embeddings
    ), scored AS (
      SELECT q_id, vec_id,
             CAST(round(1e6 * list_dot_product(qv, pv) /
                        (sqrt(list_dot_product(qv, qv)) *
                         sqrt(list_dot_product(pv, pv)))) AS BIGINT) AS cos_micro
      FROM q, p
    ), ranked AS (
      SELECT q_id, vec_id, cos_micro,
             row_number() OVER (
               PARTITION BY q_id ORDER BY cos_micro DESC, vec_id ASC
             ) AS rank
      FROM scored
    )
    SELECT q_id, CAST(rank AS INT) AS rank, vec_id, cos_micro
    FROM ranked WHERE rank <= 5 ORDER BY q_id, rank
    """


# Banded-LSH tuning for the synthetic embeddings: top-3 neighbor cosine is
# ~0.33-0.39 (weak clusters), so per-hyperplane agreement p ~ 1 - acos(.36)/pi
# ~ 0.62; recall ~ 1 - (1 - p^bits)^tables -> 3 bits x 12 tables ~ 0.94.
# Sharply clustered real embeddings support far more bits per band.
_LSH_BITS = 3
_LSH_TABLES = 12
_LSH_DIM = 64
# Structural scale guard: primary buckets wider than this split by
# _LSH_EXTRA_BITS secondary hyperplanes (similarity._extend_assign), with
# Hamming-<=2 multi-probing on the query / id_a side so recall inside a
# split bucket follows the 3-bit-disagreement tail instead of collapsing.
# Split depth grows with bucket width (bitlength((n-1)//cap) + margin,
# clamped to [_LSH_EXTRA_BITS, +headroom] — similarity._wide_buckets), so
# expected slice size stays ~cap/2^margin and probed join volume per bucket
# is ~n_b * slice * |probe| — near-linear in corpus size instead of the
# n_b^2 blob a fixed depth leaves just under its cap (the sf1 embed_neardup
# regression BASELINE.md documented in round 4). With 3 primary bits the
# per-table bucket load is n/8, so any corpus beyond ~4k vectors splits. At
# oracle scale (sf0.01, ~25/bucket) and bench scale (sf0.1, ~250/bucket)
# the cap never triggers, so those results are byte-identical to the
# uncapped formulation; the oracle SQL models the refinement + probe +
# adaptive-depth chain either way, and tests/test_round{3,4}.py exercise
# the TRIGGERED path cross-engine.
_LSH_BUCKET_CAP = 500
_LSH_EXTRA_BITS = 12


def q_ann_lsh(spark, sf_dir):
    """Banded multi-table hyperplane-LSH ANN top-3 with exact quantized
    re-rank: candidates only from per-table bucket collisions (recall vs the
    brute-force quantized ground truth is asserted >= 0.9 in tests)."""
    from a5spark.operators.similarity import lsh_bucket_topk

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 25 == 0).select(
        F.col("vec_id").alias("q_id"), F.col("embedding")
    )
    out = lsh_bucket_topk(
        queries, emb, k=3, dim=_LSH_DIM, n_bits=_LSH_BITS, n_tables=_LSH_TABLES,
        bucket_cap=_LSH_BUCKET_CAP, extra_bits=_LSH_EXTRA_BITS,
    )
    return out.select("q_id", "rank", "vec_id", "qdot").orderBy("q_id", "rank")


# probe fraction 1/4: measured top-3 recall vs the quantized ground truth is
# ~0.72-0.77 on the synthetic corpora (their top-3 neighbor cosine is ~0.36
# — near-uniform vectors are the hard case for any partition-based ANN;
# clustered production embeddings recall far higher at smaller fractions,
# and n_probe is the per-query knob)
_IVF_LISTS = 16
_IVF_PROBE = 4


def q_ann_ivf(spark, sf_dir):
    """IVF (inverted-file) ANN top-3: deterministic md5-sampled coarse
    centroids, exact int64 list assignment + n_probe search, quantized
    re-rank (operators/similarity.ivf_topk) — the coarse-quantizer
    counterpart to the LSH ANN path. Every stage is integer-exact and
    SQL-expressible, so the full index + search pipeline is oracle-checked."""
    from a5spark.operators.similarity import ivf_topk

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 25 == 0).select(
        F.col("vec_id").alias("q_id"), F.col("embedding")
    )
    out = ivf_topk(
        queries, emb, k=3, dim=_LSH_DIM, n_lists=_IVF_LISTS, n_probe=_IVF_PROBE,
    )
    return out.orderBy("q_id", "rank")


def _sql_ivf_ctes(
    n_lists: int,
    n_probe: int,
    k: int,
    dim: int,
    query_pred: str,
    lloyd_iters: int = 1,
) -> str:
    """Full IVF oracle SQL over a CTE `qv(vec_id, v)` (quantized lists),
    mirroring operators/similarity.ivf_topk: md5-ranked centroid sample,
    `lloyd_iters` integer floor-mean Lloyd refinements (the remainder-
    corrected division both engines evaluate identically), assignment,
    n_probe search and quantized re-rank."""
    best = (
        "SELECT q.vec_id{alias}, c.list_id,\n"
        "       row_number() OVER (PARTITION BY q.vec_id\n"
        "           ORDER BY CAST(list_dot_product(q.v, c.cv) AS BIGINT) DESC,\n"
        "                    c.list_id) AS r\n"
        "FROM qv q CROSS JOIN {cent} c{pred}"
    )
    ctes = f"""
    hk AS (
      SELECT vec_id, v,
             CAST(('0x' || substring(md5(CAST(vec_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h
      FROM qv
    ), cent0 AS (
      SELECT CAST(row_number() OVER (ORDER BY h, vec_id) - 1 AS INTEGER) AS list_id,
             list_transform(v, x -> CAST(x AS BIGINT)) AS cv
      FROM hk
      QUALIFY row_number() OVER (ORDER BY h, vec_id) <= {n_lists}
    ), pos AS (SELECT unnest(generate_series(1, {dim})) AS p)"""
    cent = "cent0"
    for i in range(lloyd_iters):
        a = best.format(alias="", cent=cent, pred="")
        ctes += f""",
    a{i} AS (
      SELECT vec_id, list_id FROM ({a}) WHERE r = 1
    ), sums{i} AS (
      SELECT a.list_id, p.p, CAST(SUM(q.v[p.p]) AS BIGINT) AS s, COUNT(*) AS c
      FROM a{i} a JOIN qv q USING (vec_id) CROSS JOIN pos p
      GROUP BY a.list_id, p.p
    ), newc{i} AS (
      SELECT list_id, list((s - (((s % c) + c) % c)) // c ORDER BY p) AS cv
      FROM sums{i} GROUP BY list_id
    ), cent{i + 1} AS (
      SELECT c0.list_id, COALESCE(n.cv, c0.cv) AS cv
      FROM {cent} c0 LEFT JOIN newc{i} n USING (list_id)
    )"""
        cent = f"cent{i + 1}"
    assign = best.format(alias="", cent=cent, pred="")
    probes = best.format(
        alias=" AS q_id", cent=cent, pred=f" WHERE {query_pred}"
    )
    ctes += f""",
    assign AS (
      SELECT vec_id, list_id FROM ({assign}) WHERE r = 1
    ), probes AS (
      SELECT q_id, list_id FROM ({probes}) WHERE r <= {n_probe}
    ), cand AS (
      SELECT p.q_id, a.vec_id FROM probes p JOIN assign a USING (list_id)
    ), scored AS (
      SELECT c.q_id, c.vec_id,
             CAST(list_dot_product(qq.v, pp.v) AS BIGINT) AS qdot,
             row_number() OVER (PARTITION BY c.q_id
                 ORDER BY CAST(list_dot_product(qq.v, pp.v) AS BIGINT) DESC,
                          c.vec_id) AS rank
      FROM cand c
      JOIN qv qq ON qq.vec_id = c.q_id
      JOIN qv pp ON pp.vec_id = c.vec_id
    )"""
    return ctes


def oracle_ann_ivf():
    return f"""
    WITH qv AS (
      SELECT vec_id,
             list_transform(embedding, x -> round(CAST(x AS DOUBLE) * 1000)) AS v
      FROM embeddings
    ), {_sql_ivf_ctes(_IVF_LISTS, _IVF_PROBE, 3, _LSH_DIM, "q.vec_id % 25 = 0")}
    SELECT q_id, CAST(rank AS INT) AS rank, vec_id, qdot
    FROM scored WHERE rank <= 3 ORDER BY q_id, rank
    """


def _sql_bucket_expr(
    t: int, n_bits: int = None, first_bit: int = 0, dim: int = None
) -> str:
    """Banded-LSH bucket id for table t as SQL over a quantized list column
    `v` — the same md5-derived sign literals the Catalyst expression bakes.
    first_bit > 0 derives the SUFFIX band used for wide-bucket refinement."""
    from a5spark.operators.similarity import hyperplane_signs

    n_bits = _LSH_BITS if n_bits is None else n_bits
    dim = _LSH_DIM if dim is None else dim
    bits = []
    for b in range(n_bits):
        signs = hyperplane_signs(t, first_bit + b, dim)
        lit = "[" + ",".join(str(s) for s in signs) + "]"
        bits.append(
            f"(CASE WHEN list_dot_product(v, {lit}) > 0 THEN {1 << b} ELSE 0 END)"
        )
    return " + ".join(bits)


def _sql_lsh_keyed_ctes(
    n_bits: int = None,
    n_tables: int = None,
    dim: int = None,
    bucket_cap: int = None,
    extra_bits: int = None,
    probe: bool = False,
) -> str:
    """CTE chain `buckets -> wide -> suffixes -> keyed` reproducing the
    bucket-cap refinement of operators/similarity._extend_assign over a CTE
    `qv(vec_id, v)`: primary buckets wider than the cap extend their key by
    `extra_bits` suffix hyperplane bits (key = bucket + suffix * 2^n_bits,
    matching Spark's shiftleft). probe=True appends a `keyed_q` CTE — the
    QUERY-side multi-probe key set, where wide-bucket rows additionally emit
    every single-bit flip of their suffix (similarity._extend_assign
    probe_flips)."""
    from a5spark.operators.similarity import _EB_HEADROOM, _EB_MARGIN

    n_bits = _LSH_BITS if n_bits is None else n_bits
    n_tables = _LSH_TABLES if n_tables is None else n_tables
    dim = _LSH_DIM if dim is None else dim
    bucket_cap = _LSH_BUCKET_CAP if bucket_cap is None else bucket_cap
    extra_bits = _LSH_EXTRA_BITS if extra_bits is None else extra_bits
    eb_ceiling = extra_bits + _EB_HEADROOM
    prim = " UNION ALL ".join(
        f"SELECT vec_id, {t} AS t, {_sql_bucket_expr(t, n_bits, 0, dim)} AS bucket FROM qv"
        for t in range(n_tables)
    )
    # suffix bits evaluate only over rows that hit a wide bucket (qv_need),
    # mirroring the Spark side where the suffix pass runs on `need` ids
    # only; bits are computed to the depth CEILING and masked down to each
    # bucket's own adaptive depth `eb` (bitlength((n-1)//cap) + margin,
    # clamped to [extra_bits, ceiling] — similarity._wide_buckets)
    suf = " UNION ALL ".join(
        f"SELECT vec_id, {t} AS t, {_sql_bucket_expr(t, eb_ceiling, n_bits, dim)} AS suffix FROM qv_need"
        for t in range(n_tables)
    )
    ctes = f"""
    buckets AS ({prim}),
    wide AS (
      SELECT t, bucket,
             LEAST({eb_ceiling}, GREATEST({extra_bits},
                   CAST(length(bin((count(*) - 1) // {bucket_cap})) AS INTEGER) + {_EB_MARGIN})) AS eb
      FROM buckets GROUP BY t, bucket HAVING count(*) > {bucket_cap}
    ),
    need AS (
      SELECT DISTINCT b.vec_id FROM buckets b
      JOIN wide w ON w.t = b.t AND w.bucket = b.bucket
    ),
    qv_need AS (SELECT qv.* FROM qv JOIN need USING (vec_id)),
    suffixes AS ({suf}),
    keyed AS (
      SELECT b.vec_id, b.t,
             CASE WHEN w.bucket IS NOT NULL
                  THEN CAST(b.bucket AS BIGINT) + CAST(s.suffix % (1 << w.eb) AS BIGINT) * {1 << n_bits}
                  ELSE CAST(b.bucket AS BIGINT) END AS bucket
      FROM buckets b
      LEFT JOIN wide w ON w.t = b.t AND w.bucket = b.bucket
      LEFT JOIN suffixes s ON s.vec_id = b.vec_id AND s.t = b.t
    )"""
    if probe:
        from a5spark.operators.similarity import _probe_masks

        flips = "[" + ",".join(str(f) for f in [0] + _probe_masks(eb_ceiling)) + "]"
        ctes += f""",
    keyed_q AS (
      SELECT b.vec_id, b.t,
             CASE WHEN w.bucket IS NOT NULL
                  THEN CAST(b.bucket AS BIGINT) + CAST(xor(s.suffix % (1 << w.eb), f.flip) AS BIGINT) * {1 << n_bits}
                  ELSE CAST(b.bucket AS BIGINT) END AS bucket
      FROM buckets b
      LEFT JOIN wide w ON w.t = b.t AND w.bucket = b.bucket
      LEFT JOIN suffixes s ON s.vec_id = b.vec_id AND s.t = b.t
      CROSS JOIN (SELECT unnest({flips}) AS flip) f
      WHERE (w.bucket IS NOT NULL AND f.flip < (1 << w.eb))
         OR (w.bucket IS NULL AND f.flip = 0)
    )"""
    return ctes


def oracle_ann_lsh():
    return f"""
    WITH qv AS (
      SELECT vec_id,
             list_transform(embedding, x -> round(CAST(x AS DOUBLE) * 1000)) AS v
      FROM embeddings
    ), {_sql_lsh_keyed_ctes(probe=True)},
    pairs AS (
      SELECT DISTINCT q.vec_id AS q_id, p.vec_id AS vec_id
      FROM keyed_q q JOIN keyed p ON q.t = p.t AND q.bucket = p.bucket
      WHERE q.vec_id % 25 = 0
    ), scored AS (
      SELECT pr.q_id, pr.vec_id,
             CAST(list_dot_product(a.v, b.v) AS BIGINT) AS qdot,
             row_number() OVER (
               PARTITION BY pr.q_id
               ORDER BY list_dot_product(a.v, b.v) DESC, pr.vec_id ASC
             ) AS rank
      FROM pairs pr
      JOIN qv a ON a.vec_id = pr.q_id
      JOIN qv b ON b.vec_id = pr.vec_id
    )
    SELECT q_id, CAST(rank AS INT) AS rank, vec_id, qdot
    FROM scored WHERE rank <= 3 ORDER BY q_id, rank
    """


def q_radius_join(spark, sf_dir):
    """Spatial radius join: every 100th image queries for all images within
    300 km (A5 cap cover + range join + exact haversine). Oracle: brute-force
    haversine cross join."""
    from a5spark import cache
    from a5spark.operators.knn import radius_join
    from a5spark.operators.spatial import assign_cells

    img = cache.persist(assign_cells(images_from_sf_dir(spark, sf_dir), 7))
    queries = img.filter(F.col("k") % 100 == 0).select(
        F.col("image_id").alias("query_id"), "lon", "lat", "cell"
    )
    pts = img.select("image_id", "lon", "lat", "cell")
    out = radius_join(queries, pts, radius_m=300000.0, resolution=7)
    return (
        out.groupBy("query_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_within"),
            F.min("image_id").alias("min_image"),
        )
        .orderBy("query_id")
    )


def oracle_radius_join():
    img_cte = """
      SELECT printf('img_%012d', o_orderkey) AS image_id,
             ((o_orderkey % 1048576) * 9973 + 12345) % 360000 / 1000.0 - 180.0 AS lon,
             degrees(asin(((o_orderkey % 1048576) * 104729 + 54321) % 2000001 / 1000000.0 - 1.0)) AS lat,
             o_orderkey AS k
      FROM orders
    """
    return f"""
    WITH img AS ({img_cte}),
    q AS (SELECT image_id AS query_id, lon AS q_lon, lat AS q_lat FROM img WHERE k % 100 = 0)
    SELECT query_id, CAST(count(*) AS BIGINT) AS n_within, min(image_id) AS min_image
    FROM q JOIN img
      ON 2 * 6371007.2 * asin(sqrt(
           sin(radians(lat - q_lat) / 2) * sin(radians(lat - q_lat) / 2)
           + cos(radians(q_lat)) * cos(radians(lat))
             * sin(radians(lon - q_lon) / 2) * sin(radians(lon - q_lon) / 2)
         )) <= 300000.0
    GROUP BY query_id ORDER BY query_id
    """


def q_knn_images(spark, sf_dir):
    """Exact A5 cap-cover kNN join: 5 nearest images for every 200th image,
    iterative radius growth with per-round completeness guarantee. Oracle:
    brute-force haversine row_number ranking (ties by image_id)."""
    from a5spark import cache
    from a5spark.operators.knn import knn_join, pick_index_resolution
    from a5spark.operators.spatial import assign_cells

    # density-adaptive index resolution (round 6): the cap accounting adds
    # one index-cell radius to every round, so the index granularity must
    # track point density — a fixed res over-admits quadratically as the
    # corpus grows (res 7 was right for 150k rows but ~13x over-provisioned
    # at 15M; see pick_index_resolution and BASELINE.md sf10). The count
    # comes from parquet footer metadata like q_bucketed_join's
    # (manifest-style, no scan job); the count() fallback only fires for
    # non-local sf dirs. The oracle is brute-force haversine, so the index
    # choice can never change results.
    from a5spark.sources.images import images_count_hint

    base = images_from_sf_dir(spark, sf_dir)
    n_hint = images_count_hint(sf_dir)
    n_pts = n_hint if n_hint is not None else base.count()
    res = pick_index_resolution(n_pts, 5)
    img = cache.persist(assign_cells(base, res))
    queries = img.filter(F.col("k") % 200 == 0).select(
        F.col("image_id").alias("query_id"), "lon", "lat", "cell"
    )
    pts = img.select("image_id", "lon", "lat", "cell")
    # micrometer tie quantum: synthetic lattice points can be EXACTLY
    # equidistant, where raw-double ranking is libm-ULP noise that differs
    # between Spark and DuckDB — quantize, then break ties by image_id
    out = knn_join(
        queries, pts, k=5, resolution=res, point_id="image_id",
        tie_quantum_decimals=6, points_count=n_pts,
    )
    return out.select(
        "query_id", "rank", "image_id", F.round("dist_m", 3).alias("dist_m")
    ).orderBy("query_id", "rank")


def oracle_knn_images():
    img_cte = """
      SELECT printf('img_%012d', o_orderkey) AS image_id,
             ((o_orderkey % 1048576) * 9973 + 12345) % 360000 / 1000.0 - 180.0 AS lon,
             degrees(asin(((o_orderkey % 1048576) * 104729 + 54321) % 2000001 / 1000000.0 - 1.0)) AS lat,
             o_orderkey AS k
      FROM orders
    """
    return f"""
    WITH img AS ({img_cte}),
    q AS (SELECT image_id AS query_id, lon AS q_lon, lat AS q_lat FROM img WHERE k % 200 = 0),
    scored AS (
      SELECT query_id, image_id,
             2 * 6371007.2 * asin(sqrt(
               sin(radians(lat - q_lat) / 2) * sin(radians(lat - q_lat) / 2)
               + cos(radians(q_lat)) * cos(radians(lat))
                 * sin(radians(lon - q_lon) / 2) * sin(radians(lon - q_lon) / 2)
             )) AS dist_m,
             row_number() OVER (
               PARTITION BY query_id
               ORDER BY round(2 * 6371007.2 * asin(sqrt(
                 sin(radians(lat - q_lat) / 2) * sin(radians(lat - q_lat) / 2)
                 + cos(radians(q_lat)) * cos(radians(lat))
                   * sin(radians(lon - q_lon) / 2) * sin(radians(lon - q_lon) / 2)
               )), 6) ASC, image_id ASC
             ) AS rank
      FROM q, img
    )
    SELECT query_id, CAST(rank AS INT) AS rank, image_id, round(dist_m, 3) AS dist_m
    FROM scored WHERE rank <= 5 ORDER BY query_id, rank
    """


def q_polyfill_cover(spark, sf_dir):
    """Distributed polyfill: cover sizes for a small polygon layer
    (rows-only; the kernel itself is fixture-pinned in tests)."""
    import json as _json

    from a5spark.operators.polygons import polyfill_cover

    polys = [
        ("uk_box", [[[-8.0, 50.0], [2.0, 50.0], [2.0, 59.0], [-8.0, 59.0]]]),
        ("alps_tri", [[[6.0, 44.0], [14.0, 45.0], [10.0, 48.0]]]),
        ("horn", [[[40.0, 2.0], [52.0, 2.0], [52.0, 12.0], [44.0, 12.0]]]),
    ]
    pdf = spark.createDataFrame(
        [(pid, _json.dumps(rings)) for pid, rings in polys],
        ["polygon_id", "rings_json"],
    )
    cover = polyfill_cover(pdf, resolution=7)
    return cover.groupBy("polygon_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_cells"),
        F.min("resolution").alias("min_res"),
        F.max("resolution").alias("max_res"),
    ).orderBy("polygon_id")


def oracle_polyfill_cover():
    # the polygon layer is FIXED (sf-independent) and the fill kernel is
    # fixture-pinned against the reference (tests/test_fixture_full.py), so
    # the expected compacted-cover stats are exact constants
    return """
    SELECT * FROM (VALUES
      ('alps_tri', CAST(32 AS BIGINT), CAST(6 AS INT), CAST(7 AS INT)),
      ('horn',     CAST(122 AS BIGINT), CAST(4 AS INT), CAST(7 AS INT)),
      ('uk_box',   CAST(83 AS BIGINT), CAST(4 AS INT), CAST(7 AS INT))
    ) AS t(polygon_id, n_cells, min_res, max_res)
    ORDER BY polygon_id
    """


def q_polyfill_multipolygon(spark, sf_dir):
    """Multi-part polygon layers (round 6): a WKT MULTIPOLYGON with a holed
    part and a GEOMETRYCOLLECTION mixing a point, a holed polygon, and a
    multipolygon member all fill through the parts parser
    (functions.gis.wkt_polygon_parts) — one fill per part, unioned per
    layer id. The layer is fixed (sf-independent) and the fill kernel is
    fixture-pinned, so per-id compacted-cover stats are exact constants."""
    from a5spark.operators.polygons import polyfill_cover_wkt

    layer = [
        (
            "islands",
            "MULTIPOLYGON (((-8.0 50.0, 2.0 50.0, 2.0 59.0, -8.0 59.0, -8.0 50.0)),"
            " ((40.0 2.0, 52.0 2.0, 52.0 12.0, 44.0 12.0, 40.0 2.0)))",
        ),
        (
            "donut_pair",
            "MULTIPOLYGON (((12.0 40.0, 16.0 40.0, 16.0 44.0, 12.0 44.0, 12.0 40.0),"
            " (13.0 41.0, 15.0 41.0, 15.0 43.0, 13.0 43.0, 13.0 41.0)),"
            " ((6.0 44.0, 14.0 45.0, 10.0 48.0, 6.0 44.0)))",
        ),
        (
            "mixed_gc",
            "GEOMETRYCOLLECTION (POINT (1 2),"
            " POLYGON ((-0.5 51.2, 0.3 51.2, 0.3 51.7, -0.5 51.7, -0.5 51.2)),"
            " MULTIPOLYGON (((150.0 -35.0, 155.0 -35.0, 155.0 -30.0, 150.0 -30.0,"
            " 150.0 -35.0))))",
        ),
        ("not_polygonal", "MULTILINESTRING ((0 0, 1 1), (2 2, 3 3))"),
    ]
    pdf = spark.createDataFrame(layer, ["polygon_id", "wkt"])
    cover = polyfill_cover_wkt(pdf, resolution=6)
    return cover.groupBy("polygon_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_cells"),
        F.countDistinct("cell").cast("long").alias("n_distinct"),
        F.min("resolution").alias("min_res"),
        F.max("resolution").alias("max_res"),
    ).orderBy("polygon_id")


def oracle_polyfill_multipolygon():
    # fixed layer + fixture-pinned fill kernel (tests/test_fixture_full.py,
    # tests/test_round6.py parity vs union of per-part fills) -> constants;
    # the non-polygonal row must contribute NO group at all
    return """
    SELECT * FROM (VALUES
      ('donut_pair', CAST(25 AS BIGINT), CAST(25 AS BIGINT), CAST(5 AS INT), CAST(6 AS INT)),
      ('islands',    CAST(93 AS BIGINT), CAST(93 AS BIGINT), CAST(4 AS INT), CAST(6 AS INT)),
      ('mixed_gc',   CAST(22 AS BIGINT), CAST(22 AS BIGINT), CAST(5 AS INT), CAST(6 AS INT))
    ) AS t(polygon_id, n_cells, n_distinct, min_res, max_res)
    ORDER BY polygon_id
    """


_PIP_SNAPSHOT = "/tmp/a5spark_oracle/pip_join_r9"


def q_pip_join(spark, sf_dir):
    """Point-in-polygon join: images vs the polygon layer (cover join +
    exact PIP refine). The cover-join candidate set and the refine verdicts
    are snapshot to parquet; the oracle recomputes the final group-by from
    the verdict snapshot INNER-JOINED against the candidate snapshot — a
    value-level gate on the join topology (every refined row must be a
    candidate) while the PIP predicate itself stays kernel-pinned
    (test_pip_refine_matches_kernel)."""
    import json as _json

    from a5spark import cache
    from a5spark.operators.polygons import pip_refine, point_in_polygon_join, polyfill_cover
    from a5spark.operators.spatial import assign_cells

    polys = [
        ("atlantic_box", [[[-40.0, 10.0], [-10.0, 10.0], [-10.0, 40.0], [-40.0, 40.0]]]),
        ("pacific_box", [[[150.0, -20.0], [179.0, -20.0], [179.0, 10.0], [150.0, 10.0]]]),
    ]
    pdf = spark.createDataFrame(
        [(pid, _json.dumps(rings)) for pid, rings in polys],
        ["polygon_id", "rings_json"],
    )
    cover = polyfill_cover(pdf, resolution=6)
    img = cache.persist(assign_cells(images_from_sf_dir(spark, sf_dir), 9))
    joined = point_in_polygon_join(img, cover, point_cell="cell", expand_to=9)
    _oracle_export(
        joined.select("polygon_id", "image_id").distinct(),
        f"{_PIP_SNAPSHOT}/candidates",
    )
    refined = _snapshot(
        pip_refine(joined, pdf).select("polygon_id", "image_id"),
        f"{_PIP_SNAPSHOT}/refined",
    )
    return refined.groupBy("polygon_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_images"),
        F.min("image_id").alias("min_image"),
    ).orderBy("polygon_id")


def oracle_pip_join():
    return f"""
    WITH cand AS (
      SELECT DISTINCT polygon_id, image_id
      FROM read_parquet('{_PIP_SNAPSHOT}/candidates/*.parquet')
    ),
    ref AS (
      SELECT polygon_id, image_id
      FROM read_parquet('{_PIP_SNAPSHOT}/refined/*.parquet')
    )
    SELECT r.polygon_id, CAST(count(*) AS BIGINT) AS n_images,
           min(r.image_id) AS min_image
    FROM ref r
    JOIN cand c ON c.polygon_id = r.polygon_id AND c.image_id = r.image_id
    GROUP BY r.polygon_id ORDER BY r.polygon_id
    """


_GRIDDISK_SNAPSHOT = "/tmp/a5spark_oracle/grid_disk_r5"


def q_grid_disk(spark, sf_dir):
    """k-ring (grid_disk, k=2) density expansion over the res-5 cell raster:
    per-cell counts, then the count-sum over each cell's distance-<=2 disk —
    the windowed spatial aggregation pattern (reference
    a5/traversal/grid_disk.py:10-70 made distributed). The density and the
    exploded (cell, disk member) relation are snapshot to parquet so the
    oracle independently reproduces the disk join+aggregate; the disk kernel
    itself is fixture-pinned (42-case grid_disk fixture)."""
    from a5spark.operators.knn import a5_grid_disk
    from a5spark.operators.spatial import assign_cells, cell_density

    img = assign_cells(images_from_sf_dir(spark, sf_dir), 5)
    dens = _snapshot(
        cell_density(img), f"{_GRIDDISK_SNAPSHOT}/density", reuse=True
    )
    # the origin cell's own count rides along the exploded disk rows
    # (optimization round 8): n is functionally dependent on cell, so
    # first(n) in the ring aggregation replaces the historic second
    # dens-join — one less exchange, identical rows (every dens cell's
    # disk contains itself, so the old inner join kept exactly the ring
    # rows; the oracle projects (cell, dcell) from the snapshot unchanged)
    disk = _snapshot(
        dens.select(
            "cell",
            "n",
            F.explode(a5_grid_disk(F.col("cell"), F.lit(2))).alias("dcell"),
        ),
        f"{_GRIDDISK_SNAPSHOT}/disk",
    )
    nb = dens.select(F.col("cell").alias("dcell"), F.col("n").alias("d_n"))
    ring = (
        disk.join(nb, "dcell", "left")
        .groupBy("cell")
        .agg(
            F.first("n").cast("long").alias("n"),
            F.count(F.lit(1)).cast("long").alias("n_disk_cells"),
            F.sum(F.coalesce(F.col("d_n"), F.lit(0))).cast("long").alias("disk_sum"),
        )
    )
    return ring.select("cell", "n", "n_disk_cells", "disk_sum").orderBy("cell")


def oracle_grid_disk():
    return f"""
    WITH dens AS (SELECT cell, n FROM read_parquet('{_GRIDDISK_SNAPSHOT}/density/*.parquet')),
    disk AS (SELECT cell, dcell FROM read_parquet('{_GRIDDISK_SNAPSHOT}/disk/*.parquet')),
    ring AS (
      SELECT k.cell, CAST(count(*) AS BIGINT) AS n_disk_cells,
             CAST(sum(coalesce(d.n, 0)) AS BIGINT) AS disk_sum
      FROM disk k LEFT JOIN dens d ON d.cell = k.dcell
      GROUP BY k.cell
    )
    SELECT dens.cell, CAST(dens.n AS BIGINT) AS n, r.n_disk_cells, r.disk_sum
    FROM dens JOIN ring r ON r.cell = dens.cell
    ORDER BY dens.cell
    """


_SKEW_SNAPSHOT = "/tmp/a5spark_oracle/skewed_assign_r5"


_STRAT_SNAPSHOT = "/tmp/a5spark_oracle/stratified_assign_r7"


def q_stratified_sample(spark, sf_dir):
    """Geo-stratified training-data downsampling (round 7): at most 8 rows
    per res-4 cell, chosen by a deterministic per-row sample key — the
    balancing step a geospatially skewed corpus needs before training (a
    downtown cell contributes the same budget as an ocean cell). Runs the
    salted two-phase sampler (operators/spatial.stratified_cell_sample —
    hot cells never funnel through one shuffle partition); the assignment
    is snapshot to parquet and DuckDB reproduces the exact sampled
    MEMBERSHIP with a single ROW_NUMBER — per-row gate, not just counts."""
    from a5spark.operators.spatial import assign_cells, stratified_cell_sample

    img = assign_cells(images_from_sf_dir(spark, sf_dir), 4)
    keyed = img.select(
        "k",
        "cell",
        ((F.col("phash") % 999983) * 31 + F.col("k") % 101).alias("sample_key"),
    )
    keyed = _snapshot(keyed, _STRAT_SNAPSHOT)
    out = stratified_cell_sample(keyed, cap_per_cell=8)
    return out.select(
        "cell", F.col("sample_rank").cast("long").alias("sample_rank"), "k"
    ).orderBy("cell", "sample_rank")


def oracle_stratified_sample():
    return f"""
    WITH ranked AS (
      SELECT cell, k,
             ROW_NUMBER() OVER (
               PARTITION BY cell ORDER BY sample_key, k
             ) AS sample_rank
      FROM read_parquet('{_STRAT_SNAPSHOT}/*.parquet')
    )
    SELECT cell, CAST(sample_rank AS BIGINT) AS sample_rank, k
    FROM ranked WHERE sample_rank <= 8
    ORDER BY cell, sample_rank
    """


def q_skewed_density(spark, sf_dir):
    """Zipfian-hot-cell density through the SALTED two-phase aggregation
    (operators/spatial.salted_density): half of all rows are forced onto one
    hot cell (lon 0 / lat 0 at res 5), the skew case where a naive
    groupBy(cell) funnels 50% of the table through one shuffle partition.
    The salt spreads the hot key over 64 shuffle keys (partial agg on
    (cell, salt), final on cell — see PLANS.md). The skewed assignment is
    snapshot to parquet; the oracle is the plain GROUP BY count."""
    from a5spark.kernels.cell import lonlat_to_cell as _enc
    from a5spark.kernels.serialization import to_signed as _tos
    from a5spark.operators.spatial import assign_cells, salted_density

    hot_cell = int(_tos(_enc([0.0], [0.0], 5))[0])
    img = assign_cells(images_from_sf_dir(spark, sf_dir), 5)
    skewed = img.select(
        "k",
        F.when(F.col("k") % 2 == 0, F.lit(hot_cell))
        .otherwise(F.col("cell"))
        .alias("cell"),
    )
    skewed = _snapshot(skewed, _SKEW_SNAPSHOT)
    dens = salted_density(skewed, cell="cell", buckets=64, row_key="k")
    return (
        dens.filter(F.col("n") >= 5)
        .select("cell", F.col("n").cast("long").alias("n"))
        .orderBy(F.desc("n"), "cell")
    )


def oracle_skewed_density():
    return f"""
    SELECT cell, CAST(count(*) AS BIGINT) AS n
    FROM read_parquet('{_SKEW_SNAPSHOT}/*.parquet')
    GROUP BY cell HAVING count(*) >= 5
    ORDER BY n DESC, cell
    """


_FOCAL_SNAPSHOT = "/tmp/a5spark_oracle/focal_r6"


def q_focal_smoothing(spark, sf_dir):
    """Focal (neighborhood) smoothing of the cell density raster: per-cell
    counts at res 6, then the mean over each cell's global-neighbor set
    (a5_cell_neighbors UDF, reference traversal/global_neighbors.py). The
    (cell, n) density and the exploded (cell, neighbor) adjacency are
    snapshot to parquet so the oracle independently reproduces the focal
    join+aggregate; the adjacency kernel itself is fixture-pinned."""
    from a5spark.functions.udfs import a5_cell_neighbors
    from a5spark.operators.spatial import assign_cells, cell_density

    img = assign_cells(images_from_sf_dir(spark, sf_dir), 6)
    dens = _snapshot(
        cell_density(img), f"{_FOCAL_SNAPSHOT}/density", reuse=True
    )
    # the origin cell's count rides along the exploded adjacency rows
    # (round 8, same move as grid_disk): first(n) in the focal aggregation
    # replaces the historic second dens-join — one less exchange,
    # identical rows (every cell has >= 1 neighbor, so the old inner join
    # kept exactly the focal rows; the oracle projects (cell, nbr) from
    # the snapshot unchanged)
    adj = _snapshot(
        dens.select(
            "cell",
            "n",
            F.explode(a5_cell_neighbors(F.col("cell"))).alias("nbr"),
        ),
        f"{_FOCAL_SNAPSHOT}/adjacency",
    )
    nb = dens.select(F.col("cell").alias("nbr"), F.col("n").alias("nbr_n"))
    focal = (
        adj.join(nb, "nbr", "left")
        .groupBy("cell")
        .agg(
            F.first("n").cast("long").alias("n"),
            F.count(F.lit(1)).cast("long").alias("n_neighbors"),
            F.sum(F.coalesce(F.col("nbr_n"), F.lit(0))).cast("long").alias("nbr_sum"),
        )
    )
    return focal.select(
        "cell",
        "n",
        "n_neighbors",
        "nbr_sum",
        F.round(F.col("nbr_sum") / F.col("n_neighbors"), 6).alias("focal_mean"),
    ).orderBy("cell")


def oracle_focal_smoothing():
    return f"""
    WITH dens AS (SELECT cell, n FROM read_parquet('{_FOCAL_SNAPSHOT}/density/*.parquet')),
    adj AS (SELECT cell, nbr FROM read_parquet('{_FOCAL_SNAPSHOT}/adjacency/*.parquet')),
    focal AS (
      SELECT a.cell, CAST(count(*) AS BIGINT) AS n_neighbors,
             CAST(sum(coalesce(d.n, 0)) AS BIGINT) AS nbr_sum
      FROM adj a LEFT JOIN dens d ON d.cell = a.nbr
      GROUP BY a.cell
    )
    SELECT dens.cell, CAST(dens.n AS BIGINT) AS n, f.n_neighbors, f.nbr_sum,
           round(CAST(f.nbr_sum AS DOUBLE) / f.n_neighbors, 6) AS focal_mean
    FROM dens JOIN focal f ON f.cell = dens.cell
    ORDER BY dens.cell
    """


_HOTREGION_SNAPSHOT = "/tmp/a5spark_oracle/hot_density_r5"


def q_hot_region_vectorize(spark, sf_dir):
    """Raster -> vector: threshold the res-5 density raster (occupied cells)
    and re-express the coverage footprint as a COMPACTED mixed-resolution
    vector cover (the inverse of the tile-pyramid direction). The density
    snapshot is parquet-backed; the oracle reproduces threshold + the full
    per-level complete-sibling collapse in SQL."""
    from a5spark.operators.spatial import assign_cells, cell_density, compact_cover

    img = assign_cells(images_from_sf_dir(spark, sf_dir), 5)
    dens = _snapshot(cell_density(img), _HOTREGION_SNAPSHOT)
    hot = dens.filter(F.col("n") >= 1).select("cell")
    cover = compact_cover(hot, resolution_bounds=(5, 5))
    return (
        cover.groupBy(native.cell_resolution(F.col("cell")).alias("resolution"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_cells"),
            F.min("cell").alias("min_cell"),
            F.max("cell").alias("max_cell"),
        )
        .orderBy("resolution")
    )


def oracle_hot_region_vectorize():
    src = f"""
      SELECT cell AS c FROM read_parquet('{_HOTREGION_SNAPSHOT}/*.parquet')
      WHERE n >= 1
    """
    chain = _sql_compact_chain(src, 5)
    return f"""
    WITH {chain}
    SELECT {_SQL_RES_OF_C} AS resolution,
           CAST(count(*) AS BIGINT) AS n_cells,
           min(c) AS min_cell, max(c) AS max_cell
    FROM (SELECT c, bit_count((c & -c) - 1) AS lsb FROM compacted)
    GROUP BY 1 ORDER BY 1
    """


_LINE_SNAPSHOT = "/tmp/a5spark_oracle/line_trace_r7"


def q_line_trace(spark, sf_dir):
    """Trajectory -> ordered cell trace -> corridor density: fixed polylines
    traced at res 7 (a5_line_to_cells UDF, reference a5/traversal/line.py),
    then joined against the image table's per-cell density. The traced
    (route, cell, area) relation and the res-7 density are snapshot to
    parquet so DuckDB independently reproduces the corridor join + aggregate
    (the trace kernel itself is fixture-pinned and order-parity-checked vs
    the reference in test_traversal; micro-areas quantized to integer m2 so
    the corridor sum is engine-exact)."""
    from a5spark.functions.udfs import a5_cell_area_exact, a5_line_to_cells
    from a5spark.operators.spatial import assign_cells, cell_density

    routes = [
        ("london_paris", [[-0.1276, 51.5074], [2.35, 48.85]]),
        ("nyc_chicago_la", [[-73.98, 40.75], [-87.62, 41.88], [-118.24, 34.05]]),
        ("tokyo_osaka", [[139.76, 35.68], [135.5, 34.69]]),
        ("cape_cairo", [[18.42, -33.92], [31.23, 30.04]]),
    ]
    rdf = spark.createDataFrame(routes, ["route_id", "waypoints"])
    traced = rdf.select(
        "route_id",
        a5_line_to_cells(F.col("waypoints"), F.lit(7)).alias("cells"),
    ).select(
        "route_id",
        F.size("cells").alias("n_cells"),
        F.element_at("cells", 1).alias("first_cell"),
        F.element_at("cells", -1).alias("last_cell"),
        F.posexplode("cells").alias("seq", "cell"),
    ).withColumn(
        "cell_m2", F.round(a5_cell_area_exact(F.col("cell"))).cast("long")
    )
    traced = _snapshot(traced, f"{_LINE_SNAPSHOT}/trace")

    dens = _snapshot(
        cell_density(assign_cells(images_from_sf_dir(spark, sf_dir), 7)),
        f"{_LINE_SNAPSHOT}/density",
    )

    joined = traced.join(dens, "cell", "left")
    return (
        joined.groupBy("route_id", "n_cells", "first_cell", "last_cell")
        .agg(
            F.sum(F.coalesce(F.col("n"), F.lit(0)))
            .cast("long")
            .alias("n_corridor_images"),
            F.sum("cell_m2").cast("long").alias("corridor_m2"),
        )
        .orderBy("route_id")
    )


def oracle_line_trace():
    return f"""
    WITH trace AS (
      SELECT route_id, n_cells, first_cell, last_cell, cell, cell_m2
      FROM read_parquet('{_LINE_SNAPSHOT}/trace/*.parquet')
    ),
    dens AS (SELECT cell, n FROM read_parquet('{_LINE_SNAPSHOT}/density/*.parquet'))
    SELECT t.route_id, t.n_cells, t.first_cell, t.last_cell,
           CAST(sum(coalesce(d.n, 0)) AS BIGINT) AS n_corridor_images,
           CAST(sum(t.cell_m2) AS BIGINT) AS corridor_m2
    FROM trace t LEFT JOIN dens d ON d.cell = t.cell
    GROUP BY t.route_id, t.n_cells, t.first_cell, t.last_cell
    ORDER BY t.route_id
    """


_S2_SNAPSHOT = "/tmp/a5spark_oracle/s2_crossindex"


def q_s2_crossindex(spark, sf_dir):
    """Cross-index assignment: A5 + S2 cells per image, joint density. The
    dual encode (not SQL-expressible; pinned by kernel property tests) is
    snapshot to parquet so the oracle independently verifies the rollup and
    the deterministic top-100 selection."""
    from a5spark.functions.crossindex import assign_cross_index

    img = images_from_sf_dir(spark, sf_dir)
    df = assign_cross_index(img, a5_resolution=5, s2_level=8)
    snap = _snapshot(
        df.select("image_id", "a5_cell", "s2_cell"), _S2_SNAPSHOT
    )
    return (
        snap.groupBy("a5_cell", "s2_cell")
        .agg(F.count(F.lit(1)).cast("long").alias("n_images"))
        .orderBy(F.desc("n_images"), "a5_cell", "s2_cell")
        .limit(100)
    )


def oracle_s2_crossindex():
    return f"""
    SELECT a5_cell, s2_cell, CAST(count(*) AS BIGINT) AS n_images
    FROM read_parquet('{_S2_SNAPSHOT}/*.parquet')
    GROUP BY a5_cell, s2_cell
    ORDER BY n_images DESC, a5_cell, s2_cell
    LIMIT 100
    """


def q_image_stats(spark, sf_dir):
    """Decoded-pixel statistics + integer-exact 8x8 aHash over the binary
    image column: per-channel milli-means, grayscale milli-variance and the
    perceptual hash, all in pure int64 arithmetic (image_moments) so DuckDB's
    closed-form evaluation of the rgb8 pattern reproduces every value
    bit-for-bit — a full value gate on the decode + stats path."""
    from a5spark.operators.multimodal import image_moments
    from a5spark.sources.images import _gen_image_bytes

    # filter BEFORE synthesizing bytes (python-UDF projection ordering)
    img = images_from_sf_dir(spark, sf_dir, with_bytes=False).filter(
        F.col("k") % 75 == 0
    )
    img = img.withColumn(
        "bytes", _gen_image_bytes(F.col("k"), F.col("w"), F.col("h"))
    )
    m = image_moments(img)
    return m.select(
        "image_id",
        "n_px",
        F.expr("(1000 * sum_r) div n_px").alias("mean_r_milli"),
        F.expr("(1000 * sum_g) div n_px").alias("mean_g_milli"),
        F.expr("(1000 * sum_b) div n_px").alias("mean_b_milli"),
        F.expr(
            "(1000 * (n_px * sumsq_s - sum_s * sum_s)) div (9 * n_px * n_px)"
        ).alias("var_gray_milli"),
        "ahash64",
    ).orderBy("image_id")


def oracle_image_stats():
    # closed-form evaluation of the deterministic rgb8 byte pattern
    # v(i) = (i*a + b) % 256 (sources/images._gen_image_bytes): channel sums,
    # gray moments from the per-pixel 3-channel total, and the integer aHash
    # (bit j iff 64 * block_sum_j > total) reassembled from 32-bit halves
    # with the uint64 -> int64 wrap
    return """
    WITH img AS (
      SELECT printf('img_%012d', o_orderkey) AS image_id,
             CAST(32 + (o_orderkey % 8) * 8 AS BIGINT) AS w,
             CAST(32 + (o_orderkey % 5) * 8 AS BIGINT) AS h,
             o_orderkey % 251 + 1 AS a, o_orderkey % 65521 AS b
      FROM orders WHERE o_orderkey % 75 = 0
    ),
    pix AS (
      SELECT image_id, w, h, p,
             ((3 * p) * a + b) % 256 AS r,
             ((3 * p + 1) * a + b) % 256 AS g,
             ((3 * p + 2) * a + b) % 256 AS bl
      FROM img, unnest(generate_series(0, w * h - 1)) AS t(p)
    ),
    mom AS (
      SELECT image_id, CAST(count(*) AS BIGINT) AS n_px,
             CAST(sum(r) AS BIGINT) AS sum_r,
             CAST(sum(g) AS BIGINT) AS sum_g,
             CAST(sum(bl) AS BIGINT) AS sum_b,
             CAST(sum(r + g + bl) AS BIGINT) AS sum_s,
             CAST(sum((r + g + bl) * (r + g + bl)) AS BIGINT) AS sumsq_s
      FROM pix GROUP BY image_id
    ),
    blocks AS (
      SELECT image_id,
             ((p // w) // (h // 8)) * 8 + ((p % w) // (w // 8)) AS j,
             CAST(sum(r + g + bl) AS BIGINT) AS bs
      FROM pix GROUP BY image_id, j
    ),
    tot AS (SELECT image_id, CAST(sum(bs) AS BIGINT) AS total FROM blocks GROUP BY image_id),
    hash AS (
      SELECT b.image_id,
             CAST(sum(CASE WHEN 64 * b.bs > t.total AND b.j < 32
                           THEN CAST(1 AS BIGINT) << b.j ELSE 0 END) AS BIGINT) AS lo,
             CAST(sum(CASE WHEN 64 * b.bs > t.total AND b.j >= 32
                           THEN CAST(1 AS BIGINT) << (b.j - 32) ELSE 0 END) AS BIGINT) AS hi
      FROM blocks b JOIN tot t USING (image_id) GROUP BY b.image_id
    )
    SELECT m.image_id, m.n_px,
           (1000 * m.sum_r) // m.n_px AS mean_r_milli,
           (1000 * m.sum_g) // m.n_px AS mean_g_milli,
           (1000 * m.sum_b) // m.n_px AS mean_b_milli,
           (1000 * (m.n_px * m.sumsq_s - m.sum_s * m.sum_s)) // (9 * m.n_px * m.n_px) AS var_gray_milli,
           CAST(CASE WHEN h.hi >= 2147483648
                THEN CAST(h.hi AS HUGEINT) * 4294967296 + h.lo - 18446744073709551616
                ELSE CAST(h.hi AS HUGEINT) * 4294967296 + h.lo END AS BIGINT) AS ahash64
    FROM mom m JOIN hash h USING (image_id)
    ORDER BY m.image_id
    """


def q_image_png_stats(spark, sf_dir):
    """Container-codec decode path, value-gated (round 6): the rgb8 payloads
    are TRANSCODED to real PNG streams (multimodal.rgb8_to_png, stdlib
    codec) and the stats pipeline decodes them back through the same
    decode_image kernel (kernels/png.py, fmt='png'). PNG is lossless, so
    DuckDB's closed-form evaluation of the underlying rgb8 pattern gates
    every decoded byte bit-for-bit — the codec round-trip is inside the
    oracle loop, not just unit-tested."""
    from a5spark.operators.multimodal import image_moments, rgb8_to_png
    from a5spark.sources.images import _gen_image_bytes

    img = images_from_sf_dir(spark, sf_dir, with_bytes=False).filter(
        F.col("k") % 150 == 0
    )
    img = img.withColumn(
        "bytes", _gen_image_bytes(F.col("k"), F.col("w"), F.col("h"))
    )
    img = img.withColumn(
        "bytes", rgb8_to_png(F.col("bytes"), F.col("w"), F.col("h"))
    ).withColumn("fmt", F.lit("png"))
    m = image_moments(img)
    return m.select(
        "image_id",
        "n_px",
        F.expr("(1000 * sum_r) div n_px").alias("mean_r_milli"),
        F.expr("(1000 * sum_g) div n_px").alias("mean_g_milli"),
        F.expr("(1000 * sum_b) div n_px").alias("mean_b_milli"),
        F.expr(
            "(1000 * (n_px * sumsq_s - sum_s * sum_s)) div (9 * n_px * n_px)"
        ).alias("var_gray_milli"),
        "ahash64",
    ).orderBy("image_id")


def oracle_image_png_stats():
    # identical closed form to oracle_image_stats (PNG is lossless and the
    # codec is inside the Spark side), over the sparser % 150 sample
    return oracle_image_stats().replace("% 75 = 0", "% 150 = 0")


def q_image_decode_health(spark, sf_dir):
    """Corrupt-row hygiene on the oracle board (round 7): a 1/75 sample of
    the corpus is transcoded to real JPEG streams, and every row where
    k % 150 == 0 is then REPLACED with a deterministically broken stream
    (SOI + junk, no scan). decode_health must flag exactly those rows as
    failed-with-ValueError and decode the rest — per-row failure
    containment, the property that keeps one corrupt object from killing
    a 100 TB ingest task. The oracle predicts the health column from the
    key arithmetic alone."""
    import pandas as pd
    from pyspark.sql.types import BinaryType as _BinaryType

    from a5spark.operators.multimodal import decode_health
    from a5spark.sources.images import _gen_image_bytes

    @F.pandas_udf(_BinaryType())
    def to_jpeg_or_corrupt(
        data: pd.Series, w: pd.Series, h: pd.Series, k: pd.Series
    ) -> pd.Series:
        import numpy as _np

        from a5spark.kernels.jpeg import jpeg_encode

        out = []
        for d, wi, hi, ki in zip(data, w, h, k):
            if int(ki) % 150 == 0:
                out.append(b"\xff\xd8" + b"\x00corrupt\x00" * 3)
            else:
                px = _np.frombuffer(d, dtype=_np.uint8).reshape(
                    int(hi), int(wi), 3
                )
                out.append(jpeg_encode(px, 98))
        return pd.Series(out)

    img = images_from_sf_dir(spark, sf_dir, with_bytes=False).filter(
        F.col("k") % 75 == 0
    )
    img = img.withColumn(
        "bytes", _gen_image_bytes(F.col("k"), F.col("w"), F.col("h"))
    )
    img = img.withColumn(
        "bytes",
        to_jpeg_or_corrupt(F.col("bytes"), F.col("w"), F.col("h"), F.col("k")),
    ).withColumn("fmt", F.lit("jpeg"))
    return decode_health(img).orderBy("image_id")


def oracle_image_decode_health():
    return """
    SELECT printf('img_%012d', o_orderkey) AS image_id,
           (o_orderkey % 150 <> 0) AS ok,
           CASE WHEN o_orderkey % 150 = 0 THEN 'ValueError' END AS err_kind
    FROM orders WHERE o_orderkey % 75 = 0
    ORDER BY image_id
    """


def q_image_jpeg_psnr(spark, sf_dir):
    """Lossy-codec value gate (round 7): rgb8 payloads transcode through
    the dependency-free baseline JPEG codec (kernels/jpeg.py — SOF0,
    per-image optimized Huffman tables, quality 98 4:4:4) and decode back
    through the same decode_image kernel; the oracle asserts the
    input_hint's lossy invariant — decoded-pixel PSNR >= 40 dB — per
    image, plus the closed-form source byte count. JPEG being lossy, the
    gate is the PSNR bound, not bit-identity (PNG covers the lossless
    bit-exact case)."""
    from a5spark.operators.multimodal import transcode_psnr
    from a5spark.sources.images import _gen_image_bytes

    img = images_from_sf_dir(spark, sf_dir, with_bytes=False).filter(
        F.col("k") % 150 == 0
    )
    img = img.withColumn(
        "bytes", _gen_image_bytes(F.col("k"), F.col("w"), F.col("h"))
    )
    t = transcode_psnr(img, fmt="jpeg", threshold=40.0)
    return t.select(
        "image_id",
        "n_src_bytes",
        F.col("psnr_ok").alias("psnr_ge_40"),
    ).orderBy("image_id")


def oracle_image_jpeg_psnr():
    return """
    SELECT printf('img_%012d', o_orderkey) AS image_id,
           CAST((32 + (o_orderkey % 8) * 8)
                * (32 + (o_orderkey % 5) * 8) * 3 AS BIGINT) AS n_src_bytes,
           TRUE AS psnr_ge_40
    FROM orders WHERE o_orderkey % 150 = 0
    ORDER BY image_id
    """


_TILE_SNAPSHOT = "/tmp/a5spark_oracle/tile_assigned_r8"


def q_image_checksums(spark, sf_dir):
    """Decoded-pixel value gate: integer R-channel and total byte sums per
    image, compared bit-for-bit against DuckDB's closed-form evaluation of
    the rgb8 pixel pattern — proves the binary decode path end-to-end."""
    from a5spark.operators.multimodal import image_checksums
    from a5spark.sources.images import _gen_image_bytes

    # filter BEFORE synthesizing bytes — the byte generator is a python UDF
    # projection, so making the order explicit guarantees only the sampled
    # rows pay the generation cost
    img = images_from_sf_dir(spark, sf_dir, with_bytes=False).filter(
        F.col("k") % 75 == 0
    )
    img = img.withColumn(
        "bytes", _gen_image_bytes(F.col("k"), F.col("w"), F.col("h"))
    )
    return image_checksums(img).orderBy("image_id")


def oracle_image_checksums():
    return """
    WITH img AS (
      SELECT printf('img_%012d', o_orderkey) AS image_id,
             CAST(32 + (o_orderkey % 8) * 8 AS BIGINT) AS w,
             CAST(32 + (o_orderkey % 5) * 8 AS BIGINT) AS h,
             o_orderkey % 251 + 1 AS a, o_orderkey % 65521 AS b
      FROM orders WHERE o_orderkey % 75 = 0
    )
    SELECT image_id, CAST(count(*) AS BIGINT) AS n_bytes,
           CAST(sum(CASE WHEN i % 3 = 0 THEN (i * a + b) % 256 ELSE 0 END) AS BIGINT) AS sum_r,
           CAST(sum((i * a + b) % 256) AS BIGINT) AS sum_all
    FROM img, unnest(generate_series(0, w * h * 3 - 1)) AS t(i)
    GROUP BY image_id ORDER BY image_id
    """


def q_image_resize(spark, sf_dir):
    """Decoded-pixel RESIZE value gate: nearest-neighbor downsample to 16x16
    (operators/multimodal.resize_images) then integer checksums of the
    resized bytes — DuckDB reproduces every value from the closed-form pixel
    pattern composed with the same index map (oy*h//16, ox*w//16), proving
    the decode -> resample -> re-encode path end-to-end."""
    from a5spark.operators.multimodal import image_checksums, resize_images
    from a5spark.sources.images import _gen_image_bytes

    img = images_from_sf_dir(spark, sf_dir, with_bytes=False).filter(
        F.col("k") % 90 == 0
    )
    img = img.withColumn(
        "bytes", _gen_image_bytes(F.col("k"), F.col("w"), F.col("h"))
    )
    return image_checksums(resize_images(img, 16, 16)).orderBy("image_id")


def oracle_image_resize():
    return """
    WITH img AS (
      SELECT printf('img_%012d', o_orderkey) AS image_id,
             CAST(32 + (o_orderkey % 8) * 8 AS BIGINT) AS w,
             CAST(32 + (o_orderkey % 5) * 8 AS BIGINT) AS h,
             o_orderkey % 251 + 1 AS a, o_orderkey % 65521 AS b
      FROM orders WHERE o_orderkey % 90 = 0
    ),
    px AS (
      SELECT image_id, c,
             ((((oy * h) // 16) * w + ((ox * w) // 16)) * 3 + c) * a + b AS raw
      FROM img,
           unnest(generate_series(0, 15)) t1(oy),
           unnest(generate_series(0, 15)) t2(ox),
           unnest(generate_series(0, 2)) t3(c)
    )
    SELECT image_id, CAST(count(*) AS BIGINT) AS n_bytes,
           CAST(sum(CASE WHEN c = 0 THEN raw % 256 ELSE 0 END) AS BIGINT) AS sum_r,
           CAST(sum(raw % 256) AS BIGINT) AS sum_all
    FROM px GROUP BY image_id ORDER BY image_id
    """


def q_video_frames(spark, sf_dir):
    """Video frame-sampling value gate: synthetic raw videos (fmt 'rawv8',
    4-8 concatenated rgb8 frames), every 2nd frame sampled by
    operators/multimodal.sample_frames (frame count derived from the
    payload length — real data-plane work), then integer checksums of each
    sampled frame's decoded pixels via the unchanged image_checksums
    operator. DuckDB reproduces every value from the closed-form per-frame
    byte pattern — the video -> frames -> per-frame features pipeline is
    value-gated end-to-end (container codecs remain an env stub)."""
    from a5spark.operators.multimodal import image_checksums, sample_frames
    from a5spark.sources.images import _gen_video_bytes

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    k = F.col("o_orderkey")
    vids = (
        orders.filter(k % 150 == 0)
        .select(
            k.alias("k"),
            F.format_string("vid_%012d", k).alias("video_id"),
            (F.lit(32) + (k % 8) * 8).cast("int").alias("w"),
            (F.lit(32) + (k % 5) * 8).cast("int").alias("h"),
            (F.lit(4) + k % 5).cast("int").alias("n_frames"),
        )
        .withColumn(
            "bytes",
            _gen_video_bytes(F.col("k"), F.col("w"), F.col("h"), F.col("n_frames")),
        )
        .withColumn("fmt", F.lit("rawv8"))
    )
    frames = sample_frames(vids, every_n=2)
    per_frame = frames.select(
        F.format_string("%s#%02d", F.col("video_id"), F.col("frame_idx")).alias(
            "image_id"
        ),
        "bytes",
        "w",
        "h",
        "fmt",
    )
    return image_checksums(per_frame).orderBy("image_id")


def oracle_video_frames():
    return """
    WITH vid AS (
      SELECT o_orderkey AS k, printf('vid_%012d', o_orderkey) AS video_id,
             CAST(32 + (o_orderkey % 8) * 8 AS BIGINT) AS w,
             CAST(32 + (o_orderkey % 5) * 8 AS BIGINT) AS h,
             4 + o_orderkey % 5 AS n_frames
      FROM orders WHERE o_orderkey % 150 = 0
    ), frames AS (
      SELECT video_id, w, h, f.f AS frame_idx,
             (k * 31 + f.f * 7) % 251 + 1 AS a,
             (k + f.f * 131) % 65521 AS b
      FROM vid, unnest(generate_series(0, n_frames - 1)) AS f(f)
      WHERE f.f % 2 = 0
    )
    SELECT printf('%s#%02d', video_id, frame_idx) AS image_id,
           CAST(count(*) AS BIGINT) AS n_bytes,
           CAST(sum(CASE WHEN i % 3 = 0 THEN (i * a + b) % 256 ELSE 0 END) AS BIGINT) AS sum_r,
           CAST(sum((i * a + b) % 256) AS BIGINT) AS sum_all
    FROM frames, unnest(generate_series(0, w * h * 3 - 1)) AS t(i)
    GROUP BY 1 ORDER BY image_id
    """


def q_audio_features(spark, sf_dir):
    """Windowed audio-feature extraction value gate: synthetic PCM16 clips
    (2000-5000 samples), per-1024-sample windows of integer energy,
    zero-crossing count and absolute peak via
    operators/multimodal.audio_features — all int64, reproduced closed-form
    by DuckDB (codec formats remain an env stub inside the same kernel)."""
    from a5spark.operators.multimodal import audio_features
    from a5spark.sources.images import _gen_audio_bytes

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    k = F.col("o_orderkey")
    clips = (
        orders.filter(k % 200 == 0)
        .select(
            k.alias("k"),
            F.format_string("aud_%012d", k).alias("audio_id"),
            (F.lit(2000) + (k % 7) * 500).cast("long").alias("n_samples"),
        )
        .withColumn("bytes", _gen_audio_bytes(F.col("k"), F.col("n_samples")))
        .withColumn("fmt", F.lit("pcm16"))
    )
    return audio_features(clips, window_samples=1024).orderBy(
        "audio_id", "win_idx"
    )


def oracle_audio_features():
    return """
    WITH aud AS (
      SELECT o_orderkey AS k, printf('aud_%012d', o_orderkey) AS audio_id,
             2000 + (o_orderkey % 7) * 500 AS n
      FROM orders WHERE o_orderkey % 200 = 0
    ), samples AS (
      SELECT audio_id, t.t AS t,
             ((k * 97 + t.t * 31 + 7) % 65536) - 32768 AS v
      FROM aud, unnest(generate_series(0, n - 1)) AS t(t)
    ), nxt AS (
      SELECT audio_id, t, v,
             lead(v) OVER (PARTITION BY audio_id ORDER BY t) AS vn
      FROM samples
    )
    SELECT audio_id, CAST(t // 1024 AS BIGINT) AS win_idx,
           CAST(count(*) AS BIGINT) AS n_samples,
           CAST(sum(v * v) AS BIGINT) AS energy,
           CAST(sum(CASE WHEN vn IS NOT NULL AND t % 1024 != 1023
                          AND v * vn < 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS zero_crossings,
           CAST(max(abs(v)) AS BIGINT) AS peak
    FROM nxt
    GROUP BY audio_id, t // 1024
    ORDER BY audio_id, win_idx
    """


def q_tile_pyramid(spark, sf_dir):
    """Raster tile pyramid keyed by pentagon cell at res 4/5. The res-8
    assignment is snapshot to parquet; the oracle independently rolls up the
    per-tile image counts and key set (tile bytes themselves are pinned by the
    bit-identity render test in test_pipeline)."""
    from a5spark.operators.spatial import assign_cells
    from a5spark.operators.tiles import tile_pyramid

    img = _snapshot(
        assign_cells(images_from_sf_dir(spark, sf_dir), 8).select(
            "image_id", "cell", "lon", "lat"
        ),
        _TILE_SNAPSHOT,
        reuse=True,
    )
    tiles = tile_pyramid(img, [4, 5], fine_cell="cell", tile_px=32)
    return tiles.select(
        "cell", "resolution", "n_images", "tile_px", F.length("tile").alias("tile_bytes")
    ).orderBy("resolution", "cell")


def oracle_tile_pyramid():
    # sign-safe parent clearing; every tile is a full px*px uint8 raster
    return f"""
    WITH enc AS (SELECT cell FROM read_parquet('{_TILE_SNAPSHOT}/*.parquet')),
    lv AS (
      SELECT 4 AS resolution, {_sql_parent("cell", 4)} AS cell FROM enc
      UNION ALL
      SELECT 5, {_sql_parent("cell", 5)} FROM enc
    )
    SELECT cell, CAST(resolution AS INT) AS resolution,
           CAST(count(*) AS BIGINT) AS n_images,
           CAST(32 AS INT) AS tile_px,
           CAST(1024 AS INT) AS tile_bytes
    FROM lv GROUP BY resolution, cell ORDER BY resolution, cell
    """


# --- streaming exact-dedup on the oracle board -------------------------------

_STREAM_SRC = "/tmp/a5spark_oracle/streaming_dedup_src"
_STREAM_OUT = "/tmp/a5spark_oracle/streaming_dedup_out"
_STREAM_CKPT = "/tmp/a5spark_oracle/streaming_dedup_ckpt"


def q_streaming_dedup_ttl(spark, sf_dir):
    """END-TO-END Structured Streaming on the oracle board: the TTL-bounded
    exact-dedup canonical mapping (applyInPandasWithState keyed by content
    digest, EventTimeTimeout) runs as a REAL stream — parquet file source →
    withWatermark → stateful operator → parquet sink, driven by
    Trigger.AvailableNow — and the committed sink is compared row-for-row
    against a DuckDB oracle that re-derives the mapping relationally
    (canonical = min doc_id per digest group).

    Determinism: the source snapshot is written as ONE file, so AvailableNow
    processes exactly one micro-batch and first-seen == min(doc_id) — the
    batch-split-independent form of the mapping. Synthetic event times
    (doc_id-keyed) drive the watermark/TTL arming path; with one batch no
    TTL fires, so the mapping equals the unbounded-state answer (TTL expiry
    across batches is pytest-verified in tests/test_round4.py)."""
    import shutil

    from a5spark.streaming.dedup import streaming_dedup_ttl

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        "text",
        F.timestamp_seconds(F.lit(1704067200) + F.col("doc_id") % 3600).alias("ts"),
    )
    for p in (_STREAM_OUT, _STREAM_CKPT):
        shutil.rmtree(p, ignore_errors=True)
    docs.coalesce(1).write.mode("overwrite").parquet(_STREAM_SRC)
    # pin the trailing no-data micro-batch OFF (restored after), as
    # q_streaming_sessions already does: with the single-file snapshot the
    # extra batch exists only to fire event-time timers, and a dedup timer
    # firing can only REMOVE state (emits no rows — see _make_dedup_fn's
    # hasTimedOut branch), so the committed mapping is identical while the
    # run saves a full 32-partition stateful micro-batch (~1.6 s measured
    # at sf0.1). TTL expiry across batches stays pytest-covered
    # (tests/test_round4.py::test_streaming_dedup_ttl_expires_state).
    conf_key = "spark.sql.streaming.noDataMicroBatches.enabled"
    prev = spark.conf.get(conf_key, "true")
    spark.conf.set(conf_key, "false")
    try:
        mapped = streaming_dedup_ttl(
            spark,
            _STREAM_SRC,
            docs.schema,
            text="text",
            id_col="doc_id",
            ts_col="ts",
            ttl="1 hour",
            watermark="10 minutes",
        )
        (
            mapped.writeStream.format("parquet")
            .option("path", _STREAM_OUT)
            .option("checkpointLocation", _STREAM_CKPT)
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )
    finally:
        spark.conf.set(conf_key, prev)
    return (
        spark.read.parquet(_STREAM_OUT)
        .select("doc_id", "digest", "canonical_id", "is_dup")
        .orderBy("doc_id")
    )


def oracle_streaming_dedup_ttl():
    return """
    WITH src AS (
      SELECT doc_id,
             COALESCE(CAST(('0x' || substring(md5(text), 1, 15)) AS BIGINT), -1)
               AS digest,
             CAST(text IS NULL AS INT) AS is_null_text
      FROM documents
    ), m AS (
      SELECT doc_id, digest,
             min(doc_id) OVER (PARTITION BY digest, is_null_text)
               AS canonical_id
      FROM src
    )
    SELECT doc_id, digest, canonical_id,
           CAST(doc_id <> canonical_id AS INT) AS is_dup
    FROM m ORDER BY doc_id
    """


# --- streaming gap-sessionization on the oracle board ------------------------

_SESS_SRC = "/tmp/a5spark_oracle/streaming_sessions_src"
_SESS_OUT = "/tmp/a5spark_oracle/streaming_sessions_out"
_SESS_CKPT = "/tmp/a5spark_oracle/streaming_sessions_ckpt"


def q_streaming_sessions(spark, sf_dir):
    """Second Structured Streaming query on the oracle board: per-user gap
    sessionization (applyInPandasWithState keyed by user_id,
    EventTimeTimeout) runs as a REAL stream — parquet source → withWatermark
    → stateful operator → parquet sink, Trigger.AvailableNow — and the
    committed sink is compared row-for-row against a DuckDB oracle.

    Determinism contract: `spark.sql.streaming.noDataMicroBatches.enabled`
    is pinned OFF for the run (restored after), so exactly ONE micro-batch
    processes the single-file snapshot and no event-time timer fires. In a
    single sorted batch the stateful operator closes exactly the sessions
    the batch window-function split closes, leaving each user's FINAL
    session open in state — so the emitted set is relationally expressible:
    every (user, session) except the per-user last. Timer/timeout expiry
    across batches is pytest-verified separately
    (tests/test_pipeline.py::test_streaming_sessions_match_batch and the
    round-4 restart tests)."""
    import shutil

    from a5spark.streaming.sessions import streaming_sessions

    ev = _t(spark, sf_dir, "events").select(
        "user_id", F.col("ts").cast("timestamp").alias("ts"), "value"
    )
    for p in (_SESS_OUT, _SESS_CKPT):
        shutil.rmtree(p, ignore_errors=True)
    ev.coalesce(1).write.mode("overwrite").parquet(_SESS_SRC)
    conf_key = "spark.sql.streaming.noDataMicroBatches.enabled"
    prev = spark.conf.get(conf_key, "true")
    spark.conf.set(conf_key, "false")
    try:
        sessions = streaming_sessions(
            spark, _SESS_SRC, ev.schema, gap="30 minutes", watermark="2 hours"
        )
        (
            sessions.writeStream.format("parquet")
            .option("path", _SESS_OUT)
            .option("checkpointLocation", _SESS_CKPT)
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )
    finally:
        spark.conf.set(conf_key, prev)
    return (
        spark.read.parquet(_SESS_OUT)
        .select(
            "user_id",
            F.unix_micros("session_start").alias("start_us"),
            F.unix_micros("session_end").alias("end_us"),
            "n_events",
            F.round("total_value", 6).alias("total_value"),
        )
        .orderBy("user_id", "start_us")
    )


def oracle_streaming_sessions():
    return """
    WITH gaps AS (
      SELECT user_id, value, epoch_us(ts) AS ts_us,
             CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w IS NULL
                       OR epoch_us(ts) - lag(epoch_us(ts)) OVER w
                          > 1800 * 1000000
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), sess AS (
      SELECT user_id, value, ts_us,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts_us)
               AS session_idx
      FROM gaps
    ), per_session AS (
      SELECT user_id, session_idx,
             CAST(min(ts_us) AS BIGINT) AS start_us,
             CAST(max(ts_us) AS BIGINT) AS end_us,
             CAST(count(*) AS BIGINT) AS n_events,
             round(sum(value), 6) AS total_value
      FROM sess GROUP BY user_id, session_idx
    ), marked AS (
      SELECT *, max(session_idx) OVER (PARTITION BY user_id) AS max_idx
      FROM per_session
    )
    SELECT user_id, start_us, end_us, n_events, total_value
    FROM marked WHERE session_idx < max_idx
    ORDER BY user_id, start_us
    """


# --- cell-clustered data layout: write + pruned cover scan -------------------

_LAYOUT_PATH = "/tmp/a5spark_oracle/cell_layout_r9"
# res-4 cover cells (q << 58 | t << 52 | marker at 51) chosen so each has
# matching res-9 rows at every test scale (the synthetic S distribution is
# orderkey-structured, so (q, t) density is data-dependent)
_LAYOUT_COVER = [
    (q << 58) | (t << 52) | (1 << 51) for q, t in ((0, 0), (1, 7), (2, 7))
]


def _materialize_layout(spark, sf_dir):
    """The single definition of the oracle board's cell layout (res-9
    lineitem assignment, 32 files at _LAYOUT_PATH) — q_cell_layout_scan
    always (re)writes it; q_iceberg_export reuses or rebuilds THROUGH THIS
    so a definition change can never diverge the two queries."""
    from a5spark.operators import layout

    li = _t(spark, sf_dir, "lineitem")
    df = _spark_cell9(li).select("cell", "l_quantity")
    layout.write_cell_layout(df, _LAYOUT_PATH, cell="cell", n_files=32)


def q_cell_layout_scan(spark, sf_dir):
    """Cell-clustered layout round-trip: write the res-9 assignment table
    range-partitioned + sorted by the unsigned-order shifted cell key
    (operators/layout.py), then scan it back through a coarse res-4 cover.
    The scan prunes at FILE level via the layout manifest (driver interval
    walk over per-file [min,max] key stats — the metadata prune an
    Iceberg/Delta table gets from its manifest layer) and at ROW-GROUP level
    via the pushed-down `key BETWEEN lo AND hi` disjunction over sorted
    data. This is the distributed analogue of the reference's hierarchical
    trichotomy prune (/root/reference/a5/traversal/cap.py:100-127) built on
    the is_child_of prefix-range semantics
    (/root/reference/a5/core/serialization.py:306-321). The DuckDB oracle
    reads ALL layout files and applies the same ranges — proving the pruned
    scan loses no rows. Pruning evidence (files/rows read vs total) is
    asserted in tests/test_round5.py and recorded in BASELINE.md."""
    from a5spark.operators import layout

    _materialize_layout(spark, sf_dir)
    scanned, _stats = layout.scan_cell_layout(spark, _LAYOUT_PATH, _LAYOUT_COVER)
    return (
        scanned.groupBy(native.cell_to_parent(F.col("cell"), 4).alias("parent_cell"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
        )
        .orderBy("parent_cell")
    )


def oracle_cell_layout_scan():
    from a5spark.operators import layout

    ranges = layout.cover_key_ranges(_LAYOUT_COVER)
    pred = " OR ".join(f"(cell_key BETWEEN {lo} AND {hi})" for lo, hi in ranges)
    return f"""
    SELECT {_sql_parent("cell", 4)} AS parent_cell,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
    FROM read_parquet('{_LAYOUT_PATH}/*.parquet')
    WHERE {pred}
    GROUP BY 1 ORDER BY 1
    """


# --- Iceberg metadata export on the oracle board ----------------------------


def q_iceberg_export(spark, sf_dir):
    """Iceberg-export fidelity gated against the DATA, not our own
    bookkeeping: export the cell layout's manifest as Iceberg v2-model
    metadata (operators/iceberg_export.py), reconstruct a manifest from
    the EXPORTED FILES ALONE, and emit its per-file (record_count, lower/
    upper bound) stats. The DuckDB oracle recomputes the same stats
    straight from the layout's parquet files (read_parquet filename=true),
    so a wrong bound, lost file, or row-count drift in the export chain
    hash-mismatches — the export is verified end-to-end against the bytes
    on disk, the property a catalog migration actually needs. Depends on
    q_cell_layout_scan having materialized the layout (the registry runs
    in order; standalone use re-materializes)."""
    from a5spark.operators import layout
    from a5spark.operators.iceberg_export import (
        iceberg_metadata_to_layout_manifest,
        layout_to_iceberg_metadata,
    )

    try:
        layout.read_manifest(spark, _LAYOUT_PATH)
    except Exception:
        _materialize_layout(spark, sf_dir)
    layout_to_iceberg_metadata(spark, _LAYOUT_PATH)
    rebuilt = iceberg_metadata_to_layout_manifest(f"{_LAYOUT_PATH}/_iceberg")
    rows = [
        (e["file"], int(e["rows"]), int(e["lo"]), int(e["hi"]))
        for e in rebuilt["files"]
    ]
    return spark.createDataFrame(
        rows, "file_name: string, n_rows: long, key_lo: long, key_hi: long"
    ).orderBy("file_name")


def oracle_iceberg_export():
    return f"""
    SELECT regexp_extract(filename, '([^/]+)$', 1) AS file_name,
           CAST(count(*) AS BIGINT) AS n_rows,
           min(cell_key) AS key_lo,
           max(cell_key) AS key_hi
    FROM read_parquet('{_LAYOUT_PATH}/*.parquet', filename=true)
    GROUP BY 1 ORDER BY 1
    """


# --- cell-bucketed co-located join ------------------------------------------

_BUCKETED_A = "/tmp/a5spark_oracle/bucketed_feed_a"
_BUCKETED_B = "/tmp/a5spark_oracle/bucketed_feed_b"


def q_bucketed_join(spark, sf_dir):
    """Shuffle-free big×big join via cell-bucketed tables
    (operators/bucketing.py): two image feeds (disjoint halves of the
    corpus, A5-encoded at res 3) are written bucketed + bucket-sorted by
    cell with the same bucket count, then joined per cell and aggregated —
    scan → scan → SortMergeJoin → agg with ZERO Exchange operators
    (asserted in tests/test_round5.py). autoBroadcastJoinThreshold is
    pinned off for the run so the plan is the one a 100 TB deployment gets
    (neither feed broadcastable); the bucketed layout is what removes the
    2× full-table shuffle. The DuckDB oracle reads the same bucketed
    parquet files and reproduces the join relationally."""
    from a5spark.operators.bucketing import (
        bucketed_join,
        pick_join_resolution,
        write_bucketed_table,
    )
    from a5spark.operators.spatial import assign_cells

    # density-adaptive join-key resolution (round 6): a fixed res makes the
    # per-cell pair fan-out quadratic in corpus size (BASELINE.md sf10);
    # res 3 at the oracle scale (sf0.01), growing with the table. The
    # oracle re-derives from the bucketed snapshot files, so the key
    # choice can never diverge Spark from DuckDB. The count comes from
    # parquet footer metadata (manifest-style, no scan job); the count()
    # fallback only fires for non-local sf dirs.
    from a5spark.sources.images import images_count_hint

    from concurrent.futures import ThreadPoolExecutor

    from a5spark import cache

    base = images_from_sf_dir(spark, sf_dir)
    n_hint = images_count_hint(sf_dir)
    res = pick_join_resolution(n_hint if n_hint is not None else base.count())
    # encode ONCE: both feed writes project from the same persisted
    # assignment (unpersisted, each bucketed write re-ran the full Arrow
    # encode pass — two scans+encodes for one), materialized eagerly so the
    # concurrent writes below read only from cache
    img = cache.persist(
        assign_cells(base, res).select("cell", "image_id", "w", "k")
    )
    img.count()
    feed_a = img.filter(F.col("k") % 2 == 0).select(
        "cell", F.col("image_id").alias("a_id"), F.col("w").alias("a_w")
    )
    feed_b = img.filter(F.col("k") % 2 == 1).select(
        "cell", F.col("image_id").alias("b_id"), F.col("w").alias("b_w")
    )
    # the two independent bucketed writes overlap (guide §2.6): the second
    # job's tasks back-fill executor slots freed by the first job's tail
    with ThreadPoolExecutor(max_workers=2) as pool:
        fa = pool.submit(
            write_bucketed_table, feed_a, "a5_bucketed_a",
            n_buckets=16, path=_BUCKETED_A,
        )
        fb = pool.submit(
            write_bucketed_table, feed_b, "a5_bucketed_b",
            n_buckets=16, path=_BUCKETED_B,
        )
        fa.result()
        fb.result()
    conf_key = "spark.sql.autoBroadcastJoinThreshold"
    prev = spark.conf.get(conf_key)
    spark.conf.set(conf_key, "-1")
    try:
        out = (
            bucketed_join(spark, "a5_bucketed_a", "a5_bucketed_b")
            .groupBy("cell")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_pairs"),
                F.sum(F.col("a_w").cast("long") * F.col("b_w")).alias("sum_ww"),
                F.min("a_id").alias("min_a"),
                F.max("b_id").alias("max_b"),
            )
            .orderBy("cell")
        )
        # materialize under the pinned conf so the exchange-free SMJ is the
        # plan that actually executes (the driver collects lazily, after
        # the conf is restored)
        out = out.localCheckpoint(eager=True)
    finally:
        spark.conf.set(conf_key, prev)
    return out


def oracle_bucketed_join():
    return f"""
    SELECT a.cell,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(sum(CAST(a.a_w AS BIGINT) * b.b_w) AS BIGINT) AS sum_ww,
           min(a.a_id) AS min_a,
           max(b.b_id) AS max_b
    FROM read_parquet('{_BUCKETED_A}/*.parquet') a
    JOIN read_parquet('{_BUCKETED_B}/*.parquet') b USING (cell)
    GROUP BY a.cell ORDER BY a.cell
    """


_BOUNDARY_SNAPSHOT = "/tmp/a5spark_oracle/boundary_wkt_r5"


def q_boundary_wkt(spark, sf_dir):
    """GIS export surface: WKT serialization of cell boundaries
    (functions/gis.py) over the distinct res-5 cells of the image corpus.
    The boundary vertices themselves are fixture-pinned elsewhere
    (cell_to_boundary vs the reference, <=1.3e-13 —
    /root/reference/a5/core/cell.py); what THIS oracle value-checks
    end-to-end is the Catalyst fixed-point WKT serializer: ring order,
    truncation arithmetic, and string assembly, reproduced independently by
    DuckDB string_agg over the exploded snapshot vertices. The float
    WKT/GeoJSON builders for GIS consumers share the same assembly path and
    are pytest-parity-tested (tests/test_round5.py)."""
    from a5spark.functions.gis import ring_to_wkt_fixed
    from a5spark.functions.udfs import a5_cell_to_boundary
    from a5spark.operators.spatial import assign_cells

    img = assign_cells(images_from_sf_dir(spark, sf_dir), 5)
    exploded = (
        img.select("cell")
        .distinct()
        .select("cell", F.posexplode(a5_cell_to_boundary(F.col("cell"))).alias("idx", "pt"))
        .select("cell", "idx", F.col("pt")[0].alias("lon"), F.col("pt")[1].alias("lat"))
    )
    snap = _snapshot(exploded, _BOUNDARY_SNAPSHOT)
    rebuilt = (
        snap.groupBy("cell")
        .agg(F.array_sort(F.collect_list(F.struct("idx", "lon", "lat"))).alias("pts"))
        .select(
            "cell",
            F.transform("pts", lambda s: F.array(s["lon"], s["lat"])).alias("ring"),
        )
    )
    return rebuilt.select(
        "cell",
        F.size("ring").cast("long").alias("n_pts"),
        ring_to_wkt_fixed(F.col("ring")).alias("wkt_fp"),
    ).orderBy("cell")


def oracle_boundary_wkt():
    return f"""
    SELECT cell,
           CAST(count(*) AS BIGINT) AS n_pts,
           CASE WHEN count(*) < 4 THEN 'POLYGON EMPTY'
                ELSE 'POLYGON ((' || string_agg(
                         CAST(CAST(trunc(lon*1e7) AS BIGINT) AS VARCHAR)
                         || ' ' ||
                         CAST(CAST(trunc(lat*1e7) AS BIGINT) AS VARCHAR),
                         ', ' ORDER BY idx) || '))'
           END AS wkt_fp
    FROM read_parquet('{_BOUNDARY_SNAPSHOT}/*.parquet')
    GROUP BY cell ORDER BY cell
    """


_COVER_EXPORT_SNAPSHOT = "/tmp/a5spark_oracle/cover_export_r6"


def q_cover_export_wkt(spark, sf_dir):
    """Cover -> MULTIPOLYGON export (round 6; the inverse direction of the
    multi-part parsers): each polygon's compacted cover serializes to one
    fixed-point MULTIPOLYGON — one part per cover cell, parts in cell
    order. Boundary vertices are fixture-pinned elsewhere; what this
    oracle value-checks is the part assembly: per-cell ring rebuild,
    cell-order aggregation, truncation arithmetic, and the nested string
    build, reproduced independently by DuckDB's two-level ordered
    string_agg over the exploded snapshot vertices. Output hashes the WKT
    (md5 + length) so compared rows stay small."""
    from a5spark.functions.gis import rings_to_multipolygon_wkt_fixed
    from a5spark.functions.udfs import a5_cell_to_boundary
    from a5spark.operators.polygons import polyfill_cover
    import json as _json

    polys = [
        ("uk_box", [[[-8.0, 50.0], [2.0, 50.0], [2.0, 59.0], [-8.0, 59.0]]]),
        ("alps_tri", [[[6.0, 44.0], [14.0, 45.0], [10.0, 48.0]]]),
        ("horn", [[[40.0, 2.0], [52.0, 2.0], [52.0, 12.0], [44.0, 12.0]]]),
    ]
    pdf = spark.createDataFrame(
        [(pid, _json.dumps(rings)) for pid, rings in polys],
        ["polygon_id", "rings_json"],
    )
    cover = polyfill_cover(pdf, resolution=5)
    exploded = (
        cover.select(
            "polygon_id",
            "cell",
            F.posexplode(a5_cell_to_boundary(F.col("cell"))).alias("idx", "pt"),
        )
        .select(
            "polygon_id", "cell", "idx",
            F.col("pt")[0].alias("lon"), F.col("pt")[1].alias("lat"),
        )
    )
    snap = _snapshot(exploded, _COVER_EXPORT_SNAPSHOT)
    rings = (
        snap.groupBy("polygon_id", "cell")
        .agg(F.array_sort(F.collect_list(F.struct("idx", "lon", "lat"))).alias("pts"))
        .select(
            "polygon_id",
            F.struct(
                F.col("cell"),
                F.transform("pts", lambda s: F.array(s["lon"], s["lat"])).alias(
                    "ring"
                ),
            ).alias("part"),
        )
    )
    mp = (
        rings.groupBy("polygon_id")
        .agg(F.array_sort(F.collect_list("part")).alias("parts"))
        .select(
            "polygon_id",
            # counted AFTER the >=4-point ring filter the WKT builder
            # applies — the DuckDB oracle filters n_pts >= 4 out of both
            # the count and the string_agg, so the two sides must drop
            # degenerate rings symmetrically
            F.size(F.filter("parts", lambda s: F.size(s["ring"]) >= 4))
            .cast("long")
            .alias("n_parts"),
            rings_to_multipolygon_wkt_fixed(
                F.transform("parts", lambda s: s["ring"])
            ).alias("wkt"),
        )
    )
    return mp.select(
        "polygon_id",
        "n_parts",
        F.length("wkt").cast("long").alias("wkt_len"),
        F.md5(F.col("wkt").cast("binary")).alias("wkt_md5"),
    ).orderBy("polygon_id")


def oracle_cover_export_wkt():
    return f"""
    WITH ring AS (
      SELECT polygon_id, cell,
             '((' || string_agg(
                 CAST(CAST(trunc(lon*1e7) AS BIGINT) AS VARCHAR)
                 || ' ' ||
                 CAST(CAST(trunc(lat*1e7) AS BIGINT) AS VARCHAR),
                 ', ' ORDER BY idx) || '))' AS part,
             count(*) AS n_pts
      FROM read_parquet('{_COVER_EXPORT_SNAPSHOT}/*.parquet')
      GROUP BY polygon_id, cell
    ), mp AS (
      SELECT polygon_id, CAST(count(*) AS BIGINT) AS n_parts,
             'MULTIPOLYGON (' || string_agg(part, ', ' ORDER BY cell) || ')' AS wkt
      FROM ring WHERE n_pts >= 4 GROUP BY polygon_id
    )
    SELECT polygon_id, n_parts,
           CAST(length(wkt) AS BIGINT) AS wkt_len,
           md5(wkt) AS wkt_md5
    FROM mp ORDER BY polygon_id
    """


QUERIES = {
    "hier_parent_rollup": q_hier_parent_rollup,
    "hier_resolution": q_hier_resolution,
    "hier_children": q_hier_children,
    "hier_child_join": q_hier_child_join,
    "hex_roundtrip": q_hex_roundtrip,
    "compact_cover": q_compact_cover,
    "cover_set_ops": q_cover_set_ops,
    "images_derivation": q_images_derivation,
    "cell_density_r7": q_cell_density_r7,
    "multires_rollup": q_multires_rollup,
    "dedup_exact": q_dedup_exact,
    "jaccard_verify": q_jaccard_verify,
    "event_sessions": q_event_sessions,
    "minhash_lsh": q_minhash_lsh,
    "simhash": q_simhash,
    "simhash_neardup": q_simhash_neardup,
    "crossmodal_neardup": q_crossmodal_neardup,
    "embed_neardup": q_embed_neardup,
    "text_profile": q_text_profile,
    "doc_quality": q_doc_quality,
    "lang_id": q_lang_id,
    "ann_quantized": q_ann_quantized,
    "ann_cosine": q_ann_cosine,
    "ann_lsh": q_ann_lsh,
    "ann_ivf": q_ann_ivf,
    "radius_join": q_radius_join,
    "knn_images": q_knn_images,
    "polyfill_cover": q_polyfill_cover,
    "polyfill_multipolygon": q_polyfill_multipolygon,
    "pip_join": q_pip_join,
    "line_trace": q_line_trace,
    "grid_disk": q_grid_disk,
    "skewed_density": q_skewed_density,
    "stratified_sample": q_stratified_sample,
    "focal_smoothing": q_focal_smoothing,
    "hot_region_vectorize": q_hot_region_vectorize,
    "s2_crossindex": q_s2_crossindex,
    "image_stats": q_image_stats,
    "image_png_stats": q_image_png_stats,
    "image_jpeg_psnr": q_image_jpeg_psnr,
    "image_decode_health": q_image_decode_health,
    "image_resize": q_image_resize,
    "image_checksums": q_image_checksums,
    "video_frames": q_video_frames,
    "audio_features": q_audio_features,
    "tile_pyramid": q_tile_pyramid,
    "cell_layout_scan": q_cell_layout_scan,
    "iceberg_export": q_iceberg_export,
    "streaming_dedup_ttl": q_streaming_dedup_ttl,
    "streaming_sessions": q_streaming_sessions,
    "bucketed_join": q_bucketed_join,
    "boundary_wkt": q_boundary_wkt,
    "cover_export_wkt": q_cover_export_wkt,
}

# queries whose plan includes an oracle-snapshot parquet write+read (skipped
# under SPARK_GRAFT_SKIP_SNAPSHOT for engine-only benchmarking — see
# _snapshot/_oracle_export)
SNAPSHOT_QUERIES = (
    "cell_density_r7",
    "stratified_sample",
    "multires_rollup",
    "pip_join",
    "grid_disk",
    "skewed_density",
    "focal_smoothing",
    "hot_region_vectorize",
    "line_trace",
    "s2_crossindex",
    "tile_pyramid",
    "boundary_wkt",
    "cover_export_wkt",
)

ORACLES = {
    "cell_density_r7": oracle_cell_density_r7(),
    "ann_cosine": oracle_ann_cosine(),
    "hier_parent_rollup": oracle_hier_parent_rollup(),
    "hier_resolution": oracle_hier_resolution(),
    "hier_children": oracle_hier_children(),
    "hier_child_join": oracle_hier_child_join(),
    "hex_roundtrip": oracle_hex_roundtrip(),
    "compact_cover": oracle_compact_cover(),
    "cover_set_ops": oracle_cover_set_ops(),
    "images_derivation": oracle_images_derivation(),
    "dedup_exact": oracle_dedup_exact(),
    "jaccard_verify": oracle_jaccard_verify(),
    "event_sessions": oracle_event_sessions(),
    "minhash_lsh": oracle_minhash_lsh(),
    "simhash": oracle_simhash(),
    "simhash_neardup": oracle_simhash_neardup(),
    "crossmodal_neardup": oracle_crossmodal_neardup(),
    "embed_neardup": oracle_embed_neardup(),
    "text_profile": oracle_text_profile(),
    "doc_quality": oracle_doc_quality(),
    "lang_id": oracle_lang_id(),
    "ann_quantized": oracle_ann_quantized(),
    "ann_lsh": oracle_ann_lsh(),
    "ann_ivf": oracle_ann_ivf(),
    "multires_rollup": oracle_multires_rollup(),
    "polyfill_cover": oracle_polyfill_cover(),
    "polyfill_multipolygon": oracle_polyfill_multipolygon(),
    "s2_crossindex": oracle_s2_crossindex(),
    "tile_pyramid": oracle_tile_pyramid(),
    "image_checksums": oracle_image_checksums(),
    "video_frames": oracle_video_frames(),
    "audio_features": oracle_audio_features(),
    "image_stats": oracle_image_stats(),
    "image_png_stats": oracle_image_png_stats(),
    "image_jpeg_psnr": oracle_image_jpeg_psnr(),
    "image_decode_health": oracle_image_decode_health(),
    "image_resize": oracle_image_resize(),
    "focal_smoothing": oracle_focal_smoothing(),
    "line_trace": oracle_line_trace(),
    "pip_join": oracle_pip_join(),
    "grid_disk": oracle_grid_disk(),
    "skewed_density": oracle_skewed_density(),
    "stratified_sample": oracle_stratified_sample(),
    "hot_region_vectorize": oracle_hot_region_vectorize(),
    "radius_join": oracle_radius_join(),
    "knn_images": oracle_knn_images(),
    "cell_layout_scan": oracle_cell_layout_scan(),
    "iceberg_export": oracle_iceberg_export(),
    "streaming_dedup_ttl": oracle_streaming_dedup_ttl(),
    "streaming_sessions": oracle_streaming_sessions(),
    "bucketed_join": oracle_bucketed_join(),
    "boundary_wkt": oracle_boundary_wkt(),
    "cover_export_wkt": oracle_cover_export_wkt(),
}
