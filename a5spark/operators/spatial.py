"""Spatial operators: cell assignment, hierarchical aggregation, cover joins.

All operators are declarative DataFrame transformations — Catalyst plans the
physical execution (broadcast vs shuffle join, partial aggregation, AQE skew
splitting). The only Python-side work is the Arrow-batched encode UDF.

Scale notes (100 TB design):
 * assignment is a map-only stage (no shuffle);
 * density rollups are two-phase hash aggregations keyed by the int64 cell —
   map-side partial combine keeps shuffle volume at ~#distinct-cells;
 * cover joins broadcast the (small) cover side; multi-resolution covers use
   unsigned-range predicates on the shifted key, which Catalyst turns into a
   broadcast range join; for huge covers fall back to explode-to-resolution
   equi-join (shuffle-partitioned on cell);
 * hot-cell skew: salt_column() + two-phase aggregation, plus AQE skew join.
"""

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from a5spark.functions import native
from a5spark.functions.udfs import a5_lonlat_to_cell


def assign_cells(
    df: DataFrame, resolution: int, lon: str = "lon", lat: str = "lat",
    out: str = "cell",
) -> DataFrame:
    """Attach the A5 cell id at `resolution` for each row's lon/lat."""
    return df.withColumn(
        out, a5_lonlat_to_cell(F.col(lon), F.col(lat), F.lit(resolution))
    )


def assign_cells_multi(
    df: DataFrame, resolutions, lon: str = "lon", lat: str = "lat"
) -> DataFrame:
    """One encode pass per resolution -> columns cell_r{res}. The finest
    resolution is encoded with the UDF; coarser levels derive JVM-side via
    native cell_to_parent (bit ops), so the Python cost is paid once."""
    resolutions = sorted(resolutions)
    finest = resolutions[-1]
    df = assign_cells(df, finest, lon, lat, out=f"cell_r{finest}")
    for r in resolutions[:-1]:
        if r >= 2:
            df = df.withColumn(
                f"cell_r{r}", native.cell_to_parent(F.col(f"cell_r{finest}"), r)
            )
        else:
            from a5spark.functions.udfs import a5_cell_to_parent

            df = df.withColumn(
                f"cell_r{r}", a5_cell_to_parent(F.col(f"cell_r{finest}"), F.lit(r))
            )
    return df


def cell_density(df: DataFrame, cell: str = "cell", extra_aggs=None) -> DataFrame:
    """Per-cell stats: count + optional extra aggregates (two-phase hash agg)."""
    aggs = [F.count(F.lit(1)).alias("n")]
    if extra_aggs:
        aggs.extend(extra_aggs)
    return df.groupBy(cell).agg(*aggs)


def rollup_density(
    df: DataFrame, from_resolution: int, to_resolution: int, cell: str = "cell"
) -> DataFrame:
    """Re-aggregate a fine-resolution density to a coarser level using the
    native parent expression — input is already one row per fine cell, so the
    shuffle is tiny (#fine-cells rows)."""
    parent = native.cell_to_parent(F.col(cell), to_resolution).alias("cell")
    return df.groupBy(parent).agg(F.sum("n").alias("n"))


def top_k_cells(density: DataFrame, k: int, order_col: str = "n") -> DataFrame:
    """Hottest k cells (TakeOrderedAndProject — no full sort)."""
    return density.orderBy(F.desc(order_col)).limit(k)


def cover_join(
    points: DataFrame, cover: DataFrame, cell: str = "cell", broadcast: bool = True
) -> DataFrame:
    """Equi-join points against a single-resolution cell cover.
    Covers (polygon fills, caps, disks) are small relative to the point table
    -> broadcast hash join by default."""
    c = F.broadcast(cover) if broadcast else cover
    return points.join(c, cell, "inner")


def multires_cover_join(
    points: DataFrame,
    cover: DataFrame,
    cover_cell: str = "cell",
    cover_res: str = "resolution",
    point_cell: str = "cell",
    broadcast: bool = True,
) -> DataFrame:
    """Join fine-resolution points against a compacted (mixed-resolution)
    cover via unsigned descendant-range predicates on the shifted key.
    The cover carries (cell, resolution); a point matches a cover cell when
    its id lies in the cover cell's descendant range."""
    key = native.shifted_key(points[point_cell]).alias("__pk")
    pts = points.withColumn("__pk", key)
    cov = cover.withColumn(
        "__lo", native.cell_range_lo(F.col(cover_cell), F.col(cover_res))
    ).withColumn(
        "__hi", native.cell_range_hi(F.col(cover_cell), F.col(cover_res))
    ).drop(cover_cell)
    c = F.broadcast(cov) if broadcast else cov
    joined = pts.join(c, (F.col("__pk") >= F.col("__lo")) & (F.col("__pk") <= F.col("__hi")))
    return joined.drop("__pk", "__lo", "__hi")


def child_of_join(
    points: DataFrame,
    parents: DataFrame,
    parent_resolution: int,
    point_cell: str = "cell",
    parent_cell: str = "parent",
    broadcast: bool = True,
) -> DataFrame:
    """Descendant join in scalable equi-form: rather than the theta-join
    `is_child_of(cell, parent)` (which Spark executes as a nested-loop),
    join on native cell_to_parent(cell, r) == parent — a hash join with
    identical semantics for cells at resolution >= r."""
    pts = points.withColumn(
        "__pp", native.cell_to_parent(F.col(point_cell), parent_resolution)
    )
    par = parents.withColumnRenamed(parent_cell, "__pp")
    par = F.broadcast(par) if broadcast else par
    return pts.join(par, "__pp").withColumnRenamed("__pp", parent_cell)


def compact_cover(
    df: DataFrame,
    cell: str = "cell",
    group_cols=(),
    resolution_bounds: tuple | None = None,
) -> DataFrame:
    """Distributed compact of a cell cover (reference a5/core/compact.py:69-142
    semantics): dedup, then collapse complete sibling groups finest->coarsest —
    4 Hilbert siblings (child res >= 2) or 5 quintants (child res 1) with the
    same parent. Works per `group_cols` partition (e.g. polygon_id).

    Scale notes: the descent is ANCHORED, not per-level — cells group by
    their res-`a` ancestor (a = max(2, r_hi - 8), so a group holds at most
    4^8 cells) and each group kernel-compacts to fixpoint in one vectorized
    pass (collect_list + one Arrow batch UDF: one shuffle per ~8 resolution
    levels instead of one window exchange per level). Surviving cells at the
    anchor resolution re-anchor coarser until res 2, then one final global
    pass (per group_cols) handles the 2 -> 1 -> 0 collapses. Collapse chains
    never cross an anchor boundary, so the staged result equals the kernel's
    global fixpoint.

    Precondition (same as the reference): no cell in the input is an ancestor
    of another input cell. Res-0 cells are emitted as-is (the reference's
    12-res-0-cells -> world-cell collapse is intentionally not performed —
    a cover equal to the whole globe is better expressed upstream)."""
    from a5spark import cache
    from a5spark.functions.udfs import a5_compact_list

    g = list(group_cols)
    sel = df.select(*g, F.col(cell).alias("__c"))
    res_col = native.cell_resolution(F.col("__c"))
    if resolution_bounds is not None:
        # caller-known range (e.g. a freshly uncompacted single-resolution
        # cover) — skips the max-res probe job
        r_hi = int(resolution_bounds[1])
        cur = sel
    else:
        # persist: the probe AND the descent below both read the input
        cur = cache.persist(sel)
        hi = cur.agg(F.max(res_col).alias("hi")).first().hi
        if hi is None:
            return df.select(*g, F.col(cell)).limit(0)
        r_hi = int(hi)

    if r_hi <= 8:
        # SINGLE-PASS route (optimization round 8): with the finest input
        # resolution <= 8, anchoring every cell at its res-0 ORIGIN keeps
        # each collect_list group bounded by one origin's full res-8 cover
        # (5 * 4^7 = 81,920 cells) — inside the same budget as the staged
        # descent's 4^8 bound — and collapse chains never cross an origin
        # (the deliberate no-world-cell rule), so ONE kernel fixpoint pass
        # equals the staged loop + final low-pass: 1 shuffle + 1 Arrow UDF
        # stage instead of 3-4 shuffles, two UDF stages and two persisted
        # intermediates. Anchor expr: top 6 bits are the quintant index
        # (origin*5 + segment) for res >= 1 and the origin id for res 0;
        # dividing by 5 maps res >= 1 cells to their origin and merely
        # merges a few res-0 cells into a neighboring group, which is
        # harmless — the kernel compact is grouping-agnostic as long as no
        # sibling set is split, and res-0 cells never collapse further.
        anchor = native._shl(
            F.floor(native._shru(F.col("__c"), F.lit(58)) / F.lit(5)).cast(
                "long"
            ),
            F.lit(58),
        ) + native._shl(F.lit(1), F.lit(57))
        return (
            cur.groupBy(*g, anchor.alias("__anc"))
            .agg(F.collect_list("__c").alias("__cells"))
            .select(*g, F.explode(a5_compact_list(F.col("__cells"))).alias(cell))
        )

    # STAGED descent for deep covers: persist the input cover and each
    # stage's survivor set — every stage (and the final low/high split)
    # references its `cur` TWICE (fine/passed), and Spark re-evaluates the
    # full lineage per union branch. The persisted frames are cover-sized
    # (small by definition) and are released by the caller's cache scope.
    if resolution_bounds is not None:
        cur = cache.persist(cur)
    anchor_span = 8  # bounds collect_list groups at 4^8 cells
    while r_hi > 2:
        a = max(2, r_hi - anchor_span)
        fine = cur.filter(res_col > a)
        passed = cur.filter(res_col <= a)
        if r_hi >= 29:
            # res-29/30 inputs: native cell_to_parent can't read the res-30
            # variable-marker layout (and native resolution reads mk-1
            # res-30 cells as 29 — which still clears the `> a` filter, so
            # only the ANCHOR expression needs the full-regime kernel UDF;
            # the kernel compact inside each group handles 29/30 exactly)
            from a5spark.functions.udfs import a5_cell_to_parent

            anchor = a5_cell_to_parent(F.col("__c"), F.lit(a))
        else:
            anchor = native.cell_to_parent(F.col("__c"), a)
        compacted = (
            fine.withColumn("__anc", anchor)
            .groupBy(*g, "__anc")
            .agg(F.collect_list("__c").alias("__cells"))
            .select(*g, F.explode(a5_compact_list(F.col("__cells"))).alias("__c"))
        )
        cur = cache.persist(compacted.unionByName(passed))
        r_hi = a
    # final pass: 2 -> 1 -> 0 collapses across anchors (tiny by construction:
    # at most 240 res-2 cells exist globally per group); dedup happens inside
    # the kernel (np.unique), so no separate distinct shuffle is needed
    low = cur.filter(res_col <= 2)
    high = cur.filter(res_col > 2)
    fin = (
        low.groupBy(*g)
        .agg(F.collect_list("__c").alias("__cells"))
        .select(*g, F.explode(a5_compact_list(F.col("__cells"))).alias("__c"))
    )
    return fin.unionByName(high).withColumnRenamed("__c", cell)


def uncompact_cover(
    cover: DataFrame,
    target_resolution: int,
    cell: str = "cell",
    group_cols=(),
    min_resolution: int | None = None,
) -> DataFrame:
    """Expand a (possibly mixed-resolution) cover to a single fine resolution.
    Hilbert-regime cells (res 2..29) expand via the native children sequence
    (JVM explode); res-0/1 cells — whose marker layout and aperture differ —
    route through the full-regime kernel UDF. A res-30 TARGET also routes
    every cell through the kernel: res 30's variable-width marker layout is
    outside the native bit expressions' regime (shiftleft(1, 59 - 2*30)
    would wrap), and native cell_resolution misreads mk-1 res-30 cells as
    res 29.

    min_resolution: caller CONTRACT that every input cell's resolution is
    >= this value. With min_resolution >= 2 the res-0/1 kernel branch is
    omitted entirely — that branch is a Python-UDF stage whose tasks are
    scheduled even when its filter keeps nothing (one per uncompact, ~0.2 s
    each on the bench host). The >= 2 filter is still applied, so a
    contract violation drops rows rather than corrupting the expansion."""
    from a5spark.functions.udfs import a5_uncompact

    g = list(group_cols)
    if target_resolution >= 30:
        return cover.select(
            *g,
            F.explode(
                a5_uncompact(F.col(cell), F.lit(target_resolution))
            ).alias(cell),
        )
    res = native.cell_resolution(F.col(cell))
    staged = cover.withColumn("__r", res)
    hilbert = staged.filter(F.col("__r") >= 2).select(
        *g,
        F.explode(
            native.cell_children(F.col(cell), F.col("__r"), target_resolution)
        ).alias(cell),
    )
    if min_resolution is not None and min_resolution >= 2:
        return hilbert
    low = staged.filter(F.col("__r") < 2).select(
        *g,
        F.explode(a5_uncompact(F.col(cell), F.lit(target_resolution))).alias(cell),
    )
    return hilbert.unionByName(low)


def cover_union(
    a: DataFrame, b: DataFrame, resolution: int, cell: str = "cell",
    group_cols=(), compact: bool = True,
) -> DataFrame:
    """Set union of two covers at a common resolution, re-compacted."""
    u = (
        uncompact_cover(a, resolution, cell, group_cols)
        .unionByName(uncompact_cover(b, resolution, cell, group_cols))
        .distinct()
    )
    return compact_cover(u, cell, group_cols, (resolution, resolution)) if compact else u


def cover_intersect(
    a: DataFrame, b: DataFrame, resolution: int, cell: str = "cell",
    group_cols=(), compact: bool = True,
) -> DataFrame:
    """Set intersection of two covers at a common resolution, re-compacted."""
    keys = list(group_cols) + [cell]
    i = (
        uncompact_cover(a, resolution, cell, group_cols)
        .join(uncompact_cover(b, resolution, cell, group_cols), keys, "left_semi")
        .distinct()
    )
    return compact_cover(i, cell, group_cols, (resolution, resolution)) if compact else i


def cover_difference(
    a: DataFrame, b: DataFrame, resolution: int, cell: str = "cell",
    group_cols=(), compact: bool = True,
) -> DataFrame:
    """Set difference a - b of two covers at a common resolution, re-compacted."""
    keys = list(group_cols) + [cell]
    d = (
        uncompact_cover(a, resolution, cell, group_cols)
        .join(uncompact_cover(b, resolution, cell, group_cols), keys, "left_anti")
        .distinct()
    )
    return compact_cover(d, cell, group_cols, (resolution, resolution)) if compact else d


def salt_column(df: DataFrame, key: str, buckets: int, out: str = "__salt") -> DataFrame:
    """Deterministic salt for hot-key two-phase aggregation: groupBy(key, salt)
    partial-aggregate, then groupBy(key) final."""
    return df.withColumn(out, F.pmod(F.xxhash64(F.col(key)), F.lit(buckets)))


def salted_density(
    df: DataFrame, cell: str = "cell", buckets: int = 64, row_key: str | None = None
) -> DataFrame:
    """Two-phase per-cell count robust to Zipfian hot cells: phase 1 spreads a
    hot cell over `buckets` shuffle keys, phase 2 combines the tiny partials."""
    salt_src = F.col(row_key) if row_key else F.monotonically_increasing_id()
    salted = df.withColumn("__salt", F.pmod(F.xxhash64(salt_src), F.lit(buckets)))
    partial = salted.groupBy(cell, "__salt").agg(F.count(F.lit(1)).alias("pn"))
    return partial.groupBy(cell).agg(F.sum("pn").alias("n"))


def stratified_cell_sample(
    df: DataFrame,
    cap_per_cell: int,
    cell: str = "cell",
    order_col: str = "sample_key",
    row_key: str = "k",
    salt_buckets: int = 64,
) -> DataFrame:
    """Geo-stratified downsampling for training-data balancing: keep at
    most `cap_per_cell` rows per cell, chosen by the DETERMINISTIC
    (`order_col`, `row_key`) order — so a downtown hot cell contributes
    the same row budget as an ocean cell, and the sample is reproducible
    across engines and runs (no rand()).

    Scale shape (the 100 TB concern is the hot cell): a single window over
    cell would funnel a Zipfian cell's entire population through one
    shuffle partition. Phase 1 therefore ranks within (cell, salt) —
    `salt_buckets` deterministic buckets split the hot key, each keeping
    at most cap rows (a superset of the answer, since the global top-cap
    per cell is contained in the union of per-bucket top-caps). Phase 2
    ranks the <= salt_buckets*cap survivors per cell exactly. Same salted
    two-phase pattern as `salted_density`; output carries `sample_rank`
    (1..cap, dense in the final order).

    Engine note (PLANS.md): Spark >= 3.5 additionally applies
    WindowGroupLimit to BOTH window stages — each map partition pre-caps
    its contribution to `cap` rows per key before the shuffle — so even
    the plain single-window form bounds hot-key shuffle volume to
    n_map_partitions x cap on modern Spark. The salt phase keeps the
    bound engine-independent and caps per-task sort memory as well."""
    from pyspark.sql import Window

    salt = F.pmod(F.xxhash64(F.col(row_key)), F.lit(salt_buckets))
    w1 = Window.partitionBy(F.col(cell), salt).orderBy(order_col, row_key)
    pre = (
        df.withColumn("__rk1", F.row_number().over(w1))
        .filter(F.col("__rk1") <= cap_per_cell)
        .drop("__rk1")
    )
    w2 = Window.partitionBy(cell).orderBy(order_col, row_key)
    return pre.withColumn("sample_rank", F.row_number().over(w2)).filter(
        F.col("sample_rank") <= cap_per_cell
    )
