"""Cell-clustered table layout: the data-layout lever for 100 TB scans.

Writes a parquet layout range-partitioned AND sorted by the unsigned-order
shifted cell key, so that every ancestor cell's descendant set is one
contiguous key range (the distributed analogue of the reference's
hierarchical trichotomy prune, /root/reference/a5/traversal/cap.py:100-127,
and the `is_child_of` prefix-range semantics,
/root/reference/a5/core/serialization.py:306-321). Two pruning levels follow:

 * FILE level — a JSON manifest records each file's [min, max] key range
   (the per-file min-max index an Iceberg/Delta table maintains natively in
   its metadata layer). A cover scan intersects the cover's key ranges with
   the manifest on the driver and opens only the files that can match: at
   10^6 files this is a sorted-interval walk over metadata, no data I/O.
 * ROW-GROUP level — within the selected files the cover ranges are pushed
   into the parquet scan as `key BETWEEN lo AND hi` disjunctions; because
   rows are sorted by key, parquet row-group min/max statistics skip the
   non-matching groups of each file.

The layout assumes the stored cell column is at a resolution >= the cover's
(the standard shape: fine-resolution assignments scanned through a coarse
cap/polygon cover) — that is exactly the prefix-range regime `is_child_of`
defines.
"""

import json
import os
from bisect import bisect_right
from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from a5spark.functions import native
from a5spark.pipeline.checkpoint import _delete_dir, _fs, _read_text, _write_text

MANIFEST_NAME = "_cell_layout_manifest.json"

_M64 = (1 << 64) - 1
_TOP = 1 << 63


def _to_signed(u: int) -> int:
    return u - (1 << 64) if u >= _TOP else u


def _to_unsigned(c: int) -> int:
    return c & _M64


def cell_key_py(cell: int) -> int:
    """Driver-side twin of native.shifted_key: u64 XOR 2^63, as signed int64.
    Signed comparisons on the key respect unsigned cell order."""
    return _to_signed(_to_unsigned(cell) ^ _TOP)


def cell_resolution_py(cell: int) -> int:
    """Driver-side twin of native.cell_resolution (Hilbert regime + 0/1)."""
    u = _to_unsigned(cell)
    if u == 0:
        return -1
    lsb = (u & -u & _M64).bit_length() - 1
    if lsb == 56:
        return 1
    if lsb == 57:
        return 0
    return (59 - lsb) // 2


def cell_range_keys(cell: int, resolution: int | None = None) -> tuple[int, int]:
    """Inclusive [lo, hi] shifted-key bounds of `cell`'s descendant range —
    the driver-side twin of native.cell_range_lo/hi. Hilbert-range regime
    only (resolution 2..29), matching the native expressions."""
    res = cell_resolution_py(cell) if resolution is None else resolution
    if not 2 <= res <= 29:
        raise ValueError(f"cell_range_keys: resolution {res} outside 2..29")
    shift = 60 - 2 * res
    u = _to_unsigned(cell)
    lo = (u >> shift) << shift
    hi = lo | ((1 << shift) - 1)
    return cell_key_py(lo), cell_key_py(hi)


def merge_key_ranges(ranges) -> list[tuple[int, int]]:
    """Sort + merge overlapping/adjacent [lo, hi] ranges. A compacted cover's
    sibling runs collapse here, so the predicate count tracks the cover's
    *fragmentation*, not its cell count."""
    rs = sorted(ranges)
    out: list[list[int]] = []
    for lo, hi in rs:
        if out and lo <= out[-1][1] + 1:
            if hi > out[-1][1]:
                out[-1][1] = hi
        else:
            out.append([lo, hi])
    return [(lo, hi) for lo, hi in out]


def cover_key_ranges(cover_cells) -> list[tuple[int, int]]:
    """Merged descendant key ranges of a (possibly mixed-resolution,
    compacted) cover — e.g. the output of kernels.polyfill.polygon_to_cells
    or a spherical-cap cover."""
    return merge_key_ranges(cell_range_keys(int(c)) for c in cover_cells)


def write_cell_layout(
    df: DataFrame,
    path: str,
    cell: str = "cell",
    n_files: int = 64,
    key_col: str = "cell_key",
    write_options: dict | None = None,
) -> dict:
    """Materialize `df` as a cell-clustered parquet layout at `path`:
    repartitionByRange(n_files) + sortWithinPartitions on the shifted key
    (range partitioner SAMPLES the key distribution, so files are balanced
    by volume even under hot-cell spatial skew), then build and store the
    per-file [min, max] manifest. Returns the manifest dict.

    The manifest is built by reading parquet FOOTERS only (metadata I/O,
    independent of data size); on a non-local filesystem it falls back to
    one metadata-building scan — in production this index is what an
    Iceberg/Delta table maintains natively at commit time."""
    spark = df.sparkSession
    keyed = df.withColumn(key_col, native.shifted_key(F.col(cell)))
    writer = (
        keyed.repartitionByRange(n_files, key_col)
        .sortWithinPartitions(key_col)
        .write.mode("overwrite")
    )
    for k, v in (write_options or {}).items():
        # e.g. parquet.block.size to bound row-group size (tests use a small
        # value to surface row-group pruning on small data)
        writer = writer.option(k, v)
    writer.parquet(path)
    entries, source = _manifest_entries(spark, path, key_col)
    manifest = {
        "key_col": key_col,
        "cell_col": cell,
        "source": source,
        "files": sorted(entries, key=lambda e: e["lo"]),
    }
    return _commit_manifest(spark, path, manifest)


def _local_dir(path: str) -> str | None:
    if path.startswith("file:"):
        return path[len("file:"):] or "/"
    if "://" not in path:
        return path
    return None


def _manifest_entries(spark: SparkSession, path: str, key_col: str):
    local = _local_dir(path)
    if local is not None and os.path.isdir(local):
        import pyarrow.parquet as pq

        entries = []
        for name in sorted(os.listdir(local)):
            if not name.endswith(".parquet"):
                continue
            nbytes = os.path.getsize(os.path.join(local, name))
            md = pq.ParquetFile(os.path.join(local, name)).metadata
            idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
            ci = idx[key_col]
            los, his, rows = [], [], 0
            for rg in range(md.num_row_groups):
                col = md.row_group(rg).column(ci)
                rows += md.row_group(rg).num_rows
                st = col.statistics
                if st is not None and st.has_min_max:
                    los.append(int(st.min))
                    his.append(int(st.max))
            if los:
                entries.append(
                    {
                        "file": name,
                        "lo": min(los),
                        "hi": max(his),
                        "rows": rows,
                        "row_groups": md.num_row_groups,
                        "bytes": nbytes,
                    }
                )
        return entries, "footer"
    # object store / DFS: one scan that builds the index (production: the
    # table format's metadata layer supplies this without any scan); file
    # sizes come from a directory listing — metadata I/O only
    rows = (
        spark.read.parquet(path)
        .groupBy(F.input_file_name().alias("f"))
        .agg(
            F.min(key_col).alias("lo"),
            F.max(key_col).alias("hi"),
            F.count(F.lit(1)).alias("rows"),
        )
        .collect()
    )
    fs, p, _ = _fs(spark, path)
    sizes = {
        st.getPath().getName(): int(st.getLen())
        for st in fs.listStatus(p)
        if st.isFile()
    }
    return (
        [
            {
                "file": r["f"].rsplit("/", 1)[-1],
                "lo": int(r["lo"]),
                "hi": int(r["hi"]),
                "rows": int(r["rows"]),
                "row_groups": None,
                "bytes": sizes.get(r["f"].rsplit("/", 1)[-1]),
            }
            for r in rows
        ],
        "scan",
    )


VERSIONS_DIR = "_versions"

# Torn-reservation repair: a contended version file showing no write
# progress for this long is treated as a crashed writer's leftover and
# deleted. Driver GC pauses and slow object-store writes routinely reach
# seconds, so the window is deliberately wide; a LIVE writer whose
# reservation is repaired out from under it is still safe — the winner
# verifies its own commit is readable after close and retries if not
# (see _commit_manifest), so the failure mode is a retry, never a silent
# lost update. Tests shorten this via monkeypatch to keep the suite fast.
_TORN_GRACE_SEC = 10.0
_TORN_POLL_SEC = 0.5


class ConcurrentCommitError(RuntimeError):
    """Another writer committed a manifest version this commit was based on.
    Raised when the caller supplied no `retry_update` (single-writer
    operations like the initial `write_cell_layout`) or when re-applying
    the update onto the winner's manifest is not safe (e.g. two OPTIMIZE
    runs racing over the same files)."""


def _create_exclusive(spark: SparkSession, path_str: str, text: str) -> bool:
    """Atomically create `path_str` with `text` iff it does not exist —
    Hadoop `FileSystem.create(overwrite=False)` is the atomic reservation
    primitive on HDFS and local FS (object stores need their conditional-put
    equivalent, e.g. S3 If-None-Match, which recent Hadoop S3A exposes the
    same way). Returns False if the path already exists (lost the race)."""
    fs, p, _ = _fs(spark, path_str)
    try:
        out = fs.create(p, False)
    except Exception:
        if fs.exists(p):
            return False
        raise
    try:
        out.write(bytearray(text.encode("utf-8")))
    finally:
        out.close()
    return True


def _commit_manifest(
    spark: SparkSession,
    path: str,
    manifest: dict,
    retry_update=None,
    max_attempts: int = 20,
) -> dict:
    """Commit a new manifest version with optimistic concurrency control.

    The versioned log file under _versions/ IS the commit point: it is
    claimed with an atomic create-if-absent, so two writers that both read
    version N can never both commit N+1 — the loser re-reads the winner's
    manifest, re-applies its own change via `retry_update(current) -> dict`
    (return None to accept the current state as already containing the
    change, e.g. an idempotent batch id), and tries N+2. Without
    `retry_update` a lost race raises ConcurrentCommitError instead of
    silently dropping the winner's commit — the Iceberg optimistic-commit
    protocol, hand-rolled over the version log this layout already keeps.

    The current-pointer file is a read CACHE of the newest version, updated
    after the commit point via tmp+rename so it is never observably
    half-written; `read_manifest` treats the version log as the source of
    truth (max committed version wins), so a stale or torn pointer — two
    winners updating it out of order, or a crash between commit and pointer
    write — never surfaces an older manifest."""
    for _ in range(max_attempts):
        version = manifest.get("version", -1) + 1
        committed = {**manifest, "version": version}
        text = json.dumps(committed)
        vfile = f"{path}/{VERSIONS_DIR}/v{version:06d}.json"
        if _create_exclusive(spark, vfile, text):
            # Verify the commit is durably VISIBLE before reporting success:
            # if this writer stalled past the torn-reservation grace window
            # mid-write, a repairer may have deleted the reservation (and a
            # third writer retaken the version) while we finished writing to
            # a removed inode — create() returned True but the commit is
            # invisible to every reader. Re-reading our own entry converts
            # that silent lost update into an explicit lost race (retry).
            try:
                readback = _read_text(spark, vfile)
            except Exception:
                readback = None
            if readback != text:
                current = read_manifest(spark, path)
                if retry_update is None:
                    raise ConcurrentCommitError(
                        f"manifest version {version} at {path} was repaired "
                        "and retaken by a concurrent writer mid-commit; this "
                        "operation cannot merge its update"
                    )
                manifest = retry_update(current)
                if manifest is None:
                    return current
                continue
            fs, _, jvm = _fs(spark, path)
            tmp = jvm.org.apache.hadoop.fs.Path(f"{path}/.{MANIFEST_NAME}.tmp")
            cur = jvm.org.apache.hadoop.fs.Path(f"{path}/{MANIFEST_NAME}")
            _write_text(spark, f"{path}/.{MANIFEST_NAME}.tmp", text)
            if fs.exists(cur):
                fs.delete(cur, False)
            fs.rename(tmp, cur)
            return committed
        current = read_manifest(spark, path)
        if current.get("version", -1) < version:
            # The v{version} file exists but no commit at that version is
            # readable: either a concurrent writer is BETWEEN create and
            # close (ms-scale — wait it out), or a writer CRASHED there and
            # left a torn reservation that would block every future commit.
            # Progress-aware grace: the countdown RESETS whenever the
            # reservation file's (size, mtime) changes, so a slow live
            # writer is never repaired mid-write; only a reservation with
            # no progress for the full _TORN_GRACE_SEC window is deleted
            # and retaken. A live writer stalled past even that (GC pause)
            # is still safe — its own commit verification above detects
            # the repair and retries.
            import time as _time

            fs, _, jvm = _fs(spark, path)
            vpath = jvm.org.apache.hadoop.fs.Path(vfile)

            def _sig():
                try:
                    st = fs.getFileStatus(vpath)
                    return (st.getLen(), st.getModificationTime())
                except Exception:
                    return None

            healed = False
            last_sig = _sig()
            deadline = _time.monotonic() + _TORN_GRACE_SEC
            while _time.monotonic() < deadline:
                _time.sleep(_TORN_POLL_SEC)
                current = read_manifest(spark, path)
                if current.get("version", -1) >= version:
                    healed = True
                    break
                sig = _sig()
                if sig != last_sig:
                    last_sig = sig
                    deadline = _time.monotonic() + _TORN_GRACE_SEC
            if not healed:
                # Final check-then-act narrowing: re-read the entry
                # IMMEDIATELY before deleting — a stalled writer that
                # completed between the last poll (up to _TORN_POLL_SEC
                # ago) and here is detected and honored. The residual
                # window is the sub-ms gap between this parse attempt and
                # the delete; a writer would have to complete its write,
                # pass its own readback, AND report success inside that
                # gap after already stalling > _TORN_GRACE_SEC. This is a
                # plain-filesystem limitation: create-if-absent + delete
                # cannot express compare-and-delete. On object stores the
                # whole repair path is moot — a PUT is all-or-nothing, so
                # torn reservations cannot exist there (conditional-put
                # creates are atomic and complete).
                #
                # SECOND documented residual race (dual repairers): with
                # two concurrent repairers, B's parse-fail-then-delete gap
                # can straddle A's recreate + readback of the same version
                # file — B then deletes A's fresh entry AFTER A's readback
                # passed, so A reports success while its version-log entry
                # is gone (the manifest POINTER A also wrote stays intact,
                # so the state is recoverable, but the log row is lost).
                # Reaching it needs both repairers inside the same sub-ms
                # parse→delete gap after BOTH graced > _TORN_GRACE_SEC on
                # the same torn file — same order of improbability as the
                # stalled-writer window above, and the same fix applies on
                # real deployments: an object store's atomic creates make
                # the repair path (and both races) vanish.
                try:
                    json.loads(_read_text(spark, vfile))
                    continue  # completed after the last poll — lost race
                except Exception:
                    pass
                fs.delete(vpath, False)
                continue  # retake the same version
        if retry_update is None:
            raise ConcurrentCommitError(
                f"manifest version {version} at {path} was committed by a "
                "concurrent writer; this operation cannot merge its update"
            )
        manifest = retry_update(current)
        if manifest is None:  # the change is already in the current state
            return current
    raise ConcurrentCommitError(
        f"gave up after {max_attempts} contended commit attempts at {path}"
    )


def _version_numbers(spark: SparkSession, path: str) -> list[int]:
    """Version numbers present in the version log, descending."""
    fs, _, jvm = _fs(spark, path)
    vdir = jvm.org.apache.hadoop.fs.Path(f"{path}/{VERSIONS_DIR}")
    if not fs.exists(vdir):
        return []
    out = []
    for st in fs.listStatus(vdir):
        n = st.getPath().getName()
        if n.startswith("v") and n.endswith(".json"):
            try:
                out.append(int(n[1:-5]))
            except ValueError:
                pass
    return sorted(out, reverse=True)


def _max_committed_version(spark: SparkSession, path: str) -> int:
    """Highest version number in the version log, or -1 if none."""
    vs = _version_numbers(spark, path)
    return vs[0] if vs else -1


def read_manifest(
    spark: SparkSession, path: str, version: int | None = None
) -> dict:
    """Current manifest, or a specific committed version (time travel —
    valid as long as vacuum's retention window still covers it).

    The version log is the source of truth: the current pointer is only a
    cache, so if the log holds a NEWER committed version than the pointer
    (a crash between commit and pointer write, or two contended writers
    updating the pointer out of order), the newest log entry wins; a
    missing or torn pointer likewise recovers from the log. A TORN version
    log entry (a writer crashed between reserving the file and finishing
    its write) is skipped — a commit only exists once its content is
    complete, so the newest PARSEABLE entry is the newest real commit.
    One extra listStatus per read — driver-side metadata I/O, the price of
    linearizable reads without a catalog service."""
    if version is not None:
        return json.loads(
            _read_text(spark, f"{path}/{VERSIONS_DIR}/v{version:06d}.json")
        )
    try:
        cur = json.loads(_read_text(spark, f"{path}/{MANIFEST_NAME}"))
    except Exception:
        cur = None
    newest = None
    for v in _version_numbers(spark, path):
        if cur is not None and cur.get("version", -1) >= v:
            break  # the pointer is at least as new as every remaining log
        try:
            newest = json.loads(
                _read_text(spark, f"{path}/{VERSIONS_DIR}/v{v:06d}.json")
            )
            break
        except Exception:
            continue  # torn entry — not a commit
    if newest is not None:
        return newest
    if cur is None:
        raise FileNotFoundError(f"no readable manifest at {path}")
    return cur


def _select_files(manifest: dict, ranges: list[tuple[int, int]]):
    """Driver-side interval intersection: manifest files sorted by lo, cover
    ranges sorted by lo — one merged walk, O(F + R) after the sorts."""
    files = manifest["files"]  # sorted by lo at write time
    los = [r[0] for r in ranges]
    selected = []
    for e in files:
        # candidate ranges: the one starting at or before e.hi, plus none
        # after it; a range matches iff r.lo <= e.hi and r.hi >= e.lo
        i = bisect_right(los, e["hi"]) - 1
        if i >= 0 and ranges[i][1] >= e["lo"]:
            selected.append(e)
            continue
        # ranges are merged (disjoint, sorted) so only ranges[i] can start
        # <= e.hi; if it ends before e.lo no other range intersects e
    return selected


def scan_cell_layout(
    spark: SparkSession,
    path: str,
    cover_cells,
    max_predicate_ranges: int = 256,
    version: int | None = None,
):
    """Pruned scan of a cell layout through a cover: returns (DataFrame,
    stats). Files are pruned on the driver via the manifest; within the
    selected files the ranges are applied either as a pushed-down BETWEEN
    disjunction (<= max_predicate_ranges merged ranges — parquet row-group
    pruning applies) or, for pathologically fragmented covers, as a
    broadcast range join (file pruning still applies; row-group pruning is
    traded away for a bounded predicate tree).

    `version` pins the scan to a committed manifest version (time travel /
    snapshot isolation across concurrent maintenance — valid while vacuum's
    retention window covers it).

    stats = {files_total, files_selected, rows_total, rows_in_selected_files,
             n_ranges, strategy, version} — the scan-cost evidence."""
    manifest = read_manifest(spark, path, version=version)
    key_col = manifest["key_col"]
    ranges = cover_key_ranges(cover_cells)
    selected = _select_files(manifest, ranges)
    stats = {
        "version": manifest.get("version"),
        "files_total": len(manifest["files"]),
        "files_selected": len(selected),
        "rows_total": sum(e["rows"] for e in manifest["files"]),
        "rows_in_selected_files": sum(e["rows"] for e in selected),
        "n_ranges": len(ranges),
        "strategy": "predicate" if len(ranges) <= max_predicate_ranges else "range_join",
    }
    if not selected or not ranges:
        return spark.read.parquet(path).filter(F.lit(False)), stats
    df = spark.read.parquet(*[f"{path}/{e['file']}" for e in selected])
    if stats["strategy"] == "predicate":
        pred = reduce(
            lambda a, b: a | b,
            [F.col(key_col).between(lo, hi) for lo, hi in ranges],
        )
        return df.filter(pred), stats
    rdf = spark.createDataFrame(ranges, "r_lo: long, r_hi: long")
    joined = df.join(
        F.broadcast(rdf),
        (F.col(key_col) >= F.col("r_lo")) & (F.col(key_col) <= F.col("r_hi")),
    ).drop("r_lo", "r_hi")
    return joined, stats


def optimize_cell_layout(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 << 20,
    min_file_bytes: int | None = None,
    write_options: dict | None = None,
    retain_old: bool = False,
    retain_versions: int = 2,
    parallel_bins: int | None = None,
) -> dict:
    """Bin-pack a cell layout's small files into ~target-size files without
    breaking the clustering invariant — the maintenance half of the layout
    story (Delta `OPTIMIZE` / Iceberg `rewrite_data_files` analogue).

    At 100 TB the layout is written incrementally (per ingest batch /
    checkpoint partition), which accretes small files; small files tax every
    scan with per-file open cost and defeat row-group pruning (one tiny row
    group each). Because `write_cell_layout` produces files DISJOINT in key
    ranges, merging ADJACENT (key-order) files and re-sorting the merged rows
    preserves the global sort — so pruning semantics are untouched and only
    the file granularity changes.

    Mechanics per bin (a maximal run of adjacent files each under
    `min_file_bytes`, packed greedily to `target_file_bytes`), in
    crash-safe order: (1) read the bin's files and write the one-task
    key-sorted merge to an underscore-prefixed temp dir (invisible to
    parquet readers); (2) rename the result into the layout dir; (3) commit
    the manifest with the bin's entries swapped for the new file — the
    MANIFEST WRITE is the bin's commit point; (4) delete the bin's old,
    now-unreferenced files. A crash before (3) leaves the old manifest
    serving the old (still present) files; a crash after (3) leaves the new
    manifest serving the new file — `scan_cell_layout` reads through the
    manifest, so every window is consistent. Either crash side can orphan
    unreferenced data files; `vacuum_cell_layout` (run automatically at the
    start of each optimize) reclaims them. Raw full-directory reads bypass
    the manifest and are only duplicate-free after a vacuum — in production
    the table format's snapshot plays this manifest's role atomically.
    Bins are independent (key-disjoint by construction); `parallel_bins=N`
    runs them as N concurrent Spark jobs from driver threads — each bin's
    CAS commit merges onto whatever siblings committed first, so the
    manifest chain stays linear while the merge WORK overlaps (the
    maintenance-scheduler parallelism production table formats get,
    enabled by the round-6 optimistic commit protocol). Default stays
    sequential (deterministic version order).

    With `retain_old=True` step (4) is skipped: old files stay on disk so
    readers pinned to an earlier manifest version (scan_cell_layout
    version=) keep working across the maintenance — snapshot isolation —
    and a later `vacuum_cell_layout(retain_versions=...)` reclaims them
    once the retention window moves past. Each bin commit is a manifest
    VERSION, so the whole optimize is a chain of small reversible commits.

    `retain_versions` (default 2, i.e. current + previous) is the
    time-travel window the automatic leading vacuum honors — so routine
    maintenance no longer breaks a reader pinned one version back (it
    previously vacuumed with a 1-version window, deleting every older
    snapshot's files mid-scan). Concurrency: racing APPEND commits are
    merged via the CAS retry (their files are untouched by any bin); a
    racing OPTIMIZE that rewrote one of this run's bin files aborts the
    bin with ConcurrentCommitError rather than committing a double-counted
    merge. Vacuum is NOT safe against in-flight (uncommitted) appends —
    schedule maintenance and ingest off each other, as with Iceberg's
    orphan-file removal.

    Returns {files_before, files_after, bins, files_rewritten,
    bytes_rewritten, vacuumed}.
    """
    stats_vacuumed = (
        0
        if retain_old
        else len(vacuum_cell_layout(spark, path, retain_versions=retain_versions))
    )
    manifest = read_manifest(spark, path)
    key_col = manifest["key_col"]
    files = manifest["files"]  # sorted by lo == adjacency order
    if any(e.get("bytes") is None for e in files):
        raise ValueError("optimize_cell_layout: manifest lacks file sizes; "
                         "rewrite the layout with the current writer first")
    min_file_bytes = (
        target_file_bytes // 2 if min_file_bytes is None else min_file_bytes
    )

    bins: list[list[dict]] = []
    cur: list[dict] = []
    cur_bytes = 0
    for e in files:
        if e["bytes"] >= min_file_bytes:
            if len(cur) >= 2:
                bins.append(cur)
            cur, cur_bytes = [], 0
            continue
        if cur and cur_bytes + e["bytes"] > target_file_bytes:
            if len(cur) >= 2:
                bins.append(cur)
            cur, cur_bytes = [], 0
        cur.append(e)
        cur_bytes += e["bytes"]
    if len(cur) >= 2:
        bins.append(cur)

    stats = {
        "files_before": len(files),
        "bins": len(bins),
        "files_rewritten": sum(len(b) for b in bins),
        "bytes_rewritten": sum(e["bytes"] for b in bins for e in b),
        "vacuumed": stats_vacuumed,
    }
    if not bins:
        stats["files_after"] = len(files)
        return stats

    fs, _, jvm = _fs(spark, path)
    base_version = manifest.get("version", -1)
    # per-RUN nonce: two optimize runs racing from the same base version
    # would otherwise generate identical opt-v{base+1}-{lo} names for bins
    # sharing a min lo — the loser would clobber the winner's already-
    # committed data file before its own commit aborts (manifest entries
    # pointing at wrong contents). With the nonce, distinct runs can never
    # target the same file name; the loser's output is left as an orphan
    # for vacuum when its commit aborts.
    import uuid as _uuid

    run_nonce = _uuid.uuid4().hex[:10]
    tmp_root = f"{path}/_optimize_tmp-{run_nonce}"

    def _bin_name(b: list[dict]) -> str:
        return (
            f"opt-v{base_version + 1:06d}-"
            f"{(min(e['lo'] for e in b) + (1 << 63)) & _M64:016x}-"
            f"{run_nonce}.parquet"
        )

    def _run_bin_once(i: int, b: list[dict]) -> None:
        tmp_dir = f"{tmp_root}/bin-{i}"
        df = spark.read.parquet(*[f"{path}/{e['file']}" for e in b])
        writer = df.coalesce(1).sortWithinPartitions(key_col).write.mode("overwrite")
        for k, v in (write_options or {}).items():
            writer = writer.option(k, v)
        writer.parquet(tmp_dir)
        part = [
            st.getPath()
            for st in fs.listStatus(jvm.org.apache.hadoop.fs.Path(tmp_dir))
            if st.isFile() and st.getPath().getName().endswith(".parquet")
        ]
        assert len(part) == 1, f"expected one part file in {tmp_dir}"
        # unique per RUN: base version + the bin's lowest key + the run
        # nonce. The version prefix keeps names debuggable and never equal
        # to a re-bin target of an earlier optimize; the lo-hash is unique
        # within one run (bins are key-disjoint); the nonce makes names
        # from CONCURRENT runs off the same base version distinct, so no
        # run can ever clobber another's committed file. A pre-existing
        # dest can therefore only be (a) committed by an earlier ATTEMPT
        # of this same bin (crash between rename and commit-visibility
        # here — referenced: refuse to touch, the retry wrapper handles
        # it) or (b) this run's own uncommitted leftover (nonce proves
        # ownership; unreferenced proves uncommitted) — safe to replace.
        name = _bin_name(b)
        assert name not in {e["file"] for e in b}
        dest = jvm.org.apache.hadoop.fs.Path(f"{path}/{name}")
        if fs.exists(dest):
            referenced = name in {
                e["file"] for e in read_manifest(spark, path)["files"]
            }
            if referenced:
                raise ConcurrentCommitError(
                    f"optimize dest {name} at {path} is already referenced "
                    "by the current manifest; refusing to overwrite"
                )
            fs.delete(dest, False)
        fs.rename(part[0], dest)
        # commit point: swap the bin's entries for the new file's entry
        # lo/hi via min/max, not first/last: appended batches may overlap
        # older files' ranges, so lo-order adjacency does not imply b[-1]
        # carries the bin's max key
        entry = _entry_for_file(
            spark, path, name, key_col,
            lo=min(e["lo"] for e in b),
            hi=max(e["hi"] for e in b),
            rows=sum(e["rows"] for e in b),
        )
        bin_names = {e["file"] for e in b}

        def _apply(cur: dict) -> dict:
            # merge this bin's swap onto the current manifest — safe iff
            # every bin file is still referenced (racing APPENDs only add
            # files; SIBLING bins of this run touch disjoint files); if
            # another optimize already rewrote one, committing would
            # double-count its rows, so abort and leave our merged file as
            # an orphan for vacuum
            have = {e["file"] for e in cur["files"]}
            if not bin_names <= have:
                raise ConcurrentCommitError(
                    "optimize bin files were rewritten by a concurrent "
                    f"writer at {path}; aborting this bin's commit"
                )
            return {
                **cur,
                "files": sorted(
                    [e for e in cur["files"] if e["file"] not in bin_names]
                    + [entry],
                    key=lambda e: e["lo"],
                ),
            }

        committed = _commit_manifest(
            spark, path, _apply(read_manifest(spark, path)), retry_update=_apply
        )
        if not retain_old:
            # this bin's old files are unreferenced by CURRENT as of the
            # commit above (sibling bins never reference them)
            for e in b:
                fs.delete(
                    jvm.org.apache.hadoop.fs.Path(f"{path}/{e['file']}"), False
                )

    def _run_bin(i: int, b: list[dict]) -> None:
        """One bin with one idempotent retry. Every step before the CAS
        commit is re-runnable (the tmp write is mode=overwrite; a nonce-
        named dest found on disk is provably this run's own uncommitted
        leftover), and a failure AFTER the commit only needs the old-file
        deletes finished — so a transient job failure degrades to a
        retried bin, not a failed maintenance run (what a production
        rewrite scheduler does). A second failure raises with the bin
        context and the full Java stack, so the failure mode is always
        diagnosable (the round-6 flake surfaced as an uncaptured
        Py4JJavaError out of concurrent bin jobs)."""
        try:
            return _run_bin_once(i, b)
        except ConcurrentCommitError:
            raise
        except Exception as first:
            cur = read_manifest(spark, path)
            names = {e["file"] for e in cur["files"]}
            bin_names = {e["file"] for e in b}
            if _bin_name(b) in names and not (bin_names & names):
                # the commit landed before the failure; only the
                # post-commit deletes remain (idempotent)
                if not retain_old:
                    for e in b:
                        fs.delete(
                            jvm.org.apache.hadoop.fs.Path(
                                f"{path}/{e['file']}"
                            ),
                            False,
                        )
                return
            try:
                return _run_bin_once(i, b)
            except ConcurrentCommitError:
                raise
            except Exception as second:
                java = getattr(second, "java_exception", None)
                raise RuntimeError(
                    f"optimize bin {i} ({sorted(bin_names)}) failed twice; "
                    f"first failure: {first!r}; java: "
                    f"{java.toString() if java is not None else None}"
                ) from second

    if parallel_bins and len(bins) > 1:
        # bins are key-disjoint, so they may run as concurrent Spark jobs;
        # each bin's CAS commit merges onto whatever siblings committed
        # first — the maintenance-scheduler parallelism production table
        # formats get, enabled by the round-6 optimistic commit protocol.
        # inheritable_thread_target is the PySpark-documented wrapper for
        # submitting Spark jobs from pool threads under pinned-thread mode
        # (py4j ClientServer): it propagates the caller's JVM-local
        # properties into each worker thread's dedicated connection. With
        # pinned mode OFF the helper's curried form degenerates (pyspark
        # returns its argument unchanged, so calling it would invoke the
        # SparkSession) — plain threads are already correct there.
        from concurrent.futures import ThreadPoolExecutor

        from py4j.clientserver import ClientServer
        from pyspark import SparkContext, inheritable_thread_target

        if isinstance(SparkContext._gateway, ClientServer):
            run = inheritable_thread_target(spark)(_run_bin)
        else:  # pragma: no cover - PYSPARK_PIN_THREAD=false environments
            run = _run_bin
        try:
            with ThreadPoolExecutor(max_workers=int(parallel_bins)) as pool:
                futures = [pool.submit(run, i, b) for i, b in enumerate(bins)]
                for f in futures:
                    f.result()
        finally:
            # the nonce-named tmp dir is unique to this run — an aborted
            # run (e.g. ConcurrentCommitError from a racing optimize) must
            # clean it up itself or it leaks a full rewritten copy of its
            # bins forever (no later run reuses the name)
            _delete_dir(spark, tmp_root)
    else:
        try:
            for i, b in enumerate(bins):
                _run_bin(i, b)
        finally:
            _delete_dir(spark, tmp_root)
    manifest = read_manifest(spark, path)
    current = manifest["files"]
    stats["files_after"] = len(current)
    return stats


def _entry_for_file(
    spark: SparkSession, path: str, name: str, key_col: str,
    lo: int | None = None, hi: int | None = None, rows: int | None = None,
) -> dict | None:
    """Manifest entry for one just-written file, or None for an empty file.
    Exact footer stats on a local filesystem; on DFS/object stores the
    caller-supplied bounds when known (optimize bins are exact by
    construction), else one single-file min/max/count scan (append batches;
    in production the table format's commit metadata supplies this)."""
    local = _local_dir(path)
    if local is not None and os.path.isdir(local):
        import pyarrow.parquet as pq

        fp = os.path.join(local, name)
        md = pq.ParquetFile(fp).metadata
        ci = {md.schema.column(i).name: i for i in range(md.num_columns)}[key_col]
        los, his, n = [], [], 0
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(ci).statistics
            n += md.row_group(rg).num_rows
            if st is not None and st.has_min_max:
                los.append(int(st.min))
                his.append(int(st.max))
        if not los:
            return None
        return {
            "file": name, "lo": min(los), "hi": max(his), "rows": n,
            "row_groups": md.num_row_groups, "bytes": os.path.getsize(fp),
        }
    fs, _, jvm = _fs(spark, path)
    st = fs.getFileStatus(jvm.org.apache.hadoop.fs.Path(f"{path}/{name}"))
    if lo is None or hi is None or rows is None:
        r = (
            spark.read.parquet(f"{path}/{name}")
            .agg(
                F.min(key_col).alias("lo"),
                F.max(key_col).alias("hi"),
                F.count(F.lit(1)).alias("rows"),
            )
            .collect()[0]
        )
        if r["rows"] == 0 or r["lo"] is None:
            return None
        lo, hi, rows = int(r["lo"]), int(r["hi"]), int(r["rows"])
    return {
        "file": name, "lo": lo, "hi": hi, "rows": rows,
        "row_groups": None, "bytes": int(st.getLen()),
    }


def vacuum_cell_layout(
    spark: SparkSession, path: str, retain_versions: int = 1
) -> list[str]:
    """Delete data files not referenced by any RETAINED manifest version:
    leftovers of a crashed optimize/append, or old files kept by
    `retain_old` maintenance. `retain_versions` is the time-travel window —
    files referenced by any of the last N committed versions survive, and
    version files older than the window are pruned so expired versions
    cannot be silently half-read. The manifest is the layout's source of
    truth; raw full-directory reads bypass it and are only guaranteed
    duplicate-free after a vacuum. Returns the removed data-file names."""
    manifest = read_manifest(spark, path)
    current_v = manifest.get("version", 0)
    retained = [manifest]
    fs, p, jvm = _fs(spark, path)
    for v in range(max(0, current_v - retain_versions + 1), current_v):
        try:
            retained.append(read_manifest(spark, path, version=v))
        except Exception:
            pass  # legacy layout without a version log
    keep = {e["file"] for m in retained for e in m["files"]}
    vdir = jvm.org.apache.hadoop.fs.Path(f"{path}/{VERSIONS_DIR}")
    if fs.exists(vdir):
        for st in fs.listStatus(vdir):
            vname = st.getPath().getName()
            if vname.startswith("v") and vname.endswith(".json"):
                try:
                    vnum = int(vname[1:-5])
                except ValueError:
                    continue
                if vnum <= current_v - retain_versions:
                    fs.delete(st.getPath(), False)
                elif vnum <= current_v:
                    # a version log at or below the committed head that does
                    # not parse is a TORN entry from a crashed writer (a
                    # real commit at that version would be readable) —
                    # repair it so reads never have to skip it again; the
                    # in-flight window (> current_v) is never touched
                    try:
                        json.loads(
                            _read_text(
                                spark, f"{path}/{VERSIONS_DIR}/{vname}"
                            )
                        )
                    except Exception:
                        fs.delete(st.getPath(), False)
    removed = []
    for st in fs.listStatus(p):
        name = st.getPath().getName()
        if st.isFile() and name.endswith(".parquet") and name not in keep:
            fs.delete(st.getPath(), False)
            removed.append(name)
    return removed


def append_cell_layout(
    df: DataFrame,
    path: str,
    batch_id: int | None = None,
    n_files: int = 4,
    write_options: dict | None = None,
) -> dict:
    """Append a batch of rows to an existing cell layout — the ingestion
    half of the layout lifecycle (write → append* → optimize → vacuum →
    scan). The batch is keyed, range-partitioned, and sorted like the
    original write, landed via the same invisible-tmp-dir + rename + single
    manifest commit protocol as optimize, so every crash window leaves the
    manifest consistent and `vacuum_cell_layout` reclaims orphans.

    IDEMPOTENT under retries when `batch_id` is supplied (the Structured
    Streaming foreachBatch contract: a failed micro-batch is re-delivered
    with the SAME id): a batch id already recorded in the manifest is a
    no-op, which upgrades foreachBatch's at-least-once delivery to
    exactly-once at the manifest — the role a table format's idempotent
    commit plays in production.

    Appended files' key ranges may overlap older files' (each batch is
    sorted internally, not merged globally); scans stay correct because
    file selection and pushed predicates are per-file, and a later
    `optimize_cell_layout` restores locality by merging adjacent files.
    """
    spark = df.sparkSession
    manifest = read_manifest(spark, path)
    key_col = manifest["key_col"]
    batches = manifest.get("batches", [])
    if batch_id is None:
        batch_id = (max(batches) + 1) if batches else 0
    if batch_id in batches:
        return {"batch_id": batch_id, "appended_files": 0, "rows": 0,
                "skipped": True}

    keyed = df.withColumn(key_col, native.shifted_key(F.col(manifest["cell_col"])))
    tmp_dir = f"{path}/_append_tmp/b{batch_id}"
    writer = (
        keyed.repartitionByRange(n_files, key_col)
        .sortWithinPartitions(key_col)
        .write.mode("overwrite")
    )
    for k, v in (write_options or {}).items():
        writer = writer.option(k, v)
    writer.parquet(tmp_dir)

    fs, _, jvm = _fs(spark, path)
    parts = sorted(
        (
            st.getPath()
            for st in fs.listStatus(jvm.org.apache.hadoop.fs.Path(tmp_dir))
            if st.isFile() and st.getPath().getName().endswith(".parquet")
        ),
        key=lambda p: p.getName(),
    )
    entries = []
    for i, p in enumerate(parts):
        name = f"b{batch_id:06d}-{i:05d}.parquet"
        dest = jvm.org.apache.hadoop.fs.Path(f"{path}/{name}")
        if fs.exists(dest):  # leftover of a crashed retry of this batch
            fs.delete(dest, False)
        fs.rename(p, dest)
        e = _entry_for_file(spark, path, name, key_col)
        if e is not None:  # empty part files carry no key range
            entries.append(e)
    _delete_dir(spark, f"{path}/_append_tmp")

    def _apply(cur: dict) -> dict | None:
        # re-apply this append onto a concurrent winner's manifest; a
        # winner that already recorded this batch id (a racing redelivery
        # of the SAME micro-batch — identical content, identical target
        # file names) means the append is already committed: accept theirs
        if batch_id in cur.get("batches", []):
            return None
        names = {e["file"] for e in entries}
        return {
            **cur,
            "files": sorted(
                [e for e in cur["files"] if e["file"] not in names] + entries,
                key=lambda e: e["lo"],
            ),
            "batches": sorted(cur.get("batches", []) + [batch_id]),
        }

    _commit_manifest(spark, path, _apply(manifest), retry_update=_apply)
    return {
        "batch_id": batch_id,
        "appended_files": len(entries),
        "rows": sum(e["rows"] for e in entries),
        "skipped": False,
    }


def stream_append_cell_layout(
    stream_df: DataFrame,
    path: str,
    checkpoint: str,
    n_files: int = 4,
    available_now: bool = True,
):
    """Structured Streaming sink into a cell layout: foreachBatch routes
    each micro-batch through `append_cell_layout(batch_id=...)`, whose
    manifest-recorded batch ids make redelivered micro-batches no-ops —
    exactly-once layout commits on top of the stream's own checkpointed
    offsets. Returns the started StreamingQuery (availableNow by default:
    drain the source, then stop — the batch-refresh production pattern)."""

    def _sink(bdf, bid):
        append_cell_layout(bdf, path, batch_id=int(bid), n_files=n_files)

    writer = stream_df.writeStream.foreachBatch(_sink).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
