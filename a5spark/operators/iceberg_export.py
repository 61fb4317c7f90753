"""Iceberg metadata export for cell-clustered layouts — the interop exit
ramp off the hand-rolled manifest (operators/layout.py).

The layout layer keeps exactly the state an Iceberg table keeps natively:
per-file row counts / sizes / [min, max] bounds on the cluster key, a
linear chain of committed snapshot versions, and an optimistic-concurrency
commit point. `layout_to_iceberg_metadata` exports that state in Iceberg's
v2 metadata MODEL — table metadata with schema (field ids), snapshot log,
a manifest list per snapshot, and per-file manifest entries carrying
`record_count`, `file_size_in_bytes`, and field-id-keyed `lower_bounds` /
`upper_bounds` — so a catalog migration has every value it needs in the
exact shape Iceberg's spec names it.

Documented gap to byte-level interop (spec: https://iceberg.apache.org/spec/):
real Iceberg manifests and manifest lists are Avro OCF files and the
pointer swap happens in a catalog; this sandbox has no Avro library and no
Iceberg reader to verify such bytes against, so the export serializes the
same records as JSON (one file per manifest, same record fields, same
field-id bound keys). Converting each JSON record list to Avro rows is a
mechanical serialization step; nothing about the layout's state model
needs to change — which is what `iceberg_metadata_to_layout_manifest`
proves by reconstructing a byte-identical scan plan from the export alone
(round-trip test in tests/test_round7.py).
"""

import hashlib
import json
import os

from pyspark.sql import SparkSession

from a5spark.operators import layout as _layout

# Iceberg primitive type names for the parquet/Arrow types a layout holds
_ARROW_TO_ICEBERG = {
    "int8": "int", "int16": "int", "int32": "int", "int64": "long",
    "uint8": "int", "uint16": "int", "uint32": "long", "uint64": "long",
    "float": "float", "halffloat": "float", "double": "double",
    "string": "string", "large_string": "string",
    "binary": "binary", "large_binary": "binary",
    "bool": "boolean", "date32[day]": "date",
}


def _iceberg_schema_from_parquet(data_file: str) -> list[dict]:
    import pyarrow.parquet as pq

    schema = pq.ParquetFile(data_file).schema_arrow
    fields = []
    for i, name in enumerate(schema.names):
        t = str(schema.types[i])
        itype = _ARROW_TO_ICEBERG.get(t)
        if itype is None and t.startswith("timestamp"):
            itype = "timestamptz" if "tz=" in t else "timestamp"
        fields.append(
            {
                "id": i + 1,
                "name": name,
                "required": False,
                "type": itype or "binary",
            }
        )
    return fields


def layout_to_iceberg_metadata(
    spark: SparkSession, path: str, out_dir: str | None = None
) -> dict:
    """Export every retained manifest version of the layout at `path` as
    Iceberg-model metadata under `out_dir` (default `{path}/_iceberg`):

      metadata/v{N}.metadata.json      - table metadata, snapshot log
      metadata/version-hint.text       - latest metadata version pointer
      metadata/snap-{v}.manifest-list.json
      metadata/manifest-{v}.json       - per-file entries with bounds

    Returns the table metadata dict. Timestamps are derived from the data
    files' modification times (deterministic for a given on-disk state)."""
    out_dir = out_dir or f"{path}/_iceberg"
    meta_dir = os.path.join(_layout._local_dir(out_dir) or out_dir, "metadata")
    os.makedirs(meta_dir, exist_ok=True)
    local = _layout._local_dir(path)
    if local is None:
        raise ValueError("iceberg export currently supports local paths")

    current = _layout.read_manifest(spark, path)
    if not current["files"]:
        raise ValueError(
            f"cannot export an empty layout at {path}: the manifest "
            "references no data files (no schema sample to derive field "
            "ids from)"
        )
    current_v = current.get("version", 0)
    versions = []
    for v in sorted(_layout._version_numbers(spark, path)):
        try:
            versions.append(_layout.read_manifest(spark, path, version=v))
        except Exception:
            continue  # torn entry — not a commit

    sample = os.path.join(local, current["files"][0]["file"])
    fields = _iceberg_schema_from_parquet(sample)
    key_field_id = next(
        f["id"] for f in fields if f["name"] == current["key_col"]
    )

    snapshots = []
    for m in versions:
        v = m["version"]
        ts = max(
            (
                int(os.path.getmtime(os.path.join(local, e["file"])) * 1000)
                for e in m["files"]
                if os.path.exists(os.path.join(local, e["file"]))
            ),
            default=0,
        )
        entries = [
            {
                "status": 1,  # ADDED (each snapshot lists its live files)
                "snapshot_id": v,
                "data_file": {
                    "content": 0,
                    "file_path": f"{path}/{e['file']}",
                    "file_format": "PARQUET",
                    "partition": {},
                    "record_count": e["rows"],
                    "file_size_in_bytes": e.get("bytes"),
                    "sort_order_id": 1,
                    "lower_bounds": {str(key_field_id): e["lo"]},
                    "upper_bounds": {str(key_field_id): e["hi"]},
                },
            }
            for e in m["files"]
        ]
        manifest_name = f"manifest-{v:06d}.json"
        with open(os.path.join(meta_dir, manifest_name), "w") as f:
            json.dump({"entries": entries}, f)
        mlist_name = f"snap-{v:06d}.manifest-list.json"
        with open(os.path.join(meta_dir, mlist_name), "w") as f:
            json.dump(
                [
                    {
                        "manifest_path": f"{out_dir}/metadata/{manifest_name}",
                        "manifest_length": os.path.getsize(
                            os.path.join(meta_dir, manifest_name)
                        ),
                        "partition_spec_id": 0,
                        "added_snapshot_id": v,
                        "added_files_count": len(entries),
                        "added_rows_count": sum(
                            e["data_file"]["record_count"] for e in entries
                        ),
                    }
                ],
                f,
            )
        snapshots.append(
            {
                "snapshot-id": v,
                "timestamp-ms": ts,
                "summary": {
                    "operation": "append" if v == 0 else "overwrite",
                    "total-data-files": str(len(entries)),
                    "total-records": str(
                        sum(e["data_file"]["record_count"] for e in entries)
                    ),
                },
                "manifest-list": f"{out_dir}/metadata/{mlist_name}",
                "schema-id": 0,
            }
        )

    table_uuid = hashlib.sha256(path.encode()).hexdigest()
    table_uuid = (
        f"{table_uuid[:8]}-{table_uuid[8:12]}-{table_uuid[12:16]}-"
        f"{table_uuid[16:20]}-{table_uuid[20:32]}"
    )
    metadata = {
        "format-version": 2,
        "table-uuid": table_uuid,
        "location": path,
        "last-sequence-number": current_v,
        "last-updated-ms": max((s["timestamp-ms"] for s in snapshots), default=0),
        "last-column-id": len(fields),
        "schemas": [
            {"schema-id": 0, "type": "struct", "fields": fields}
        ],
        "current-schema-id": 0,
        "partition-specs": [{"spec-id": 0, "fields": []}],
        "default-spec-id": 0,
        "last-partition-id": 999,
        "sort-orders": [
            {
                "order-id": 1,
                "fields": [
                    {
                        "transform": "identity",
                        "source-id": key_field_id,
                        "direction": "asc",
                        "null-order": "nulls-first",
                    }
                ],
            }
        ],
        "default-sort-order-id": 1,
        "properties": {
            "a5spark.cell-col": current["cell_col"],
            "a5spark.key-col": current["key_col"],
        },
        "current-snapshot-id": current_v,
        "snapshots": snapshots,
        "snapshot-log": [
            {"snapshot-id": s["snapshot-id"], "timestamp-ms": s["timestamp-ms"]}
            for s in snapshots
        ],
    }
    meta_name = f"v{current_v + 1}.metadata.json"
    with open(os.path.join(meta_dir, meta_name), "w") as f:
        json.dump(metadata, f, indent=1)
    with open(os.path.join(meta_dir, "version-hint.text"), "w") as f:
        f.write(str(current_v + 1))
    return metadata


def iceberg_metadata_to_layout_manifest(
    out_dir: str, snapshot_id: int | None = None
) -> dict:
    """Reconstruct a layout-manifest dict from exported Iceberg metadata
    alone (no access to the original _versions log) — the proof that the
    export is lossless for scan planning: the result drives
    layout._select_files / scan pruning identically to the live manifest."""
    meta_dir = os.path.join(out_dir, "metadata")
    with open(os.path.join(meta_dir, "version-hint.text")) as f:
        hint = int(f.read().strip())
    with open(os.path.join(meta_dir, f"v{hint}.metadata.json")) as f:
        metadata = json.load(f)
    sid = metadata["current-snapshot-id"] if snapshot_id is None else snapshot_id
    snap = next(
        s for s in metadata["snapshots"] if s["snapshot-id"] == sid
    )
    with open(
        os.path.join(meta_dir, os.path.basename(snap["manifest-list"]))
    ) as f:
        mlist = json.load(f)
    key_field_id = str(
        metadata["sort-orders"][0]["fields"][0]["source-id"]
    )
    key_col = next(
        fl["name"]
        for fl in metadata["schemas"][0]["fields"]
        if fl["id"] == int(key_field_id)
    )
    files = []
    for m in mlist:
        with open(
            os.path.join(meta_dir, os.path.basename(m["manifest_path"]))
        ) as f:
            manifest = json.load(f)
        for e in manifest["entries"]:
            d = e["data_file"]
            files.append(
                {
                    "file": d["file_path"].rsplit("/", 1)[-1],
                    "lo": d["lower_bounds"][key_field_id],
                    "hi": d["upper_bounds"][key_field_id],
                    "rows": d["record_count"],
                    "row_groups": None,
                    "bytes": d["file_size_in_bytes"],
                }
            )
    return {
        "key_col": key_col,
        "cell_col": metadata["properties"]["a5spark.cell-col"],
        "source": "iceberg-export",
        "version": sid,
        "files": sorted(files, key=lambda e: e["lo"]),
    }
