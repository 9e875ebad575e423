"""Data-lake table formats: Delta Lake / Iceberg / Hudi (SURVEY §2.1).

Reference engines: StorageDeltaLake / StorageIceberg / StorageHudi
(/root/reference/src/Storages/registerStorages.cpp:39-47, backed by
src/Storages/ObjectStorage/DataLakes/). ClickHouse reads these lake
layouts read-only over object storage; Spark's own connectors
(delta-spark, iceberg-spark-runtime, hudi-spark-bundle) are the
canonical implementations the reference chases, so the mapping is
"load the connector and `spark.read.format(...)`".

The sandbox ships none of the connector jars, so this module provides
(a) honest capability detection — :func:`available_lake_formats`
probes the JVM classpath, :func:`read_lake` uses the real connector
when present and raises a specific, actionable error when not — and
(b) REAL metadata-replay readers built from the PUBLIC table specs,
the same approach the reference's own C++ lake readers take:

- :func:`read_delta` replays the Delta transaction log (JSON commits
  + checkpoint parquet; adds minus removes; schema from metaData;
  partition columns restored from partitionValues; VERSION AS OF) —
  correct under deletes/updates/OPTIMIZE; round-9 adds columnMapping
  (name + id modes) AND deletion vectors (merge-on-read via the
  public DV format — Z85 + roaring bitmaps, sources/roaring.py —
  decoded executor-side; the reference refuses DV tables, so this is
  a capability superset).
- :func:`read_iceberg` replays Iceberg metadata (metadata JSON →
  manifest-list Avro → manifest Avro via sources/avro_fmt.py →
  live data files; snapshot time travel). Round-9: v2 POSITION
  deletes replay exactly, EQUALITY deletes replay for unpartitioned
  tables with strict sequence-number scoping, and parquet columns
  resolve by FIELD ID (schema evolution).
- :func:`write_delta` / :func:`write_iceberg` (round-9) write REAL
  commits/snapshots in the public layouts — the reference's lake
  storages are read-only, so the write paths are a capability
  superset.
- :func:`read_lake_fallback` remains the last-resort RAW parquet scan,
  correct ONLY for never-mutated tables, and says so.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_PROBE_CLASSES = {
    "delta": "org.apache.spark.sql.delta.sources.DeltaDataSource",
    "iceberg": "org.apache.iceberg.spark.source.IcebergSource",
    "hudi": "org.apache.hudi.DefaultSource",
}


def available_lake_formats(spark: SparkSession) -> dict[str, bool]:
    """Which lake connectors are actually loadable in this JVM."""
    out = {}
    for fmt, cls in _PROBE_CLASSES.items():
        try:
            spark._jvm.java.lang.Class.forName(cls)
            out[fmt] = True
        except Exception:
            out[fmt] = False
    return out


def read_lake(spark: SparkSession, fmt: str, path_or_table: str) -> DataFrame:
    """Read a Delta/Iceberg/Hudi table through its real connector."""
    if fmt not in _PROBE_CLASSES:
        raise ValueError(f"unknown lake format {fmt!r}; expected {sorted(_PROBE_CLASSES)}")
    if not available_lake_formats(spark).get(fmt):
        raise RuntimeError(
            f"the {fmt} connector jar is not on the Spark classpath; add it via "
            f"spark.jars.packages (e.g. delta-spark / iceberg-spark-runtime / "
            f"hudi-spark-bundle) to read {path_or_table!r}. For append-only "
            f"Delta tables, read_lake_fallback can scan the raw parquet."
        )
    return spark.read.format(fmt).load(path_or_table)


def read_lake_fallback(spark: SparkSession, path: str) -> DataFrame:
    """Raw-parquet scan of a Delta-layout directory (data files live
    next to _delta_log/). ONLY valid for append-only tables: deletes,
    updates, or OPTIMIZE leave stale files that this scan would
    double-count — the transaction log exists precisely to filter
    them, which needs the real connector."""
    return spark.read.parquet(path)


# ---------------------------------------------------------------------------
# Delta Lake WITHOUT the connector: transaction-log replay from the
# public protocol (delta.io PROTOCOL.md). The reference's
# StorageDeltaLake does exactly this replay in C++
# (src/Storages/ObjectStorage/DataLakes/DeltaLakeMetadata.cpp); Spark's
# delta-spark jar is still the preferred path when present (read_lake).
# ---------------------------------------------------------------------------


class DeltaProtocolError(RuntimeError):
    """The table needs reader features this replay doesn't implement
    (nested column mapping; reader v3 features beyond
    columnMapping/timestampNtz/deletionVectors)."""


def _delta_snapshot(path: str, version: int | None = None):
    """Replay _delta_log to (files, metadata, protocol, version).

    files: {relative_path: partitionValues} active at the version;
    metadata: the latest metaData action (schemaString etc.).
    """
    import json
    import os

    log_dir = os.path.join(path, "_delta_log")
    if not os.path.isdir(log_dir):
        raise FileNotFoundError(f"{path}: no _delta_log — not a Delta table")

    commits = sorted(
        int(f.split(".")[0])
        for f in os.listdir(log_dir)
        if f.endswith(".json") and f.split(".")[0].isdigit()
    )
    ckpt_versions = [
        int(f.split(".")[0]) for f in os.listdir(log_dir)
        if f.endswith(".checkpoint.parquet")
    ]
    if not commits and not ckpt_versions:
        raise FileNotFoundError(f"{log_dir}: no commit json files")
    # vacuumed logs: a checkpoint alone replays (round-9 writer)
    latest = max(commits[-1] if commits else -1,
                 max(ckpt_versions) if ckpt_versions else -1)
    target = latest if version is None else version
    if target not in commits:
        # the commit may be subsumed by a checkpoint; allow if ≤ max
        if version is not None and version > latest:
            raise ValueError(
                f"versionAsOf {version} > latest version {latest}")

    # newest checkpoint at or below the target version
    ckpt_version = None
    for f in os.listdir(log_dir):
        if f.endswith(".checkpoint.parquet"):
            v = int(f.split(".")[0])
            if v <= target and (ckpt_version is None or v > ckpt_version):
                ckpt_version = v

    files: dict[str, dict] = {}
    dvs: dict[str, dict] = {}  # relative path -> deletionVector descriptor
    metadata = None
    protocol = None

    def apply(action: dict):
        nonlocal metadata, protocol
        if "add" in action and action["add"]:
            a = action["add"]
            files[a["path"]] = a.get("partitionValues") or {}
            # round-9: deletion vectors replay (sources/roaring.py);
            # a re-add without a DV clears any earlier one
            dv = a.get("deletionVector")
            if dv:
                dvs[a["path"]] = dv
            else:
                dvs.pop(a["path"], None)
        elif "remove" in action and action["remove"]:
            files.pop(action["remove"]["path"], None)
            dvs.pop(action["remove"]["path"], None)
        elif "metaData" in action and action["metaData"]:
            metadata = action["metaData"]
        elif "protocol" in action and action["protocol"]:
            protocol = action["protocol"]

    if ckpt_version is not None:
        import pyarrow.parquet as pq

        def _norm(v):
            # pyarrow MAP columns round-trip as [(k, v), ...] — the
            # protocol's partitionValues/configuration are dicts
            if isinstance(v, list) and all(
                    isinstance(e, tuple) and len(e) == 2 for e in v):
                return dict(v)
            if isinstance(v, dict):
                return {k: _norm(x) for k, x in v.items() if x is not None}
            return v

        ck = pq.read_table(
            os.path.join(log_dir, f"{ckpt_version:020d}.checkpoint.parquet")
        ).to_pylist()
        for row in ck:
            apply({k: _norm(v) for k, v in row.items() if v is not None})

    start = (ckpt_version + 1) if ckpt_version is not None else commits[0]
    for v in commits:
        if v < start or v > target:
            continue
        with open(os.path.join(log_dir, f"{v:020d}.json")) as fh:
            for line in fh:
                line = line.strip()
                if line:
                    apply(json.loads(line))

    if protocol:
        mrv = protocol.get("minReaderVersion", 1)
        feats = set(protocol.get("readerFeatures") or [])
        # round-9: columnMapping is implemented (the reference reads
        # physical names too — DeltaLakeMetadata.cpp:366); reader v2
        # exists FOR column mapping, v3 gates by feature list
        unsupported = feats - {"columnMapping", "timestampNtz",
                               "deletionVectors"}
        if mrv > 3 or (mrv == 3 and unsupported):
            raise DeltaProtocolError(
                f"Delta table needs minReaderVersion={mrv} "
                f"(features {sorted(unsupported) or feats}) — needs the "
                "delta-spark connector (read_lake)")
    if metadata is None:
        raise ValueError(f"{path}: no metaData action found in the log")
    return files, dvs, metadata, protocol, target


def read_delta(
    spark: SparkSession,
    path: str,
    version: int | None = None,
    _with_positions: bool = False,
) -> DataFrame:
    """Delta snapshot read by pure transaction-log replay: adds minus
    removes from the newest checkpoint parquet (if any) + JSON commits,
    schema from metaData.schemaString, partition columns restored from
    each add's partitionValues. `version` = time travel (VERSION AS OF).
    Correct under deletes/updates/OPTIMIZE — the cases the raw-parquet
    fallback rejects. Round-9: columnMapping (name and id modes) reads
    exactly — physical-name aliasing / parquet-field-id matching, the
    same resolution the reference does (DeltaLakeMetadata.cpp:366) —
    and deletion vectors replay as merge-on-read (the reference
    refuses DV tables; see _apply_deletion_vectors)."""
    import json
    import os
    from decimal import Decimal

    from pyspark.sql import functions as F
    from pyspark.sql.types import StructType

    files, dvs, metadata, _proto, _v = _delta_snapshot(path, version)
    schema_json = json.loads(metadata["schemaString"])
    schema = StructType.fromJson(schema_json)
    part_cols = metadata.get("partitionColumns") or []

    # Column mapping (round-9; the protocol's delta.columnMapping.mode
    # — the reference resolves physical names the same way,
    # DeltaLakeMetadata.cpp:366): 'name' mode stores parquet columns
    # under physicalName (read physical, alias logical); 'id' mode
    # resolves by parquet field id (the same native field-id read path
    # as read_iceberg). Top-level columns only — nested mapped structs
    # refuse with the connector recipe.
    cm_mode = (metadata.get("configuration") or {}).get(
        "delta.columnMapping.mode", "none")
    phys_of: dict[str, str] = {}
    fid_of: dict[str, int] = {}
    if cm_mode != "none":
        for fj in schema_json.get("fields", []):
            md = fj.get("metadata") or {}
            phys_of[fj["name"]] = md.get(
                "delta.columnMapping.physicalName", fj["name"])
            if "delta.columnMapping.id" in md:
                fid_of[fj["name"]] = int(md["delta.columnMapping.id"])
            if isinstance(fj.get("type"), dict) and \
                    fj["type"].get("type") == "struct":
                raise DeltaProtocolError(
                    "column mapping over NESTED struct fields needs the "
                    "delta-spark connector (read_lake)")
    else:
        phys_of = {f.name: f.name for f in schema.fields}

    data_fields = [f for f in schema.fields if f.name not in part_cols]

    from pyspark.sql.types import StructField

    if cm_mode == "id" and all(f.name in fid_of for f in data_fields):
        # logical names directly; parquet columns matched by field id
        data_schema = StructType([
            StructField(f.name, f.dataType, True,
                        {"parquet.field.id": fid_of[f.name]})
            for f in data_fields
        ])
        rename_after = {}
    else:
        data_schema = StructType([
            StructField(phys_of.get(f.name, f.name), f.dataType, True)
            for f in data_fields
        ])
        rename_after = {
            phys_of[f.name]: f.name for f in data_fields
            if phys_of.get(f.name, f.name) != f.name
        }

    if not files:
        return spark.createDataFrame([], schema)

    # group files by partition tuple; one scan per group with literal
    # partition columns (robust even for non-hive file layouts).
    # partitionValues keys are PHYSICAL names under column mapping.
    groups: dict[tuple, list[str]] = {}
    for rel, pvals in files.items():
        key = tuple(
            (c, pvals.get(phys_of.get(c, c), pvals.get(c)))
            for c in part_cols
        )
        groups.setdefault(key, []).append(os.path.join(path, rel))

    def lit_cast(name: str, raw):
        f = schema[name]
        if raw is None:
            return F.lit(None).cast(f.dataType)
        t = f.dataType.simpleString()
        if t.startswith("decimal"):
            return F.lit(Decimal(raw)).cast(f.dataType)
        return F.lit(raw).cast(f.dataType)

    norm = lambda c: F.regexp_replace(c, "^file:/*", "/")  # noqa: E731
    meta_cols = []
    if dvs or _with_positions:
        meta_cols = [
            norm(F.col("_metadata.file_path")).alias("__dl_fp"),
            F.col("_metadata.row_index").alias("__dl_pos"),
        ]
    parts = []
    for key, paths in groups.items():
        df = spark.read.schema(data_schema).parquet(*paths)
        for phys, logical in rename_after.items():
            df = df.withColumnRenamed(phys, logical)
        for c, raw in key:
            df = df.withColumn(c, lit_cast(c, raw))
        parts.append(df.select(*[f.name for f in schema.fields], *meta_cols))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    if dvs:
        out = _apply_deletion_vectors(
            spark, out, path, dvs, keep_positions=_with_positions)
    return out


def _apply_deletion_vectors(
    spark: SparkSession, out: DataFrame, path: str, dvs: dict,
    keep_positions: bool = False,
) -> DataFrame:
    """Merge-on-read for Delta deletion vectors (round-9;
    delta.io PROTOCOL.md §Deletion Vectors): each add action's DV
    descriptor names a roaring bitmap of deleted row indices for that
    file. Descriptors ship as a tiny DataFrame; the bitmap decode
    (sources/roaring.py — Z85 + 64-bit RoaringBitmapArray portable
    format, CRC-verified) runs EXECUTOR-side in one mapInPandas pass,
    so a billion-row delete never lands on the driver; the anti-join
    on Spark's vectorized _metadata.row_index is the same one-shuffle
    shape as read_iceberg's position deletes. The reference has no DV
    read path at this snapshot (its DeltaLakeMetadata replay refuses
    such tables) — this is a capability superset.

    The storage types are the protocol's three: 'u' (UUID-named .bin
    file under the table root, Z85 uuid with optional prefix), 'p'
    (absolute path), 'i' (inline Z85 payload)."""
    import os

    from pyspark.sql import functions as F

    table_root = os.path.abspath(path)
    desc_rows = [
        (os.path.abspath(os.path.join(path, rel)),
         dv["storageType"], dv["pathOrInlineDv"],
         int(dv.get("offset") or 0), int(dv["sizeInBytes"]))
        for rel, dv in dvs.items()
    ]

    def _decode(batches):
        import pandas as pd

        from clickhouse_25_5_3_75_stable_spark.sources import roaring

        for pdf in batches:
            for fp, st, payload, off, size in pdf.itertuples(index=False):
                if st == "i":
                    # inline payloads are Z85 zero-padded to 4 bytes;
                    # sizeInBytes recovers the true length
                    positions = roaring.rbm_array_deserialize(
                        roaring.z85_decode(payload, int(size)))
                else:
                    if st == "u":
                        import uuid as _uuid

                        prefix, enc = payload[:-20], payload[-20:]
                        u = _uuid.UUID(bytes=roaring.z85_decode(enc))
                        dv_path = os.path.join(
                            table_root, prefix, f"deletion_vector_{u}.bin")
                    elif st == "p":
                        dv_path = payload
                    else:
                        raise DeltaProtocolError(
                            f"unknown DV storageType {st!r}")
                    with open(dv_path, "rb") as fh:
                        blob = fh.read()
                    positions = roaring.dv_read_at(blob, int(off))
                if positions:
                    yield pd.DataFrame({
                        "__dl_fp": fp,
                        "__dl_pos": pd.Series(positions, dtype="int64"),
                    })

    dels = (
        spark.createDataFrame(
            desc_rows,
            "__dl_fp string, st string, payload string, off long, "
            "size long")
        .repartition(min(len(desc_rows), 64))
        .mapInPandas(_decode, "__dl_fp string, __dl_pos long")
    )
    out = out.join(dels, ["__dl_fp", "__dl_pos"], "left_anti")
    return out if keep_positions else out.drop("__dl_fp", "__dl_pos")


def delta_history(spark: SparkSession, path: str) -> DataFrame:
    """DESCRIBE HISTORY analogue: one row per commit from commitInfo
    actions (version, timestamp, operation)."""
    import json
    import os

    log_dir = os.path.join(path, "_delta_log")
    rows = []
    for f in sorted(os.listdir(log_dir)):
        if not (f.endswith(".json") and f.split(".")[0].isdigit()):
            continue
        v = int(f.split(".")[0])
        op, ts = None, None
        with open(os.path.join(log_dir, f)) as fh:
            for line in fh:
                line = line.strip()
                if not line:
                    continue
                a = json.loads(line)
                ci = a.get("commitInfo")
                if ci:
                    op = ci.get("operation")
                    ts = ci.get("timestamp")
        rows.append((v, ts, op))
    return spark.createDataFrame(
        rows, "version int, timestamp long, operation string"
    )


# ---------------------------------------------------------------------------
# Iceberg WITHOUT the connector: snapshot read from the public table
# spec (iceberg.apache.org/spec — metadata JSON + Avro manifest list +
# Avro manifests), decoded with the repo's own Avro codec
# (sources/avro_fmt.py). The reference's StorageIceberg does the same
# replay (src/Storages/ObjectStorage/DataLakes/IcebergMetadata.cpp).
# ---------------------------------------------------------------------------


class IcebergProtocolError(RuntimeError):
    """Needs reader features this replay doesn't implement (delete
    files / merge-on-read)."""


_ICE_PRIM = {
    "boolean": "boolean", "int": "int", "long": "bigint", "float": "float",
    "double": "double", "date": "date", "string": "string", "uuid": "string",
    "binary": "binary", "timestamp": "timestamp_ntz",
    "timestamptz": "timestamp",
}


def _ice_type_to_spark(t) -> str:
    if isinstance(t, str):
        if t in _ICE_PRIM:
            return _ICE_PRIM[t]
        if t.startswith("decimal("):
            return t
        if t.startswith("fixed["):
            return "binary"
        raise ValueError(f"iceberg type {t!r} unsupported")
    if t.get("type") == "struct":
        inner = ", ".join(
            f"{f['name']}: {_ice_type_to_spark(f['type'])}" for f in t["fields"]
        )
        return f"struct<{inner}>"
    if t.get("type") == "list":
        return f"array<{_ice_type_to_spark(t['element'])}>"
    if t.get("type") == "map":
        return (f"map<{_ice_type_to_spark(t['key'])}, "
                f"{_ice_type_to_spark(t['value'])}>")
    raise ValueError(f"iceberg type {t!r} unsupported")


def _ice_resolve(table_path: str, uri: str) -> str:
    """Manifest/data paths are absolute URIs at write time; resolve
    against the table root when the table has been relocated."""
    import os

    p = uri
    if p.startswith("file:"):
        p = p[len("file:"):]
        while p.startswith("//"):
            p = p[1:]
    if os.path.exists(p):
        return p
    # fall back: re-root at the table directory by the path suffix
    for marker in ("/metadata/", "/data/"):
        if marker in p:
            cand = os.path.join(table_path, marker.strip("/"),
                                p.split(marker, 1)[1])
            if os.path.exists(cand):
                return cand
    raise FileNotFoundError(f"iceberg path {uri!r} not found (tried {p!r})")


def _ice_metadata(path: str, snapshot_id=None):
    import glob
    import json
    import os

    hint = os.path.join(path, "metadata", "version-hint.text")
    meta_file = None
    if os.path.exists(hint):
        v = open(hint).read().strip()
        for pat in (f"v{v}.metadata.json", f"{v}.metadata.json"):
            c = os.path.join(path, "metadata", pat)
            if os.path.exists(c):
                meta_file = c
                break
    if meta_file is None:
        cands = sorted(glob.glob(os.path.join(path, "metadata", "*.metadata.json")))
        if not cands:
            raise FileNotFoundError(f"{path}: no metadata/*.metadata.json")
        meta_file = cands[-1]
    meta = json.load(open(meta_file))
    snaps = meta.get("snapshots") or []
    sid = snapshot_id if snapshot_id is not None else meta.get("current-snapshot-id")
    snap = next((s for s in snaps if s["snapshot-id"] == sid), None)
    if snap is None:
        raise ValueError(f"{path}: snapshot {sid} not found")
    # schema: v2 'schemas' + current-schema-id, v1 'schema'
    if "schemas" in meta:
        cur = meta.get("current-schema-id", 0)
        schema = next(s for s in meta["schemas"] if s.get("schema-id", 0) == cur)
    else:
        schema = meta["schema"]
    return meta, snap, schema


def read_iceberg(
    spark: SparkSession,
    path: str,
    snapshot_id: int | None = None,
    _with_positions: bool = False,
) -> DataFrame:
    """Iceberg snapshot read by pure metadata replay: metadata JSON →
    manifest-list Avro → manifest Avro → live data files (status != 2)
    → parquet scan with the Iceberg schema. `snapshot_id` = time
    travel. Round 9: v2 merge-on-read POSITION deletes replay exactly
    (delete manifests → (file_path, pos) parquet rows → anti-join on
    Spark's vectorized `_metadata.row_index`), and EQUALITY deletes
    (content=2) replay for unpartitioned tables with exact
    sequence-number scoping (a delete removes matching rows only from
    data files STRICTLY older than it — spec v2 §Scan Planning); both
    implemented from the public Iceberg spec — a capability SUPERSET
    of the reference, which refuses all v2 deletes
    (src/Storages/ObjectStorage/DataLakes/Iceberg/ManifestFile.cpp:190).
    Partition-SCOPED equality deletes still refuse (they apply only
    within their partition; global application would over-delete)."""
    from clickhouse_25_5_3_75_stable_spark.sources.avro_fmt import (
        _decode_container,
    )

    from pyspark.sql import functions as F

    _meta, snap, schema = _ice_metadata(path, snapshot_id)
    ddl = ", ".join(
        f"{f['name']} {_ice_type_to_spark(f['type'])}"
        for f in schema["fields"]
    )

    mlist_path = _ice_resolve(path, snap["manifest-list"])
    _, mlist_rows = _decode_container(open(mlist_path, "rb").read())
    data_files: list[tuple[str, int]] = []  # (path, data sequence number)
    pos_delete_files: list[str] = []
    # (path, sequence number, tuple of equality field ids)
    eq_delete_files: list[tuple[str, int, tuple[int, ...]]] = []

    # Partition-SCOPED equality deletes apply only within their
    # partition; applying them globally would over-delete. Refuse when
    # the table is partitioned and equality deletes are present.
    partitioned = any(
        (spec.get("fields") or [])
        for spec in _meta.get("partition-specs") or []
    )

    def _scan_manifest(m):
        man_path = _ice_resolve(path, m["manifest_path"].decode()
                                if isinstance(m["manifest_path"], bytes)
                                else m["manifest_path"])
        # v2 manifest-list rows carry the manifest's sequence number,
        # inherited by ADDED entries whose own field is null (spec
        # §Sequence Number Inheritance)
        man_seq = m.get("sequence_number") or 0
        _, entries = _decode_container(open(man_path, "rb").read())
        for e in entries:
            if e["status"] == 2:  # DELETED
                continue
            df_info = e["data_file"]
            content = df_info.get("content") or 0
            fp = df_info["file_path"]
            fp = fp.decode() if isinstance(fp, bytes) else fp
            fmt = df_info.get("file_format", "PARQUET")
            fmt = fmt.decode() if isinstance(fmt, bytes) else fmt
            seq = e.get("sequence_number")
            seq = man_seq if seq is None else seq
            if fmt.upper() != "PARQUET":
                raise IcebergProtocolError(
                    f"data file format {fmt} unsupported without the connector")
            if content == 0:
                data_files.append((_ice_resolve(path, fp), seq))
            elif content == 1:
                # POSITION deletes (spec v2 §Position Delete Files:
                # rows of (file_path, pos)). A delete row names an
                # immutable data-file path, so unconditional
                # application is exact — sequence-number scoping only
                # matters for equality deletes.
                pos_delete_files.append(_ice_resolve(path, fp))
            else:
                # EQUALITY deletes (content=2; spec v2 §Equality Delete
                # Files): delete every row matching the equality_ids
                # columns in data files STRICTLY OLDER than the delete
                # (data_seq < delete_seq). Round-9: replayed exactly
                # for unpartitioned tables — a capability SUPERSET of
                # the reference, which refuses all v2 deletes
                # (DataLakes/Iceberg/ManifestFile.cpp:190).
                if partitioned:
                    raise IcebergProtocolError(
                        "partition-scoped EQUALITY deletes need the "
                        "iceberg-spark-runtime connector (read_lake)")
                ids = tuple(int(i) for i in df_info.get("equality_ids") or ())
                if not ids:
                    raise IcebergProtocolError(
                        "equality delete file without equality_ids")
                eq_delete_files.append((_ice_resolve(path, fp), seq, ids))

    for m in mlist_rows:
        _scan_manifest(m)
    if not data_files:
        return spark.createDataFrame([], ddl)

    # Schema evolution (Iceberg spec: parquet columns resolve by FIELD
    # ID, so renames are metadata-only): files that carry
    # PARQUET:field_id read through Spark's native field-id matching
    # (a StructType whose fields carry parquet.field.id metadata +
    # spark.sql.parquet.fieldId.read.enabled, set in session.py);
    # id-less files (e.g. migrated tables without a name mapping) fall
    # back to by-name resolution. The reference refuses neither nor —
    # it resolves by id via its SchemaProcessor
    # (Iceberg/SchemaProcessor cited in IcebergMetadata.h).
    import pyarrow.parquet as pq
    from pyspark.sql.types import StructField, StructType
    from pyspark.sql.types import _parse_datatype_string

    id_schema = StructType([
        StructField(
            f["name"],
            _parse_datatype_string(_ice_type_to_spark(f["type"])),
            True,
            {"parquet.field.id": int(f["id"])},
        )
        for f in schema["fields"]
    ])

    def _has_field_ids(fp: str) -> bool:
        try:
            sch = pq.read_schema(fp)
        except Exception:
            return False
        return all(
            f.metadata is not None and b"PARQUET:field_id" in f.metadata
            for f in sch
        )

    norm = lambda c: F.regexp_replace(c, "^file:/*", "/")  # noqa: E731

    def _scan(files, read_schema, seq):
        r = spark.read.schema(read_schema).parquet(*files)
        if pos_delete_files or _with_positions:
            r = r.select(
                "*",
                norm(F.col("_metadata.file_path")).alias("__ice_fp"),
                F.col("_metadata.row_index").alias("__ice_pos"),
            )
        if eq_delete_files:
            r = r.withColumn("__ice_seq", F.lit(seq).cast("long"))
        return r

    # group by (sequence number, id-vs-name resolution): one scan per
    # group — seq is constant within a group, so it rides a literal
    # column, never a per-file lookup join
    groups: dict[tuple[int, bool], list[str]] = {}
    for fp, seq in data_files:
        key = (seq if eq_delete_files else 0, _has_field_ids(fp))
        groups.setdefault(key, []).append(fp)
    parts = []
    for (seq, has_ids), files in sorted(groups.items()):
        parts.append(_scan(files, id_schema if has_ids else ddl, seq))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    if pos_delete_files:
        # merge-on-read: anti-join on (file, row position). Spark's
        # _metadata.row_index gives the exact in-file position from the
        # vectorized reader — no UDF, no per-file collect; the delete
        # set shuffles once and broadcasts when small (AQE).
        dels = (
            spark.read.parquet(*pos_delete_files)
            .select(
                norm(F.col("file_path")).alias("__ice_fp"),
                F.col("pos").cast("long").alias("__ice_pos"),
            )
        )
        out = out.join(dels, ["__ice_fp", "__ice_pos"], "left_anti")
        if not _with_positions:
            out = out.drop("__ice_fp", "__ice_pos")
    if eq_delete_files:
        # merge-on-read equality deletes: for each distinct
        # equality_ids set, one anti-join on null-safe column equality
        # plus STRICT sequence ordering (data rows older than the
        # delete). Delete sets are manifest-bounded and broadcast; each
        # data row crosses the join once.
        name_of = {int(f["id"]): f["name"] for f in schema["fields"]}
        by_ids: dict[tuple[int, ...], list[tuple[str, int]]] = {}
        for fp, seq, ids in eq_delete_files:
            by_ids.setdefault(ids, []).append((fp, seq))
        for ids, files in sorted(by_ids.items()):
            try:
                cols = [name_of[i] for i in ids]
            except KeyError as e:
                raise IcebergProtocolError(
                    f"equality_ids reference unknown field id {e}")
            dels = None
            for fp, seq in files:
                d = (
                    spark.read.parquet(fp)
                    .select(*cols)
                    .withColumn("__del_seq", F.lit(seq).cast("long"))
                )
                dels = d if dels is None else dels.unionByName(d)
            dels = dels.select(
                *[F.col(c).alias(f"__del_{c}") for c in cols], "__del_seq")
            cond = F.col("__ice_seq") < F.col("__del_seq")
            for c in cols:
                cond = cond & F.col(c).eqNullSafe(F.col(f"__del_{c}"))
            out = out.join(dels, cond, "left_anti")
        out = out.drop("__ice_seq")
    return out


def iceberg_snapshots(spark: SparkSession, path: str) -> DataFrame:
    """system.iceberg_history analogue (reference
    StorageSystemIcebergHistory.cpp): snapshot id / parent / timestamp
    / operation per table snapshot."""
    meta, _snap, _schema = _ice_metadata(path)
    rows = [
        (s["snapshot-id"], s.get("parent-snapshot-id"),
         s.get("timestamp-ms"), (s.get("summary") or {}).get("operation"))
        for s in meta.get("snapshots") or []
    ]
    return spark.createDataFrame(
        rows,
        "snapshot_id long, parent_id long, timestamp_ms long, operation string",
    )


def iceberg_history(spark: SparkSession, path: str) -> DataFrame:
    """system.iceberg_history with the REFERENCE's column set (round-8;
    src/Storages/System/StorageSystemIcebergHistory.cpp: database,
    table, made_current_at, snapshot_id, parent_id,
    is_current_ancestor) — is_current_ancestor walks the parent chain
    from the current snapshot, exactly the reference's ancestry test."""
    import datetime as dt
    import os

    meta, _snap, _schema = _ice_metadata(path)
    snaps = meta.get("snapshots") or []
    by_id = {s["snapshot-id"]: s for s in snaps}
    ancestors: set = set()
    sid = meta.get("current-snapshot-id")
    while sid in by_id:
        ancestors.add(sid)
        sid = by_id[sid].get("parent-snapshot-id")
    rows = [
        ("default", os.path.basename(path.rstrip("/")),
         dt.datetime.utcfromtimestamp(s["timestamp-ms"] / 1000.0)
         if s.get("timestamp-ms") else None,
         s["snapshot-id"], s.get("parent-snapshot-id"),
         s["snapshot-id"] in ancestors)
        for s in snaps
    ]
    return spark.createDataFrame(
        rows,
        "database string, table string, made_current_at timestamp, "
        "snapshot_id long, parent_id long, is_current_ancestor boolean",
    )


# ---------------------------------------------------------------------------
# Hudi copy-on-write WITHOUT the connector: timeline replay from the
# public layout (hudi.apache.org/docs — .hoodie/<instant>.commit
# timeline; data files named <fileId>_<writeToken>_<instantTime>.parquet;
# a snapshot is the LATEST completed file slice per file group). The
# reference's StorageHudi applies the same rule
# (src/Storages/ObjectStorage/DataLakes/HudiMetadata.cpp).
# ---------------------------------------------------------------------------


class HudiProtocolError(RuntimeError):
    pass


def read_hudi(spark: SparkSession, path: str) -> DataFrame:
    """Hudi COW snapshot read: keep, per file group (fileId), only the
    base file of the newest COMPLETED instant; older slices are
    superseded rewrites that a raw scan would double-count. Merge-on-
    read tables (log files present) refuse with the jar recipe."""
    import os
    import re

    hoodie = os.path.join(path, ".hoodie")
    if not os.path.isdir(hoodie):
        raise FileNotFoundError(f"{path}: no .hoodie — not a Hudi table")
    completed = set()
    for f in os.listdir(hoodie):
        m = re.match(r"^(\d+)\.(commit|replacecommit)$", f)
        if m:
            completed.add(m.group(1))
    if not completed:
        raise ValueError(f"{hoodie}: no completed commit instants")

    # <uuid fileId>_<writeToken>_<instantTime>.parquet
    fname_re = re.compile(r"^(?P<fid>[^_]+(?:-[^_]+)*)_(?P<tok>[^_]+)_"
                          r"(?P<instant>\d+)\.parquet$")
    best: dict[tuple, tuple[str, str]] = {}
    for dirpath, dirnames, filenames in os.walk(path):
        if ".hoodie" in dirpath:
            continue
        for f in filenames:
            if f.endswith(".log") or ".log." in f:
                raise HudiProtocolError(
                    "merge-on-read log files present — needs the "
                    "hudi-spark-bundle connector (read_lake)")
            m = fname_re.match(f)
            if not m or m.group("instant") not in completed:
                continue
            key = (dirpath, m.group("fid"))
            cur = best.get(key)
            if cur is None or m.group("instant") > cur[0]:
                best[key] = (m.group("instant"), os.path.join(dirpath, f))
    if not best:
        raise ValueError(f"{path}: no data files from completed instants")
    files = [p for _, p in best.values()]
    df = spark.read.parquet(*files)
    # Hudi meta columns travel in the files; drop them like a SELECT *
    # through the connector would not — keep parity with raw table
    # reads by dropping only when present
    meta = [c for c in df.columns if c.startswith("_hoodie_")]
    return df.drop(*meta) if meta else df


def write_delta(
    df: DataFrame,
    path: str,
    mode: str = "append",
    partition_by: list[str] | None = None,
) -> int:
    """Write a DataFrame as a Delta commit WITHOUT the connector
    (round-9; the exact inverse of read_delta's log replay, from the
    public PROTOCOL.md): data files land under the table root, then
    ONE commit json appends atomically (O_EXCL create — a concurrent
    writer of the same version fails cleanly rather than corrupting
    the log; single-writer semantics, documented). Returns the
    committed version.

    - new table: version 0 carries protocol (1/2) + metaData
      (schemaString from the Spark schema, partitionColumns)
    - mode='append': add actions only
    - mode='overwrite': remove actions for every live file + adds
    - partitioned tables: hive-style dirs; partitionValues recovered
      from the directory names (read_delta restores them as columns)

    The reference's DeltaLake storage is READ-only
    (registerStorageDeltaLake) — the write path is a capability
    superset, and it round-trips through both read_delta and the real
    delta-spark connector (same public layout)."""
    import glob as _glob
    import json
    import os
    import time
    import uuid as _uuid

    if mode not in ("append", "overwrite"):
        raise ValueError(f"write_delta mode {mode!r}: append|overwrite")
    partition_by = partition_by or []
    log_dir = os.path.join(path, "_delta_log")
    exists = os.path.isdir(log_dir)
    if exists:
        files, _dvs, metadata, _proto, version = _delta_snapshot(path)
        prev_parts = metadata.get("partitionColumns") or []
        if partition_by and partition_by != prev_parts:
            raise ValueError(
                f"table is partitioned by {prev_parts}, got {partition_by}")
        partition_by = prev_parts
        next_version = version + 1
    else:
        files, next_version = {}, 0
        os.makedirs(log_dir)

    # stage data files under a unique prefix, then move into place
    txn = _uuid.uuid4().hex[:12]
    stage = os.path.join(path, f"_staging_{txn}")
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(stage)

    adds = []
    now_ms = int(time.time() * 1000)
    for p in sorted(_glob.glob(os.path.join(stage, "**", "*.parquet"),
                               recursive=True)):
        rel_in_stage = os.path.relpath(p, stage)
        pvals = {}
        parts = rel_in_stage.split(os.sep)
        for seg in parts[:-1]:
            k, _, v = seg.partition("=")
            pvals[k] = v
        fname = f"part-{txn}-{len(adds):05d}.parquet"
        rel = os.path.join(*parts[:-1], fname) if len(parts) > 1 else fname
        dst = os.path.join(path, rel)
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        os.rename(p, dst)
        adds.append({"add": {
            "path": rel.replace(os.sep, "/"), "partitionValues": pvals,
            "size": os.path.getsize(dst), "modificationTime": now_ms,
            "dataChange": True}})
    import shutil as _shutil

    _shutil.rmtree(stage, ignore_errors=True)

    actions = [{"commitInfo": {
        "timestamp": now_ms,
        "operation": "WRITE" if mode == "append" or next_version == 0
        else "OVERWRITE",
        "operationParameters": {"mode": mode},
    }}]
    if next_version == 0:
        schema_json = json.loads(df.schema.json())
        for f in schema_json.get("fields", []):
            f.setdefault("metadata", {})
        actions.append({"protocol": {"minReaderVersion": 1,
                                     "minWriterVersion": 2}})
        actions.append({"metaData": {
            "id": _uuid.uuid4().hex, "format": {"provider": "parquet",
                                                "options": {}},
            "schemaString": json.dumps(schema_json),
            "partitionColumns": partition_by,
            "configuration": {}, "createdTime": now_ms}})
    elif mode == "overwrite":
        for rel in sorted(files):
            actions.append({"remove": {
                "path": rel, "deletionTimestamp": now_ms,
                "dataChange": True}})
    actions.extend(adds)

    commit = os.path.join(log_dir, f"{next_version:020d}.json")
    # O_EXCL: exactly one writer wins a version
    fd = os.open(commit, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    with os.fdopen(fd, "w") as fh:
        fh.write("\n".join(json.dumps(a) for a in actions) + "\n")
    return next_version


_SPARK_TO_ICE = {
    "boolean": "boolean", "int": "int", "bigint": "long", "float": "float",
    "double": "double", "date": "date", "string": "string",
    "binary": "binary", "timestamp_ntz": "timestamp",
    "timestamp": "timestamptz",
}


def write_iceberg(
    df: DataFrame,
    path: str,
    mode: str = "append",
) -> int:
    """Write a DataFrame as an Iceberg v2 snapshot WITHOUT the
    connector (round-9; the exact inverse of read_iceberg's replay,
    from the public table spec): parquet data files (with PARQUET
    field ids, so schema evolution reads back through the native
    field-id path), ONE new manifest Avro (via the repo's own codec),
    a new manifest list, a new metadata json, and version-hint.text
    last — readers following the hint atomically see either the old
    or the new complete snapshot. Returns the new snapshot id.

    append keeps prior manifests in the new manifest list; overwrite
    starts an empty one. Unpartitioned tables only (partition specs
    change file layout AND delete scoping — the connector or
    write_delta cover partitioned writes). The reference's Iceberg
    storage is READ-only — capability superset; round-trips through
    read_iceberg incl. snapshot time travel, and iceberg_history shows
    the real parent chain."""
    import json
    import os
    import time
    import uuid as _uuid

    from clickhouse_25_5_3_75_stable_spark.sources.avro_fmt import (
        _decode_container,
        _encode_container,
    )

    if mode not in ("append", "overwrite"):
        raise ValueError(f"write_iceberg mode {mode!r}: append|overwrite")

    meta_dir = os.path.join(path, "metadata")
    data_dir = os.path.join(path, "data")
    exists = os.path.isdir(meta_dir) and any(
        f.endswith(".metadata.json") for f in os.listdir(meta_dir))
    now_ms = int(time.time() * 1000)
    txn = _uuid.uuid4().hex[:12]

    ice_fields = []
    for i, f in enumerate(df.schema.fields, start=1):
        t = _SPARK_TO_ICE.get(f.dataType.simpleString())
        if t is None and f.dataType.simpleString().startswith("decimal"):
            t = f.dataType.simpleString()
        if t is None:
            raise ValueError(
                f"write_iceberg: no Iceberg mapping for column "
                f"{f.name} : {f.dataType.simpleString()}")
        ice_fields.append({"id": i, "name": f.name, "required": False,
                           "type": t})

    if exists:
        meta, snap, schema = _ice_metadata(path)
        if any((spec.get("fields") or [])
               for spec in meta.get("partition-specs") or []):
            raise ValueError(
                "write_iceberg: partitioned tables need the "
                "iceberg-spark-runtime connector")
        if [f["name"] for f in schema["fields"]] != \
                [f.name for f in df.schema.fields]:
            raise ValueError(
                f"schema mismatch: table has "
                f"{[f['name'] for f in schema['fields']]}")
        ice_fields = schema["fields"]  # keep the table's field ids
        seq = meta.get("last-sequence-number", len(meta.get("snapshots") or [])) + 1
        snap_id = max(s["snapshot-id"] for s in meta["snapshots"]) + 1
        parent_id = meta.get("current-snapshot-id")
        prev_manifests = []
        if mode == "append":
            mlist = _ice_resolve(path, snap["manifest-list"])
            _, prev_manifests = _decode_container(open(mlist, "rb").read())
    else:
        os.makedirs(meta_dir, exist_ok=True)
        os.makedirs(data_dir, exist_ok=True)
        meta = None
        seq, snap_id, parent_id, prev_manifests = 1, 1, None, []

    stage = os.path.join(path, f"_staging_{txn}")
    # withMetadata attaches the field ids column-by-column (df.to()
    # reconciles types but drops metadata); the parquet writer embeds
    # PARQUET:field_id (spark.sql.parquet.fieldId.write.enabled,
    # default on)
    out_df = df
    for f in ice_fields:
        out_df = out_df.withMetadata(
            f["name"], {"parquet.field.id": int(f["id"])})
    out_df.write.mode("overwrite").parquet(stage)
    staged = sorted(
        os.path.join(stage, f) for f in os.listdir(stage)
        if f.endswith(".parquet"))
    data_files = []
    import glob as _glob

    import pyarrow.parquet as pq

    for j, p in enumerate(staged):
        fname = f"data-{txn}-{j:05d}.parquet"
        dst = os.path.join(data_dir, fname)
        os.rename(p, dst)
        data_files.append((f"file://{os.path.abspath(dst)}",
                           pq.read_metadata(dst).num_rows))
    import shutil as _shutil

    _shutil.rmtree(stage, ignore_errors=True)

    man_schema = {
        "type": "record", "name": "manifest_entry", "fields": [
            {"name": "status", "type": "int"},
            {"name": "sequence_number", "type": ["null", "long"]},
            {"name": "data_file", "type": {
                "type": "record", "name": "r2", "fields": [
                    {"name": "content", "type": "int"},
                    {"name": "file_path", "type": "string"},
                    {"name": "file_format", "type": "string"},
                    {"name": "record_count", "type": "long"},
                ]}},
        ]}
    mlist_schema = {
        "type": "record", "name": "manifest_file", "fields": [
            {"name": "manifest_path", "type": "string"},
            {"name": "manifest_length", "type": "long"},
            {"name": "content", "type": "int"},
            {"name": "sequence_number", "type": "long"},
        ]}
    man_rel = f"m-{txn}.avro"
    man_abs = os.path.join(meta_dir, man_rel)
    open(man_abs, "wb").write(_encode_container(
        [{"status": 1, "sequence_number": seq,
          "data_file": {"content": 0, "file_path": fp,
                        "file_format": "PARQUET", "record_count": n}}
         for fp, n in data_files], man_schema))

    mlist_rows = [dict(m) for m in prev_manifests]
    mlist_rows.append({
        "manifest_path": f"file://{os.path.abspath(man_abs)}",
        "manifest_length": os.path.getsize(man_abs),
        "content": 0, "sequence_number": seq})
    mlist_rel = f"ml-{txn}.avro"
    open(os.path.join(meta_dir, mlist_rel), "wb").write(
        _encode_container(mlist_rows, mlist_schema))

    snapshot = {
        "snapshot-id": snap_id, "timestamp-ms": now_ms,
        "sequence-number": seq,
        "manifest-list":
            f"file://{os.path.abspath(os.path.join(meta_dir, mlist_rel))}",
        "summary": {"operation":
                    "append" if mode == "append" else "overwrite"},
    }
    if parent_id is not None:
        snapshot["parent-snapshot-id"] = parent_id
    if meta is None:
        new_meta = {
            "format-version": 2, "table-uuid": _uuid.uuid4().hex,
            "location": f"file://{os.path.abspath(path)}",
            "last-sequence-number": seq,
            "schemas": [{"schema-id": 0, "type": "struct",
                         "fields": ice_fields}],
            "current-schema-id": 0,
            "partition-specs": [{"spec-id": 0, "fields": []}],
            "default-spec-id": 0,
            "snapshots": [snapshot], "current-snapshot-id": snap_id,
        }
        new_v = 1
    else:
        new_meta = dict(meta)
        new_meta["last-sequence-number"] = seq
        new_meta["snapshots"] = list(meta.get("snapshots") or []) + [snapshot]
        new_meta["current-snapshot-id"] = snap_id
        versions = [
            int(f[1:].split(".")[0])
            for f in os.listdir(meta_dir)
            if f.endswith(".metadata.json") and f.startswith("v")
            and f[1:].split(".")[0].isdigit()
        ]
        new_v = (max(versions) + 1) if versions else 1
    json.dump(new_meta, open(
        os.path.join(meta_dir, f"v{new_v}.metadata.json"), "w"))
    # the hint write is the atomic publish point
    with open(os.path.join(meta_dir, "version-hint.text"), "w") as fh:
        fh.write(str(new_v))
    return snap_id


# CLI lake-table registry (round-9): CREATE TABLE t ENGINE =
# DeltaLake('p')/Iceberg('p')/Hudi('p') attaches here; SELECT reads
# the refreshed replay view, INSERT INTO appends via the write path.
LAKE_TABLES: dict[str, tuple[str, str]] = {}  # name -> (fmt, path)

_LAKE_READERS = {
    "delta": lambda spark, p: read_delta(spark, p),
    "iceberg": lambda spark, p: read_iceberg(spark, p),
}


def attach_lake_table(spark: SparkSession, name: str, fmt: str,
                      path: str) -> None:
    """Register `name` as a live view over the lake table at `path`
    (metadata replay at attach time; refresh_lake_table re-replays
    after writes)."""
    if fmt == "hudi":
        df = read_hudi(spark, path)
    else:
        df = _LAKE_READERS[fmt](spark, path)
    df.createOrReplaceTempView(name)
    LAKE_TABLES[name] = (fmt, path)


def refresh_lake_table(spark: SparkSession, name: str) -> None:
    fmt, path = LAKE_TABLES[name]
    attach_lake_table(spark, name, fmt, path)


def detach_lake_table(spark: SparkSession, name: str) -> bool:
    if name not in LAKE_TABLES:
        return False
    del LAKE_TABLES[name]
    try:
        spark.catalog.dropTempView(name)
    except Exception:
        pass
    return True


def checkpoint_delta(path: str) -> int:
    """Write a Delta CHECKPOINT for the current version (round-9;
    PROTOCOL.md §Checkpoints): one parquet file
    `<v>.checkpoint.parquet` holding the reconciled snapshot state —
    protocol + metaData + one add row per live file (partitionValues
    and any deletionVector preserved) — plus `_last_checkpoint`.
    Replay cost drops from O(commits) json parses to one parquet read
    + the tail commits: the scale lever for long-lived tables. Earlier
    commit jsons MAY then be vacuumed; read_delta replays
    checkpoint-only logs. Returns the checkpointed version."""
    import json
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    files, dvs, metadata, protocol, version = _delta_snapshot(path)
    dv_type = pa.struct([
        ("storageType", pa.string()), ("pathOrInlineDv", pa.string()),
        ("offset", pa.int64()), ("sizeInBytes", pa.int64()),
        ("cardinality", pa.int64()),
    ])
    schema = pa.schema([
        ("protocol", pa.struct([
            ("minReaderVersion", pa.int32()),
            ("minWriterVersion", pa.int32()),
            ("readerFeatures", pa.list_(pa.string())),
            ("writerFeatures", pa.list_(pa.string())),
        ])),
        ("metaData", pa.struct([
            ("id", pa.string()), ("schemaString", pa.string()),
            ("partitionColumns", pa.list_(pa.string())),
            ("configuration", pa.map_(pa.string(), pa.string())),
        ])),
        ("add", pa.struct([
            ("path", pa.string()),
            ("partitionValues", pa.map_(pa.string(), pa.string())),
            ("size", pa.int64()), ("modificationTime", pa.int64()),
            ("dataChange", pa.bool_()),
            ("deletionVector", dv_type),
        ])),
    ])
    rows = []
    if protocol:
        rows.append({"protocol": {
            "minReaderVersion": protocol.get("minReaderVersion", 1),
            "minWriterVersion": protocol.get("minWriterVersion", 2),
            "readerFeatures": protocol.get("readerFeatures"),
            "writerFeatures": protocol.get("writerFeatures"),
        }})
    rows.append({"metaData": {
        "id": metadata.get("id", ""),
        "schemaString": metadata["schemaString"],
        "partitionColumns": metadata.get("partitionColumns") or [],
        "configuration": list(
            (metadata.get("configuration") or {}).items()),
    }})
    for rel in sorted(files):
        dv = dvs.get(rel)
        rows.append({"add": {
            "path": rel, "partitionValues": list(files[rel].items()),
            "size": 0, "modificationTime": 0, "dataChange": True,
            "deletionVector": {
                "storageType": dv["storageType"],
                "pathOrInlineDv": dv["pathOrInlineDv"],
                "offset": int(dv.get("offset") or 0),
                "sizeInBytes": int(dv["sizeInBytes"]),
                "cardinality": int(dv.get("cardinality") or 0),
            } if dv else None,
        }})
    log_dir = os.path.join(path, "_delta_log")
    pq.write_table(
        pa.Table.from_pylist(rows, schema=schema),
        os.path.join(log_dir, f"{version:020d}.checkpoint.parquet"))
    json.dump({"version": version, "size": len(rows)},
              open(os.path.join(log_dir, "_last_checkpoint"), "w"))
    return version


def delete_delta(spark: SparkSession, path: str, predicate: str) -> int:
    """Lightweight DELETE on a Delta table via DELETION VECTORS
    (round-9; the Delta-native analogue of the reference's lightweight
    DELETE — MutationsInterpreter's _row_exists mask — using the same
    public DV format read_delta replays): rows matching `predicate`
    (a Spark SQL boolean over the table's columns) are marked deleted
    WITHOUT rewriting data files. Per affected file, matching row
    positions merge with any existing DV and serialize into a
    `deletion_vector_<uuid>.bin` (roaring portable + CRC framing); one
    commit re-adds the file with the new descriptor (remove+add pair).
    Returns the committed version.

    Scale shape: the position scan is the normal distributed read with
    `_metadata.row_index`; per-file positions aggregate executor-side
    and only O(affected files) descriptor rows reach the driver —
    bounded like every other lake-commit path. (Bitmap serialization
    happens where the groups land; files are on shared storage by the
    same contract as the data itself.)"""
    import json
    import os
    import time

    files, dvs, metadata, protocol, version = _delta_snapshot(path)
    live = read_delta(spark, path, _with_positions=True)
    matches = live.filter(predicate)

    abs_path = os.path.abspath(path)
    old_dvs = {
        os.path.abspath(os.path.join(path, rel)): dv
        for rel, dv in dvs.items()
    }

    def _write_dv(pdf):
        # one group per affected data file, executed on the executor
        # that received the group: positions merge with any existing
        # DV, serialize, and land as a new .bin; only the descriptor
        # row returns
        import os as _os
        import uuid as _u

        import pandas as _pd

        from clickhouse_25_5_3_75_stable_spark.sources import roaring

        fp = pdf["__dl_fp"].iloc[0]
        positions = set(int(x) for x in pdf["__dl_pos"])
        old_dv = old_dvs.get(fp)
        if old_dv:
            if old_dv["storageType"] == "i":
                positions |= set(roaring.rbm_array_deserialize(
                    roaring.z85_decode(old_dv["pathOrInlineDv"],
                                       int(old_dv["sizeInBytes"]))))
            else:
                if old_dv["storageType"] == "u":
                    enc = old_dv["pathOrInlineDv"]
                    prefix, enc = enc[:-20], enc[-20:]
                    uu = _u.UUID(bytes=roaring.z85_decode(enc))
                    dv_path = _os.path.join(
                        abs_path, prefix, f"deletion_vector_{uu}.bin")
                else:
                    dv_path = old_dv["pathOrInlineDv"]
                with open(dv_path, "rb") as fh:
                    positions |= set(roaring.dv_read_at(
                        fh.read(), int(old_dv.get("offset") or 0)))
        data = roaring.rbm_array_serialize(sorted(positions))
        blob, offsets = roaring.dv_file_blob([data])
        uu = _u.uuid4()
        with open(_os.path.join(abs_path, f"deletion_vector_{uu}.bin"),
                  "wb") as fh:
            fh.write(blob)
        return _pd.DataFrame([{
            "fp": fp, "dv_b85": roaring.z85_encode(uu.bytes),
            "offset": offsets[0], "size": len(data),
            "cardinality": len(positions)}])

    per_file = (
        matches.select("__dl_fp", "__dl_pos")
        .groupBy("__dl_fp")
        .applyInPandas(
            _write_dv,
            "fp string, dv_b85 string, offset long, size long, "
            "cardinality long")
        .collect()
    )
    if not per_file:
        return version  # nothing to do; no empty commit

    abs_of = {
        os.path.abspath(os.path.join(path, rel)): rel for rel in files
    }
    now_ms = int(time.time() * 1000)
    actions = [{"commitInfo": {
        "timestamp": now_ms, "operation": "DELETE",
        "operationParameters": {"predicate": predicate}}}]
    # the table may predate DV support: upgrade the protocol in-commit
    feats = set((protocol or {}).get("readerFeatures") or [])
    if (protocol or {}).get("minReaderVersion", 1) < 3 or \
            "deletionVectors" not in feats:
        actions.append({"protocol": {
            "minReaderVersion": 3, "minWriterVersion": 7,
            "readerFeatures": sorted(feats | {"deletionVectors"}),
            "writerFeatures": sorted(
                set((protocol or {}).get("writerFeatures") or [])
                | {"deletionVectors"})}})

    for row in per_file:
        rel = abs_of.get(row["fp"])
        if rel is None:
            raise RuntimeError(f"unknown data file {row['fp']}")
        dv = {"storageType": "u", "pathOrInlineDv": row["dv_b85"],
              "offset": int(row["offset"]), "sizeInBytes": int(row["size"]),
              "cardinality": int(row["cardinality"])}
        actions.append({"remove": {
            "path": rel, "deletionTimestamp": now_ms, "dataChange": True}})
        actions.append({"add": {
            "path": rel, "partitionValues": files[rel],
            "size": os.path.getsize(os.path.join(path, rel)),
            "modificationTime": now_ms, "dataChange": True,
            "deletionVector": dv}})

    commit = os.path.join(path, "_delta_log", f"{version + 1:020d}.json")
    fd = os.open(commit, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    with os.fdopen(fd, "w") as fh:
        fh.write("\n".join(json.dumps(a) for a in actions) + "\n")
    return version + 1


def update_delta(
    spark: SparkSession,
    path: str,
    predicate: str,
    assignments: dict[str, str],
) -> int:
    """UPDATE on a Delta table, copy-on-write (round-9; the lake
    analogue of the reference's ALTER TABLE ... UPDATE mutation —
    MutationsInterpreter rewrites parts, this rewrites exactly the
    affected files): files containing matching rows are re-written
    with each assignment applied as CASE WHEN predicate THEN expr
    ELSE old END (post-DV rows, so prior lightweight deletes hold);
    untouched files stay in place. One commit: removes for the
    rewritten files + adds for their replacements. Returns the
    committed version.

    Scale shape: only affected files rewrite (the distinct-file list
    is manifest-bounded); the rewrite is a normal distributed write of
    those files' rows."""
    import glob as _glob
    import json
    import os
    import shutil as _shutil
    import time
    import uuid as _uuid

    from pyspark.sql import functions as F

    files, _dvs, metadata, _protocol, version = _delta_snapshot(path)
    part_cols = metadata.get("partitionColumns") or []
    live = read_delta(spark, path, _with_positions=True)
    affected = [
        r[0] for r in
        live.filter(predicate).select("__dl_fp").distinct().collect()
    ]
    if not affected:
        return version
    abs_of = {os.path.abspath(os.path.join(path, rel)): rel for rel in files}
    rel_affected = []
    for fp in affected:
        rel = abs_of.get(fp)
        if rel is None:
            raise RuntimeError(f"unknown data file {fp}")
        rel_affected.append(rel)

    rows = live.filter(F.col("__dl_fp").isin(*affected))
    updated = rows
    pred_c = F.expr(predicate)
    for col, expr in assignments.items():
        if col not in live.columns:
            raise ValueError(f"UPDATE: unknown column {col!r}")
        updated = updated.withColumn(
            col, F.when(pred_c, F.expr(expr)).otherwise(F.col(col)))
    updated = updated.drop("__dl_fp", "__dl_pos")

    txn = _uuid.uuid4().hex[:12]
    stage = os.path.join(path, f"_staging_{txn}")
    writer = updated.write.mode("overwrite")
    if part_cols:
        writer = writer.partitionBy(*part_cols)
    writer.parquet(stage)

    now_ms = int(time.time() * 1000)
    actions = [{"commitInfo": {
        "timestamp": now_ms, "operation": "UPDATE",
        "operationParameters": {"predicate": predicate}}}]
    for rel in sorted(rel_affected):
        actions.append({"remove": {
            "path": rel, "deletionTimestamp": now_ms, "dataChange": True}})
    for p in sorted(_glob.glob(os.path.join(stage, "**", "*.parquet"),
                               recursive=True)):
        rel_in_stage = os.path.relpath(p, stage)
        parts = rel_in_stage.split(os.sep)
        pvals = {}
        for seg in parts[:-1]:
            k, _, v = seg.partition("=")
            pvals[k] = v
        fname = f"part-{txn}-{len(actions):05d}.parquet"
        rel = os.path.join(*parts[:-1], fname) if len(parts) > 1 else fname
        dst = os.path.join(path, rel)
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        os.rename(p, dst)
        actions.append({"add": {
            "path": rel.replace(os.sep, "/"), "partitionValues": pvals,
            "size": os.path.getsize(dst), "modificationTime": now_ms,
            "dataChange": True}})
    _shutil.rmtree(stage, ignore_errors=True)

    commit = os.path.join(path, "_delta_log", f"{version + 1:020d}.json")
    fd = os.open(commit, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    with os.fdopen(fd, "w") as fh:
        fh.write("\n".join(json.dumps(a) for a in actions) + "\n")
    return version + 1


def optimize_delta(spark: SparkSession, path: str) -> int:
    """OPTIMIZE (compaction) for a Delta table (round-9; the lake
    analogue of the reference's OPTIMIZE TABLE FINAL part rewrite):
    every live file rewrites into a compacted set — deletion vectors
    MATERIALIZE (deleted rows drop from the data files and the new
    adds carry no DVs), small files merge through the normal
    distributed write. One commit: removes for every old file + adds
    for the compacted set (dataChange false — no logical rows change,
    so incremental consumers skip it). Returns the committed version."""
    import glob as _glob
    import json
    import os
    import shutil as _shutil
    import time
    import uuid as _uuid

    files, _dvs, metadata, _protocol, version = _delta_snapshot(path)
    if not files:
        return version
    part_cols = metadata.get("partitionColumns") or []
    live = read_delta(spark, path)

    txn = _uuid.uuid4().hex[:12]
    stage = os.path.join(path, f"_staging_{txn}")
    writer = live.write.mode("overwrite")
    if part_cols:
        writer = writer.partitionBy(*part_cols)
    writer.parquet(stage)

    now_ms = int(time.time() * 1000)
    actions = [{"commitInfo": {
        "timestamp": now_ms, "operation": "OPTIMIZE",
        "operationParameters": {}}}]
    for rel in sorted(files):
        actions.append({"remove": {
            "path": rel, "deletionTimestamp": now_ms, "dataChange": False}})
    for p in sorted(_glob.glob(os.path.join(stage, "**", "*.parquet"),
                               recursive=True)):
        rel_in_stage = os.path.relpath(p, stage)
        parts = rel_in_stage.split(os.sep)
        pvals = {}
        for seg in parts[:-1]:
            k, _, v = seg.partition("=")
            pvals[k] = v
        fname = f"part-{txn}-{len(actions):05d}.parquet"
        rel = os.path.join(*parts[:-1], fname) if len(parts) > 1 else fname
        dst = os.path.join(path, rel)
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        os.rename(p, dst)
        actions.append({"add": {
            "path": rel.replace(os.sep, "/"), "partitionValues": pvals,
            "size": os.path.getsize(dst), "modificationTime": now_ms,
            "dataChange": False}})
    _shutil.rmtree(stage, ignore_errors=True)

    commit = os.path.join(path, "_delta_log", f"{version + 1:020d}.json")
    fd = os.open(commit, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    with os.fdopen(fd, "w") as fh:
        fh.write("\n".join(json.dumps(a) for a in actions) + "\n")
    return version + 1


def vacuum_delta(path: str, dry_run: bool = False) -> list[str]:
    """VACUUM: delete data/DV files no longer referenced by the
    CURRENT snapshot (round-9; the delta-spark maintenance op —
    time travel to versions whose files are vacuumed stops working,
    which is the documented contract there too). Never touches
    _delta_log. Returns the deleted (or would-delete) relative
    paths."""
    import os

    files, dvs, _meta, _proto, _v = _delta_snapshot(path)
    live = {os.path.normpath(rel) for rel in files}
    live_dv_files = set()
    for dv in dvs.values():
        if dv["storageType"] == "u":
            import uuid as _uuid

            from clickhouse_25_5_3_75_stable_spark.sources.roaring import (
                z85_decode,
            )

            enc = dv["pathOrInlineDv"]
            prefix, enc20 = enc[:-20], enc[-20:]
            u = _uuid.UUID(bytes=z85_decode(enc20))
            live_dv_files.add(os.path.normpath(
                os.path.join(prefix, f"deletion_vector_{u}.bin")))
        elif dv["storageType"] == "p":
            live_dv_files.add(os.path.normpath(
                os.path.relpath(dv["pathOrInlineDv"], os.path.abspath(path))))

    doomed = []
    for root, dirs, names in os.walk(path):
        dirs[:] = [d for d in dirs
                   if d != "_delta_log" and not d.startswith("_staging_")]
        for n in names:
            rel = os.path.normpath(
                os.path.relpath(os.path.join(root, n), path))
            if rel in live or rel in live_dv_files:
                continue
            if n.endswith(".parquet") or n.startswith("deletion_vector_"):
                doomed.append(rel)
    if not dry_run:
        for rel in doomed:
            os.remove(os.path.join(path, rel))
        # prune now-empty partition dirs
        for root, dirs, names in os.walk(path, topdown=False):
            if root != path and not dirs and not names \
                    and "_delta_log" not in root:
                os.rmdir(root)
    return sorted(doomed)


def delete_iceberg(spark: SparkSession, path: str, predicate: str) -> int:
    """Lightweight DELETE on an Iceberg v2 table via POSITION-delete
    files (round-9; the Iceberg side of the lake-DML symmetry with
    delete_delta): matching rows' (file_path, pos) pairs write to a
    position-delete parquet, registered through a delete manifest
    (content=1) in a new snapshot — no data-file rewrite; read_iceberg
    replays it with the vectorized row_index anti-join. Returns the
    new snapshot id. Unpartitioned tables (the write_iceberg
    contract)."""
    import json
    import os
    import time
    import uuid as _uuid

    import pyarrow as pa
    import pyarrow.parquet as pq

    from pyspark.sql import functions as F

    from clickhouse_25_5_3_75_stable_spark.sources.avro_fmt import (
        _decode_container,
        _encode_container,
    )

    meta, snap, _schema = _ice_metadata(path)
    if any((spec.get("fields") or [])
           for spec in meta.get("partition-specs") or []):
        raise ValueError(
            "delete_iceberg: partitioned tables need the connector")
    live = read_iceberg(spark, path, _with_positions=True)
    matches = (
        live.filter(predicate)
        .select(
            F.concat(F.lit("file://"), F.col("__ice_fp")).alias("file_path"),
            F.col("__ice_pos").cast("long").alias("pos"))
        .orderBy("file_path", "pos")
        .collect()
    )
    cur_snap_id = snap["snapshot-id"]
    if not matches:
        return cur_snap_id

    now_ms = int(time.time() * 1000)
    txn = _uuid.uuid4().hex[:12]
    meta_dir = os.path.join(path, "metadata")
    data_dir = os.path.join(path, "data")
    del_rel = f"del-{txn}.parquet"
    pq.write_table(
        pa.Table.from_pylist(
            [{"file_path": r["file_path"], "pos": r["pos"]}
             for r in matches],
            schema=pa.schema([("file_path", pa.string()),
                              ("pos", pa.int64())])),
        os.path.join(data_dir, del_rel))

    seq = meta.get("last-sequence-number",
                   len(meta.get("snapshots") or [])) + 1
    snap_id = max(s["snapshot-id"] for s in meta["snapshots"]) + 1

    man_schema = {
        "type": "record", "name": "manifest_entry", "fields": [
            {"name": "status", "type": "int"},
            {"name": "sequence_number", "type": ["null", "long"]},
            {"name": "data_file", "type": {
                "type": "record", "name": "r2", "fields": [
                    {"name": "content", "type": "int"},
                    {"name": "file_path", "type": "string"},
                    {"name": "file_format", "type": "string"},
                    {"name": "record_count", "type": "long"},
                ]}},
        ]}
    mlist_schema = {
        "type": "record", "name": "manifest_file", "fields": [
            {"name": "manifest_path", "type": "string"},
            {"name": "manifest_length", "type": "long"},
            {"name": "content", "type": "int"},
            {"name": "sequence_number", "type": "long"},
        ]}
    man_rel = f"m-del-{txn}.avro"
    man_abs = os.path.join(meta_dir, man_rel)
    open(man_abs, "wb").write(_encode_container(
        [{"status": 1, "sequence_number": seq,
          "data_file": {
              "content": 1,
              "file_path":
                  f"file://{os.path.abspath(os.path.join(data_dir, del_rel))}",
              "file_format": "PARQUET", "record_count": len(matches)}}],
        man_schema))

    mlist_path = _ice_resolve(path, snap["manifest-list"])
    _, prev_manifests = _decode_container(open(mlist_path, "rb").read())
    rows = [dict(m) for m in prev_manifests]
    for m in rows:
        m.setdefault("sequence_number", 0)
    rows.append({
        "manifest_path": f"file://{os.path.abspath(man_abs)}",
        "manifest_length": os.path.getsize(man_abs),
        "content": 1, "sequence_number": seq})
    mlist_rel = f"ml-{txn}.avro"
    open(os.path.join(meta_dir, mlist_rel), "wb").write(
        _encode_container(rows, mlist_schema))

    new_meta = dict(meta)
    new_meta["last-sequence-number"] = seq
    new_meta["snapshots"] = list(meta.get("snapshots") or []) + [{
        "snapshot-id": snap_id, "parent-snapshot-id": cur_snap_id,
        "timestamp-ms": now_ms, "sequence-number": seq,
        "manifest-list":
            f"file://{os.path.abspath(os.path.join(meta_dir, mlist_rel))}",
        "summary": {"operation": "delete"},
    }]
    new_meta["current-snapshot-id"] = snap_id
    versions = [
        int(f[1:].split(".")[0]) for f in os.listdir(meta_dir)
        if f.endswith(".metadata.json") and f.startswith("v")
        and f[1:].split(".")[0].isdigit()
    ]
    new_v = (max(versions) + 1) if versions else 1
    json.dump(new_meta, open(
        os.path.join(meta_dir, f"v{new_v}.metadata.json"), "w"))
    with open(os.path.join(meta_dir, "version-hint.text"), "w") as fh:
        fh.write(str(new_v))
    return snap_id


def merge_delta(
    spark: SparkSession,
    path: str,
    source: DataFrame,
    on: list[str],
    update: dict[str, str] | None = None,
    insert: bool = True,
    delete_matched: bool = False,
) -> int:
    """MERGE (upsert) into a Delta table, copy-on-write (round-9; the
    delta-spark MERGE INTO verb — the reference has no lake DML at
    all): rows of `source` matching target rows on the `on` key
    columns either UPDATE them (each assignment evaluated with source
    columns visible as src_<name>) or DELETE them
    (delete_matched=True); unmatched source rows INSERT
    (insert=True). Exactly the affected target files rewrite; inserts
    append. One commit. Returns the committed version.

    Semantics guard: more than one source row matching the same target
    row raises (the delta-spark multiple-matches error)."""
    import glob as _glob
    import json
    import os
    import shutil as _shutil
    import time
    import uuid as _uuid

    from pyspark.sql import functions as F

    if update and delete_matched:
        raise ValueError("merge_delta: update and delete_matched are "
                         "mutually exclusive")
    files, _dvs, metadata, _protocol, version = _delta_snapshot(path)
    part_cols = metadata.get("partitionColumns") or []
    live = read_delta(spark, path, _with_positions=True)
    data_cols = [c for c in live.columns
                 if c not in ("__dl_fp", "__dl_pos")]
    src = source.select(
        *[F.col(c).alias(f"src_{c}") for c in source.columns],
        F.lit(1).alias("__src_matched"))
    cond = None
    for k in on:
        c = F.col(k).eqNullSafe(F.col(f"src_{k}"))
        cond = c if cond is None else cond & c

    # duplicate-match guard (the delta-spark error): any target row
    # matched by >1 source row is ambiguous
    dup = (
        live.join(src, cond, "inner")
        .groupBy("__dl_fp", "__dl_pos").count()
        .filter(F.col("count") > 1).limit(1).collect()
    )
    if dup:
        raise ValueError(
            "merge_delta: a target row matches multiple source rows")

    matched = live.join(src, cond, "inner")
    affected = [r[0] for r in
                matched.select("__dl_fp").distinct().collect()]
    inserts = (src.join(live, cond, "left_anti")
               .select(*[F.col(f"src_{c}").alias(c) for c in source.columns])
               if insert else None)
    if not affected and (inserts is None or not inserts.head(1)):
        return version

    abs_of = {os.path.abspath(os.path.join(path, rel)): rel
              for rel in files}
    rel_affected = [abs_of[fp] for fp in affected]

    txn = _uuid.uuid4().hex[:12]
    now_ms = int(time.time() * 1000)
    actions = [{"commitInfo": {
        "timestamp": now_ms, "operation": "MERGE",
        "operationParameters": {"on": ",".join(on)}}}]

    def _stage_out(df, tag):
        stage = os.path.join(path, f"_staging_{txn}{tag}")
        w = df.write.mode("overwrite")
        if part_cols:
            w = w.partitionBy(*part_cols)
        w.parquet(stage)
        for p in sorted(_glob.glob(os.path.join(stage, "**", "*.parquet"),
                                   recursive=True)):
            parts = os.path.relpath(p, stage).split(os.sep)
            pvals = {}
            for seg in parts[:-1]:
                k, _, v = seg.partition("=")
                pvals[k] = v
            fname = f"part-{txn}{tag}-{len(actions):05d}.parquet"
            rel = (os.path.join(*parts[:-1], fname)
                   if len(parts) > 1 else fname)
            dst = os.path.join(path, rel)
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            os.rename(p, dst)
            actions.append({"add": {
                "path": rel.replace(os.sep, "/"), "partitionValues": pvals,
                "size": os.path.getsize(dst), "modificationTime": now_ms,
                "dataChange": True}})
        _shutil.rmtree(stage, ignore_errors=True)

    if affected:
        rows = live.filter(F.col("__dl_fp").isin(*affected)) \
                   .join(src, cond, "left")
        # NULL-key-safe match marker (eqNullSafe can match NULL keys,
        # where src_<key> IS NULL would misclassify)
        match_flag = F.col("__src_matched").isNotNull()
        if delete_matched:
            out = rows.filter(~match_flag).select(*data_cols)
        else:
            out = rows
            for col, expr in (update or {}).items():
                if col not in data_cols:
                    raise ValueError(f"merge update: unknown column {col!r}")
                out = out.withColumn(
                    col, F.when(match_flag, F.expr(expr))
                    .otherwise(F.col(col)))
            out = out.select(*data_cols)
        for rel in sorted(rel_affected):
            actions.append({"remove": {
                "path": rel, "deletionTimestamp": now_ms,
                "dataChange": True}})
        _stage_out(out, "m")
    if inserts is not None:
        missing = [c for c in data_cols if c not in source.columns]
        if missing:
            raise ValueError(
                f"merge insert: source lacks target columns {missing}")
        ins = inserts.select(*data_cols)
        if ins.head(1):
            _stage_out(ins, "i")

    commit = os.path.join(path, "_delta_log", f"{version + 1:020d}.json")
    fd = os.open(commit, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    with os.fdopen(fd, "w") as fh:
        fh.write("\n".join(json.dumps(a) for a in actions) + "\n")
    return version + 1
