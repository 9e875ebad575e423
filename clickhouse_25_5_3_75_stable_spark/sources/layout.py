"""MergeTree-style table layout: sorted, partitioned parquet writes.

The reference's read performance rests on its storage layout: parts
sorted by primary key (PK-range pruning via KeyCondition,
/root/reference/src/Storages/MergeTree/KeyCondition.h:51), partition
directories pruned by the partition key (PartitionPruner.h:13), and
8192-row index marks (MergeTreeSettings.cpp:66). The Spark analogue,
applied at write time:

- ``partitionBy`` on a coarse key → directory-level partition pruning;
- ``sortWithinPartitions`` on the PK analogue → parquet row-group
  min/max stats become tight, so predicate pushdown skips row groups
  exactly like PK marks;
- file sizing via ``maxRecordsPerFile`` ≈ parts; row-group size ≈
  index granularity.

At 100 TB this is the difference between "scan everything" and "read
3 of 40,000 files": the same contract as a MergeTree ORDER BY/
PARTITION BY declaration, enforced by one distributed sort at write.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_mergetree_layout(
    df: DataFrame,
    path: str,
    order_by: Sequence[str],
    partition_by: Sequence[str] = (),
    max_records_per_file: int = 1_000_000,
    codec: str = "zstd",
    token_index_cols: Sequence[str] = (),
) -> None:
    """CREATE TABLE ... ENGINE=MergeTree ORDER BY ... PARTITION BY ...
    as a write-time layout contract. ``token_index_cols`` builds the
    tokenbf-analogue sidecar per text column after the data lands
    (reference: INDEX ... TYPE tokenbf_v1 is maintained at part-write
    time too — sources/text_index.py)."""
    out = df
    if partition_by:
        out = out.repartition(*[out[c] for c in partition_by])
    out = out.sortWithinPartitions(*order_by)
    writer = (
        out.write.mode("overwrite")
        .option("compression", codec)
        .option("maxRecordsPerFile", max_records_per_file)
    )
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)
    if token_index_cols:
        from clickhouse_25_5_3_75_stable_spark.sources.text_index import (
            build_token_index,
            default_index_path,
        )

        for col in token_index_cols:
            build_token_index(
                df.sparkSession, path, col, default_index_path(path, col)
            )


def read_table(spark: SparkSession, path: str) -> DataFrame:
    """Read a layout-written table; partition columns come back as
    directory-derived columns, pruned by any equality/range filter."""
    return spark.read.parquet(path)


# ---------------------------------------------------------------------------
# Partition manipulation (reference ALTER TABLE ... DETACH/ATTACH/DROP
# PARTITION, src/Storages/MergeTree/MergeTreeData.cpp partition ops;
# detached parts live under _detached/ until re-attached)
# ---------------------------------------------------------------------------


def _partition_dir(path: str, partition_by: str, value) -> str:
    import os

    return os.path.join(path, f"{partition_by}={value}")


def detach_partition(path: str, partition_by: str, value) -> str:
    """Move a partition directory to _detached/ (underscore prefix: ignored by scans) — instantly invisible to
    scans (directory listing), zero data rewrite. Returns the detached
    location."""
    import os
    import shutil

    src = _partition_dir(path, partition_by, value)
    if not os.path.isdir(src):
        raise FileNotFoundError(f"no partition {partition_by}={value} under {path}")
    det = os.path.join(path, "_detached")
    os.makedirs(det, exist_ok=True)
    dst = os.path.join(det, f"{partition_by}={value}")
    shutil.move(src, dst)
    return dst


def attach_partition(path: str, partition_by: str, value) -> None:
    """Re-attach a previously detached partition (move back)."""
    import os
    import shutil

    src = os.path.join(path, "_detached", f"{partition_by}={value}")
    if not os.path.isdir(src):
        raise FileNotFoundError(f"no detached partition {partition_by}={value}")
    shutil.move(src, _partition_dir(path, partition_by, value))


def drop_partition(path: str, partition_by: str, value) -> None:
    """DROP PARTITION: remove the directory — the O(1) bulk delete that
    makes partition-by-time retention practical at 100 TB (vs a
    rewrite-everything DELETE)."""
    import shutil

    shutil.rmtree(_partition_dir(path, partition_by, value))


def drop_detached_partition(path: str, partition_by: str, value) -> None:
    """ALTER TABLE ... DROP DETACHED PARTITION (reference
    MergeTreeData::dropDetached): remove a partition parked under
    _detached/ without ever re-attaching it."""
    import os
    import shutil

    src = os.path.join(path, "_detached", f"{partition_by}={value}")
    if not os.path.isdir(src):
        raise FileNotFoundError(f"no detached partition {partition_by}={value}")
    shutil.rmtree(src)


def move_partition_to_table(src_path: str, dst_path: str,
                            partition_by: str, value) -> None:
    """ALTER TABLE src MOVE PARTITION v TO TABLE dst (reference
    MergeTreeData::movePartitionToTable): the partition directory moves
    between table roots — O(1), no rewrite. Refuses if the destination
    already holds that partition (the reference throws too)."""
    import os
    import shutil

    src = _partition_dir(src_path, partition_by, value)
    if not os.path.isdir(src):
        raise FileNotFoundError(f"no partition {partition_by}={value} under {src_path}")
    dst = _partition_dir(dst_path, partition_by, value)
    if os.path.isdir(dst):
        raise FileExistsError(
            f"destination already has partition {partition_by}={value}")
    shutil.move(src, dst)


def replace_partition_from(dst_path: str, src_path: str,
                           partition_by: str, value) -> None:
    """ALTER TABLE dst REPLACE PARTITION v FROM src (reference
    MergeTreeData::replacePartitionFrom): dst's partition is replaced
    by a HARDLINK copy of src's — src keeps its data (the reference
    clones parts the same way), zero data copy."""
    import os
    import shutil

    src = _partition_dir(src_path, partition_by, value)
    if not os.path.isdir(src):
        raise FileNotFoundError(f"no partition {partition_by}={value} under {src_path}")
    dst = _partition_dir(dst_path, partition_by, value)
    if os.path.isdir(dst):
        shutil.rmtree(dst)
    os.makedirs(dst, exist_ok=True)
    for fn in os.listdir(src):
        if fn.startswith((".", "_")):
            continue
        os.link(os.path.join(src, fn), os.path.join(dst, fn))


def freeze_partition(path: str, partition_by: str | None = None,
                     value=None, with_name: str | None = None) -> str:
    """ALTER TABLE ... FREEZE [PARTITION v] [WITH NAME 'n'] (reference
    MergeTreeData::freezePartition): snapshot the current parts as
    HARDLINKS — zero data copy, exactly the reference's shadow/
    mechanism. The snapshot root is `_shadow/` (underscore-prefixed so
    Spark's directory listing ignores it, where the reference uses
    shadow/ outside the data path). Returns the snapshot directory."""
    import os

    snaps = os.path.join(path, "_shadow")
    os.makedirs(snaps, exist_ok=True)
    if with_name is None:
        nums = [int(d) for d in os.listdir(snaps) if d.isdigit()]
        with_name = str(max(nums, default=0) + 1)
    dst_root = os.path.join(snaps, with_name)
    src_root = (path if value is None
                else _partition_dir(path, partition_by, value))
    if not os.path.isdir(src_root):
        raise FileNotFoundError(f"no partition {partition_by}={value} under {path}")
    for dirpath, dirnames, filenames in os.walk(src_root):
        dirnames[:] = [d for d in dirnames if not d.startswith(("_", "."))]
        rel = os.path.relpath(dirpath, path)
        tgt = os.path.join(dst_root, rel) if rel != "." else dst_root
        os.makedirs(tgt, exist_ok=True)
        for fn in filenames:
            if fn.startswith((".", "_")):
                continue
            os.link(os.path.join(dirpath, fn), os.path.join(tgt, fn))
    return dst_root
