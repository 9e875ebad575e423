"""FileLog / S3Queue streaming engines (reference
/root/reference/src/Storages/FileLog/StorageFileLog.h:30,
src/Storages/ObjectStorageQueue/StorageObjectStorageQueue.h:21 — a
directory consumed as an ordered stream, each file once, with
after-processing dispositions).

Spark's file streaming source IS this engine: exactly-once per file
via the checkpoint's seen-file log. The helper speaks the reference's
vocabulary and exposes the matching knobs:

- files_per_batch  → maxFilesPerTrigger (the queue's batch size)
- after_processing → cleanSource keep|archive|delete
  (S3Queue's AFTER PROCESSING keep/delete semantics)
- ordered consumption is the source's listing order, like the
  reference's 'ordered' mode
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def file_log_stream(
    spark: SparkSession,
    path: str,
    schema,
    fmt: str = "parquet",
    files_per_batch: int | None = None,
    after_processing: str = "keep",
    archive_dir: str | None = None,
) -> DataFrame:
    """Streaming read of a drop directory, each file exactly once."""
    reader = spark.readStream.schema(schema)
    if files_per_batch:
        reader = reader.option("maxFilesPerTrigger", files_per_batch)
    if after_processing != "keep":
        reader = reader.option("cleanSource", after_processing)
        if after_processing == "archive":
            if not archive_dir:
                raise ValueError("after_processing='archive' needs archive_dir")
            reader = reader.option("sourceArchiveDir", archive_dir)
    return reader.format(fmt).load(path)
