"""Durable streaming sinks: the retry / exactly-once story (RUNTIME.md).

``foreachBatch`` + checkpoint is the engine's answer to the reference's
``retry(n)``: Spark re-runs a failed micro-batch (at-least-once), and the
sink makes the re-run harmless by committing each batch idempotently —
batch output lands under its batch_id and is skipped when already present.
Restart the drained query with the same checkpoint and NOTHING is
reprocessed; kill it mid-stream and the replayed batch overwrites its own
partial output. End-to-end effectively-once from at-least-once + idempotent
commits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def _hadoop_fs(spark, path_str: str):
    """(FileSystem, Path) for any Hadoop-supported scheme (file/hdfs/s3a) —
    markers must live on the SINK's filesystem, not the driver's local disk,
    or the exactly-once contract silently only holds for file:// paths."""
    jvm = spark._jvm
    path = jvm.org.apache.hadoop.fs.Path(path_str)
    fs = path.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, path


def idempotent_parquet_sink(out_dir: str):
    """Build a foreachBatch function committing each micro-batch exactly
    once under ``out_dir/batch_id=N``."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        target = f"{out_dir}/batch_id={batch_id}"
        fs, marker = _hadoop_fs(spark, f"{target}/_COMMITTED")
        if fs.exists(marker):
            return  # replayed batch — already durably committed
        # mode=overwrite makes a re-run of a HALF-written batch safe too.
        batch_df.write.mode("overwrite").parquet(target)
        fs.create(marker, True).close()

    return write_batch


def run_with_idempotent_sink(
    stream_df: DataFrame, out_dir: str, checkpoint_dir: str
):
    """Drain a stream through the idempotent sink (availableNow)."""
    query = (
        stream_df.writeStream.foreachBatch(idempotent_parquet_sink(out_dir))
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return query
