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

import os

from pyspark.sql import DataFrame


def idempotent_parquet_sink(out_dir: str):
    """Build a foreachBatch function committing each micro-batch exactly
    once under ``out_dir/batch_id=N``."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        target = os.path.join(out_dir, f"batch_id={batch_id}")
        marker = os.path.join(target, "_COMMITTED")
        if os.path.exists(marker):
            return  # replayed batch — already durably committed
        # mode=overwrite makes a re-run of a HALF-written batch safe too.
        batch_df.write.mode("overwrite").parquet(target)
        with open(marker, "w") as f:
            f.write("ok")

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
