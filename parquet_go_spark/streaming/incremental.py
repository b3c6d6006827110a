"""Structured Streaming ingest into the encoded blobs+manifest table.

The reference is a batch library — its only incremental surface is
append-style row-group writing (/root/reference/writer.go:492-502
`Flush`). The Spark-native equivalent is a streaming sink: every
micro-batch runs the same encode kernel via foreachBatch, with
chunk ids suffixed by the batch id (the analog of a new row group per
flush) so batches never collide. Exactly-once comes from the streaming
checkpoint: a replayed batch rewrites the same chunk ids and the
manifest resume join skips completed chunks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from parquet_go_spark.plans import pipeline


def stream_encode(
    stream_df: DataFrame,
    out_path: str,
    checkpoint_dir: str,
    *,
    repo_col: str = "repo",
    salt_cols: list[str] | None = None,
    sort_cols: list[str] | None = None,
    target_chunk_bytes: int = pipeline.TARGET_CHUNK_BYTES,
    zstd: bool = False,
    trigger_once: bool = False,
):
    """readStream DataFrame → writeStream(foreachBatch encode).

    Returns the StreamingQuery; caller awaits/stops it."""
    spark = stream_df.sparkSession

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        pipeline.encode_table(
            spark, batch_df, out_path,
            repo_col=repo_col, salt_cols=salt_cols, sort_cols=sort_cols,
            target_chunk_bytes=target_chunk_bytes, zstd=zstd,
            resume=True,  # replayed batches skip completed chunks
            chunk_suffix=f"@b{batch_id}",
        )

    writer = stream_df.writeStream.foreachBatch(sink).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
