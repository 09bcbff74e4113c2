"""Structured-Streaming extraction: a continuously-arriving pages table
(e.g. WARC drops landing as parquet files) → items sink.

The batch pipeline's stages run unchanged inside ``foreachBatch`` — the
idiomatic pattern when a micro-batch needs mapInArrow + multiple sinks.
Exactly-once across restarts comes from the streaming checkpoint (file
source offsets) + idempotent parquet appends keyed by batch id.

The crawl engine itself stays a deterministic driver loop over snapshot
tables (its rounds need cross-round state the streaming engine can't
express: frontier anti-joins, seen-set slabs); this module is the
streaming face for the *extraction* half — give it a directory that
keeps receiving page files and it keeps emitting items.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from .pipeline import extract_stage1, finalize_items_df


def stream_extract(spark, pages_dir, scraper, out_dir, checkpoint_dir=None,
                   now=None, available_now=True, pages_schema=None):
    """readStream(parquet pages) → extraction → parquet items sink.

    Returns the StreamingQuery. With ``available_now`` the query drains
    everything currently in ``pages_dir`` and stops — the testing/backfill
    mode; pass False for a continuous tail."""
    if pages_schema is None:
        from .crawl import StringType  # reuse imports

        # schema must be explicit for streaming file sources
        from pyspark.sql.types import (
            BinaryType, StringType, StructField, StructType, TimestampType,
        )

        pages_schema = StructType([
            StructField("url", StringType()),
            StructField("warc_ts", TimestampType()),
            StructField("html", BinaryType()),
            StructField("text", StringType()),
            StructField("lang", StringType()),
        ])
    checkpoint_dir = checkpoint_dir or os.path.join(out_dir, "_checkpoint")
    stream = (spark.readStream.schema(pages_schema)
              .option("maxFilesPerTrigger", 16)
              .parquet(pages_dir))

    items_dir = os.path.join(out_dir, "items")

    def sink(batch_df, batch_id):
        raw = extract_stage1(batch_df, scraper, now=now)
        items = finalize_items_df(raw, scraper, now=now) \
            .withColumn("_batch_id", F.lit(batch_id))
        # idempotent under micro-batch REPLAY (crash between sink write
        # and checkpoint commit): each batch owns its partition, and a
        # replay dynamically overwrites exactly that partition
        (items.write.mode("overwrite")
         .option("partitionOverwriteMode", "dynamic")
         .partitionBy("_batch_id")
         .parquet(items_dir))

    writer = (stream.writeStream
              .foreachBatch(sink)
              .option("checkpointLocation", checkpoint_dir))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_stream_items(spark, out_dir):
    return spark.read.parquet(os.path.join(out_dir, "items"))
