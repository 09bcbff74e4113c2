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


def stream_dedup_urls(spark, urls_dir, out_dir, checkpoint_dir=None,
                      available_now=True, urls_schema=None):
    """Streaming first-seen URL dedup — the seen-set re-expressed as a
    Structured Streaming STATEFUL operator (applyInPandasWithState):
    one state-store entry per url; only the first occurrence across all
    micro-batches is emitted, and the state survives restarts via the
    checkpoint (exactly-once first-seen). The batch crawl engine keeps
    its slab-based seen set (cross-round anti-joins need more than
    per-key state); this is the streaming face for a continuous
    URL-discovery feed.

    Returns the StreamingQuery; results land in <out_dir>/urls.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout
    from pyspark.sql.types import (
        LongType, StringType, StructField, StructType, TimestampType,
    )

    if urls_schema is None:
        urls_schema = StructType([
            StructField("url", StringType()),
            StructField("discovered_ts", TimestampType()),
        ])
    out_schema = urls_schema
    state_schema = StructType([StructField("seen", LongType())])

    def first_seen(key, pdfs, state):
        if state.exists:
            # url already emitted in an earlier batch (or run): drop
            for _ in pdfs:
                pass
            return
        first = None
        for pdf in pdfs:
            if first is None and len(pdf):
                first = pdf.iloc[[0]][[f.name for f in out_schema.fields]]
        state.update((1,))
        if first is not None:
            yield first

    checkpoint_dir = checkpoint_dir or os.path.join(out_dir, "_checkpoint")
    stream = (spark.readStream.schema(urls_schema)
              .option("maxFilesPerTrigger", 16)
              .parquet(urls_dir))
    deduped = stream.groupBy("url").applyInPandasWithState(
        first_seen, out_schema, state_schema, "append",
        GroupStateTimeout.NoTimeout)
    writer = (deduped.writeStream.format("parquet")
              .option("path", os.path.join(out_dir, "urls"))
              .option("checkpointLocation", checkpoint_dir)
              .outputMode("append"))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_curate(spark, docs_dir, workdir, checkpoint_dir=None,
                  available_now=True, max_files_per_trigger=1,
                  docs_schema=None, **cycle_kw):
    """Structured-Streaming face for corpus curation: a directory that
    keeps receiving document-batch parquet drops → a rolling curated
    corpus. Every micro-batch runs ONE full curation cycle
    (ops.curate.ingest_cycle: Gopher gate, optional decontamination,
    in-batch keeper election, incremental dedup against the corpus
    minhash index, split, atomic corpus+index append) inside
    ``foreachBatch`` — the idiomatic shape when a micro-batch needs
    multiple sinks and iterative joins.

    Replay safety is CONTENT-level, not batch-id-level: a replayed
    micro-batch re-runs the cycle against a corpus that already
    contains its docs, every row collides with itself in the index at
    Jaccard 1.0, and the cycle commits zero rows — so the corpus is
    exactly-once even though the snapshot append itself is not
    idempotent (pytest-pinned for the batch job, same body here).

    ``max_files_per_trigger=1`` makes each dropped file its own cycle
    (dedup ordering follows drop order); raise it to batch drops.
    Returns the StreamingQuery."""
    from pyspark.sql.types import (LongType, StringType, StructField,
                                   StructType)

    if docs_schema is None:
        docs_schema = StructType([
            StructField("doc_id", LongType()),
            StructField("text", StringType()),
        ])
    checkpoint_dir = checkpoint_dir or os.path.join(workdir,
                                                    "_stream_checkpoint")
    stream = (spark.readStream.schema(docs_schema)
              .option("maxFilesPerTrigger", max_files_per_trigger)
              .parquet(docs_dir))

    def sink(batch_df, batch_id):
        from ..ops.curate import ingest_cycle

        stats = ingest_cycle(spark, workdir, batch_df, **cycle_kw)
        print(f"stream_curate batch {batch_id}: {stats}", flush=True)

    writer = (stream.writeStream
              .foreachBatch(sink)
              .option("checkpointLocation", checkpoint_dir))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
