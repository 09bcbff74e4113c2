"""Continuous-ingest curation cycle: the production composition of the
training-data ops over a rolling corpus.

Each run is ONE cycle over a new document batch (parquet docs or a WARC
drop):

  1. Gopher document gate (repetition + quality rules, one scan)
  2. optional benchmark decontamination (broadcast shingle semi-join)
  3. in-batch near-dup keeper election (df-capped Jaccard pairs →
     min-label components; keeper = min doc_id)
  4. incremental dedup against the EXISTING corpus: LSH candidates from
     the persisted minhash index, exact-Jaccard verified against the
     candidate-pruned corpus text — new docs that duplicate the corpus
     are dropped; corpus text is only read for collided candidates
  5. train/val/test split assignment
  6. append survivors to the corpus snapshot table and their band rows
     to the index snapshot table — the state the NEXT cycle dedups
     against

Scale: the batch is the only side fully scanned per cycle; the corpus
participates through its band index (joined on band_sig) and a
candidate-pruned text lookup. Snapshot tables give atomic commits +
time travel, so a crashed cycle is re-runnable (re-ingesting the same
batch then dedups against itself and drops to zero — idempotent at the
corpus level).

Usage:
  spark-submit scripts/curate_job.py --workdir /data/corpus \
      --docs new_batch.parquet [--benchmark bench.parquet] \
      [--warc 'drops/*.warc.gz'] [--threshold 0.5]
"""
import argparse
import json
import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def run_cycle(spark, workdir, docs, **cycle_kw):
    """One ingest cycle; returns per-stage counts. ``docs`` needs
    (doc_id, text[, source]). Thin wrapper over the packaged op (the
    streaming face stream_curate shares the same body)."""
    from goskyr_spark.ops.curate import ingest_cycle

    return ingest_cycle(spark, workdir, docs, **cycle_kw)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--workdir", required=True,
                   help="corpus snapshot-store root (state between "
                        "cycles)")
    p.add_argument("--docs", default="",
                   help="parquet batch with (doc_id, text[, source])")
    p.add_argument("--warc", default="",
                   help="ingest a WARC drop instead: doc_id = "
                        "xxhash64(url), source = host")
    p.add_argument("--benchmark", default="",
                   help="parquet eval set to decontaminate against")
    p.add_argument("--threshold", type=float, default=0.5)
    args = p.parse_args()

    spark = (SparkSession.builder.appName("goskyr-curate")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.sql.adaptive.enabled", "true")
             .getOrCreate())

    if args.warc:
        from goskyr_spark.io.warc import read_warc_pages

        docs = (read_warc_pages(spark, args.warc)
                .select(F.xxhash64("url").alias("doc_id"),
                        F.col("html").alias("text"),
                        F.expr("parse_url(url, 'HOST')").alias("source")))
    elif args.docs:
        docs = spark.read.parquet(args.docs)
    else:
        p.error("one of --docs / --warc is required")

    benchmark = (spark.read.parquet(args.benchmark)
                 if args.benchmark else None)
    stats = run_cycle(spark, args.workdir, docs, benchmark,
                      threshold=args.threshold)
    print(json.dumps(stats), flush=True)


if __name__ == "__main__":
    main()
