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
from datetime import datetime, timezone

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def run_cycle(spark, workdir, docs, benchmark=None, threshold=0.5,
              max_df=512, max_bucket=256, min_words=50, min_stop_hits=2):
    """One ingest cycle; returns per-stage counts. ``docs`` needs
    (doc_id, text[, source])."""
    from goskyr_spark.ops.curate import contamination_flags, split_assign
    from goskyr_spark.ops.dedup import (dedup_incremental_verified,
                                        dup_components, minhash_index,
                                        ngram_jaccard_pairs)
    from goskyr_spark.ops.gopher import curate_gopher
    from goskyr_spark.spark.store import SnapshotStore

    store = SnapshotStore(workdir)
    t_corpus = store.table("corpus")
    t_index = store.table("index")
    stats = {"batch": docs.count()}

    # 1. Gopher gate — one scan, column expressions only
    gate = curate_gopher(docs, min_words=min_words,
                         min_stop_hits=min_stop_hits) \
        .filter(F.col("keep") == 1).select("doc_id")
    kept = docs.join(gate, "doc_id")
    stats["after_gopher"] = kept.count()

    # 2. benchmark decontamination (benchmark is small → broadcast)
    if benchmark is not None:
        flags = contamination_flags(kept, benchmark)
        kept = kept.join(flags.filter(F.col("contaminated") == 0)
                         .select("doc_id"), "doc_id")
        stats["after_decontaminate"] = kept.count()

    # 3. in-batch keeper election (capped pair generation)
    pairs = ngram_jaccard_pairs(kept, threshold=threshold, max_df=max_df)
    comp = dup_components(pairs)
    kept = (kept.join(comp, kept["doc_id"] == comp["doc_id"], "left")
            .filter(comp["component"].isNull()
                    | (comp["component"] == kept["doc_id"]))
            .select(kept["*"]))
    stats["after_self_dedup"] = kept.count()

    # 4. incremental dedup against the existing corpus
    if t_corpus.exists() and t_index.exists():
        corpus = t_corpus.read(spark).select("doc_id", "text")
        index = t_index.read(spark)
        dups = dedup_incremental_verified(
            kept, corpus, index=index, threshold=threshold,
            max_bucket=max_bucket).select("doc_id").distinct()
        kept = kept.join(dups, "doc_id", "left_anti")
        stats["after_corpus_dedup"] = kept.count()

    # 5. split + 6. commit survivors and their index rows
    kept = (kept.join(split_assign(kept), "doc_id")
            .withColumn("_ingested",
                        F.lit(datetime.now(timezone.utc).isoformat())))
    n_out = kept.count()
    if n_out:
        t_corpus.append(kept.coalesce(max(1, n_out // 500_000 + 1)),
                        {"cycle_rows": n_out})
        idx_new = minhash_index(kept)
        t_index.append(idx_new.coalesce(max(1, n_out // 500_000 + 1)),
                       {"cycle_rows": n_out})
    stats["committed"] = n_out
    stats["corpus_total"] = (t_corpus.read(spark).count()
                             if t_corpus.exists() else 0)
    return stats


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
