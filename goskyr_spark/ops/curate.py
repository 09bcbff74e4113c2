"""Training-corpus curation: compose quality scoring, language ID and
near-dup keeper election into the keep/drop decision a training-data
pipeline actually ships. This is the end-to-end composition of the
text-analysis and dedup operator families.

Scale: quality/langid are bare column expressions computed in ONE pass
over the documents scan (not a join of three per-op derivatives of the
same table, which would shuffle the corpus twice); the component table
only contains docs that appear in ANY near-dup pair — at web-data dup
rates that can be a large fraction of the corpus, so the keeper join is
a PLAIN join (AQE broadcasts at runtime when it fits; never a forced
hint); the keep decision is a filter, never a shuffle of the corpus."""

from __future__ import annotations

from pyspark.sql import functions as F


def contamination_flags(documents, benchmark, shingle_n=3, min_overlap=2,
                        text_col="text", id_col="doc_id"):
    """Benchmark decontamination: flag corpus docs sharing at least
    ``min_overlap`` distinct word n-gram shingles with the benchmark
    set's shingle UNION — the pre-training hygiene step that keeps eval
    data out of the corpus.

    Scale: the benchmark is small by definition, so its distinct
    shingle set BROADCASTS; the corpus side is one shingle explode +
    broadcast-hash semi-join + per-doc count — no corpus shuffle and no
    pairwise doc×benchmark join."""
    from .dedup import shingles_expr

    bset = (benchmark
            .select(F.explode(shingles_expr(text_col, shingle_n))
                    .alias("shingle"))
            .distinct())
    doc_sh = documents.select(
        F.col(id_col),
        F.explode(shingles_expr(text_col, shingle_n)).alias("shingle"))
    # shingles_expr is per-doc DISTINCT, so count(*) counts distinct
    # overlapping shingles per doc
    hits = (doc_sh.join(F.broadcast(bset), "shingle")
            .groupBy(id_col).agg(F.count("*").alias("n_overlap")))
    return (documents.select(id_col)
            .join(hits, id_col, "left")
            .select(F.col(id_col),
                    F.coalesce(F.col("n_overlap"), F.lit(0))
                    .cast("long").alias("n_overlap"))
            .withColumn("contaminated",
                        F.when(F.col("n_overlap") >= min_overlap, 1)
                        .otherwise(0).cast("long"))
            .orderBy(id_col))


def decontaminate_cut(documents, benchmark=None, n=13, text_col="text",
                      id_col="doc_id", benchmark_grams=None):
    """Benchmark decontamination with SPAN REMOVAL at the industry-
    standard window width: every ``n``-token (default 13 — the
    GPT-3/PaLM-style 13-gram rule) window of a corpus doc that appears
    verbatim in the benchmark set is cut, overlapping windows merging
    into spans — the removal counterpart of ``contamination_flags``
    (which only flags).

    Scale: the benchmark window-hash set is small by definition and
    BROADCASTS; the corpus side is one in-row window-hash pass (same
    map-only shape as substring dedup) + broadcast semi-join; the
    marked starts fold to one small array per affected doc, so corpus
    text moves through a single join and the token cutting runs
    in-row. Tokenization matches contamination_flags (trim + split, no
    lowercasing). Output one row per corpus doc: (doc_id, text_cut,
    n_kept, n_removed, contaminated).

    ``benchmark_grams`` takes a PRECOMPUTED distinct window-hash table
    (one `_g` column) instead of benchmark documents — the incremental
    form: a rolling corpus persists
    ``window_occurrences(corpus, k, ...).select("_g").distinct()``
    once (the substring analog of minhash_index; bucketed by `_g` at
    scale) and every ingest batch is cut against it WITHOUT re-reading
    corpus text — every corpus occurrence is "first" by definition, so
    batch-side matches always cut. Equivalence to the monolithic
    first-occurrence pass is pinned in
    tests/test_round6_fixes.py::test_substring_cut_incremental."""
    from .dedup import _words, cut_marked_windows, window_occurrences

    w = _words(F.col(text_col))
    if benchmark_grams is not None:
        bset = benchmark_grams.select("_g").distinct()
    else:
        bset = (window_occurrences(benchmark, n, w, id_col)
                .select("_g").distinct())
    occ = window_occurrences(documents, n, w, id_col)
    marked = (occ.join(F.broadcast(bset), "_g")
              .select(id_col, "start"))
    out = cut_marked_windows(documents, marked, n, w, text_col, id_col)
    return out.withColumn(
        "contaminated",
        F.when(F.col("n_removed") > 0, 1).otherwise(0).cast("long"))


def split_assign(documents, id_col="doc_id", train_pct=90, val_pct=5):
    """Deterministic train/val/test assignment by content-independent
    id hash (md5 — identical in the SQL oracle): bucket = first 48 bits
    of md5(id) mod 100. Pure column expression; adding documents never
    reshuffles existing assignments."""
    bucket = F.conv(F.substring(F.md5(F.col(id_col).cast("string")
                                      .cast("binary")), 1, 12),
                    16, 10).cast("long") % 100
    split = (F.when(bucket < train_pct, "train")
             .when(bucket < train_pct + val_pct, "val")
             .otherwise("test"))
    return documents.select(F.col(id_col), bucket.alias("bucket"),
                            split.alias("split")).orderBy(id_col)


def token_budget(documents, group_col="source", text_col="text",
                 id_col="doc_id"):
    """Token accounting per corpus slice: docs + TRUE-BPE token sums
    per group — the number a training run budgets against. The count is
    a bare column expression over the one documents scan (no self-join)
    feeding a map-side partial aggregation."""
    from .text import bpe_real_count_expr

    return (documents.select(
                F.col(group_col),
                bpe_real_count_expr(text_col).alias("_n_toks"))
            .groupBy(group_col)
            .agg(F.count("*").alias("n_docs"),
                 F.sum("_n_toks").alias("n_tokens"))
            .orderBy(group_col))


def keep_list(documents, min_quality=0.5, lang="en", threshold=0.2,
              max_df=512):
    """Docs worth training on: quality ≥ min_quality, language == lang,
    and either not near-duplicated or the elected keeper (component id
    == own id) of their dup class.

    Scale: the near-dup pair generator runs the df-CAPPED jaccard path
    by default (``max_df`` bounds the per-shingle join cost — the
    production guard; pass ``max_df=None`` for the exact uncapped
    semantics). The keeper join carries NO broadcast hint: at web-data
    dup rates (30-50% of documents) the component table is billions of
    rows, so a forced broadcast is an executor/driver OOM — AQE picks
    broadcast at runtime when the table actually fits, and falls back
    to a shuffle join when it doesn't."""
    from .dedup import dup_components, ngram_jaccard_pairs
    from .text import lang_pred_expr, quality_expr

    comp = dup_components(
        ngram_jaccard_pairs(documents, threshold=threshold,
                            max_df=max_df))
    # quality + language are bare column expressions over the SAME
    # documents scan — one pass, no self-joins (a 3-way join of three
    # derivatives of the same table would shuffle the corpus twice)
    scored = documents.select(
        "doc_id",
        quality_expr().alias("quality"),
        lang_pred_expr().alias("lang_pred"))
    return (scored
            .join(comp, "doc_id", "left")
            .filter((F.col("quality") >= min_quality)
                    & (F.col("lang_pred") == lang)
                    & (F.col("component").isNull()
                       | (F.col("component") == F.col("doc_id"))))
            .select("doc_id", "quality", "lang_pred")
            .orderBy("doc_id"))


def mixture_weights(documents, group_col="source", text_col="text",
                    budget_tokens=1_000_000):
    """Temperature-based domain-mixing weights (alpha=0.5, i.e. sqrt
    sampling — the standard multinomial-temperature scheme from
    multilingual/mixture pre-training, e.g. arXiv:1901.07291 §3.1):
    weight_s = sqrt(tokens_s) / sum_s sqrt(tokens_s), and the per-source
    token quota for a target budget. sqrt (not pow) keeps the float
    math bit-identical in the DuckDB oracle.

    Scale: one documents scan -> map-side partial agg to one row per
    source; the normalizing sum is a single-row aggregate cross-joined
    back (sources are few by definition)."""
    from .text import bpe_real_count_expr

    per = (documents.select(
               F.col(group_col),
               bpe_real_count_expr(text_col).alias("_n_toks"))
           .groupBy(group_col)
           .agg(F.count("*").alias("n_docs"),
                F.sum("_n_toks").alias("n_tokens")))
    total = per.agg(F.sum(F.sqrt(F.col("n_tokens"))).alias("_z"))
    return (per.crossJoin(F.broadcast(total))
            .withColumn("weight",
                        F.round(F.sqrt(F.col("n_tokens")) / F.col("_z"),
                                6))
            .withColumn("quota_tokens",
                        F.round(F.sqrt(F.col("n_tokens")) / F.col("_z")
                                * F.lit(float(budget_tokens)))
                        .cast("long"))
            .select(group_col, "n_docs", "n_tokens", "weight",
                    "quota_tokens")
            .orderBy(group_col))


def ingest_cycle(spark, workdir, docs, benchmark=None, threshold=0.5,
                 max_df=512, max_bucket=256, min_words=50,
                 min_stop_hits=2):
    """One continuous-ingest curation cycle over a new document batch
    against a ROLLING corpus (snapshot-store state in ``workdir``):

      gopher gate → optional benchmark decontamination → in-batch
      keeper election (capped Jaccard + components) → incremental
      dedup against the persisted corpus minhash index (corpus text
      only read for collided candidates) → EXACT content-hash replay
      guard (anti-join on the corpus's persisted ``_content_hash``
      column — a column-pruned scan, no text read) → split assignment
      → index append, then corpus append.

    Returns per-stage counts. Idempotent at the corpus level, by two
    independent mechanisms: (1) the exact ``_content_hash`` anti-join
    drops any doc whose text is already committed — unconditional,
    unaffected by ``max_bucket`` capping of the LSH index; (2) the
    minhash index catches near-duplicates. The commit is two snapshot
    appends, ordered index-BEFORE-corpus on purpose: a crash between
    them leaves orphan index rows pointing at absent corpus rows,
    which is benign (the orphan bands make replayed docs collide
    harder, never less), whereas the reverse order would leave
    committed corpus text invisible to dedup. Either way the exact
    guard makes replay converge — this is what lets the streaming face
    (spark/streaming.py stream_curate) be replay-safe without batch-id
    bookkeeping.

    Used by scripts/curate_job.py (one cycle per spark-submit) and
    stream_curate (one cycle per micro-batch)."""
    from datetime import datetime, timezone

    from ..spark.store import SnapshotStore
    from .dedup import (dedup_incremental_verified, dup_components,
                        minhash_index, ngram_jaccard_pairs)
    from .gopher import curate_gopher

    store = SnapshotStore(workdir)
    t_corpus = store.table("corpus")
    t_index = store.table("index")
    stats = {"batch": docs.count()}

    gate = curate_gopher(docs, min_words=min_words,
                         min_stop_hits=min_stop_hits) \
        .filter(F.col("keep") == 1).select("doc_id")
    kept = docs.join(gate, "doc_id")
    stats["after_gopher"] = kept.count()

    if benchmark is not None:
        flags = contamination_flags(kept, benchmark)
        kept = kept.join(flags.filter(F.col("contaminated") == 0)
                         .select("doc_id"), "doc_id")
        stats["after_decontaminate"] = kept.count()

    pairs = ngram_jaccard_pairs(kept, threshold=threshold, max_df=max_df)
    comp = dup_components(pairs)
    kept = (kept.join(comp, kept["doc_id"] == comp["doc_id"], "left")
            .filter(comp["component"].isNull()
                    | (comp["component"] == kept["doc_id"]))
            .select(kept["*"]))
    stats["after_self_dedup"] = kept.count()

    kept = kept.withColumn("_content_hash", F.md5(F.col("text")))
    if t_corpus.exists():
        corpus_full = t_corpus.read(spark)
        if t_index.exists():
            corpus = corpus_full.select("doc_id", "text")
            index = t_index.read(spark)
            dups = dedup_incremental_verified(
                kept, corpus, index=index, threshold=threshold,
                max_bucket=max_bucket).select("doc_id").distinct()
            kept = kept.join(dups, "doc_id", "left_anti")
            stats["after_corpus_dedup"] = kept.count()
        # Exact replay guard: unconditional content-level idempotency,
        # independent of LSH bucket capping. Reads ONLY the persisted
        # hash column (column-pruned parquet scan, no corpus text);
        # pre-_content_hash corpora fall back to computing it.
        if "_content_hash" in corpus_full.columns:
            seen_h = corpus_full.select("_content_hash")
        else:
            seen_h = corpus_full.select(
                F.md5(F.col("text")).alias("_content_hash"))
        kept = kept.join(seen_h.distinct(), "_content_hash", "left_anti")
        stats["after_exact_guard"] = kept.count()

    kept = (kept.join(split_assign(kept), "doc_id")
            .withColumn("_ingested",
                        F.lit(datetime.now(timezone.utc).isoformat())))
    n_out = kept.count()
    if n_out:
        # index BEFORE corpus: a crash in between leaves benign orphan
        # index rows; the exact guard keeps replay convergent either way
        idx_new = minhash_index(kept)
        t_index.append(idx_new.coalesce(max(1, n_out // 500_000 + 1)),
                       {"cycle_rows": n_out})
        t_corpus.append(kept.coalesce(max(1, n_out // 500_000 + 1)),
                        {"cycle_rows": n_out})
    stats["committed"] = n_out
    stats["corpus_total"] = (t_corpus.read(spark).count()
                             if t_corpus.exists() else 0)
    return stats
