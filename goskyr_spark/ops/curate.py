"""Training-corpus curation: compose quality scoring, language ID and
near-dup keeper election into the keep/drop decision a training-data
pipeline actually ships. This is the end-to-end composition of the
text-analysis and dedup operator families.

Scale: quality/langid are bare column expressions computed in ONE pass
over the documents scan (not a join of three per-op derivatives of the
same table, which would shuffle the corpus twice); the component table
only contains docs that appear in ANY near-dup pair (tiny relative to
the corpus → broadcast join); the keep decision is a filter, never a
shuffle of the corpus."""

from __future__ import annotations

from pyspark.sql import functions as F


def keep_list(documents, min_quality=0.5, lang="en", threshold=0.2):
    """Docs worth training on: quality ≥ min_quality, language == lang,
    and either not near-duplicated or the elected keeper (component id
    == own id) of their dup class."""
    from .dedup import dup_components, ngram_jaccard_pairs
    from .text import lang_pred_expr, quality_expr

    comp = dup_components(
        ngram_jaccard_pairs(documents, threshold=threshold))
    # quality + language are bare column expressions over the SAME
    # documents scan — one pass, no self-joins (a 3-way join of three
    # derivatives of the same table would shuffle the corpus twice)
    scored = documents.select(
        "doc_id",
        quality_expr().alias("quality"),
        lang_pred_expr().alias("lang_pred"))
    return (scored
            .join(F.broadcast(comp), "doc_id", "left")
            .filter((F.col("quality") >= min_quality)
                    & (F.col("lang_pred") == lang)
                    & (F.col("component").isNull()
                       | (F.col("component") == F.col("doc_id"))))
            .select("doc_id", "quality", "lang_pred")
            .orderBy("doc_id"))
