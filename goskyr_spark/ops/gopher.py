"""Gopher/C4-style corpus-quality operators for LLM training-data
curation: repetition statistics (duplicate lines, top/duplicated word
n-grams), the Gopher quality-rule set, and C4 line-level cleaning.

Rule provenance (public papers):
- Gopher (Rae et al. 2021, arXiv:2112.11446, Table A1): repetition
  thresholds (duplicate line fraction, top-n-gram char fraction,
  duplicated-n-gram char fraction) and the quality heuristics (word
  count bounds, mean word length 3-10, symbol-to-word ratio, ">= 2
  stop words", bullet/ellipsis line fractions).
- C4 (Raffel et al. 2020, arXiv:1910.10683 §2.2): keep lines that end
  in terminal punctuation and have >= 3 words; drop pages containing
  "lorem ipsum" or "{"; drop pages with too few surviving lines.

Scale design: EVERYTHING here is per-document column expressions —
one scan, zero shuffle, whole-stage codegen where possible. The n-gram
mode (most frequent n-gram) is computed IN-ROW by a run-length pass
over the doc's sorted n-gram array (O(G log G) per doc) instead of an
explode + groupBy(doc_id, gram) (which would shuffle every n-gram of a
100 TB corpus). Ties on the max count break to the lexicographically
smallest n-gram (sorted array + strictly-greater update), so the
DuckDB oracle can reproduce the choice exactly with
row_number() OVER (ORDER BY cnt DESC, gram ASC).

Definitions follow the common reimplementation (e.g. NVIDIA NeMo
Curator's Gopher filters): "duplicate line char fraction" counts the
characters of REPEATED occurrences ((count-1)*len), while the
"duplicated n-gram char fraction" counts ALL occurrences of any
duplicated n-gram (count*len); both over the trimmed doc's char count
and clamped at 1.0 (overlapping grams can exceed it).

The keep gates (curate_gopher) compare the ROUNDED 6-decimal fractions
— the same values the metrics report and the DuckDB oracle computes —
so a fraction sitting exactly on a threshold decides identically in
both engines.
"""

from __future__ import annotations

from pyspark.sql import functions as F

# Gopher's stop-word requirement uses a short fixed list
GOPHER_STOPWORDS_RX = r"\b(the|be|to|of|and|that|have|with)\b"


def _words(text_col):
    return F.split(F.trim(F.col(text_col)), r"\s+")


def _lines(text_col):
    return F.transform(F.split(F.trim(F.col(text_col)), r"\n"), F.trim)


def _ngrams(words, n):
    """Word n-grams joined with ' '; empty array when the doc has fewer
    than n words (F.sequence(1, 0) would count DOWN, so guard). The
    word array is BOUND once (single-element transform) so the slice
    inside the per-gram lambda does not re-evaluate the tokenization
    per gram (no CSE across a lambda boundary)."""
    if n == 1:
        return words

    def build(w):
        starts = F.sequence(F.lit(1), F.size(w) - F.lit(n - 1))
        arr = F.transform(starts,
                          lambda s: F.array_join(F.slice(w, s, n), " "))
        return F.when(F.size(w) >= n, arr) \
            .otherwise(F.array().cast("array<string>"))

    return F.element_at(F.transform(F.array(words), build), 1)


def _run_stats(sorted_arr, repeats_only=False):
    """Run-length stats over a SORTED string array, in one in-row
    aggregate pass: struct(best_run int, best_elem string,
    dup_chars long).

    - best_run/best_elem: the longest run (== the mode); ties break to
      the lexicographically smallest element because the array is
      sorted ascending and the update is strictly-greater.
    - dup_chars: sum over elements occurring more than once of
      count*len (or (count-1)*len when repeats_only=True).
    """

    def _dup(run, elem):
        n = (run - F.lit(1)) if repeats_only else run
        return (n * F.length(elem)).cast("long")

    zero = F.struct(
        F.lit("").alias("prev"), F.lit(0).alias("run"),
        F.lit(0).alias("best"), F.lit("").alias("bg"),
        F.lit(0).cast("long").alias("dup"))

    def step(acc, g):
        same = g == acc["prev"]
        run = F.when(same, acc["run"] + 1).otherwise(F.lit(1))
        # a run ends when the element changes; fold its dup chars then
        dup = F.when(~same & (acc["run"] > 1),
                     acc["dup"] + _dup(acc["run"], acc["prev"])) \
            .otherwise(acc["dup"])
        best = F.when(run > acc["best"], run).otherwise(acc["best"])
        bg = F.when(run > acc["best"], g).otherwise(acc["bg"])
        return F.struct(g.alias("prev"), run.alias("run"),
                        best.alias("best"), bg.alias("bg"),
                        dup.alias("dup"))

    def finish(acc):
        dup = F.when(acc["run"] > 1,
                     acc["dup"] + _dup(acc["run"], acc["prev"])) \
            .otherwise(acc["dup"])
        return F.struct(acc["best"].alias("best_run"),
                        acc["bg"].alias("best_elem"),
                        dup.alias("dup_chars"))

    return F.aggregate(sorted_arr, zero, step, finish)


def _frac(num, den):
    """Clamped at 1.0: overlapping n-grams count their characters once
    per occurrence (the simplified NeMo-style definition), so the raw
    ratio can exceed the doc's char count on highly repetitive text."""
    return F.round(F.least(F.lit(1.0), num / F.greatest(den, F.lit(1))), 6)


def _repetition_exprs(text_col="text", top_ns=(2, 3), dup_ns=(5,)):
    """name -> rounded metric Column, all computable in one projection."""
    t = F.trim(F.col(text_col))
    n_chars = F.length(t)
    words = _words(text_col)
    lines = _lines(text_col)
    n_lines = F.size(lines)
    line_stats = _run_stats(F.array_sort(lines), repeats_only=True)
    out = {
        "dup_line_frac":
            _frac(n_lines - F.size(F.array_distinct(lines)), n_lines),
        "dup_line_char_frac": _frac(line_stats["dup_chars"], n_chars),
    }
    for n in top_ns:
        st = _run_stats(F.array_sort(_ngrams(words, n)))
        top_chars = F.when(st["best_run"] > 0,
                           st["best_run"] * F.length(st["best_elem"])) \
            .otherwise(F.lit(0))
        out[f"top_{n}gram_char_frac"] = _frac(top_chars, n_chars)
    for n in dup_ns:
        st = _run_stats(F.array_sort(_ngrams(words, n)))
        out[f"dup_{n}gram_char_frac"] = _frac(st["dup_chars"], n_chars)
    return out


def _quality_exprs(text_col="text"):
    """name -> rounded metric Column for the Gopher quality rules."""
    t = F.trim(F.col(text_col))
    words = _words(text_col)
    n_words = F.size(words)
    lines = _lines(text_col)
    n_lines = F.greatest(F.size(lines), F.lit(1))
    n_sym = (F.regexp_count(t, F.lit(r"#"))
             + F.regexp_count(t, F.lit(r"\.\.\.|…")))
    return {
        "n_words": n_words,
        "mean_word_len": F.round(
            F.length(F.regexp_replace(t, r"\s+", ""))
            / F.greatest(n_words, F.lit(1)), 4),
        "symbol_word_ratio":
            F.round(n_sym / F.greatest(n_words, F.lit(1)), 6),
        "alpha_word_frac": F.round(
            F.size(F.filter(words, lambda w: w.rlike("[a-zA-Z]")))
            / F.greatest(n_words, F.lit(1)), 6),
        "n_stop_hits": F.size(F.array_distinct(
            F.regexp_extract_all(F.lower(t), F.lit(GOPHER_STOPWORDS_RX),
                                 F.lit(0)))).cast("long"),
        "bullet_line_frac": F.round(
            F.size(F.filter(lines, lambda l: l.rlike(r"^[-*•]")))
            / n_lines, 6),
        "ellipsis_line_frac": F.round(
            F.size(F.filter(lines, lambda l: l.rlike(r"(\.\.\.|…)$")))
            / n_lines, 6),
    }


def _quality_keep(c, min_words, max_words, min_mean_wl, max_mean_wl,
                  max_symbol_ratio, min_alpha_frac, min_stop_hits,
                  max_bullet_frac, max_ellipsis_frac):
    """Keep predicate over the ROUNDED metric columns (dict of exprs or
    F.col references — both work)."""
    return (c["n_words"].between(min_words, max_words)
            & c["mean_word_len"].between(min_mean_wl, max_mean_wl)
            & (c["symbol_word_ratio"] <= max_symbol_ratio)
            & (c["alpha_word_frac"] >= min_alpha_frac)
            & (c["n_stop_hits"] >= min_stop_hits)
            & (c["bullet_line_frac"] <= max_bullet_frac)
            & (c["ellipsis_line_frac"] <= max_ellipsis_frac))


def repetition_stats(documents, text_col="text", id_col="doc_id",
                     top_ns=(2, 3), dup_ns=(5,)):
    """Gopher repetition statistics, one row per doc, one scan, no
    shuffle: duplicate-line fraction + char fraction, top-{n}-gram char
    fraction for n in top_ns, duplicated-{n}-gram char fraction for n
    in dup_ns. Lines split on '\\n' (single-line docs get 0)."""
    exprs = _repetition_exprs(text_col, top_ns, dup_ns)
    return documents.select(
        F.col(id_col), *[v.alias(k) for k, v in exprs.items()]) \
        .orderBy(id_col)


def gopher_quality(documents, text_col="text", id_col="doc_id",
                   min_words=50, max_words=100_000,
                   min_mean_wl=3.0, max_mean_wl=10.0,
                   max_symbol_ratio=0.1, min_alpha_frac=0.8,
                   min_stop_hits=2, max_bullet_frac=0.9,
                   max_ellipsis_frac=0.3):
    """The Gopher quality-rule set as per-doc metrics + a keep flag.
    All thresholds are the paper's defaults (Table A1), overridable for
    corpora with different shapes."""
    exprs = _quality_exprs(text_col)
    keep = _quality_keep(exprs, min_words, max_words, min_mean_wl,
                         max_mean_wl, max_symbol_ratio, min_alpha_frac,
                         min_stop_hits, max_bullet_frac,
                         max_ellipsis_frac)
    return documents.select(
        F.col(id_col), *[v.alias(k) for k, v in exprs.items()],
        keep.cast("long").alias("keep")).orderBy(id_col)


def curate_gopher(documents, text_col="text", id_col="doc_id",
                  min_words=50, max_words=100_000,
                  max_dup_line_frac=0.30, max_top2_frac=0.20,
                  max_top3_frac=0.18, max_dup5_frac=0.15, **quality_kw):
    """Gopher's full document gate — repetition thresholds + quality
    rules — in ONE documents scan (every metric is a column expression
    in a single projection; no join of two per-doc metric tables)."""
    exprs = dict(_repetition_exprs(text_col))
    exprs.update(_quality_exprs(text_col))
    keep = (
        (exprs["dup_line_frac"] <= max_dup_line_frac)
        & (exprs["top_2gram_char_frac"] <= max_top2_frac)
        & (exprs["top_3gram_char_frac"] <= max_top3_frac)
        & (exprs["dup_5gram_char_frac"] <= max_dup5_frac)
        & _quality_keep(exprs, min_words, max_words,
                        quality_kw.get("min_mean_wl", 3.0),
                        quality_kw.get("max_mean_wl", 10.0),
                        quality_kw.get("max_symbol_ratio", 0.1),
                        quality_kw.get("min_alpha_frac", 0.8),
                        quality_kw.get("min_stop_hits", 2),
                        quality_kw.get("max_bullet_frac", 0.9),
                        quality_kw.get("max_ellipsis_frac", 0.3)))
    keep_cols = ["dup_line_frac", "top_2gram_char_frac",
                 "top_3gram_char_frac", "dup_5gram_char_frac",
                 "n_words", "n_stop_hits"]
    return documents.select(
        F.col(id_col), *[exprs[k].alias(k) for k in keep_cols],
        keep.cast("long").alias("keep")).orderBy(id_col)


def c4_line_clean(documents, text_col="text", id_col="doc_id",
                  min_line_words=3, min_kept_lines=5):
    """C4's line-level cleaning: keep lines ending in terminal
    punctuation with >= min_line_words words and no 'javascript';
    page_keep additionally requires >= min_kept_lines surviving lines
    and no 'lorem ipsum' / '{' anywhere on the page."""
    t = F.trim(F.col(text_col))
    lines = _lines(text_col)
    kept = F.filter(
        lines,
        lambda l: (l.rlike(r'[.!?"”]$')
                   & (F.size(F.split(l, r"\s+")) >= min_line_words)
                   & ~F.lower(l).contains("javascript")))
    n_kept = F.size(kept)
    page_keep = ((n_kept >= min_kept_lines)
                 & ~F.lower(t).contains("lorem ipsum")
                 & ~t.contains("{"))
    return documents.select(
        F.col(id_col),
        F.size(lines).alias("n_lines"),
        n_kept.alias("n_kept"),
        F.array_join(kept, "\n").alias("clean_text"),
        page_keep.cast("long").alias("page_keep"),
    ).orderBy(id_col)
