"""Gopher/C4 curation operators (ops/gopher.py): hand-computed
expectations for the in-row run-length n-gram statistics (including the
lex-smallest tie-break that the DuckDB oracle reproduces relationally),
the Gopher quality rules, C4 line cleaning, and the single-scan
curate_gopher compose's consistency with the standalone ops."""

import pytest

from goskyr_spark.ops.gopher import (c4_line_clean, curate_gopher,
                                     gopher_quality, repetition_stats)


@pytest.fixture(scope="module")
def spark():
    from goskyr_spark.spark.session import get_spark

    return get_spark(app="gopher-tests", master="local[2]",
                     shuffle_partitions=2)


def _docs(spark, texts):
    return spark.createDataFrame(list(enumerate(texts)),
                                 "doc_id long, text string")


def _rows(df):
    return {r.doc_id: r for r in df.collect()}


class TestRepetitionStats:
    def test_top_ngram_exact(self, spark):
        # 2-grams sorted: [a b, a b, a b, b a, b a, b c, c d, d e, e f]
        # mode "a b" x3 (3 chars); n_chars=19
        r = _rows(repetition_stats(_docs(spark, ["a b a b a b c d e f"])))
        assert r[0].top_2gram_char_frac == round(3 * 3 / 19, 6)

    def test_tie_breaks_to_lexicographically_smallest(self, spark):
        # "z y" x2 and "a b" x2 tie; sorted ascending + strictly-greater
        # update keeps the first max run -> "a b"
        txt = "z y z y a b a b"        # n_chars=15
        r = _rows(repetition_stats(_docs(spark, [txt])))
        assert r[0].top_2gram_char_frac == round(2 * 3 / 15, 6)

    def test_dup_5gram_all_occurrences(self, spark):
        # "w1 w2 w3 w4 w5" occurs at positions 1 and 6 -> 2*14 chars
        txt = "w1 w2 w3 w4 w5 w1 w2 w3 w4 w5 tail"   # 34 chars
        r = _rows(repetition_stats(_docs(spark, [txt])))
        assert r[0].dup_5gram_char_frac == round(2 * 14 / 34, 6)

    def test_dup_frac_clamped_at_one(self, spark):
        # heavy repetition: overlapping dup 5-grams exceed the char
        # count; the metric clamps at 1.0 (NeMo-style definition)
        txt = "the cat and the dog have fun with all of that stuff " * 5
        r = _rows(repetition_stats(_docs(spark, [txt.strip()])))
        assert r[0].dup_5gram_char_frac == 1.0

    def test_line_stats(self, spark):
        txt = "line one.\nline one.\nline two here!\n- bullet\nx"
        r = _rows(repetition_stats(_docs(spark, [txt])))
        assert r[0].dup_line_frac == round(1 / 5, 6)
        # one repeated 9-char line: (2-1)*9 / 45 chars
        assert r[0].dup_line_char_frac == round(9 / 45, 6)

    def test_empty_and_single_word(self, spark):
        r = _rows(repetition_stats(_docs(spark, ["", "word"])))
        for d in (0, 1):
            assert r[d].top_2gram_char_frac == 0.0
            assert r[d].dup_5gram_char_frac == 0.0
            assert r[d].dup_line_frac == 0.0

    def test_unique_grams_top_is_single_occurrence(self, spark):
        # all 2-grams unique -> mode count 1; lex-smallest 2-gram wins
        txt = "b c d a"                 # grams: [b c, c d, d a]; "b c" wins
        r = _rows(repetition_stats(_docs(spark, [txt])))
        assert r[0].top_2gram_char_frac == round(3 / 7, 6)


class TestGopherQuality:
    BASE = ("the cat and the dog have fun with all of that stuff "
            * 5).strip()      # 60 words, high stopword diversity

    def test_good_doc_keeps(self, spark):
        r = _rows(gopher_quality(_docs(spark, [self.BASE])))
        assert r[0].keep == 1 and r[0].n_stop_hits >= 2

    def test_word_count_bound(self, spark):
        r = _rows(gopher_quality(_docs(spark, ["the of short"])))
        assert r[0].keep == 0 and r[0].n_words == 3

    def test_symbol_ratio_rule(self, spark):
        spam = self.BASE + " " + "# # # # # # # #"
        r = _rows(gopher_quality(_docs(spark, [spam])))
        assert r[0].symbol_word_ratio > 0.1 and r[0].keep == 0

    def test_ellipsis_unicode_counts_as_symbol(self, spark):
        r = _rows(gopher_quality(_docs(spark, ["a… b… c…"])))
        assert r[0].symbol_word_ratio == 1.0

    def test_alpha_word_fraction(self, spark):
        nums = self.BASE + " " + " ".join(str(i) for i in range(40))
        r = _rows(gopher_quality(_docs(spark, [nums])))
        assert r[0].alpha_word_frac == round(60 / 100, 6)
        assert r[0].keep == 0

    def test_bullet_lines_rule(self, spark):
        txt = "\n".join(f"- {self.BASE}" for _ in range(3))
        r = _rows(gopher_quality(_docs(spark, [txt])))
        assert r[0].bullet_line_frac == 1.0 and r[0].keep == 0

    def test_ellipsis_line_rule(self, spark):
        lines = [self.BASE, self.BASE + "...", self.BASE + "…",
                 self.BASE + "..."]
        r = _rows(gopher_quality(_docs(spark, ["\n".join(lines)])))
        assert r[0].ellipsis_line_frac == 0.75 and r[0].keep == 0

    def test_stopword_distinct_not_total(self, spark):
        # "the" 30 times is still ONE distinct stop word -> fails >= 2
        txt = " ".join(["the cat"] * 30)
        r = _rows(gopher_quality(_docs(spark, [txt])))
        assert r[0].n_stop_hits == 1 and r[0].keep == 0


class TestC4LineClean:
    def test_line_rules(self, spark):
        txt = "\n".join([
            "This line stays right here.",     # kept
            "too short.",                      # < 3 words
            "no terminal punctuation at all",  # no ending punct
            "Enable javascript to continue.",  # javascript
            'He said "stop".',                 # kept (quote ending -> .)
        ])
        r = _rows(c4_line_clean(_docs(spark, [txt]), min_kept_lines=2))
        assert r[0].n_lines == 5 and r[0].n_kept == 2
        assert r[0].clean_text.splitlines() == [
            "This line stays right here.", 'He said "stop".']
        assert r[0].page_keep == 1

    def test_page_level_drops(self, spark):
        good = "One good line right here.\nAnd another good line here."
        r = _rows(c4_line_clean(_docs(spark, [
            good,
            good + "\nlorem ipsum dolor sit amet.",
            good + "\nvar x = {};",
        ]), min_kept_lines=2))
        assert r[0].page_keep == 1
        assert r[1].page_keep == 0     # lorem ipsum
        assert r[2].page_keep == 0     # brace
        assert r[0].n_kept == 2

    def test_min_kept_lines_threshold(self, spark):
        txt = "Only one good line survives here."
        low = _rows(c4_line_clean(_docs(spark, [txt]), min_kept_lines=1))
        high = _rows(c4_line_clean(_docs(spark, [txt]), min_kept_lines=5))
        assert low[0].page_keep == 1 and high[0].page_keep == 0


class TestCurateGopherCompose:
    def test_matches_standalone_ops(self, spark):
        import random

        rng = random.Random(7)
        vocab = ("the cat and dog have with of that fun stuff spark "
                 "join scan table row batch # …").split()
        texts = [" ".join(rng.choice(vocab)
                          for _ in range(rng.randrange(5, 90)))
                 for _ in range(60)]
        docs = _docs(spark, texts)
        composed = _rows(curate_gopher(docs, min_words=20,
                                       min_stop_hits=1))
        rep = _rows(repetition_stats(docs))
        qual = _rows(gopher_quality(docs, min_words=20, min_stop_hits=1))
        for d in composed:
            expect = int(rep[d].dup_line_frac <= 0.30
                         and rep[d].top_2gram_char_frac <= 0.20
                         and rep[d].top_3gram_char_frac <= 0.18
                         and rep[d].dup_5gram_char_frac <= 0.15
                         and qual[d].keep == 1)
            assert composed[d].keep == expect, d
        # the corpus must exercise both outcomes for this to mean much
        keeps = {v.keep for v in composed.values()}
        assert keeps == {0, 1}

    def test_single_scan_plan(self, spark):
        """The compose is ONE projection over documents — no join, no
        shuffle, no second scan."""
        docs = _docs(spark, ["the cat and the dog have fun with it"])
        plan = curate_gopher(docs)._jdf.queryExecution().executedPlan() \
            .toString()
        assert "Join" not in plan and "Aggregate" not in plan
        # exactly one source scan; the only exchange is the final
        # orderBy's range partitioning (presentation, not computation)
        assert plan.count("Scan") == 1
        assert plan.count("Exchange") <= 1
