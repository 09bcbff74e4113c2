"""Round-4 regression tests: un-forced keeper broadcast under a large
dup fraction, capped production path in keep_list, and the
dup_components non-convergence warning (VERDICT r3 items 3; ADVICE
dedup.py:256)."""

import os
import sys
import warnings

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from goskyr_spark.spark.session import get_spark

    return get_spark(app="round4-tests", master="local[4]",
                     shuffle_partitions=4)


def test_keep_list_large_dup_fraction(spark):
    """100% of the corpus sits in dup classes of size 4 — the regime
    where a forced broadcast of the component table would be a
    scale-killer (the table is the corpus). The plain-join keep_list
    must still elect exactly the min-id keeper per class."""
    from goskyr_spark.ops.curate import keep_list
    from goskyr_spark.ops.text import lang_pred_expr, quality_expr
    from goskyr_spark.queries import documents

    base = documents(spark, SF_DIR).filter(F.col("doc_id") < 40) \
        .select("doc_id", "text")
    # 4 verbatim copies of every doc: ids d*10+c, keeper = d*10
    copies = base.crossJoin(
        spark.range(4).select(F.col("id").alias("_c"))) \
        .select((F.col("doc_id") * 10 + F.col("_c")).alias("doc_id"),
                "text")
    # threshold high enough that only exact copies pair (identical
    # shingle sets -> jaccard 1.0); cross-doc similarity stays below it
    got = sorted(r.doc_id for r in
                 keep_list(copies, threshold=0.95).collect())
    # expected: the min-id copy (d*10) of every base-level dup-class
    # keeper that passes the quality + language gates — base docs that
    # are themselves near-dups of each other merge classes, so compute
    # base components first (gates apply identically to all copies)
    from goskyr_spark.ops.dedup import dup_components, ngram_jaccard_pairs

    base_comp = {r.doc_id: r.component for r in dup_components(
        ngram_jaccard_pairs(base, threshold=0.95)).collect()}
    passing = sorted(
        r.doc_id * 10 for r in base.select(
            "doc_id", quality_expr().alias("q"),
            lang_pred_expr().alias("l"))
        .filter((F.col("q") >= 0.5) & (F.col("l") == "en")).collect()
        if base_comp.get(r.doc_id, r.doc_id) == r.doc_id)
    assert got == passing
    assert len(got) > 0


def test_keep_list_capped_default_matches_uncapped_here(spark):
    """The production default (max_df=512) must not change results on a
    corpus with no stopword-class shingles — the cap only removes
    ubiquitous shingles."""
    from goskyr_spark.ops.curate import keep_list
    from goskyr_spark.queries import documents

    docs = documents(spark, SF_DIR)
    capped = [r.doc_id for r in keep_list(docs).collect()]
    uncapped = [r.doc_id for r in keep_list(docs, max_df=None).collect()]
    assert capped == uncapped


def test_ann_pq_production_codebook_width(spark):
    """ADC at the production codebook width k=256, m=4 (VERDICT r3 #6):
    the element_at table lookup keeps the expression constant-size, so
    the plan compiles and the scores match a pure-Python ADC replay."""
    import math

    from goskyr_spark.ops.similarity import ann_topk_pq

    dim, m, n_cent = 64, 4, 256
    d_sub = dim // m
    # deterministic codebooks: centroid c of subspace s has components
    # ((s*31 + c*17 + i*7) % 23) - 11  (spread enough for distinct codes)
    books = [[[float(((s * 31 + c * 17 + i * 7) % 23) - 11)
               for i in range(d_sub)]
              for c in range(n_cent)] for s in range(m)]
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    got = ann_topk_pq(emb, books, query_vec_id=0, k=10).collect()
    assert len(got) == 10

    def cos_raw(a, b):
        dot = sum(float(x) * float(y) for x, y in zip(a, b))
        na = math.sqrt(sum(float(x) * float(x) for x in a))
        nb = math.sqrt(sum(float(y) * float(y) for y in b))
        return dot / (na * nb)

    rows = {r.vec_id: list(r.embedding)
            for r in emb.select("vec_id", "embedding").collect()}
    q = rows[0]
    scored = []
    for vid, vec in rows.items():
        if vid == 0:
            continue
        s_total = 0.0
        for s in range(m):
            sub = vec[s * d_sub:(s + 1) * d_sub]
            # code = UNROUNDED argmax (first max), like the Spark expr;
            # the ADC table entry is the round-6 cosine, like pycos
            sims = [cos_raw(sub, c) for c in books[s]]
            code = sims.index(max(sims))
            s_total += round(
                cos_raw(q[s * d_sub:(s + 1) * d_sub], books[s][code]), 6)
        scored.append((round(s_total, 6), vid))
    scored.sort(key=lambda t: (-t[0], t[1]))
    want = [(vid, sc) for sc, vid in scored[:10]]
    assert [(r.vec_id, r.adc_score) for r in got] == \
        [(vid, pytest.approx(sc, abs=2e-6)) for vid, sc in want]


def test_dup_components_warns_on_non_convergence(spark):
    """A dup chain with diameter > max_iter must WARN, not silently
    return partially-converged labels (ADVICE dedup.py:256)."""
    from goskyr_spark.ops.dedup import dup_components

    # path graph 0-1-2-...-9: min-label needs ~diameter rounds
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(9)], "id_a long, id_b long")
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        labels = dup_components(pairs, max_iter=2).collect()
    assert any("did not converge" in str(w.message) for w in rec), \
        [str(w.message) for w in rec]
    # and with enough rounds it converges silently to component 0
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        labels = dup_components(pairs, max_iter=20).collect()
    assert not any("did not converge" in str(w.message) for w in rec)
    assert {r.component for r in labels} == {0}
