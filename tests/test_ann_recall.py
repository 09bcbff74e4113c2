"""ANN recall levers + seeded k-means training (round-3 verdict items
5-6): multi-table LSH and multi-probe IVF must strictly raise recall@10
vs their single-probe variants on the test corpus, and ivf_train must
match a pure-Python replay of the same deterministic Lloyd's."""

import math
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(__file__))

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from goskyr_spark.spark.session import get_spark

    return get_spark(app="ann-tests", master="local[4]",
                     shuffle_partitions=4)


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()


def _ids(df):
    return {r["vec_id"] for r in df.collect()}


def test_multi_table_lsh_raises_recall(spark, emb):
    from goskyr_spark.ops.similarity import (ann_topk_lsh,
                                             ann_topk_lsh_multi,
                                             cosine_topk)

    exact = _ids(cosine_topk(emb, 0, 10))
    r1 = len(_ids(ann_topk_lsh(emb, 0, 10, n_planes=4)) & exact)
    r3 = len(_ids(ann_topk_lsh_multi(emb, 0, 10, n_planes=4,
                                     n_tables=3)) & exact)
    assert r3 > r1, (r1, r3)
    # measured on this corpus: 1/10 → 3/10; pin the floor
    assert r3 >= 3


def test_multi_probe_lsh_raises_recall(spark, emb):
    """Hamming-1 probing scans (1 + n_planes)/2^n_planes of the corpus
    and must not lose (and here strictly gains) recall vs one bucket."""
    from goskyr_spark.ops.similarity import (ann_topk_lsh,
                                             ann_topk_lsh_probed,
                                             cosine_topk)

    exact = _ids(cosine_topk(emb, 0, 10))
    r1 = len(_ids(ann_topk_lsh(emb, 0, 10, n_planes=4)) & exact)
    rp = len(_ids(ann_topk_lsh_probed(emb, 0, 10, n_planes=4,
                                      hamming=1)) & exact)
    assert rp >= r1, (r1, rp)
    assert rp >= 3


def test_multi_probe_ivf_raises_recall(spark, emb):
    from goskyr_spark.ops.similarity import (ann_topk_ivf,
                                             ann_topk_ivf_probed,
                                             cosine_topk)

    exact = _ids(cosine_topk(emb, 0, 10))
    r1 = len(_ids(ann_topk_ivf(emb, 0, 10, n_centroids=4)) & exact)
    r2 = len(_ids(ann_topk_ivf_probed(emb, 0, 10, n_centroids=4,
                                      n_probe=2)) & exact)
    assert r2 > r1, (r1, r2)
    assert r2 == 10  # full recall at n_probe=2 on this corpus


def _fold_dot(a, b):
    acc = 0.0
    for x, y in zip(a, b):
        acc += x * y
    return acc


def _cos(a, b):
    return _fold_dot(a, b) / (math.sqrt(_fold_dot(a, a)) *
                              math.sqrt(_fold_dot(b, b)))


def ref_kmeans(vectors, k=4, n_iter=2, scale=1000):
    """Pure-Python replay: same quantization, same ascending left-fold
    cosine (bit-identical to F.aggregate / list_reduce), ties → lowest
    centroid, empty cluster keeps its centroid."""
    q = [[float(round(float(x) * scale)) for x in v] for v in vectors]
    cents = [list(q[c]) for c in range(k)]
    stats = {}
    for _ in range(n_iter):
        assign = []
        for v in q:
            best, bs = 0, _cos(v, cents[0])
            for c in range(1, k):
                s = _cos(v, cents[c])
                if s > bs:
                    best, bs = c, s
            assign.append(best)
        stats = {}
        for c in range(k):
            members = [q[i] for i, a in enumerate(assign) if a == c]
            if not members:
                continue
            dims = len(members[0])
            sums = [int(sum(m[d] for m in members)) for d in range(dims)]
            stats[c] = (sums, len(members))
            cents[c] = [s / len(members) for s in sums]
    return stats


def test_ivf_train_matches_python_replay(spark, emb):
    from goskyr_spark.ops.similarity import ivf_train

    sub = emb.filter("vec_id < 60").cache()
    vectors = [list(r["embedding"]) for r in
               sub.orderBy("vec_id").collect()]
    expected = ref_kmeans(vectors, k=4, n_iter=2)

    cents, stats = ivf_train(sub, n_centroids=4, n_iter=2)
    got = {}
    for r in stats.collect():
        sums, n = got.setdefault(int(r["centroid"]),
                                 ([0] * 64, int(r["n_members"])))
        sums[int(r["i"])] = int(r["sum_v"])
    assert set(got) == set(expected)
    for c in expected:
        assert got[c][1] == expected[c][1], c          # member counts
        assert got[c][0] == expected[c][0], c          # exact dim sums
        want_cent = [s / expected[c][1] for s in expected[c][0]]
        assert cents[c] == want_cent, c                # trained centroid


def test_trained_ann_uses_trained_cells(spark, emb):
    """sim_ann_ivf_trained runs on k-means centroids and keeps full
    recall at n_probe=2 on this corpus."""
    from goskyr_spark.ops.similarity import (ann_topk_ivf_probed,
                                             cosine_topk, ivf_train)

    exact = _ids(cosine_topk(emb, 0, 10))
    cents, _ = ivf_train(emb, n_centroids=4, n_iter=2)
    got = _ids(ann_topk_ivf_probed(emb, 0, 10, n_centroids=4, n_probe=2,
                                   centroids=cents))
    assert len(got & exact) == 10


def test_pq_train_shapes_and_pure_adc(spark, emb):
    """PQ codebook construction identities + the pure ADC scan. On this
    corpus (no cluster structure — PQ's worst case) pure ADC recall is
    low by nature; the scan must still surface SOME true neighbors and
    never the query row. The production recall path is the re-rank
    variant below."""
    from goskyr_spark.ops.similarity import (ann_topk_pq, cosine_topk,
                                             pq_train)

    books, stats = pq_train(emb, m=2, n_centroids=4, n_iter=2)
    assert len(books) == 2 and all(len(b) == 4 for b in books)
    assert len(books[0][0]) == 32
    # stats cover every (subspace, centroid-with-members, dim)
    rows = stats.collect()
    assert {r["subspace"] for r in rows} == {0, 1}
    assert all(r["n_members"] > 0 for r in rows)
    exact = _ids(cosine_topk(emb, 0, 10))
    adc = _ids(ann_topk_pq(emb, books, 0, 10))
    assert len(adc & exact) >= 1, (sorted(adc), sorted(exact))
    # the scan never sees the query row
    assert 0 not in adc


def test_pq_rerank_recovers_recall(spark, emb):
    """ADC shortlist (100 of 500) + exact cosine re-rank: recall@10
    rises to >= 7 while only 20% of the corpus pays the O(dim) cosine —
    the production PQ pattern."""
    from goskyr_spark.ops.similarity import (ann_topk_pq_rerank,
                                             cosine_topk, pq_train)

    books, _ = pq_train(emb, m=8, n_centroids=8, n_iter=2)
    exact = _ids(cosine_topk(emb, 0, 10))
    rer = _ids(ann_topk_pq_rerank(emb, books, 0, 10, shortlist=100))
    assert len(rer & exact) >= 7, (sorted(rer), sorted(exact))
    assert 0 not in rer


def test_pq_codes_single_projection_plan(spark, emb):
    """The ADC scan is ONE projection over embeddings — no join, no
    shuffle before the final top-k."""
    from goskyr_spark.ops.similarity import ann_topk_pq, pq_train

    books, _ = pq_train(emb, m=2, n_centroids=4, n_iter=2)
    plan = ann_topk_pq(emb, books, 0, 10)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Join" not in plan
    assert "TakeOrderedAndProject" in plan


def test_ivfpq_indexed_recall_meets_rerank_baseline(spark, emb):
    """The composite IVF-PQ probe (round-6): recall@10 must be >= the
    full-corpus PQ-rerank baseline at the same codebooks — the cell
    restriction prunes the scan, it must not cost recall on this
    corpus (measured: baseline 9/10 at sf0.01, ivfpq 10/10 with
    n_probe=2; at sf0.001 pinned below)."""
    from goskyr_spark.ops.similarity import (ann_topk_ivfpq_indexed,
                                             ann_topk_pq_rerank,
                                             cosine_topk, ivfpq_index,
                                             ivfpq_probe_cells, pq_train)

    exact = _ids(cosine_topk(emb, 0, 10))
    books, _ = pq_train(emb, m=4, n_centroids=4, n_iter=2)
    cents = [list(r[0]) for r in emb.orderBy("vec_id")
             .select("embedding").limit(4).collect()]
    qvec = emb.filter("vec_id = 0").select("embedding").first()[0]
    baseline = len(_ids(ann_topk_pq_rerank(emb, books, 0, 10, 100))
                   & exact)
    idx = ivfpq_index(emb, cents, books)
    cells = ivfpq_probe_cells(emb, cents, 0, n_probe=2)
    got = len(_ids(ann_topk_ivfpq_indexed(idx, books, qvec, cells, emb,
                                          0, 10, 100)) & exact)
    assert got >= baseline, (got, baseline)
    assert got >= 7


def test_batch_topk_matches_single_query_topk(spark, emb):
    """cosine_topk_batch's bounded two-stage top-k must return exactly
    the single-query cosine_topk rows for every query in the batch —
    including when tiny Arrow batches force the per-task candidate
    trim to run many times."""
    from goskyr_spark.ops.similarity import cosine_topk, cosine_topk_batch

    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch",
                         None)
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "7")
    try:
        batch = cosine_topk_batch(emb, query_ids=[0, 3, 5], k=6).collect()
    finally:
        if old is not None:
            spark.conf.set(
                "spark.sql.execution.arrow.maxRecordsPerBatch", old)
    by_q = {}
    for r in batch:
        by_q.setdefault(r["query_id"], []).append(
            (r["vec_id"], r["cosine"]))
    for qid in (0, 3, 5):
        single = [(r["vec_id"], r["cosine"])
                  for r in cosine_topk(emb, qid, 6).collect()]
        assert by_q[qid] == single, qid
