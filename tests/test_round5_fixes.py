"""Round-5 ADVICE fixes, pinned.

1. ingest_cycle commit order + exact guard: a crash between the index
   append and the corpus append (simulated) leaves only benign orphan
   index rows; replaying the batch commits it exactly once and a
   further replay commits zero (ADVICE r4, medium).
2. Exact content-hash guard beats LSH bucket capping: with max_bucket=1
   every index bucket is over-capped so LSH self-collision finds
   nothing, yet replay still commits zero rows (ADVICE r4, low).
3. iter_warc_stream parses a record that spans many small chunks
   byte-exactly (the bytearray rewrite that made per-record work
   linear; ADVICE r4, low).
"""
import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from goskyr_spark.spark.session import get_spark

    return get_spark(app="round5-fix-tests", master="local[4]",
                     shuffle_partitions=4)


@pytest.fixture()
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet") \
        .select("doc_id", "text").filter(F.col("doc_id") < 200)


KW = dict(min_words=40, min_stop_hits=1)


def test_crash_between_appends_replay_converges(spark, docs, tmp_path,
                                                monkeypatch):
    from goskyr_spark.ops.curate import ingest_cycle
    from goskyr_spark.spark import store as store_mod

    wd = str(tmp_path / "corpus")
    orig = store_mod.SnapshotTable.append

    def crash_on_corpus(self, df, meta=None, partition_by=None):
        if self.name == "corpus":
            raise RuntimeError("simulated crash between appends")
        return orig(self, df, meta=meta, partition_by=partition_by)

    monkeypatch.setattr(store_mod.SnapshotTable, "append", crash_on_corpus)
    with pytest.raises(RuntimeError, match="simulated crash"):
        ingest_cycle(spark, wd, docs, **KW)
    monkeypatch.setattr(store_mod.SnapshotTable, "append", orig)

    # crash state: index rows committed, zero corpus rows — the benign
    # orphan direction the index-before-corpus order guarantees
    from goskyr_spark.spark.store import SnapshotStore

    st = SnapshotStore(wd)
    assert st.table("index").exists()
    assert not st.table("corpus").exists()

    # replay: batch commits exactly once despite the orphan index rows
    s1 = ingest_cycle(spark, wd, docs, **KW)
    assert s1["committed"] > 0
    assert s1["corpus_total"] == s1["committed"]

    # second replay: exact guard drops everything
    s2 = ingest_cycle(spark, wd, docs, **KW)
    assert s2["committed"] == 0
    assert s2["corpus_total"] == s1["committed"]


def test_exact_guard_survives_bucket_capping(spark, docs, tmp_path):
    from goskyr_spark.ops.curate import ingest_cycle

    wd = str(tmp_path / "corpus")
    # max_bucket=1: every multi-member LSH bucket is over-capped, so
    # the index-based dedup cannot self-collide a replayed batch —
    # before the exact guard this permanently duplicated the corpus
    s1 = ingest_cycle(spark, wd, docs, max_bucket=1, **KW)
    assert s1["committed"] > 0
    s2 = ingest_cycle(spark, wd, docs, max_bucket=1, **KW)
    assert "after_exact_guard" in s2
    assert s2["committed"] == 0
    assert s2["corpus_total"] == s1["corpus_total"]


def test_warc_large_record_many_chunks_roundtrip():
    from goskyr_spark.io.warc import (build_http_response,
                                      iter_warc_stream, write_warc)

    body = bytes(range(256)) * (1 << 14)        # 4 MiB deterministic body
    records = [("https://big.test/one", 200, body),
               ("https://big.test/two", 404, b"tiny")]
    blob = write_warc((u, build_http_response(b, status=s))
                      for u, s, b in records)
    chunks = [blob[i:i + 4096] for i in range(0, len(blob), 4096)]
    out = list(iter_warc_stream(iter(chunks)))
    assert [(u, s) for u, s, _ in out] == \
        [(u, s) for u, s, _ in records]
    assert out[0][2] == body and out[1][2] == b"tiny"


# --- line-level corpus dedup (C4/CCNet boilerplate removal) -----------------

def test_dedup_lines_drops_boilerplate(spark):
    from goskyr_spark.ops.dedup import dedup_lines

    footer = "subscribe to our newsletter"
    docs = spark.createDataFrame([
        (0, f"unique alpha\n{footer}\nunique beta"),
        (1, f"{footer}\nsolo gamma"),
        (2, f"delta one\n\n  {footer}  \ndelta two"),
        (3, f"{footer}"),                        # only the dropped line
        (4, "all mine\nalso mine"),
    ], "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           dedup_lines(docs, max_docs=2).collect()}
    # footer appears in 4 > 2 docs -> removed everywhere; order kept;
    # empty/whitespace lines drop; doc 3 vanishes entirely
    assert out[0]["text_clean"] == "unique alpha\nunique beta"
    assert out[1]["text_clean"] == "solo gamma"
    assert out[2]["text_clean"] == "delta one\ndelta two"
    assert 3 not in out
    assert out[4]["text_clean"] == "all mine\nalso mine"
    assert out[0]["n_kept"] == 2 and out[4]["n_kept"] == 2


def test_dedup_lines_threshold_boundary(spark):
    from goskyr_spark.ops.dedup import dedup_lines

    docs = spark.createDataFrame(
        [(i, "shared pair\nown %d" % i) for i in range(2)],
        "doc_id long, text string")
    # in exactly max_docs docs -> NOT dropped (strict >)
    out = dedup_lines(docs, max_docs=2).collect()
    assert all(r["text_clean"].startswith("shared pair\n") for r in out)


def test_dedup_lines_duplicate_line_within_one_doc(spark):
    from goskyr_spark.ops.dedup import dedup_lines

    # the count is DISTINCT docs: 5 copies inside one doc don't make a
    # line boilerplate
    docs = spark.createDataFrame(
        [(0, "\n".join(["echo"] * 5)), (1, "other text")],
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           dedup_lines(docs, max_docs=2).collect()}
    assert out[0]["text_clean"] == "\n".join(["echo"] * 5)
    assert out[0]["n_kept"] == 5


# --- indexed ANN probes read the index, not a per-query re-hash -------------

def test_ann_indexed_matches_recompute_and_plan(spark, tmp_path):
    from goskyr_spark.ops.similarity import (
        ann_topk_ivf, ann_topk_ivf_indexed, ann_topk_lsh,
        ann_topk_lsh_indexed, ivf_assign, srp_lsh_buckets)
    from goskyr_spark.queries import embeddings

    emb = embeddings(spark, "/root/testdata/sf0.001")

    bpath = str(tmp_path / "buckets.parquet")
    srp_lsh_buckets(emb).write.parquet(bpath)
    idx = ann_topk_lsh_indexed(emb, spark.read.parquet(bpath),
                               query_vec_id=0, k=10)
    assert idx.collect() == ann_topk_lsh(emb, query_vec_id=0,
                                         k=10).collect()
    plan = idx._jdf.queryExecution().executedPlan().toString()
    # candidates are pruned by a semi-join against the persisted index
    # BEFORE any vector math touches the corpus
    assert "LeftSemi" in plan, plan
    # the probe side reads the persisted 2-column index table (Spark's
    # plan printer truncates file paths, so assert on the read schema)
    assert "struct<vec_id:bigint,bucket:bigint>" in plan, plan

    apath = str(tmp_path / "assign.parquet")
    ivf_assign(emb).write.parquet(apath)
    idx2 = ann_topk_ivf_indexed(emb, spark.read.parquet(apath),
                                query_vec_id=0, k=10)
    assert idx2.collect() == ann_topk_ivf(emb, query_vec_id=0,
                                          k=10).collect()
    assert "LeftSemi" in \
        idx2._jdf.queryExecution().executedPlan().toString()


# --- substring-overlap stats + PII scrubbing ---------------------------------

def test_substring_dup_stats_crafted(spark):
    from goskyr_spark.ops.dedup import substring_dup_stats

    shared = "one two three four five six seven eight"   # one 8-window
    docs = spark.createDataFrame([
        (0, f"{shared} tail0 a b c"),
        (1, f"head1 {shared} tail1"),
        (2, "totally different words here nine ten eleven twelve"),
        (3, "short doc"),                                 # < 8 tokens
    ], "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           substring_dup_stats(docs, k=8).collect()}
    # docs 0 and 1 share exactly the one verbatim 8-token window
    assert out[0]["n_dup_kgrams"] == 1 and out[1]["n_dup_kgrams"] == 1
    assert out[0]["n_kgrams"] == 5     # 12 tokens -> 5 distinct windows
    assert out[2]["n_dup_kgrams"] == 0
    assert out[3]["n_kgrams"] == 0 and out[3]["dup_frac"] == 0.0
    assert abs(out[0]["dup_frac"] - 0.2) < 1e-9


def test_pii_scrub_order_and_counts(spark):
    from goskyr_spark.ops.text import pii_scrub

    docs = spark.createDataFrame([
        (0, "mail a@b.org and c.d+e@f-g.co plus ip 192.168.1.1 end"),
        (1, "a@1.2.3.4.com then bare user@10.0.0.1 here"),
        (2, "no pii here at all"),
        (3, "v1.2.3.4 version strings are ip-shaped: redacted too"),
    ], "doc_id long, text string")
    out = {r["doc_id"]: r for r in pii_scrub(docs).collect()}
    assert out[0]["text_scrubbed"] == \
        "mail <EMAIL> and <EMAIL> plus ip <IP> end"
    assert out[0]["n_emails"] == 2 and out[0]["n_ips"] == 1
    # ordering contract: the quad inside an alpha-TLD host stays part
    # of the email; the no-TLD form redacts as an IP
    assert out[1]["n_emails"] == 1 and out[1]["n_ips"] == 1
    assert out[1]["text_scrubbed"] == "<EMAIL> then bare user@<IP> here"
    assert out[2]["text_scrubbed"] == "no pii here at all"
    assert out[2]["n_emails"] == 0 and out[2]["n_ips"] == 0
    # \b protects letter-prefixed quads: v1.2.3.4 is a version string,
    # not an IP (no word boundary between 'v' and '1')
    assert "<IP>" not in out[3]["text_scrubbed"]
    assert out[3]["n_ips"] == 0


def test_dedup_lines_randomized_vs_python_oracle(spark):
    """One seeded random batch through the Spark op vs an independent
    pure-Python implementation of the same contract."""
    import random

    from goskyr_spark.ops.dedup import dedup_lines

    rng = random.Random(23)
    pool = ["menu home about", "copyright 2026 example corp",
            "subscribe now", ""] + \
           [f"unique sentence {i} with words" for i in range(400)]
    docs = [(i, "\n".join(rng.choice(pool)
                          for _ in range(rng.randint(1, 12))))
            for i in range(150)]
    max_docs = 3

    # pure-Python oracle
    from collections import Counter, defaultdict
    df_count = defaultdict(set)
    for i, t in docs:
        for ln in t.split("\n"):
            ln = ln.strip()
            if ln:
                df_count[ln].add(i)
    drop = {ln for ln, ids in df_count.items() if len(ids) > max_docs}
    want = {}
    for i, t in docs:
        kept = [ln.strip() for ln in t.split("\n")
                if ln.strip() and ln.strip() not in drop]
        if kept:
            want[i] = ("\n".join(kept), len(kept))

    out = dedup_lines(
        spark.createDataFrame(docs, "doc_id long, text string"),
        max_docs=max_docs).collect()
    got = {r["doc_id"]: (r["text_clean"], r["n_kept"]) for r in out}
    assert got == want
    assert len(drop) > 0  # the batch actually exercised the drop path


def test_substring_stats_randomized_vs_python_oracle(spark):
    import random

    from goskyr_spark.ops.dedup import substring_dup_stats

    rng = random.Random(31)
    words = [f"w{i}" for i in range(30)]
    boiler = "b1 b2 b3 b4 b5 b6 b7 b8 b9"      # planted shared span
    docs = []
    for i in range(80):
        n = rng.randint(2, 40)
        body = " ".join(rng.choice(words) for _ in range(n))
        if rng.random() < 0.3:                  # verbatim overlap
            body = f"{body} {boiler}" if rng.random() < 0.5 \
                else f"{boiler} {body}"
        docs.append((i, body))
    k = 8

    from collections import defaultdict
    gram_docs = defaultdict(set)
    per_doc = {}
    for i, t in docs:
        w = t.strip().lower().split()
        grams = {" ".join(w[j:j + k]) for j in range(len(w) - k + 1)}
        per_doc[i] = grams
        for g in grams:
            gram_docs[g].add(i)
    dup = {g for g, ids in gram_docs.items() if len(ids) > 1}
    assert dup  # non-degenerate batch

    out = substring_dup_stats(
        spark.createDataFrame(docs, "doc_id long, text string"),
        k=k).collect()
    for r in out:
        grams = per_doc[r["doc_id"]]
        nd = len(grams & dup)
        assert r["n_kgrams"] == len(grams)
        assert r["n_dup_kgrams"] == nd
        assert abs(r["dup_frac"] -
                   round(nd / max(len(grams), 1), 6)) < 1e-9
