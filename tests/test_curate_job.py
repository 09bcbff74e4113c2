"""End-to-end continuous-ingest curation cycle (scripts/curate_job.py):
two cycles over disjoint batches; cycle-2 docs near-duplicating cycle-1
corpus docs are dropped by the incremental index dedup, and re-ingesting
an already-committed batch drops to zero (idempotent at corpus level)."""
import importlib.util
import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from goskyr_spark.spark.session import get_spark

    return get_spark(app="curate-job-tests", master="local[4]",
                     shuffle_partitions=4)


@pytest.fixture(scope="module")
def job():
    spec = importlib.util.spec_from_file_location(
        "curate_job", os.path.join(os.path.dirname(__file__), "..",
                                   "scripts", "curate_job.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_two_cycle_ingest_with_index_dedup(spark, job, tmp_path):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet") \
        .select("doc_id", "text")
    batch1 = docs.filter(F.col("doc_id") % 2 == 0)
    batch2 = docs.filter(F.col("doc_id") % 2 == 1)
    wd = str(tmp_path / "corpus")
    kw = dict(min_words=40, min_stop_hits=1)

    s1 = job.run_cycle(spark, wd, batch1, **kw)
    assert s1["committed"] > 0
    assert s1["corpus_total"] == s1["committed"]
    assert s1["after_self_dedup"] <= s1["after_gopher"] <= s1["batch"]

    s2 = job.run_cycle(spark, wd, batch2, **kw)
    # the synthetic corpus has dup families spanning both halves, so
    # the index dedup must drop some cycle-2 docs
    assert s2["after_corpus_dedup"] < s2["after_self_dedup"]
    assert s2["corpus_total"] == s1["committed"] + s2["committed"]

    # idempotency: re-ingesting batch1 verbatim commits nothing new
    s3 = job.run_cycle(spark, wd, batch1, **kw)
    assert s3["committed"] == 0
    assert s3["corpus_total"] == s2["corpus_total"]


def test_cycle_decontamination(spark, job, tmp_path):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet") \
        .select("doc_id", "text")
    # benchmark = verbatim copies of 5 corpus docs → those docs are
    # contaminated and must not be committed
    bench = docs.filter(F.col("doc_id") < 5) \
        .select((F.col("doc_id") + 10_000).alias("doc_id"), "text")
    s = job.run_cycle(spark, str(tmp_path / "c2"), docs, benchmark=bench,
                      min_words=40, min_stop_hits=1)
    assert s["after_decontaminate"] < s["after_gopher"]
