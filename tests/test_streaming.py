"""Structured-Streaming extraction: drain-existing mode, incremental
arrival, and checkpointed restart (no reprocessing)."""

import os
import time

import pytest

from goskyr_spark.spark.streaming import read_stream_items, stream_extract
from goskyr_spark.synth import SynthSpec, event_scraper, host_name, synth_pages_df


@pytest.fixture(scope="session")
def spark():
    from goskyr_spark.spark.session import get_spark

    return get_spark(app="stream-tests", master="local[4]",
                     shuffle_partitions=4)


def _write_pages(spark, spec, dest, host_idx):
    host = host_name(host_idx)
    df = synth_pages_df(spark, spec, include_fixtures=False) \
        .filter(f"url LIKE 'https://{host}/list/%'")
    df.coalesce(1).write.mode("append").parquet(dest)
    return df.count()


def test_stream_extract_and_resume(spark, tmp_path):
    spec = SynthSpec(n_hosts=3, pages_per_host=2, items_per_page=3)
    pages_dir = str(tmp_path / "pages")
    out_dir = str(tmp_path / "out")
    scraper = event_scraper("any.test")

    n0 = _write_pages(spark, spec, pages_dir, 1)
    q = stream_extract(spark, pages_dir, scraper, out_dir)
    q.awaitTermination(120)
    items1 = read_stream_items(spark, out_dir)
    c1 = items1.count()
    assert c1 == n0 * spec.items_per_page

    # more pages arrive; a NEW query with the same checkpoint only
    # processes the new files (exactly-once across restarts)
    n1 = _write_pages(spark, spec, pages_dir, 2)
    q2 = stream_extract(spark, pages_dir, scraper, out_dir)
    q2.awaitTermination(120)
    items2 = read_stream_items(spark, out_dir)
    assert items2.count() == (n0 + n1) * spec.items_per_page
    # no duplicates: each page_url appears exactly items_per_page times
    from pyspark.sql import functions as F

    dup = (items2.groupBy("page_url").count()
           .filter(F.col("count") != spec.items_per_page).count())
    assert dup == 0
    # batch ids distinct across the two runs
    assert items2.select("_batch_id").distinct().count() >= 2


def test_stream_dedup_urls_stateful(spark, tmp_path):
    """applyInPandasWithState first-seen dedup: state persists across a
    query RESTART (new query, same checkpoint), so re-arriving urls are
    suppressed exactly-once."""
    from datetime import datetime, timezone

    from goskyr_spark.spark.streaming import stream_dedup_urls

    urls_dir = str(tmp_path / "urls")
    out_dir = str(tmp_path / "out")
    ts = datetime(2026, 3, 1, tzinfo=timezone.utc)

    def write_batch(urls):
        spark.createDataFrame([(u, ts) for u in urls],
                              "url string, discovered_ts timestamp") \
            .coalesce(1).write.mode("append").parquet(urls_dir)

    write_batch(["https://a", "https://b", "https://c", "https://b"])
    q = stream_dedup_urls(spark, urls_dir, out_dir)
    q.awaitTermination(120)
    got1 = sorted(r["url"] for r in
                  spark.read.parquet(out_dir + "/urls").collect())
    assert got1 == ["https://a", "https://b", "https://c"]

    # restart with overlapping + new urls: only the new one comes out
    write_batch(["https://b", "https://d", "https://a"])
    q2 = stream_dedup_urls(spark, urls_dir, out_dir)
    q2.awaitTermination(120)
    got2 = sorted(r["url"] for r in
                  spark.read.parquet(out_dir + "/urls").collect())
    assert got2 == ["https://a", "https://b", "https://c", "https://d"]


def test_stream_curate_rolling_corpus(spark, tmp_path):
    """Streaming curation: two document drops land as files; with
    maxFilesPerTrigger=1 each becomes its own micro-batch cycle, so
    drop-2 docs near-duplicating drop-1 corpus docs are removed by the
    incremental index dedup — same semantics as two batch
    curate_job cycles, driven by Structured Streaming."""
    from goskyr_spark.spark.streaming import stream_curate
    from goskyr_spark.spark.store import SnapshotStore

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet") \
        .select("doc_id", "text")
    drops = str(tmp_path / "drops")
    os.makedirs(drops)
    # two drops written BEFORE the query starts; availableNow drains
    # both, one micro-batch per file
    docs.filter("doc_id % 2 = 0").coalesce(1).write.parquet(
        drops + "/d1", compression="none")
    docs.filter("doc_id % 2 = 1").coalesce(1).write.parquet(
        drops + "/d2", compression="none")
    import shutil
    for i, d in enumerate(("d1", "d2")):
        src = [f for f in os.listdir(f"{drops}/{d}")
               if f.endswith(".parquet")][0]
        shutil.move(f"{drops}/{d}/{src}", f"{drops}/drop{i}.parquet")
        shutil.rmtree(f"{drops}/{d}")

    wd = str(tmp_path / "corpus")
    q = stream_curate(spark, drops, wd, min_words=40, min_stop_hits=1)
    q.awaitTermination(300)

    store = SnapshotStore(wd)
    t_corpus, t_index = store.table("corpus"), store.table("index")
    assert t_corpus.exists() and t_index.exists()
    # two cycles committed (one per drop) → two corpus appends
    appends = [m for m in t_corpus.snapshots()
               if m["meta"].get("cycle_rows")]
    assert len(appends) == 2
    corpus = t_corpus.read(spark)
    n_total = corpus.count()
    assert n_total == sum(m["meta"]["cycle_rows"] for m in appends)
    # cross-drop dedup happened: batch semantics equivalence — run the
    # same two cycles through the batch op on a fresh workdir
    from goskyr_spark.ops.curate import ingest_cycle

    wd2 = str(tmp_path / "corpus2")
    s1 = ingest_cycle(spark, wd2, docs.filter("doc_id % 2 = 0"),
                      min_words=40, min_stop_hits=1)
    s2 = ingest_cycle(spark, wd2, docs.filter("doc_id % 2 = 1"),
                      min_words=40, min_stop_hits=1)
    assert s2["after_corpus_dedup"] < s2["after_self_dedup"]
    batch_ids = sorted(r["doc_id"] for r in
                       SnapshotStore(wd2).table("corpus")
                       .read(spark).select("doc_id").collect())
    stream_ids = sorted(r["doc_id"] for r in
                        corpus.select("doc_id").collect())
    assert stream_ids == batch_ids
