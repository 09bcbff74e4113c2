"""Host-hash-bucketed frontier/fetched storage (the 10^10 dequeue
path): the bucketed dequeue must produce EXACTLY the same crawl as the
window dequeue — same fetch order, same seen set, same items — while
never shuffling the pending set (one task per bucket reads only its own
files). Also: bucket files are per-bucket on disk, resume works, a
legacy unbucketed workdir falls back to the window path."""

import hashlib
import os
import sys
from datetime import datetime, timezone

import pytest

sys.path.insert(0, os.path.dirname(__file__))

from goskyr_spark.spark.crawl import CrawlEngine, FETCHED_SCHEMA

NOW = datetime(2026, 3, 1, tzinfo=timezone.utc)


@pytest.fixture(scope="module")
def spark():
    from goskyr_spark.spark.session import get_spark

    return get_spark(app="bucketed-tests", master="local[4]",
                     shuffle_partitions=4)


@pytest.fixture(scope="module")
def pages(spark):
    from goskyr_spark.synth import SynthSpec, synth_pages_df

    spec = SynthSpec(n_hosts=6, pages_per_host=3, items_per_page=3,
                     hot_hosts=1, hot_factor=3)
    return synth_pages_df(spark, spec, include_fixtures=False).cache()


def _digest(eng, spark):
    h = hashlib.sha256()
    for r in eng.t_fetched.read(spark, schema=FETCHED_SCHEMA) \
            .orderBy("round", "fetch_seq") \
            .select("round", "fetch_seq", "url", "status").collect():
        h.update(f"{r['round']}|{r['fetch_seq']}|{r['url']}|{r['status']}"
                 .encode())
    for r in eng.t_seen.read(spark).orderBy("url").select("url").collect():
        h.update(r["url"].encode())
    return h.hexdigest()


def _run(spark, pages, wd, **kw):
    from goskyr_spark.synth import event_scraper, host_name

    eng = CrawlEngine(spark, wd, pages, event_scraper,
                      [f"https://{host_name(h)}/list/1" for h in range(6)],
                      now=NOW, **kw)
    eng.run(max_rounds=15)
    return eng


@pytest.fixture(scope="module")
def ref_engine(spark, pages, tmp_path_factory):
    """One window-mode reference crawl shared by every equality test."""
    return _run(spark, pages, str(tmp_path_factory.mktemp("win")))


@pytest.fixture(scope="module")
def bucketed_engine(spark, pages, tmp_path_factory):
    """One bucketed crawl shared by the digest/file/resume tests."""
    return _run(spark, pages, str(tmp_path_factory.mktemp("bkt")),
                frontier_buckets=8)


def test_bucketed_dequeue_identical_crawl(spark, pages, tmp_path,
                                          ref_engine, bucketed_engine):
    assert _digest(bucketed_engine, spark) == _digest(ref_engine, spark)
    # and with per-host budgets + compaction in the loop
    ref2 = _run(spark, pages, str(tmp_path / "win2"), per_host_budget=2,
                round_budget=7)
    got2 = _run(spark, pages, str(tmp_path / "bkt2"), per_host_budget=2,
                round_budget=7, frontier_buckets=4, compact_every=2)
    assert _digest(got2, spark) == _digest(ref2, spark)


def test_bucketed_files_are_per_bucket(spark, pages, bucketed_engine):
    eng = bucketed_engine
    for t in (eng.t_frontier, eng.t_fetched):
        bmap = t.bucket_map()
        files = t.manifest()["files"]
        assert set(bmap) == set(files), t.name
        # each file holds exactly one bucket's rows: re-derive the
        # bucket from the rows and compare
        import pyarrow.parquet as pq
        import zlib

        for rel, b in bmap.items():
            tbl = pq.read_table(os.path.join(t.dir, rel),
                                columns=["host"])
            got = {zlib.crc32(h.encode()) % 8
                   for h in tbl.column(0).to_pylist()}
            assert got == {b}, (t.name, rel)


def test_bucketed_resume(spark, pages, tmp_path, bucketed_engine):
    """Crash-resume on a bucketed workdir replays identically."""
    from goskyr_spark.synth import event_scraper, host_name

    seeds = [f"https://{host_name(h)}/list/1" for h in range(6)]
    full = bucketed_engine

    eng1 = CrawlEngine(spark, str(tmp_path / "part"), pages,
                       event_scraper, seeds, now=NOW, frontier_buckets=8)
    eng1.run(max_rounds=2)
    eng2 = CrawlEngine(spark, str(tmp_path / "part"), pages,
                       event_scraper, seeds, now=NOW, frontier_buckets=8)
    eng2.run(max_rounds=15)
    assert _digest(eng2, spark) == _digest(full, spark)


def test_legacy_workdir_falls_back_to_window(spark, pages, tmp_path,
                                             ref_engine):
    """A workdir written WITHOUT bucketing, resumed with
    frontier_buckets set: the dequeue falls back to the window path for
    the rounds whose files lack bucket assignments — the crawl is still
    identical."""
    from goskyr_spark.synth import event_scraper, host_name

    seeds = [f"https://{host_name(h)}/list/1" for h in range(6)]
    ref = ref_engine

    eng1 = CrawlEngine(spark, str(tmp_path / "mix"), pages,
                       event_scraper, seeds, now=NOW)
    eng1.run(max_rounds=2)
    eng2 = CrawlEngine(spark, str(tmp_path / "mix"), pages,
                       event_scraper, seeds, now=NOW, frontier_buckets=8)
    assert not eng2._buckets_complete()
    eng2.run(max_rounds=15)
    assert _digest(eng2, spark) == _digest(ref, spark)


def test_rebucketing_falls_back_then_heals(spark, pages, tmp_path,
                                           ref_engine):
    """Resuming with a DIFFERENT frontier_buckets count must not trust
    the old bucket maps (a host only stays in one bucket per modulus):
    the dequeue falls back to the window path, the crawl stays
    identical, and the next compact() rewrites the tables under the new
    modulus so the bucketed path resumes."""
    from goskyr_spark.synth import event_scraper, host_name

    seeds = [f"https://{host_name(h)}/list/1" for h in range(6)]
    eng1 = CrawlEngine(spark, str(tmp_path / "re"), pages,
                       event_scraper, seeds, now=NOW, frontier_buckets=8)
    eng1.run(max_rounds=2)
    eng2 = CrawlEngine(spark, str(tmp_path / "re"), pages,
                       event_scraper, seeds, now=NOW, frontier_buckets=4)
    assert not eng2._buckets_complete()  # mod mismatch → window path
    eng2.run(max_rounds=15)
    assert _digest(eng2, spark) == _digest(ref_engine, spark)
    eng2.compact()
    assert eng2._buckets_complete()  # rewritten under mod 4
