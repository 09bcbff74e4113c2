"""Seen-set slab growth: with a tiny initial capacity the amortized-
doubling rebuild path must trigger and the seen set must stay exact
(no false negatives ever → no URL refetched or re-enqueued)."""

from datetime import datetime, timezone

import pytest

from goskyr_spark.kernels.cuckoo import CuckooFilter
from goskyr_spark.spark.crawl import CrawlEngine
from goskyr_spark.synth import SynthSpec, event_scraper, host_name, synth_pages_df

NOW = datetime(2026, 3, 1, tzinfo=timezone.utc)


@pytest.fixture(scope="session")
def spark():
    from goskyr_spark.spark.session import get_spark

    return get_spark(app="slab-tests", master="local[4]",
                     shuffle_partitions=4)


def test_rebuild_keeps_seen_exact(spark, tmp_path):
    spec = SynthSpec(n_hosts=4, pages_per_host=3, items_per_page=4,
                     hot_hosts=1, hot_factor=2)
    pages = synth_pages_df(spark, spec, include_fixtures=False).cache()
    pages.count()
    seeds = [f"https://{host_name(h)}/list/1" for h in range(spec.n_hosts)]

    # capacity 8 per slab, 2 slabs → dozens of rebuilds over ~200 urls
    eng = CrawlEngine(spark, str(tmp_path / "wd"), pages, event_scraper,
                      seeds, now=NOW, n_slabs=2, slab_capacity=8,
                      fetch_partitions=4)
    eng.run(max_rounds=25)

    seen = [r for r in eng.t_seen.read(spark).collect()]
    urls = [r["url"] for r in seen]
    assert len(urls) == len(set(urls)), "duplicate urls in seen set"

    # slabs grew beyond the initial capacity and contain every seen hash
    slabs = eng._slabs_cached()
    assert any(CuckooFilter.from_bytes(c).nbuckets * 4 > 8
               for _, c in slabs.values())
    import numpy as np

    for r in seen:
        sid = int(r["url_hash"]) % 2
        bloom_b, cuckoo_b = slabs[sid]
        cf = CuckooFilter.from_bytes(cuckoo_b)
        h = np.array([r["url_hash"]], dtype=np.int64).view(np.uint64)
        assert cf.contains_many(h)[0], f"false negative for {r['url']}"

    # frontier never re-enqueued anything: every fetched url unique
    fetched = [r["url"] for r in eng.t_fetched.read(spark).collect()]
    assert len(fetched) == len(set(fetched))


def _run_engine(spark, tmp_path, name, **kw):
    spec = SynthSpec(n_hosts=4, pages_per_host=3, items_per_page=4,
                     hot_hosts=1, hot_factor=2)
    pages = synth_pages_df(spark, spec, include_fixtures=False).cache()
    pages.count()
    seeds = [f"https://{host_name(h)}/list/1" for h in range(spec.n_hosts)]
    eng = CrawlEngine(spark, str(tmp_path / name), pages, event_scraper,
                      seeds, now=NOW, **kw)
    eng.run(max_rounds=25)
    return eng


def _state(eng, spark):
    seen = sorted(r["url"] for r in eng.t_seen.read(spark).collect())
    fetched = sorted((r["round"], r["fetch_seq"], r["url"], r["status"])
                     for r in eng.t_fetched.read(spark).collect())
    return seen, fetched


def test_distributed_slab_update_matches_driver_path(spark, tmp_path):
    """slab_driver_threshold=0 forces EVERY update (incl. rebuilds at
    slab_capacity=8) through the executor-side slab-aligned path; the
    crawl's observable state must be identical to the driver path."""
    ref = _run_engine(spark, tmp_path, "drv", n_slabs=2, slab_capacity=8,
                      fetch_partitions=4)
    dist = _run_engine(spark, tmp_path, "dist", n_slabs=2, slab_capacity=8,
                       fetch_partitions=4, slab_driver_threshold=0)
    assert _state(ref, spark) == _state(dist, spark)

    # the distributed slabs contain every seen hash (no false negatives)
    import numpy as np

    slabs = dist._slabs_cached()
    for r in dist.t_seen.read(spark).collect():
        sid = int(r["url_hash"]) % 2
        cf = CuckooFilter.from_bytes(slabs[sid][1])
        h = np.array([r["url_hash"]], dtype=np.int64).view(np.uint64)
        assert cf.contains_many(h)[0], f"false negative for {r['url']}"
    # seen set exact: no url fetched twice
    fetched = [r["url"] for r in dist.t_fetched.read(spark).collect()]
    assert len(fetched) == len(set(fetched))


def test_partitioned_seen_test_matches_broadcast(spark, tmp_path):
    """seen_mode='partitioned' (tasks read only their slab from parquet,
    nothing broadcast) must be observationally identical to broadcast
    mode, at different parallelism."""
    ref = _run_engine(spark, tmp_path, "bc", n_slabs=4, slab_capacity=64,
                      fetch_partitions=4, seen_mode="broadcast")
    part = _run_engine(spark, tmp_path, "part", n_slabs=4, slab_capacity=64,
                       fetch_partitions=7, seen_mode="partitioned")
    assert _state(ref, spark) == _state(part, spark)


def test_partitioned_seen_resume(spark, tmp_path):
    """Partitioned mode + crash-resume: rollback must replay identically
    (slab files of rolled-back rounds are ignored via round filtering)."""
    spec = SynthSpec(n_hosts=3, pages_per_host=3, items_per_page=2,
                     hot_hosts=1, hot_factor=2)
    pages = synth_pages_df(spark, spec, include_fixtures=False).cache()
    seeds = [f"https://{host_name(h)}/list/1" for h in range(spec.n_hosts)]
    kw = dict(now=NOW, n_slabs=2, slab_capacity=16, fetch_partitions=3,
              seen_mode="partitioned", slab_driver_threshold=0)
    ref = CrawlEngine(spark, str(tmp_path / "ref"), pages, event_scraper,
                      seeds, **kw)
    ref.run(max_rounds=20)

    e1 = CrawlEngine(spark, str(tmp_path / "crash"), pages, event_scraper,
                     seeds, **kw)
    e1.recover()
    e1.bootstrap()
    e1.run_round(0)
    e1.run_round(1)
    import pyspark.sql.functions as F

    junk = e1.t_fetched.read(spark).limit(1) \
        .withColumn("round", F.lit(2).cast("long"))
    e1.t_fetched.append(junk, {"round": 2})
    e2 = CrawlEngine(spark, str(tmp_path / "crash"), pages, event_scraper,
                     seeds, **kw)
    e2.run(max_rounds=20)
    assert _state(ref, spark) == _state(e2, spark)


def test_compact_preserves_state_and_resume(spark, tmp_path):
    """compact() must not change any observable state, must shrink the
    slab table to one row per slab, and the compacted store must still
    crawl on (resume point)."""
    eng = _run_engine(spark, tmp_path, "cmp", n_slabs=2, slab_capacity=8,
                      fetch_partitions=4)
    before = _state(eng, spark)
    n_slab_rows_before = eng.t_slabs.read(spark).count()
    n_frontier_before = eng.t_frontier.read(spark).count()
    eng.compact()
    assert _state(eng, spark) == before
    assert eng.t_slabs.read(spark).count() == 2  # latest per slab only
    assert n_slab_rows_before > 2
    # frontier compacted to the PENDING set (everything was fetched)
    from goskyr_spark.spark.crawl import FRONTIER_SCHEMA
    n_frontier_after = eng.t_frontier.read(
        spark, schema=FRONTIER_SCHEMA).count()
    assert n_frontier_after == 0 and n_frontier_before > 0

    # a fresh engine over the compacted store resumes and stays done
    spec = SynthSpec(n_hosts=4, pages_per_host=3, items_per_page=4,
                     hot_hosts=1, hot_factor=2)
    from goskyr_spark.synth import synth_pages_df as _spd

    pages = _spd(spark, spec, include_fixtures=False)
    seeds = [f"https://{host_name(h)}/list/1" for h in range(spec.n_hosts)]
    e2 = CrawlEngine(spark, str(tmp_path / "cmp"), pages, event_scraper,
                     seeds, now=NOW, n_slabs=2, slab_capacity=8,
                     fetch_partitions=4)
    e2.run(max_rounds=30)
    assert _state(e2, spark) == before


def test_auto_compaction_mid_run_equivalent(spark, tmp_path):
    """compact_every=2: compaction INSIDE the crawl loop must not change
    any observable state vs an uncompacted run."""
    ref = _run_engine(spark, tmp_path, "nc", n_slabs=2, slab_capacity=16,
                      fetch_partitions=4)
    auto = _run_engine(spark, tmp_path, "ac", n_slabs=2, slab_capacity=16,
                       fetch_partitions=4, compact_every=2)
    assert _state(ref, spark) == _state(auto, spark)
