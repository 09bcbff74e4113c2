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
