#!/usr/bin/env python
"""Benchmark harness.

Headline metric (BASELINE.json): URLs fetched+extracted/sec through the
crawl engine, plus the two-cluster-size scaling evidence the north rule
requires — the same job at local[N/4] and local[N] on the same input,
reporting throughput at both and efficiency (thr_N / thr_N4) / 4.

Prints ONE JSON line:
  {"metric": "crawl_urls_per_sec", "value": <urls/sec at local[N]>,
   "unit": "sec", "queries": {...per-query seconds...}, "sf": <sf>,
   "scaling": {...}}

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32),
     GOSKYR_BENCH_SCALING=0 to skip the second (small-parallelism) run.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
from datetime import datetime, timezone

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
NOW = datetime(2026, 3, 1, tzinfo=timezone.utc)


def sf_of(path):
    base = os.path.basename(path.rstrip("/"))
    return float(base[2:]) if base.startswith("sf") else 0.1


SF = sf_of(SF_DIR)


def make_spark(cores):
    from goskyr_spark.spark.session import get_spark

    return get_spark(app=f"bench-{cores}", master=f"local[{cores}]",
                     shuffle_partitions=max(cores, 8))


def crawl_spec():
    from goskyr_spark.synth import SynthSpec

    # wide + shallow: ~3 fat rounds (per-round fixed overhead amortizes);
    # ~14k pages at sf0.1, scales linearly with sf
    n_hosts = max(8, int(500 * SF / 0.1))
    return SynthSpec(n_hosts=n_hosts, pages_per_host=2, items_per_page=12,
                     hot_hosts=max(1, n_hosts // 100), hot_factor=4)


def bench_crawl(spark, cores):
    from goskyr_spark.spark.crawl import CrawlEngine
    from goskyr_spark.synth import event_scraper, host_name, synth_pages_df

    spec = crawl_spec()
    pages = synth_pages_df(spark, spec, include_fixtures=False,
                           num_partitions=cores * 2).cache()
    pages.count()
    seeds = [f"https://{host_name(h)}/list/1" for h in range(spec.n_hosts)]
    wd = tempfile.mkdtemp(prefix="goskyr-bench-")
    try:
        eng = CrawlEngine(spark, wd, pages, event_scraper, seeds, now=NOW,
                          fetch_partitions=cores * 2,
                          round_budget=10_000_000)
        t0 = time.time()
        summaries = eng.run(max_rounds=50)
        wall = time.time() - t0
        n_fetched = sum(s.get("n_dequeued", 0) for s in summaries)
        n_items = sum(s.get("n_items", 0) for s in summaries)
        return {"wall": wall, "urls": n_fetched, "items": n_items,
                "urls_per_sec": n_fetched / wall if wall else 0.0}
    finally:
        pages.unpersist()
        shutil.rmtree(wd, ignore_errors=True)


def bench_extract(spark, cores):
    """Extraction-kernel throughput: full goskyr pipeline over pages
    synthesized from the documents table (no crawl machinery)."""
    from goskyr_spark.queries import q_ex_items_explode

    t0 = time.time()
    n = q_ex_items_explode(spark, SF_DIR).count()
    wall = time.time() - t0
    return {"wall": wall, "rows": n,
            "rows_per_sec": n / wall if wall else 0.0}


def bench_queries(spark):
    """Per-query wall times for the catalog's heavier operators."""
    from goskyr_spark.queries import all_queries

    picks = ["ex_text_css", "ex_date", "ex_items_explode", "dedup_exact",
             "dedup_minhash_lsh", "dedup_jaccard", "dedup_simhash",
             "txt_tokens", "txt_quality", "txt_langid", "txt_fingerprint",
             "sim_topk", "mm_decode"]
    qs = all_queries()
    out = {}
    for name in picks:
        t0 = time.time()
        qs[name](spark, SF_DIR).count()
        out[name] = round(time.time() - t0, 3)
    return out


def main():
    results = {}
    # --- full-parallelism run
    spark = make_spark(CPUS)
    crawl_big = bench_crawl(spark, CPUS)
    extract_big = bench_extract(spark, CPUS)
    per_query = bench_queries(spark)
    spark.stop()

    scaling = None
    if os.environ.get("GOSKYR_BENCH_SCALING", "1") != "0":
        small = max(2, CPUS // 4)
        spark2 = make_spark(small)
        crawl_small = bench_crawl(spark2, small)
        spark2.stop()
        thr_big = crawl_big["urls_per_sec"]
        thr_small = crawl_small["urls_per_sec"]
        scaling = {
            "cores_small": small,
            "cores_big": CPUS,
            "urls_per_sec_small": round(thr_small, 2),
            "urls_per_sec_big": round(thr_big, 2),
            "efficiency": round((thr_big / thr_small) / (CPUS / small), 3)
            if thr_small else None,
        }

    per_query["crawl_full"] = round(crawl_big["wall"], 3)
    per_query["extract_pipeline"] = round(extract_big["wall"], 3)
    out = {
        "metric": "crawl_urls_per_sec",
        "value": round(crawl_big["urls_per_sec"], 2),
        "unit": "sec",
        "queries": per_query,
        "sf": SF,
        "crawl": {k: round(v, 3) if isinstance(v, float) else v
                  for k, v in crawl_big.items()},
        "extract_rows_per_sec": round(extract_big["rows_per_sec"], 2),
        "scaling": scaling,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
