"""Digest gate: run the exact bench-spec crawl in window / bucketed /
adaptive modes and assert the historical state digest 768bf8d782fb251d
(fetch order + statuses + seen set, unchanged since round 1). Run after
any crawl-engine change. Uses bench.py's own spec/digest code so the
gate can never drift from the frozen measurement."""
import sys

sys.path.insert(0, ".")
import bench  # noqa: E402

EXPECTED = "768bf8d782fb251d"

if __name__ == "__main__":
    cores = min(bench.CPUS, 16)
    spark = bench.make_spark(cores)
    ok = True
    for name, kw in [("window", {}),
                     ("bucketed", {"frontier_buckets": 32}),
                     ("adaptive", {"adaptive_priority": True})]:
        out = bench.bench_crawl(spark, cores, digest=True, **kw)
        good = out["digest"] == EXPECTED
        ok &= good
        print(f"{name}: digest={out['digest']} urls={out['urls']} "
              f"items={out['items']} wall={out['wall']:.2f}s "
              f"{'OK' if good else 'MISMATCH (expected ' + EXPECTED + ')'}")
    spark.stop()
    sys.exit(0 if ok else 1)
