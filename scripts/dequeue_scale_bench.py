"""Dequeue microbench at a LARGE pending set: 2M frontier rows over
20k hosts — time the window dequeue vs the bucketed per-bucket dequeue
on identical tables, and verify identical results."""
import sys
import time

sys.path.insert(0, "/root/repo")
from pyspark.sql import Window
from pyspark.sql import functions as F

from goskyr_spark.spark.crawl import (CrawlEngine, FETCHED_SCHEMA,
                                      FRONTIER_SCHEMA)
from goskyr_spark.spark.session import get_spark
from goskyr_spark.synth import event_scraper

spark = get_spark(app="dq-scale", master="local[16]",
                  shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")

N = 8_000_000
HOSTS = 80_000
eng = CrawlEngine(spark, "/tmp/goskyr-dqscale-wd", None, event_scraper,
                  ["https://seed.test/"], live_fetcher=lambda: None,
                  frontier_buckets=64, per_host_budget=64,
                  round_budget=100_000, fetch_partitions=32)

base = (spark.range(N)
        .withColumn("host", F.concat(F.lit("h"),
                                     (F.col("id") % HOSTS).cast("string"),
                                     F.lit(".test")))
        .withColumn("url", F.concat(F.lit("https://"), F.col("host"),
                                    F.lit("/p/"), F.col("id")))
        .withColumn("url_hash", F.xxhash64("url"))
        .withColumn("priority", (F.col("id") % 7).cast("double"))
        .withColumn("depth", (F.col("id") % 7))
        .withColumn("discovered_round", F.lit(0).cast("long"))
        .withColumn("page_no", F.lit(1).cast("long"))
        .select(*[f.name for f in FRONTIER_SCHEMA.fields]))
# 10% already fetched
fetched = (base.filter(F.col("url_hash") % 10 == 0)
           .select("url", "url_hash", "host")
           .withColumn("round", F.lit(0).cast("long"))
           .withColumn("fetch_seq", F.lit(1).cast("long"))
           .withColumn("fetch_ts", F.lit(0.0))
           .withColumn("status", F.lit("ok"))
           .withColumn("n_items", F.lit(0).cast("long"))
           .withColumn("n_errors", F.lit(0).cast("long"))
           .select(*[f.name for f in FETCHED_SCHEMA.fields]))

eng._hostpart_write(eng.t_frontier, base, {"round": 0})
eng._hostpart_write(eng.t_fetched, fetched, {"round": 0})


def window_dequeue():
    frontier = eng.t_frontier.read(spark, schema=FRONTIER_SCHEMA)
    fet = eng.t_fetched.read(spark, schema=FETCHED_SCHEMA)
    pending = frontier.join(fet.select("url_hash", "url"),
                            on=["url_hash", "url"], how="left_anti")
    w = Window.partitionBy("host").orderBy("priority", "url")
    return (pending.withColumn("_rank", F.row_number().over(w))
            .filter(F.col("_rank") <= eng.per_host_budget).drop("_rank")
            .orderBy("priority", "url").limit(eng.round_budget))


def timed(fn, label):
    fn().count()  # warm-up
    best = None
    for _ in range(2):
        t0 = time.time()
        n = fn().count()
        el = time.time() - t0
        best = el if best is None else min(best, el)
    print(f"RESULT {label}: {best:.2f}s ({n} rows)", flush=True)
    return best


tw = timed(window_dequeue, "window")
tb = timed(eng._dequeue_bucketed, "bucketed")
print(f"RESULT speedup: {tw / tb:.2f}x", flush=True)

# identical result sets
a = sorted(r["url"] for r in window_dequeue().collect())
b = sorted(r["url"] for r in eng._dequeue_bucketed().collect())
print("RESULT identical:", a == b, flush=True)
