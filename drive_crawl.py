from datetime import datetime, timezone
import shutil
from goskyr_spark.spark.session import get_spark
from goskyr_spark.spark.crawl import CrawlEngine
from goskyr_spark.synth import SynthSpec, event_scraper, host_name, synth_pages_df

spark = get_spark(app="verify-crawl", master="local[4]", shuffle_partitions=4)
spec = SynthSpec(n_hosts=5, pages_per_host=3, items_per_page=2, hot_hosts=1, hot_factor=2)
pages = synth_pages_df(spark, spec, include_fixtures=False).cache(); pages.count()
NOW = datetime(2026, 3, 1, tzinfo=timezone.utc)
seeds = [f"https://{host_name(h)}/list/1" for h in range(spec.n_hosts)]

shutil.rmtree("/tmp/gsv/crawl-wd", ignore_errors=True)
eng = CrawlEngine(spark, "/tmp/gsv/crawl-wd", pages, event_scraper, seeds, now=NOW)
summaries = eng.run(max_rounds=20)
for s in summaries: print("ROUND", s, flush=True)

print("seen:", eng.t_seen.read(spark).count(),
      "items:", eng.t_items.read(spark).count(),
      "fetched:", eng.t_fetched.read(spark).count())
print("sample item:", eng.t_items.read(spark).orderBy("page_url","item_idx").first().asDict())
print("fetch head:")
for r in eng.t_fetched.read(spark).orderBy("round","fetch_seq").limit(5).collect():
    print("  ", r["round"], r["fetch_seq"], f'{r["fetch_ts"]:.1f}', r["status"], r["url"])

s2 = eng.run(max_rounds=25)
print("PROBE idempotent re-run:", s2, flush=True)

import pyspark.sql.functions as F
junk = eng.t_fetched.read(spark).limit(3).withColumn("round", F.lit(99).cast("long"))
eng.t_fetched.append(junk, {"round": 99})
before = eng.t_fetched.read(spark).count()
e2 = CrawlEngine(spark, "/tmp/gsv/crawl-wd", pages, event_scraper, seeds, now=NOW, fetch_partitions=9)
e2.recover()
after = e2.t_fetched.read(spark).count()
print(f"PROBE rollback: fetched {before} -> {after}")

shutil.rmtree("/tmp/gsv/crawl-empty", ignore_errors=True)
e3 = CrawlEngine(spark, "/tmp/gsv/crawl-empty", pages, event_scraper, [], now=NOW)
print("PROBE empty seeds:", e3.run(max_rounds=5))
print("DONE")
