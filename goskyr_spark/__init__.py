"""goskyr_spark — a PySpark-native crawl/extract engine.

A from-scratch reimplementation of the capabilities of jakopako/goskyr
(reference at /root/reference, YAML-configured list scraper in Go) as a
Spark-first URL-frontier + fetch scheduler + field-extraction engine:

- pure-Python extraction kernels (HTML DOM + CSS selectors + Go-layout
  date parsing + goskyr URL-join) executed as vectorized Arrow UDFs,
- a snapshot-table (Iceberg-style) frontier with a Bloom/cuckoo URL-seen
  set, per-host politeness, robots.txt, and checkpointed crawl rounds,
- deterministic ordering keys so crawl order and the final seen set are
  identical across parallelism levels (local[8] vs local[32]).

Nothing here is a translation of the reference's Go execution model; the
reference defines WHAT to compute (SURVEY.md §2), the architecture is
DataFrame/Arrow-first.
"""

__version__ = "0.3.0"
