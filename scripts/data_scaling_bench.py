#!/usr/bin/env python
"""Data-op scaling evidence: the same shuffle-bearing dedup job at two
parallelism levels on the same (larger-than-sf0.1) input.

The north rule's required scaling gate is the fetch+extract job
(bench.py, map-only); this script measures the OTHER kind of stage — a
shuffle-bearing dedup pipeline — so BASELINE.md can report how the
shuffle path scales too. Run on an idle machine:

    python scripts/data_scaling_bench.py [n_docs] [small] [big]

Prints one JSON line with docs/sec at both widths and the efficiency
ratio. Fixed-overhead caveat: at seconds-long toy runs the JVM/job
fixed costs bias efficiency DOWN; the printed number is a lower bound
on the asymptotic value.
"""

import json
import os
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
SMALL = int(sys.argv[2]) if len(sys.argv) > 2 else 4
BIG = int(sys.argv[3]) if len(sys.argv) > 3 else 16

CORPUS = os.path.join(tempfile.gettempdir(),
                      f"goskyr-scale-docs-{N_DOCS}.parquet")

_CHILD = r"""
import json, sys, time
sys.path.insert(0, %(root)r)
from goskyr_spark.spark.session import get_spark
from goskyr_spark.ops.dedup import (minhash_lsh_buckets_capped,
                                    substring_dedup_cut)

cores = int(sys.argv[1])
job = sys.argv[2] if len(sys.argv) > 2 else "minhash"
spark = get_spark(app=f"scale-{cores}", master=f"local[{cores}]",
                  shuffle_partitions=max(8, cores * 2))
docs = spark.read.parquet(%(corpus)r)
n = docs.count()
def run():
    if job == "substring_cut":
        # round-6 op: in-row window hashes -> (hash, doc, start)
        # shuffle -> min-struct canon agg -> text-bearing reassembly.
        # Aggregate over text_cut so Catalyst can't eliminate the
        # outer join (a bare count() of unique-keyed left join prunes
        # the whole pipeline away).
        from pyspark.sql import functions as F
        return substring_dedup_cut(docs, k=8).agg(
            F.sum(F.length("text_cut")), F.sum("n_removed")).collect()
    return minhash_lsh_buckets_capped(docs, max_bucket=64).count()
run()  # warm-up: JIT + page cache
best = None
for _ in range(2):
    t0 = time.perf_counter()
    run()
    w = time.perf_counter() - t0
    best = w if best is None else min(best, w)
print(json.dumps({"cores": cores, "wall": round(best, 3),
                  "docs_per_sec": round(n / best, 1)}))
"""


def synth_corpus():
    """Deterministic multi-cluster corpus: Zipf word salad with planted
    near-dup families (same generator family as tests, bigger)."""
    if os.path.exists(CORPUS):
        return
    import random

    from goskyr_spark.spark.session import get_spark

    words = ("the of and to in is it on at or data spark table query "
             "merge token corpus train model scale shuffle partition "
             "column vector stream batch crawl fetch parse index "
             "bucket sort hash join scan filter group window").split()
    rng = random.Random(11)
    rows = []
    base_docs = []
    for i in range(N_DOCS):
        if i % 5 == 0 or not base_docs:
            body = " ".join(rng.choice(words)
                            for _ in range(rng.randint(40, 160)))
            base_docs.append(body)
        else:  # near-dup of an earlier doc: mutate a few words
            body = base_docs[rng.randrange(len(base_docs))].split()
            for _ in range(rng.randint(1, 4)):
                body[rng.randrange(len(body))] = rng.choice(words)
            body = " ".join(body)
        rows.append((i, body))
    spark = get_spark(app="scale-synth", master="local[8]",
                      shuffle_partitions=8)
    spark.createDataFrame(rows, "doc_id long, text string") \
        .repartition(64).write.parquet(CORPUS)
    spark.stop()


def run_width(cores, job="minhash"):
    script = _CHILD % {
        "root": os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "corpus": CORPUS}
    out = subprocess.run([sys.executable, "-c", script, str(cores), job],
                         capture_output=True, text=True, check=True)
    return json.loads(out.stdout.strip().splitlines()[-1])


def main():
    synth_corpus()
    for job, label in (("minhash",
                        "minhash_lsh_capped over synthetic near-dup corpus"),
                       ("substring_cut",
                        "substring_dedup_cut (round-6) over the same corpus")):
        # big width first so the small run can't look good via page cache
        big = run_width(BIG, job)
        small = run_width(SMALL, job)
        eff = (big["docs_per_sec"] / small["docs_per_sec"]) / (BIG / SMALL)
        print(json.dumps({
            "job": label,
            "n_docs": N_DOCS,
            "small": small, "big": big,
            "efficiency": round(eff, 3),
        }))


if __name__ == "__main__":
    main()
