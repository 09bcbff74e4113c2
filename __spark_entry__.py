"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``: flagship query — goskyr-config extraction (items
  explode + CSS/regex/date kernels + filters) over pages synthesized from
  /root/testdata/sf0.001/documents.parquet.
- ``queries()``: one entry per implemented operator family from
  SURVEY.md §2 plus the training-data-pipeline ops (dedup incl. keeper
  election, similarity/ANN incl. multi-table LSH + multi-probe IVF +
  trained k-means, text analysis incl. true merges-table BPE and
  Gopher/C4 repetition + quality filtering, real numpy raster
  multimodal kernels, crawl rounds).
- ``oracle_sql()``: DuckDB-runnable ANSI SQL equivalents (same column
  names/aliases) for EVERY query — the deterministic stateful ones
  (crawl rounds, mock items) are gated as literal VALUES row sets.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO)


def _ensure_shipped(spark: SparkSession) -> None:
    """Make the package importable in executor Python workers even when
    the caller's session was built outside this repo (the local-mode
    equivalent of spark-submit --py-files)."""
    if getattr(_ensure_shipped, "_done", None) is spark:
        return
    import zipfile

    pkg = os.path.join(_REPO, "goskyr_spark")
    sources = [os.path.join(root, fn)
               for root, _dirs, files in os.walk(pkg)
               for fn in files if fn.endswith(".py")]
    # key the archive to the newest source mtime so a cached zip can
    # never ship stale code after the package changes
    stamp = int(max(os.path.getmtime(f) for f in sources))
    zpath = os.path.join("/tmp", f"goskyr_spark_auto_{stamp}.zip")
    if not os.path.exists(zpath):
        with zipfile.ZipFile(zpath, "w") as z:
            for full in sorted(sources):
                z.write(full, os.path.relpath(full, _REPO))
    try:
        spark.sparkContext.addPyFile(zpath)
    except Exception:
        pass  # already added, or a session mode without addPyFile
    _ensure_shipped._done = spark


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full extraction pipeline at sf0.001 (rows > 0)."""
    _ensure_shipped(spark)
    from goskyr_spark.queries import q_ex_items_explode

    return q_ex_items_explode(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from goskyr_spark.queries import all_queries

    wrapped = {}
    for name, fn in all_queries().items():
        def run(spark, sf_dir, _fn=fn):
            _ensure_shipped(spark)
            return _fn(spark, sf_dir)

        wrapped[name] = run
    return wrapped


def oracle_sql() -> dict[str, str]:
    from goskyr_spark.queries import all_oracles

    return all_oracles()
