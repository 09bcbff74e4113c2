"""Unit tests: cuckoo/Bloom filters, robots parsing, snapshot store."""

import numpy as np
import pytest

from goskyr_spark.kernels.cuckoo import BloomFilter, CuckooFilter
from goskyr_spark.kernels.robots import parse_robots


def test_bloom_no_false_negatives_and_low_fp():
    rng = np.random.default_rng(7)
    present = rng.integers(0, 2**63, 5000, dtype=np.int64).view(np.uint64)
    absent = rng.integers(0, 2**63, 5000, dtype=np.int64).view(np.uint64)
    absent = np.setdiff1d(absent, present)
    bf = BloomFilter.sized_for(len(present))
    bf.add_many(present)
    assert bf.contains_many(present).all()  # NO false negatives, ever
    fp = bf.contains_many(absent).mean()
    assert fp < 0.05
    # serialization round-trip
    bf2 = BloomFilter.from_bytes(bf.to_bytes())
    assert bf2.contains_many(present).all()
    assert bf2.count == bf.count


def test_cuckoo_membership_and_roundtrip():
    rng = np.random.default_rng(11)
    present = rng.integers(0, 2**63, 4000, dtype=np.int64).view(np.uint64)
    absent = rng.integers(2**63, 2**64, 4000, dtype=np.uint64)
    cf = CuckooFilter.sized_for(len(present))
    inserted = cf.insert_many(present)
    assert inserted == len(present)  # sized for capacity → all fit
    assert cf.contains_many(present).all()  # no false negatives
    fp = cf.contains_many(absent).mean()
    assert fp < 0.01  # 16-bit fingerprints → ~2*4/65536
    cf2 = CuckooFilter.from_bytes(cf.to_bytes())
    assert cf2.contains_many(present).all()


def test_cuckoo_scalar_vector_agree():
    rng = np.random.default_rng(3)
    keys = rng.integers(0, 2**63, 500, dtype=np.int64).view(np.uint64)
    cf = CuckooFilter.sized_for(1000)
    cf.insert_many(keys[:250])
    vec = cf.contains_many(keys)
    scal = np.array([cf.contains(int(k)) for k in keys])
    assert (vec == scal).all()


ROBOTS = """
# comments ignored
User-agent: somebot
Disallow: /

User-agent: *
Disallow: /private/
Disallow: /tmp/*.pdf$
Allow: /private/ok/
Crawl-delay: 2.5
"""


def test_robots_rules():
    r = parse_robots(ROBOTS, "goskyr")
    assert r.crawl_delay == 2.5
    assert r.allowed("/") is True
    assert r.allowed("/public/x") is True
    assert r.allowed("/private/secret") is False
    assert r.allowed("/private/ok/page") is True  # longest match wins
    assert r.allowed("/tmp/a.pdf") is False       # $ anchor + wildcard
    assert r.allowed("/tmp/a.pdfx") is True
    # specific group selection
    rb = parse_robots(ROBOTS, "somebot")
    assert rb.allowed("/anything") is False


def test_robots_empty_and_garbage():
    assert parse_robots("", "*").allowed("/x") is True
    assert parse_robots(b"\x00garbage no colons", "*").allowed("/") is True
    r = parse_robots("User-agent: *\nDisallow:\n", "*")
    assert r.allowed("/anything") is True  # empty Disallow = allow all


def test_snapshot_store(tmp_path):
    import pandas as pd

    from goskyr_spark.spark.store import SnapshotStore

    pytest.importorskip("pyspark")
    from goskyr_spark.spark.session import get_spark

    spark = get_spark(app="store-test", master="local[2]",
                      shuffle_partitions=2)
    store = SnapshotStore(str(tmp_path))
    t = store.table("demo")
    df1 = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    s1 = t.append(df1, {"round": 0})
    df2 = spark.createDataFrame([(3, "c")], "id long, v string")
    s2 = t.append(df2, {"round": 1})
    assert t.read(spark).count() == 3
    # time travel
    assert t.read(spark, snapshot=s1).count() == 2
    # rollback by re-committing old files
    t._commit(t.manifest(s1)["files"], {"round": 0}, "overwrite")
    assert t.read(spark).count() == 2
    # appends after rollback don't resurrect rolled-back files
    t.append(df2, {"round": 1})
    assert t.read(spark).count() == 3
    assert [m["snapshot"] for m in t.snapshots()][-1] == t.head()


def test_iceberg_backend_seam():
    """The iceberg backend exists as a documented seam: without a
    configured catalog (this container has no Iceberg jars) it raises
    with a clear message; the parquet default is unchanged."""
    import pytest

    from goskyr_spark.spark.session import get_spark
    from goskyr_spark.spark.store import SnapshotStore

    spark = get_spark(app="seam", master="local[2]", shuffle_partitions=2)
    store = SnapshotStore("cat.db", backend="iceberg", spark=spark)
    with pytest.raises(RuntimeError, match="Iceberg catalog"):
        store.table("frontier")
