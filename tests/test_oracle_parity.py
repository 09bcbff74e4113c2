"""Mirror of the driver's correctness gate: run every queries() entry
through Spark AND its oracle_sql() through DuckDB on the same parquet,
compare row count, column names, and order-insensitive values.

Run at sf0.001 (fast); the driver repeats this at sf0.01.
"""

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


@pytest.fixture(scope="session")
def spark():
    from goskyr_spark.spark.session import get_spark

    return get_spark(app="oracle-tests", master="local[4]",
                     shuffle_partitions=4)


@pytest.fixture(scope="session")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                  f"'{SF_DIR}/{t}.parquet'")
    return c


def _norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 6)
    if hasattr(v, "isoformat"):
        s = v.isoformat()
        return s.replace("+00:00", "")
    return v


def _rows(records, cols):
    return sorted(tuple(_norm(r[c]) for c in cols) for r in records)


from goskyr_spark import queries as _qmod

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()
# demo/uncapped variants retired from the driver's 50-row window keep
# full oracle parity here — the union gate the catalog comment promises
for _name, _fn in _qmod.extra_queries().items():
    QUERIES[_name] = (lambda spark, sf_dir, _f=_fn:
                      (entrymod._ensure_shipped(spark), _f(spark, sf_dir))[1])
ORACLES.update(_qmod.extra_oracles())


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(name, spark, con):
    qdf = QUERIES[name](spark, SF_DIR)
    sdata = [r.asDict() for r in qdf.collect()]
    odf = con.execute(ORACLES[name]).df()
    ocols = sorted(odf.columns)
    scols = sorted(qdf.columns)
    assert scols == ocols, f"schema mismatch: spark {scols} vs oracle {ocols}"
    orecords = odf.to_dict("records")
    assert len(sdata) == len(orecords), \
        f"row count: spark {len(sdata)} vs oracle {len(orecords)}"
    srows = _rows(sdata, scols)
    orows = _rows(orecords, scols)
    if srows != orows:
        diffs = [(a, b) for a, b in zip(srows, orows) if a != b][:3]
        raise AssertionError(f"value mismatch in {name}: {diffs}")


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(name, spark):
    df = QUERIES[name](spark, SF_DIR)
    assert df.count() >= 0
    assert df.columns


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
