"""Round-2 regression tests for ADVICE.md findings: self-closing
non-void elements, Go Expand replacement semantics, short-document
shingles, and host-case normalization in crawl mode."""

import sys, os
from datetime import datetime, timezone

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(__file__))

from goskyr_spark.config import loads_config
from goskyr_spark.kernels import css, dom
from goskyr_spark.kernels.extract import transform_string
from goskyr_spark.config import TransformConfig


# --- self-closing non-void elements (x/net/html parity) ----------------------

SELF_CLOSE = ('<div class="wrap"><div class="it"/>'
              '<span class="t">inside</span></div>'
              '<a href="/x"/>link text</a>')


@pytest.mark.parametrize("parse", [dom._stdlib_parse, dom._fast_parse])
def test_self_close_nonvoid_stays_open(parse):
    """x/net/html ignores '/' on non-void tags: following content becomes
    CHILDREN of <div class="it"/> — not siblings."""
    root = parse(SELF_CLOSE)
    spans = css.find([root], "div.it span.t")
    assert len(spans) == 1 and spans[0].entire_text() == "inside"
    links = css.find([root], "a")
    assert len(links) == 1 and links[0].entire_text() == "link text"


def test_self_close_void_is_leaf():
    for parse in (dom._stdlib_parse, dom._fast_parse):
        root = parse('<p><br/><img src="x"/>tail</p>')
        ps = css.find([root], "p")
        assert ps[0].entire_text() == "tail"
        imgs = css.find([root], "img")
        assert imgs and not imgs[0].children


def test_self_close_extraction_finds_items():
    """The stated invariant: pages using XML-style self-closing divs must
    not silently extract zero items."""
    from goskyr_spark.kernels.scrape import scrape_page

    scraper = loads_config("""
scrapers:
  - name: t
    url: x
    item: div.it
    fields:
      - name: t
        location: {selector: span.t}
""").scrapers[0]
    pr = scrape_page(scraper, "https://x.test/", SELF_CLOSE)
    assert len(pr.items) == 1
    assert pr.items[0]["t"] == "inside"


# --- Go ReplaceAllString Expand semantics -------------------------------------

def _tr(regex, replace):
    return TransformConfig(type="regex-replace", regex=regex, replace=replace)


@pytest.mark.parametrize("regex,replace,s,want", [
    ("(a+)", "${1}-x", "aa", "aa-x"),          # ${n} brace form
    ("(a+)", "$1-x", "aa", "aa-x"),            # $n form
    ("(a+)", "$2", "aa", ""),                  # out-of-range group → ''
    ("(a+)", "$1x", "aa", ""),                 # longest-run name '1x' → ''
    ("(a+)", "${1}x", "aa", "aax"),            # brace bounds the name
    ("(a+)", "$$1", "aa", "$1"),               # $$ → literal $
    ("(a+)", "$", "aa", "$"),                  # bare trailing $ is raw
    ("(a+)", "$-y", "aa", "$-y"),              # $ before non-name is raw
    ("(a+)", "${1", "aa", "${1"),              # unclosed brace is raw
    ("(a+)", "$01", "aa", ""),                 # leading zero → name '01'
    ("(?P<w>a+)", "[$w]", "aa", "[aa]"),       # named group
    ("(?P<w>a+)", "[${w}]", "aa", "[aa]"),     # named group, braces
    ("(a+)|(b+)", "$2", "aa", ""),             # unmatched group → ''
    ("a", "$0!", "a", "a!"),                   # $0 = whole match
])
def test_go_expand_semantics(regex, replace, s, want):
    assert transform_string(_tr(regex, replace), s) == want


def test_go_expand_replaces_all_matches():
    assert transform_string(_tr("[0-9]+", "N"), "a1b22c") == "aNbNc"


# --- short-document shingles match the DuckDB oracle --------------------------

def test_short_doc_shingles_match_oracle(tmp_path):
    from goskyr_spark.spark.session import get_spark
    from goskyr_spark.ops.dedup import ngram_jaccard_pairs, shingles_expr
    from pyspark.sql import functions as F

    spark = get_spark(app="r2-shingles", master="local[2]",
                      shuffle_partitions=2)
    rows = [(0, "just two"), (1, "one"), (2, ""),
            (3, "alpha beta gamma delta"), (4, "alpha beta gamma delta")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["sh"] for r in docs.select(
        "doc_id", shingles_expr().alias("sh")).collect()}
    assert got[0] == [] and got[1] == [] and got[2] == []
    assert got[3] == ["alpha beta gamma", "beta gamma delta"]

    pairs = ngram_jaccard_pairs(docs, threshold=0.2).collect()
    assert [(r["id_a"], r["id_b"], r["jaccard"]) for r in pairs] == \
        [(3, 4, 1.0)]

    # DuckDB comprehension on the same rows produces the same shingles
    con = duckdb.connect()
    con.execute("CREATE TABLE documents AS SELECT * FROM (VALUES "
                + ", ".join(f"({i}, '{t}')" for i, t in rows)
                + ") t(doc_id, text)")
    ora = con.execute("""
        SELECT doc_id,
               [array_to_string(w[i:i+2], ' ')
                for i in range(1, greatest(len(w) - 2, 0) + 1)] AS sh
        FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w
              FROM documents) ORDER BY doc_id""").fetchall()
    for doc_id, sh in ora:
        assert list(sh) == got[doc_id], f"doc {doc_id}"


# --- mixed-case host: one robots/politeness identity ---------------------------

MIXED_CFG = """
scrapers:
  - name: t
    url: x
    item: div.e
    fields:
      - name: t
        location: {selector: span.t}
"""


def test_mixed_case_host_robots_enforced(tmp_path):
    """A seed whose host has mixed case must still join the robots table
    (lowercased host identity everywhere)."""
    from goskyr_spark.spark.crawl import CrawlEngine
    from goskyr_spark.spark.session import get_spark

    spark = get_spark(app="r2-host", master="local[2]",
                      shuffle_partitions=2)
    pages = spark.createDataFrame(
        [("https://MixedCase.test/robots.txt",
          b"User-agent: *\nDisallow: /list\n"),
         ("https://MixedCase.test/list/1",
          b'<div class="e"><span class="t">x</span></div>')],
        "url string, html binary")

    def factory(host):
        return loads_config(MIXED_CFG).scrapers[0]

    eng = CrawlEngine(spark, str(tmp_path / "wd"), pages, factory,
                      ["https://MixedCase.test/list/1"],
                      now=datetime(2026, 3, 1, tzinfo=timezone.utc))
    eng.run(max_rounds=3)
    from goskyr_spark.spark.crawl import FETCHED_SCHEMA

    rows = eng.t_fetched.read(spark, schema=FETCHED_SCHEMA).collect()
    assert len(rows) == 1
    assert rows[0]["status"] == "robots"
    assert rows[0]["host"] == "mixedcase.test"
