"""Round-2 regression tests for ADVICE.md findings: self-closing
non-void elements, Go Expand replacement semantics, short-document
shingles, and host-case normalization in crawl mode."""

import sys, os
from datetime import datetime, timezone

import duckdb
import pytest
from pyspark.sql import functions as F

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


# --- crawl mode: max_pages + on_subpage (round-2 verdict items 6) --------------

PAGINATED_CFG = """
scrapers:
  - name: t
    url: x
    item: div.e
    fields:
      - name: t
        location: {selector: span.t}
    paginator:
      location: {selector: a.next}
      max_pages: 2
"""


def _list_page(i, n_pages):
    nxt = (f'<a class="next" href="/list/{i+1}">next</a>'
           if i < n_pages else "")
    return (f'<div class="e"><span class="t">item{i}</span></div>{nxt}'
            .encode())


def test_crawl_max_pages_caps_pagination(tmp_path):
    """paginator.max_pages=2: the crawl fetches list/1 and list/2, and the
    pagination outlink to list/3 is never enqueued (scraper.go:574,600)."""
    from goskyr_spark.spark.crawl import CrawlEngine, FETCHED_SCHEMA
    from goskyr_spark.spark.session import get_spark

    spark = get_spark(app="r2-maxpages", master="local[2]",
                      shuffle_partitions=2)
    pages = spark.createDataFrame(
        [(f"https://pag.test/list/{i}", _list_page(i, 4))
         for i in range(1, 5)], "url string, html binary")

    def factory(host):
        return loads_config(PAGINATED_CFG).scrapers[0]

    eng = CrawlEngine(spark, str(tmp_path / "wd"), pages, factory,
                      ["https://pag.test/list/1"],
                      now=datetime(2026, 3, 1, tzinfo=timezone.utc))
    eng.run(max_rounds=10)
    fetched = sorted(r["url"] for r in
                     eng.t_fetched.read(spark, schema=FETCHED_SCHEMA)
                     .collect())
    assert fetched == ["https://pag.test/list/1",
                       "https://pag.test/list/2"]

    # unbounded (max_pages absent → 0) follows the whole chain
    def factory0(host):
        cfg = loads_config(PAGINATED_CFG.replace("      max_pages: 2\n", ""))
        return cfg.scrapers[0]

    eng0 = CrawlEngine(spark, str(tmp_path / "wd0"), pages, factory0,
                       ["https://pag.test/list/1"],
                       now=datetime(2026, 3, 1, tzinfo=timezone.utc))
    eng0.run(max_rounds=10)
    assert eng0.t_fetched.read(spark, schema=FETCHED_SCHEMA).count() == 4


def test_crawl_subpage_fields_match_batch_pipeline(tmp_path):
    """on_subpage config in crawl mode: items_final() (crawl + stage-2
    join) must equal the batch pipeline over the same pages."""
    from goskyr_spark.spark.crawl import CrawlEngine
    from goskyr_spark.spark.pipeline import extract_items
    from goskyr_spark.spark.session import get_spark
    from goskyr_spark.synth import (SynthSpec, event_scraper, host_name,
                                    synth_pages_df)

    spark = get_spark(app="r2-subpage", master="local[2]",
                      shuffle_partitions=2)
    spec = SynthSpec(n_hosts=2, pages_per_host=2, items_per_page=3,
                     hot_hosts=0, hot_factor=1)
    pages = synth_pages_df(spark, spec, include_fixtures=False).cache()
    now = datetime(2026, 3, 1, tzinfo=timezone.utc)

    def factory(host):
        return event_scraper(host if host != "proto.invalid"
                             else host_name(0), subpage=True)

    eng = CrawlEngine(spark, str(tmp_path / "wd"), pages, factory,
                      [f"https://{host_name(h)}/list/1"
                       for h in range(spec.n_hosts)], now=now)
    eng.run(max_rounds=10)
    crawl_items = eng.items_final()
    assert "desc" in crawl_items.columns
    got = sorted(tuple(r[c] for c in sorted(crawl_items.columns))
                 for r in crawl_items.collect())
    assert got, "crawl produced no items"
    assert all(r["desc"] for r in crawl_items.collect()), \
        "subpage field not extracted"

    # batch-pipeline oracle per host over list pages only
    expected = []
    for h in range(spec.n_hosts):
        host = host_name(h)
        hp = pages.filter(F.col("url").startswith(f"https://{host}/"))
        items, _ = extract_items(hp, event_scraper(host, subpage=True),
                                 now=now)
        expected.extend(tuple(r[c] for c in sorted(items.columns))
                        for r in items.collect())
    assert got == sorted(expected)


# --- interaction config plumbing + dynamic paginator ---------------------------

def test_interaction_config_parsing():
    cfg = loads_config("""
scrapers:
  - name: t
    url: x
    item: div.e
    fetcher: {type: dynamic}
    interaction:
      - {type: click, selector: "button.more", count: 3, delay: 250}
      - {type: scroll}
    fields:
      - name: t
        location: {selector: span.t}
""")
    sc = cfg.scrapers[0]
    assert len(sc.interaction) == 2
    i0, i1 = sc.interaction
    assert (i0.type, i0.selector, i0.count, i0.delay) == \
        ("click", "button.more", 3, 250)
    assert (i1.type, i1.count, i1.delay) == ("scroll", 0, 0)


def test_dynamic_fetcher_action_plan():
    """build_actions compiles the reference's chromedp plan: navigate,
    page-load sleep, click xCount (default 1) each followed by delay
    (default 500ms), scroll+delay; unknown types skipped with warning."""
    from goskyr_spark.config import Interaction
    from goskyr_spark.spark.fetchers import DynamicFetcher, FetchOpts

    f = DynamicFetcher()
    opts = FetchOpts(interaction=[
        Interaction(type="click", selector="a.next", count=2, delay=100),
        Interaction(type="scroll"),
        Interaction(type="hover", selector="x"),  # unknown → warn+skip
    ])
    plan = f.build_actions("https://u", opts)
    assert plan == [
        ("navigate", "https://u"), ("sleep_ms", 2000),
        ("click_if_present", "a.next"), ("sleep_ms", 100),
        ("click_if_present", "a.next"), ("sleep_ms", 100),
        ("scroll_bottom",), ("sleep_ms", 500),
        ("outer_html",),
    ]
    # defaults: count 1, delay 500
    plan1 = f.build_actions("u", FetchOpts(interaction=[
        Interaction(type="click", selector="s")]))
    assert plan1[2:4] == [("click_if_present", "s"), ("sleep_ms", 500)]
    import pytest as _pytest

    with _pytest.raises(NotImplementedError):
        f.fetch("https://u")


DYN_PAGE_CFG = """
scrapers:
  - name: t
    url: "https://dyn.test/list"
    item: div.e
    fetcher: {type: dynamic}
    fields:
      - name: t
        location: {selector: span.t}
    paginator:
      location: {selector: a.next}
      max_pages: 3
"""


def _dyn_page(page, last):
    nxt = '<a class="next">more</a>' if page < last else ""
    return f'<div class="e"><span class="t">p{page}</span></div>{nxt}'


def test_dynamic_paginator_clicks_same_url():
    """Dynamic pagination re-fetches the SAME url with click-count
    interactions (scraper.go:568-585), bounded by max_pages and by the
    selector disappearing."""
    from goskyr_spark.kernels.scrape import scrape_local

    calls = []

    def fetch(url, opts=None):
        clicks = 0
        if opts is not None and opts.interaction:
            ia = opts.interaction[0]
            assert ia.type == "click" and ia.selector == "a.next"
            clicks = ia.count
        calls.append((url, clicks))
        return _dyn_page(clicks + 1, last=5)

    sc = loads_config(DYN_PAGE_CFG).scrapers[0]
    items, stats = scrape_local(sc, fetch)
    assert [i["t"] for i in items] == ["p1", "p2", "p3"]  # max_pages=3
    assert calls == [("https://dyn.test/list", 0),
                     ("https://dyn.test/list", 1),
                     ("https://dyn.test/list", 2)]

    # selector disappears before max_pages → stops early
    def fetch2(url, opts=None):
        clicks = opts.interaction[0].count if opts and opts.interaction \
            else 0
        return _dyn_page(clicks + 1, last=2)

    sc2 = loads_config(DYN_PAGE_CFG.replace("max_pages: 3",
                                            "max_pages: 0")).scrapers[0]
    items2, _ = scrape_local(sc2, fetch2)
    assert [i["t"] for i in items2] == ["p1", "p2"]


def test_debug_pages_sink_and_html_dump(tmp_path):
    """S8: crawl debug mode appends fetched pages to a debug_pages
    snapshot table; write_html_debug mirrors writeHTMLToFile."""
    from goskyr_spark.spark.crawl import CrawlEngine
    from goskyr_spark.spark.fetchers import write_html_debug
    from goskyr_spark.spark.session import get_spark

    p = write_html_debug("https://h.test/a/b", "<p>x</p>",
                         str(tmp_path / "dbg"))
    assert p.endswith(".html") and "h.test-" in p
    assert open(p).read() == "<p>x</p>"

    spark = get_spark(app="r2-debug", master="local[2]",
                      shuffle_partitions=2)
    pages = spark.createDataFrame(
        [("https://d.test/list/1",
          b'<div class="e"><span class="t">x</span></div>')],
        "url string, html binary")

    def factory(host):
        return loads_config(MIXED_CFG).scrapers[0]

    eng = CrawlEngine(spark, str(tmp_path / "wd"), pages, factory,
                      ["https://d.test/list/1"], debug=True,
                      now=datetime(2026, 3, 1, tzinfo=timezone.utc))
    eng.run(max_rounds=3)
    rows = eng.t_debug.read(spark).collect()
    assert len(rows) == 1
    assert rows[0]["url"] == "https://d.test/list/1"
    assert bytes(rows[0]["html"]).startswith(b'<div class="e">')
