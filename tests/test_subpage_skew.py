"""Stage-2 subpage join at skew (judge round-4 ask #7): one list page
linking 10^4 detail URLs, plus the key-skew variant where every item
points at ONE shared detail URL. Asserts correctness AND that the join
strategy is AQE-decided (no forced broadcast/shuffle hint)."""

from datetime import datetime, timezone

import pytest

from goskyr_spark.config import loads_config
from goskyr_spark.spark.pipeline import (extract_stage1,
                                         extract_stage2_subpages,
                                         finalize_items_df)

NOW = datetime(2026, 3, 1, tzinfo=timezone.utc)
N = 10_000

SCRAPER_YAML = """
scrapers:
  - name: skew
    url: "https://skew.test/list"
    item: div.e
    fields:
      - name: title
        location: {selector: span.t}
      - name: url
        type: url
        location: {selector: a.u, attr: href}
      - name: desc
        on_subpage: url
        location: {selector: .desc}
"""


@pytest.fixture(scope="module")
def spark():
    from goskyr_spark.spark.session import get_spark

    return get_spark(app="subpage-skew-tests", master="local[4]",
                     shuffle_partitions=8)


def _pages(spark, detail_url):
    """One list page with N items; detail_url(i) gives each item's
    subpage link. Detail pages exist for every DISTINCT link."""
    items_html = "".join(
        f'<div class="e"><span class="t">t{i}</span>'
        f'<a class="u" href="{detail_url(i)}">x</a></div>'
        for i in range(N))
    rows = [("https://skew.test/list", items_html.encode())]
    seen = set()
    for i in range(N):
        u = detail_url(i)
        if u not in seen:
            seen.add(u)
            rows.append((u, f'<div class="desc">d{i}</div>'.encode()))
    return spark.createDataFrame(rows, "url string, html binary")


def _run(spark, pages):
    scraper = loads_config(SCRAPER_YAML).scrapers[0]
    stage1 = extract_stage1(
        pages.filter(pages.url == "https://skew.test/list"),
        scraper, now=NOW)
    stage2 = extract_stage2_subpages(stage1, pages, scraper, now=NOW)
    return finalize_items_df(stage2, scraper, now=NOW)


def test_one_list_page_fans_out_10k_details(spark):
    pages = _pages(spark, lambda i: f"https://skew.test/d/{i}")
    out = _run(spark, pages)

    # the join carries no forced hint — strategy is AQE's call
    analyzed = out._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" not in analyzed, analyzed

    rows = out.select("title", "desc").collect()
    assert len(rows) == N
    got = {r["title"]: r["desc"] for r in rows}
    assert got["t0"] == "d0" and got[f"t{N-1}"] == f"d{N-1}"
    assert all(got[f"t{i}"] == f"d{i}" for i in range(0, N, 997))


def test_key_skew_all_items_share_one_detail_url(spark):
    # 10^4 items -> ONE detail page: the worst join-key skew the
    # stage-2 shape can see (the shared url is also the fetch-dedup:
    # one page row serves every item)
    pages = _pages(spark, lambda i: "https://skew.test/d/shared")
    out = _run(spark, pages)
    rows = out.select("title", "desc").collect()
    assert len(rows) == N
    assert {r["desc"] for r in rows} == {"d0"}
