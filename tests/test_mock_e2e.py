"""End-to-end parity with the reference's mock-fetcher config
(/root/reference/config-mock.yaml): 3 artist items with static fields,
a text field, and a date parsed with layout '2.1.2006 15:04'
(expected values per FIXTURES.md §3)."""

import json
from datetime import datetime, timezone

from goskyr_spark.config import loads_config
from goskyr_spark.kernels.gocompat import go_rfc3339
from goskyr_spark.kernels.scrape import scrape_local

from goskyr_spark.fixtures_html import MOCK_CONFIG, MOCK_PAGE


EXPECTED = [
    ("Final Story", "2025-08-20T20:00:00Z"),
    ("Moment Of Madness", "2025-08-21T21:00:00Z"),
    ("Irony of Fate", "2025-08-22T20:30:00Z"),
]

STATIC = {
    "sourceUrl": "https://mock.url",
    "location": "MockVenue",
    "city": "Zurich",
    "country": "Switzerland",
    "type": "concert",
    "url": "https://mock.url",
}


def test_mock_scrape_items():
    cfg = loads_config(MOCK_CONFIG)
    scraper = cfg.scrapers[0]
    pages = {"https://mock.url": MOCK_PAGE}
    items, stats = scrape_local(scraper, pages.get)
    assert stats == {"nrItems": 3, "nrErrors": 0}
    assert len(items) == 3
    for item, (title, rfc) in zip(items, EXPECTED):
        for k, v in STATIC.items():
            assert item[k] == v
        assert item["title"] == title
        assert isinstance(item["date"], datetime)
        assert go_rfc3339(item["date"]) == rfc


def test_mock_scrape_json_bytes():
    """File-writer byte shape (reference internal/output/file.go:42-82):
    sorted keys, two-space indent, RFC3339 dates, no HTML escaping."""
    from goskyr_spark.io.writers import items_to_json_array

    cfg = loads_config(MOCK_CONFIG)
    items, _ = scrape_local(cfg.scrapers[0],
                            {"https://mock.url": MOCK_PAGE}.get)
    out = items_to_json_array(items)
    parsed = json.loads(out)
    assert parsed[0]["title"] == "Final Story"
    assert parsed[0]["date"] == "2025-08-20T20:00:00Z"
    # Go writes keys sorted and doesn't escape '&<>'
    assert out.index('"city"') < out.index('"country"') < out.index('"date"')
    assert "\\u0026" not in items_to_json_array([{"t": "a & b < c"}])
