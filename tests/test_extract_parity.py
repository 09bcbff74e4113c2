"""Parity tests ported from the reference's own table-driven suites
(/root/reference/internal/scraper/scraper_test.go:375-705 and :707-1238).
Expected values are copied verbatim — this is the byte-identical
extraction gate."""

from datetime import datetime, timezone
from zoneinfo import ZoneInfo

import pytest

from goskyr_spark.config import (
    DateComponent,
    ElementLocation,
    Field,
    RegexConfig,
    TransformConfig,
)
from goskyr_spark.kernels.dom import parse_html
from goskyr_spark.kernels.extract import (
    extract_field,
    get_date,
    get_raw_date_components,
    guess_year,
)
from goskyr_spark.kernels.gocompat import GoskyrError

from fixtures_html import (
    HTML1, HTML2, HTML3, HTML4, HTML5, HTML6, HTML7, HTML8, HTML9, HTML10,
    HTML11,
)


def _run(html, field, base_url=""):
    doc = parse_html(html)
    item = {}
    extract_field(field, item, [doc], base_url)
    return item[field.name]


# --- TestExtractFieldUrlOrText (scraper_test.go:375-705) ---------------------

CASES = {
    "text": (
        HTML1,
        Field(name="title", location=[ElementLocation(selector=".artist-name")]),
        "", "Final Story", None),
    "text entire subtree": (
        HTML1,
        Field(name="title", location=[ElementLocation(
            selector=".artist-teaser", entire_subtree=True)]),
        "",
        "Final Story\n                                                    Aargau",
        None),
    "text all nodes": (
        HTML1,
        Field(name="title", location=[ElementLocation(
            selector=".artist-name", all_nodes=True, separator=", ")]),
        "", "Final Story, Moment Of Madness, Irony of Fate", None),
    "text entire subtree all nodes": (
        HTML8,
        Field(name="title", location=[ElementLocation(
            selector=".artist", entire_subtree=True, all_nodes=True,
            separator=", ")]),
        "",
        "CJ Bolland (Bonzai, BE), M.I.K.E. PUSH (Bonzai, BE), "
        "Bonzai All Stars (Bonzai, BE), Madwave",
        None),
    "text regex": (
        HTML1,
        Field(name="time", location=[ElementLocation(
            selector="a.event-date",
            regex_extract=RegexConfig(exp="[0-9]{2}:[0-9]{2}"))]),
        "", "20:00", None),
    "text regex index -1": (
        HTML1,
        Field(name="time", location=[ElementLocation(
            selector="a.event-date",
            regex_extract=RegexConfig(exp="[0-9]{2}", index=-1))]),
        "", "00", None),
    "text regex index -n": (
        HTML1,
        Field(name="time", location=[ElementLocation(
            selector="a.event-date",
            regex_extract=RegexConfig(exp="[0-9]{2}", index=-2))]),
        "", "20", None),
    "text regex positive out of bound": (
        HTML1,
        Field(name="time", location=[ElementLocation(
            selector="a.event-date",
            regex_extract=RegexConfig(exp="[0-9]{2}:[0-9]{2}", index=1))]),
        "", None,
        "regex index out of bounds. regex '[0-9]{2}:[0-9]{2}' gave only 1 "
        "matches, string was: Fr, 10.03.2023 - 20:00"),
    "text regex negative out of bound": (
        HTML1,
        Field(name="time", location=[ElementLocation(
            selector="a.event-date",
            regex_extract=RegexConfig(exp="[0-9]{2}", index=-7))]),
        "", None,
        "regex index out of bounds. regex '[0-9]{2}' gave only 6 matches, "
        "string was: Fr, 10.03.2023 - 20:00"),
    "text regex expression error": (
        HTML1,
        Field(name="time", location=[ElementLocation(
            selector="a.event-date",
            regex_extract=RegexConfig(exp=".***"))]),
        "", None,
        "error parsing regexp: invalid nested repetition operator: `**`"),
    "text json": (
        HTML9,
        Field(name="title", location=[ElementLocation(
            selector='script[type="application/ld+json"]',
            json_selector="//startDate")]),
        "", "2025-06-03T19:00:00.000Z", None),
    "text json error": (
        HTML10,
        Field(name="title", location=[ElementLocation(
            selector='script[type="application/ld+json"]',
            json_selector="//startDate")]),
        "", None,
        "JSON: invalid character 'h' in literal true (expecting 'r') : "
        "this is no json"),
    "text default": (
        HTML5,
        Field(name="title", location=[ElementLocation(
            selector=".non-existent", default="default value")]),
        "", "default value", None),
    "text no default": (
        HTML4,
        Field(name="title", location=[ElementLocation(
            selector="div > a > div", default="default value")]),
        "", "Treffpunkt", None),
    "text transform": (
        HTML4,
        Field(name="title",
              location=[ElementLocation(selector="div > a > div")],
              transform=[TransformConfig(type="regex-replace",
                                         regex="p[a-z]+n", replace="xxx")]),
        "", "Treffxxxkt", None),
    "url needs base url": (
        HTML1,
        Field(name="url", type="url",
              location=[ElementLocation(selector="a.event-date")]),
        "https://www.dachstock.ch/events",
        "https://www.dachstock.ch/events/10-03-2023-krachstock-final-story",
        None),
    "url no base url": (
        HTML2,
        Field(name="url", type="url",
              location=[ElementLocation(selector="h2 > a")]),
        "https://www.eventfabrik-muenchen.de/events?s=&tribe_events_cat="
        "konzert&tribe_events_venue=&tribe_events_month=",
        "https://www.eventfabrik-muenchen.de/event/"
        "heinz-rudolf-kunze-verstaerkung-2/",
        None),
    "url only query params": (
        HTML3,
        Field(name="url", type="url",
              location=[ElementLocation(selector="h2 > a")]),
        "https://www.eventfabrik-muenchen.de/events?s=&tribe_events_cat="
        "konzert&tribe_events_venue=&tribe_events_month=",
        "https://www.eventfabrik-muenchen.de/events?bli=bla",
        None),
    "url file": (
        HTML4,
        Field(name="url", type="url",
              location=[ElementLocation(selector="div > a")]),
        "https://www.roxy.ulm.de/programm/programm.php",
        "https://www.roxy.ulm.de/programm/programm.php?m=4&j=2023&vid=4378",
        None),
    "url parent dir": (
        HTML6,
        Field(name="url", type="url",
              location=[ElementLocation(selector="h2 > a")]),
        "http://point11.ch/site/home",
        "http://point11.ch/site/event/id/165",
        None),
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_extract_field_url_or_text(name):
    html, field, base_url, expected, err = CASES[name]
    if err is None:
        assert _run(html, field, base_url) == expected
    else:
        with pytest.raises(GoskyrError) as ei:
            _run(html, field, base_url)
        assert str(ei.value) == err


# --- TestExtractFieldDate (scraper_test.go:707-807) --------------------------

def test_full_date():
    field = Field(
        name="date", type="date",
        components=[DateComponent(
            covers=_covers(day=True, month=True, year=True, time=True),
            location=ElementLocation(selector="a.event-date"),
            layout=["Mon, 02.01.2006 - 15:04"])],
        date_location="Europe/Berlin")
    got = _run(HTML1, field)
    assert got == datetime(2023, 3, 10, 20, 0, tzinfo=ZoneInfo("Europe/Berlin"))
    assert got.utcoffset().total_seconds() == 3600


def test_date_transform():
    field = Field(
        name="date", type="date",
        components=[DateComponent(
            covers=_covers(day=True, month=True, year=True, time=True),
            location=ElementLocation(selector="a.event-date"),
            transform=[TransformConfig(type="regex-replace", regex="\\.",
                                       replace="/")],
            layout=["Mon, 02/01/2006 - 15:04"])],
        date_location="Europe/Berlin")
    got = _run(HTML1, field)
    assert got == datetime(2023, 3, 10, 20, 0, tzinfo=ZoneInfo("Europe/Berlin"))


def _covers(day=False, month=False, year=False, time=False):
    from goskyr_spark.config import CoveredDateParts

    return CoveredDateParts(day=day, month=month, year=year, time=time)


# --- TestGetDate (scraper_test.go:991-1155) ----------------------------------

def _next_leap_year(from_year):
    y = from_year
    while y % 4 != 0:
        y += 1
    return y


def test_get_date_29_feb():
    now = datetime.now()
    field = Field(
        name="date", type="date", guess_year=True,
        components=[
            DateComponent(covers=_covers(day=True, month=True),
                          location=ElementLocation(selector="h2 > a > span"),
                          layout=["02.01."]),
            DateComponent(covers=_covers(time=True),
                          location=ElementLocation(default="19:30"),
                          layout=["15:04"]),
        ],
        date_location="Europe/Berlin")
    doc = parse_html(HTML5)
    got = get_date(field, [doc], now=now)
    leap = _next_leap_year(now.year)
    assert (got.year, got.month, got.day, got.hour, got.minute) == \
        (leap, 2, 29, 19, 30)


def test_get_date_default_component():
    now = datetime.now()
    field = Field(
        name="date", type="date", guess_year=True,
        components=[
            DateComponent(covers=_covers(day=True, month=True),
                          location=ElementLocation(selector="h2 > a > span"),
                          layout=["02.01."]),
            DateComponent(covers=_covers(time=True),
                          location=ElementLocation(selector=".non-existent",
                                                   default="19:30"),
                          layout=["15:04"]),
        ],
        date_location="Europe/Berlin")
    doc = parse_html(HTML7)
    got = get_date(field, [doc], now=now)
    assert (got.year, got.month, got.day, got.hour, got.minute) == \
        (now.year, 2, 20, 19, 30)


def test_get_date_default_component_regex_error():
    now = datetime.now()
    field = Field(
        name="date", type="date", guess_year=True,
        components=[
            DateComponent(covers=_covers(day=True, month=True),
                          location=ElementLocation(
                              selector="h2 > a > span",
                              default="1. April",
                              regex_extract=RegexConfig(exp="[A-Z]{20}",
                                                        ignore_errors=True)),
                          layout=["2. January"]),
            DateComponent(covers=_covers(time=True),
                          location=ElementLocation(selector=".non-existent",
                                                   default="19:30"),
                          layout=["15:04"]),
        ],
        date_location="Europe/Berlin")
    doc = parse_html(HTML7)
    got = get_date(field, [doc], now=now)
    assert (got.year, got.month, got.day, got.hour, got.minute) == \
        (now.year, 4, 1, 19, 30)


def test_get_date_bad_location():
    field = Field(name="date", type="date", date_location="Does/Not/Exist")
    doc = parse_html("")
    with pytest.raises(GoskyrError) as ei:
        get_date(field, [doc])
    assert str(ei.value) == "unknown time zone Does/Not/Exist"


# --- TestGuessYear (scraper_test.go:809-989) ----------------------------------

CET = ZoneInfo("CET")


def _items(dates):
    return [{"date": d} for d in dates]


GUESS_CASES = {
    "simple": (
        [datetime(2023, 12, 2, 20, 30, tzinfo=CET),
         datetime(2023, 12, 24, 21, 30, tzinfo=CET),
         datetime(2023, 1, 2, 20, 0, tzinfo=CET)],
        [datetime(2023, 12, 2, 20, 30, tzinfo=CET),
         datetime(2023, 12, 24, 21, 30, tzinfo=CET),
         datetime(2024, 1, 2, 20, 0, tzinfo=CET)],
        datetime(2023, 11, 30, 20, 30, tzinfo=CET)),
    "unordered": (
        [datetime(2023, 11, 2, 20, 30, tzinfo=CET),
         datetime(2023, 12, 14, 20, 30, tzinfo=CET),
         datetime(2023, 12, 2, 20, 30, tzinfo=CET),
         datetime(2023, 12, 24, 21, 30, tzinfo=CET),
         datetime(2023, 1, 2, 20, 0, tzinfo=CET)],
        [datetime(2023, 11, 2, 20, 30, tzinfo=CET),
         datetime(2023, 12, 14, 20, 30, tzinfo=CET),
         datetime(2023, 12, 2, 20, 30, tzinfo=CET),
         datetime(2023, 12, 24, 21, 30, tzinfo=CET),
         datetime(2024, 1, 2, 20, 0, tzinfo=CET)],
        datetime(2023, 11, 1, 20, 30, tzinfo=CET)),
    "two years span": (
        [datetime(2023, 12, 2, 20, 30, tzinfo=CET),
         datetime(2023, 1, 14, 20, 30, tzinfo=CET),
         datetime(2023, 5, 2, 20, 30, tzinfo=CET),
         datetime(2023, 9, 24, 21, 30, tzinfo=CET),
         datetime(2023, 2, 2, 20, 0, tzinfo=CET)],
        [datetime(2023, 12, 2, 20, 30, tzinfo=CET),
         datetime(2024, 1, 14, 20, 30, tzinfo=CET),
         datetime(2024, 5, 2, 20, 30, tzinfo=CET),
         datetime(2024, 9, 24, 21, 30, tzinfo=CET),
         datetime(2025, 2, 2, 20, 0, tzinfo=CET)],
        datetime(2023, 11, 1, 20, 30, tzinfo=CET)),
    "start before reference": (
        [datetime(2023, 12, 2, 20, 30, tzinfo=CET),
         datetime(2023, 12, 24, 21, 30, tzinfo=CET),
         datetime(2023, 1, 2, 20, 0, tzinfo=CET)],
        [datetime(2023, 12, 2, 20, 30, tzinfo=CET),
         datetime(2023, 12, 24, 21, 30, tzinfo=CET),
         datetime(2024, 1, 2, 20, 0, tzinfo=CET)],
        datetime(2024, 1, 30, 20, 30, tzinfo=CET)),
}


@pytest.mark.parametrize("name", sorted(GUESS_CASES))
def test_guess_year(name):
    dates, expected, ref = GUESS_CASES[name]
    fields = [Field(name="date", type="date", guess_year=True)]
    items = _items(dates)
    guess_year(fields, items, ref)
    got = [i["date"] for i in items]
    assert got == expected


# --- TestGetRawDateComponents (scraper_test.go:1180-1238) ----------------------

def test_raw_date_components():
    field = Field(components=[DateComponent(
        covers=_covers(day=True, month=True, year=True, time=True),
        location=ElementLocation(selector="h3.date > span"))])
    doc = parse_html(HTML11)
    got = get_raw_date_components(field, [doc])
    assert got == {"date-component-day-month-year-time": "12.12.2024 14:30"}


# --- hidden fields (scraper_test.go:1157-1178 semantics) -----------------------

def test_remove_hidden_fields():
    from goskyr_spark.config import Scraper
    from goskyr_spark.kernels.scrape import finalize_items

    scraper = Scraper(fields=[Field(name="hidden", hide=True),
                              Field(name="visible")])
    items = finalize_items(scraper, [{"hidden": "bli", "visible": "bla"}])
    assert items == [{"visible": "bla"}]
