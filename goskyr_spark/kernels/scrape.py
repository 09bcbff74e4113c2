"""Per-page scrape kernel + a local whole-scrape driver.

``scrape_page`` is the unit the Spark pipeline vectorizes: one (url,
html) in, main-page items out, replicating the reference's item loop
(/root/reference/internal/scraper/scraper.go:356-431) — static fields,
field-order extraction with the filter-fast short circuit, error
counting. Subpage fields are intentionally NOT fetched here: in the
distributed plan they are a dedup→fetch→join stage (SURVEY §2.1 S7); the
kernel only records which subpage URL each item needs.

``scrape_local`` runs the full reference lifecycle (pagination loop,
subpage memo-fetch, final filter, hidden-field removal, guessYear) over a
fetch callback — this is the parity oracle used by tests and by the
mock-config e2e check.
"""

from __future__ import annotations

from datetime import datetime, timezone

from . import css
from .dom import parse_html
from .extract import (
    extract_field,
    extract_raw_field,
    get_base_url,
    get_url_string,
    guess_year,
)
from .filters import filter_item, initialize_filters
from .gocompat import GoskyrError


class PageResult:
    __slots__ = ("items", "nr_errors", "next_page_url", "needs_subpage",
                 "has_next_selector")

    def __init__(self, items, nr_errors, next_page_url, needs_subpage,
                 has_next_selector=False):
        self.items = items
        self.nr_errors = nr_errors
        self.next_page_url = next_page_url
        self.needs_subpage = needs_subpage
        # the paginator selector matched a node on this page — the
        # dynamic paginator's continue condition (scraper.go:570-572),
        # independent of whether that node has a usable href
        self.has_next_selector = has_next_selector


def scrape_page(scraper, page_url, html, filters=None, now=None,
                raw_dyn=False):
    """Extract main-page fields for every item node on one page.

    Returns PageResult: items is a list of dicts (item field values plus
    ``_item_idx``); dropped items are counted in nr_errors. Items that
    still need subpage fields carry them unextracted — the caller joins
    the subpage stage later and must re-run final filtering.
    """
    doc = parse_html(html)
    if filters is None:
        filters = initialize_filters(scraper, now=now)
    base_url = get_base_url(page_url, doc)
    items = []
    nr_errors = 0
    subpage_fields = [f for f in scraper.fields
                      if f.on_subpage != "" and f.value == ""]
    for idx, node in enumerate(css.find(doc, scraper.item)):
        current = {}
        dropped = False
        for f in scraper.fields:
            if f.value != "":
                if not raw_dyn:
                    current[f.name] = f.value
            else:
                if f.on_subpage == "":
                    try:
                        if raw_dyn:
                            extract_raw_field(f, current, [node])
                        else:
                            extract_field(f, current, [node], base_url,
                                          now=now)
                    except GoskyrError:
                        nr_errors += 1
                        dropped = True
                        break
                # filter fast (scraper.go:381-389)
                if not filter_item(filters, current):
                    dropped = True
                    break
        if dropped:
            continue
        current["_item_idx"] = idx
        items.append(current)

    next_page_url = ""
    has_next_selector = False
    if scraper.paginator.location.selector:
        has_next_selector = bool(
            css.find(doc, scraper.paginator.location.selector))
        try:
            next_page_url = get_url_string(scraper.paginator.location,
                                           [doc], base_url)
        except GoskyrError:
            next_page_url = ""
    return PageResult(items, nr_errors, next_page_url, bool(subpage_fields),
                      has_next_selector)


def extract_subpage_fields(scraper, item, subpage_htmls, filters=None,
                           now=None):
    """Stage-2 kernel: apply on_subpage fields given {url: html}.

    Mirrors scraper.go:392-422 (memoized subDocs + per-field extraction +
    filter-fast). Returns (ok, nr_errors); mutates item.
    """
    if filters is None:
        filters = initialize_filters(scraper, now=now)
    sub_docs = {}
    for f in scraper.fields:
        if f.on_subpage != "" and f.value == "":
            subpage_url = str(item.get(f.on_subpage, ""))
            if subpage_url not in sub_docs:
                html = subpage_htmls.get(subpage_url)
                if html is None:
                    return False, 1
                sub_docs[subpage_url] = parse_html(html)
            doc = sub_docs[subpage_url]
            base = get_base_url(subpage_url, doc)
            try:
                extract_field(f, item, [doc], base, now=now)
            except GoskyrError:
                return False, 1
            if not filter_item(filters, item):
                return False, 0
    return True, 0


def finalize_items(scraper, items, filters=None, now=None,
                   ref_now=None):
    """Final filter → hidden-field removal → guessYear (scraper.go:425-440).

    ``items`` must already be in crawl order (page, then item index)."""
    if filters is None:
        filters = initialize_filters(scraper, now=now)
    kept = []
    for item in items:
        clean = {k: v for k, v in item.items() if not k.startswith("_")}
        if filter_item(filters, clean):
            for f in scraper.fields:
                if f.hide:
                    clean.pop(f.name, None)
            kept.append(clean)
    guess_year(scraper.fields, kept,
               ref_now or datetime.now(timezone.utc))
    return kept


def scrape_local(scraper, fetch, now=None, raw_dyn=False, max_rounds=1000):
    """Full reference-semantics scrape over a fetch callback
    (url -> html string or None). The parity oracle for tests.

    Returns (items, stats) where stats = {'nrItems', 'nrErrors'}.
    """
    filters = initialize_filters(scraper, now=now)
    stats = {"nrItems": 0, "nrErrors": 0}
    all_items = []

    page_url = scraper.url
    dynamic = scraper.fetcher.type == "dynamic"
    if dynamic:
        # dynamic configs take an opts-aware fetch callback; the initial
        # load replays the scraper-level interactions (scraper.go:351)
        from ..spark.fetchers import FetchOpts

        html = fetch(page_url,
                     FetchOpts(interaction=list(scraper.interaction)))
    else:
        html = fetch(page_url)
    if html is None:
        raise GoskyrError(f"page {page_url} could not be fetched")
    current_page = 0
    while True:
        pr = scrape_page(scraper, page_url, html, filters=filters, now=now,
                         raw_dyn=raw_dyn)
        stats["nrErrors"] += pr.nr_errors
        for item in pr.items:
            if not raw_dyn and pr.needs_subpage:
                ok, errs = extract_subpage_fields(
                    scraper, item,
                    _FetchDict(fetch), filters=filters, now=now)
                stats["nrErrors"] += errs
                if not ok:
                    continue
            clean = {k: v for k, v in item.items() if not k.startswith("_")}
            if filter_item(filters, clean):
                for f in scraper.fields:
                    if f.hide:
                        clean.pop(f.name, None)
                all_items.append(clean)
                stats["nrItems"] += 1
        current_page += 1
        if current_page >= max_rounds:
            break
        mp = scraper.paginator.max_pages
        if dynamic and scraper.paginator.location.selector:
            # dynamic paginator (scraper.go:568-585): the next page is the
            # SAME url re-fetched with the paginator selector clicked
            # current_page times (clicks restart on every re-fetch)
            if not pr.has_next_selector or (mp and current_page >= mp):
                break
            from ..config import Interaction
            from ..spark.fetchers import FetchOpts

            ia = Interaction(type=Interaction.TYPE_CLICK,
                             selector=scraper.paginator.location.selector,
                             count=current_page)
            html = fetch(page_url, FetchOpts(interaction=[ia]))
            if html is None:
                break
        else:
            if not pr.next_page_url:
                break
            if mp and current_page >= mp:
                break
            page_url = pr.next_page_url
            html = fetch(page_url)
            if html is None:
                break
    guess_year(scraper.fields, all_items,
               (now or datetime.now(timezone.utc)))
    return all_items, stats


class _FetchDict(dict):
    """dict-like over a fetch callback (for extract_subpage_fields)."""

    def __init__(self, fetch):
        super().__init__()
        self._fetch = fetch

    def get(self, url, default=None):
        if url in self:
            return self[url]
        html = self._fetch(url)
        if html is not None:
            self[url] = html
            return html
        return default
