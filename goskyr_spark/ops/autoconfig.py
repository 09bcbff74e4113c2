"""Automatic config generation from a sample page (the reference's
`goskyr generate`, /root/reference/internal/generate/).

Same pipeline shape as the reference — discover candidate fields (G1:
every trimmed text node and the allowed attributes a[href,title],
img[src,title], keyed by their DOM path with nth-child disambiguation of
repeated siblings), strip the repetition point (G2), merge aligned paths
(G3 squash), drop rare/constant candidates (G4 min-occurrence +
only-varying), infer the shared item selector as the longest common path
prefix (G6), and label fields (G7: positional names, or a KNN model from
ops.mlfeatures) — re-expressed over this repo's DOM instead of a
streaming tokenizer. Date-typed fields get their layout/language from
kernels.dateformat (G8).

The generated config is immediately runnable by the scrape kernels and
the Spark pipeline; ``generate_and_verify`` round-trips it through
scrape_page as a self-check.
"""

from __future__ import annotations

from collections import defaultdict

from ..config import Scraper, Field, ElementLocation, CoveredDateParts
from ..kernels import css
from ..kernels.dateformat import get_date_format_multi
from ..kernels.dom import ELEMENT, TEXT, parse_html

ALLOWED_ATTRS = {"a": ("href", "title"), "img": ("src", "title")}


def _node_step(el):
    """Selector step for one element: tag.classes (classes sorted for a
    stable signature; the reference keeps source order — either is a
    valid CSS selector for the same nodes)."""
    classes = sorted(el.class_set())
    return el.tag + "".join("." + c for c in classes)


def _nth_of_tag(el):
    """1-based position among same-tag element siblings + total count."""
    if el.parent is None:
        return 1, 1
    idx = 0
    total = 0
    for sib in el.parent.children:
        if sib.type == ELEMENT and sib.tag == el.tag:
            total += 1
            if sib is el:
                idx = total
    return idx, total


def _path_of(el):
    """Path signature from root to el; repeated same-signature siblings
    are disambiguated with :nth-child so distinct columns inside one item
    don't merge (reference fieldmanager.go:186-321)."""
    steps = []
    cur = el
    while cur is not None and cur.type == ELEMENT:
        step = _node_step(cur)
        # disambiguate only among same tag+classes siblings
        same = [s for s in (cur.parent.children if cur.parent else [])
                if s.type == ELEMENT and _node_step(s) == step]
        if len(same) > 1:
            pos = same.index(cur) + 1
            step += f":nth-of-type({pos})"
        steps.append(step)
        cur = cur.parent
    return tuple(reversed(steps))


def discover_fields(html, min_occ=5, only_varying=True):
    """G1+G2+G3+G4: candidate fields with aligned paths.

    Returns (doc, candidates); candidate = dict(path, attr, examples).
    The 'squash' merge happens by erasing :nth-of-type suffixes at and
    below the repetition point and grouping."""
    doc = parse_html(html)
    raw = []  # (path, attr, example)
    for el in doc.iter_elements():
        for attr in ALLOWED_ATTRS.get(el.tag, ()):
            v = el.attrs.get(attr)
            if v and v.strip():
                raw.append((_path_of(el), attr, v.strip()))
        t_index = 0
        for child in el.children:
            if child.type == TEXT:
                txt = child.data.strip()
                if txt:
                    raw.append((_path_of(el) + (f"#text{t_index}",), "",
                                txt))
                t_index += 1

    # find the repetition point: the path depth where stripping
    # nth-of-type makes ≥ min_occ raw candidates coincide (G2)
    def strip_from(path, depth):
        return tuple(
            (p.split(":nth-of-type")[0] if i >= depth else p)
            for i, p in enumerate(path))

    best = defaultdict(list)
    for path, attr, ex in raw:
        # strip every nth-of-type below the shallowest repeated level:
        # group key = fully stripped path; alignment across items
        key = (strip_from(path, 0), attr)
        best[key].append((path, ex))

    candidates = []
    for (spath, attr), entries in sorted(best.items()):
        examples = [e for _, e in entries]
        if len(examples) < min_occ:
            continue
        if only_varying and len(set(examples)) <= 1:
            continue
        candidates.append({
            "path": spath,
            "attr": attr,
            "examples": examples,
            "count": len(examples),
        })
    return doc, candidates


def _common_prefix(paths):
    if not paths:
        return ()
    pre = list(paths[0])
    for p in paths[1:]:
        i = 0
        while i < len(pre) and i < len(p) and pre[i] == p[i]:
            i += 1
        pre = pre[:i]
    return tuple(pre)


def _selector(steps):
    return " > ".join(steps)


def infer_scraper(html, url="", min_occ=5, only_varying=True,
                  labeler=None, name="generated"):
    """G6+G7+G8: item selector + field configs from discovered candidates.

    ``labeler(examples, index) -> name`` overrides the positional naming
    (plug a KNN model's predictions in here)."""
    doc, candidates = discover_fields(html, min_occ, only_varying)
    if not candidates:
        return None
    field_paths = [c["path"][:-1] if c["path"][-1].startswith("#text")
                   else c["path"] for c in candidates]
    item_path = _common_prefix(field_paths)
    # the item node itself must repeat; walk back until the selector
    # matches ≥ min_occ nodes (reference trimPrefix keeps ≥3 segments)
    while item_path:
        found = css.find(doc, _selector(item_path))
        if len(found) >= min_occ:
            break
        item_path = item_path[:-1]
    if not item_path:
        return None

    fields = []
    for i, c in enumerate(candidates):
        rel = list(c["path"][len(item_path):])
        text_idx = 0
        if rel and rel[-1].startswith("#text"):
            text_idx = int(rel[-1][5:])
            rel = rel[:-1]
        sel = _selector(rel)
        fname = labeler(c["examples"], i) if labeler else f"field-{i}"
        # G8: date detection — if a known layout covers the examples
        fmt, lang = get_date_format_multi(
            c["examples"][: min(10, len(c["examples"]))],
            CoveredDateParts(day=True, month=True, year=True, time=True))
        is_date = fmt and "2006" in fmt and ("15" in fmt or "3" in fmt) \
            and "1" in fmt
        if c["attr"] == "href":
            fields.append(Field(name=fname, type="url", location=[
                ElementLocation(selector=sel)]))
        elif is_date:
            from ..config import DateComponent

            fields.append(Field(
                name=fname, type="date",
                components=[DateComponent(
                    covers=CoveredDateParts(day=True, month=True, year=True,
                                            time=True),
                    location=ElementLocation(selector=sel,
                                             child_index=text_idx),
                    layout=[fmt])],
                date_language=lang or ""))
        else:
            fields.append(Field(name=fname, location=[
                ElementLocation(selector=sel, child_index=text_idx,
                                attr=c["attr"])]))
    return Scraper(name=name, url=url, item=_selector(item_path),
                   fields=fields)


def generate_and_verify(html, url="", min_occ=5, **kw):
    """Generate a scraper config and verify it extracts ≥ min_occ items
    from the sample page (round-trip through the real kernels)."""
    from ..kernels.scrape import scrape_page

    scraper = infer_scraper(html, url, min_occ=min_occ, **kw)
    if scraper is None:
        return None, []
    pr = scrape_page(scraper, url or "https://sample.test/", html)
    return scraper, pr.items
