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
    raw = []  # (stripped_path, attr, example, nth)
    # nth = position of the element among same-TAG siblings (CSS
    # :nth-of-type semantics) when same-signature siblings exist —
    # distinguishes repeated sibling columns within one item; None when
    # the element is the only one of its signature under its parent

    def _last_nth(el):
        if el.parent is None:
            return None
        same_sig = [s for s in el.parent.children
                    if s.type == ELEMENT and _node_step(s) == _node_step(el)]
        if len(same_sig) <= 1:
            return None
        pos = 0
        for s in el.parent.children:
            if s.type == ELEMENT and s.tag == el.tag:
                pos += 1
                if s is el:
                    return pos
        return None

    def _stripped(el):
        return tuple(p.split(":nth-of-type")[0] for p in _path_of(el))

    for el in doc.iter_elements():
        nth = _last_nth(el)
        for attr in ALLOWED_ATTRS.get(el.tag, ()):
            v = el.attrs.get(attr)
            if v and v.strip():
                raw.append((_stripped(el), attr, v.strip(), nth))
        # child index counted over ALL sibling node kinds — MUST match
        # the extraction walk (kernels/extract.get_text_string), which
        # counts elements/comments too
        for idx, child in enumerate(el.children):
            if child.type == TEXT:
                txt = child.data.strip()
                if txt:
                    raw.append((_stripped(el) + (f"#text{idx}",), "",
                                txt, nth))

    groups = defaultdict(list)
    for spath, attr, ex, nth in raw:
        groups[(spath, attr)].append((ex, nth))

    def _emit(candidates, spath, attr, nth, examples):
        if len(examples) < min_occ:
            return
        if only_varying and len(set(examples)) <= 1:
            return
        candidates.append({"path": spath, "attr": attr, "nth": nth,
                           "examples": examples, "count": len(examples)})

    candidates = []
    for (spath, attr), entries in sorted(groups.items()):
        by_nth = defaultdict(list)
        for ex, nth in entries:
            by_nth[nth].append(ex)
        # split into per-sibling columns ONLY when each sibling position
        # itself repeats across items (≥ min_occ) — at the item level the
        # positions are 1..N with one entry each and must NOT split
        # (reference: pseudo-classes kept below the repetition point,
        # stripped above it — fieldmanager.go:115-145)
        if (None not in by_nth and len(by_nth) > 1
                and all(len(v) >= min_occ for v in by_nth.values())):
            for nth in sorted(by_nth):
                _emit(candidates, spath, attr, nth, by_nth[nth])
        else:
            _emit(candidates, spath, attr, None,
                  [ex for ex, _ in entries])
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
                  labeler=None, name="generated", select=None):
    """G6+G7+G8: item selector + field configs from discovered candidates.

    ``labeler(examples, index) -> name`` overrides the positional naming
    (plug a KNN model's predictions in here).

    ``select(candidates, names) -> indices`` is the field-selection hook
    (reference fieldSelection, fieldmanager.go:356-373): None keeps every
    candidate (the reference's interactive=false branch); the CLI's
    --interactive passes a stdin-driven table here. Names are assigned
    BEFORE selection, like the reference's table shows them, so a
    subset keeps its original field names. Returns None when the
    selection is empty."""
    doc, candidates = discover_fields(html, min_occ, only_varying)
    if not candidates:
        return None
    names = [labeler(c["examples"], i) if labeler else f"field-{i}"
             for i, c in enumerate(candidates)]

    def _el_path(c):
        """Element path of a candidate with its sibling position pinned,
        so two sibling columns don't collapse into the item prefix."""
        p = list(c["path"][:-1] if c["path"][-1].startswith("#text")
                 else c["path"])
        if c.get("nth") and p:
            p[-1] += f":nth-of-type({c['nth']})"
        return tuple(p)

    if select is not None:
        keep = sorted(set(select(candidates, names)))
        candidates = [candidates[i] for i in keep
                      if 0 <= i < len(names)]
        names = [names[i] for i in keep if 0 <= i < len(names)]
        if not candidates:
            return None

    # item selector from the SELECTED candidates, AFTER field
    # selection — reference order: elementsToConfig
    # (fieldmanager.go:459-495, the only place s.Item is set) first
    # removes unselected fieldProps, then derives the shared root
    # selector from what remains, so selecting a nested subset DOES
    # move the item selector in the reference
    field_paths = [_el_path(c) for c in candidates]
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
        full = list(_el_path(c))
        text_idx = 0
        if c["path"][-1].startswith("#text"):
            text_idx = int(c["path"][-1][5:])
        rel = full[len(item_path):]
        sel = _selector(rel)
        fname = names[i]
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
