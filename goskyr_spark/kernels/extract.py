"""Field-extraction kernels — the port of the reference's scrape-time
string semantics (/root/reference/internal/scraper/scraper.go:623-1101).

Everything here is pure Python over the in-repo DOM so it can run (a)
directly under pytest against the reference's own test tables and (b)
batched inside Arrow UDFs on executors. Errors raise GoskyrError with the
reference's message text; callers convert them into the row-dropping
error channel (+ NrErrors metric).
"""

from __future__ import annotations

import re

from . import css
from .dom import ELEMENT, TEXT
from .gocompat import (
    GoskyrError,
    find_all_string,
    go_compile_regex,
    go_json_loads,
    go_sprint,
    shorten_string,
)
from functools import lru_cache

from .golayout import parse_in_location, load_location

# tz resolution is config-driven (a handful of distinct names per run);
# ZoneInfo construction is not free on the per-item hot path
_load_location_cached = lru_cache(maxsize=64)(load_location)

# --- jsonquery-ish lookup (scraper.go:1083-1101) -----------------------------

_SPACE_CLEANER = re.compile(r"\s+")
_DANGLING_COMMA = re.compile(r",\s*}")


def _json_find(value, steps):
    """DFS lookup of a jsonquery-style path. steps: [(descendant, name)]."""
    if not steps:
        return value
    descendant, name = steps[0]
    rest = steps[1:]

    def children(v):
        if isinstance(v, dict):
            return list(v.items())
        if isinstance(v, list):
            return [(None, x) for x in v]
        return []

    # direct children first
    for k, v in children(value):
        if k == name:
            r = _json_find(v, rest)
            if r is not _MISSING:
                return r
    if descendant:
        for _k, v in children(value):
            r = _json_find(v, steps)
            if r is not _MISSING:
                return r
    return _MISSING


_MISSING = object()


def extract_json_field(path, s):
    """extractJsonField (scraper.go:1083-1101): whitespace collapse +
    dangling-comma hack, then jsonquery lookup, then fmt %v."""
    if not path:
        return s
    cleaned = _SPACE_CLEANER.sub(" ", s)
    cleaned = _DANGLING_COMMA.sub(" }", cleaned)
    try:
        doc = go_json_loads(cleaned)
    except GoskyrError as e:
        raise GoskyrError(f"JSON: {e} : {cleaned}") from e
    # parse the path: '//a/b' → descendant a then child b; '/a' → child a
    steps = []
    i = 0
    p = path
    while i < len(p):
        if p.startswith("//", i):
            i += 2
            desc = True
        elif p.startswith("/", i):
            i += 1
            desc = False
        else:
            desc = False
        j = p.find("/", i)
        if j == -1:
            j = len(p)
        name = p[i:j]
        if name:
            steps.append((desc, name))
        i = j
    node = _json_find(doc, steps)
    if node is _MISSING:
        # jsonquery.FindOne returns nil; node.Value() then panics in Go.
        # Surface a clear error instead of crashing the executor.
        raise GoskyrError(f"JSON: no node found for selector {path}")
    if isinstance(node, int) and not isinstance(node, bool):
        # Go's encoding/json decodes every number as float64; large ints
        # must round through float64 before formatting for byte parity
        node = float(node)
    return go_sprint(node)


# --- regex extract / transform (scraper.go:1017-1071) ------------------------

def extract_string_regex(rc, s):
    """extractStringRegex: FindAllString + index (negatives from the end);
    out-of-bounds → row-dropping error unless ignore_errors."""
    extracted = s
    if rc.exp:
        regex = go_compile_regex(rc.exp)
        matches = find_all_string(regex, s)
        err_msg = ""
        if len(matches) == 0:
            err_msg = f"no matching strings found for regex: {rc.exp}"
        elif rc.index < 0:
            if len(matches) + rc.index < 0:
                err_msg = (f"regex index out of bounds. regex '{rc.exp}' gave "
                           f"only {len(matches)} matches")
            else:
                extracted = matches[len(matches) + rc.index]
        else:
            if rc.index >= len(matches):
                err_msg = (f"regex index out of bounds. regex '{rc.exp}' gave "
                           f"only {len(matches)} matches")
            else:
                extracted = matches[rc.index]
        if err_msg:
            err_msg += f", string was: {s}"
            if rc.ignore_errors:
                return ""
            raise GoskyrError(err_msg)
    return extracted


_EXPAND_NAME = re.compile(r"\w+", re.UNICODE)


def _go_expand(template, m, pattern):
    """Go regexp template expansion (regexp.expand / extract):
    ``$name``/``${name}`` forms, ``$$`` → literal ``$``, longest
    letter/digit/underscore run as name, all-digits (no leading zero) =
    group number, unknown/unmatched references expand to ''."""
    out = []
    i = 0
    t = template
    while True:
        j = t.find("$", i)
        if j < 0:
            out.append(t[i:])
            break
        out.append(t[i:j])
        nxt = t[j + 1:j + 2]
        if nxt == "$":  # $$ → $
            out.append("$")
            i = j + 2
            continue
        if nxt == "{":
            k = t.find("}", j + 2)
            name = t[j + 2:k] if k >= 0 else ""
            if k < 0 or not name or not _EXPAND_NAME.fullmatch(name):
                out.append("$")  # malformed: $ is raw text
                i = j + 1
                continue
            i = k + 1
        else:
            mm = _EXPAND_NAME.match(t, j + 1)
            if not mm:
                out.append("$")  # no name: $ is raw text
                i = j + 1
                continue
            name = mm.group(0)
            i = mm.end()
        # all-digits (no leading zero, bounded) = group NUMBER, else name
        g = None
        if name.isdigit() and not (len(name) > 1 and name[0] == "0") \
                and len(name) < 9:
            num = int(name)
            if num <= pattern.groups:
                g = m.group(num)
        else:
            idx = pattern.groupindex.get(name)
            if idx is not None:
                g = m.group(idx)
        out.append(g or "")  # unmatched/unknown → empty (Go semantics)
    return "".join(out)


def transform_string(tr, s):
    """transformString: only regex-replace exists (scraper.go:1054-1071).

    The replacement template follows Go ReplaceAllString Expand rules —
    implemented in _go_expand so unknown refs can't raise re.error and
    kill the Spark task; any residual substitution error becomes a
    GoskyrError (row drop), matching the reference's keep-scraping
    behavior."""
    if tr.type == "regex-replace":
        if tr.regex:
            regex = go_compile_regex(tr.regex)
            try:
                return regex.sub(
                    lambda m: _go_expand(tr.replace, m, regex), s)
            except re.error as e:  # defensive: never kill the task
                raise GoskyrError(
                    f"regex-replace failed for '{tr.regex}': {e}")
        return s
    if tr.type == "":
        return s
    raise GoskyrError(f"transform type '{tr.type}' does not exist")


# --- getTextString (scraper.go:912-1015) -------------------------------------

def get_text_string(loc, selection):
    """Resolve an ElementLocation inside ``selection`` (list of DOM nodes).

    Implements all sub-modes: empty selector = the node itself
    (scraper.go:915-919), entire_subtree (jQuery-text, :922-946),
    all_nodes + separator (:937-976), child_index walk over ALL node
    types (:963-975), attribute of the FIRST matched node (:977-982),
    json_selector, regex_extract, TrimSpace, max_length, default.
    """
    if not isinstance(selection, (list, tuple)):
        selection = [selection]
    field_strings = []
    if loc.selector == "":
        field_selection = list(selection)
    else:
        field_selection = css.find(selection, loc.selector)
    if len(field_selection) > 0:
        if loc.attr == "":
            if loc.entire_subtree:
                if loc.all_nodes:
                    for node in field_selection:
                        field_strings.append(node.entire_text())
                else:
                    field_strings.append(field_selection[0].entire_text())
            else:
                field_nodes = []
                if loc.all_nodes:
                    for node in field_selection:
                        if node.children:
                            field_nodes.append(node.children[0])
                else:
                    if field_selection[0].children:
                        field_nodes.append(field_selection[0].children[0])
                for fn in field_nodes:
                    # walk ALL sibling node types counting indices — comments
                    # included (parity with x/net/html NextSibling walk)
                    idx = 0
                    sibs = fn.parent.children if fn.parent else [fn]
                    start = sibs.index(fn)
                    cur = start
                    while cur < len(sibs):
                        if idx == loc.child_index:
                            if sibs[cur].type == TEXT:
                                field_strings.append(sibs[cur].data)
                                break
                        cur += 1
                        idx += 1
        else:
            # attr of the first matched node only (reference's own comment
            # flags this as arguably wrong; replicated for parity,
            # scraper.go:977-982)
            first = field_selection[0]
            val = first.attrs.get(loc.attr, "") if first.type == ELEMENT else ""
            field_strings.append(val)

    # post-processing passes gated on the config (extract_json_field /
    # extract_string_regex / shorten_string are no-ops when unset — skip
    # the list rebuilds on the hot path; ~50 calls/page in the kernel)
    if loc.json_selector:
        field_strings = [extract_json_field(loc.json_selector, f)
                         for f in field_strings]
    if loc.regex_extract.exp:
        field_strings = [extract_string_regex(loc.regex_extract, f)
                         for f in field_strings]
    if len(field_strings) == 1:
        final = field_strings[0].strip()
        if loc.max_length:
            final = shorten_string(final, loc.max_length)
    else:
        field_strings = [f.strip() for f in field_strings]
        if loc.max_length:
            field_strings = [shorten_string(f, loc.max_length)
                             for f in field_strings]
        final = (loc.separator or "").join(field_strings)
    if final == "" and loc.default != "":
        return loc.default
    return final


# --- getURLString (scraper.go:864-910) + getBaseURL (:1073-1081) --------------

def get_base_url(page_url, doc):
    base = ""
    found = css.find(doc, "base")
    if found:
        base = found[0].attrs.get("href", "")
    return base if base else page_url


def get_url_string(loc, selection, base_url):
    """goskyr's URL-join branch ladder — deliberately NOT urljoin();
    differs on '?'/'.?' and bare-relative cases. This is the outlink
    canonicalization rule for the whole engine (north rule: 'RFC 3986 +
    goskyr's URL-join rules')."""
    from urllib.parse import urlsplit

    u = urlsplit(base_url)
    scheme, host, path = u.scheme, u.netloc, u.path
    attr = loc.attr if loc.attr else "href"
    # build an effective location with the defaulted attr without mutating
    # the (possibly broadcast/shared) config object
    eff = _with_attr(loc, attr)
    url_val = get_text_string(eff, selection)
    url_val = url_val.strip()
    if url_val == "":
        return ""
    if url_val.startswith("http"):
        url_res = url_val
    elif url_val.startswith("?") or url_val.startswith(".?"):
        url_val = url_val.lstrip(".")
        url_res = f"{scheme}://{host}{path}{url_val}"
    elif url_val.startswith("/"):
        url_res = f"{scheme}://{host}{url_val}"
    elif url_val.startswith(".."):
        parts_val = url_val.split("/")
        parts_path = path.split("/")
        i = 0
        while i < len(parts_val) and parts_val[i] == "..":
            i += 1
        url_res = "{}://{}{}/{}".format(
            scheme, host,
            "/".join(parts_path[: len(parts_path) - i - 1]),
            "/".join(parts_val[i:]))
    else:
        idx = path.rfind("/")
        if idx > 0:
            url_res = f"{scheme}://{host}{path[:idx]}/{url_val}"
        else:
            url_res = f"{scheme}://{host}/{url_val}"
    return url_res.strip()


def _with_attr(loc, attr):
    if loc.attr == attr:
        return loc
    import copy

    eff = copy.copy(loc)
    eff.attr = attr
    return eff


# --- getDate (scraper.go:739-837) + raw components (:839-862) ------------------

def check_double_parts(a, b):
    for part in ("day", "month", "year", "time"):
        if getattr(a, part) and getattr(b, part):
            raise GoskyrError(
                f"date parsing error: '{part}' covered at least twice")


def merge_parts(a, b):
    from ..config import CoveredDateParts

    return CoveredDateParts(day=a.day or b.day, month=a.month or b.month,
                            year=a.year or b.year, time=a.time or b.time)


def get_date(field, selection, now=None):
    """Assemble date components, cross-product layouts, parse via the
    Go-layout engine; Feb-29 guess_year retry (scraper.go:820-834).

    ``now`` injects the clock (frozen once per run on the Spark driver for
    cross-partition determinism; defaults to wall clock like the
    reference's time.Now()).
    """
    from datetime import datetime as _dt

    from ..config import CoveredDateParts

    loc = _load_location_cached(field.date_location)
    m_locale = field.date_language if field.date_language else "de_DE"

    date_parts = []
    combined = CoveredDateParts()
    for c in field.components:
        if not combined.has_all():
            check_double_parts(c.covers, combined)
            sp = get_text_string(c.location, selection)
            for tr in c.transform:
                sp = transform_string(tr, sp)
            if sp != "":
                if c.layout is None:
                    raise GoskyrError(
                        "date parsing error: a date component of field "
                        f"'{field.name}' has no layout set")
                date_parts.append((sp, list(c.layout)))
                combined = merge_parts(combined, c.covers)

    if not combined.day or not combined.month or not combined.time:
        raise GoskyrError("date parsing error: to generate a date at least "
                          "a time, a day and a month are needed")

    current_year = (now or _dt.now()).year
    if not combined.year:
        date_parts.append((str(current_year), ["2006"]))

    date_time_string = ""
    layouts = [""]
    for sp, layout_parts in date_parts:
        layouts = [t + lp + " " for t in layouts for lp in layout_parts]
        date_time_string += sp + " "

    last_err = None
    for layout in layouts:
        try:
            return parse_in_location(layout, date_time_string, loc, m_locale)
        except GoskyrError as e:
            last_err = e
            msg = str(e)
            if not combined.year and field.guess_year and \
                    msg.endswith("day out of range") and "29" in msg:
                # Feb-29 edge: bump the year up to +3 looking for a leap year
                for i in range(1, 4):
                    date_time_string = date_time_string.replace(
                        str(current_year + i - 1), str(current_year + i), 1)
                    try:
                        return parse_in_location(layout, date_time_string,
                                                 loc, m_locale)
                    except GoskyrError as e2:
                        last_err = e2
    raise last_err


def get_raw_date_components(field, selection):
    """getRawDateComponents (scraper.go:839-862): unparsed strings keyed
    date-component[-day][-month][-year][-time]."""
    raw = {}
    for c in field.components:
        ts = get_text_string(c.location, selection)
        name = "date-component"
        if c.covers.day:
            name += "-day"
        if c.covers.month:
            name += "-month"
        if c.covers.year:
            name += "-year"
        if c.covers.time:
            name += "-time"
        raw[name] = ts
    return raw


# --- extractField (scraper.go:623-732) ----------------------------------------

def extract_field(field, item, selection, base_url, now=None):
    """Mutates ``item`` like the reference; raises GoskyrError to drop."""
    ftype = field.type
    if ftype in ("text", ""):
        parts = []
        for p in field.location:
            ts = get_text_string(p, selection)
            if ts != "":
                parts.append(ts)
        t = (field.separator or "").join(parts)
        if not field.can_be_empty and t == "":
            raise GoskyrError(f"field {field.name} cannot be empty")
        for tr in field.transform:
            t = transform_string(tr, t)
        item[field.name] = t
    elif ftype == "url":
        if len(field.location) != 1:
            raise GoskyrError(
                "a field of type 'url' must exactly have one location")
        url = get_url_string(field.location[0], selection, base_url)
        if not field.can_be_empty and url == "":
            raise GoskyrError(f"field {field.name} cannot be empty")
        for tr in field.transform:
            url = transform_string(tr, url)
        item[field.name] = url
    elif ftype == "date":
        item[field.name] = get_date(field, selection, now=now)
    else:
        raise GoskyrError(f"field type '{ftype}' does not exist")


def extract_raw_field(field, item, selection):
    """extractRawField (scraper.go:686-732) — ML feature path."""
    ftype = field.type
    if ftype in ("text", ""):
        parts = []
        for p in field.location:
            ts = get_text_string(p, selection)
            if ts != "":
                parts.append(ts)
        t = (field.separator or "").join(parts)
        if not field.can_be_empty and t == "":
            raise GoskyrError(f"field {field.name} cannot be empty")
        item[field.name] = t
    elif ftype == "url":
        if len(field.location) != 1:
            raise GoskyrError(
                "a field of type 'url' must exactly have one location")
        eff = _with_attr(field.location[0],
                         field.location[0].attr or "href")
        ts = get_text_string(eff, selection)
        if not field.can_be_empty and ts == "":
            raise GoskyrError(f"field {field.name} cannot be empty")
        item[field.name] = ts
    elif ftype == "date":
        item.update(get_raw_date_components(field, selection))


# --- guessYear (scraper.go:448-498) --------------------------------------------

def guess_year(fields, items, ref_now, start_refs=None):
    """Order-dependent year fixup: item i's reference is item i-1's date
    (item 0: ref_now). Non-commutative prefix scan — in Spark this runs
    per-scraper over the crawl-ordered item stream.

    ``start_refs`` ({field: previous item's fixed date | None}) makes
    the scan RESUMABLE mid-stream: a continuation chunk passes the
    preceding chunk's last item values, so chunked processing with
    carried state is bit-identical to one monolithic pass (the Spark
    side streams Arrow batches through mapInPandas with exactly this
    carry — finalize_items_df). None default = reference behavior
    (item 0 references ref_now); a key PRESENT with value None means
    'previous item lacked this field', which references the year-1
    sentinel exactly like the in-stream case."""
    from datetime import datetime as _dt, timedelta

    guess_fields = {f.name for f in fields if f.type == "date" and f.guess_year}
    if not guess_fields:
        return items
    ref = ref_now
    for i, item in enumerate(items):
        for name in list(item.keys()):
            if name in guess_fields and isinstance(item[name], _dt):
                t = item[name]
                if i > 0:
                    prev = items[i - 1].get(name)
                    ref = prev if isinstance(prev, _dt) else _dt(1, 1, 1,
                                                                 tzinfo=t.tzinfo)
                elif start_refs is not None and name in start_refs:
                    prev = start_refs.get(name)
                    ref = prev if isinstance(prev, _dt) else _dt(1, 1, 1,
                                                                 tzinfo=t.tzinfo)
                else:
                    # item 0 of a field NOT covered by a partial
                    # start_refs dict: reference is ref_now, never a ref
                    # left over from a previously processed field
                    ref = ref_now
                from .golayout import go_date

                diff = None
                new_date = t
                for y in range(ref.year - 1, ref.year + 2):
                    tmp = go_date(y, t.month, t.day, t.hour, t.minute,
                                  t.second, t.microsecond, t.tzinfo)
                    nd = abs(tmp - ref)
                    if diff is None or nd < diff:
                        diff = nd
                        new_date = tmp
                item[name] = new_date
    return items
