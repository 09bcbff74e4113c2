"""Row filters — port of Filter.Initialize / FilterMatch / filterItem
(/root/reference/internal/scraper/scraper.go:208-273,500-550).

Semantics:
- a filter on a date-typed field compiles to a date comparison with the
  grammar ``('<'|'>') (now|YYYY-MM-ddTHH:mm)``; anything else compiles to
  an unanchored regex on fmt.Sprint(value);
- keep iff (no match:true filters OR ≥1 match:true matched) AND (no
  match:false matched);
- partial items (not all filter fields present) are only rejected by a
  positive match:false hit — the "filter fast" contract that lets us
  filter stage-1 rows before the subpage-fetch stage.

``now`` is frozen at compile time (scraper.go:266); the Spark pipeline
freezes it once on the driver so all partitions agree.
"""

from __future__ import annotations

from datetime import datetime, timezone

from .gocompat import GoskyrError, go_compile_regex, go_sprint
from .golayout import parse_in_location

_DATE_GRAMMAR_ERR = ("the expression for filtering by date should be of the "
                     "following format: '<|> now|YYYY-MM-ddTHH:mm'")


class CompiledFilter:
    __slots__ = ("field", "match", "type", "regex", "date_cmp", "date_op")

    def __init__(self, field, match):
        self.field = field
        self.match = match
        self.type = ""
        self.regex = None
        self.date_cmp = None
        self.date_op = ""

    def filter_match(self, value):
        if self.type == "regex":
            return self.regex.search(go_sprint(value)) is not None
        if self.type == "date":
            if not isinstance(value, datetime):
                # Go's type assertion yields the zero time (year 1 UTC)
                value = datetime(1, 1, 1, tzinfo=timezone.utc)
            elif value.tzinfo is None:
                value = value.replace(tzinfo=timezone.utc)
            if self.date_op == ">":
                return value > self.date_cmp
            return value < self.date_cmp
        return False


def compile_filter(fc, field_type, now=None):
    """Filter.Initialize (scraper.go:234-273)."""
    f = CompiledFilter(fc.field, fc.match)
    f.type = "date" if field_type == "date" else "regex"
    if f.type == "regex":
        f.regex = go_compile_regex(fc.exp)
        return f
    tokens = fc.exp.split(" ")
    if len(tokens) != 2:
        raise GoskyrError(_DATE_GRAMMAR_ERR)
    if tokens[0] not in (">", "<"):
        raise GoskyrError(_DATE_GRAMMAR_ERR)
    f.date_op = tokens[0]
    if tokens[1] != "now":
        try:
            f.date_cmp = parse_in_location("2006-01-02T15:04", tokens[1],
                                           None, "en_US")
        except GoskyrError:
            raise GoskyrError(_DATE_GRAMMAR_ERR) from None
    else:
        f.date_cmp = now if now is not None else datetime.now(timezone.utc)
    return f


def initialize_filters(scraper, now=None):
    """initializeFilters (scraper.go:500-516): validates field references."""
    field_types = {f.name: f.type for f in scraper.fields}
    compiled = []
    for fc in scraper.filters:
        if fc.field not in field_types:
            raise GoskyrError(
                f"filter error. There is no field with the name '{fc.field}'")
        compiled.append(compile_filter(fc, field_types[fc.field], now=now))
    return compiled


def filter_item(filters, item):
    """filterItem (scraper.go:518-550) incl. the partial-item fast path."""
    nr_match_true = 0
    found_fields = 0
    any_true = False
    no_false = True
    for f in filters:
        if f.field in item:
            found_fields += 1
            if f.match:
                nr_match_true += 1
                if f.filter_match(item[f.field]):
                    any_true = True
            else:
                if f.filter_match(item[f.field]):
                    no_false = False
    if nr_match_true == 0:
        any_true = True
    if found_fields < len(filters):
        return no_false
    return any_true and no_false
