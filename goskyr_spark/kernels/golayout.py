"""Go reference-layout datetime parsing with goodsign/monday locales.

The reference parses dates via ``monday.ParseInLocation(layout, value,
loc, locale)`` (/root/reference/internal/scraper/scraper.go:817) where
``layout`` is a Go reference layout ("2.1.2006 15:04", "Mon, 02.01.2006 -
15:04", ...). This module reimplements that parse path from the public
documented semantics of Go's ``time`` package and monday's locale name
tables, including:

- exact/loose digit-width rules ("02" = exactly two digits, "2" = one or
  two),
- localized month / weekday names for the five locales the reference
  inference tables cover (de_DE default, en_US, fr_FR, nl_BE, sk_SK —
  /root/reference/internal/date/month_format.go, day_format.go),
- Go's ParseError message shapes; the caller-visible contract matters:
  getDate's Feb-29 retry keys on the suffix "day out of range" and the
  substring "29" (/root/reference/internal/scraper/scraper.go:825).
"""

from __future__ import annotations

from datetime import datetime, timezone
from functools import lru_cache

try:
    from zoneinfo import ZoneInfo
except ImportError:  # pragma: no cover
    ZoneInfo = None

from .gocompat import GoskyrError

# --- layout chunking (Go time.nextStdChunk subset) ---------------------------

L_LONG_MONTH = "January"
L_MONTH = "Jan"
L_LONG_WEEKDAY = "Monday"
L_WEEKDAY = "Mon"
L_LONG_YEAR = "2006"
L_YEAR = "06"
L_NUM_MONTH = "1"
L_ZERO_MONTH = "01"
L_DAY = "2"
L_ZERO_DAY = "02"
L_UNDER_DAY = "_2"
L_HOUR = "15"
L_HOUR12 = "3"
L_ZERO_HOUR12 = "03"
L_MINUTE = "4"
L_ZERO_MINUTE = "04"
L_SECOND = "5"
L_ZERO_SECOND = "05"
L_PM = "PM"
L_pm = "pm"
L_TZ = "MST"
L_NUM_TZ = "-0700"
L_NUM_COLON_TZ = "-07:00"
L_ISO_TZ = "Z0700"
L_ISO_COLON_TZ = "Z07:00"
L_FRAC_0 = ".0"
L_FRAC_9 = ".9"

_STD_TOKENS = set()  # populated below for literal detection


@lru_cache(maxsize=2048)
def chunk_layout(layout):
    """Split a Go layout into [(kind, text)] where kind is 'std' or 'lit'."""
    out = []
    i = 0
    n = len(layout)
    lit = []

    def flush():
        if lit:
            out.append(("lit", "".join(lit)))
            lit.clear()

    while i < n:
        c = layout[i]
        tok = None
        if c == "J" and layout.startswith("January", i):
            tok = L_LONG_MONTH
        elif c == "J" and layout.startswith("Jan", i):
            tok = L_MONTH
        elif c == "M" and layout.startswith("Monday", i):
            tok = L_LONG_WEEKDAY
        elif c == "M" and layout.startswith("Mon", i):
            tok = L_WEEKDAY
        elif c == "M" and layout.startswith("MST", i):
            tok = L_TZ
        elif c == "2" and layout.startswith("2006", i):
            tok = L_LONG_YEAR
        elif c == "2":
            tok = L_DAY
        elif c == "1" and layout.startswith("15", i):
            tok = L_HOUR
        elif c == "1":
            tok = L_NUM_MONTH
        elif c == "0" and i + 1 < n and layout[i + 1] in "123456":
            tok = {"1": L_ZERO_MONTH, "2": L_ZERO_DAY, "3": L_ZERO_HOUR12,
                   "4": L_ZERO_MINUTE, "5": L_ZERO_SECOND, "6": L_YEAR}[layout[i + 1]]
        elif c == "3":
            tok = L_HOUR12
        elif c == "4":
            tok = L_MINUTE
        elif c == "5":
            tok = L_SECOND
        elif c == "_" and i + 1 < n and layout[i + 1] == "2":
            tok = L_UNDER_DAY
        elif c == "P" and layout.startswith("PM", i):
            tok = L_PM
        elif c == "p" and layout.startswith("pm", i):
            tok = L_pm
        elif c == "Z" and layout.startswith("Z07:00", i):
            tok = L_ISO_COLON_TZ
        elif c == "Z" and layout.startswith("Z0700", i):
            tok = L_ISO_TZ
        elif c == "-" and layout.startswith("-07:00", i):
            tok = L_NUM_COLON_TZ
        elif c == "-" and layout.startswith("-0700", i):
            tok = L_NUM_TZ
        elif c in ".," and i + 1 < n and layout[i + 1] in "09":
            # fractional seconds — only when the digit run ends the number
            # (Go nextStdChunk: ".01" inside "02.01.2006" stays literal)
            ch = layout[i + 1]
            j = i + 1
            while j < n and layout[j] == ch:
                j += 1
            if not (j < n and layout[j].isdigit()):
                tok = layout[i:j]
                flush()
                out.append(("std", tok))
                i = j
                continue
        if tok is None:
            lit.append(c)
            i += 1
        else:
            flush()
            out.append(("std", tok))
            i += len(tok)
    flush()
    return out


# --- monday locale tables (month / weekday names) ----------------------------
# Ordered lists; index = month number / weekday. Data mirrors goodsign/monday
# for the locales goskyr supports in its inference tables.

_MONTHS_LONG = {
    "en_US": ["January", "February", "March", "April", "May", "June", "July",
              "August", "September", "October", "November", "December"],
    "de_DE": ["Januar", "Februar", "März", "April", "Mai", "Juni", "Juli",
              "August", "September", "Oktober", "November", "Dezember"],
    "fr_FR": ["janvier", "février", "mars", "avril", "mai", "juin", "juillet",
              "août", "septembre", "octobre", "novembre", "décembre"],
    "nl_BE": ["januari", "februari", "maart", "april", "mei", "juni", "juli",
              "augustus", "september", "oktober", "november", "december"],
    "sk_SK": ["január", "február", "marec", "apríl", "máj", "jún", "júl",
              "august", "september", "október", "november", "december"],
}
_MONTHS_SHORT = {
    "en_US": ["Jan", "Feb", "Mar", "Apr", "May", "Jun", "Jul", "Aug", "Sep",
              "Oct", "Nov", "Dec"],
    "de_DE": ["Jan", "Feb", "Mär", "Apr", "Mai", "Jun", "Jul", "Aug", "Sep",
              "Okt", "Nov", "Dez"],
    "fr_FR": ["janv", "févr", "mars", "avr", "mai", "juin", "juil", "août",
              "sept", "oct", "nov", "déc"],
    "nl_BE": ["jan", "feb", "mrt", "apr", "mei", "jun", "jul", "aug", "sep",
              "okt", "nov", "dec"],
    "sk_SK": ["jan", "feb", "mar", "apr", "máj", "jún", "júl", "aug", "sep",
              "okt", "nov", "dec"],
}
_DAYS_LONG = {
    "en_US": ["Sunday", "Monday", "Tuesday", "Wednesday", "Thursday",
              "Friday", "Saturday"],
    "de_DE": ["Sonntag", "Montag", "Dienstag", "Mittwoch", "Donnerstag",
              "Freitag", "Samstag"],
    "fr_FR": ["dimanche", "lundi", "mardi", "mercredi", "jeudi", "vendredi",
              "samedi"],
    "nl_BE": ["zondag", "maandag", "dinsdag", "woensdag", "donderdag",
              "vrijdag", "zaterdag"],
    "sk_SK": ["nedeľa", "pondelok", "utorok", "streda", "štvrtok", "piatok",
              "sobota"],
}
_DAYS_SHORT = {
    "en_US": ["Sun", "Mon", "Tue", "Wed", "Thu", "Fri", "Sat"],
    "de_DE": ["So", "Mo", "Di", "Mi", "Do", "Fr", "Sa"],
    "fr_FR": ["dim", "lun", "mar", "mer", "jeu", "ven", "sam"],
    "nl_BE": ["zo", "ma", "di", "wo", "do", "vr", "za"],
    "sk_SK": ["ne", "po", "ut", "st", "št", "pi", "so"],
}

SUPPORTED_LOCALES = tuple(_MONTHS_LONG)


class GoParseError(GoskyrError):
    """Mirrors Go time.ParseError message shapes."""

    def __init__(self, value, layout, value_elem=None, layout_elem=None,
                 message=None):
        if message is not None:
            text = f'parsing time "{value}"{message}'
        else:
            text = (f'parsing time "{value}" as "{layout}": cannot parse '
                    f'"{value_elem}" as "{layout_elem}"')
        super().__init__(text)


def _days_in(month, year):
    if month == 2:
        if year % 4 == 0 and (year % 100 != 0 or year % 400 == 0):
            return 29
        return 28
    return [31, 28, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31][month - 1]


def _getnum(value, fixed):
    """Parse 1-2 digits (2 exactly when fixed). Returns (num, rest) or None."""
    if len(value) >= 2 and value[0].isdigit() and value[1].isdigit():
        return int(value[:2]), value[2:]
    if not fixed and value[:1].isdigit():
        return int(value[:1]), value[1:]
    return None


def _lookup_name(value, names):
    """Case-insensitive longest-prefix match of value against candidate
    (index, name) pairs; returns (index, rest) or None."""
    low = value.lower()
    best = None
    for idx, name in names:
        nl = name.lower()
        if low.startswith(nl):
            if best is None or len(nl) > best[1]:
                best = (idx, len(nl))
    if best is None:
        return None
    return best[0], value[best[1]:]


@lru_cache(maxsize=64)
def _month_candidates(locale, long):
    tbl = _MONTHS_LONG if long else _MONTHS_SHORT
    cands = []
    loc_tbl = tbl.get(locale)
    if loc_tbl:
        cands.extend((i + 1, n) for i, n in enumerate(loc_tbl))
        # monday also accepts dotted short forms ("janv.")
        if not long:
            cands.extend((i + 1, n + ".") for i, n in enumerate(loc_tbl))
    if locale != "en_US":
        cands.extend((i + 1, n) for i, n in enumerate(tbl["en_US"]))
    return cands


@lru_cache(maxsize=64)
def _day_candidates(locale, long):
    tbl = _DAYS_LONG if long else _DAYS_SHORT
    cands = []
    loc_tbl = tbl.get(locale)
    if loc_tbl:
        cands.extend((i, n) for i, n in enumerate(loc_tbl))
        if not long:
            cands.extend((i, n + ".") for i, n in enumerate(loc_tbl))
    if locale != "en_US":
        cands.extend((i, n) for i, n in enumerate(tbl["en_US"]))
    return cands


def parse_in_location(layout, value, location=None, locale="de_DE"):
    """monday.ParseInLocation equivalent.

    location: tz name string, ZoneInfo, or None (UTC, like time.Parse).
    Returns an aware datetime. Raises GoParseError with Go-shaped text.
    """
    orig_value = value
    chunks = chunk_layout(layout)
    year = 0
    month = 1
    day = 1
    hour = 0
    minute = 0
    sec = 0
    nsec = 0
    pm_state = None  # None / 'am' / 'pm'
    range_err = None
    tz_offset = None  # seconds, from numeric zone layouts

    def fail(layout_elem, value_elem=None):
        raise GoParseError(orig_value, layout,
                           value_elem if value_elem is not None else value,
                           layout_elem)

    for kind, tok in chunks:
        if kind == "lit":
            if not value.startswith(tok):
                fail(tok)
            value = value[len(tok):]
            continue
        if tok == L_LONG_YEAR:
            if len(value) < 4 or not value[:4].isdigit():
                fail(tok)
            year = int(value[:4])
            value = value[4:]
        elif tok == L_YEAR:
            got = _getnum(value, True)
            if got is None:
                fail(tok)
            yy, value = got
            year = 1900 + yy if yy >= 69 else 2000 + yy
        elif tok in (L_NUM_MONTH, L_ZERO_MONTH):
            got = _getnum(value, tok == L_ZERO_MONTH)
            if got is None:
                fail(tok)
            month, value = got
            if month < 1 or month > 12:
                range_err = "month"
        elif tok == L_LONG_MONTH:
            got = _lookup_name(value, _month_candidates(locale, True))
            if got is None:
                fail(tok)
            month, value = got
        elif tok == L_MONTH:
            got = _lookup_name(value, _month_candidates(locale, False))
            if got is None:
                fail(tok)
            month, value = got
        elif tok in (L_DAY, L_ZERO_DAY, L_UNDER_DAY):
            v = value
            if tok == L_UNDER_DAY and v.startswith(" "):
                v = v[1:]
            got = _getnum(v, tok == L_ZERO_DAY)
            if got is None:
                fail(tok)
            day, value = got
        elif tok == L_LONG_WEEKDAY:
            got = _lookup_name(value, _day_candidates(locale, True))
            if got is None:
                fail(tok)
            _, value = got  # weekday parsed but not validated (Go semantics)
        elif tok == L_WEEKDAY:
            got = _lookup_name(value, _day_candidates(locale, False))
            if got is None:
                fail(tok)
            _, value = got
        elif tok == L_HOUR:
            got = _getnum(value, False)
            if got is None:
                fail(tok)
            hour, value = got
            if hour < 0 or hour >= 24:
                range_err = "hour"
        elif tok in (L_HOUR12, L_ZERO_HOUR12):
            got = _getnum(value, tok == L_ZERO_HOUR12)
            if got is None:
                fail(tok)
            hour, value = got
            if hour < 0 or hour > 12:
                range_err = "hour"
        elif tok in (L_MINUTE, L_ZERO_MINUTE):
            got = _getnum(value, tok == L_ZERO_MINUTE)
            if got is None:
                fail(tok)
            minute, value = got
            if minute < 0 or minute >= 60:
                range_err = "minute"
        elif tok in (L_SECOND, L_ZERO_SECOND):
            got = _getnum(value, tok == L_ZERO_SECOND)
            if got is None:
                fail(tok)
            sec, value = got
            if sec < 0 or sec >= 60:
                range_err = "second"
        elif tok == L_PM:
            two = value[:2]
            if two == "PM":
                pm_state = "pm"
            elif two == "AM":
                pm_state = "am"
            else:
                fail(tok)
            value = value[2:]
        elif tok == L_pm:
            two = value[:2]
            if two == "pm":
                pm_state = "pm"
            elif two == "am":
                pm_state = "am"
            else:
                fail(tok)
            value = value[2:]
        elif tok == L_TZ:
            # named zone: consume up to 3-4 uppercase letters; Go keeps the
            # name without resolving except UTC/GMT
            i = 0
            while i < len(value) and (value[i].isalpha() and value[i].isupper()):
                i += 1
            if i < 3:
                fail(tok)
            name = value[:i]
            value = value[i:]
            if name in ("UTC", "GMT"):
                tz_offset = 0
        elif tok in (L_NUM_TZ, L_NUM_COLON_TZ, L_ISO_TZ, L_ISO_COLON_TZ):
            if tok.startswith("Z") and value[:1] == "Z":
                tz_offset = 0
                value = value[1:]
            else:
                if len(value) < 3 or value[0] not in "+-":
                    fail(tok)
                sign = 1 if value[0] == "+" else -1
                colon = ":" in tok
                need = 6 if colon else 5
                raw = value[:need]
                if colon:
                    if len(raw) < 6 or raw[3] != ":":
                        fail(tok)
                    hh, mm = raw[1:3], raw[4:6]
                else:
                    hh, mm = raw[1:3], raw[3:5]
                if not (hh.isdigit() and mm.isdigit()):
                    fail(tok)
                tz_offset = sign * (int(hh) * 3600 + int(mm) * 60)
                value = value[need:]
        elif tok[0] in ".,":
            # fractional seconds
            sep = tok[0]
            if value[:1] == sep and value[1:2].isdigit():
                i = 1
                while i < len(value) and value[i].isdigit():
                    i += 1
                digits = value[1:i][:9]
                nsec = int(digits.ljust(9, "0"))
                value = value[i:]
            elif "0" in tok:
                fail(tok)  # .000 requires the digits; .999 makes it optional
        else:  # pragma: no cover
            fail(tok)

    if value:
        raise GoParseError(orig_value, layout,
                           message=f': extra text: "{value}"')

    if pm_state == "pm" and hour < 12:
        hour += 12
    elif pm_state == "am" and hour == 12:
        hour = 0

    if range_err is None:
        if month < 1 or month > 12:
            range_err = "month"
        elif day < 1 or day > _days_in(month, year):
            range_err = "day"
    if range_err is not None:
        raise GoParseError(orig_value, layout,
                           message=f": {range_err} out of range")

    if year == 0:
        # Go supports year 0; Python datetime does not. goskyr always
        # supplies a year (scraper.go:796-801), so this is unreachable in
        # practice — surface it clearly rather than silently shifting.
        raise GoParseError(orig_value, layout, message=": year 0 unsupported")

    if tz_offset is not None:
        from datetime import timedelta

        tz = timezone(timedelta(seconds=tz_offset))
        return datetime(year, month, day, hour, minute, sec, nsec // 1000,
                        tzinfo=tz)

    if location is None:
        tz = timezone.utc
    elif isinstance(location, str):
        if location == "" or location == "UTC":
            tz = timezone.utc
        else:
            try:
                tz = ZoneInfo(location)
            except Exception as e:
                raise GoskyrError(f"unknown time zone {location}") from e
    else:
        tz = location
    return datetime(year, month, day, hour, minute, sec, nsec // 1000,
                    tzinfo=tz, fold=0)


def load_location(name):
    """time.LoadLocation: '' → UTC; else IANA zone; Go-shaped error."""
    if not name or name == "UTC":
        return timezone.utc
    try:
        return ZoneInfo(name)
    except Exception as e:
        raise GoskyrError(f"unknown time zone {name}") from e


def go_date(year, month, day, hour, minute, sec, microsecond, tz):
    """Go time.Date normalization: out-of-range day/month roll over
    (Feb 29 in a non-leap year → Mar 1), which guessYear relies on
    (scraper.go:486-489)."""
    # normalize month
    y, m = year, month
    y += (m - 1) // 12
    m = (m - 1) % 12 + 1
    # normalize day by rolling forward/backward
    d = day
    while d > _days_in(m, y):
        d -= _days_in(m, y)
        m += 1
        if m > 12:
            m = 1
            y += 1
    while d < 1:
        m -= 1
        if m < 1:
            m = 12
            y -= 1
        d += _days_in(m, y)
    return datetime(y, m, d, hour, minute, sec, microsecond, tzinfo=tz)
