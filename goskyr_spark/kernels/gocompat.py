"""Small Go-semantics compatibility helpers.

The per-row invariant for this engine is *byte-identical extracted text
per url* versus the reference (BASELINE.json:15), and the reference's
row-dropping error channel compares error strings in its own tests
(/root/reference/internal/scraper/scraper_test.go:499,515,556). These
helpers replicate the handful of Go formatting / error-message behaviors
the extraction path depends on. Public knowledge only: Go's fmt/json/
regexp documented behavior.
"""

from __future__ import annotations

import json
import re


class GoskyrError(Exception):
    """Row-dropping extraction error (message mirrors the reference)."""


# --- fmt.Sprint-ish value formatting ---------------------------------------

def go_float_str(f: float) -> str:
    """Go fmt %v of float64: strconv.FormatFloat(f, 'g', -1, 64).

    Same shortest-round-trip digits as Python repr, but Go switches to
    exponent form only when exp < -4 or exp >= 21 (Python switches at
    16) — large ids in ld+json (~1e18) must match Go's positional form."""
    if f != f:  # NaN
        return "NaN"
    if f in (float("inf"), float("-inf")):
        return "+Inf" if f > 0 else "-Inf"
    s = repr(f)
    if "e" in s or "E" in s:
        mant, _, exp_s = s.partition("e")
        exp = int(exp_s)
        if -4 <= exp < 21:
            # expand to positional notation with the same digits
            neg = mant.startswith("-")
            digits = mant.lstrip("-").replace(".", "")
            point = (mant.lstrip("-").index(".")
                     if "." in mant else len(mant.lstrip("-"))) + exp
            if point >= len(digits):
                out = digits + "0" * (point - len(digits))
            elif point > 0:
                out = digits[:point] + "." + digits[point:]
            else:
                out = "0." + "0" * (-point) + digits
            return ("-" if neg else "") + out
        return s
    if s.endswith(".0"):
        return s[:-2]
    return s


def go_sprint(v) -> str:
    """fmt.Sprint for the value kinds that can appear in an item row."""
    if v is None:
        return "<nil>"
    if isinstance(v, str):
        return v
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        return go_float_str(v)
    if isinstance(v, int):
        return str(v)
    try:
        from datetime import datetime

        if isinstance(v, datetime):
            return go_time_string(v)
    except Exception:  # pragma: no cover
        pass
    return str(v)


def go_time_string(dt) -> str:
    """time.Time.String(): '2006-01-02 15:04:05.999999999 -0700 MST'."""
    base = dt.strftime("%Y-%m-%d %H:%M:%S")
    if dt.microsecond:
        base += ("%.9f" % (dt.microsecond / 1e6))[1:].rstrip("0")
    if dt.tzinfo is None:
        return base + " +0000 UTC"
    off = dt.utcoffset()
    total = int(off.total_seconds())
    sign = "+" if total >= 0 else "-"
    total = abs(total)
    offs = f"{sign}{total // 3600:02d}{(total % 3600) // 60:02d}"
    name = dt.tzname() or ""
    return f"{base} {offs} {name}".rstrip()


def go_rfc3339(dt) -> str:
    """RFC3339Nano serialization as Go's time.Time JSON marshalling."""
    s = dt.strftime("%Y-%m-%dT%H:%M:%S")
    if dt.microsecond:
        s += ("%.9f" % (dt.microsecond / 1e6))[1:].rstrip("0")
    off = dt.utcoffset()
    if off is None or int(off.total_seconds()) == 0:
        return s + "Z"
    total = int(off.total_seconds())
    sign = "+" if total >= 0 else "-"
    total = abs(total)
    return f"{s}{sign}{total // 3600:02d}:{(total % 3600) // 60:02d}"


# --- encoding/json first-error scanner --------------------------------------

_LITERALS = {"t": "true", "f": "false", "n": "null"}


def _quote_char(c: str) -> str:
    if c == "'":
        return "'\\''"
    return "'" + c + "'"


def go_json_error(s: str):
    """Return Go encoding/json's first syntax-error message for ``s``,
    or None if the prefix scanner finds no error. Covers the error shapes
    the reference surfaces through jsonquery (scraper.go:1093-1095):
    bad literals, bad value starts, and truncated input."""
    i = 0
    n = len(s)

    def skip_ws(j):
        while j < n and s[j] in " \t\r\n":
            j += 1
        return j

    def value(j):
        j = skip_ws(j)
        if j >= n:
            return j, "unexpected end of JSON input"
        c = s[j]
        if c in _LITERALS:
            lit = _LITERALS[c]
            for k, want in enumerate(lit):
                if j + k >= n:
                    return j, "unexpected end of JSON input"
                if s[j + k] != want:
                    return j, (
                        f"invalid character {_quote_char(s[j + k])} in literal "
                        f"{lit} (expecting {_quote_char(want)})"
                    )
            return j + len(lit), None
        if c == '"':
            j += 1
            while j < n:
                if s[j] == "\\":
                    j += 2
                    continue
                if s[j] == '"':
                    return j + 1, None
                j += 1
            return j, "unexpected end of JSON input"
        if c == "-" or c.isdigit():
            j += 1
            while j < n and (s[j].isdigit() or s[j] in ".eE+-"):
                j += 1
            return j, None
        if c == "{":
            j = skip_ws(j + 1)
            if j < n and s[j] == "}":
                return j + 1, None
            while True:
                j = skip_ws(j)
                if j >= n:
                    return j, "unexpected end of JSON input"
                if s[j] != '"':
                    return j, (
                        f"invalid character {_quote_char(s[j])} looking for "
                        "beginning of object key string"
                    )
                j, err = value(j)  # key string
                if err:
                    return j, err
                j = skip_ws(j)
                if j >= n:
                    return j, "unexpected end of JSON input"
                if s[j] != ":":
                    return j, (
                        f"invalid character {_quote_char(s[j])} after object key"
                    )
                j, err = value(j + 1)
                if err:
                    return j, err
                j = skip_ws(j)
                if j >= n:
                    return j, "unexpected end of JSON input"
                if s[j] == ",":
                    j += 1
                    continue
                if s[j] == "}":
                    return j + 1, None
                return j, (
                    f"invalid character {_quote_char(s[j])} after object "
                    "key:value pair"
                )
        if c == "[":
            j = skip_ws(j + 1)
            if j < n and s[j] == "]":
                return j + 1, None
            while True:
                j, err = value(j)
                if err:
                    return j, err
                j = skip_ws(j)
                if j >= n:
                    return j, "unexpected end of JSON input"
                if s[j] == ",":
                    j += 1
                    continue
                if s[j] == "]":
                    return j + 1, None
                return j, (
                    f"invalid character {_quote_char(s[j])} after array element"
                )
        return j, (
            f"invalid character {_quote_char(c)} looking for beginning of value"
        )

    j, err = value(0)
    if err:
        return err
    j = skip_ws(j)
    if j < n:
        return (
            f"invalid character {_quote_char(s[j])} after top-level value"
        )
    return None


def go_json_loads(s: str):
    """json.loads with Go-shaped error messages (raises GoskyrError with
    the bare Go message; callers add their own prefix)."""
    err = go_json_error(s)
    if err is not None:
        raise GoskyrError(err)
    try:
        return json.loads(s)
    except json.JSONDecodeError as e:  # pragma: no cover — scanner is stricter
        raise GoskyrError(str(e)) from e


# --- regexp compile with Go-shaped errors ------------------------------------

_QUANT = set("*+?")


_RE2_UNSUPPORTED = ("(?=", "(?!", "(?<=", "(?<!")


def go_compile_regex(pattern: str):
    """re.compile with RE2-ish error text. The reference tests assert the
    exact Go message for nested repetition (scraper_test.go:530).

    Go's regexp is RE2: no lookaround, no backreferences. Python's re
    accepts both, so configs relying on them would silently diverge from
    the reference — reject them with Go's own error text instead."""
    i = 0
    in_class = False
    while i < len(pattern):
        ch = pattern[i]
        if ch == "\\":
            nxt = pattern[i + 1:i + 2]
            if not in_class and nxt.isdigit() and nxt != "0":
                raise GoskyrError(
                    f"error parsing regexp: invalid escape sequence: `\\{nxt}`")
            i += 2
            continue
        if ch == "[":
            in_class = True
        elif ch == "]":
            in_class = False
        elif not in_class:
            for tok in _RE2_UNSUPPORTED:
                if pattern.startswith(tok, i):
                    raise GoskyrError(
                        "error parsing regexp: invalid or unsupported "
                        f"Perl syntax: `{tok}`")
        i += 1
    try:
        return re.compile(pattern)
    except re.error as e:
        # nested repetition: a quantifier directly following a quantifier
        prev = None
        for i, ch in enumerate(pattern):
            if ch in _QUANT and prev is not None and prev in _QUANT:
                raise GoskyrError(
                    "error parsing regexp: invalid nested repetition "
                    f"operator: `{prev}{ch}`"
                ) from e
            prev = ch
        raise GoskyrError(f"error parsing regexp: {e.msg}") from e


def find_all_string(compiled, s: str):
    """Go regexp.FindAllString(s, -1): leftmost non-overlapping matches."""
    return [m.group(0) for m in compiled.finditer(s)]


def shorten_string(s: str, l: int) -> str:
    """utils.ShortenString (/root/reference/internal/utils/utils.go:14-19):
    BYTE-slice then append '...' — not rune-aware, by design."""
    if l == 0:
        return s
    b = s.encode("utf-8")
    if len(b) > l:
        return b[:l].decode("utf-8", errors="replace") + "..."
    return s
