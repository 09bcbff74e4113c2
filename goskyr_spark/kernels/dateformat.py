"""Date-format inference (config-generation tool) — port of
/root/reference/internal/date/date.go:54-304 with the reference's own
name tables (month_format.go, day_format.go; note they differ slightly
from the monday parsing tables — e.g. de_DE short months list Juni/Juli).

Returns (go_layout_string, language) for a sample date string; used by
the config generator to pick `layout`/`date_language`, and exposed as a
MostOcc-voted multi-sample variant (GetDateFormatMulti, date.go:54-62).
"""

from __future__ import annotations

from collections import Counter

SEPARATORS = set(" ,.-:@/")

# (lang, names) in the reference's table order — order matters for the
# single-candidate language pick (date.go:177-179)
LONG_MONTHS = [
    ("en_US", ["January", "February", "March", "April", "May", "June",
               "July", "August", "September", "October", "November",
               "December"]),
    ("de_DE", ["Januar", "Februar", "März", "April", "Mai", "Juni", "Juli",
               "August", "September", "Oktober", "November", "Dezember"]),
    ("fr_FR", ["janvier", "février", "mars", "avril", "mai", "juin",
               "juillet", "août", "septembre", "octobre", "novembre",
               "décembre"]),
    ("nl_BE", ["januari", "februari", "maart", "april", "mei", "juni",
               "juli", "augustus", "september", "oktober", "november",
               "december"]),
    ("sk_SK", ["január", "február", "marec", "apríl", "máj", "jún", "júl",
               "august", "september", "október", "november", "december"]),
]
SHORT_MONTHS = [
    ("en_US", ["Jan", "Feb", "Mar", "Apr", "May", "Jun", "Jul", "Aug",
               "Sep", "Oct", "Nov", "Dec"]),
    ("de_DE", ["Jan", "Feb", "Mär", "Apr", "Mai", "Juni", "Juli", "Aug",
               "Sep", "Okt", "Nov", "Dez"]),
    ("fr_FR", ["janv", "févr", "mars", "avr", "mai", "juin", "juil",
               "août", "sept", "oct", "nov", "déc"]),
    ("nl_BE", ["jan", "feb", "mrt", "apr", "mei", "jun", "jul", "aug",
               "sep", "okt", "nov", "dec"]),
    ("sk_SK", ["jan", "feb", "mar", "apr", "máj", "jún", "júl", "aug",
               "sep", "okt", "nov", "dec"]),
]
LONG_DAYS = [
    ("en_US", ["Sunday", "Monday", "Tuesday", "Wednesday", "Thursday",
               "Friday", "Saturday"]),
    ("de_DE", ["Sonntag", "Montag", "Dienstag", "Mittwoch", "Donnerstag",
               "Freitag", "Samstag"]),
    ("fr_FR", ["dimanche", "lundi", "mardi", "mercredi", "jeudi",
               "vendredi", "samedi"]),
    ("nl_BE", ["zondag", "maandag", "dinsdag", "woensdag", "donderdag",
               "vrijdag", "zaterdag"]),
    ("sk_SK", ["nedeľa", "pondelok", "utorok", "streda", "štvrtok",
               "piatok", "sobota"]),
]
SHORT_DAYS = [
    ("en_US", ["Sun", "Mon", "Tue", "Wed", "Thu", "Fri", "Sat"]),
    ("de_DE", ["So", "Mo", "Di", "Mi", "Do", "Fr", "Sa"]),
    ("fr_FR", ["dim", "lun", "mar", "mer", "jeu", "ven", "sam"]),
    ("nl_BE", ["zo", "ma", "di", "wo", "do", "vr", "za"]),
    ("sk_SK", ["ne", "po", "ut", "st", "št", "pi", "so"]),
]


def _name_lookup(token, tables):
    low = token.lower()
    return [lang for lang, names in tables
            if any(low == n.lower() for n in names)]


def _month_letters(token):
    langs = _name_lookup(token, LONG_MONTHS)
    if langs:
        return "January", langs
    langs = _name_lookup(token, SHORT_MONTHS)
    if langs:
        return "Jan", langs
    return None


def _day_letters(token):
    langs = _name_lookup(token, LONG_DAYS)
    if langs:
        return "Monday", langs
    langs = _name_lookup(token, SHORT_DAYS)
    if langs:
        return "Mon", langs
    return None


def _contains_digits(s):
    return any("0" <= c <= "9" for c in s)


def _only_digits(s):
    return all("0" <= c <= "9" for c in s)


def _time_format_part(index, sep_tokens, tokens):
    tok = tokens[index]
    if len(tok) <= 2:
        if sep_tokens[index] in (":", "."):
            return "15"
        if index > 0 and sep_tokens[index - 1] in (":", "."):
            return "04"
        if len(tokens) > index + 1 and tokens[index + 1] == "Uhr":
            return "15"
    else:
        if tok.endswith("h"):
            return "04h"
        low = tok.lower()
        if low.endswith("pm") or low.endswith("am"):
            suffix = tok[-2:]
            fmt = "PM" if suffix in ("PM", "AM") else "pm"
            if index > 0 and sep_tokens[index - 1] != " ":
                return f"04{fmt}"
            return f"15{fmt}"
        if "u" in tok:
            return "15u04"
        if "h" in tok:
            return "15h04"
    return None


def get_date_format(date, parts):
    """GetDateFormat(date, CoveredDateParts) → (layout, language).
    ``parts`` is any object with day/month/year/time booleans."""
    default = ("unknown format. please specify manually", "")
    if not date:
        return default
    day, month, year, time_ = parts.day, parts.month, parts.year, parts.time

    tokens = []
    sep_tokens = []
    cur = ""
    for c in date:
        if c in SEPARATORS:
            if cur != "" or not tokens:
                tokens.append(cur)
                cur = ""
                sep_tokens.append(c)
            else:
                tokens.append("")
                sep_tokens.append(c)
        else:
            cur += c
    if cur != "":
        tokens.append(cur)
    if len(sep_tokens) < len(tokens):
        sep_tokens.append("")

    pot_langs = []
    fmt_tokens = []
    for i, token in enumerate(tokens):
        if token == "":
            fmt_tokens.append(token)
            continue
        if not _contains_digits(token):
            if month:
                got = _month_letters(token)
                if got:
                    fmt_tokens.append(got[0])
                    pot_langs.append(got[1])
                    month = False
                    continue
            if day:
                got = _day_letters(token)
                if got:
                    fmt_tokens.append(got[0])
                    pot_langs.append(got[1])
                    # day stays true: dates can carry day as word AND number
                    continue
        else:
            if day and len(token) <= 2 and _only_digits(token):
                fmt_tokens.append("2")
                day = False
                continue
            if month and len(token) <= 2 and _only_digits(token):
                fmt_tokens.append("1")
                month = False
                continue
            if year and len(token) in (4, 2):
                fmt_tokens.append("2006" if len(token) == 4 else "06")
                year = False
                continue
            if time_:
                tf = _time_format_part(i, sep_tokens, tokens)
                if tf is not None:
                    fmt_tokens.append(tf)
                    continue
        fmt_tokens.append(token)

    final = "".join(ft + sep_tokens[i] for i, ft in enumerate(fmt_tokens))

    language = ""
    if len(pot_langs) > 1:
        inter = sorted(set(pot_langs[0]))
        for pl in pot_langs[1:]:
            inter = sorted(set(inter) & set(pl))
            if not inter:
                break
        if inter:
            language = inter[0]
    elif pot_langs:
        language = pot_langs[0][0]
    return final, language


def most_occ(items):
    """utils.MostOcc — most frequent element (first encountered wins ties
    only incidentally in Go; we pick the max count deterministically by
    first occurrence)."""
    if not items:
        return None
    counts = Counter(items)
    best = max(counts.values())
    for it in items:
        if counts[it] == best:
            return it


def get_date_format_multi(dates, parts):
    """GetDateFormatMulti: per-sample inference + MostOcc vote."""
    fs, ls = [], []
    for d in dates:
        f, l = get_date_format(d, parts)
        fs.append(f)
        ls.append(l)
    return most_occ(fs), most_occ(ls)
