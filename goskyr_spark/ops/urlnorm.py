"""RFC 3986 syntax-based URL normalization (§6.2.2) as pure column
expressions — the frontier-hygiene step the north rule pairs with
goskyr's URL-join: applied to outlinks it merges trivially-distinct
spellings of the same resource before the seen-set test, shrinking a
10^10-URL frontier.

Normalizations applied (all in whole-stage codegen, no Python):
- strip the fragment ('#...' never reaches the server)
- lowercase the scheme and the FULL authority (§6.2.2.1 requires only
  scheme + host case-folding; this engine assumes crawl URLs carry no
  userinfo — true of goskyr outlinks — so lowercasing the whole
  authority is equivalent and stays a single expression; path and
  query keep their case)
- remove the default port (:80 for http, :443 for https)
- remove dot segments from the path (§5.2.4) via K fixpoint passes of
  '/./' and '/seg/../' rewrites — K bounds the nesting depth handled
  (default 8; deeper nesting is left as-is IDENTICALLY in the Spark and
  DuckDB implementations, so parity holds regardless)
- empty path with an authority -> '/'

Percent-encoding normalization (§6.2.2.2 — uppercase the hex digits of
retained triplets, decode triplets of UNRESERVED characters) needs
per-triplet logic, so it is NOT in the pure-column default path; it
ships as `percent_normalize_udf` — an Arrow-vectorized pandas UDF
(single-pass regex, no double-decode hazard) that composes INSIDE
column expressions: `url_normalize_full_expr` runs it BEFORE the
column passes (decoding %2E first is what lets '/%2e%2e/' collapse as
a dot segment). The crawl engine opts in with
canonicalize_outlinks="full".

The same pass sequence is emitted as DuckDB SQL by `oracle_sql_expr`,
so the catalog query is value-hash gated end to end.
"""

from __future__ import annotations

import re
import string

import pandas as pd
from pyspark.sql import functions as F

# scheme :// authority rest  (authority = up to first /?#)
_SPLIT_RX = r"^([A-Za-z][A-Za-z0-9+.\-]*)://([^/?#]*)(.*)$"


def url_normalize_expr(col, passes=8):
    """Normalized URL as a Column. Inputs not matching
    scheme://authority... come back trimmed but otherwise untouched."""
    u = F.trim(col)
    u = F.regexp_replace(u, r"#.*$", "")            # fragment
    scheme = F.lower(F.regexp_extract(u, _SPLIT_RX, 1))
    auth = F.lower(F.regexp_extract(u, _SPLIT_RX, 2))
    rest = F.regexp_extract(u, _SPLIT_RX, 3)
    # default ports (authority is already lowercased; bare host only —
    # web crawl URLs carry no userinfo)
    auth = F.when(scheme == "http",
                  F.regexp_replace(auth, r":80$", "")) \
        .when(scheme == "https",
              F.regexp_replace(auth, r":443$", "")) \
        .otherwise(auth)
    path = F.regexp_extract(rest, r"^([^?]*)", 1)
    has_q = rest.contains("?")
    query = F.regexp_extract(rest, r"\?(.*)$", 1)   # first '?' onward
    path = F.when(path == "", F.lit("/")).otherwise(path)
    for _ in range(passes):
        path = F.regexp_replace(path, r"/\.(/|$)", "/")
        path = F.regexp_replace(path, r"/[^/.][^/]*/\.\.(/|$)", "/")
        path = F.regexp_replace(path, r"^/\.\.(/|$)", "/")
    rebuilt = F.concat(scheme, F.lit("://"), auth, path,
                       F.when(has_q, F.concat(F.lit("?"), query))
                       .otherwise(F.lit("")))
    return F.when(scheme == "", u).otherwise(rebuilt)


def url_normalize(df, url_col="url", out_col="url_norm", passes=8):
    """df + a normalized-url column."""
    return df.withColumn(out_col, url_normalize_expr(F.col(url_col),
                                                     passes))


# --- percent-encoding normalization (RFC 3986 §6.2.2.2) ----------------------

_PCT_TRIPLET = re.compile("%([0-9A-Fa-f]{2})")
_UNRESERVED = frozenset(string.ascii_letters + string.digits + "-._~")


def percent_normalize_str(s: str) -> str:
    """One URL string, percent-normalized: hex digits of retained
    triplets uppercased (%3a -> %3A), triplets encoding UNRESERVED
    characters decoded (%7E -> ~, %41 -> A). Single regex pass — a
    decoded character can never be re-interpreted as part of another
    triplet (the chained-replace approach would double-decode inputs
    like '%%341'). Invalid triplets (non-hex) pass through untouched,
    per §2.1: only valid pct-encoded octets are normalized."""
    def fix(m):
        ch = chr(int(m.group(1), 16))
        return ch if ch in _UNRESERVED else "%" + m.group(1).upper()

    return _PCT_TRIPLET.sub(fix, s)


def percent_normalize_udf():
    """Arrow-vectorized pandas UDF form — composes inside column
    expressions (the crawl engine applies it to the outlink column in
    the same projection as the pure-column passes; Arrow batch
    transfer, never per-row Python over the wire)."""
    from pyspark.sql.functions import pandas_udf

    def _pct(col: pd.Series) -> pd.Series:
        return col.map(lambda s: None if s is None
                       else percent_normalize_str(s))

    return pandas_udf(_pct, "string")


def url_normalize_full_expr(col, passes=8):
    """Full normalization: percent pass FIRST (so %2E becomes '.' and
    participates in dot-segment removal — RFC applies §6.2.2.2 and
    §6.2.2.3 together), then the pure-column syntax passes."""
    return url_normalize_expr(percent_normalize_udf()(col), passes)


def url_normalize_full(df, url_col="url", out_col="url_norm", passes=8):
    """df + a fully-normalized-url column (syntax + percent-encoding)."""
    return df.withColumn(out_col,
                         url_normalize_full_expr(F.col(url_col), passes))


def oracle_sql_expr(col_sql, passes=8):
    """The IDENTICAL normalization as a DuckDB SQL expression string
    (same regex passes in the same order)."""
    split = _SPLIT_RX.replace("\\-", "-")
    u = f"regexp_replace(trim({col_sql}), '#.*$', '')"
    scheme = f"lower(regexp_extract({u}, '{split}', 1))"
    auth = f"lower(regexp_extract({u}, '{split}', 2))"
    rest = f"regexp_extract({u}, '{split}', 3)"
    auth = (f"(CASE WHEN {scheme} = 'http' "
            f"THEN regexp_replace({auth}, ':80$', '') "
            f"WHEN {scheme} = 'https' "
            f"THEN regexp_replace({auth}, ':443$', '') "
            f"ELSE {auth} END)")
    path = f"regexp_extract({rest}, '^([^?]*)', 1)"
    path = f"(CASE WHEN {path} = '' THEN '/' ELSE {path} END)"
    for _ in range(passes):
        path = f"regexp_replace({path}, '/\\.(/|$)', '/', 'g')"
        path = (f"regexp_replace({path}, "
                f"'/[^/.][^/]*/\\.\\.(/|$)', '/', 'g')")
        path = f"regexp_replace({path}, '^/\\.\\.(/|$)', '/', 'g')"
    q = (f"(CASE WHEN contains({rest}, '?') "
         f"THEN '?' || regexp_extract({rest}, '\\?(.*)$', 1) "
         f"ELSE '' END)")
    rebuilt = f"({scheme} || '://' || {auth} || {path} || {q})"
    return (f"(CASE WHEN {scheme} = '' THEN {u} "
            f"ELSE {rebuilt} END)")
