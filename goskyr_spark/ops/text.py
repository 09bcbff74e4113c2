"""Text-analysis operators: token counting, quality scoring, language ID,
document fingerprinting. All JVM-side column expressions (whole-stage
codegen) — no Python in the hot path."""

from __future__ import annotations

from pyspark.sql import functions as F

# per-language stopword markers (word-boundary regexes); deterministic
# scoring so the DuckDB oracle can replicate the decision exactly
LANG_MARKERS = {
    "de": r"\b(der|die|das|und|ist|nicht|mit|ein|eine|zu)\b",
    "en": r"\b(the|and|is|of|to|in|that|it|for|with)\b",
    "fr": r"\b(le|la|les|et|est|une|des|dans|pour|que)\b",
    "nl": r"\b(de|het|een|en|van|is|dat|op|te|met)\b",
    "sk": r"\b(a|je|na|sa|v|to|som|ako|ale|tak)\b",
}

EN_STOPWORDS = r"\b(the|a|an|and|or|of|to|in|on|for|with|is|are|was|be)\b"


def token_stats(documents, text_col="text", id_col="doc_id"):
    """Whitespace token count + char count + BPE-ish subword estimate
    (4-chars-per-token heuristic on non-space chars)."""
    t = F.trim(F.col(text_col))
    non_space = F.length(F.regexp_replace(t, r"\s+", ""))
    return documents.select(
        F.col(id_col),
        F.size(F.split(t, r"\s+")).alias("n_tokens"),
        F.length(t).alias("n_chars"),
        F.ceil(non_space / F.lit(4)).cast("long").alias("n_subwords_est"),
    ).orderBy(id_col)


# GPT-2-style pretokenizer shape, simplified to constructs whose
# semantics agree between Java regex (Spark) and RE2 (DuckDB):
# contractions, space-prefixed letter runs, digit runs, punct runs,
# residual whitespace. Both engines use leftmost-first alternation.
BPE_PATTERN = (r"'(?:s|t|re|ve|m|ll|d)"
               r"| ?[a-z]+| ?[0-9]+| ?[^a-z0-9\s']+|\s+")


def bpe_token_count(documents, text_col="text", id_col="doc_id"):
    """BPE-ish token count: matches of the GPT-2-style pretokenizer
    regex over lowercased text — a much better LLM-token estimate than
    chars/4, still a pure column expression (regexp_extract_all in
    codegen)."""
    t = F.lower(F.trim(F.col(text_col)))
    return documents.select(
        F.col(id_col),
        F.size(F.regexp_extract_all(t, F.lit(BPE_PATTERN), F.lit(0)))
        .alias("n_bpe_tokens"),
    ).orderBy(id_col)


# Fixed BPE merges table (rank order). Self-contained, handcrafted from
# common English letter statistics — the same role as a public
# merges.txt (GPT-2 ships one); deterministic so the DuckDB oracle can
# replay it. A merge whose sides never co-occur is simply a no-op, so
# the table needs no constructibility constraint. Space is a regular
# symbol (pretokens carry their leading space, GPT-2-style).
BPE_MERGES = [
    ("t", "h"), ("i", "n"), ("e", "r"), ("a", "n"), ("r", "e"),
    ("o", "n"), ("a", "t"), ("e", "n"), ("o", "r"), ("e", "s"),
    ("s", "t"), ("a", "r"), ("a", "l"), ("o", "u"), ("l", "e"),
    ("i", "s"), ("i", "t"), ("th", "e"), ("in", "g"), ("e", "d"),
    ("an", "d"), ("t", "o"), ("o", "f"), ("c", "o"), ("d", "e"),
    ("s", "e"), ("q", "u"), ("u", "e"), ("er", "s"), ("at", "i"),
    ("ati", "on"), ("o", "m"), ("c", "h"), ("s", "h"), ("l", "l"),
    ("o", "o"), ("e", "e"), ("s", "s"), ("p", "a"), ("r", "o"),
    ("l", "i"), ("m", "a"), ("u", "r"), ("c", "a"), ("e", "l"),
    ("t", "a"), ("h", "o"), ("v", "e"), ("w", "h"), ("u", "s"),
    (" ", "the"), (" ", "and"), (" ", "of"), (" ", "to"), (" ", "is"),
    (" ", "in"), (" ", "it"), (" ", "on"), (" ", "at"), (" ", "or"),
    (" ", "a"), (" ", "s"), (" ", "c"), (" ", "w"), (" ", "b"),
    (" ", "p"), (" ", "f"), (" ", "m"), (" ", "d"), (" ", "t"),
    (" ", "h"), (" ", "re"), (" ", "co"), (" ", "de"), (" ", "se"),
    (" t", "h"), (" th", "e"), (" c", "h"), (" s", "t"), (" w", "h"),
    ("1", "9"), ("2", "0"), ("0", "0"),
]

# Symbol-stream encoding for the pure-column-expression BPE encoder:
# each symbol is wrapped in single '|' with '||' boundaries between
# symbols ('||c1||c2||'), so merge (a,b) is the literal replacement
# '|a||b|' → '|ab|' — non-overlapping leftmost replace == one
# leftmost-greedy merge pass, and the shared '|' boundaries survive for
# the neighbouring pair. chr(2) separates pretokens (never a merge
# side, so no merge can cross a pretoken boundary).
BPE_TOKEN_SEP = "\x02"


def bpe_real_count_expr(text_col="text", merges=None):
    """TRUE BPE token count as a bare Column: pretokenize (BPE_PATTERN),
    then apply the merges table in rank order — one leftmost-greedy
    pass per merge (replay semantics; GPT-2's encoder loops
    min-rank-first instead, both are merges-table BPE) — and count the
    remaining symbols.

    Everything is a column expression: the symbol stream is built with
    one regexp_replace, each merge is one literal ``replace``, and the
    count is a split-size — whole-stage codegen end to end, no Python.
    '|' and chr(2) in the input are mapped to space first (they carry
    the stream structure), identically in the DuckDB oracle."""
    merges = BPE_MERGES if merges is None else merges
    t = F.lower(F.trim(F.col(text_col)))
    t = F.replace(t, F.lit("|"), F.lit(" "))
    t = F.replace(t, F.lit(BPE_TOKEN_SEP), F.lit(" "))
    toks = F.regexp_extract_all(t, F.lit(BPE_PATTERN), F.lit(0))
    # '|c|' per char ((?s): whitespace pretokens contain newlines), then
    # '|SEP|'-joined and '|'-wrapped: '||c1||c2||SEP||d1||'
    stream = F.concat(
        F.lit("|"),
        F.array_join(
            F.transform(toks, lambda tok: F.regexp_replace(
                tok, r"(?s)(.)", r"|$1|")),
            f"|{BPE_TOKEN_SEP}|"),
        F.lit("|"))
    for a, b in merges:
        stream = F.replace(stream, F.lit(f"|{a}||{b}|"),
                           F.lit(f"|{a}{b}|"))
    n_syms = F.size(F.split(stream, r"\|\|")) - 2
    return F.when(F.size(toks) == 0, F.lit(0)) \
        .otherwise(n_syms - (F.size(toks) - 1)).cast("long")


def bpe_token_count_real(documents, text_col="text", id_col="doc_id",
                         merges=None):
    """Per-doc TRUE BPE token count (see bpe_real_count_expr)."""
    return documents.select(
        F.col(id_col),
        bpe_real_count_expr(text_col, merges).alias("n_bpe_tokens")) \
        .orderBy(id_col)


def quality_expr(text_col="text"):
    """The combined quality score as a bare Column — reusable inside
    composed single-scan plans (ops/curate.py) as well as the
    standalone quality_score operator."""
    t = F.trim(F.col(text_col))
    words = F.split(t, r"\s+")
    n_words = F.size(words)
    n_chars = F.length(t)
    n_punct = F.regexp_count(t, F.lit(r"[.,;:!?]"))
    n_digit = F.regexp_count(t, F.lit(r"[0-9]"))
    score = (F.lit(1.0)
             - F.least(F.lit(1.0), n_punct / F.greatest(n_words, F.lit(1)))
             - F.least(F.lit(0.5), n_digit / F.greatest(n_chars, F.lit(1))))
    return F.round(score, 4)


def quality_score(documents, text_col="text", id_col="doc_id"):
    """Heuristic quality features: mean word length, stopword ratio,
    punctuation density, digit density + a combined score."""
    t = F.trim(F.col(text_col))
    words = F.split(t, r"\s+")
    n_words = F.size(words)
    n_stop = F.regexp_count(F.lower(t), F.lit(EN_STOPWORDS))
    n_punct = F.regexp_count(t, F.lit(r"[.,;:!?]"))
    n_digit = F.regexp_count(t, F.lit(r"[0-9]"))
    mean_wl = (F.length(F.regexp_replace(t, r"\s+", "")) / n_words)
    stop_ratio = n_stop / n_words
    return documents.select(
        F.col(id_col),
        n_words.alias("n_words"),
        F.round(mean_wl, 4).alias("mean_word_len"),
        F.round(stop_ratio, 4).alias("stopword_ratio"),
        n_punct.alias("n_punct"),
        n_digit.alias("n_digit"),
        quality_expr(text_col).alias("quality"),
    ).orderBy(id_col)


def lang_pred_expr(text_col="text"):
    """Predicted language as a bare Column (argmax of marker-hit
    counts, ties lexicographic) — reusable in composed plans."""
    t = F.lower(F.trim(F.col(text_col)))
    langs = sorted(LANG_MARKERS)
    counts = {lang: F.regexp_count(t, F.lit(LANG_MARKERS[lang]))
              for lang in langs}
    best = F.lit(langs[0])
    best_c = counts[langs[0]]
    for lang in langs[1:]:
        c = counts[lang]
        best = F.when(c > best_c, F.lit(lang)).otherwise(best)
        best_c = F.when(c > best_c, c).otherwise(best_c)
    return best


def lang_id(documents, text_col="text", id_col="doc_id"):
    """N-gram/stopword-heuristic language ID: argmax of per-language
    marker-hit counts; ties break lexicographically (deterministic)."""
    t = F.lower(F.trim(F.col(text_col)))
    counts = [F.regexp_count(t, F.lit(rx)).alias(f"c_{lang}")
              for lang, rx in sorted(LANG_MARKERS.items())]
    df = documents.select(F.col(id_col), *counts)
    langs = sorted(LANG_MARKERS)
    best = F.lit(langs[0])
    best_c = F.col(f"c_{langs[0]}")
    for lang in langs[1:]:
        c = F.col(f"c_{lang}")
        best = F.when(c > best_c, F.lit(lang)).otherwise(best)
        best_c = F.when(c > best_c, c).otherwise(best_c)
    return df.select(F.col(id_col), best.alias("lang_pred"),
                     best_c.cast("long").alias("marker_hits")).orderBy(id_col)


def fingerprint(documents, text_col="text", id_col="doc_id",
                mod=1_000_000_007, base=31):
    """Polynomial rolling hash over the character codepoints of the
    normalized text (whitespace collapsed, lowercased) — a content
    fingerprint with identical integer arithmetic in the SQL oracle."""
    t = F.lower(F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " "))
    # bind the normalized text once: referencing it inside the
    # per-character lambda re-runs the regexp_replace for EVERY
    # character (O(len^2) work; no CSE across a lambda boundary)
    fp = F.element_at(F.transform(F.array(t), lambda tb: F.aggregate(
        F.transform(F.sequence(F.lit(1), F.length(tb)),
                    lambda i: F.ascii(F.substring(tb, i, 1)).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, c: (acc * base + c) % mod)), 1)
    return documents.select(F.col(id_col), fp.alias("fingerprint")) \
        .orderBy(id_col)


# PII patterns — the conservative web-text scrubbing set (emails, bare
# IPv4s). Written in the common Java-regex/RE2 dialect subset so the
# SAME pattern string runs in Spark (Java) and the DuckDB (RE2) oracle.
PII_EMAIL = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"


def pii_scrub(documents, text_col="text", id_col="doc_id"):
    """PII redaction (the FineWeb/CCNet-style curation pass): replace
    emails with <EMAIL> and IPv4 literals with <IP>, and count what was
    redacted. Pure column expressions — regexp_replace/regexp_count run
    in whole-stage codegen; no shuffle at all (map-only plan).

    Order matters: emails are scrubbed FIRST so an address like
    a@1.2.3.4.com (dotted-quad inside an alpha-TLD host) redacts as ONE
    email instead of having the quad torn out of it by the IP pass.
    A bare user@10.0.0.1 is NOT an email under this pattern (no alpha
    TLD) — its quad redacts as an IP."""
    t = F.col(text_col)
    n_emails = F.regexp_count(t, F.lit(PII_EMAIL))
    after_email = F.regexp_replace(t, PII_EMAIL, "<EMAIL>")
    n_ips = F.regexp_count(after_email, F.lit(PII_IPV4))
    scrubbed = F.regexp_replace(after_email, PII_IPV4, "<IP>")
    return documents.select(
        F.col(id_col),
        scrubbed.alias("text_scrubbed"),
        n_emails.cast("long").alias("n_emails"),
        n_ips.cast("long").alias("n_ips")).orderBy(id_col)
