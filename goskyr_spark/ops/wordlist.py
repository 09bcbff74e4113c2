"""Dictionary word list for the ML features' dict_words_count.

The reference ships word-lists/*.txt and loads every line of every file
under a directory, lowercased (/root/reference/internal/ml/ml.go:76-96).
``load_words(path)`` reproduces that loader for user-provided lists; when
no directory is given, ``default_words()`` supplies a deterministic
built-in English list (core vocabulary + regular inflections) so
dict_words_count is exercised end-to-end out of the box instead of being
constant 0.
"""

from __future__ import annotations

import os

_CORE = """
a about above after again against all also always am an and any are around
as at back bad be because been before being below between big both but by
call came can city come could country day did different do does down each
early end even every face fact family far feel few find first for found
from get give go good got great group had hand has have he head help her
here high him his home house how i if in into is it its just keep kind
know large last late left life like line little live long look made make
man many may me men might more most move much must my name need never new
next night no not now number of off often old on once one only open or
other our out over own page part people place play point public put right
said same saw say school see seem set she should show side since small so
some something sound state still such take tell than that the their them
then there these they thing think this those though thought three through
time to together too took turn two under until up us use very want was
water way we week well went were what when where which while who why will
with word work world would write year yes yet you young your
event date location title description price ticket concert festival music
venue artist band show start doors free entry address street map info
contact news article author published updated category tag comment share
read min read more click here next previous search menu login register
email phone site web link image photo video calendar today tomorrow
monday tuesday wednesday thursday friday saturday sunday january february
march april may june july august september october november december
"""


def _inflect(words):
    out = set(words)
    for w in words:
        if len(w) < 3:
            continue
        out.add(w + "s")
        if w.endswith("e"):
            out.add(w + "d")
            out.add(w[:-1] + "ing")
        else:
            out.add(w + "ed")
            out.add(w + "ing")
    return out


_DEFAULT = None


def default_words():
    """Deterministic built-in English word set (~1,600 entries)."""
    global _DEFAULT
    if _DEFAULT is None:
        base = [w for w in _CORE.split() if w]
        _DEFAULT = frozenset(_inflect(base))
    return _DEFAULT


def load_words(words_dir):
    """loadWords parity (ml.go:76-96): every line of every file under
    ``words_dir`` (recursively), lowercased. A single file path also
    works."""
    words = set()
    paths = []
    if os.path.isdir(words_dir):
        for root, _dirs, files in os.walk(words_dir):
            paths.extend(os.path.join(root, f) for f in sorted(files))
    else:
        paths.append(words_dir)
    for p in paths:
        with open(p, encoding="utf-8", errors="replace") as f:
            for line in f:
                w = line.strip().lower()
                if w:
                    words.add(w)
    return frozenset(words)
