"""Regex-dialect enforcement (RE2 subset) + Go formatting helpers."""

import pytest

from goskyr_spark.kernels.gocompat import (
    GoskyrError,
    go_compile_regex,
    go_float_str,
    go_json_error,
    go_rfc3339,
    go_sprint,
)


@pytest.mark.parametrize("pat,msg", [
    ("a(?=b)", "error parsing regexp: invalid or unsupported Perl syntax: `(?=`"),
    ("a(?!b)", "error parsing regexp: invalid or unsupported Perl syntax: `(?!`"),
    ("(?<=x)y", "error parsing regexp: invalid or unsupported Perl syntax: `(?<=`"),
    ("(a)\\1", "error parsing regexp: invalid escape sequence: `\\1`"),
    (".***", "error parsing regexp: invalid nested repetition operator: `**`"),
])
def test_re2_unsupported_rejected(pat, msg):
    with pytest.raises(GoskyrError) as ei:
        go_compile_regex(pat)
    assert str(ei.value) == msg


def test_re2_supported_still_works():
    # character classes may contain the literal sequences safely
    assert go_compile_regex(r"[(?=!]").search("=")
    assert go_compile_regex(r"(?:ab)+c").search("ababc")
    assert go_compile_regex(r"\0").search("\0")


def test_go_float_str():
    assert go_float_str(19.0) == "19"
    assert go_float_str(1.5) == "1.5"
    assert go_float_str(1e21) == "1e+21"
    assert go_float_str(float("nan")) == "NaN"


def test_go_sprint():
    assert go_sprint(None) == "<nil>"
    assert go_sprint(True) == "true"
    assert go_sprint("x") == "x"
    assert go_sprint(42) == "42"


def test_go_rfc3339():
    from datetime import datetime, timedelta, timezone

    utc = datetime(2025, 8, 20, 20, 0, tzinfo=timezone.utc)
    assert go_rfc3339(utc) == "2025-08-20T20:00:00Z"
    cet = datetime(2023, 3, 10, 20, 0,
                   tzinfo=timezone(timedelta(hours=1)))
    assert go_rfc3339(cet) == "2023-03-10T20:00:00+01:00"


@pytest.mark.parametrize("doc,err", [
    ("this is no json", "invalid character 'h' in literal true (expecting 'r')"),
    ("falze", "invalid character 'z' in literal false (expecting 's')"),
    ("nul", "unexpected end of JSON input"),
    ('{"a" 1}', "invalid character '1' after object key"),
    ('{"a": 1 "b": 2}',
     "invalid character '\"' after object key:value pair"),
    ("[1 2]", "invalid character '2' after array element"),
    ("@", "invalid character '@' looking for beginning of value"),
    ('{"a": 1}', None),
    ('[1, 2, {"x": "y"}]', None),
])
def test_go_json_errors(doc, err):
    assert go_json_error(doc) == err
