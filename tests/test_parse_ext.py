"""parse-ext external-command parser: command dispatch per content
type, stdin/stdout contract, truncation guard, failure statuses, and
URL_PATTERN outlink extraction over the command's text output
(ExtParser.java + OutlinkExtractor.java semantics)."""

import os
import stat

import pandas as pd

from warps_nutch_spark.operators.parse_ext import (
    ext_parse,
    extract_text_outlinks,
)

# mirror of the reference's sample dispatcher (plugin/parse-ext/command):
# the command gets the mimeType as $1 and the raw content on stdin
_DISPATCHER = """#!/bin/bash
set -e
case $1 in
"text/plain") cat ;;
"application/x-upper") tr a-z A-Z ;;
*) echo "Can't parse mimeType $1" >&2; exit 1 ;;
esac
"""


def _run(spark, cmd, rows, **kw):
    type_params = {
        ct: (cmd, 10.0, "utf-8")
        for ct in ("text/plain", "application/x-upper", "application/x-fail")
    }
    pdf = pd.DataFrame(
        rows, columns=["url", "bytes", "content_type", "content_length"]
    )
    df = spark.createDataFrame(pdf)
    return (
        ext_parse(
            df, type_params, content_length_col="content_length", **kw
        )
        .toPandas()
        .set_index("url")
    )


def test_ext_parse_dispatch_and_statuses(spark, tmp_path):
    cmd = str(tmp_path / "command")
    with open(cmd, "w") as f:
        f.write(_DISPATCHER)
    os.chmod(cmd, os.stat(cmd).st_mode | stat.S_IEXEC)
    body = b"hello http://example.com/a world"
    out = _run(
        spark,
        cmd,
        [
            ("u1", body, "text/plain", len(body)),
            ("u2", b"shout", "application/x-upper", 5),
            ("u3", b"x", "application/x-fail", 1),
            ("u4", b"y", "application/unknown", 1),
            ("u5", body[:10], "text/plain", len(body)),  # truncated
        ],
    )
    u1 = out.loc["u1"]
    assert u1["parse_ok"] and u1["text"] == body.decode()
    assert list(u1["outlinks"]) == ["http://example.com/a"]
    # the command sees stdin and writes text to stdout
    assert out.loc["u2", "text"] == "SHOUT"
    # non-zero exit -> FAILED (ExtParser.java:113)
    u3 = out.loc["u3"]
    assert not u3["parse_ok"] and u3["parse_status"].startswith("failed: exit")
    # no command for the content type (ExtParser.java:49-53)
    assert "no external command" in out.loc["u4", "parse_status"]
    # declared length mismatch -> FAILED_TRUNCATED (ExtParser.java:69-77)
    assert out.loc["u5", "parse_status"].startswith("failed_truncated")


def test_url_pattern_matches_reference_shapes():
    text = (
        "a http://h.example/p%2Fq#frag1 b MAILTO:x@y.org c "
        "ftp://ftp.example.org/f d notaurl: e x:y"
    )
    assert extract_text_outlinks(text) == [
        "http://h.example/p%2Fq#frag1",
        "MAILTO:x@y.org",
        "ftp://ftp.example.org/f",
    ]
    # scheme needs >= 2 chars before the colon ({1,120} after the
    # first) and a [A-Za-z0-9/] right after it
    assert extract_text_outlinks("a: b c:/no x: ab:/ok") == ["ab:/ok"]
    assert extract_text_outlinks("") == []
    assert extract_text_outlinks(None) == []
