"""ARC archive reader: concatenated-gzip member walking, header-line
field split, filedesc handling, truncated-tail tolerance, and the
read_arc -> parse_dispatch composition (the ArcSegmentCreator role)."""

import gzip
import os

from warps_nutch_spark.operators.arc import (
    iter_arc_members,
    parse_arc_record,
    read_arc,
)

HTML = b"<html><head><title>A1</title></head><body><a href=\"/x\">x</a></body></html>"


def _record(url, date, mime, body):
    header = f"{url} 10.0.0.1 {date} {mime} {len(body)}\n".encode()
    return gzip.compress(header + body)


def _arc_bytes():
    filedesc = _record(
        "filedesc://test.arc", "20080101000000", "text/plain", b"1 0 Test\nURL IP date mime length"
    )
    r1 = _record("http://a.example/p1", "20080102030405", "text/html", HTML)
    r2 = _record("http://a.example/p2", "20080102030406", "text/plain", b"hello http://b.example/z")
    return filedesc + r1 + r2


def test_member_iteration_and_header_parse():
    members = list(iter_arc_members(_arc_bytes()))
    assert len(members) == 3
    rec = parse_arc_record(members[1])
    assert rec["arc_ok"] and rec["url"] == "http://a.example/p1"
    assert rec["ip"] == "10.0.0.1"
    assert rec["content_type"] == "text/html"
    assert rec["declared_length"] == len(HTML)
    assert rec["bytes"] == HTML
    # exact epoch: 2008-01-02T03:04:05Z
    assert rec["fetch_ms"] == 1199243045000
    assert parse_arc_record(members[0])["is_filedesc"]
    # truncated tail: last member cut mid-stream is dropped, not garbled
    cut = _arc_bytes()[:-10]
    assert len(list(iter_arc_members(cut))) == 2


def test_read_arc_and_dispatch(spark, tmp_path):
    d = str(tmp_path / "arcs")
    os.makedirs(d)
    with open(d + "/part-000.arc.gz", "wb") as f:
        f.write(_arc_bytes())

    recs = read_arc(spark, d).toPandas().set_index("url")
    assert len(recs) == 2  # filedesc dropped by default
    assert recs.loc["http://a.example/p1", "record_index"] == 1
    assert bytes(recs.loc["http://a.example/p1", "bytes"]) == HTML
    with_desc = read_arc(spark, d, keep_filedesc=True).toPandas()
    assert len(with_desc) == 3

    # composition: archive records feed the content-type dispatch
    from pyspark.sql import functions as F

    from warps_nutch_spark.operators.parse_dispatch import parse_dispatch

    src = read_arc(spark, d).select(
        F.sha1("url").alias("url_hash"), "url", "content_type", "bytes"
    )
    out = parse_dispatch(src).toPandas().set_index("url")
    h = out.loc["http://a.example/p1"]
    assert h["parsed_by"] == "parse-html" and h["title"] == "A1"
    assert [o["url"] for o in h["outlinks"]] == ["http://a.example/x"]
    t = out.loc["http://a.example/p2"]
    assert t["parsed_by"] == "parse-tika"
    assert [o["url"] for o in t["outlinks"]] == ["http://b.example/z"]
