"""parse-tika PDF tier: text/title/URI extraction round-trips through
the deterministic writer, and the dispatch routes application/pdf
through the pdf slice (TestPdfParser.java contract: the parse text
contains the page text)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from warps_nutch_spark.operators.parse_pdf import (
    make_pdf,
    pdf_extract,
    pdf_parse_rows,
)


class TestPure:
    def test_round_trip_compressed(self):
        pdf = make_pdf(
            ["A VERY SMALL PDF FILE", "second line"],
            title="Doc T",
            uris=("http://a.example/x", "http://b.example/y"),
        )
        r = pdf_extract(pdf)
        assert r["pdf_ok"] and r["pdf_status"] == "success"
        assert r["text"] == "A VERY SMALL PDF FILE\nsecond line"
        assert r["title"] == "Doc T"
        assert r["uris"] == ["http://a.example/x", "http://b.example/y"]

    def test_round_trip_uncompressed_and_escapes(self):
        r = pdf_extract(
            make_pdf(["parens (x) and \\ slash"], compress=False)
        )
        assert r["text"] == "parens (x) and \\ slash"
        assert r["title"] == "" and r["uris"] == []

    def test_hex_strings_and_tj_arrays(self):
        raw = (
            b"%PDF-1.4\n1 0 obj\n<< /Length 40 >>\nstream\n"
            b"BT [(ab) -20 <4344>] TJ <20> Tj (x) ' ET\nendstream\nendobj\n"
        )
        assert pdf_extract(raw)["text"] == "abCD\n \nx"

    def test_octal_escape(self):
        raw = b"%PDF-1.4\n<< /Length 9 >>\nstream\n(\\101\\102) Tj\nendstream\n"
        assert pdf_extract(raw)["text"] == "AB"

    def test_not_a_pdf(self):
        r = pdf_extract(b"GIF89a whatever")
        assert not r["pdf_ok"] and r["pdf_status"] == "failed: not a pdf document"

    def test_encrypted_declined(self):
        blob = make_pdf(["secret"]) + b"trailer\n<< /Encrypt 9 0 R >>\n"
        r = pdf_extract(blob)
        assert not r["pdf_ok"]
        assert r["pdf_status"] == "failed: encrypted pdf declined"
        assert r["text"] == ""

    def test_corrupt_flate_stream_skipped(self):
        blob = (
            make_pdf(["keep me"], compress=False)
            + b"9 0 obj\n<< /Filter /FlateDecode /Length 4 >>\nstream\n"
            b"XXXX\nendstream\nendobj\n"
        )
        r = pdf_extract(blob)
        assert r["pdf_ok"] and r["text"] == "keep me"


class TestSpark:
    @pytest.fixture(scope="class")
    def pdf_rows(self, spark):
        rows = [
            ("p1", make_pdf(["hello pdf"], title="T1", uris=("http://l.example/1",))),
            ("p2", b"not a pdf"),
        ]
        return spark.createDataFrame(rows, "url_hash string, bytes binary")

    def test_pdf_parse_rows(self, spark, pdf_rows):
        out = {r.url_hash: r for r in pdf_parse_rows(pdf_rows).collect()}
        assert out["p1"].pdf_ok and out["p1"].text == "hello pdf"
        assert out["p1"].title == "T1"
        assert out["p1"].uris == ["http://l.example/1"]
        assert not out["p2"].pdf_ok

    def test_dispatch_routes_pdf(self, spark):
        from warps_nutch_spark.operators.parse_dispatch import parse_dispatch

        src = spark.createDataFrame(
            [
                (
                    "a",
                    "http://h.example/a.pdf",
                    "application/pdf",
                    make_pdf(["page text"], uris=("http://out.example/z",)),
                ),
                ("b", "http://h.example/b.txt", "text/plain", b"just text"),
                ("c", "http://h.example/c.bin", "application/octet-stream", b"\x00"),
            ],
            "url_hash string, url string, content_type string, bytes binary",
        )
        out = {r.url_hash: r for r in parse_dispatch(src).collect()}
        assert out["a"].parsed_by == "parse-tika" and out["a"].parse_ok
        assert out["a"].text == "page text"
        assert [o.url for o in out["a"].outlinks] == ["http://out.example/z"]
        assert out["b"].parse_ok and out["b"].text == "just text"
        assert not out["c"].parse_ok
