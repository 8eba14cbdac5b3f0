"""parse-tika OLE2 tier: Word 97 .doc (FIB + CLX piece table, both
compressed and UTF-16 pieces) and BIFF8 .xls (SST/LABELSST/NUMBER),
SummaryInformation titles — the TestMSWordParser text contract."""

import struct

from warps_nutch_spark.operators.parse_msoffice import (
    cfb_build,
    cfb_open,
    doc_extract,
    make_doc,
    make_summary_info,
    make_xls,
    msoffice_extract,
    summary_title,
    xls_extract,
)


class TestCfb:
    def test_container_round_trip(self):
        streams = [("Alpha", b"a" * 10), ("Beta", b"b" * 5000)]
        got = cfb_open(cfb_build(streams))
        assert got["Alpha"] == b"a" * 10
        assert got["Beta"] == b"b" * 5000

    def test_not_cfb(self):
        r = msoffice_extract(b"not an ole2 file")
        assert not r["ok"] and "compound" in r["status"]

    def test_truncated(self):
        blob = make_doc(["x"])
        assert not msoffice_extract(blob[:600])["ok"]

    def test_unknown_ole2(self):
        blob = cfb_build([("Mystery", b"data")])
        r = msoffice_extract(blob)
        assert not r["ok"] and "unknown OLE2" in r["status"]


class TestDoc:
    def test_round_trip_two_pieces(self):
        # make_doc splits the text across a compressed (cp1252) and an
        # uncompressed (utf-16) piece — both decodings must compose
        r = msoffice_extract(
            make_doc(["The quick brown fox", "jumps over the dog"], title="word97")
        )
        assert r["ok"]
        assert r["text"] == "The quick brown fox\njumps over the dog"
        assert r["title"] == "word97"

    def test_non_ascii(self):
        r = msoffice_extract(make_doc(["café déjà vu", "naïve"]))
        assert r["ok"] and r["text"] == "café déjà vu\nnaïve"

    def test_fcmin_fallback(self):
        # no piece table (lcbClx=0): extraction falls back to the
        # fcMin..fcMac contiguous window
        blob = make_doc(["fallback body"])
        streams = dict(cfb_open(blob))
        wd = bytearray(streams["WordDocument"])
        struct.pack_into("<I", wd, 0x01A6, 0)  # lcbClx = 0
        # rewrite text as cp1252 at fcMin with matching fcMac
        text = "plain contiguous".encode("cp1252")
        fc_min = struct.unpack_from("<I", wd, 0x18)[0]
        wd = wd[:fc_min] + text
        struct.pack_into("<I", wd, 0x1C, fc_min + len(text))
        r = doc_extract({**streams, "WordDocument": bytes(wd)})
        assert r["ok"] and r["text"] == "plain contiguous"

    def test_bad_fib(self):
        blob = cfb_build([("WordDocument", b"\x00" * 1024)])
        r = msoffice_extract(blob)
        assert not r["ok"] and "FIB" in r["status"]


class TestXls:
    def test_round_trip_cells(self):
        r = msoffice_extract(
            make_xls([["alpha", "beta", 12], ["gamma", 3.5]], title="book")
        )
        assert r["ok"]
        assert r["text"] == "alpha beta 12\ngamma 3.5"
        assert r["title"] == "book"

    def test_shared_strings_dedup(self):
        # same string in several cells -> one SST entry, all referenced
        r = xls_extract(cfb_open(make_xls([["dup", "dup"], ["dup"]])))
        assert r["ok"] and r["text"] == "dup dup\ndup"

    def test_utf16_sst(self):
        r = xls_extract(cfb_open(make_xls([["héllo", "wörld"]])))
        assert r["ok"] and r["text"] == "héllo wörld"

    def test_corrupt_workbook(self):
        blob = cfb_build([("Workbook", b"\x09\x08\xff\xff")])
        assert not msoffice_extract(blob)["ok"]


class TestSummaryInfo:
    def test_title_round_trip(self):
        assert summary_title(make_summary_info("A Title")) == "A Title"

    def test_lpwstr(self):
        # VT_LPWSTR variant (type 31, cch in chars)
        tb = "wide".encode("utf-16-le")
        prop = struct.pack("<II", 31, 4) + tb
        section = struct.pack("<IIII", 16 + len(prop), 1, 2, 16) + prop
        head = struct.pack("<HHI", 0xFFFE, 0, 0) + b"\x00" * 16
        from warps_nutch_spark.operators.parse_msoffice import _SUMMARY_FMTID

        head += struct.pack("<I", 1) + _SUMMARY_FMTID + struct.pack("<I", 48)
        assert summary_title(head + section) == "wide"

    def test_garbage(self):
        assert summary_title(b"xx") == ""


class TestDispatch:
    def test_routes_ole2_types(self, spark):
        from warps_nutch_spark.operators.parse_dispatch import parse_dispatch

        src = spark.createDataFrame(
            [
                (
                    "doc",
                    "http://h.example/a.doc",
                    "application/msword",
                    make_doc(["word body"], title="WT"),
                ),
                (
                    "xls",
                    "http://h.example/b.xls",
                    "application/vnd.ms-excel",
                    make_xls([["x1", 7]], title="XT"),
                ),
                ("txt", "http://h.example/c.txt", "text/plain", b"text tier"),
            ],
            "url_hash string, url string, content_type string, bytes binary",
        )
        out = {r.url_hash: r for r in parse_dispatch(src).collect()}
        assert out["doc"].parse_ok and out["doc"].parsed_by == "parse-tika"
        assert out["doc"].text == "word body" and out["doc"].title == "WT"
        assert out["xls"].parse_ok and out["xls"].text == "x1 7"
        assert out["xls"].title == "XT"
        assert out["txt"].parse_ok and out["txt"].text == "text tier"
