"""parse-tika office/image tier: ODF (TestOOParser), RTF
(TestRTFParser — title 'test rft document' + plain text), and image
header width/height metadata (TestImageMetadata)."""

from warps_nutch_spark.operators.parse_office import (
    image_dims,
    make_gif_header,
    make_jpeg_header,
    make_odt,
    make_png_header,
    make_rtf,
    odf_extract,
    rtf_extract,
)


class TestPure:
    def test_odt_round_trip(self):
        r = odf_extract(make_odt(["first para", "second <b> para"], title="My & Doc"))
        assert r["ok"]
        assert r["text"] == "first para\nsecond <b> para"
        assert r["title"] == "My & Doc"

    def test_sxw_round_trip(self):
        r = odf_extract(
            make_odt(["oo text"], mimetype="application/vnd.sun.xml.writer")
        )
        assert r["ok"] and r["text"] == "oo text"

    def test_odf_corrupt(self):
        assert not odf_extract(b"junk")["ok"]

    def test_rtf_reference_contract(self):
        # TestRTFParser.java: title 'test rft document', fox text
        r = rtf_extract(
            make_rtf(
                ["The quick brown fox jumps over the lazy dog"],
                title="test rft document",
            )
        )
        assert r["title"] == "test rft document"
        assert r["text"] == "The quick brown fox jumps over the lazy dog"

    def test_rtf_escapes_destinations_unicode(self):
        raw = (
            rb"{\rtf1\ansi{\fonttbl{\f0 X;}}{\*\generator Acme;}"
            rb"{\colortbl;\red0;}{\info{\title T\'e9st}}"
            rb"a\~b \u233?c\par d\tab e \{x\} \\ }"
        )
        r = rtf_extract(raw)
        assert r["title"] == "Tést"
        assert r["text"] == "a\xa0b éc\nd\te {x} \\"

    def test_rtf_not_rtf(self):
        assert not rtf_extract(b"plain text")["ok"]

    def test_image_dims(self):
        assert image_dims(make_gif_header(204, 37)) == (204, 37)
        assert image_dims(make_png_header(1024, 768)) == (1024, 768)
        assert image_dims(make_jpeg_header(640, 480)) == (640, 480)
        assert image_dims(b"\xff\xd8garbage") is None
        assert image_dims(b"nope") is None


class TestDispatch:
    def test_routes_office_types(self, spark):
        from warps_nutch_spark.operators.parse_dispatch import parse_dispatch

        src = spark.createDataFrame(
            [
                (
                    "odt",
                    "http://h.example/a.odt",
                    "application/vnd.oasis.opendocument.text",
                    make_odt(["odt body"], title="OT"),
                ),
                (
                    "rtf",
                    "http://h.example/b.rtf",
                    "text/rtf",
                    make_rtf(["rtf body"], title="RT"),
                ),
                ("gif", "http://h.example/c.gif", "image/gif", make_gif_header(204, 37)),
                ("txt", "http://h.example/d.txt", "text/plain", b"still text tier"),
            ],
            "url_hash string, url string, content_type string, bytes binary",
        )
        out = {r.url_hash: r for r in parse_dispatch(src).collect()}
        assert out["odt"].parse_ok and out["odt"].title == "OT"
        assert out["odt"].text == "odt body"
        # text/rtf routes to the rtf parser, NOT the text/* decode arm
        assert out["rtf"].parse_ok and out["rtf"].title == "RT"
        assert out["rtf"].text == "rtf body"
        assert out["gif"].parse_ok
        assert out["gif"].meta == {"width": "204", "height": "37"}
        assert out["txt"].parse_ok and out["txt"].text == "still text tier"
        assert out["txt"].meta == {}
