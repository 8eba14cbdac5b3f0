"""parse-metatags / reltag / subcollection / CC / parse-js / parse-zip."""

import io
import zipfile

import pandas as pd
from pyspark.sql import functions as F

from warps_nutch_spark.operators.multimodal import zip_entries
from warps_nutch_spark.operators.parse_plugins import (
    cc_license_col,
    js_outlinks_col,
    metatags_col,
    reltags_col,
    subcollections_col,
)

HTML = (
    '<html><head><meta name="Author" content="ann">'
    '<meta name="keywords" content="k1"><meta name="keywords" content="k2">'
    '<meta http-equiv="Refresh" content="300"><meta name="skip" content="x">'
    '</head><body>'
    '<a href="http://t.test/tag/spark%20sql" rel="tag">x</a>'
    '<a rel="TAG" href="http://t.test/tag/t2?u=1">y</a>'
    '<a rel="license" href="http://creativecommons.org/licenses/by/4.0/">cc</a>'
    '<a href="http://t.test/other">z</a></body></html>'
)


def test_metatags_reltag_cc(spark):
    df = spark.createDataFrame([(HTML,)], ["html"])
    row = df.select(
        metatags_col(F.col("html"), ["author", "keywords", "refresh"]).alias("m"),
        reltags_col(F.col("html")).alias("r"),
        cc_license_col(F.col("html")).alias("cc"),
    ).collect()[0]
    assert row["m"] == {"author": "ann", "keywords": "k1\tk2", "refresh": "300"}
    assert row["r"] == ["spark sql", "t2"]
    assert row["cc"] == "http://creativecommons.org/licenses/by/4.0/"
    # wildcard mode keeps everything (metatags.names = '*')
    all_m = df.select(metatags_col(F.col("html")).alias("m")).collect()[0]["m"]
    assert "skip" in all_m


def test_subcollection_blacklist_wins(spark):
    # mirrors the reference's own TestSubcollection fixture
    cols = [("nutch", ["www.nutch.org", "www.apache.org"], ["jpg", "www.apache.org/zecret/"])]
    df = spark.createDataFrame(
        [
            ("http://www.apache.org/index.html",),
            ("http://www.apache.org/zecret/index.html",),
            ("http://www.apache.org/img/image.jpg",),
            ("http://www.google.com/",),
        ],
        ["url"],
    )
    got = [
        r["c"]
        for r in df.select(subcollections_col(F.col("url"), cols).alias("c")).collect()
    ]
    assert got == [["nutch"], [], [], []]


def test_js_outlinks_resolution(spark):
    js = (
        'var a = "/detail/7"; var b = \'www.ext.test/page.html\'; '
        'var c = "http://abs.test/x.php?a=1&amp;b=2"; '
        'var s = "not a link"; var u = "img.png"; var n = "plain";'
    )
    df = spark.createDataFrame([(js, "http://h.test/dir/page.html")], ["js", "base"])
    got = df.select(
        js_outlinks_col(F.col("js"), F.col("base")).alias("o")
    ).collect()[0]["o"]
    assert got == sorted(
        [
            "http://h.test/detail/7",
            "http://www.ext.test/page.html",
            "http://abs.test/x.php?a=1&b=2",
            "http://h.test/dir/img.png",
        ]
    )


def _zip_blob(files):
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        for name, data in files.items():
            zf.writestr(name, data)
    return buf.getvalue()


def test_zip_entries_explode_and_corrupt(spark):
    good = _zip_blob({"a.txt": b"alpha", "sub/b.html": b"<html>b</html>"})
    df = spark.createDataFrame(
        pd.DataFrame(
            {"url_hash": ["z1", "z2"], "bytes": [good, b"not a zip at all"]}
        )
    )
    out = zip_entries(df).toPandas()
    ok = out[out["zip_ok"]].set_index("entry_name")
    assert bytes(ok.loc["a.txt", "entry_bytes"]) == b"alpha"
    assert ok.loc["sub/b.html", "entry_size"] == len(b"<html>b</html>")
    assert set(ok["url_hash"]) == {"z1"}
    bad = out[~out["zip_ok"]]
    assert list(bad["url_hash"]) == ["z2"]


def test_zip_entries_bomb_hardening(spark):
    """Members are stream-truncated at max_entry_bytes (the full
    inflated payload never materializes) and entries whose DECLARED
    size exceeds the hard limit are skipped outright."""
    blob = _zip_blob({"bomb.txt": b"x" * 200_000, "ok.txt": b"tiny"})
    df = spark.createDataFrame(pd.DataFrame({"url_hash": ["z"], "bytes": [blob]}))
    out = zip_entries(df, max_entry_bytes=1024).toPandas().set_index("entry_name")
    assert len(bytes(out.loc["bomb.txt", "entry_bytes"])) == 1024
    assert out.loc["bomb.txt", "entry_size"] == 200_000  # true declared size
    assert bytes(out.loc["ok.txt", "entry_bytes"]) == b"tiny"
    # declared-size hard limit drops the bomb entry entirely
    out2 = (
        zip_entries(df, max_entry_bytes=1024, max_declared_entry_bytes=100_000)
        .toPandas()
        .set_index("entry_name")
    )
    assert "bomb.txt" not in out2.index and "ok.txt" in out2.index


def _swf_blob(body: bytes, compressed=False, declared=None):
    import zlib

    declared = 8 + len(body) if declared is None else declared
    header = (b"CWS" if compressed else b"FWS") + b"\x06" + declared.to_bytes(4, "little")
    return header + (zlib.compress(body) if compressed else body)


def test_swf_extract_container_handling(spark):
    """FWS and CWS bodies with identical content parse identically
    (real zlib inflate); truncated declared length, bad magic, and
    corrupt deflate streams fail the row, not the stage; a compressed
    bomb is stopped at the inflate cap."""
    from warps_nutch_spark.operators.parse_plugins import swf_extract

    body = b"Hello SWF movie visit http://swf.test/a.html now"
    rows = pd.DataFrame(
        {
            "url_hash": ["fws", "cws", "trunc", "magic", "garbage", "bomb"],
            "bytes": [
                _swf_blob(body),
                _swf_blob(body, compressed=True),
                _swf_blob(body, declared=9999),
                b"XXX\x06" + b"\x00" * 10,
                b"CWS\x06" + (60).to_bytes(4, "little") + b"not deflate data",
                _swf_blob(b"\x00" * 200_000, compressed=True),
            ],
        }
    )
    df = spark.createDataFrame(rows)
    out = (
        swf_extract(df, max_inflated_bytes=100_000)
        .toPandas()
        .set_index("url_hash")
    )
    assert bool(out.loc["fws", "swf_ok"]) and bool(out.loc["cws", "swf_ok"])
    assert out.loc["fws", "text"] == out.loc["cws", "text"] == body.decode()
    assert list(out.loc["fws", "urls"]) == ["http://swf.test/a.html"]
    for bad in ("trunc", "magic", "garbage", "bomb"):
        assert not out.loc[bad, "swf_ok"], bad
        assert out.loc[bad, "text"] is None
