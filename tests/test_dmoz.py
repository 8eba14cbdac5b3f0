"""DMOZ RDF seed ingestion (DmozParser semantics): Topic section
state, adult filter, topic regex, subset sampling, title/description
capture, and the dmozparser CLI verb feeding inject."""

import os

from warps_nutch_spark.operators.dmoz import dmoz_seeds, iter_dmoz_pages

RDF = b"""<?xml version="1.0" encoding="UTF-8"?>
<RDF xmlns:r="http://www.w3.org/TR/RDF/" xmlns:d="http://purl.org/dc/elements/1.0/">
<Topic r:id="Top/Computers">
  <link r:resource="http://c1.example/"/>
</Topic>
<ExternalPage about="http://c1.example/">
  <d:Title>Comp One</d:Title>
  <d:Description>first computer site</d:Description>
</ExternalPage>
<ExternalPage about="http://c2.example/">
  <d:Title>Comp Two</d:Title>
</ExternalPage>
<Topic r:id="Top/Adult/Stuff">
  <link r:resource="http://x.example/"/>
</Topic>
<ExternalPage about="http://x.example/">
  <d:Title>Nope</d:Title>
</ExternalPage>
<Topic r:id="Top/Sports">
  <link r:resource="http://s1.example/"/>
</Topic>
<ExternalPage about="http://s1.example/">
  <d:Title>Sport</d:Title>
  <d:Description>kick</d:Description>
</ExternalPage>
</RDF>
"""


def test_sections_filters_and_fields():
    rows = list(iter_dmoz_pages(RDF))
    assert [r[0] for r in rows] == [
        "http://c1.example/",
        "http://c2.example/",
        "http://s1.example/",
    ]
    assert rows[0] == (
        "http://c1.example/",
        "Top/Computers",
        "Comp One",
        "first computer site",
    )
    assert rows[1][2] == "Comp Two" and rows[1][3] == ""
    # adult section included only on request (DmozParser.java:157-159)
    with_adult = list(iter_dmoz_pages(RDF, include_adult=True))
    assert "http://x.example/" in [r[0] for r in with_adult]
    # topic regex must fully match the section (:161-163)
    sports = list(iter_dmoz_pages(RDF, topic_pattern=r"Top/Sports.*"))
    assert [r[0] for r in sports] == ["http://s1.example/"]


def test_subset_sampling_partitions_urls():
    all_rows = {r[0] for r in iter_dmoz_pages(RDF)}
    picked = set()
    for residue_skew in range(3):
        # denom=3 with varying skew: each url lands in some sample
        picked |= {
            r[0] for r in iter_dmoz_pages(RDF, subset_denom=3, skew=residue_skew)
        }
        sub = {r[0] for r in iter_dmoz_pages(RDF, subset_denom=3, skew=residue_skew)}
        assert sub <= all_rows
    # sampling is deterministic per (url, skew)
    assert {
        r[0] for r in iter_dmoz_pages(RDF, subset_denom=3, skew=1)
    } == {r[0] for r in iter_dmoz_pages(RDF, subset_denom=3, skew=1)}


def test_dmoz_seeds_and_cli(spark, tmp_path, capsys):
    d = str(tmp_path / "rdf")
    os.makedirs(d)
    with open(d + "/content.rdf.u8", "wb") as f:
        f.write(RDF)

    out = dmoz_seeds(spark, d).toPandas().set_index("url")
    assert len(out) == 3
    assert out.loc["http://c1.example/", "topic"] == "Top/Computers"

    from warps_nutch_spark.cli import main

    seeds_out = str(tmp_path / "seeds")
    assert (
        main(["dmozparser", "--rdf", d, "--out", seeds_out], spark=spark) == 0
    )
    capsys.readouterr()
    urls = set(spark.read.text(seeds_out).toPandas()["value"])
    assert urls == {
        "http://c1.example/",
        "http://c2.example/",
        "http://s1.example/",
    }
