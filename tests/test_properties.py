"""Property-based tests (hypothesis) for the URL function family —
the invariants the crawl depends on, checked over generated inputs
rather than fixtures:

- canonicalize is idempotent (a canonical URL re-canonicalizes to
  itself — the normalizer-chain fixpoint the reference relies on when
  outlinks re-enter inject/updatedb);
- reverse_url round-trips through unreverse_url;
- choose_repr always returns one of its two inputs;
- the pandas vectorized canonicalizer agrees with the scalar form.
"""

from __future__ import annotations

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from warps_nutch_spark.functions import urls

_label = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyz0123456789-", min_size=1, max_size=8
).filter(lambda s: not s.startswith("-") and not s.endswith("-"))
_host = st.lists(_label, min_size=2, max_size=4).map(".".join)
_path_seg = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyz0123456789._-", min_size=1, max_size=6
)
_path = st.lists(_path_seg, min_size=0, max_size=4).map(
    lambda segs: "/" + "/".join(segs) if segs else "/"
)
_query = st.one_of(
    st.none(),
    st.lists(
        st.tuples(_path_seg, _path_seg).map(lambda kv: f"{kv[0]}={kv[1]}"),
        min_size=1,
        max_size=3,
    ).map("&".join),
)


@st.composite
def url_strategy(draw):
    scheme = draw(st.sampled_from(["http", "https", "ftp"]))
    host = draw(_host)
    port = draw(st.one_of(st.none(), st.integers(1, 65535)))
    path = draw(_path)
    query = draw(_query)
    u = f"{scheme}://{host}"
    if port is not None:
        u += f":{port}"
    u += path
    if query:
        u += f"?{query}"
    return u


@given(url_strategy())
@settings(max_examples=300, deadline=None)
def test_canonicalize_idempotent(url):
    c = urls.canonicalize(url)
    assert c is not None
    assert urls.canonicalize(c) == c


@given(url_strategy())
@settings(max_examples=300, deadline=None)
def test_reverse_url_round_trips(url):
    c = urls.canonicalize(url)
    key = urls.reverse_url(c)
    assert urls.unreverse_url(key) == c


@given(url_strategy(), url_strategy(), st.booleans())
@settings(max_examples=300, deadline=None)
def test_choose_repr_total_and_closed(src, dst, temp):
    got = urls.choose_repr(src, dst, temp)
    assert got in (src, dst)


@given(st.lists(url_strategy(), min_size=1, max_size=20))
@settings(max_examples=50, deadline=None)
def test_vectorized_canonicalize_matches_scalar(batch):
    got = urls.canonicalize_series(pd.Series(batch, dtype="string")).tolist()
    want = [urls.canonicalize(u) for u in batch]
    assert got == want


# ---------------------------------------------------------------------------
# banded Hamming pairs: exact recall+precision vs brute force for
# d <= max_hamming < n_bands (pigeonhole) over generated signatures
# ---------------------------------------------------------------------------
_sig = st.integers(min_value=-(2**63), max_value=2**63 - 1)


@settings(max_examples=8, deadline=None)
@given(
    sigs=st.lists(_sig, min_size=2, max_size=24, unique=True),
    flips=st.lists(
        st.tuples(st.integers(0, 23), st.lists(st.integers(0, 63), min_size=1, max_size=7, unique=True)),
        min_size=0,
        max_size=4,
    ),
)
def test_hamming_pairs_match_brute_force(spark, sigs, flips):
    import itertools

    import pandas as pd

    from warps_nutch_spark.operators.dedup import hamming_pairs_int64

    # plant near-dups: flip <= 7 bits of an existing signature
    vals = list(sigs)
    for src, bits in flips:
        if src >= len(sigs):
            continue
        m = 0
        for b in bits:
            m |= 1 << b
        twin = ((sigs[src] ^ m) + 2**63) % 2**64 - 2**63  # stay in int64
        if twin not in vals:
            vals.append(twin)

    def ham(a, b):
        return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")

    max_h, n_bands = 7, 8
    truth = {
        (i, j)
        for (i, a), (j, b) in itertools.combinations(enumerate(vals), 2)
        if ham(a, b) <= max_h
    }
    df = spark.createDataFrame(
        pd.DataFrame({"image_id": list(range(len(vals))), "phash": vals})
    )
    got = hamming_pairs_int64(
        df, sig_col="phash", id_col="image_id", n_bands=n_bands, max_hamming=max_h
    ).collect()
    got_pairs = {tuple(sorted((r["id_a"], r["id_b"]))) for r in got}
    assert got_pairs == truth
