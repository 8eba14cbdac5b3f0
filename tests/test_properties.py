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
