"""Property tests (hypothesis) for the round-5 curation primitives, plus
the decontaminate broadcast-size guard."""

from __future__ import annotations

import re

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from img2table_ray.functions.pii import scrub_text
from img2table_ray.functions.urlnorm import canonical_url

# URL generator: scheme/host/path/query/fragment fragments that compose
# into parseable (sometimes degenerate) URLs.
_host = st.from_regex(r"[A-Za-z]([A-Za-z0-9-]{0,10}\.){0,3}[A-Za-z]{2,5}",
                      fullmatch=True)
_path_seg = st.sampled_from(
    ["a", "B", ".", "..", "x%61y", "%7E", "index.html", "p-q_r", "9"])
_qkey = st.sampled_from(["a", "z", "utm_source", "fbclid", "Q", "k2"])
_qval = st.sampled_from(["", "1", "x y", "%2F", "v"])


@st.composite
def urls(draw):
    scheme = draw(st.sampled_from(["http", "HTTP", "https", "HTTPS"]))
    host = draw(_host)
    port = draw(st.sampled_from(["", ":80", ":443", ":8080"]))
    segs = draw(st.lists(_path_seg, max_size=6))
    q = draw(st.lists(st.tuples(_qkey, _qval), max_size=4))
    frag = draw(st.sampled_from(["", "#f", "#x y"]))
    query = "&".join(f"{k}={v}" for k, v in q)
    return (f"{scheme}://{host}{port}/" + "/".join(segs)
            + (f"?{query}" if query else "") + frag)


@given(urls())
@settings(max_examples=200, deadline=None)
def test_canonical_url_idempotent(u):
    c = canonical_url(u)
    assert canonical_url(c) == c


@given(urls())
@settings(max_examples=200, deadline=None)
def test_canonical_url_shape(u):
    c = canonical_url(u)
    assert c.startswith(("http://", "https://"))
    assert "#" not in c
    assert "utm_" not in c.split("?")[0] or True  # params only in query
    scheme, rest = c.split("://", 1)
    host = rest.split("/", 1)[0]
    assert host == host.lower()
    # only the scheme's OWN default port is stripped (http://x:443 keeps it)
    assert not host.endswith(":80" if scheme == "http" else ":443")
    # dot segments resolved
    path = "/" + c.split("://", 1)[1].split("/", 1)[1].split("?")[0]
    assert "/./" not in path and not re.search(r"/\.\.(/|$)", path)


@given(st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126),
    max_size=300,
))
@settings(max_examples=300, deadline=None)
def test_scrub_idempotent_and_terminates(text):
    clean, ne, ni, np_ = scrub_text(text)
    again, e2, i2, p2 = scrub_text(clean)
    assert again == clean
    assert (e2, i2, p2) == (0, 0, 0)


def test_decontaminate_bench_size_guard(ray_session):
    from img2table_ray.pipelines.docops import decontaminate

    with pytest.raises(ValueError, match="too .*large to broadcast"):
        decontaminate("/root/testdata/sf0.001", max_bench_grams=5)
