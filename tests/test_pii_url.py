"""Unit goldens for the PII scrubber and URL canonicalizer (round 5).

The driver-facing queries (pii_scrub / url_canonicalize / decontaminate)
are oracle-checked end-to-end via test_driver_contract.py; these tests pin
the underlying extractors on adversarial inputs the synthetic harness
never generates.
"""

from __future__ import annotations

import pytest

from img2table_ray.functions.pii import inject_pii, scrub_text
from img2table_ray.functions.urlnorm import canonical_url, messy_url


# --- PII scrubber ----------------------------------------------------------

def test_scrub_emails():
    clean, ne, ni, np_ = scrub_text(
        "mail a.b-c+tag@sub.Example.CO.uk or x@y.io, not invalid@nodot"
    )
    assert (ne, ni, np_) == (2, 0, 0)
    assert clean == "mail [EMAIL] or [EMAIL], not invalid@nodot"


def test_scrub_phones_formats():
    text = ("call +1 (415) 555-0134 or 415-555-0134 or 415.555.0134 "
            "or 1 415 555 0134; not 12345-678-9012")
    clean, ne, ni, np_ = scrub_text(text)
    assert np_ == 4
    assert "555" not in clean
    # digit-boundary guard: the 13-digit run is not a phone
    assert "12345-678-9012" in clean


def test_scrub_ipv4_octet_ranges():
    clean, ne, ni, np_ = scrub_text(
        "srv 10.2.255.1 and 255.255.255.255 but not 999.1.1.1 "
        "nor 1.2.3.4.5 nor v1.2.3.40000"
    )
    assert ni == 2
    assert clean.startswith("srv [IP] and [IP] but")
    assert "999.1.1.1" in clean
    assert "1.2.3.4.5" in clean  # 5-part dotted run is not an IPv4


def test_scrub_idempotent():
    once, *_ = scrub_text("x@y.io at 10.0.0.1 call 415-555-0134")
    twice, ne, ni, np_ = scrub_text(once)
    assert twice == once and (ne, ni, np_) == (0, 0, 0)


def test_scrub_plain_text_untouched():
    text = "the quick brown fox at version 1.2 of 3"
    clean, ne, ni, np_ = scrub_text(text)
    assert clean == text and (ne, ni, np_) == (0, 0, 0)


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 5, 29, 101, 9999])
def test_inject_counts_match_rule(seed):
    wrapped = inject_pii(seed, "lorem ipsum " * 20)
    _, ne, ni, np_ = scrub_text(wrapped)
    assert ne == seed % 3
    assert np_ == seed % 2
    assert ni == (seed + 1) % 2


def test_inject_short_text_still_carries_all():
    # fewer words than inserts: the tail extend must keep every item
    wrapped = inject_pii(5, "a")
    _, ne, ni, np_ = scrub_text(wrapped)
    assert (ne, np_, ni) == (2, 1, 0)


# --- URL canonicalizer -----------------------------------------------------

def test_canonical_lowercases_and_strips_default_port():
    assert (canonical_url("HTTP://WWW.Ex.COM:80/Path")
            == "http://www.ex.com/Path")
    assert (canonical_url("https://ex.com:8443/") ==
            "https://ex.com:8443/")  # non-default port survives


def test_canonical_dot_segments_and_index():
    assert (canonical_url("https://e.com/a/./b/../c/index.html")
            == "https://e.com/a/c/")
    assert canonical_url("https://e.com/a/..") == "https://e.com/"
    assert canonical_url("https://e.com") == "https://e.com/"


def test_canonical_percent_encoding():
    # unreserved decoded, reserved kept and uppercased
    assert (canonical_url("https://e.com/b%61r/%7Efoo/a%2fb")
            == "https://e.com/bar/~foo/a%2Fb")


def test_canonical_query_sort_and_tracking_params():
    assert (canonical_url(
        "https://e.com/p?z=2&utm_source=x&a=1&fbclid=abc&a=0#frag")
        == "https://e.com/p?a=0&a=1&z=2")


def test_canonical_blank_values_kept():
    assert canonical_url("https://e.com/p?b=&a=1") == "https://e.com/p?a=1&b="


@pytest.mark.parametrize("seed", [0, 1, 6, 7, 13, 52, 12345])
def test_messy_url_roundtrip(seed):
    expect = (f"https://www.site{seed % 7}.com/a/{seed}/base/"
              f"?a=r{seed % 4}&z={seed % 13}")
    assert canonical_url(messy_url(seed)) == expect
