"""URL canonicalization for crawl dedup / host-level statistics.

Crawl pipelines dedup and aggregate by CANONICAL url: the same page is
fetched as ``HTTP://Site.com:80/a/../b?utm_source=x#frag`` and
``http://site.com/b`` and must collapse to one key.  The corpus tables
carry no URL column, so the driver-facing query
(:func:`pipelines.docops.url_canonicalize`) generates a deterministic
messy URL per ``doc_id`` (:func:`messy_url`) and canonicalizes it with
the REAL normalizer below; the DuckDB oracle recomputes the expected
canonical string from ``doc_id`` by mirroring the generation rule.
Adversarial inputs (encoding, dot-segments, ports, query ordering) are
pinned in ``tests/test_pii_url.py``.

Normalization steps (RFC 3986 §6 syntax-based normalization + the crawl
conventions CommonCrawl-style pipelines apply):

* scheme and host lowercased; default port stripped (http:80 / https:443)
* dot-segments resolved (``/a/./b/../c`` -> ``/a/c``)
* percent-encoding: unreserved characters decoded, remaining escapes
  uppercased (``%7e`` -> ``~``, ``%2f`` stays ``%2F``)
* directory-index filenames dropped (``.../index.html`` -> ``.../``)
* fragment dropped; tracking params (``utm_*``, ``fbclid``, ``gclid``)
  dropped; surviving query params sorted by (key, value)
* empty path -> ``/``
"""

from __future__ import annotations

import re
from urllib.parse import parse_qsl, urlencode, urlsplit, urlunsplit

DEFAULT_PORTS = {"http": "80", "https": "443"}
INDEX_NAMES = {"index.html", "index.htm", "index.php", "default.asp"}
TRACKING_RE = re.compile(r"^(utm_|fbclid$|gclid$)")

_UNRESERVED = (
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789-._~"
)
_PCT_RE = re.compile(r"%([0-9A-Fa-f]{2})")


def _norm_pct(s: str) -> str:
    """Decode unreserved percent-escapes, uppercase the rest."""

    def repl(m: re.Match) -> str:
        ch = chr(int(m.group(1), 16))
        return ch if ch in _UNRESERVED else "%" + m.group(1).upper()

    return _PCT_RE.sub(repl, s)


def _remove_dot_segments(path: str) -> str:
    out: list[str] = []
    for seg in path.split("/"):
        if seg == ".":
            continue
        if seg == "..":
            if len(out) > 1:
                out.pop()
            continue
        out.append(seg)
    # preserve a trailing slash produced by a final "." / ".." segment
    if path.endswith(("/.", "/..")) and (not out or out[-1] != ""):
        out.append("")
    return "/".join(out)


def canonical_url(url: str) -> str:
    """Canonical form of ``url`` (see module docstring for the steps)."""
    parts = urlsplit(url.strip())
    scheme = parts.scheme.lower()
    host = parts.hostname.lower() if parts.hostname else ""
    port = parts.port
    netloc = host
    if port is not None and str(port) != DEFAULT_PORTS.get(scheme, ""):
        netloc = f"{host}:{port}"

    path = _norm_pct(_remove_dot_segments(parts.path))
    last = path.rsplit("/", 1)[-1]
    if last.lower() in INDEX_NAMES:
        path = path[: len(path) - len(last)]
    if not path:
        path = "/"

    kept = sorted(
        (k, v)
        for k, v in parse_qsl(parts.query, keep_blank_values=True)
        if not TRACKING_RE.match(k.lower())
    )
    query = urlencode(kept)
    return urlunsplit((scheme, netloc, path, query, ""))


def messy_url(seed: int) -> str:
    """Deterministic messy URL keyed on ``seed`` (= doc_id) — exercises
    every canonicalization step; the expected canonical form is
    ``https://www.site{seed % 7}.com/a/{seed}/b%61se/?a=r{seed % 4}&z={seed % 13}``
    before percent-decoding, i.e. ``.../base/...`` after (mirrored by the
    oracle SQL as a plain string concat over doc_id)."""
    return (
        f"HTTPS://WWW.Site{seed % 7}.COM:443"
        f"/a/{seed}/./x/../b%61se/index.html"
        f"?z={seed % 13}&utm_source=feed&a=r{seed % 4}&utm_medium=e#s{seed % 3}"
    )
