"""PII detection / redaction primitives for the training-data pipeline.

Real-world scrubbing runs compiled regexes over every document before the
text reaches a training set.  The corpus here is synthetic prose with no
PII, so the driver-facing query (:func:`pipelines.docops.pii_scrub`)
deterministically injects PII keyed on ``doc_id`` (same harness pattern as
``main_content``'s seeded boilerplate) and the scrubber must find exactly
what was injected — the injection RULE is mirrored by the DuckDB oracle,
while the regex scrubbing itself is pinned by unit-test goldens on
adversarial fixtures (``tests/test_pii_url.py``).

Patterns are module-level compiled constants: workers import them once per
process, never per batch.
"""

from __future__ import annotations

import re

# Ordered so earlier passes cannot create or destroy later matches:
# emails contain no phone/IP shapes once replaced, and the IPv4 pass runs
# before the phone pass so dotted quads are never half-eaten as digits.
EMAIL_RE = re.compile(
    r"\b[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}\b"
)
# IPv4 with octet range check (0-255) and no adjacent digits/dots.
IPV4_RE = re.compile(
    r"(?<![\d.])"
    r"(?:(?:25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)\.){3}"
    r"(?:25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)"
    r"(?![\d.])"
)
# North-American-style numbers: optional +1, separators space/dot/dash,
# optional parenthesized area code.
PHONE_RE = re.compile(
    r"(?<!\d)(?:\+?1[\s.-]?)?(?:\(\d{3}\)|\d{3})[\s.-]\d{3}[\s.-]\d{4}(?!\d)"
)

EMAIL_TOKEN = "[EMAIL]"
PHONE_TOKEN = "[PHONE]"
IPV4_TOKEN = "[IP]"


def scrub_text(text: str) -> tuple[str, int, int, int]:
    """Redact PII in ``text`` -> (clean_text, n_emails, n_ipv4, n_phones).

    Idempotent: scrubbing already-scrubbed text is a no-op (the
    replacement tokens contain no letters-at-word-boundary/digit shapes
    any pattern matches).
    """
    clean, n_email = EMAIL_RE.subn(EMAIL_TOKEN, text)
    clean, n_ip = IPV4_RE.subn(IPV4_TOKEN, clean)
    clean, n_phone = PHONE_RE.subn(PHONE_TOKEN, clean)
    return clean, n_email, n_ip, n_phone


def inject_pii(seed: int, text: str) -> str:
    """Weave deterministic PII into ``text`` keyed on ``seed`` (= doc_id).

    Injection counts — mirrored verbatim by the DuckDB oracle
    (:func:`pipelines.oracles.pii_scrub_sql`):

    * emails: ``seed % 3``
    * phones: ``seed % 2``
    * IPv4s:  ``(seed + 1) % 2``
    """
    words = text.split(" ")
    out: list[str] = []
    inserts: list[str] = []
    for i in range(seed % 3):
        inserts.append(f"user{seed}.x{i}@mail{seed % 5}.example.com")
    for i in range(seed % 2):
        inserts.append(f"+1 (415) 555-{seed % 10000:04d}")
    for i in range((seed + 1) % 2):
        inserts.append(f"10.{seed % 200}.{(seed >> 3) % 200}.{1 + seed % 99}")
    if not inserts:
        return text
    step = max(1, len(words) // (len(inserts) + 1))
    k = 0
    for j, w in enumerate(words):
        out.append(w)
        if k < len(inserts) and (j + 1) % step == 0:
            out.append(inserts[k])
            k += 1
    out.extend(inserts[k:])
    return " ".join(out)
