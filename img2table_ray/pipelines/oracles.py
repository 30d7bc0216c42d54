"""DuckDB oracle SQL for every SQL-expressible query in ``__ray_entry__``.

The SQL is generated from the same constants the Ray pipelines use
(stopword lists, minhash parameters, simhash bit count), so the two sides
cannot drift.  Tables region/nation/customer/supplier/part/orders/lineitem/
events/documents/embeddings are pre-registered views on the driver side.
"""

from __future__ import annotations

from img2table_ray.functions.hashing import HEX_CHARS, SIMHASH_BITS
from img2table_ray.pipelines.docops import LANG_MARKERS, STOPWORDS
from img2table_ray.pipelines.dedup import (
    BAND_SIZE,
    JACCARD_DEN,
    JACCARD_NUM,
    NUM_HASHES,
    SHINGLE_K,
)
from img2table_ray.pipelines.similarity import N_QUERIES, TOP_K

# canonical normalized text + tokenization fragments
_NORM = r"trim(regexp_replace(lower(text), '\s+', ' ', 'g'))"
_TOKENS_RAW = r"regexp_extract_all(text, '\S+')"
_TOKENS_NORM = rf"regexp_extract_all({_NORM}, '\S+')"
_WORDS = r"regexp_extract_all(lower(text), '[a-z]+')"


def _sql_list(strings) -> str:
    return "(" + ", ".join(f"'{s}'" for s in strings) + ")"


def token_count_sql() -> str:
    return (
        "SELECT doc_id, "
        f"len({_TOKENS_RAW})::BIGINT AS n_tokens "
        "FROM documents"
    )


def text_quality_sql() -> str:
    return f"""
SELECT doc_id,
  length(text)::BIGINT AS n_chars,
  len({_TOKENS_RAW})::BIGINT AS n_tokens,
  len({_WORDS})::BIGINT AS n_words,
  len(list_filter({_WORDS}, w -> w IN {_sql_list(STOPWORDS)}))::BIGINT AS n_stopwords,
  len(regexp_extract_all(text, '[!-/:-@\\[-`{{-~]'))::BIGINT AS n_punct,
  len(regexp_extract_all(text, '[0-9]'))::BIGINT AS n_digits,
  len(regexp_extract_all(text, '[A-Z]'))::BIGINT AS n_upper
FROM documents
"""


def lang_id_sql() -> str:
    langs = sorted(LANG_MARKERS)
    score_exprs = ",\n  ".join(
        f"len(list_filter(ws, x -> x IN {_sql_list(LANG_MARKERS[lang])}))::BIGINT"
        f" AS score_{lang}"
        for lang in langs
    )
    greatest = "greatest(" + ", ".join(f"score_{l}" for l in langs) + ")"
    # lexicographic-first argmax ladder (matches numpy argmax over sorted langs)
    ladder = f"WHEN {greatest} = 0 THEN 'und'\n"
    for i, lang in enumerate(langs[:-1]):
        conds = " AND ".join(
            f"score_{lang} >= score_{other}" for other in langs[i + 1 :]
        )
        ladder += f"    WHEN {conds} THEN '{lang}'\n"
    ladder += f"    ELSE '{langs[-1]}'"
    cols = ", ".join(f"score_{l}" for l in langs)
    return f"""
WITH w AS (SELECT doc_id, {_WORDS} AS ws FROM documents),
s AS (SELECT doc_id,
  {score_exprs}
FROM w)
SELECT doc_id, CASE {ladder} END AS pred_lang, {cols} FROM s
"""


def _simhash_terms() -> str:
    return "\n    + ".join(
        f"(CASE WHEN list_sum(list_transform(ti, v -> ((v >> {j}) & 1)*2 - 1)) > 0"
        f" THEN (1::BIGINT << {j}) ELSE 0 END)"
        for j in range(SIMHASH_BITS)
    )


def doc_fingerprint_sql() -> str:
    terms = _simhash_terms()
    return f"""
WITH t AS (
  SELECT doc_id, md5({_NORM}) AS content_hash,
         [('0x' || substr(md5(x), 1, {HEX_CHARS}))::BIGINT for x in {_TOKENS_NORM}] AS ti
  FROM documents)
SELECT doc_id, content_hash,
  ({terms})::BIGINT AS simhash
FROM t
"""


def exact_dedup_sql() -> str:
    return (
        "SELECT md5(text) AS content_hash, min(doc_id)::BIGINT AS doc_id "
        "FROM documents GROUP BY 1"
    )


def _minhash_cte() -> str:
    """Shared CTE text: tokens -> shingles -> signature -> bands."""
    sig_exprs = ",\n    ".join(
        f"list_min(list_transform(sg, s -> md5('{i}:' || s))) AS m{i}"
        for i in range(NUM_HASHES)
    )
    band_selects = []
    for b in range(NUM_HASHES // BAND_SIZE):
        parts = " || '|' || ".join(
            f"m{b * BAND_SIZE + r}" for r in range(BAND_SIZE)
        )
        band_selects.append(
            f"SELECT doc_id, {b}::BIGINT AS band, md5({parts}) AS band_hash FROM sig"
        )
    bands = "\n    UNION ALL ".join(band_selects)
    shingle_expr = " || ' ' || ".join(f"tk[i+{j}]" for j in range(SHINGLE_K))
    return f"""
toks AS (SELECT doc_id, {_TOKENS_NORM} AS tk FROM documents),
sh AS (
  SELECT doc_id,
         list_transform(generate_series(1, len(tk) - {SHINGLE_K - 1}), i -> {shingle_expr}) AS sg
  FROM toks WHERE len(tk) >= {SHINGLE_K}),
sig AS (SELECT doc_id,
    {sig_exprs}
  FROM sh),
bands AS ({bands}),
pairs AS (
  SELECT DISTINCT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id)
"""


def minhash_lsh_pairs_sql() -> str:
    return f"""
WITH {_minhash_cte()}
SELECT doc_id_a::BIGINT AS doc_id_a, doc_id_b::BIGINT AS doc_id_b FROM pairs
"""


def minhash_dedup_sql() -> str:
    """Connected components over the LSH pair graph: survivor = min doc_id
    reachable (recursive transitive closure; fine at oracle scale — the Ray
    side uses iterative min-label propagation instead)."""
    return f"""
WITH RECURSIVE {_minhash_cte()},
edges AS (
  SELECT doc_id_a AS s, doc_id_b AS d FROM pairs
  UNION ALL
  SELECT doc_id_b, doc_id_a FROM pairs),
reach(doc_id, r) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT reach.doc_id, e.d FROM reach JOIN edges e ON reach.r = e.s)
SELECT doc_id::BIGINT AS doc_id, min(r)::BIGINT AS survivor_id
FROM reach GROUP BY doc_id
"""


def ngram_jaccard_pairs_sql() -> str:
    return f"""
WITH {_minhash_cte()},
sets AS (SELECT doc_id, list_distinct(sg) AS ss FROM sh),
j AS (
  SELECT p.doc_id_a::BIGINT AS doc_id_a, p.doc_id_b::BIGINT AS doc_id_b,
         len(list_intersect(a.ss, b.ss))::BIGINT AS n_inter,
         (len(a.ss) + len(b.ss) - len(list_intersect(a.ss, b.ss)))::BIGINT AS n_union
  FROM pairs p
  JOIN sets a ON a.doc_id = p.doc_id_a
  JOIN sets b ON b.doc_id = p.doc_id_b)
SELECT * FROM j WHERE n_inter * {JACCARD_DEN} >= n_union * {JACCARD_NUM}
"""


def embedding_dup_pairs_sql(threshold: float = 0.42) -> str:
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
SELECT a.vec_id::BIGINT AS vec_id_a, b.vec_id::BIGINT AS vec_id_b,
       round(list_cosine_similarity(a.v, b.v), 6) AS sim
FROM e a JOIN e b ON a.vec_id < b.vec_id
WHERE round(list_cosine_similarity(a.v, b.v), 6) >= {threshold}
"""


def ann_topk_sql() -> str:
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
q AS (SELECT * FROM e WHERE vec_id < {N_QUERIES}),
scored AS (
  SELECT q.vec_id AS query_id, e.vec_id AS vec_id,
         round(list_cosine_similarity(q.v, e.v), 6) AS sim6
  FROM q, e WHERE e.vec_id <> q.vec_id),
ranked AS (
  SELECT query_id, vec_id, sim6,
         row_number() OVER (PARTITION BY query_id ORDER BY sim6 DESC, vec_id) AS rnk
  FROM scored)
SELECT query_id::BIGINT AS query_id, vec_id::BIGINT AS vec_id,
       sim6 AS sim, rnk::BIGINT AS rnk
FROM ranked WHERE rnk <= {TOP_K}
"""


def pricing_summary_sql() -> str:
    return """
SELECT l_returnflag, l_linestatus,
  round(sum(l_quantity), 2) AS sum_qty,
  round(sum(l_extendedprice), 2) AS sum_base_price,
  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
  round(sum(l_quantity) / count(*), 4) AS avg_qty,
  count(*)::BIGINT AS count_order
FROM lineitem GROUP BY 1, 2
"""


def events_hourly_sql() -> str:
    return """
SELECT event_type, date_trunc('hour', ts) AS hour,
  count(*)::BIGINT AS n_events, round(sum(value), 4) AS sum_value
FROM events GROUP BY 1, 2
"""


def nation_revenue_sql() -> str:
    return """
SELECT n.n_name AS n_name, round(sum(o.o_totalprice), 2) AS total_revenue,
  count(*)::BIGINT AS n_orders
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY 1
"""


def simhash_near_dup_sql(max_hamming: int = 3) -> str:
    """SimHash near-dup pairs: 15-bit chunk blocking + Hamming verify,
    mirrored via DuckDB xor/bit_count."""
    terms = _simhash_terms()
    chunk_match = " OR ".join(
        f"((a.simhash >> {15 * c}) & 32767) = ((b.simhash >> {15 * c}) & 32767)"
        for c in range(4)
    )
    return f"""
WITH t AS (
  SELECT doc_id,
         [('0x' || substr(md5(x), 1, {HEX_CHARS}))::BIGINT for x in {_TOKENS_NORM}] AS ti
  FROM documents),
s AS (SELECT doc_id, ({terms})::BIGINT AS simhash FROM t)
SELECT a.doc_id::BIGINT AS doc_id_a, b.doc_id::BIGINT AS doc_id_b,
       bit_count(xor(a.simhash, b.simhash))::BIGINT AS hamming
FROM s a JOIN s b ON a.doc_id < b.doc_id
WHERE ({chunk_match})
  AND bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}
"""


def sessionize_sql(gap_minutes: int = 30) -> str:
    return f"""
WITH flagged AS (
  SELECT user_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL THEN 0
              WHEN ts - lag(ts) OVER w > INTERVAL {gap_minutes} MINUTE THEN 1
              ELSE 0 END AS gap_flag
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
sess AS (
  SELECT user_id, ts, value,
         sum(gap_flag) OVER (PARTITION BY user_id ORDER BY ts
                             ROWS UNBOUNDED PRECEDING) AS session_id
  FROM flagged)
SELECT user_id, session_id::BIGINT AS session_id,
       min(ts) AS session_start, max(ts) AS session_end,
       count(*)::BIGINT AS n_events, round(sum(value), 4) AS sum_value
FROM sess GROUP BY 1, 2
"""


def winnow_fingerprints_sql(k: int = 5, w: int = 4) -> str:
    return f"""
WITH t AS (SELECT doc_id, {_NORM} AS nt FROM documents),
g AS (
  SELECT doc_id,
         [('0x' || substr(md5(substr(nt, i, {k})), 1, {HEX_CHARS}))::BIGINT
          for i in generate_series(1, greatest(len(nt) - {k - 1}, 0))] AS hs
  FROM t),
f AS (
  SELECT doc_id,
         CASE WHEN len(hs) = 0 THEN []::BIGINT[]
              WHEN len(hs) <= {w} THEN [list_min(hs)]
              ELSE list_distinct([list_min(list_slice(hs, i, i + {w - 1}))
                                  for i in generate_series(1, len(hs) - {w - 1})])
         END AS fps
  FROM g)
SELECT doc_id, len(fps)::BIGINT AS n_fingerprints,
       list_min(fps) AS min_fp, list_max(fps) AS max_fp
FROM f
"""


def asof_join_sql(left_type: str = "purchase",
                  right_type: str = "click") -> str:
    """Deterministic as-of formulation (correlated LATERAL top-1 instead of
    DuckDB's ASOF JOIN so the tie-break — latest ts, then largest event_id
    — is explicit and matches the Ray side's sorted merge_asof)."""
    return f"""
SELECT p.event_id, p.user_id, p.ts,
       c.event_id AS click_event_id, c.ts AS click_ts,
       (epoch_us(p.ts) - epoch_us(c.ts))::BIGINT AS gap_us
FROM (SELECT event_id, user_id, ts FROM events
      WHERE event_type = '{left_type}') p
JOIN LATERAL (
  SELECT event_id, ts FROM events c
  WHERE c.event_type = '{right_type}'
    AND c.user_id = p.user_id AND c.ts <= p.ts
  ORDER BY c.ts DESC, c.event_id DESC LIMIT 1) c ON TRUE
"""


def range_join_sql() -> str:
    from img2table_ray.pipelines.joins import PRICE_BANDS

    values = ", ".join(f"({i}, {lo!r}, {hi!r})" for i, lo, hi in PRICE_BANDS)
    return f"""
WITH bands(band_id, lo, hi) AS (VALUES {values})
SELECT band_id::BIGINT AS band_id, lo::DOUBLE AS lo, hi::DOUBLE AS hi,
       count(*)::BIGINT AS n_items, round(sum(l_extendedprice), 2) AS sum_price
FROM lineitem JOIN bands ON l_extendedprice >= lo AND l_extendedprice < hi
GROUP BY 1, 2, 3
"""


def sliding_window_sql() -> str:
    from img2table_ray.pipelines.joins import HOP_US, WINDOW_US

    nhops = WINDOW_US // HOP_US
    hop_vals = ", ".join(f"({k})" for k in range(nhops))
    return f"""
WITH hops(k) AS (VALUES {hop_vals})
SELECT make_timestamp((epoch_us(ts) // {HOP_US} - k) * {HOP_US})
         AS window_start,
       event_type, count(*)::BIGINT AS n_events,
       round(sum(value), 4) AS sum_value
FROM events CROSS JOIN hops
GROUP BY 1, 2
"""


def group_quantiles_sql() -> str:
    from img2table_ray.pipelines.relational import QUANTILE_QS

    cols = ",\n       ".join(
        f"quantile_disc(l_extendedprice, {q}) AS p{int(q * 100)}"
        for q in QUANTILE_QS
    )
    return f"""
SELECT l_returnflag, count(*)::BIGINT AS n_rows,
       {cols}
FROM lineitem GROUP BY 1
"""


def distinct_users_daily_sql() -> str:
    return """
SELECT date_trunc('day', ts) AS day,
       count(DISTINCT user_id)::BIGINT AS n_users
FROM events GROUP BY 1
"""


def top_orders_per_nation_sql(k: int = 3) -> str:
    return f"""
SELECT n_name, rank, o_orderkey, o_totalprice FROM (
  SELECT n.n_name AS n_name,
         row_number() OVER (PARTITION BY n.n_name
                            ORDER BY o.o_totalprice DESC, o.o_orderkey
                            )::BIGINT AS rank,
         o.o_orderkey, o.o_totalprice
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey)
WHERE rank <= {k}
"""


def deterministic_sample_sql(pct: int = 10) -> str:
    return f"""
SELECT doc_id, lang, n_chars FROM documents
WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
      % 100 < {pct}
"""


def main_content_sql() -> str:
    """Byte-exact recovery oracle: the readability extractor must return
    each document's original text from its boilerplate-wrapped HTML."""
    return """
SELECT doc_id, text AS main_text FROM documents
"""


def repetition_signals_sql() -> str:
    """Word bigram/trigram repetition numerators via the list-slicing
    n-gram CTE; empty-gram docs get explicit zero rows."""

    def gram_cte(n: int, tag: str) -> str:
        return f"""
g{tag} AS (
  SELECT doc_id, array_to_string(ws[i:i+{n - 1}], ' ') AS g
  FROM words, UNNEST(range(1, len(ws) - {n - 2})) AS t(i)
  WHERE len(ws) >= {n}
), s{tag} AS (
  SELECT doc_id, SUM(cnt)::BIGINT AS total,
         count(*)::BIGINT AS uniq,
         max(cnt)::BIGINT AS top
  FROM (SELECT doc_id, g, count(*) AS cnt FROM g{tag} GROUP BY doc_id, g)
  GROUP BY doc_id
)"""

    return f"""
WITH words AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') AS ws
  FROM documents
), {gram_cte(2, "2")}, {gram_cte(3, "3")}
SELECT d.doc_id,
       COALESCE(s2.total, 0)::BIGINT AS n_bigrams,
       COALESCE(s2.uniq, 0)::BIGINT AS n_distinct_bigrams,
       COALESCE(s2.top, 0)::BIGINT AS top_bigram_n,
       COALESCE(s3.total, 0)::BIGINT AS n_trigrams,
       COALESCE(s3.uniq, 0)::BIGINT AS n_distinct_trigrams,
       COALESCE(s3.top, 0)::BIGINT AS top_trigram_n
FROM documents d
LEFT JOIN s2 ON d.doc_id = s2.doc_id
LEFT JOIN s3 ON d.doc_id = s3.doc_id
"""


def stratified_sample_sql() -> str:
    """Mirrors docops.STRATA_PCT / STRATA_DEFAULT_PCT."""
    from img2table_ray.pipelines.docops import (STRATA_DEFAULT_PCT,
                                                STRATA_PCT)

    cases = " ".join(
        f"WHEN '{lang}' THEN {pct}" for lang, pct in sorted(STRATA_PCT.items())
    )
    return f"""
SELECT doc_id, lang, n_chars FROM documents
WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100
      < (CASE lang {cases} ELSE {STRATA_DEFAULT_PCT} END)
"""


def decontaminate_sql(bench_mod: int = 29, n: int = 5) -> str:
    """Recomputes the word n-gram overlap against the benchmark subset as
    a real join (the Ray side broadcasts the benchmark gram set instead)."""
    return f"""
WITH words AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') AS ws
  FROM documents
), grams AS (
  SELECT doc_id, array_to_string(ws[i:i+{n - 1}], ' ') AS g
  FROM words, UNNEST(range(1, len(ws) - {n - 2})) AS t(i)
  WHERE len(ws) >= {n}
), bench AS (
  SELECT DISTINCT g FROM grams WHERE doc_id % {bench_mod} = 0
), hits AS (
  SELECT gr.doc_id, count(DISTINCT gr.g)::BIGINT AS n_hits
  FROM grams gr JOIN bench b ON gr.g = b.g
  GROUP BY gr.doc_id
)
SELECT d.doc_id,
       COALESCE(h.n_hits, 0)::BIGINT AS n_hits,
       (COALESCE(h.n_hits, 0) > 0)::BIGINT AS contaminated
FROM documents d LEFT JOIN hits h USING (doc_id)
"""


def pii_scrub_sql() -> str:
    """Mirrors the deterministic injection rule of
    ``functions.pii.inject_pii`` — the scrubber must find exactly what was
    injected (regex behavior itself is golden-pinned in unit tests)."""
    return """
SELECT doc_id,
       (doc_id % 3)::BIGINT AS n_emails,
       (doc_id % 2)::BIGINT AS n_phones,
       ((doc_id + 1) % 2)::BIGINT AS n_ipv4
FROM documents
"""


def json_props_agg_sql() -> str:
    """Same JSON extraction + bucketing + integer-cents aggregation via
    DuckDB's native json functions."""
    return """
SELECT event_type,
       (CAST(json_extract(props, '$.k') AS BIGINT) // 10) AS k_bucket,
       count(*)::BIGINT AS n_events,
       SUM(CAST(floor(value * 100 + 0.5) AS BIGINT))::BIGINT AS sum_cents
FROM events
GROUP BY event_type, k_bucket
"""


def url_canonicalize_sql() -> str:
    """Reconstructs the expected canonical URL from doc_id by mirroring
    ``functions.urlnorm.messy_url``'s generation rule through every
    normalization step (lowercase, default-port strip, dot-segment
    resolution, %61 -> 'a' decode, index.html drop, utm_* drop, query
    sort, fragment drop)."""
    return """
SELECT doc_id,
       'https://www.site' || (doc_id % 7) || '.com/a/' || doc_id ||
       '/base/?a=r' || (doc_id % 4) || '&z=' || (doc_id % 13) AS url,
       'www.site' || (doc_id % 7) || '.com' AS host
FROM documents
"""
