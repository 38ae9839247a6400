"""DuckDB oracle SQL for every entry in ``__spark_entry__.queries()``.

Each statement mirrors the Spark computation exactly — same aliases,
same decimal-accumulation / rounding policy, same md5-keyed determinism
(see __spark_entry__ docstring). Tables are pre-registered DuckDB views
over the same parquet files.

DuckDB dialect notes (vs Spark SQL):
- ``regexp_replace`` needs the explicit ``'g'`` flag (Spark replaces all);
- ``date_trunc`` returns DATE at day+ granularity → cast ``::TIMESTAMP``;
- ``SUM(int)`` returns HUGEINT → cast ``::BIGINT`` to match Spark's long.
"""

from __future__ import annotations

# normalized text (shared by dedup/fingerprint/shingle oracles)
_NORM = "lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))"
_TOKS = "string_split_regex(lower(trim(coalesce(text,''))), '\\s+')"

ORACLES: dict[str, str] = {}

ORACLES["filter_project"] = """
SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
FROM orders
WHERE o_orderstatus = 'F'
  AND year(o_orderdate) >= 1996 AND year(o_orderdate) < 1999
"""

ORACLES["filter_in_contains"] = """
SELECT p_partkey, p_name, p_brand, p_size
FROM part
WHERE regexp_matches(lower(p_name), 'green|ivory')
   OR p_brand IN ('Brand#11', 'Brand#22')
"""

ORACLES["state_undone"] = """
SELECT c_custkey, c_name, c_acctbal
FROM customer
WHERE c_custkey NOT IN (
    SELECT c_custkey FROM customer WHERE c_acctbal >= 0 OR c_nationkey = 0
)
"""

ORACLES["dedup_first_wins"] = """
SELECT l_orderkey, l_linenumber, l_partkey, l_quantity
FROM lineitem
QUALIFY row_number() OVER (PARTITION BY l_orderkey ORDER BY l_linenumber, l_partkey, l_suppkey) = 1
"""

ORACLES["sample_per_year"] = """
SELECT year(o_orderdate) AS order_year, o_orderkey, o_totalprice
FROM orders
QUALIFY row_number() OVER (
    PARTITION BY year(o_orderdate)
    ORDER BY md5(concat_ws('|', '42', o_orderkey::VARCHAR)), o_orderkey
) <= 100
"""

ORACLES["pricing_summary"] = """
SELECT l_returnflag, l_linestatus,
       SUM(l_quantity) AS sum_qty,
       SUM(l_extendedprice::DECIMAL(18,2))::DOUBLE AS sum_base_price,
       SUM(l_extendedprice::DECIMAL(18,2) * (1::DECIMAL(18,2) - l_discount::DECIMAL(18,2)))::DOUBLE AS sum_disc_price,
       ROUND(AVG(l_quantity), 4) AS avg_qty,
       ROUND(AVG(l_extendedprice), 4) AS avg_price,
       ROUND(AVG(l_discount), 6) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""

ORACLES["events_daily"] = """
SELECT date_trunc('day', ts)::TIMESTAMP AS day,
       COUNT(value) AS n_events,
       ROUND(SUM(value), 4) AS sum_value
FROM events
GROUP BY 1
ORDER BY day
"""

# events_rollup_incremental (r10): the Spark side maintains the state
# table incrementally (3 chunked upserts of integer micro-unit
# partials); the oracle is the ONE-SHOT aggregate — hash equality IS
# the incremental ≡ recompute identity (micro-units make the merge
# order-independent, so the replay cannot drift)
ORACLES["events_rollup_incremental"] = """
SELECT date_trunc('day', ts)::TIMESTAMP AS day,
       event_type,
       COUNT(*) AS n_events,
       SUM(m) / 1000000 AS sum_value,
       MIN(m) / 1000000 AS min_value,
       MAX(m) / 1000000 AS max_value,
       ROUND(SUM(m) / COUNT(*) / 1000000, 6) AS avg_value
FROM (
    SELECT ts, event_type, CAST(round(value * 1000000) AS BIGINT) AS m
    FROM events WHERE value IS NOT NULL
)
GROUP BY 1, 2
ORDER BY day, event_type
"""

# orders_constraint_audit (r10): the Deequ-style suite replays as one
# aggregate CTE + one NOT EXISTS orphan count; labels match
# checks._label exactly, violations are exact integers
ORACLES["orders_constraint_audit"] = """
WITH agg AS (
    SELECT count(*) AS n,
           count(o_orderkey) AS nn_key,
           count(DISTINCT o_orderkey) AS d_key,
           count(o_totalprice) AS nn_price,
           CAST(sum(CASE WHEN o_totalprice < 0.0 OR o_totalprice > 300000.0
                    THEN 1 ELSE 0 END) AS BIGINT) AS v_range,
           count(o_orderstatus) AS nn_status,
           CAST(sum(CASE WHEN o_orderstatus IS NOT NULL
                     AND o_orderstatus NOT IN ('F', 'O')
                    THEN 1 ELSE 0 END) AS BIGINT) AS v_status,
           count(o_orderpriority) AS nn_prio,
           CAST(sum(CASE WHEN o_orderpriority IS NOT NULL
                     AND NOT regexp_matches(o_orderpriority, '^[1-5]-[A-Z ]+$')
                    THEN 1 ELSE 0 END) AS BIGINT) AS v_prio,
           count(o_orderdate) AS nn_date
    FROM orders
), orph AS (
    SELECT count(*) AS v FROM orders o
    WHERE o.o_custkey IS NOT NULL
      AND NOT EXISTS (SELECT 1 FROM customer c
                      WHERE c.c_custkey = o.o_custkey)
), nn_ck AS (
    SELECT count(o_custkey) AS t FROM orders
)
SELECT * FROM (
    SELECT 'not_null' AS "constraint", 'o_orderkey' AS "column",
           n - nn_key AS violations, n AS total,
           (n - nn_key) <= 0 AS passed, 0 AS ord FROM agg
    UNION ALL
    SELECT 'unique', 'o_orderkey', nn_key - d_key, nn_key,
           (nn_key - d_key) <= 0, 1 FROM agg
    UNION ALL
    SELECT 'in_range[0.0,300000.0]', 'o_totalprice', v_range, nn_price,
           v_range <= 0, 2 FROM agg
    UNION ALL
    SELECT 'accepted_values[F,O]', 'o_orderstatus', v_status, nn_status,
           v_status <= 0, 3 FROM agg
    UNION ALL
    SELECT 'matches[^[1-5]-[A-Z ]+$]', 'o_orderpriority', v_prio, nn_prio,
           v_prio <= 0, 4 FROM agg
    UNION ALL
    SELECT 'row_count[1000000,None]', '*', greatest(1000000 - n, 0), n,
           greatest(1000000 - n, 0) <= 0, 5 FROM agg
    UNION ALL
    SELECT 'referential[c_custkey]', 'o_custkey', orph.v, nn_ck.t,
           orph.v <= 0, 6 FROM orph, nn_ck
    UNION ALL
    SELECT 'not_null', 'o_orderdate', n - nn_date, n,
           (n - nn_date) <= 0, 7 FROM agg
)
ORDER BY ord
"""

# events_daily_dense (r10): sparse daily series -> dense calendar with
# zero-filled counts and per-type forward-filled averages; the spine is
# generate_series over the global [min, max] day range
ORACLES["events_daily_dense"] = """
WITH agg AS (
    SELECT date_trunc('day', ts)::TIMESTAMP AS day, event_type,
           COUNT(value) AS n_events, ROUND(AVG(value), 6) AS avg_seen
    FROM events WHERE value > 240 GROUP BY 1, 2
), bounds AS (
    SELECT min(day) AS lo, max(day) AS hi FROM agg
), spine AS (
    SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS day FROM bounds
), grp AS (
    SELECT DISTINCT event_type FROM agg
)
SELECT g.event_type, s.day,
       coalesce(a.n_events, 0) AS n_events,
       last_value(a.avg_seen IGNORE NULLS) OVER (
           PARTITION BY g.event_type ORDER BY s.day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS avg_seen
FROM spine s CROSS JOIN grp g
LEFT JOIN agg a ON a.day = s.day AND a.event_type = g.event_type
ORDER BY g.event_type, s.day
"""

ORACLES["events_weekly_by_type"] = """
SELECT date_trunc('week', ts)::TIMESTAMP AS week,
       event_type,
       ROUND(AVG(value), 6) AS avg_value
FROM events
GROUP BY 1, 2
"""

ORACLES["token_frequency"] = f"""
SELECT token, COUNT(*) AS n
FROM (SELECT unnest({_TOKS}) AS token FROM documents)
GROUP BY token
ORDER BY n DESC, token
LIMIT 50
"""

ORACLES["price_histogram"] = """
SELECT floor(l_extendedprice / 5000.0)::BIGINT AS bin, COUNT(*) AS n
FROM lineitem
GROUP BY 1
ORDER BY bin
"""

_DESCRIBE_COL = """
SELECT '{c}' AS "column", COUNT({c}) AS count,
       ROUND(AVG({c}), 4) AS mean, ROUND(STDDEV({c}), 4) AS std,
       MIN({c})::DOUBLE AS min, ROUND(MEDIAN({c}), 4) AS median,
       MAX({c})::DOUBLE AS max
FROM lineitem
"""
ORACLES["numeric_describe"] = (
    " UNION ALL ".join(
        _DESCRIBE_COL.format(c=c) for c in ["l_quantity", "l_extendedprice", "l_discount"]
    )
    + ' ORDER BY "column"'
)

ORACLES["column_profile"] = """
SELECT 'c_mktsegment' AS "column",
       SUM(CASE WHEN c_mktsegment IS NULL THEN 1 ELSE 0 END)::BIGINT AS missing,
       COUNT(c_mktsegment) AS non_null,
       COUNT(DISTINCT c_mktsegment) AS "distinct",
       array_to_string(list_sort(list(DISTINCT c_mktsegment)), ',') AS values_csv
FROM customer
"""

_CORR_COLS = ["l_quantity", "l_extendedprice", "l_discount"]
ORACLES["correlation"] = (
    " UNION ALL ".join(
        f"SELECT '{a}' AS col_x, '{b}' AS col_y, ROUND(CORR({a}, {b}), 6) AS corr FROM lineitem"
        for i, a in enumerate(_CORR_COLS)
        for b in _CORR_COLS[i:]
    )
    + " ORDER BY col_x, col_y"
)

ORACLES["events_pivot"] = """
SELECT date_trunc('day', ts)::TIMESTAMP AS day,
       COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS click,
       COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS error,
       COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
       COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
       COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS view
FROM events
GROUP BY 1
ORDER BY day
"""

ORACLES["nation_share"] = """
WITH per_nation AS (
    SELECT n_regionkey, n_name, COUNT(*) AS n_customers
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_regionkey, n_name
)
SELECT n_regionkey, n_name, n_customers,
       ROUND(n_customers / SUM(n_customers) OVER (PARTITION BY n_regionkey), 6) AS share
FROM per_nation
"""

ORACLES["order_status_counts"] = """
SELECT COUNT(*) AS total,
       SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END)::BIGINT AS n_open,
       SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)::BIGINT AS n_finished,
       SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END)::BIGINT AS n_urgent,
       SUM(CASE WHEN o_totalprice > 200000 THEN 1 ELSE 0 END)::BIGINT AS n_big
FROM orders
"""

ORACLES["region_revenue"] = """
SELECT r_name, year(o_orderdate) AS order_year,
       SUM(l_extendedprice::DECIMAL(18,2) * (1::DECIMAL(18,2) - l_discount::DECIMAL(18,2)))::DOUBLE AS revenue,
       COUNT(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY r_name, order_year
ORDER BY r_name, order_year
"""

ORACLES["customers_no_orders"] = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
"""

ORACLES["customers_with_open_orders"] = """
SELECT c_custkey, c_name, c_acctbal
FROM customer
WHERE EXISTS (
    SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'O'
)
"""

ORACLES["series_align"] = """
WITH clicks AS (
    SELECT date_trunc('day', ts)::TIMESTAMP AS day, COUNT(*) AS n_clicks
    FROM events WHERE event_type = 'click' GROUP BY 1
), purchases AS (
    SELECT date_trunc('day', ts)::TIMESTAMP AS day, COUNT(*) AS n_purchases
    FROM events WHERE event_type = 'purchase' GROUP BY 1
)
SELECT COALESCE(c.day, p.day) AS day,
       COALESCE(n_clicks, 0) AS n_clicks,
       COALESCE(n_purchases, 0) AS n_purchases
FROM clicks c FULL OUTER JOIN purchases p ON c.day = p.day
ORDER BY day
"""

ORACLES["union_overlap"] = """
SELECT DISTINCT o_orderkey, o_totalprice, o_orderstatus
FROM (
    SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders WHERE o_totalprice > 300000
    UNION ALL
    SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders WHERE year(o_orderdate) = 1998
)
"""

ORACLES["top_revenue_orders"] = """
SELECT o_orderkey, o_orderdate,
       SUM(l_extendedprice::DECIMAL(18,2) * (1::DECIMAL(18,2) - l_discount::DECIMAL(18,2)))::DOUBLE AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderkey, o_orderdate
ORDER BY revenue DESC, o_orderkey
LIMIT 20
"""

ORACLES["top_parts_per_brand"] = """
SELECT p_brand, p_partkey, p_retailprice,
       row_number() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS rank
FROM part
QUALIFY rank <= 3
"""

ORACLES["events_lag_lead"] = """
WITH daily AS (
    SELECT date_trunc('day', ts)::TIMESTAMP AS day, COUNT(*) AS n
    FROM events GROUP BY 1
)
SELECT day, n,
       lag(n) OVER (ORDER BY day) AS prev_n,
       lead(n) OVER (ORDER BY day) AS next_n,
       n - COALESCE(lag(n) OVER (ORDER BY day), 0) AS delta
FROM daily
ORDER BY day
"""

ORACLES["running_revenue"] = """
SELECT o_custkey, o_orderkey,
       SUM(o_totalprice::DECIMAL(18,2)) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       )::DOUBLE AS running_spend
FROM orders
"""

ORACLES["docs_exact_dedup"] = f"""
SELECT doc_id, lang, source, n_chars
FROM documents
QUALIFY row_number() OVER (PARTITION BY md5({_NORM}) ORDER BY doc_id) = 1
"""

ORACLES["docs_fingerprint"] = f"""
SELECT md5({_NORM}) AS fp, COUNT(*) AS n_docs
FROM documents
GROUP BY fp
ORDER BY n_docs DESC, fp
"""

ORACLES["docs_token_stats"] = f"""
WITH scored AS (
    SELECT source,
           len({_TOKS}) AS toks,
           ceil(len(regexp_extract_all(coalesce(text,''), '\\w+|[^\\w\\s]')) * 1.3)::BIGINT AS bpe
    FROM documents
)
SELECT source,
       SUM(toks)::BIGINT AS total_tokens,
       SUM(bpe)::BIGINT AS total_bpe_tokens,
       ROUND(AVG(toks), 4) AS avg_tokens
FROM scored
GROUP BY source
ORDER BY source
"""

ORACLES["docs_quality"] = """
WITH q AS (
    SELECT doc_id,
           ROUND(
             least(length(coalesce(text,'')) / 500.0, 1.0) * 0.5
             + (CASE WHEN
                  length(regexp_replace(coalesce(text,''), '\\s+', '', 'g'))
                    / greatest(len(string_split_regex(lower(trim(coalesce(text,''))), '\\s+')), 1)
                  BETWEEN 3 AND 10
                THEN 1.0 ELSE 0.5 END) * 0.3
             + (1 - (length(coalesce(text,''))
                     - length(regexp_replace(coalesce(text,''), '[^\\w\\s]', '', 'g')))
                    / greatest(length(coalesce(text,'')), 1)) * 0.2
           , 6) AS quality
    FROM documents
)
SELECT floor(quality * 10)::BIGINT AS q_bucket,
       COUNT(*) AS n_docs,
       ROUND(AVG(quality), 6) AS avg_q
FROM q
GROUP BY 1
ORDER BY q_bucket
"""

_LANGS = {
    "de": ["der", "die", "das", "und", "ist", "von", "ein", "eine", "zu", "mit"],
    "en": ["the", "a", "of", "and", "to", "in", "is", "it", "that", "for"],
    "es": ["el", "la", "de", "y", "que", "en", "un", "una", "es", "por"],
    "fr": ["le", "la", "de", "et", "est", "un", "une", "que", "pour", "dans"],
}


def _lang_count(lang: str) -> str:
    lst = ", ".join(f"'{w}'" for w in _LANGS[lang])
    return f"len(list_filter({_TOKS}, t -> list_contains([{lst}], t)))"


ORACLES["docs_language"] = f"""
WITH scored AS (
    SELECT lang AS labeled,
           {_lang_count('de')} AS c_de,
           {_lang_count('en')} AS c_en,
           {_lang_count('es')} AS c_es,
           {_lang_count('fr')} AS c_fr
    FROM documents
)
SELECT labeled,
       CASE WHEN greatest(c_de, c_en, c_es, c_fr) = 0 THEN 'und'
            WHEN c_de = greatest(c_de, c_en, c_es, c_fr) THEN 'de'
            WHEN c_en = greatest(c_de, c_en, c_es, c_fr) THEN 'en'
            WHEN c_es = greatest(c_de, c_en, c_es, c_fr) THEN 'es'
            ELSE 'fr' END AS detected,
       COUNT(*) AS n
FROM scored
GROUP BY labeled, detected
ORDER BY labeled, detected
"""

# ---- sketch oracles (shingles / minhash / simhash), built programmatically

_SHINGLES = f"""
CASE WHEN len(string_split({_NORM}, ' ')) >= 3 THEN
    list_distinct(list_transform(
        generate_series(1, len(string_split({_NORM}, ' ')) - 2),
        i -> array_to_string((string_split({_NORM}, ' '))[i:i+2], ' ')))
ELSE [{_NORM}] END
"""

# 4 independent 32-bit values per md5 digest (8 hex chars each) — mirrors
# minhash_signatures_table's digest-splitting scheme
_MINHASH_SIG = (
    "["
    + ", ".join(
        f"list_min(list_transform(sh, s -> substr(md5(concat_ws('|', '{i // 4}', s)), {(i % 4) * 8 + 1}, 8)))"
        for i in range(16)
    )
    + "]"
)

ORACLES["minhash_lsh_pairs"] = f"""
WITH sh_t AS (
    SELECT doc_id AS doc, {_SHINGLES} AS sh FROM documents
), sig_t AS (
    SELECT doc, {_MINHASH_SIG} AS sig FROM sh_t
), banded AS (
    SELECT doc, b.band_idx,
           md5(array_to_string(sig[b.band_idx*4+1 : b.band_idx*4+4], '|')) AS band_hash
    FROM sig_t, (SELECT unnest(generate_series(0, 3)) AS band_idx) b
)
SELECT DISTINCT a.doc AS id_a, b.doc AS id_b
FROM banded a JOIN banded b
  ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash AND a.doc < b.doc
ORDER BY id_a, id_b
"""

# docs_incremental_dedup: new batch (doc_id % 5 = 0) vs kept history —
# band join between the two sides, exact shingle-Jaccard verify of
# candidates, per-new-doc argmax (j DESC, hist id ASC)
ORACLES["docs_incremental_dedup"] = f"""
WITH newd AS (
    SELECT * FROM documents WHERE doc_id % 5 = 0
), hist AS (
    SELECT * FROM documents WHERE doc_id % 5 <> 0
), sh_n AS (
    SELECT doc_id AS doc, {_SHINGLES} AS sh FROM newd
), sig_n AS (
    SELECT doc, {_MINHASH_SIG} AS sig FROM sh_n
), band_n AS (
    SELECT doc, b.band_idx,
           md5(array_to_string(sig[b.band_idx*4+1 : b.band_idx*4+4], '|')) AS band_hash
    FROM sig_n, (SELECT unnest(generate_series(0, 3)) AS band_idx) b
), sh_h AS (
    SELECT doc_id AS doc, {_SHINGLES} AS sh FROM hist
), sig_h AS (
    SELECT doc, {_MINHASH_SIG} AS sig FROM sh_h
), band_h AS (
    SELECT doc, b.band_idx,
           md5(array_to_string(sig[b.band_idx*4+1 : b.band_idx*4+4], '|')) AS band_hash
    FROM sig_h, (SELECT unnest(generate_series(0, 3)) AS band_idx) b
), cand AS (
    SELECT DISTINCT n.doc AS nid, h.doc AS hid
    FROM band_n n JOIN band_h h
      ON n.band_idx = h.band_idx AND n.band_hash = h.band_hash
), shn AS (
    SELECT DISTINCT doc_id AS doc, unnest({_SHINGLES}) AS s FROM newd
), shh AS (
    SELECT DISTINCT doc_id AS doc, unnest({_SHINGLES}) AS s FROM hist
), sizes_n AS (
    SELECT doc, COUNT(*) AS na FROM shn GROUP BY doc
), sizes_h AS (
    SELECT doc, COUNT(*) AS nb FROM shh GROUP BY doc
), common AS (
    SELECT c.nid, c.hid, COUNT(*) AS cm
    FROM cand c
    JOIN shn ON shn.doc = c.nid
    JOIN shh ON shh.doc = c.hid AND shh.s = shn.s
    GROUP BY c.nid, c.hid
), ver AS (
    SELECT nid, hid,
           ROUND(cm / (sizes_n.na + sizes_h.nb - cm), 6) AS j
    FROM common
    JOIN sizes_n ON sizes_n.doc = nid
    JOIN sizes_h ON sizes_h.doc = hid
    WHERE ROUND(cm / (sizes_n.na + sizes_h.nb - cm), 6) >= 0.2
)
SELECT nid AS doc_id, hid AS dup_of, j AS jaccard
FROM ver
QUALIFY row_number() OVER (PARTITION BY nid ORDER BY j DESC, hid ASC) = 1
ORDER BY doc_id
"""

ORACLES["dedup_clusters"] = f"""
WITH RECURSIVE sh_t AS (
    SELECT doc_id AS doc, {_SHINGLES} AS sh FROM documents
), sig_t AS (
    SELECT doc, {_MINHASH_SIG} AS sig FROM sh_t
), banded AS (
    SELECT doc, b.band_idx,
           md5(array_to_string(sig[b.band_idx*4+1 : b.band_idx*4+4], '|')) AS band_hash
    FROM sig_t, (SELECT unnest(generate_series(0, 3)) AS band_idx) b
), pairs AS (
    SELECT DISTINCT a.doc AS id_a, b.doc AS id_b
    FROM banded a JOIN banded b
      ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash AND a.doc < b.doc
), sym AS (
    SELECT id_a AS a, id_b AS b FROM pairs
    UNION
    SELECT id_b AS a, id_a AS b FROM pairs
), reach AS (
    SELECT doc_id AS node, doc_id AS r FROM documents
    UNION
    SELECT s.a AS node, reach.r AS r FROM sym s JOIN reach ON s.b = reach.node
)
SELECT node AS doc_id, MIN(r) AS component, (node = MIN(r)) AS is_canonical
FROM reach
GROUP BY node
ORDER BY doc_id
"""

# docs_group_split (r10): the leakage-free split constructor — same
# reachability chain as dedup_clusters (MinHash-LSH 16/4 candidates),
# then every doc buckets by md5 of its cluster representative (the
# docs_split CASE, keyed on rep instead of doc_id); singletons are
# their own rep via the identity seed row of the recursive CTE
ORACLES["docs_group_split"] = f"""
WITH RECURSIVE sh_t AS (
    SELECT doc_id AS doc, {_SHINGLES} AS sh FROM documents
), sig_t AS (
    SELECT doc, {_MINHASH_SIG} AS sig FROM sh_t
), banded AS (
    SELECT doc, b.band_idx,
           md5(array_to_string(sig[b.band_idx*4+1 : b.band_idx*4+4], '|')) AS band_hash
    FROM sig_t, (SELECT unnest(generate_series(0, 3)) AS band_idx) b
), pairs AS (
    SELECT DISTINCT a.doc AS id_a, b.doc AS id_b
    FROM banded a JOIN banded b
      ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash AND a.doc < b.doc
), sym AS (
    SELECT id_a AS a, id_b AS b FROM pairs
    UNION
    SELECT id_b AS a, id_a AS b FROM pairs
), reach AS (
    SELECT doc_id AS node, doc_id AS r FROM documents
    UNION
    SELECT s.a AS node, reach.r AS r FROM sym s JOIN reach ON s.b = reach.node
), comp AS (
    SELECT node AS doc_id, MIN(r) AS rep FROM reach GROUP BY node
)
SELECT doc_id, rep,
       CASE WHEN b < 80 THEN 'train'
            WHEN b < 90 THEN 'val'
            ELSE 'test' END AS split
FROM (
    SELECT doc_id, rep,
           ('0x' || substr(md5('split-v1:' || rep), 1, 8))::BIGINT % 100 AS b
    FROM comp
)
ORDER BY doc_id
"""

ORACLES["ngram_jaccard"] = f"""
WITH sh AS (
    SELECT DISTINCT doc_id AS doc, unnest({_SHINGLES}) AS shingle FROM documents
), sizes AS (
    SELECT doc, COUNT(*) AS n_shingles FROM sh GROUP BY doc
), common AS (
    SELECT a.doc AS id_a, b.doc AS id_b, COUNT(*) AS common
    FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc < b.doc
    GROUP BY a.doc, b.doc
)
SELECT id_a, id_b,
       ROUND(common / (sa.n_shingles + sb.n_shingles - common), 6) AS jaccard
FROM common
JOIN sizes sa ON sa.doc = id_a
JOIN sizes sb ON sb.doc = id_b
WHERE ROUND(common / (sa.n_shingles + sb.n_shingles - common), 6) >= 0.2
ORDER BY id_a, id_b
"""

_SIMHASH_VOTES = " + ".join(
    f"(CASE WHEN list_sum(list_transform(th, h -> CASE WHEN (h & {1 << b}) <> 0 THEN 1 ELSE -1 END)) > 0 THEN {1 << b}::BIGINT ELSE 0 END)"
    for b in range(60)
)

ORACLES["ngram_jaccard_pruned"] = f"""
WITH sh_all AS (
    SELECT DISTINCT doc_id AS doc, unnest({_SHINGLES}) AS shingle FROM documents
), sh AS (
    SELECT doc, shingle FROM sh_all
    QUALIFY COUNT(*) OVER (PARTITION BY shingle) <= 25
), sizes AS (
    SELECT doc, COUNT(*) AS n_shingles FROM sh GROUP BY doc
), common AS (
    SELECT a.doc AS id_a, b.doc AS id_b, COUNT(*) AS common
    FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc < b.doc
    GROUP BY a.doc, b.doc
)
SELECT id_a, id_b,
       ROUND(common / (sa.n_shingles + sb.n_shingles - common), 6) AS jaccard
FROM common
JOIN sizes sa ON sa.doc = id_a
JOIN sizes sb ON sb.doc = id_b
WHERE ROUND(common / (sa.n_shingles + sb.n_shingles - common), 6) >= 0.2
ORDER BY id_a, id_b
"""

ORACLES["simhash"] = f"""
WITH th_t AS (
    SELECT doc_id,
           list_transform(list_distinct(string_split({_NORM}, ' ')),
                          t -> ('0x' || substr(md5(t), 1, 15))::BIGINT) AS th
    FROM documents
)
SELECT doc_id, ({_SIMHASH_VOTES})::BIGINT AS simhash
FROM th_t
ORDER BY doc_id
"""

ORACLES["derive_columns"] = """
SELECT o_orderkey,
       concat_ws('_', o_orderkey::VARCHAR, o_orderstatus) AS order_tag,
       year(o_orderdate) AS y, month(o_orderdate) AS m, day(o_orderdate) AS d,
       floor(epoch(o_orderdate))::BIGINT AS epoch_s,
       o_totalprice / 100.0 AS price_hundreds
FROM orders
WHERE o_orderkey < 1000
"""

ORACLES["json_props_extract"] = """
SELECT event_type, COUNT(*) AS n,
       SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))::BIGINT AS sum_k,
       ROUND(AVG(CAST(json_extract_string(props, '$.k') AS BIGINT)), 4) AS avg_k
FROM events
GROUP BY event_type
ORDER BY event_type
"""

ORACLES["array_ops"] = f"""
SELECT doc_id,
       len(list_distinct({_TOKS})) AS n_distinct_tokens,
       coalesce(array_to_string(
           list_sort(list_intersect(list_distinct({_TOKS}), ['spark','query','join'])),
           ','), '') AS shared_words,
       {_TOKS}[1] AS first_token,
       list_has_any({_TOKS}, ['spark','query','join']) AS mentions_interest
FROM documents
WHERE doc_id < 100
"""

ORACLES["conditional_buckets"] = """
SELECT upper(lang) AS lang_uc,
       CASE WHEN n_chars < 200 THEN 'short'
            WHEN n_chars < 350 THEN 'medium'
            ELSE 'long' END AS size_class,
       COUNT(*) AS n
FROM documents
GROUP BY 1, 2
ORDER BY lang_uc, size_class
"""

ORACLES["date_format_labels"] = """
SELECT strftime(o_orderdate, '%Y %b') AS label, COUNT(*) AS n
FROM orders
GROUP BY 1
ORDER BY label
"""

ORACLES["rollup_revenue"] = """
SELECT r_name, n_name,
       SUM(o_totalprice::DECIMAL(18,2))::DOUBLE AS total_price,
       COUNT(*) AS n
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY ROLLUP(r_name, n_name)
"""

ORACLES["row_wise_total"] = """
SELECT date_trunc('day', ts)::TIMESTAMP AS day,
       COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS click,
       COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS error,
       COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
       COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
       COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS view,
       COUNT(*) AS total
FROM events
GROUP BY 1
ORDER BY day
"""

ORACLES["sessionize"] = """
WITH gaps AS (
    SELECT user_id, event_id, ts,
           floor(epoch(ts))::BIGINT
             - lag(floor(epoch(ts))::BIGINT)
               OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap
    FROM events WHERE user_id < 50
)
SELECT user_id, event_id,
       SUM(CASE WHEN gap IS NULL OR gap > 1800 THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS session_id
FROM gaps
"""

# sessionize_bounded is semantically identical to sessionize (the
# chunked formulation is a pure execution-strategy change), so it is
# checked against the SAME oracle
ORACLES["sessionize_bounded"] = ORACLES["sessionize"]

_SIMHASH_FP_TABLE = f"""
    SELECT doc_id, ({_SIMHASH_VOTES})::BIGINT AS fp
    FROM (
        SELECT doc_id,
               list_transform(list_distinct(string_split({_NORM}, ' ')),
                              t -> ('0x' || substr(md5(t), 1, 15))::BIGINT) AS th
        FROM documents
    )
"""

# exact n² over the FULL table — the Spark side uses pigeonhole prefix
# blocking (recall provably 1.0 at tau=3 with 4 blocks), so it must
# hash-match this exact answer
ORACLES["simhash_near_pairs"] = f"""
WITH fp_t AS ({_SIMHASH_FP_TABLE})
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       bit_count(xor(a.fp, b.fp)) AS hamming
FROM fp_t a JOIN fp_t b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.fp, b.fp)) <= 3
ORDER BY id_a, id_b
"""

ORACLES["docs_pipeline_chain"] = f"""
WITH filtered AS (
    SELECT doc_id, lang, source, text
    FROM documents
    WHERE list_has_any({_TOKS}, ['spark','query'])
      AND NOT coalesce(list_has_any({_TOKS}, ['slow']), false)
), deduped AS (
    SELECT doc_id, lang, source
    FROM filtered
    QUALIFY row_number() OVER (PARTITION BY md5({_NORM}) ORDER BY doc_id) = 1
)
SELECT doc_id, lang, source
FROM deduped
QUALIFY row_number() OVER (
    PARTITION BY lang
    ORDER BY md5(concat_ws('|', '42', doc_id::VARCHAR)), doc_id
) <= 20
"""

def _cos(a: str, b: str) -> str:
    return (
        f"ROUND(CASE WHEN sqrt(list_dot_product({a},{a})) * sqrt(list_dot_product({b},{b})) > 0 "
        f"THEN list_dot_product({a},{b}) / (sqrt(list_dot_product({a},{a})) * sqrt(list_dot_product({b},{b}))) "
        f"ELSE 0.0 END, 6)"
    )


ORACLES["embedding_near_dup"] = f"""
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings)
SELECT a.vec_id AS id_a, b.vec_id AS id_b, {_cos('a.vec', 'b.vec')} AS cos
FROM v a JOIN v b ON a.vec_id < b.vec_id
WHERE {_cos('a.vec', 'b.vec')} >= 0.35
ORDER BY id_a, id_b
"""

# the Spark side composes IVF multi-probe candidates (K=10, probes=4)
# The Spark side augments the corpus with ×2-scaled copies (planted
# near-dups; ×2 is exact in fp, so cos(v, 2v) rounds to exactly 1.0 in
# both engines) and finds pairs via IVF candidates. Recall of the IVF
# composition is STRUCTURALLY 1.0 (a copy's centroid cosines are
# bit-identical to its original's → same probe cells) at ANY scale
# factor — this oracle is the exact all-pairs answer over the same
# augmented corpus, valid for any sf / regenerated corpus, not an
# empirical pin of one config.
ORACLES["embedding_near_dup_ivf"] = f"""
WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings),
corpus AS (
    SELECT vec_id, vec FROM base
    UNION ALL
    SELECT vec_id + 10000000 AS vec_id, list_transform(vec, x -> x * 2) AS vec
    FROM base
)
SELECT a.vec_id AS id_a, b.vec_id AS id_b, {_cos('a.vec', 'b.vec')} AS cos
FROM corpus a JOIN corpus b ON a.vec_id < b.vec_id
WHERE {_cos('a.vec', 'b.vec')} >= 0.95
ORDER BY id_a, id_b
"""

# SemDeDup (arXiv:2303.09540), relational dominance formulation: x is
# dropped iff a same-cluster y has cos(x,y) >= 0.3 and (c_cos(y), y.id)
# < (c_cos(x), x.id) — survivors are the minimal elements, i.e. the
# paper's "keep farthest from centroid" rule made one-pass.
ORACLES["embedding_semdedup"] = f"""
WITH params AS (
    SELECT GREATEST(n // GREATEST(CAST(FLOOR(SQRT(n::DOUBLE)) AS BIGINT), 4), 1) AS stride
    FROM (SELECT COUNT(*) AS n FROM embeddings)
), c AS (
    SELECT vec_id AS centroid_id, embedding::DOUBLE[] AS c_vec
    FROM embeddings, params WHERE vec_id % stride = 0
), v AS (
    SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings
), assigned AS (
    SELECT vec_id, vec, centroid_id AS cluster,
           ROUND({_cos('vec', 'c_vec')}, 6) AS c_cos
    FROM v, c
    QUALIFY row_number() OVER (
        PARTITION BY vec_id ORDER BY {_cos('vec', 'c_vec')} DESC, centroid_id ASC
    ) = 1
), dropped AS (
    SELECT DISTINCT a.vec_id
    FROM assigned a JOIN assigned b
      ON a.cluster = b.cluster AND a.vec_id <> b.vec_id
    WHERE ROUND({_cos('a.vec', 'b.vec')}, 6) >= 0.3
      AND (b.c_cos < a.c_cos OR (b.c_cos = a.c_cos AND b.vec_id < a.vec_id))
)
SELECT vec_id, cluster, c_cos
FROM assigned
WHERE vec_id NOT IN (SELECT vec_id FROM dropped)
ORDER BY vec_id
"""

# Mergeable quantile sketch: deterministic bottom-256-by-md5(event_id)
# row sample per event_type (the weekly build + merge on the Spark side
# is lossless, same argument as events_kmv_distinct), then 'lower'
# order statistics at p50/p90/p99.
ORACLES["events_quantile_sketch"] = """
WITH ranked AS (
    SELECT event_type, value,
           row_number() OVER (
               PARTITION BY event_type
               ORDER BY ('0x' || substr(md5(event_id::VARCHAR), 1, 15))::BIGINT
           ) AS rn
    FROM events
), sampled AS (
    SELECT event_type, value::DOUBLE AS v FROM ranked WHERE rn <= 256
), ordered AS (
    SELECT event_type, v,
           row_number() OVER (PARTITION BY event_type ORDER BY v) AS vr,
           count(*) OVER (PARTITION BY event_type) AS n
    FROM sampled
)
SELECT event_type, max(n) AS n_sample,
       max(CASE WHEN vr = floor(0.5  * (n-1))::BIGINT + 1 THEN v END) AS p50_est,
       max(CASE WHEN vr = floor(0.9  * (n-1))::BIGINT + 1 THEN v END) AS p90_est,
       max(CASE WHEN vr = floor(0.99 * (n-1))::BIGINT + 1 THEN v END) AS p99_est
FROM ordered
GROUP BY event_type
ORDER BY event_type
"""

# Product quantization + ADC (functions/pq.py): codebook = subvectors of
# the first 16 vectors; codes = per-subspace argmin L2 (dot identity,
# terms rounded 6dp); ADC = sum of per-subspace rounded terms, rounded
# 4dp. Mirrors the Spark literal-codebook expressions exactly.
ORACLES["embedding_pq_topk"] = """
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings),
js AS (SELECT unnest(generate_series(0, 7)) AS j),
cw AS (
    SELECT vec_id AS c, j, list_slice(vec, j*8+1, j*8+8) AS csub
    FROM v, js WHERE vec_id < 16
),
subs AS (
    SELECT vec_id, j, list_slice(vec, j*8+1, j*8+8) AS sub FROM v, js
),
dists AS (
    SELECT subs.vec_id, subs.j, cw.c,
           ROUND(list_dot_product(sub, sub)
                 - 2 * list_dot_product(sub, csub)
                 + list_dot_product(csub, csub), 6) AS d
    FROM subs JOIN cw ON subs.j = cw.j
),
codes AS (
    SELECT vec_id, j, c AS code
    FROM dists
    QUALIFY row_number() OVER (PARTITION BY vec_id, j ORDER BY d, c) = 1
),
adc_terms AS (
    SELECT qs.vec_id AS query_id, codes.vec_id AS neighbor_id, codes.j,
           CAST(ROUND((list_dot_product(qs.sub, qs.sub)
                 - 2 * list_dot_product(qs.sub, cw.csub)
                 + list_dot_product(cw.csub, cw.csub)) * 1000000, 0) AS BIGINT) AS term
    FROM codes
    JOIN cw ON cw.j = codes.j AND cw.c = codes.code
    JOIN subs qs ON qs.j = codes.j
    WHERE qs.vec_id < 5 AND qs.vec_id <> codes.vec_id
),
adc AS (
    SELECT query_id, neighbor_id, SUM(term) / 1000000.0 AS adc_dist
    FROM adc_terms GROUP BY query_id, neighbor_id
)
SELECT query_id, neighbor_id, adc_dist,
       row_number() OVER (
           PARTITION BY query_id ORDER BY adc_dist, neighbor_id
       ) AS rank
FROM adc
QUALIFY rank <= 5
ORDER BY query_id, rank
"""

# IVF-PQ composition: the pq oracle's codes restricted to the query's
# IVF cell (the ivf_topk oracle's assignment), ADC within the cell only.
ORACLES["embedding_ivf_pq_topk"] = f"""
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings),
js AS (SELECT unnest(generate_series(0, 7)) AS j),
cw AS (
    SELECT vec_id AS c, j, list_slice(vec, j*8+1, j*8+8) AS csub
    FROM v, js WHERE vec_id < 16
),
subs AS (
    SELECT vec_id, j, list_slice(vec, j*8+1, j*8+8) AS sub FROM v, js
),
pq_dists AS (
    SELECT subs.vec_id, subs.j, cw.c,
           ROUND(list_dot_product(sub, sub)
                 - 2 * list_dot_product(sub, csub)
                 + list_dot_product(csub, csub), 6) AS d
    FROM subs JOIN cw ON subs.j = cw.j
),
codes AS (
    SELECT vec_id, j, c AS code
    FROM pq_dists
    QUALIFY row_number() OVER (PARTITION BY vec_id, j ORDER BY d, c) = 1
),
cent AS (
    SELECT vec_id AS centroid_id, embedding::DOUBLE[] AS c_vec
    FROM embeddings WHERE vec_id % 50 = 0
),
assigned AS (
    SELECT vec_id, centroid_id AS cluster
    FROM v, cent
    QUALIFY row_number() OVER (
        PARTITION BY vec_id ORDER BY {_cos('vec', 'c_vec')} DESC, centroid_id ASC
    ) = 1
),
adc_terms AS (
    SELECT qa.vec_id AS query_id, codes.vec_id AS neighbor_id, codes.j,
           CAST(ROUND((list_dot_product(qs.sub, qs.sub)
                 - 2 * list_dot_product(qs.sub, cw.csub)
                 + list_dot_product(cw.csub, cw.csub)) * 1000000, 0) AS BIGINT) AS term
    FROM codes
    JOIN assigned ca ON ca.vec_id = codes.vec_id
    JOIN assigned qa ON qa.cluster = ca.cluster AND qa.vec_id < 20
    JOIN cw ON cw.j = codes.j AND cw.c = codes.code
    JOIN subs qs ON qs.j = codes.j AND qs.vec_id = qa.vec_id
    WHERE qa.vec_id <> codes.vec_id
),
adc AS (
    SELECT query_id, neighbor_id, SUM(term) / 1000000.0 AS adc_dist
    FROM adc_terms GROUP BY query_id, neighbor_id
)
SELECT query_id, neighbor_id, adc_dist,
       row_number() OVER (
           PARTITION BY query_id ORDER BY adc_dist, neighbor_id
       ) AS rank
FROM adc
QUALIFY rank <= 5
ORDER BY query_id, rank
"""

ORACLES["embedding_ivf_topk"] = f"""
WITH c AS (
    SELECT vec_id AS centroid_id, embedding::DOUBLE[] AS c_vec
    FROM embeddings WHERE vec_id % 50 = 0
), v AS (
    SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings
), assigned AS (
    SELECT vec_id, vec, centroid_id AS cluster
    FROM v, c
    QUALIFY row_number() OVER (
        PARTITION BY vec_id ORDER BY {_cos('vec', 'c_vec')} DESC, centroid_id ASC
    ) = 1
), scored AS (
    SELECT q.vec_id AS query_id, s.vec_id AS neighbor_id,
           {_cos('q.vec', 's.vec')} AS cos
    FROM assigned q JOIN assigned s ON q.cluster = s.cluster
    WHERE q.vec_id < 20 AND q.vec_id <> s.vec_id
)
SELECT query_id, neighbor_id, cos,
       row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
FROM scored
QUALIFY rank <= 5
ORDER BY query_id, rank
"""

# embedding_ivf_topk_multiprobe: corpus single-cell, queries probe
# their top-4 cells (row_number <= 4 mirrors ivf_assign_multiprobe's
# desc-rounded-cos / asc-centroid ranking); exact cosine in the union
# of probed cells — each corpus vec is in one cell and probe cells are
# distinct, so pairs are unique without dedup
ORACLES["embedding_ivf_topk_multiprobe"] = f"""
WITH c AS (
    SELECT vec_id AS centroid_id, embedding::DOUBLE[] AS c_vec
    FROM embeddings WHERE vec_id % 50 = 0
), v AS (
    SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings
), assigned AS (
    SELECT vec_id, vec, centroid_id AS cluster
    FROM v, c
    QUALIFY row_number() OVER (
        PARTITION BY vec_id ORDER BY {_cos('vec', 'c_vec')} DESC, centroid_id ASC
    ) = 1
), qprobe AS (
    SELECT vec_id, vec, centroid_id AS cluster
    FROM v, c
    WHERE vec_id < 20
    QUALIFY row_number() OVER (
        PARTITION BY vec_id ORDER BY {_cos('vec', 'c_vec')} DESC, centroid_id ASC
    ) <= 4
), scored AS (
    SELECT q.vec_id AS query_id, s.vec_id AS neighbor_id,
           {_cos('q.vec', 's.vec')} AS cos
    FROM qprobe q JOIN assigned s ON q.cluster = s.cluster
    WHERE q.vec_id <> s.vec_id
)
SELECT query_id, neighbor_id, cos,
       row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
FROM scored
QUALIFY rank <= 5
ORDER BY query_id, rank
"""


def _srp_planes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    # EXACT mirror of similarity.deterministic_planes — md5-derived
    # uniform weights; repr() round-trips the identical doubles into SQL
    import hashlib

    return [
        [
            int(hashlib.md5(f"{seed}|{p}|{d}".encode()).hexdigest()[:8], 16) / 2**32 - 0.5
            for d in range(dim)
        ]
        for p in range(n_planes)
    ]


def _srp_bucket_sql(planes: list[list[float]]) -> str:
    terms = []
    for i, plane in enumerate(planes):
        lit = "[" + ", ".join(repr(w) for w in plane) + "]"
        terms.append(
            f"(CASE WHEN list_dot_product(vec, {lit}::DOUBLE[]) >= 0 THEN {1 << i} ELSE 0 END)"
        )
    return " + ".join(terms)


ORACLES["embedding_ann_lsh"] = f"""
WITH v AS (
    SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings
), b AS (
    SELECT vec_id, vec, ({_srp_bucket_sql(_srp_planes(64, 6))})::BIGINT AS bucket FROM v
), scored AS (
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           {_cos('q.vec', 'c.vec')} AS cos
    FROM b q JOIN b c ON q.bucket = c.bucket
    WHERE q.vec_id < 20 AND q.vec_id <> c.vec_id
)
SELECT query_id, neighbor_id, cos,
       row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
FROM scored
QUALIFY rank <= 5
ORDER BY query_id, rank
"""

ORACLES["quantiles"] = """
SELECT l_returnflag,
       ROUND(quantile_cont(l_extendedprice, 0.25), 4) AS p25,
       ROUND(quantile_cont(l_extendedprice, 0.50), 4) AS p50,
       ROUND(quantile_cont(l_extendedprice, 0.75), 4) AS p75
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""

ORACLES["cube_agg"] = """
SELECT o_orderstatus, o_orderpriority,
       COUNT(*) AS n,
       SUM(o_totalprice::DECIMAL(18,2))::DOUBLE AS total
FROM orders
GROUP BY CUBE(o_orderstatus, o_orderpriority)
"""

ORACLES["except_rows"] = """
SELECT o_orderkey, o_orderstatus, o_orderpriority
FROM orders WHERE o_orderkey % 7 = 0
EXCEPT ALL
SELECT o_orderkey, o_orderstatus, o_orderpriority
FROM orders WHERE o_orderpriority = '1-URGENT'
"""

ORACLES["count_pushdown"] = """
SELECT COUNT(*) AS hit_count
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
"""

ORACLES["distinct_sorted"] = """
SELECT DISTINCT p_type FROM part ORDER BY p_type
"""

ORACLES["embedding_topk"] = """
WITH q AS (
    SELECT vec_id AS query_id, embedding::DOUBLE[] AS q_vec FROM embeddings WHERE vec_id < 20
), c AS (
    SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS c_vec FROM embeddings
), scored AS (
    SELECT query_id, neighbor_id,
           ROUND(
             CASE WHEN sqrt(list_dot_product(q_vec, q_vec)) * sqrt(list_dot_product(c_vec, c_vec)) > 0
                  THEN list_dot_product(q_vec, c_vec)
                       / (sqrt(list_dot_product(q_vec, q_vec)) * sqrt(list_dot_product(c_vec, c_vec)))
                  ELSE 0.0 END
           , 6) AS cos
    FROM c, q
    WHERE query_id <> neighbor_id
)
SELECT query_id, neighbor_id, cos,
       row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
FROM scored
QUALIFY rank <= 5
ORDER BY query_id, rank
"""

ORACLES["docs_repetition"] = f"""
WITH base AS (
    SELECT doc_id, string_split({_NORM}, ' ') AS toks FROM documents
), stats AS (
    SELECT doc_id, len(toks) AS n_words,
           ROUND(1.0 - len(list_distinct(toks))::DOUBLE / len(toks), 6) AS dup_word_frac
    FROM base
), grams AS (
    SELECT doc_id,
           unnest(list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])) AS gram
    FROM base WHERE len(toks) >= 2
), cnt AS (
    SELECT doc_id, gram, COUNT(*) AS c FROM grams GROUP BY doc_id, gram
), top AS (
    SELECT doc_id, ROUND(MAX(c)::DOUBLE / SUM(c), 6) AS top_ngram_frac FROM cnt GROUP BY doc_id
)
SELECT s.doc_id, s.n_words, s.dup_word_frac, t.top_ngram_frac
FROM stats s LEFT JOIN top t USING (doc_id)
ORDER BY s.doc_id
"""

ORACLES["docs_pii_redact"] = """
WITH aug AS (
    SELECT doc_id,
           text || ' contact user' || doc_id::VARCHAR
                || '@mail.example.com call +1 (415) 555-01' || doc_id::VARCHAR
                || ' visit https://ex.example/d/' || doc_id::VARCHAR
                || '?ref=x now' AS t
    FROM documents
)
SELECT doc_id,
       regexp_replace(
         regexp_replace(
           regexp_replace(coalesce(t, ''), 'https?://[^\\s]+', '<URL>', 'g'),
           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
         '\\+?[0-9][0-9().\\- ]{6,}[0-9]', '<PHONE>', 'g') AS clean
FROM aug
ORDER BY doc_id
"""

ORACLES["embedding_quantize"] = """
WITH base AS (
    SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
), s AS (
    SELECT vec_id, v,
           list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale
    FROM base
), q AS (
    SELECT vec_id, scale,
           list_transform(v, x -> CASE WHEN scale > 0
               THEN sign(x / scale) * floor(abs(x / scale) + 0.5)
               ELSE 0.0 END) AS qv
    FROM s
)
SELECT vec_id,
       ROUND(scale, 9) AS scale,
       len(qv) AS n_dims,
       list_sum(qv)::BIGINT AS sum_q,
       list_min(qv)::BIGINT AS min_q,
       list_max(qv)::BIGINT AS max_q
FROM q
ORDER BY vec_id
"""

ORACLES["dedup_survivors"] = f"""
WITH RECURSIVE sh_t AS (
    SELECT doc_id AS doc, {_SHINGLES} AS sh FROM documents
), sig_t AS (
    SELECT doc, {_MINHASH_SIG} AS sig FROM sh_t
), banded AS (
    SELECT doc, b.band_idx,
           md5(array_to_string(sig[b.band_idx*4+1 : b.band_idx*4+4], '|')) AS band_hash
    FROM sig_t, (SELECT unnest(generate_series(0, 3)) AS band_idx) b
), pairs AS (
    SELECT DISTINCT a.doc AS id_a, b.doc AS id_b
    FROM banded a JOIN banded b
      ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash AND a.doc < b.doc
), sym AS (
    SELECT id_a AS a, id_b AS b FROM pairs
    UNION
    SELECT id_b AS a, id_a AS b FROM pairs
), reach AS (
    SELECT doc_id AS node, doc_id AS r FROM documents
    UNION
    SELECT s.a AS node, reach.r AS r FROM sym s JOIN reach ON s.b = reach.node
), cc AS (
    SELECT node AS doc_id, MIN(r) AS component FROM reach GROUP BY node
), q AS (
    SELECT doc_id,
           ROUND(
             least(length(coalesce(text,'')) / 500.0, 1.0) * 0.5
             + (CASE WHEN
                  length(regexp_replace(coalesce(text,''), '\\s+', '', 'g'))
                    / greatest(len(string_split_regex(lower(trim(coalesce(text,''))), '\\s+')), 1)
                  BETWEEN 3 AND 10
                THEN 1.0 ELSE 0.5 END) * 0.3
             + (1 - (length(coalesce(text,''))
                     - length(regexp_replace(coalesce(text,''), '[^\\w\\s]', '', 'g')))
                    / greatest(length(coalesce(text,'')), 1)) * 0.2
           , 6) AS quality
    FROM documents
)
SELECT cc.component, cc.doc_id AS survivor_id, q.quality
FROM cc JOIN q USING (doc_id)
QUALIFY row_number() OVER (PARTITION BY cc.component ORDER BY q.quality DESC, cc.doc_id) = 1
ORDER BY cc.component
"""

ORACLES["events_asof_purchase"] = """
SELECT e.event_id, e.user_id, e.ts, e.event_type,
       b.t2 AS last_purchase_ts, b.v2 AS last_purchase_value
FROM events e
ASOF LEFT JOIN (
    SELECT user_id AS u2, ts AS t2, value AS v2
    FROM events WHERE event_type = 'purchase'
) b ON e.user_id = b.u2 AND e.ts >= b.t2
ORDER BY e.event_id
"""

ORACLES["events_in_windows"] = """
WITH w AS (
    SELECT event_id AS window_id, ts AS w_start, ts + INTERVAL 2 HOUR AS w_end
    FROM events WHERE event_type = 'signup' AND user_id < 10
)
SELECT w.window_id, COUNT(*)::BIGINT AS n_events,
       ROUND(SUM(e.value), 4) AS sum_value
FROM w JOIN events e ON e.ts >= w.w_start AND e.ts < w.w_end
GROUP BY w.window_id
ORDER BY window_id
"""

ORACLES["docs_decontaminate"] = f"""
WITH ev AS (
    SELECT DISTINCT unnest({_SHINGLES}) AS s FROM documents WHERE doc_id % 37 = 0
), tr AS (
    SELECT doc_id, unnest({_SHINGLES}) AS s FROM documents WHERE doc_id % 37 <> 0
)
SELECT tr.doc_id AS doc_id, COUNT(*)::BIGINT AS n_shared
FROM tr JOIN ev USING (s)
GROUP BY tr.doc_id
ORDER BY doc_id
"""

ORACLES["docs_pack_sequences"] = """
WITH t AS (
    SELECT doc_id, lang,
           len(string_split_regex(lower(trim(coalesce(text,''))), '\\s+'))::BIGINT AS n_tokens
    FROM documents
), c AS (
    SELECT doc_id, lang, n_tokens,
           (SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id))::BIGINT - n_tokens AS start_off
    FROM t
)
SELECT doc_id, lang, n_tokens,
       start_off // 2048 AS seq_id, start_off % 2048 AS seq_offset
FROM c
ORDER BY doc_id
"""

ORACLES["docs_split"] = """
SELECT doc_id,
       CASE WHEN b < 80 THEN 'train'
            WHEN b < 90 THEN 'val'
            ELSE 'test' END AS split
FROM (
    SELECT doc_id,
           ('0x' || substr(md5('split-v1:' || doc_id), 1, 8))::BIGINT % 100 AS b
    FROM documents
)
ORDER BY doc_id
"""

# Total order matches the Spark side exactly: the 32-bit fingerprint
# (first 8 md5 hex chars) then doc_id as tie-break.
ORACLES["docs_shuffle"] = """
SELECT doc_id,
       (ROW_NUMBER() OVER (
           ORDER BY ('0x' || substr(md5('shuffle-v1:' || doc_id), 1, 8))::BIGINT,
                    doc_id
       ))::BIGINT AS shuffle_pos
FROM documents
ORDER BY doc_id
"""

ORACLES["docs_mixture_sample"] = """
SELECT doc_id, source FROM (
    SELECT doc_id, source,
           ('0x' || substr(md5('mix-v1:' || doc_id), 1, 8))::BIGINT % 1000000 AS draw,
           CASE source WHEN 'src0' THEN 250000
                       WHEN 'src1' THEN 500000
                       WHEN 'src2' THEN 750000
                       WHEN 'src3' THEN 0
                       ELSE 600000 END AS thresh
    FROM documents
)
WHERE draw < thresh
ORDER BY doc_id
"""

ORACLES["docs_unigram_logprob"] = """
WITH toks AS (
    SELECT doc_id,
           unnest(string_split_regex(lower(trim(coalesce(text, ''))), '\\s+')) AS t
    FROM documents
), freq AS (
    SELECT t, count(*)::DOUBLE AS cnt FROM toks GROUP BY t
), tot AS (
    SELECT count(*)::DOUBLE AS n FROM toks
)
SELECT doc_id,
       count(*)::BIGINT AS n_tokens,
       round(avg(ln(cnt / n)), 4) AS unigram_logprob
FROM toks JOIN freq USING (t), tot
GROUP BY doc_id
ORDER BY doc_id
"""

ORACLES["docs_tfidf_topk"] = """
WITH toks AS (
    SELECT doc_id,
           unnest(string_split_regex(lower(trim(coalesce(text, ''))), '\\s+')) AS t
    FROM documents
), tf AS (
    SELECT doc_id, t, count(*) AS tf FROM toks GROUP BY doc_id, t
), dl AS (
    SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY doc_id
), dfreq AS (
    SELECT t, count(*) AS df FROM tf GROUP BY t
), n AS (
    SELECT count(*) AS n FROM dl
), scored AS (
    SELECT tf.doc_id, tf.t AS term,
           (tf.tf::DOUBLE / dl.dl) * ln(n.n::DOUBLE / dfreq.df) AS s
    FROM tf JOIN dl USING (doc_id) JOIN dfreq ON tf.t = dfreq.t, n
)
SELECT doc_id, term,
       row_number() OVER (PARTITION BY doc_id ORDER BY s DESC, term) AS rank,
       round(s, 6) AS tfidf
FROM scored
QUALIFY rank <= 3
ORDER BY doc_id, rank
"""

# BM25: rank is assigned on the ROUNDED score (both engines round to
# 6 dp first), so sub-1e-6 summation-order differences cannot flip it
ORACLES["docs_bm25"] = """
WITH toks AS (
    SELECT doc_id,
           unnest(string_split_regex(lower(trim(coalesce(text, ''))), '\\s+')) AS t
    FROM documents
), qtf AS (
    SELECT doc_id, t, count(*) AS tf FROM toks
    WHERE t IN ('spark', 'window', 'hash') GROUP BY doc_id, t
), dl AS (
    SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id
), stats AS (
    SELECT count(*) AS n, sum(dl) AS dl_sum FROM dl
), dfreq AS (
    SELECT t, count(*) AS df FROM qtf GROUP BY t
), per_term AS (
    SELECT qtf.doc_id,
           ln(1.0 + (stats.n - dfreq.df + 0.5) / (dfreq.df + 0.5))
             * (qtf.tf * 2.2)
             / (qtf.tf + 1.2 * (0.25 + 0.75 * dl.dl
                                / (stats.dl_sum::DOUBLE / stats.n))) AS s
    FROM qtf JOIN dl USING (doc_id) JOIN dfreq ON qtf.t = dfreq.t, stats
), scored AS (
    SELECT doc_id, round(sum(s), 6) AS bm25 FROM per_term GROUP BY doc_id
)
SELECT doc_id, bm25,
       row_number() OVER (ORDER BY bm25 DESC, doc_id) AS rank
FROM scored
ORDER BY bm25 DESC, doc_id
LIMIT 20
"""

# docs_bm25_searched (r10): the persisted-inverted-index search path
# must return EXACTLY what a full-cycle scan computes — the oracle is
# the full replay, so a stale/corrupt artifact (or a cache hit that
# didn't bit-match a fresh build) hash-mismatches
ORACLES["docs_bm25_searched"] = ORACLES["docs_bm25"]

# docs_hybrid_rrf: BM25 top-20 (same chain as docs_bm25) + exact
# cosine top-20 for embedding 7, fused by integer-exact RRF
# (1e9 // (60 + rank)), full-outer on doc id, top-10
ORACLES["docs_hybrid_rrf"] = f"""
WITH toks AS (
    SELECT doc_id,
           unnest(string_split_regex(lower(trim(coalesce(text, ''))), '\\s+')) AS t
    FROM documents
), qtf AS (
    SELECT doc_id, t, count(*) AS tf FROM toks
    WHERE t IN ('spark', 'window', 'hash') GROUP BY doc_id, t
), dl AS (
    SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id
), stats AS (
    SELECT count(*) AS n, sum(dl) AS dl_sum FROM dl
), dfreq AS (
    SELECT t, count(*) AS df FROM qtf GROUP BY t
), per_term AS (
    SELECT qtf.doc_id,
           ln(1.0 + (stats.n - dfreq.df + 0.5) / (dfreq.df + 0.5))
             * (qtf.tf * 2.2)
             / (qtf.tf + 1.2 * (0.25 + 0.75 * dl.dl
                                / (stats.dl_sum::DOUBLE / stats.n))) AS s
    FROM qtf JOIN dl USING (doc_id) JOIN dfreq ON qtf.t = dfreq.t, stats
), lexscored AS (
    SELECT doc_id, round(sum(s), 6) AS bm25 FROM per_term GROUP BY doc_id
), lex AS (
    SELECT doc_id AS id,
           row_number() OVER (ORDER BY bm25 DESC, doc_id) AS rank
    FROM lexscored
), lexr AS (
    SELECT id, 1000000000 // (60 + rank) AS lex_rrf FROM lex WHERE rank <= 20
), v AS (
    SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings
), q AS (
    SELECT vec FROM v WHERE vec_id = 7
), sem AS (
    SELECT c.vec_id AS id,
           row_number() OVER (
               ORDER BY {_cos('q.vec', 'c.vec')} DESC, c.vec_id
           ) AS rank
    FROM v c, q WHERE c.vec_id <> 7
), semr AS (
    SELECT id, 1000000000 // (60 + rank) AS sem_rrf FROM sem WHERE rank <= 20
), fused AS (
    SELECT COALESCE(l.id, s.id) AS doc_id,
           COALESCE(l.lex_rrf, 0) + COALESCE(s.sem_rrf, 0) AS rrf_micro
    FROM lexr l FULL OUTER JOIN semr s ON l.id = s.id
)
SELECT doc_id, rrf_micro,
       row_number() OVER (ORDER BY rrf_micro DESC, doc_id) AS rank
FROM fused
ORDER BY rrf_micro DESC, doc_id
LIMIT 10
"""

# docs_temperature_mixture: α=1/2 source balancing — exact integer
# thresholds from the source histogram (HUGEINT products mirror the
# operator's Python big-int arithmetic), deterministic salted draw
ORACLES["docs_temperature_mixture"] = """
WITH hist AS (
    SELECT source, COUNT(*)::BIGINT AS n FROM documents GROUP BY source
), sv AS (
    SELECT source, n, FLOOR(SQRT(n) * 1000000 + 0.5)::BIGINT AS s FROM hist
), tot AS (
    SELECT SUM(n)::HUGEINT AS big_n, SUM(s)::HUGEINT AS big_s FROM sv
), th AS (
    SELECT source,
           LEAST(1000000,
                 ((500000::HUGEINT * tot.big_n * sv.s)
                  // (tot.big_s * sv.n))::BIGINT) AS t
    FROM sv, tot
)
SELECT d.doc_id, d.source
FROM documents d JOIN th USING (source)
WHERE ('0x' || substr(md5('temp-mix-v1:' || d.doc_id), 1, 8))::BIGINT % 1000000 < th.t
ORDER BY d.doc_id
"""

ORACLES["docs_segment_dedup"] = f"""
WITH toks AS (
    SELECT doc_id, string_split({_NORM}, ' ') AS t FROM documents
), segs AS (
    SELECT doc_id, i - 1 AS pos,
           array_to_string(t[((i-1)*8+1):((i-1)*8+8)], ' ') AS seg,
           cast(ceil(len(t)/8.0) AS INT) AS n_segs
    FROM toks, unnest(generate_series(1, cast(ceil(len(t)/8.0) AS BIGINT))) AS u(i)
), kept AS (
    SELECT doc_id, pos, seg, n_segs FROM segs
    QUALIFY row_number() OVER (PARTITION BY md5(seg) ORDER BY doc_id, pos) = 1
)
SELECT doc_id,
       string_agg(seg, ' ' ORDER BY pos) AS clean_text,
       COUNT(*)::BIGINT AS n_kept,
       any_value(n_segs) AS n_segs
FROM kept
GROUP BY doc_id
ORDER BY doc_id
"""

ORACLES["minhash_jaccard_est"] = f"""
WITH sh_t AS (
    SELECT doc_id AS doc, {_SHINGLES} AS sh FROM documents
), sig_t AS (
    SELECT doc, sh, {_MINHASH_SIG} AS sig FROM sh_t
), banded AS (
    SELECT doc, b.band_idx,
           md5(array_to_string(sig[b.band_idx*4+1 : b.band_idx*4+4], '|')) AS band_hash
    FROM sig_t, (SELECT unnest(generate_series(0, 3)) AS band_idx) b
), pairs AS (
    SELECT DISTINCT a.doc AS id_a, b.doc AS id_b
    FROM banded a JOIN banded b
      ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash AND a.doc < b.doc
)
SELECT id_a, id_b,
       ROUND(len(list_filter(list_transform(generate_series(1, 16),
                                            i -> sa.sig[i] = sb.sig[i]),
                             v -> v)) / 16.0, 6) AS est_jaccard,
       ROUND(len(list_intersect(sa.sh, sb.sh))
             / (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh)))::DOUBLE,
             6) AS jaccard
FROM pairs
JOIN sig_t sa ON sa.doc = id_a
JOIN sig_t sb ON sb.doc = id_b
ORDER BY id_a, id_b
"""

ORACLES["docs_boilerplate_ngrams"] = f"""
WITH g AS (
    SELECT doc_id, unnest({_SHINGLES}) AS gram FROM documents
)
SELECT gram, COUNT(*)::BIGINT AS doc_freq
FROM g
GROUP BY gram
HAVING COUNT(*) >= 5
ORDER BY doc_freq DESC, gram
LIMIT 100
"""

# bloom prefilter + exact confirm ≡ the exact anti-join — the oracle is
# the exact semantics (the bloom is a physical optimization, not logic)
ORACLES["docs_bloom_decontaminate"] = f"""
WITH ev AS (
    SELECT DISTINCT unnest({_SHINGLES}) AS s FROM documents WHERE doc_id % 37 = 0
), tr AS (
    SELECT doc_id, lang, source, {_SHINGLES} AS sh FROM documents WHERE doc_id % 37 <> 0
), contaminated AS (
    SELECT DISTINCT t.doc_id
    FROM (SELECT doc_id, unnest(sh) AS s FROM tr) t JOIN ev USING (s)
)
SELECT doc_id, lang, source
FROM tr
WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)
ORDER BY doc_id
"""

ORACLES["events_funnel"] = """
WITH seq_t AS (
    SELECT user_id, date_trunc('day', ts) AS day,
           string_agg(event_type, ' ' ORDER BY ts, event_id) AS seq
    FROM events
    GROUP BY user_id, day
), staged AS (
    SELECT CASE
        WHEN regexp_matches(seq, 'view.*click.*purchase') THEN 3
        WHEN regexp_matches(seq, 'view.*click') THEN 2
        WHEN regexp_matches(seq, 'view') THEN 1
        ELSE 0 END AS funnel_stage
    FROM seq_t
)
SELECT funnel_stage, COUNT(*)::BIGINT AS n_user_days
FROM staged
GROUP BY funnel_stage
ORDER BY funnel_stage
"""

ORACLES["events_retention"] = """
WITH pu AS (
    SELECT DISTINCT user_id, date_trunc('week', ts) AS wk FROM events
), c AS (
    SELECT user_id, min(wk) AS c FROM pu GROUP BY user_id
)
SELECT c::TIMESTAMP AS cohort_week,
       cast(date_diff('day', c, wk) / 7 AS INT) AS week_offset,
       COUNT(DISTINCT pu.user_id)::BIGINT AS n_users
FROM pu JOIN c USING (user_id)
GROUP BY 1, 2
ORDER BY cohort_week, week_offset
"""

_QUALITY = """
ROUND(
  least(length(coalesce(text,'')) / 500.0, 1.0) * 0.5
  + (CASE WHEN
       length(regexp_replace(coalesce(text,''), '\\s+', '', 'g'))
         / greatest(len(string_split_regex(lower(trim(coalesce(text,''))), '\\s+')), 1)
       BETWEEN 3 AND 10
     THEN 1.0 ELSE 0.5 END) * 0.3
  + (1 - (length(coalesce(text,''))
          - length(regexp_replace(coalesce(text,''), '[^\\w\\s]', '', 'g')))
         / greatest(length(coalesce(text,'')), 1)) * 0.2
, 6)
"""

ORACLES["docs_llm_pipeline"] = f"""
WITH ev AS (
    SELECT DISTINCT unnest({_SHINGLES}) AS s FROM documents WHERE doc_id % 37 = 0
), tr AS (
    SELECT * FROM documents WHERE doc_id % 37 <> 0
), d1 AS (
    SELECT * FROM tr
    QUALIFY row_number() OVER (PARTITION BY md5({_NORM}) ORDER BY doc_id) = 1
), d2 AS (
    SELECT * FROM d1 WHERE {_QUALITY} >= 0.55
), contaminated AS (
    SELECT DISTINCT t.doc_id
    FROM (SELECT doc_id, unnest({_SHINGLES}) AS s FROM d2) t JOIN ev USING (s)
), d3 AS (
    SELECT * FROM d2 WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)
), d4 AS (
    SELECT * FROM d3
    WHERE ('0x' || substr(md5('mix-v1:' || doc_id), 1, 8))::BIGINT % 1000000 <
          CASE source WHEN 'src0' THEN 250000 WHEN 'src1' THEN 500000
                      WHEN 'src2' THEN 750000 WHEN 'src3' THEN 0
                      ELSE 600000 END
), d5 AS (
    SELECT *,
           CASE WHEN ('0x' || substr(md5('split-v1:' || doc_id), 1, 8))::BIGINT % 100 < 80 THEN 'train'
                WHEN ('0x' || substr(md5('split-v1:' || doc_id), 1, 8))::BIGINT % 100 < 90 THEN 'val'
                ELSE 'test' END AS split
    FROM d4
), tr6 AS (
    SELECT doc_id, text, split,
           GREATEST(1, len({_TOKS}))::BIGINT AS toks,
           ('0x' || substr(md5('shards-v1:' || doc_id), 1, 8))::BIGINT AS skey
    FROM d5 WHERE split = 'train'
), packed AS (
    SELECT doc_id, text, split,
           ((SUM(toks) OVER (
                ORDER BY skey, doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
            ) - toks) // 2000)::BIGINT AS shard
    FROM tr6
), d6 AS (
    SELECT doc_id, text, split, shard FROM packed
    UNION ALL
    SELECT doc_id, text, split, CAST(-1 AS BIGINT) AS shard
    FROM d5 WHERE split <> 'train'
)
SELECT split, shard,
       COUNT(*)::BIGINT AS n_docs,
       SUM(len({_TOKS}))::BIGINT AS total_tokens
FROM d6
GROUP BY split, shard
ORDER BY split, shard
"""

ORACLES["docs_duplicate_spans"] = f"""
WITH toks AS (
    SELECT doc_id, string_split({_NORM}, ' ') AS t FROM documents
), wins AS (
    SELECT doc_id, i - 1 AS pos,
           md5(array_to_string(t[i:i+7], ' ')) AS h
    FROM toks, unnest(generate_series(1, len(t) - 7)) AS u(i)
    WHERE len(t) >= 8
), duph AS (
    SELECT h FROM wins GROUP BY h HAVING COUNT(DISTINCT doc_id) >= 2
), marked AS (
    SELECT w.doc_id, w.pos FROM wins w JOIN duph USING (h)
), isl AS (
    SELECT doc_id, pos,
           pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
    FROM marked
)
SELECT doc_id,
       MIN(pos) AS span_start,
       MAX(pos) + 7 AS span_end,
       COUNT(*)::BIGINT AS n_windows
FROM isl
GROUP BY doc_id, grp
ORDER BY doc_id, span_start
"""

# r8: per-document duplication fraction — same window-hash CTE as
# duplicate_spans, aggregated to the doc-level contamination score
ORACLES["docs_dup_window_frac"] = f"""
WITH toks AS (
    SELECT doc_id, string_split({_NORM}, ' ') AS t FROM documents
), wins AS (
    SELECT doc_id,
           md5(array_to_string(t[i:i+7], ' ')) AS h
    FROM toks, unnest(generate_series(1, len(t) - 7)) AS u(i)
    WHERE len(t) >= 8
), pdh AS (
    SELECT h, doc_id, COUNT(*)::BIGINT AS n_pos FROM wins GROUP BY h, doc_id
), ph AS (
    SELECT h, COUNT(*)::BIGINT AS nd FROM pdh GROUP BY h
)
SELECT doc_id,
       SUM(n_pos)::BIGINT AS n_windows,
       SUM(CASE WHEN nd >= 2 THEN n_pos ELSE 0 END)::BIGINT AS n_dup_windows,
       ROUND(SUM(CASE WHEN nd >= 2 THEN n_pos ELSE 0 END)
             / SUM(n_pos), 6) AS dup_frac
FROM pdh JOIN ph USING (h)
GROUP BY doc_id
ORDER BY doc_id
"""

ORACLES["docs_zipf_slope"] = f"""
WITH freq AS (
    SELECT t, COUNT(*)::BIGINT AS n
    FROM (SELECT unnest({_TOKS}) AS t FROM documents)
    GROUP BY t
), ranked AS (
    SELECT ln(n) AS ln_n,
           ln(row_number() OVER (ORDER BY n DESC, t)) AS ln_r,
           n
    FROM freq
)
SELECT COUNT(*)::BIGINT AS n_types,
       SUM(n)::BIGINT AS n_tokens,
       ROUND(covar_pop(ln_n, ln_r) / var_pop(ln_r), 6) AS slope
FROM ranked
"""

ORACLES["docs_trim_spans"] = f"""
WITH toks AS (
    SELECT doc_id, string_split({_NORM}, ' ') AS t FROM documents
), wins AS (
    SELECT doc_id, i - 1 AS pos,
           md5(array_to_string(t[i:i+7], ' ')) AS h
    FROM toks, unnest(generate_series(1, len(t) - 7)) AS u(i)
    WHERE len(t) >= 8
), duph AS (
    SELECT h FROM wins GROUP BY h HAVING COUNT(DISTINCT doc_id) >= 2
), isl AS (
    SELECT w.doc_id, w.pos,
           w.pos - row_number() OVER (PARTITION BY w.doc_id ORDER BY w.pos) AS grp
    FROM wins w JOIN duph USING (h)
), spans AS (
    SELECT doc_id, MIN(pos) AS s, MAX(pos) + 7 AS e
    FROM isl GROUP BY doc_id, grp
), tok_rows AS (
    SELECT doc_id, t[i] AS tok, i - 1 AS p, len(t) AS n_toks
    FROM toks, unnest(generate_series(1, len(t))) AS u(i)
), kept AS (
    SELECT tr.doc_id, tr.tok, tr.p, tr.n_toks
    FROM tok_rows tr
    WHERE NOT EXISTS (
        SELECT 1 FROM spans s
        WHERE s.doc_id = tr.doc_id AND tr.p BETWEEN s.s AND s.e
    )
)
SELECT doc_id,
       string_agg(tok, ' ' ORDER BY p) AS trimmed_text,
       (any_value(n_toks) - COUNT(*))::INT AS n_removed
FROM kept
GROUP BY doc_id
ORDER BY doc_id
"""

ORACLES["events_anomaly_days"] = """
WITH daily AS (
    SELECT date_trunc('day', ts)::TIMESTAMP AS day, event_type,
           COUNT(*)::BIGINT AS n
    FROM events
    GROUP BY 1, 2
), stats AS (
    SELECT event_type, AVG(n) AS mu, STDDEV_POP(n) AS sigma
    FROM daily GROUP BY event_type
)
SELECT event_type, day, n, ROUND((n - mu) / sigma, 4) AS z
FROM daily JOIN stats USING (event_type)
WHERE abs(ROUND((n - mu) / sigma, 4)) >= 1.5
ORDER BY event_type, day
"""

ORACLES["events_trailing_avg"] = """
WITH daily AS (
    SELECT date_trunc('day', ts)::TIMESTAMP AS day, event_type,
           COUNT(*)::BIGINT AS n
    FROM events GROUP BY 1, 2
)
SELECT event_type, day, n,
       ROUND(AVG(n) OVER (
           PARTITION BY event_type ORDER BY day
           ROWS BETWEEN 6 PRECEDING AND CURRENT ROW
       ), 4) AS avg_7d
FROM daily
ORDER BY event_type, day
"""

ORACLES["customer_quartiles"] = """
WITH q AS (
    SELECT c_mktsegment, c_acctbal,
           ntile(4) OVER (
               PARTITION BY c_mktsegment
               ORDER BY c_acctbal DESC, c_custkey ASC
           ) AS quartile
    FROM customer
)
SELECT c_mktsegment, quartile,
       COUNT(*)::BIGINT AS n_customers,
       ROUND(AVG(c_acctbal), 4) AS avg_balance
FROM q
GROUP BY c_mktsegment, quartile
ORDER BY c_mktsegment, quartile
"""

ORACLES["docs_weighted_sample"] = """
SELECT doc_id, n_chars,
       ROUND(ln((('0x' || substr(md5('wsample-v1:' || doc_id), 1, 8))::BIGINT + 1)
                / 4294967296.0) / n_chars, 8) AS sample_key
FROM documents
ORDER BY sample_key DESC, doc_id ASC
LIMIT 200
"""

ORACLES["docs_token_pmi"] = f"""
WITH toks AS (
    SELECT DISTINCT doc_id, unnest(list_distinct({_TOKS})) AS t FROM documents
), dfreq AS (
    SELECT t, COUNT(*)::BIGINT AS df FROM toks GROUP BY t
), top AS (
    SELECT t, df FROM dfreq ORDER BY df DESC, t ASC LIMIT 100
), pruned AS (
    SELECT toks.doc_id, toks.t FROM toks JOIN top USING (t)
), pairs AS (
    SELECT a.t AS t_a, b.t AS t_b, COUNT(*)::BIGINT AS c_ab
    FROM pruned a JOIN pruned b
      ON a.doc_id = b.doc_id AND a.t < b.t
    GROUP BY a.t, b.t
), n AS (
    SELECT COUNT(*) AS n_docs FROM documents
)
SELECT t_a, t_b, c_ab,
       ROUND(ln(c_ab * n.n_docs / (fa.df * fb.df)), 6) AS pmi
FROM pairs
JOIN top fa ON fa.t = t_a
JOIN top fb ON fb.t = t_b, n
ORDER BY pmi DESC, t_a, t_b
LIMIT 50
"""

ORACLES["docs_containment"] = f"""
WITH sh_all AS (
    SELECT DISTINCT doc_id AS doc, unnest({_SHINGLES}) AS shingle FROM documents
), sh AS (
    SELECT doc, shingle FROM sh_all
    QUALIFY COUNT(*) OVER (PARTITION BY shingle) <= 25
), sizes AS (
    SELECT doc, COUNT(*) AS n_shingles FROM sh GROUP BY doc
), common AS (
    SELECT a.doc AS id_a, b.doc AS id_b, COUNT(*) AS common
    FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc < b.doc
    GROUP BY a.doc, b.doc
)
SELECT id_a, id_b,
       ROUND(common / sa.n_shingles, 6) AS containment_a,
       ROUND(common / sb.n_shingles, 6) AS containment_b
FROM common
JOIN sizes sa ON sa.doc = id_a
JOIN sizes sb ON sb.doc = id_b
WHERE ROUND(common / sa.n_shingles, 6) >= 0.5
   OR ROUND(common / sb.n_shingles, 6) >= 0.5
ORDER BY id_a, id_b
"""

# DSIR (Xie et al. 2023): hashed (uni+bi)gram buckets, smoothed
# target-vs-raw log-ratio summed per document. alpha=0.5, B=1024 ->
# alpha*B = 512. Bucket hash mirrors Spark's
# conv(substr(md5(g),1,8),16,10) % 1024 exactly.
_DSIR_FEATS = f"""
WITH base AS (
    SELECT doc_id, lang, {_TOKS} AS toks FROM documents
), grams AS (
    SELECT doc_id, lang,
           unnest(list_concat(toks,
               list_transform(generate_series(1, greatest(len(toks) - 1, 0)),
                              i -> toks[i] || ' ' || toks[i + 1]))) AS g
    FROM base
), feats AS (
    SELECT doc_id, (lang = 'en') AS is_target,
           ('0x' || substr(md5(g), 1, 8))::BIGINT % 1024 AS b
    FROM grams
), per_doc AS (
    -- (doc, bucket) pre-aggregation, mirroring the Spark plan's
    -- ReuseExchange shape so both engines sum cnt*lam identically
    SELECT doc_id, is_target, b, COUNT(*)::DOUBLE AS cnt
    FROM feats GROUP BY doc_id, is_target, b
), buckets AS (
    SELECT b, SUM(cnt) AS r_cnt,
           SUM(CASE WHEN is_target THEN cnt ELSE 0 END) AS t_cnt
    FROM per_doc GROUP BY b
), tot AS (
    SELECT SUM(r_cnt) AS r_tot, SUM(t_cnt) AS t_tot FROM buckets
), ratio AS (
    SELECT b, ln(t_cnt + 0.5) - ln(t_tot + 512.0)
            - ln(r_cnt + 0.5) + ln(r_tot + 512.0) AS lam
    FROM buckets, tot
), weights AS (
    SELECT doc_id, SUM(cnt)::BIGINT AS n_grams,
           ROUND(SUM(cnt * lam), 4) AS dsir_logw
    FROM per_doc JOIN ratio USING (b)
    GROUP BY doc_id
)
"""

ORACLES["docs_dsir_weights"] = (
    _DSIR_FEATS + "SELECT doc_id, n_grams, dsir_logw FROM weights ORDER BY doc_id"
)

# Gumbel-top-k resample: key = logw - ln(-ln(u)), u from the md5
# fingerprint (operators/splits.py idiom), rounded 4 dp pre-sort so the
# cut is stable cross-engine; ties break by doc_id.
ORACLES["docs_dsir_sample"] = (
    _DSIR_FEATS
    + """
SELECT doc_id, n_grams, dsir_logw,
       ROUND(dsir_logw - ln(-ln(
           ((('0x' || substr(md5('dsir:' || doc_id), 1, 8))::BIGINT + 0.5)
            / 4294967296.0))), 4) AS gumbel_key
FROM weights
ORDER BY gumbel_key DESC, doc_id ASC
LIMIT 100
"""
)

# Interpolated bigram LM: p(b|a) = 0.7*c_ab/c_a + (1.0-0.7)*(c_b+0.5)/(N+0.5*V).
# (1.0-0.7) is written as the subtraction so both engines evaluate the
# identical IEEE double. Parallel unnests zip positionally in DuckDB.
ORACLES["docs_bigram_logprob"] = f"""
WITH base AS (
    SELECT doc_id, {_TOKS} AS toks FROM documents
), trans AS (
    SELECT doc_id,
           unnest(toks[1:len(toks) - 1]) AS a,
           unnest(toks[2:len(toks)]) AS b
    FROM base WHERE len(toks) >= 2
), big AS (
    SELECT a, b, COUNT(*)::DOUBLE AS c_ab FROM trans GROUP BY a, b
), ctx AS (
    SELECT a, COUNT(*)::DOUBLE AS c_a FROM trans GROUP BY a
), uni AS (
    SELECT t, COUNT(*)::DOUBLE AS c_t
    FROM (SELECT unnest(toks) AS t FROM base) GROUP BY t
), scalars AS (
    SELECT SUM(c_t) AS n_total, COUNT(*)::DOUBLE AS v_size FROM uni
)
SELECT doc_id, COUNT(*)::BIGINT AS n_transitions,
       ROUND(AVG(ln(0.7 * c_ab / c_a
                    + (1.0 - 0.7) * (c_t + 0.5) / (n_total + 0.5 * v_size))),
             4) AS bigram_logprob
FROM trans
JOIN big USING (a, b)
JOIN ctx USING (a)
JOIN uni ON uni.t = trans.b
CROSS JOIN scalars
GROUP BY doc_id
ORDER BY doc_id
"""

# Sliding-window chunking: 24-token windows, step 16 (overlap 8).
# n_chunks = 1 + ceil(max(n-24,0)/16); DuckDB list slice is 1-based
# inclusive, mirroring Spark's slice(toks, start, length).
ORACLES["docs_chunks"] = f"""
WITH base AS (
    SELECT doc_id, {_TOKS} AS toks FROM documents
), sized AS (
    SELECT doc_id, toks, len(toks) AS n FROM base
), chunks AS (
    SELECT doc_id, i AS chunk_id, i * 16 AS token_start,
           toks[i * 16 + 1 : i * 16 + 24] AS ctoks
    FROM sized,
         LATERAL unnest(generate_series(0,
             CASE WHEN n > 24 THEN CAST(ceil((n - 24) / 16.0) AS INT)
                  ELSE 0 END)) AS g(i)
)
SELECT doc_id AS id, chunk_id, token_start,
       len(ctoks) AS n_tokens,
       array_to_string(ctoks, ' ') AS chunk_text
FROM chunks
ORDER BY id, chunk_id
"""

# Distributed BPE training: the oracle is GENERATED — one CTE chain per
# merge round (materialized to avoid exponential CTE inlining),
# replaying the exact argmax tie-break and islands-parity merge
# application of functions/bpe.py. See build_oracle_sql's docstring.
from social_media_data_pipeline_spark.functions.bpe import build_oracle_sql as _bpe_oracle

ORACLES["docs_bpe_merges"] = _bpe_oracle(20)

from social_media_data_pipeline_spark.functions.bpe import (
    build_encode_oracle_sql as _bpe_encode_oracle,
)

ORACLES["docs_bpe_tokens"] = _bpe_encode_oracle(20)

# docs_token_fertility (r10): training chain + encode lookups +
# language-grain sums — fertility = BPE tokens per word per language.
from social_media_data_pipeline_spark.functions.bpe import (
    build_fertility_oracle_sql as _bpe_fertility_oracle,
)

ORACLES["docs_token_fertility"] = _bpe_fertility_oracle(20)

# docs_fertility_mixture (r10): the fertility chain's per-language
# token masses drive the α=0.5 HUGEINT thresholds + md5 draw —
# token-budget-balanced sampling, the correction fertility motivates
from social_media_data_pipeline_spark.functions.bpe import (
    build_fertility_mixture_oracle_sql as _bpe_fert_mix_oracle,
)

ORACLES["docs_fertility_mixture"] = _bpe_fert_mix_oracle(20)

from social_media_data_pipeline_spark.functions.classifier import (
    build_logreg_oracle_sql as _logreg_oracle,
)

ORACLES["docs_quality_classifier"] = _logreg_oracle(n_buckets=256, iters=10, lr=1.0)

# Count-Min Sketch point queries: cells are
# ('0x'||substr(md5(d||':'||t),1,8))::BIGINT % 512 for d in 0..3,
# mirroring sketches._cms_col exactly; est = min over the 4 rows.
# KMV distinct sketch: the oracle computes the global k-smallest distinct
# hashes per group directly; the Spark side builds per-week sketches and
# merges them — provably lossless (any hash in the global top-k is top-k
# within its own week), so both paths produce identical sketches.
ORACLES["events_kmv_distinct"] = """
WITH h AS (
    SELECT DISTINCT event_type,
           ('0x' || substr(md5(user_id::VARCHAR), 1, 15))::BIGINT AS h
    FROM events
), ranked AS (
    SELECT event_type, h,
           row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
    FROM h
), sk AS (
    SELECT event_type, max(rn) AS sz,
           max(CASE WHEN rn = 64 THEN h END) AS h_k
    FROM ranked WHERE rn <= 64
    GROUP BY event_type
), est AS (
    SELECT event_type,
           CASE WHEN sz < 64 THEN sz::DOUBLE
                ELSE ROUND(63.0 * 1152921504606846976.0 / h_k, 4)
           END AS distinct_est
    FROM sk
), exact AS (
    SELECT event_type, count(DISTINCT user_id) AS exact_distinct
    FROM events GROUP BY event_type
)
SELECT exact.event_type, exact.exact_distinct, est.distinct_est
FROM exact JOIN est USING (event_type)
ORDER BY event_type
"""

ORACLES["token_cms_estimates"] = f"""
WITH toks AS (
    SELECT unnest({_TOKS}) AS t FROM documents
), nonempty AS (
    SELECT t FROM toks WHERE length(t) > 0
), cells AS (
    SELECT d, ('0x' || substr(md5(d || ':' || t), 1, 8))::BIGINT % 512 AS col,
           COUNT(*)::BIGINT AS cnt
    FROM nonempty, LATERAL unnest(generate_series(0, 3)) AS g(d)
    GROUP BY d, col
), exact AS (
    SELECT t, COUNT(*)::BIGINT AS exact_cnt FROM nonempty GROUP BY t
), top AS (
    SELECT t, exact_cnt FROM exact ORDER BY exact_cnt DESC, t ASC LIMIT 30
), probes AS (
    SELECT t, d, ('0x' || substr(md5(d || ':' || t), 1, 8))::BIGINT % 512 AS col
    FROM top, LATERAL unnest(generate_series(0, 3)) AS g(d)
), est AS (
    SELECT t, MIN(COALESCE(cnt, 0))::BIGINT AS cms_est
    FROM probes LEFT JOIN cells USING (d, col)
    GROUP BY t
)
SELECT t, exact_cnt, cms_est
FROM top JOIN est USING (t)
ORDER BY exact_cnt DESC, t ASC
"""

# Distributed deterministic k-means: generated CTE chain replaying all
# Lloyd rounds in exact integer micro-space (see
# functions/kmeans.py:build_kmeans_oracle_sql).
from social_media_data_pipeline_spark.functions.kmeans import (
    build_kmeans_centroid_cte as _kmeans_cent_cte,
    build_kmeans_oracle_sql as _kmeans_oracle,
)

ORACLES["kmeans_train"] = _kmeans_oracle(iters=5)
# the budget-zeroed distributed-path row (r13) trains the SAME model —
# the driver/distributed parity is the point — so the oracle is the
# same 5-round replay chain
ORACLES["kmeans_train_distributed"] = _kmeans_oracle(iters=5)

# IVF top-k over the TRAINED centroids: the k-means chain feeds the
# same assigned/scored/top-k body as embedding_ivf_topk.
ORACLES["embedding_ivf_topk_trained"] = _kmeans_cent_cte(iters=5) + f""", vv AS (
    SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings
), assigned AS (
    SELECT vec_id, vec, centroid_id AS cluster
    FROM vv, cent
    QUALIFY row_number() OVER (
        PARTITION BY vec_id ORDER BY {_cos('vec', 'c_vec')} DESC, centroid_id ASC
    ) = 1
), scored AS (
    SELECT q.vec_id AS query_id, s.vec_id AS neighbor_id,
           {_cos('q.vec', 's.vec')} AS cos
    FROM assigned q JOIN assigned s ON q.cluster = s.cluster
    WHERE q.vec_id < 20 AND q.vec_id <> s.vec_id
)
SELECT query_id, neighbor_id, cos,
       row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
FROM scored
QUALIFY rank <= 5
ORDER BY query_id, rank"""

# r8: the composed production default — TRAINED centroids x multiprobe
# search. Same k-means replay chain, multiprobe qprobe body (rn <= 4).
ORACLES["embedding_ivf_multiprobe_trained"] = _kmeans_cent_cte(iters=5) + f""", vv AS (
    SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings
), assigned AS (
    SELECT vec_id, vec, centroid_id AS cluster
    FROM vv, cent
    QUALIFY row_number() OVER (
        PARTITION BY vec_id ORDER BY {_cos('vec', 'c_vec')} DESC, centroid_id ASC
    ) = 1
), qprobe AS (
    SELECT vec_id, vec, centroid_id AS cluster
    FROM vv, cent
    WHERE vec_id < 20
    QUALIFY row_number() OVER (
        PARTITION BY vec_id ORDER BY {_cos('vec', 'c_vec')} DESC, centroid_id ASC
    ) <= 4
), scored AS (
    SELECT q.vec_id AS query_id, s.vec_id AS neighbor_id,
           {_cos('q.vec', 's.vec')} AS cos
    FROM qprobe q JOIN assigned s ON q.cluster = s.cluster
    WHERE q.vec_id <> s.vec_id
)
SELECT query_id, neighbor_id, cos,
       row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
FROM scored
QUALIFY rank <= 5
ORDER BY query_id, rank"""

# PQ over TRAINED codebooks: per-subspace k-means chain (exact integer
# micro-space replay) ending in cw(c, j, csub), then the standard
# encode + ADC body in integer micro-unit sums.
from social_media_data_pipeline_spark.functions.pq import (
    build_pq_kmeans_chain_sql as _pq_kmeans_chain,
)

ORACLES["embedding_pq_topk_trained"] = _pq_kmeans_chain(m=8, ksub=16, iters=3) + """
, v2 AS (SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings),
js2 AS (SELECT unnest(generate_series(0, 7)) AS j),
subs AS (
    SELECT vec_id, j, list_slice(vec, j*8+1, j*8+8) AS sub FROM v2, js2
),
dists AS (
    SELECT subs.vec_id, subs.j, cw.c,
           ROUND(list_dot_product(sub, sub)
                 - 2 * list_dot_product(sub, csub)
                 + list_dot_product(csub, csub), 6) AS d
    FROM subs JOIN cw ON subs.j = cw.j
),
codes AS (
    SELECT vec_id, j, c AS code
    FROM dists
    QUALIFY row_number() OVER (PARTITION BY vec_id, j ORDER BY d, c) = 1
),
adc_terms AS (
    SELECT qs.vec_id AS query_id, codes.vec_id AS neighbor_id, codes.j,
           CAST(ROUND((list_dot_product(qs.sub, qs.sub)
                 - 2 * list_dot_product(qs.sub, cw.csub)
                 + list_dot_product(cw.csub, cw.csub)) * 1000000, 0) AS BIGINT) AS term
    FROM codes
    JOIN cw ON cw.j = codes.j AND cw.c = codes.code
    JOIN subs qs ON qs.j = codes.j
    WHERE qs.vec_id < 5 AND qs.vec_id <> codes.vec_id
),
adc AS (
    SELECT query_id, neighbor_id, SUM(term) / 1000000.0 AS adc_dist
    FROM adc_terms GROUP BY query_id, neighbor_id
)
SELECT query_id, neighbor_id, adc_dist,
       row_number() OVER (
           PARTITION BY query_id ORDER BY adc_dist, neighbor_id
       ) AS rank
FROM adc
QUALIFY rank <= 5
ORDER BY query_id, rank"""

# graph_pagerank: generated WITH-chain replaying the exact 5-round
# integer micro-unit run (functions/graph.py:build_pagerank_sql)
from social_media_data_pipeline_spark.functions.graph import (  # noqa: E402
    build_pagerank_sql as _pagerank_sql,
)

ORACLES["graph_pagerank"] = _pagerank_sql(
    """
    SELECT DISTINCT o_custkey AS src, 1000000000 + l_suppkey AS dst
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey""",
    iters=5,
) + """
SELECT node, rank_micro FROM r5 ORDER BY node"""

# graph_pagerank_dangling: same graph, dangling mass redistributed —
# per-round d{r} CTE (summed sink rank) folds the uniform integer
# share into the update, replaying the Spark observe-scalar run exactly
ORACLES["graph_pagerank_dangling"] = _pagerank_sql(
    """
    SELECT DISTINCT o_custkey AS src, 1000000000 + l_suppkey AS dst
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey""",
    iters=5,
    dangling="redistribute",
) + """
SELECT node, rank_micro FROM r5 ORDER BY node"""

# events_zorder_key: generated bit-interleave expression
# (scale.py:build_zorder_sql) over (user_id, epoch-day)
from social_media_data_pipeline_spark.scale import (  # noqa: E402
    build_zorder_sql as _zorder_sql,
)

ORACLES["events_zorder_key"] = f"""
SELECT event_id, user_id,
       date_diff('day', DATE '1970-01-01', ts::DATE) AS day,
       {_zorder_sql(['user_id', "date_diff('day', DATE '1970-01-01', ts::DATE)"], bits=16)} AS zkey
FROM events
ORDER BY event_id"""

# events_hll_distinct: generated register replay
# (functions/sketches.py:build_hll_estimate_sql); the weekly merge is
# lossless (element-wise max over a partition of the stream), so the
# oracle builds registers over the whole group directly.
from social_media_data_pipeline_spark.functions.sketches import (  # noqa: E402
    build_hll_estimate_sql as _hll_sql,
)

ORACLES["events_hll_distinct"] = f"""
WITH est AS ({_hll_sql(['event_type'], 'user_id', 'events', p=8)}
), ex AS (
    SELECT event_type, COUNT(DISTINCT user_id) AS n_exact
    FROM events GROUP BY event_type
)
SELECT est.event_type, est.distinct_est, ex.n_exact
FROM est JOIN ex USING (event_type)
ORDER BY event_type"""

# events_kmv_overlap: per-type k-smallest hash sketches paired with the
# same list math as sketches.kmv_overlap_pairs (union's k smallest =
# union KMV; shared fraction = Jaccard; x union estimate = overlap)
ORACLES["events_kmv_overlap"] = """
WITH h AS (
    SELECT DISTINCT event_type,
           ('0x' || substr(md5(user_id::VARCHAR), 1, 15))::BIGINT AS h
    FROM events
), ranked AS (
    SELECT event_type, h,
           row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
    FROM h
), sk AS (
    SELECT event_type, list_sort(list(h)) AS kmv
    FROM ranked WHERE rn <= 64 GROUP BY event_type
), pairs AS (
    SELECT sa.event_type AS a, sb.event_type AS b,
           sa.kmv AS ka, sb.kmv AS kb,
           list_slice(list_sort(list_distinct(sa.kmv || sb.kmv)), 1, 64) AS u
    FROM sk sa JOIN sk sb ON sa.event_type < sb.event_type
), calc AS (
    SELECT a, b, u, len(u) AS nu,
           len(list_filter(list_intersect(ka, kb),
                           x -> x <= u[len(u)])) AS shared
    FROM pairs
), est AS (
    SELECT a, b,
           ROUND(shared::DOUBLE / nu, 6) AS jaccard_est,
           CASE WHEN nu < 64 THEN shared::DOUBLE
                ELSE ROUND((shared::DOUBLE / nu)
                           * (63.0 * 1152921504606846976.0 / u[64]), 4)
           END AS intersect_est
    FROM calc
), ex AS (
    SELECT x.event_type AS a, y.event_type AS b, COUNT(*) AS n_exact
    FROM (SELECT DISTINCT event_type, user_id FROM events) x
    JOIN (SELECT DISTINCT event_type, user_id FROM events) y
      ON x.user_id = y.user_id AND x.event_type < y.event_type
    GROUP BY x.event_type, y.event_type
)
SELECT est.a, est.b, est.jaccard_est, est.intersect_est, ex.n_exact
FROM est LEFT JOIN ex USING (a, b)
ORDER BY a, b"""

# docs_training_shards: deterministic-shuffle greedy token packing —
# same md5 order key as docs_shuffle, integer cumsum window, shard =
# start-offset div budget
ORACLES["docs_training_shards"] = """
WITH t AS (
    SELECT doc_id, GREATEST(1, n_chars // 4) AS toks,
           ('0x' || substr(md5('shards-v1:' || doc_id), 1, 8))::BIGINT AS skey
    FROM documents
), c AS (
    SELECT doc_id,
           SUM(toks) OVER (
               ORDER BY skey, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) - toks AS start
    FROM t
)
SELECT doc_id, (start // 2000)::BIGINT AS shard
FROM c ORDER BY doc_id"""

# embedding_ivf_pq_residual: the full residual IVF-PQ replay — kmeans
# centroid chain -> cosine assignment -> residual CTE -> pq-kmeans
# codeword chain TRAINED ON RESIDUALS (continue_chain mode) -> encode
# -> integer-micro ADC within the query's cell.
ORACLES["embedding_ivf_pq_residual"] = (
    _kmeans_cent_cte(iters=5)
    + f""", vv AS (
    SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings
), assigned AS MATERIALIZED (
    SELECT vec_id, vec, centroid_id AS cluster
    FROM vv, cent
    QUALIFY row_number() OVER (
        PARTITION BY vec_id ORDER BY {_cos('vec', 'c_vec')} DESC, centroid_id ASC
    ) = 1
), resid_t AS MATERIALIZED (
    SELECT a.vec_id, a.cluster,
           list_transform(generate_series(1, 64), i -> a.vec[i] - c.c_vec[i]) AS embedding
    FROM assigned a JOIN cent c ON c.centroid_id = a.cluster
)"""
    + _pq_kmeans_chain(m=8, ksub=16, iters=3, table="resid_t", continue_chain=True)
    + """
, rsubs AS MATERIALIZED (
    SELECT vec_id, cluster, j, list_slice(embedding, j * 8 + 1, j * 8 + 8) AS sub
    FROM resid_t, (SELECT unnest(generate_series(0, 7)) AS j) js2
), rdists AS (
    SELECT rsubs.vec_id, rsubs.cluster, rsubs.j, cw.c,
           ROUND(list_dot_product(sub, sub)
                 - 2 * list_dot_product(sub, csub)
                 + list_dot_product(csub, csub), 6) AS d
    FROM rsubs JOIN cw ON rsubs.j = cw.j
), rcodes AS MATERIALIZED (
    SELECT vec_id, cluster, j, c AS code
    FROM rdists
    QUALIFY row_number() OVER (PARTITION BY vec_id, j ORDER BY d, c) = 1
), adc_terms AS (
    SELECT qs.vec_id AS query_id, rcodes.vec_id AS neighbor_id, rcodes.j,
           CAST(ROUND((list_dot_product(qs.sub, qs.sub)
                 - 2 * list_dot_product(qs.sub, cw.csub)
                 + list_dot_product(cw.csub, cw.csub)) * 1000000, 0) AS BIGINT) AS term
    FROM rcodes
    JOIN cw ON cw.j = rcodes.j AND cw.c = rcodes.code
    JOIN rsubs qs ON qs.j = rcodes.j AND qs.cluster = rcodes.cluster
    WHERE qs.vec_id < 5 AND qs.vec_id <> rcodes.vec_id
), adc AS (
    SELECT query_id, neighbor_id, SUM(term) / 1000000.0 AS adc_dist
    FROM adc_terms GROUP BY query_id, neighbor_id
)
SELECT query_id, neighbor_id, adc_dist,
       row_number() OVER (
           PARTITION BY query_id ORDER BY adc_dist, neighbor_id
       ) AS rank
FROM adc
QUALIFY rank <= 5
ORDER BY query_id, rank"""
)

# embedding_ivf_pq_opq (r12): OPQ rotation composed into the full
# residual IVF-PQ chain over an ANISOTROPIC fixture. The bench
# embeddings are isotropic (measured r11: rotation gains nothing), so
# the query skews a 16-dim slice with a deterministic md5-derived
# S = Q·diag(scales), then applies the OPQ rotation R trained OFFLINE
# on a deterministic distribution-matched sample (Ge 2013 eigenvalue
# allocation; eigendecomposition is not SQL-expressible, so the
# rotation ships as literals — the SAME T = R·S matrix on both sides,
# the production pattern of a rotation artifact trained on a held-out
# sample). The differential verifies the composed matmul → kmeans →
# residual CTE → PQ codeword chain → integer-micro ADC end to end:
# a wrong matrix entry, a transposed index, or a broken chain over
# TRANSFORMED (non-float32-grid) doubles hash-mismatches.


def _opq_rot_table(t_mat, dim: int) -> str:
    """(SELECT vec_id, [T·x chains] AS embedding FROM embeddings) —
    the skew+rotate matmul as fixed left-to-right literal chains
    (both engines parse a + b + c left-associatively and repr(float)
    round-trips to identical doubles)."""
    outs = []
    for i in range(dim):
        terms = " + ".join(
            f"{float(t_mat[i][j])!r} * embedding[{j + 1}]::DOUBLE"
            for j in range(dim)
        )
        outs.append(f"({terms})")
    arr = ",\n      ".join(outs)
    return (
        "(SELECT vec_id, [\n      " + arr + "] AS embedding\n"
        " FROM embeddings) rot_t"
    )


def _ivf_pq_residual_sql(
    table: str, dim: int, m: int, ksub: int,
    km_iters: int, pq_iters: int, nq: int, k: int,
) -> str:
    """The full residual IVF-PQ replay parameterized by source table
    and geometry — the embedding_ivf_pq_residual oracle generalized."""
    dsub = dim // m
    return (
        _kmeans_cent_cte(iters=km_iters, dim=dim, table=table)
        + f""", vv AS (
    SELECT vec_id, embedding::DOUBLE[] AS vec FROM {table}
), assigned AS MATERIALIZED (
    SELECT vec_id, vec, centroid_id AS cluster
    FROM vv, cent
    QUALIFY row_number() OVER (
        PARTITION BY vec_id ORDER BY {_cos('vec', 'c_vec')} DESC, centroid_id ASC
    ) = 1
), resid_t AS MATERIALIZED (
    SELECT a.vec_id, a.cluster,
           list_transform(generate_series(1, {dim}), i -> a.vec[i] - c.c_vec[i]) AS embedding
    FROM assigned a JOIN cent c ON c.centroid_id = a.cluster
)"""
        + _pq_kmeans_chain(
            m=m, ksub=ksub, iters=pq_iters, dim=dim,
            table="resid_t", continue_chain=True,
        )
        + f"""
, rsubs AS MATERIALIZED (
    SELECT vec_id, cluster, j, list_slice(embedding, j * {dsub} + 1, j * {dsub} + {dsub}) AS sub
    FROM resid_t, (SELECT unnest(generate_series(0, {m - 1})) AS j) js2
), rdists AS (
    SELECT rsubs.vec_id, rsubs.cluster, rsubs.j, cw.c,
           ROUND(list_dot_product(sub, sub)
                 - 2 * list_dot_product(sub, csub)
                 + list_dot_product(csub, csub), 6) AS d
    FROM rsubs JOIN cw ON rsubs.j = cw.j
), rcodes AS MATERIALIZED (
    SELECT vec_id, cluster, j, c AS code
    FROM rdists
    QUALIFY row_number() OVER (PARTITION BY vec_id, j ORDER BY d, c) = 1
), adc_terms AS (
    SELECT qs.vec_id AS query_id, rcodes.vec_id AS neighbor_id, rcodes.j,
           CAST(ROUND((list_dot_product(qs.sub, qs.sub)
                 - 2 * list_dot_product(qs.sub, cw.csub)
                 + list_dot_product(cw.csub, cw.csub)) * 1000000, 0) AS BIGINT) AS term
    FROM rcodes
    JOIN cw ON cw.j = rcodes.j AND cw.c = rcodes.code
    JOIN rsubs qs ON qs.j = rcodes.j AND qs.cluster = rcodes.cluster
    WHERE qs.vec_id < {nq} AND qs.vec_id <> rcodes.vec_id
), adc AS (
    SELECT query_id, neighbor_id, SUM(term) / 1000000.0 AS adc_dist
    FROM adc_terms GROUP BY query_id, neighbor_id
)
SELECT query_id, neighbor_id, adc_dist,
       row_number() OVER (
           PARTITION BY query_id ORDER BY adc_dist, neighbor_id
       ) AS rank
FROM adc
QUALIFY rank <= {k}
ORDER BY query_id, rank"""
    )


from social_media_data_pipeline_spark.functions.pca import (
    opq_demo_fixture as _opq_fixture,
)

_OPQ_T = _opq_fixture(d=16, m=4)[2]
ORACLES["embedding_ivf_pq_opq"] = _ivf_pq_residual_sql(
    table=_opq_rot_table(_OPQ_T, 16),
    dim=16, m=4, ksub=16, km_iters=3, pq_iters=2, nq=5, k=5,
)

# embedding_ivf_multiprobe_searched (r10): the Spark side reads BOTH
# persisted artifacts (manifest-committed centroids + residual
# codebook); this oracle replays BOTH trainings — kmeans centroid
# chain -> assignment -> residual CTE -> pq-kmeans codeword chain —
# then the MULTIPROBE ADC body: queries probe their top-4 cells
# (rn <= 4, the ivf_assign_multiprobe mirror) and compare via their
# PER-PROBED-CELL residual (Jégou 2011 §IV-A: a query's residual is
# cell-relative). A neighbor lives in exactly one cell, so the
# (query, neighbor) ADC sum never double-counts across probes.
# Hash-match here proves the two persisted cache paths are
# bit-identical to a fresh train.
ORACLES["embedding_ivf_multiprobe_searched"] = (
    _kmeans_cent_cte(iters=5)
    + f""", vv AS (
    SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings
), assigned AS MATERIALIZED (
    SELECT vec_id, vec, centroid_id AS cluster
    FROM vv, cent
    QUALIFY row_number() OVER (
        PARTITION BY vec_id ORDER BY {_cos('vec', 'c_vec')} DESC, centroid_id ASC
    ) = 1
), resid_t AS MATERIALIZED (
    SELECT a.vec_id, a.cluster,
           list_transform(generate_series(1, 64), i -> a.vec[i] - c.c_vec[i]) AS embedding
    FROM assigned a JOIN cent c ON c.centroid_id = a.cluster
)"""
    + _pq_kmeans_chain(m=8, ksub=16, iters=3, table="resid_t", continue_chain=True)
    + f"""
, rsubs AS MATERIALIZED (
    SELECT vec_id, cluster, j, list_slice(embedding, j * 8 + 1, j * 8 + 8) AS sub
    FROM resid_t, (SELECT unnest(generate_series(0, 7)) AS j) js2
), rdists AS (
    SELECT rsubs.vec_id, rsubs.cluster, rsubs.j, cw.c,
           ROUND(list_dot_product(sub, sub)
                 - 2 * list_dot_product(sub, csub)
                 + list_dot_product(csub, csub), 6) AS d
    FROM rsubs JOIN cw ON rsubs.j = cw.j
), rcodes AS MATERIALIZED (
    SELECT vec_id, cluster, j, c AS code
    FROM rdists
    QUALIFY row_number() OVER (PARTITION BY vec_id, j ORDER BY d, c) = 1
), qprobe AS MATERIALIZED (
    SELECT vec_id, vec, centroid_id AS cluster
    FROM vv, cent
    WHERE vec_id < 5
    QUALIFY row_number() OVER (
        PARTITION BY vec_id ORDER BY {_cos('vec', 'c_vec')} DESC, centroid_id ASC
    ) <= 4
), qres AS MATERIALIZED (
    SELECT q.vec_id, q.cluster,
           list_transform(generate_series(1, 64), i -> q.vec[i] - c.c_vec[i]) AS embedding
    FROM qprobe q JOIN cent c ON c.centroid_id = q.cluster
), qsubs AS MATERIALIZED (
    SELECT vec_id, cluster, j, list_slice(embedding, j * 8 + 1, j * 8 + 8) AS sub
    FROM qres, (SELECT unnest(generate_series(0, 7)) AS j) js3
), adc_terms AS (
    SELECT qs.vec_id AS query_id, rcodes.vec_id AS neighbor_id, rcodes.j,
           CAST(ROUND((list_dot_product(qs.sub, qs.sub)
                 - 2 * list_dot_product(qs.sub, cw.csub)
                 + list_dot_product(cw.csub, cw.csub)) * 1000000, 0) AS BIGINT) AS term
    FROM rcodes
    JOIN cw ON cw.j = rcodes.j AND cw.c = rcodes.code
    JOIN qsubs qs ON qs.j = rcodes.j AND qs.cluster = rcodes.cluster
    WHERE qs.vec_id <> rcodes.vec_id
), adc AS (
    SELECT query_id, neighbor_id, SUM(term) / 1000000.0 AS adc_dist
    FROM adc_terms GROUP BY query_id, neighbor_id
)
SELECT query_id, neighbor_id, adc_dist,
       row_number() OVER (
           PARTITION BY query_id ORDER BY adc_dist, neighbor_id
       ) AS rank
FROM adc
QUALIFY rank <= 5
ORDER BY query_id, rank"""
)

# docs_gopher_rules: the Rae et al. 2021 Appendix-A document rules as
# the same rounded expressions over one token split
ORACLES["docs_gopher_rules"] = f"""
WITH ml AS (
    SELECT doc_id,
           CASE WHEN doc_id % 11 = 0
                THEN regexp_replace(text, ' ', chr(10) || '- ', 'g')
                WHEN doc_id % 11 = 1
                THEN regexp_replace(text, ' ', '...' || chr(10), 'g')
                ELSE regexp_replace(text, ' the ', chr(10) || '- ', 'g')
           END AS text
    FROM documents
), t AS (
    SELECT doc_id, text, {_TOKS} AS toks,
           string_split(coalesce(text, ''), chr(10)) AS lines
    FROM ml
), m AS (
    SELECT doc_id,
           len(toks) AS word_count,
           CASE WHEN len(toks) > 0
                THEN ROUND(list_sum(list_transform(toks, x -> len(x)))::DOUBLE / len(toks), 6)
                ELSE 0.0 END AS mean_word_len,
           CASE WHEN len(toks) > 0
                THEN ROUND(len(regexp_extract_all(coalesce(text, ''), '#|\\.\\.\\.|…'))::DOUBLE / len(toks), 6)
                ELSE 0.0 END AS symbol_ratio,
           CASE WHEN len(toks) > 0
                THEN ROUND(len(list_filter(toks, x -> regexp_matches(x, '[a-z]')))::DOUBLE / len(toks), 6)
                ELSE 0.0 END AS alpha_frac,
           len(list_intersect(list_distinct(toks),
               ['the','be','to','of','and','that','have','with']))::INT AS n_stop_words,
           len(lines)::INT AS n_lines,
           CASE WHEN len(lines) > 0
                THEN ROUND(len(list_filter(lines, x -> regexp_matches(x, '^\\s*[-*•]')))::DOUBLE / len(lines), 6)
                ELSE 0.0 END AS bullet_line_frac,
           CASE WHEN len(lines) > 0
                THEN ROUND(len(list_filter(lines, x -> regexp_matches(x, '(\\.\\.\\.|…)\\s*$')))::DOUBLE / len(lines), 6)
                ELSE 0.0 END AS ellipsis_line_frac
    FROM t
)
SELECT doc_id, word_count, mean_word_len, alpha_frac, n_stop_words,
       n_lines, bullet_line_frac, ellipsis_line_frac,
       (bullet_line_frac <= 0.9) AS ok_bullet_lines,
       (ellipsis_line_frac <= 0.3) AS ok_ellipsis_lines,
       (word_count BETWEEN 50 AND 100000)
       AND (mean_word_len BETWEEN 3.0 AND 10.0)
       AND (symbol_ratio <= 0.1)
       AND (alpha_frac >= 0.8)
       AND (n_stop_words >= 2)
       AND (bullet_line_frac <= 0.9)
       AND (ellipsis_line_frac <= 0.3) AS passes
FROM m
ORDER BY doc_id
"""

# docs_curation_report: per-source ingest dashboard — every metric
# reuses a registered gate's exact expressions (md5 dedup key, gopher
# flags, composite quality, whitespace tokens)
ORACLES["docs_curation_report"] = f"""
WITH per_doc AS (
    SELECT source,
           md5(lower(trim(coalesce(text, '')))) AS h,
           (len({_TOKS}) BETWEEN 50 AND 100000)
           AND (CASE WHEN len({_TOKS}) > 0
                THEN ROUND(list_sum(list_transform({_TOKS}, x -> len(x)))::DOUBLE / len({_TOKS}), 6)
                ELSE 0.0 END BETWEEN 3.0 AND 10.0)
           AND (CASE WHEN len({_TOKS}) > 0
                THEN ROUND(len(regexp_extract_all(coalesce(text, ''), '#|\\.\\.\\.|…'))::DOUBLE / len({_TOKS}), 6)
                ELSE 0.0 END <= 0.1)
           AND (CASE WHEN len({_TOKS}) > 0
                THEN ROUND(len(list_filter({_TOKS}, x -> regexp_matches(x, '[a-z]')))::DOUBLE / len({_TOKS}), 6)
                ELSE 0.0 END >= 0.8)
           AND (len(list_intersect(list_distinct({_TOKS}),
                ['the','be','to','of','and','that','have','with'])) >= 2) AS gpass,
           ROUND(
             least(length(coalesce(text,'')) / 500.0, 1.0) * 0.5
             + (CASE WHEN
                  length(regexp_replace(coalesce(text,''), '\\s+', '', 'g'))
                    / greatest(len(string_split_regex(lower(trim(coalesce(text,''))), '\\s+')), 1)
                  BETWEEN 3 AND 10
                THEN 1.0 ELSE 0.5 END) * 0.3
             + (1 - (length(coalesce(text,''))
                     - length(regexp_replace(coalesce(text,''), '[^\\w\\s]', '', 'g')))
                    / greatest(length(coalesce(text,'')), 1)) * 0.2
           , 6) AS q,
           len({_TOKS}) AS t
    FROM documents
)
SELECT source,
       COUNT(*)::BIGINT AS n_docs,
       (COUNT(*) - COUNT(DISTINCT h))::BIGINT AS n_exact_dups,
       SUM(gpass::INT)::BIGINT AS n_gopher_pass,
       ROUND(AVG(q), 6) AS mean_quality,
       SUM(t)::BIGINT AS total_tokens
FROM per_doc
GROUP BY source
ORDER BY source
"""

# docs_mixture_solver: capped-waterfilling target mixture — generated
# round chain (operators/sampling.py:build_mixture_rates_sql) over the
# SHARED target constant, so query and oracle can never drift
from social_media_data_pipeline_spark.operators.sampling import (  # noqa: E402
    DOC_MIXTURE_BUDGET as _MIX_BUDGET,
)
from social_media_data_pipeline_spark.operators.sampling import (  # noqa: E402
    DOC_MIXTURE_TARGETS as _MIX_TARGETS,
)
from social_media_data_pipeline_spark.operators.sampling import (  # noqa: E402
    build_mixture_rates_sql as _mix_sql,
)

ORACLES["docs_mixture_solver"] = _mix_sql(
    {g: int(round(t * 1_000_000)) for g, t in _MIX_TARGETS.items()},
    _MIX_BUDGET,
    n_rounds=20,
) + """
SELECT d.doc_id, d.source
FROM documents d JOIN rates ON rates.grp = d.source
WHERE ('0x' || substr(md5('target-mix-v1:' || d.doc_id), 1, 8))::BIGINT % 1000000
      < rates.rate
ORDER BY d.doc_id
"""

# r8: production-shaped batched BPE — 80 merges, multi-round certified
# (same sequential replay chain; the Spark side runs bpe_train_batched
# with a truncated head, so the differential gate proves the batched
# trainer identical across 9-14 recollection rounds on real data)
ORACLES["docs_bpe_merges_80"] = _bpe_oracle(80)

# graph_triangles: degree-ordered-orientation triangle counting over
# the support-2 part co-purchase graph — exact integer counts, every
# join hash-equi; the row comparison (d, id) < (d, id) is written as
# the explicit boolean so Spark and DuckDB evaluate the identical
# predicate.
ORACLES["graph_triangles"] = """
WITH pairs AS (
    SELECT x.l_partkey AS pa, y.l_partkey AS pb, COUNT(*) AS sup
    FROM lineitem x JOIN lineitem y
      ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
    GROUP BY 1, 2
), und AS (
    SELECT pa AS a, pb AS b FROM pairs WHERE sup >= 2
), deg AS (
    SELECT node, COUNT(*)::BIGINT AS d FROM (
        SELECT a AS node FROM und UNION ALL SELECT b FROM und
    ) GROUP BY node
), ore AS (
    SELECT CASE WHEN da.d < db.d OR (da.d = db.d AND u.a < u.b)
                THEN u.a ELSE u.b END AS u,
           CASE WHEN da.d < db.d OR (da.d = db.d AND u.a < u.b)
                THEN u.b ELSE u.a END AS v,
           CASE WHEN da.d < db.d OR (da.d = db.d AND u.a < u.b)
                THEN db.d ELSE da.d END AS dv
    FROM und u
    JOIN deg da ON da.node = u.a
    JOIN deg db ON db.node = u.b
), wed AS (
    SELECT e1.u, e1.v AS v1, e2.v AS v2
    FROM ore e1 JOIN ore e2 ON e1.u = e2.u
    WHERE e1.dv < e2.dv OR (e1.dv = e2.dv AND e1.v < e2.v)
), tri AS (
    SELECT w.u, w.v1, w.v2
    FROM wed w JOIN ore c ON c.u = w.v1 AND c.v = w.v2
)
SELECT node, COUNT(*)::BIGINT AS tri_cnt
FROM (
    SELECT u AS node FROM tri
    UNION ALL SELECT v1 FROM tri
    UNION ALL SELECT v2 FROM tri
)
GROUP BY node
ORDER BY node
"""

# docs_ccnet_buckets: CCNet per-language quality terciles over the
# corpus's own interpolated bigram LM (the docs_bigram_logprob chain),
# thresholds picked from the distinct-(lang, score) value table — the
# identical aggregate-over-aggregate the Spark side runs, never a
# per-document ntile.
ORACLES["docs_ccnet_buckets"] = f"""
WITH base AS (
    SELECT doc_id, {_TOKS} AS toks FROM documents
), trans AS (
    SELECT doc_id,
           unnest(toks[1:len(toks) - 1]) AS a,
           unnest(toks[2:len(toks)]) AS b
    FROM base WHERE len(toks) >= 2
), big AS (
    SELECT a, b, COUNT(*)::DOUBLE AS c_ab FROM trans GROUP BY a, b
), ctx AS (
    SELECT a, COUNT(*)::DOUBLE AS c_a FROM trans GROUP BY a
), uni AS (
    SELECT t, COUNT(*)::DOUBLE AS c_t
    FROM (SELECT unnest(toks) AS t FROM base) GROUP BY t
), scalars AS (
    SELECT SUM(c_t) AS n_total, COUNT(*)::DOUBLE AS v_size FROM uni
), scores AS (
    SELECT doc_id,
           ROUND(AVG(ln(0.7 * c_ab / c_a
                        + (1.0 - 0.7) * (c_t + 0.5)
                          / (n_total + 0.5 * v_size))),
                 4) AS s
    FROM trans
    JOIN big USING (a, b)
    JOIN ctx USING (a)
    JOIN uni ON uni.t = trans.b
    CROSS JOIN scalars
    GROUP BY doc_id
), sl AS (
    SELECT d.doc_id, d.lang,
           CAST(ROUND(s * 10000) AS BIGINT) AS lm_score_q
    FROM scores JOIN documents d USING (doc_id)
), vc AS (
    SELECT lang, lm_score_q, COUNT(*)::BIGINT AS cnt FROM sl GROUP BY 1, 2
), nl AS (
    SELECT lang, SUM(cnt)::BIGINT AS n FROM vc GROUP BY lang
), cum AS (
    SELECT lang, lm_score_q,
           SUM(cnt) OVER (PARTITION BY lang ORDER BY lm_score_q DESC) AS cum
    FROM vc
), th AS (
    SELECT c.lang,
           MAX(CASE WHEN cum >= (n + 2) // 3 THEN lm_score_q END) AS t_head,
           MAX(CASE WHEN cum >= (2 * n + 2) // 3 THEN lm_score_q END) AS t_mid
    FROM cum c JOIN nl USING (lang)
    GROUP BY c.lang
)
SELECT s.doc_id, s.lang, s.lm_score_q,
       CASE WHEN s.lm_score_q >= t_head THEN 'head'
            WHEN s.lm_score_q >= t_mid THEN 'middle'
            ELSE 'tail' END AS bucket
FROM sl s JOIN th USING (lang)
ORDER BY s.doc_id
"""

# docs_contamination_frac: exact eval-overlap fraction over DISTINCT
# 8-token window hashes; the eval split is the deterministic 5%
# md5-bucket sample (same md5→BIGINT convention as docs_split).
ORACLES["docs_contamination_frac"] = f"""
WITH tagged AS (
    SELECT doc_id, text,
           ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 20 AS bkt
    FROM documents
), toks AS (
    SELECT doc_id, bkt, string_split({_NORM}, ' ') AS t FROM tagged
), wins AS (
    SELECT DISTINCT doc_id, bkt,
           md5(array_to_string(t[i:i+7], ' ')) AS h
    FROM toks, unnest(generate_series(1, len(t) - 7)) AS u(i)
    WHERE len(t) >= 8
), ev AS (
    SELECT DISTINCT h FROM wins WHERE bkt = 0
)
SELECT w.doc_id,
       COUNT(*)::BIGINT AS n_grams,
       SUM(CASE WHEN ev.h IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_hit,
       ROUND(SUM(CASE WHEN ev.h IS NOT NULL THEN 1 ELSE 0 END)
             / COUNT(*), 6) AS contamination_frac
FROM wins w LEFT JOIN ev ON ev.h = w.h
WHERE w.bkt != 0
GROUP BY w.doc_id
ORDER BY w.doc_id
"""

# docs_oov_rate: per-source OOV against the deterministic global
# top-1000 vocabulary (count DESC, token ASC tie-break — both engines
# compute the identical set); (source, token) counts aggregated before
# the vocab join, mirroring the Spark plan.
ORACLES["docs_oov_rate"] = f"""
WITH gt AS (
    SELECT source AS g, t, COUNT(*)::BIGINT AS c
    FROM (SELECT source, unnest({_TOKS}) AS t FROM documents)
    GROUP BY 1, 2
), vocab AS (
    SELECT t FROM (
        SELECT t, SUM(c) AS n FROM gt GROUP BY t
        ORDER BY n DESC, t LIMIT 1000
    )
)
SELECT gt.g AS source,
       SUM(c)::BIGINT AS n_tokens,
       SUM(CASE WHEN v.t IS NULL THEN c ELSE 0 END)::BIGINT AS n_oov_tokens,
       ROUND(SUM(CASE WHEN v.t IS NULL THEN c ELSE 0 END) / SUM(c), 6)
           AS oov_rate,
       COUNT(*)::BIGINT AS n_types,
       SUM(CASE WHEN v.t IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_oov_types
FROM gt LEFT JOIN vocab v ON v.t = gt.t
GROUP BY gt.g
ORDER BY source
"""

# docs_decontaminate_spans: contaminated-position islands — training
# windows semi-joined against the eval split's distinct gram set, then
# the duplicate_spans gaps-and-islands merge (row_number per doc over
# unique positions → deterministic).
ORACLES["docs_decontaminate_spans"] = f"""
WITH tagged AS (
    SELECT doc_id, text,
           ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 20
               AS bkt
    FROM documents
), toks AS (
    SELECT doc_id, bkt, string_split({_NORM}, ' ') AS t FROM tagged
), wins AS (
    SELECT doc_id, bkt, i - 1 AS pos,
           md5(array_to_string(t[i:i+3], ' ')) AS h
    FROM toks, unnest(generate_series(1, len(t) - 3)) AS u(i)
    WHERE len(t) >= 4
), ev AS (
    SELECT DISTINCT h FROM wins WHERE bkt = 0
), marked AS (
    SELECT w.doc_id, w.pos
    FROM wins w JOIN ev USING (h)
    WHERE w.bkt != 0
), isl AS (
    SELECT doc_id, pos,
           pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
    FROM marked
)
SELECT doc_id,
       MIN(pos) AS span_start,
       MAX(pos) + 3 AS span_end,
       COUNT(*)::BIGINT AS n_windows
FROM isl
GROUP BY doc_id, grp
ORDER BY doc_id, span_start
"""

# graph_kcore: bounded-round peeling to the 2-core of the support-2
# part co-purchase graph (functions/graph.py:build_kcore_sql) — the
# 10-round unroll is a replay bound (convergence measured at 1/3/6
# rounds across sf0.001/0.01/0.1; extra rounds are identity), so the
# fixed chain equals Spark's early-stopped run exactly.
from social_media_data_pipeline_spark.functions.graph import (  # noqa: E402
    build_kcore_sql as _kcore_sql,
)

# graph_ktruss (r10): 6 unrolled triangle-support peel rounds over the
# same co-purchase edge CTE (fixpoint measured at 2 rounds everywhere;
# extras are identity) + the fixpoint support witness
from social_media_data_pipeline_spark.functions.graph import (
    build_ktruss_sql as _ktruss_sql,
)

ORACLES["graph_ktruss"] = _ktruss_sql(
    """
    SELECT pa AS src, pb AS dst FROM (
        SELECT x.l_partkey AS pa, y.l_partkey AS pb, COUNT(*) AS sup
        FROM lineitem x JOIN lineitem y
          ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
        GROUP BY 1, 2
    ) WHERE sup >= 2
    """,
    k=3,
    rounds=6,
)

ORACLES["graph_kcore"] = _kcore_sql(
    """
    SELECT pa AS src, pb AS dst FROM (
        SELECT x.l_partkey AS pa, y.l_partkey AS pb, COUNT(*) AS sup
        FROM lineitem x JOIN lineitem y
          ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
        GROUP BY 1, 2
    ) WHERE sup >= 2""",
    k=2,
    rounds=10,
) + """
SELECT node, COUNT(*)::BIGINT AS deg FROM (
    SELECT a AS node FROM e10 UNION ALL SELECT b FROM e10
) GROUP BY node ORDER BY node"""


# docs_pack_bfd: best-fit-decreasing whole-document packing replayed
# exactly — a RECURSIVE CTE walks each shard's (n_tokens DESC, id)
# order one document per step, carrying the open-bin list
# STRUCT(rem, b)[] as per-shard state; best fit = list-min (rem, b)
# among bins with rem >= size (the same (remaining, bin_id) bisect
# order as operators/packing.py:pack_bestfit), full bins drop out,
# oversize docs take a dedicated flagged bin. Every (doc -> bin)
# decision is checked, not just fills.
_BFD_B, _BFD_S = 512, 4
# shared recursive replay of the per-shard BFD state machine; the two
# registered queries (placements; per-shard waste stats) select from it
_BFD_CTE = f"""
WITH RECURSIVE sized AS (
  SELECT doc_id AS id,
         GREATEST(1, n_chars // 4)::BIGINT AS n_tokens,
         (('0x' || substr(md5('bestfit-v1' || '|' || doc_id::VARCHAR), 1, 15))::BIGINT
            % {_BFD_S}) AS shard
  FROM documents
),
ordered AS (
  SELECT *, row_number() OVER (PARTITION BY shard ORDER BY n_tokens DESC, id ASC) AS idx
  FROM sized
),
st AS (
  SELECT shard, 0::BIGINT AS idx,
         CAST([] AS STRUCT(rem BIGINT, b BIGINT)[]) AS bins,
         0::BIGINT AS next_bin,
         NULL::BIGINT AS p_id, NULL::BIGINT AS p_tokens,
         NULL::BIGINT AS p_bin, NULL::BOOLEAN AS p_over
  FROM (SELECT DISTINCT shard FROM ordered)
  UNION ALL
  SELECT s.shard, s.idx + 1,
    CASE
      WHEN d.n_tokens > {_BFD_B} THEN s.bins
      WHEN len(list_filter(s.bins, x -> x.rem >= d.n_tokens)) = 0 THEN
        CASE WHEN {_BFD_B} - d.n_tokens > 0
             THEN list_append(s.bins, {{'rem': {_BFD_B} - d.n_tokens, 'b': s.next_bin}})
             ELSE s.bins END
      ELSE
        list_concat(
          list_filter(s.bins,
                      x -> x.b != list_sort(list_filter(s.bins, y -> y.rem >= d.n_tokens))[1].b),
          CASE WHEN list_sort(list_filter(s.bins, y -> y.rem >= d.n_tokens))[1].rem
                      - d.n_tokens > 0
               THEN [{{'rem': list_sort(list_filter(s.bins, y -> y.rem >= d.n_tokens))[1].rem
                               - d.n_tokens,
                       'b':   list_sort(list_filter(s.bins, y -> y.rem >= d.n_tokens))[1].b}}]
               ELSE CAST([] AS STRUCT(rem BIGINT, b BIGINT)[]) END)
    END AS bins,
    CASE WHEN d.n_tokens > {_BFD_B}
              OR len(list_filter(s.bins, x -> x.rem >= d.n_tokens)) = 0
         THEN s.next_bin + 1 ELSE s.next_bin END AS next_bin,
    d.id, d.n_tokens,
    CASE WHEN d.n_tokens > {_BFD_B}
              OR len(list_filter(s.bins, x -> x.rem >= d.n_tokens)) = 0
         THEN s.next_bin
         ELSE list_sort(list_filter(s.bins, y -> y.rem >= d.n_tokens))[1].b END AS p_bin,
    (d.n_tokens > {_BFD_B}) AS p_over
  FROM st s JOIN ordered d ON d.shard = s.shard AND d.idx = s.idx + 1
)"""

ORACLES["docs_pack_bfd"] = _BFD_CTE + """
SELECT p_id AS doc_id, p_tokens AS n_tokens, shard, p_bin AS bin_id, p_over AS oversize
FROM st WHERE idx > 0 ORDER BY doc_id"""

# docs_pack_bfd_stats: the packing-efficiency dashboard over the SAME
# replayed placements — bins used, docs, token totals, waste fraction
# (1 - fill/capacity over non-oversize bins), per shard.
ORACLES["docs_pack_bfd_stats"] = _BFD_CTE + f"""
SELECT shard,
       count(*)::BIGINT AS n_docs,
       sum(p_tokens)::BIGINT AS total_tokens,
       count(DISTINCT CASE WHEN NOT p_over THEN p_bin END)::BIGINT AS bins_used,
       sum(CASE WHEN p_over THEN 1 ELSE 0 END)::BIGINT AS n_oversize,
       sum(CASE WHEN NOT p_over THEN p_tokens ELSE 0 END)::BIGINT AS packed_tokens,
       CASE WHEN count(DISTINCT CASE WHEN NOT p_over THEN p_bin END) > 0
            THEN round(1.0 - sum(CASE WHEN NOT p_over THEN p_tokens ELSE 0 END)
                             / (count(DISTINCT CASE WHEN NOT p_over THEN p_bin END) * {_BFD_B}.0),
                       6)
            ELSE 0.0 END AS waste_frac
FROM st WHERE idx > 0
GROUP BY shard ORDER BY shard"""


# events_salted_join: the salted/hybrid join must be RESULT-IDENTICAL
# to the plain equi join — the oracle is exactly that plain join, so
# any row lost or duplicated by the salting machinery (the production
# hazard of rand() salts) hash-mismatches immediately.
ORACLES["events_salted_join"] = """
SELECT e.event_id, e.user_id, c.c_mktsegment AS segment, e.value
FROM events e JOIN customer c ON e.user_id = c.c_custkey
ORDER BY e.event_id"""


# orders_join_size_est: correlated-sampling join-size estimate — the
# same 60-bit md5 threshold keeps the same ~1/8 of DISTINCT keys on
# both sides; exact per-key counts for sampled keys; estimate =
# inv_rate x sum of count products. Integer end-to-end; the exact join
# size rides along for calibration.
ORACLES["orders_join_size_est"] = """
WITH sa AS (
    SELECT o_orderkey AS key, count(*)::BIGINT AS n
    FROM orders
    WHERE ('0x' || substr(md5(o_orderkey::VARCHAR), 1, 15))::BIGINT
          < 144115188075855872
    GROUP BY 1
), sb AS (
    SELECT l_orderkey AS key, count(*)::BIGINT AS n
    FROM lineitem
    WHERE ('0x' || substr(md5(l_orderkey::VARCHAR), 1, 15))::BIGINT
          < 144115188075855872
    GROUP BY 1
), est AS (
    SELECT count(*)::BIGINT AS sampled_keys,
           (coalesce(sum(sa.n * sb.n), 0) * 8)::BIGINT AS est_pairs
    FROM sa JOIN sb USING (key)
), ex AS (
    SELECT count(*)::BIGINT AS exact_pairs
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
)
SELECT est.sampled_keys, est.est_pairs, ex.exact_pairs FROM est, ex"""


# embedding_balanced_sample: trained-cell cluster cap — k-means replay
# chain + broadcast-argmax assignment (the ivf_topk_trained pattern) +
# the md5-keyed deterministic per-cluster QUALIFY cap (the
# sample_per_year pattern). Balanced topic coverage without a
# similarity join.
ORACLES["embedding_balanced_sample"] = _kmeans_cent_cte(iters=5) + f""", vv AS (
    SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings
), assigned AS (
    SELECT vec_id, centroid_id AS cluster
    FROM vv, cent
    QUALIFY row_number() OVER (
        PARTITION BY vec_id ORDER BY {_cos('vec', 'c_vec')} DESC, centroid_id ASC
    ) = 1
)
SELECT vec_id, cluster
FROM assigned
QUALIFY row_number() OVER (
    PARTITION BY cluster
    ORDER BY md5(concat_ws('|', 'balanced-v1', vec_id::VARCHAR)), vec_id
) <= 5
ORDER BY vec_id"""


# graph_lpa: 4-round synchronous label propagation (self-vote
# stabilized) on the support-2 co-purchase graph — the chain unrolls
# exactly the registered round count (rounds is NOT a replay bound for
# LPA; Spark early-stops only on true fixpoints, where extra rounds
# are identity).
from social_media_data_pipeline_spark.functions.graph import (  # noqa: E402
    build_lpa_sql as _lpa_sql,
)

ORACLES["graph_lpa"] = _lpa_sql(
    """
    SELECT pa AS src, pb AS dst FROM (
        SELECT x.l_partkey AS pa, y.l_partkey AS pb, COUNT(*) AS sup
        FROM lineitem x JOIN lineitem y
          ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
        GROUP BY 1, 2
    ) WHERE sup >= 2""",
    rounds=4,
) + "SELECT node, label FROM l4 ORDER BY node"


# events_winsorized: exact per-type [p01, p99] clip — Spark
# `percentile` and DuckDB `quantile_cont` interpolate identically on
# the same doubles (verified bit-equal), so the clip comparisons and
# the micro-unit sums replay exactly.
ORACLES["events_winsorized"] = """
WITH q AS (
    SELECT event_type,
           quantile_cont(value, 0.01) AS q_lo_raw,
           quantile_cont(value, 0.99) AS q_hi_raw
    FROM events GROUP BY event_type
)
SELECT e.event_type,
       round(min(q.q_lo_raw), 6) AS q_lo,
       round(max(q.q_hi_raw), 6) AS q_hi,
       sum(CASE WHEN e.value < q.q_lo_raw THEN 1 ELSE 0 END)::BIGINT AS n_low,
       sum(CASE WHEN e.value > q.q_hi_raw THEN 1 ELSE 0 END)::BIGINT AS n_high,
       sum(round(least(greatest(e.value, q.q_lo_raw), q.q_hi_raw) * 1000000))::BIGINT
           AS sum_w_micro,
       count(*)::BIGINT AS n
FROM events e JOIN q USING (event_type)
GROUP BY e.event_type ORDER BY e.event_type"""


# events_robust_anomalies: modified z-score outlier flags — median and
# MAD via quantile_cont (bit-equal to Spark percentile), the flag a
# division-free float comparison with the same literals.
ORACLES["events_robust_anomalies"] = """
WITH m AS (
    SELECT event_type, quantile_cont(value, 0.5) AS med
    FROM events GROUP BY event_type
), d AS (
    SELECT e.event_type, e.value, m.med, abs(e.value - m.med) AS dev
    FROM events e JOIN m USING (event_type)
), s AS (
    SELECT event_type, quantile_cont(dev, 0.5) AS mad
    FROM d GROUP BY event_type
)
SELECT d.event_type,
       round(min(d.med), 6) AS med,
       round(min(s.mad), 6) AS mad,
       sum(CASE WHEN d.dev > 3.5 * 1.4826 * s.mad THEN 1 ELSE 0 END)::BIGINT
           AS n_anom,
       count(*)::BIGINT AS n
FROM d JOIN s USING (event_type)
GROUP BY d.event_type ORDER BY d.event_type"""


# events_decayed_engagement: stepped half-life decay — 0.5^n is a
# dyadic rational, bit-exact in IEEE doubles on both engines, so the
# float product value * decay replays exactly (per-value round-then-sum
# micro units, the registry convention).
ORACLES["events_decayed_engagement"] = """
SELECT user_id, event_type,
       sum(round(value * power(0.5, floor(datediff('day', ts::DATE, DATE '2024-02-01') / 7.0)) * 1000000))::BIGINT
           AS decayed_micro,
       count(*)::BIGINT AS n
FROM events
WHERE datediff('day', ts::DATE, DATE '2024-02-01') >= 0
GROUP BY user_id, event_type
ORDER BY user_id, event_type"""


# graph_pagerank_weighted: co-purchase strength as edge weight —
# contribution rank*85*w // (100*W(u)), still exact integer micro
# units; the symmetric doubled edge list mirrors the Spark side.
from social_media_data_pipeline_spark.functions.graph import (  # noqa: E402
    build_pagerank_sql as _prw_sql,
)

ORACLES["graph_pagerank_weighted"] = _prw_sql(
    """
    SELECT src, dst, sup AS w FROM (
        SELECT pa AS src, pb AS dst, sup FROM (
            SELECT x.l_partkey AS pa, y.l_partkey AS pb, COUNT(*) AS sup
            FROM lineitem x JOIN lineitem y
              ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
            GROUP BY 1, 2
        ) WHERE sup >= 2
        UNION ALL
        SELECT pb, pa, sup FROM (
            SELECT x.l_partkey AS pa, y.l_partkey AS pb, COUNT(*) AS sup
            FROM lineitem x JOIN lineitem y
              ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
            GROUP BY 1, 2
        ) WHERE sup >= 2
    )""",
    iters=5,
    weighted=True,
) + "SELECT node, rank_micro FROM r5 ORDER BY node"


# r9 train-once/search-many lifecycle: the persisted-centroid queries
# have IDENTICAL result semantics to their full-cycle siblings — the
# artifact cache returns bit-identical centroids to a fresh train
# (deterministic seeded k-means), so the oracles are the same replayed
# train+search chains; a stale/corrupt artifact would hash-mismatch
# here, which is exactly the regression this aliasing is meant to catch.
ORACLES["embedding_ivf_search_persisted"] = ORACLES[
    "embedding_ivf_multiprobe_trained"
]
ORACLES["embedding_balanced_sample_persisted"] = ORACLES[
    "embedding_balanced_sample"
]


# The symmetric support-weighted co-purchase edge list shared by the
# r9 graph additions (same construction as graph_pagerank_weighted).
_COPURCHASE_SYM_W = """
    SELECT src, dst, sup AS w FROM (
        SELECT pa AS src, pb AS dst, sup FROM (
            SELECT x.l_partkey AS pa, y.l_partkey AS pb, COUNT(*) AS sup
            FROM lineitem x JOIN lineitem y
              ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
            GROUP BY 1, 2
        ) WHERE sup >= 2
        UNION ALL
        SELECT pb, pa, sup FROM (
            SELECT x.l_partkey AS pa, y.l_partkey AS pb, COUNT(*) AS sup
            FROM lineitem x JOIN lineitem y
              ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
            GROUP BY 1, 2
        ) WHERE sup >= 2
    )"""

# graph_ppr: personalized PageRank from Brand#11's parts — the
# generated WITH-chain replays the seed-scaled integer update
# bit-for-bit (restart mass only to seeds, weighted contributions
# rank*85*w // (100*W(u))); the touched-set filter mirrors the
# operator's rank_micro > 0 output contract.
from social_media_data_pipeline_spark.functions.graph import (  # noqa: E402
    build_ppr_sql as _ppr_sql,
)

ORACLES["graph_ppr"] = _ppr_sql(
    _COPURCHASE_SYM_W,
    "SELECT p_partkey AS node FROM part WHERE p_brand = 'Brand#11'",
    iters=4,
    weighted=True,
) + "SELECT node, rank_micro FROM r4 WHERE rank_micro > 0 ORDER BY node"


# graph_link_predict: RA/CN/Jaccard link prediction — every score is
# integer-exact (1000000 // deg per RA term, (cn*1e6) // (d1+d2-cn)),
# so the mirror is direct SQL over the same undirected dedup.
ORACLES["graph_link_predict"] = f"""
WITH rawe AS (
    SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
    FROM ({_COPURCHASE_SYM_W}) WHERE src <> dst
), adj AS (
    SELECT a AS w, b AS n FROM rawe UNION ALL SELECT b, a FROM rawe
), deg AS (
    SELECT w AS node, COUNT(*) AS d FROM adj GROUP BY w
), wed AS (
    SELECT x.n AS n1, y.n AS n2, x.w
    FROM adj x JOIN adj y ON x.w = y.w AND x.n < y.n
), sc AS (
    SELECT n1, n2, COUNT(*)::BIGINT AS cn,
           SUM(1000000 // deg.d)::BIGINT AS ra_micro
    FROM wed JOIN deg ON deg.node = wed.w
    GROUP BY n1, n2 HAVING COUNT(*) >= 1
), nonadj AS (
    SELECT sc.* FROM sc
    LEFT JOIN rawe r ON r.a = sc.n1 AND r.b = sc.n2
    WHERE r.a IS NULL
)
SELECT n1, n2, cn, ra_micro,
       ((cn * 1000000) // (d1.d + d2.d - cn))::BIGINT AS jaccard_micro
FROM nonadj
JOIN deg d1 ON d1.node = n1
JOIN deg d2 ON d2.node = n2
ORDER BY n1, n2"""


# docs_setsim_prefix: the oracle computes the exact Jaccard-pair RESULT
# directly (inverted-index join, no pruning) — the prefix filter is a
# candidate-generation mechanism whose whole claim is that it changes
# nothing about the result; any lost pair hash-mismatches here.
ORACLES["docs_setsim_prefix"] = f"""
WITH sh AS (
    SELECT DISTINCT doc_id AS doc, unnest({_SHINGLES}) AS shingle FROM documents
), sizes AS (
    SELECT doc, COUNT(*) AS n_shingles FROM sh GROUP BY doc
), common AS (
    SELECT a.doc AS id_a, b.doc AS id_b, COUNT(*) AS common
    FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc < b.doc
    GROUP BY a.doc, b.doc
)
SELECT id_a, id_b,
       ROUND(common / (sa.n_shingles + sb.n_shingles - common), 6) AS jaccard
FROM common
JOIN sizes sa ON sa.doc = id_a
JOIN sizes sb ON sb.doc = id_b
WHERE ROUND(common / (sa.n_shingles + sb.n_shingles - common), 6) >= 0.6
ORDER BY id_a, id_b
"""


# events_drift_scores (r10): per-(type, day) L1 histogram drift vs the
# cumulative prior-days baseline — integer cross-multiplied numerator,
# one float division per day, bins present only in the baseline folded
# in via the running totals (no dense bin grid).
ORACLES["events_drift_scores"] = """
WITH counts AS (
    SELECT event_type, CAST(ts AS DATE) AS day,
           CAST(FLOOR(value / 10.0) AS BIGINT) AS bin, COUNT(*) AS c
    FROM events GROUP BY 1, 2, 3
), wb AS (
    SELECT *, COALESCE(SUM(c) OVER (
        PARTITION BY event_type, bin ORDER BY day
        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS b
    FROM counts
), dt AS (
    SELECT event_type, day, CAST(SUM(c) AS BIGINT) AS n_day
    FROM counts GROUP BY 1, 2
), dt2 AS (
    SELECT *, CAST(COALESCE(SUM(n_day) OVER (
        PARTITION BY event_type ORDER BY day
        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        AS n_base
    FROM dt
), per AS (
    SELECT wb.event_type, wb.day, dt2.n_day, dt2.n_base,
           SUM(ABS(wb.c * dt2.n_base - wb.b * dt2.n_day)) AS present,
           SUM(wb.b) AS b_present
    FROM wb JOIN dt2 ON wb.event_type = dt2.event_type AND wb.day = dt2.day
    GROUP BY 1, 2, 3, 4
)
SELECT event_type, day::TIMESTAMP AS day, n_day, n_base,
       ROUND((present + (n_base - b_present) * n_day)
             / (n_day * n_base), 6) AS l1_drift
FROM per
WHERE n_base > 0
ORDER BY event_type, day
"""

# minhash_band_plan (r10): the planner's twin SQL — identical VALUES
# grid, identical binary-exponentiation probability expression (no
# POW(): implementations differ in the last ulp across engines).
from social_media_data_pipeline_spark.functions.sketches import (
    build_lsh_band_plan_sql as _band_plan_sql,
)

ORACLES["minhash_band_plan"] = _band_plan_sql()

# docs_blocking_quality (r10): truth = exact all-pairs Jaccard >= 0.6;
# LSH candidates = the banding replay (the dedup_clusters chain); SNM
# candidates = the global ROW_NUMBER rank-distance join; then counts
# + the same rounded ratios.
ORACLES["docs_blocking_quality"] = f"""
WITH sh AS (
    SELECT DISTINCT doc_id AS doc, unnest({_SHINGLES}) AS shingle FROM documents
), sizes AS (
    SELECT doc, COUNT(*) AS n_shingles FROM sh GROUP BY doc
), common AS (
    SELECT a.doc AS id_a, b.doc AS id_b, COUNT(*) AS common
    FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc < b.doc
    GROUP BY a.doc, b.doc
), truth AS (
    SELECT id_a, id_b
    FROM common
    JOIN sizes sa ON sa.doc = id_a
    JOIN sizes sb ON sb.doc = id_b
    WHERE ROUND(common / (sa.n_shingles + sb.n_shingles - common), 6) >= 0.6
), sh_t AS (
    SELECT doc_id AS doc, {_SHINGLES} AS sh FROM documents
), sig_t AS (
    SELECT doc, {_MINHASH_SIG} AS sig FROM sh_t
), banded AS (
    SELECT doc, b.band_idx,
           md5(array_to_string(sig[b.band_idx*4+1 : b.band_idx*4+4], '|')) AS band_hash
    FROM sig_t, (SELECT unnest(generate_series(0, 3)) AS band_idx) b
), lsh AS (
    SELECT DISTINCT a.doc AS id_a, b.doc AS id_b
    FROM banded a JOIN banded b
      ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash AND a.doc < b.doc
), p AS (
    SELECT doc_id,
           ROW_NUMBER() OVER (ORDER BY substr({_NORM}, 1, 32), doc_id) AS pos
    FROM documents
), snm AS (
    SELECT a.doc_id AS id_a, b.doc_id AS id_b
    FROM p a JOIN p b ON b.pos > a.pos AND b.pos - a.pos <= 4
), nn AS (
    SELECT COUNT(*)::BIGINT AS n FROM documents
), stats AS (
    SELECT 'minhash_lsh' AS method,
           (SELECT COUNT(*) FROM lsh)::BIGINT AS n_candidates,
           (SELECT COUNT(*) FROM truth)::BIGINT AS n_true,
           (SELECT COUNT(*) FROM truth t
            JOIN lsh c ON t.id_a = c.id_a AND t.id_b = c.id_b)::BIGINT AS n_caught
    UNION ALL
    SELECT 'sorted_neighborhood',
           (SELECT COUNT(*) FROM snm)::BIGINT,
           (SELECT COUNT(*) FROM truth)::BIGINT,
           (SELECT COUNT(*) FROM truth t
            JOIN snm c ON t.id_a = c.id_a AND t.id_b = c.id_b)::BIGINT
)
SELECT method, n_candidates, n_true, n_caught,
       CASE WHEN n_true > 0
            THEN ROUND(n_caught / n_true::DOUBLE, 6)
            ELSE 1.0 END AS pair_completeness,
       ROUND(1.0 - n_candidates / (nn.n * (nn.n - 1) / 2.0), 6)
           AS reduction_ratio
FROM stats, nn
ORDER BY method
"""

# docs_blocking_quality_sampled (r11): the 100 TB shape — the same
# truth/banding/SNM chains over a DETERMINISTIC md5 half-sample, plus
# normal-approximation binomial error bars on pair completeness. The
# CI is computed from the ROUNDED completeness (the value the report
# shows), with the identical expression tree on both engines (sqrt is
# correctly rounded IEEE; no POW anywhere).
_BQ_R = "ROUND(n_caught / n_true::DOUBLE, 6)"
# Wilson interval pieces — z2 is an explicit double*double (a bare
# DuckDB decimal literal product would be decimal-exact and can differ
# from Spark's double fold in the last ulp)
_BQ_Z = "CAST(1.959964 AS DOUBLE)"
_BQ_Z2 = f"({_BQ_Z} * {_BQ_Z})"
_BQ_DENOM = f"(1.0 + {_BQ_Z2} / n_true)"
_BQ_CENTER = f"(({_BQ_R} + {_BQ_Z2} / (2.0 * n_true)) / {_BQ_DENOM})"
_BQ_HALF = (
    f"({_BQ_Z} * sqrt({_BQ_R} * (1.0 - {_BQ_R}) / n_true"
    f" + {_BQ_Z2} / (4.0 * n_true * n_true)) / {_BQ_DENOM})"
)
ORACLES["docs_blocking_quality_sampled"] = (
    ORACLES["docs_blocking_quality"]
    .replace("FROM documents", "FROM __bq_samp")
    .replace(
        "WITH sh AS",
        "WITH __bq_samp AS (\n"
        "    SELECT * FROM documents\n"
        "    WHERE ('0x' || substr(md5('bq-sample-v1:' || doc_id), 1, 8))"
        "::BIGINT % 2 = 0\n"
        "), sh AS",
        1,
    )
    .replace(
        "SELECT method, n_candidates, n_true, n_caught,",
        "SELECT method, nn.n AS n_sample, n_candidates, n_true, n_caught,",
    )
    .replace(
        "            ELSE 1.0 END AS pair_completeness,",
        f"""            ELSE 1.0 END AS pair_completeness,
       CASE WHEN n_true > 0
            THEN ROUND(GREATEST(0.0, {_BQ_CENTER} - {_BQ_HALF}), 6)
            ELSE 0.0 END AS pc_lo,
       CASE WHEN n_true > 0
            THEN ROUND(LEAST(1.0, {_BQ_CENTER} + {_BQ_HALF}), 6)
            ELSE 1.0 END AS pc_hi,""",
    )
)

# docs_blocking_quality_blocks (r11): per-BLOCK sampling — the keep
# decision hashes the normalized-text PREFIX so duplicate cliques
# survive whole (the honest shape for window-sensitive generators;
# per-doc thinning biases their completeness up). Same chains + Wilson
# interval over the block sample.
ORACLES["docs_blocking_quality_blocks"] = (
    ORACLES["docs_blocking_quality"]
    .replace("FROM documents", "FROM __bq_samp")
    .replace(
        "WITH sh AS",
        "WITH __bq_samp AS (\n"
        "    SELECT * FROM documents\n"
        "    WHERE ('0x' || substr(md5('bq-block-v1:' || substr("
        "lower(trim(regexp_replace(coalesce(text, ''), '\\s+', ' ', 'g')))"
        ", 1, 16)), 1, 8))::BIGINT % 2 = 0\n"
        "), sh AS",
        1,
    )
    .replace(
        "SELECT method, n_candidates, n_true, n_caught,",
        "SELECT method, nn.n AS n_sample, n_candidates, n_true, n_caught,",
    )
    .replace(
        "            ELSE 1.0 END AS pair_completeness,",
        f"""            ELSE 1.0 END AS pair_completeness,
       CASE WHEN n_true > 0
            THEN ROUND(GREATEST(0.0, {_BQ_CENTER} - {_BQ_HALF}), 6)
            ELSE 0.0 END AS pc_lo,
       CASE WHEN n_true > 0
            THEN ROUND(LEAST(1.0, {_BQ_CENTER} + {_BQ_HALF}), 6)
            ELSE 1.0 END AS pc_hi,""",
    )
)

# customer_k_anonymity (r10): one grouped count + count-distinct with
# threshold flags — the release-audit gate.
ORACLES["customer_k_anonymity"] = """
WITH b AS (
    SELECT c_nationkey, c_mktsegment,
           CASE WHEN c_acctbal < 0 THEN 'neg'
                WHEN c_acctbal < 5000 THEN 'low'
                ELSE 'high' END AS bal_bucket
    FROM customer
)
SELECT c_nationkey, c_mktsegment,
       COUNT(*) AS n_rows,
       COUNT(DISTINCT bal_bucket) AS n_sensitive_distinct,
       COUNT(*) >= 5 AS k_anonymous,
       COUNT(DISTINCT bal_bucket) >= 2 AS l_diverse
FROM b
GROUP BY c_nationkey, c_mktsegment
ORDER BY c_nationkey, c_mktsegment
"""

# docs_split_leakage (r10): exact all-pairs Jaccard >= 0.6 x the
# deterministic split CASE — pairs with exactly one train side,
# oriented train-first. A candidate the prefix filter loses, a wrong
# bucket, or a swapped orientation all hash-mismatch.
ORACLES["docs_split_leakage"] = f"""
WITH sh AS (
    SELECT DISTINCT doc_id AS doc, unnest({_SHINGLES}) AS shingle FROM documents
), sizes AS (
    SELECT doc, COUNT(*) AS n_shingles FROM sh GROUP BY doc
), common AS (
    SELECT a.doc AS id_a, b.doc AS id_b, COUNT(*) AS common
    FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc < b.doc
    GROUP BY a.doc, b.doc
), pairs AS (
    SELECT id_a, id_b,
           ROUND(common / (sa.n_shingles + sb.n_shingles - common), 6) AS jaccard
    FROM common
    JOIN sizes sa ON sa.doc = id_a
    JOIN sizes sb ON sb.doc = id_b
    WHERE ROUND(common / (sa.n_shingles + sb.n_shingles - common), 6) >= 0.6
), s AS (
    SELECT doc_id,
           CASE WHEN b < 80 THEN 'train'
                WHEN b < 90 THEN 'val'
                ELSE 'test' END AS split
    FROM (
        SELECT doc_id,
               ('0x' || substr(md5('split-v1:' || doc_id), 1, 8))::BIGINT % 100 AS b
        FROM documents
    )
)
SELECT CASE WHEN sa.split = 'train' THEN p.id_a ELSE p.id_b END AS train_id,
       CASE WHEN sa.split = 'train' THEN p.id_b ELSE p.id_a END AS holdout_id,
       CASE WHEN sa.split = 'train' THEN sb.split ELSE sa.split END AS holdout_split,
       p.jaccard
FROM pairs p
JOIN s sa ON sa.doc_id = p.id_a
JOIN s sb ON sb.doc_id = p.id_b
WHERE (sa.split = 'train') <> (sb.split = 'train')
ORDER BY train_id, holdout_id
"""

# docs_entity_resolution (r10 ER flagship): the full reachability
# recursion over the COMPLETE verified edge set — jp = exact-Jaccard
# pairs >= 0.6 (the prefix channel's lossless target), sp = sorted-
# neighborhood candidates (global ROW_NUMBER rank distance <= 4)
# verified by levenshtein <= 4 on the 32-char normalized keys. The
# Spark side unions the two generators and clusters through the
# INCREMENTAL maintenance path in 2 chunks, so this oracle tries the
# candidate completeness of both channels, both verifiers, AND the
# incremental ≡ full-recompute identity at once.
ORACLES["docs_entity_resolution"] = f"""
WITH RECURSIVE sh AS (
    SELECT DISTINCT doc_id AS doc, unnest({_SHINGLES}) AS shingle FROM documents
), sizes AS (
    SELECT doc, COUNT(*) AS n_shingles FROM sh GROUP BY doc
), common AS (
    SELECT a.doc AS id_a, b.doc AS id_b, COUNT(*) AS common
    FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc < b.doc
    GROUP BY a.doc, b.doc
), jp AS (
    SELECT id_a, id_b
    FROM common
    JOIN sizes sa ON sa.doc = id_a
    JOIN sizes sb ON sb.doc = id_b
    WHERE ROUND(common / (sa.n_shingles + sb.n_shingles - common), 6) >= 0.6
), p AS (
    SELECT doc_id, substr({_NORM}, 1, 32) AS k,
           ROW_NUMBER() OVER (ORDER BY substr({_NORM}, 1, 32), doc_id) AS pos
    FROM documents
), sp AS (
    SELECT a.doc_id AS id_a, b.doc_id AS id_b
    FROM p a JOIN p b ON b.pos > a.pos AND b.pos - a.pos <= 4
    WHERE levenshtein(a.k, b.k) <= 4
), edges AS (
    SELECT id_a, id_b FROM jp
    UNION
    SELECT id_a, id_b FROM sp
), sym AS (
    SELECT id_a AS a, id_b AS b FROM edges
    UNION
    SELECT id_b AS a, id_a AS b FROM edges
), reach AS (
    SELECT doc_id AS node, doc_id AS r FROM documents
    UNION
    SELECT s.a AS node, reach.r AS r FROM sym s JOIN reach ON s.b = reach.node
)
SELECT node AS doc_id, MIN(r) AS component, (node = MIN(r)) AS is_canonical
FROM reach
GROUP BY node
ORDER BY doc_id
"""

# docs_snm_pairs: sorted-neighborhood blocking — the oracle IS the
# definition (global ROW_NUMBER over (key-prefix, id) + rank-distance
# join), so the bucket-offset decomposition and the block-banded join
# are both on trial: one pair lost at a bucket or block boundary
# hash-mismatches.
ORACLES["docs_snm_pairs"] = f"""
WITH p AS (
    SELECT doc_id,
           ROW_NUMBER() OVER (ORDER BY substr({_NORM}, 1, 32), doc_id) AS pos
    FROM documents
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b, (b.pos - a.pos)::INT AS dist
FROM p a JOIN p b ON b.pos > a.pos AND b.pos - a.pos <= 4
ORDER BY id_a, id_b
"""

# docs_negative_pairs: the sampler replays exactly — md5 permutation
# rank, per-draw md5 index in [1, N-1], skip-self shift, index join.
ORACLES["docs_negative_pairs"] = """
WITH p AS (
    SELECT doc_id,
           (ROW_NUMBER() OVER (
               ORDER BY ('0x' || substr(md5('neg-v1:perm:' || doc_id), 1, 8))::BIGINT,
                        doc_id
           ))::BIGINT AS pos
    FROM documents
), n AS (
    SELECT COUNT(*) AS c FROM p
), d AS (
    SELECT p.doc_id AS anchor_id, p.pos, j.sample_idx,
           (('0x' || substr(md5('neg-v1:' || j.sample_idx || ':' || p.doc_id), 1, 8))::BIGINT
            % (n.c - 1)) + 1 AS idx
    FROM p, n, (VALUES (1), (2)) AS j(sample_idx)
)
SELECT dd.anchor_id, dd.sample_idx, q.doc_id AS neg_id
FROM (
    SELECT anchor_id, sample_idx,
           idx + CASE WHEN idx >= pos THEN 1 ELSE 0 END AS ppos
    FROM d
) dd
JOIN p q ON q.pos = dd.ppos
ORDER BY anchor_id, sample_idx
"""


# embedding_hard_negatives: the embedding_topk chain with the label
# predicate and the max_cos false-negative guard applied before the
# per-query rank — double-precision dot products round to 6 identically
# on both engines (the embedding_topk convention).
ORACLES["embedding_hard_negatives"] = """
WITH q AS (
    SELECT vec_id AS query_id, embedding::DOUBLE[] AS q_vec, label AS q_label
    FROM embeddings WHERE vec_id < 20
), c AS (
    SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS c_vec, label AS c_label
    FROM embeddings
), scored AS (
    SELECT query_id, neighbor_id,
           ROUND(
             CASE WHEN sqrt(list_dot_product(q_vec, q_vec)) * sqrt(list_dot_product(c_vec, c_vec)) > 0
                  THEN list_dot_product(q_vec, c_vec)
                       / (sqrt(list_dot_product(q_vec, q_vec)) * sqrt(list_dot_product(c_vec, c_vec)))
                  ELSE 0.0 END
           , 6) AS cos
    FROM c, q
    WHERE q_label <> c_label
)
SELECT query_id, neighbor_id, cos,
       row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
FROM scored
WHERE cos <= 0.95
QUALIFY rank <= 5
ORDER BY query_id, rank
"""


# docs_incremental_clusters: the oracle is the FULL batch CC over all
# LSH pairs (dedup_clusters' reachability chain) — the Spark side
# builds the SAME labeling through 3 incremental merges, so
# 'incremental ≡ recompute-from-scratch' is the property under test;
# any drift in the star-edge compression or the untouched pass-through
# hash-mismatches here.
ORACLES["docs_incremental_clusters"] = ORACLES["dedup_clusters"]

# customer_scd2 (r11): Kimball type-2 dimension maintenance — the
# fork/no-op/insert partition replayed as set operations. `changed` =
# open rows whose tracked value differs (IS DISTINCT FROM = the
# null-safe equality scd2_apply uses); everything else passes through.
ORACLES["customer_scd2"] = """
WITH dim AS (
    SELECT c_custkey AS k, c_mktsegment AS segment,
           c_nationkey AS nation,
           DATE '2020-01-01' AS valid_from,
           CAST(NULL AS DATE) AS valid_to
    FROM customer
), ups AS (
    SELECT c_custkey AS k,
           CASE WHEN c_custkey % 14 = 0 THEN 'MOVED'
                ELSE c_mktsegment END AS segment
    FROM customer WHERE c_custkey % 7 = 0
    UNION ALL
    SELECT c_custkey + 10000000, 'NEW'
    FROM customer WHERE c_custkey % 97 = 0
), changed AS (
    SELECT d.k, d.segment, d.nation, d.valid_from, u.segment AS u_seg
    FROM dim d JOIN ups u ON d.k = u.k
    WHERE d.segment IS DISTINCT FROM u.segment
)
SELECT k, segment, nation,
       valid_from::TIMESTAMP AS valid_from,
       valid_to::TIMESTAMP AS valid_to
FROM (
    SELECT k, segment, nation, valid_from, valid_to FROM dim
    WHERE k NOT IN (SELECT k FROM changed)
    UNION ALL
    SELECT k, segment, nation, valid_from, DATE '2024-06-01' FROM changed
    UNION ALL
    SELECT k, u_seg, nation, DATE '2024-06-01', CAST(NULL AS DATE) FROM changed
    UNION ALL
    SELECT u.k, u.segment, CAST(NULL AS INTEGER), DATE '2024-06-01',
           CAST(NULL AS DATE)
    FROM ups u WHERE u.k NOT IN (SELECT k FROM dim)
)
ORDER BY k, valid_from
"""

# orders_scd2_asof_join (r12): the as-of fact join — every order picks
# the dimension version valid at its own o_orderdate. The oracle is the
# plain inequality join DuckDB optimizes natively; the Spark side is a
# broadcast hash equi-join on custkey with the interval containment as
# a residual predicate. DATE + INTEGER adds days in both engines.
ORACLES["orders_scd2_asof_join"] = """
WITH dim AS (
    SELECT c_custkey AS custkey, c_mktsegment AS segment,
           DATE '1992-01-01' AS valid_from,
           DATE '1994-01-01' + CAST(c_custkey % 730 AS INTEGER) AS valid_to
    FROM customer
    UNION ALL
    SELECT c_custkey, 'MOVED-' || c_mktsegment,
           DATE '1994-01-01' + CAST(c_custkey % 730 AS INTEGER), NULL
    FROM customer
)
SELECT d.segment, year(o_orderdate) AS order_year,
       COUNT(*) AS n_orders,
       SUM(o_totalprice::DECIMAL(18,2))::DOUBLE AS total_price
FROM orders o
JOIN dim d ON d.custkey = o.o_custkey
          AND d.valid_from <= o.o_orderdate
          AND (d.valid_to IS NULL OR d.valid_to > o.o_orderdate)
GROUP BY 1, 2
ORDER BY segment, order_year
"""

# embedding_covariance (r11): integer micro-unit covariance — the
# oracle replays the quantization (ROUND half-away-from-zero of the
# DOUBLE product, exactly the numpy path) and accumulates the same
# exact integers through a per-vector pair join; the final double
# expression is operation-for-operation the Spark projection.
ORACLES["embedding_covariance"] = """
WITH m AS (
    SELECT vec_id, CAST(i - 1 AS INTEGER) AS i,
           CAST(ROUND(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT) AS xm
    FROM (
        SELECT vec_id, unnest(embedding) AS x,
               generate_subscripts(embedding, 1) AS i
        FROM embeddings
    )
), s AS (
    SELECT i, SUM(xm) AS sx FROM m GROUP BY i
), nn AS (
    SELECT COUNT(*)::BIGINT AS n FROM embeddings
), p AS (
    SELECT a.i AS i, b.i AS j, SUM(a.xm * b.xm) AS sxy
    FROM m a JOIN m b ON a.vec_id = b.vec_id AND b.i >= a.i
    GROUP BY a.i, b.i
)
SELECT p.i, p.j,
       ROUND((p.sxy::DOUBLE / nn.n
              - (sa.sx::DOUBLE / nn.n) * (sb.sx::DOUBLE / nn.n))
             / 1e12, 6) + 0.0 AS cov
FROM p
CROSS JOIN nn
JOIN s sa ON sa.i = p.i
JOIN s sb ON sb.i = p.j
ORDER BY p.i, p.j
"""

# events_user_skew (r11): the salting planner — counts, top-20 heavy
# keys, shares, cumulative shares, skew ratio vs the mean key, salt
# factor at 1000 rows/partition. Every ratio mirrors the Spark
# expression tree (integer counts, one double division chain, 6 dp).
ORACLES["events_user_skew"] = """
WITH c AS (
    SELECT user_id AS key, COUNT(*)::BIGINT AS n FROM events GROUP BY 1
), t AS (
    SELECT SUM(n)::BIGINT AS total, COUNT(*)::BIGINT AS dst FROM c
), top AS (
    SELECT key, n FROM c ORDER BY n DESC, key LIMIT 20
)
SELECT ROW_NUMBER() OVER (ORDER BY n DESC, key) AS rank,
       key, n,
       ROUND(n / t.total, 6) AS share,
       ROUND(SUM(n) OVER (ORDER BY n DESC, key
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             / t.total, 6) AS cum_share,
       ROUND(n / (t.total / t.dst), 6) AS skew_ratio,
       CAST(CEIL(n / 1000) AS INTEGER) AS salt_factor
FROM top CROSS JOIN t
ORDER BY rank
"""

# embedding_mmr_rerank (r11): the greedy MMR selection unrolled as
# k chained CTEs in exact HUGEINT arithmetic — identical micro
# quantization, identical (score DESC, id ASC) tie-break per step.
from social_media_data_pipeline_spark.functions.similarity import (
    build_mmr_sql as _mmr_sql,
)

ORACLES["embedding_mmr_rerank"] = _mmr_sql(
    k=5, n_candidates=20, lam_micro=700_000, query_pred="vec_id < 5"
)

# embedding_spectrum_incremental (r12): the streaming spectrum store's
# incremental ≡ recompute identity under the driver gate — 3 chunked
# CAS folds read back as the covariance, checked against the ONE-SHOT
# pair-join oracle (the docs_incremental_clusters / rollup precedent).
ORACLES["embedding_spectrum_incremental"] = ORACLES["embedding_covariance"]


# docs_dedup_weights (r12): count-preserving dedup — the dedup_clusters
# reachability chain, collapsed to one row per component with the
# canonical (min) id, member count, and exact char mass (SUM over
# BIGINT → HUGEINT in DuckDB, so CAST back to BIGINT — the r11
# driver-red lesson: the driver's pandas fetch renders HUGEINT as
# float64 and the value hash diverges on integer-valued cells).
ORACLES["docs_dedup_weights"] = f"""
WITH RECURSIVE sh_t AS (
    SELECT doc_id AS doc, {_SHINGLES} AS sh FROM documents
), sig_t AS (
    SELECT doc, {_MINHASH_SIG} AS sig FROM sh_t
), banded AS (
    SELECT doc, b.band_idx,
           md5(array_to_string(sig[b.band_idx*4+1 : b.band_idx*4+4], '|')) AS band_hash
    FROM sig_t, (SELECT unnest(generate_series(0, 3)) AS band_idx) b
), pairs AS (
    SELECT DISTINCT a.doc AS id_a, b.doc AS id_b
    FROM banded a JOIN banded b
      ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash AND a.doc < b.doc
), sym AS (
    SELECT id_a AS a, id_b AS b FROM pairs
    UNION
    SELECT id_b AS a, id_a AS b FROM pairs
), reach AS (
    SELECT doc_id AS node, doc_id AS r FROM documents
    UNION
    SELECT s.a AS node, reach.r AS r FROM sym s JOIN reach ON s.b = reach.node
), comp AS (
    SELECT node, MIN(r) AS component FROM reach GROUP BY node
)
SELECT MIN(comp.node) AS doc_id,
       CAST(COUNT(*) AS BIGINT) AS weight,
       CAST(SUM(d.n_chars) AS BIGINT) AS dup_mass
FROM comp JOIN documents d ON d.doc_id = comp.node
GROUP BY comp.component
ORDER BY doc_id
"""

# embedding_ivf_pq_opq_searched (r12): identical params + deterministic
# seeding as the full-cycle OPQ composition, read from the persisted
# artifacts — same oracle, which also proves the three cache paths
# bit-match a fresh build (the multiprobe_searched precedent).
ORACLES["embedding_ivf_pq_opq_searched"] = ORACLES["embedding_ivf_pq_opq"]

# events_transition_matrix (r12): per-user LEAD pairs → exact integer
# transition counts + 6dp per-source probability. SUM(n) total CASTs
# to nothing on the output surface (only n, a COUNT, is emitted as an
# integer; the HUGEINT total stays internal to the divide, which
# DuckDB evaluates as DOUBLE — same IEEE divide as Spark's).
ORACLES["events_transition_matrix"] = """
WITH seq AS (
    SELECT event_type AS src,
           LEAD(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
           ) AS dst
    FROM events
), pairs AS (
    SELECT src, dst FROM seq WHERE dst IS NOT NULL
), counts AS (
    SELECT src, dst, COUNT(*) AS n FROM pairs GROUP BY src, dst
), tot AS (
    SELECT src, SUM(n) AS t FROM counts GROUP BY src
)
SELECT c.src, c.dst, c.n, ROUND(c.n / t.t, 6) AS p
FROM counts c JOIN tot t USING (src)
ORDER BY src, dst
"""

# events_transition_drift (r12): per-source L1 between the two
# temporal halves' transition distributions. Every output is BIGINT
# (counts + summed micro-units); the period boundary is integer DATE
# arithmetic so both engines split identically; per-dst micro terms
# round ONE IEEE |p1-p2| each and sum as exact integers (the r11
# driver-red lesson: no rounded-double or engine-ordered float sum on
# the output surface).
ORACLES["events_transition_drift"] = """
WITH bounds AS (
    SELECT MIN(CAST(ts AS DATE)) AS lo, MAX(CAST(ts AS DATE)) AS hi
    FROM events
), seq AS (
    SELECT CAST(ts AS DATE) AS d,
           event_type AS src,
           LEAD(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
           ) AS dst
    FROM events
), pairs AS (
    SELECT s.src, s.dst,
           CASE WHEN s.d <= b.lo + CAST((b.hi - b.lo) // 2 AS INTEGER)
                THEN 1 ELSE 2 END AS period
    FROM seq s, bounds b
    WHERE s.dst IS NOT NULL
), counts AS (
    SELECT src, dst,
           CAST(SUM(CASE WHEN period = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
           CAST(SUM(CASE WHEN period = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n2
    FROM pairs GROUP BY src, dst
), terms AS (
    SELECT src, n1, n2,
           SUM(n1) OVER (PARTITION BY src) AS t1,
           SUM(n2) OVER (PARTITION BY src) AS t2
    FROM counts
), micro AS (
    SELECT src, n1, n2,
           CAST(ROUND(ABS(
               CASE WHEN t1 = 0 THEN 0.0 ELSE n1 / t1 END
             - CASE WHEN t2 = 0 THEN 0.0 ELSE n2 / t2 END
           ) * 1000000) AS BIGINT) AS d_micro
    FROM terms
)
SELECT src,
       CAST(SUM(n1) AS BIGINT) AS n1,
       CAST(SUM(n2) AS BIGINT) AS n2,
       CAST(SUM(d_micro) AS BIGINT) AS l1_micro
FROM micro
GROUP BY src
ORDER BY src
"""

# events_cusum_changepoint (r12): exact-integer CUSUM — the scaled
# statistic n*cumsum - i*total never leaves integer arithmetic, so
# the curve is engine-independent by construction; HUGEINT stays
# internal (CAST back to BIGINT on the surface, the r12 convention).
ORACLES["events_cusum_changepoint"] = """
WITH daily AS (
    SELECT date_trunc('day', ts)::TIMESTAMP AS day, COUNT(*) AS n
    FROM events GROUP BY 1
), tot AS (
    SELECT COUNT(*) AS nd, CAST(SUM(n) AS BIGINT) AS t FROM daily
), cur AS (
    SELECT day, n,
           SUM(n) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS cum,
           ROW_NUMBER() OVER (ORDER BY day) AS i
    FROM daily
)
SELECT day,
       CAST(n AS BIGINT) AS n,
       CAST(nd * cum - i * t AS BIGINT) AS cusum_scaled,
       ABS(nd * cum - i * t) = MAX(ABS(nd * cum - i * t)) OVER () AS is_peak
FROM cur, tot
ORDER BY day
"""

# events_session_paths (r12): 3-step event-type paths within
# 30-minute-gap sessions (same session semantics as the sessionize
# oracle: floor(epoch) second gaps, ts+event_id tie-break). The
# Spark side takes the in-session leads inside the ONE user-key sort
# (lead session_id alongside lead event_type and filters same-session)
# — semantically identical to the (user, session)-window formulation
# spelled out here.
ORACLES["events_session_paths"] = """
WITH gaps AS (
    SELECT user_id, event_id, ts, event_type,
           floor(epoch(ts))::BIGINT
             - lag(floor(epoch(ts))::BIGINT)
               OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap
    FROM events
), sid AS (
    SELECT user_id, event_id, ts, event_type,
           SUM(CASE WHEN gap IS NULL OR gap > 1800 THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS session_id
    FROM gaps
), tri AS (
    SELECT event_type AS e1,
           LEAD(event_type, 1) OVER ws AS e2,
           LEAD(event_type, 2) OVER ws AS e3
    FROM sid
    WINDOW ws AS (PARTITION BY user_id, session_id ORDER BY ts, event_id)
)
SELECT e1, e2, e3, CAST(COUNT(*) AS BIGINT) AS n
FROM tri
WHERE e2 IS NOT NULL AND e3 IS NOT NULL
GROUP BY e1, e2, e3
ORDER BY n DESC, e1, e2, e3
"""

# events_transition_incremental (r12): the chunked seam-repaired
# replay must equal the ONE-SHOT adjacent-pair count over all events
# — the incremental ≡ recompute identity for a NON-batch-decomposable
# (sequence) statistic. Same pair semantics as events_transition_matrix.
ORACLES["events_transition_incremental"] = """
WITH seq AS (
    SELECT event_type AS src,
           LEAD(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
           ) AS dst
    FROM events
)
SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS n
FROM seq
WHERE dst IS NOT NULL
GROUP BY src, dst
ORDER BY src, dst
"""

# events_attribution (r12): last-touch attribution — two LAST_VALUE
# IGNORE NULLS columns over the same (unbounded, -1) rows frame pick
# the SAME touch row (identical CASE null pattern); floor-epoch
# lookback (the sessionize convention); share as exact integer ppm
# ((n*1e6) // total — integer division in both engines, nothing IEEE
# on the surface).
ORACLES["events_attribution"] = """
WITH touched AS (
    SELECT event_type,
           floor(epoch(ts))::BIGINT AS s,
           LAST_VALUE(
               CASE WHEN event_type <> 'purchase'
                    THEN floor(epoch(ts))::BIGINT END IGNORE NULLS
           ) OVER w AS touch_s,
           LAST_VALUE(
               CASE WHEN event_type <> 'purchase'
                    THEN event_type END IGNORE NULLS
           ) OVER w AS touch_type
    FROM events
    WINDOW w AS (
        PARTITION BY user_id ORDER BY ts, event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
    )
), attributed AS (
    SELECT CASE WHEN touch_s IS NOT NULL AND s - touch_s <= 7 * 86400
                THEN touch_type ELSE 'unattributed' END AS source
    FROM touched
    WHERE event_type = 'purchase'
), counts AS (
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n FROM attributed GROUP BY source
), tot AS (
    SELECT CAST(SUM(n) AS BIGINT) AS total FROM counts
)
SELECT c.source, c.n, CAST((c.n * 1000000) // t.total AS BIGINT) AS share_ppm
FROM counts c, tot t
ORDER BY n DESC, source
"""

# orders_basket_rules (r12): Agrawal-Srikant 2-itemset rules with the
# integer-exact confidence/lift chain — (n_ab*1e6)//n_a then
# (conf*N)//n_b, floors and all, so both engines replay the identical
# int64 arithmetic; every count CASTs to BIGINT on the surface.
ORACLES["orders_basket_rules"] = """
WITH base AS (
    SELECT DISTINCT l_orderkey AS g, l_partkey AS i FROM lineitem
), pairs AS (
    SELECT a.i AS pa, b.i AS pb, CAST(COUNT(*) AS BIGINT) AS sup
    FROM base a JOIN base b ON a.g = b.g AND a.i < b.i
    GROUP BY a.i, b.i
    HAVING COUNT(*) >= 2
), item_n AS (
    SELECT i, CAST(COUNT(*) AS BIGINT) AS n FROM base GROUP BY i
), tot AS (
    SELECT CAST(COUNT(DISTINCT g) AS BIGINT) AS nb FROM base
), directed AS (
    SELECT pa AS antecedent, pb AS consequent, sup FROM pairs
    UNION ALL
    SELECT pb AS antecedent, pa AS consequent, sup FROM pairs
)
SELECT d.antecedent, d.consequent, d.sup AS n_ab,
       ia.n AS n_a, ib.n AS n_b,
       CAST((d.sup * 1000000) // ia.n AS BIGINT) AS confidence_ppm,
       CAST((((d.sup * 1000000) // ia.n) * t.nb) // ib.n AS BIGINT) AS lift_micro
FROM directed d
JOIN item_n ia ON ia.i = d.antecedent
JOIN item_n ib ON ib.i = d.consequent
CROSS JOIN tot t
ORDER BY n_ab DESC, antecedent, consequent
"""

# events_time_to_convert (r12): conditional per-user first-view /
# first-purchase floor-epoch MINs, integer whole-day latency bucket,
# bounded day histogram — all-integer surface.
ORACLES["events_time_to_convert"] = """
WITH firsts AS (
    SELECT user_id,
           MIN(CASE WHEN event_type = 'view'
                    THEN floor(epoch(ts))::BIGINT END) AS v,
           MIN(CASE WHEN event_type = 'purchase'
                    THEN floor(epoch(ts))::BIGINT END) AS p
    FROM events GROUP BY user_id
)
SELECT CAST((p - v) // 86400 AS BIGINT) AS days_to_convert,
       CAST(COUNT(*) AS BIGINT) AS n_users
FROM firsts
WHERE v IS NOT NULL AND p IS NOT NULL AND p >= v
GROUP BY 1
ORDER BY days_to_convert
"""
