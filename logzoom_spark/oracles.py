"""DuckDB oracle SQL for every oracle-testable operator.

Each string is self-contained ANSI-ish SQL over the driver's pre-registered
views (region nation customer supplier part orders lineitem events documents
embeddings). The transcript fact table is reconstructed byte-identically via
the dual-dialect derivation in `transcripts.py`, so Spark and DuckDB compute
over the same rows.

Conventions that keep value-hashes stable across engines:
- timestamps → epoch-second BIGINTs (floor(epoch(ts)))
- money/ratios → integer cents / floor(ratio*10000) BIGINTs
- embedding math → quantized integer grids (exact, order-independent)
- every computed column aliased identically to the Spark side
"""

from __future__ import annotations

from .hashing import portable_hash_sql
from .ops.text import STOPWORDS
from .transcripts import (
    role_meta_values_duckdb,
    tool_meta_values_duckdb,
    turns_sql_duckdb,
)

# ---------------------------------------------------------------------------
# Shared CTEs
# ---------------------------------------------------------------------------

TURNS_CTE = f"turns AS ({turns_sql_duckdb('events')})"

# mirror of parse.parse_turns (builtin engine)
PARSED_CTE = r"""parsed AS (
  SELECT t.*,
    CASE WHEN text LIKE '{%' THEN json_extract_string(text, '$.log_type')
         ELSE nullif(regexp_extract(text, 'log_type=(\w+)', 1), '') END AS log_type,
    CASE WHEN text LIKE '{%' THEN json_extract_string(text, '$.level')
         ELSE nullif(regexp_extract(text, 'level=(\w+)', 1), '') END AS level,
    TRY_CAST(CASE WHEN text LIKE '{%' THEN json_extract_string(text, '$.latency_ms')
         ELSE nullif(regexp_extract(text, 'latency_ms=(-?\d+)', 1), '') END AS BIGINT) AS latency_ms,
    CASE WHEN text LIKE '{%' THEN json_extract_string(text, '$.message')
         ELSE nullif(regexp_extract(text, 'msg="([^"]*)"', 1), '') END AS msg,
    concat('conv://', conv_id) AS source
  FROM turns t
)"""

_PARSE_OK = "(log_type IS NOT NULL AND level IS NOT NULL)"

_WITH_PARSED = f"WITH {TURNS_CTE}, {PARSED_CTE}"


def _arith_gate(pct: float, seed: int = 0, bound: str = "lt") -> str:
    # mirror of route.gate_arith: portable hash of 'conv_id|turn_idx' mod 100
    op = "<=" if bound == "le" else "<"
    key = "concat(conv_id, '|', cast(turn_idx AS VARCHAR))"
    return f"({portable_hash_sql(key, seed)} % 100) {op} {pct}"


# ---------------------------------------------------------------------------
# Transcript pipeline oracles
# ---------------------------------------------------------------------------

ORACLES: dict[str, str] = {}

ORACLES["turns_table"] = f"""
WITH {TURNS_CTE}
SELECT conv_id, turn_idx, role, text, tool,
       cast(floor(epoch(ts)) AS BIGINT) AS ts_epoch
FROM turns
"""

_PARSE_PROJ = f"""
SELECT conv_id, turn_idx, log_type, level, latency_ms, msg, source,
       CASE WHEN {_PARSE_OK} THEN 1 ELSE 0 END AS parse_ok
FROM parsed
"""

ORACLES["parse_kv_fields"] = f"{_WITH_PARSED} {_PARSE_PROJ}"

ORACLES["parse_json_fields"] = f"""
{_WITH_PARSED}
SELECT conv_id, turn_idx, log_type, level, latency_ms, msg
FROM parsed WHERE text LIKE '{{%'
"""

# the pandas/Arrow grok engine must agree with the same oracle
ORACLES["parse_grok_pandas"] = ORACLES["parse_kv_fields"]

ORACLES["route_rule_filter"] = f"""
{_WITH_PARSED}
SELECT conv_id, turn_idx, text FROM parsed WHERE log_type = 'log_type1'
"""

ORACLES["route_multi_rule"] = f"""
{_WITH_PARSED}
SELECT conv_id, turn_idx, text FROM parsed
WHERE log_type = 'log_type1' AND level = 'ERROR'
"""

# missing rule key ⇒ every row rejected (s3.go:303 semantics): the rule key
# resolves to an absent field, i.e. NULL, and NULL = 'x' is never true
ORACLES["route_missing_key"] = f"""
{_WITH_PARSED}
SELECT conv_id, turn_idx, text FROM parsed
WHERE nullif(regexp_extract(text, 'nonexistent_key=(\\w+)', 1), '') = 'x'
"""

# ES sink ignores rules (elasticsearch.go:146-153): all parsed rows flow
ORACLES["route_es_ignores_rules"] = f"""
{_WITH_PARSED}
SELECT strftime(ts, '%Y.%m.%d') AS index_day, conv_id, turn_idx, source, text
FROM parsed
"""

ORACLES["ingest_sample_arith"] = f"""
WITH {TURNS_CTE}
SELECT conv_id, turn_idx FROM turns WHERE {_arith_gate(37, seed=0)}
"""

# input gate then sink gate with S3's <= bound — compounding (quirk #10)
ORACLES["double_sampling"] = f"""
WITH {TURNS_CTE}
SELECT conv_id, turn_idx FROM turns
WHERE {_arith_gate(50, seed=0)} AND {_arith_gate(25, seed=1, bound="le")}
"""

ORACLES["enrich_broadcast"] = f"""
WITH {TURNS_CTE}
SELECT t.conv_id, t.turn_idx, t.role, role_meta.role_kind, role_meta.billing_class,
       t.tool, tool_meta.tool_family, tool_meta.risk_level
FROM turns t
LEFT JOIN {role_meta_values_duckdb()} ON t.role = role_meta.role
LEFT JOIN {tool_meta_values_duckdb()} ON t.tool = tool_meta.tool
"""

ORACLES["agg_role_window"] = f"""
WITH {TURNS_CTE}
SELECT role, cast(floor(epoch(ts)/300)*300 AS BIGINT) AS window_start,
       count(*) AS cnt
FROM turns GROUP BY 1, 2
"""

ORACLES["agg_tool_window"] = f"""
WITH {TURNS_CTE}
SELECT coalesce(tool, '') AS tool,
       cast(floor(epoch(ts)/300)*300 AS BIGINT) AS window_start,
       count(*) AS cnt
FROM turns GROUP BY 1, 2
"""

ORACLES["agg_conv_counts"] = f"""
{_WITH_PARSED}
SELECT conv_id, count(*) AS cnt, max(turn_idx) AS max_turn_idx
FROM parsed WHERE log_type = 'log_type1'
GROUP BY conv_id
"""

ORACLES["distinct_sources_ttl"] = f"""
{_WITH_PARSED}
SELECT source, cast(floor(epoch(max(ts))) AS BIGINT) AS last_seen
FROM parsed
GROUP BY source
HAVING cast(floor(epoch(max(ts))) AS BIGINT) >=
       (SELECT cast(floor(epoch(max(ts))) AS BIGINT) FROM parsed) - 86400
"""

ORACLES["tcp_line_format"] = f"""
{_WITH_PARSED}
SELECT concat(source, ' ', text) AS line, conv_id, turn_idx
FROM parsed WHERE log_type = 'log_type2'
"""

ORACLES["redis_copy_fanout"] = f"""
{_WITH_PARSED}
SELECT q.queue, p.conv_id, p.turn_idx, p.text
FROM parsed p CROSS JOIN (VALUES ('q1'), ('q2')) AS q(queue)
WHERE p.log_type = 'log_type1'
"""

ORACLES["s3_timeslice_counts"] = f"""
{_WITH_PARSED}
SELECT strftime(ts, '%Y-%m-%d-%H%M') AS time_slice, count(*) AS cnt
FROM parsed WHERE log_type = 'log_type1' AND level = 'ERROR'
GROUP BY 1
"""

ORACLES["es_daily_counts"] = f"""
{_WITH_PARSED}
SELECT strftime(ts, '%Y.%m.%d') AS index_day, count(*) AS cnt
FROM parsed GROUP BY 1
"""

# COMMONAPACHELOG grok round-trip: the Spark side constructs a deterministic
# apache line per turn and grok-parses it back; the oracle reconstructs each
# field directly from the same inputs, so any regex/field drift mismatches.
ORACLES["grok_apache_commonlog"] = f"""
WITH {TURNS_CTE}
SELECT conv_id, turn_idx,
  concat('10.', cast(turn_idx % 200 AS VARCHAR), '.0.1') AS clientip,
  '-' AS ident,
  role AS auth,
  concat(strftime(ts, '%d/%b/%Y:%H:%M:%S'), ' +0000') AS apache_ts,
  'GET' AS verb,
  concat('/conv/', conv_id, '/turn/', cast(turn_idx AS VARCHAR)) AS request,
  '1.1' AS httpversion,
  cast(200 + (turn_idx % 4) * 100 AS BIGINT) AS response,
  cast(length(text) AS BIGINT) AS bytes
FROM turns
"""

# SYSLOGLINE composite: every subfield re-derived arithmetically from the
# same inputs the Spark side formatted into the line
ORACLES["grok_syslog_line"] = f"""
WITH {TURNS_CTE}
SELECT conv_id, turn_idx,
  strftime(ts, '%b %d %H:%M:%S') AS syslog_timestamp,
  concat('host-', cast(turn_idx % 50 AS VARCHAR), '.example.com') AS syslog_host,
  concat('proc-', role) AS syslog_program,
  cast(turn_idx AS BIGINT) AS syslog_pid,
  concat('conv ', conv_id, ' turn ', cast(turn_idx AS VARCHAR)) AS syslog_message
FROM turns
"""

ORACLES["stable_turn_order"] = f"""
WITH {TURNS_CTE}
SELECT conv_id, turn_idx,
       cast(row_number() OVER (PARTITION BY conv_id ORDER BY turn_idx) AS BIGINT) AS rn,
       text
FROM turns
"""

# ---------------------------------------------------------------------------
# Relational breadth (TPC-H-ish) — integer-cents arithmetic for exactness
# ---------------------------------------------------------------------------

ORACLES["tpch_q1"] = """
SELECT l_returnflag, l_linestatus,
  cast(sum(cast(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
  cast(sum(cast(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sum_base_cents,
  cast(sum(cast(round(l_extendedprice*(1-l_discount)*100) AS BIGINT)) AS BIGINT) AS sum_disc_cents,
  cast(sum(cast(round(l_extendedprice*(1-l_discount)*(1+l_tax)*100) AS BIGINT)) AS BIGINT) AS sum_charge_cents,
  count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= timestamp '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""

ORACLES["join_broadcast_dims"] = """
SELECT r.r_name, n.n_name, count(*) AS n_customers,
       cast(sum(cast(round(c.c_acctbal*100) AS BIGINT)) AS BIGINT) AS acctbal_cents
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name, n.n_name
"""

ORACLES["topk_orders_per_segment"] = """
WITH jo AS (
  SELECT c.c_mktsegment, o.o_orderkey,
         cast(round(o.o_totalprice*100) AS BIGINT) AS total_cents
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
)
SELECT c_mktsegment, o_orderkey, total_cents, rn FROM (
  SELECT c_mktsegment, o_orderkey, total_cents,
         cast(row_number() OVER (PARTITION BY c_mktsegment
              ORDER BY total_cents DESC, o_orderkey) AS BIGINT) AS rn
  FROM jo
) WHERE rn <= 3
"""

ORACLES["events_window_agg"] = """
SELECT event_type, cast(floor(epoch(ts)/3600)*3600 AS BIGINT) AS window_start,
       count(*) AS cnt,
       cast(sum(cast(round(value*100) AS BIGINT)) AS BIGINT) AS value_cents
FROM events GROUP BY 1, 2
"""

# WebSocket per-connection ?source= filter (websocket.go:74-78): exact
# equality on the provenance column
ORACLES["ws_source_filter"] = f"""
{_WITH_PARSED}
SELECT source, conv_id, turn_idx, text
FROM parsed WHERE source = 'conv://conv-000007'
"""

# ratecounter analog at fine grain: events/minute per role (SURVEY #13;
# the reference's 1 s sliding window generalized to event-time buckets)
ORACLES["rate_counts_minute"] = f"""
WITH {TURNS_CTE}
SELECT role, cast(floor(epoch(ts)/60)*60 AS BIGINT) AS window_start,
       count(*) AS cnt
FROM turns GROUP BY 1, 2
"""

ORACLES["sessionize_gaps"] = f"""
WITH {TURNS_CTE},
gaps AS (
  SELECT conv_id, turn_idx,
    CASE WHEN cast(floor(epoch(ts)) AS BIGINT)
            - cast(floor(epoch(lag(ts) OVER w)) AS BIGINT) > 1800
         THEN 1 ELSE 0 END AS new_sess
  FROM turns WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)
)
SELECT conv_id, turn_idx,
       cast(sum(new_sess) OVER (PARTITION BY conv_id ORDER BY turn_idx
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
FROM gaps
"""

ORACLES["pivot_role_by_level"] = f"""
{_WITH_PARSED}
SELECT role,
  cast(sum(CASE WHEN level = 'INFO' THEN 1 ELSE 0 END) AS BIGINT) AS INFO,
  cast(sum(CASE WHEN level = 'WARN' THEN 1 ELSE 0 END) AS BIGINT) AS WARN,
  cast(sum(CASE WHEN level = 'ERROR' THEN 1 ELSE 0 END) AS BIGINT) AS ERROR
FROM parsed GROUP BY role
"""

# real null tools pre-coalesced to '' so CUBE's roll-up null ('ALL') stays
# unambiguous in both engines
ORACLES["cube_role_tool"] = f"""
WITH {TURNS_CTE},
t AS (SELECT role, coalesce(tool, '') AS tool FROM turns)
SELECT coalesce(role, 'ALL') AS role, coalesce(tool, 'ALL') AS tool,
       count(*) AS cnt
FROM t GROUP BY CUBE (role, tool)
"""

ORACLES["distinct_convs_per_role"] = f"""
WITH {TURNS_CTE}
SELECT role, count(DISTINCT conv_id) AS n_convs, count(*) AS n_turns
FROM turns GROUP BY role
"""

ORACLES["set_ops_routes"] = f"""
{_WITH_PARSED}
SELECT conv_id, turn_idx FROM parsed WHERE log_type = 'log_type1'
EXCEPT
SELECT conv_id, turn_idx FROM parsed WHERE level = 'ERROR'
"""

ORACLES["semi_anti_error_convs"] = f"""
{_WITH_PARSED}
SELECT conv_id,
  cast(CASE WHEN conv_id IN (SELECT conv_id FROM parsed WHERE level = 'ERROR')
       THEN 1 ELSE 0 END AS BIGINT) AS has_error
FROM parsed GROUP BY conv_id
"""

ORACLES["join_sort_merge_revenue"] = """
SELECT o.o_orderpriority,
  count(*) AS n_items,
  cast(sum(cast(round(l.l_extendedprice*(1-l.l_discount)*100) AS BIGINT)) AS BIGINT)
    AS revenue_cents
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_orderpriority
"""

# ---------------------------------------------------------------------------
# Training-data ops over documents / embeddings
# ---------------------------------------------------------------------------

_NORM_TEXT = r"lower(trim(regexp_replace(text, '\s+', ' ', 'g')))"

ORACLES["dedup_exact"] = f"""
SELECT md5({_NORM_TEXT}) AS fp, min(doc_id) AS doc_id, count(*) AS dup_cnt
FROM documents GROUP BY 1
"""

ORACLES["doc_fingerprint"] = f"""
SELECT doc_id, md5({_NORM_TEXT}) AS fingerprint FROM documents
"""

_STOP_HITS = " + ".join(
    f"(CASE WHEN lower(text) LIKE '% {w} %' THEN 1 ELSE 0 END)" for w in STOPWORDS
)

ORACLES["text_quality"] = f"""
SELECT doc_id,
  cast(length(text) AS BIGINT) AS n_chars,
  cast(CASE WHEN length(trim(text)) = 0 THEN 0
       ELSE length(regexp_split_to_array(trim(text), '\\s+')) END AS BIGINT) AS n_tokens,
  cast(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS BIGINT) AS n_punct,
  cast(CASE WHEN length(text) = 0 THEN 0 ELSE floor(
    (length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g'))) * 1.0
    / length(text) * 10000) END AS BIGINT) AS punct_ratio10k,
  cast(CASE WHEN length(text) = 0 THEN 0 ELSE floor(
    (length(text) - length(regexp_replace(text, '[0-9]', '', 'g'))) * 1.0
    / length(text) * 10000) END AS BIGINT) AS digit_ratio10k,
  cast(CASE WHEN length(text) = 0 THEN 0 ELSE floor(
    (length(text) - length(regexp_replace(text, ' ', '', 'g'))) * 1.0
    / length(text) * 10000) END AS BIGINT) AS space_ratio10k,
  cast({_STOP_HITS} AS BIGINT) AS stopword_hits
FROM documents
"""

ORACLES["lang_id"] = f"""
SELECT doc_id,
  cast({_STOP_HITS} AS BIGINT) AS stopword_hits,
  CASE WHEN length(regexp_replace(text, '[^一-鿿]', '', 'g')) > 0 THEN 'cjk'
       WHEN {_STOP_HITS} >= 2 THEN 'en'
       ELSE 'unk' END AS pred_lang
FROM documents
"""

ORACLES["token_counts"] = r"""
SELECT doc_id,
  cast(CASE WHEN length(trim(text)) = 0 THEN 0
       ELSE length(regexp_split_to_array(trim(text), '\s+')) END AS BIGINT) AS n_tokens,
  cast(length(regexp_extract_all(trim(text), '\w+|[^\w\s]')) AS BIGINT) AS n_bpe_tokens
FROM documents
"""

_QUANT = (
    "list_transform(embedding, x -> cast(floor(cast(x AS DOUBLE) * 1000) AS BIGINT))"
)
_DOT64 = "cast(list_sum(list_transform(range(1, 65), i -> e.q[i] * b.q[i])) AS BIGINT)"

ORACLES["ann_brute_topk"] = f"""
WITH qv AS (SELECT vec_id, {_QUANT} AS q FROM embeddings)
SELECT e.vec_id, {_DOT64} AS dot
FROM qv e, (SELECT q FROM qv WHERE vec_id = 0) b
WHERE e.vec_id <> 0
ORDER BY dot DESC, e.vec_id
LIMIT 10
"""

ORACLES["embedding_norms_by_label"] = f"""
WITH qv AS (SELECT label, {_QUANT} AS q FROM embeddings)
SELECT label, count(*) AS n_vecs,
       cast(sum(list_sum(list_transform(range(1, 65), i -> q[i] * q[i]))) AS BIGINT) AS sum_sq
FROM qv GROUP BY label
"""


def _lsh_oracle(planes: int = 8, dims: int = 64) -> str:
    """Generate the LSH-bucket oracle with inline plane literals matching
    ops.similarity.lsh_bucket_topk's deterministic hyperplanes."""
    terms = []
    for p in range(planes):
        vals = [((p * 1315423911 + j * 2654435761) % 2001) - 1000 for j in range(dims)]
        lit = "[" + ", ".join(str(v) for v in vals) + "]"
        weight = 2 ** (planes - 1 - p)
        terms.append(
            f"(CASE WHEN list_sum(list_transform(range(1, {dims + 1}), "
            f"i -> q[i] * ({lit})[i])) >= 0 THEN {weight} ELSE 0 END)"
        )
    bucket = " + ".join(terms)
    return f"""
WITH qv AS (SELECT vec_id, {_QUANT} AS q FROM embeddings),
bk AS (SELECT vec_id, q, ({bucket}) AS bucket FROM qv)
SELECT e.vec_id, {_DOT64} AS dot
FROM bk e, (SELECT q, bucket FROM bk WHERE vec_id = 0) b
WHERE e.vec_id <> 0 AND e.bucket = b.bucket
ORDER BY dot DESC, e.vec_id
LIMIT 10
"""


ORACLES["ann_lsh_topk"] = _lsh_oracle()


def _bucket_sql(planes: int = 8, dims: int = 64, q: str = "q") -> str:
    """Hyperplane-bucket expression over quantized list `q` (mirror of
    ops.similarity._bucket_expr with the same deterministic planes)."""
    terms = []
    for p in range(planes):
        vals = [((p * 1315423911 + j * 2654435761) % 2001) - 1000 for j in range(dims)]
        lit = "[" + ", ".join(str(v) for v in vals) + "]"
        weight = 2 ** (planes - 1 - p)
        terms.append(
            f"(CASE WHEN list_sum(list_transform(range(1, {dims + 1}), "
            f"i -> {q}[i] * ({lit})[i])) >= 0 THEN {weight} ELSE 0 END)"
        )
    return " + ".join(terms)


# embedding-cosine near-dup (ops.similarity.cosine_dup_pairs): hyperplane
# buckets (capped) -> exact integer cosine-squared verify, threshold 0.3
# (cos2_pct >= 9; synthetic embeddings are near-orthogonal, see entry)
ORACLES["embedding_dup_pairs"] = f"""
WITH qv AS (SELECT vec_id, {_QUANT} AS q FROM embeddings),
wb AS (
  SELECT vec_id, q,
         cast(list_sum(list_transform(range(1, 65), i -> q[i] * q[i])) AS BIGINT) AS norm2,
         ({_bucket_sql()}) AS bucket
  FROM qv
),
capped AS (
  SELECT vec_id, q, norm2, bucket FROM (
    SELECT *, count(*) OVER (PARTITION BY bucket) AS bw FROM wb
  ) WHERE bw <= 500
),
pairs AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.norm2 AS na, b.norm2 AS nb,
         cast(list_sum(list_transform(range(1, 65), i -> a.q[i] * b.q[i])) AS BIGINT) AS d
  FROM capped a JOIN capped b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
)
SELECT DISTINCT vec_a, vec_b, cos2_pct FROM (
  SELECT vec_a, vec_b, d, cast((d * d * 100) // (na * nb) AS BIGINT) AS cos2_pct
  FROM pairs
) WHERE d >= 0 AND cos2_pct >= 9
"""

# IVF ANN (ops.similarity.ivf_topk): first-16-vectors coarse quantizer,
# tie-free argmax assignment (ord = dot*n_cells - cell), probe top-4 cells
ORACLES["ann_ivf_topk"] = f"""
WITH qv AS (SELECT vec_id, {_QUANT} AS q FROM embeddings),
cents AS (SELECT vec_id AS cell, q AS cv FROM qv WHERE vec_id < 16),
scored AS (
  SELECT v.vec_id, v.q, c.cell,
         cast(list_sum(list_transform(range(1, 65), i -> v.q[i] * c.cv[i])) AS BIGINT)
           * 16 - c.cell AS ord
  FROM qv v CROSS JOIN cents c
),
assigned AS (SELECT vec_id, q, arg_max(cell, ord) AS cell FROM scored GROUP BY vec_id, q),
qrow AS (SELECT q AS qq FROM qv WHERE vec_id = 0),
probe AS (
  SELECT cell FROM cents, qrow
  ORDER BY cast(list_sum(list_transform(range(1, 65), i -> cv[i] * qq[i])) AS BIGINT)
           * 16 - cell DESC
  LIMIT 4
)
SELECT a.vec_id,
       cast(list_sum(list_transform(range(1, 65), i -> a.q[i] * qrow.qq[i])) AS BIGINT) AS dot
FROM assigned a, qrow
WHERE a.cell IN (SELECT cell FROM probe) AND a.vec_id <> 0
ORDER BY dot DESC, a.vec_id
LIMIT 10
"""

# unigram surprisal (ops.retrieval.unigram_surprisal): add-one-smoothed
# corpus unigram LM; per-token surprisal floor-quantized to millinats
# before the per-doc sum
ORACLES["unigram_surprisal"] = r"""
WITH tk AS (
  SELECT doc_id,
         regexp_split_to_array(lower(trim(coalesce(text, ''))), '\s+') AS toks
  FROM documents
),
posts AS (SELECT doc_id, unnest(toks) AS token FROM tk),
ptf AS (
  SELECT doc_id, token, cast(count(*) AS BIGINT) AS tf
  FROM posts GROUP BY doc_id, token
),
totals AS (SELECT token, sum(tf) AS ct FROM ptf GROUP BY token),
corpus AS (SELECT sum(ct) AS t_tokens, count(*) AS vocab FROM totals),
per_token AS (
  SELECT token,
         cast(floor(-ln((ct + 1.0) / (t_tokens + vocab)) * 1000) AS BIGINT) AS sm
  FROM totals, corpus
),
sums AS (
  SELECT p.doc_id, sum(p.tf) AS n_tokens, sum(p.tf * pt.sm) AS s
  FROM ptf p JOIN per_token pt USING (token) GROUP BY p.doc_id
)
SELECT d.doc_id,
  cast(coalesce(n_tokens, 0) AS BIGINT) AS n_tokens,
  cast(coalesce(s, 0) AS BIGINT) AS surprisal_milli_sum,
  CASE WHEN n_tokens > 0 THEN cast(s // n_tokens AS BIGINT) END
    AS mean_surprisal_milli
FROM documents d LEFT JOIN sums USING (doc_id)
"""

# bigram surprisal (ops.retrieval.bigram_surprisal): add-one-smoothed
# conditional bigram LM, p(v|u) = (c(uv)+1)/(c(u)+V); per-bigram
# surprisal floor-quantized to millinats before the per-doc sum
ORACLES["bigram_surprisal"] = r"""
WITH tk AS (
  SELECT doc_id,
         regexp_split_to_array(lower(trim(coalesce(text, ''))), '\s+') AS toks
  FROM documents
),
bg AS (
  SELECT doc_id,
         unnest(list_transform(range(1, length(toks)),
                i -> struct_pack(u := toks[i], v := toks[i + 1]))) AS p
  FROM tk
),
pbt AS (
  SELECT doc_id, p.u AS u, p.v AS v, cast(count(*) AS BIGINT) AS tf
  FROM bg GROUP BY 1, 2, 3
),
btot AS (SELECT u, v, cast(sum(tf) AS BIGINT) AS cuv FROM pbt GROUP BY u, v),
posts AS (SELECT unnest(toks) AS u FROM tk),
utot AS (SELECT u, cast(count(*) AS BIGINT) AS cu FROM posts GROUP BY u),
corpus AS (SELECT count(*) AS vocab FROM utot),
per_bg AS (
  SELECT b.u, b.v,
         cast(floor(-ln((b.cuv + 1.0) / (ut.cu + c.vocab)) * 1000)
              AS BIGINT) AS sm
  FROM btot b JOIN utot ut USING (u), corpus c
),
sums AS (
  SELECT p.doc_id, sum(p.tf) AS nb, sum(p.tf * pb.sm) AS s
  FROM pbt p JOIN per_bg pb USING (u, v) GROUP BY 1
)
SELECT d.doc_id,
  cast(coalesce(nb, 0) AS BIGINT) AS n_bigrams,
  cast(coalesce(s, 0) AS BIGINT) AS surprisal_milli_sum,
  CASE WHEN nb > 0 THEN cast(s // nb AS BIGINT) END AS mean_surprisal_milli
FROM documents d LEFT JOIN sums USING (doc_id)
"""

# TPC-H Q13 shape: left-join order counts per customer (ON-clause
# priority filter), then the count distribution
ORACLES["tpch_q13"] = """
WITH per_cust AS (
  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
  FROM customer c LEFT JOIN orders o
    ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey
)
SELECT c_count, count(*) AS custdist FROM per_cust GROUP BY c_count
"""

# TPC-H Q18 shape: large-volume orders (sum qty > 150) joined to
# order/customer attributes; integer cents
ORACLES["tpch_q18"] = """
WITH big AS (
  SELECT l_orderkey, cast(sum(l_quantity) AS BIGINT) AS sum_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING cast(sum(l_quantity) AS BIGINT) > 150
)
SELECT c.c_custkey, c.c_name, o.o_orderkey,
       cast(round(o.o_totalprice * 100) AS BIGINT) AS total_cents, big.sum_qty
FROM orders o
JOIN big ON o.o_orderkey = big.l_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
"""

# TPC-H Q17 shape: quantity below 0.2x the part average — integer-exact
# comparison qty*5*cnt < sum (the decorrelated scalar-subquery form)
ORACLES["tpch_q17"] = """
WITH pa AS (
  SELECT l_partkey AS p_key, cast(sum(l_quantity) AS BIGINT) AS sum_qty,
         count(*) AS cnt_qty
  FROM lineitem GROUP BY l_partkey
)
SELECT cast(sum(round(l.l_extendedprice * 100)) AS BIGINT) AS revenue_cents,
       count(*) AS n_small_items
FROM lineitem l JOIN pa ON l.l_partkey = pa.p_key
WHERE cast(l.l_quantity AS BIGINT) * 5 * pa.cnt_qty < pa.sum_qty
"""

# deterministic per-group reservoir (ops.corpus.reservoir_sample): 20 per
# lang by portable-hash rank
ORACLES["reservoir_sample_lang"] = f"""
SELECT doc_id, lang, source FROM (
  SELECT doc_id, lang, source,
         row_number() OVER (
           PARTITION BY lang
           ORDER BY {portable_hash_sql("cast(doc_id AS VARCHAR)")} ASC, doc_id ASC
         ) AS rk
  FROM documents
) WHERE rk <= 20
"""

# token-count expression shared by the mixture oracles (mirror of
# ops.text.token_count)
_NT = (
  "CASE WHEN length(trim(text)) = 0 THEN 0 "
  r"ELSE len(regexp_split_to_array(trim(text), '\s+')) END"
)

# mixture recipe (ops.corpus.mixture_plan): rate10k =
# min(10000, budget*w10k // stratum_tokens), budget 50000, en/zh/other
ORACLES["mixture_plan"] = f"""
WITH stats AS (
  SELECT lang AS stratum, count(*) AS n_docs,
         cast(sum({_NT}) AS BIGINT) AS stratum_tokens
  FROM documents GROUP BY lang
),
w AS (
  SELECT *, cast(CASE stratum WHEN 'en' THEN 5000 WHEN 'zh' THEN 3000
                 ELSE 500 END AS BIGINT) AS w10k
  FROM stats
)
SELECT stratum, n_docs, stratum_tokens,
       (50000 * w10k) // 10000 AS target_tokens,
       least(10000, (50000 * w10k) // greatest(stratum_tokens, 1)) AS rate10k
FROM w
"""

ORACLES["mixture_sample"] = f"""
WITH stats AS (
  SELECT lang AS stratum, cast(sum({_NT}) AS BIGINT) AS stratum_tokens
  FROM documents GROUP BY lang
),
rates AS (
  SELECT stratum AS lang,
         least(10000, (50000 * cast(CASE stratum WHEN 'en' THEN 5000
                WHEN 'zh' THEN 3000 ELSE 500 END AS BIGINT))
               // greatest(stratum_tokens, 1)) AS rate10k
  FROM stats
)
SELECT d.doc_id, d.lang, d.source
FROM documents d JOIN rates r ON d.lang IS NOT DISTINCT FROM r.lang
WHERE ({portable_hash_sql("cast(d.doc_id AS VARCHAR)")} % 10000) < r.rate10k
"""

# Inverted-index postings (ops.retrieval.build_postings) at the three
# bm25 query terms
ORACLES["inverted_postings"] = r"""
WITH tk AS (
  SELECT doc_id,
         regexp_split_to_array(lower(trim(coalesce(text, ''))), '\s+') AS toks
  FROM documents
),
posts AS (SELECT doc_id, unnest(toks) AS token FROM tk)
SELECT token, doc_id, count(*) AS tf
FROM posts WHERE token IN ('spark', 'vector', 'scan')
GROUP BY token, doc_id
"""

# BM25 top-k (ops.retrieval.bm25_topk): integer fixed-point scoring with
# k1=1.2, b=0.75 — contrib = (idf10k*tf*22*A) // (10*tf*A + 3*A + 90*dlen),
# idf10k = floor(1e4*ln((2N+2)/(2df+1))), A = (10*T) // N
ORACLES["bm25_topk"] = r"""
WITH tk AS (
  SELECT doc_id,
         regexp_split_to_array(lower(trim(coalesce(text, ''))), '\s+') AS toks
  FROM documents
),
lens AS (SELECT doc_id, cast(len(toks) AS BIGINT) AS dlen FROM tk),
tot AS (
  SELECT count(*) AS n_docs, (10 * sum(dlen)) // count(*) AS avg10 FROM lens
),
posts AS (SELECT doc_id, unnest(toks) AS token FROM tk),
cand AS (
  SELECT token, doc_id, cast(count(*) AS BIGINT) AS tf
  FROM posts WHERE token IN ('spark', 'vector', 'scan')
  GROUP BY token, doc_id
),
stats AS (SELECT token, count(*) AS df FROM cand GROUP BY token),
scored AS (
  SELECT c.doc_id,
    (cast(floor(ln(cast(2 * tot.n_docs + 2 AS DOUBLE) / (2 * s.df + 1)) * 10000)
          AS BIGINT)
     * c.tf * 22 * tot.avg10)
    // (10 * c.tf * tot.avg10 + 3 * tot.avg10 + 90 * l.dlen) AS contrib
  FROM cand c JOIN stats s USING (token) JOIN lens l USING (doc_id), tot
)
SELECT doc_id, cast(sum(contrib) AS BIGINT) AS bm25_scaled,
       cast(count(*) AS BIGINT) AS n_terms_hit
FROM scored GROUP BY doc_id
ORDER BY bm25_scaled DESC, doc_id ASC LIMIT 10
"""

# Batched BM25 (ops.retrieval.bm25_query_join): same fixed-point scoring
# as bm25_topk, per-term df computed ONCE over the union of query terms,
# per-query top-5 by (score desc, doc_id asc)
ORACLES["bm25_query_join"] = r"""
WITH q(query_id, token) AS (VALUES
  (1, 'spark'), (1, 'vector'), (1, 'scan'),
  (2, 'join'), (2, 'shuffle'), (2, 'table'),
  (3, 'query'), (3, 'filter')),
tk AS (
  SELECT doc_id,
         regexp_split_to_array(lower(trim(coalesce(text, ''))), '\s+') AS toks
  FROM documents
),
lens AS (SELECT doc_id, cast(len(toks) AS BIGINT) AS dlen FROM tk),
tot AS (
  SELECT count(*) AS n_docs, (10 * sum(dlen)) // count(*) AS avg10 FROM lens
),
posts AS (SELECT doc_id, unnest(toks) AS token FROM tk),
hits AS (
  SELECT token, doc_id, cast(count(*) AS BIGINT) AS tf
  FROM posts WHERE token IN (SELECT DISTINCT token FROM q)
  GROUP BY token, doc_id
),
stats AS (SELECT token, count(*) AS df FROM hits GROUP BY token),
scored AS (
  SELECT q.query_id, h.doc_id,
    (cast(floor(ln(cast(2 * tot.n_docs + 2 AS DOUBLE) / (2 * s.df + 1)) * 10000)
          AS BIGINT)
     * h.tf * 22 * tot.avg10)
    // (10 * h.tf * tot.avg10 + 3 * tot.avg10 + 90 * l.dlen) AS contrib
  FROM hits h JOIN q USING (token) JOIN stats s USING (token)
       JOIN lens l USING (doc_id), tot
),
agg AS (
  SELECT query_id, doc_id, cast(sum(contrib) AS BIGINT) AS bm25_scaled,
         cast(count(*) AS BIGINT) AS n_terms_hit
  FROM scored GROUP BY query_id, doc_id
),
ranked AS (
  SELECT cast(query_id AS BIGINT) AS query_id, doc_id, bm25_scaled,
         n_terms_hit,
         cast(row_number() OVER (
           PARTITION BY query_id ORDER BY bm25_scaled DESC, doc_id ASC
         ) AS BIGINT) AS rank
  FROM agg
)
SELECT * FROM ranked WHERE rank <= 5
"""

# Substring-level duplicate spans (ops.dedup.dup_span_grams, k=8):
# 8-token sliding-window fingerprints, position flagged when its window
# occurs >=2 times corpus-wide (including intra-doc repeats)
ORACLES["dup_span_grams"] = f"""
WITH tk AS (
  SELECT doc_id,
         regexp_split_to_array(lower(trim(coalesce(text, ''))), '\\s+') AS toks
  FROM documents
),
pos AS (
  SELECT tk.doc_id,
         {portable_hash_sql("array_to_string(toks[i.i:i.i+7], ' ')")} AS gh
  FROM tk, unnest(generate_series(1, greatest(len(toks) - 7, 0))) AS i(i)
),
freq AS (SELECT gh, count(*) AS cnt FROM pos GROUP BY gh),
dup AS (
  SELECT p.doc_id, cast(count(*) AS BIGINT) AS dup_positions
  FROM pos p JOIN freq f USING (gh) WHERE f.cnt >= 2 GROUP BY p.doc_id
),
tot AS (
  SELECT doc_id, cast(greatest(len(toks) - 7, 0) AS BIGINT) AS n_grams
  FROM tk
)
SELECT t.doc_id, t.n_grams,
       cast(coalesce(d.dup_positions, 0) AS BIGINT) AS dup_positions,
       cast(CASE WHEN t.n_grams > 0
            THEN (10000 * coalesce(d.dup_positions, 0)) // t.n_grams
            END AS BIGINT) AS dup_bps
FROM tot t LEFT JOIN dup d USING (doc_id)
"""

# Efraimidis-Spirakis weighted sampling (ops.corpus.weighted_sample):
# u = ((portable_hash('es|' || doc_id) mod 2^52) + 1) / (2^52 + 1),
# key = ln(u)/w, top-15 keys per language. 2^52 = 4503599627370496; the
# 'es|' op-tag salt decorrelates the draw from the other default-seed
# hash gates.
ORACLES["weighted_sample_lang"] = f"""
WITH keyed AS (
  SELECT lang, doc_id, n_chars,
         ln((({portable_hash_sql("'es|' || cast(doc_id AS VARCHAR)")} % 4503599627370496)
             + 1) / cast(4503599627370497 AS DOUBLE))
           / cast(n_chars AS DOUBLE) AS es_key
  FROM documents WHERE n_chars > 0
),
ranked AS (
  SELECT lang, doc_id, n_chars,
         cast(row_number() OVER (
           PARTITION BY lang ORDER BY es_key DESC, doc_id ASC
         ) AS BIGINT) AS sample_rank
  FROM keyed
)
SELECT lang, doc_id, n_chars, sample_rank FROM ranked WHERE sample_rank <= 15
"""

# Train/valid/test split profile (ops.corpus.split_assign, 10%/10%):
# bucket = portable_hash('split|' || doc_id) mod 10000; <1000 test,
# <2000 valid — the op-tag salt keeps the split independent of the
# sampling gates at default seeds
ORACLES["split_assign_counts"] = f"""
WITH s AS (
  SELECT lang, n_chars, doc_id,
         ({portable_hash_sql("'split|' || cast(doc_id AS VARCHAR)")} % 10000) AS b
  FROM documents
),
a AS (
  SELECT lang,
         CASE WHEN b < 1000 THEN 'test'
              WHEN b < 2000 THEN 'valid'
              ELSE 'train' END AS split,
         n_chars, doc_id
  FROM s
)
SELECT lang, split, cast(count(*) AS BIGINT) AS n_docs,
       cast(sum(n_chars) AS BIGINT) AS sum_chars,
       cast(min(doc_id) AS BIGINT) AS min_doc_id,
       cast(max(doc_id) AS BIGINT) AS max_doc_id
FROM a GROUP BY lang, split
"""

# Per-language vocabulary statistics (ops.text.vocab_stats)
ORACLES["vocab_stats_lang"] = r"""
WITH tk AS (
  SELECT lang,
         unnest(regexp_split_to_array(lower(trim(coalesce(text, ''))), '\s+'))
           AS token
  FROM documents
),
pt AS (
  SELECT lang, token, count(*) AS ct
  FROM tk WHERE token <> '' GROUP BY lang, token
),
pg AS (
  SELECT lang, cast(sum(ct) AS BIGINT) AS n_tokens,
         cast(count(*) AS BIGINT) AS vocab,
         cast(count(*) FILTER (WHERE ct = 1) AS BIGINT) AS hapax
  FROM pt GROUP BY lang
),
nd AS (SELECT lang, cast(count(*) AS BIGINT) AS n_docs FROM documents GROUP BY lang)
SELECT nd.lang, nd.n_docs,
       coalesce(pg.n_tokens, 0) AS n_tokens,
       coalesce(pg.vocab, 0) AS vocab,
       cast(CASE WHEN coalesce(pg.n_tokens, 0) > 0
            THEN (10000 * pg.vocab) // pg.n_tokens END AS BIGINT) AS ttr_bps,
       coalesce(pg.hapax, 0) AS hapax,
       cast(CASE WHEN coalesce(pg.vocab, 0) > 0
            THEN (10000 * pg.hapax) // pg.vocab END AS BIGINT) AS hapax_bps
FROM nd LEFT JOIN pg ON nd.lang IS NOT DISTINCT FROM pg.lang
"""

# C4-style paragraph dedup (ops.dedup.paragraph_dedup): corpus-wide
# first-occurrence-wins on exact paragraph bytes, reassembled per doc.
# Input composed as body + shared boilerplate + 40-char prefix (see
# q_paragraph_dedup); '\n\n' == chr(10)chr(10)
ORACLES["paragraph_dedup"] = """
WITH d AS (
  SELECT doc_id,
    text || chr(10) || chr(10) || 'LICENSE: released under the public domain'
         || chr(10) || chr(10) || substr(text, 1, 40) AS text
  FROM documents
),
p0 AS (SELECT doc_id, string_split(coalesce(text, ''), chr(10) || chr(10)) AS ps FROM d),
pe AS (SELECT doc_id, ps, unnest(range(1, len(ps) + 1)) AS i FROM p0),
paras AS (SELECT doc_id, cast(i - 1 AS INT) AS para_idx, ps[i] AS para FROM pe),
win AS (
  SELECT doc_id, para_idx,
         row_number() OVER (PARTITION BY md5(para) ORDER BY doc_id, para_idx) AS rn
  FROM paras
),
ks AS (
  SELECT doc_id, list(para_idx ORDER BY para_idx) AS keep_idx
  FROM win WHERE rn = 1 GROUP BY doc_id
)
SELECT p0.doc_id,
  md5(coalesce(array_to_string(
    list_transform(coalesce(ks.keep_idx, []), i -> p0.ps[i + 1]),
    chr(10) || chr(10)), '')) AS text_md5,
  cast(len(coalesce(ks.keep_idx, [])) AS BIGINT) AS n_kept,
  cast(len(p0.ps) - len(coalesce(ks.keep_idx, [])) AS BIGINT) AS n_removed
FROM p0 LEFT JOIN ks USING (doc_id)
"""

# Batched ANN k-NN join (ops.similarity.knn_join): every query (vec_id <
# 100) probes its 4 best of 16 IVF cells, scores that cell subset, keeps
# top-3 by quantized dot — same tie-free ord arithmetic as ann_ivf_topk
ORACLES["ann_knn_join"] = f"""
WITH qv AS (SELECT vec_id, {_QUANT} AS q FROM embeddings),
cents AS (SELECT vec_id AS cell, q AS cv FROM qv WHERE vec_id < 16),
ascored AS (
  SELECT v.vec_id, v.q, c.cell,
         cast(list_sum(list_transform(range(1, 65), i -> v.q[i] * c.cv[i])) AS BIGINT)
           * 16 - c.cell AS ord
  FROM qv v CROSS JOIN cents c
),
assigned AS (SELECT vec_id, q, arg_max(cell, ord) AS cell FROM ascored GROUP BY vec_id, q),
queries AS (SELECT vec_id AS query_id, q AS qq FROM qv WHERE vec_id < 100),
probe AS (
  SELECT query_id, qq, cell FROM (
    SELECT qu.query_id, qu.qq, c.cell,
           row_number() OVER (PARTITION BY qu.query_id ORDER BY
             cast(list_sum(list_transform(range(1, 65), i -> c.cv[i] * qu.qq[i])) AS BIGINT)
               * 16 - c.cell DESC) AS rn
    FROM queries qu CROSS JOIN cents c
  ) WHERE rn <= 4
),
cand AS (
  SELECT p.query_id, a.vec_id,
         cast(list_sum(list_transform(range(1, 65), i -> a.q[i] * p.qq[i])) AS BIGINT) AS dot
  FROM probe p JOIN assigned a USING (cell)
  WHERE a.vec_id <> p.query_id
)
SELECT query_id, vec_id, dot, knn_rank FROM (
  SELECT query_id, vec_id, dot,
         cast(row_number() OVER (PARTITION BY query_id ORDER BY dot DESC, vec_id)
              AS BIGINT) AS knn_rank
  FROM cand
) WHERE knn_rank <= 3
"""

# chunk->doc mean pooling (ops.similarity.mean_pool): elementwise integer
# mean of each 4-vector group; floor division spelled sign-safely
ORACLES["mean_pool_embeddings"] = f"""
WITH qv AS (
  SELECT ((vec_id - vec_id % 4) // 4) AS group_id, {_QUANT} AS q
  FROM embeddings
),
pe AS (SELECT group_id, q, unnest(range(1, 65)) AS i FROM qv),
vals AS (SELECT group_id, cast(i - 1 AS BIGINT) AS pos, q[i] AS val FROM pe)
SELECT group_id, pos,
  cast((sum(val) - ((sum(val) % count(*) + count(*)) % count(*))) // count(*)
       AS BIGINT) AS pooled_val
FROM vals GROUP BY group_id, pos
"""

# KMV distinct sketch (ops.sketch.kmv_distinct, k=64): kth-min of the
# portable hash per group; estimate (k-1)*2^60 // kth_min via HUGEINT
# (the product overflows BIGINT; Spark uses decimal(38,0) div)
ORACLES["kmv_distinct_users"] = f"""
WITH h AS (
  SELECT DISTINCT event_type AS grp,
         {portable_hash_sql("cast(user_id AS VARCHAR)")} AS h
  FROM events WHERE user_id IS NOT NULL
),
r AS (SELECT grp, h, row_number() OVER (PARTITION BY grp ORDER BY h) AS rn FROM h),
t AS (SELECT grp, max(h) AS kth_min_hash, count(*) AS exact_k
      FROM r WHERE rn <= 64 GROUP BY grp)
SELECT grp AS event_type, kth_min_hash,
  CASE WHEN exact_k < 64 THEN exact_k
       ELSE cast(63 * cast({1 << 60} AS HUGEINT) // kth_min_hash AS BIGINT)
  END AS est_distinct,
  exact_k
FROM t
"""

# exact discrete percentiles via rank positions (ops.sketch
# .exact_percentiles_disc): value at 1-based rank ceil(p*n)
ORACLES["latency_percentiles"] = f"""
{_WITH_PARSED},
base AS (
  SELECT log_type AS grp, latency_ms AS val FROM parsed
  WHERE log_type IS NOT NULL AND latency_ms IS NOT NULL
),
r AS (
  SELECT grp, val,
         row_number() OVER (PARTITION BY grp ORDER BY val) AS rn,
         count(*) OVER (PARTITION BY grp) AS n
  FROM base
)
SELECT grp AS log_type,
       max(CASE WHEN rn = (5000 * n + 9999) // 10000 THEN val END) AS p50,
       max(CASE WHEN rn = (9500 * n + 9999) // 10000 THEN val END) AS p95
FROM r GROUP BY grp
"""

ORACLES["frame_sample_plan"] = """
SELECT doc_id,
       cast(unnest(generate_series(0, (doc_id * 977) % 60000, 1000)) AS BIGINT)
         AS frame_ts_ms
FROM documents WHERE doc_id % 3 = 2
"""

# ---------------------------------------------------------------------------
# Hash-dependent dedup ops — full oracles via the portable md5 hash
# (hashing.py): the identical minhash → band → bucket-cap → pair pipeline
# re-expressed in DuckDB list/lambda SQL.
# ---------------------------------------------------------------------------

# mirror of ops.dedup.shingles (n=3): split on \s+, sliding 3-gram joins,
# distinct; docs shorter than n collapse to one whole-text shingle
_SHINGLE_CTES = r"""tk AS (
  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS toks
  FROM documents
),
sh AS (
  SELECT doc_id,
    CASE WHEN len(toks) >= 3
      THEN list_distinct(list_transform(range(0, len(toks) - 2),
             i -> array_to_string(toks[i + 1 : i + 3], ' ')))
      ELSE [array_to_string(toks, ' ')] END AS sh
  FROM tk
)"""

_NUM_HASHES = 16
_BANDS = 4
_ROWS_PER_BAND = _NUM_HASHES // _BANDS
_MAX_BUCKET = 200  # ops.dedup.DEFAULT_MAX_BUCKET

_MH_COLS = ", ".join(
    f"list_min(list_transform(sh, s -> {portable_hash_sql('s', k)})) AS mh_{k}"
    for k in range(_NUM_HASHES)
)

_SIGS_CTE = f"sigs AS (SELECT doc_id, {_MH_COLS} FROM sh)"

ORACLES["minhash_signatures"] = f"""
WITH {_SHINGLE_CTES}, {_SIGS_CTE}
SELECT * FROM sigs
"""


def _band_hash_sql(b: int) -> str:
    # mirror of ops.dedup band_hash (md5 hasher): portable hash of the
    # '|'-joined decimal strings of the band's minhash values, seed 0
    joined = ", '|', ".join(
        f"cast(mh_{b * _ROWS_PER_BAND + r} AS VARCHAR)" for r in range(_ROWS_PER_BAND)
    )
    return portable_hash_sql(f"concat({joined})", 0)


_BANDED_CTE = "banded AS (\n" + "\n  UNION ALL\n".join(
    f"  SELECT doc_id, {b} AS band_id, {_band_hash_sql(b)} AS band_hash FROM sigs"
    for b in range(_BANDS)
) + "\n)"

# bucket-width cap before the self-join (ops.dedup.DEFAULT_MAX_BUCKET)
_CAPPED_CTE = f"""capped AS (
  SELECT doc_id, band_id, band_hash FROM (
    SELECT *, count(*) OVER (PARTITION BY band_id, band_hash) AS bw FROM banded
  ) WHERE bw <= {_MAX_BUCKET}
)"""

_PAIRS_SQL = """SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM capped a JOIN capped b
  ON a.band_id = b.band_id AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id"""

ORACLES["lsh_candidate_pairs"] = f"""
WITH {_SHINGLE_CTES}, {_SIGS_CTE}, {_BANDED_CTE}, {_CAPPED_CTE}
{_PAIRS_SQL}
"""

# incremental dedup (ops.dedup.dedup_incremental): new batch (doc_id%5=0)
# vs the standing signature table built from the rest — exact-fp match or
# lower-batch-id intra dup flags exact; distinct standing docs sharing an
# LSH band count as bucket hits; survivor = neither
ORACLES["dedup_incremental"] = f"""
WITH {_SHINGLE_CTES}, {_SIGS_CTE}, {_BANDED_CTE},
fp AS (
  SELECT doc_id,
         md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fp
  FROM documents
),
new_fp AS (SELECT * FROM fp WHERE doc_id % 5 = 0),
std_fp AS (SELECT DISTINCT fp FROM fp WHERE doc_id % 5 <> 0),
new_b AS (SELECT * FROM banded WHERE doc_id % 5 = 0),
std_b AS (SELECT * FROM banded WHERE doc_id % 5 <> 0),
exact AS (
  SELECT n.doc_id,
    (n.fp IN (SELECT fp FROM std_fp)
     OR n.doc_id > min(n.doc_id) OVER (PARTITION BY n.fp)) AS is_dup
  FROM new_fp n
),
hits AS (
  SELECT nb.doc_id, count(DISTINCT sb.doc_id) AS n_bucket_hits
  FROM new_b nb JOIN std_b sb
    ON nb.band_id = sb.band_id AND nb.band_hash = sb.band_hash
  GROUP BY nb.doc_id
)
SELECT e.doc_id, cast(e.is_dup AS INT) AS is_exact_dup,
  cast(coalesce(h.n_bucket_hits, 0) AS BIGINT) AS n_bucket_hits,
  cast((NOT e.is_dup AND coalesce(h.n_bucket_hits, 0) = 0) AS INT) AS survives
FROM exact e LEFT JOIN hits h USING (doc_id)
"""

# exact n-gram Jaccard on LSH survivors; integer-exact jaccard10k
ORACLES["ngram_jaccard_pairs"] = f"""
WITH {_SHINGLE_CTES}, {_SIGS_CTE}, {_BANDED_CTE}, {_CAPPED_CTE},
pairs AS ({_PAIRS_SQL})
SELECT doc_a, doc_b, jaccard10k FROM (
  SELECT p.doc_a, p.doc_b,
    cast((len(list_intersect(a.sh, b.sh)) * 10000)
         // len(list_distinct(list_concat(a.sh, b.sh))) AS BIGINT) AS jaccard10k
  FROM pairs p
  JOIN sh a ON a.doc_id = p.doc_a
  JOIN sh b ON b.doc_id = p.doc_b
)
WHERE jaccard10k >= 3000
"""


def _simhash_oracle(bits: int = 16) -> str:
    """mirror of ops.dedup.simhash (md5 hasher): per distinct token t,
    bit i of portable_hash(t) votes +1/-1; sign of the vote sum is bit i
    of the signature."""
    tok_hash = portable_hash_sql("t", 0)
    terms = []
    for i in range(bits):
        weight = 2**i if i < 63 else -(2**63)
        terms.append(
            f"(CASE WHEN list_sum(list_transform(hv, h -> "
            f"CASE WHEN ((h >> {i}) & 1) = 1 THEN 1 ELSE -1 END)) > 0 "
            f"THEN {weight} ELSE 0 END)"
        )
    packed = " + ".join(terms)
    return f"""
WITH toks AS (
  SELECT doc_id,
         list_distinct(regexp_split_to_array(lower(trim(text)), '\\s+')) AS tk
  FROM documents
),
hs AS (SELECT doc_id, list_transform(tk, t -> {tok_hash}) AS hv FROM toks)
SELECT doc_id, cast({packed} AS BIGINT) AS simhash FROM hs
"""


ORACLES["simhash_docs"] = _simhash_oracle(16)

# ---------------------------------------------------------------------------
# Multimodal plumbing: the fake decode is deterministic arithmetic over the
# payload bytes, so even the mapInPandas path gets a full value oracle
# (byte sum via hex-pair parsing of the UTF-8 blob).
# ---------------------------------------------------------------------------

ORACLES["multimodal_features"] = """
WITH m AS (
  SELECT doc_id,
         (['image', 'audio', 'video'])[cast(doc_id % 3 AS INT) + 1] AS media_type,
         encode(text) AS payload
  FROM documents
),
f AS (
  SELECT doc_id, media_type,
         cast(coalesce(octet_length(payload), 0) AS BIGINT) AS n_bytes,
         cast(coalesce(list_sum(list_transform(range(0, octet_length(payload)),
              i -> cast(concat('0x', substr(hex(payload), 2 * i + 1, 2)) AS INT))), 0)
           AS BIGINT) AS checksum
  FROM m
)
SELECT doc_id, media_type, n_bytes, checksum,
       to_json(list_transform(range(1, 9),
               k -> cast((k * (checksum + 1)) % 997 AS INT))) AS feat_q
FROM f
"""


# ---------------------------------------------------------------------------
# Round 2: cluster assignment, temporal joins, corpus stats
# ---------------------------------------------------------------------------

# connected components of the LSH pair graph via recursive CTE: min label
# reachable = cluster id (independent formulation vs Spark's iterative
# hash-to-min label propagation)
ORACLES["dedup_clusters"] = f"""
WITH RECURSIVE {_SHINGLE_CTES}, {_SIGS_CTE}, {_BANDED_CTE}, {_CAPPED_CTE},
pairs AS ({_PAIRS_SQL}),
edges AS (
  SELECT doc_a AS s, doc_b AS d FROM pairs
  UNION
  SELECT doc_b AS s, doc_a AS d FROM pairs
),
reach(node, label) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.s, r.label FROM edges e JOIN reach r ON e.d = r.node
)
SELECT node AS doc_id, min(label) AS cluster_id,
       CASE WHEN node = min(label) THEN 1 ELSE 0 END AS is_canonical
FROM reach GROUP BY node
"""

ORACLES["heavy_hitter_tokens"] = r"""
SELECT token, cnt FROM (
  SELECT token, count(*) AS cnt
  FROM (
    SELECT unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS token
    FROM documents
  )
  WHERE token <> ''
  GROUP BY token
)
ORDER BY cnt DESC, token ASC
LIMIT 50
"""

ORACLES["gopher_quality"] = f"""
WITH q AS (
  SELECT doc_id,
    cast(CASE WHEN length(trim(text)) = 0 THEN 0
         ELSE length(regexp_split_to_array(trim(text), '\\s+')) END AS BIGINT) AS n_tokens,
    cast(length(regexp_replace(text, '\\s', '', 'g')) AS BIGINT) AS non_space,
    length(text) AS n_chars,
    length(text) - length(regexp_replace(text, '[#…]', '', 'g')) AS symbols,
    cast({_STOP_HITS} AS BIGINT) AS stop_hits
  FROM documents
), m AS (
  SELECT doc_id, n_tokens,
    cast(CASE WHEN n_tokens = 0 THEN 0
         ELSE floor((non_space * 10000) / n_tokens) END AS BIGINT) AS mean_word_len10k,
    cast(CASE WHEN n_chars = 0 THEN 0
         ELSE floor(symbols * 1.0 / n_chars * 10000) END AS BIGINT) AS symbol_ratio10k,
    stop_hits
  FROM q
)
SELECT doc_id, n_tokens, mean_word_len10k, symbol_ratio10k,
  cast((CASE WHEN n_tokens < 5 OR n_tokens > 100000 THEN 1 ELSE 0 END)
     + 2 * (CASE WHEN mean_word_len10k < 20000 OR mean_word_len10k > 120000 THEN 1 ELSE 0 END)
     + 4 * (CASE WHEN symbol_ratio10k > 1000 THEN 1 ELSE 0 END)
     + 8 * (CASE WHEN stop_hits < 1 THEN 1 ELSE 0 END) AS BIGINT) AS flags,
  CASE WHEN (CASE WHEN n_tokens < 5 OR n_tokens > 100000 THEN 1 ELSE 0 END)
          + (CASE WHEN mean_word_len10k < 20000 OR mean_word_len10k > 120000 THEN 1 ELSE 0 END)
          + (CASE WHEN symbol_ratio10k > 1000 THEN 1 ELSE 0 END)
          + (CASE WHEN stop_hits < 1 THEN 1 ELSE 0 END) = 0 THEN 1 ELSE 0 END AS keep
FROM m
"""

ORACLES["conv_rollup"] = f"""
WITH {TURNS_CTE},
conv AS (
  SELECT conv_id,
    count(*) AS n_turns,
    count(DISTINCT role) AS n_roles,
    count(DISTINCT tool) AS n_tools,
    cast(floor(epoch(max(ts))) - floor(epoch(min(ts))) AS BIGINT) AS span_sec
  FROM turns GROUP BY conv_id
)
SELECT n_turns,
  count(*) AS n_convs,
  cast(sum(n_roles) AS BIGINT) AS sum_roles,
  cast(sum(n_tools) AS BIGINT) AS sum_tools,
  max(span_sec) AS max_span_sec
FROM conv GROUP BY n_turns
"""

# DuckDB's native ASOF LEFT JOIN — an independent engine-level formulation
# of the same semantics as relational.asof_join's union-tag-window plan
ORACLES["asof_last_purchase"] = """
WITH e AS (
  SELECT event_id, user_id, event_type,
         cast(floor(epoch(ts)) AS BIGINT) AS es
  FROM events
),
p AS (
  SELECT user_id, es AS pes, max(event_id) AS purchase_id
  FROM e WHERE event_type = 'purchase' GROUP BY user_id, es
)
SELECT e.event_id, e.user_id, e.es,
       p.pes AS last_purchase_es,
       p.purchase_id AS last_purchase_id
FROM e ASOF LEFT JOIN p
  ON e.user_id = p.user_id AND p.pes <= e.es
"""

# plain inequality self-join (DuckDB IEJoin) vs Spark's bucketed equi-join
ORACLES["range_prior_hour"] = """
WITH e AS (
  SELECT event_id, user_id, cast(floor(epoch(ts)) AS BIGINT) AS es FROM events
)
SELECT a.event_id, a.user_id, a.es, count(b.event_id) AS n_prior_1h
FROM e a LEFT JOIN e b
  ON b.user_id = a.user_id AND b.es >= a.es - 3600 AND b.es < a.es
GROUP BY a.event_id, a.user_id, a.es
"""

# expected header fields recomputed arithmetically — verifies the binary
# frame/parse round-trip (ops.multimodal.frame_payload/parse_media_header)
ORACLES["media_header_parse"] = """
SELECT doc_id,
  CASE cast(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
       ELSE 'video' END AS media_type,
  cast(1 AS INT) AS magic_ok,
  cast((doc_id * 37) % 1920 + 1 AS BIGINT) AS hdr_width,
  cast((doc_id * 53) % 1080 + 1 AS BIGINT) AS hdr_height,
  cast(octet_length(encode(text)) AS BIGINT) AS body_bytes
FROM documents
"""


# Real container codecs (ops.multimodal attach_container_media →
# parse_container_header): every field recomputed arithmetically from
# doc_id — the Spark side must round-trip genuine PNG/GIF/BMP/WAV bytes
# to these exact values. Header sizes: PNG signature+IHDR = 33, GIF89a
# screen descriptor = 13, BMP file+info header = 54, RIFF/WAVE header = 44.
ORACLES["media_container_headers"] = """
SELECT doc_id,
  CASE cast(doc_id % 4 AS INT) WHEN 0 THEN 'png' WHEN 1 THEN 'gif'
       WHEN 2 THEN 'bmp' ELSE 'wav' END AS container,
  CASE WHEN doc_id % 4 IN (0, 1, 2)
       THEN cast((doc_id * 37) % 1920 + 1 AS BIGINT) END AS width,
  CASE WHEN doc_id % 4 IN (0, 1, 2)
       THEN cast((doc_id * 53) % 1080 + 1 AS BIGINT) END AS height,
  CASE WHEN doc_id % 4 = 3 THEN cast(doc_id % 2 + 1 AS BIGINT) END AS channels,
  CASE WHEN doc_id % 4 = 3 THEN cast(
    CASE cast((doc_id * 7) % 4 AS INT) WHEN 0 THEN 8000 WHEN 1 THEN 16000
         WHEN 2 THEN 22050 ELSE 44100 END AS BIGINT) END AS sample_rate,
  cast(octet_length(encode(text)) +
    CASE cast(doc_id % 4 AS INT) WHEN 0 THEN 33 WHEN 1 THEN 13
         WHEN 2 THEN 54 ELSE 44 END AS BIGINT) AS total_bytes
FROM documents
"""


# MERGE semantics: anti-join + union-all, projected to hashable columns
ORACLES["merge_docs_upsert"] = """
WITH u AS (
  SELECT doc_id, concat('v2 ', text) AS text, lang, source, n_chars
  FROM documents WHERE doc_id % 7 = 0
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, text, lang, source, n_chars
  FROM documents WHERE doc_id % 13 = 0
),
m AS (
  SELECT d.doc_id, d.text, d.lang, d.source, d.n_chars FROM documents d
  WHERE NOT EXISTS (SELECT 1 FROM u WHERE u.doc_id = d.doc_id)
  UNION ALL
  SELECT doc_id, text, lang, source, n_chars FROM u
)
SELECT doc_id, md5(text) AS text_md5, lang, source, n_chars FROM m
"""

# greedy cumulative-sum bin packing per (lang) partition
ORACLES["compaction_plan"] = """
WITH files AS (
  SELECT lang, source, cast(sum(octet_length(encode(text))) AS BIGINT) AS bytes
  FROM documents GROUP BY lang, source
)
SELECT lang, source, bytes,
  cast(floor((sum(bytes) OVER (
      PARTITION BY lang ORDER BY bytes DESC, source ASC
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
    ) - bytes) / 4096.0) AS BIGINT) AS bin
FROM files
"""

# Q9-shape profit: six-table join over the full dimension space; profit =
# revenue minus a retail-price-based cost proxy (the synthetic schema has
# no partsupp/ps_supplycost), in exact integer cents
ORACLES["tpch_q9_profit"] = """
SELECT r.r_name, n.n_name AS nation,
  cast(year(o.o_orderdate) AS BIGINT) AS o_year,
  cast(sum(round((l.l_extendedprice * (1 - l.l_discount)
                  - p.p_retailprice * l.l_quantity) * 100)) AS BIGINT)
    AS profit_cents,
  count(*) AS n_items
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE p.p_name LIKE '%red%'
GROUP BY r.r_name, n.n_name, year(o.o_orderdate)
"""

ORACLES["tpch_q3"] = """
SELECT l_orderkey, o_orderpriority, revenue_cents FROM (
  SELECT l.l_orderkey, o.o_orderpriority,
    cast(sum(round(l.l_extendedprice * (1 - l.l_discount) * 100)) AS BIGINT)
      AS revenue_cents
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  WHERE c.c_mktsegment = 'BUILDING'
    AND o.o_orderdate < TIMESTAMP '1998-01-01'
    AND l.l_shipdate > TIMESTAMP '1996-06-30'
  GROUP BY l.l_orderkey, o.o_orderpriority
)
ORDER BY revenue_cents DESC, l_orderkey ASC
LIMIT 10
"""


# PII redaction: the SQL is GENERATED from ops.text.REDACTIONS, so the
# pattern list and application order cannot drift between engines
def _staged_redact_exprs(base: str) -> tuple[str, str]:
    """(chained-replace expr, exact staged count expr) over ``base`` —
    pattern i's matches are counted on the (i-1)-times-replaced text,
    mirroring ops.text.redact_pii's F.regexp_count loop exactly (so
    pre-existing literal tags in the input are NOT counted, and chained
    replacements are counted once per stage that fired)."""
    from .ops.text import REDACTIONS

    expr = base
    terms = []
    for pat, tag in REDACTIONS.items():
        terms.append(f"len(regexp_extract_all({expr}, '{pat}'))")
        expr = f"regexp_replace({expr}, '{pat}', '{tag}', 'g')"
    return expr, " + ".join(terms)


def _redact_sql() -> str:
    expr, counts = _staged_redact_exprs("text")
    return f"""
SELECT doc_id, {expr} AS clean_text, cast({counts} AS BIGINT) AS n_redacted
FROM documents
"""


ORACLES["redact_pii"] = _redact_sql()

ORACLES["repetition_ratio"] = r"""
WITH l AS (
  SELECT doc_id,
    cast(len(regexp_split_to_array(text, '\n')) AS BIGINT) AS n_lines,
    cast(len(list_distinct(regexp_split_to_array(text, '\n'))) AS BIGINT) AS n_distinct
  FROM documents
)
SELECT doc_id, n_lines,
  cast(CASE WHEN n_lines = 0 THEN 0
       ELSE floor((n_lines - n_distinct) * 1.0 / n_lines * 10000) END AS BIGINT)
    AS dup_line_ratio10k
FROM l
"""


# direct GROUP BY — proves the two-stage salted aggregation is equivalent
ORACLES["salted_role_counts"] = f"""
WITH {TURNS_CTE}
SELECT role, count(*) AS cnt FROM turns GROUP BY role
"""

# daily KMV sketches merged to event_type — same k-min arithmetic in SQL
ORACLES["kmv_rollup_users"] = f"""
WITH base AS (
  SELECT DISTINCT event_type,
         cast(floor(epoch(ts) / 86400) AS BIGINT) AS day,
         {portable_hash_sql("cast(user_id AS VARCHAR)")} AS h
  FROM events WHERE user_id IS NOT NULL
),
fine_k AS (
  SELECT event_type, day, h FROM (
    SELECT *, row_number() OVER (PARTITION BY event_type, day ORDER BY h) AS rn
    FROM base
  ) WHERE rn <= 64
),
u AS (SELECT DISTINCT event_type, h FROM fine_k),
m AS (
  SELECT event_type, h,
         row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
  FROM u
),
kth AS (
  SELECT event_type, max(CASE WHEN rn = 64 THEN h END) AS kth,
         count(*) AS n_seen
  FROM m WHERE rn <= 64 GROUP BY event_type
)
SELECT event_type,
  cast(CASE WHEN n_seen < 64 THEN n_seen
       ELSE cast(63 * cast({1 << 60} AS HUGEINT) // kth AS BIGINT)
  END AS BIGINT) AS est_distinct
FROM kth
"""


def _curation_sql() -> str:
    """Independent SQL re-derivation of ops.curation.curate (md5 hasher):
    gopher keep → redact → exact dedup → minhash/LSH/cap/pairs → recursive
    connected components → canonical survivors."""
    red_expr, red_counts = _staged_redact_exprs("d.text")
    return f"""
WITH RECURSIVE
gq AS (
  SELECT doc_id FROM (
    SELECT doc_id,
      CASE WHEN length(trim(text)) = 0 THEN 0
           ELSE length(regexp_split_to_array(trim(text), '\\s+')) END AS n_tokens,
      length(regexp_replace(text, '\\s', '', 'g')) AS non_space,
      length(text) AS n_chars,
      length(text) - length(regexp_replace(text, '[#…]', '', 'g')) AS symbols,
      ({_STOP_HITS}) AS stop_hits
    FROM documents
  )
  WHERE n_tokens BETWEEN 5 AND 100000
    AND (CASE WHEN n_tokens = 0 THEN 0
         ELSE floor((non_space * 10000) / n_tokens) END) BETWEEN 20000 AND 120000
    AND (CASE WHEN n_chars = 0 THEN 0
         ELSE floor(symbols * 1.0 / n_chars * 10000) END) <= 1000
    AND stop_hits >= 1
),
redc AS (
  SELECT d.doc_id, {red_expr} AS text,
         cast({red_counts} AS BIGINT) AS n_redacted
  FROM documents d JOIN gq USING (doc_id)
),
fp AS (
  SELECT doc_id, text, n_redacted,
         md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS f
  FROM redc
),
winners AS (SELECT min(doc_id) AS doc_id FROM fp GROUP BY f),
clean AS (SELECT fp.doc_id, fp.text, fp.n_redacted FROM fp JOIN winners USING (doc_id)),
tk AS (
  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS toks FROM clean
),
sh AS (
  SELECT doc_id,
    CASE WHEN len(toks) >= 3
      THEN list_distinct(list_transform(range(0, len(toks) - 2),
             i -> array_to_string(toks[i + 1 : i + 3], ' ')))
      ELSE [array_to_string(toks, ' ')] END AS sh
  FROM tk
),
{_SIGS_CTE},
{_BANDED_CTE},
{_CAPPED_CTE},
pairs AS ({_PAIRS_SQL}),
edges AS (
  SELECT doc_a AS s, doc_b AS d FROM pairs
  UNION
  SELECT doc_b AS s, doc_a AS d FROM pairs
),
reach(node, label) AS (
  SELECT doc_id, doc_id FROM clean
  UNION
  SELECT e.s, r.label FROM edges e JOIN reach r ON e.d = r.node
),
cc AS (SELECT node AS doc_id, min(label) AS cluster_id FROM reach GROUP BY node)
SELECT c.doc_id, md5(c.text) AS text_md5, c.n_redacted
FROM clean c JOIN cc ON cc.doc_id = c.doc_id AND cc.doc_id = cc.cluster_id
"""


ORACLES["curation_pipeline"] = _curation_sql()


# salted join must equal the plain join — same oracle text as the
# sort-merge formulation (the equivalence IS the assertion)
ORACLES["salted_join_revenue"] = ORACLES["join_sort_merge_revenue"]


# sliding windows: each event lands in exactly 5 one-minute-aligned
# 5-minute windows — re-derived by exploding the per-event minute series
ORACLES["sliding_rate_counts"] = f"""
WITH {TURNS_CTE},
ev AS (SELECT role, cast(floor(epoch(ts)) AS BIGINT) AS es FROM turns),
wins AS (
  SELECT role,
         unnest(generate_series((es // 60) * 60 - 240, (es // 60) * 60, 60))
           AS window_start
  FROM ev
)
SELECT role, window_start, count(*) AS cnt
FROM wins GROUP BY role, window_start
"""

# native session_window vs an independent lag/cumsum sessionization:
# a session closes when the next turn is >= 30 min after the previous one
# (Spark's [start, last+gap) interval semantics), full-precision timestamps
ORACLES["session_window_counts"] = f"""
WITH {TURNS_CTE},
o AS (
  SELECT conv_id, ts,
    CASE WHEN lag(ts) OVER w IS NULL THEN 1
         WHEN ts - lag(ts) OVER w >= INTERVAL 1800 SECOND THEN 1
         ELSE 0 END AS newflag
  FROM turns
  WINDOW w AS (PARTITION BY conv_id ORDER BY ts, turn_idx)
),
s AS (
  SELECT conv_id, ts,
         sum(newflag) OVER (PARTITION BY conv_id ORDER BY ts
                            ROWS UNBOUNDED PRECEDING) AS sess
  FROM o
)
SELECT conv_id,
       cast(floor(epoch(min(ts))) AS BIGINT) AS session_start,
       count(*) AS n_turns
FROM s GROUP BY conv_id, sess
"""


# SQ8 two-stage ANN: int8-grid coarse pass over everything, exact
# quantized rerank on the top-50 coarse candidates
_SQ8 = (
    "list_transform(embedding, x -> cast(greatest(-127, least(127, "
    "floor(cast(x AS DOUBLE) * 127))) AS BIGINT))"
)

ORACLES["sq8_rerank_topk"] = f"""
WITH v AS (SELECT vec_id, {_SQ8} AS q8, {_QUANT} AS q FROM embeddings),
b AS (SELECT q8, q FROM v WHERE vec_id = 0),
coarse AS (
  SELECT e.vec_id, e.q,
         cast(list_sum(list_transform(range(1, 65), i -> e.q8[i] * b.q8[i]))
              AS BIGINT) AS approx
  FROM v e, b
  WHERE e.vec_id <> 0
  ORDER BY approx DESC, e.vec_id
  LIMIT 50
)
SELECT vec_id, dot FROM (
  SELECT c.vec_id,
         cast(list_sum(list_transform(range(1, 65), i -> c.q[i] * b.q[i]))
              AS BIGINT) AS dot
  FROM coarse c, b
)
ORDER BY dot DESC, vec_id
LIMIT 10
"""


# SCD2 validity intervals via lead over (customer, orderdate, orderkey)
ORACLES["scd2_order_intervals"] = """
SELECT o_custkey, o_orderkey, o_orderstatus,
  cast(floor(epoch(o_orderdate)) AS BIGINT) AS valid_from,
  cast(floor(epoch(lead(o_orderdate) OVER
    (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey))) AS BIGINT)
    AS valid_to
FROM orders
"""


ORACLES["tpch_q5_region_revenue"] = """
SELECT n.n_name,
  cast(sum(round(l.l_extendedprice * (1 - l.l_discount) * 100)) AS BIGINT)
    AS revenue_cents,
  count(*) AS n_items
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
GROUP BY n.n_name
"""


# ---------------------------------------------------------------------------
# Corpus-preparation ops (ops/corpus.py) — round 3
# ---------------------------------------------------------------------------

# fixed-token chunking (chunk_tokens=32, overlap=8 -> stride=24): every
# chunk re-derived by 1-based inclusive list slicing
ORACLES["chunk_documents"] = r"""
WITH tk AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
  FROM documents
),
c AS (
  SELECT doc_id, toks,
         cast(ceil(greatest(len(toks) - 8, 1) / 24.0) AS INT) AS n_chunks
  FROM tk
),
ex AS (
  SELECT doc_id, toks,
         unnest(generate_series(0, n_chunks - 1)) AS ci
  FROM c
)
SELECT doc_id, cast(ci AS BIGINT) AS chunk_idx,
       array_to_string(toks[ci*24+1 : ci*24+32], ' ') AS chunk_text,
       cast(len(toks[ci*24+1 : ci*24+32]) AS BIGINT) AS n_chunk_tokens
FROM ex
"""

# per-language hash-gated mixing rates: en 50%, zh 25%, else 10%
ORACLES["stratified_sample_lang"] = f"""
SELECT doc_id, lang, source FROM documents
WHERE ({portable_hash_sql("cast(doc_id AS VARCHAR)")} % 10000) <
  CASE lang WHEN 'en' THEN 5000 WHEN 'zh' THEN 2500 ELSE 1000 END
"""

# benchmark contamination: distinct word-3-gram portable hashes per side,
# df-capped (>100 benchmark docs) equi-join, shared-gram counts per pair
ORACLES["contamination_pairs"] = f"""
WITH tk AS (
  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS toks
  FROM documents
),
grams AS (
  SELECT doc_id,
    unnest(CASE WHEN len(toks) >= 3
      THEN list_distinct(list_transform(range(0, len(toks) - 3 + 1),
             i -> array_to_string(toks[i+1 : i+3], ' ')))
      ELSE [array_to_string(toks, ' ')] END) AS gram
  FROM tk
),
hashed AS (
  SELECT doc_id, {portable_hash_sql("gram")} AS gram_hash FROM grams WHERE gram <> ''
),
bench AS (SELECT doc_id AS bench_id, gram_hash FROM hashed WHERE doc_id % 7 = 0),
busy AS (SELECT gram_hash FROM bench GROUP BY gram_hash HAVING count(*) > 100),
bench_ok AS (
  SELECT * FROM bench WHERE gram_hash NOT IN (SELECT gram_hash FROM busy)
),
cand AS (SELECT doc_id, gram_hash FROM hashed WHERE doc_id % 7 <> 0)
SELECT c.doc_id, b.bench_id, count(*) AS n_shared_grams
FROM cand c JOIN bench_ok b USING (gram_hash)
GROUP BY c.doc_id, b.bench_id
"""


# Decontamination verdicts (ops.corpus.decontaminate): the pairs join
# above re-keyed to a per-candidate keep flag (no benchmark doc shares
# >= 2 word 3-grams)
ORACLES["decontaminate_corpus"] = f"""
WITH tk AS (
  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS toks
  FROM documents
),
grams AS (
  SELECT doc_id,
    unnest(CASE WHEN len(toks) >= 3
      THEN list_distinct(list_transform(range(0, len(toks) - 3 + 1),
             i -> array_to_string(toks[i+1 : i+3], ' ')))
      ELSE [array_to_string(toks, ' ')] END) AS gram
  FROM tk
),
hashed AS (
  SELECT doc_id, {portable_hash_sql("gram")} AS gram_hash FROM grams WHERE gram <> ''
),
bench AS (SELECT doc_id AS bench_id, gram_hash FROM hashed WHERE doc_id % 7 = 0),
busy AS (SELECT gram_hash FROM bench GROUP BY gram_hash HAVING count(*) > 100),
bench_ok AS (
  SELECT * FROM bench WHERE gram_hash NOT IN (SELECT gram_hash FROM busy)
),
cand AS (SELECT doc_id, gram_hash FROM hashed WHERE doc_id % 7 <> 0),
pairs AS (
  SELECT c.doc_id, b.bench_id, count(*) AS n_shared
  FROM cand c JOIN bench_ok b USING (gram_hash)
  GROUP BY c.doc_id, b.bench_id
),
ev AS (
  SELECT doc_id, cast(count(*) AS BIGINT) AS n_bench_hits,
         cast(max(n_shared) AS BIGINT) AS max_shared_grams
  FROM pairs WHERE n_shared >= 2 GROUP BY doc_id
)
SELECT d.doc_id, d.lang,
       coalesce(ev.n_bench_hits, 0) AS n_bench_hits,
       coalesce(ev.max_shared_grams, 0) AS max_shared_grams,
       ev.n_bench_hits IS NULL AS keep
FROM (SELECT doc_id, lang FROM documents WHERE doc_id % 7 <> 0) d
LEFT JOIN ev USING (doc_id)
"""


# ranking breadth: ntile(4) + floored percent_rank, unique tie-break
ORACLES["order_quartiles"] = """
SELECT o_orderkey, o_orderpriority,
  cast(round(o_totalprice * 100) AS BIGINT) AS total_cents,
  cast(ntile(4) OVER w AS BIGINT) AS quartile,
  cast(floor(percent_rank() OVER w * 10000) AS BIGINT) AS pr10k
FROM orders
WINDOW w AS (PARTITION BY o_orderpriority
             ORDER BY cast(round(o_totalprice * 100) AS BIGINT), o_orderkey)
"""

# pivot->unpivot round trip: long (role, level, cnt) with explicit zeros
ORACLES["unpivot_level_counts"] = f"""
{_WITH_PARSED},
lv AS (SELECT unnest(['INFO', 'WARN', 'ERROR']) AS level),
roles AS (SELECT DISTINCT role FROM parsed),
cnts AS (
  SELECT role, level, count(*) AS c FROM parsed
  WHERE level IN ('INFO', 'WARN', 'ERROR') GROUP BY role, level
)
SELECT r.role, l.level, coalesce(c.c, 0) AS cnt
FROM roles r CROSS JOIN lv l
LEFT JOIN cnts c ON c.role = r.role AND c.level = l.level
"""

# ---------------------------------------------------------------------------
# round-4 (late): sequence packing + TPC-H decorrelation breadth
# ---------------------------------------------------------------------------

# concat-and-split packing (ops.corpus.pack_sequences, budget 512): global
# token-tape offsets under the deterministic hash-shuffled order. The
# oracle's single global window equals the engine's bucketed prefix sum
# exactly because bucket ranges are contiguous in the hash order.
ORACLES["pack_sequences"] = rf"""
WITH t AS (
  SELECT doc_id,
    cast(CASE WHEN length(trim(coalesce(text, ''))) = 0 THEN 0
         ELSE length(regexp_split_to_array(trim(text), '\s+')) END AS BIGINT)
      AS n_tokens,
    {portable_hash_sql("cast(doc_id AS VARCHAR)")} AS h
  FROM documents
),
o AS (
  SELECT doc_id, n_tokens,
    cast(coalesce(sum(n_tokens) OVER (ORDER BY h, doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
      AS tok_offset
  FROM t
)
SELECT doc_id, n_tokens, tok_offset,
  cast(tok_offset // 512 AS BIGINT) AS first_seq,
  cast(tok_offset % 512 AS BIGINT) AS pos_in_first_seq,
  cast((tok_offset + greatest(n_tokens, 1) - 1) // 512 AS BIGINT) AS last_seq,
  cast((tok_offset + greatest(n_tokens, 1) - 1) // 512
       - tok_offset // 512 + 1 AS BIGINT) AS n_seqs
FROM o
"""

# TPC-H Q4 shape: EXISTS via semi join (returnflag R = qualifying lineitem)
ORACLES["tpch_q4"] = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate < TIMESTAMP '1997-01-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
GROUP BY o_orderpriority
"""

# TPC-H Q6: pure filter+agg; revenue exact as cents x discount-percent
ORACLES["tpch_q6"] = """
SELECT
  cast(sum(cast(round(l_extendedprice * 100) AS BIGINT)
           * cast(round(l_discount * 100) AS BIGINT)) AS BIGINT)
    AS revenue_cents_x100,
  count(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND cast(round(l_discount * 100) AS BIGINT) BETWEEN 5 AND 7
  AND l_quantity < 24
"""

# TPC-H Q12 shape: fact-fact join + CASE-WHEN conditional counts
ORACLES["tpch_q12"] = """
SELECT l_returnflag,
  cast(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
  cast(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY l_returnflag
"""

# TPC-H Q16 shape: anti-join supplier blacklist + count distinct over the
# observed lineitem (part, supplier) association
ORACLES["tpch_q16"] = """
WITH assoc AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
SELECT p_brand, p_type, p_size,
       cast(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM assoc
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1'
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
"""

# TPC-H Q21 shape: EXISTS + NOT-EXISTS decorrelated to flag rollups —
# supplier with an R lineitem on a >=2-supplier order where nobody else
# flagged R
ORACLES["tpch_q21"] = """
WITH per_os AS (
  SELECT l_orderkey, l_suppkey,
         max(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS has_r
  FROM lineitem GROUP BY l_orderkey, l_suppkey
),
per_o AS (
  SELECT l_orderkey, count(*) AS n_supp, sum(has_r) AS n_r_supp
  FROM per_os GROUP BY l_orderkey
)
SELECT s_name, count(*) AS numwait
FROM per_os
JOIN per_o USING (l_orderkey)
JOIN supplier ON l_suppkey = s_suppkey
WHERE has_r = 1 AND n_supp >= 2 AND n_r_supp = 1
GROUP BY s_name
"""

# TPC-H Q22 shape: decorrelated scalar avg (integer-exact: bal*cnt > sum)
# + NOT EXISTS anti-join on orders
ORACLES["tpch_q22"] = """
WITH seg AS (
  SELECT * FROM customer
  WHERE c_mktsegment IN ('AUTOMOBILE', 'MACHINERY', 'BUILDING')
),
avgpos AS (
  SELECT cast(sum(cast(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
         count(*) AS cnt
  FROM seg WHERE c_acctbal > 0
)
SELECT c_mktsegment, count(*) AS numcust,
       cast(sum(cast(round(c_acctbal * 100) AS BIGINT)) AS BIGINT)
         AS totacctbal_cents
FROM seg, avgpos
WHERE cast(round(c_acctbal * 100) AS BIGINT) * cnt > sum_cents
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderpriority = '1-URGENT')
GROUP BY c_mktsegment
"""

# ---------------------------------------------------------------------------
# round-4 (final): TPC-H complete — the remaining nine shapes.
# partsupp stand-in (Q2/Q11/Q20): the observed lineitem (partkey, suppkey)
# association; supplycost_cents = cheapest observed line price.
# ---------------------------------------------------------------------------

_DERIVED_PARTSUPP = """
ps AS (
  SELECT l_partkey, l_suppkey,
         cast(min(cast(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
           AS supplycost_cents
  FROM lineitem GROUP BY l_partkey, l_suppkey
)
"""

ORACLES["tpch_q2"] = f"""
WITH {_DERIVED_PARTSUPP},
joined AS (
  SELECT cast(round(s.s_acctbal * 100) AS BIGINT) AS s_acctbal_cents,
         s.s_name, n.n_name, p.p_partkey, p.p_brand, ps.supplycost_cents,
         min(ps.supplycost_cents) OVER (PARTITION BY p.p_partkey)
           AS min_cost_cents
  FROM ps
  JOIN part p ON ps.l_partkey = p.p_partkey
  JOIN supplier s ON ps.l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  WHERE p.p_size <= 25 AND p.p_type = 'LARGE' AND r.r_name = 'EUROPE'
)
SELECT s_acctbal_cents, s_name, n_name, p_partkey, p_brand, supplycost_cents
FROM joined WHERE supplycost_cents = min_cost_cents
"""

ORACLES["tpch_q7"] = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
  cast(year(l.l_shipdate) AS BIGINT) AS l_year,
  cast(sum(round(l.l_extendedprice * (1 - l.l_discount) * 100)) AS BIGINT)
    AS revenue_cents,
  count(*) AS n_items
FROM lineitem l
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
   OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
GROUP BY n1.n_name, n2.n_name, year(l.l_shipdate)
"""

ORACLES["tpch_q8"] = """
SELECT cast(year(o.o_orderdate) AS BIGINT) AS o_year,
  cast(sum(CASE WHEN n1.n_name = 'NATION_3'
    THEN cast(round(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)
    ELSE 0 END) AS BIGINT) AS nation_cents,
  cast(sum(cast(round(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT))
    AS BIGINT) AS total_cents
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
JOIN region r ON n2.n_regionkey = r.r_regionkey
WHERE p.p_type = 'ECONOMY' AND r.r_name = 'AMERICA'
GROUP BY year(o.o_orderdate)
"""

ORACLES["tpch_q10"] = """
SELECT c.c_custkey, c.c_name, n.n_name,
  cast(sum(round(l.l_extendedprice * (1 - l.l_discount) * 100)) AS BIGINT)
    AS revenue_cents,
  cast(max(cast(round(c.c_acctbal * 100) AS BIGINT)) AS BIGINT)
    AS acctbal_cents
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE l.l_returnflag = 'R'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate < TIMESTAMP '1996-04-01'
GROUP BY c.c_custkey, c.c_name, n.n_name
ORDER BY revenue_cents DESC, c.c_custkey ASC
LIMIT 20
"""

ORACLES["tpch_q11"] = """
WITH held AS (
  SELECT l.l_partkey,
    cast(sum(cast(round(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT)
      AS value_cents
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  WHERE n.n_name = 'NATION_5'
  GROUP BY l.l_partkey
),
total AS (SELECT cast(sum(value_cents) AS BIGINT) AS total_cents FROM held)
SELECT l_partkey, value_cents
FROM held, total
WHERE value_cents * 1000 > total_cents
"""

ORACLES["tpch_q14"] = """
SELECT
  cast(sum(CASE WHEN p.p_type = 'PROMO'
    THEN cast(round(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)
    ELSE 0 END) AS BIGINT) AS promo_cents,
  cast(sum(cast(round(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT))
    AS BIGINT) AS total_cents,
  count(*) AS n_items
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '1996-03-01'
  AND l.l_shipdate < TIMESTAMP '1996-04-01'
"""

ORACLES["tpch_q15"] = """
WITH rev AS (
  SELECT l_suppkey,
    cast(sum(round(l_extendedprice * (1 - l_discount) * 100)) AS BIGINT)
      AS total_revenue_cents
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
),
mx AS (SELECT max(total_revenue_cents) AS max_revenue_cents FROM rev)
SELECT s.s_suppkey, s.s_name, rev.total_revenue_cents
FROM rev
JOIN supplier s ON rev.l_suppkey = s.s_suppkey
CROSS JOIN mx
WHERE rev.total_revenue_cents = mx.max_revenue_cents
"""

ORACLES["tpch_q19"] = """
SELECT
  cast(sum(round(l.l_extendedprice * (1 - l.l_discount) * 100)) AS BIGINT)
    AS revenue_cents,
  count(*) AS n_items
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 5
       AND l.l_quantity BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 10
       AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 20 AND 30)
"""

ORACLES["tpch_q20"] = """
WITH per_ps AS (
  SELECT l_partkey, l_suppkey,
    cast(sum(cast(round(l_quantity) AS BIGINT)) AS BIGINT) AS qty_all,
    cast(sum(CASE WHEN l_shipdate >= TIMESTAMP '1996-01-01'
                   AND l_shipdate < TIMESTAMP '1997-01-01'
             THEN cast(round(l_quantity) AS BIGINT) ELSE 0 END) AS BIGINT)
      AS qty_96
  FROM lineitem GROUP BY l_partkey, l_suppkey
)
SELECT s.s_suppkey, s.s_name, n.n_name
FROM supplier s
JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE EXISTS (
  SELECT 1 FROM per_ps
  JOIN part p ON per_ps.l_partkey = p.p_partkey
  WHERE per_ps.l_suppkey = s.s_suppkey
    AND p.p_name LIKE 'small%'
    AND per_ps.qty_96 = per_ps.qty_all AND per_ps.qty_all >= 40
)
"""

# Count-Min Sketch: depth-3 x width-256 counters over seeded portable
# hashes; point estimate = min over the key's three counters (0 when a
# cell is empty). Collisions reproduce bit-for-bit across engines.
_CMS_CELLS = "\nUNION ALL\n".join(
    f"SELECT {i} AS row_i, ({portable_hash_sql('cast(user_id AS VARCHAR)', i)}) % 256 AS bucket\n"
    "FROM events WHERE user_id IS NOT NULL"
    for i in range(3)
)
_CMS_PROBES = "\nUNION ALL\n".join(
    f"SELECT user_id, {i} AS row_i, ({portable_hash_sql('cast(user_id AS VARCHAR)', i)}) % 256 AS bucket\n"
    "FROM q"
    for i in range(3)
)

ORACLES["cms_user_counts"] = f"""
WITH ex AS (
{_CMS_CELLS}
),
sk AS (SELECT row_i, bucket, count(*) AS cnt FROM ex GROUP BY 1, 2),
q AS (SELECT DISTINCT user_id FROM events WHERE user_id < 100),
qc AS (
{_CMS_PROBES}
)
SELECT qc.user_id,
       cast(min(coalesce(sk.cnt, 0)) AS BIGINT) AS est_count
FROM qc
LEFT JOIN sk ON qc.row_i = sk.row_i AND qc.bucket = sk.bucket
GROUP BY qc.user_id
"""

# histogram quantile sketch: width-10 bins over events.value; estimate =
# upper edge of the bin holding 1-based rank ceil(p*n) (integer basis-
# point ceil-div, as in latency_percentiles)
ORACLES["hist_quantiles"] = """
WITH b AS (
  SELECT event_type AS grp,
         cast(floor(value / 10) AS BIGINT) AS bin, count(*) AS cnt
  FROM events WHERE value IS NOT NULL GROUP BY 1, 2
),
r AS (
  SELECT grp, bin, cnt,
    sum(cnt) OVER (PARTITION BY grp ORDER BY bin
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
    sum(cnt) OVER (PARTITION BY grp) AS n
  FROM b
)
SELECT grp AS event_type,
  cast(max(CASE WHEN (5000 * n + 9999) // 10000 > cum - cnt
                 AND (5000 * n + 9999) // 10000 <= cum
           THEN (bin + 1) * 10 END) AS BIGINT) AS p50_ub,
  cast(max(CASE WHEN (9500 * n + 9999) // 10000 > cum - cnt
                 AND (9500 * n + 9999) // 10000 <= cum
           THEN (bin + 1) * 10 END) AS BIGINT) AS p95_ub
FROM r GROUP BY grp
"""

# semantic dedup: recursive-CTE connected components over the embedding
# cosine near-dup pairs (same pair derivation as embedding_dup_pairs)
ORACLES["semantic_dedup"] = f"""
WITH RECURSIVE qv AS (SELECT vec_id, {_QUANT} AS q FROM embeddings),
wb AS (
  SELECT vec_id, q,
         cast(list_sum(list_transform(range(1, 65), i -> q[i] * q[i])) AS BIGINT) AS norm2,
         ({_bucket_sql()}) AS bucket
  FROM qv
),
capped AS (
  SELECT vec_id, q, norm2, bucket FROM (
    SELECT *, count(*) OVER (PARTITION BY bucket) AS bw FROM wb
  ) WHERE bw <= 500
),
rawpairs AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.norm2 AS na, b.norm2 AS nb,
         cast(list_sum(list_transform(range(1, 65), i -> a.q[i] * b.q[i])) AS BIGINT) AS d
  FROM capped a JOIN capped b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
),
pairs AS (
  SELECT DISTINCT vec_a, vec_b FROM rawpairs
  WHERE d >= 0 AND cast((d * d * 100) // (na * nb) AS BIGINT) >= 9
),
edges AS (
  SELECT vec_a AS s, vec_b AS d FROM pairs
  UNION
  SELECT vec_b AS s, vec_a AS d FROM pairs
),
reach(node, label) AS (
  SELECT vec_id, vec_id FROM embeddings
  UNION
  SELECT e.s, r.label FROM edges e JOIN reach r ON e.d = r.node
)
SELECT node AS vec_id, min(label) AS cluster_id,
       CASE WHEN node = min(label) THEN 1 ELSE 0 END AS is_canonical
FROM reach GROUP BY node
"""

# k-means (ops/kmeans.kmeans_assign, k=4, iters=2): unrolled Lloyd rounds —
# init = vec_id<4, argmin by (dist², cell) via row_number, centroid update =
# per-dimension floor(sum/n). km-prefixed CTEs so the IVF-PQ oracle can
# compose them with the (unprefixed) PQ subspace CTEs in one WITH block.
_KM_CTES = f"""
kmq AS (SELECT vec_id, {_QUANT} AS v FROM embeddings),
kmc0 AS (SELECT vec_id AS cell, v AS cv FROM kmq WHERE vec_id < 4),
kmd1 AS (
  SELECT kmq.vec_id, c.cell,
    cast(list_sum(list_transform(range(1, 65),
         i -> (kmq.v[i] - c.cv[i]) * (kmq.v[i] - c.cv[i]))) AS BIGINT) AS d
  FROM kmq CROSS JOIN kmc0 c
),
kma1 AS (
  SELECT vec_id, cell FROM (
    SELECT vec_id, cell,
           row_number() OVER (PARTITION BY vec_id ORDER BY d, cell) AS rn
    FROM kmd1) WHERE rn = 1
),
kms1e AS (
  SELECT kma1.cell AS cell, kmq.v AS v, unnest(range(1, 65)) AS i
  FROM kma1 JOIN kmq USING (vec_id)
),
kms1 AS (SELECT cell, i, sum(v[i]) AS s, count(*) AS n
         FROM kms1e GROUP BY cell, i),
kmc1 AS (
  SELECT cell, list(cast(floor(cast(s AS DOUBLE) / n) AS BIGINT) ORDER BY i) AS cv
  FROM kms1 GROUP BY cell
),
kmd2 AS (
  SELECT kmq.vec_id, c.cell,
    cast(list_sum(list_transform(range(1, 65),
         i -> (kmq.v[i] - c.cv[i]) * (kmq.v[i] - c.cv[i]))) AS BIGINT) AS d
  FROM kmq CROSS JOIN kmc1 c
)"""

ORACLES["kmeans_clusters"] = f"""
WITH {_KM_CTES}
SELECT vec_id, cast(cell AS INT) AS cluster, d AS dist2 FROM (
  SELECT vec_id, cell, d,
         row_number() OVER (PARTITION BY vec_id ORDER BY d, cell) AS rn
  FROM kmd2) WHERE rn = 1
"""

# Product quantization (ops/pq.py, m=4 subspaces × k=16 codes, iters=2):
# the kmeans_clusters unroll generalized with a subspace dimension j —
# per-subspace init = vec_id<16 slices, one Lloyd update (floor means),
# reassign; codes = final per-subspace argmin (ties to lowest code id).
# sv slices AFTER quantization (quantize is element-wise, so it commutes
# with slicing — matches pq_fit slicing before quantize).
def _pq_ctes(src: str, p: str = "") -> str:
    """The per-subspace PQ unroll (m=4 × k=16, iters=2) over any
    (vec_id, v) source CTE ``src``; CTE names prefixed with ``p`` so the
    flat (p="") and residual (p="r") instantiations can share one WITH
    block. Yields {p}sv/{p}c0/{p}d1/{p}a1/{p}s1e/{p}s1/{p}c1/{p}d2 and
    the final {p}pq_codes."""
    return f"""{p}sv AS (
  SELECT vec_id, j, list_transform(range(1, 17), i -> v[i + j * 16]) AS sv
  FROM {src} CROSS JOIN (SELECT unnest(range(0, 4)) AS j)
),
{p}c0 AS (SELECT j, vec_id AS cell, sv AS cv FROM {p}sv WHERE vec_id < 16),
{p}d1 AS (
  SELECT s.vec_id, s.j, c.cell,
    cast(list_sum(list_transform(range(1, 17),
         i -> (s.sv[i] - c.cv[i]) * (s.sv[i] - c.cv[i]))) AS BIGINT) AS d
  FROM {p}sv s JOIN {p}c0 c ON s.j = c.j
),
{p}a1 AS (
  SELECT vec_id, j, cell FROM (
    SELECT vec_id, j, cell,
           row_number() OVER (PARTITION BY vec_id, j ORDER BY d, cell) AS rn
    FROM {p}d1) WHERE rn = 1
),
{p}s1e AS (
  SELECT a.j, a.cell, s.sv AS sv, unnest(range(1, 17)) AS i
  FROM {p}a1 a JOIN {p}sv s ON a.vec_id = s.vec_id AND a.j = s.j
),
{p}s1 AS (SELECT j, cell, i, sum(sv[i]) AS sm, count(*) AS n
       FROM {p}s1e GROUP BY j, cell, i),
{p}c1 AS (
  SELECT j, cell,
         list(cast(floor(cast(sm AS DOUBLE) / n) AS BIGINT) ORDER BY i) AS cv
  FROM {p}s1 GROUP BY j, cell
),
{p}d2 AS (
  SELECT s.vec_id, s.j, c.cell,
    cast(list_sum(list_transform(range(1, 17),
         i -> (s.sv[i] - c.cv[i]) * (s.sv[i] - c.cv[i]))) AS BIGINT) AS d
  FROM {p}sv s JOIN {p}c1 c ON s.j = c.j
),
{p}pq_codes AS (
  SELECT vec_id, j, cell AS code FROM (
    SELECT vec_id, j, cell,
           row_number() OVER (PARTITION BY vec_id, j ORDER BY d, cell) AS rn
    FROM {p}d2) WHERE rn = 1
)"""


_PQ_CTES = f"""q AS (SELECT vec_id, {_QUANT} AS v FROM embeddings),
{_pq_ctes("q")}"""

ORACLES["pq_encode_codes"] = f"""
WITH {_PQ_CTES}
SELECT vec_id,
  cast(max(CASE WHEN j = 0 THEN code END) AS INT) AS c0,
  cast(max(CASE WHEN j = 1 THEN code END) AS INT) AS c1,
  cast(max(CASE WHEN j = 2 THEN code END) AS INT) AS c2,
  cast(max(CASE WHEN j = 3 THEN code END) AS INT) AS c3
FROM pq_codes GROUP BY vec_id
"""

# ADC: d2 rows where vec_id = 0 ARE the query's per-(subspace, code)
# distance table; each stored vector sums its 4 code lookups. HAVING
# count(*)=4 mirrors the n_subs guard (no partial ADC sums).
ORACLES["pq_adc_topk"] = f"""
WITH {_PQ_CTES},
dt AS (SELECT j, cell, d FROM d2 WHERE vec_id = 0)
SELECT c.vec_id, cast(sum(dt.d) AS BIGINT) AS adc_dist2
FROM pq_codes c JOIN dt ON c.j = dt.j AND c.code = dt.cell
WHERE c.vec_id <> 0
GROUP BY c.vec_id
HAVING count(*) = 4
ORDER BY adc_dist2, c.vec_id
LIMIT 10
"""

# IVF-PQ (ops/pq.ivfpq_topk, n_cells=4 coarse Lloyd cells, nprobe=2,
# m=4×k=16 codes): coarse assignment/centroids reuse the km* kmeans CTEs,
# codes/distance-table reuse the PQ CTEs; the probe keeps only vectors
# whose coarse cell is among the query's 2 nearest (ties to lowest cell).
ORACLES["ivfpq_adc_topk"] = f"""
WITH {_KM_CTES},
{_PQ_CTES},
coarse AS (
  SELECT vec_id, cell FROM (
    SELECT vec_id, cell,
           row_number() OVER (PARTITION BY vec_id ORDER BY d, cell) AS rn
    FROM kmd2) WHERE rn = 1
),
qcell AS (SELECT cell FROM kmd2 WHERE vec_id = 0 ORDER BY d, cell LIMIT 2),
dt AS (SELECT j, cell, d FROM d2 WHERE vec_id = 0)
SELECT c.vec_id, cast(sum(dt.d) AS BIGINT) AS adc_dist2
FROM pq_codes c
JOIN coarse ON c.vec_id = coarse.vec_id
JOIN qcell ON coarse.cell = qcell.cell
JOIN dt ON c.j = dt.j AND c.code = dt.cell
WHERE c.vec_id <> 0
GROUP BY c.vec_id
HAVING count(*) = 4
ORDER BY adc_dist2, c.vec_id
LIMIT 10
"""

# Residual IVF-PQ / textbook IVFADC (ops/pq.ivfpq_residual_topk):
# codebooks trained on residuals v − coarse_centroid[cell] (the r-prefixed
# PQ unroll over rq), one per-probed-cell query-residual distance table,
# candidates join on (their own cell, j, code).
ORACLES["ivfpq_residual_topk"] = f"""
WITH {_KM_CTES},
coarse AS (
  SELECT vec_id, cell FROM (
    SELECT vec_id, cell,
           row_number() OVER (PARTITION BY vec_id ORDER BY d, cell) AS rn
    FROM kmd2) WHERE rn = 1
),
rq AS (
  SELECT kmq.vec_id,
         list_transform(range(1, 65), i -> kmq.v[i] - c.cv[i]) AS v
  FROM kmq JOIN coarse a USING (vec_id) JOIN kmc1 c ON a.cell = c.cell
),
{_pq_ctes("rq", "r")},
qcell AS (SELECT cell FROM kmd2 WHERE vec_id = 0 ORDER BY d, cell LIMIT 2),
qres AS (
  SELECT qc.cell,
         list_transform(range(1, 65), i -> q0.v[i] - c.cv[i]) AS qv
  FROM qcell qc JOIN kmc1 c USING (cell),
       (SELECT v FROM kmq WHERE vec_id = 0) q0
),
dt AS (
  SELECT qr.cell, b.j, b.cell AS code,
    cast(list_sum(list_transform(range(1, 17),
         i -> (qr.qv[i + b.j * 16] - b.cv[i])
              * (qr.qv[i + b.j * 16] - b.cv[i]))) AS BIGINT) AS d
  FROM qres qr CROSS JOIN rc1 b
)
SELECT pc.vec_id, cast(sum(dt.d) AS BIGINT) AS adc_dist2
FROM rpq_codes pc
JOIN coarse a ON pc.vec_id = a.vec_id
JOIN dt ON a.cell = dt.cell AND pc.j = dt.j AND pc.code = dt.code
WHERE pc.vec_id <> 0
GROUP BY 1
HAVING count(*) = 4
ORDER BY adc_dist2, pc.vec_id
LIMIT 10
"""

# Hashed-feature linear classifier (ops/classify, n_buckets=1024,
# is-English labels, doc_id%10<8 train split): Bernoulli presence
# features via row-local list_distinct, Laplace fixed-point evidence
# weights, integer mean score, SCALE/2 prior for unseen buckets.
_CLASSIFY_CTES = rf"""
fb AS (
  SELECT doc_id, lang = 'en' AS y,
         unnest(list_distinct(list_transform(
           list_filter(regexp_split_to_array(lower(trim(coalesce(text, ''))),
                       '\s+'), t -> t <> ''),
           t -> {portable_hash_sql('t')} % 1024))) AS bucket
  FROM documents
),
w AS (
  SELECT bucket,
         cast(((cast(sum(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) + 1)
               * 1000000) // (count(*) + 2) AS BIGINT) AS w
  FROM fb WHERE doc_id % 10 < 8 GROUP BY bucket
),
sc AS (
  SELECT fb.doc_id, count(*) AS n_feats,
         cast(sum(coalesce(w.w, 500000)) // count(*) AS BIGINT) AS score_fp
  FROM fb LEFT JOIN w USING (bucket)
  GROUP BY fb.doc_id
),
prior AS (
  SELECT cast(((cast(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
                + 1) * 1000000) // (count(*) + 2) AS BIGINT) AS thr
  FROM documents WHERE doc_id % 10 < 8
),
scored AS (
  SELECT d.doc_id, coalesce(s.n_feats, 0) AS n_feats, s.score_fp,
         CASE WHEN s.score_fp IS NULL THEN NULL
              ELSE s.score_fp >= (SELECT thr FROM prior) END AS pred
  FROM documents d LEFT JOIN sc s USING (doc_id)
)"""

ORACLES["classify_lang_en"] = f"""
WITH {_CLASSIFY_CTES}
SELECT doc_id, n_feats, score_fp, pred FROM scored
"""

# the inline (map-literal, zero-shuffle) serve MUST be value-identical
# to the join-based serve — same oracle text, independently re-run
ORACLES["classify_inline_serve"] = ORACLES["classify_lang_en"]

ORACLES["classify_confusion_en"] = f"""
WITH {_CLASSIFY_CTES}
SELECT d.lang = 'en' AS label, scored.pred, count(*) AS n_docs
FROM scored JOIN documents d USING (doc_id)
GROUP BY 1, 2
"""

# BPE pair counting (ops/text.bpe_pair_counts, top_n=30): frequency-weighted
# adjacent character pairs over the distinct-word table
ORACLES["bpe_pair_counts"] = r"""
WITH w AS (
  SELECT unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS word
  FROM documents
),
wc AS (SELECT word, count(*) AS cnt FROM w WHERE word <> '' GROUP BY word),
we AS (
  SELECT word, cnt, unnest(range(1, length(word))) AS i
  FROM wc WHERE length(word) >= 2
),
p AS (SELECT substr(word, i, 2) AS pair, cnt FROM we)
SELECT pair, cast(sum(cnt) AS BIGINT) AS cnt
FROM p GROUP BY pair
ORDER BY cnt DESC, pair LIMIT 30
"""

# per-domain quality pruning (ops/text.quality_prune_per_group, keep_pct=30,
# group=lang): score = stopword_hits*1e6 + token_count; keep floor(n*30/100)
ORACLES["quality_prune_per_lang"] = f"""
WITH f AS (
  SELECT doc_id, lang,
    cast({_STOP_HITS} AS BIGINT) * 1000000
    + cast(CASE WHEN length(trim(text)) = 0 THEN 0
           ELSE length(regexp_split_to_array(trim(text), '\\s+')) END AS BIGINT)
    AS score
  FROM documents
),
r AS (
  SELECT doc_id, lang, score,
    row_number() OVER (PARTITION BY lang ORDER BY score DESC, doc_id) AS rn,
    count(*) OVER (PARTITION BY lang) AS n
  FROM f
)
SELECT doc_id, lang, score,
  cast(CASE WHEN rn <= (n * 30) // 100 THEN 1 ELSE 0 END AS INT) AS kept
FROM r
"""


# ---------------------------------------------------------------------------
# Round-4 additions: conversation dedup, skew diagnostics, random projection
# ---------------------------------------------------------------------------

# Conversation-level exact dedup (ops/dedup.conv_dedup): md5 over turn texts
# in stable turn_idx order, canonical = min conv_id per fingerprint.
ORACLES["conv_dedup"] = f"""
WITH {TURNS_CTE},
fps AS (
  -- per-turn md5 chain (fixed-width blocks — no in-text byte sequence can
  -- fake a turn boundary); coalesce: all-NULL-text conversations hash the
  -- empty chain, matching Spark's concat_ws (which skips NULL elements)
  SELECT conv_id, count(*) AS n_turns,
         md5(coalesce(string_agg(md5(text), '' ORDER BY turn_idx), '')) AS conv_fp
  FROM turns GROUP BY conv_id
)
SELECT conv_id, conv_fp, n_turns,
       min(conv_id) OVER (PARTITION BY conv_fp) AS canonical_conv,
       CAST(conv_id = min(conv_id) OVER (PARTITION BY conv_fp) AS INT) AS is_canonical
FROM fps
"""

# Heavy-key diagnostic (route.skew_key_stats over conv_id, target=50/task):
# exact share in basis points + the salt factor a salted repartition needs.
ORACLES["skew_key_stats"] = f"""
WITH {TURNS_CTE},
counts AS (SELECT conv_id AS key, count(*) AS cnt FROM turns GROUP BY conv_id),
tot AS (SELECT cast(sum(cnt) AS BIGINT) AS t FROM counts)
SELECT key, cnt,
       cnt * 10000 // t AS share10k,
       (cnt + 49) // 50 AS salt_factor
FROM counts, tot
ORDER BY cnt DESC, key ASC NULLS LAST
LIMIT 20
"""


def _rp_oracle(out_dims: int = 32, k: int = 10, m: int = 100, dims: int = 64) -> str:
    """Random-projection shortlist + exact rerank (ops/similarity.
    rp_rerank_topk) with the projection matrix inlined as literals — the
    identical deterministic integer hyperplanes as the Spark side."""
    proj_exprs = []
    for p in range(out_dims):
        vals = [((p * 1315423911 + j * 2654435761) % 2001) - 1000 for j in range(dims)]
        lit = "[" + ", ".join(str(v) for v in vals) + "]"
        proj_exprs.append(
            f"cast(list_sum(list_transform(range(1, {dims + 1}), "
            f"i -> q[i] * ({lit})[i])) AS BIGINT)"
        )
    rv = "[" + ",\n    ".join(proj_exprs) + "]"
    return f"""
WITH qv AS (SELECT vec_id, {_QUANT} AS q FROM embeddings),
proj AS (SELECT vec_id, {rv} AS rv FROM qv),
short AS (
  SELECT e.vec_id,
         cast(list_sum(list_transform(range(1, {out_dims + 1}),
              i -> e.rv[i] * b.rv[i])) AS BIGINT) AS approx_dot
  FROM proj e, (SELECT rv FROM proj WHERE vec_id = 0) b
  WHERE e.vec_id <> 0
  ORDER BY approx_dot DESC, e.vec_id
  LIMIT {m}
)
SELECT s.vec_id, s.approx_dot, {_DOT64} AS dot
FROM short s
JOIN qv e ON e.vec_id = s.vec_id,
     (SELECT q FROM qv WHERE vec_id = 0) b
ORDER BY dot DESC, s.vec_id
LIMIT {k}
"""


ORACLES["rp_rerank_topk"] = _rp_oracle()


# Transcripts → packed training corpus (ops/corpus.transcript_training_corpus):
# conv assembly (string_agg, NULL lines skipped like F.concat→concat_ws) →
# exact dedup (md5, keep min conv_id) → ws token count → pack placement.
# sf0.01 scale lets the oracle use the single-global-window prefix-sum twin.
ORACLES["transcript_training_corpus"] = rf"""
WITH {TURNS_CTE},
docs AS (
  -- doc: assembled lines (NULL role/text propagates through || and the
  -- line drops out — matching F.concat → concat_ws). fp: per-turn md5
  -- chain over (role, text) — fixed-width blocks, so a turn whose text
  -- contains a literal 'role: ...\n' line never collides with the real
  -- multi-turn conversation it quotes. coalesce: all-NULL conv -> ''.
  SELECT conv_id,
         coalesce(string_agg(role || ': ' || text, chr(10) ORDER BY turn_idx),
                  '') AS doc,
         md5(coalesce(string_agg(md5(role || chr(31) || text), ''
                                 ORDER BY turn_idx), '')) AS fp
  FROM turns GROUP BY conv_id
),
canon AS (
  SELECT conv_id, doc FROM (
    SELECT conv_id, doc, min(conv_id) OVER (PARTITION BY fp) AS keep
    FROM docs
  ) WHERE conv_id = keep
),
t AS (
  SELECT conv_id,
    cast(CASE WHEN length(trim(coalesce(doc, ''))) = 0 THEN 0
         ELSE length(regexp_split_to_array(trim(doc), '\s+')) END AS BIGINT)
      AS n_tokens,
    {portable_hash_sql("conv_id")} AS h
  FROM canon
),
o AS (
  SELECT conv_id, n_tokens,
    cast(coalesce(sum(n_tokens) OVER (ORDER BY h, conv_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
      AS tok_offset
  FROM t
)
SELECT conv_id, n_tokens, tok_offset,
  cast(tok_offset // 512 AS BIGINT) AS first_seq,
  cast(tok_offset % 512 AS BIGINT) AS pos_in_first_seq,
  cast((tok_offset + greatest(n_tokens, 1) - 1) // 512 AS BIGINT) AS last_seq,
  cast((tok_offset + greatest(n_tokens, 1) - 1) // 512
       - tok_offset // 512 + 1 AS BIGINT) AS n_seqs
FROM o
"""


def _hll_oracle(p: int = 6) -> str:
    """Deterministic-HLL twin (ops/sketch.hll_sketch/hll_estimate): same
    integer register/rho/harmonic arithmetic from the same portable hash."""
    from .ops.sketch import _hll_alpha_c

    m = 1 << p
    rbits = 60 - p
    c = _hll_alpha_c(p)
    shift = 61 - c.bit_length()
    s_unit = 1 << shift
    return f"""
WITH h AS (
  SELECT event_type, {portable_hash_sql("cast(user_id AS VARCHAR)")} AS hh
  FROM events WHERE user_id IS NOT NULL
),
reg AS (
  SELECT event_type, hh // {1 << rbits} AS bucket,
         max(CASE WHEN hh % {1 << rbits} = 0 THEN {rbits + 1}
             ELSE {rbits + 1} - length(bin(hh % {1 << rbits})) END) AS rho
  FROM h GROUP BY event_type, bucket
),
agg AS (
  SELECT event_type, count(*) AS nb, sum({s_unit} >> rho) AS sm
  FROM reg GROUP BY event_type
)
SELECT event_type,
       cast({c * s_unit} // greatest(sm + ({m} - nb) * {s_unit}, 1) AS BIGINT)
         AS hll_est
FROM agg
"""


ORACLES["hll_distinct_users"] = _hll_oracle()


# ---------------------------------------------------------------------------
# Bloom filter (ops.sketch.bloom_build / bloom_probe): m-bit / j-hash
# membership bitset as 31-bit words — a pure integer function of the
# portable hash, so Spark and DuckDB build and probe it bit-identically
# ---------------------------------------------------------------------------


def _bloom_oracle_ctes(m_bits: int = 4096, n_hashes: int = 4) -> str:
    fp = "md5(coalesce(text, ''))"
    seeds = ", ".join(
        f"({portable_hash_sql(fp, i)} % {m_bits})" for i in range(n_hashes)
    )
    return f"""k AS (
  SELECT doc_id, unnest([{seeds}]) AS bit
  FROM documents WHERE lang = 'en'
),
coords AS (SELECT DISTINCT bit // 31 AS word_idx, bit % 31 AS b FROM k),
words AS (
  SELECT word_idx, cast(sum(1::BIGINT << cast(b AS INT)) AS BIGINT) AS word
  FROM coords GROUP BY word_idx
)"""


ORACLES["bloom_filter_words"] = f"""
WITH {_bloom_oracle_ctes()}
SELECT cast(word_idx AS BIGINT) AS word_idx, word FROM words
"""

_FP_SQL = "md5(coalesce(text, ''))"
_probe_seeds = ", ".join(
    "(" + portable_hash_sql(_FP_SQL, i) + " % 4096)" for i in range(4)
)

ORACLES["bloom_membership"] = f"""
WITH {_bloom_oracle_ctes()},
q AS (
  SELECT doc_id,
         unnest([{_probe_seeds}]) AS bit
  FROM documents
),
probe AS (
  SELECT q.doc_id,
         min(CASE WHEN (coalesce(w.word, 0) & (1::BIGINT << cast(q.bit % 31 AS INT)))
                       = (1::BIGINT << cast(q.bit % 31 AS INT))
             THEN 1 ELSE 0 END) AS all_set
  FROM q LEFT JOIN words w ON q.bit // 31 = w.word_idx
  GROUP BY q.doc_id
)
SELECT doc_id, all_set = 1 AS maybe_present FROM probe
"""


# ---------------------------------------------------------------------------
# Content-defined chunking (ops.corpus.cdc_chunks): gear/Rabin-style CDC —
# boundary after token i iff hash(window-gram ending at i) % mean == 0.
# Boundaries are a pure function of the portable hash, so the edge sets
# (and therefore every chunk md5) are bit-identical across engines.
# ---------------------------------------------------------------------------

_CDC_GRAM = "array_to_string(toks[i - 3 : i], ' ')"
_CDC_COND = (
    "i >= 4 AND i < len(toks) AND ("
    + portable_hash_sql(_CDC_GRAM)
    + " % 32) = 0"
)

ORACLES["cdc_chunks"] = rf"""
WITH tk AS (
  SELECT doc_id, regexp_split_to_array(trim(coalesce(text, '')), '\s+') AS toks
  FROM documents
),
b AS (
  SELECT doc_id, toks,
         [0] || list_filter(range(1, len(toks) + 1), i -> {_CDC_COND})
             || [len(toks)] AS edges
  FROM tk
),
ex AS (
  SELECT doc_id, toks, edges, unnest(range(1, len(edges))) AS k
  FROM b
)
SELECT doc_id, cast(k - 1 AS BIGINT) AS chunk_idx,
       md5(array_to_string(toks[edges[k] + 1 : edges[k + 1]], ' ')) AS chunk_md5,
       cast(edges[k + 1] - edges[k] AS BIGINT) AS n_chunk_tokens
FROM ex
"""


# ---------------------------------------------------------------------------
# Deterministic range sharding (ops.corpus.range_shards): histogram-derived
# cut points at ranks ceil(s·n/8), shard = count of boundaries <= score.
# The whole derivation is integer arithmetic over width-10 bins, so both
# engines compute identical boundaries and identical assignments.
# ---------------------------------------------------------------------------

_RS_BOUNDS = ", ".join(
    f"max(CASE WHEN ({s} * n + 7) // 8 > cum - cnt AND ({s} * n + 7) // 8 <= cum"
    f" THEN (bin + 1) * 10 END) AS b{s}"
    for s in range(1, 8)
)
_RS_SHARD = " + ".join(
    f"(CASE WHEN d.n_chars >= b.b{s} THEN 1 ELSE 0 END)" for s in range(1, 8)
)

ORACLES["curriculum_shards"] = f"""
WITH h AS (
  -- floor-mod binning ((x % w + w) % w), matching Spark's pmod exactly so
  -- negative scores bin identically (ADVICE r4; n_chars is non-negative,
  -- but the oracle should not depend on that)
  SELECT (n_chars - ((n_chars % 10) + 10) % 10) // 10 AS bin, count(*) AS cnt
  FROM documents WHERE n_chars IS NOT NULL GROUP BY 1
),
r AS (
  SELECT bin, cnt,
    sum(cnt) OVER (ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
    sum(cnt) OVER () AS n
  FROM h
),
b AS (SELECT {_RS_BOUNDS} FROM r)
SELECT d.doc_id, d.n_chars,
       CASE WHEN d.n_chars IS NULL THEN NULL
            ELSE cast({_RS_SHARD} AS INT) END AS shard
FROM documents d CROSS JOIN b
"""


# ---------------------------------------------------------------------------
# Per-domain boilerplate line removal (ops.text.boilerplate_lines): lines
# appearing in >= 3 distinct docs of the same source are removed from every
# doc; docs rebuilt from surviving lines. Input composed as nav line +
# body + copyright footer (see q_boilerplate_lines).
# ---------------------------------------------------------------------------

ORACLES["boilerplate_lines"] = """
WITH d AS (
  SELECT doc_id, source,
         'NAV: home | about | ' || source || chr(10)
           || coalesce(text, '') || chr(10) || 'Copyright ' || source AS text
  FROM documents
),
l0 AS (SELECT doc_id, coalesce(source, chr(0) || 'nodomain') AS dom,
              string_split(coalesce(text, ''), chr(10)) AS ls
       FROM d),
le AS (SELECT doc_id, dom, ls, unnest(range(1, len(ls) + 1)) AS i FROM l0),
lines AS (SELECT doc_id, dom, cast(i - 1 AS INT) AS line_idx,
                 md5(trim(ls[i])) AS fp
          FROM le),
flagged AS (
  SELECT dom, fp FROM lines GROUP BY dom, fp
  HAVING count(DISTINCT doc_id) >= 3
),
ks AS (
  SELECT l.doc_id, list(l.line_idx ORDER BY l.line_idx) AS keep_idx
  FROM lines l ANTI JOIN flagged f ON l.dom = f.dom AND l.fp = f.fp
  GROUP BY l.doc_id
)
SELECT l0.doc_id,
  md5(coalesce(array_to_string(
    list_transform(coalesce(ks.keep_idx, []), i -> l0.ls[i + 1]),
    chr(10)), '')) AS text_md5,
  cast(len(coalesce(ks.keep_idx, [])) AS BIGINT) AS n_kept,
  cast(len(l0.ls) - len(coalesce(ks.keep_idx, [])) AS BIGINT) AS n_removed
FROM l0 LEFT JOIN ks USING (doc_id)
"""


# ---------------------------------------------------------------------------
# Incremental IVF maintenance (ops.similarity.ivf_upsert): standing index
# over vec_id < 400 merged with a reversed-embedding batch (vec_id >= 350):
# MERGE semantics mean every vec_id >= 350 carries the REVERSED vector's
# assignment, everything below keeps the original — one CASE in the
# effective-vector CTE reproduces the final state; same tie-free
# ord = dot*16 - cell argmax as the other IVF oracles.
# ---------------------------------------------------------------------------

ORACLES["ivf_upsert"] = f"""
WITH qv AS (SELECT vec_id, {_QUANT} AS q FROM embeddings),
cents AS (SELECT vec_id AS cell, q AS cv FROM qv WHERE vec_id < 16),
eff AS (
  SELECT vec_id,
         CASE WHEN vec_id >= 350 THEN list_reverse(q) ELSE q END AS v
  FROM qv
),
scored AS (
  SELECT e.vec_id, c.cell,
         cast(list_sum(list_transform(range(1, 65), i -> e.v[i] * c.cv[i])) AS BIGINT)
           * 16 - c.cell AS ord
  FROM eff e CROSS JOIN cents c
)
SELECT vec_id, arg_max(cell, ord) AS cell FROM scored GROUP BY vec_id
"""


# ---------------------------------------------------------------------------
# Substring-span removal (ops.dedup.remove_dup_spans): the action step of
# dup_span_grams — tokens covered by a non-canonical duplicated 8-window
# (canonical = corpus-wide min (doc_id, pos)) are cut, docs rebuilt from
# survivors. Match on lowercased tokens, rebuild from raw bytes.
# ---------------------------------------------------------------------------

ORACLES["remove_dup_spans"] = f"""
WITH tk AS (
  SELECT doc_id,
         regexp_split_to_array(trim(coalesce(text, '')), '\\s+') AS raw
  FROM documents
),
lk AS (
  SELECT doc_id, raw, list_transform(raw, t -> lower(t)) AS toks FROM tk
),
pos AS (
  -- md5, matching the Spark entry's hasher="md5" exactly (ADVICE r4): the
  -- hash is grouping-only, but using the identical digest on both sides
  -- removes the 60-bit-truncation collision asymmetry.
  SELECT lk.doc_id, i.i AS pos,
         md5(array_to_string(toks[i.i:i.i+7], ' ')) AS gh
  FROM lk, unnest(generate_series(1, greatest(len(toks) - 7, 0))) AS i(i)
),
ranked AS (
  SELECT doc_id, pos,
         row_number() OVER (PARTITION BY gh ORDER BY doc_id, pos) AS rn
  FROM pos
),
cuts AS (
  SELECT doc_id, list(pos ORDER BY pos) AS cuts
  FROM ranked WHERE rn > 1 GROUP BY doc_id
),
j AS (
  SELECT lk.doc_id, lk.raw, coalesce(c.cuts, []) AS cuts
  FROM lk LEFT JOIN cuts c USING (doc_id)
),
kept AS (
  SELECT doc_id, raw,
         list_filter(range(1, len(raw) + 1),
           jx -> len(list_filter(cuts, p -> p <= jx AND jx < p + 8)) = 0) AS ki
  FROM j
)
SELECT doc_id,
  md5(coalesce(array_to_string(list_transform(ki, jx -> raw[jx]), ' '), '')) AS text_md5,
  cast(len(ki) AS BIGINT) AS n_kept,
  cast(len(raw) - len(ki) AS BIGINT) AS n_removed
FROM kept
"""


# ---------------------------------------------------------------------------
# SemDeDup with k-means blocking (ops.similarity.semdedup): the unrolled
# Lloyd CTEs (shared with kmeans_clusters) pick each vector's cell, exact
# integer cos² >= 0.3² filters within-cell pairs, recursive CC labels
# components (same reach pattern as semantic_dedup / dedup_clusters).
# ---------------------------------------------------------------------------

ORACLES["semdedup_kmeans"] = f"""
WITH RECURSIVE {_KM_CTES},
kma2 AS (
  SELECT vec_id, cell FROM (
    SELECT vec_id, cell,
           row_number() OVER (PARTITION BY vec_id ORDER BY d, cell) AS rn
    FROM kmd2) WHERE rn = 1
),
wn AS (
  SELECT kmq.vec_id, kmq.v,
         cast(list_sum(list_transform(range(1, 65), i -> kmq.v[i] * kmq.v[i])) AS BIGINT) AS norm2,
         kma2.cell
  FROM kmq JOIN kma2 USING (vec_id)
),
rawpairs AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.norm2 AS na, b.norm2 AS nb,
         cast(list_sum(list_transform(range(1, 65), i -> a.v[i] * b.v[i])) AS BIGINT) AS d
  FROM wn a JOIN wn b ON a.cell = b.cell AND a.vec_id < b.vec_id
),
pairs AS (
  SELECT DISTINCT vec_a, vec_b FROM rawpairs
  WHERE d >= 0 AND cast((d * d * 100) // (na * nb) AS BIGINT) >= 9
),
edges AS (
  SELECT vec_a AS s, vec_b AS dd FROM pairs
  UNION
  SELECT vec_b AS s, vec_a AS dd FROM pairs
),
reach(node, label) AS (
  SELECT vec_id, vec_id FROM embeddings
  UNION
  SELECT e.s, r.label FROM edges e JOIN reach r ON e.dd = r.node
)
SELECT node AS vec_id, min(label) AS cluster_id,
       CASE WHEN node = min(label) THEN 1 ELSE 0 END AS is_canonical
FROM reach GROUP BY node
"""


# ---------------------------------------------------------------------------
# Iterative BPE (ops/bpe.py) — FULL value oracles (VERDICT r4 #2). The merge
# loop is deterministic (count desc, (a,b) lexicographic asc, min_pair_count
# stop), and n_merges is fixed at 12 in the queries() entries, so the loop
# unrolls into 12 chained CTE rounds. Each round: pair counts over the
# current segmentation -> single winner (empty when the best count < 2;
# once stopped it stays stopped, since no merge was applied) -> greedy
# left-to-right merge expressed NON-sequentially: a merge starts at i iff
# (syms[i], syms[i+1]) = (a, b) and, when a = b, an EVEN number of
# consecutive a's precedes i in its run (matches at distinct a != b never
# overlap, runs of a = b pair up from the left — provably the greedy fold).
# MATERIALIZED CTEs: each round's vocab is referenced twice downstream;
# inlining would double the scan count per round (2^12 blowup).
# ---------------------------------------------------------------------------

def _bpe_rounds_sql(n_merges: int = 12, min_cnt: int = 2) -> str:
    """WITH-clause body for the unrolled BPE merge loop: wc (frequency-
    weighted vocabulary), v0 (char segmentation), then per round r:
    p{r} pair counts, w{r} winner (0 or 1 row), g{r} winner-as-one-row
    (NULLs when stopped — lambdas can't hold subqueries), s{r} merge-start
    positions, v{r} merged vocab."""
    cte = [r"""wc AS MATERIALIZED (
  SELECT w.word, count(*)::BIGINT AS cnt
  FROM documents d,
       unnest(regexp_split_to_array(lower(trim(coalesce(d.text,''))), '\s+')) AS w(word)
  WHERE w.word <> ''
  GROUP BY 1
)""", """v0 AS MATERIALIZED (
  SELECT word, cnt,
         list_transform(generate_series(1, length(word)), i -> word[i]) AS syms
  FROM wc
)"""]
    for r in range(1, n_merges + 1):
        p = r - 1
        cte.append(f"""p{r} AS MATERIALIZED (
  SELECT syms[i] AS a, syms[i+1] AS b, sum(cnt)::BIGINT AS cnt
  FROM v{p}, unnest(generate_series(1, len(syms)-1)) AS t(i)
  WHERE len(syms) >= 2
  GROUP BY 1, 2
)""")
        cte.append(f"""w{r} AS (
  SELECT a, b FROM p{r} WHERE cnt >= {min_cnt}
  ORDER BY cnt DESC, a ASC, b ASC LIMIT 1
)""")
        cte.append(f"""g{r} AS (
  SELECT (SELECT a FROM w{r}) AS a, (SELECT b FROM w{r}) AS b
)""")
        cte.append(f"""s{r} AS MATERIALIZED (
  SELECT word, cnt, syms, g.a AS ma, g.b AS mb,
    list_filter(generate_series(1, len(syms)-1), i ->
      syms[i] = g.a AND syms[i+1] = g.b AND
      (g.a <> g.b OR
       ((i - 1 - coalesce(list_max(list_filter(generate_series(1, i-1),
                                               j -> syms[j] <> g.a)), 0)) % 2 = 0))
    ) AS starts
  FROM v{p} CROSS JOIN g{r} g
)""")
        cte.append(f"""v{r} AS MATERIALIZED (
  SELECT word, cnt,
    CASE WHEN len(starts) = 0 THEN syms ELSE
      list_transform(
        list_filter(generate_series(1, len(syms)), q -> NOT list_contains(starts, q-1)),
        q -> CASE WHEN list_contains(starts, q) THEN ma || mb ELSE syms[q] END)
    END AS syms
  FROM s{r}
)""")
    return ",\n".join(cte)


_BPE_N = 12

ORACLES["bpe_learn_merges"] = (
    "WITH " + _bpe_rounds_sql(_BPE_N) + "\n"
    + "\nUNION ALL\n".join(
        f'SELECT {r - 1} AS rank, a AS "left", b AS "right", a || b AS merged FROM w{r}'
        for r in range(1, _BPE_N + 1)
    )
)

# encode: every corpus word is in the learned vocab (trained on the same
# corpus), but keep the char-length OOV fallback for exact twin-ness
ORACLES["bpe_encode_tokens"] = (
    "WITH " + _bpe_rounds_sql(_BPE_N) + ",\n"
    + r"""enc AS (
  SELECT d.doc_id, w.word
  FROM documents d,
       unnest(regexp_split_to_array(lower(trim(coalesce(d.text,''))), '\s+')) AS w(word)
  WHERE w.word <> ''
)
SELECT e.doc_id, count(*)::BIGINT AS n_words,
       sum(coalesce(len(v.syms), length(e.word)))::BIGINT AS n_bpe_tokens
FROM enc e LEFT JOIN v12 v USING (word)
GROUP BY e.doc_id
"""
)

ORACLES["pack_by_bpe_tokens"] = (
    "WITH " + _bpe_rounds_sql(_BPE_N) + ",\n"
    + rf"""enc AS (
  SELECT d.doc_id, w.word
  FROM documents d,
       unnest(regexp_split_to_array(lower(trim(coalesce(d.text,''))), '\s+')) AS w(word)
  WHERE w.word <> ''
),
counts AS (
  SELECT e.doc_id,
         sum(coalesce(len(v.syms), length(e.word)))::BIGINT AS n_tokens,
         {portable_hash_sql("cast(e.doc_id AS VARCHAR)")} AS h
  FROM enc e LEFT JOIN v12 v USING (word)
  GROUP BY e.doc_id
),
o AS (
  SELECT doc_id, n_tokens,
    cast(coalesce(sum(n_tokens) OVER (ORDER BY h, doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
      AS tok_offset
  FROM counts
)
SELECT doc_id, n_tokens, tok_offset,
  cast(tok_offset // 512 AS BIGINT) AS first_seq,
  cast(tok_offset % 512 AS BIGINT) AS pos_in_first_seq,
  cast((tok_offset + greatest(n_tokens, 1) - 1) // 512 AS BIGINT) AS last_seq,
  cast((tok_offset + greatest(n_tokens, 1) - 1) // 512
       - tok_offset // 512 + 1 AS BIGINT) AS n_seqs
FROM o
"""
)


# ---------------------------------------------------------------------------
# Round-5 operators
# ---------------------------------------------------------------------------

# DSIR-style importance scoring (ops/text.dsir_importance): fixed-point
# target/raw likelihood ratios, broadcast weight join
ORACLES["dsir_importance"] = r"""
WITH words AS (
  SELECT d.doc_id, d.lang, w.word
  FROM documents d,
       unnest(regexp_split_to_array(lower(trim(coalesce(d.text,''))), '\s+')) AS w(word)
  WHERE w.word <> ''
),
wt AS (
  SELECT word,
         (sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) * 1000000) // count(*) AS w
  FROM words GROUP BY word
)
SELECT doc_id, count(*)::BIGINT AS n_tokens,
       sum(w)::BIGINT AS dsir_score,
       (sum(w) // count(*))::BIGINT AS avg_weight
FROM words JOIN wt USING (word)
GROUP BY doc_id
"""

# Integer TF-IDF top-3 terms per doc (ops/retrieval.tfidf_topk_terms)
ORACLES["tfidf_topk_terms"] = r"""
WITH post AS (
  SELECT d.doc_id, w.word AS term, count(*)::BIGINT AS tf
  FROM documents d,
       unnest(regexp_split_to_array(lower(trim(coalesce(d.text,''))), '\s+')) AS w(word)
  WHERE w.word <> ''
  GROUP BY 1, 2
),
dfs AS (SELECT term, count(*)::BIGINT AS df FROM post GROUP BY term),
n AS (SELECT count(*)::BIGINT AS n_docs FROM documents),
scored AS (
  SELECT p.doc_id, p.term, p.tf, f.df,
         (p.tf * ((n.n_docs * 1000) // f.df))::BIGINT AS tfidf
  FROM post p JOIN dfs f USING (term) CROSS JOIN n
)
SELECT doc_id, term, tf, df, tfidf, term_rank FROM (
  SELECT *, cast(row_number() OVER (PARTITION BY doc_id
           ORDER BY tfidf DESC, term ASC) AS INT) AS term_rank
  FROM scored
) WHERE term_rank <= 3
"""

# Levenshtein verification of LSH candidate pairs
# (ops/dedup.edit_distance_verify over lsh_candidate_pairs' oracle SQL)
ORACLES["edit_distance_verify"] = f"""
WITH cand AS ({ORACLES["lsh_candidate_pairs"]}),
norm AS (
  SELECT doc_id,
         substring(regexp_replace(lower(trim(coalesce(text,''))), '\\s+', ' ', 'g'),
                   1, 2000) AS t
  FROM documents
),
j AS (
  SELECT c.doc_a, c.doc_b,
         levenshtein(a.t, b.t)::BIGINT AS edit_dist,
         greatest(length(a.t), length(b.t))::BIGINT AS longer_len
  FROM cand c
  JOIN norm a ON a.doc_id = c.doc_a
  JOIN norm b ON b.doc_id = c.doc_b
)
SELECT doc_a, doc_b, edit_dist, longer_len,
       CASE WHEN longer_len > 0
            THEN 10000 - (10000 * edit_dist) // longer_len
            ELSE 10000 END::BIGINT AS sim_bps
FROM j
"""

# Sequential funnel with earliest-arrival semantics
# (ops/relational.funnel_counts, steps view -> click -> purchase)
ORACLES["event_funnel"] = """
WITH s0 AS (
  SELECT user_id, min(ts) AS arr FROM events
  WHERE event_type = 'view' AND user_id IS NOT NULL GROUP BY user_id
),
s1 AS (
  SELECT e.user_id, min(e.ts) AS arr
  FROM events e JOIN s0 ON e.user_id = s0.user_id
  WHERE e.event_type = 'click' AND e.ts > s0.arr
  GROUP BY e.user_id
),
s2 AS (
  SELECT e.user_id, min(e.ts) AS arr
  FROM events e JOIN s1 ON e.user_id = s1.user_id
  WHERE e.event_type = 'purchase' AND e.ts > s1.arr
  GROUP BY e.user_id
)
SELECT 0 AS step_idx, 'view' AS step, count(*)::BIGINT AS n_users FROM s0
UNION ALL
SELECT 1, 'click', count(*)::BIGINT FROM s1 WHERE (SELECT count(*) FROM s1) > 0
UNION ALL
SELECT 2, 'purchase', count(*)::BIGINT FROM s2 WHERE (SELECT count(*) FROM s2) > 0
"""

# Daily first-seen dedup verdicts (ops/dedup.window_dedup_first)
ORACLES["window_dedup_first"] = """
SELECT event_id, user_id, event_type,
       cast(date_trunc('day', ts) AS TIMESTAMP) AS bucket,
       CASE WHEN row_number() OVER (
              PARTITION BY user_id, event_type, date_trunc('day', ts)
              ORDER BY ts ASC, event_id ASC) = 1
            THEN 1 ELSE 0 END AS is_first
FROM events
"""

# JSON field promotion stats (aggregate.json_field_stats)
ORACLES["json_field_stats"] = """
WITH x AS (
  SELECT event_type AS grp,
         TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS v
  FROM events
)
SELECT grp, count(*)::BIGINT AS n_events, count(v)::BIGINT AS n_with_field,
       sum(v)::BIGINT AS sum_v, min(v)::BIGINT AS min_v, max(v)::BIGINT AS max_v,
       count(DISTINCT v)::BIGINT AS n_distinct_v
FROM x GROUP BY grp
"""

# Per-lang token-length histogram (ops/text.token_length_histogram)
ORACLES["token_length_histogram"] = r"""
WITH t AS (
  SELECT lang AS grp,
    cast(CASE WHEN length(trim(coalesce(text, ''))) = 0 THEN 0
         ELSE length(regexp_split_to_array(lower(trim(text)), '\s+')) END AS BIGINT)
      AS nt
  FROM documents
)
SELECT grp, least((nt // 16) * 16, 512)::BIGINT AS bucket_lo,
       count(*)::BIGINT AS n_docs, sum(nt)::BIGINT AS sum_tokens
FROM t GROUP BY 1, 2
"""

# ANN recall@5 harness (ops/similarity.knn_recall_eval): the production
# knn_join plan (queries vec_id < 50, k = 5, 16 cells, 4 probes) vs exact
# brute-force ground truth on the same bounded query sample
ORACLES["knn_recall_eval"] = f"""
WITH qv AS (SELECT vec_id, {_QUANT} AS q FROM embeddings),
cents AS (SELECT vec_id AS cell, q AS cv FROM qv WHERE vec_id < 16),
ascored AS (
  SELECT v.vec_id, v.q, c.cell,
         cast(list_sum(list_transform(range(1, 65), i -> v.q[i] * c.cv[i])) AS BIGINT)
           * 16 - c.cell AS ord
  FROM qv v CROSS JOIN cents c
),
assigned AS (SELECT vec_id, q, arg_max(cell, ord) AS cell FROM ascored GROUP BY vec_id, q),
queries AS (SELECT vec_id AS query_id, q AS qq FROM qv WHERE vec_id < 50),
probe AS (
  SELECT query_id, qq, cell FROM (
    SELECT qu.query_id, qu.qq, c.cell,
           row_number() OVER (PARTITION BY qu.query_id ORDER BY
             cast(list_sum(list_transform(range(1, 65), i -> c.cv[i] * qu.qq[i])) AS BIGINT)
               * 16 - c.cell DESC) AS rn
    FROM queries qu CROSS JOIN cents c
  ) WHERE rn <= 4
),
approx AS (
  SELECT query_id, vec_id FROM (
    SELECT p.query_id, a.vec_id,
           row_number() OVER (PARTITION BY p.query_id ORDER BY
             cast(list_sum(list_transform(range(1, 65), i -> a.q[i] * p.qq[i])) AS BIGINT)
               DESC, a.vec_id) AS rnk
    FROM probe p JOIN assigned a USING (cell)
    WHERE a.vec_id <> p.query_id
  ) WHERE rnk <= 5
),
exact AS (
  SELECT query_id, vec_id FROM (
    SELECT q.query_id, v.vec_id,
           row_number() OVER (PARTITION BY q.query_id ORDER BY
             cast(list_sum(list_transform(range(1, 65), i -> v.q[i] * q.qq[i])) AS BIGINT)
               DESC, v.vec_id) AS rn
    FROM queries q CROSS JOIN qv v
    WHERE v.vec_id <> q.query_id
  ) WHERE rn <= 5
)
SELECT e.query_id,
       count(a.vec_id)::BIGINT AS n_hits,
       ((10000 * count(a.vec_id)) // 5)::BIGINT AS recall_bps
FROM exact e LEFT JOIN approx a
  ON a.query_id = e.query_id AND a.vec_id = e.vec_id
GROUP BY e.query_id
"""


# Fixed-point PMI collocations (ops/text.pmi_collocations)
ORACLES["pmi_collocations"] = r"""
WITH tk AS (
  SELECT list_filter(regexp_split_to_array(lower(trim(coalesce(text,''))), '\s+'),
                     t -> t <> '') AS toks
  FROM documents
),
pairs AS (
  SELECT toks[i] AS a, toks[i+1] AS b
  FROM tk, unnest(generate_series(1, len(toks)-1)) AS t(i)
  WHERE len(toks) >= 2
),
pc AS (SELECT a, b, count(*)::BIGINT AS pair_cnt FROM pairs GROUP BY a, b),
uni AS (
  SELECT w, count(*)::BIGINT AS cnt FROM (
    SELECT a AS w FROM pairs UNION ALL SELECT b AS w FROM pairs
  ) GROUP BY w
),
tot AS (SELECT sum(pair_cnt)::BIGINT AS n FROM pc)
SELECT pc.a, pc.b, pc.pair_cnt,
       ((pc.pair_cnt * tot.n * 1000) // (ua.cnt * ub.cnt))::BIGINT AS score1k
FROM pc
JOIN uni ua ON ua.w = pc.a
JOIN uni ub ON ub.w = pc.b
CROSS JOIN tot
WHERE pc.pair_cnt >= 5
ORDER BY score1k DESC, pc.a ASC, pc.b ASC
LIMIT 100
"""

# Per-language percent-rank score calibration (ops/text.rank_calibrated_quality)
ORACLES["rank_calibrated_quality"] = """
WITH r AS (
  SELECT doc_id, lang AS grp, n_chars AS score,
         rank() OVER (PARTITION BY lang ORDER BY n_chars ASC) - 1 AS rk,
         count(*) OVER (PARTITION BY lang) - 1 AS n1
  FROM documents
)
SELECT doc_id, grp, score,
       ((rk * 10000) // greatest(n1, 1))::BIGINT AS pr_bps,
       CASE WHEN (rk * 10000) // greatest(n1, 1) >= 2000 THEN 1 ELSE 0 END AS keep
FROM r
"""

# Median/MAD per-minute rate anomalies (aggregate.rate_anomaly_mad):
# percentile-disc medians via the same row_number construction as Spark
ORACLES["rate_anomaly_mad"] = """
WITH b AS (
  SELECT event_type, cast(date_trunc('minute', ts) AS TIMESTAMP) AS minute,
         count(*)::BIGINT AS cnt
  FROM events GROUP BY 1, 2
),
rm AS (
  SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY cnt ASC, minute ASC) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM b
),
med AS (SELECT event_type, cnt AS med FROM rm WHERE rn = (n + 1) // 2),
d AS (
  SELECT b.*, med.med, abs(b.cnt - med.med) AS dev
  FROM b JOIN med USING (event_type)
),
rd AS (
  SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY dev ASC, minute ASC) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM d
),
mad AS (SELECT event_type, dev AS mad FROM rd WHERE rn = (n + 1) // 2)
SELECT d.event_type, d.minute, d.cnt, d.med, mad.mad,
       CASE WHEN d.dev * 100 > 300 * greatest(mad.mad, 1) THEN 1 ELSE 0 END AS is_anomaly
FROM d JOIN mad USING (event_type)
"""

# Per-conversation structural stats (aggregate.conv_stats)
ORACLES["conv_stats"] = f"""
WITH {TURNS_CTE},
lagged AS (
  SELECT conv_id, length(coalesce(text, '')) AS len, role,
         lag(role) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS prev_role
  FROM turns
)
SELECT conv_id, count(*)::BIGINT AS n_turns,
       count(DISTINCT role)::BIGINT AS n_roles,
       sum(CASE WHEN role IS NOT DISTINCT FROM prev_role THEN 1 ELSE 0 END)::BIGINT
         AS n_breaks,
       sum(len)::BIGINT AS total_chars,
       (sum(len) // count(*))::BIGINT AS mean_turn_chars
FROM lagged GROUP BY conv_id
"""


# Cohort retention matrix (aggregate.cohort_retention): distinct (user, day)
# -> first-day cohort -> (cohort, offset) distinct-user cells
ORACLES["cohort_retention"] = """
WITH ud AS (
  SELECT DISTINCT user_id,
         cast(floor(epoch(date_trunc('day', ts))) AS BIGINT) AS d
  FROM events
),
f AS (SELECT user_id, min(d) AS cohort_day FROM ud GROUP BY user_id)
SELECT f.cohort_day, ((ud.d - f.cohort_day) // 86400)::BIGINT AS offset_d,
       count(DISTINCT ud.user_id)::BIGINT AS n_users
FROM ud JOIN f USING (user_id)
GROUP BY 1, 2
"""

# Half-life-decayed activity score (aggregate.decayed_activity): integer
# shift decay, seconds truncated identically (floor(epoch)) on both engines
ORACLES["decayed_activity"] = """
WITH ref AS (
  SELECT max(cast(floor(epoch(ts)) AS BIGINT)) AS r FROM events
)
SELECT user_id, count(*)::BIGINT AS n_events,
       sum(10000 // (1::BIGINT << least(
             (ref.r - cast(floor(epoch(ts)) AS BIGINT)) // 86400, 62)::INT)
       )::BIGINT AS score
FROM events CROSS JOIN ref
GROUP BY user_id
"""

# Within-session event-type trigram paths (aggregate.session_path_trigrams):
# 30-min-gap sessionize per user, ordered path, length-3 windows, top-50
ORACLES["session_path_trigrams"] = """
WITH e AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN lag(ts) OVER w IS NULL
                OR cast(floor(epoch(ts)) AS BIGINT)
                   - cast(floor(epoch(lag(ts) OVER w)) AS BIGINT) > 1800
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
  SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS sess
  FROM e
),
p AS (
  SELECT user_id, sess, list(event_type ORDER BY ts, event_id) AS path
  FROM s GROUP BY user_id, sess
),
tri AS (
  SELECT path[i] AS e1, path[i+1] AS e2, path[i+2] AS e3
  FROM p, unnest(generate_series(1, len(path) - 2)) AS t(i)
  WHERE len(path) >= 3
)
SELECT e1, e2, e3, count(*)::BIGINT AS cnt
FROM tri GROUP BY 1, 2, 3
ORDER BY cnt DESC, e1 ASC, e2 ASC, e3 ASC
LIMIT 50
"""

# NFC normalization audit (ops/text.nfc_normalize_docs): DuckDB's builtin
# nfc_normalize vs the Spark side's stdlib unicodedata pandas_udf — two
# independent implementations of the same public Unicode algorithm
ORACLES["nfc_normalize_docs"] = """
WITH n AS (
  SELECT doc_id, coalesce(text, '') AS raw,
         nfc_normalize(coalesce(text, '')) AS nfc
  FROM documents
)
SELECT doc_id,
       CASE WHEN raw <> nfc THEN 1 ELSE 0 END AS changed,
       length(raw)::BIGINT AS n_before,
       length(nfc)::BIGINT AS n_after,
       md5(nfc) AS norm_md5
FROM n
"""


# Audience-overlap matrix (aggregate.audience_overlap): exact Jaccard in
# bps between event-type user sets, pairs via co-located self-join
ORACLES["audience_overlap"] = """
WITH ua AS (SELECT DISTINCT event_type AS t, user_id FROM events),
sz AS (SELECT t, count(*)::BIGINT AS n FROM ua GROUP BY t)
SELECT a.t AS t1, b.t AS t2, sa.n AS n_a, sb.n AS n_b,
       count(*)::BIGINT AS inter,
       ((count(*) * 10000) // (sa.n + sb.n - count(*)))::BIGINT AS jaccard_bps
FROM ua a
JOIN ua b ON a.user_id = b.user_id AND a.t < b.t
JOIN sz sa ON sa.t = a.t
JOIN sz sb ON sb.t = b.t
GROUP BY a.t, b.t, sa.n, sb.n
"""

# Transcript protocol validation (aggregate.conv_protocol_check)
ORACLES["conv_protocol_check"] = f"""
WITH {TURNS_CTE},
ua AS (
  SELECT conv_id,
         sum(CASE WHEN role = prev THEN 1 ELSE 0 END)::BIGINT AS ua_violations
  FROM (
    SELECT conv_id, role,
           lag(role) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS prev
    FROM turns WHERE role IN ('user', 'assistant')
  ) GROUP BY conv_id
),
base AS (
  SELECT conv_id, count(*)::BIGINT AS n_turns,
         arg_min(role, turn_idx) AS first_role,
         arg_max(role, turn_idx) AS last_role,
         sum(CASE WHEN role = 'system' AND turn_idx > 0 THEN 1 ELSE 0 END)::BIGINT
           AS late_system
  FROM turns GROUP BY conv_id
)
SELECT b.conv_id, b.n_turns, b.first_role, b.last_role, b.late_system,
       coalesce(ua.ua_violations, 0)::BIGINT AS ua_violations,
       CASE WHEN b.first_role IN ('system', 'user')
             AND b.last_role IN ('assistant', 'tool')
             AND b.late_system = 0
             AND coalesce(ua.ua_violations, 0) = 0
            THEN 1 ELSE 0 END AS protocol_ok
FROM base b LEFT JOIN ua USING (conv_id)
"""

# Within-conversation repeated-turn detector (aggregate.intra_conv_dup_turns)
ORACLES["intra_conv_dup_turns"] = f"""
WITH {TURNS_CTE},
d AS (
  SELECT conv_id,
         row_number() OVER (
           PARTITION BY conv_id, md5(coalesce(text, ''))
           ORDER BY turn_idx) AS seen
  FROM turns
)
SELECT conv_id, count(*)::BIGINT AS n_turns,
       sum(CASE WHEN seen = 1 THEN 1 ELSE 0 END)::BIGINT AS n_distinct_texts,
       sum(CASE WHEN seen > 1 THEN 1 ELSE 0 END)::BIGINT AS n_dup_turns
FROM d GROUP BY conv_id
"""


# ---------------------------------------------------------------------------
# Integer fixed-point PageRank over the token-adjacency graph
# (ops/graph.token_pagerank): the iterative rounds unroll as chained CTEs
# exactly like the BPE merge loop above — same PMI tokenization, top-200
# node cut, 5 rounds of (r*w)//W_out contributions with 85% damping.
# ---------------------------------------------------------------------------


def _pagerank_sql(iters: int = 5, top_n: int = 200, scale: int = 10**12,
                  d_pct: int = 85) -> str:
    base = rf"""tk AS (
  SELECT list_filter(regexp_split_to_array(lower(trim(coalesce(text,''))), '\s+'),
                     t -> t <> '') AS toks
  FROM documents
),
pairs AS (
  SELECT toks[i] AS a, toks[i+1] AS b
  FROM tk, unnest(generate_series(1, len(toks)-1)) AS t(i)
  WHERE len(toks) >= 2
),
uni AS (
  SELECT w, count(*)::BIGINT AS cnt FROM (
    SELECT a AS w FROM pairs UNION ALL SELECT b AS w FROM pairs
  ) GROUP BY w
),
nd AS (SELECT w FROM uni ORDER BY cnt DESC, w ASC LIMIT {top_n}),
e AS (
  SELECT pairs.a, pairs.b, count(*)::BIGINT AS w
  FROM pairs JOIN nd na ON na.w = pairs.a JOIN nd nb ON nb.w = pairs.b
  GROUP BY pairs.a, pairs.b
),
ow AS (SELECT a, sum(w)::BIGINT AS w_out FROM e GROUP BY a),
nodes AS (
  SELECT DISTINCT token FROM (
    SELECT a AS token FROM e UNION ALL SELECT b AS token FROM e)
),
nn AS (SELECT count(*)::BIGINT AS c FROM nodes),
r0 AS (SELECT nodes.token, ({scale} // nn.c)::BIGINT AS r
       FROM nodes CROSS JOIN nn)"""
    rounds = []
    for i in range(1, iters + 1):
        rounds.append(f"""s{i} AS (
  SELECT e.b AS token, sum((r{i-1}.r * e.w) // ow.w_out)::BIGINT AS s
  FROM e JOIN r{i-1} ON r{i-1}.token = e.a JOIN ow ON ow.a = e.a
  GROUP BY e.b
),
r{i} AS (
  SELECT nodes.token,
         ((({100 - d_pct} * ({scale} // nn.c)) // 100)
          + ({d_pct} * coalesce(s{i}.s, 0)) // 100)::BIGINT AS r
  FROM nodes CROSS JOIN nn LEFT JOIN s{i} USING (token)
)""")
    return (
        "WITH " + base + ",\n" + ",\n".join(rounds)
        + f"\nSELECT token, r AS rank_fp FROM r{iters}"
    )


ORACLES["token_pagerank"] = _pagerank_sql()

# CDC snapshot diff (ops/maintenance.snapshot_diff): old = documents minus
# doc_id%10==0 with a ' [v1]' mutation on doc_id%7==0; new = documents
# minus doc_id%13==0 — all four statuses populated, digests joined not
# bodies (single payload col => md5(text) == md5(concat_ws-rendering)).
ORACLES["snapshot_diff"] = """
WITH o AS (
  SELECT doc_id,
         md5(CASE WHEN doc_id % 7 = 0 THEN coalesce(text,'') || ' [v1]'
                  ELSE coalesce(text,'') END) AS h
  FROM documents WHERE doc_id % 10 <> 0
),
n AS (
  SELECT doc_id, md5(coalesce(text,'')) AS h
  FROM documents WHERE doc_id % 13 <> 0
)
SELECT doc_id,
       CASE WHEN o.h IS NULL THEN 'added'
            WHEN n.h IS NULL THEN 'removed'
            WHEN o.h <> n.h THEN 'changed'
            ELSE 'unchanged' END AS status
FROM o FULL OUTER JOIN n USING (doc_id)
"""

# Order-independent per-bucket table checksums
# (ops/maintenance.partition_checksums) over documents, cols sorted by
# name: doc_id, lang, n_chars, source, text.
_PC_RENDER = (
    "concat_ws(chr(31), coalesce(cast(doc_id AS VARCHAR),''), "
    "coalesce(lang,''), coalesce(cast(n_chars AS VARCHAR),''), "
    "coalesce(source,''), coalesce(text,''))"
)
ORACLES["partition_checksums"] = f"""
WITH r AS (SELECT {portable_hash_sql(_PC_RENDER)} AS h FROM documents)
SELECT (h % 256)::BIGINT AS bucket,
       count(*)::BIGINT AS n_rows,
       bit_xor(h)::BIGINT AS xor_h,
       (sum(h % 1000003) % 1000003)::BIGINT AS sum_mod,
       min(h)::BIGINT AS min_h,
       max(h)::BIGINT AS max_h
FROM r GROUP BY 1
"""

# SymSpell deletion-neighborhood spell pairs (ops/text.spell_candidate_pairs)
# over documents with deterministic planted typos: docs with doc_id%37==0
# append their first token minus its 2nd char (tokens of length >= 5).
ORACLES["spell_candidate_pairs"] = r"""
WITH d0 AS (
  SELECT doc_id, text,
         list_filter(regexp_split_to_array(lower(trim(coalesce(text,''))), '\s+'),
                     x -> x <> '')[1] AS t1
  FROM documents
),
docs2 AS (
  SELECT CASE WHEN doc_id % 37 = 0 AND t1 IS NOT NULL AND length(t1) >= 5
              THEN coalesce(text,'') || ' ' || (substr(t1,1,1) || substr(t1,3))
              ELSE coalesce(text,'') END AS text
  FROM d0
),
vocab AS (
  SELECT w, count(*)::BIGINT AS cnt FROM (
    SELECT u.w
    FROM docs2,
         unnest(list_filter(regexp_split_to_array(lower(trim(coalesce(text,''))), '\s+'),
                            x -> x <> '')) AS u(w)
  ) GROUP BY w HAVING length(w) >= 4
),
var AS (
  SELECT DISTINCT w, cnt,
         CASE WHEN i = 0 THEN w
              ELSE substr(w, 1, i-1) || substr(w, i+1) END AS v
  FROM vocab, unnest(generate_series(0, length(w))) AS t(i)
)
SELECT DISTINCT l.w AS w1, r.w AS w2, l.cnt AS cnt1, r.cnt AS cnt2
FROM var l JOIN var r USING (v)
WHERE l.w < r.w AND levenshtein(l.w, r.w) = 1
"""


# ---------------------------------------------------------------------------
# Label propagation + k-hop reachability (ops/graph.py): same unrolled-CTE
# strategy as token_pagerank; shared tokenization/edge CTEs.
# ---------------------------------------------------------------------------

_GRAPH_BASE = r"""tk AS (
  SELECT list_filter(regexp_split_to_array(lower(trim(coalesce(text,''))), '\s+'),
                     t -> t <> '') AS toks
  FROM documents
),
pairs AS (
  SELECT toks[i] AS a, toks[i+1] AS b
  FROM tk, unnest(generate_series(1, len(toks)-1)) AS t(i)
  WHERE len(toks) >= 2
),
uni AS (
  SELECT w, count(*)::BIGINT AS cnt FROM (
    SELECT a AS w FROM pairs UNION ALL SELECT b AS w FROM pairs
  ) GROUP BY w
),
nd AS (SELECT w FROM uni ORDER BY cnt DESC, w ASC LIMIT 200),
e AS (
  SELECT pairs.a, pairs.b, count(*)::BIGINT AS w
  FROM pairs JOIN nd na ON na.w = pairs.a JOIN nd nb ON nb.w = pairs.b
  GROUP BY pairs.a, pairs.b
)"""


def _label_propagation_sql(iters: int = 4) -> str:
    parts = [_GRAPH_BASE + r""",
eu AS (
  SELECT a, b, sum(w)::BIGINT AS w FROM (
    SELECT a, b, w FROM e UNION ALL SELECT b AS a, a AS b, w FROM e
  ) GROUP BY a, b
),
l0 AS (
  SELECT DISTINCT token, token AS label FROM (
    SELECT a AS token FROM e UNION ALL SELECT b AS token FROM e)
)"""]
    for i in range(1, iters + 1):
        parts.append(f"""l{i} AS (
  SELECT b AS token, label
  FROM (
    SELECT eu.b, l{i-1}.label, sum(eu.w)::BIGINT AS ws
    FROM eu JOIN l{i-1} ON l{i-1}.token = eu.a
    GROUP BY eu.b, l{i-1}.label
  ) t
  QUALIFY row_number() OVER (PARTITION BY b ORDER BY ws DESC, label ASC) = 1
)""")
    return (
        "WITH " + ",\n".join(parts)
        + f"\nSELECT token, label AS community FROM l{iters}"
    )


def _khop_sql(k: int = 3) -> str:
    parts = [_GRAPH_BASE + """,
sd AS (SELECT w AS token FROM uni ORDER BY cnt DESC, w ASC LIMIT 1),
h0 AS (SELECT token, 0 AS hops FROM sd)"""]
    for i in range(1, k + 1):
        parts.append(f"""h{i} AS (
  SELECT token, min(hops)::INT AS hops FROM (
    SELECT token, hops FROM h{i-1}
    UNION ALL
    SELECT e.b AS token, {i} AS hops FROM e JOIN h{i-1} ON h{i-1}.token = e.a
  ) GROUP BY token
)""")
    return "WITH " + ",\n".join(parts) + f"\nSELECT token, hops FROM h{k}"


ORACLES["label_propagation"] = _label_propagation_sql()
ORACLES["khop_reach"] = _khop_sql()

# Token-distribution drift monitor (ops/text.vocab_drift): base = even
# doc_ids, cand = odd doc_ids with ' driftterm' planted on doc_id%11==0 —
# integer ppm rate-deviation statistic, +1-smoothed.
ORACLES["vocab_drift"] = r"""
WITH base AS (SELECT text FROM documents WHERE doc_id % 2 = 0),
cand AS (
  SELECT CASE WHEN doc_id % 11 = 0 THEN coalesce(text,'') || ' driftterm'
              ELSE coalesce(text,'') END AS text
  FROM documents WHERE doc_id % 2 = 1
),
cb AS (
  SELECT u.w, count(*)::BIGINT AS cnt_base
  FROM base, unnest(list_filter(regexp_split_to_array(lower(trim(coalesce(text,''))), '\s+'),
                                x -> x <> '')) AS u(w)
  GROUP BY u.w
),
cc AS (
  SELECT u.w, count(*)::BIGINT AS cnt_cand
  FROM cand, unnest(list_filter(regexp_split_to_array(lower(trim(coalesce(text,''))), '\s+'),
                                x -> x <> '')) AS u(w)
  GROUP BY u.w
),
nb AS (SELECT sum(cnt_base)::BIGINT AS _nb FROM cb),
nc AS (SELECT sum(cnt_cand)::BIGINT AS _nc FROM cc),
j AS (
  SELECT coalesce(cb.w, cc.w) AS w,
         coalesce(cnt_base, 0)::BIGINT AS cnt_base,
         coalesce(cnt_cand, 0)::BIGINT AS cnt_cand
  FROM cb FULL OUTER JOIN cc ON cb.w = cc.w
)
SELECT w AS token, cnt_base, cnt_cand,
       (abs(cnt_cand * _nb - cnt_base * _nc) * 1000000
        // ((cnt_base + 1) * _nc))::BIGINT AS drift_ppm
FROM j CROSS JOIN nb CROSS JOIN nc
WHERE cnt_base + cnt_cand >= 5
ORDER BY drift_ppm DESC, token ASC
LIMIT 100
"""

# Integer OLS slope of monthly order volume per priority class
# (aggregate.monthly_trend_slope). Spark `div` and DuckDB `//` both
# truncate toward zero, so negative slopes bin identically.
ORACLES["monthly_trend_slope"] = """
WITH cells AS (
  SELECT o_orderpriority AS grp,
         (year(o_orderdate) * 12 + month(o_orderdate))::BIGINT AS m,
         count(*)::BIGINT AS y
  FROM orders GROUP BY 1, 2
),
b AS (SELECT grp, min(m) AS m0 FROM cells GROUP BY grp),
x AS (SELECT cells.grp, (m - m0)::BIGINT AS x, y FROM cells JOIN b USING (grp)),
s AS (
  SELECT grp, count(*)::BIGINT AS n, sum(x)::BIGINT AS sx,
         sum(y)::BIGINT AS sy, sum(x*y)::BIGINT AS sxy,
         sum(x*x)::BIGINT AS sxx
  FROM x GROUP BY grp
)
SELECT grp, n AS n_months,
       (n*sxy - sx*sy)::BIGINT AS slope_num,
       (n*sxx - sx*sx)::BIGINT AS slope_den,
       (CASE WHEN n*sxx - sx*sx = 0 THEN 0
             ELSE (n*sxy - sx*sy) * 1000 // (n*sxx - sx*sx) END)::BIGINT
         AS slope_milli
FROM s
"""


# Reciprocal-rank fusion of three BM25 query-expansion rankings
# (ops/retrieval.rrf_fuse): contrib = 1e6 // (60 + rank), ranks from the
# same fixed-point BM25 as bm25_query_join, per-list top-50.
ORACLES["rrf_fusion"] = r"""
WITH q(query_id, token) AS (VALUES
  (1, 'spark'), (1, 'vector'), (1, 'scan'),
  (2, 'join'), (2, 'shuffle'), (2, 'table'),
  (3, 'query'), (3, 'filter')),
tk AS (
  SELECT doc_id,
         regexp_split_to_array(lower(trim(coalesce(text, ''))), '\s+') AS toks
  FROM documents
),
lens AS (SELECT doc_id, cast(len(toks) AS BIGINT) AS dlen FROM tk),
tot AS (
  SELECT count(*) AS n_docs, (10 * sum(dlen)) // count(*) AS avg10 FROM lens
),
posts AS (SELECT doc_id, unnest(toks) AS token FROM tk),
cand AS (
  SELECT q.query_id, p.token, p.doc_id
  FROM posts p JOIN q ON q.token = p.token
),
tfs AS (
  SELECT query_id, token, doc_id, cast(count(*) AS BIGINT) AS tf
  FROM cand GROUP BY query_id, token, doc_id
),
stats AS (
  SELECT token, count(DISTINCT doc_id) AS df
  FROM tfs GROUP BY token
),
scored AS (
  SELECT t.query_id, t.doc_id,
    (cast(floor(ln(cast(2 * tot.n_docs + 2 AS DOUBLE) / (2 * s.df + 1)) * 10000)
          AS BIGINT)
     * t.tf * 22 * tot.avg10)
    // (10 * t.tf * tot.avg10 + 3 * tot.avg10 + 90 * l.dlen) AS contrib
  FROM tfs t JOIN stats s USING (token) JOIN lens l USING (doc_id), tot
),
agg AS (
  SELECT query_id, doc_id, cast(sum(contrib) AS BIGINT) AS sc
  FROM scored GROUP BY query_id, doc_id
),
ranked AS (
  SELECT query_id, doc_id,
         row_number() OVER (
           PARTITION BY query_id ORDER BY sc DESC, doc_id ASC) AS rk
  FROM agg
),
contribs AS (
  SELECT doc_id, 1000000 // (60 + rk) AS c
  FROM ranked WHERE rk <= 50
)
SELECT doc_id, sum(c)::BIGINT AS rrf_score, count(*)::BIGINT AS n_lists
FROM contribs GROUP BY doc_id
ORDER BY rrf_score DESC, doc_id ASC LIMIT 10
"""


def _hll_sliding_oracle(p: int = 6, window_days: int = 3) -> str:
    """Sliding-window twin of _hll_oracle: daily registers expanded to
    each trailing window they feed, max-merged, same integer estimate."""
    from .ops.sketch import _hll_alpha_c

    m = 1 << p
    rbits = 60 - p
    c = _hll_alpha_c(p)
    shift = 61 - c.bit_length()
    s_unit = 1 << shift
    return f"""
WITH h AS (
  SELECT cast(floor(epoch(date_trunc('day', ts))) AS BIGINT) AS d,
         {portable_hash_sql("cast(user_id AS VARCHAR)")} AS hh
  FROM events WHERE user_id IS NOT NULL
),
reg AS (
  SELECT d, hh // {1 << rbits} AS bucket,
         max(CASE WHEN hh % {1 << rbits} = 0 THEN {rbits + 1}
             ELSE {rbits + 1} - length(bin(hh % {1 << rbits})) END) AS rho
  FROM h GROUP BY d, bucket
),
exp AS (
  SELECT d + i * 86400 AS wd, bucket, rho
  FROM reg, unnest(generate_series(0, {window_days - 1})) AS t(i)
),
mg AS (SELECT wd, bucket, max(rho) AS rho FROM exp GROUP BY wd, bucket),
days AS (SELECT DISTINCT d FROM h),
mgd AS (SELECT mg.wd, mg.bucket, mg.rho FROM mg JOIN days ON days.d = mg.wd),
agg AS (
  SELECT wd, count(*) AS nb, sum({s_unit} >> rho) AS sm
  FROM mgd GROUP BY wd
)
SELECT wd::BIGINT AS day,
       cast({c * s_unit} // greatest(sm + ({m} - nb) * {s_unit}, 1) AS BIGINT)
         AS hll_est
FROM agg
"""


ORACLES["hll_sliding_distinct"] = _hll_sliding_oracle()

# Corpus-wide role-transition matrix (aggregate.role_transitions)
ORACLES["role_transitions"] = f"""
WITH {TURNS_CTE},
lagged AS (
  SELECT conv_id, role,
         lag(role) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS prev
  FROM turns
)
SELECT prev AS role_from, role AS role_to,
       count(*)::BIGINT AS n_transitions,
       count(DISTINCT conv_id)::BIGINT AS n_convs
FROM lagged WHERE prev IS NOT NULL
GROUP BY 1, 2
"""


# Asymmetric n-gram containment (ops/dedup.ngram_containment_pairs):
# rare-shingle inverted-index candidates (df in [2, 50]) — NOT MinHash
# banding, whose collision rate tracks Jaccard and drops exactly the
# low-Jaccard subset pairs containment exists to find — then exact
# directional ratios, EITHER >= 3000 kept.
ORACLES["ngram_containment_pairs"] = f"""
WITH {_SHINGLE_CTES},
posts AS (
  SELECT DISTINCT doc_id, {portable_hash_sql('g.g')} AS gh
  FROM sh, unnest(sh.sh) AS g(g)
),
rare AS (
  SELECT gh FROM posts GROUP BY gh
  HAVING count(*) >= 2 AND count(*) <= 50
),
rp AS (SELECT posts.doc_id, posts.gh FROM posts JOIN rare USING (gh)),
cand AS (
  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
  FROM rp x JOIN rp y ON x.gh = y.gh AND x.doc_id < y.doc_id
)
SELECT doc_a, doc_b, cont_ab10k, cont_ba10k FROM (
  SELECT p.doc_a, p.doc_b,
    cast((len(list_intersect(a.sh, b.sh)) * 10000) // len(a.sh) AS BIGINT)
      AS cont_ab10k,
    cast((len(list_intersect(a.sh, b.sh)) * 10000) // len(b.sh) AS BIGINT)
      AS cont_ba10k
  FROM cand p
  JOIN sh a ON a.doc_id = p.doc_a
  JOIN sh b ON b.doc_id = p.doc_b
)
WHERE cont_ab10k >= 3000 OR cont_ba10k >= 3000
"""

# k-anonymity-gated release (aggregate.kanon_release): cells of the
# (event_type, day) cube with < 5 distinct users are suppressed with
# metrics nulled (counted, not dropped).
ORACLES["kanon_release"] = """
WITH cells AS (
  SELECT event_type,
         cast(floor(epoch(date_trunc('day', ts))) AS BIGINT) AS day,
         count(DISTINCT user_id)::BIGINT AS nu,
         count(*)::BIGINT AS ne
  FROM events GROUP BY 1, 2
)
SELECT event_type, day,
       (CASE WHEN nu < 5 THEN 1 ELSE 0 END)::INT AS suppressed,
       CASE WHEN nu < 5 THEN NULL ELSE nu END AS n_users,
       CASE WHEN nu < 5 THEN NULL ELSE ne END AS n_events
FROM cells
"""


# Drain/SLCT-style template mining (ops/templates.log_template_mine):
# digit-run masking, then one aggregate on the bounded template key.
ORACLES["log_template_mine"] = f"""
WITH {TURNS_CTE},
tpl AS (
  SELECT regexp_replace(text, '[0-9]+', '<#>', 'g') AS template, conv_id,
         cast(floor(epoch(date_trunc('day', ts))) AS BIGINT) AS day
  FROM turns WHERE text IS NOT NULL
)
SELECT template, count(*)::BIGINT AS n_lines,
       count(DISTINCT conv_id)::BIGINT AS n_convs,
       min(day) AS first_day, max(day) AS last_day,
       count(DISTINCT day)::BIGINT AS n_days
FROM tpl GROUP BY 1
"""

# Per-template latency SLO profile (ops/templates.template_latency_profile):
# exact discrete percentiles (rank ceil(p*n)), same definition as the
# latency_percentiles oracle, partitioned by the masked template.
ORACLES["template_latency_profile"] = f"""
{_WITH_PARSED},
base AS (
  SELECT regexp_replace(text, '[0-9]+', '<#>', 'g') AS template,
         latency_ms AS val
  FROM parsed WHERE latency_ms IS NOT NULL
),
r AS (
  SELECT template, val,
         row_number() OVER (PARTITION BY template ORDER BY val) AS rn,
         count(*) OVER (PARTITION BY template) AS n
  FROM base
)
SELECT template, max(n)::BIGINT AS n_lines,
       max(CASE WHEN rn = (5000 * n + 9999) // 10000 THEN val END) AS p50,
       max(CASE WHEN rn = (9500 * n + 9999) // 10000 THEN val END) AS p95
FROM r GROUP BY template
"""


# SRE Workbook multiwindow multi-burn-rate alert (ops/sre.burn_rate_alerts):
# hourly burn joined to the enclosing day; 25% budget, page at >= 1.5x both.
ORACLES["burn_rate_alerts"] = f"""
{_WITH_PARSED},
base AS (
  SELECT cast(floor(epoch(ts)) AS BIGINT) AS ep,
         CASE WHEN level = 'ERROR' THEN 1 ELSE 0 END AS err
  FROM parsed WHERE level IS NOT NULL
),
s AS (
  SELECT (ep // 3600) * 3600 AS window_start,
         count(*)::BIGINT AS n_short, sum(err)::BIGINT AS err_short
  FROM base GROUP BY 1
),
l AS (
  SELECT (ep // 86400) * 86400 AS lw,
         count(*)::BIGINT AS nl, sum(err)::BIGINT AS el
  FROM base GROUP BY 1
)
SELECT s.window_start, s.n_short, s.err_short,
       (s.err_short * 4 * 100) // s.n_short AS burn_short_x100,
       (l.el * 4 * 100) // l.nl AS burn_long_x100,
       (CASE WHEN (s.err_short * 4 * 100) // s.n_short >= 150
              AND (l.el * 4 * 100) // l.nl >= 150
             THEN 1 ELSE 0 END)::INT AS page
FROM s JOIN l ON (s.window_start // 86400) * 86400 = l.lw
"""

# Day-over-day exact-p95 shift per log_type (ops/sre.latency_regression):
# FLOOR division on the delta (matches Spark F.floor) so negative deltas
# bin identically; first day per type emitted with NULL baseline.
ORACLES["latency_regression"] = f"""
{_WITH_PARSED},
base AS (
  SELECT log_type,
         cast(floor(epoch(date_trunc('day', ts))) AS BIGINT) AS day,
         latency_ms AS val
  FROM parsed WHERE latency_ms IS NOT NULL AND log_type IS NOT NULL
),
r AS (
  SELECT log_type, day, val,
         row_number() OVER (PARTITION BY log_type, day ORDER BY val) AS rn,
         count(*) OVER (PARTITION BY log_type, day) AS n
  FROM base
),
daily AS (
  SELECT log_type, day, max(n)::BIGINT AS n_lines,
         max(CASE WHEN rn = (9500 * n + 9999) // 10000 THEN val END) AS p95
  FROM r GROUP BY 1, 2
),
lagged AS (
  SELECT *, lag(p95) OVER (PARTITION BY log_type ORDER BY day) AS prev_p95
  FROM daily
)
SELECT log_type, day, n_lines, p95, prev_p95,
       CASE WHEN prev_p95 IS NULL THEN NULL
            ELSE cast(floor((p95 - prev_p95) * 10000.0 / prev_p95) AS BIGINT)
       END AS delta_bp,
       (CASE WHEN prev_p95 IS NULL THEN NULL
             WHEN floor((p95 - prev_p95) * 10000.0 / prev_p95) >= 2000 THEN 1
             ELSE 0 END)::INT AS regressed
FROM lagged
"""

# Cooldown flap suppression (ops/sre.flap_suppress): the recursive CTE
# replays the per-key decision-dependent scan the Spark side runs in
# applyInPandas — kept(i) depends on the last KEPT row, so a plain window
# cannot express it; linear recursion over the rank chain can.
ORACLES["flap_suppress_errors"] = f"""
WITH RECURSIVE {TURNS_CTE}, {PARSED_CTE},
base AS (
  SELECT log_type, conv_id, turn_idx, epoch_us(ts) AS ts_us
  FROM parsed WHERE level = 'ERROR' AND log_type IS NOT NULL
),
ordered AS (
  SELECT *, row_number() OVER (
    PARTITION BY log_type ORDER BY ts_us, conv_id, turn_idx) AS rn
  FROM base
),
walk AS (
  SELECT log_type, conv_id, turn_idx, ts_us, rn, ts_us AS last_kept, 1 AS kept
  FROM ordered WHERE rn = 1
  UNION ALL
  SELECT o.log_type, o.conv_id, o.turn_idx, o.ts_us, o.rn,
         CASE WHEN o.ts_us >= w.last_kept + 14400000000 THEN o.ts_us
              ELSE w.last_kept END,
         CASE WHEN o.ts_us >= w.last_kept + 14400000000 THEN 1 ELSE 0 END
  FROM ordered o JOIN walk w ON o.log_type = w.log_type AND o.rn = w.rn + 1
)
SELECT log_type, conv_id, turn_idx, ts_us, kept::INT AS kept FROM walk
"""


# Event-time disorder per conversation (ops/audit.lateness_audit):
# lateness(i) = max(0, runmax(ep over earlier-arriving turns) - ep(i)).
ORACLES["lateness_audit"] = f"""
WITH {TURNS_CTE},
b AS (
  SELECT conv_id, turn_idx, cast(floor(epoch(ts)) AS BIGINT) AS ep
  FROM turns
),
l AS (
  SELECT conv_id,
         greatest(coalesce(max(ep) OVER (
           PARTITION BY conv_id ORDER BY turn_idx
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) - ep, 0), 0)
           AS late
  FROM b
)
SELECT conv_id, count(*)::BIGINT AS n_turns,
       sum(CASE WHEN late > 0 THEN 1 ELSE 0 END)::BIGINT AS n_late,
       max(late)::BIGINT AS max_late_s,
       sum(late)::BIGINT AS total_late_s
FROM l GROUP BY 1
"""

# Producer seq reconciliation (ops/audit.seq_gap_audit): span - distinct =
# dropped; observed - distinct = redelivered (at-least-once).
ORACLES["seq_gap_audit"] = f"""
WITH {TURNS_CTE},
b AS (
  SELECT conv_id,
         TRY_CAST(nullif(regexp_extract(text, 'seq=(\\d+)', 1), '') AS BIGINT)
           AS seq
  FROM turns
)
SELECT conv_id, count(*)::BIGINT AS n_seq_lines,
       min(seq) AS min_seq, max(seq) AS max_seq,
       (max(seq) - min(seq) + 1 - count(DISTINCT seq))::BIGINT AS n_missing,
       (count(*) - count(DISTINCT seq))::BIGINT AS n_dups
FROM b WHERE seq IS NOT NULL GROUP BY 1
"""

# Deequ-style column profile of turns (ops/audit.dq_profile): one row per
# column, values compared as string casts (injective in both engines, so
# null/distinct counts agree even though formatting may differ).
_DQ_COL = """
SELECT '{c}' AS col_name, count(*)::BIGINT AS n_rows,
       sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_null,
       count(DISTINCT cast({c} AS VARCHAR))::BIGINT AS n_distinct,
       ((count(*) - sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END)) * 10000)
         // count(*) AS completeness_bp
FROM turns
"""
ORACLES["dq_profile_turns"] = (
    f"WITH {TURNS_CTE}\n"
    + "\nUNION ALL\n".join(
        _DQ_COL.format(c=c)
        for c in ("conv_id", "turn_idx", "role", "text", "tool", "ts")
    )
)

# Age-based lifecycle plan (ops/audit.storage_tiering_plan): per-day
# rows/bytes, hot<7d / warm<30d / cold, newest-first cumulative bytes.
ORACLES["storage_tiering_plan"] = f"""
WITH {TURNS_CTE},
daily AS (
  SELECT cast(floor(epoch(date_trunc('day', ts))) AS BIGINT) AS day,
         count(*)::BIGINT AS n_rows, sum(strlen(text))::BIGINT AS bytes
  FROM turns GROUP BY 1
),
j AS (SELECT daily.*, (SELECT max(day) FROM daily) AS newest FROM daily)
SELECT day, n_rows, bytes,
       (newest - day) // 86400 AS age_days,
       CASE WHEN (newest - day) // 86400 < 7 THEN 'hot'
            WHEN (newest - day) // 86400 < 30 THEN 'warm'
            ELSE 'cold' END AS tier,
       sum(bytes) OVER (ORDER BY day DESC
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT
         AS cum_bytes_newer
FROM j
"""


# Latency-SLO attainment per (log_type, day) (ops/sre.sli_attainment).
ORACLES["sli_attainment"] = f"""
{_WITH_PARSED},
base AS (
  SELECT log_type,
         cast(floor(epoch(date_trunc('day', ts))) AS BIGINT) AS day,
         CASE WHEN latency_ms <= 1000 THEN 1 ELSE 0 END AS good
  FROM parsed WHERE latency_ms IS NOT NULL AND log_type IS NOT NULL
)
SELECT log_type, day, count(*)::BIGINT AS n_lines,
       sum(good)::BIGINT AS n_good,
       (sum(good) * 10000) // count(*) AS sli_bp,
       (CASE WHEN (sum(good) * 10000) // count(*) < 5000 THEN 1 ELSE 0 END)::INT
         AS breach
FROM base GROUP BY 1, 2
"""

# MTTR per log_type (ops/sre.incident_mttr): recovery = earliest
# event-time INFO arriving later (turn_idx order) in the conversation.
# mean is FLOOR(total/resolved) in both engines (negative-safe).
ORACLES["incident_mttr"] = f"""
{_WITH_PARSED},
b AS (
  SELECT conv_id, turn_idx, log_type, level,
         cast(floor(epoch(ts)) AS BIGINT) AS ep
  FROM parsed WHERE level IS NOT NULL AND log_type IS NOT NULL
),
r AS (
  SELECT *, min(CASE WHEN level = 'INFO' THEN ep END) OVER (
    PARTITION BY conv_id ORDER BY turn_idx
    ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS rec
  FROM b
),
e AS (SELECT log_type, rec - ep AS ttr FROM r WHERE level = 'ERROR')
SELECT log_type, count(*)::BIGINT AS n_errors,
       sum(CASE WHEN ttr IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_resolved,
       sum(ttr)::BIGINT AS total_ttr_s,
       CASE WHEN sum(CASE WHEN ttr IS NOT NULL THEN 1 ELSE 0 END) > 0
            THEN cast(floor(sum(ttr) * 1.0 /
                 sum(CASE WHEN ttr IS NOT NULL THEN 1 ELSE 0 END)) AS BIGINT)
            ELSE NULL END AS mean_ttr_s,
       max(ttr)::BIGINT AS max_ttr_s
FROM e GROUP BY 1
"""

# Right-to-erasure rewrite plan (ops/maintenance.erasure_plan) with the
# deterministic user_id % 53 == 0 tombstone set.
ORACLES["erasure_plan"] = """
WITH cells AS (
  SELECT cast(floor(epoch(date_trunc('day', ts))) AS BIGINT) AS day,
         count(*)::BIGINT AS n_rows,
         sum(CASE WHEN user_id % 53 = 0 THEN 1 ELSE 0 END)::BIGINT AS n_del
  FROM events GROUP BY 1
)
SELECT day, n_rows, n_del,
       (n_del * 10000) // n_rows AS del_share_bp,
       CASE WHEN n_del > 0 THEN (n_rows * 10000) // n_del ELSE NULL END
         AS rewrite_amp_bp
FROM cells
"""


# Flagship log-triage composition (ops/templates.sre_triage_report):
# template mine + latency percentiles + error share + novelty, joined on
# the bounded template vocabulary.
ORACLES["sre_triage_report"] = f"""
{_WITH_PARSED},
tpl AS (
  SELECT regexp_replace(text, '[0-9]+', '<#>', 'g') AS template, conv_id,
         cast(floor(epoch(date_trunc('day', ts))) AS BIGINT) AS day
  FROM turns WHERE text IS NOT NULL
),
t AS (
  SELECT template, count(*)::BIGINT AS n_lines,
         count(DISTINCT conv_id)::BIGINT AS n_convs,
         min(day) AS first_day, max(day) AS last_day
  FROM tpl GROUP BY 1
),
lbase AS (
  SELECT regexp_replace(text, '[0-9]+', '<#>', 'g') AS template,
         latency_ms AS val
  FROM parsed WHERE latency_ms IS NOT NULL
),
lr AS (
  SELECT template, val,
         row_number() OVER (PARTITION BY template ORDER BY val) AS rn,
         count(*) OVER (PARTITION BY template) AS n
  FROM lbase
),
lat AS (
  SELECT template,
         max(CASE WHEN rn = (5000 * n + 9999) // 10000 THEN val END) AS p50,
         max(CASE WHEN rn = (9500 * n + 9999) // 10000 THEN val END) AS p95
  FROM lr GROUP BY 1
),
e AS (
  SELECT regexp_replace(text, '[0-9]+', '<#>', 'g') AS template,
         (sum(CASE WHEN level = 'ERROR' THEN 1 ELSE 0 END) * 10000)
           // count(*) AS err_bp
  FROM parsed WHERE level IS NOT NULL GROUP BY 1
),
mx AS (SELECT max(last_day) AS newest FROM t)
SELECT t.template, t.n_lines, t.n_convs,
       (mx.newest - t.first_day) // 86400 AS age_days,
       lat.p50, lat.p95, e.err_bp,
       (CASE WHEN t.first_day >= mx.newest - 6 * 86400 THEN 1 ELSE 0 END)::INT
         AS is_new
FROM t LEFT JOIN lat USING (template) LEFT JOIN e USING (template), mx
"""

# Tukey-fence outlier audit per event_type (ops/audit.value_outliers_iqr):
# quartiles on round(value*100) cents, fences x10 integer-exact.
ORACLES["value_outliers_iqr"] = """
WITH base AS (
  SELECT event_type AS grp, cast(round(value * 100) AS BIGINT) AS cents
  FROM events WHERE value IS NOT NULL
),
r AS (
  SELECT grp, cents,
         row_number() OVER (PARTITION BY grp ORDER BY cents) AS rn,
         count(*) OVER (PARTITION BY grp) AS n
  FROM base
),
q AS (
  SELECT grp,
         max(CASE WHEN rn = (2500 * n + 9999) // 10000 THEN cents END) AS q1,
         max(CASE WHEN rn = (7500 * n + 9999) // 10000 THEN cents END) AS q3
  FROM r GROUP BY 1
)
SELECT b.grp AS event_type, count(*)::BIGINT AS n,
       max(q.q1)::BIGINT AS q1_cents, max(q.q3)::BIGINT AS q3_cents,
       sum(CASE WHEN b.cents * 10 < q.q1 * 10 - 15 * (q.q3 - q.q1)
                THEN 1 ELSE 0 END)::BIGINT AS n_low,
       sum(CASE WHEN b.cents * 10 > q.q3 * 10 + 15 * (q.q3 - q.q1)
                THEN 1 ELSE 0 END)::BIGINT AS n_high
FROM base b JOIN q ON b.grp = q.grp
GROUP BY 1
"""

# lang_id heuristic vs labeled lang (ops/text.lang_id_agreement).
ORACLES["lang_id_agreement"] = f"""
WITH pred AS (
  SELECT doc_id, lang,
    CASE WHEN length(regexp_replace(text, '[^一-鿿]', '', 'g')) > 0 THEN 'cjk'
         WHEN {_STOP_HITS} >= 2 THEN 'en'
         ELSE 'unk' END AS pred_lang
  FROM documents
),
cells AS (
  SELECT lang, pred_lang, count(*)::BIGINT AS n FROM pred GROUP BY 1, 2
)
SELECT lang, pred_lang, n,
       cast((n * 10000) // sum(n) OVER (PARTITION BY lang) AS BIGINT)
         AS share_bp
FROM cells
"""


# Rare-signature-preserving tail sampling
# (ops/templates.template_tail_sampling, cap=200): per-template rate gate
# on the portable hash — expected-cap, never a per-template window (the
# dominant template would serialize through one task).
_TTS_KEY = portable_hash_sql("concat(l.conv_id, '|', cast(l.turn_idx AS VARCHAR))")
ORACLES["template_tail_sampling"] = f"""
WITH {TURNS_CTE},
lines AS (
  SELECT conv_id, turn_idx,
         regexp_replace(text, '[0-9]+', '<#>', 'g') AS template
  FROM turns WHERE text IS NOT NULL
),
d AS (SELECT template, count(*)::BIGINT AS df FROM lines GROUP BY 1)
SELECT l.conv_id, l.turn_idx, l.template, d.df,
       cast(least(10000, (200 * 10000) // d.df) AS BIGINT) AS rate_bp,
       (CASE WHEN ({_TTS_KEY} % 10000)
                  < least(10000, (200 * 10000) // d.df)
             THEN 1 ELSE 0 END)::INT AS kept
FROM lines l JOIN d USING (template)
"""


# Filebeat-style multiline stitching (ops/templates.multiline_stitch,
# anchor ^seq=): running anchor count groups continuations with their
# anchor; string_agg ORDER BY turn_idx rebuilds the record byte-exactly.
ORACLES["multiline_stitch"] = f"""
WITH {TURNS_CTE},
g AS (
  SELECT conv_id, turn_idx, text,
         cast(sum(CASE WHEN regexp_matches(text, '^seq=') THEN 1 ELSE 0 END)
           OVER (PARTITION BY conv_id ORDER BY turn_idx
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS group_id
  FROM turns WHERE text IS NOT NULL
)
SELECT conv_id, group_id, count(*)::BIGINT AS n_lines,
       min(turn_idx)::BIGINT AS first_turn_idx,
       string_agg(text, chr(10) ORDER BY turn_idx) AS stitched
FROM g GROUP BY 1, 2
"""


# Incremental rollup maintenance (ops/maintenance.rollup_merge): the
# oracle is the DIRECT aggregate over all events — the hash match proves
# split-rollup-then-merge == direct.
ORACLES["rollup_incremental"] = """
SELECT event_type,
       cast(floor(epoch(date_trunc('day', ts))) AS BIGINT) AS day,
       count(*)::BIGINT AS n_events,
       sum(cast(round(value * 100) AS BIGINT))::BIGINT AS value_cents
FROM events GROUP BY 1, 2
"""


# Daily top-k template leaderboard (ops/templates.daily_top_templates, k=3).
ORACLES["daily_top_templates"] = f"""
WITH {TURNS_CTE},
cells AS (
  SELECT cast(floor(epoch(date_trunc('day', ts))) AS BIGINT) AS day,
         regexp_replace(text, '[0-9]+', '<#>', 'g') AS template,
         count(*)::BIGINT AS n_lines
  FROM turns WHERE text IS NOT NULL GROUP BY 1, 2
),
r AS (
  SELECT *, row_number() OVER (
    PARTITION BY day ORDER BY n_lines DESC, template ASC)::INT AS rnk
  FROM cells
)
SELECT day, rnk, template, n_lines FROM r WHERE rnk <= 3
"""

# Two-window changepoint score on the daily error rate
# (ops/sre.changepoint_error_rate): first day carries NULL before-side.
ORACLES["changepoint_error_rate"] = f"""
{_WITH_PARSED},
daily AS (
  SELECT cast(floor(epoch(date_trunc('day', ts))) AS BIGINT) AS day,
         count(*)::BIGINT AS n,
         sum(CASE WHEN level = 'ERROR' THEN 1 ELSE 0 END)::BIGINT AS err
  FROM parsed WHERE level IS NOT NULL GROUP BY 1
),
c AS (
  SELECT day,
    sum(n) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      AS n_before,
    sum(err) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      AS eb,
    sum(n) OVER (ORDER BY day ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
      AS n_after,
    sum(err) OVER (ORDER BY day ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
      AS ea
  FROM daily
)
SELECT day, n_before::BIGINT AS n_before, n_after::BIGINT AS n_after,
       CASE WHEN n_before IS NULL THEN NULL
            ELSE (eb * 10000) // n_before END::BIGINT AS err_bp_before,
       ((ea * 10000) // n_after)::BIGINT AS err_bp_after,
       CASE WHEN n_before IS NULL THEN NULL
            ELSE abs((ea * 10000) // n_after - (eb * 10000) // n_before)
       END::BIGINT AS score_bp
FROM c
"""


# Correlated template pairs (ops/templates.template_cooccurrence):
# conversation-presence lift in x10000 fixed point.
ORACLES["template_cooccurrence"] = f"""
WITH {TURNS_CTE},
ct AS (
  SELECT DISTINCT conv_id,
         regexp_replace(text, '[0-9]+', '<#>', 'g') AS t
  FROM turns WHERE text IS NOT NULL
),
total AS (SELECT count(DISTINCT conv_id)::BIGINT AS n_convs FROM ct),
marg AS (SELECT t, count(*)::BIGINT AS m FROM ct GROUP BY 1),
pairs AS (
  SELECT a.t AS t1, b.t AS t2, count(*)::BIGINT AS n_both
  FROM ct a JOIN ct b ON a.conv_id = b.conv_id AND a.t < b.t
  GROUP BY 1, 2
)
SELECT p.t1, p.t2, p.n_both, m1.m AS n_t1, m2.m AS n_t2,
       cast((p.n_both * total.n_convs * 10000) // (m1.m * m2.m) AS BIGINT)
         AS lift_x10000
FROM pairs p
JOIN marg m1 ON m1.t = p.t1
JOIN marg m2 ON m2.t = p.t2, total
"""


# Runtime-filter join (ops/relational.bloom_pruned_join): the oracle is
# the PLAIN join — the exact join removes Bloom false positives, so the
# hash match proves the pruning changed nothing but cost.
ORACLES["bloom_pruned_join"] = """
SELECT o.o_orderstatus, count(*)::BIGINT AS n_items,
       cast(sum(cast(round(l.l_extendedprice * (1 - l.l_discount) * 100)
                AS BIGINT)) AS BIGINT) AS revenue_cents
FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderkey % 37 = 0
GROUP BY 1
"""


# Watermark loss curve (ops/audit.watermark_loss_curve): drop counts per
# candidate delay, one lateness pass.
ORACLES["watermark_loss_curve"] = f"""
WITH {TURNS_CTE},
l AS (
  SELECT greatest(coalesce(max(cast(floor(epoch(ts)) AS BIGINT)) OVER (
           PARTITION BY conv_id ORDER BY turn_idx
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           - cast(floor(epoch(ts)) AS BIGINT), 0), 0) AS late
  FROM turns
),
agg AS (
  SELECT count(*)::BIGINT AS n,
         sum(CASE WHEN late > 0 THEN 1 ELSE 0 END)::BIGINT AS d0,
         sum(CASE WHEN late > 60 THEN 1 ELSE 0 END)::BIGINT AS d60,
         sum(CASE WHEN late > 300 THEN 1 ELSE 0 END)::BIGINT AS d300,
         sum(CASE WHEN late > 3600 THEN 1 ELSE 0 END)::BIGINT AS d3600,
         sum(CASE WHEN late > 21600 THEN 1 ELSE 0 END)::BIGINT AS d21600
  FROM l
)
SELECT 0::BIGINT AS watermark_s, n AS n_rows, d0 AS n_dropped,
       (d0 * 10000) // n AS drop_bp FROM agg
UNION ALL SELECT 60, n, d60, (d60 * 10000) // n FROM agg
UNION ALL SELECT 300, n, d300, (d300 * 10000) // n FROM agg
UNION ALL SELECT 3600, n, d3600, (d3600 * 10000) // n FROM agg
UNION ALL SELECT 21600, n, d21600, (d21600 * 10000) // n FROM agg
"""

# Last-touch purchase attribution (aggregate.purchase_attribution).
ORACLES["purchase_attribution"] = """
WITH b AS (
  SELECT user_id, event_id, event_type,
         cast(floor(epoch(ts)) AS BIGINT) AS ep
  FROM events
),
t AS (
  SELECT *,
    last_value(CASE WHEN event_type <> 'purchase' THEN event_type END
               IGNORE NULLS) OVER (
      PARTITION BY user_id ORDER BY ep, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS tt,
    last_value(CASE WHEN event_type <> 'purchase' THEN ep END IGNORE NULLS)
      OVER (
      PARTITION BY user_id ORDER BY ep, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS tep
  FROM b
),
conv AS (
  SELECT coalesce(tt, 'none') AS attributed_type, ep - tep AS gap
  FROM t WHERE event_type = 'purchase'
)
SELECT attributed_type, count(*)::BIGINT AS n_conversions,
       sum(gap)::BIGINT AS total_gap_s,
       CASE WHEN sum(CASE WHEN gap IS NOT NULL THEN 1 ELSE 0 END) > 0
            THEN cast(floor(sum(gap) * 1.0 /
                 sum(CASE WHEN gap IS NOT NULL THEN 1 ELSE 0 END)) AS BIGINT)
            ELSE NULL END AS mean_gap_s
FROM conv GROUP BY 1
"""


# Inter-event gap histogram (aggregate.gap_histogram): integer-exact
# power-of-two buckets via length(bin(gap)) — identical in both engines.
ORACLES["gap_histogram"] = """
WITH b AS (
  SELECT user_id, event_id, cast(floor(epoch(ts)) AS BIGINT) AS ep
  FROM events
),
g AS (
  SELECT ep - lag(ep) OVER (PARTITION BY user_id ORDER BY ep, event_id)
           AS gap
  FROM b
)
SELECT length(bin(gap))::INT AS gap_bucket_bits,
       count(*)::BIGINT AS n_gaps,
       min(gap)::BIGINT AS min_gap_s, max(gap)::BIGINT AS max_gap_s
FROM g WHERE gap IS NOT NULL GROUP BY 1
"""


# Parameter-range recovery per (template, position)
# (ops/templates.template_params): digit runs with 1-based position via
# generate_series indexing (DuckDB lacks WITH ORDINALITY).
ORACLES["template_params"] = f"""
WITH {TURNS_CTE},
tp AS (
  SELECT regexp_replace(text, '[0-9]+', '<#>', 'g') AS template,
         regexp_extract_all(text, '[0-9]+') AS params
  FROM turns WHERE text IS NOT NULL
),
e AS (
  SELECT tp.template, gs.i::INT AS pos,
         TRY_CAST(tp.params[gs.i] AS BIGINT) AS val
  FROM tp, unnest(generate_series(1, len(tp.params))) AS gs(i)
)
SELECT template, pos, count(*)::BIGINT AS n,
       count(DISTINCT val)::BIGINT AS n_distinct,
       min(val) AS min_val, max(val) AS max_val
FROM e WHERE val IS NOT NULL GROUP BY 1, 2
"""


# Routing-config canary diff (route.route_config_diff): A={level=ERROR},
# B={log_type=log_type1}; NULL fields reject (missing-key semantics).
ORACLES["route_config_diff"] = f"""
{_WITH_PARSED},
fl AS (
  SELECT CASE WHEN level = 'ERROR' THEN 1 ELSE 0 END AS a,
         CASE WHEN log_type = 'log_type1' THEN 1 ELSE 0 END AS b
  FROM parsed
)
SELECT count(*)::BIGINT AS n_rows,
       sum(a)::BIGINT AS n_match_a, sum(b)::BIGINT AS n_match_b,
       sum(CASE WHEN a = 1 AND b = 0 THEN 1 ELSE 0 END)::BIGINT AS n_only_a,
       sum(CASE WHEN a = 0 AND b = 1 THEN 1 ELSE 0 END)::BIGINT AS n_only_b,
       sum(CASE WHEN a = 1 AND b = 1 THEN 1 ELSE 0 END)::BIGINT AS n_both
FROM fl
"""

# Sustained-failure islands (ops/sre.error_run_lengths): rank difference
# is constant within a consecutive run.
ORACLES["error_run_lengths"] = f"""
{_WITH_PARSED},
p AS (
  SELECT conv_id, turn_idx, (level = 'ERROR') AS e
  FROM parsed WHERE level IS NOT NULL
),
r AS (
  SELECT *,
    row_number() OVER (PARTITION BY conv_id ORDER BY turn_idx)
    - row_number() OVER (PARTITION BY conv_id, e ORDER BY turn_idx)
      AS island
  FROM p
),
per_run AS (
  SELECT conv_id, island, count(*)::BIGINT AS len
  FROM r WHERE e GROUP BY 1, 2
),
rs AS (
  SELECT conv_id, count(*)::BIGINT AS n_error_runs,
         max(len) AS max_error_run, sum(len)::BIGINT AS n_errors
  FROM per_run GROUP BY 1
),
tot AS (SELECT conv_id, count(*)::BIGINT AS n_lines FROM p GROUP BY 1)
SELECT t.conv_id, t.n_lines,
       coalesce(rs.n_errors, 0)::BIGINT AS n_errors,
       coalesce(rs.n_error_runs, 0)::BIGINT AS n_error_runs,
       coalesce(rs.max_error_run, 0)::BIGINT AS max_error_run
FROM tot t LEFT JOIN rs ON rs.conv_id = t.conv_id
"""


# Referential-integrity audit lineitem->orders
# (ops/audit.fk_integrity_audit).
ORACLES["fk_integrity_audit"] = """
SELECT (SELECT count(*) FROM lineitem)::BIGINT AS n_child,
       (SELECT count(*) FROM lineitem l
         WHERE NOT EXISTS (SELECT 1 FROM orders o
                           WHERE o.o_orderkey = l.l_orderkey))::BIGINT
         AS n_orphans,
       ((SELECT count(*) FROM lineitem l
          WHERE NOT EXISTS (SELECT 1 FROM orders o
                            WHERE o.o_orderkey = l.l_orderkey)) * 10000)
         // (SELECT count(*) FROM lineitem) AS orphan_bp,
       (SELECT count(*) FROM orders)::BIGINT AS n_parents,
       (SELECT count(*) FROM orders o
         WHERE NOT EXISTS (SELECT 1 FROM lineitem l
                           WHERE l.l_orderkey = o.o_orderkey))::BIGINT
         AS n_childless
"""

# Horvitz-Thompson sampling-bias audit
# (ops/templates.sample_bias_audit, cap=200): recomputes the sampler's
# gate + rate, then the HT reconstruction per template.
_SBA_KEY = portable_hash_sql("concat(l.conv_id, '|', cast(l.turn_idx AS VARCHAR))")
ORACLES["sample_bias_audit"] = f"""
WITH {TURNS_CTE},
lines AS (
  SELECT conv_id, turn_idx,
         regexp_replace(text, '[0-9]+', '<#>', 'g') AS template
  FROM turns WHERE text IS NOT NULL
),
d AS (SELECT template, count(*)::BIGINT AS df FROM lines GROUP BY 1),
s AS (
  SELECT l.template,
         cast(least(10000, (200 * 10000) // d.df) AS BIGINT) AS rate_bp,
         CASE WHEN ({_SBA_KEY} % 10000)
                   < least(10000, (200 * 10000) // d.df)
              THEN 1 ELSE 0 END AS kept
  FROM lines l JOIN d USING (template)
),
per AS (
  SELECT template, count(*)::BIGINT AS n_true, sum(kept)::BIGINT AS n_kept,
         max(rate_bp) AS rate
  FROM s GROUP BY 1
)
SELECT template, n_true, n_kept,
       ((n_kept * 10000) // rate)::BIGINT AS ht_estimate,
       cast(floor(((n_kept * 10000) // rate - n_true) * 10000.0 / n_true)
            AS BIGINT) AS bias_bp
FROM per
"""


# Chat-context truncation plan (ops/corpus.context_truncation_plan,
# budget 64): reverse prefix sum per conversation, house token counting.
ORACLES["context_truncation_plan"] = f"""
WITH {TURNS_CTE},
b AS (
  SELECT conv_id, turn_idx,
         cast(CASE WHEN length(trim(text)) = 0 THEN 0
              ELSE length(regexp_split_to_array(trim(text), '\\s+')) END
              AS BIGINT) AS n_tokens
  FROM turns WHERE text IS NOT NULL
)
SELECT conv_id, turn_idx, n_tokens,
       sum(n_tokens) OVER (PARTITION BY conv_id ORDER BY turn_idx DESC
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT
         AS cum_from_end,
       (CASE WHEN sum(n_tokens) OVER (PARTITION BY conv_id
               ORDER BY turn_idx DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) <= 64
             THEN 1 ELSE 0 END)::INT AS kept
FROM b
"""


# ---------------------------------------------------------------------------
# User-behavior analytics (ops/behavior.py): cohort retention, journey
# transitions, rolling actives, KV schema drift, seasonality, concentration.
# Day key = epoch days; ratios = floor basis points via integer division.
# ---------------------------------------------------------------------------

_DAY_NO = "date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))::BIGINT"

ORACLES["cohort_retention"] = f"""
WITH ud AS (
  SELECT DISTINCT user_id, {_DAY_NO} AS day_no FROM events
),
first AS (
  SELECT user_id, min(day_no) AS cohort_day FROM ud GROUP BY 1
),
tri AS (
  SELECT f.cohort_day, u.day_no - f.cohort_day AS day_offset,
         count(DISTINCT u.user_id)::BIGINT AS n_active
  FROM ud u JOIN first f USING (user_id)
  GROUP BY 1, 2
)
SELECT cohort_day, day_offset, n_active,
       ((n_active * 10000) // max(CASE WHEN day_offset = 0 THEN n_active END)
          OVER (PARTITION BY cohort_day))::BIGINT AS retention_bp
FROM tri
"""


ORACLES["markov_transitions"] = """
WITH pairs AS (
  SELECT event_type AS src_type,
         coalesce(lead(event_type) OVER
           (PARTITION BY user_id ORDER BY ts, event_id), '<end>') AS dst_type
  FROM events
),
mat AS (
  SELECT src_type, dst_type, count(*)::BIGINT AS n
  FROM pairs GROUP BY 1, 2
)
SELECT src_type, dst_type, n,
       ((n * 10000) // sum(n) OVER (PARTITION BY src_type))::BIGINT AS prob_bp
FROM mat
"""


ORACLES["active_users_rolling"] = f"""
WITH ud AS (
  SELECT DISTINCT user_id, {_DAY_NO} AS day_no FROM events
),
days AS (SELECT DISTINCT day_no FROM ud),
wins AS (SELECT unnest([1, 7, 28]) AS window_days),
offs AS (
  SELECT u.user_id, w.window_days, u.day_no + gs.i AS day_no
  FROM ud u CROSS JOIN wins w,
       unnest(generate_series(0, w.window_days - 1)) AS gs(i)
)
SELECT o.day_no, o.window_days::INT AS window_days,
       count(DISTINCT o.user_id)::BIGINT AS n_active
FROM offs o
WHERE o.day_no IN (SELECT day_no FROM days)
GROUP BY 1, 2
"""


ORACLES["schema_drift_daily"] = f"""
WITH {TURNS_CTE},
dk AS (
  SELECT DISTINCT day_no, key FROM (
    SELECT {_DAY_NO} AS day_no,
           unnest(regexp_extract_all(text, '([A-Za-z_][A-Za-z0-9_]*)=', 1))
             AS key
    FROM turns WHERE text IS NOT NULL
  )
),
days AS (
  SELECT day_no, lag(day_no) OVER (ORDER BY day_no) AS prev_day
  FROM (SELECT DISTINCT day_no FROM dk)
),
nw AS (
  SELECT c.day_no, count(*)::BIGINT AS n_new
  FROM dk c JOIN days d USING (day_no)
  WHERE NOT EXISTS (
    SELECT 1 FROM dk p WHERE p.day_no = d.prev_day AND p.key = c.key
  )
  GROUP BY 1
),
gn AS (
  SELECT d.day_no, count(*)::BIGINT AS n_gone
  FROM days d JOIN dk p ON p.day_no = d.prev_day
  WHERE d.prev_day IS NOT NULL AND NOT EXISTS (
    SELECT 1 FROM dk c WHERE c.day_no = d.day_no AND c.key = p.key
  )
  GROUP BY 1
),
tot AS (
  SELECT day_no, count(*)::BIGINT AS n_keys FROM dk GROUP BY 1
)
SELECT t.day_no, t.n_keys,
       coalesce(nw.n_new, 0)::BIGINT AS n_new,
       coalesce(gn.n_gone, 0)::BIGINT AS n_gone
FROM tot t LEFT JOIN nw USING (day_no) LEFT JOIN gn USING (day_no)
"""


ORACLES["hourly_seasonality"] = """
WITH grid AS (
  SELECT event_type, hour(ts)::INT AS hour, count(*)::BIGINT AS n
  FROM events GROUP BY 1, 2
)
SELECT event_type, hour, n,
       ((n * 10000) // sum(n) OVER (PARTITION BY event_type))::BIGINT
         AS share_bp,
       (CASE WHEN n * 24 > 2 * sum(n) OVER (PARTITION BY event_type)
             THEN 1 ELSE 0 END)::INT AS is_hot
FROM grid
"""


ORACLES["activity_concentration"] = """
WITH per_user AS (
  SELECT user_id, count(*)::BIGINT AS cnt FROM events GROUP BY 1
),
buckets AS (
  SELECT length(bin(cnt))::INT AS bucket_bits,
         count(*)::BIGINT AS n_users, sum(cnt)::BIGINT AS n_events
  FROM per_user GROUP BY 1
)
SELECT bucket_bits, n_users, n_events,
       sum(n_events) OVER (ORDER BY bucket_bits DESC
         ROWS UNBOUNDED PRECEDING)::BIGINT AS cum_events,
       ((sum(n_events) OVER (ORDER BY bucket_bits DESC
           ROWS UNBOUNDED PRECEDING) * 10000)
         // sum(n_events) OVER ())::BIGINT AS cum_share_bp
FROM buckets
"""


# Fixed-window rate-limiter audit (route.rate_limit_audit, limit=3,
# window_s=60): row_number admission per (user, minute-window).
ORACLES["rate_limit_audit"] = """
WITH b AS (
  SELECT user_id, event_id, ts,
         cast(floor(epoch(ts)) AS BIGINT) // 60 AS win
  FROM events
),
r AS (
  SELECT user_id, win,
         row_number() OVER (PARTITION BY user_id, win
                            ORDER BY ts, event_id) AS rn
  FROM b
)
SELECT user_id, count(*)::BIGINT AS n_events,
       sum(CASE WHEN rn <= 3 THEN 1 ELSE 0 END)::BIGINT AS n_admitted,
       sum(CASE WHEN rn > 3 THEN 1 ELSE 0 END)::BIGINT AS n_rejected,
       count(DISTINCT win)::BIGINT AS n_windows,
       max(rn)::BIGINT AS max_in_window
FROM r GROUP BY 1
"""


# Conversion-latency histogram (ops/behavior.conversion_latency_hist):
# first signup → first at-or-after purchase, pow2 buckets, -1 = never.
ORACLES["conversion_latency_hist"] = """
WITH s AS (
  SELECT user_id, min(cast(floor(epoch(ts)) AS BIGINT)) AS s_ep
  FROM events WHERE event_type = 'signup' GROUP BY 1
),
p AS (
  SELECT user_id, cast(floor(epoch(ts)) AS BIGINT) AS p_ep
  FROM events WHERE event_type = 'purchase'
),
c AS (
  SELECT s.user_id, s.s_ep,
         min(CASE WHEN p.p_ep >= s.s_ep THEN p.p_ep END) AS c_ep
  FROM s LEFT JOIN p USING (user_id)
  GROUP BY 1, 2
),
g AS (
  SELECT (CASE WHEN c_ep IS NULL THEN -1
               ELSE length(bin(c_ep - s_ep)) END)::INT AS gap_bucket_bits,
         c_ep - s_ep AS gap
  FROM c
)
SELECT gap_bucket_bits, count(*)::BIGINT AS n_users,
       min(gap)::BIGINT AS min_gap_s, max(gap)::BIGINT AS max_gap_s
FROM g GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Winnowing fingerprints (ops/text.winnow_fingerprints, k=4, window=5,
# seed=7 — Schleimer/Wilkerson/Aiken SIGMOD 2003): min per frame,
# rightmost on ties, relationally as frame-min + join-back + max(pos).
# ---------------------------------------------------------------------------

_WINNOW_FPS = f"""
base AS (
  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS t
  FROM documents
  WHERE text IS NOT NULL AND length(trim(text)) > 0
),
sized AS (
  SELECT doc_id, t, len(t) - 4 + 1 AS n_grams
  FROM base WHERE len(t) >= 4 + 5 - 1
),
grams AS (
  SELECT doc_id, n_grams, gs.i::INT AS pos,
         {portable_hash_sql("array_to_string(t[gs.i:gs.i+3], ' ')", 7)} AS gh
  FROM sized, unnest(generate_series(1, n_grams)) AS gs(i)
),
members AS (
  SELECT doc_id, pos, gh, gj.j AS j
  FROM grams,
       unnest(generate_series(greatest(1, pos - 5 + 1),
                              least(pos, n_grams - 5 + 1))) AS gj(j)
),
mins AS (SELECT doc_id, j, min(gh) AS m FROM members GROUP BY 1, 2),
sel AS (
  SELECT mb.doc_id, mb.j, mi.m, max(mb.pos) AS pos
  FROM members mb
  JOIN mins mi ON mb.doc_id = mi.doc_id AND mb.j = mi.j AND mb.gh = mi.m
  GROUP BY 1, 2, 3
),
fps AS (SELECT DISTINCT doc_id, pos, m AS gh FROM sel)
"""

ORACLES["winnow_fingerprint_summary"] = f"""
WITH {_WINNOW_FPS}
SELECT doc_id, count(*)::BIGINT AS n_fp,
       sum(gh % 1000003)::BIGINT AS fp_checksum,
       min(gh) AS min_gh, max(gh) AS max_gh
FROM fps GROUP BY 1
"""

ORACLES["winnow_overlap_pairs"] = f"""
WITH {_WINNOW_FPS},
d AS (SELECT DISTINCT doc_id, gh FROM fps),
ok AS (
  SELECT gh FROM d GROUP BY 1
  HAVING count(*) >= 2 AND count(*) <= 200
),
dd AS (SELECT d.* FROM d JOIN ok USING (gh))
SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
       count(*)::BIGINT AS n_shared
FROM dd a JOIN dd b ON a.gh = b.gh AND a.doc_id < b.doc_id
GROUP BY 1, 2
HAVING count(*) >= 2
"""


# Survival table over user lifetimes (ops/behavior.survival_table):
# discrete hazard at each observed lifespan; at-risk = desc cumulative.
ORACLES["survival_table"] = f"""
WITH life AS (
  SELECT user_id,
         max({_DAY_NO}) - min({_DAY_NO}) AS day_offset
  FROM events GROUP BY 1
),
churn AS (
  SELECT day_offset, count(*)::BIGINT AS n_churned FROM life GROUP BY 1
)
SELECT day_offset, n_churned,
       sum(n_churned) OVER (ORDER BY day_offset DESC
         ROWS UNBOUNDED PRECEDING)::BIGINT AS n_at_risk,
       ((n_churned * 10000) // sum(n_churned) OVER (ORDER BY day_offset DESC
         ROWS UNBOUNDED PRECEDING))::BIGINT AS hazard_bp
FROM churn
"""


# Dormancy / win-back audit (ops/behavior.dormancy_reactivation,
# dormant_days=7): lag gap on the distinct (user, day) set.
ORACLES["dormancy_reactivation"] = f"""
WITH ud AS (
  SELECT DISTINCT user_id, {_DAY_NO} AS day_no FROM events
),
g AS (
  SELECT day_no,
         day_no - lag(day_no) OVER (PARTITION BY user_id ORDER BY day_no)
           AS gap
  FROM ud
),
agg AS (
  SELECT day_no, count(*)::BIGINT AS n_active,
         sum(CASE WHEN gap IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_new,
         sum(CASE WHEN gap > 7 THEN 1 ELSE 0 END)::BIGINT AS n_reactivated
  FROM g GROUP BY 1
)
SELECT day_no, n_active, n_new, n_reactivated,
       ((n_reactivated * 10000) // n_active)::BIGINT AS reactivated_bp
FROM agg
"""


# Response-latency profile per role transition
# (aggregate.turn_latency_stats): lag on the conv key, roles² rollup,
# floor-mean (gaps can be negative under event-time disorder).
ORACLES["turn_latency_stats"] = f"""
WITH {TURNS_CTE},
g AS (
  SELECT lag(role) OVER (PARTITION BY conv_id ORDER BY turn_idx)
           AS prev_role,
         role,
         cast(floor(epoch(ts)) AS BIGINT)
           - lag(cast(floor(epoch(ts)) AS BIGINT))
             OVER (PARTITION BY conv_id ORDER BY turn_idx) AS gap
  FROM turns
)
SELECT prev_role, role, count(*)::BIGINT AS n,
       min(gap)::BIGINT AS min_gap_s, max(gap)::BIGINT AS max_gap_s,
       cast(floor(sum(gap) * 1.0 / count(*)) AS BIGINT) AS mean_gap_s
FROM g WHERE prev_role IS NOT NULL
GROUP BY 1, 2
"""


# Cell-blocked kNN outlier scores (ops/similarity.knn_outlier_scores,
# k=5, n_cells=16): same literal-centroid assignment as ann_ivf_topk,
# pairs only within cells, rank window per vector.
ORACLES["knn_outlier_scores"] = f"""
WITH qv AS (SELECT vec_id, {_QUANT} AS q FROM embeddings),
cents AS (SELECT vec_id AS cell, q AS cv FROM qv WHERE vec_id < 16),
scored AS (
  SELECT v.vec_id, v.q, c.cell,
         cast(list_sum(list_transform(range(1, 65), i -> v.q[i] * c.cv[i])) AS BIGINT)
           * 16 - c.cell AS ord
  FROM qv v CROSS JOIN cents c
),
assigned AS (
  SELECT vec_id, q, arg_max(cell, ord) AS cell FROM scored GROUP BY vec_id, q
),
pairs AS (
  SELECT a.cell, a.vec_id AS a_id, b.vec_id AS b_id,
         cast(list_sum(list_transform(range(1, 65), i -> a.q[i] * b.q[i])) AS BIGINT)
           AS dot
  FROM assigned a JOIN assigned b
    ON a.cell = b.cell AND a.vec_id <> b.vec_id
),
r AS (
  SELECT a_id, dot,
         row_number() OVER (PARTITION BY a_id ORDER BY dot DESC, b_id) AS rn,
         count(*) OVER (PARTITION BY a_id) AS n_nb
  FROM pairs
),
kth AS (SELECT a_id, n_nb, dot FROM r WHERE rn = least(5, n_nb))
SELECT av.vec_id, av.cell,
       coalesce(k.n_nb, 0)::BIGINT AS n_neighbors,
       k.dot AS kth_dot
FROM (SELECT vec_id, cell FROM assigned) av
LEFT JOIN kth k ON av.vec_id = k.a_id
"""


# MMR diversified top-k (ops/similarity.mmr_topk, k=5, pool=20,
# lambda=7/10, query=vec 0): greedy rounds unrolled as chained CTEs —
# the same technique as the BPE merge oracle.
ORACLES["mmr_topk"] = f"""
WITH qv AS (SELECT vec_id, {_QUANT} AS q FROM embeddings),
qr AS (SELECT q AS qq FROM qv WHERE vec_id = 0),
pool AS (
  SELECT v.vec_id, v.q,
         cast(list_sum(list_transform(range(1, 65), i -> v.q[i] * qr.qq[i])) AS BIGINT)
           AS dq
  FROM qv v, qr WHERE v.vec_id <> 0
  ORDER BY dq DESC, v.vec_id LIMIT 20
),
pd AS (
  SELECT a.vec_id AS a_id, b.vec_id AS b_id,
         cast(list_sum(list_transform(range(1, 65), i -> a.q[i] * b.q[i])) AS BIGINT)
           AS d
  FROM pool a JOIN pool b ON a.vec_id <> b.vec_id
),
s1 AS (SELECT vec_id, 7 * dq AS mmr FROM pool ORDER BY mmr DESC, vec_id LIMIT 1),
s2 AS (
  SELECT p.vec_id,
         7 * p.dq - 3 * (SELECT max(d) FROM pd
                         WHERE a_id = p.vec_id
                           AND b_id IN (SELECT vec_id FROM s1)) AS mmr
  FROM pool p WHERE p.vec_id NOT IN (SELECT vec_id FROM s1)
  ORDER BY mmr DESC, p.vec_id LIMIT 1
),
s3 AS (
  SELECT p.vec_id,
         7 * p.dq - 3 * (SELECT max(d) FROM pd
                         WHERE a_id = p.vec_id
                           AND b_id IN (SELECT vec_id FROM s1
                                        UNION SELECT vec_id FROM s2)) AS mmr
  FROM pool p
  WHERE p.vec_id NOT IN (SELECT vec_id FROM s1 UNION SELECT vec_id FROM s2)
  ORDER BY mmr DESC, p.vec_id LIMIT 1
),
s4 AS (
  SELECT p.vec_id,
         7 * p.dq - 3 * (SELECT max(d) FROM pd
                         WHERE a_id = p.vec_id
                           AND b_id IN (SELECT vec_id FROM s1
                                        UNION SELECT vec_id FROM s2
                                        UNION SELECT vec_id FROM s3)) AS mmr
  FROM pool p
  WHERE p.vec_id NOT IN (SELECT vec_id FROM s1 UNION SELECT vec_id FROM s2
                         UNION SELECT vec_id FROM s3)
  ORDER BY mmr DESC, p.vec_id LIMIT 1
),
s5 AS (
  SELECT p.vec_id,
         7 * p.dq - 3 * (SELECT max(d) FROM pd
                         WHERE a_id = p.vec_id
                           AND b_id IN (SELECT vec_id FROM s1
                                        UNION SELECT vec_id FROM s2
                                        UNION SELECT vec_id FROM s3
                                        UNION SELECT vec_id FROM s4)) AS mmr
  FROM pool p
  WHERE p.vec_id NOT IN (SELECT vec_id FROM s1 UNION SELECT vec_id FROM s2
                         UNION SELECT vec_id FROM s3 UNION SELECT vec_id FROM s4)
  ORDER BY mmr DESC, p.vec_id LIMIT 1
)
SELECT 1::INT AS rank, vec_id, mmr::BIGINT AS mmr FROM s1
UNION ALL SELECT 2, vec_id, mmr FROM s2
UNION ALL SELECT 3, vec_id, mmr FROM s3
UNION ALL SELECT 4, vec_id, mmr FROM s4
UNION ALL SELECT 5, vec_id, mmr FROM s5
"""


# ---------------------------------------------------------------------------
# Z-order layout plan (ops/layout.zorder_layout, bits=8, n_file_bits=4):
# Morton interleave as unrolled shifts/masks — identical bit arithmetic.
# ---------------------------------------------------------------------------

def _morton_sql(a: str, b: str, bits: int = 8) -> str:
    parts = []
    for i in range(bits):
        parts.append(f"((({a} >> {i}) & 1) << {2 * i})")
        parts.append(f"((({b} >> {i}) & 1) << {2 * i + 1})")
    return " | ".join(parts)


ORACLES["zorder_layout"] = f"""
WITH r AS (
  SELECT (user_id % 256)::BIGINT AS u,
         ({_DAY_NO} % 256)::BIGINT AS d
  FROM events
),
z AS (
  SELECT u, d, (({_morton_sql('u', 'd')}) >> 12)::BIGINT AS file_id FROM r
)
SELECT file_id, count(*)::BIGINT AS n_rows,
       min(u)::BIGINT AS min_u, max(u)::BIGINT AS max_u,
       min(d)::BIGINT AS min_d, max(d)::BIGINT AS max_d
FROM z GROUP BY 1
"""


# l-diversity audit (ops/audit.ldiversity_audit, quasi=event_type,
# sensitive=user_id, l=3).
ORACLES["ldiversity_audit"] = """
SELECT event_type, count(*)::BIGINT AS n_rows,
       count(DISTINCT user_id)::BIGINT AS n_sensitive,
       (CASE WHEN count(DISTINCT user_id) >= 3 THEN 1 ELSE 0 END)::INT AS ok
FROM events GROUP BY 1
"""


# Within-session event trigrams (aggregate.session_event_trigrams,
# gap 1800 s, top 20): session split + id + two leads on one user key.
ORACLES["session_event_trigrams"] = """
WITH b AS (
  SELECT user_id, ts, event_id, event_type,
         cast(floor(epoch(ts)) AS BIGINT) AS ep
  FROM events
),
n AS (
  SELECT *, CASE WHEN lag(ep) OVER w IS NULL
                   OR ep - lag(ep) OVER w > 1800 THEN 1 ELSE 0 END AS newf
  FROM b WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
  SELECT *, sum(newf) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS sess
  FROM n
),
t AS (
  SELECT event_type AS t1,
         lead(event_type, 1) OVER ws AS t2,
         lead(event_type, 2) OVER ws AS t3
  FROM s WINDOW ws AS (PARTITION BY user_id, sess ORDER BY ts, event_id)
)
SELECT t1, t2, t3, count(*)::BIGINT AS n
FROM t WHERE t2 IS NOT NULL AND t3 IS NOT NULL
GROUP BY 1, 2, 3
ORDER BY n DESC, t1, t2, t3
LIMIT 20
"""


# Autocorrelation lag profile (aggregate.autocorr_lag_profile,
# lags 1/60/1440 min): per-minute grid, one shifted self-join per lag,
# lag-0 energy row for normalization.
ORACLES["autocorr_lag_profile"] = """
WITH grid AS (
  SELECT cast(floor(epoch(ts)) AS BIGINT) // 60 AS m,
         count(*)::BIGINT AS c
  FROM events GROUP BY 1
),
u AS (
  SELECT 0 AS lag_min, c * c AS p FROM grid
  UNION ALL
  SELECT 1, a.c * b.c FROM grid a JOIN grid b ON b.m = a.m + 1
  UNION ALL
  SELECT 60, a.c * b.c FROM grid a JOIN grid b ON b.m = a.m + 60
  UNION ALL
  SELECT 1440, a.c * b.c FROM grid a JOIN grid b ON b.m = a.m + 1440
)
SELECT lag_min::INT AS lag_min, count(*)::BIGINT AS n_pairs,
       sum(p)::BIGINT AS sum_prod
FROM u GROUP BY 1
"""


# Triangle census of the template co-occurrence graph
# (ops/templates.template_triangles, min_both=2): ordered two-path +
# closing edge over the vocabulary-bounded edge set.
ORACLES["template_triangles"] = f"""
WITH {TURNS_CTE},
ct AS (
  SELECT DISTINCT conv_id,
         regexp_replace(text, '[0-9]+', '<#>', 'g') AS t
  FROM turns WHERE text IS NOT NULL
),
edges AS (
  SELECT a.t AS u, b.t AS v
  FROM ct a JOIN ct b ON a.conv_id = b.conv_id AND a.t < b.t
  GROUP BY 1, 2 HAVING count(*) >= 2
),
tri AS (
  SELECT e1.u AS a, e1.v AS b, e2.v AS c
  FROM edges e1
  JOIN edges e2 ON e2.u = e1.v
  JOIN edges e3 ON e3.u = e1.u AND e3.v = e2.v
)
SELECT template, count(*)::BIGINT AS n_triangles
FROM (SELECT unnest([a, b, c]) AS template FROM tri)
GROUP BY 1
"""


# Time-bounded funnel (ops/relational.funnel_within, view->click->
# purchase within 86400 s of the previous step, earliest-arrival).
ORACLES["funnel_within"] = """
WITH s0 AS (
  SELECT user_id, min(cast(floor(epoch(ts)) AS BIGINT)) AS arr FROM events
  WHERE event_type = 'view' AND user_id IS NOT NULL GROUP BY user_id
),
s1 AS (
  SELECT e.user_id, min(cast(floor(epoch(e.ts)) AS BIGINT)) AS arr
  FROM events e JOIN s0 ON e.user_id = s0.user_id
  WHERE e.event_type = 'click'
    AND cast(floor(epoch(e.ts)) AS BIGINT) > s0.arr
    AND cast(floor(epoch(e.ts)) AS BIGINT) <= s0.arr + 86400
  GROUP BY e.user_id
),
s2 AS (
  SELECT e.user_id, min(cast(floor(epoch(e.ts)) AS BIGINT)) AS arr
  FROM events e JOIN s1 ON e.user_id = s1.user_id
  WHERE e.event_type = 'purchase'
    AND cast(floor(epoch(e.ts)) AS BIGINT) > s1.arr
    AND cast(floor(epoch(e.ts)) AS BIGINT) <= s1.arr + 86400
  GROUP BY e.user_id
)
SELECT * FROM (
  SELECT 0::INT AS step_idx, 'view' AS step, (SELECT count(*) FROM s0)::BIGINT AS n_users
  UNION ALL
  SELECT 1, 'click', (SELECT count(*) FROM s1)
  UNION ALL
  SELECT 2, 'purchase', (SELECT count(*) FROM s2)
) WHERE n_users > 0
"""


# Time-in-state dwell profile (ops/behavior.dwell_time_by_state):
# lead gap on the user key attributed to the current type.
ORACLES["dwell_time_by_state"] = """
WITH b AS (
  SELECT user_id, ts, event_id, event_type,
         cast(floor(epoch(ts)) AS BIGINT) AS ep
  FROM events
),
g AS (
  SELECT event_type,
         lead(ep) OVER (PARTITION BY user_id ORDER BY ts, event_id) - ep
           AS dwell
  FROM b
)
SELECT event_type, count(*)::BIGINT AS n_intervals,
       sum(dwell)::BIGINT AS total_dwell_s,
       cast(floor(sum(dwell) * 1.0 / count(*)) AS BIGINT) AS mean_dwell_s,
       max(dwell)::BIGINT AS max_dwell_s
FROM g WHERE dwell IS NOT NULL GROUP BY 1
"""


# Conversation-level winnow overlap (composition: conv assembly ->
# winnowing -> capped pair join). The winnow CTE chain is re-emitted
# over the assembled conv docs; assembly is the SAME string_agg
# expression proven byte-identical in the conv-corpus oracles.
def _winnow_fps_from(src: str) -> str:
    """Winnow CTE chain (k=4, window=5, seed=7) over relation `src`
    with (doc_id, text) — emits base..fps, no leading WITH."""
    return f"""base AS (
  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS t
  FROM {src}
  WHERE text IS NOT NULL AND length(trim(text)) > 0
),
sized AS (
  SELECT doc_id, t, len(t) - 4 + 1 AS n_grams
  FROM base WHERE len(t) >= 4 + 5 - 1
),
grams AS (
  SELECT doc_id, n_grams, gs.i::INT AS pos,
         {portable_hash_sql("array_to_string(t[gs.i:gs.i+3], ' ')", 7)} AS gh
  FROM sized, unnest(generate_series(1, n_grams)) AS gs(i)
),
members AS (
  SELECT doc_id, pos, gh, gj.j AS j
  FROM grams,
       unnest(generate_series(greatest(1, pos - 5 + 1),
                              least(pos, n_grams - 5 + 1))) AS gj(j)
),
mins AS (SELECT doc_id, j, min(gh) AS m FROM members GROUP BY 1, 2),
sel AS (
  SELECT mb.doc_id, mb.j, mi.m, max(mb.pos) AS pos
  FROM members mb
  JOIN mins mi ON mb.doc_id = mi.doc_id AND mb.j = mi.j AND mb.gh = mi.m
  GROUP BY 1, 2, 3
),
fps AS (SELECT DISTINCT doc_id, pos, m AS gh FROM sel)"""


ORACLES["conv_winnow_overlap"] = f"""
WITH {TURNS_CTE},
cdoc AS (
  SELECT conv_id AS doc_id,
         coalesce(string_agg(role || ': ' || text, chr(10)
                             ORDER BY turn_idx), '') AS text
  FROM turns GROUP BY conv_id
),
{_winnow_fps_from('cdoc')},
d AS (SELECT DISTINCT doc_id, gh FROM fps),
ok AS (
  SELECT gh FROM d GROUP BY 1
  HAVING count(*) >= 2 AND count(*) <= 200
),
dd AS (SELECT d.* FROM d JOIN ok USING (gh))
SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
       count(*)::BIGINT AS n_shared
FROM dd a JOIN dd b ON a.gh = b.gh AND a.doc_id < b.doc_id
GROUP BY 1, 2
HAVING count(*) >= 2
"""


# Daily bounce rate (ops/behavior.bounce_rate_daily, gap 1800 s):
# session id via cumulative split flags, bounce = 1-event session,
# day = the session's first event day.
ORACLES["bounce_rate_daily"] = f"""
WITH b AS (
  SELECT user_id, ts, event_id,
         cast(floor(epoch(ts)) AS BIGINT) AS ep,
         {_DAY_NO} AS day_no
  FROM events
),
n AS (
  SELECT *, CASE WHEN lag(ep) OVER w IS NULL
                   OR ep - lag(ep) OVER w > 1800 THEN 1 ELSE 0 END AS newf
  FROM b WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
  SELECT *, sum(newf) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS sess
  FROM n
),
per AS (
  SELECT user_id, sess, count(*)::BIGINT AS n_ev,
         min(day_no) AS day_no
  FROM s GROUP BY 1, 2
)
SELECT day_no, count(*)::BIGINT AS n_sessions,
       sum(CASE WHEN n_ev = 1 THEN 1 ELSE 0 END)::BIGINT AS n_bounces,
       ((sum(CASE WHEN n_ev = 1 THEN 1 ELSE 0 END) * 10000)
         // count(*))::BIGINT AS bounce_bp
FROM per GROUP BY 1
"""


# Linear multi-touch attribution (ops/behavior.linear_attribution,
# 24 h lookback): every touch in the window shares the purchase's
# 10000 bp equally (floor); orphan purchases credit 'none'.
ORACLES["linear_attribution"] = """
WITH p AS (
  SELECT user_id, event_id AS pid,
         cast(floor(epoch(ts)) AS BIGINT) AS p_ep
  FROM events WHERE event_type = 'purchase'
),
t AS (
  SELECT user_id, event_type,
         cast(floor(epoch(ts)) AS BIGINT) AS t_ep
  FROM events WHERE event_type <> 'purchase'
),
j AS (
  SELECT p.pid, t.event_type
  FROM p JOIN t ON p.user_id = t.user_id
              AND t.t_ep >= p.p_ep - 86400 AND t.t_ep < p.p_ep
),
per AS (SELECT pid, count(*)::BIGINT AS n_touch FROM j GROUP BY 1),
credited AS (
  SELECT j.event_type AS touch_type, 10000 // per.n_touch AS credit_bp
  FROM j JOIN per USING (pid)
  UNION ALL
  SELECT 'none', 10000 FROM p
  WHERE NOT EXISTS (SELECT 1 FROM j WHERE j.pid = p.pid)
)
SELECT touch_type, count(*)::BIGINT AS n_credits,
       sum(credit_bp)::BIGINT AS total_credit_bp
FROM credited GROUP BY 1
"""


# EWMA-baseline volume alerts (ops/sre.ewma_rate_alerts, horizon 16,
# threshold 3x): truncated 2^-j power series, integer-scaled by 2^16,
# lags over the bounded day grid.
ORACLES["ewma_rate_alerts"] = f"""
WITH grid AS (
  SELECT {_DAY_NO} AS day_no, count(*)::BIGINT AS n
  FROM events GROUP BY 1
),
sc AS (
  SELECT day_no, n,
         (coalesce(lag(n, 1) OVER w * 32768, 0) + coalesce(lag(n, 2) OVER w * 16384, 0) + coalesce(lag(n, 3) OVER w * 8192, 0) + coalesce(lag(n, 4) OVER w * 4096, 0) + coalesce(lag(n, 5) OVER w * 2048, 0) + coalesce(lag(n, 6) OVER w * 1024, 0) + coalesce(lag(n, 7) OVER w * 512, 0) + coalesce(lag(n, 8) OVER w * 256, 0) + coalesce(lag(n, 9) OVER w * 128, 0) + coalesce(lag(n, 10) OVER w * 64, 0) + coalesce(lag(n, 11) OVER w * 32, 0) + coalesce(lag(n, 12) OVER w * 16, 0) + coalesce(lag(n, 13) OVER w * 8, 0) + coalesce(lag(n, 14) OVER w * 4, 0) + coalesce(lag(n, 15) OVER w * 2, 0) + coalesce(lag(n, 16) OVER w * 1, 0))::BIGINT AS baseline_x,
         ((CASE WHEN lag(n, 1) OVER w IS NOT NULL THEN 32768 ELSE 0 END) + (CASE WHEN lag(n, 2) OVER w IS NOT NULL THEN 16384 ELSE 0 END) + (CASE WHEN lag(n, 3) OVER w IS NOT NULL THEN 8192 ELSE 0 END) + (CASE WHEN lag(n, 4) OVER w IS NOT NULL THEN 4096 ELSE 0 END) + (CASE WHEN lag(n, 5) OVER w IS NOT NULL THEN 2048 ELSE 0 END) + (CASE WHEN lag(n, 6) OVER w IS NOT NULL THEN 1024 ELSE 0 END) + (CASE WHEN lag(n, 7) OVER w IS NOT NULL THEN 512 ELSE 0 END) + (CASE WHEN lag(n, 8) OVER w IS NOT NULL THEN 256 ELSE 0 END) + (CASE WHEN lag(n, 9) OVER w IS NOT NULL THEN 128 ELSE 0 END) + (CASE WHEN lag(n, 10) OVER w IS NOT NULL THEN 64 ELSE 0 END) + (CASE WHEN lag(n, 11) OVER w IS NOT NULL THEN 32 ELSE 0 END) + (CASE WHEN lag(n, 12) OVER w IS NOT NULL THEN 16 ELSE 0 END) + (CASE WHEN lag(n, 13) OVER w IS NOT NULL THEN 8 ELSE 0 END) + (CASE WHEN lag(n, 14) OVER w IS NOT NULL THEN 4 ELSE 0 END) + (CASE WHEN lag(n, 15) OVER w IS NOT NULL THEN 2 ELSE 0 END) + (CASE WHEN lag(n, 16) OVER w IS NOT NULL THEN 1 ELSE 0 END))::BIGINT AS norm_x
  FROM grid WINDOW w AS (ORDER BY day_no)
)
SELECT day_no, n, baseline_x, norm_x,
       (CASE WHEN norm_x > 0 AND n * norm_x > 3 * baseline_x
             THEN 1 ELSE 0 END)::INT AS is_alert
FROM sc
"""


# Benford leading-digit audit (ops/audit.benford_audit on events.value):
# digit from the BIGINT cents string; expected shares as a literal table.
ORACLES["benford_audit"] = """
WITH c AS (
  SELECT cast(floor(abs(value) * 100) AS BIGINT) AS cents FROM events
),
obs AS (
  SELECT substr(cast(cents AS VARCHAR), 1, 1)::INT AS digit,
         count(*)::BIGINT AS n
  FROM c WHERE cents >= 1 GROUP BY 1
),
exp AS (
  SELECT * FROM (VALUES (1, 3010), (2, 1760), (3, 1249), (4, 969),
                        (5, 791), (6, 669), (7, 579), (8, 511), (9, 457))
    AS t(digit, benford_bp)
)
SELECT o.digit, o.n,
       ((o.n * 10000) // sum(o.n) OVER ())::BIGINT AS share_bp,
       e.benford_bp::BIGINT AS benford_bp,
       ((o.n * 10000) // sum(o.n) OVER () - e.benford_bp)::BIGINT AS dev_bp
FROM obs o JOIN exp e ON o.digit = e.digit
"""


# Z-order skipping effectiveness (ops/layout.zorder_skipping_
# effectiveness): point-predicate file-hit rate per dimension over the
# bounded envelope table.
ORACLES["zorder_skipping_effectiveness"] = f"""
WITH r AS (
  SELECT (user_id % 256)::BIGINT AS u,
         ({_DAY_NO} % 256)::BIGINT AS d
  FROM events
),
z AS (
  SELECT u, d, (((((u >> 0) & 1) << 0) | (((u >> 1) & 1) << 2) | (((u >> 2) & 1) << 4) | (((u >> 3) & 1) << 6) | (((u >> 4) & 1) << 8) | (((u >> 5) & 1) << 10) | (((u >> 6) & 1) << 12) | (((u >> 7) & 1) << 14) | (((d >> 0) & 1) << 1) | (((d >> 1) & 1) << 3) | (((d >> 2) & 1) << 5) | (((d >> 3) & 1) << 7) | (((d >> 4) & 1) << 9) | (((d >> 5) & 1) << 11) | (((d >> 6) & 1) << 13) | (((d >> 7) & 1) << 15)) >> 12)::BIGINT AS file_id FROM r
),
env AS (
  SELECT file_id, min(u) AS min_u, max(u) AS max_u,
         min(d) AS min_d, max(d) AS max_d
  FROM z GROUP BY 1
),
probes AS (SELECT gs.x::BIGINT AS x FROM unnest(generate_series(0, 255)) AS gs(x)),
nf AS (SELECT count(*)::BIGINT AS n_files FROM env),
hu AS (
  SELECT count(*)::BIGINT AS file_hits
  FROM probes p JOIN env e ON p.x >= e.min_u AND p.x <= e.max_u
),
hd AS (
  SELECT count(*)::BIGINT AS file_hits
  FROM probes p JOIN env e ON p.x >= e.min_d AND p.x <= e.max_d
)
SELECT 'u' AS dim, 256::BIGINT AS n_probes, nf.n_files, hu.file_hits,
       ((hu.file_hits * 10000) // (256 * nf.n_files))::BIGINT AS avg_hit_bp
FROM hu, nf
UNION ALL
SELECT 'd', 256, nf.n_files, hd.file_hits,
       ((hd.file_hits * 10000) // (256 * nf.n_files))::BIGINT
FROM hd, nf
"""


# Bot-ring screen (ops/behavior.bot_ring_detection, min_users=2):
# per-user md5 over the ordered (type : pow2-gap-bucket) sequence.
ORACLES["bot_ring_detection"] = """
WITH b AS (
  SELECT user_id, ts, event_id, event_type,
         cast(floor(epoch(ts)) AS BIGINT) AS ep
  FROM events
),
g AS (
  SELECT user_id, ts, event_id,
         event_type || ':' ||
         (CASE WHEN lag(ep) OVER w IS NULL THEN 's'
               ELSE length(bin(ep - lag(ep) OVER w))::VARCHAR END) AS step
  FROM b WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
per AS (
  SELECT user_id,
         md5(string_agg(step, chr(31) ORDER BY ts, event_id)) AS seq_fp,
         count(*)::BIGINT AS n_events
  FROM g GROUP BY user_id
)
SELECT seq_fp, count(*)::BIGINT AS n_users, n_events
FROM per GROUP BY seq_fp, n_events
HAVING count(*) >= 2
"""


# Growth flagship (ops/behavior.growth_report): dormancy win-back ⋈
# bounce rate on the calendar-bounded day key.
ORACLES["growth_report"] = f"""
WITH ud AS (
  SELECT DISTINCT user_id, {_DAY_NO} AS day_no FROM events
),
gp AS (
  SELECT day_no,
         day_no - lag(day_no) OVER (PARTITION BY user_id ORDER BY day_no)
           AS gap
  FROM ud
),
dorm AS (
  SELECT day_no, count(*)::BIGINT AS n_active,
         sum(CASE WHEN gap IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_new,
         sum(CASE WHEN gap > 7 THEN 1 ELSE 0 END)::BIGINT AS n_reactivated,
         ((sum(CASE WHEN gap > 7 THEN 1 ELSE 0 END) * 10000)
           // count(*))::BIGINT AS reactivated_bp
  FROM gp GROUP BY 1
),
e AS (
  SELECT user_id, ts, event_id,
         cast(floor(epoch(ts)) AS BIGINT) AS ep,
         {_DAY_NO} AS day_no
  FROM events
),
n AS (
  SELECT *, CASE WHEN lag(ep) OVER w IS NULL
                   OR ep - lag(ep) OVER w > 1800 THEN 1 ELSE 0 END AS newf
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
  SELECT *, sum(newf) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS sess
  FROM n
),
pses AS (
  SELECT user_id, sess, count(*)::BIGINT AS n_ev, min(day_no) AS day_no
  FROM s GROUP BY 1, 2
),
bounce AS (
  SELECT day_no, count(*)::BIGINT AS n_sessions,
         sum(CASE WHEN n_ev = 1 THEN 1 ELSE 0 END)::BIGINT AS n_bounces,
         ((sum(CASE WHEN n_ev = 1 THEN 1 ELSE 0 END) * 10000)
           // count(*))::BIGINT AS bounce_bp
  FROM pses GROUP BY 1
)
SELECT coalesce(d.day_no, b.day_no) AS day_no,
       coalesce(d.n_active, 0)::BIGINT AS n_active,
       coalesce(d.n_new, 0)::BIGINT AS n_new,
       coalesce(d.n_reactivated, 0)::BIGINT AS n_reactivated,
       coalesce(d.reactivated_bp, 0)::BIGINT AS reactivated_bp,
       coalesce(b.n_sessions, 0)::BIGINT AS n_sessions,
       coalesce(b.n_bounces, 0)::BIGINT AS n_bounces,
       coalesce(b.bounce_bp, 0)::BIGINT AS bounce_bp
FROM dorm d FULL OUTER JOIN bounce b ON d.day_no = b.day_no
"""


# Daily duplication-rate curve (ops/dedup.daily_dup_rate): digest-only
# per-day rollup with the dedup_exact normalization.
ORACLES["daily_dup_rate"] = f"""
WITH {TURNS_CTE},
b AS (
  SELECT {_DAY_NO} AS day_no, md5({_NORM_TEXT}) AS fp
  FROM turns WHERE text IS NOT NULL
)
SELECT day_no, count(*)::BIGINT AS n_rows,
       count(DISTINCT fp)::BIGINT AS n_unique,
       (((count(*) - count(DISTINCT fp)) * 10000) // count(*))::BIGINT
         AS dup_bp
FROM b GROUP BY 1
"""


# Heaps'-law vocabulary growth (ops/text.heaps_vocab_growth, n_buckets=20):
# equal-width doc_id buckets, per-bucket token totals, first-occurrence
# vocabulary counts, cumulative curve.
ORACLES["heaps_vocab_growth"] = r"""
WITH tk AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(trim(coalesce(text, ''))),
                     '\s+'), t -> t <> '') AS toks
  FROM documents
),
w AS (SELECT (max(doc_id) // 20 + 1)::BIGINT AS w FROM documents),
base AS (
  SELECT doc_id // (SELECT w FROM w) AS bucket, doc_id, toks FROM tk
),
pb AS (
  SELECT bucket, count(*)::BIGINT AS docs_n,
         sum(len(toks))::BIGINT AS bucket_tokens
  FROM base GROUP BY 1
),
fo AS (
  SELECT bucket, count(*)::BIGINT AS new_vocab FROM (
    SELECT min(bucket) AS bucket FROM (
      SELECT bucket, unnest(list_distinct(toks)) AS tok FROM base
    ) GROUP BY tok
  ) GROUP BY 1
)
SELECT pb.bucket, pb.docs_n, pb.bucket_tokens,
       coalesce(fo.new_vocab, 0)::BIGINT AS new_vocab,
       sum(pb.bucket_tokens) OVER (ORDER BY pb.bucket)::BIGINT AS cum_tokens,
       sum(coalesce(fo.new_vocab, 0)) OVER (ORDER BY pb.bucket)::BIGINT
         AS cum_vocab,
       CASE WHEN pb.bucket_tokens > 0
            THEN ((coalesce(fo.new_vocab, 0) * 10000)
                  // pb.bucket_tokens)::BIGINT END AS newness_bp
FROM pb LEFT JOIN fo USING (bucket)
ORDER BY pb.bucket
"""


# Order-0 character entropy (ops/text.char_entropy): per-doc char
# histogram, H = ln(n) - sum(c*ln(c))/n, floor-quantized milli-nats,
# clamped >= 0 (single-symbol docs must not float-round to -1).
ORACLES["char_entropy_quality"] = """
WITH ch AS (
  SELECT doc_id,
         unnest(list_transform(range(1, length(coalesce(text, '')) + 1),
                               i -> coalesce(text, '')[i])) AS c
  FROM documents
),
g AS (SELECT doc_id, c, count(*)::BIGINT AS cnt FROM ch GROUP BY 1, 2),
e AS (
  SELECT doc_id, sum(cnt)::BIGINT AS n, count(*)::BIGINT AS k,
         sum(cnt * ln(cnt)) AS s
  FROM g GROUP BY 1
)
SELECT d.doc_id,
       coalesce(e.n, 0)::BIGINT AS n_chars_used,
       coalesce(e.k, 0)::BIGINT AS n_distinct_chars,
       CASE WHEN e.n IS NULL THEN NULL
            ELSE floor(1000.0 * greatest(0.0, ln(e.n) - e.s / e.n))::BIGINT
       END AS entropy_mnat
FROM documents d LEFT JOIN e USING (doc_id)
"""


# t-closeness audit (ops/audit.tcloseness_audit on events: quasi =
# event_type, sensitive = user_id, t = 2000 bp): exact-integer total
# variation distance of each cell's sensitive distribution vs global.
ORACLES["tcloseness_audit"] = """
WITH e AS (SELECT event_type, user_id FROM events WHERE user_id IS NOT NULL),
cs AS (
  SELECT event_type, user_id, count(*)::BIGINT AS n_cs
  FROM e GROUP BY 1, 2
),
gs AS (SELECT user_id, count(*)::BIGINT AS n_s FROM e GROUP BY 1),
t AS (SELECT count(*)::BIGINT AS n FROM e),
d AS (
  SELECT cs.event_type, cs.n_cs, gs.n_s, (SELECT n FROM t) AS n,
         sum(cs.n_cs) OVER (PARTITION BY cs.event_type)::BIGINT AS n_c
  FROM cs JOIN gs USING (user_id)
),
r AS (
  SELECT event_type, max(n_c)::BIGINT AS n_rows,
         ((10000 * (sum(abs(n_cs * n - n_s * n_c))
                    + (max(n) - sum(n_s)) * max(n_c)))
          // (2 * max(n_c) * max(n)))::BIGINT AS tvd_bp
  FROM d GROUP BY 1
)
SELECT event_type, n_rows, tvd_bp,
       (tvd_bp <= 2000)::INT AS ok
FROM r
"""


# Exact ROC-AUC of the is-English classifier (ops/classify.classifier_auc):
# Mann-Whitney over the bounded integer-score histogram, ties counted 1/2,
# integer basis points. Reuses the classifier fit/serve CTEs verbatim so
# the score being ranked is the one classify_lang_en verifies.
ORACLES["classify_auc_en"] = f"""
WITH {_CLASSIFY_CTES},
pts AS (
  SELECT s.score_fp, (d.lang = 'en') AS y
  FROM scored s JOIN documents d USING (doc_id)
  WHERE s.score_fp IS NOT NULL
),
h AS (
  SELECT score_fp,
         sum(CASE WHEN y THEN 1 ELSE 0 END)::BIGINT AS pos,
         sum(CASE WHEN y THEN 0 ELSE 1 END)::BIGINT AS neg
  FROM pts GROUP BY 1
),
c AS (
  SELECT pos, neg,
         coalesce(sum(neg) OVER (ORDER BY score_fp
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT
           AS cneg
  FROM h
),
u AS (SELECT count(*)::BIGINT AS n_unscored FROM scored WHERE score_fp IS NULL)
SELECT sum(pos)::BIGINT AS n_pos, sum(neg)::BIGINT AS n_neg,
       (SELECT n_unscored FROM u)::BIGINT AS n_unscored,
       CASE WHEN sum(pos) > 0 AND sum(neg) > 0
            THEN ((10000 * sum(pos * (2 * cneg + neg)))
                  // (2 * sum(pos) * sum(neg)))::BIGINT END AS auc_bp
FROM c
"""


# Neyman-allocated stratified sample (ops/corpus.neyman_sample on
# documents: strata = lang, measure = n_chars, budget = 120, seed 0):
# integer moments, floor(sqrt()) weights (IEEE sqrt is correctly rounded
# so this is engine-portable), floor allocation, hash-rank selection.
ORACLES["neyman_sample_lang"] = f"""
WITH st AS (
  SELECT lang, count(n_chars)::BIGINT AS n, sum(n_chars)::BIGINT AS s1,
         sum(n_chars * n_chars)::BIGINT AS s2
  FROM documents GROUP BY 1
),
a AS (
  SELECT lang, floor(sqrt((n * s2 - s1 * s1)::DOUBLE))::BIGINT AS w FROM st
),
al AS (
  SELECT lang,
         CASE WHEN (SELECT sum(w) FROM a) > 0
              THEN ((120 * w) // (SELECT sum(w) FROM a))::BIGINT
              ELSE 0 END AS alloc_n
  FROM a
),
rk AS (
  SELECT d.lang, d.doc_id, al.alloc_n,
         row_number() OVER (
           PARTITION BY d.lang
           ORDER BY {portable_hash_sql("cast(d.doc_id AS VARCHAR)")} ASC,
                    d.doc_id ASC) AS rn
  FROM documents d JOIN al USING (lang)
)
SELECT lang, doc_id, alloc_n FROM rk WHERE rn <= alloc_n
"""


# PSI value-drift monitor (ops/audit.psi_value_drift, n_bins=10): first
# vs second half of the day range, equal-width bins over global [min,max],
# Laplace-smoothed shares, per-bin term floor-quantized to 1e-6 BEFORE the
# integer total so float summation order cannot matter.
ORACLES["psi_value_drift"] = f"""
WITH base AS (
  SELECT value::DOUBLE AS v, {_DAY_NO} AS d FROM events WHERE value IS NOT NULL
),
st AS (
  SELECT min(v) AS vmin, max(v) AS vmax,
         (min(d) + max(d) + 1) // 2 AS mid
  FROM base
),
lab AS (
  SELECT CASE WHEN (SELECT vmax FROM st) = (SELECT vmin FROM st) THEN 0
              ELSE least(9, CAST(floor((v - (SELECT vmin FROM st))
                   / (((SELECT vmax FROM st) - (SELECT vmin FROM st))
                      / 10.0)) AS INT)) END AS bin,
         d < (SELECT mid FROM st) AS is_ref
  FROM base
),
cnt AS (
  SELECT bin, sum(CASE WHEN is_ref THEN 1 ELSE 0 END)::BIGINT AS n_ref,
         sum(CASE WHEN is_ref THEN 0 ELSE 1 END)::BIGINT AS n_cur
  FROM lab GROUP BY 1
),
sp AS (SELECT unnest(range(0, 10))::INT AS bin),
f AS (
  SELECT sp.bin, coalesce(cnt.n_ref, 0)::BIGINT AS n_ref,
         coalesce(cnt.n_cur, 0)::BIGINT AS n_cur
  FROM sp LEFT JOIN cnt USING (bin)
),
g AS (
  SELECT bin, n_ref, n_cur,
         sum(n_ref) OVER () AS tr, sum(n_cur) OVER () AS tc
  FROM f
),
tm AS (
  SELECT bin, n_ref, n_cur,
         CAST(floor(1000000.0 *
           ((CAST(n_cur + 1 AS DOUBLE) / CAST(tc + 10 AS DOUBLE)
             - CAST(n_ref + 1 AS DOUBLE) / CAST(tr + 10 AS DOUBLE))
            * ln((CAST(n_cur + 1 AS DOUBLE) / CAST(tc + 10 AS DOUBLE))
                 / (CAST(n_ref + 1 AS DOUBLE) / CAST(tr + 10 AS DOUBLE)))))
           AS BIGINT) AS term_micro
  FROM g
)
SELECT bin, n_ref, n_cur, term_micro,
       sum(term_micro) OVER ()::BIGINT AS psi_micro
FROM tm
"""


# Classifier reliability diagram (ops/classify.calibration_curve,
# n_bins=10 over the [0, 1e6] fixed-point score): per-bin positive rate
# vs mean score. Reuses the classifier fit/serve CTEs verbatim.
ORACLES["calibration_curve_en"] = f"""
WITH {_CLASSIFY_CTES},
pts AS (
  SELECT s.score_fp, (d.lang = 'en') AS y
  FROM scored s JOIN documents d USING (doc_id)
  WHERE s.score_fp IS NOT NULL
),
env AS (SELECT min(score_fp) AS smin, max(score_fp) AS smax FROM pts),
b AS (
  SELECT least(9, CAST(((score_fp - (SELECT smin FROM env)) * 10)
           // ((SELECT smax FROM env) - (SELECT smin FROM env) + 1)
           AS INT)) AS bin,
         score_fp, y
  FROM pts
)
SELECT bin, count(*)::BIGINT AS n,
       sum(CASE WHEN y THEN 1 ELSE 0 END)::BIGINT AS n_pos,
       ((sum(CASE WHEN y THEN 1 ELSE 0 END) * 10000)
        // count(*))::BIGINT AS pos_bp,
       (sum(score_fp) // count(*))::BIGINT AS mean_score_fp
FROM b GROUP BY 1
"""


# Leave-one-out target encoding (ops/classify.loo_target_encode on
# events: key=event_type, target=value cents): enc = (sum_g - x)/(n_g-1),
# truncating integer division (numerator non-negative here; both engines
# truncate toward zero). NULL target / singleton group -> NULL enc.
ORACLES["loo_target_encode"] = """
WITH base AS (
  SELECT event_id, event_type,
         CAST(floor(value * 100) AS BIGINT) AS target_cents
  FROM events
),
g AS (
  SELECT event_type, count(*)::BIGINT AS n, sum(target_cents)::BIGINT AS s
  FROM base WHERE target_cents IS NOT NULL GROUP BY 1
)
SELECT b.event_id, b.event_type, b.target_cents,
       CASE WHEN b.target_cents IS NULL OR g.n IS NULL OR g.n <= 1 THEN NULL
            ELSE CAST((g.s - b.target_cents) // (g.n - 1) AS BIGINT)
       END AS enc_cents
FROM base b LEFT JOIN g USING (event_type)
"""


# DP noisy daily counts (ops/audit.dp_noisy_counts, eps_bits=1): discrete
# Laplace noise = G1 - G2, each G the leading-zero count of a seeded
# 40-bit uniform from the portable hash (Geometric(1/2), eps = ln 2).
# Pure integer sampling -- no ln(), so no libm slack between engines.
_DP_CELL = "key || '|' || day"
ORACLES["dp_noisy_counts"] = f"""
WITH cells AS (
  SELECT event_type AS key, {_DAY_NO} AS day, count(*)::BIGINT AS n_true
  FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL
  GROUP BY 1, 2
),
nz AS (
  SELECT key, day, n_true,
         {portable_hash_sql(_DP_CELL, seed=101)} % 1099511627776 AS h1,
         {portable_hash_sql(_DP_CELL, seed=102)} % 1099511627776 AS h2
  FROM cells
),
g AS (
  SELECT key, day, n_true,
         (CASE WHEN h1 = 0 THEN 40 ELSE 40 - length(bin(h1)) END)::BIGINT AS g1,
         (CASE WHEN h2 = 0 THEN 40 ELSE 40 - length(bin(h2)) END)::BIGINT AS g2
  FROM nz
)
SELECT key, day, n_true, (g1 - g2)::BIGINT AS noise,
       greatest(0, n_true + g1 - g2)::BIGINT AS n_released
FROM g
"""


# Exact two-sample KS statistic (ops/audit.ks_value_drift): first vs
# second half of the day range, integer numerator over n_ref*n_cur,
# smallest value attaining the max. The oracle uses the plain global
# cumulative window; the Spark side's bucketed prefix sum must agree.
ORACLES["ks_value_drift"] = f"""
WITH base AS (
  SELECT value::DOUBLE AS v, {_DAY_NO} AS d FROM events WHERE value IS NOT NULL
),
st AS (SELECT (min(d) + max(d) + 1) // 2 AS mid FROM base),
cnt AS (
  SELECT v,
         sum(CASE WHEN d < (SELECT mid FROM st) THEN 1 ELSE 0 END)::HUGEINT AS c_ref,
         sum(CASE WHEN d < (SELECT mid FROM st) THEN 0 ELSE 1 END)::HUGEINT AS c_cur
  FROM base GROUP BY 1
),
cum AS (
  SELECT v,
         sum(c_ref) OVER (ORDER BY v) AS cr,
         sum(c_cur) OVER (ORDER BY v) AS cc,
         sum(c_ref) OVER () AS nr,
         sum(c_cur) OVER () AS nc
  FROM cnt
)
SELECT nr::BIGINT AS n_ref, nc::BIGINT AS n_cur, v AS at_value,
       abs(cr * nc - cc * nr)::BIGINT AS d_num,
       ((10000 * abs(cr * nc - cc * nr)) // (nr * nc))::BIGINT AS ks_bp
FROM cum
ORDER BY abs(cr * nc - cc * nr) DESC, v ASC
LIMIT 1
"""


# Theta-sketch set-intersection estimate between event-type user sets
# (ops/sketch.kmv_set_overlap, k=64): theta = min of the pair's kth-min
# hashes (HASH_SPACE when a set fits its sketch), est = n_common *
# HASH_SPACE // theta. The oracle is the direct single-window top-k; the
# Spark side's two-stage salted plan must agree.
_KMV_M = 1 << 60
ORACLES["kmv_set_overlap"] = f"""
WITH base AS (
  SELECT DISTINCT event_type AS t, user_id AS u FROM events
  WHERE event_type IS NOT NULL AND user_id IS NOT NULL
),
dh AS (
  SELECT DISTINCT t, {portable_hash_sql('cast(u AS VARCHAR)')} AS h FROM base
),
sk AS (
  SELECT t, h FROM (
    SELECT t, h, row_number() OVER (PARTITION BY t ORDER BY h) AS rn FROM dh
  ) WHERE rn <= 64
),
kth AS (
  SELECT t,
         CASE WHEN count(*) < 64 THEN {_KMV_M} ELSE max(h) END AS th
  FROM sk GROUP BY t
),
spine AS (
  SELECT a.t AS t1, b.t AS t2, least(a.th, b.th) AS theta
  FROM kth a JOIN kth b ON a.t < b.t
),
cm AS (
  SELECT s1.t AS t1, s2.t AS t2, count(*)::BIGINT AS c
  FROM sk s1
  JOIN sk s2 ON s1.h = s2.h AND s1.t < s2.t
  JOIN spine sp ON sp.t1 = s1.t AND sp.t2 = s2.t
  WHERE s1.h < sp.theta
  GROUP BY 1, 2
),
est AS (
  SELECT sp.t1, sp.t2, sp.theta,
         coalesce(cm.c, 0)::BIGINT AS n_common,
         ((coalesce(cm.c, 0)::HUGEINT * {_KMV_M}) // sp.theta)::BIGINT AS est_inter
  FROM spine sp LEFT JOIN cm ON cm.t1 = sp.t1 AND cm.t2 = sp.t2
),
ex AS (
  SELECT a.t AS t1, b.t AS t2, count(*)::BIGINT AS exact_inter
  FROM base a JOIN base b ON a.u = b.u AND a.t < b.t
  GROUP BY 1, 2
)
SELECT e.t1, e.t2, e.theta, e.n_common, e.est_inter,
       coalesce(ex.exact_inter, 0)::BIGINT AS exact_inter,
       CASE WHEN coalesce(ex.exact_inter, 0) = 0 THEN 0
            ELSE sign(e.est_inter - ex.exact_inter)::BIGINT
                 * ((10000 * abs(e.est_inter - ex.exact_inter))
                    // ex.exact_inter)
       END::BIGINT AS err_bp
FROM est e LEFT JOIN ex ON ex.t1 = e.t1 AND ex.t2 = e.t2
"""


# CMS inner-product join-size estimate (ops/sketch.cms_join_size_estimate
# on the lineitem self-join over l_partkey, depth=4, width=1024): the
# AMS F2 estimator; est = min over hash rows of sum(cntA*cntB), never
# below the exact size.
_CMS_JS_CELLS = "\nUNION ALL\n".join(
    f"SELECT {i} AS row_i, ({portable_hash_sql('cast(l_partkey AS VARCHAR)', i)}) % 1024 AS bucket\n"
    "FROM lineitem WHERE l_partkey IS NOT NULL"
    for i in range(4)
)
ORACLES["join_size_estimate"] = f"""
WITH cells AS (
{_CMS_JS_CELLS}
),
sk AS (SELECT row_i, bucket, count(*)::HUGEINT AS cnt FROM cells GROUP BY 1, 2),
ip AS (
  SELECT a.row_i, sum(a.cnt * b.cnt) AS ip
  FROM sk a JOIN sk b ON a.row_i = b.row_i AND a.bucket = b.bucket
  GROUP BY 1
),
est AS (SELECT min(ip) AS e FROM ip),
n AS (
  SELECT l_partkey AS k, count(*)::HUGEINT AS n
  FROM lineitem WHERE l_partkey IS NOT NULL GROUP BY 1
),
exact AS (SELECT coalesce(sum(a.n * b.n), 0) AS x FROM n a JOIN n b USING (k))
SELECT x::BIGINT AS exact_rows, e::BIGINT AS est_rows,
       (CASE WHEN x = 0 THEN 0 ELSE (10000 * (e - x)) // x END)::BIGINT
         AS overcount_bp
FROM exact, est
"""


# MI feature ranking (ops/classify.mi_feature_rank vs label lang='en'):
# per-cell term floor-quantized to 1e-6 nats before the integer total;
# cell terms can be negative and floor is floor in both engines.
ORACLES["mi_feature_rank"] = """
WITH feats AS (
  SELECT 'source' AS feature, coalesce(source, '<null>') AS level,
         coalesce(lang = 'en', false) AS y FROM documents
  UNION ALL
  SELECT 'len_bucket', coalesce(CAST(n_chars // 512 AS VARCHAR), '<null>'),
         coalesce(lang = 'en', false) FROM documents
  UNION ALL
  SELECT 'has_digit',
         CASE WHEN text IS NULL THEN '<null>'
              WHEN regexp_matches(text, '[0-9]') THEN '1' ELSE '0' END,
         coalesce(lang = 'en', false) FROM documents
),
cells AS (
  SELECT feature, level, y, count(*)::HUGEINT AS n_xy
  FROM feats GROUP BY 1, 2, 3
),
lv AS (SELECT feature, level, sum(n_xy) AS n_x FROM cells GROUP BY 1, 2),
yy AS (SELECT feature, y, sum(n_xy) AS n_y FROM cells GROUP BY 1, 2),
tot AS (
  SELECT feature, sum(n_xy) AS n, count(DISTINCT level)::BIGINT AS n_levels
  FROM cells GROUP BY 1
),
terms AS (
  SELECT c.feature, t.n_levels,
         CAST(floor(1000000.0 * (c.n_xy::DOUBLE / t.n::DOUBLE)
              * ln(c.n_xy::DOUBLE * t.n::DOUBLE
                   / (l.n_x::DOUBLE * y2.n_y::DOUBLE))) AS BIGINT) AS tm
  FROM cells c
  JOIN lv l ON l.feature = c.feature AND l.level = c.level
  JOIN yy y2 ON y2.feature = c.feature AND y2.y = c.y
  JOIN tot t ON t.feature = c.feature
)
SELECT feature, n_levels, sum(tm)::BIGINT AS mi_micro
FROM terms GROUP BY 1, 2
ORDER BY mi_micro DESC, feature ASC
"""


# CUPED-adjusted A/B lift (ops/behavior.cuped_adjusted_lift): arm =
# portable-hash parity of user_id, X = first-half cents, Y = second-half
# cents, theta pooled; every division is the sign-split truncating form
# sign(num) * (abs(num) // den), so floor-vs-trunc on negatives cannot
# diverge between engines.
ORACLES["cuped_adjusted_lift"] = f"""
WITH base AS (
  SELECT user_id AS u, {_DAY_NO} AS d,
         CAST(floor(value * 100) AS BIGINT) AS cents
  FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
),
env AS (SELECT (min(d) + max(d) + 1) // 2 AS mid FROM base),
pu AS (
  SELECT u,
         sum(CASE WHEN d < (SELECT mid FROM env) THEN cents ELSE 0 END)::HUGEINT AS x,
         sum(CASE WHEN d < (SELECT mid FROM env) THEN 0 ELSE cents END)::HUGEINT AS y,
         {portable_hash_sql('cast(u AS VARCHAR)')} % 2 AS arm
  FROM base GROUP BY u
),
mm AS (
  SELECT count(*)::HUGEINT AS n,
         sum(x) AS sx, sum(y) AS sy,
         count(*)::HUGEINT * sum(x * y) - sum(x) * sum(y) AS covn,
         count(*)::HUGEINT * sum(x * x) - sum(x) * sum(x) AS varx,
         count(*)::HUGEINT * sum(y * y) - sum(y) * sum(y) AS vary
  FROM pu
),
w AS (
  SELECT
    (SELECT count(*)::HUGEINT FROM pu WHERE arm = 1) AS n_t,
    (SELECT count(*)::HUGEINT FROM pu WHERE arm = 0) AS n_c,
    (SELECT coalesce(sum(x), 0)::HUGEINT FROM pu WHERE arm = 1) AS sx_t,
    (SELECT coalesce(sum(x), 0)::HUGEINT FROM pu WHERE arm = 0) AS sx_c,
    (SELECT coalesce(sum(y), 0)::HUGEINT FROM pu WHERE arm = 1) AS sy_t,
    (SELECT coalesce(sum(y), 0)::HUGEINT FROM pu WHERE arm = 0) AS sy_c,
    covn, varx, vary
  FROM mm
),
t1 AS (
  SELECT *,
    CASE WHEN varx = 0 THEN 0
         ELSE sign(covn)::HUGEINT * ((abs(covn) * 1000000) // varx)
    END AS theta_micro,
    n_t * n_c AS nn
  FROM w
),
t2 AS (
  SELECT *,
    (sy_t * n_c - sy_c * n_t) * 1000000 AS raw_num,
    (sy_t * 1000000 - theta_micro * sx_t) * n_c
      - (sy_c * 1000000 - theta_micro * sx_c) * n_t AS cuped_num,
    CASE WHEN varx = 0 THEN 0
         ELSE sign(covn)::HUGEINT * ((abs(covn) * 10000) // varx)
    END AS step1
  FROM t1
)
SELECT n_t::BIGINT AS n_t, n_c::BIGINT AS n_c,
       theta_micro::BIGINT AS theta_micro,
       (CASE WHEN nn = 0 THEN 0
             ELSE sign(raw_num)::HUGEINT * (abs(raw_num) // nn) END)::BIGINT
         AS diff_raw_micro,
       (CASE WHEN nn = 0 THEN 0
             ELSE sign(cuped_num)::HUGEINT * (abs(cuped_num) // nn) END)::BIGINT
         AS diff_cuped_micro,
       (CASE WHEN vary = 0 THEN 0
             ELSE sign(step1 * covn)::HUGEINT
                  * (abs(step1 * covn) // vary) END)::BIGINT
         AS var_reduction_bp
FROM t2
"""


# 2-D skyline / Pareto front over per-user (value cents, event count)
# (ops/relational.skyline_users): the oracle is the direct NOT EXISTS
# dominance quantifier; the Spark side's bucketed running-max must agree.
ORACLES["skyline_users"] = """
WITH pu AS (
  SELECT user_id AS u,
         sum(coalesce(CAST(floor(value * 100) AS BIGINT), 0))::BIGINT AS v,
         count(*)::BIGINT AS n
  FROM events WHERE user_id IS NOT NULL GROUP BY 1
)
SELECT p.u AS user_id, p.v AS value_cents, p.n AS n_events
FROM pu p
WHERE NOT EXISTS (
  SELECT 1 FROM pu q
  WHERE q.v >= p.v AND q.n >= p.n AND (q.v > p.v OR q.n > p.n)
)
"""

# Contrastive hard negatives (ops.similarity.hard_negatives_topk):
# knn_join's probe arithmetic with the different-label predicate applied
# BEFORE the per-anchor top-k (anchors vec_id < 50, k=3, 16 cells, 4
# probes); labels ride the assignment
ORACLES["hard_negatives_topk"] = f"""
WITH qv AS (SELECT vec_id, label, {_QUANT} AS q FROM embeddings),
cents AS (SELECT vec_id AS cell, q AS cv FROM qv WHERE vec_id < 16),
ascored AS (
  SELECT v.vec_id, v.label, v.q, c.cell,
         cast(list_sum(list_transform(range(1, 65), i -> v.q[i] * c.cv[i])) AS BIGINT)
           * 16 - c.cell AS ord
  FROM qv v CROSS JOIN cents c
),
assigned AS (
  SELECT vec_id, label, q, arg_max(cell, ord) AS cell
  FROM ascored GROUP BY vec_id, label, q
),
queries AS (SELECT vec_id AS query_id, label AS q_label, q AS qq FROM qv WHERE vec_id < 50),
probe AS (
  SELECT query_id, q_label, qq, cell FROM (
    SELECT qu.query_id, qu.q_label, qu.qq, c.cell,
           row_number() OVER (PARTITION BY qu.query_id ORDER BY
             cast(list_sum(list_transform(range(1, 65), i -> c.cv[i] * qu.qq[i])) AS BIGINT)
               * 16 - c.cell DESC) AS rn
    FROM queries qu CROSS JOIN cents c
  ) WHERE rn <= 4
),
cand AS (
  SELECT p.query_id, a.vec_id,
         cast(list_sum(list_transform(range(1, 65), i -> a.q[i] * p.qq[i])) AS BIGINT) AS dot
  FROM probe p JOIN assigned a USING (cell)
  WHERE a.vec_id <> p.query_id
    AND NOT (a.label IS NOT DISTINCT FROM p.q_label)
)
SELECT query_id, vec_id, dot, neg_rank FROM (
  SELECT query_id, vec_id, dot,
         cast(row_number() OVER (PARTITION BY query_id ORDER BY dot DESC, vec_id)
              AS BIGINT) AS neg_rank
  FROM cand
) WHERE neg_rank <= 3
"""


# Session x daily-error-incident interval overlap join
# (ops/relational.session_incident_overlap, gap_s=1800): the oracle is
# the direct range-predicate join; the Spark side's day-bucket blocking
# must find the identical pair set (overlapping intervals share a day).
ORACLES["session_incident_overlap"] = """
WITH base AS (
  SELECT user_id, ts, event_id, cast(floor(epoch(ts)) AS BIGINT) AS ep
  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
),
lagd AS (
  SELECT user_id, ts, event_id, ep,
         coalesce((ep - lag(ep) OVER (PARTITION BY user_id ORDER BY ts, event_id)) > 1800,
                  true)::INT AS newf
  FROM base
),
sess AS (
  SELECT user_id, ep,
         sum(newf) OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS UNBOUNDED PRECEDING) AS s
  FROM lagd
),
spans AS (
  SELECT user_id, s, min(ep) AS s_start, max(ep) AS s_end
  FROM sess GROUP BY 1, 2
),
inc AS (
  SELECT cast(floor(epoch(ts)) AS BIGINT) // 86400 AS day_no,
         min(cast(floor(epoch(ts)) AS BIGINT)) AS i_start,
         max(cast(floor(epoch(ts)) AS BIGINT)) AS i_end,
         count(*)::BIGINT AS n_errors
  FROM events WHERE event_type = 'error' AND ts IS NOT NULL GROUP BY 1
)
SELECT sp.user_id, sp.s_start AS sess_start_ep, inc.day_no,
       (least(sp.s_end, inc.i_end) - greatest(sp.s_start, inc.i_start))::BIGINT
         AS overlap_s,
       inc.n_errors
FROM spans sp
JOIN inc ON sp.s_start <= inc.i_end AND inc.i_start <= sp.s_end
"""


# Poisson-bootstrap A/B confidence interval (ops/behavior.ab_bootstrap_ci,
# n_reps=32): per-(user, replica) Poisson(1) weights by inverse CDF over
# the 2^30 fixed-point thresholds; replica means rank-picked at
# ceil(.05*B)=2 / ceil(.95*B)=31. CASE text generated by the SAME
# poisson1_weight_sql the Spark op uses.
ORACLES["ab_bootstrap_ci"] = """
WITH pu AS (
  SELECT user_id AS u,
         sum(CAST(floor(value * 100) AS BIGINT))::HUGEINT AS y,
         cast('0x' || substr(md5((cast(user_id AS VARCHAR)) || '#0'), 1, 15) AS BIGINT) % 2 AS arm
  FROM events WHERE user_id IS NOT NULL AND value IS NOT NULL GROUP BY 1
),
reps AS (SELECT u, y, arm, unnest(range(0, 32)) AS b FROM pu),
hh AS (
  SELECT arm, b, y, cast('0x' || substr(md5((u || '|' || b) || '#7'), 1, 15) AS BIGINT) % 1073741824 AS h
  FROM reps
),
wt AS (SELECT arm, b, y, (CASE WHEN (h) < 395007542 THEN 0 WHEN (h) < 790015084 THEN 1 WHEN (h) < 987518855 THEN 2 WHEN (h) < 1053353445 THEN 3 WHEN (h) < 1069812093 THEN 4 WHEN (h) < 1073103822 THEN 5 WHEN (h) < 1073652444 THEN 6 WHEN (h) < 1073730819 THEN 7 WHEN (h) < 1073740615 THEN 8 ELSE 9 END)::HUGEINT AS w FROM hh),
cells AS (SELECT arm, b, sum(w * y) AS sw, sum(w) AS ww FROM wt GROUP BY 1, 2),
rm AS (
  SELECT arm,
         (CASE WHEN ww = 0 THEN 0
               ELSE sign(sw)::HUGEINT * (abs(sw) // ww) END)::BIGINT AS rmean
  FROM cells
),
rk AS (
  SELECT arm, rmean,
         row_number() OVER (PARTITION BY arm ORDER BY rmean) AS rn
  FROM rm
),
pct AS (
  SELECT arm,
         max(CASE WHEN rn = 2 THEN rmean END)::BIGINT AS lo05_cents,
         max(CASE WHEN rn = 31 THEN rmean END)::BIGINT AS hi95_cents
  FROM rk GROUP BY 1
),
pt AS (SELECT arm, count(*)::BIGINT AS n_users, sum(y) AS sy FROM pu GROUP BY 1)
SELECT pt.arm::BIGINT AS arm, pt.n_users,
       (CASE WHEN pt.n_users = 0 THEN 0
             ELSE sign(pt.sy)::HUGEINT
                  * (abs(pt.sy) // pt.n_users::HUGEINT) END)::BIGINT
         AS mean_cents,
       pct.lo05_cents, pct.hi95_cents
FROM pt JOIN pct USING (arm)
"""

# Exact prefix-filter set-similarity join (ops/setsim.setsim_join,
# PPJoin-lite, Xiao et al. WWW 2008): identical integer basis-point
# arithmetic, identical (df asc, token asc) global token order, and the
# same both-sides prefix emission — the oracle IS the algorithm, so a
# missed candidate on either engine shows up as a row diff.
ORACLES["setsim_join_pairs"] = r"""
WITH tk AS (
  SELECT DISTINCT doc_id, token FROM (
    SELECT doc_id,
           unnest(regexp_split_to_array(lower(trim(coalesce(text, ''))),
                                        '\s+')) AS token
    FROM documents) WHERE token <> ''
),
sizes AS (SELECT doc_id, count(*)::BIGINT AS sz FROM tk GROUP BY 1),
dfreq AS (SELECT token, count(*)::BIGINT AS dfq FROM tk GROUP BY 1),
ordered AS (
  SELECT tk.doc_id, tk.token, s.sz,
         row_number() OVER (PARTITION BY tk.doc_id
                            ORDER BY d.dfq, tk.token) AS rnk
  FROM tk JOIN dfreq d USING (token) JOIN sizes s USING (doc_id)
),
pref AS (
  SELECT token, doc_id, sz FROM ordered
  WHERE rnk <= sz - ((6000 * sz + 9999) // 10000) + 1
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                  a.sz AS sz_a, b.sz AS sz_b
  FROM pref a JOIN pref b ON a.token = b.token AND a.doc_id < b.doc_id
  WHERE 10000 * least(a.sz, b.sz) >= 6000 * greatest(a.sz, b.sz)
),
inter AS (
  SELECT c.doc_a, c.doc_b, c.sz_a, c.sz_b, count(*)::BIGINT AS inter_tokens
  FROM cand c
  JOIN tk ta ON ta.doc_id = c.doc_a
  JOIN tk tb ON tb.doc_id = c.doc_b AND tb.token = ta.token
  GROUP BY 1, 2, 3, 4
)
SELECT doc_a, doc_b, inter_tokens,
       (sz_a + sz_b - inter_tokens)::BIGINT AS union_tokens,
       ((10000 * inter_tokens) // (sz_a + sz_b - inter_tokens))::BIGINT
         AS jaccard_bp
FROM inter
WHERE 10000 * inter_tokens >= 6000 * (sz_a + sz_b - inter_tokens)
"""

# Rendezvous-hash shard occupancy (route.hrw_shard_counts): the oracle
# recomputes the argmax with the identical portable 60-bit hash via an
# unnest over the shard range and the same (hash DESC, shard ASC)
# tie-break the Spark struct-max encodes with (h, -s).
ORACLES["hrw_shard_counts"] = r"""
WITH keys AS (
  SELECT user_id AS k, count(*)::BIGINT AS n_ev FROM events
  WHERE user_id IS NOT NULL GROUP BY 1
),
h AS (
  SELECT k, n_ev, s.shard,
         cast('0x' || substr(md5((cast(k AS VARCHAR) || '|' || cast(s.shard AS VARCHAR)) || '#0'), 1, 15) AS BIGINT) AS hv
  FROM keys CROSS JOIN (SELECT range AS shard FROM range(0, 8)) s
),
a AS (
  SELECT k, n_ev, shard,
         row_number() OVER (PARTITION BY k ORDER BY hv DESC, shard ASC) AS rn
  FROM h
)
SELECT shard::INT AS shard, count(*)::BIGINT AS n_keys,
       sum(n_ev)::BIGINT AS n_events
FROM a WHERE rn = 1 GROUP BY 1
"""

# HRW minimal-movement reshard audit (route.hrw_reshard_audit): assign at
# 8 and 9 shards; n_moved must equal n_moved_to_new row by row (the HRW
# theorem the pytest also pins).
ORACLES["hrw_reshard_audit"] = r"""
WITH keys AS (
  SELECT DISTINCT user_id AS k FROM events WHERE user_id IS NOT NULL
),
h9 AS (
  SELECT k, s.shard,
         cast('0x' || substr(md5((cast(k AS VARCHAR) || '|' || cast(s.shard AS VARCHAR)) || '#0'), 1, 15) AS BIGINT) AS hv
  FROM keys CROSS JOIN (SELECT range AS shard FROM range(0, 9)) s
),
a9 AS (
  SELECT k, shard,
         row_number() OVER (PARTITION BY k ORDER BY hv DESC, shard ASC) AS rn
  FROM h9
),
before AS (
  SELECT k, shard AS shard_before FROM (
    SELECT k, shard,
           row_number() OVER (PARTITION BY k
                              ORDER BY hv DESC, shard ASC) AS rn
    FROM h9 WHERE shard < 8) WHERE rn = 1
),
after AS (SELECT k, shard AS shard_after FROM a9 WHERE rn = 1)
SELECT b.shard_before::INT AS shard_before, count(*)::BIGINT AS n_keys,
       sum((a.shard_after <> b.shard_before)::INT)::BIGINT AS n_moved,
       sum((a.shard_after = 8)::INT)::BIGINT AS n_moved_to_new
FROM before b JOIN after a USING (k)
GROUP BY 1
"""
