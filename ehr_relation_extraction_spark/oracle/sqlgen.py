"""DuckDB oracle SQL for each driver-checked operator.

These statements re-derive every pipeline stage *independently* of the
engine, in pure ANSI-ish SQL over the driver's pre-registered views
(``documents`` etc.), so the driver can cross-check row counts, schemas
and value hashes (CORRECTNESS_r{N}.json).

Specialization note (important): the SQL form of the T5 greedy split is
the closed form ``shard_id = tok_idx // MAX_LEN``, which is *provably*
what the reference algorithm (ehr.py:353-432) computes on text without
newline characters (the only split triggers are '\\n'-anchored; absent
them every split is the hard cut at exactly max_len tokens).  The
driver's synthetic corpus contains no newlines (verified); the general
greedy algorithm is exercised against hand-computed and pure-Python
oracles in pytest instead.

All numeric outputs are cast to match the engine's Spark types
(int32 offsets, int64 ids/counts) and every computed column is aliased
identically on both sides.
"""

from __future__ import annotations

from ..config import (GAZETTEER, MAX_LEN_TOKENS, MAX_PAIR_GAP_CHARS)

SEP_CLASS = "[\\n \\t]"


def gaz_values() -> str:
    rows = ",\n    ".join(
        f"('{alias}', '{etype}', '{canon}', {len(alias.split(' '))})"
        for alias, etype, canon in GAZETTEER
    )
    return ("gaz(alias, ent_type, canonical_id, n) AS (\n  SELECT * FROM (VALUES\n    "
            + rows + "\n  ) v(alias, ent_type, canonical_id, n)\n)")


def base_ctes(max_len: int = MAX_LEN_TOKENS) -> str:
    """Shared CTE chain: pages -> toks -> shards -> mentions."""
    return f"""
pages AS (
  SELECT doc_id,
         'https://' || source || '.example.com/' || CAST(doc_id AS VARCHAR) AS url,
         text, lang
  FROM documents
),
raw_toks AS (
  SELECT doc_id, url, text,
         unnest(string_split_regex(text, '{SEP_CLASS}')) AS tok,
         generate_subscripts(string_split_regex(text, '{SEP_CLASS}'), 1) AS piece_idx
  FROM pages
),
toks0 AS (
  SELECT doc_id, url, text, tok, piece_idx,
         CAST(COALESCE(SUM(length(tok) + 1) OVER (
              PARTITION BY doc_id ORDER BY piece_idx
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS INT) AS char_start
  FROM raw_toks
),
toks AS (
  SELECT doc_id, url, text, tok AS token,
         CAST(ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY piece_idx) - 1 AS INT) AS tok_idx,
         char_start,
         CAST(char_start + length(tok) AS INT) AS char_end,
         CAST(length(text) AS INT) AS text_len,
         CAST(COUNT(*) OVER (PARTITION BY doc_id) AS INT) AS n_tokens
  FROM toks0 WHERE tok <> ''
),
shard0 AS (
  SELECT doc_id, url, CAST(tok_idx // {max_len} AS INT) AS shard_id,
         CAST(MIN(tok_idx) AS INT) AS tok_start,
         CAST(MAX(tok_idx) + 1 AS INT) AS tok_end,
         MIN(char_start) AS char_start,
         MAX(char_end) AS char_end,
         MIN(char_end) AS first_tok_end,
         MIN(n_tokens) AS n_tokens
  FROM toks GROUP BY doc_id, url, CAST(tok_idx // {max_len} AS INT)
),
shards AS (
  SELECT doc_id, url, shard_id, tok_start, tok_end, char_start, char_end,
         CASE WHEN m = 1 THEN 0
              WHEN lead_fte IS NULL THEN NULL
              WHEN shard_id = 0 THEN 0
              ELSE first_tok_end END AS re_start,
         CASE WHEN m = 1 THEN first_tok_end ELSE lead_fte END AS re_end,
         n_tokens
  FROM (
    SELECT *, CAST(COUNT(*) OVER (PARTITION BY doc_id) AS INT) AS m,
           LEAD(first_tok_end) OVER (PARTITION BY doc_id ORDER BY shard_id) AS lead_fte
    FROM shard0
  )
),
uni AS (
  SELECT t.doc_id, t.url, g.ent_type, t.char_start AS start, t.char_end AS "end",
         t.token AS ent_text
  FROM toks t JOIN gaz g ON g.n = 1 AND lower(t.token) = g.alias
  WHERE t.char_start > 0 AND t.char_end < t.text_len
),
bi AS (
  SELECT t1.doc_id, t1.url, g.ent_type, t1.char_start AS start, t2.char_end AS "end",
         substr(t1.text, t1.char_start + 1, t2.char_end - t1.char_start) AS ent_text
  FROM toks t1
  JOIN toks t2 ON t1.doc_id = t2.doc_id AND t2.tok_idx = t1.tok_idx + 1
              AND t2.char_start = t1.char_end + 1
  JOIN gaz g ON g.n = 2 AND lower(t1.token || ' ' || t2.token) = g.alias
  WHERE t1.char_start > 0 AND t2.char_end < t1.text_len
    AND substr(t1.text, t1.char_end + 1, 1) = ' '
),
mentions AS (
  SELECT doc_id, url,
         'T' || CAST(ROW_NUMBER() OVER (
             PARTITION BY url ORDER BY start, "end", ent_type) AS VARCHAR) AS ent_id,
         ent_type, start, "end", ent_text
  FROM (SELECT * FROM uni UNION ALL SELECT * FROM bi)
  WHERE regexp_matches(ent_text, '[0-9A-Za-z]')
),
winm AS (
  SELECT m.doc_id, m.url, m.ent_id, m.ent_type, m.start, m."end", m.ent_text,
         s.shard_id
  FROM mentions m JOIN shards s
    ON m.url = s.url AND s.re_start IS NOT NULL
   AND m.start >= s.re_start AND m."end" < s.re_end
),
pairs0 AS (
  SELECT h.doc_id, h.url, h.shard_id,
         a.ent_type || '-Topic' AS rel_type,
         h.ent_id AS hub_id, h.ent_text AS hub_text,
         h.start AS hub_start, h."end" AS hub_end,
         a.ent_id AS attr_id, a.ent_type AS attr_type, a.ent_text AS attr_text,
         a.start AS attr_start, a."end" AS attr_end
  FROM winm h JOIN winm a ON h.url = a.url AND h.shard_id = a.shard_id
  WHERE h.ent_type = 'Topic' AND a.ent_type <> 'Topic'
),
candidates AS (
  SELECT *,
         CAST(greatest(greatest(hub_start, attr_start) - least(hub_end, attr_end), 0) AS INT) AS gap,
         'R' || CAST(ROW_NUMBER() OVER (PARTITION BY url ORDER BY
             shard_id, hub_start, hub_end, attr_start, attr_end, rel_type) AS VARCHAR) AS rel_id
  FROM pairs0
),
relations AS (
  SELECT doc_id, url, shard_id, rel_type, hub_id, hub_text, hub_start, hub_end,
         attr_id, attr_type, attr_text, attr_start, attr_end, gap,
         'R' || CAST(ROW_NUMBER() OVER (PARTITION BY url ORDER BY
             shard_id, hub_start, hub_end, attr_start, attr_end, rel_type) AS VARCHAR) AS rel_id
  FROM candidates WHERE gap <= {MAX_PAIR_GAP_CHARS}
),
triples AS (
  SELECT DISTINCT doc_id, url, hub_id AS subj_id, hub_text AS subj,
         attr_type AS pred, attr_text AS obj
  FROM relations
)"""


def with_base(select: str, max_len: int = MAX_LEN_TOKENS) -> str:
    return f"WITH {gaz_values()},{base_ctes(max_len)}\n{select}"


ORACLE: dict[str, str] = {
    "extract_text": with_base(
        "SELECT doc_id, url, sha256(text) AS text_sha, CAST(length(text) AS INT) AS n_chars FROM pages"),
    "tokenize": with_base(
        "SELECT doc_id, url, tok_idx, token, char_start, char_end FROM toks"),
    "shards": with_base(
        "SELECT doc_id, url, shard_id, tok_start, tok_end, char_start, char_end, "
        "re_start, re_end, n_tokens FROM shards"),
    "mentions": with_base(
        'SELECT doc_id, url, ent_id, ent_type, start, "end", ent_text FROM mentions'),
    "candidates": with_base(
        "SELECT doc_id, url, shard_id, rel_id, rel_type, hub_id, hub_text, hub_start, hub_end, "
        "attr_id, attr_type, attr_text, attr_start, attr_end, gap FROM candidates"),
    "relations": with_base(
        "SELECT doc_id, url, rel_id, rel_type, hub_id, attr_id, gap FROM relations"),
    "triples": with_base(
        "SELECT doc_id, url, subj_id, subj, pred, obj FROM triples"),
    "wide_table": with_base(
        "SELECT url, subj_id, subj, pred, string_agg(obj, chr(10) ORDER BY obj) AS obj_texts, "
        "CAST(COUNT(*) AS BIGINT) AS n_objs FROM triples GROUP BY url, subj_id, subj, pred"),
    "distinct_subjects": with_base(
        "SELECT DISTINCT url, subj_id, subj FROM triples"),
}
