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
identically on both sides.  Floats are only ever emitted as
floor-scaled integers (see operators/evaluate.py).
"""

from __future__ import annotations

from ..config import (ACCEPT_FUZZY_JACCARD_PCT, GAZETTEER, MAX_LEN_TOKENS,
                      MAX_PAIR_GAP_CHARS, MIN_FUZZY_JACCARD_PCT,
                      MIXTURE_DEFAULT_PCT, MIXTURE_RATES,
                      perturbed_gazetteer, srp_planes)

SEP_CLASS = "[\\n \\t]"


def gaz_values(name: str, gazetteer) -> str:
    rows = ",\n    ".join(
        f"('{alias}', '{etype}', '{canon}', {len(alias.split(' '))})"
        for alias, etype, canon in gazetteer
    )
    return (f"{name}(alias, ent_type, canonical_id, n) AS (\n  SELECT * FROM (VALUES\n    "
            + rows + "\n  ) v(alias, ent_type, canonical_id, n)\n)")


def toks_ctes(max_len: int = MAX_LEN_TOKENS) -> str:
    """pages -> toks -> shards (gazetteer-independent)."""
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
toks AS MATERIALIZED (
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
shards AS MATERIALIZED (
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
)"""


def mention_ctes(gaz: str, sfx: str = "") -> str:
    """toks + {gaz} -> mentions{sfx} -> ... -> triples{sfx}."""
    return f"""
uni{sfx} AS (
  SELECT t.doc_id, t.url, g.ent_type, t.char_start AS start, t.char_end AS "end",
         t.token AS ent_text
  FROM toks t JOIN {gaz} g ON g.n = 1 AND lower(t.token) = g.alias
  WHERE t.char_start > 0 AND t.char_end < t.text_len
),
bi{sfx} AS (
  SELECT t1.doc_id, t1.url, g.ent_type, t1.char_start AS start, t2.char_end AS "end",
         substr(t1.text, t1.char_start + 1, t2.char_end - t1.char_start) AS ent_text
  FROM toks t1
  JOIN toks t2 ON t1.doc_id = t2.doc_id AND t2.tok_idx = t1.tok_idx + 1
              AND t2.char_start = t1.char_end + 1
  JOIN {gaz} g ON g.n = 2 AND lower(t1.token || ' ' || t2.token) = g.alias
  WHERE t1.char_start > 0 AND t2.char_end < t1.text_len
    AND substr(t1.text, t1.char_end + 1, 1) = ' '
),
cands{sfx} AS (SELECT * FROM uni{sfx} UNION ALL SELECT * FROM bi{sfx}),
-- separator-consumption alternation (dict_ner.py:106-107): within each
-- (doc, type), candidates chained at start == prev_end + 1 form an
-- island; finditer keeps the odd-ranked ones (see functions/ner_kernel)
isl{sfx} AS (
  SELECT *, SUM(new_isl) OVER (
      PARTITION BY doc_id, ent_type ORDER BY start
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS isl_id
  FROM (
    SELECT *, CASE WHEN start - LAG("end") OVER (
        PARTITION BY doc_id, ent_type ORDER BY start) = 1
        THEN 0 ELSE 1 END AS new_isl
    FROM cands{sfx})
),
mentions{sfx} AS MATERIALIZED (
  SELECT doc_id, url,
         'T' || CAST(ROW_NUMBER() OVER (
             PARTITION BY url ORDER BY start, "end", ent_type) AS VARCHAR) AS ent_id,
         ent_type, start, "end", ent_text
  FROM (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY doc_id, ent_type, isl_id ORDER BY start) AS isl_rank
    FROM isl{sfx})
  WHERE isl_rank % 2 = 1 AND regexp_matches(ent_text, '[0-9A-Za-z]')
),
winm{sfx} AS MATERIALIZED (
  SELECT m.doc_id, m.url, m.ent_id, m.ent_type, m.start, m."end", m.ent_text,
         s.shard_id
  FROM mentions{sfx} m JOIN shards s
    ON m.url = s.url AND s.re_start IS NOT NULL
   AND m.start >= s.re_start AND m."end" < s.re_end
),
pairs0{sfx} AS (
  SELECT h.doc_id, h.url, h.shard_id,
         a.ent_type || '-Topic' AS rel_type,
         h.ent_id AS hub_id, h.ent_text AS hub_text,
         h.start AS hub_start, h."end" AS hub_end,
         a.ent_id AS attr_id, a.ent_type AS attr_type, a.ent_text AS attr_text,
         a.start AS attr_start, a."end" AS attr_end
  FROM winm{sfx} h JOIN winm{sfx} a ON h.url = a.url AND h.shard_id = a.shard_id
  WHERE h.ent_type = 'Topic' AND a.ent_type <> 'Topic'
),
candidates{sfx} AS (
  SELECT *,
         CAST(greatest(greatest(hub_start, attr_start) - least(hub_end, attr_end), 0) AS INT) AS gap,
         'R' || CAST(ROW_NUMBER() OVER (PARTITION BY url ORDER BY
             shard_id, hub_start, hub_end, attr_start, attr_end, rel_type) AS VARCHAR) AS rel_id
  FROM pairs0{sfx}
),
relations{sfx} AS (
  SELECT doc_id, url, shard_id, rel_type, hub_id, hub_text, hub_start, hub_end,
         attr_id, attr_type, attr_text, attr_start, attr_end, gap,
         'R' || CAST(ROW_NUMBER() OVER (PARTITION BY url ORDER BY
             shard_id, hub_start, hub_end, attr_start, attr_end, rel_type) AS VARCHAR) AS rel_id
  FROM candidates{sfx} WHERE gap <= {MAX_PAIR_GAP_CHARS}
),
triples{sfx} AS (
  SELECT DISTINCT doc_id, url, hub_id AS subj_id, hub_text AS subj,
         attr_type AS pred, attr_text AS obj
  FROM relations{sfx}
)"""


LINK_CTES = """
linked AS MATERIALIZED (
  SELECT m.doc_id, m.url, m.ent_id, m.ent_type, m.start, m."end", m.ent_text,
         COALESCE(g.canonical_id, 'surface:' || lower(m.ent_text)) AS canonical_id
  FROM mentions m LEFT JOIN gaz g
    ON lower(m.ent_text) = g.alias AND m.ent_type = g.ent_type
),
cc_nodes AS (SELECT DISTINCT canonical_id AS node FROM linked),
ov_edges AS MATERIALIZED (
  SELECT DISTINCT a.canonical_id AS src, b.canonical_id AS dst
  FROM linked a JOIN linked b
    ON a.url = b.url AND a.start < b."end" AND b.start < a."end"
   AND a.canonical_id < b.canonical_id
),
sym_edges AS (SELECT src, dst FROM ov_edges UNION SELECT dst AS src, src AS dst FROM ov_edges),
reach(node, comp) AS (
  SELECT node, node AS comp FROM cc_nodes
  UNION
  SELECT e.dst AS node, r.comp FROM reach r JOIN sym_edges e ON e.src = r.node
),
components AS MATERIALIZED (
  SELECT node, MIN(comp) AS component FROM reach GROUP BY node)"""


# Fuzzy alias discovery (long-tail linking): trigram posting-list join
# between out-of-gazetteer corpus tokens and aliases, integer Jaccard.
FUZZY_CTES = f"""
vocab AS (
  SELECT lower(token) AS surface, CAST(COUNT(*) AS BIGINT) AS n_occur
  FROM toks WHERE length(token) >= 3 GROUP BY 1
),
tail AS (
  SELECT v.surface, v.n_occur FROM vocab v
  LEFT JOIN gaz g ON v.surface = g.alias
  WHERE g.alias IS NULL
),
tail_tri AS (
  SELECT DISTINCT surface, substring(surface, CAST(i AS INT), 3) AS tri
  FROM (SELECT surface, unnest(generate_series(1, length(surface) - 2)) AS i
        FROM tail)
),
tail_n AS (SELECT surface, CAST(COUNT(*) AS INT) AS n_tri FROM tail_tri GROUP BY 1),
gaz_tri AS (
  SELECT DISTINCT alias, ent_type, canonical_id,
         substring(alias, CAST(i AS INT), 3) AS tri
  FROM (SELECT alias, ent_type, canonical_id,
               unnest(generate_series(1, length(alias) - 2)) AS i
        FROM gaz)
),
gaz_n AS (SELECT alias, CAST(COUNT(*) AS INT) AS n_gaz_tri FROM gaz_tri GROUP BY 1),
fuzzy_inter AS (
  SELECT t.surface, g.alias, g.ent_type, g.canonical_id,
         CAST(COUNT(*) AS INT) AS n_inter
  FROM tail_tri t JOIN gaz_tri g USING (tri)
  GROUP BY 1, 2, 3, 4
),
fuzzy AS (
  SELECT i.surface, v.n_occur, i.alias, i.ent_type, i.canonical_id,
         i.n_inter,
         CAST(tn.n_tri + gn.n_gaz_tri - i.n_inter AS INT) AS n_union,
         CAST((i.n_inter * 1000000) // (tn.n_tri + gn.n_gaz_tri - i.n_inter) AS BIGINT) AS jaccard_micro6
  FROM fuzzy_inter i
  JOIN tail_n tn ON i.surface = tn.surface
  JOIN gaz_n gn ON i.alias = gn.alias
  JOIN tail v ON i.surface = v.surface
)"""

FUZZY_SELECT = f"""
SELECT surface, n_occur, alias, ent_type, canonical_id, n_inter, n_union,
       jaccard_micro6,
       CAST(ROW_NUMBER() OVER (PARTITION BY surface
            ORDER BY jaccard_micro6 DESC, alias) AS INT) AS cand_rank
FROM fuzzy WHERE jaccard_micro6 >= {MIN_FUZZY_JACCARD_PCT * 10000}"""


def eval_rel_ctes(strict: bool = False) -> str:
    """E2 relation match on arg spans (strict/lenient) + E3 pare-down,
    mirroring operators/evaluate.prf_relations."""
    cond = ("g.hub_start = p.hub_start AND g.hub_end = p.hub_end AND "
            "g.attr_start = p.attr_start AND g.attr_end = p.attr_end"
            if strict else
            "g.hub_start < p.hub_end AND p.hub_start < g.hub_end AND "
            "g.attr_start < p.attr_end AND p.attr_start < g.attr_end")
    return f"""
grel AS (SELECT DISTINCT url, rel_type, hub_start, hub_end, attr_start, attr_end
         FROM relations),
prel AS (SELECT DISTINCT url, rel_type, hub_start, hub_end, attr_start, attr_end
         FROM relations_sys),
rmatch AS (
  SELECT g.url, g.rel_type,
         g.hub_start AS g_hs, g.hub_end AS g_he,
         g.attr_start AS g_as, g.attr_end AS g_ae,
         p.hub_start AS p_hs, p.hub_end AS p_he,
         p.attr_start AS p_as, p.attr_end AS p_ae
  FROM grel g JOIN prel p
    ON g.url = p.url AND g.rel_type = p.rel_type AND {cond}
),
rpared AS (
  SELECT * FROM (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY url, rel_type, p_hs, p_he, p_as, p_ae
        ORDER BY g_hs, g_he, g_as, g_ae) AS _rp
    FROM (
      SELECT *, ROW_NUMBER() OVER (
          PARTITION BY url, rel_type, g_hs, g_he, g_as, g_ae
          ORDER BY p_hs, p_he, p_as, p_ae) AS _rg
      FROM rmatch) WHERE _rg = 1
  ) WHERE _rp = 1
),
rcounts AS (
  SELECT COALESCE(ng.rel_type, np.rel_type) AS rel_type,
         CAST(COALESCE(t.tp, 0) AS BIGINT) AS tp,
         CAST(COALESCE(ng.n_gold, 0) AS BIGINT) AS n_gold,
         CAST(COALESCE(np.n_pred, 0) AS BIGINT) AS n_pred
  FROM (SELECT rel_type, COUNT(*) AS n_gold FROM grel GROUP BY 1) ng
  FULL JOIN (SELECT rel_type, COUNT(*) AS n_pred FROM prel GROUP BY 1) np
    ON ng.rel_type = np.rel_type
  LEFT JOIN (SELECT rel_type, COUNT(*) AS tp FROM rpared GROUP BY 1) t
    ON COALESCE(ng.rel_type, np.rel_type) = t.rel_type
)"""


# Second linking pass: accepted fuzzy aliases (rank-1 at/above the
# acceptance Jaccard) join the gazetteer; mention detection re-runs with
# the expanded dictionary.  Expanded unigram aliases can OVERLAP base
# bigram aliases of the same type, where the island/alternation window
# trick of mention_ctes no longer equals the kernel's greedy
# separator-consumption scan (keep iff start - last_kept_end >= 2) — so
# this oracle runs the exact greedy scan as a per-(doc, type) linear
# recursion over rank-ordered candidates.
SECOND_PASS_CTES = f"""
accepted AS (
  SELECT surface, ent_type, canonical_id FROM (
    SELECT surface, ent_type, canonical_id, alias, jaccard_micro6,
           ROW_NUMBER() OVER (PARTITION BY surface
               ORDER BY jaccard_micro6 DESC, alias) AS cand_rank
    FROM fuzzy WHERE jaccard_micro6 >= {MIN_FUZZY_JACCARD_PCT * 10000})
  WHERE cand_rank = 1
    AND jaccard_micro6 >= {ACCEPT_FUZZY_JACCARD_PCT * 10000}
),
gaz2 AS (
  SELECT alias, ent_type, canonical_id, n FROM gaz
  UNION ALL
  SELECT surface AS alias, ent_type, canonical_id, 1 AS n FROM accepted
),
uni2 AS (
  SELECT t.doc_id, t.url, g.ent_type, t.char_start AS start,
         t.char_end AS "end", t.token AS ent_text
  FROM toks t JOIN gaz2 g ON g.n = 1 AND lower(t.token) = g.alias
  WHERE t.char_start > 0 AND t.char_end < t.text_len
),
bi2 AS (
  SELECT t1.doc_id, t1.url, g.ent_type, t1.char_start AS start,
         t2.char_end AS "end",
         substr(t1.text, t1.char_start + 1, t2.char_end - t1.char_start) AS ent_text
  FROM toks t1
  JOIN toks t2 ON t1.doc_id = t2.doc_id AND t2.tok_idx = t1.tok_idx + 1
              AND t2.char_start = t1.char_end + 1
  JOIN gaz2 g ON g.n = 2 AND lower(t1.token || ' ' || t2.token) = g.alias
  WHERE t1.char_start > 0 AND t2.char_end < t1.text_len
    AND substr(t1.text, t1.char_end + 1, 1) = ' '
),
cand2 AS MATERIALIZED (
  SELECT doc_id, url, ent_type, start, "end", ent_text,
         CAST(ROW_NUMBER() OVER (PARTITION BY doc_id, ent_type
             ORDER BY start, "end") AS INT) AS rn
  FROM (SELECT DISTINCT doc_id, url, ent_type, start, "end", ent_text
        FROM (SELECT * FROM uni2 UNION ALL SELECT * FROM bi2))
),
greedy2(doc_id, url, ent_type, rn, start, "end", ent_text, kept, last_end) AS (
  SELECT doc_id, url, ent_type, rn, start, "end", ent_text,
         TRUE AS kept, "end" AS last_end
  FROM cand2 WHERE rn = 1
  UNION ALL
  SELECT c.doc_id, c.url, c.ent_type, c.rn, c.start, c."end", c.ent_text,
         (c.start - g.last_end >= 2) AS kept,
         CASE WHEN c.start - g.last_end >= 2
              THEN c."end" ELSE g.last_end END AS last_end
  FROM greedy2 g JOIN cand2 c
    ON c.doc_id = g.doc_id AND c.ent_type = g.ent_type AND c.rn = g.rn + 1
)"""

SECOND_PASS_SELECT = """
SELECT doc_id, url,
       'T' || CAST(ROW_NUMBER() OVER (PARTITION BY url
           ORDER BY start, "end", ent_type) AS VARCHAR) AS ent_id,
       ent_type, start, "end", ent_text
FROM greedy2
WHERE kept AND regexp_matches(ent_text, '[0-9A-Za-z]')"""


CURATION_CTES = """
cq AS (
  SELECT doc_id, text,
         len(list_filter(string_split_regex(text, '[\\n \\t]'),
             x -> x <> '')) AS n_tokens,
         len(list_distinct(list_filter(string_split_regex(text, '[\\n \\t]'),
             x -> x <> ''))) AS n_distinct,
         len(list_filter(string_split_regex(text, '[\\n \\t]'),
             x -> lower(x) IN ('the','a','of','and','to','in'))) AS n_stop,
         CASE WHEN doc_id = MIN(doc_id) OVER (PARTITION BY md5(text))
              THEN 1 ELSE 0 END AS is_canonical
  FROM documents),
cr AS (
  SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
         CASE WHEN is_canonical = 0 THEN 'duplicate'
              WHEN n_tokens < 20 THEN 'too_short'
              WHEN n_distinct * 100 < n_tokens * 35 THEN 'low_diversity'
              WHEN 20 * n_stop < n_tokens THEN 'not_english'
              ELSE 'ok' END AS reason
  FROM cq)"""


def decontam_ctes(k: int = 8) -> str:
    """Shared CTE block: split + k-gram shingles + train/test
    contamination hits + per-train-doc totals."""
    shingle = ' || '.join(
        "' '" if i % 2 else f"l{i // 2}" for i in range(2 * k - 1))
    leads = ', '.join(f"LEAD(tok, {i}) OVER w AS l{i}" for i in range(1, k))
    return f"""
dsplit AS (
  SELECT doc_id,
         CASE WHEN bucket < 204 THEN 'train'
              WHEN bucket < 230 THEN 'dev' ELSE 'test' END AS split
  FROM (
    SELECT doc_id,
           CAST(16 * (instr('0123456789abcdef',
                    substr(md5(CAST(doc_id AS VARCHAR)), 31, 1)) - 1)
              + (instr('0123456789abcdef',
                    substr(md5(CAST(doc_id AS VARCHAR)), 32, 1)) - 1) AS INT)
             AS bucket
    FROM documents)
),
dtoks AS (
  SELECT doc_id, tok,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY piece_idx) AS pos
  FROM (SELECT doc_id,
               unnest(string_split_regex(text, '[\\n \\t]')) AS tok,
               generate_subscripts(string_split_regex(text, '[\\n \\t]'), 1)
                 AS piece_idx
        FROM documents)
  WHERE tok <> ''
),
dsh AS (
  SELECT DISTINCT doc_id, {shingle} AS shingle
  FROM (SELECT doc_id, tok AS l0, {leads}
        FROM dtoks WINDOW w AS (PARTITION BY doc_id ORDER BY pos))
  WHERE l{k - 1} IS NOT NULL
),
tr_sh AS (SELECT s.doc_id, s.shingle FROM dsh s
          JOIN dsplit p USING (doc_id) WHERE p.split = 'train'),
te_sh AS (SELECT s.doc_id AS test_doc, s.shingle FROM dsh s
          JOIN dsplit p USING (doc_id) WHERE p.split = 'test'),
dhits AS (
  SELECT t.doc_id,
         CAST(COUNT(DISTINCT t.shingle) AS BIGINT) AS n_contaminated,
         CAST(COUNT(DISTINCT e.test_doc) AS BIGINT) AS n_test_docs
  FROM tr_sh t JOIN te_sh e USING (shingle) GROUP BY 1),
dtot AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_ngrams
         FROM tr_sh GROUP BY 1)"""


def eval_span_ctes(strict: bool = True) -> str:
    cond = ('g.start = p.start AND g."end" = p."end"' if strict
            else 'g.start < p."end" AND p.start < g."end"')
    return EVAL_SPAN_TMPL.replace("{MATCH_COND}", cond)


EVAL_SPAN_TMPL = """
matches AS (
  SELECT g.url, g.ent_type, g.start AS g_start, g."end" AS g_end,
         p.start AS p_start, p."end" AS p_end
  FROM mentions g JOIN mentions_sys p
    ON g.url = p.url AND g.ent_type = p.ent_type
   AND {MATCH_COND}
),
pared AS (
  SELECT * FROM (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY url, ent_type, p_start, p_end ORDER BY g_start, g_end) AS _rp
    FROM (
      SELECT *, ROW_NUMBER() OVER (
          PARTITION BY url, ent_type, g_start, g_end ORDER BY p_start, p_end) AS _rg
      FROM matches) WHERE _rg = 1
  ) WHERE _rp = 1
),
counts AS (
  SELECT COALESCE(ng.ent_type, np.ent_type) AS ent_type,
         CAST(COALESCE(t.tp, 0) AS BIGINT) AS tp,
         CAST(COALESCE(ng.n_gold, 0) AS BIGINT) AS n_gold,
         CAST(COALESCE(np.n_pred, 0) AS BIGINT) AS n_pred
  FROM (SELECT ent_type, COUNT(*) AS n_gold FROM mentions GROUP BY 1) ng
  FULL JOIN (SELECT ent_type, COUNT(*) AS n_pred FROM mentions_sys GROUP BY 1) np
    ON ng.ent_type = np.ent_type
  LEFT JOIN (SELECT ent_type, COUNT(*) AS tp FROM pared GROUP BY 1) t
    ON COALESCE(ng.ent_type, np.ent_type) = t.ent_type
)"""

PRF_SELECT = """
SELECT {dims} tp, n_gold, n_pred,
       CAST(n_pred - tp AS BIGINT) AS fp,
       CAST(n_gold - tp AS BIGINT) AS fn,
       CAST(floor((CASE WHEN n_pred > 0 THEN tp / n_pred ELSE 0 END) * 1000000) AS BIGINT) AS p_micro6,
       CAST(floor((CASE WHEN n_gold > 0 THEN tp / n_gold ELSE 0 END) * 1000000) AS BIGINT) AS r_micro6,
       CAST(floor((CASE WHEN (CASE WHEN n_pred > 0 THEN tp / n_pred ELSE 0 END)
                           + (CASE WHEN n_gold > 0 THEN tp / n_gold ELSE 0 END) > 0
                   THEN 2 * (CASE WHEN n_pred > 0 THEN tp / n_pred ELSE 0 END)
                          * (CASE WHEN n_gold > 0 THEN tp / n_gold ELSE 0 END)
                          / ((CASE WHEN n_pred > 0 THEN tp / n_pred ELSE 0 END)
                           + (CASE WHEN n_gold > 0 THEN tp / n_gold ELSE 0 END))
                   ELSE 0 END) * 1000000) AS BIGINT) AS f1_micro6,
       CAST(0 AS BIGINT) AS tn,
       CAST(0 AS BIGINT) AS specificity_micro6,
       CAST(floor(((CASE WHEN n_gold > 0 THEN tp / n_gold ELSE 0 END) + 0.0)
                  / 2 * 1000000) AS BIGINT) AS auc_micro6
FROM {src}"""


from ..config import (JACCARD_THRESHOLD_PCT, LSH_BANDS, MINHASH_PERMS,
                      SHINGLE_K, SIMHASH_BITS, STOPWORDS, TOPK_NEIGHBORS,
                      ANN_SIGN_BITS)

# Candidate-generation half (through `cand`) named separately so the
# weighted_jaccard oracle can compose it WITHOUT slicing the assembled
# near_duplicates SQL at a magic CTE-name literal (ADVICE r05 item 4).
# DEDUP_CTES is the byte-identical concatenation of the two halves.
DEDUP_CAND_CTES = f"""
sh AS (
  SELECT DISTINCT doc_id, token || ' ' || t1 || ' ' || t2 AS shingle
  FROM (SELECT doc_id, token,
          LEAD(token, 1) OVER (PARTITION BY doc_id ORDER BY tok_idx) AS t1,
          LEAD(token, 2) OVER (PARTITION BY doc_id ORDER BY tok_idx) AS t2
        FROM toks)
  WHERE t1 IS NOT NULL AND t2 IS NOT NULL
),
mh AS (
  SELECT doc_id, seed,
         MIN(md5(CAST(seed AS VARCHAR) || ':' || shingle)) AS minhash
  FROM sh CROSS JOIN (SELECT unnest(range({MINHASH_PERMS})) AS seed)
  GROUP BY doc_id, seed
),
bands AS (
  SELECT doc_id, CAST(seed // {MINHASH_PERMS // LSH_BANDS} AS INT) AS band,
         md5(string_agg(CAST(seed AS VARCHAR) || ':' || minhash, '|'
             ORDER BY CAST(seed AS VARCHAR) || ':' || minhash)) AS band_sig
  FROM mh GROUP BY doc_id, CAST(seed // {MINHASH_PERMS // LSH_BANDS} AS INT)
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.band_sig = b.band_sig AND a.doc_id < b.doc_id
),
"""

DEDUP_VERIFY_CTES = """sh_sizes AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_sh FROM sh GROUP BY doc_id),
inter AS (
  SELECT c.doc_a, c.doc_b, CAST(COUNT(*) AS BIGINT) AS n_inter
  FROM cand c
  JOIN sh x ON x.doc_id = c.doc_a
  JOIN sh y ON y.doc_id = c.doc_b AND y.shingle = x.shingle
  GROUP BY c.doc_a, c.doc_b
),
near_dups AS (
  SELECT c.doc_a, c.doc_b, COALESCE(i.n_inter, 0) AS n_inter,
         CAST(sa.n_sh + sb.n_sh - COALESCE(i.n_inter, 0) AS BIGINT) AS n_union,
         CAST(floor(100 * COALESCE(i.n_inter, 0) /
              (sa.n_sh + sb.n_sh - COALESCE(i.n_inter, 0))) AS BIGINT) AS jaccard_pct
  FROM cand c
  JOIN sh_sizes sa ON sa.doc_id = c.doc_a
  JOIN sh_sizes sb ON sb.doc_id = c.doc_b
  LEFT JOIN inter i ON i.doc_a = c.doc_a AND i.doc_b = c.doc_b
)"""

DEDUP_CTES = DEDUP_CAND_CTES + DEDUP_VERIFY_CTES

SIMHASH_CTES = f"""
simt AS (SELECT doc_id, md5(token) AS h FROM toks),
votes AS (
  SELECT doc_id, b,
         SUM(CASE WHEN ((instr('0123456789abcdef',
                  substr(h, CAST(b // 4 AS INT) + 1, 1)) - 1) >> CAST(b % 4 AS INT)) & 1 = 1
                  THEN 1 ELSE -1 END) AS v
  FROM simt CROSS JOIN (SELECT unnest(range({SIMHASH_BITS})) AS b)
  GROUP BY doc_id, b
)"""

_STOP_IN = ", ".join(f"'{s}'" for s in STOPWORDS)

QUALITY_CTES = f"""
qual AS (
  SELECT d.doc_id,
         CAST(COALESCE(t.n_tokens, 0) AS BIGINT) AS n_tokens,
         CAST(length(d.text) AS BIGINT) AS n_chars,
         CAST(COALESCE(t.n_distinct_tokens, 0) AS BIGINT) AS n_distinct_tokens,
         CAST(COALESCE(t.n_stopwords, 0) AS BIGINT) AS n_stopwords,
         CAST(COALESCE(floor(100.0 * t.sum_len / t.n_tokens), 0) AS BIGINT) AS avg_token_len_x100
  FROM documents d LEFT JOIN (
    SELECT doc_id, COUNT(*) AS n_tokens, COUNT(DISTINCT token) AS n_distinct_tokens,
           SUM(CASE WHEN lower(token) IN ({_STOP_IN}) THEN 1 ELSE 0 END) AS n_stopwords,
           SUM(length(token)) AS sum_len
    FROM toks GROUP BY doc_id) t ON d.doc_id = t.doc_id
)"""

SIM_CTES = f"""
base AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
normed AS (
  SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM base
)"""


def _assemble(*blocks: str, select: str) -> str:
    body = ",".join(b for b in blocks if b)
    return f"WITH RECURSIVE {body}\n{select}"


GAZ = gaz_values("gaz", GAZETTEER)
GAZ_SYS = gaz_values("gaz_sys", perturbed_gazetteer())
BASE = GAZ + "," + toks_ctes() + "," + mention_ctes("gaz")
SYS = GAZ_SYS + "," + mention_ctes("gaz_sys", sfx="_sys")


def _q(select: str, *extra: str) -> str:
    return _assemble(BASE, *extra, select=select)


def _pagerank_sql(n_iter: int = 5, damping_pct: int = 85,
                  scale: int = 10**12) -> str:
    """Exact oracle for graph_algos.pagerank_fixed: the fixed-round
    integer recurrence unrolled as chained CTEs (pr0 -> pr{n_iter}).
    Every quantity is BIGINT and every division floors, so this matches
    the Spark side bit-exactly regardless of summation order."""
    base_u = f"(SELECT ((({100 - damping_pct} * {scale}) // 100)) // n FROM gcnt)"
    rounds = []
    prev = "pr0"
    for i in range(1, n_iter + 1):
        rounds.append(f"""
d{i} AS MATERIALIZED (
  SELECT CAST(COALESCE(SUM(r.rank_u), 0) AS BIGINT) AS dang
  FROM {prev} r WHERE r.node NOT IN (SELECT src FROM gout)),
pr{i} AS MATERIALIZED (
  SELECT n2.node,
         CAST({base_u}
              + (({damping_pct} * (COALESCE(c.in_u, 0)
                   + (SELECT (SELECT dang FROM d{i}) // n FROM gcnt))) // 100)
           AS BIGINT) AS rank_u
  FROM gn n2 LEFT JOIN (
    SELECT e.obj_node AS node,
           CAST(SUM((r.rank_u * e.weight) // o.out_w) AS BIGINT) AS in_u
    FROM ge e JOIN gout o ON e.subj_node = o.src
    JOIN {prev} r ON r.node = e.subj_node
    GROUP BY 1) c ON n2.node = c.node)""")
        prev = f"pr{i}"
    return f"""
, ge AS MATERIALIZED (
  -- one edge ROW per (subj, pred, obj) exactly like graph_edges: the
  -- Spark side floors (rank_u * w) // out_w per edge row, so pred-split
  -- parallel edges must NOT be collapsed here
  SELECT s.component AS subj_node, t.pred,
         COALESCE(oc.component, COALESCE(og.canonical_id, 'surface:' || lower(t.obj))) AS obj_node,
         CAST(COUNT(*) AS BIGINT) AS weight
  FROM triples t
  JOIN linked l ON t.url = l.url AND t.subj_id = l.ent_id
  JOIN components s ON l.canonical_id = s.node
  LEFT JOIN gaz og ON lower(t.obj) = og.alias
  LEFT JOIN components oc
         ON COALESCE(og.canonical_id, 'surface:' || lower(t.obj)) = oc.node
  GROUP BY 1, 2, 3),
gn AS MATERIALIZED (
  -- explicit DISTINCT: UNION inside a WITH RECURSIVE + MATERIALIZED
  -- block behaved as UNION ALL here (observed DuckDB 1.x)
  SELECT DISTINCT node FROM (
    SELECT subj_node AS node FROM ge UNION ALL SELECT obj_node FROM ge)),
gcnt AS MATERIALIZED (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM gn),
gout AS MATERIALIZED (
  SELECT subj_node AS src, CAST(SUM(weight) AS BIGINT) AS out_w
  FROM ge GROUP BY 1),
pr0 AS MATERIALIZED (
  SELECT node, CAST((SELECT {scale} // n FROM gcnt) AS BIGINT) AS rank_u
  FROM gn),{",".join(rounds)}
SELECT node, CAST(rank_u // 1000000 AS BIGINT) AS rank_micro6 FROM {prev}"""


def _ppr_sql(n_iter: int = 5, damping_pct: int = 85,
             scale: int = 10**12) -> str:
    """Exact oracle for graph_algos.ppr_fixed: personalized PageRank
    from the lexicographically smallest graph node (the same seed rule
    graph_bfs uses), fixed rounds unrolled as chained CTEs.  All-BIGINT
    arithmetic with floor divisions on non-negative values — matches
    the Spark side bit-exactly.  Reuses _pagerank_sql's graph prelude
    (ge/gn/gcnt/gout) by slicing it off that generator, so the two
    oracles can never drift apart on graph construction."""
    restart = ((100 - damping_pct) * scale) // 100
    seed = "(SELECT MIN(node) FROM gn)"
    rounds = []
    prev = "ppr0"
    for i in range(1, n_iter + 1):
        rounds.append(f"""
pd{i} AS MATERIALIZED (
  SELECT CAST(COALESCE(SUM(r.rank_u), 0) AS BIGINT) AS dang
  FROM {prev} r WHERE r.node NOT IN (SELECT src FROM gout)),
ppr{i} AS MATERIALIZED (
  SELECT n2.node,
         CAST(CASE WHEN n2.node = {seed} THEN {restart} ELSE 0 END
              + (({damping_pct} * (COALESCE(c.in_u, 0)
                   + CASE WHEN n2.node = {seed}
                          THEN (SELECT dang FROM pd{i}) ELSE 0 END)) // 100)
           AS BIGINT) AS rank_u
  FROM gn n2 LEFT JOIN (
    SELECT e.obj_node AS node,
           CAST(SUM((r.rank_u * e.weight) // o.out_w) AS BIGINT) AS in_u
    FROM ge e JOIN gout o ON e.subj_node = o.src
    JOIN {prev} r ON r.node = e.subj_node
    GROUP BY 1) c ON n2.node = c.node)""")
        prev = f"ppr{i}"
    # graph prelude = everything in _pagerank_sql up to (excluding) pr0
    prelude = _pagerank_sql(n_iter=1).split("pr0 AS MATERIALIZED")[0].rstrip()
    assert prelude.endswith(","), "prelude slice must end at a CTE comma"
    return f"""{prelude}
ppr0 AS MATERIALIZED (
  SELECT node, CAST(CASE WHEN node = {seed} THEN {scale} ELSE 0 END AS BIGINT) AS rank_u
  FROM gn),{",".join(rounds)}
SELECT node, CAST(rank_u // 1000000 AS BIGINT) AS rank_micro6 FROM {prev}"""


ORACLE: dict[str, str] = {
    "extract_text": _q(
        "SELECT doc_id, url, sha256(text) AS text_sha, CAST(length(text) AS INT) AS n_chars FROM pages"),
    "tokenize": _q(
        "SELECT doc_id, url, tok_idx, token, char_start, char_end FROM toks"),
    "shards": _q(
        "SELECT doc_id, url, shard_id, tok_start, tok_end, char_start, char_end, "
        "re_start, re_end, n_tokens FROM shards"),
    "mentions": _q(
        'SELECT doc_id, url, ent_id, ent_type, start, "end", ent_text FROM mentions'),
    "candidates": _q(
        "SELECT doc_id, url, shard_id, rel_id, rel_type, hub_id, hub_text, hub_start, hub_end, "
        "attr_id, attr_type, attr_text, attr_start, attr_end, gap FROM candidates"),
    "relations": _q(
        "SELECT doc_id, url, rel_id, rel_type, hub_id, attr_id, gap FROM relations"),
    "triples": _q(
        "SELECT doc_id, url, subj_id, subj, pred, obj FROM triples"),
    # the fused single-pass path must satisfy the SAME oracle
    "relations_fused": _q(
        "SELECT doc_id, url, rel_id, rel_type, hub_id, attr_id, gap FROM relations"),
    "triples_fused": _q(
        "SELECT doc_id, url, subj_id, subj, pred, obj FROM triples"),
    "wide_table": _q(
        "SELECT url, subj_id, subj, pred, string_agg(obj, chr(10) ORDER BY obj) AS obj_texts, "
        "CAST(COUNT(*) AS BIGINT) AS n_objs FROM triples GROUP BY url, subj_id, subj, pred"),
    "distinct_subjects": _q(
        "SELECT DISTINCT url, subj_id, subj FROM triples"),
    "link_mentions": _q(
        'SELECT doc_id, url, ent_id, ent_type, start, "end", ent_text, canonical_id FROM linked',
        LINK_CTES),
    "canonical_components": _q(
        "SELECT node, component FROM components", LINK_CTES),
    "fuzzy_alias_candidates": _q(FUZZY_SELECT, FUZZY_CTES),
    "mentions_second_pass": _q(SECOND_PASS_SELECT, FUZZY_CTES,
                               SECOND_PASS_CTES),
    "graph_nodes": _q(
        "SELECT l.canonical_id, c.component, MIN(l.ent_type) AS ent_type, "
        "CAST(COUNT(*) AS BIGINT) AS n_mentions "
        "FROM linked l JOIN components c ON l.canonical_id = c.node "
        "GROUP BY l.canonical_id, c.component",
        LINK_CTES),
    "graph_edges": _q(
        """SELECT s.component AS subj_node, t.pred,
       COALESCE(oc.component, COALESCE(og.canonical_id, 'surface:' || lower(t.obj))) AS obj_node,
       CAST(COUNT(*) AS BIGINT) AS weight
FROM triples t
JOIN linked l ON t.url = l.url AND t.subj_id = l.ent_id
JOIN components s ON l.canonical_id = s.node
LEFT JOIN gaz og ON lower(t.obj) = og.alias
LEFT JOIN components oc
       ON COALESCE(og.canonical_id, 'surface:' || lower(t.obj)) = oc.node
GROUP BY 1, 2, 3""",
        LINK_CTES),
    "eval_mentions": _assemble(
        BASE, SYS, eval_span_ctes(True),
        select=PRF_SELECT.format(dims="ent_type, ", src="counts")),
    "eval_mentions_micro": _assemble(
        BASE, SYS, eval_span_ctes(True),
        select=PRF_SELECT.format(
            dims="",
            src="(SELECT CAST(SUM(tp) AS BIGINT) AS tp, CAST(SUM(n_gold) AS BIGINT) AS n_gold, "
                "CAST(SUM(n_pred) AS BIGINT) AS n_pred FROM counts)")),
    "iob2_labels": _q(
        """
SELECT t.doc_id, t.url, t.tok_idx, t.token,
       CASE WHEN c.ent_type IS NULL THEN 'O'
            WHEN t.char_start = c.first_ts THEN 'B-' || c.ent_type
            ELSE 'I-' || c.ent_type END AS label
FROM toks t LEFT JOIN (
  SELECT * FROM (
    SELECT t2.doc_id, t2.tok_idx, m.ent_type, m.first_ts,
           ROW_NUMBER() OVER (PARTITION BY t2.doc_id, t2.tok_idx
               ORDER BY m.start DESC, m."end" DESC) AS rn
    FROM toks t2 JOIN (
      SELECT m0.doc_id, m0.ent_type, m0.start, m0."end",
             MIN(t3.char_start) AS first_ts
      FROM mentions m0 JOIN toks t3
        ON t3.doc_id = m0.doc_id
       AND t3.char_start >= m0.start AND t3.char_end <= m0."end"
      GROUP BY m0.doc_id, m0.ent_type, m0.start, m0."end") m
      ON t2.doc_id = m.doc_id
     AND t2.char_start >= m.start AND t2.char_end <= m."end")
  WHERE rn = 1) c
ON t.doc_id = c.doc_id AND t.tok_idx = c.tok_idx"""),
    # model-NER path (IOB2 labels -> chunk decode -> char spans): the
    # SQL mirrors decode_chunks incl. the I-after-O chunk start and the
    # type-change boundary; end-of-seq closure is implicit (chunks are
    # groups of contiguous labeled tokens)
    "mentions_model": _q(
        """
, lab AS (
  SELECT t.doc_id, t.url, t.tok_idx, t.char_start, t.char_end, t.text,
         CASE WHEN c.ent_type IS NULL THEN 'O'
              WHEN t.char_start = c.first_ts THEN 'B-' || c.ent_type
              ELSE 'I-' || c.ent_type END AS label
  FROM toks t LEFT JOIN (
    SELECT * FROM (
      SELECT t2.doc_id, t2.tok_idx, m.ent_type, m.first_ts,
             ROW_NUMBER() OVER (PARTITION BY t2.doc_id, t2.tok_idx
                 ORDER BY m.start DESC, m."end" DESC) AS rn
      FROM toks t2 JOIN (
        SELECT m0.doc_id, m0.ent_type, m0.start, m0."end",
               MIN(t3.char_start) AS first_ts
        FROM mentions m0 JOIN toks t3
          ON t3.doc_id = m0.doc_id
         AND t3.char_start >= m0.start AND t3.char_end <= m0."end"
        GROUP BY m0.doc_id, m0.ent_type, m0.start, m0."end") m
        ON t2.doc_id = m.doc_id
       AND t2.char_start >= m.start AND t2.char_end <= m."end")
    WHERE rn = 1) c
  ON t.doc_id = c.doc_id AND t.tok_idx = c.tok_idx
),
lab2 AS (
  SELECT *, substr(label, 1, 1) AS tag, substr(label, 3) AS ltype,
         LAG(label) OVER (PARTITION BY doc_id ORDER BY tok_idx) AS prev
  FROM lab
),
chunk_toks AS (
  SELECT *, CASE WHEN tag = 'B' OR prev IS NULL OR prev = 'O'
                   OR substr(prev, 3) <> ltype THEN 1 ELSE 0 END AS is_start
  FROM lab2 WHERE label <> 'O'
),
chunked AS (
  SELECT *, SUM(is_start) OVER (PARTITION BY doc_id ORDER BY tok_idx
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS chunk_id
  FROM chunk_toks
),
spans AS (
  SELECT doc_id, url, MIN(ltype) AS ent_type,
         CAST(MIN(char_start) AS INT) AS start,
         CAST(MAX(char_end) AS INT) AS "end",
         substr(MIN(text), MIN(char_start) + 1,
                MAX(char_end) - MIN(char_start)) AS ent_text
  FROM chunked GROUP BY doc_id, url, chunk_id
)
SELECT doc_id, url,
       'T' || CAST(ROW_NUMBER() OVER (
           PARTITION BY url ORDER BY start, "end", ent_type) AS VARCHAR) AS ent_id,
       ent_type, start, "end", ent_text
FROM spans"""),
    "host_stats": _q(
        """
SELECT host, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(SUM(n_mentions) AS BIGINT) AS n_mentions,
       CAST(SUM(n_triples) AS BIGINT) AS n_triples
FROM (
  SELECT p.doc_id,
         split_part(split_part(p.url, '//', 2), '/', 1) AS host,
         (SELECT COUNT(*) FROM mentions m WHERE m.doc_id = p.doc_id) AS n_mentions,
         (SELECT COUNT(*) FROM triples t WHERE t.doc_id = p.doc_id) AS n_triples
  FROM pages p)
GROUP BY host"""),
    "graph_degrees": _q(
        """
, ge AS (
  SELECT s.component AS subj_node, t.pred,
         COALESCE(oc.component, COALESCE(og.canonical_id, 'surface:' || lower(t.obj))) AS obj_node,
         CAST(COUNT(*) AS BIGINT) AS weight
  FROM triples t
  JOIN linked l ON t.url = l.url AND t.subj_id = l.ent_id
  JOIN components s ON l.canonical_id = s.node
  LEFT JOIN gaz og ON lower(t.obj) = og.alias
  LEFT JOIN components oc
         ON COALESCE(og.canonical_id, 'surface:' || lower(t.obj)) = oc.node
  GROUP BY 1, 2, 3)
SELECT node,
       CAST(COALESCE(o.out_deg, 0) AS BIGINT) AS out_deg,
       CAST(COALESCE(i.in_deg, 0) AS BIGINT) AS in_deg,
       CAST(COALESCE(o.out_w, 0) AS BIGINT) AS out_weight,
       CAST(COALESCE(i.in_w, 0) AS BIGINT) AS in_weight
FROM (SELECT subj_node AS node FROM ge UNION SELECT obj_node FROM ge) n
LEFT JOIN (SELECT subj_node, COUNT(*) AS out_deg, SUM(weight) AS out_w
           FROM ge GROUP BY subj_node) o ON n.node = o.subj_node
LEFT JOIN (SELECT obj_node, COUNT(*) AS in_deg, SUM(weight) AS in_w
           FROM ge GROUP BY obj_node) i ON n.node = i.obj_node""",
        LINK_CTES),
    # the KG is bipartite (Topic -> Attr), so directed 2-paths are empty;
    # the meaningful 2-hop is Topic~Topic via a shared attribute node
    "component_sizes": _q(
        """
SELECT size, CAST(COUNT(*) AS BIGINT) AS n_components
FROM (SELECT component, CAST(COUNT(*) AS BIGINT) AS size
      FROM components GROUP BY 1)
GROUP BY size""",
        LINK_CTES),
    "related_topics": _q(
        """
, ge AS (
  SELECT s.component AS subj_node,
         COALESCE(oc.component, COALESCE(og.canonical_id, 'surface:' || lower(t.obj))) AS obj_node
  FROM triples t
  JOIN linked l ON t.url = l.url AND t.subj_id = l.ent_id
  JOIN components s ON l.canonical_id = s.node
  LEFT JOIN gaz og ON lower(t.obj) = og.alias
  LEFT JOIN components oc
         ON COALESCE(og.canonical_id, 'surface:' || lower(t.obj)) = oc.node
  GROUP BY 1, 2)
SELECT a.subj_node AS topic_a, b.subj_node AS topic_b,
       CAST(COUNT(*) AS BIGINT) AS n_shared
FROM ge a JOIN ge b ON a.obj_node = b.obj_node
WHERE a.subj_node < b.subj_node
GROUP BY a.subj_node, b.subj_node""",
        LINK_CTES),
    # BFS hop distances — iterative in Spark, exact bounded recursive
    # CTE in DuckDB (the stronger check for an iterative operator)
    "triples_daily": _q(
        """
SELECT CAST((1704067200 + t.doc_id) // 86400 AS INT) AS day_idx,
       t.pred,
       CAST(COUNT(*) AS BIGINT) AS n_triples,
       CAST(COUNT(DISTINCT t.url) AS BIGINT) AS n_pages,
       CAST(COUNT(DISTINCT t.subj) AS BIGINT) AS n_subjects
FROM triples t
GROUP BY 1, 2"""),
    "graph_bfs": _q(
        """
, ge2 AS MATERIALIZED (
  SELECT s.component AS subj_node,
         COALESCE(oc.component, COALESCE(og.canonical_id, 'surface:' || lower(t.obj))) AS obj_node
  FROM triples t
  JOIN linked l ON t.url = l.url AND t.subj_id = l.ent_id
  JOIN components s ON l.canonical_id = s.node
  LEFT JOIN gaz og ON lower(t.obj) = og.alias
  LEFT JOIN components oc
         ON COALESCE(og.canonical_id, 'surface:' || lower(t.obj)) = oc.node
  GROUP BY 1, 2),
gnodes AS MATERIALIZED (
  SELECT subj_node AS node FROM ge2 UNION SELECT obj_node FROM ge2),
gsym AS MATERIALIZED (
  SELECT subj_node AS src, obj_node AS dst FROM ge2 WHERE subj_node <> obj_node
  UNION
  SELECT obj_node, subj_node FROM ge2 WHERE subj_node <> obj_node),
bfs(node, d) AS (
  SELECT (SELECT MIN(node) FROM gnodes) AS node, 0 AS d
  UNION
  SELECT e.dst, b.d + 1 FROM bfs b JOIN gsym e ON e.src = b.node
  WHERE b.d < (SELECT COUNT(*) FROM gnodes))
SELECT node, CAST(MIN(d) AS INT) AS dist FROM bfs GROUP BY node""",
        LINK_CTES),
    "pagerank": _q(_pagerank_sql(), LINK_CTES),
    "graph_ppr": _q(_ppr_sql(), LINK_CTES),
    "candidates_labeled": _assemble(
        BASE, SYS,
        select="""
SELECT c.doc_id, c.url, c.rel_id, c.rel_type, c.gap,
       CAST(CASE WHEN g.url IS NOT NULL THEN 1 ELSE 0 END AS INT) AS label
FROM candidates c LEFT JOIN (
  SELECT DISTINCT url, rel_type,
         least(hub_start, attr_start) AS lo_start,
         least(hub_end, attr_end) AS lo_end,
         greatest(hub_start, attr_start) AS hi_start,
         greatest(hub_end, attr_end) AS hi_end
  FROM relations_sys) g
ON c.url = g.url AND c.rel_type = g.rel_type
 AND least(c.hub_start, c.attr_start) = g.lo_start
 AND least(c.hub_end, c.attr_end) = g.lo_end
 AND greatest(c.hub_start, c.attr_start) = g.hi_start
 AND greatest(c.hub_end, c.attr_end) = g.hi_end"""),
    "eval_re_accuracy": _assemble(
        BASE, SYS,
        select=f"""
, labeled AS (
  SELECT c.gap,
         CAST(CASE WHEN g.url IS NOT NULL THEN 1 ELSE 0 END AS INT) AS label,
         CAST(CASE WHEN c.gap <= {MAX_PAIR_GAP_CHARS} THEN 1 ELSE 0 END AS INT) AS pred
  FROM candidates c LEFT JOIN (
    SELECT DISTINCT url, rel_type,
           least(hub_start, attr_start) AS lo_start,
           least(hub_end, attr_end) AS lo_end,
           greatest(hub_start, attr_start) AS hi_start,
           greatest(hub_end, attr_end) AS hi_end
    FROM relations_sys) g
  ON c.url = g.url AND c.rel_type = g.rel_type
   AND least(c.hub_start, c.attr_start) = g.lo_start
   AND least(c.hub_end, c.attr_end) = g.lo_end
   AND greatest(c.hub_start, c.attr_start) = g.hi_start
   AND greatest(c.hub_end, c.attr_end) = g.hi_end),
conf AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN label = 1 AND pred = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
         CAST(SUM(CASE WHEN label = 0 AND pred = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tn,
         CAST(SUM(CASE WHEN pred = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_pred,
         CAST(SUM(CASE WHEN label = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_gold
  FROM labeled)
SELECT n, tp, tn, n_pred, n_gold,
       CAST(n_pred - tp AS BIGINT) AS fp,
       CAST(n_gold - tp AS BIGINT) AS fn,
       CAST(floor((CASE WHEN n_pred > 0 THEN tp / n_pred ELSE 0 END) * 1000000) AS BIGINT) AS p_micro6,
       CAST(floor((CASE WHEN n_gold > 0 THEN tp / n_gold ELSE 0 END) * 1000000) AS BIGINT) AS r_micro6,
       CAST(floor((CASE WHEN (CASE WHEN n_pred > 0 THEN tp / n_pred ELSE 0 END)
                           + (CASE WHEN n_gold > 0 THEN tp / n_gold ELSE 0 END) > 0
                   THEN 2 * (CASE WHEN n_pred > 0 THEN tp / n_pred ELSE 0 END)
                          * (CASE WHEN n_gold > 0 THEN tp / n_gold ELSE 0 END)
                          / ((CASE WHEN n_pred > 0 THEN tp / n_pred ELSE 0 END)
                           + (CASE WHEN n_gold > 0 THEN tp / n_gold ELSE 0 END))
                   ELSE 0 END) * 1000000) AS BIGINT) AS f1_micro6,
       CAST(floor((CASE WHEN (n_pred - tp + tn) > 0
                   THEN tn / (n_pred - tp + tn) ELSE 0 END) * 1000000) AS BIGINT)
         AS specificity_micro6,
       CAST(floor(((CASE WHEN n_gold > 0 THEN tp / n_gold ELSE 0 END)
                 + (CASE WHEN (n_pred - tp + tn) > 0
                    THEN tn / (n_pred - tp + tn) ELSE 0 END))
                  / 2 * 1000000) AS BIGINT) AS auc_micro6,
       CAST(floor((tp + tn) / n * 1000000) AS BIGINT) AS acc_micro6,
       CAST(floor(((tp + tn) / n
                 + (CASE WHEN (CASE WHEN n_pred > 0 THEN tp / n_pred ELSE 0 END)
                           + (CASE WHEN n_gold > 0 THEN tp / n_gold ELSE 0 END) > 0
                    THEN 2 * (CASE WHEN n_pred > 0 THEN tp / n_pred ELSE 0 END)
                           * (CASE WHEN n_gold > 0 THEN tp / n_gold ELSE 0 END)
                           / ((CASE WHEN n_pred > 0 THEN tp / n_pred ELSE 0 END)
                            + (CASE WHEN n_gold > 0 THEN tp / n_gold ELSE 0 END))
                    ELSE 0 END)) / 2 * 1000000) AS BIGINT) AS acc_and_f1_micro6
FROM conf"""),
    "candidates_sampled": _assemble(
        BASE, SYS,
        select="""
SELECT url, rel_id, rel_type, label FROM (
  SELECT c.url, c.rel_id, c.rel_type,
         CAST(CASE WHEN g.url IS NOT NULL THEN 1 ELSE 0 END AS INT) AS label
  FROM candidates c LEFT JOIN (
    SELECT DISTINCT url, rel_type,
           least(hub_start, attr_start) AS lo_start,
           least(hub_end, attr_end) AS lo_end,
           greatest(hub_start, attr_start) AS hi_start,
           greatest(hub_end, attr_end) AS hi_end
    FROM relations_sys) g
  ON c.url = g.url AND c.rel_type = g.rel_type
   AND least(c.hub_start, c.attr_start) = g.lo_start
   AND least(c.hub_end, c.attr_end) = g.lo_end
   AND greatest(c.hub_start, c.attr_start) = g.hi_start
   AND greatest(c.hub_end, c.attr_end) = g.hi_end)
WHERE label = 1
   OR (16 * (instr('0123456789abcdef',
            substr(md5(url || ':' || rel_id || ':' || rel_type), 31, 1)) - 1)
       + (instr('0123456789abcdef',
            substr(md5(url || ':' || rel_id || ':' || rel_type), 32, 1)) - 1)) < 64"""),
    "candidates_balanced": _assemble(
        BASE, SYS,
        select="""
SELECT url, rel_id, rel_type, label, class_rank FROM (
  SELECT url, rel_id, rel_type, label,
         CAST(ROW_NUMBER() OVER (PARTITION BY rel_type, label
              ORDER BY md5(url || ':' || rel_id)) AS INT) AS class_rank
  FROM (
    SELECT c.url, c.rel_id, c.rel_type,
           CAST(CASE WHEN g.url IS NOT NULL THEN 1 ELSE 0 END AS INT) AS label
    FROM candidates c LEFT JOIN (
      SELECT DISTINCT url, rel_type,
             least(hub_start, attr_start) AS lo_start,
             least(hub_end, attr_end) AS lo_end,
             greatest(hub_start, attr_start) AS hi_start,
             greatest(hub_end, attr_end) AS hi_end
      FROM relations_sys) g
    ON c.url = g.url AND c.rel_type = g.rel_type
     AND least(c.hub_start, c.attr_start) = g.lo_start
     AND least(c.hub_end, c.attr_end) = g.lo_end
     AND greatest(c.hub_start, c.attr_start) = g.hi_start
     AND greatest(c.hub_end, c.attr_end) = g.hi_end))
WHERE class_rank <= 50"""),
    "dedup_exact": (
        "SELECT doc_id, md5(text) AS text_md5,\n"
        "  CAST(COUNT(*) OVER (PARTITION BY md5(text)) AS BIGINT) AS group_size,\n"
        "  CAST(CASE WHEN doc_id = MIN(doc_id) OVER (PARTITION BY md5(text))\n"
        "       THEN 1 ELSE 0 END AS INT) AS is_canonical\n"
        "FROM documents"),
    "minhash_signatures": _assemble(
        GAZ, toks_ctes(), DEDUP_CTES,
        select="SELECT doc_id, CAST(seed AS INT) AS seed, minhash FROM mh"),
    "lsh_bands": _assemble(
        GAZ, toks_ctes(), DEDUP_CTES,
        select="SELECT doc_id, band, band_sig FROM bands"),
    "near_duplicates": _assemble(
        GAZ, toks_ctes(), DEDUP_CTES,
        select=("SELECT doc_a, doc_b, n_inter, n_union, jaccard_pct FROM near_dups "
                f"WHERE jaccard_pct >= {JACCARD_THRESHOLD_PCT}")),
    "simhash": _assemble(
        GAZ, toks_ctes(), SIMHASH_CTES,
        select=("SELECT doc_id, CAST(SUM(CASE WHEN v > 0 THEN 1 << CAST(b AS INT) "
                "ELSE 0 END) AS BIGINT) AS simhash FROM votes GROUP BY doc_id")),
    "quality_features": _assemble(
        GAZ, toks_ctes(), QUALITY_CTES,
        select=("SELECT doc_id, n_tokens, n_chars, n_distinct_tokens, n_stopwords, "
                "avg_token_len_x100 FROM qual")),
    "lang_id": _assemble(
        GAZ, toks_ctes(), QUALITY_CTES,
        select=("SELECT d.doc_id, d.lang, "
                "CASE WHEN 20 * q.n_stopwords >= q.n_tokens THEN 'en' ELSE 'unk' END AS pred_lang, "
                "CAST(CASE WHEN (CASE WHEN 20 * q.n_stopwords >= q.n_tokens THEN 'en' ELSE 'unk' END) = d.lang "
                "THEN 1 ELSE 0 END AS INT) AS is_match "
                "FROM documents d JOIN qual q ON d.doc_id = q.doc_id")),
    "token_count_bpe": _assemble(
        GAZ, toks_ctes(),
        select=("SELECT d.doc_id, CAST(COALESCE(t.n, 0) AS BIGINT) AS n_ws_tokens, "
                "CAST(len(regexp_extract_all(d.text, '[0-9A-Za-z]+')) "
                " + len(regexp_extract_all(d.text, '[^0-9A-Za-z \\n\\t]')) AS BIGINT) AS n_bpe_ish "
                "FROM documents d LEFT JOIN "
                "(SELECT doc_id, COUNT(*) AS n FROM toks GROUP BY doc_id) t "
                "ON d.doc_id = t.doc_id")),
    "fingerprint": _assemble(
        GAZ, toks_ctes(), DEDUP_CTES,
        select=("SELECT doc_id, MIN(md5(shingle)) AS fingerprint, "
                "CAST(COUNT(*) AS BIGINT) AS n_shingles FROM sh GROUP BY doc_id")),
    "similarity_topk": _assemble(
        SIM_CTES.lstrip(",").strip(),
        select=f"""
SELECT query_id, rank, neighbor_id, sim_micro6 FROM (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         CAST(floor(1000000 * list_dot_product(q.v, c.v) / (q.nrm * c.nrm)) AS BIGINT) AS sim_micro6,
         CAST(ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
              CAST(floor(1000000 * list_dot_product(q.v, c.v) / (q.nrm * c.nrm)) AS BIGINT) DESC,
              c.vec_id) AS INT) AS rank
  FROM normed q JOIN normed c ON q.vec_id <> c.vec_id
  WHERE q.vec_id < 50
) WHERE rank <= {TOPK_NEIGHBORS}"""),
    "ann_buckets": _assemble(
        SIM_CTES.lstrip(",").strip(),
        select=("SELECT vec_id, bucket, CAST(COUNT(*) OVER (PARTITION BY bucket) AS BIGINT) AS bucket_size "
                "FROM (SELECT vec_id, CAST(" + " + ".join(
                    f"(CASE WHEN v[{i + 1}] >= 0 THEN {1 << i} ELSE 0 END)"
                    for i in range(ANN_SIGN_BITS)) + " AS INT) AS bucket FROM base)")),
    "srp_buckets": _assemble(
        SIM_CTES.lstrip(",").strip(),
        select=("SELECT vec_id, bucket, CAST(COUNT(*) OVER (PARTITION BY bucket) AS BIGINT) AS bucket_size "
                "FROM (SELECT vec_id, CAST(" + " + ".join(
                    f"(CASE WHEN list_dot_product(v, {plane}::DOUBLE[]) >= 0 THEN {1 << i} ELSE 0 END)"
                    for i, plane in enumerate(srp_planes()))
                + " AS INT) AS bucket FROM base)")),
    "ann_topk": _assemble(
        SIM_CTES.lstrip(",").strip(),
        select="""
, bucketed AS (
  SELECT n.vec_id, n.v, n.nrm, CAST(""" + " + ".join(
            f"(CASE WHEN n.v[{i + 1}] >= 0 THEN {1 << i} ELSE 0 END)"
            for i in range(ANN_SIGN_BITS)) + """ AS INT) AS bucket
  FROM normed n)
SELECT query_id, rank, neighbor_id, sim_micro6 FROM (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         CAST(floor(1000000 * list_dot_product(q.v, c.v) / (q.nrm * c.nrm)) AS BIGINT) AS sim_micro6,
         CAST(ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
              CAST(floor(1000000 * list_dot_product(q.v, c.v) / (q.nrm * c.nrm)) AS BIGINT) DESC,
              c.vec_id) AS INT) AS rank
  FROM bucketed q JOIN bucketed c ON q.bucket = c.bucket AND q.vec_id <> c.vec_id
) WHERE rank <= 3"""),
    "eval_mentions_lenient": _assemble(
        BASE, SYS, eval_span_ctes(False),
        select=PRF_SELECT.format(dims="ent_type, ", src="counts")),
    "eval_mentions_by_doc": _assemble(
        BASE, SYS, eval_span_ctes(True),
        select="""
, per_doc AS (
  SELECT COALESCE(ng.url, np.url) AS url,
         CAST(COALESCE(t.tp, 0) AS BIGINT) AS tp,
         CAST(COALESCE(ng.n_gold, 0) AS BIGINT) AS n_gold,
         CAST(COALESCE(np.n_pred, 0) AS BIGINT) AS n_pred
  FROM (SELECT url, COUNT(*) AS n_gold FROM mentions GROUP BY url) ng
  FULL JOIN (SELECT url, COUNT(*) AS n_pred FROM mentions_sys GROUP BY url) np
    ON ng.url = np.url
  LEFT JOIN (SELECT url, COUNT(*) AS tp FROM pared GROUP BY url) t
    ON COALESCE(ng.url, np.url) = t.url
)""" + PRF_SELECT.format(dims="url, ", src="per_doc")),
    "eval_mentions_macro": _assemble(
        BASE, SYS, eval_span_ctes(True),
        select="""
, per_doc AS (
  SELECT COALESCE(ng.url, np.url) AS url,
         CAST(COALESCE(t.tp, 0) AS BIGINT) AS tp,
         CAST(COALESCE(ng.n_gold, 0) AS BIGINT) AS n_gold,
         CAST(COALESCE(np.n_pred, 0) AS BIGINT) AS n_pred
  FROM (SELECT url, COUNT(*) AS n_gold FROM mentions GROUP BY url) ng
  FULL JOIN (SELECT url, COUNT(*) AS n_pred FROM mentions_sys GROUP BY url) np
    ON ng.url = np.url
  LEFT JOIN (SELECT url, COUNT(*) AS tp FROM pared GROUP BY url) t
    ON COALESCE(ng.url, np.url) = t.url
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(floor(AVG(CASE WHEN p + r > 0 THEN 2 * p * r / (p + r)
                           ELSE 0 END) * 1000000) AS BIGINT) AS macro_f1_micro6
FROM (SELECT CASE WHEN n_pred > 0 THEN tp / n_pred ELSE 0 END AS p,
             CASE WHEN n_gold > 0 THEN tp / n_gold ELSE 0 END AS r
      FROM per_doc)"""),
    "events_asof": """
WITH tagged AS (
  SELECT event_id, user_id, ts, event_type, epoch_us(ts) AS us
  FROM events WHERE event_type IN ('purchase', 'click')
),
w AS (
  SELECT *,
     last_value(CASE WHEN event_type = 'click' THEN event_id END IGNORE NULLS)
        OVER (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS click_id,
     last_value(CASE WHEN event_type = 'click' THEN us END IGNORE NULLS)
        OVER (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS click_us
  FROM tagged)
SELECT event_id AS purchase_id, user_id, us AS purchase_us,
       click_id, click_us, us - click_us AS lag_us
FROM w WHERE event_type = 'purchase'""",
    "cooccurrence_pmi": """
WITH co_toks AS (
  SELECT DISTINCT doc_id, lower(tok) AS tok FROM (
    SELECT doc_id, unnest(string_split_regex(text, '[\\n \\t]')) AS tok
    FROM documents)
  WHERE length(tok) >= 3
),
co_df AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS n_docs_tok
          FROM co_toks GROUP BY 1),
co_n AS (SELECT COUNT(DISTINCT doc_id) AS n FROM documents),
co_pairs AS (
  SELECT a.tok AS tok_a, b.tok AS tok_b, CAST(COUNT(*) AS BIGINT) AS n_docs_ab
  FROM co_toks a JOIN co_toks b ON a.doc_id = b.doc_id AND a.tok < b.tok
  GROUP BY 1, 2 HAVING COUNT(*) >= 5
)
SELECT p.tok_a, p.tok_b,
       da.n_docs_tok AS n_docs_a, db.n_docs_tok AS n_docs_b, p.n_docs_ab,
       CAST((p.n_docs_ab * n.n * 1000000)
            // (da.n_docs_tok * db.n_docs_tok) AS BIGINT) AS pmi_ratio_micro6
FROM co_pairs p
JOIN co_df da ON p.tok_a = da.tok
JOIN co_df db ON p.tok_b = db.tok
CROSS JOIN co_n n""",
    "bigram_lm": """
WITH lm_toks AS (
  SELECT doc_id, lower(tok) AS w1,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY piece_idx) AS pos
  FROM (SELECT doc_id,
               unnest(string_split_regex(text, '[\\n \\t]')) AS tok,
               generate_subscripts(string_split_regex(text, '[\\n \\t]'), 1)
                 AS piece_idx
        FROM documents)
  WHERE tok <> ''
),
lm_pairs AS (
  SELECT w1, LEAD(w1) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
  FROM lm_toks
),
lm_big AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c_bigram
           FROM lm_pairs WHERE w2 IS NOT NULL GROUP BY 1, 2),
lm_uni AS (SELECT w1, CAST(COUNT(*) AS BIGINT) AS c_w1
           FROM lm_pairs WHERE w2 IS NOT NULL GROUP BY 1)
SELECT b.w1, b.w2, b.c_bigram, u.c_w1,
       CAST((b.c_bigram * 1000000) // u.c_w1 AS BIGINT) AS p_micro6
FROM lm_big b JOIN lm_uni u ON b.w1 = u.w1
WHERE b.c_bigram >= 5""",
    "media_features": """
WITH mh AS (
  SELECT doc_id AS media_id,
         CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
         md5(text) AS h
  FROM documents),
mi AS (
  SELECT media_id, n_bytes, h,
         CAST(unnest(generate_series(0, 7)) AS BIGINT) AS feat_idx
  FROM mh)
SELECT media_id, n_bytes, feat_idx,
       CAST(4096 * (instr('0123456789abcdef', substr(h, CAST(feat_idx * 4 + 1 AS INT), 1)) - 1)
          +  256 * (instr('0123456789abcdef', substr(h, CAST(feat_idx * 4 + 2 AS INT), 1)) - 1)
          +   16 * (instr('0123456789abcdef', substr(h, CAST(feat_idx * 4 + 3 AS INT), 1)) - 1)
          +        (instr('0123456789abcdef', substr(h, CAST(feat_idx * 4 + 4 AS INT), 1)) - 1)
         AS BIGINT) AS feat_u16
FROM mi""",
    "source_stats": """
WITH ss AS (
  SELECT source,
         CAST(len(list_filter(string_split_regex(text, '[\\n \\t]'),
             x -> x <> '')) AS BIGINT) AS n_tok
  FROM documents),
sr AS (
  SELECT source, n_tok,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY n_tok) - 1 AS rn,
         COUNT(*) OVER (PARTITION BY source) AS cnt,
         SUM(n_tok) OVER (PARTITION BY source) AS tot
  FROM ss)
SELECT source,
       CAST(MAX(cnt) AS BIGINT) AS n_docs,
       CAST(MAX(tot) AS BIGINT) AS total_tokens,
       CAST(MAX(CASE WHEN rn = ((cnt - 1) * 50) // 100 THEN n_tok END)
         AS BIGINT) AS p50_tokens,
       CAST(MAX(CASE WHEN rn = ((cnt - 1) * 90) // 100 THEN n_tok END)
         AS BIGINT) AS p90_tokens
FROM sr GROUP BY source""",
    "lm_quality": """
WITH lmq_toks AS (
  SELECT doc_id, lower(tok) AS w1,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY piece_idx) AS pos
  FROM (SELECT doc_id,
               unnest(string_split_regex(text, '[\\n \\t]')) AS tok,
               generate_subscripts(string_split_regex(text, '[\\n \\t]'), 1)
                 AS piece_idx
        FROM documents)
  WHERE tok <> ''
),
lmq_pairs AS (
  SELECT doc_id, w1, w2 FROM (
    SELECT doc_id, w1,
           LEAD(w1) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
    FROM lmq_toks)
  WHERE w2 IS NOT NULL
),
lmq_big AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c_bigram
            FROM lmq_pairs GROUP BY 1, 2),
lmq_uni AS (SELECT w1, CAST(COUNT(*) AS BIGINT) AS c_w1
            FROM lmq_pairs GROUP BY 1),
lmq_lm AS (
  SELECT b.w1, b.w2,
         CAST((b.c_bigram * 1000000) // u.c_w1 AS BIGINT) AS p_micro6
  FROM lmq_big b JOIN lmq_uni u USING (w1)
  WHERE b.c_bigram >= 5),
lmq_sc AS (
  SELECT p.doc_id, CAST(COUNT(*) AS BIGINT) AS n_pairs,
         CAST(COUNT(*) FILTER (WHERE l.p_micro6 IS NULL) AS BIGINT) AS n_oov,
         CAST(COALESCE(SUM(l.p_micro6), 0) AS BIGINT) AS s
  FROM lmq_pairs p LEFT JOIN lmq_lm l ON p.w1 = l.w1 AND p.w2 = l.w2
  GROUP BY 1)
SELECT d.doc_id,
       CAST(COALESCE(c.n_pairs, 0) AS BIGINT) AS n_pairs,
       CAST(COALESCE(c.n_oov, 0) AS BIGINT) AS n_oov,
       CAST(CASE WHEN COALESCE(c.n_pairs, 0) > 0 THEN c.s // c.n_pairs
                 ELSE 0 END AS BIGINT) AS lm_score_micro6
FROM documents d LEFT JOIN lmq_sc c USING (doc_id)""",
    "corpus_curation": "WITH " + CURATION_CTES + """
SELECT doc_id, n_tokens,
       CAST(CASE WHEN reason = 'ok' THEN 1 ELSE 0 END AS INT) AS keep,
       reason
FROM cr""",
    "corpus_export": "WITH " + CURATION_CTES + "," + decontam_ctes(8) + """
SELECT c.doc_id, c.n_tokens,
       CAST(CASE WHEN reason2 = 'ok' THEN 1 ELSE 0 END AS INT) AS keep,
       reason2 AS reason
FROM (
  SELECT c.doc_id, c.n_tokens,
         CASE WHEN c.reason <> 'ok' THEN c.reason
              WHEN COALESCE(h.n_contaminated, 0) > 0 THEN 'contaminated'
              ELSE 'ok' END AS reason2
  FROM cr c
  JOIN dsplit d USING (doc_id)
  LEFT JOIN dhits h USING (doc_id)
  WHERE d.split = 'train') c""",
    "mixture_sample": f"""
SELECT doc_id, source, bucket, rate_pct,
       CAST(bucket < (rate_pct * 256) // 100 AS INT) AS kept
FROM (
  SELECT doc_id, source,
         CAST(16 * (instr('0123456789abcdef',
                  substr(md5(source || ':' || CAST(doc_id AS VARCHAR)), 31, 1)) - 1)
            + (instr('0123456789abcdef',
                  substr(md5(source || ':' || CAST(doc_id AS VARCHAR)), 32, 1)) - 1)
           AS INT) AS bucket,
         CAST(CASE {' '.join(f"WHEN source = '{s}' THEN {p}" for s, p in sorted(MIXTURE_RATES.items()))}
              ELSE {MIXTURE_DEFAULT_PCT} END AS INT) AS rate_pct
  FROM documents)""",
    "pack_sequences": """
WITH pn AS (
  SELECT source, doc_id,
         CAST(len(list_filter(string_split_regex(text, '[\\n \\t]'),
             x -> x <> '')) AS BIGINT) AS n_doc
  FROM documents),
pd AS (
  SELECT source, doc_id, n_doc,
         CAST(COALESCE(SUM(n_doc) OVER (
             PARTITION BY source ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS BIGINT) AS start
  FROM pn),
pe AS (
  SELECT source, doc_id, n_doc, start, start + n_doc AS "end",
         unnest(generate_series(start // 128, (start + n_doc - 1) // 128))
           AS seq_id
  FROM pd WHERE n_doc > 0)
SELECT source, CAST(seq_id AS BIGINT) AS seq_id, doc_id,
       CAST(greatest(start, seq_id * 128) - start AS BIGINT) AS doc_tok_start,
       CAST(least("end", (seq_id + 1) * 128) - start AS BIGINT) AS doc_tok_end,
       CAST(greatest(start, seq_id * 128) - seq_id * 128 AS BIGINT)
         AS seq_tok_start,
       CAST(least("end", (seq_id + 1) * 128) - seq_id * 128 AS BIGINT)
         AS seq_tok_end,
       CAST(least("end", (seq_id + 1) * 128)
          - greatest(start, seq_id * 128) AS BIGINT) AS n_tokens
FROM pe""",
    "repetition_features": """
WITH rtoks AS (
  SELECT doc_id, tok,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY piece_idx) AS pos
  FROM (SELECT doc_id,
               unnest(string_split_regex(text, '[\\n \\t]')) AS tok,
               generate_subscripts(string_split_regex(text, '[\\n \\t]'), 1)
                 AS piece_idx
        FROM documents)
  WHERE tok <> ''
),
rg AS (
  SELECT doc_id, l0 || ' ' || l1 || ' ' || l2 AS gram
  FROM (SELECT doc_id, tok AS l0,
               LEAD(tok, 1) OVER w AS l1, LEAD(tok, 2) OVER w AS l2
        FROM rtoks WINDOW w AS (PARTITION BY doc_id ORDER BY pos))
  WHERE l2 IS NOT NULL
),
ragg AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
         CAST(COUNT(DISTINCT gram) AS BIGINT) AS n_distinct_grams
  FROM rg GROUP BY 1)
SELECT d.doc_id,
       CAST(COALESCE(a.n_grams, 0) AS BIGINT) AS n_grams,
       CAST(COALESCE(a.n_distinct_grams, 0) AS BIGINT) AS n_distinct_grams,
       CAST(CASE WHEN COALESCE(a.n_grams, 0) > 0
                 THEN ((a.n_grams - a.n_distinct_grams) * 1000000) // a.n_grams
                 ELSE 0 END AS BIGINT) AS dup_frac_micro6
FROM documents d LEFT JOIN ragg a USING (doc_id)""",
    "decontaminate": "WITH " + decontam_ctes(8) + """
SELECT d.doc_id,
       CAST(COALESCE(t.n_ngrams, 0) AS BIGINT) AS n_ngrams,
       CAST(COALESCE(h.n_contaminated, 0) AS BIGINT) AS n_contaminated,
       CAST(COALESCE(h.n_test_docs, 0) AS BIGINT) AS n_test_docs,
       CAST(COALESCE(h.n_contaminated, 0) > 0 AS INT) AS contaminated
FROM dsplit d LEFT JOIN dtot t USING (doc_id) LEFT JOIN dhits h USING (doc_id)
WHERE d.split = 'train'""",
    "corpus_split": """
SELECT doc_id, bucket,
       CASE WHEN bucket < 204 THEN 'train'
            WHEN bucket < 230 THEN 'dev' ELSE 'test' END AS split
FROM (
  SELECT doc_id,
         CAST(16 * (instr('0123456789abcdef',
                  substr(md5(CAST(doc_id AS VARCHAR)), 31, 1)) - 1)
            + (instr('0123456789abcdef',
                  substr(md5(CAST(doc_id AS VARCHAR)), 32, 1)) - 1) AS INT) AS bucket
  FROM documents)""",
    "sessionize": """
WITH s0 AS (
  SELECT user_id, event_id, ts,
         CASE WHEN lag_ts IS NULL
              OR (epoch_us(ts) // 1000000) - (epoch_us(lag_ts) // 1000000) > 1800
              THEN 1 ELSE 0 END AS new_sess
  FROM (SELECT user_id, event_id, ts,
               LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS lag_ts
        FROM events)
),
s1 AS (
  SELECT *, CAST(SUM(new_sess) OVER (
      PARTITION BY user_id ORDER BY ts, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1 AS INT) AS session_id
  FROM s0
)
SELECT user_id, session_id, CAST(COUNT(*) AS BIGINT) AS n_events,
       strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS first_ts,
       strftime(MAX(ts), '%Y-%m-%d %H:%M:%S') AS last_ts,
       CAST((epoch_us(MAX(ts)) // 1000000) - (epoch_us(MIN(ts)) // 1000000) AS BIGINT) AS duration_sec
FROM s1 GROUP BY user_id, session_id""",
    "embedding_near_dups": _assemble(
        SIM_CTES.lstrip(",").strip(),
        select="""
, bucketed AS (
  SELECT n.vec_id, n.v, n.nrm, CAST(""" + " + ".join(
            f"(CASE WHEN n.v[{i + 1}] >= 0 THEN {1 << i} ELSE 0 END)"
            for i in range(ANN_SIGN_BITS)) + """ AS INT) AS bucket
  FROM normed n)
SELECT vec_a, vec_b, sim_micro6 FROM (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         CAST(floor(1000000 * list_dot_product(a.v, b.v) / (a.nrm * b.nrm)) AS BIGINT) AS sim_micro6
  FROM bucketed a JOIN bucketed b
    ON a.bucket = b.bucket AND a.vec_id < b.vec_id
) WHERE sim_micro6 >= 300000"""),
    "ivf_assign": _assemble(
        SIM_CTES.lstrip(",").strip(),
        select="""
, cents AS (SELECT vec_id AS cell, v AS cv, nrm AS cn FROM normed WHERE vec_id < 8),
scored AS (
  SELECT n.vec_id, c.cell,
         CAST(floor(1000000 * list_dot_product(n.v, c.cv) / (n.nrm * c.cn)) AS BIGINT) AS s6
  FROM normed n CROSS JOIN cents c),
asg AS (
  SELECT vec_id, cell FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY s6 DESC, cell) AS r
    FROM scored) WHERE r = 1)
SELECT vec_id, CAST(cell AS INT) AS cell,
       CAST(COUNT(*) OVER (PARTITION BY cell) AS BIGINT) AS cell_size
FROM asg"""),
    "ivf_topk": _assemble(
        SIM_CTES.lstrip(",").strip(),
        select="""
, cents AS (SELECT vec_id AS cell, v AS cv, nrm AS cn FROM normed WHERE vec_id < 8),
scored AS (
  SELECT n.vec_id, c.cell,
         CAST(floor(1000000 * list_dot_product(n.v, c.cv) / (n.nrm * c.cn)) AS BIGINT) AS s6
  FROM normed n CROSS JOIN cents c),
asg AS (
  SELECT vec_id AS neighbor_id, cell FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY s6 DESC, cell) AS r
    FROM scored) WHERE r = 1),
probes AS (
  SELECT vec_id AS query_id, cell FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY s6 DESC, cell) AS r
    FROM scored WHERE vec_id < 50) WHERE r <= 2),
cand AS (
  SELECT p.query_id, a.neighbor_id FROM probes p JOIN asg a USING (cell)
  WHERE a.neighbor_id <> p.query_id)
SELECT query_id, rank, neighbor_id, sim_micro6 FROM (
  SELECT cand.query_id, cand.neighbor_id,
         CAST(floor(1000000 * list_dot_product(q.v, c.v) / (q.nrm * c.nrm)) AS BIGINT) AS sim_micro6,
         CAST(ROW_NUMBER() OVER (PARTITION BY cand.query_id ORDER BY
              CAST(floor(1000000 * list_dot_product(q.v, c.v) / (q.nrm * c.nrm)) AS BIGINT) DESC,
              cand.neighbor_id) AS INT) AS rank
  FROM cand JOIN normed q ON q.vec_id = cand.query_id
            JOIN normed c ON c.vec_id = cand.neighbor_id
) WHERE rank <= 3"""),
    "top_terms_tfidf": _assemble(
        GAZ, toks_ctes(),
        select="""
, tf AS (SELECT doc_id, token AS term, CAST(COUNT(*) AS BIGINT) AS tf
         FROM toks GROUP BY doc_id, token),
docfreq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df
            FROM (SELECT DISTINCT doc_id, token AS term FROM toks)
            GROUP BY term),
nd AS (SELECT CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS n FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term, tf.tf, d.df,
         CAST(floor(tf.tf * ln(nd.n / d.df) * 1000000) AS BIGINT) AS tfidf_micro6
  FROM tf JOIN docfreq d ON tf.term = d.term CROSS JOIN nd)
SELECT doc_id, rank, term, tf, df, tfidf_micro6 FROM (
  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
      ORDER BY tfidf_micro6 DESC, term) AS INT) AS rank
  FROM scored) WHERE rank <= 5"""),
    "session_funnel": """
WITH f0 AS (
  SELECT user_id, event_id, ts, event_type,
         CASE WHEN lag_ts IS NULL
              OR (epoch_us(ts) // 1000000) - (epoch_us(lag_ts) // 1000000) > 1800
              THEN 1 ELSE 0 END AS new_sess
  FROM (SELECT user_id, event_id, ts, event_type,
               LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS lag_ts
        FROM events)
),
f1 AS (
  SELECT *, CAST(SUM(new_sess) OVER (
      PARTITION BY user_id ORDER BY ts, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1 AS INT) AS session_id
  FROM f0
),
f2 AS (
  SELECT *, ROW_NUMBER() OVER (
      PARTITION BY user_id, session_id ORDER BY ts, event_id) AS pos
  FROM f1
),
f3 AS (
  SELECT user_id, session_id,
         MIN(CASE WHEN event_type = 'click' THEN pos END) AS first_pos,
         MAX(CASE WHEN event_type = 'purchase' THEN pos END) AS second_pos
  FROM f2 GROUP BY 1, 2
),
f4 AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_sessions,
         CAST(COUNT(first_pos) AS BIGINT) AS n_with_first,
         CAST(COALESCE(SUM(CASE WHEN first_pos IS NOT NULL
                              AND second_pos IS NOT NULL
                              AND first_pos < second_pos
                             THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_converted
  FROM f3)
SELECT n_sessions, n_with_first, n_converted,
       CAST(CASE WHEN n_with_first > 0
                 THEN (n_converted * 10000) // n_with_first
                 ELSE 0 END AS BIGINT) AS conv_pct_x10000
FROM f4""",
    "retention_cohorts": """
WITH red AS (
  SELECT user_id, CAST(epoch_us(ts) // 86400000000 AS INT) AS day
  FROM events),
rco AS (SELECT user_id, MIN(day) AS cohort_day FROM red GROUP BY 1),
rac AS (SELECT DISTINCT user_id, day FROM red)
SELECT CAST(c.cohort_day AS INT) AS cohort_day,
       CAST(a.day - c.cohort_day AS INT) AS day_offset,
       CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS n_users
FROM rac a JOIN rco c USING (user_id)
GROUP BY 1, 2""",
    "events_hourly": (
        "SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start, "
        "event_type, CAST(COUNT(*) AS BIGINT) AS n, "
        "CAST(floor(SUM(value) * 100) AS BIGINT) AS sum_value_x100, "
        "MIN(value) AS min_value, MAX(value) AS max_value "
        "FROM events GROUP BY 1, 2"),
    "eval_relations_lenient": _assemble(
        BASE, SYS, eval_rel_ctes(strict=False),
        select=PRF_SELECT.format(dims="rel_type, ", src="rcounts")),
    "eval_triples_by_pred": _assemble(
        BASE, SYS,
        select=PRF_SELECT.format(
            dims="pred, ",
            src="""(
  SELECT COALESCE(g.pred, p.pred) AS pred,
         CAST(COALESCE(t.tp, 0) AS BIGINT) AS tp,
         CAST(COALESCE(g.n_gold, 0) AS BIGINT) AS n_gold,
         CAST(COALESCE(p.n_pred, 0) AS BIGINT) AS n_pred
  FROM (SELECT pred, COUNT(*) AS n_gold FROM
        (SELECT DISTINCT url, subj, pred, obj FROM triples) GROUP BY pred) g
  FULL JOIN (SELECT pred, COUNT(*) AS n_pred FROM
        (SELECT DISTINCT url, subj, pred, obj FROM triples_sys) GROUP BY pred) p
    ON g.pred = p.pred
  LEFT JOIN (SELECT pred, COUNT(*) AS tp FROM
        (SELECT DISTINCT url, subj, pred, obj FROM triples
         INTERSECT SELECT DISTINCT url, subj, pred, obj FROM triples_sys)
        GROUP BY pred) t
    ON COALESCE(g.pred, p.pred) = t.pred
)""")),
    "eval_triples": _assemble(
        BASE, SYS,
        select=PRF_SELECT.format(
            dims="",
            src="""(
  SELECT CAST((SELECT COUNT(*) FROM
          (SELECT DISTINCT url, subj, pred, obj FROM triples
           INTERSECT SELECT DISTINCT url, subj, pred, obj FROM triples_sys)) AS BIGINT) AS tp,
         CAST((SELECT COUNT(*) FROM (SELECT DISTINCT url, subj, pred, obj FROM triples)) AS BIGINT) AS n_gold,
         CAST((SELECT COUNT(*) FROM (SELECT DISTINCT url, subj, pred, obj FROM triples_sys)) AS BIGINT) AS n_pred
)""")),
}


# ---- round-2 additions: dup clusters, containment, IVF Lloyd step,
# ---- canonical urls ------------------------------------------------

from ..config import CONTAINMENT_THRESHOLD_PCT  # noqa: E402

ORACLE["dup_clusters"] = _assemble(
    GAZ, toks_ctes(), DEDUP_CTES,
    select=f"""
, dup_edges AS MATERIALIZED (
  SELECT doc_a AS src, doc_b AS dst FROM near_dups
  WHERE jaccard_pct >= {JACCARD_THRESHOLD_PCT}),
dup_sym AS (SELECT src, dst FROM dup_edges
            UNION SELECT dst AS src, src AS dst FROM dup_edges),
dup_reach(node, comp) AS (
  SELECT doc_id AS node, doc_id AS comp FROM documents
  UNION
  SELECT e.dst AS node, r.comp
  FROM dup_reach r JOIN dup_sym e ON e.src = r.node),
dup_comp AS MATERIALIZED (
  SELECT node AS doc_id, MIN(comp) AS cluster_id
  FROM dup_reach GROUP BY node)
SELECT doc_id, cluster_id,
       CAST(COUNT(*) OVER (PARTITION BY cluster_id) AS BIGINT) AS cluster_size,
       CAST(CASE WHEN doc_id = cluster_id THEN 1 ELSE 0 END AS INT) AS is_canonical
FROM dup_comp""")

ORACLE["containment_dups"] = _assemble(
    GAZ, toks_ctes(), DEDUP_CTES,
    select=f"""
SELECT c.doc_a, c.doc_b,
       CAST(COALESCE(i.n_inter, 0) AS BIGINT) AS n_inter,
       CAST(least(sa.n_sh, sb.n_sh) AS BIGINT) AS n_small,
       CAST(floor(100 * COALESCE(i.n_inter, 0) / least(sa.n_sh, sb.n_sh)) AS BIGINT) AS containment_pct
FROM cand c
JOIN sh_sizes sa ON sa.doc_id = c.doc_a
JOIN sh_sizes sb ON sb.doc_id = c.doc_b
LEFT JOIN inter i ON i.doc_a = c.doc_a AND i.doc_b = c.doc_b
WHERE floor(100 * COALESCE(i.n_inter, 0) / least(sa.n_sh, sb.n_sh)) >= {CONTAINMENT_THRESHOLD_PCT}""")

ORACLE["ivf_centroids"] = _assemble(
    SIM_CTES.lstrip(",").strip(),
    select="""
, cents AS (SELECT vec_id AS cell, v AS cv, nrm AS cn FROM normed WHERE vec_id < 8),
scored AS (
  SELECT n.vec_id, c.cell,
         CAST(floor(1000000 * list_dot_product(n.v, c.cv) / (n.nrm * c.cn)) AS BIGINT) AS s6
  FROM normed n CROSS JOIN cents c),
asg AS (
  SELECT vec_id, cell FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY s6 DESC, cell) AS r
    FROM scored) WHERE r = 1),
qdims AS (
  SELECT b.vec_id, CAST(i - 1 AS INT) AS dim,
         CAST(floor(b.v[CAST(i AS INT)] * 1000000) AS BIGINT) AS q6
  FROM base b, unnest(generate_series(1, len(b.v))) AS t(i))
SELECT CAST(a.cell AS INT) AS cell, q.dim,
       CAST(COUNT(*) AS BIGINT) AS n_vecs,
       CAST(SUM(q.q6) AS BIGINT) AS sum_q6,
       CAST(floor(SUM(q.q6) / COUNT(*)) AS BIGINT) AS mean_q6
FROM asg a JOIN qdims q ON a.vec_id = q.vec_id
GROUP BY a.cell, q.dim""")

ORACLE["url_canonical"] = """
WITH messy AS (
  SELECT doc_id,
    CASE CAST(doc_id % 6 AS INT)
      WHEN 0 THEN 'https://' || source || '.example.com/p/' || CAST(doc_id // 120 AS VARCHAR)
      WHEN 1 THEN 'HTTPS://' || upper(source) || '.Example.COM:443/p/' || CAST(doc_id // 120 AS VARCHAR)
      WHEN 2 THEN 'https://' || source || '.example.com/p/' || CAST(doc_id // 120 AS VARCHAR) || '/'
      WHEN 3 THEN 'https://' || source || '.example.com/p/' || CAST(doc_id // 120 AS VARCHAR) || '?utm_source=feed&utm_campaign=x'
      WHEN 4 THEN 'https://' || source || '.example.com/p/' || CAST(doc_id // 120 AS VARCHAR) || '?fbclid=abc'
      ELSE 'https://' || source || '.example.com/p/' || CAST(doc_id // 120 AS VARCHAR) || '#section-2'
    END AS url_raw
  FROM documents),
u0 AS (SELECT doc_id, url_raw, string_split(url_raw, '#')[1] AS u FROM messy),
u1 AS (SELECT *, lower(regexp_extract(u, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
              regexp_replace(u, '^[A-Za-z][A-Za-z0-9+.-]*://', '') AS rest FROM u0),
u2 AS (SELECT *, lower(regexp_extract(rest, '^([^/?]*)', 1)) AS hostport,
              regexp_replace(rest, '^[^/?]*', '') AS pathq FROM u1),
u3 AS (SELECT *,
        CASE WHEN scheme = 'http' THEN regexp_replace(hostport, ':80$', '')
             WHEN scheme = 'https' THEN regexp_replace(hostport, ':443$', '')
             ELSE hostport END AS host,
        string_split(pathq, '?')[1] AS path0,
        CASE WHEN instr(pathq, '?') > 0 THEN string_split(pathq, '?')[2] ELSE '' END AS query FROM u2),
u4 AS (SELECT *,
        CASE WHEN regexp_replace(path0, '/+$', '') = '' THEN '/'
             ELSE regexp_replace(path0, '/+$', '') END AS path,
        list_sort(list_filter(string_split(query, '&'),
          p -> p <> '' AND NOT regexp_matches(p, '^(utm_[^=]*|fbclid|gclid|ref)='))) AS params FROM u3),
normu AS (
  SELECT doc_id, url_raw,
         scheme || '://' || host || path ||
         CASE WHEN len(params) > 0 THEN '?' || array_to_string(params, '&') ELSE '' END AS url_norm
  FROM u4)
SELECT doc_id, url_raw, url_norm,
       CAST(COUNT(*) OVER (PARTITION BY url_norm) AS BIGINT) AS n_variants,
       CAST(CASE WHEN doc_id = MIN(doc_id) OVER (PARTITION BY url_norm) THEN 1 ELSE 0 END AS INT) AS is_canonical
FROM normu"""

ORACLE["boilerplate_strip"] = """
WITH wrapped AS (
  SELECT doc_id, source,
         'HOME | ' || source || ' | NAV' || chr(10) || text || chr(10) ||
         'Copyright 2024 ' || source || ' footer' AS text
  FROM documents),
lines AS (
  SELECT doc_id, source,
         unnest(string_split(text, chr(10))) AS line,
         generate_subscripts(string_split(text, chr(10)), 1) AS line_idx
  FROM wrapped),
host_docs AS (SELECT source, COUNT(DISTINCT doc_id) AS host_n
              FROM wrapped GROUP BY source),
line_counts AS (SELECT source, line, COUNT(DISTINCT doc_id) AS line_n
                FROM lines GROUP BY source, line),
boiler AS (
  SELECT lc.source, lc.line
  FROM line_counts lc JOIN host_docs h ON lc.source = h.source
  WHERE lc.line_n >= 3 AND 100 * lc.line_n >= 50 * h.host_n),
flagged AS (
  SELECT l.doc_id, l.line_idx, l.line,
         CASE WHEN b.line IS NOT NULL THEN 1 ELSE 0 END AS is_b
  FROM lines l LEFT JOIN boiler b
    ON l.source = b.source AND l.line = b.line)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(SUM(is_b) AS BIGINT) AS n_boiler_lines,
       COALESCE(string_agg(CASE WHEN is_b = 0 THEN line END, chr(10)
                           ORDER BY line_idx), '') AS text_clean
FROM flagged GROUP BY doc_id"""

ORACLE["kg_support"] = _q("""
SELECT subj, pred, obj,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(COUNT(DISTINCT regexp_extract(url, '^https?://([^/]*)', 1)) AS BIGINT) AS n_hosts,
       CAST(MIN((1704067200 + doc_id) // 86400) AS BIGINT) AS first_day,
       CAST(MAX((1704067200 + doc_id) // 86400) AS BIGINT) AS last_day
FROM triples GROUP BY subj, pred, obj""")

ORACLE["entity_centroids"] = _q("""
, epairs AS (SELECT DISTINCT canonical_id, doc_id FROM linked),
eq AS (
  SELECT e.vec_id AS doc_id, CAST(i - 1 AS INT) AS dim,
         CAST(floor((CAST(e.embedding AS DOUBLE[]))[CAST(i AS INT)] * 1000000) AS BIGINT) AS q6
  FROM embeddings e, unnest(generate_series(1, len(e.embedding))) AS t(i))
SELECT p.canonical_id, q.dim,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(q.q6) AS BIGINT) AS sum_q6,
       CAST(floor(SUM(q.q6) / COUNT(*)) AS BIGINT) AS mean_q6
FROM epairs p JOIN eq q ON p.doc_id = q.doc_id
GROUP BY p.canonical_id, q.dim""", LINK_CTES)

from ..functions.textstats import SYNTH_QUOTE as _SYNTH_QUOTE  # noqa: E402

# Shared CTE block for the Lee-et-al windowed-substring-dedup family
# (passage_dups / duplicated_spans / cut_spans at win=20/stride=10;
# the stride-1 EXACT form reuses the same generator): synth-quote
# wrap, tokenize, window hashes.
def _passage_ctes(win: int = 20, stride: int = 10) -> str:
    return f"""wrapped AS (
  SELECT doc_id,
         CASE WHEN doc_id % 7 = 0 THEN '{_SYNTH_QUOTE} ' || text
              ELSE text END AS text
  FROM documents),
rt AS (
  SELECT doc_id,
         unnest(string_split_regex(text, '{SEP_CLASS}')) AS tok,
         generate_subscripts(string_split_regex(text, '{SEP_CLASS}'), 1) AS piece_idx
  FROM wrapped),
tk AS (
  SELECT doc_id, tok AS token,
         CAST(ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY piece_idx) - 1 AS INT) AS tok_idx,
         CAST(COUNT(*) OVER (PARTITION BY doc_id) AS INT) AS n_tokens
  FROM rt WHERE tok <> ''),
wstarts AS (
  SELECT doc_id, tok_idx AS win_start
  FROM tk WHERE tok_idx % {stride} = 0 AND tok_idx + {win} <= n_tokens),
wintoks AS (
  SELECT s.doc_id, s.win_start, t.token, t.tok_idx
  FROM wstarts s JOIN tk t ON t.doc_id = s.doc_id
   AND t.tok_idx >= s.win_start AND t.tok_idx < s.win_start + {win}),
wh AS (
  SELECT doc_id, win_start,
         md5(string_agg(token, ' ' ORDER BY tok_idx)) AS passage_hash
  FROM wintoks GROUP BY doc_id, win_start)"""


_PASSAGE_CTES = _passage_ctes()

ORACLE["passage_dups"] = f"""
WITH {_PASSAGE_CTES},
cnt AS (
  SELECT passage_hash, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs_sharing
  FROM wh GROUP BY passage_hash)
SELECT w.doc_id, CAST(w.win_start AS INT) AS win_start, w.passage_hash,
       c.n_docs_sharing
FROM wh w JOIN cnt c USING (passage_hash)
WHERE c.n_docs_sharing >= 2"""

# Islands over a set of duplicated windows: break when the gap to the
# previous window is > win (the windows neither overlap nor touch) —
# same rule as textstats._island_id, so each island is one maximal
# contiguous duplicated region and merged spans are strictly disjoint.
def _island_ctes(win: int = 20) -> str:
    return f"""lagd AS (
  SELECT doc_id, win_start,
         lag(win_start) OVER (PARTITION BY doc_id ORDER BY win_start) AS prev
  FROM dupw),
isl AS (
  SELECT doc_id, win_start,
         SUM(CASE WHEN prev IS NULL OR win_start - prev > {win}
                  THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id ORDER BY win_start
                 ROWS UNBOUNDED PRECEDING) AS island
  FROM lagd),
spans AS (
  SELECT doc_id, island, MIN(win_start) AS s, MAX(win_start) + {win} AS e,
         COUNT(*) AS n_windows
  FROM isl GROUP BY doc_id, island)"""


_ISLAND_CTES = _island_ctes()

ORACLE["duplicated_spans"] = f"""
WITH {_PASSAGE_CTES},
cnt AS (
  SELECT passage_hash, COUNT(DISTINCT doc_id) AS n_docs
  FROM wh GROUP BY passage_hash),
dupw AS (
  SELECT DISTINCT w.doc_id, w.win_start
  FROM wh w JOIN cnt c USING (passage_hash) WHERE c.n_docs >= 2),
{_ISLAND_CTES}
SELECT doc_id, CAST(s AS INT) AS span_start, CAST(e AS INT) AS span_end,
       CAST(n_windows AS BIGINT) AS n_windows
FROM spans"""

ORACLE["cut_spans"] = f"""
WITH {_PASSAGE_CTES},
keeper AS (
  SELECT passage_hash, MIN(doc_id) AS keep_doc,
         COUNT(DISTINCT doc_id) AS n_docs
  FROM wh GROUP BY passage_hash),
dupw AS (
  SELECT DISTINCT w.doc_id, w.win_start
  FROM wh w JOIN keeper k USING (passage_hash)
  WHERE k.n_docs >= 2 AND w.doc_id <> k.keep_doc),
{_ISLAND_CTES},
cuts AS (SELECT doc_id, SUM(e - s) AS n_cut FROM spans GROUP BY doc_id),
kept AS (
  SELECT t.doc_id, t.token, t.tok_idx FROM tk t
  WHERE NOT EXISTS (
    SELECT 1 FROM spans sp
    WHERE sp.doc_id = t.doc_id
      AND t.tok_idx >= sp.s AND t.tok_idx < sp.e)),
rebuilt AS (
  SELECT doc_id, string_agg(token, ' ' ORDER BY tok_idx) AS text_clean
  FROM kept GROUP BY doc_id)
SELECT d.doc_id, COALESCE(r.text_clean, '') AS text_clean,
       CAST(COALESCE(c.n_cut, 0) AS BIGINT) AS n_cut_tokens
FROM documents d
LEFT JOIN rebuilt r ON d.doc_id = r.doc_id
LEFT JOIN cuts c ON d.doc_id = c.doc_id"""

# Redirect-chain resolution over the synthesized edge fixture
# (functions/urls.synth_redirect_edges — identical synthesis here).
# The walk follows the min-dst out-edge per src up to 64 hops; a walk
# that exhausts the cap is on/into a cycle -> unresolved (the Spark
# side flags exactly those rows: final dst still has an out-edge after
# pointer doubling).  Chains in the fixture are <= 4 hops, so resolved
# walks terminate far below the cap.
ORACLE["url_redirects"] = """
WITH RECURSIVE redirects AS (
  SELECT 'http://r/' || CAST(doc_id AS VARCHAR) AS src_url,
         'http://r/' || CAST(doc_id - 1 AS VARCHAR) AS dst_url
  FROM documents WHERE doc_id % 5 <> 0
  UNION ALL
  SELECT 'http://r/' || CAST(doc_id AS VARCHAR),
         'http://r/x' || CAST(doc_id AS VARCHAR)
  FROM documents WHERE doc_id % 20 = 7
  UNION ALL
  SELECT 'http://c/' || CAST(doc_id AS VARCHAR),
         'http://c/' || CAST(doc_id + 1 AS VARCHAR)
  FROM documents WHERE doc_id % 50 IN (9, 10)
  UNION ALL
  SELECT 'http://c/' || CAST(doc_id AS VARCHAR),
         'http://c/' || CAST(doc_id - 2 AS VARCHAR)
  FROM documents WHERE doc_id % 50 = 11
  UNION ALL
  SELECT 'http://c/' || CAST(doc_id AS VARCHAR),
         'http://c/' || CAST(doc_id - 3 AS VARCHAR)
  FROM documents WHERE doc_id % 50 = 12),
m AS (
  SELECT src_url AS src, MIN(dst_url) AS dst
  FROM redirects WHERE src_url <> dst_url GROUP BY src_url),
walk(src, cur, hops) AS (
  SELECT src, dst, 0 FROM m
  UNION ALL
  SELECT w.src, m2.dst, w.hops + 1
  FROM walk w JOIN m m2 ON w.cur = m2.src
  WHERE w.hops < 64),
fin AS (
  SELECT src, arg_max(cur, hops) AS final, MAX(hops) AS maxh
  FROM walk GROUP BY src)
SELECT src AS url,
       CASE WHEN maxh >= 64 THEN src ELSE final END AS final_url,
       CAST(CASE WHEN maxh >= 64 THEN 1 ELSE 0 END AS INT) AS unresolved
FROM fin"""

# Incremental-CC maintenance check: the Spark side splits the entity
# overlap edges, runs CC on the "old" part, then folds the "new" part
# in with update_components; the final assignment must equal full CC
# over ALL edges (component id = lexicographic min node) — which is
# exactly the canonical_components oracle.
ORACLE["cc_update"] = _q("SELECT node, component FROM components",
                         LINK_CTES)

ORACLE["entity_neighbors"] = _q("""
, epairs AS (SELECT DISTINCT canonical_id, doc_id FROM linked),
eq AS (
  SELECT e.vec_id AS doc_id, CAST(i - 1 AS INT) AS dim,
         CAST(floor((CAST(e.embedding AS DOUBLE[]))[CAST(i AS INT)] * 1000000) AS BIGINT) AS q6
  FROM embeddings e, unnest(generate_series(1, len(e.embedding))) AS t(i)),
cents AS (
  SELECT p.canonical_id, q.dim,
         CAST(floor(SUM(q.q6) / COUNT(*)) AS BIGINT) AS mean_q6
  FROM epairs p JOIN eq q ON p.doc_id = q.doc_id
  GROUP BY p.canonical_id, q.dim),
vecs AS (
  SELECT canonical_id, CAST(list(mean_q6 ORDER BY dim) AS DOUBLE[]) AS v
  FROM cents GROUP BY canonical_id),
pp AS (
  SELECT a.canonical_id AS ent_a, b.canonical_id AS ent_b,
         CAST(list_dot_product(a.v, b.v) AS BIGINT) AS dot_q,
         CAST(list_dot_product(a.v, a.v) AS BIGINT) AS norm_a_q,
         CAST(list_dot_product(b.v, b.v) AS BIGINT) AS norm_b_q
  FROM vecs a JOIN vecs b ON a.canonical_id <> b.canonical_id),
rk AS (
  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY ent_a ORDER BY
       dot_q / sqrt(CAST(norm_a_q AS DOUBLE) * CAST(norm_b_q AS DOUBLE)) DESC,
       ent_b) AS INT) AS "rank"
  FROM pp)
SELECT ent_a, ent_b, dot_q, norm_a_q, norm_b_q, "rank" FROM rk
WHERE "rank" <= 5""", LINK_CTES)

ORACLE["triple_history"] = _q("""
, tbase AS (
  SELECT url, subj, pred, obj, MIN(doc_id) AS d,
         CAST(MIN(doc_id) % 5 AS INT) AS seq0,
         substring(md5(url || '|' || subj || '|' || pred || '|' || obj), 1, 1)
           IN ('0','1','2','3') AS retract
  FROM triples GROUP BY url, subj, pred, obj),
ev AS (
  SELECT url, subj, pred, obj, '+' AS op, seq0 AS crawl_seq FROM tbase
  UNION ALL
  SELECT url, subj, pred, obj, '-' AS op, seq0 + 2 AS crawl_seq
  FROM tbase WHERE retract),
led AS (
  SELECT *, LEAD(op) OVER (PARTITION BY url, subj, pred, obj ORDER BY crawl_seq) AS nop,
         LEAD(crawl_seq) OVER (PARTITION BY url, subj, pred, obj ORDER BY crawl_seq) AS nseq
  FROM ev)
SELECT url, subj, pred, obj,
       CAST(crawl_seq AS BIGINT) AS seq_from,
       CAST(CASE WHEN nop = '-' THEN nseq ELSE -1 END AS BIGINT) AS seq_to,
       CAST(CASE WHEN COALESCE(nop, '') = '-' THEN 0 ELSE 1 END AS INT) AS is_current
FROM led WHERE op = '+'""")

ORACLE["simhash_near_dups"] = _assemble(
    GAZ, toks_ctes(), SIMHASH_CTES,
    select=f"""
, shv AS (
  SELECT doc_id,
         CAST(SUM(CASE WHEN v > 0 THEN 1 << CAST(b AS INT) ELSE 0 END) AS BIGINT) AS simhash
  FROM votes GROUP BY doc_id),
banded AS (
  SELECT doc_id, simhash, bb.band,
         (simhash >> (bb.band * {SIMHASH_BITS // 4})) & {(1 << (SIMHASH_BITS // 4)) - 1} AS band_bits
  FROM shv CROSS JOIN (SELECT unnest(range(4)) AS band) bb),
scand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         a.simhash AS sa, b.simhash AS sb
  FROM banded a JOIN banded b
    ON a.band = b.band AND a.band_bits = b.band_bits
   AND a.doc_id < b.doc_id)
SELECT doc_a, doc_b, CAST(bit_count(xor(sa, sb)) AS INT) AS hamming
FROM scand WHERE bit_count(xor(sa, sb)) <= 3""")

ORACLE["graph_triangles"] = _q("""
, comention AS (
  SELECT DISTINCT x.canonical_id AS src, y.canonical_id AS dst
  FROM linked x JOIN linked y
    ON x.doc_id = y.doc_id AND x.canonical_id < y.canonical_id),
und AS (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM comention WHERE src <> dst),
tri AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM und e1
  JOIN und e2 ON e2.a = e1.b
  JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b),
corners AS (
  SELECT x AS node FROM tri UNION ALL SELECT y FROM tri
  UNION ALL SELECT z FROM tri)
SELECT node, CAST(COUNT(*) AS BIGINT) AS n_triangles
FROM corners GROUP BY node""", LINK_CTES)

ORACLE["entity_first_seen"] = _q("""
SELECT first_day, CAST(COUNT(*) AS BIGINT) AS n_new_entities
FROM (SELECT canonical_id,
             CAST(MIN((1704067200 + doc_id) // 86400) AS BIGINT) AS first_day
      FROM linked GROUP BY canonical_id)
GROUP BY first_day""", LINK_CTES)


# ---------------------------------------------------------------------------
# STAGED ORACLES (round-5 registration queue).  These keys are NOT in
# driver_queries.QUERIES yet — the registry froze early in round 4 per
# the snapshot-sync protocol — so oracle_sql() filters them out of the
# driver contract.  They are pytest-verified against the Spark
# operators NOW (tests/test_round5_oracles.py) so registering them
# next round is a two-line diff with zero correctness risk.
# ---------------------------------------------------------------------------

# Threshold-exact Lee-et-al spans: the stride-1 form of
# duplicated_spans (operators/substrings.substring_dups at min_len=20).
ORACLE["substring_spans"] = f"""
WITH {_passage_ctes(win=20, stride=1)},
cnt AS (
  SELECT passage_hash, COUNT(DISTINCT doc_id) AS n_docs
  FROM wh GROUP BY passage_hash),
dupw AS (
  SELECT DISTINCT w.doc_id, w.win_start
  FROM wh w JOIN cnt c USING (passage_hash) WHERE c.n_docs >= 2),
{_island_ctes(win=20)}
SELECT doc_id, CAST(s AS INT) AS span_start, CAST(e AS INT) AS span_end,
       CAST(n_windows AS BIGINT) AS n_windows
FROM spans"""

# Threshold-exact cut (operators/substrings.cut_substring_dups).
ORACLE["cut_substrings"] = f"""
WITH {_passage_ctes(win=20, stride=1)},
keeper AS (
  SELECT passage_hash, MIN(doc_id) AS keep_doc,
         COUNT(DISTINCT doc_id) AS n_docs
  FROM wh GROUP BY passage_hash),
dupw AS (
  SELECT DISTINCT w.doc_id, w.win_start
  FROM wh w JOIN keeper k USING (passage_hash)
  WHERE k.n_docs >= 2 AND w.doc_id <> k.keep_doc),
{_island_ctes(win=20)},
cuts AS (SELECT doc_id, SUM(e - s) AS n_cut FROM spans GROUP BY doc_id),
kept AS (
  SELECT t.doc_id, t.token, t.tok_idx FROM tk t
  WHERE NOT EXISTS (
    SELECT 1 FROM spans sp
    WHERE sp.doc_id = t.doc_id
      AND t.tok_idx >= sp.s AND t.tok_idx < sp.e)),
rebuilt AS (
  SELECT doc_id, string_agg(token, ' ' ORDER BY tok_idx) AS text_clean
  FROM kept GROUP BY doc_id)
SELECT d.doc_id, COALESCE(r.text_clean, '') AS text_clean,
       CAST(COALESCE(c.n_cut, 0) AS BIGINT) AS n_cut_tokens
FROM documents d
LEFT JOIN rebuilt r ON d.doc_id = r.doc_id
LEFT JOIN cuts c ON d.doc_id = c.doc_id"""

# Suffix-array maximal repeats (operators/substrings.maximal_repeats,
# min_len=20): suffixes as space-joined strings sort identically to
# token-sequence order because the separator (0x20) is strictly below
# every token byte (tokens are split ON whitespace) and end-of-doc
# sorts below the separator; LCP by first-mismatch scan over the doc
# token lists.  All-integer outputs — no float-order hazards.
ORACLE["maximal_repeats"] = f"""
WITH rt AS (
  SELECT doc_id,
         unnest(string_split_regex(text, '{SEP_CLASS}')) AS tok,
         generate_subscripts(string_split_regex(text, '{SEP_CLASS}'), 1) AS piece_idx
  FROM documents),
tk AS (
  SELECT doc_id, tok AS token,
         CAST(ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY piece_idx) - 1 AS INT) AS tok_idx
  FROM rt WHERE tok <> ''),
docarr AS (
  SELECT doc_id, list(token ORDER BY tok_idx) AS toks,
         COUNT(*) AS n FROM tk GROUP BY doc_id),
suf AS (
  SELECT t.doc_id, t.tok_idx,
         array_to_string(a.toks[t.tok_idx + 1:], ' ') AS sstr
  FROM tk t JOIN docarr a USING (doc_id)),
ord_ AS (
  SELECT doc_id, tok_idx,
         lead(doc_id) OVER w AS nd, lead(tok_idx) OVER w AS ni
  FROM suf WINDOW w AS (ORDER BY sstr, doc_id, tok_idx)),
pairs AS (
  SELECT doc_id AS doc_a, tok_idx AS idx_a, nd AS doc_b, ni AS idx_b
  FROM ord_ WHERE nd IS NOT NULL),
lcps AS (
  SELECT p.doc_a, p.idx_a, p.doc_b, p.idx_b,
         (SELECT COALESCE(MIN(i),
                 least(la.n - p.idx_a, lb.n - p.idx_b) + 1) - 1
          FROM unnest(generate_series(
                 1, least(la.n - p.idx_a, lb.n - p.idx_b))) t(i)
          WHERE la.toks[p.idx_a + i] <> lb.toks[p.idx_b + i]) AS lcp
  FROM pairs p
  JOIN docarr la ON la.doc_id = p.doc_a
  JOIN docarr lb ON lb.doc_id = p.doc_b)
SELECT doc_a, CAST(idx_a AS INT) AS idx_a, doc_b,
       CAST(idx_b AS INT) AS idx_b, CAST(lcp AS INT) AS lcp
FROM lcps WHERE lcp >= 20"""


def _lpa_sql(n_rounds: int = 5) -> str:
    """Sync label propagation over the entity co-occurrence graph,
    rounds unrolled as chained CTEs (graph_algos.label_propagation's
    exact semantics: most-frequent neighbor label, min-label
    tie-break, isolated nodes keep their own label)."""
    blocks = ["lab0 AS (SELECT node, node AS label FROM cc_nodes)"]
    for r in range(1, n_rounds + 1):
        blocks.append(f"""freq{r} AS (
  SELECT e.src AS node, l.label, COUNT(*) AS n
  FROM sym_edges e JOIN lab{r - 1} l ON e.dst = l.node
  GROUP BY e.src, l.label),
pick{r} AS (
  SELECT node, label FROM (
    SELECT node, label,
           ROW_NUMBER() OVER (PARTITION BY node
                              ORDER BY n DESC, label ASC) AS rk
    FROM freq{r}) WHERE rk = 1),
lab{r} AS (
  SELECT c.node, COALESCE(p.label, c.node) AS label
  FROM cc_nodes c LEFT JOIN pick{r} p ON c.node = p.node)""")
    return ",\n".join(blocks)


ORACLE["lpa_communities"] = _q("SELECT node, label FROM lab5",
                               LINK_CTES, _lpa_sql(5))


# ---------------------------------------------------------------------------
# quality_model: the learned quality classifier's full-batch GD unrolled
# as chained CTEs (the pagerank/graph_ppr/cc_update pattern applied to
# training) — upgrades the last-but-one rows-only driver check to a
# value-exact oracle.  Every cross-engine hazard is controlled: the
# per-row gradient contributions are floor-quantized to integer
# micro-units BEFORE summing (order-independent), the float weight
# updates replicate train_quality_classifier's exact expression order
# (w - (lr * (g / 1e6)) / n, IEEE doubles fold identically when both
# engines fold in the same order), and the feature expressions are the
# same integer-ratio arithmetic both sides.  exp() is the one libm
# call; the 1e-6 quantization floor absorbs sub-ulp divergence
# (verified empirically at sf0.001/sf0.01/sf0.1).
# ---------------------------------------------------------------------------

_QM_FEATS = [
    ("m_short", "least(greatest((n_tokens - 20) / 20, -1.0), 1.0)"),
    ("m_divers", "least(greatest((n_distinct_tokens / greatest(n_tokens, 1)"
                 " - 0.35) / 0.35, -1.0), 1.0)"),
    ("m_stop", "least(greatest(20 * n_stopwords / greatest(n_tokens, 1)"
               " - 1.0, -1.0), 1.0)"),
    ("m_min", "least(m_short, m_divers, m_stop)"),
]


def _qm_hex6(expr: str) -> str:
    """First-6-hex-chars-of-md5 -> integer (Spark's conv(substr(md5(x),
    1,6),16,10)) as digit-position arithmetic."""
    digit = ("(instr('0123456789abcdef', "
             "substr(md5({e}), {i}, 1)) - 1)")
    terms = [f"{16 ** (6 - i)} * " + digit.format(e=expr, i=i)
             for i in range(1, 7)]
    return "(" + " + ".join(terms) + ")"


def _quality_model_sql(epochs: int = 60, lr: float = 8.0) -> str:
    """feats (MATERIALIZED — referenced once per epoch) -> 60 chained
    (grad, weights) CTE pairs -> final scoring."""
    z = ("(((w.b + w.w1 * t.m_short) + w.w2 * t.m_divers)"
         " + w.w3 * t.m_stop) + w.w4 * t.m_min")
    err = f"(1.0 / (1.0 + exp(-({z}))) - t.label)"
    blocks = [f"""feat0 AS (
  SELECT q.doc_id,
         {_QM_FEATS[0][1]} AS m_short,
         {_QM_FEATS[1][1]} AS m_divers,
         {_QM_FEATS[2][1]} AS m_stop,
         CASE WHEN n_tokens >= 20
                   AND n_distinct_tokens * 100 >= n_tokens * 35
                   AND 20 * n_stopwords >= n_tokens
              THEN 1 ELSE 0 END AS label,
         CASE WHEN {_qm_hex6('CAST(q.doc_id AS VARCHAR)')} % 100 < 80
              THEN 1 ELSE 0 END AS is_train
  FROM qual q),
feats AS MATERIALIZED (
  SELECT doc_id, m_short, m_divers, m_stop,
         least(m_short, m_divers, m_stop) AS m_min, label, is_train
  FROM feat0),
tr AS MATERIALIZED (SELECT * FROM feats WHERE is_train = 1),
ntr AS (SELECT COUNT(*) AS n FROM tr),
w0 AS (SELECT 0.0 AS b, 0.0 AS w1, 0.0 AS w2, 0.0 AS w3, 0.0 AS w4)"""]
    for e in range(1, epochs + 1):
        blocks.append(f"""g{e} AS MATERIALIZED (
  SELECT SUM(CAST(floor({err} * 1000000.0) AS BIGINT)) AS g0,
         SUM(CAST(floor({err} * t.m_short * 1000000.0) AS BIGINT)) AS g1,
         SUM(CAST(floor({err} * t.m_divers * 1000000.0) AS BIGINT)) AS g2,
         SUM(CAST(floor({err} * t.m_stop * 1000000.0) AS BIGINT)) AS g3,
         SUM(CAST(floor({err} * t.m_min * 1000000.0) AS BIGINT)) AS g4
  FROM tr t, w{e - 1} w),
w{e} AS MATERIALIZED (
  SELECT w.b - ({lr} * (g.g0 / 1000000.0)) / ntr.n AS b,
         w.w1 - ({lr} * (g.g1 / 1000000.0)) / ntr.n AS w1,
         w.w2 - ({lr} * (g.g2 / 1000000.0)) / ntr.n AS w2,
         w.w3 - ({lr} * (g.g3 / 1000000.0)) / ntr.n AS w3,
         w.w4 - ({lr} * (g.g4 / 1000000.0)) / ntr.n AS w4
  FROM w{e - 1} w, g{e} g, ntr)""")
    zs = z.replace("t.", "f.")
    blocks.append(f"""scored AS (
  SELECT f.doc_id, f.label,
         CAST(floor(({zs}) * 1000000.0) AS BIGINT) AS margin_micro6,
         f.is_train
  FROM feats f, w{epochs} w)""")
    return ",\n".join(blocks)


ORACLE["quality_model"] = _assemble(
    GAZ, toks_ctes(), QUALITY_CTES, _quality_model_sql(60, 8.0),
    select=("SELECT doc_id, CAST(label AS INT) AS label, "
            "CAST(CASE WHEN margin_micro6 >= 0 THEN 1 ELSE 0 END AS INT)"
            " AS pred_keep, margin_micro6, CAST(is_train AS INT) AS is_train "
            "FROM scored"))


# ---------------------------------------------------------------------------
# mentions_perceptron: the batch-perceptron learned NER stage
# (functions/batch_perceptron.py) with training unrolled as chained
# MATERIALIZED CTEs — the LAST rows-only driver key upgraded to a
# value-exact oracle.  Every training decision is integer arithmetic
# (integer weights, integer scores, argmax ties to the smallest label
# index), so the unrolled epochs bit-reproduce the Spark weights; the
# span decode reuses the mentions_model chunk machinery over the
# PREDICTED labels.
# ---------------------------------------------------------------------------

def _bp_bucket(expr: str) -> str:
    """int(md5(x)[:8], 16) % 2**17 as digit-position arithmetic (the
    perceptron.token_features hash, D_BUCKETS = 131072)."""
    digit = ("(instr('0123456789abcdef', "
             "substr(md5({e}), {i}, 1)) - 1)")
    terms = [f"{16 ** (8 - i)} * " + digit.format(e=expr, i=i)
             for i in range(1, 9)]
    return "((" + " + ".join(terms) + ") % 131072)"


#: identical template to batch_perceptron.FEATURE_EXPRS, with
#: DuckDB's regexp_matches in place of Spark's regexp_like (same
#: anchored-ASCII semantics).
_BP_FEATURE_EXPRS = [
    "'w=' || ltok",
    "'p3=' || substr(ltok, 1, 3)",
    "'p4=' || substr(ltok, 1, 4)",
    "'s3=' || CASE WHEN length(ltok) <= 3 THEN ltok"
    " ELSE substr(ltok, length(ltok) - 2, 3) END",
    "'s4=' || CASE WHEN length(ltok) <= 4 THEN ltok"
    " ELSE substr(ltok, length(ltok) - 3, 4) END",
    "'sh=' || CASE WHEN regexp_matches(token, '^[0-9]+$') THEN 'd'"
    " WHEN regexp_matches(token, '^[a-z]+$') THEN 'a'"
    " WHEN regexp_matches(token, '^[A-Za-z]+$') THEN 'A'"
    " ELSE 'x' END",
    "'pw=' || ptok",
    "'nw=' || ntok",
    "'pb=' || ptok || '|' || ltok",
]


def _batch_perceptron_sql(epochs: int = 3,
                          train_docs_below: int = 200) -> str:
    from ..config import IOB2_LABELS

    labels = list(IOB2_LABELS)
    labidx_rows = ", ".join(f"({i}, '{lab}')"
                            for i, lab in enumerate(labels))
    feat_list = ", ".join(_BP_FEATURE_EXPRS)
    blocks = [f"""labidx AS (
  SELECT * FROM (VALUES {labidx_rows}) AS t(y, label)),
bp_feats AS MATERIALIZED (
  SELECT doc_id, tok_idx, {_bp_bucket('fs')} AS f
  FROM (
    SELECT doc_id, tok_idx, unnest([{feat_list}]) AS fs
    FROM (
      SELECT doc_id, tok_idx, token, lower(token) AS ltok,
             COALESCE(lag(lower(token)) OVER w, '<s>') AS ptok,
             COALESCE(lead(lower(token)) OVER w, '</s>') AS ntok
      FROM toks
      WINDOW w AS (PARTITION BY doc_id ORDER BY tok_idx)))),
bp_ftr AS MATERIALIZED (
  SELECT * FROM bp_feats WHERE doc_id < {train_docs_below}),
bp_lab_tr AS (
  SELECT t.doc_id, t.tok_idx,
         CASE WHEN c.ent_type IS NULL THEN 'O'
              WHEN t.char_start = c.first_ts THEN 'B-' || c.ent_type
              ELSE 'I-' || c.ent_type END AS label
  FROM toks t LEFT JOIN (
    SELECT * FROM (
      SELECT t2.doc_id, t2.tok_idx, m.ent_type, m.first_ts,
             ROW_NUMBER() OVER (PARTITION BY t2.doc_id, t2.tok_idx
                 ORDER BY m.start DESC, m."end" DESC) AS rn
      FROM toks t2 JOIN (
        SELECT m0.doc_id, m0.ent_type, m0.start, m0."end",
               MIN(t3.char_start) AS first_ts
        FROM mentions m0 JOIN toks t3
          ON t3.doc_id = m0.doc_id
         AND t3.char_start >= m0.start AND t3.char_end <= m0."end"
        GROUP BY m0.doc_id, m0.ent_type, m0.start, m0."end") m
        ON t2.doc_id = m.doc_id
       AND t2.char_start >= m.start AND t2.char_end <= m."end")
    WHERE rn = 1) c
  ON t.doc_id = c.doc_id AND t.tok_idx = c.tok_idx
  WHERE t.doc_id < {train_docs_below}),
bp_gold AS MATERIALIZED (
  SELECT g.doc_id, g.tok_idx, l.y AS y_gold
  FROM bp_lab_tr g JOIN labidx l ON g.label = l.label),
bp_grid AS MATERIALIZED (
  SELECT g.doc_id, g.tok_idx, l.y FROM bp_gold g CROSS JOIN labidx l),
bpw0 AS (SELECT CAST(NULL AS BIGINT) AS f, CAST(NULL AS INT) AS y,
                CAST(NULL AS BIGINT) AS wt WHERE false)"""]
    for e in range(1, epochs + 1):
        blocks.append(f"""bpsc{e} AS MATERIALIZED (
  SELECT t.doc_id, t.tok_idx, w.y, SUM(w.wt) AS s
  FROM bp_ftr t JOIN bpw{e - 1} w ON t.f = w.f
  GROUP BY t.doc_id, t.tok_idx, w.y),
bpmis{e} AS MATERIALIZED (
  SELECT p.doc_id, p.tok_idx, p.y_pred, g.y_gold
  FROM (
    SELECT doc_id, tok_idx, y AS y_pred FROM (
      SELECT g.doc_id, g.tok_idx, g.y,
             ROW_NUMBER() OVER (PARTITION BY g.doc_id, g.tok_idx
                 ORDER BY COALESCE(s.s, 0) DESC, g.y ASC) AS rk
      FROM bp_grid g LEFT JOIN bpsc{e} s
        ON g.doc_id = s.doc_id AND g.tok_idx = s.tok_idx
       AND g.y = s.y)
    WHERE rk = 1) p
  JOIN bp_gold g ON p.doc_id = g.doc_id AND p.tok_idx = g.tok_idx
  WHERE p.y_pred <> g.y_gold),
bpw{e} AS MATERIALIZED (
  SELECT f, y, SUM(wt) AS wt FROM (
    SELECT f, y, wt FROM bpw{e - 1}
    UNION ALL
    SELECT t.f, m.y_gold AS y, 1 AS wt
    FROM bp_ftr t JOIN bpmis{e} m
      ON t.doc_id = m.doc_id AND t.tok_idx = m.tok_idx
    UNION ALL
    SELECT t.f, m.y_pred AS y, -1 AS wt
    FROM bp_ftr t JOIN bpmis{e} m
      ON t.doc_id = m.doc_id AND t.tok_idx = m.tok_idx)
  GROUP BY f, y HAVING SUM(wt) <> 0)""")
    blocks.append(f"""bpscf AS MATERIALIZED (
  SELECT t.doc_id, t.tok_idx, w.y, SUM(w.wt) AS s
  FROM bp_feats t JOIN bpw{epochs} w ON t.f = w.f
  GROUP BY t.doc_id, t.tok_idx, w.y),
bp_pred AS MATERIALIZED (
  SELECT doc_id, tok_idx, y AS y_pred FROM (
    SELECT g.doc_id, g.tok_idx, g.y,
           ROW_NUMBER() OVER (PARTITION BY g.doc_id, g.tok_idx
               ORDER BY COALESCE(s.s, 0) DESC, g.y ASC) AS rk
    FROM (SELECT t.doc_id, t.tok_idx, l.y
          FROM toks t CROSS JOIN labidx l) g
    LEFT JOIN bpscf s
      ON g.doc_id = s.doc_id AND g.tok_idx = s.tok_idx AND g.y = s.y)
  WHERE rk = 1),
bp_plab AS (
  SELECT t.doc_id, t.url, t.tok_idx, t.char_start, t.char_end, t.text,
         l.label
  FROM toks t
  JOIN bp_pred p ON t.doc_id = p.doc_id AND t.tok_idx = p.tok_idx
  JOIN labidx l ON p.y_pred = l.y),
bp_lab2 AS (
  SELECT *, substr(label, 1, 1) AS tag, substr(label, 3) AS ltype,
         LAG(label) OVER (PARTITION BY doc_id ORDER BY tok_idx) AS prev
  FROM bp_plab),
bp_chunk_toks AS (
  SELECT *, CASE WHEN tag = 'B' OR prev IS NULL OR prev = 'O'
                   OR substr(prev, 3) <> ltype THEN 1 ELSE 0 END AS is_start
  FROM bp_lab2 WHERE label <> 'O'),
bp_chunked AS (
  SELECT *, SUM(is_start) OVER (PARTITION BY doc_id ORDER BY tok_idx
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS chunk_id
  FROM bp_chunk_toks),
bp_spans AS (
  SELECT doc_id, url, MIN(ltype) AS ent_type,
         CAST(MIN(char_start) AS INT) AS start,
         CAST(MAX(char_end) AS INT) AS "end",
         substr(MIN(text), MIN(char_start) + 1,
                MAX(char_end) - MIN(char_start)) AS ent_text
  FROM bp_chunked GROUP BY doc_id, url, chunk_id)""")
    return ",\n".join(blocks)


ORACLE["mentions_perceptron"] = _q(
    """
SELECT doc_id, url,
       'T' || CAST(ROW_NUMBER() OVER (
           PARTITION BY url ORDER BY start, "end", ent_type) AS VARCHAR) AS ent_id,
       ent_type, CAST(start AS INT) AS start, CAST("end" AS INT) AS "end", ent_text
FROM bp_spans""",
    _batch_perceptron_sql(3, 200))


# ---- round-5 registrations: product quantization (operators/pq.py) -------
#
# The PQ chain is integer-quantized at every decision point
# (floor(x * 1e6) distances, quantized-mean Lloyd updates, integer ADC
# sums), so the oracle replays seed -> assign -> update -> encode ->
# search exactly.  The only float folds are the per-subvector L2
# distances, computed on BOTH engines as an in-index-order dot product
# of the elementwise difference with itself (Spark zip_with+aggregate
# == DuckDB list_dot_product — the same cross-engine-exact fold the
# embedding similarity oracles rely on).  m=8, k=16, dsub=8 matches
# the driver queries (fixture embeddings are dim 64 at every SF).


def _pq_ctes(m: int = 8, k: int = 16, dsub: int = 8,
             n_queries: int = 20,
             base_select: "str | None" = None) -> str:
    """The PQ chain CTEs (seed -> assign -> quantized-mean update ->
    round-1 codebook -> encode -> query LUT).  ``base_select``
    overrides the (vec_id, v DOUBLE[]) source — the IVF-PQ staged
    oracle points it at the coarse-residual CTE instead of the raw
    embeddings table."""
    base = (base_select or
            "SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v"
            " FROM embeddings")
    dist = ("CAST(floor(1000000 * list_dot_product("
            "list_transform(list_zip(s.sv, c.cv), x -> x[1] - x[2]), "
            "list_transform(list_zip(s.sv, c.cv), x -> x[1] - x[2])))"
            " AS BIGINT)")
    return f"""
pqbase AS (
  {base}),
pqsv AS MATERIALIZED (
  SELECT vec_id, CAST(s AS INT) AS sub,
         list_slice(v, s * {dsub} + 1, s * {dsub} + {dsub}) AS sv
  FROM pqbase, unnest(generate_series(0, {m - 1})) AS t(s)),
pqseed AS MATERIALIZED (
  SELECT sub,
         CAST(ROW_NUMBER() OVER (PARTITION BY sub ORDER BY vec_id) - 1
              AS INT) AS code,
         sv AS cv
  FROM pqsv
  WHERE vec_id IN (SELECT vec_id FROM pqbase ORDER BY vec_id LIMIT {k})),
pqasg0 AS MATERIALIZED (
  SELECT vec_id, sub, code FROM (
    SELECT s.vec_id, s.sub, c.code,
           ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.sub
               ORDER BY {dist}, c.code) AS r
    FROM pqsv s JOIN pqseed c USING (sub))
  WHERE r = 1),
pqq6 AS (
  SELECT vec_id, sub, CAST(i - 1 AS INT) AS dim,
         CAST(floor(sv[CAST(i AS INT)] * 1000000) AS BIGINT) AS q6
  FROM pqsv, unnest(generate_series(1, {dsub})) AS t(i)),
pqupd AS MATERIALIZED (
  SELECT a.sub, a.code, q.dim,
         CAST(COUNT(*) AS BIGINT) AS n_subvecs,
         CAST(SUM(q.q6) AS BIGINT) AS sum_q6,
         CAST(floor(CAST(SUM(q.q6) AS DOUBLE) / COUNT(*)) AS BIGINT)
           AS mean_q6
  FROM pqasg0 a JOIN pqq6 q ON a.vec_id = q.vec_id AND a.sub = q.sub
  GROUP BY 1, 2, 3),
pqseedd AS (
  SELECT sub, code, CAST(i - 1 AS INT) AS dim, cv[CAST(i AS INT)] AS sval
  FROM pqseed, unnest(generate_series(1, {dsub})) AS t(i)),
pqcb1 AS MATERIALIZED (
  SELECT s.sub, s.code,
         list(COALESCE(CAST(u.mean_q6 AS DOUBLE) / 1000000.0, s.sval)
              ORDER BY s.dim) AS cv
  FROM pqseedd s LEFT JOIN pqupd u
    ON u.sub = s.sub AND u.code = s.code AND u.dim = s.dim
  GROUP BY 1, 2),
pqasg1 AS MATERIALIZED (
  SELECT vec_id, sub, code FROM (
    SELECT s.vec_id, s.sub, c.code,
           ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.sub
               ORDER BY {dist}, c.code) AS r
    FROM pqsv s JOIN pqcb1 c USING (sub))
  WHERE r = 1),
pqlut AS MATERIALIZED (
  SELECT s.vec_id AS query_id, s.sub, c.code, {dist} AS d_q6
  FROM pqsv s JOIN pqcb1 c USING (sub)
  WHERE s.vec_id IN
    (SELECT vec_id FROM pqbase ORDER BY vec_id LIMIT {n_queries}))"""


ORACLE["pq_codebook"] = "WITH " + _pq_ctes() + """
SELECT CAST(sub AS INT) AS sub, CAST(code AS INT) AS code, dim,
       n_subvecs, sum_q6, mean_q6
FROM pqupd"""

ORACLE["pq_codes"] = "WITH " + _pq_ctes() + """
SELECT vec_id, CAST(sub AS INT) AS sub, CAST(code AS INT) AS code
FROM pqasg1"""

ORACLE["pq_search"] = "WITH " + _pq_ctes() + """
SELECT query_id, rank, neighbor_id, adist_q6 FROM (
  SELECT query_id, neighbor_id, adist_q6,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
             ORDER BY adist_q6, neighbor_id) AS INT) AS rank
  FROM (
    SELECT l.query_id, a.vec_id AS neighbor_id,
           CAST(SUM(l.d_q6) AS BIGINT) AS adist_q6
    FROM pqasg1 a JOIN pqlut l ON l.sub = a.sub AND l.code = a.code
    WHERE a.vec_id <> l.query_id
    GROUP BY 1, 2))
WHERE rank <= 5"""


# ---- STAGED round-6 oracles (NOT registered: the round-5 registry is
# ---- frozen; tests/test_round6_oracles.py verifies these cross-engine
# ---- now so next round's registration is a two-line diff) ------------


def _kcore_sql(n_rounds: int = 8, k: int = 2) -> str:
    """k-core peel over the entity co-occurrence graph, rounds
    unrolled as chained MATERIALIZED CTEs (graph_algos.k_core's exact
    semantics: drop alive nodes with alive-degree < k each round;
    rounds past convergence are no-ops).  Each alive{r} is referenced
    twice by round r+1, so materialization is load-bearing (chained
    re-evaluation is exponential otherwise)."""
    blocks = ["alive0 AS MATERIALIZED (SELECT node FROM cc_nodes)"]
    for r in range(1, n_rounds + 1):
        blocks.append(f"""alive{r} AS MATERIALIZED (
  SELECT e.src AS node
  FROM sym_edges e
  JOIN alive{r - 1} a ON e.dst = a.node
  JOIN alive{r - 1} b ON e.src = b.node
  GROUP BY e.src HAVING COUNT(*) >= {k})""")
    return ",\n".join(blocks)


KCORE_ROUNDS = 8

ORACLE["kcore_nodes"] = _q(
    f"""
SELECT c.node,
       CAST(CASE WHEN a.node IS NOT NULL THEN 1 ELSE 0 END AS INT)
         AS in_core
FROM cc_nodes c LEFT JOIN alive{KCORE_ROUNDS} a ON c.node = a.node""",
    LINK_CTES, _kcore_sql(KCORE_ROUNDS, 2))

# pq_rerank: exact-cosine rerank of the ADC top-50 shortlist
# (IVFADC+R accuracy mode of operators/pq.pq_topk(rerank=50)) — the
# shortlist comes from the registered PQ chain's CTEs, the rerank uses
# the same quantized-cosine expression as the ivf_topk/similarity
# oracles (cross-engine exact on this fold order).
_RERANK_SIM = ("CAST(floor(1000000 * list_dot_product(q.v, c.v) "
               "/ (q.nrm * c.nrm)) AS BIGINT)")

ORACLE["pq_rerank"] = _assemble(
    SIM_CTES.lstrip(",").strip(), _pq_ctes(),
    select=f"""
, pqadc_r AS MATERIALIZED (
  SELECT l.query_id, a.vec_id AS neighbor_id,
         CAST(SUM(l.d_q6) AS BIGINT) AS adist_q6
  FROM pqasg1 a JOIN pqlut l ON l.sub = a.sub AND l.code = a.code
  WHERE a.vec_id <> l.query_id
  GROUP BY 1, 2),
pqshort AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY query_id
               ORDER BY adist_q6, neighbor_id) AS r
    FROM pqadc_r) WHERE r <= 50)
SELECT query_id, rank, neighbor_id, sim_micro6 FROM (
  SELECT s.query_id, s.neighbor_id, {_RERANK_SIM} AS sim_micro6,
         CAST(ROW_NUMBER() OVER (PARTITION BY s.query_id
             ORDER BY {_RERANK_SIM} DESC, s.neighbor_id) AS INT) AS rank
  FROM pqshort s
  JOIN normed q ON q.vec_id = s.query_id
  JOIN normed c ON c.vec_id = s.neighbor_id
) WHERE rank <= 5""")


# ivfpq_codes: the composed index row (coarse cell + m residual PQ
# codes) — coarse assignment is the registered ivf_assign chain (seed
# centroids = first n_cells vectors, cosine argmax), residuals are an
# elementwise list subtraction, and the PQ chain runs UNCHANGED over
# the residual frame via _pq_ctes(base_select=...).
_IVF_RES_CTES = """
ivfcents AS (SELECT vec_id AS cell, v AS cv, nrm AS cn
             FROM normed WHERE vec_id < 8),
ivfscored AS (
  SELECT n.vec_id, c.cell,
         CAST(floor(1000000 * list_dot_product(n.v, c.cv)
              / (n.nrm * c.cn)) AS BIGINT) AS s6
  FROM normed n CROSS JOIN ivfcents c),
ivfasg AS MATERIALIZED (
  SELECT vec_id, cell FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
        ORDER BY s6 DESC, cell) AS r
    FROM ivfscored) WHERE r = 1),
ivfresid AS MATERIALIZED (
  SELECT b.vec_id, a.cell,
         list_transform(list_zip(b.v, cb.v), x -> x[1] - x[2]) AS v
  FROM base b JOIN ivfasg a USING (vec_id)
  JOIN base cb ON cb.vec_id = a.cell)"""

ORACLE["ivfpq_codes"] = _assemble(
    SIM_CTES.lstrip(",").strip(), _IVF_RES_CTES.strip(),
    _pq_ctes(base_select="SELECT vec_id, v FROM ivfresid"),
    select="""
SELECT p.vec_id, CAST(a.cell AS INT) AS cell,
       CAST(p.sub AS INT) AS sub, CAST(p.code AS INT) AS code
FROM pqasg1 p JOIN ivfasg a USING (vec_id)""")


def _ktruss_sql(n_rounds: int = 6, k: int = 3) -> str:
    """k-truss edge peel, rounds unrolled as chained MATERIALIZED
    CTEs (graph_algos.k_truss semantics: each round counts per-edge
    triangle support over alive edges via the ordered a<b<c
    enumeration, then drops edges with support < k-2; rounds past
    convergence are no-ops).  Each truss{r} is referenced three times
    by round r+1's triangle join, so materialization is load-bearing."""
    blocks = ["truss0 AS MATERIALIZED (SELECT src AS a, dst AS b FROM comention)"]
    for r in range(1, n_rounds + 1):
        p = r - 1
        blocks.append(f"""tri{r} AS MATERIALIZED (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM truss{p} e1
  JOIN truss{p} e2 ON e2.a = e1.b
  JOIN truss{p} e3 ON e3.a = e1.a AND e3.b = e2.b),
truss{r} AS MATERIALIZED (
  SELECT a, b FROM (
    SELECT x AS a, y AS b FROM tri{r}
    UNION ALL SELECT y AS a, z AS b FROM tri{r}
    UNION ALL SELECT x AS a, z AS b FROM tri{r})
  GROUP BY a, b HAVING COUNT(*) >= {k - 2})""")
    return ",\n".join(blocks)


KTRUSS_ROUNDS = 6
# k=13 on the near-clique co-mention fixture: the 13-truss keeps
# the dense entity core (90 edges) and peels the 11 rare-entity
# periphery edges; smaller k is non-discriminating (the whole
# graph survives its own triangle support).
KTRUSS_K = 13

COMENTION_CTES = """
comention AS MATERIALIZED (
  SELECT DISTINCT x.canonical_id AS src, y.canonical_id AS dst
  FROM linked x JOIN linked y
    ON x.doc_id = y.doc_id AND x.canonical_id < y.canonical_id),
com_sym AS (SELECT src, dst FROM comention
            UNION SELECT dst AS src, src AS dst FROM comention)"""

ORACLE["ktruss_edges"] = _q(
    f"""
SELECT e.src, e.dst,
       CAST(CASE WHEN t.a IS NOT NULL THEN 1 ELSE 0 END AS INT)
         AS in_truss
FROM comention e LEFT JOIN truss{KTRUSS_ROUNDS} t
  ON t.a = e.src AND t.b = e.dst""",
    LINK_CTES, COMENTION_CTES.strip(), _ktruss_sql(KTRUSS_ROUNDS, KTRUSS_K))


def _pr_chain(p: str, n_iter: int = 5, damping_pct: int = 85,
              scale: int = 10**12) -> str:
    """The pagerank_fixed integer recurrence unrolled as chained CTEs
    over an ARBITRARY prelude edge table ``{p}e(src, dst, weight)`` —
    the _pagerank_sql recurrence with prefixed CTE names, so any
    operator that composes pagerank_fixed over its own graph (e.g.
    textrank) gets an exact oracle by concatenation.  Emits
    {p}n/{p}cnt/{p}out/{p}pr0..{p}pr{n_iter}; the caller selects from
    {p}pr{n_iter}."""
    base_u = (f"(SELECT ((({100 - damping_pct} * {scale}) // 100)) // n"
              f" FROM {p}cnt)")
    blocks = [f"""{p}n AS MATERIALIZED (
  SELECT DISTINCT node FROM (
    SELECT src AS node FROM {p}e UNION ALL SELECT dst FROM {p}e)),
{p}cnt AS MATERIALIZED (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM {p}n),
{p}out AS MATERIALIZED (
  SELECT src, CAST(SUM(weight) AS BIGINT) AS out_w FROM {p}e GROUP BY 1),
{p}pr0 AS MATERIALIZED (
  SELECT node, CAST((SELECT {scale} // n FROM {p}cnt) AS BIGINT) AS rank_u
  FROM {p}n)"""]
    for i in range(1, n_iter + 1):
        blocks.append(f"""{p}d{i} AS MATERIALIZED (
  SELECT CAST(COALESCE(SUM(r.rank_u), 0) AS BIGINT) AS dang
  FROM {p}pr{i - 1} r WHERE r.node NOT IN (SELECT src FROM {p}out)),
{p}pr{i} AS MATERIALIZED (
  SELECT n2.node,
         CAST({base_u}
              + (({damping_pct} * (COALESCE(c.in_u, 0)
                   + (SELECT (SELECT dang FROM {p}d{i}) // n
                      FROM {p}cnt))) // 100)
           AS BIGINT) AS rank_u
  FROM {p}n n2 LEFT JOIN (
    SELECT e.dst AS node,
           CAST(SUM((r.rank_u * e.weight) // o.out_w) AS BIGINT) AS in_u
    FROM {p}e e JOIN {p}out o ON e.src = o.src
    JOIN {p}pr{i - 1} r ON r.node = e.src
    GROUP BY 1) c ON n2.node = c.node)""")
    return ",\n".join(blocks)


# textrank_tokens: TextRank keyword scores — integer fixed-point
# PageRank (the pagerank_fixed recurrence, rounds unrolled via
# _pr_chain) over the token co-occurrence graph (undirected edge per
# token pair within 2 positions, weight = corpus co-occurrence count;
# lead() windows both sides, no token self-join).
ORACLE["textrank_tokens"] = f"""
WITH tr_ts AS (
  SELECT doc_id, list_filter(string_split_regex(text, '[\\n \\t]'),
                             t -> t <> '') AS ts
  FROM documents),
tr_tok AS (
  SELECT doc_id, CAST(i AS INT) AS pos, ts[CAST(i AS INT)] AS tok
  FROM tr_ts, unnest(generate_series(1, len(ts))) AS t(i)),
tr_nbr AS (
  SELECT tok, lead(tok, 1) OVER w AS l1, lead(tok, 2) OVER w AS l2
  FROM tr_tok WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
tr_pair AS (
  SELECT least(tok, nbr) AS a, greatest(tok, nbr) AS b
  FROM (SELECT tok, l1 AS nbr FROM tr_nbr
        UNION ALL SELECT tok, l2 FROM tr_nbr)
  WHERE nbr IS NOT NULL AND nbr <> tok),
tr_und AS MATERIALIZED (
  SELECT a, b, CAST(COUNT(*) AS BIGINT) AS weight
  FROM tr_pair GROUP BY 1, 2),
tr_e AS MATERIALIZED (
  SELECT a AS src, b AS dst, weight FROM tr_und
  UNION ALL SELECT b AS src, a AS dst, weight FROM tr_und),
{_pr_chain('tr_')}
SELECT node AS token, CAST(rank_u // 1000000 AS BIGINT) AS rank_micro6
FROM tr_pr5"""


# link_pred: link-prediction scores over the entity co-mention graph
# (graph_algos.link_prediction) — every non-edge 2-hop pair with its
# common-neighbor count and floor-scaled neighborhood Jaccard; the
# wedge join / anti-join / degree arithmetic replayed in SQL, all
# BIGINT so the // matches Spark's DIV exactly.
ORACLE["link_pred"] = _q(
    """
SELECT n.src, n.dst, n.cn,
       CAST((n.cn * 1000000) // (da.deg + db.deg - n.cn) AS BIGINT)
         AS jaccard_micro6
FROM lpnon n
JOIN lpdeg da ON n.src = da.node
JOIN lpdeg db ON n.dst = db.node""",
    LINK_CTES, COMENTION_CTES.strip(), """
lpdeg AS MATERIALIZED (
  SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS deg
  FROM com_sym GROUP BY src),
lpcand AS MATERIALIZED (
  SELECT e1.dst AS src, e2.dst AS dst, CAST(COUNT(*) AS BIGINT) AS cn
  FROM com_sym e1 JOIN com_sym e2
    ON e1.src = e2.src AND e1.dst < e2.dst
  GROUP BY 1, 2),
lpnon AS (
  SELECT c.src, c.dst, c.cn
  FROM lpcand c LEFT JOIN comention e
    ON c.src = e.src AND c.dst = e.dst
  WHERE e.src IS NULL)""".strip())


def _walks_sql(walk_len: int = 4, walks_per_node: int = 2) -> str:
    """Deterministic DeepWalk corpus, steps unrolled as chained CTEs
    (graph_algos.random_walks semantics: next hop = the neighbor
    minimizing md5(start:walk:step:neighbor), ties by neighbor id;
    dead-end walks stop — their later steps are absent)."""
    blocks = [f"""walk0 AS MATERIALIZED (
  SELECT node AS start, CAST(w AS INT) AS walk, 0 AS step, node
  FROM cc_nodes,
    unnest(generate_series(0, {walks_per_node - 1})) AS t(w))"""]
    for t in range(1, walk_len + 1):
        blocks.append(f"""walk{t} AS MATERIALIZED (
  SELECT start, walk, {t} AS step, node FROM (
    SELECT p.start, p.walk, e.dst AS node,
           ROW_NUMBER() OVER (PARTITION BY p.start, p.walk
             ORDER BY md5(p.start || ':' || CAST(p.walk AS VARCHAR)
                          || ':' || '{t}' || ':' || e.dst), e.dst) AS r
    FROM walk{t - 1} p JOIN com_sym e ON e.src = p.node)
  WHERE r = 1)""")
    return ",\n".join(blocks)


WALK_LEN, WALKS_PER_NODE = 4, 2

ORACLE["entity_walks"] = _q(
    "SELECT start, walk, CAST(step AS INT) AS step, node FROM ("
    + "\nUNION ALL ".join(f"SELECT * FROM walk{t}"
                          for t in range(WALK_LEN + 1)) + ")",
    LINK_CTES, COMENTION_CTES.strip(), _walks_sql(WALK_LEN, WALKS_PER_NODE))


# hll_shingles: the deterministic-HyperLogLog register table of the
# per-doc-distinct 3-gram shingle stream (functions/sketches.
# hll_shingle_sketch over operators/dedup.shingles) — same
# md5-hex-nibble arithmetic as the Spark side: register = first 2
# nibbles (256 registers), rho = 1 + leading zero bits of the next 12
# nibbles (all-zero tail => 49).
_HLL_TAIL = "substring(_h, 3, 12)"
ORACLE["hll_shingles"] = f"""
WITH hllts AS (
  SELECT doc_id, list_filter(string_split_regex(text, '[\\n \\t]'),
                             t -> t <> '') AS ts
  FROM documents),
hllsh AS (
  SELECT DISTINCT doc_id,
         ts[CAST(i AS INT)] || ' ' || ts[CAST(i AS INT) + 1] || ' '
           || ts[CAST(i AS INT) + 2] AS shingle
  FROM hllts, unnest(generate_series(1, len(ts) - 2)) AS t(i)),
hllh AS (SELECT md5(CAST(shingle AS VARCHAR)) AS _h FROM hllsh),
hlld AS (
  SELECT CAST((strpos('0123456789abcdef', substring(_h, 1, 1)) - 1) * 16
            + (strpos('0123456789abcdef', substring(_h, 2, 1)) - 1)
         AS INT) AS register,
         CASE WHEN length(ltrim({_HLL_TAIL}, '0')) = 0 THEN 49
              ELSE (12 - length(ltrim({_HLL_TAIL}, '0'))) * 4
                   + (CASE WHEN strpos('0123456789abcdef',
                            substring(ltrim({_HLL_TAIL}, '0'), 1, 1)) - 1 >= 8 THEN 0
                           WHEN strpos('0123456789abcdef',
                            substring(ltrim({_HLL_TAIL}, '0'), 1, 1)) - 1 >= 4 THEN 1
                           WHEN strpos('0123456789abcdef',
                            substring(ltrim({_HLL_TAIL}, '0'), 1, 1)) - 1 >= 2 THEN 2
                           ELSE 3 END) + 1
         END AS rho
  FROM hllh)
SELECT register, CAST(MAX(rho) AS INT) AS max_rho
FROM hlld GROUP BY register"""


# cm_tokens: the count-min sketch counter table of the whitespace
# token stream (functions/sketches.cm_token_sketch, depth 4 x 256
# cols) — salted hash md5(row || ':' || tok), column = first 2
# nibbles, same hex arithmetic as the HLL/minhash oracles.
ORACLE["cm_tokens"] = """
WITH cmts AS (
  SELECT list_filter(string_split_regex(text, '[\\n \\t]'),
                     t -> t <> '') AS ts
  FROM documents),
cmtok AS (
  SELECT ts[CAST(i AS INT)] AS tok
  FROM cmts, unnest(generate_series(1, len(ts))) AS t(i)),
cmrows AS (
  SELECT tok, CAST(r AS INT) AS cm_row
  FROM cmtok, unnest(generate_series(0, 3)) AS g(r)),
cmh AS (
  SELECT cm_row,
         md5(CAST(cm_row AS VARCHAR) || ':' || tok) AS _h
  FROM cmrows)
SELECT cm_row,
       CAST((strpos('0123456789abcdef', substring(_h, 1, 1)) - 1) * 16
          + (strpos('0123456789abcdef', substring(_h, 2, 1)) - 1)
       AS INT) AS cm_col,
       CAST(COUNT(*) AS BIGINT) AS cnt
FROM cmh GROUP BY 1, 2"""


# cm_token_est: point-queries of the cm_tokens sketch for every
# distinct token (a vocabulary-sized deterministic probe set),
# alongside the true corpus count — est_cnt = min over the 4 hash
# rows, so est_cnt >= true_cnt always and equality whenever no other
# token collides into all four of a token's cells.
ORACLE["cm_token_est"] = """
WITH cmts AS (
  SELECT list_filter(string_split_regex(text, '[\\n \\t]'),
                     t -> t <> '') AS ts
  FROM documents),
cmtok AS (
  SELECT ts[CAST(i AS INT)] AS tok
  FROM cmts, unnest(generate_series(1, len(ts))) AS t(i)),
cmrows AS (
  SELECT tok, CAST(r AS INT) AS cm_row
  FROM cmtok, unnest(generate_series(0, 3)) AS g(r)),
cmcells AS (
  SELECT cm_row,
         CAST((strpos('0123456789abcdef', substring(_h, 1, 1)) - 1) * 16
            + (strpos('0123456789abcdef', substring(_h, 2, 1)) - 1)
         AS INT) AS cm_col,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM (SELECT cm_row,
               md5(CAST(cm_row AS VARCHAR) || ':' || tok) AS _h
        FROM cmrows)
  GROUP BY 1, 2),
probes AS (
  SELECT DISTINCT tok AS item FROM cmtok),
pcells AS (
  SELECT item, cm_row,
         CAST((strpos('0123456789abcdef', substring(_h, 1, 1)) - 1) * 16
            + (strpos('0123456789abcdef', substring(_h, 2, 1)) - 1)
         AS INT) AS cm_col
  FROM (SELECT item, CAST(r AS INT) AS cm_row,
               md5(CAST(r AS VARCHAR) || ':' || item) AS _h
        FROM probes, unnest(generate_series(0, 3)) AS g(r))),
est AS (
  SELECT item, CAST(MIN(COALESCE(c.cnt, 0)) AS BIGINT) AS est_cnt
  FROM pcells p LEFT JOIN cmcells c USING (cm_row, cm_col)
  GROUP BY item),
truec AS (
  SELECT tok AS item, CAST(COUNT(*) AS BIGINT) AS true_cnt
  FROM cmtok GROUP BY tok)
SELECT e.item, e.est_cnt, t.true_cnt
FROM est e JOIN truec t USING (item)"""


# alias_edit_links: edit-distance alias linking
# (operators/linking.edit_verified_aliases) — observed OOV surfaces =
# corpus tail vocab UNION deterministic md5-derived typos of the
# gazetteer (one deletion + one char-duplication per alias, both
# levenshtein distance 1); trigram blocking; levenshtein verify.
# ASCII guard keeps Spark (codepoints) and DuckDB (bytes) identical.
_TYPO_POS = ("((strpos('0123456789abcdef', substring(md5(alias), 1, 1)) - 1)"
             " % length(alias)) + 1")
EDIT_LINK_CTES = f"""
typo AS (
  SELECT DISTINCT surface FROM (
    SELECT substring(alias, 1, {_TYPO_POS} - 1)
           || substring(alias, {_TYPO_POS} + 1) AS surface FROM gaz
    UNION ALL
    SELECT substring(alias, 1, {_TYPO_POS})
           || substring(alias, {_TYPO_POS}, 1)
           || substring(alias, {_TYPO_POS} + 1) AS surface FROM gaz)
  WHERE length(surface) >= 3
    AND surface NOT IN (SELECT alias FROM gaz)),
ev_vocab AS (
  SELECT DISTINCT lower(token) AS surface FROM toks
  WHERE length(lower(token)) >= 3
    AND lower(token) NOT IN (SELECT alias FROM gaz)),
ev_surfaces AS (
  SELECT surface FROM (
    SELECT surface FROM ev_vocab UNION SELECT surface FROM typo)
  WHERE regexp_matches(surface, '^[ -~]+$')),
ev_tri AS (
  SELECT DISTINCT surface, substring(surface, CAST(i AS INT), 3) AS tri
  FROM (SELECT surface, unnest(generate_series(1, length(surface) - 2)) AS i
        FROM ev_surfaces)),
ev_gaz_tri AS (
  SELECT DISTINCT alias, ent_type, canonical_id,
         substring(alias, CAST(i AS INT), 3) AS tri
  FROM (SELECT alias, ent_type, canonical_id,
               unnest(generate_series(1, length(alias) - 2)) AS i
        FROM gaz)),
ev_cand AS (
  SELECT DISTINCT s.surface, g.alias, g.ent_type, g.canonical_id
  FROM ev_tri s JOIN ev_gaz_tri g USING (tri))"""

ORACLE["alias_edit_links"] = _q("""
SELECT surface, alias, ent_type, canonical_id,
       CAST(levenshtein(surface, alias) AS INT) AS edit_dist
FROM ev_cand
WHERE levenshtein(surface, alias) <= 1""", EDIT_LINK_CTES)


# bloom_bits / bloom_decontam: the eval-set Bloom filter
# (functions/sketches.bloom_words over the doc_id % 17 == 0 held-out
# split's 3-gram shingles) and the per-training-doc decontamination
# verdict + exact-truth audit (bloom_decontaminate).  Same salted
# md5(probe || ':' || item) primitive as the count-min oracle; bit
# position = first 5 nibbles (2^20 bits), packed 32 bits per BIGINT
# word.  Integer division is `//` (DuckDB CAST of a double ROUNDS —
# the usual floor-scaled-int discipline).
def _nib5(h: str) -> str:
    terms = " + ".join(
        f"(strpos('0123456789abcdef', substring({h}, {i + 1}, 1)) - 1)"
        f" * {16 ** (4 - i)}" for i in range(5))
    return f"CAST(({terms}) AS INT)"


_BLOOM_CTES = f"""
WITH bl_ts AS (
  SELECT doc_id, list_filter(string_split_regex(text, '[\\n \\t]'),
                             t -> t <> '') AS ts
  FROM documents),
bl_sh AS (
  SELECT DISTINCT doc_id,
         ts[CAST(i AS INT)] || ' ' || ts[CAST(i AS INT) + 1] || ' '
           || ts[CAST(i AS INT) + 2] AS shingle
  FROM bl_ts, unnest(generate_series(1, len(ts) - 2)) AS t(i)),
bl_eval AS (
  SELECT DISTINCT shingle FROM bl_sh WHERE doc_id % 17 = 0),
bl_words AS (
  SELECT pos // 32 AS word,
         bit_or(CAST(1 AS BIGINT) << (pos % 32)) AS bits
  FROM (SELECT {_nib5('_h')} AS pos
        FROM (SELECT md5(CAST(p AS VARCHAR) || ':' || shingle) AS _h
              FROM bl_eval,
                   unnest(generate_series(0, 3)) AS g(p)))
  GROUP BY 1)"""

ORACLE["bloom_bits"] = _BLOOM_CTES + """
SELECT CAST(word AS INT) AS word, CAST(bits AS BIGINT) AS bits
FROM bl_words"""

ORACLE["bloom_decontam"] = _BLOOM_CTES + f""",
bl_train AS (
  SELECT doc_id, shingle FROM bl_sh WHERE doc_id % 17 <> 0),
bl_probe AS (
  SELECT doc_id, shingle, {_nib5('_h')} AS pos
  FROM (SELECT doc_id, shingle,
               md5(CAST(p AS VARCHAR) || ':' || shingle) AS _h
        FROM bl_train, unnest(generate_series(0, 3)) AS g(p))),
bl_hit AS (
  SELECT doc_id, shingle,
         MIN(CASE WHEN (COALESCE(w.bits, 0) >> (pos % 32)) & 1 = 1
                  THEN 1 ELSE 0 END) AS maybe
  FROM (SELECT doc_id, shingle, pos, pos // 32 AS word FROM bl_probe) p
  LEFT JOIN bl_words w USING (word)
  GROUP BY 1, 2)
SELECT h.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_shingles,
       CAST(SUM(h.maybe) AS BIGINT) AS n_flagged,
       CAST(SUM(CASE WHEN e.shingle IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_true_hits,
       CAST(MAX(h.maybe) AS INT) AS flagged
FROM bl_hit h LEFT JOIN bl_eval e USING (shingle)
GROUP BY h.doc_id"""


# triple_snapshots: SCD2 validity intervals per (url, subj, pred,
# obj) across a synthesized 3-snapshot recrawl schedule
# (operators/triples.triple_intervals) — crawl g of a url happens at
# epoch 1704067200 + doc_id + g*604800; the triple is observed at
# crawl g iff the first nibble of md5(g|subj|pred|obj|url) >= 3.
# Gaps-and-islands (snap_id - row_number), run bounds joined back to
# the schedule; valid_to NULL = the run reaches the latest crawl.
ORACLE["triple_snapshots"] = _q("""
SELECT r.url, r.subj, r.pred, r.obj,
       CAST(f.snap_ts AS BIGINT) AS valid_from,
       CAST(t2.snap_ts AS BIGINT) AS valid_to,
       CAST(r.n_snaps AS BIGINT) AS n_snaps
FROM th_runs r
JOIN th_snap f ON r.url = f.url AND r.g0 = f.snap_id
LEFT JOIN th_snap t2 ON r.url = t2.url AND r.g1 + 1 = t2.snap_id""", """
th_tri AS (
  SELECT MIN(doc_id) AS doc_id, url, subj, pred, obj
  FROM triples GROUP BY url, subj, pred, obj),
th_obs AS (
  SELECT url, subj, pred, obj, CAST(g AS INT) AS snap_id
  FROM th_tri, unnest(generate_series(0, 2)) AS gg(g)
  WHERE strpos('0123456789abcdef',
               substring(md5(CAST(g AS VARCHAR) || '|' || subj || '|'
                             || pred || '|' || obj || '|' || url),
                         1, 1)) - 1 >= 3),
th_runs AS (
  SELECT url, subj, pred, obj,
         MIN(snap_id) AS g0, MAX(snap_id) AS g1,
         COUNT(*) AS n_snaps
  FROM (SELECT *, snap_id - ROW_NUMBER() OVER (
              PARTITION BY url, subj, pred, obj ORDER BY snap_id)
              AS _isl
        FROM th_obs)
  GROUP BY url, subj, pred, obj, _isl),
th_snap AS (
  SELECT url, CAST(g AS INT) AS snap_id,
         CAST(1704067200 + doc_id + g * 604800 AS BIGINT) AS snap_ts
  FROM (SELECT DISTINCT url, doc_id FROM th_tri),
       unnest(generate_series(0, 2)) AS gg(g))""")


# bm25_entities: BM25 document ranking for the gazetteer surface
# forms (functions/textstats.bm25_entity_retrieval) — k1=6/5 and
# b=3/4 kept as exact rationals so the tf saturation term is one
# exact integer division; the only float op is the idf ln (the
# top_terms_tfidf device): idf_micro6 = floor(ln((2N+2)/(2df+1))*1e6),
# score_micro6 = idf_micro6 * 44*T*tf // (20*T*tf + 6*T + 18*dl*N).
BM25_CTES = """
bm_ts AS (
  SELECT doc_id, list_filter(string_split_regex(text, '[\\n \\t]'),
                             t -> t <> '') AS ts
  FROM documents),
bm_toks AS (
  SELECT doc_id, lower(ts[CAST(i AS INT)]) AS term
  FROM bm_ts, unnest(generate_series(1, len(ts))) AS t(i)),
bm_dl AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl
  FROM bm_toks GROUP BY doc_id),
bm_tot AS (
  SELECT CAST(SUM(dl) AS BIGINT) AS t, CAST(COUNT(*) AS BIGINT) AS n
  FROM bm_dl),
bm_probe AS (
  SELECT DISTINCT lower(alias) AS term FROM gaz),
bm_tf AS (
  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
  FROM bm_toks JOIN bm_probe USING (term)
  GROUP BY doc_id, term),
bm_idf AS (
  SELECT term, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df,
         CAST(FLOOR(ln(CAST(2 * (SELECT n FROM bm_tot) + 2 AS DOUBLE)
                       / (2 * COUNT(DISTINCT doc_id) + 1)) * 1000000)
              AS BIGINT) AS idf_micro6
  FROM bm_toks JOIN bm_probe USING (term)
  GROUP BY term),
bm_scored AS (
  SELECT f.term, f.doc_id, f.tf, d.dl,
         CAST(i.idf_micro6 * (44 * (SELECT t FROM bm_tot) * f.tf)
              // (20 * (SELECT t FROM bm_tot) * f.tf
                  + 6 * (SELECT t FROM bm_tot)
                  + 18 * d.dl * (SELECT n FROM bm_tot))
              AS BIGINT) AS score_micro6
  FROM bm_tf f JOIN bm_idf i USING (term) JOIN bm_dl d USING (doc_id))"""

ORACLE["bm25_entities"] = _q("""
SELECT term, CAST(rank AS INT) AS rank, doc_id, tf, dl, score_micro6
FROM (
  SELECT s.*, ROW_NUMBER() OVER (PARTITION BY term
             ORDER BY score_micro6 DESC, doc_id) AS rank
  FROM bm_scored s)
WHERE rank <= 10""", BM25_CTES)


# entity_salience: per-(doc, canonical entity) early-and-often score
# (operators/linking.entity_salience) — share of the doc's mentions x
# earliness of first appearance, floor-scaled integer division.
ORACLE["entity_salience"] = _q("""
SELECT p.doc_id, p.url, p.canonical_id,
       CAST(p.n_mentions AS BIGINT) AS n_mentions,
       CAST(p.first_start AS INT) AS first_start,
       CAST(p.last_end AS INT) AS last_end,
       CAST(l.text_len AS INT) AS text_len,
       CAST((p.n_mentions * (l.text_len - p.first_start) * 1000000)
            // (t.n_doc_mentions * l.text_len) AS BIGINT)
           AS salience_micro6
FROM sal_per p
JOIN sal_tot t USING (doc_id)
JOIN sal_len l USING (doc_id)""", LINK_CTES, """
sal_per AS (
  SELECT doc_id, url, canonical_id, COUNT(*) AS n_mentions,
         MIN(start) AS first_start, MAX("end") AS last_end
  FROM linked GROUP BY doc_id, url, canonical_id),
sal_tot AS (
  SELECT doc_id, COUNT(*) AS n_doc_mentions FROM linked GROUP BY doc_id),
sal_len AS (
  SELECT doc_id, length(text) AS text_len FROM pages)""")


# pred_lift: predicate co-occurrence lift over the emitted KG
# (operators/triples.pred_cooccurrence) — schema induction: predicate
# pairs attaching to the same (url, subj) subject vs chance, exact
# integer-division lift (the cooccurrence_pmi device).
ORACLE["pred_lift"] = _q("""
SELECT pred_a, pred_b, n_subj_a, n_subj_b, n_subj_ab,
       CAST((n_subj_ab * (SELECT n FROM pl_n) * 1000000)
            // (n_subj_a * n_subj_b) AS BIGINT) AS lift_micro6
FROM pl_pairs
JOIN (SELECT pred AS pred_a, n_subj AS n_subj_a FROM pl_pred)
     USING (pred_a)
JOIN (SELECT pred AS pred_b, n_subj AS n_subj_b FROM pl_pred)
     USING (pred_b)""", """
pl_subs AS (
  SELECT DISTINCT url || chr(9) || subj AS sid, pred FROM triples),
pl_pred AS (
  SELECT pred, CAST(COUNT(*) AS BIGINT) AS n_subj
  FROM pl_subs GROUP BY pred),
pl_n AS (
  SELECT CAST(COUNT(DISTINCT sid) AS BIGINT) AS n FROM pl_subs),
pl_pairs AS (
  SELECT a.pred AS pred_a, b.pred AS pred_b,
         CAST(COUNT(*) AS BIGINT) AS n_subj_ab
  FROM pl_subs a JOIN pl_subs b
       ON a.sid = b.sid AND a.pred < b.pred
  GROUP BY a.pred, b.pred)""")


# doclen_hist: per-source doc-length histogram sketch
# (functions/sketches.doclen_hist) — bucket = n_chars // 64, the
# mergeable distribution table of the sketch family.
ORACLE["doclen_hist"] = """
SELECT source, CAST(n_chars // 64 AS BIGINT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS cnt
FROM documents
WHERE n_chars IS NOT NULL
GROUP BY source, CAST(n_chars // 64 AS BIGINT)"""


# kg_neg_samples: filtered negative sampling for KG-embedding
# training (operators/triples.kg_negative_samples) — bucketed md5
# corruption draw, argmin winner, true-triple anti-join.
ORACLE["kg_neg_samples"] = _q("""
SELECT url, subj, pred, obj, CAST(neg_j AS INT) AS neg_j, neg_obj
FROM ns_picked p
WHERE NOT EXISTS (SELECT 1 FROM ns_truth t
                  WHERE t.subj = p.subj AND t.pred = p.pred
                    AND t.neg_obj = p.neg_obj)""", """
ns_pool AS (
  SELECT DISTINCT obj AS neg_obj,
         CAST(strpos('0123456789abcdef', substring(md5(obj), 1, 1)) - 1
              AS INT) AS bucket
  FROM triples),
ns_tj AS (
  SELECT url, subj, pred, obj, CAST(j AS INT) AS neg_j,
         CAST(strpos('0123456789abcdef',
                     substring(md5(j || '|' || subj || '|' || pred
                                   || '|' || obj), 1, 1)) - 1
              AS INT) AS bucket
  FROM (SELECT DISTINCT url, subj, pred, obj FROM triples),
       unnest(generate_series(0, 1)) AS g(j)),
ns_cand AS (
  SELECT t.url, t.subj, t.pred, t.obj, t.neg_j, p.neg_obj,
         md5(p.neg_obj || '|' || t.neg_j || '|' || t.subj || '|'
             || t.pred || '|' || t.obj) AS _draw
  FROM ns_tj t JOIN ns_pool p USING (bucket)
  WHERE p.neg_obj <> t.obj),
ns_picked AS (
  SELECT url, subj, pred, obj, neg_j, neg_obj
  FROM (SELECT *, ROW_NUMBER() OVER (
            PARTITION BY url, subj, pred, obj, neg_j
            ORDER BY _draw) AS rn
        FROM ns_cand)
  WHERE rn = 1),
ns_truth AS (
  SELECT DISTINCT subj, pred, obj AS neg_obj FROM triples)""")


# pred_signatures: predicate type signatures (operators/triples.
# pred_signatures) — per-predicate subject-type distribution, the
# domain-constraint induction table.
ORACLE["pred_signatures"] = _q("""
SELECT pred, subj_type, n_triples,
       CAST(n_triples * 1000000 // tot AS BIGINT) AS share_micro6
FROM (SELECT pred, subj_type, n_triples,
             SUM(n_triples) OVER (PARTITION BY pred) AS tot
      FROM ps_counts)""", LINK_CTES, """
ps_counts AS (
  SELECT t.pred, l.ent_type AS subj_type,
         CAST(COUNT(*) AS BIGINT) AS n_triples
  FROM triples t
  JOIN linked l ON t.url = l.url AND t.subj_id = l.ent_id
  GROUP BY 1, 2)""")


# pred_obj_linkage: range-side schema induction (operators/triples.
# pred_obj_linkage) — per-predicate share of objects that link into
# the entity dictionary (object-property vs data-property).
ORACLE["pred_obj_linkage"] = _q("""
SELECT pred, CAST(COUNT(*) AS BIGINT) AS n_triples,
       CAST(SUM(CASE WHEN g.alias IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_linked_obj,
       CAST(SUM(CASE WHEN g.alias IS NOT NULL THEN 1 ELSE 0 END)
            * 1000000 // COUNT(*) AS BIGINT) AS linked_share_micro6
FROM triples t
LEFT JOIN (SELECT DISTINCT alias FROM gaz) g ON lower(t.obj) = g.alias
GROUP BY pred""")


# entity_assoc: entity association mining (operators/linking.
# entity_associations) — document-level canonical-entity
# co-occurrence lift, exact integer division.
ORACLE["entity_assoc"] = _q("""
SELECT ent_a, ent_b, n_docs_a, n_docs_b, n_docs_ab,
       CAST((n_docs_ab * (SELECT n FROM ea_n) * 1000000)
            // (n_docs_a * n_docs_b) AS BIGINT) AS lift_micro6
FROM ea_pairs
JOIN (SELECT ent AS ent_a, n_docs_ent AS n_docs_a FROM ea_df)
     USING (ent_a)
JOIN (SELECT ent AS ent_b, n_docs_ent AS n_docs_b FROM ea_df)
     USING (ent_b)""", LINK_CTES, """
ea_de AS (
  SELECT DISTINCT doc_id, canonical_id AS ent FROM linked),
ea_df AS (
  SELECT ent, CAST(COUNT(*) AS BIGINT) AS n_docs_ent
  FROM ea_de GROUP BY ent),
ea_n AS (
  SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n FROM ea_de),
ea_pairs AS (
  SELECT a.ent AS ent_a, b.ent AS ent_b,
         CAST(COUNT(*) AS BIGINT) AS n_docs_ab
  FROM ea_de a JOIN ea_de b
       ON a.doc_id = b.doc_id AND a.ent < b.ent
  GROUP BY a.ent, b.ent
  HAVING COUNT(*) >= 3)""")


# walk_centrality: walk-visit centrality over the deterministic
# DeepWalk corpus (operators/graph_algos.walk_centrality) — aggregates
# over the same unrolled walk CTEs as entity_walks.
ORACLE["walk_centrality"] = _q(
    """SELECT v.node, v.n_visits, t.n_walks_through, v.n_starts
FROM (SELECT node, CAST(COUNT(*) AS BIGINT) AS n_visits,
             CAST(SUM(CASE WHEN step = 0 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_starts
      FROM wc_all GROUP BY node) v
JOIN (SELECT node, CAST(COUNT(*) AS BIGINT) AS n_walks_through
      FROM (SELECT DISTINCT node, start, walk FROM wc_all)
      GROUP BY node) t USING (node)""",
    LINK_CTES, COMENTION_CTES.strip(), _walks_sql(WALK_LEN, WALKS_PER_NODE),
    f"""wc_all AS (
  SELECT start, walk, CAST(step AS INT) AS step, node FROM (
    {" UNION ALL ".join(f"SELECT * FROM walk{t}" for t in range(WALK_LEN + 1))}))""")


# degree_dist: degree distribution of the entity co-mention graph
# (operators/graph_algos.degree_distribution) — the KG health metric.
ORACLE["degree_dist"] = _q("""
SELECT degree, CAST(COUNT(*) AS BIGINT) AS n_nodes
FROM (SELECT node, CAST(COUNT(*) AS BIGINT) AS degree
      FROM (SELECT src AS node FROM comention
            UNION ALL SELECT dst FROM comention)
      GROUP BY node)
GROUP BY degree""", LINK_CTES, COMENTION_CTES.strip())


# rrf_fusion: reciprocal-rank fusion of the exact cosine top-k and
# the sign-bucket ANN top-3 for the shared query set (vec_id < 50) —
# operators/similarity.rrf_fusion; contributions are exact integer
# divisions, so the fused ordering is cross-engine deterministic.
_RRF_SIM = ("CAST(floor(1000000 * list_dot_product(q.v, c.v)"
            " / (q.nrm * c.nrm)) AS BIGINT)")
ORACLE["rrf_fusion"] = _assemble(
    SIM_CTES.lstrip(",").strip(),
    select=f"""
, rrf_bucketed AS (
  SELECT n.vec_id, n.v, n.nrm, CAST("""
    + " + ".join(f"(CASE WHEN n.v[{i + 1}] >= 0 THEN {1 << i} ELSE 0 END)"
                 for i in range(ANN_SIGN_BITS)) + f""" AS INT) AS bucket
  FROM normed n),
rrf_exact AS (
  SELECT query_id, rank, neighbor_id FROM (
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY q.vec_id
               ORDER BY {_RRF_SIM} DESC, c.vec_id) AS rank
    FROM normed q JOIN normed c ON q.vec_id <> c.vec_id
    WHERE q.vec_id < 50) WHERE rank <= {TOPK_NEIGHBORS}),
rrf_ann AS (
  SELECT query_id, rank, neighbor_id FROM (
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY q.vec_id
               ORDER BY {_RRF_SIM} DESC, c.vec_id) AS rank
    FROM rrf_bucketed q JOIN rrf_bucketed c
      ON q.bucket = c.bucket AND q.vec_id <> c.vec_id
    WHERE q.vec_id < 50) WHERE rank <= 3),
rrf_u AS (
  SELECT query_id, neighbor_id,
         CAST(1000000 // (60 + rank) AS BIGINT) AS contrib
  FROM rrf_exact
  UNION ALL
  SELECT query_id, neighbor_id,
         CAST(1000000 // (60 + rank) AS BIGINT) AS contrib
  FROM rrf_ann),
rrf_s AS (
  SELECT query_id, neighbor_id,
         CAST(SUM(contrib) AS BIGINT) AS rrf_micro6,
         CAST(COUNT(*) AS BIGINT) AS n_lists
  FROM rrf_u GROUP BY query_id, neighbor_id)
SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id,
       rrf_micro6, n_lists
FROM (SELECT s.*, ROW_NUMBER() OVER (PARTITION BY query_id
          ORDER BY rrf_micro6 DESC, neighbor_id) AS rank
      FROM rrf_s s)
WHERE rank <= 5""")


# ---------------------------------------------------------------------------
# Round-5 continuation, batch 2: schema enforcement, temporal drift,
# RDF export, and per-node clustering — the KG-quality layer over the
# induced schema (pred_signatures) and the co-mention graph.
# ---------------------------------------------------------------------------

# clustering_coeff: local clustering coefficient per node of the
# entity co-mention graph (operators/graph_algos.
# clustering_coefficients) — Watts-Strogatz, floor-scaled micro6.
ORACLE["clustering_coeff"] = _q("""
, ccund AS MATERIALIZED (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM comention WHERE src <> dst),
ccdeg AS (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS degree
  FROM (SELECT a AS node FROM ccund UNION ALL SELECT b FROM ccund)
  GROUP BY node),
cctri AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM ccund e1 JOIN ccund e2 ON e2.a = e1.b
  JOIN ccund e3 ON e3.a = e1.a AND e3.b = e2.b),
cccnt AS (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS n_triangles
  FROM (SELECT x AS node FROM cctri UNION ALL SELECT y FROM cctri
        UNION ALL SELECT z FROM cctri)
  GROUP BY node)
SELECT d.node, d.degree,
       CAST(COALESCE(t.n_triangles, 0) AS BIGINT) AS n_triangles,
       CAST(2000000 * COALESCE(t.n_triangles, 0)
            // (d.degree * (d.degree - 1)) AS BIGINT) AS cc_micro6
FROM ccdeg d LEFT JOIN cccnt t USING (node)
WHERE d.degree >= 2""", LINK_CTES, COMENTION_CTES.strip())


# pred_violations: majority-subject-type election per predicate +
# violation share (operators/triples.pred_violations); majority tie
# broken by type name, all divisions floored.
ORACLE["pred_violations"] = _q("""
SELECT m.pred, m.major_type, t.n_triples,
       CAST(t.n_triples - m.n_major AS BIGINT) AS n_violations,
       CAST((t.n_triples - m.n_major) * 1000000 // t.n_triples
            AS BIGINT) AS viol_micro6
FROM pv_major m JOIN pv_tot t USING (pred)""", LINK_CTES, """
pv_counts AS MATERIALIZED (
  SELECT t.pred, l.ent_type AS subj_type, CAST(COUNT(*) AS BIGINT) AS n
  FROM triples t
  JOIN linked l ON t.url = l.url AND t.subj_id = l.ent_id
  GROUP BY 1, 2),
pv_tot AS (
  SELECT pred, CAST(SUM(n) AS BIGINT) AS n_triples
  FROM pv_counts GROUP BY pred),
pv_major AS (
  SELECT pred, subj_type AS major_type, n AS n_major
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY pred
            ORDER BY n DESC, subj_type) AS rk
        FROM pv_counts)
  WHERE rk = 1)""")


# pred_drift: predicate mix per crawl micro-batch (batch = doc_id
# // 50) vs the corpus-wide mix (operators/triples.pred_drift);
# every share floors to micro6 BEFORE the drift subtraction, so the
# absolute difference is cross-engine exact.
ORACLE["pred_drift"] = _q("""
SELECT c.batch, c.pred, c.n_triples,
       CAST(c.n_triples * 1000000 // b.b_tot AS BIGINT)
           AS share_batch_micro6,
       CAST(p.p_tot * 1000000 // a.n_all AS BIGINT) AS share_all_micro6,
       CAST(abs(c.n_triples * 1000000 // b.b_tot
                - p.p_tot * 1000000 // a.n_all) AS BIGINT)
           AS drift_micro6
FROM pd_cnt c
JOIN pd_btot b USING (batch)
JOIN pd_ptot p USING (pred)
CROSS JOIN pd_all a""", """
pd_cnt AS MATERIALIZED (
  SELECT CAST(doc_id // 50 AS INT) AS batch, pred,
         CAST(COUNT(*) AS BIGINT) AS n_triples
  FROM triples GROUP BY 1, 2),
pd_btot AS (
  SELECT batch, CAST(SUM(n_triples) AS BIGINT) AS b_tot
  FROM pd_cnt GROUP BY 1),
pd_ptot AS (
  SELECT pred, CAST(SUM(n_triples) AS BIGINT) AS p_tot
  FROM pd_cnt GROUP BY 1),
pd_all AS (
  SELECT CAST(SUM(n_triples) AS BIGINT) AS n_all FROM pd_cnt)""")


# ntriples_export: RDF 1.1 N-Triples serialization of the distinct
# triple set with provenance breadth (operators/triples.
# ntriples_export).  DuckDB string literals are escape-free, so '\'
# below is ONE backslash; regexp_replace needs the 'g' flag (DuckDB
# replaces first match only by default — Spark replaces all).
ORACLE["ntriples_export"] = _q(r"""
SELECT nt, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
FROM (SELECT doc_id,
             '<http://kg.example/e/'
             || regexp_replace(lower(subj), '[^a-z0-9]+', '_', 'g')
             || '> <http://kg.example/p/'
             || regexp_replace(lower(pred), '[^a-z0-9]+', '_', 'g')
             || '> "'
             || replace(replace(replace(replace(replace(obj,
                    '\', '\\'), '"', '\"'),
                    chr(10), '\n'), chr(13), '\r'), chr(9), '\t')
             || '" .' AS nt
      FROM triples)
GROUP BY nt""")


# ---------------------------------------------------------------------------
# Continuation batch 3: rule mining, cardinality schema, attribute
# Jaccard, HITS.
# ---------------------------------------------------------------------------

# pred_cardinality: functional-vs-multi predicate profile over the
# distinct fact set (operators/triples.pred_cardinality); on a
# distinct (subj, pred, obj) universe COUNT(*) per (pred, subj) ==
# COUNT(DISTINCT obj), matching the Spark aggregate exactly.
ORACLE["pred_cardinality"] = _q("""
SELECT p.pred, p.n_subjs, o.n_objs, p.n_facts, p.max_objs_per_subj,
       CAST(p.n_facts * 1000000 // p.n_subjs AS BIGINT)
           AS avg_objs_micro6,
       CAST(CASE WHEN p.max_objs_per_subj = 1 THEN 1 ELSE 0 END
            AS INT) AS is_functional
FROM (SELECT pred, CAST(COUNT(*) AS BIGINT) AS n_subjs,
             CAST(SUM(n_o) AS BIGINT) AS n_facts,
             CAST(MAX(n_do) AS BIGINT) AS max_objs_per_subj
      FROM (SELECT pred, subj, CAST(COUNT(*) AS BIGINT) AS n_o,
                   CAST(COUNT(DISTINCT obj) AS BIGINT) AS n_do
            FROM pcf GROUP BY 1, 2)
      GROUP BY 1) p
JOIN (SELECT pred, CAST(COUNT(DISTINCT obj) AS BIGINT) AS n_objs
      FROM pcf GROUP BY 1) o USING (pred)""", """
pcf AS MATERIALIZED (SELECT DISTINCT subj, pred, obj FROM triples)""")


# object_rules: AMIE-style shared-object Horn rules
# p1(x,o) AND p2(z,o) => comention(x,z) with the frequent-object
# fanout cap (operators/triples.shared_object_rules); EXISTS is the
# left-semi head join.
ORACLE["object_rules"] = _q("""
SELECT t.pred_a, t.pred_b, t.n_body,
       CAST(COALESCE(s.n_supported, 0) AS BIGINT) AS n_supported,
       CAST(COALESCE(s.n_supported, 0) * 1000000 // t.n_body
            AS BIGINT) AS conf_micro6
FROM (SELECT pred_a, pred_b, CAST(COUNT(*) AS BIGINT) AS n_body
      FROM sor_body GROUP BY 1, 2 HAVING COUNT(*) >= 2) t
LEFT JOIN (SELECT pred_a, pred_b,
                  CAST(COUNT(*) AS BIGINT) AS n_supported
           FROM sor_body b
           WHERE EXISTS (SELECT 1 FROM sor_head h
                         WHERE h.x = b.x AND h.z = b.z)
           GROUP BY 1, 2) s USING (pred_a, pred_b)""", """
sor_f AS MATERIALIZED (SELECT DISTINCT subj, pred, obj FROM triples),
sor_fp AS MATERIALIZED (
  SELECT f.* FROM sor_f f
  JOIN (SELECT obj FROM (SELECT obj, COUNT(DISTINCT subj) AS fan
                         FROM sor_f GROUP BY 1)
        WHERE fan <= 50) ok USING (obj)),
sor_body AS MATERIALIZED (
  SELECT DISTINCT least(a.pred, b.pred) AS pred_a,
         greatest(a.pred, b.pred) AS pred_b,
         a.subj AS x, b.subj AS z
  FROM sor_fp a JOIN sor_fp b
    ON a.obj = b.obj AND a.subj < b.subj),
sor_head AS MATERIALIZED (
  SELECT DISTINCT da.subj AS x, db.subj AS z
  FROM (SELECT DISTINCT doc_id, subj FROM triples) da
  JOIN (SELECT DISTINCT doc_id, subj FROM triples) db
    ON da.doc_id = db.doc_id AND da.subj < db.subj)""")


# entity_jaccard: exact attribute-set Jaccard over the fanout-pruned
# (pred, obj) universe (operators/triples.entity_attr_jaccard).
# Shared as a CTE block so attr_merge_clusters builds on the SAME
# pair table and can never drift on the similarity definition.
_EJ_CTES = """
eja AS MATERIALIZED (SELECT DISTINCT subj, pred, obj FROM triples),
ejf AS MATERIALIZED (
  SELECT a.* FROM eja a
  JOIN (SELECT pred, obj
        FROM (SELECT pred, obj, COUNT(DISTINCT subj) AS fan
              FROM eja GROUP BY 1, 2)
        WHERE fan <= 50) ok USING (pred, obj)),
ejsz AS MATERIALIZED (
  SELECT subj, CAST(COUNT(*) AS BIGINT) AS n_attrs
  FROM ejf GROUP BY 1),
ej_pairs AS MATERIALIZED (
  SELECT i.subj_a, i.subj_b, i.n_inter,
         CAST(sa.n_attrs + sb.n_attrs - i.n_inter AS BIGINT) AS n_union,
         CAST(i.n_inter * 1000000
              // (sa.n_attrs + sb.n_attrs - i.n_inter) AS BIGINT)
             AS jac_micro6
  FROM (SELECT a.subj AS subj_a, b.subj AS subj_b,
               CAST(COUNT(*) AS BIGINT) AS n_inter
        FROM ejf a JOIN ejf b
          ON a.pred = b.pred AND a.obj = b.obj AND a.subj < b.subj
        GROUP BY 1, 2) i
  JOIN ejsz sa ON sa.subj = i.subj_a
  JOIN ejsz sb ON sb.subj = i.subj_b)"""

ORACLE["entity_jaccard"] = _q(
    "SELECT subj_a, subj_b, n_inter, n_union, jac_micro6 FROM ej_pairs",
    _EJ_CTES)


def _hits_sql(n_iter: int = 5, scale: int = 10**6) -> str:
    """Exact oracle for graph_algos.hits_fixed: the integer max-
    normalized hub/authority recurrence unrolled as chained CTEs over
    the DISTINCT (subj_node, obj_node) edge set of the pagerank graph.
    Reuses _pagerank_sql's graph prelude (ge/gn) by the same slice
    device as _ppr_sql, so graph construction can never drift."""
    rounds = []
    prev = "hh0"
    for i in range(1, n_iter + 1):
        rounds.append(f"""
har{i} AS MATERIALIZED (
  SELECT n.node, CAST(COALESCE(s.r, 0) AS BIGINT) AS raw
  FROM gn n LEFT JOIN (
    SELECT e.dst AS node, CAST(SUM(h.hub_u) AS BIGINT) AS r
    FROM he e JOIN {prev} h ON h.node = e.src GROUP BY 1) s
    ON n.node = s.node),
ha{i} AS MATERIALIZED (
  SELECT node, CAST((raw * {scale})
                    // (SELECT MAX(raw) FROM har{i}) AS BIGINT)
             AS auth_u
  FROM har{i}),
hhr{i} AS MATERIALIZED (
  SELECT n.node, CAST(COALESCE(s.r, 0) AS BIGINT) AS raw
  FROM gn n LEFT JOIN (
    SELECT e.src AS node, CAST(SUM(a.auth_u) AS BIGINT) AS r
    FROM he e JOIN ha{i} a ON a.node = e.dst GROUP BY 1) s
    ON n.node = s.node),
hh{i} AS MATERIALIZED (
  SELECT node, CAST((raw * {scale})
                    // (SELECT MAX(raw) FROM hhr{i}) AS BIGINT)
             AS hub_u
  FROM hhr{i})""")
        prev = f"hh{i}"
    prelude = _pagerank_sql(n_iter=1).split("pr0 AS MATERIALIZED")[0].rstrip()
    assert prelude.endswith(","), "prelude slice must end at a CTE comma"
    return f"""{prelude}
he AS MATERIALIZED (
  SELECT DISTINCT subj_node AS src, obj_node AS dst FROM ge),
hh0 AS MATERIALIZED (
  SELECT node, CAST({scale} AS BIGINT) AS hub_u FROM gn),{",".join(rounds)}
SELECT n.node, a.auth_u, h.hub_u
FROM gn n JOIN ha{n_iter} a USING (node)
JOIN hh{n_iter} h USING (node)"""


ORACLE["hits_scores"] = _q(_hits_sql(), LINK_CTES)


# ---------------------------------------------------------------------------
# Continuation batch 4: temporal-KG read paths, node typing, BGP
# coverage.
# ---------------------------------------------------------------------------

_ASOF_TS = 1704672000  # epoch + 1 week: cuts mid-snapshot-1
_IV_INF = 1 << 62

# kg_asof: point-in-time KG reconstruction at _ASOF_TS over the SCD2
# intervals (operators/triples.kg_asof) — wraps the triple_snapshots
# oracle verbatim as a derived table so interval construction can
# never drift between the two.
ORACLE["kg_asof"] = f"""
SELECT url, subj, pred, obj, n_snaps
FROM ({ORACLE["triple_snapshots"]}) iv
WHERE valid_from <= {_ASOF_TS}
  AND (valid_to IS NULL OR valid_to > {_ASOF_TS})"""

# interval_conflicts: concurrent contradictory claims — pairs of
# different object values for the same (url, subj, pred) with
# overlapping validity windows (operators/triples.interval_conflicts).
ORACLE["interval_conflicts"] = f"""
WITH iv AS MATERIALIZED ({ORACLE["triple_snapshots"]})
SELECT a.url, a.subj, a.pred, a.obj AS obj_a, b.obj AS obj_b,
       CAST(greatest(a.valid_from, b.valid_from) AS BIGINT)
           AS overlap_from,
       CAST(CASE WHEN a.valid_to IS NULL AND b.valid_to IS NULL
                 THEN NULL
                 ELSE least(COALESCE(a.valid_to, {_IV_INF}),
                            COALESCE(b.valid_to, {_IV_INF})) END
            AS BIGINT) AS overlap_to
FROM iv a JOIN iv b
  ON a.url = b.url AND a.subj = b.subj AND a.pred = b.pred
 AND a.obj < b.obj
 AND a.valid_from < COALESCE(b.valid_to, {_IV_INF})
 AND b.valid_from < COALESCE(a.valid_to, {_IV_INF})"""

# entity_types: node typing by majority vote over linked mentions
# (operators/linking.entity_type_election); ties break on type name.
_ETC_CTES = """
etc_cnt AS MATERIALIZED (
  SELECT canonical_id, ent_type, CAST(COUNT(*) AS BIGINT) AS n
  FROM linked GROUP BY 1, 2),
etc_tot AS (
  SELECT canonical_id, CAST(SUM(n) AS BIGINT) AS n_mentions
  FROM etc_cnt GROUP BY 1),
etc_major AS MATERIALIZED (
  SELECT canonical_id, ent_type AS major_type, n AS n_major
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY canonical_id
            ORDER BY n DESC, ent_type) AS rk
        FROM etc_cnt)
  WHERE rk = 1)"""

ORACLE["entity_types"] = _q("""
SELECT m.canonical_id, m.major_type, t.n_mentions, m.n_major,
       CAST(m.n_major * 1000000 // t.n_mentions AS BIGINT)
           AS purity_micro6
FROM etc_major m JOIN etc_tot t USING (canonical_id)""", LINK_CTES,
_ETC_CTES)

# star_query: conjunctive-pattern (SPARQL-BGP) coverage — subjects
# matching >= 2 of the top-10 most-attested (pred, obj) patterns
# (operators/triples.star_query_coverage).
ORACLE["star_query"] = _q("""
SELECT t.subj,
       CAST(COUNT(DISTINCT (t.pred, t.obj)) AS BIGINT) AS n_matched,
       CAST(COUNT(DISTINCT t.doc_id) AS BIGINT) AS n_docs
FROM triples t JOIN sq_pat p ON t.pred = p.pred AND t.obj = p.obj
GROUP BY t.subj
HAVING COUNT(DISTINCT (t.pred, t.obj)) >= 2""", """
sq_f AS MATERIALIZED (SELECT DISTINCT subj, pred, obj FROM triples),
sq_pat AS MATERIALIZED (
  SELECT pred, obj
  FROM (SELECT pred, obj, CAST(COUNT(*) AS BIGINT) AS n,
               ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, pred, obj)
                   AS rk
        FROM sq_f GROUP BY 1, 2)
  WHERE rk <= 10)""")


# ---------------------------------------------------------------------------
# Continuation batch 5: attribute-based entity merging + WL structural
# roles.
# ---------------------------------------------------------------------------

# attr_merge_clusters: connected components over the jac >= 0.5
# attribute-Jaccard graph (operators/triples.attr_merge_clusters) —
# the similarity pass promoted to an entity-merge proposal, same
# recursive-reach CC device as canonical_components.
_AM_CTES = """
am_edges AS MATERIALIZED (
  SELECT subj_a AS src, subj_b AS dst FROM ej_pairs
  WHERE jac_micro6 >= 500000),
am_nodes AS (SELECT DISTINCT subj AS node FROM ejf),
am_sym AS (SELECT src, dst FROM am_edges
           UNION SELECT dst AS src, src AS dst FROM am_edges),
am_reach(node, comp) AS (
  SELECT node, node AS comp FROM am_nodes
  UNION
  SELECT e.dst AS node, r.comp
  FROM am_reach r JOIN am_sym e ON e.src = r.node),
am_labels AS MATERIALIZED (
  SELECT node, MIN(comp) AS label FROM am_reach GROUP BY node)"""

ORACLE["attr_merge_clusters"] = _q(
    "SELECT node AS subj, label AS cluster FROM am_labels",
    _EJ_CTES, _AM_CTES)


def _wl_sql(n_rounds: int = 3) -> str:
    """Exact oracle for graph_algos.wl_labels: Weisfeiler-Lehman label
    refinement over the entity co-mention graph, rounds unrolled as
    chained CTEs.  The per-round relabel is md5(old || '|' || sorted
    comma-joined neighbor labels) — string_agg(... ORDER BY lbl)
    matches Spark's array_join(array_sort(collect_list(...)), ',')
    exactly, and md5 hex is identical across engines."""
    rounds = []
    prev = "wl0"
    for i in range(1, n_rounds + 1):
        rounds.append(f"""
wl{i} AS MATERIALIZED (
  SELECT p.node,
         md5(p.lbl || '|' || COALESCE(a.nbs, '')) AS lbl
  FROM {prev} p LEFT JOIN (
    SELECT s.src AS node, string_agg(q.lbl, ',' ORDER BY q.lbl) AS nbs
    FROM com_sym s JOIN {prev} q ON q.node = s.dst
    GROUP BY 1) a ON a.node = p.node)""")
        prev = f"wl{i}"
    return f"""
, wl0 AS MATERIALIZED (
  SELECT n.node, CAST(COALESCE(d.deg, 0) AS VARCHAR) AS lbl
  FROM cc_nodes n LEFT JOIN (
    SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS deg
    FROM com_sym GROUP BY 1) d ON d.node = n.node),{",".join(rounds)},
wl_hist AS (
  SELECT lbl, CAST(COUNT(*) AS BIGINT) AS n_role
  FROM {prev} GROUP BY 1)
SELECT w.node, w.lbl AS wl_label, h.n_role
FROM {prev} w JOIN wl_hist h ON h.lbl = w.lbl"""


# wl_labels: 3-round WL refinement — every node's structural-role
# fingerprint plus the population of its role class.
ORACLE["wl_labels"] = _q(_wl_sql(), LINK_CTES, COMENTION_CTES.strip())


# ---------------------------------------------------------------------------
# Continuation batch 6: typed schema summary, KG churn, hapax noise.
# ---------------------------------------------------------------------------

# schema_graph: SNAP-style typed quotient of the KG edge table
# (operators/linking.schema_graph) — component types elected by
# majority vote (ties on type name), literal objects as 'literal'.
# Reuses _pagerank_sql's graph prelude slice for the ge edge CTE.
_SG_PRELUDE = _pagerank_sql(n_iter=1).split("pr0 AS MATERIALIZED")[0].rstrip()
assert _SG_PRELUDE.endswith(","), "prelude slice must end at a CTE comma"
ORACLE["schema_graph"] = _q(f"""{_SG_PRELUDE}
sg_cnt AS MATERIALIZED (
  SELECT c.component, l.ent_type, CAST(COUNT(*) AS BIGINT) AS n
  FROM linked l JOIN components c ON l.canonical_id = c.node
  GROUP BY 1, 2),
sg_type AS MATERIALIZED (
  SELECT component, ent_type AS major_type
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY component
            ORDER BY n DESC, ent_type) AS rk
        FROM sg_cnt)
  WHERE rk = 1)
SELECT st.major_type AS subj_type, e.pred,
       COALESCE(ot.major_type, 'literal') AS obj_type,
       CAST(COUNT(*) AS BIGINT) AS n_edges,
       CAST(SUM(e.weight) AS BIGINT) AS w_sum
FROM ge e
JOIN sg_type st ON st.component = e.subj_node
LEFT JOIN sg_type ot ON ot.component = e.obj_node
GROUP BY 1, 2, 3""", LINK_CTES)

# kg_churn: per-predicate added/removed/stable claim counts between
# the week-1 and week-2 point-in-time cuts
# (operators/triples.kg_churn over the SCD2 intervals).
_CHURN_T1 = 1704672000
_CHURN_T2 = _CHURN_T1 + 604800
ORACLE["kg_churn"] = f"""
WITH iv AS MATERIALIZED ({ORACLE["triple_snapshots"]}),
ch_fact AS (
  SELECT url, subj, pred, obj,
         MAX(CASE WHEN valid_from <= {_CHURN_T1}
                   AND (valid_to IS NULL OR valid_to > {_CHURN_T1})
                  THEN 1 ELSE 0 END) AS l1,
         MAX(CASE WHEN valid_from <= {_CHURN_T2}
                   AND (valid_to IS NULL OR valid_to > {_CHURN_T2})
                  THEN 1 ELSE 0 END) AS l2
  FROM iv GROUP BY 1, 2, 3, 4)
SELECT pred,
       CAST(SUM(CASE WHEN l1 = 0 AND l2 = 1 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_added,
       CAST(SUM(CASE WHEN l1 = 1 AND l2 = 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_removed,
       CAST(SUM(CASE WHEN l1 = 1 AND l2 = 1 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_stable
FROM ch_fact GROUP BY pred"""

# hapax_objects: per-predicate share of single-attestation object
# values (operators/triples.hapax_objects).
ORACLE["hapax_objects"] = _q("""
SELECT pred, CAST(COUNT(*) AS BIGINT) AS n_objs,
       CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_hapax,
       CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) * 1000000
            // COUNT(*) AS BIGINT) AS hapax_share_micro6
FROM (SELECT pred, obj, CAST(COUNT(*) AS BIGINT) AS n
      FROM (SELECT DISTINCT subj, pred, obj FROM triples)
      GROUP BY 1, 2)
GROUP BY pred""")


# ---------------------------------------------------------------------------
# Continuation batch 7: trending entities, weighted shortest paths,
# reciprocal best-match alignment.
# ---------------------------------------------------------------------------

# trending_entities: per-crawl-batch top-3 entities by mention count
# with burst lift vs the corpus share (operators/linking.
# trending_entities); batch = doc_id DIV 50 (the pred_drift clock).
ORACLE["trending_entities"] = _q("""
SELECT r.batch, r.canonical_id, r.n_mentions,
       CAST(r.rank AS INT) AS rank,
       CAST(r.n_mentions * a.n_all * 1000000
            // (b.b_tot * e.e_tot) AS BIGINT) AS lift_micro6
FROM tr_rk r
JOIN tr_btot b USING (batch)
JOIN tr_etot e USING (canonical_id)
CROSS JOIN tr_all a
WHERE r.rank <= 3""", LINK_CTES, """
tr_cnt AS MATERIALIZED (
  SELECT CAST(doc_id // 50 AS INT) AS batch, canonical_id,
         CAST(COUNT(*) AS BIGINT) AS n_mentions
  FROM linked GROUP BY 1, 2),
tr_btot AS (
  SELECT batch, CAST(SUM(n_mentions) AS BIGINT) AS b_tot
  FROM tr_cnt GROUP BY 1),
tr_etot AS (
  SELECT canonical_id, CAST(SUM(n_mentions) AS BIGINT) AS e_tot
  FROM tr_cnt GROUP BY 1),
tr_all AS (
  SELECT CAST(SUM(n_mentions) AS BIGINT) AS n_all FROM tr_cnt),
tr_rk AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY batch
        ORDER BY n_mentions DESC, canonical_id) AS rank
  FROM tr_cnt)""")


def _bf_sql(n_rounds: int = 5, inf: int = 1 << 60) -> str:
    """Exact oracle for graph_algos.bellman_ford_fixed over the KG
    edge graph: min-plus relaxation rounds unrolled as chained CTEs,
    seed = MIN(node) (the BFS/PPR seed rule), cost = 1e6 // summed
    edge weight.  All-BIGINT min-plus — bit-exact across engines."""
    rounds = []
    prev = "bf0"
    for i in range(1, n_rounds + 1):
        rounds.append(f"""
bf{i} AS MATERIALIZED (
  SELECT n.node,
         CAST(least(p.d, COALESCE(r.nd, {inf})) AS BIGINT) AS d
  FROM gn n JOIN {prev} p ON p.node = n.node
  LEFT JOIN (
    SELECT e.dst AS node, CAST(MIN(q.d + e.cost) AS BIGINT) AS nd
    FROM bf_e e JOIN {prev} q ON q.node = e.src AND q.d < {inf}
    GROUP BY 1) r ON r.node = n.node)""")
        prev = f"bf{i}"
    prelude = _pagerank_sql(n_iter=1).split("pr0 AS MATERIALIZED")[0].rstrip()
    assert prelude.endswith(","), "prelude slice must end at a CTE comma"
    return f"""{prelude}
bf_e AS MATERIALIZED (
  SELECT subj_node AS src, obj_node AS dst,
         CAST(1000000 // SUM(weight) AS BIGINT) AS cost
  FROM ge GROUP BY subj_node, obj_node),
bf0 AS MATERIALIZED (
  SELECT node, CAST(CASE WHEN node = (SELECT MIN(node) FROM gn)
                         THEN 0 ELSE {inf} END AS BIGINT) AS d
  FROM gn),{",".join(rounds)}
SELECT node, d AS dist_cost FROM {prev} WHERE d < {inf}"""


ORACLE["graph_distances"] = _q(_bf_sql(), LINK_CTES)

# jaccard_best_match: reciprocal-best-match alignment over the
# blocked Jaccard pair table (operators/triples.jaccard_best_match).
ORACLE["jaccard_best_match"] = _q("""
SELECT a.me AS subj_a, a.other AS subj_b, a.jac_micro6
FROM bm_best a
WHERE a.me < a.other
  AND EXISTS (SELECT 1 FROM bm_best b
              WHERE b.me = a.other AND b.other = a.me)""", _EJ_CTES, """
bm_sym AS (
  SELECT subj_a AS me, subj_b AS other, jac_micro6 FROM ej_pairs
  UNION ALL
  SELECT subj_b AS me, subj_a AS other, jac_micro6 FROM ej_pairs),
bm_best AS MATERIALIZED (
  SELECT me, other, jac_micro6
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY me
            ORDER BY jac_micro6 DESC, other) AS rk
        FROM bm_sym)
  WHERE rk = 1)""")


# ---------------------------------------------------------------------------
# Continuation batch 8: WARC record source round trip.
# ---------------------------------------------------------------------------

# warc_roundtrip: serialize -> parse identity over the pages table
# (sources/warc.py).  The oracle derives every output column straight
# from the source document (url/epoch/id are pure doc_id functions,
# payload is the html wrapper string), so any corruption the Spark
# parser introduced — truncated payload, mis-anchored header regex,
# byte-length drift — shows up as a sha/length/flag mismatch.
ORACLE["warc_roundtrip"] = _q("""
SELECT doc_id,
       'response' AS warc_type,
       url,
       CAST(1704067200 + doc_id AS BIGINT) AS ts_epoch,
       'urn:doc:' || CAST(doc_id AS VARCHAR) AS record_id,
       CAST(octet_length(encode(
                '<html><head><meta charset="utf-8"></head>'
                || '<body>' || text || '</body></html>'))
            AS BIGINT) AS content_length,
       sha256('<html><head><meta charset="utf-8"></head><body>'
              || text || '</body></html>') AS payload_sha,
       CAST(length('<html><head><meta charset="utf-8"></head><body>'
                   || text || '</body></html>') AS BIGINT)
           AS n_payload_chars,
       CAST(1 AS INT) AS payload_ok,
       CAST(1 AS INT) AS text_match
FROM pages""")


# ---------------------------------------------------------------------------
# Continuation batch 9: predicate Jaccard + assortativity moments.
# ---------------------------------------------------------------------------

# pred_jaccard: exact subject-set Jaccard between predicates
# (operators/triples.pred_jaccard) — blocked on the shared subject.
ORACLE["pred_jaccard"] = _q("""
SELECT i.pred_a, i.pred_b, i.n_inter,
       CAST(sa.n_subj + sb.n_subj - i.n_inter AS BIGINT) AS n_union,
       CAST(i.n_inter * 1000000
            // (sa.n_subj + sb.n_subj - i.n_inter) AS BIGINT)
           AS jac_micro6
FROM (SELECT a.pred AS pred_a, b.pred AS pred_b,
             CAST(COUNT(*) AS BIGINT) AS n_inter
      FROM pj_ps a JOIN pj_ps b
        ON a.subj = b.subj AND a.pred < b.pred
      GROUP BY 1, 2) i
JOIN pj_sz sa ON sa.pred = i.pred_a
JOIN pj_sz sb ON sb.pred = i.pred_b""", """
pj_ps AS MATERIALIZED (SELECT DISTINCT subj, pred FROM triples),
pj_sz AS (SELECT pred, CAST(COUNT(*) AS BIGINT) AS n_subj
          FROM pj_ps GROUP BY 1)""")

# degree_assortativity: the six exact-integer sums Pearson's degree
# correlation needs, over the co-mention graph (operators/graph_algos.
# degree_assortativity_stats); r itself needs a sqrt, so the sums ARE
# the oracle-exact surface.
ORACLE["degree_assortativity"] = _q("""
SELECT CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(x) AS BIGINT) AS sx,
       CAST(SUM(y) AS BIGINT) AS sy,
       CAST(SUM(x * y) AS BIGINT) AS sxy,
       CAST(SUM(x * x) AS BIGINT) AS sxx,
       CAST(SUM(y * y) AS BIGINT) AS syy
FROM (SELECT dx.deg AS x, dy.deg AS y
      FROM com_sym s
      JOIN da_deg dx ON dx.node = s.src
      JOIN da_deg dy ON dy.node = s.dst)""", LINK_CTES,
COMENTION_CTES.strip(), """
da_deg AS MATERIALIZED (
  SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS deg
  FROM com_sym GROUP BY 1)""")


# ---------------------------------------------------------------------------
# Continuation batch 10: community-quality report over the LPA
# partition.
# ---------------------------------------------------------------------------

# community_stats: per-LPA-community size / internal / cut / volume /
# conductance over the entity co-occurrence (overlap) graph
# (operators/graph_algos.community_stats over label_propagation's
# lab5); conductance = cut * 1e6 // min(vol, 2m - vol), undefined
# denominators filtered.
ORACLE["community_stats"] = _q("""
SELECT p.label, p.n_nodes,
       CAST(COALESCE(i.n_internal, 0) AS BIGINT) AS n_internal,
       CAST(COALESCE(c.n_cut, 0) AS BIGINT) AS n_cut,
       p.vol,
       CAST(CASE WHEN least(p.vol,
                      (SELECT two_m FROM cs_m) - p.vol) > 0
                 THEN COALESCE(c.n_cut, 0) * 1000000
                      // least(p.vol,
                               (SELECT two_m FROM cs_m) - p.vol)
                 ELSE NULL END AS BIGINT) AS cond_micro6
FROM cs_lab_stats p
LEFT JOIN cs_in i USING (label)
LEFT JOIN cs_cut c USING (label)""",
LINK_CTES, _lpa_sql(5), """
cs_e2 AS MATERIALIZED (
  SELECT e.src AS a, e.dst AS b, la.label AS la, lb.label AS lb
  FROM ov_edges e
  JOIN lab5 la ON la.node = e.src
  JOIN lab5 lb ON lb.node = e.dst),
cs_in AS (
  SELECT la AS label, CAST(COUNT(*) AS BIGINT) AS n_internal
  FROM cs_e2 WHERE la = lb GROUP BY 1),
cs_cut AS (
  SELECT label, CAST(COUNT(*) AS BIGINT) AS n_cut
  FROM (SELECT la AS label FROM cs_e2 WHERE la <> lb
        UNION ALL SELECT lb FROM cs_e2 WHERE la <> lb)
  GROUP BY 1),
cs_deg AS (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS deg
  FROM (SELECT src AS node FROM ov_edges
        UNION ALL SELECT dst FROM ov_edges)
  GROUP BY 1),
cs_lab_stats AS MATERIALIZED (
  SELECT l.label, CAST(COUNT(*) AS BIGINT) AS n_nodes,
         CAST(COALESCE(SUM(d.deg), 0) AS BIGINT) AS vol
  FROM lab5 l LEFT JOIN cs_deg d ON d.node = l.node
  GROUP BY 1),
cs_m AS (
  SELECT CAST(2 * COUNT(*) AS BIGINT) AS two_m FROM ov_edges)""")


# ---------------------------------------------------------------------------
# Continuation batch 11: inverse-functional keys + shingle novelty.
# ---------------------------------------------------------------------------

# pred_ifp: inverse-functional predicate detection — the transpose of
# pred_cardinality (operators/triples.pred_ifp).
ORACLE["pred_ifp"] = _q("""
SELECT p.pred, o.n_objs, p.n_subjs, o.n_facts, o.max_subjs_per_obj,
       CAST(o.n_facts * 1000000 // o.n_objs AS BIGINT)
           AS avg_subjs_micro6,
       CAST(CASE WHEN o.max_subjs_per_obj = 1 THEN 1 ELSE 0 END
            AS INT) AS is_inverse_functional
FROM (SELECT pred, CAST(COUNT(*) AS BIGINT) AS n_objs,
             CAST(SUM(n_s) AS BIGINT) AS n_facts,
             CAST(MAX(n_ds) AS BIGINT) AS max_subjs_per_obj
      FROM (SELECT pred, obj, CAST(COUNT(*) AS BIGINT) AS n_s,
                   CAST(COUNT(DISTINCT subj) AS BIGINT) AS n_ds
            FROM ifpf GROUP BY 1, 2)
      GROUP BY 1) o
JOIN (SELECT pred, CAST(COUNT(DISTINCT subj) AS BIGINT) AS n_subjs
      FROM ifpf GROUP BY 1) p USING (pred)""", """
ifpf AS MATERIALIZED (SELECT DISTINCT subj, pred, obj FROM triples)""")

# shingle_novelty: per-doc share of 3-gram shingles first seen in
# this doc (functions/textstats.shingle_novelty); reuses the
# decontamination shingle CTEs at k=3 (only dsh is referenced — the
# split CTEs are never evaluated).
ORACLE["shingle_novelty"] = _q("""
SELECT d.doc_id, d.n_shingles,
       CAST(COALESCE(nv.n_novel, 0) AS BIGINT) AS n_novel,
       CAST(COALESCE(nv.n_novel, 0) * 1000000 // d.n_shingles
            AS BIGINT) AS novelty_micro6
FROM (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_shingles
      FROM dsh GROUP BY 1) d
LEFT JOIN (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_novel
           FROM (SELECT shingle, MIN(doc_id) AS doc_id
                 FROM dsh GROUP BY 1)
           GROUP BY 1) nv USING (doc_id)""", decontam_ctes(3).strip())


# ---------------------------------------------------------------------------
# Continuation batch 12: host correlation + recrawl scheduling.
# ---------------------------------------------------------------------------

# host_entity_overlap: host pairs by shared canonical entities,
# entity-fanout capped (operators/linking.host_entity_overlap).
ORACLE["host_entity_overlap"] = _q("""
SELECT i.host_a, i.host_b, i.n_shared,
       CAST(sa.n_ents + sb.n_ents - i.n_shared AS BIGINT) AS n_union,
       CAST(i.n_shared * 1000000
            // (sa.n_ents + sb.n_ents - i.n_shared) AS BIGINT)
           AS jac_micro6
FROM (SELECT a.host AS host_a, b.host AS host_b,
             CAST(COUNT(*) AS BIGINT) AS n_shared
      FROM heo_f a JOIN heo_f b
        ON a.canonical_id = b.canonical_id AND a.host < b.host
      GROUP BY 1, 2) i
JOIN heo_sz sa ON sa.host = i.host_a
JOIN heo_sz sb ON sb.host = i.host_b""", LINK_CTES, """
heo AS MATERIALIZED (
  SELECT DISTINCT regexp_extract(url, '^https?://([^/]*)', 1) AS host,
         canonical_id
  FROM linked),
heo_f AS MATERIALIZED (
  SELECT h.* FROM heo h
  JOIN (SELECT canonical_id FROM (
          SELECT canonical_id, COUNT(*) AS fan FROM heo GROUP BY 1)
        WHERE fan <= 50) ok USING (canonical_id)),
heo_sz AS (
  SELECT host, CAST(COUNT(*) AS BIGINT) AS n_ents
  FROM heo_f GROUP BY 1)""")

# url_recrawl_priority: per-url churn over the SCD2 intervals
# (operators/triples.url_recrawl_priority).
ORACLE["url_recrawl_priority"] = f"""
WITH iv AS MATERIALIZED ({ORACLE["triple_snapshots"]})
SELECT url,
       CAST(COUNT(DISTINCT (subj, pred, obj)) AS BIGINT) AS n_claims,
       CAST(COUNT(*) AS BIGINT) AS n_intervals,
       CAST(SUM(CASE WHEN valid_to IS NULL THEN 0 ELSE 1 END)
            AS BIGINT) AS n_closed,
       CAST(SUM(CASE WHEN valid_to IS NULL THEN 0 ELSE 1 END)
            * 1000000 // COUNT(*) AS BIGINT) AS churn_micro6
FROM iv GROUP BY url"""


# ---------------------------------------------------------------------------
# Continuation batch 13: merge-proposal quality + exact percentiles.
# ---------------------------------------------------------------------------

# merge_cluster_stats: the community_stats accounting over the
# thresholded Jaccard graph under the attr_merge_clusters partition
# (operators/triples.merge_cluster_stats) — conductance as the
# merge-safety gate.
ORACLE["merge_cluster_stats"] = _q("""
SELECT p.label, p.n_nodes,
       CAST(COALESCE(i.n_internal, 0) AS BIGINT) AS n_internal,
       CAST(COALESCE(c.n_cut, 0) AS BIGINT) AS n_cut,
       p.vol,
       CAST(CASE WHEN least(p.vol,
                      (SELECT two_m FROM ms_m) - p.vol) > 0
                 THEN COALESCE(c.n_cut, 0) * 1000000
                      // least(p.vol,
                               (SELECT two_m FROM ms_m) - p.vol)
                 ELSE NULL END AS BIGINT) AS cond_micro6
FROM ms_lab_stats p
LEFT JOIN ms_in i USING (label)
LEFT JOIN ms_cut c USING (label)""",
_EJ_CTES, _AM_CTES, """
ms_e2 AS MATERIALIZED (
  SELECT la.label AS la, lb.label AS lb
  FROM am_edges e
  JOIN am_labels la ON la.node = e.src
  JOIN am_labels lb ON lb.node = e.dst),
ms_in AS (
  SELECT la AS label, CAST(COUNT(*) AS BIGINT) AS n_internal
  FROM ms_e2 WHERE la = lb GROUP BY 1),
ms_cut AS (
  SELECT label, CAST(COUNT(*) AS BIGINT) AS n_cut
  FROM (SELECT la AS label FROM ms_e2 WHERE la <> lb
        UNION ALL SELECT lb FROM ms_e2 WHERE la <> lb)
  GROUP BY 1),
ms_deg AS (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS deg
  FROM (SELECT src AS node FROM am_edges
        UNION ALL SELECT dst FROM am_edges)
  GROUP BY 1),
ms_lab_stats AS MATERIALIZED (
  SELECT l.label, CAST(COUNT(*) AS BIGINT) AS n_nodes,
         CAST(COALESCE(SUM(d.deg), 0) AS BIGINT) AS vol
  FROM am_labels l LEFT JOIN ms_deg d ON d.node = l.node
  GROUP BY 1),
ms_m AS (
  SELECT CAST(2 * COUNT(*) AS BIGINT) AS two_m FROM am_edges)""")

# doclen_percentiles: exact nearest-rank p50/p90/p99 per source
# (functions/textstats.doclen_percentiles); ceil uses the
# POSITIVE-only (q*n + d - 1) // d form — Spark DIV truncates toward
# zero while DuckDB // floors, so the negative-ceil trick would
# diverge.
ORACLE["doclen_percentiles"] = _q("""
SELECT source, CAST(MAX(n_docs) AS BIGINT) AS n_docs,
       CAST(MAX(CASE WHEN rk = greatest(1, (1 * n_docs + 1) // 2)
                     THEN n_chars END) AS BIGINT) AS p50,
       CAST(MAX(CASE WHEN rk = greatest(1, (9 * n_docs + 9) // 10)
                     THEN n_chars END) AS BIGINT) AS p90,
       CAST(MAX(CASE WHEN rk = greatest(1, (99 * n_docs + 99) // 100)
                     THEN n_chars END) AS BIGINT) AS p99
FROM (SELECT source, CAST(n_chars AS BIGINT) AS n_chars,
             ROW_NUMBER() OVER (PARTITION BY source
                  ORDER BY n_chars, doc_id) AS rk,
             COUNT(*) OVER (PARTITION BY source) AS n_docs
      FROM documents)
GROUP BY source""")


# ---------------------------------------------------------------------------
# Continuation batch 14: inverted-index postings.
# ---------------------------------------------------------------------------

# postings_lists: per-term delta-encoded posting lists
# (functions/textstats.postings_lists); first gap is from doc_id 0,
# list order = ascending doc_id.
ORACLE["postings_lists"] = _q("""
SELECT term, CAST(COUNT(*) AS BIGINT) AS df,
       CAST(SUM(tf) AS BIGINT) AS total_tf,
       string_agg(CAST(delta AS VARCHAR), ',' ORDER BY doc_id)
           AS postings_deltas
FROM (SELECT term, doc_id, tf,
             doc_id - COALESCE(LAG(doc_id) OVER (
                 PARTITION BY term ORDER BY doc_id), 0) AS delta
      FROM (SELECT lower(tok) AS term, doc_id,
                   CAST(COUNT(*) AS BIGINT) AS tf
            FROM (SELECT doc_id,
                         unnest(string_split_regex(text, '[\\n \\t]'))
                             AS tok
                  FROM documents)
            WHERE tok <> ''
            GROUP BY 1, 2))
GROUP BY term
HAVING COUNT(*) >= 2""")


# ---------------------------------------------------------------------------
# Continuation batch 15: clustering-agreement evaluation.
# ---------------------------------------------------------------------------

# partition_agreement: pair-level Rand decomposition of the LPA
# communities vs the connected components over the SAME overlap graph
# (operators/graph_algos.partition_agreement); n*(n-1) is even so the
# // 2 is exact.
ORACLE["partition_agreement"] = _q("""
SELECT n_nodes, pairs_both, pairs_a, pairs_b,
       CAST(CASE WHEN pairs_a > 0
                 THEN pairs_both * 1000000 // pairs_a
                 ELSE NULL END AS BIGINT) AS precision_micro6,
       CAST(CASE WHEN pairs_b > 0
                 THEN pairs_both * 1000000 // pairs_b
                 ELSE NULL END AS BIGINT) AS recall_micro6
FROM pa_both CROSS JOIN pa_a CROSS JOIN pa_b""",
LINK_CTES, _lpa_sql(5), """
pa_cells AS MATERIALIZED (
  SELECT l.label AS la, c.component AS lb,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM lab5 l JOIN components c ON c.node = l.node
  GROUP BY 1, 2),
pa_both AS (
  SELECT CAST(SUM(n) AS BIGINT) AS n_nodes,
         CAST(SUM((n * (n - 1)) // 2) AS BIGINT) AS pairs_both
  FROM pa_cells),
pa_a AS (
  SELECT CAST(SUM((n * (n - 1)) // 2) AS BIGINT) AS pairs_a
  FROM (SELECT la, CAST(SUM(n) AS BIGINT) AS n
        FROM pa_cells GROUP BY 1)),
pa_b AS (
  SELECT CAST(SUM((n * (n - 1)) // 2) AS BIGINT) AS pairs_b
  FROM (SELECT lb, CAST(SUM(n) AS BIGINT) AS n
        FROM pa_cells GROUP BY 1))""")


# ---------------------------------------------------------------------------
# Continuation batch 17: truth finding (knowledge fusion).
# ---------------------------------------------------------------------------

def _truth_sql(n_rounds: int = 3, scale: int = 10**6) -> str:
    """Shared unrolled-CTE prelude for operators/triples.truth_finding:
    emits tfh{i} (host trust) and tfb{i} (claim belief) per round over
    the bipartite host-claim attestation edges; the caller selects
    from tfb{n_rounds} or tfh{n_rounds}."""
    rounds = []
    prev_b = "tfb0"
    prev_t = None
    for i in range(1, n_rounds + 1):
        rounds.append(f"""
tfhr{i} AS MATERIALIZED (
  SELECT h.host, CAST(COALESCE(s.r, 0) AS BIGINT) AS raw
  FROM tf_hosts h LEFT JOIN (
    SELECT e.host, CAST(SUM(b.b) AS BIGINT) AS r
    FROM tf_e e JOIN {prev_b} b
      ON b.subj = e.subj AND b.pred = e.pred AND b.obj = e.obj
    GROUP BY 1) s ON s.host = h.host),
tfh{i} AS MATERIALIZED (
  SELECT host, CAST((raw * {scale})
                    // (SELECT MAX(raw) FROM tfhr{i}) AS BIGINT) AS t
  FROM tfhr{i}),
tfbr{i} AS MATERIALIZED (
  SELECT c.subj, c.pred, c.obj,
         CAST(COALESCE(s.r, 0) AS BIGINT) AS raw
  FROM tf_claims c LEFT JOIN (
    SELECT e.subj, e.pred, e.obj, CAST(SUM(t.t) AS BIGINT) AS r
    FROM tf_e e JOIN tfh{i} t ON t.host = e.host
    GROUP BY 1, 2, 3) s
    ON s.subj = c.subj AND s.pred = c.pred AND s.obj = c.obj),
tfb{i} AS MATERIALIZED (
  SELECT subj, pred, obj,
         CAST((raw * {scale})
              // (SELECT MAX(raw) FROM tfbr{i}) AS BIGINT) AS b
  FROM tfbr{i})""")
        prev_b, prev_t = f"tfb{i}", f"tfh{i}"
    return f"""
, tf_e AS MATERIALIZED (
  SELECT DISTINCT regexp_extract(url, '^https?://([^/]*)', 1) AS host,
         subj, pred, obj
  FROM triples),
tf_claims AS MATERIALIZED (
  SELECT DISTINCT subj, pred, obj FROM tf_e),
tf_hosts AS MATERIALIZED (SELECT DISTINCT host FROM tf_e),
tfb0 AS MATERIALIZED (
  SELECT subj, pred, obj, CAST({scale} AS BIGINT) AS b
  FROM tf_claims),{",".join(rounds)}"""


_TF_N = 3
ORACLE["claim_beliefs"] = _q(
    f"""{_truth_sql(_TF_N)}
SELECT subj, pred, obj, b AS belief_u FROM tfb{_TF_N}""")
ORACLE["source_trust"] = _q(
    f"""{_truth_sql(_TF_N)}
SELECT host, t AS trust_u FROM tfh{_TF_N}""")


# kg_resolved: belief-argmax conflict resolution per (subj, pred)
# slot over the fused beliefs (operators/triples.kg_resolved).
ORACLE["kg_resolved"] = _q(
    f"""{_truth_sql(_TF_N)},
kr_n AS (
  SELECT subj, pred, CAST(COUNT(*) AS BIGINT) AS n_alternatives
  FROM tfb{_TF_N} GROUP BY 1, 2)
SELECT w.subj, w.pred, w.obj, w.b AS belief_u, n.n_alternatives
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY subj, pred
          ORDER BY b DESC, obj) AS rk
      FROM tfb{_TF_N}) w
JOIN kr_n n ON n.subj = w.subj AND n.pred = w.pred
WHERE w.rk = 1""")


# host_error_rate: per-host share of attestations that lost the
# belief-argmax (operators/triples.host_error_rate).
ORACLE["host_error_rate"] = _q(
    f"""{_truth_sql(_TF_N)},
her_win AS MATERIALIZED (
  SELECT subj, pred, obj AS win
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY subj, pred
            ORDER BY b DESC, obj) AS rk
        FROM tfb{_TF_N})
  WHERE rk = 1)
SELECT e.host, CAST(COUNT(*) AS BIGINT) AS n_attested,
       CAST(SUM(CASE WHEN e.obj = w.win THEN 0 ELSE 1 END)
            AS BIGINT) AS n_wrong,
       CAST(SUM(CASE WHEN e.obj = w.win THEN 0 ELSE 1 END) * 1000000
            // COUNT(*) AS BIGINT) AS err_micro6
FROM tf_e e JOIN her_win w ON w.subj = e.subj AND w.pred = e.pred
GROUP BY e.host""")


# literal_profiles: numeric-literal range induction per predicate
# (operators/triples.literal_profiles); parsing is pure string
# algebra (regexp groups + rpad), no float ever materializes.
ORACLE["literal_profiles"] = _q(r"""
SELECT pred, CAST(COUNT(*) AS BIGINT) AS n_values,
       CAST(COUNT(m) AS BIGINT) AS n_numeric,
       CAST(MIN(m) AS BIGINT) AS min_micro,
       CAST(MAX(m) AS BIGINT) AS max_micro,
       CAST(SUM(m) AS BIGINT) AS sum_micro
FROM (
  SELECT pred,
         CASE WHEN ip <> ''
              THEN CAST(ip AS BIGINT) * 1000000
                   + CAST(substr(rpad(replace(fr, '.', ''), 6, '0'),
                                 1, 6) AS BIGINT)
         END AS m
  FROM (SELECT pred,
               replace(regexp_extract(obj,
                   '([0-9][0-9,]*)(\.[0-9]+)?', 1), ',', '') AS ip,
               regexp_extract(obj,
                   '([0-9][0-9,]*)(\.[0-9]+)?', 2) AS fr
        FROM (SELECT DISTINCT pred, obj FROM triples)))
GROUP BY pred""")


# ---------------------------------------------------------------------------
# Continuation batch 21: typed wedge (metapath) counts.
# ---------------------------------------------------------------------------

# typed_wedges: open-wedge counts per (endpoint-type, middle-type,
# endpoint-type) over the co-mention graph with majority node types
# and the middle-role hub cap (operators/graph_algos.typed_wedges).
ORACLE["typed_wedges"] = _q("""
SELECT least(tx.major_type, tz.major_type) AS type_a,
       tm.major_type AS type_mid,
       greatest(tx.major_type, tz.major_type) AS type_b,
       CAST(COUNT(*) AS BIGINT) AS n_wedges
FROM (SELECT l.dst AS mid, l.src AS x, r.dst AS z
      FROM com_sym l
      JOIN tw_ok o ON o.mid = l.dst
      JOIN com_sym r ON r.src = l.dst
      WHERE l.src < r.dst) w
JOIN etc_major tx ON tx.canonical_id = w.x
JOIN etc_major tm ON tm.canonical_id = w.mid
JOIN etc_major tz ON tz.canonical_id = w.z
GROUP BY 1, 2, 3""", LINK_CTES, COMENTION_CTES.strip(), _ETC_CTES, """
tw_ok AS (
  SELECT src AS mid FROM com_sym GROUP BY src
  HAVING COUNT(*) <= 1000)""")


# ---------------------------------------------------------------------------
# Continuation batch 22: KG-quality KPIs.
# ---------------------------------------------------------------------------

# kg_completeness: per-subject predicate coverage vs the schema
# vocabulary (operators/triples.kg_completeness).
ORACLE["kg_completeness"] = _q("""
SELECT p.subj, p.n_preds, s.n_schema,
       CAST(p.n_preds * 1000000 // s.n_schema AS BIGINT)
           AS completeness_micro6
FROM (SELECT subj, CAST(COUNT(*) AS BIGINT) AS n_preds
      FROM (SELECT DISTINCT subj, pred FROM triples) GROUP BY 1) p
CROSS JOIN (SELECT CAST(COUNT(DISTINCT pred) AS BIGINT) AS n_schema
            FROM triples) s""")

# extraction_yield: per-host share of pages producing >= 1 triple
# (operators/triples.extraction_yield).
ORACLE["extraction_yield"] = _q("""
SELECT d.host, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN t.doc_id IS NULL THEN 0 ELSE 1 END)
            AS BIGINT) AS n_docs_with_triples,
       CAST(SUM(CASE WHEN t.doc_id IS NULL THEN 0 ELSE 1 END)
            * 1000000 // COUNT(*) AS BIGINT) AS yield_micro6
FROM (SELECT DISTINCT regexp_extract(url, '^https?://([^/]*)', 1)
          AS host, doc_id
      FROM pages) d
LEFT JOIN (SELECT DISTINCT doc_id FROM triples) t USING (doc_id)
GROUP BY d.host""")


# ---------------------------------------------------------------------------
# Continuation batch 23: SPARQL-algebra read paths (property-path
# chain profile, OPTIONAL, NOT EXISTS) over the attribute KG.
# ---------------------------------------------------------------------------

# chain_patterns: directed 2-hop property-path profile over the
# ORIENTATION CLOSURE of the KG edge table (forward + '^'||pred
# inverse edges — SPARQL's ^p) with the mid-role hub cap
# (operators/graph_algos.chain_patterns via q_chain_patterns).
# Reuses _pagerank_sql's graph prelude slice for the ge edge CTE.
_CP_PRELUDE = _pagerank_sql(n_iter=1).split("pr0 AS MATERIALIZED")[0].rstrip()
assert _CP_PRELUDE.endswith(","), "prelude slice must end at a CTE comma"
ORACLE["chain_patterns"] = _q(f"""{_CP_PRELUDE}
cp_e AS MATERIALIZED (
  SELECT subj_node, pred, obj_node FROM ge
  UNION ALL
  SELECT obj_node AS subj_node, '^' || pred AS pred,
         subj_node AS obj_node
  FROM ge),
cp_in AS (
  SELECT obj_node AS mid, COUNT(DISTINCT subj_node) AS ind
  FROM cp_e GROUP BY 1),
cp_out AS (
  SELECT subj_node AS mid, COUNT(DISTINCT obj_node) AS outd
  FROM cp_e GROUP BY 1),
cp_mid AS MATERIALIZED (
  SELECT i.mid FROM cp_in i JOIN cp_out o USING (mid)
  WHERE i.ind <= 1000 AND o.outd <= 1000)
SELECT e1.pred AS pred_a, e2.pred AS pred_b,
       CAST(COUNT(*) AS BIGINT) AS n_chains,
       CAST(COUNT(DISTINCT (e1.subj_node, e2.obj_node)) AS BIGINT)
           AS n_paths,
       CAST(COUNT(DISTINCT e1.obj_node) AS BIGINT) AS n_mids
FROM cp_e e1
JOIN cp_mid m ON e1.obj_node = m.mid
JOIN cp_e e2 ON e2.subj_node = e1.obj_node
GROUP BY 1, 2""", LINK_CTES)

# Shared predicate-election CTEs for the OPTIONAL / NOT-EXISTS read
# paths: rank predicates by distinct-fact attestation (count desc,
# name asc) — the same election optional_query/negation_query do with
# a bounded 2-row collect.
_SPQ_CTES = """
spq_f AS MATERIALIZED (SELECT DISTINCT subj, pred, obj FROM triples),
spq_top AS MATERIALIZED (
  SELECT pred, ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, pred) AS rk
  FROM spq_f GROUP BY pred)"""

# optional_query: left-outer BGP — subjects of the top predicate with
# the runner-up predicate OPTIONAL (operators/triples.optional_query).
ORACLE["optional_query"] = _q("""
SELECT r.subj, r.n_req,
       CAST(COALESCE(o.n_opt, 0) AS BIGINT) AS n_opt,
       CAST(CASE WHEN o.subj IS NULL THEN 0 ELSE 1 END AS INT)
           AS has_opt
FROM (SELECT subj, CAST(COUNT(*) AS BIGINT) AS n_req FROM spq_f
      WHERE pred = (SELECT pred FROM spq_top WHERE rk = 1)
      GROUP BY subj) r
LEFT JOIN (SELECT subj, CAST(COUNT(*) AS BIGINT) AS n_opt FROM spq_f
           WHERE pred = (SELECT pred FROM spq_top WHERE rk = 2)
           GROUP BY subj) o USING (subj)""", _SPQ_CTES)

# negation_query: per-predicate NOT-EXISTS profile vs the anchor
# predicate (operators/triples.negation_query).
ORACLE["negation_query"] = _q("""
SELECT f.pred, CAST(COUNT(*) AS BIGINT) AS n_subj,
       CAST(SUM(CASE WHEN h.subj IS NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_without_anchor,
       CAST(SUM(CASE WHEN h.subj IS NULL THEN 1 ELSE 0 END)
            * 1000000 // COUNT(*) AS BIGINT) AS miss_micro6
FROM (SELECT DISTINCT subj, pred FROM spq_f) f
LEFT JOIN (SELECT DISTINCT subj FROM spq_f
           WHERE pred = (SELECT pred FROM spq_top WHERE rk = 1)) h
  USING (subj)
GROUP BY f.pred""", _SPQ_CTES)


# ---------------------------------------------------------------------------
# Continuation batch 24: integer TransE scoring + filtered
# link-prediction ranks.  The score expression string is IMPORTED from
# the operator module and parsed by both engines — no drift possible.
# ---------------------------------------------------------------------------

from ..operators.kg_embed import transe_score_sql as _te_score  # noqa: E402

ORACLE["transe_scores"] = _q(f"""
SELECT subj, pred, obj,
       CAST({_te_score('subj', 'pred', 'obj')} AS BIGINT) AS score
FROM (SELECT DISTINCT subj, pred, obj FROM triples)""")

ORACLE["transe_ranks"] = _q(f"""
SELECT r.pred, n.n_cands, r.n_test, r.sum_rank,
       CAST(r.sum_rank * 1000000 // r.n_test AS BIGINT)
           AS mean_rank_micro6,
       r.hits_at_1, r.hits_at_k
FROM (SELECT pred, CAST(COUNT(*) AS BIGINT) AS n_test,
             CAST(SUM(rnk) AS BIGINT) AS sum_rank,
             CAST(SUM(CASE WHEN rnk = 1 THEN 1 ELSE 0 END) AS BIGINT)
                 AS hits_at_1,
             CAST(SUM(CASE WHEN rnk <= 10 THEN 1 ELSE 0 END)
                  AS BIGINT) AS hits_at_k
      FROM te_rank GROUP BY pred) r
JOIN te_nc n USING (pred)""", f"""
te_f AS MATERIALIZED (SELECT DISTINCT subj, pred, obj FROM triples),
te_scored AS MATERIALIZED (
  SELECT subj, pred, obj,
         CAST({_te_score('subj', 'pred', 'obj')} AS BIGINT)
             AS score_true
  FROM te_f),
te_cand AS MATERIALIZED (
  SELECT pred, obj AS obj_c FROM (
    SELECT pred, obj,
           ROW_NUMBER() OVER (PARTITION BY pred
                              ORDER BY md5(obj), obj) AS rk
    FROM (SELECT DISTINCT pred, obj FROM te_f))
  WHERE rk <= 100),
te_nc AS (
  SELECT pred, CAST(COUNT(*) AS BIGINT) AS n_cands
  FROM te_cand GROUP BY 1),
te_corr AS MATERIALIZED (
  SELECT s.subj, s.pred, s.obj, s.score_true, c.obj_c,
         CAST({_te_score('s.subj', 's.pred', 'c.obj_c')} AS BIGINT)
             AS score_c
  FROM te_scored s JOIN te_cand c USING (pred)
  LEFT JOIN te_f t ON t.subj = s.subj AND t.pred = s.pred
                   AND t.obj = c.obj_c
  WHERE t.subj IS NULL),
te_rank AS (
  SELECT s.pred,
         1 + COALESCE(b.nb, 0) AS rnk
  FROM te_scored s
  LEFT JOIN (SELECT subj, pred, obj,
                    SUM(CASE WHEN score_c < score_true THEN 1
                             ELSE 0 END) AS nb
             FROM te_corr GROUP BY 1, 2, 3) b
    ON b.subj = s.subj AND b.pred = s.pred AND b.obj = s.obj)""")


# ---------------------------------------------------------------------------
# Continuation batch 25: exact integer modularity decomposition over
# the LPA partition (operators/graph_algos.modularity) — Q scaled by
# the exact rational 4m² so no float or signed division appears.
# ---------------------------------------------------------------------------

ORACLE["modularity"] = _q("""
SELECT p.label, p.n_nodes,
       CAST(COALESCE(i.n_internal, 0) AS BIGINT) AS n_internal,
       p.vol, (SELECT m FROM md_m) AS m,
       CAST(4 * (SELECT m FROM md_m) * COALESCE(i.n_internal, 0)
            - p.vol * p.vol AS BIGINT) AS q4m2
FROM md_lab p LEFT JOIN md_in i USING (label)""",
LINK_CTES, _lpa_sql(5), """
md_e2 AS MATERIALIZED (
  SELECT e.src AS a, e.dst AS b, la.label AS la, lb.label AS lb
  FROM ov_edges e
  JOIN lab5 la ON la.node = e.src
  JOIN lab5 lb ON lb.node = e.dst),
md_in AS (
  SELECT la AS label, CAST(COUNT(*) AS BIGINT) AS n_internal
  FROM md_e2 WHERE la = lb GROUP BY 1),
md_deg AS (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS deg
  FROM (SELECT src AS node FROM ov_edges
        UNION ALL SELECT dst FROM ov_edges)
  GROUP BY 1),
md_lab AS MATERIALIZED (
  SELECT l.label, CAST(COUNT(*) AS BIGINT) AS n_nodes,
         CAST(COALESCE(SUM(d.deg), 0) AS BIGINT) AS vol
  FROM lab5 l LEFT JOIN md_deg d ON d.node = l.node
  GROUP BY 1),
md_m AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM ov_edges)""")


# ---------------------------------------------------------------------------
# Continuation batch 26: meta-blocking entity resolution — token
# blocking with block purging, CBS pair weights, weighted-node
# pruning via exact integer cross-multiplication
# (operators/linking.token_blocks / meta_block_edges).
# ---------------------------------------------------------------------------

_MB_CTES = """
mb_f AS (SELECT DISTINCT lower(subj) AS ent, lower(obj) AS val
         FROM triples),
mb_toks AS MATERIALIZED (
  SELECT DISTINCT ent, token FROM (
    SELECT ent,
           unnest(string_split_regex(ent || ' ' || val,
                                     '[^a-z0-9]+')) AS token
    FROM mb_f)
  WHERE token <> '')"""

ORACLE["token_blocks"] = _q("""
SELECT token, CAST(COUNT(*) AS BIGINT) AS n_entities,
       CAST(CASE WHEN COUNT(*) > 50 THEN 1 ELSE 0 END AS INT)
           AS purged
FROM mb_toks GROUP BY token""", _MB_CTES)

_MBP_CTES = """
mb_kept AS (
  SELECT token FROM mb_toks GROUP BY token HAVING COUNT(*) <= 50),
mb_tk AS MATERIALIZED (
  SELECT t.ent, t.token FROM mb_toks t JOIN mb_kept k USING (token)),
mb_pairs AS MATERIALIZED (
  SELECT a.ent AS ent_a, b.ent AS ent_b,
         CAST(COUNT(*) AS BIGINT) AS cbs
  FROM mb_tk a JOIN mb_tk b ON a.token = b.token AND a.ent < b.ent
  GROUP BY 1, 2),
mb_stats AS MATERIALIZED (
  SELECT ent, CAST(COUNT(*) AS BIGINT) AS n_edges,
         CAST(SUM(cbs) AS BIGINT) AS sum_cbs
  FROM (SELECT ent_a AS ent, cbs FROM mb_pairs
        UNION ALL SELECT ent_b, cbs FROM mb_pairs)
  GROUP BY 1)"""

ORACLE["meta_block_edges"] = _q("""
SELECT p.ent_a, p.ent_b, p.cbs,
       CAST(CASE WHEN p.cbs * sa.n_edges >= sa.sum_cbs
                   OR p.cbs * sb.n_edges >= sb.sum_cbs
                 THEN 1 ELSE 0 END AS INT) AS keep
FROM mb_pairs p
JOIN mb_stats sa ON sa.ent = p.ent_a
JOIN mb_stats sb ON sb.ent = p.ent_b""", _MB_CTES, _MBP_CTES)


# ---------------------------------------------------------------------------
# Continuation batch 27: exact 2-D Pareto skyline of entities over
# (n_docs, n_facts) — running max over the distinct-x table, no pair
# enumeration (operators/triples.entity_skyline).
# ---------------------------------------------------------------------------

ORACLE["entity_skyline"] = _q("""
SELECT p.subj, p.n_docs, p.n_facts
FROM sk_pts p
JOIN sk_run r ON p.n_docs = r.n_docs AND p.n_facts = r.ymax
WHERE r.prev_max IS NULL OR r.ymax > r.prev_max""", """
sk_pts AS MATERIALIZED (
  SELECT subj, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
         CAST(COUNT(DISTINCT (pred, obj)) AS BIGINT) AS n_facts
  FROM triples GROUP BY subj),
sk_x AS (SELECT n_docs, MAX(n_facts) AS ymax FROM sk_pts GROUP BY 1),
sk_run AS (
  SELECT n_docs, ymax,
         MAX(ymax) OVER (ORDER BY n_docs DESC
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND 1 PRECEDING) AS prev_max
  FROM sk_x)""")


# ---------------------------------------------------------------------------
# Continuation batch 28: deterministic weighted bottom-k document
# sample per host (operators/sampling.weighted_sample) — the integer
# Efraimidis-Spirakis race; the priority expression is built by the
# shared operator-module generator (only the integer-division
# spelling differs, both operands non-negative).
# ---------------------------------------------------------------------------

from ..operators.sampling import weighted_priority_sql as _ws_prio  # noqa: E402

ORACLE["weighted_sample"] = _q(f"""
SELECT host, doc_id, weight, priority, CAST(rk AS INT) AS rk
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY host
                                   ORDER BY priority, doc_id) AS rk
      FROM ws_p)
WHERE rk <= 3""", f"""
ws_w AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS weight
         FROM toks GROUP BY 1),
ws_p AS MATERIALIZED (
  SELECT p.doc_id,
         regexp_extract(p.url, '^https?://([^/]*)', 1) AS host,
         w.weight,
         {_ws_prio("CAST(p.doc_id AS VARCHAR)", "w.weight", div="//")}
             AS priority
  FROM pages p JOIN ws_w w USING (doc_id))""")


# ---------------------------------------------------------------------------
# Continuation batch 29: approximate functional dependencies between
# predicates — TANE-style g3 keep-max measure over per-subject value
# elections (operators/triples.pred_fds).
# ---------------------------------------------------------------------------

ORACLE["pred_fds"] = _q("""
SELECT pred_a, pred_b,
       CAST(SUM(n) AS BIGINT) AS n_common,
       CAST(SUM(best) AS BIGINT) AS n_kept,
       CAST(SUM(best) * 1000000 // SUM(n) AS BIGINT) AS conf_micro6,
       CAST(CASE WHEN SUM(best) = SUM(n) THEN 1 ELSE 0 END AS INT)
           AS is_exact
FROM (SELECT pred_a, pred_b, va, SUM(cnt) AS n, MAX(cnt) AS best
      FROM (SELECT a.pred AS pred_a, b.pred AS pred_b,
                   a.val AS va, b.val AS vb,
                   CAST(COUNT(*) AS BIGINT) AS cnt
            FROM fd_vals a
            JOIN fd_vals b ON a.subj = b.subj AND a.pred <> b.pred
            GROUP BY 1, 2, 3, 4)
      GROUP BY 1, 2, 3)
GROUP BY 1, 2""", """
fd_vals AS MATERIALIZED (
  SELECT subj, pred, MIN(lower(obj)) AS val
  FROM triples GROUP BY 1, 2)""")


# ---------------------------------------------------------------------------
# Continuation batch 30: per-fact SCD2 run/gap/uptime profile
# (operators/triples.fact_runs) — wraps the triple_snapshots oracle
# verbatim so interval construction can never drift.
# ---------------------------------------------------------------------------

# one crawl week past the last scheduled crawl (g=2) + doc_id offsets
FACT_RUNS_HORIZON = 1704067200 + 4 * 604800

ORACLE["fact_runs"] = f"""
WITH iv AS MATERIALIZED ({ORACLE["triple_snapshots"]}),
fr AS (SELECT *, COALESCE(LEAD(valid_from) OVER (
           PARTITION BY url, subj, pred, obj ORDER BY valid_from)
           - valid_to, 0) AS gap
       FROM iv)
SELECT url, subj, pred, obj,
       CAST(COUNT(*) AS BIGINT) AS n_runs,
       CAST(MIN(valid_from) AS BIGINT) AS first_from,
       CAST(SUM(COALESCE(valid_to, {FACT_RUNS_HORIZON})
                - valid_from) AS BIGINT) AS live_s,
       CAST(MAX(CASE WHEN valid_to IS NULL THEN 1 ELSE 0 END)
            AS INT) AS is_current,
       CAST(MAX(gap) AS BIGINT) AS max_gap_s
FROM fr GROUP BY 1, 2, 3, 4"""


# ---------------------------------------------------------------------------
# Continuation batch 31: directed mention-precedence graph -> SCC ->
# bowtie (operators/linking.precedence_edges,
# operators/graph_algos.strongly_connected_components /
# bowtie_structure).  The oracle derives SCC membership from the
# TRANSITIVE CLOSURE (mutual reachability, component id = min mutual
# node) — a completely different algorithm from the Spark side's
# FW-BW min-label peeling, so a match certifies the peeling logic.

PREC_CTES = """
prec_pairs AS (
  SELECT DISTINCT a.url, a.canonical_id AS src, b.canonical_id AS dst
  FROM linked a JOIN linked b
    ON a.url = b.url AND a."end" <= b.start
   AND a.canonical_id <> b.canonical_id),
prec_edges AS MATERIALIZED (
  SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS n_pages
  FROM prec_pairs GROUP BY 1, 2),
pnodes AS MATERIALIZED (
  SELECT DISTINCT canonical_id AS node FROM linked),
pclos(u, v) AS (
  SELECT node AS u, node AS v FROM pnodes
  UNION
  SELECT c.u, e.dst AS v FROM pclos c JOIN prec_edges e ON e.src = c.v),
pscc AS MATERIALIZED (
  SELECT c1.u AS node, MIN(c1.v) AS scc_id
  FROM pclos c1 JOIN pclos c2 ON c1.u = c2.v AND c1.v = c2.u
  GROUP BY 1)"""

ORACLE["precedence_edges"] = _q("""
SELECT src, dst, n_pages FROM prec_edges""", LINK_CTES, PREC_CTES)

ORACLE["scc_components"] = _q("""
SELECT node, scc_id FROM pscc""", LINK_CTES, PREC_CTES)

ORACLE["bowtie_structure"] = _q("""
SELECT s.node,
       CASE WHEN s.scc_id = (SELECT scc_id FROM bt_core) THEN 'CORE'
            WHEN EXISTS (SELECT 1 FROM pclos c
                         WHERE c.u = s.node
                           AND c.v = (SELECT scc_id FROM bt_core))
                 THEN 'IN'
            WHEN EXISTS (SELECT 1 FROM pclos c
                         WHERE c.u = (SELECT scc_id FROM bt_core)
                           AND c.v = s.node)
                 THEN 'OUT'
            ELSE 'OTHER' END AS bowtie_class,
       s.scc_id
FROM pscc s""", LINK_CTES, PREC_CTES, """
bt_core AS MATERIALIZED (
  SELECT scc_id
  FROM (SELECT scc_id, COUNT(*) AS n FROM pscc GROUP BY 1)
  ORDER BY n DESC, scc_id ASC LIMIT 1)""")


# ---------------------------------------------------------------------------
# Continuation batch 32: greedy max-coverage corpus selection
# (operators/sampling.greedy_coverage, k=5) — the greedy rounds are
# unrolled as chained CTEs (the registry's CTE-unrolling device):
# selN is the argmax over the incidence rows rounds 1..N-1 left
# uncovered; an exhausted round yields an empty selN and every later
# round inherits the emptiness, mirroring the Spark early-stop.


def _greedy_coverage_parts(k: int = 5) -> tuple[str, str]:
    """(ctes, select) for the k unrolled greedy rounds."""
    blocks = ["""
gc_de AS MATERIALIZED (
  SELECT DISTINCT CAST(doc_id AS BIGINT) AS doc_id, canonical_id
  FROM linked),
gc_rem1 AS MATERIALIZED (SELECT * FROM gc_de)"""]
    selects = []
    for n in range(1, k + 1):
        blocks.append(f"""
gc_sel{n} AS MATERIALIZED (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS gain
  FROM gc_rem{n} GROUP BY 1
  ORDER BY gain DESC, doc_id ASC LIMIT 1)""")
        if n < k:
            blocks.append(f"""
gc_rem{n + 1} AS MATERIALIZED (
  SELECT * FROM gc_rem{n}
  WHERE doc_id NOT IN (SELECT doc_id FROM gc_sel{n})
    AND canonical_id NOT IN (
      SELECT canonical_id FROM gc_rem{n}
      WHERE doc_id IN (SELECT doc_id FROM gc_sel{n})))""")
        cum = " + ".join(f"(SELECT gain FROM gc_sel{i})"
                         for i in range(1, n + 1))
        selects.append(
            f"SELECT CAST({n} AS INT) AS pick_rank, doc_id, gain,\n"
            f"       CAST({cum} AS BIGINT) AS covered_cum\n"
            f"FROM gc_sel{n}")
    return ",".join(blocks), "\nUNION ALL\n".join(selects)


_GC_CTES, _GC_SELECT = _greedy_coverage_parts()
ORACLE["greedy_coverage"] = _q(_GC_SELECT, LINK_CTES, _GC_CTES)


# ---------------------------------------------------------------------------
# Continuation batch 33: exact set-similarity join by prefix
# filtering (operators/dedup.prefix_filter_pairs, threshold 80%).
# Same global token order both sides: (doc-frequency ASC, token ASC),
# applied per doc — the candidate set is deterministic, and the
# verify arithmetic is all-BIGINT with floor division.

_PFP_CTES = """
pf_dt AS MATERIALIZED (
  SELECT DISTINCT CAST(doc_id AS BIGINT) AS doc_id,
         lower(token) AS tok
  FROM toks),
pf_freq AS MATERIALIZED (
  SELECT tok, CAST(COUNT(*) AS BIGINT) AS n_docs
  FROM pf_dt GROUP BY 1),
pf_sized AS (
  SELECT d.doc_id, d.tok,
         CAST(COUNT(*) OVER (PARTITION BY d.doc_id) AS BIGINT) AS n,
         ROW_NUMBER() OVER (PARTITION BY d.doc_id
                            ORDER BY f.n_docs ASC, d.tok ASC) AS pos
  FROM pf_dt d JOIN pf_freq f USING (tok)),
pf_pref AS MATERIALIZED (
  SELECT doc_id, tok FROM pf_sized
  WHERE pos <= n - ((80 * n + 99) // 100) + 1),
pf_cand AS MATERIALIZED (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM pf_pref a JOIN pf_pref b USING (tok)
  WHERE a.doc_id < b.doc_id),
pf_sizes AS MATERIALIZED (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_toks
  FROM pf_dt GROUP BY 1),
pf_inter AS (
  SELECT c.doc_a, c.doc_b, CAST(COUNT(*) AS BIGINT) AS n_inter
  FROM pf_cand c
  JOIN pf_dt x ON x.doc_id = c.doc_a
  JOIN pf_dt y ON y.doc_id = c.doc_b AND y.tok = x.tok
  GROUP BY 1, 2)"""

ORACLE["prefix_filter_pairs"] = _q("""
SELECT doc_a, doc_b, n_inter, n_union,
       CAST((n_inter * 1000000) // n_union AS BIGINT) AS jac_micro6
FROM (
  SELECT c.doc_a, c.doc_b,
         CAST(COALESCE(i.n_inter, 0) AS BIGINT) AS n_inter,
         CAST(sa.n_toks + sb.n_toks - COALESCE(i.n_inter, 0)
              AS BIGINT) AS n_union
  FROM pf_cand c
  LEFT JOIN pf_inter i ON i.doc_a = c.doc_a AND i.doc_b = c.doc_b
  JOIN pf_sizes sa ON sa.doc_id = c.doc_a
  JOIN pf_sizes sb ON sb.doc_id = c.doc_b)
WHERE n_inter * 100 >= n_union * 80""", _PFP_CTES)


# ---------------------------------------------------------------------------
# Continuation batch 34: Luby maximal independent set over the entity
# co-mention graph (operators/graph_algos.luby_mis, 6 rounds).  The
# derandomized md5-hex6 priority is the shared randomness primitive;
# winner election is a strict (prio, node) tuple compare, so every
# round's winner set is deterministic and the whole unrolling is
# engine-exact.  Graph prelude = COMENTION_CTES (comention/com_sym) +
# cc_nodes, the same construction q_mis_nodes composes on the Spark
# side.

def _mis_sql(n_rounds: int = 6) -> str:
    blocks = ["misact0 AS MATERIALIZED (SELECT node FROM cc_nodes)"]
    for r in range(1, n_rounds + 1):
        prio = _qm_hex6(f"'mis:{r}:' || node")
        blocks.append(f"""mpr{r} AS MATERIALIZED (
  SELECT node, CAST({prio} AS BIGINT) AS prio FROM misact{r - 1}),
mwin{r} AS MATERIALIZED (
  SELECT n.node FROM mpr{r} n
  WHERE NOT EXISTS (
    SELECT 1 FROM com_sym e JOIN mpr{r} m ON m.node = e.dst
    WHERE e.src = n.node
      AND (m.prio < n.prio
           OR (m.prio = n.prio AND m.node < n.node)))),
mexc{r} AS MATERIALIZED (
  SELECT DISTINCT e.dst AS node
  FROM com_sym e
  JOIN mwin{r} w ON e.src = w.node
  JOIN misact{r - 1} a ON a.node = e.dst),
misact{r} AS MATERIALIZED (
  SELECT node FROM misact{r - 1}
  WHERE node NOT IN (SELECT node FROM mwin{r})
    AND node NOT IN (SELECT node FROM mexc{r}))""")
    return ",\n".join(blocks)


def _mis_select(n_rounds: int = 6) -> str:
    parts = []
    for r in range(1, n_rounds + 1):
        parts.append(f"SELECT node, CAST(1 AS INT) AS in_mis, "
                     f"CAST({r} AS BIGINT) AS decided_round "
                     f"FROM mwin{r}")
        parts.append(f"SELECT node, CAST(0 AS INT) AS in_mis, "
                     f"CAST({r} AS BIGINT) AS decided_round "
                     f"FROM mexc{r}")
    parts.append(f"SELECT node, CAST(-1 AS INT) AS in_mis, "
                 f"CAST(0 AS BIGINT) AS decided_round "
                 f"FROM misact{n_rounds}")
    return " UNION ALL ".join(parts)


ORACLE["mis_nodes"] = _q(_mis_select(6), LINK_CTES,
                         COMENTION_CTES.strip(), _mis_sql(6))


# ---------------------------------------------------------------------------
# Continuation batch 35: RDFS-style domain/range type inference
# (operators/linking.rdfs_type_inference).  Axiom election = plurality
# type per predicate with at-least-half support (2*n >= tot), ties by
# type name — the pred_violations election rule with a support gate.
# All counts BIGINT; the output is pure strings + a 0/1 INT flag.

_TI_CTES = """
ti_subj AS MATERIALIZED (
  SELECT t.pred, l.canonical_id, l.ent_type
  FROM triples t
  JOIN linked l ON t.url = l.url AND t.subj_id = l.ent_id),
ti_obj AS MATERIALIZED (
  SELECT t.pred, g.canonical_id, g.ent_type
  FROM triples t JOIN gaz g ON lower(t.obj) = g.alias),
ti_dom AS MATERIALIZED (
  SELECT pred, ent_type AS axiom_type FROM (
    SELECT pred, ent_type, n,
           SUM(n) OVER (PARTITION BY pred) AS tot,
           ROW_NUMBER() OVER (PARTITION BY pred
                              ORDER BY n DESC, ent_type ASC) AS rk
    FROM (SELECT pred, ent_type, CAST(COUNT(*) AS BIGINT) AS n
          FROM ti_subj GROUP BY 1, 2))
  WHERE rk = 1 AND 2 * n >= tot),
ti_rng AS MATERIALIZED (
  SELECT pred, ent_type AS axiom_type FROM (
    SELECT pred, ent_type, n,
           SUM(n) OVER (PARTITION BY pred) AS tot,
           ROW_NUMBER() OVER (PARTITION BY pred
                              ORDER BY n DESC, ent_type ASC) AS rk
    FROM (SELECT pred, ent_type, CAST(COUNT(*) AS BIGINT) AS n
          FROM ti_obj GROUP BY 1, 2))
  WHERE rk = 1 AND 2 * n >= tot),
ti_decl AS MATERIALIZED (
  SELECT DISTINCT canonical_id, ent_type FROM linked),
ti_inf AS (
  SELECT DISTINCT s.canonical_id, d.axiom_type AS ent_type,
         'domain' AS source
  FROM ti_subj s JOIN ti_dom d USING (pred)
  UNION ALL
  SELECT DISTINCT o.canonical_id, r.axiom_type AS ent_type,
         'range' AS source
  FROM ti_obj o JOIN ti_rng r USING (pred))"""

ORACLE["type_inference"] = _q("""
SELECT canonical_id, ent_type, 'declared' AS source,
       CAST(0 AS INT) AS is_new
FROM ti_decl
UNION ALL
SELECT i.canonical_id, i.ent_type, i.source,
       CAST(CASE WHEN d.ent_type IS NULL THEN 1 ELSE 0 END AS INT)
         AS is_new
FROM ti_inf i
LEFT JOIN ti_decl d ON d.canonical_id = i.canonical_id
                   AND d.ent_type = i.ent_type""", LINK_CTES, _TI_CTES)


# ---------------------------------------------------------------------------
# Continuation batch 36: sorted-neighborhood blocking over mention
# surfaces (operators/linking.sorted_neighborhood_pairs, window 3).
# Per-(host, ent_type) sort + LEAD pairing — both engines compare the
# same distinct lowercased surfaces bytewise, so the neighbor lists
# are identical.

_SN_CTES = """
sn_recs AS MATERIALIZED (
  SELECT DISTINCT split_part(split_part(url, '//', 2), '/', 1) AS host,
         ent_type, lower(ent_text) AS surface
  FROM mentions),
sn_lead AS (
  SELECT host, ent_type, surface AS surf_a,
         LEAD(surface, 1) OVER w AS l1,
         LEAD(surface, 2) OVER w AS l2
  FROM sn_recs
  WINDOW w AS (PARTITION BY host, ent_type ORDER BY surface))"""

ORACLE["sn_pairs"] = _q("""
SELECT host, ent_type, surf_a, l1 AS surf_b, CAST(1 AS INT) AS pos_gap
FROM sn_lead WHERE l1 IS NOT NULL
UNION ALL
SELECT host, ent_type, surf_a, l2 AS surf_b, CAST(2 AS INT) AS pos_gap
FROM sn_lead WHERE l2 IS NOT NULL""", _SN_CTES)


# ---------------------------------------------------------------------------
# Continuation batch 37: truncated Katz centrality over the entity
# co-mention graph (operators/graph_algos.katz_index, depth 3, beta =
# 1/8 scaled by 8^3 = 512).  Pure integer matrix-power column sums —
# one keyed aggregate per level, bit-exact regardless of summation
# order.

_KZ_CTES = """
kz_w1 AS MATERIALIZED (
  SELECT dst AS node, CAST(COUNT(*) AS BIGINT) AS w1
  FROM com_sym GROUP BY 1),
kz_w2 AS MATERIALIZED (
  SELECT e.dst AS node, CAST(SUM(d.w1) AS BIGINT) AS w2
  FROM com_sym e JOIN kz_w1 d ON d.node = e.src GROUP BY 1),
kz_w3 AS (
  SELECT e.dst AS node, CAST(SUM(x.w2) AS BIGINT) AS w3
  FROM com_sym e JOIN kz_w2 x ON x.node = e.src GROUP BY 1)"""

ORACLE["katz_scores"] = _q("""
SELECT n.node,
       CAST(COALESCE(a.w1, 0) AS BIGINT) AS w1,
       CAST(COALESCE(b.w2, 0) AS BIGINT) AS w2,
       CAST(COALESCE(c.w3, 0) AS BIGINT) AS w3,
       CAST(64 * COALESCE(a.w1, 0) + 8 * COALESCE(b.w2, 0)
            + COALESCE(c.w3, 0) AS BIGINT) AS katz_x512
FROM cc_nodes n
LEFT JOIN kz_w1 a ON a.node = n.node
LEFT JOIN kz_w2 b ON b.node = n.node
LEFT JOIN kz_w3 c ON c.node = n.node""", LINK_CTES,
COMENTION_CTES.strip(), _KZ_CTES)


# ---------------------------------------------------------------------------
# Continuation batch 38: per-entity butterfly (bipartite 4-cycle)
# counts over the doc-entity incidence (operators/graph_algos.
# butterfly_counts) — exact via the C(d, 2) wedge identity; d*(d-1)
# is always even so // 2 is exact.

_BF_CTES = """
bf_inc AS MATERIALIZED (
  SELECT DISTINCT doc_id, canonical_id FROM linked),
bf_pair AS MATERIALIZED (
  SELECT a.canonical_id AS x, b.canonical_id AS y,
         CAST(COUNT(*) AS BIGINT) AS d
  FROM bf_inc a JOIN bf_inc b
    ON a.doc_id = b.doc_id AND a.canonical_id < b.canonical_id
  GROUP BY 1, 2),
bf_node AS (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS n_copartners,
         CAST(SUM((d * (d - 1)) // 2) AS BIGINT) AS n_butterflies
  FROM (SELECT x AS node, d FROM bf_pair
        UNION ALL SELECT y AS node, d FROM bf_pair)
  GROUP BY 1)"""

ORACLE["butterflies"] = _q("""
SELECT n.node,
       CAST(COALESCE(b.n_copartners, 0) AS BIGINT) AS n_copartners,
       CAST(COALESCE(b.n_butterflies, 0) AS BIGINT) AS n_butterflies
FROM cc_nodes n LEFT JOIN bf_node b ON b.node = n.node""",
LINK_CTES, _BF_CTES)


# ---------------------------------------------------------------------------
# Continuation batch 39: B-cubed P/R/F1 of the attribute-merge
# clustering vs the alias-link canonical labels (operators/evaluate.
# bcubed_scores).  Per-item P/R floor-scaled to micro6 BEFORE the
# averages, so every sum is an order-independent integer sum; F1 is
# one integer division over the floored averages.

_BC_CTES = """
bc_gold AS MATERIALIZED (
  SELECT t.subj AS item, MIN(l.canonical_id) AS label
  FROM triples t
  JOIN linked l ON t.url = l.url AND t.subj_id = l.ent_id
  GROUP BY 1),
bc_j AS MATERIALIZED (
  SELECT p.node AS item, p.label AS cluster, g.label
  FROM am_labels p JOIN bc_gold g ON g.item = p.node),
bc_cs AS (SELECT cluster, CAST(COUNT(*) AS BIGINT) AS cs
          FROM bc_j GROUP BY 1),
bc_gs AS (SELECT label, CAST(COUNT(*) AS BIGINT) AS gs
          FROM bc_j GROUP BY 1),
bc_in AS (SELECT cluster, label, CAST(COUNT(*) AS BIGINT) AS i
          FROM bc_j GROUP BY 1, 2),
bc_per AS (
  SELECT (i.i * 1000000) // c.cs AS p,
         (i.i * 1000000) // g.gs AS r
  FROM bc_j j
  JOIN bc_in i ON i.cluster = j.cluster AND i.label = j.label
  JOIN bc_cs c ON c.cluster = j.cluster
  JOIN bc_gs g ON g.label = j.label),
bc_sum AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_items,
         CAST(SUM(p) AS BIGINT) AS sp,
         CAST(SUM(r) AS BIGINT) AS sr
  FROM bc_per)"""

ORACLE["bcubed"] = _q("""
SELECT n_items,
       CAST(sp // n_items AS BIGINT) AS bcubed_p_micro6,
       CAST(sr // n_items AS BIGINT) AS bcubed_r_micro6,
       CAST(CASE WHEN sp // n_items + sr // n_items > 0
                 THEN (2 * (sp // n_items) * (sr // n_items))
                      // (sp // n_items + sr // n_items)
                 ELSE 0 END AS BIGINT) AS bcubed_f1_micro6
FROM bc_sum""", _EJ_CTES, _AM_CTES, LINK_CTES, _BC_CTES)


# ---------------------------------------------------------------------------
# Continuation batch 40: co-citation + bibliographic coupling over
# the directed precedence graph (operators/graph_algos.
# cocitation_coupling).  Reuses PREC_CTES' edge construction by
# slicing off the (expensive, recursive) closure CTEs — graph
# construction can never drift from the SCC/bowtie oracles.

_PREC_EDGE_CTES = PREC_CTES.split("pnodes")[0].rstrip().rstrip(",")

_CCB_CTES = _PREC_EDGE_CTES + """,
ccb_co AS (
  SELECT a.dst AS node_a, b.dst AS node_b,
         CAST(COUNT(*) AS BIGINT) AS n_cocite
  FROM prec_edges a JOIN prec_edges b
    ON a.src = b.src AND a.dst < b.dst
  GROUP BY 1, 2),
ccb_bc AS (
  SELECT a.src AS node_a, b.src AS node_b,
         CAST(COUNT(*) AS BIGINT) AS n_coupling
  FROM prec_edges a JOIN prec_edges b
    ON a.dst = b.dst AND a.src < b.src
  GROUP BY 1, 2)"""

ORACLE["cocitation"] = _q("""
SELECT COALESCE(c.node_a, p.node_a) AS node_a,
       COALESCE(c.node_b, p.node_b) AS node_b,
       CAST(COALESCE(c.n_cocite, 0) AS BIGINT) AS n_cocite,
       CAST(COALESCE(p.n_coupling, 0) AS BIGINT) AS n_coupling
FROM ccb_co c
FULL JOIN ccb_bc p ON p.node_a = c.node_a AND p.node_b = c.node_b""",
LINK_CTES, _CCB_CTES)


# ---------------------------------------------------------------------------
# Continuation batch 41: Boruvka minimum spanning forest over the
# attribute-similarity graph (operators/graph_algos.boruvka_msf,
# cost = 1e6 - jac_micro6, total order (cost, src, dst), 6 rounds).
# Each round: per-component argmin edge (ROW_NUMBER over the doubled
# incidence), then hash-min contraction as a per-round bounded
# recursive CTE over the chosen COMPONENT edges — the LINK_CTES
# `reach` device applied per round.

def _boruvka_sql(n_rounds: int = 6) -> str:
    blocks = ["""bor_e AS MATERIALIZED (
  SELECT subj_a AS src, subj_b AS dst,
         CAST(1000000 - jac_micro6 AS BIGINT) AS cost
  FROM ej_pairs),
bor_lab0 AS MATERIALIZED (
  SELECT node, node AS comp FROM (
    SELECT DISTINCT src AS node FROM bor_e
    UNION SELECT DISTINCT dst AS node FROM bor_e))"""]
    for r in range(1, n_rounds + 1):
        blocks.append(f"""bor_ce{r} AS MATERIALIZED (
  SELECT la.comp AS ca, lb.comp AS cb, e.cost, e.src, e.dst
  FROM bor_e e
  JOIN bor_lab{r - 1} la ON la.node = e.src
  JOIN bor_lab{r - 1} lb ON lb.node = e.dst
  WHERE la.comp <> lb.comp),
bor_min{r} AS MATERIALIZED (
  SELECT DISTINCT src, dst, cost, ca, cb FROM (
    SELECT comp, cost, src, dst, ca, cb,
           ROW_NUMBER() OVER (PARTITION BY comp
                              ORDER BY cost, src, dst) AS rk
    FROM (SELECT ca AS comp, cost, src, dst, ca, cb FROM bor_ce{r}
          UNION ALL
          SELECT cb AS comp, cost, src, dst, ca, cb FROM bor_ce{r}))
  WHERE rk = 1),
bor_sym{r} AS MATERIALIZED (
  SELECT ca AS u, cb AS v FROM bor_min{r}
  UNION SELECT cb AS u, ca AS v FROM bor_min{r}),
bor_reach{r}(u, v) AS (
  SELECT u, u AS v FROM (SELECT DISTINCT u FROM bor_sym{r}) b
  UNION
  SELECT rr.u, s.v FROM bor_reach{r} rr
  JOIN bor_sym{r} s ON s.u = rr.v),
bor_new{r} AS MATERIALIZED (
  SELECT u AS comp, MIN(v) AS newc FROM bor_reach{r} GROUP BY 1),
bor_lab{r} AS MATERIALIZED (
  SELECT l.node, COALESCE(n.newc, l.comp) AS comp
  FROM bor_lab{r - 1} l LEFT JOIN bor_new{r} n ON n.comp = l.comp)""")
    return ",\n".join(blocks)


_BOR_SELECT = " UNION ALL ".join(
    f"SELECT src AS subj_a, dst AS subj_b, cost, "
    f"CAST({r} AS BIGINT) AS round FROM bor_min{r}"
    for r in range(1, 7))

ORACLE["msf_edges"] = _q(_BOR_SELECT, _EJ_CTES, _boruvka_sql(6))


# ---------------------------------------------------------------------------
# Continuation batch 42: HyperBall neighborhood function over the
# entity co-mention graph (operators/graph_algos.hyperball_nf,
# depth 3, m = 16 registers).  Same md5-hex register/rho
# decomposition as the hll_shingles oracle; the per-round ball
# advance is a union + (node, register) MAX — unrolled like the
# other iteratives.  Estimator integers: rho clamped at 20, scale
# 2^20, alpha_16 = 673/1000 folded into one integer division.

_HB_TAIL = "substring(_h, 2, 12)"
_HB_RHO = f"""CASE WHEN length(ltrim({_HB_TAIL}, '0')) = 0 THEN 49
  ELSE (12 - length(ltrim({_HB_TAIL}, '0'))) * 4
       + (CASE WHEN strpos('0123456789abcdef',
               substring(ltrim({_HB_TAIL}, '0'), 1, 1)) - 1 >= 8 THEN 0
               WHEN strpos('0123456789abcdef',
               substring(ltrim({_HB_TAIL}, '0'), 1, 1)) - 1 >= 4 THEN 1
               WHEN strpos('0123456789abcdef',
               substring(ltrim({_HB_TAIL}, '0'), 1, 1)) - 1 >= 2 THEN 2
               ELSE 3 END) + 1 END"""


def _hyperball_sql(depth: int = 3) -> str:
    blocks = [f"""hb_h AS (
  SELECT node, md5(CAST(node AS VARCHAR)) AS _h FROM cc_nodes),
hb0 AS MATERIALIZED (
  SELECT node,
         CAST(strpos('0123456789abcdef', substring(_h, 1, 1)) - 1
              AS INT) AS register,
         CAST({_HB_RHO} AS INT) AS rho
  FROM hb_h)"""]
    for d in range(1, depth + 1):
        blocks.append(f"""hb{d} AS MATERIALIZED (
  SELECT node, register, CAST(MAX(rho) AS INT) AS rho FROM (
    SELECT node, register, rho FROM hb{d - 1}
    UNION ALL
    SELECT e.dst AS node, s.register, s.rho
    FROM com_sym e JOIN hb{d - 1} s ON s.node = e.src)
  GROUP BY 1, 2)""")
    for d in range(0, depth + 1):
        blocks.append(f"""hbe{d} AS (
  SELECT node, CAST({d} AS BIGINT) AS dist,
         CAST(16777216 - SUM(1048576
              - (1 << (20 - LEAST(rho, 20)))) AS BIGINT) AS s_x2p20
  FROM hb{d} GROUP BY 1)""")
    return ",\n".join(blocks)


_HB_SELECT = ("SELECT node, dist, s_x2p20, "
              "CAST((CAST(673 AS BIGINT) * 256 * 1048576) // s_x2p20"
              " AS BIGINT) AS est_milli FROM ("
              + " UNION ALL ".join(
                  f"SELECT * FROM hbe{d}" for d in range(4)) + ")")

ORACLE["hyperball"] = _q(_HB_SELECT, LINK_CTES,
                         COMENTION_CTES.strip(), _hyperball_sql(3))


# ---------------------------------------------------------------------------
# Continuation batch 43: global neighborhood-function distribution —
# the distance-distribution rollup of the HyperBall table (one keyed
# aggregate over the batch-42 oracle, reused verbatim as a derived
# table so the two can never drift).

ORACLE["nf_distribution"] = f"""
SELECT dist, CAST(COUNT(*) AS BIGINT) AS n_nodes,
       CAST(SUM(est_milli) AS BIGINT) AS nf_sum_milli
FROM ({ORACLE["hyperball"]}) hb
GROUP BY dist"""


# ---------------------------------------------------------------------------
# Continuation batch 44: fixed-round integer SimRank over the
# directed precedence graph (operators/graph_algos.simrank_pairs,
# 3 rounds, C = 4/5, micro6 scores, one floor per pair per round).
# The diagonal seed is the co-citation wedge; each round joins the
# symmetric score table through the edge list twice.

def _simrank_sql(n_rounds: int = 3) -> str:
    blocks = ["""sr_ind AS MATERIALIZED (
  SELECT dst AS node, CAST(COUNT(*) AS BIGINT) AS ind
  FROM (SELECT DISTINCT src, dst FROM prec_edges) GROUP BY 1),
sr_diag AS MATERIALIZED (
  SELECT x.dst AS a, y.dst AS b, CAST(COUNT(*) AS BIGINT) AS c
  FROM (SELECT DISTINCT src, dst FROM prec_edges) x
  JOIN (SELECT DISTINCT src, dst FROM prec_edges) y
    ON x.src = y.src AND x.dst < y.dst
  GROUP BY 1, 2),
sr1 AS MATERIALIZED (
  SELECT d.a, d.b,
         CAST((4 * d.c * 1000000) // (5 * ia.ind * ib.ind)
              AS BIGINT) AS s
  FROM sr_diag d
  JOIN sr_ind ia ON ia.node = d.a
  JOIN sr_ind ib ON ib.node = d.b
  WHERE (4 * d.c * 1000000) // (5 * ia.ind * ib.ind) > 0)"""]
    for k in range(2, n_rounds + 1):
        blocks.append(f"""sr{k - 1}sym AS (
  SELECT a, b, s FROM sr{k - 1}
  UNION ALL SELECT b AS a, a AS b, s FROM sr{k - 1}),
srnd{k} AS MATERIALIZED (
  SELECT ea.dst AS a, eb.dst AS b, CAST(SUM(s.s) AS BIGINT) AS v
  FROM sr{k - 1}sym s
  JOIN (SELECT DISTINCT src, dst FROM prec_edges) ea ON ea.src = s.a
  JOIN (SELECT DISTINCT src, dst FROM prec_edges) eb ON eb.src = s.b
  WHERE ea.dst < eb.dst
  GROUP BY 1, 2),
sr{k} AS MATERIALIZED (
  SELECT p.a, p.b,
         CAST((4 * (COALESCE(n.v, 0) + COALESCE(d.c, 0) * 1000000))
              // (5 * ia.ind * ib.ind) AS BIGINT) AS s
  FROM (SELECT a, b FROM srnd{k} UNION SELECT a, b FROM sr_diag) p
  LEFT JOIN srnd{k} n ON n.a = p.a AND n.b = p.b
  LEFT JOIN sr_diag d ON d.a = p.a AND d.b = p.b
  JOIN sr_ind ia ON ia.node = p.a
  JOIN sr_ind ib ON ib.node = p.b
  WHERE (4 * (COALESCE(n.v, 0) + COALESCE(d.c, 0) * 1000000))
        // (5 * ia.ind * ib.ind) > 0)""")
    return ",\n".join(blocks)


ORACLE["simrank"] = _q(
    "SELECT a AS node_a, b AS node_b, s AS simrank_micro6 FROM sr3",
    LINK_CTES, _PREC_EDGE_CTES.lstrip(", \n"), _simrank_sql(3))


# ---------------------------------------------------------------------------
# Continuation batch 45: blocking-quality metrics — pair completeness
# + reduction ratio of the meta-blocking WNP survivors against the
# attribute-Jaccard >= 0.5 truth pairs (operators/linking.
# blocking_quality).  Reuses _MB_CTES/_MBP_CTES and _EJ_CTES so the
# candidate and truth definitions can never drift from their own
# oracles.

_BQ_CTES = """
bq_truth AS MATERIALIZED (
  SELECT DISTINCT least(lower(subj_a), lower(subj_b)) AS ent_a,
         greatest(lower(subj_a), lower(subj_b)) AS ent_b
  FROM ej_pairs
  WHERE jac_micro6 >= 500000 AND lower(subj_a) <> lower(subj_b)),
bq_cand AS MATERIALIZED (
  SELECT p.ent_a, p.ent_b
  FROM mb_pairs p
  JOIN mb_stats sa ON sa.ent = p.ent_a
  JOIN mb_stats sb ON sb.ent = p.ent_b
  WHERE p.cbs * sa.n_edges >= sa.sum_cbs
     OR p.cbs * sb.n_edges >= sb.sum_cbs),
bq_counts AS (
  SELECT (SELECT CAST(COUNT(*) AS BIGINT)
          FROM (SELECT DISTINCT lower(subj) FROM triples)) AS n_entities,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM bq_cand) AS n_cand,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM bq_truth) AS n_truth,
         (SELECT CAST(COUNT(*) AS BIGINT)
          FROM bq_cand c JOIN bq_truth t
            ON t.ent_a = c.ent_a AND t.ent_b = c.ent_b) AS n_hit)"""

ORACLE["blocking_metrics"] = _q("""
SELECT n_entities,
       CAST((n_entities * (n_entities - 1)) // 2 AS BIGINT)
           AS n_all_pairs,
       n_cand, n_truth, n_hit,
       CAST(CASE WHEN n_truth > 0 THEN (n_hit * 1000000) // n_truth
                 ELSE 0 END AS BIGINT) AS pc_micro6,
       CAST(CASE WHEN n_entities > 1
                 THEN 1000000 - (n_cand * 1000000)
                      // ((n_entities * (n_entities - 1)) // 2)
                 ELSE 0 END AS BIGINT) AS rr_micro6
FROM bq_counts""", _EJ_CTES, _MB_CTES, _MBP_CTES, _BQ_CTES)


# ---------------------------------------------------------------------------
# Continuation batch 46: per-edge triangle support + local-bridge
# flag over the co-mention graph (operators/graph_algos.edge_support)
# — the common-neighbor wedge join, LEFT-joined back so support-0
# edges (the local bridges) survive.

_LB_CTES = """
lb_cn AS MATERIALIZED (
  SELECT e.src, e.dst, CAST(COUNT(*) AS BIGINT) AS support
  FROM comention e
  JOIN com_sym s1 ON s1.src = e.src
  JOIN com_sym s2 ON s2.src = e.dst AND s2.dst = s1.dst
  GROUP BY 1, 2)"""

ORACLE["local_bridges"] = _q("""
SELECT e.src, e.dst,
       CAST(COALESCE(c.support, 0) AS BIGINT) AS support,
       CAST(CASE WHEN COALESCE(c.support, 0) = 0 THEN 1 ELSE 0 END
            AS INT) AS is_local_bridge
FROM comention e
LEFT JOIN lb_cn c ON c.src = e.src AND c.dst = e.dst""",
LINK_CTES, COMENTION_CTES.strip(), _LB_CTES)


# ---------------------------------------------------------------------------
# Continuation batch 47: 3-node graphlet orbit counts per node
# (operators/graph_algos.orbit_counts) — closed-form from degree,
# neighbor-degree sum and triangle counts; the triangle CTE repeats
# the graph_triangles a<b<c double join with prefixed names.

_OB_CTES = """
ob_deg AS MATERIALIZED (
  SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS deg
  FROM com_sym GROUP BY 1),
ob_s AS (
  SELECT s.src AS node, CAST(SUM(d.deg) AS BIGINT) AS sm
  FROM com_sym s JOIN ob_deg d ON d.node = s.dst GROUP BY 1),
ob_tri AS (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS t FROM (
    SELECT x AS node FROM (
      SELECT e1.src AS x, e1.dst AS y, e2.dst AS z
      FROM comention e1
      JOIN comention e2 ON e2.src = e1.dst
      JOIN comention e3 ON e3.src = e1.src AND e3.dst = e2.dst) t1
    UNION ALL
    SELECT y FROM (
      SELECT e1.src AS x, e1.dst AS y, e2.dst AS z
      FROM comention e1
      JOIN comention e2 ON e2.src = e1.dst
      JOIN comention e3 ON e3.src = e1.src AND e3.dst = e2.dst) t2
    UNION ALL
    SELECT z FROM (
      SELECT e1.src AS x, e1.dst AS y, e2.dst AS z
      FROM comention e1
      JOIN comention e2 ON e2.src = e1.dst
      JOIN comention e3 ON e3.src = e1.src AND e3.dst = e2.dst) t3)
  GROUP BY 1)"""

ORACLE["orbit_counts"] = _q("""
SELECT n.node,
       CAST(COALESCE(d.deg, 0) AS BIGINT) AS deg,
       CAST(COALESCE(s.sm, 0) - COALESCE(d.deg, 0)
            - 2 * COALESCE(t.t, 0) AS BIGINT) AS orbit1,
       CAST((COALESCE(d.deg, 0) * (COALESCE(d.deg, 0) - 1)) // 2
            - COALESCE(t.t, 0) AS BIGINT) AS orbit2,
       CAST(COALESCE(t.t, 0) AS BIGINT) AS n_triangles
FROM cc_nodes n
LEFT JOIN ob_deg d ON d.node = n.node
LEFT JOIN ob_s s ON s.node = n.node
LEFT JOIN ob_tri t ON t.node = n.node""",
LINK_CTES, COMENTION_CTES.strip(), _OB_CTES)


# ---------------------------------------------------------------------------
# Continuation batch 48: bounded regular-path-query reachability —
# SPARQL property path p{1,4} for the most-attested predicate, by
# prefix doubling (operators/triples.rpq_reach).

_RPQ_CTES = """
rpq_f AS MATERIALIZED (SELECT DISTINCT pred, subj, obj FROM triples),
rpq_top AS MATERIALIZED (
  SELECT pred FROM (
    SELECT pred, CAST(COUNT(*) AS BIGINT) AS n FROM rpq_f GROUP BY 1)
  ORDER BY n DESC, pred ASC LIMIT 1),
rpq_e AS MATERIALIZED (
  SELECT DISTINCT f.subj AS src, f.obj AS dst
  FROM rpq_f f JOIN rpq_top t ON t.pred = f.pred),
rpq_r2 AS MATERIALIZED (
  SELECT src, dst FROM rpq_e
  UNION
  SELECT a.src, b.dst FROM rpq_e a JOIN rpq_e b ON a.dst = b.src),
rpq_r4 AS (
  SELECT src, dst FROM rpq_r2
  UNION
  SELECT a.src, b.dst FROM rpq_r2 a JOIN rpq_r2 b ON a.dst = b.src)"""

ORACLE["rpq_reach"] = _q("SELECT src, dst FROM rpq_r4", _RPQ_CTES)


# ---------------------------------------------------------------------------
# Continuation batch 49: rolling distinct-entity estimates from
# per-day HLL sketches (functions/sketches.rolling_hll_estimates,
# window 3) — per-day 16-register tables, window answered by
# register max-merge; same register/rho decomposition as hll_shingles
# and the same clamped integer estimator as hyperball.

_RH_CTES = f"""
rh_items AS MATERIALIZED (
  SELECT DISTINCT CAST((1704067200 + doc_id) // 86400 AS BIGINT)
           AS day, canonical_id
  FROM linked),
rh_h AS (SELECT day, md5(CAST(canonical_id AS VARCHAR)) AS _h
         FROM rh_items),
rh_daily AS MATERIALIZED (
  SELECT day,
         CAST(strpos('0123456789abcdef', substring(_h, 1, 1)) - 1
              AS INT) AS register,
         CAST(MAX({_HB_RHO}) AS INT) AS rho
  FROM rh_h GROUP BY 1, 2),
rh_days AS (SELECT DISTINCT day AS day_idx FROM rh_items),
rh_slots AS (
  SELECT d.day + s.i AS day_idx, d.day, d.register, d.rho
  FROM rh_daily d, unnest(generate_series(0, 2)) AS s(i)),
rh_merged AS MATERIALIZED (
  SELECT s.day_idx, s.register, CAST(MAX(s.rho) AS INT) AS rho
  FROM rh_slots s JOIN rh_days y ON y.day_idx = s.day_idx
  GROUP BY 1, 2),
rh_nd AS (
  SELECT day_idx, CAST(COUNT(DISTINCT day) AS BIGINT) AS n_days_merged
  FROM (SELECT s.day_idx, s.day FROM rh_slots s
        JOIN rh_days y ON y.day_idx = s.day_idx)
  GROUP BY 1),
rh_est AS (
  SELECT day_idx,
         CAST(16777216 - SUM(1048576
              - (1 << (20 - LEAST(rho, 20)))) AS BIGINT) AS s_x2p20
  FROM rh_merged GROUP BY 1)"""

ORACLE["rolling_entity_hll"] = _q("""
SELECT e.day_idx, n.n_days_merged, e.s_x2p20,
       CAST((CAST(673 AS BIGINT) * 256 * 1048576) // e.s_x2p20
            AS BIGINT) AS est_milli
FROM rh_est e JOIN rh_nd n ON n.day_idx = e.day_idx""",
LINK_CTES, _RH_CTES)


# ---------------------------------------------------------------------------
# Continuation batch 50: categorical type-mixing matrix of the
# co-mention graph (operators/graph_algos.type_mixing) — edge counts
# per unordered elected-type pair + micro6 share of all typed edges.
# Reuses _ETC_CTES so the type election can never drift from
# entity_types.

_TM_CTES = """
tm_cnt AS MATERIALIZED (
  SELECT type_a, type_b, CAST(COUNT(*) AS BIGINT) AS n_edges FROM (
    SELECT least(ta.major_type, tb.major_type) AS type_a,
           greatest(ta.major_type, tb.major_type) AS type_b
    FROM comention e
    JOIN etc_major ta ON ta.canonical_id = e.src
    JOIN etc_major tb ON tb.canonical_id = e.dst)
  GROUP BY 1, 2)"""

ORACLE["type_mixing"] = _q("""
SELECT type_a, type_b, n_edges,
       CAST(n_edges * 1000000 // SUM(n_edges) OVER () AS BIGINT)
           AS share_micro6
FROM tm_cnt""", LINK_CTES, COMENTION_CTES.strip(), _ETC_CTES, _TM_CTES)


# ---------------------------------------------------------------------------
# Continuation batch 51: deterministic independent-cascade spread
# over the co-mention graph (operators/graph_algos.ic_spread,
# p = 35%): live edges by the md5-hex6 coin, then BFS from the
# lexicographically smallest node as a bounded recursive min-dist
# CTE (the graph_bfs device on the live subgraph).

_IC_CTES = f"""
ic_live AS MATERIALIZED (
  SELECT src, dst FROM comention
  WHERE {_qm_hex6("'ic:' || src || ':' || dst")} % 100 < 35),
ic_sym AS MATERIALIZED (
  SELECT src, dst FROM ic_live
  UNION SELECT dst AS src, src AS dst FROM ic_live),
ic_walk(node, d) AS (
  SELECT (SELECT MIN(node) FROM cc_nodes) AS node, 0 AS d
  UNION
  SELECT e.dst AS node, w.d + 1
  FROM ic_walk w JOIN ic_sym e ON e.src = w.node
  WHERE w.d < 25)"""

ORACLE["ic_spread"] = _q("""
SELECT node, CAST(MIN(d) AS BIGINT) AS activated_round
FROM ic_walk GROUP BY 1""", LINK_CTES, COMENTION_CTES.strip(),
_IC_CTES)


# ---------------------------------------------------------------------------
# Continuation batch 52: boolean-retrieval read path (functions/
# textstats.boolean_search_stats) — AND / OR / PHRASE doc counts for
# the corpus's two highest-df terms over the documents table (same
# tokenization as postings_lists; phrase = adjacency in the FILTERED
# token sequence, 0-based positions).

ORACLE["boolean_search"] = """
WITH bs_ts AS (
  SELECT doc_id, list_filter(string_split_regex(lower(text),
                                                '[\\n \\t]'),
                             t -> t <> '') AS ts
  FROM documents),
bs_toks AS MATERIALIZED (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         CAST(i AS INT) - 1 AS pos, ts[CAST(i AS INT)] AS term
  FROM bs_ts, unnest(generate_series(1, len(ts))) AS t(i)),
bs_sel AS MATERIALIZED (
  SELECT term, df, ROW_NUMBER() OVER (ORDER BY df DESC, term ASC)
             AS rk
  FROM (SELECT term, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
        FROM bs_toks GROUP BY 1)
  ORDER BY df DESC, term ASC LIMIT 2),
bs_hit AS MATERIALIZED (
  SELECT h.doc_id, h.pos, s.rk FROM bs_toks h
  JOIN bs_sel s USING (term)),
bs_doc AS (
  SELECT doc_id,
         MAX(CASE WHEN rk = 1 THEN 1 ELSE 0 END) AS ha,
         MAX(CASE WHEN rk = 2 THEN 1 ELSE 0 END) AS hb
  FROM bs_hit GROUP BY 1),
bs_phrase AS (
  SELECT DISTINCT a.doc_id FROM bs_hit a
  JOIN bs_hit b ON b.doc_id = a.doc_id
   AND a.rk = 1 AND b.rk = 2 AND b.pos = a.pos + 1)
SELECT (SELECT term FROM bs_sel WHERE rk = 1) AS term_a,
       (SELECT term FROM bs_sel WHERE rk = 2) AS term_b,
       (SELECT df FROM bs_sel WHERE rk = 1) AS df_a,
       (SELECT df FROM bs_sel WHERE rk = 2) AS df_b,
       (SELECT CAST(COALESCE(SUM(ha * hb), 0) AS BIGINT)
        FROM bs_doc) AS n_and,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM bs_doc) AS n_or,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM bs_phrase) AS n_phrase"""


# ---------------------------------------------------------------------------
# Continuation batch 53: mention-concentration profile — exact Gini
# (sorted-rank identity, ascending (count, entity) ranks) + top-1
# share of the per-entity mention counts (operators/linking.
# mention_concentration).  The numerator (2*S1 - (n+1)*S0) is formed
# BEFORE the 1e6 scale so every intermediate stays far inside int64.

_MG_CTES = """
mg_cnt AS MATERIALIZED (
  SELECT canonical_id, CAST(COUNT(*) AS BIGINT) AS x
  FROM linked GROUP BY 1),
mg_rank AS (
  SELECT x, CAST(ROW_NUMBER() OVER (
      ORDER BY x ASC, canonical_id ASC) AS BIGINT) AS i
  FROM mg_cnt),
mg_sum AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS s0,
         CAST(SUM(i * x) AS BIGINT) AS s1,
         CAST(MAX(x) AS BIGINT) AS xmax
  FROM mg_rank)"""

ORACLE["mention_gini"] = _q("""
SELECT n AS n_entities, s0 AS total_mentions,
       CAST(((2 * s1 - (n + 1) * s0) * 1000000) // (n * s0)
            AS BIGINT) AS gini_micro6,
       CAST((xmax * 1000000) // s0 AS BIGINT) AS top1_share_micro6
FROM mg_sum""", LINK_CTES, _MG_CTES)


# ---------------------------------------------------------------------------
# Continuation batch 55: full k-core decomposition by H-index
# iteration (operators/graph_algos.core_numbers, 8 rounds) — the
# per-round H-index is a window rank + MAX(LEAST(rank, value)), both
# order-invariant, unrolled like the other iteratives over the
# co-mention graph.

def _coreness_sql(n_rounds: int = 8) -> str:
    blocks = ["""hc0 AS MATERIALIZED (
  SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS c
  FROM com_sym GROUP BY 1)"""]
    for r in range(1, n_rounds + 1):
        blocks.append(f"""hc{r} AS MATERIALIZED (
  SELECT node, CAST(MAX(LEAST(rk, cn)) AS BIGINT) AS c FROM (
    SELECT s.src AS node, q.c AS cn,
           CAST(ROW_NUMBER() OVER (PARTITION BY s.src
                ORDER BY q.c DESC, s.dst ASC) AS BIGINT) AS rk
    FROM com_sym s JOIN hc{r - 1} q ON q.node = s.dst)
  GROUP BY 1)""")
    return ",\n".join(blocks)


ORACLE["core_numbers"] = _q(f"""
SELECT n.node, CAST(COALESCE(h.c, 0) AS BIGINT) AS coreness
FROM cc_nodes n LEFT JOIN hc8 h ON h.node = n.node""",
LINK_CTES, COMENTION_CTES.strip(), _coreness_sql(8))

ORACLE["landmark_centrality"] = _q("""
, lmset AS MATERIALIZED (
  SELECT src AS node FROM com_sym GROUP BY src
  ORDER BY COUNT(*) DESC, src ASC LIMIT 4),
mbfs(lm, node, d) AS (
  SELECT node, node, 0 FROM lmset
  UNION
  SELECT b.lm, e.dst, b.d + 1 FROM mbfs b JOIN com_sym e ON e.src = b.node
  WHERE b.d < (SELECT COUNT(*) FROM cc_nodes)),
mdist AS MATERIALIZED (
  SELECT lm, node, MIN(d) AS d FROM mbfs GROUP BY 1, 2),
lmscore AS (
  SELECT node, CAST(COUNT(*) AS INT) AS n_lm,
         CAST(SUM(d) AS BIGINT) AS sum_dist,
         CAST(SUM(1000000 // d) AS BIGINT) AS harmonic_micro6
  FROM mdist WHERE d > 0 GROUP BY node)
SELECT n.node,
       CAST(COALESCE(s.n_lm, 0) AS INT) AS n_lm,
       CAST(COALESCE(s.sum_dist, 0) AS BIGINT) AS sum_dist,
       CAST(COALESCE(s.harmonic_micro6, 0) AS BIGINT) AS harmonic_micro6,
       CAST(CASE WHEN COALESCE(s.sum_dist, 0) > 0
            THEN (1000000 * CAST(s.n_lm AS BIGINT)) // s.sum_dist
            ELSE 0 END AS BIGINT) AS closeness_micro6
FROM cc_nodes n LEFT JOIN lmscore s ON s.node = n.node""",
LINK_CTES, COMENTION_CTES.strip())


# ---------------------------------------------------------------------------
# Continuation batch 57: Fellegi-Sunter probabilistic record linkage
# (operators/linking.fs_labeled_pairs / fs_linkage_weights /
# fs_linkage_scores).  Counts are exact integers; each log-odds weight
# is the single-ln device: integer products, ONE double division, ONE
# ln, floor-scale 1e6 — identical arithmetic on both engines.

_FS_CTES = _SN_CTES + """,
fs_lp AS MATERIALIZED (
  SELECT p.host, p.ent_type, p.surf_a, p.surf_b, p.pos_gap,
         CAST(CASE WHEN COALESCE(ga.canonical_id, 'surface:' || p.surf_a)
                      = COALESCE(gb.canonical_id, 'surface:' || p.surf_b)
              THEN 1 ELSE 0 END AS INT) AS label,
         CAST(CASE WHEN substr(p.surf_a, 1, 1) = substr(p.surf_b, 1, 1)
              THEN 1 ELSE 0 END AS INT) AS first_char,
         CAST(CASE WHEN abs(length(p.surf_a) - length(p.surf_b)) <= 2
              THEN 1 ELSE 0 END AS INT) AS len_diff_le2,
         CAST(CASE WHEN len(string_split(p.surf_a, ' '))
                      = len(string_split(p.surf_b, ' '))
              THEN 1 ELSE 0 END AS INT) AS same_n_tokens,
         CAST(CASE WHEN len(list_intersect(string_split(p.surf_a, ' '),
                                           string_split(p.surf_b, ' '))) > 0
              THEN 1 ELSE 0 END AS INT) AS shared_token
  FROM (
    SELECT host, ent_type, surf_a, l1 AS surf_b, 1 AS pos_gap
    FROM sn_lead WHERE l1 IS NOT NULL
    UNION ALL
    SELECT host, ent_type, surf_a, l2 AS surf_b, 2 AS pos_gap
    FROM sn_lead WHERE l2 IS NOT NULL) p
  LEFT JOIN gaz ga ON ga.alias = p.surf_a AND ga.ent_type = p.ent_type
  LEFT JOIN gaz gb ON gb.alias = p.surf_b AND gb.ent_type = p.ent_type),
fs_tot AS MATERIALIZED (
  SELECT CAST(SUM(label) AS BIGINT) AS nm,
         CAST(COUNT(*) - SUM(label) AS BIGINT) AS nu
  FROM fs_lp),
fs_long AS (
  SELECT 'first_char' AS feature, first_char AS agree, label FROM fs_lp
  UNION ALL
  SELECT 'len_diff_le2', len_diff_le2, label FROM fs_lp
  UNION ALL
  SELECT 'same_n_tokens', same_n_tokens, label FROM fs_lp
  UNION ALL
  SELECT 'shared_token', shared_token, label FROM fs_lp),
fs_wm AS MATERIALIZED (
  SELECT feature,
         (SELECT nm FROM fs_tot) AS nm, (SELECT nu FROM fs_tot) AS nu,
         CAST(SUM(agree * label) AS BIGINT) AS am,
         CAST(SUM(agree * (1 - label)) AS BIGINT) AS au
  FROM fs_long GROUP BY feature),
fs_w AS MATERIALIZED (
  SELECT feature, nm AS n_match, nu AS n_unmatch,
         am AS n_agree_match, au AS n_agree_unmatch,
         CAST(floor(ln(CAST((am + 1) * (nu + 2) AS DOUBLE)
                       / CAST((nm + 2) * (au + 1) AS DOUBLE)) * 1000000)
           AS BIGINT) AS w_agree_micro6,
         CAST(floor(ln(CAST((nm + 1 - am) * (nu + 2) AS DOUBLE)
                       / CAST((nm + 2) * (nu + 1 - au) AS DOUBLE)) * 1000000)
           AS BIGINT) AS w_disagree_micro6
  FROM fs_wm)"""

ORACLE["fs_weights"] = _q("""
SELECT feature, n_match, n_unmatch, n_agree_match, n_agree_unmatch,
       w_agree_micro6, w_disagree_micro6
FROM fs_w""", _FS_CTES)

ORACLE["fs_scores"] = _q("""
, fs_wide AS (
  SELECT
    MAX(CASE WHEN feature = 'first_char' THEN w_agree_micro6 END) AS wa_first_char,
    MAX(CASE WHEN feature = 'first_char' THEN w_disagree_micro6 END) AS wd_first_char,
    MAX(CASE WHEN feature = 'len_diff_le2' THEN w_agree_micro6 END) AS wa_len_diff_le2,
    MAX(CASE WHEN feature = 'len_diff_le2' THEN w_disagree_micro6 END) AS wd_len_diff_le2,
    MAX(CASE WHEN feature = 'same_n_tokens' THEN w_agree_micro6 END) AS wa_same_n_tokens,
    MAX(CASE WHEN feature = 'same_n_tokens' THEN w_disagree_micro6 END) AS wd_same_n_tokens,
    MAX(CASE WHEN feature = 'shared_token' THEN w_agree_micro6 END) AS wa_shared_token,
    MAX(CASE WHEN feature = 'shared_token' THEN w_disagree_micro6 END) AS wd_shared_token
  FROM fs_w)
SELECT lp.host, lp.ent_type, lp.surf_a, lp.surf_b,
       CAST(lp.pos_gap AS INT) AS pos_gap,
       lp.first_char, lp.len_diff_le2, lp.same_n_tokens, lp.shared_token,
       lp.label,
       CAST((CASE WHEN lp.first_char = 1 THEN w.wa_first_char
             ELSE w.wd_first_char END)
          + (CASE WHEN lp.len_diff_le2 = 1 THEN w.wa_len_diff_le2
             ELSE w.wd_len_diff_le2 END)
          + (CASE WHEN lp.same_n_tokens = 1 THEN w.wa_same_n_tokens
             ELSE w.wd_same_n_tokens END)
          + (CASE WHEN lp.shared_token = 1 THEN w.wa_shared_token
             ELSE w.wd_shared_token END) AS BIGINT) AS score_micro6
FROM fs_lp lp CROSS JOIN fs_wide w""", _FS_CTES)


# ---------------------------------------------------------------------------
# Continuation batch 58: AMS tug-of-war F2 sketch over triples.obj
# (functions/sketches.ams_f2_with_exact).  Signs are md5 first-nibble
# parity — the same hex arithmetic as the HLL/count-min oracles — and
# every quantity is an integer sum, so the sketch is bit-exact across
# engines regardless of summation order.

def _ams_sql(col: str = "obj", n_est: int = 16) -> str:
    zcols = ",\n         ".join(
        f"CAST(SUM(1 - 2 * ((instr('0123456789abcdef', "
        f"substring(md5('ams:{r}:' || CAST({col} AS VARCHAR)), 1, 1)) - 1)"
        f" % 2)) AS BIGINT) AS z_{r}"
        for r in range(n_est))
    longsel = "\n  UNION ALL\n".join(
        f"  SELECT {r} AS est_id, z_{r} AS z FROM ams_wide"
        for r in range(n_est))
    return f"""
, ams_wide AS MATERIALIZED (
  SELECT {zcols}
  FROM triples WHERE {col} IS NOT NULL),
ams_long AS (
{longsel}),
ams_exact AS (
  SELECT CAST(SUM(c * c) AS BIGINT) AS exact_f2 FROM (
    SELECT COUNT(*) AS c FROM triples
    WHERE {col} IS NOT NULL GROUP BY {col}))
SELECT CAST(l.est_id AS INT) AS est_id, l.z,
       CAST(l.z * l.z AS BIGINT) AS z_sq, e.exact_f2
FROM ams_long l CROSS JOIN ams_exact e"""


ORACLE["ams_f2"] = _q(_ams_sql())


# ---------------------------------------------------------------------------
# Continuation batch 59: KMV bottom-k theta distinct sketch per host
# (functions/sketches.kmv_with_exact).  hval = integer value of the
# first 15 md5 hex nibbles (60 bits, exact BIGINT), unrolled as
# Horner nibble arithmetic; the estimator (k-1)*2^60 // kth_min is
# exact integer division on both engines (7 * 2^60 < 2^63).

_KMV_K = 8
_KMV_NUM = 7 * (1 << 60)


def _hex60_sql(expr: str) -> str:
    """Horner expansion of the first 15 hex nibbles of md5(expr):
    ((n1*16 + n2)*16 + n3) ... — exact BIGINT, no floats."""
    acc = (f"(instr('0123456789abcdef', substring(md5({expr}), 1, 1))"
           f" - 1)")
    for i in range(2, 16):
        acc = (f"({acc} * 16 + (instr('0123456789abcdef', "
               f"substring(md5({expr}), {i}, 1)) - 1))")
    return f"CAST({acc} AS BIGINT)"


ORACLE["kmv_entities"] = _q(f"""
SELECT e.grp AS host, e.n_seen, e.kth_hval,
       CAST(CASE WHEN e.n_seen < {_KMV_K} THEN e.n_seen
            ELSE {_KMV_NUM} // e.kth_hval END AS BIGINT)
           AS est_distinct,
       x.exact_distinct
FROM kmv_est e JOIN kmv_ex x ON x.grp = e.grp""", LINK_CTES, f"""
kmv_he AS MATERIALIZED (
  SELECT regexp_extract(url, '^https?://([^/]*)', 1) AS grp,
         canonical_id
  FROM linked WHERE canonical_id IS NOT NULL),
kmv_h AS MATERIALIZED (
  SELECT DISTINCT grp,
         {_hex60_sql("'kmv:' || CAST(canonical_id AS VARCHAR)")} AS hval
  FROM kmv_he),
kmv_rk AS (
  SELECT grp, hval,
         ROW_NUMBER() OVER (PARTITION BY grp ORDER BY hval) AS rk
  FROM kmv_h),
kmv_est AS (
  SELECT grp, CAST(COUNT(*) AS INT) AS n_seen,
         CAST(MAX(hval) AS BIGINT) AS kth_hval
  FROM kmv_rk WHERE rk <= {_KMV_K} GROUP BY grp),
kmv_ex AS (
  SELECT grp, CAST(COUNT(DISTINCT canonical_id) AS BIGINT)
             AS exact_distinct
  FROM kmv_he GROUP BY grp)""")


# ---------------------------------------------------------------------------
# Continuation batch 60: theta-sketch set operations between the top
# hosts' entity sets (functions/sketches.theta_set_ops).  The
# estimator floor(n * 2^60 / theta) is replayed with the same
# overflow-proof split division `n * (D // t) + (n * (D % t)) // t`
# (2^60 % t < 2^59 and n <= 2k = 16, so both engines stay in BIGINT).

_TH_D = 1 << 60
_TH_TOP = 12


def _th_est(n: str, t: str) -> str:
    return (f"CAST({n} * ({_TH_D} // {t})"
            f" + ({n} * ({_TH_D} % {t})) // {t} AS BIGINT)")


ORACLE["theta_host_sets"] = _q(f"""
SELECT p.grp_a AS host_a, p.grp_b AS host_b, p.theta,
       CAST(COALESCE(i.n_i, 0) AS BIGINT) AS n_inter_ret,
       CAST(COALESCE(u.n_u, 0) AS BIGINT) AS n_union_ret,
       {_th_est("COALESCE(i.n_i, 0)", "p.theta")} AS est_inter,
       {_th_est("COALESCE(u.n_u, 0)", "p.theta")} AS est_union,
       CAST(CASE WHEN {_th_est("COALESCE(u.n_u, 0)", "p.theta")} > 0
            THEN ({_th_est("COALESCE(i.n_i, 0)", "p.theta")} * 1000000)
                 // {_th_est("COALESCE(u.n_u, 0)", "p.theta")}
            ELSE 0 END AS BIGINT) AS est_jaccard_micro6,
       CAST(COALESCE(x.exact_inter, 0) AS BIGINT) AS exact_inter,
       CAST(sa.n_ex + sb.n_ex - COALESCE(x.exact_inter, 0) AS BIGINT)
           AS exact_union
FROM th_pairs p
LEFT JOIN th_u u ON u.grp_a = p.grp_a AND u.grp_b = p.grp_b
LEFT JOIN th_i i ON i.grp_a = p.grp_a AND i.grp_b = p.grp_b
LEFT JOIN th_xi x ON x.grp_a = p.grp_a AND x.grp_b = p.grp_b
JOIN th_sz sa ON sa.grp = p.grp_a
JOIN th_sz sb ON sb.grp = p.grp_b""", LINK_CTES, f"""
th_h AS MATERIALIZED (
  SELECT DISTINCT regexp_extract(url, '^https?://([^/]*)', 1) AS grp,
         {_hex60_sql("'kmv:' || CAST(canonical_id AS VARCHAR)")} AS hval
  FROM linked WHERE canonical_id IS NOT NULL),
th_rk AS (
  SELECT grp, hval,
         ROW_NUMBER() OVER (PARTITION BY grp ORDER BY hval) AS rk
  FROM th_h),
th_sk AS MATERIALIZED (
  SELECT grp, hval FROM th_rk WHERE rk <= {_KMV_K}),
th_st AS (
  SELECT grp, COUNT(*) AS n_seen, MAX(hval) AS kth
  FROM th_sk GROUP BY grp),
th_top AS MATERIALIZED (
  SELECT grp, CASE WHEN n_seen < {_KMV_K} THEN {_TH_D}
              ELSE kth END AS theta
  FROM th_st
  ORDER BY (CASE WHEN n_seen < {_KMV_K} THEN n_seen
            ELSE {_KMV_NUM} // kth END) DESC, grp
  LIMIT {_TH_TOP}),
th_pairs AS MATERIALIZED (
  SELECT a.grp AS grp_a, b.grp AS grp_b,
         LEAST(a.theta, b.theta) AS theta
  FROM th_top a JOIN th_top b ON a.grp < b.grp),
th_ea AS MATERIALIZED (
  SELECT p.grp_a, p.grp_b, s.hval
  FROM th_pairs p JOIN th_sk s
    ON s.grp = p.grp_a AND s.hval < p.theta),
th_eb AS MATERIALIZED (
  SELECT p.grp_a, p.grp_b, s.hval
  FROM th_pairs p JOIN th_sk s
    ON s.grp = p.grp_b AND s.hval < p.theta),
th_u AS (
  SELECT grp_a, grp_b, COUNT(*) AS n_u FROM (
    SELECT DISTINCT grp_a, grp_b, hval FROM (
      SELECT * FROM th_ea UNION ALL SELECT * FROM th_eb))
  GROUP BY 1, 2),
th_i AS (
  SELECT a.grp_a, a.grp_b, COUNT(*) AS n_i
  FROM th_ea a JOIN th_eb b
    ON a.grp_a = b.grp_a AND a.grp_b = b.grp_b AND a.hval = b.hval
  GROUP BY 1, 2),
th_he AS MATERIALIZED (
  SELECT DISTINCT h.grp, h.canonical_id FROM (
    SELECT regexp_extract(url, '^https?://([^/]*)', 1) AS grp,
           canonical_id
    FROM linked WHERE canonical_id IS NOT NULL) h
  JOIN th_top t ON t.grp = h.grp),
th_sz AS (
  SELECT grp, COUNT(*) AS n_ex FROM th_he GROUP BY grp),
th_xi AS (
  SELECT x.grp AS grp_a, y.grp AS grp_b, COUNT(*) AS exact_inter
  FROM th_he x JOIN th_he y
    ON x.canonical_id = y.canonical_id AND x.grp < y.grp
  GROUP BY 1, 2)""")


# ---------------------------------------------------------------------------
# Continuation batch 61: rendezvous-hash resharding plan over the url
# universe (functions/sharding.shard_rebalance, 8 -> 9 shards).  The
# per-(shard, key) 60-bit score is the same 15-nibble Horner device;
# argmax-by-(score, shard) is a ROW_NUMBER over the unpivoted score
# rows — exactly the GREATEST-of-structs pick on the Spark side.

def _hrw_sql(n_old: int = 8, n_new: int = 9) -> str:
    def scores(n: int, name: str) -> str:
        rows = "\n  UNION ALL\n".join(
            f"  SELECT k, {s} AS s, "
            + _hex60_sql(f"'hrw:{s}:' || k")
            + " AS h FROM hrw_keys"
            for s in range(n))
        return f"""
{name}_sc AS MATERIALIZED (
{rows}),
{name}_pick AS (
  SELECT k, s FROM (
    SELECT k, s,
           ROW_NUMBER() OVER (PARTITION BY k
                              ORDER BY h DESC, s DESC) AS rk
    FROM {name}_sc) WHERE rk = 1)"""

    return f"""
, hrw_keys AS MATERIALIZED (
  SELECT DISTINCT url AS k FROM pages WHERE url IS NOT NULL),
{scores(n_old, "hrw_o").lstrip()},
{scores(n_new, "hrw_n").lstrip()}"""


ORACLE["shard_rebalance"] = _q("""
SELECT CAST(o.s AS INT) AS shard_old, CAST(n.s AS INT) AS shard_new,
       CAST(COUNT(*) AS BIGINT) AS n_keys,
       CAST(CASE WHEN o.s <> n.s THEN 1 ELSE 0 END AS INT) AS moved
FROM hrw_o_pick o JOIN hrw_n_pick n ON o.k = n.k
GROUP BY o.s, n.s""", _hrw_sql().lstrip().lstrip(","))


# ---------------------------------------------------------------------------
# Continuation batch 63: Kleinberg two-state burst detection
# (operators/events.kleinberg_bursts).  The four log-rates and the
# transition charge are the single-ln device; the Viterbi decode is
# replayed as a forward recursive CTE (costs + backpointers) and a
# backward recursive CTE (state walk), all BIGINT.

ORACLE["event_bursts"] = _q("""
SELECT i.etype AS event_type, i.day_idx,
       CAST(i.r AS BIGINT) AS n_events, CAST(i.d AS BIGINT) AS n_total,
       CAST(b.state AS INT) AS in_burst,
       CAST(l.total AS BIGINT) AS total_cost_micro6
FROM kb_in i
JOIN kb_b b ON b.etype = i.etype AND b.t = i.t
JOIN kb_last l ON l.etype = i.etype""", """
kb_day AS MATERIALIZED (
  SELECT event_type AS etype,
         CAST(epoch_us(ts) // 86400000000 AS INT) AS day_idx
  FROM events),
kb_spine AS MATERIALIZED (
  SELECT day_idx, CAST(COUNT(*) AS BIGINT) AS d
  FROM kb_day GROUP BY 1),
kb_types AS (SELECT DISTINCT etype FROM kb_day),
kb_sparse AS (
  SELECT etype, day_idx, CAST(COUNT(*) AS BIGINT) AS r
  FROM kb_day GROUP BY 1, 2),
kb_grid AS MATERIALIZED (
  SELECT t.etype, s.day_idx, s.d, COALESCE(p.r, 0) AS r,
         ROW_NUMBER() OVER (PARTITION BY t.etype
                            ORDER BY s.day_idx) - 1 AS t
  FROM kb_types t CROSS JOIN kb_spine s
  LEFT JOIN kb_sparse p
    ON p.etype = t.etype AND p.day_idx = s.day_idx),
kb_tot AS MATERIALIZED (
  SELECT etype, CAST(SUM(r) AS BIGINT) AS bigr,
         CAST(COUNT(*) AS BIGINT) AS t_len
  FROM kb_grid GROUP BY 1),
kb_grand AS (SELECT CAST(SUM(d) AS BIGINT) AS bigd FROM kb_spine),
kb_sc AS MATERIALIZED (
  SELECT etype,
         CAST(FLOOR(ln(CAST(bigr + 1 AS DOUBLE)
                       / CAST(bigd + 2 AS DOUBLE)) * 1000000)
              AS BIGINT) AS lnp0,
         CAST(FLOOR(ln(CAST(bigd + 2 - (bigr + 1) AS DOUBLE)
                       / CAST(bigd + 2 AS DOUBLE)) * 1000000)
              AS BIGINT) AS ln1p0,
         CAST(FLOOR(ln(CAST(CASE WHEN 2 * (bigr + 1) < bigd + 2
                            THEN 2 * (bigr + 1)
                            ELSE bigr + 1 + bigd + 2 END AS DOUBLE)
                       / CAST(CASE WHEN 2 * (bigr + 1) < bigd + 2
                              THEN bigd + 2
                              ELSE 2 * (bigd + 2) END AS DOUBLE))
                    * 1000000) AS BIGINT) AS lnp1,
         CAST(FLOOR(ln(CAST((CASE WHEN 2 * (bigr + 1) < bigd + 2
                             THEN bigd + 2
                             ELSE 2 * (bigd + 2) END)
                            - (CASE WHEN 2 * (bigr + 1) < bigd + 2
                               THEN 2 * (bigr + 1)
                               ELSE bigr + 1 + bigd + 2 END) AS DOUBLE)
                       / CAST(CASE WHEN 2 * (bigr + 1) < bigd + 2
                              THEN bigd + 2
                              ELSE 2 * (bigd + 2) END AS DOUBLE))
                    * 1000000) AS BIGINT) AS ln1p1,
         CAST(FLOOR(ln(CAST(t_len AS DOUBLE)) * 1000000)
              AS BIGINT) AS trans
  FROM kb_tot CROSS JOIN kb_grand),
kb_in AS MATERIALIZED (
  SELECT g.etype, g.day_idx, g.t, g.r, g.d,
         s.lnp0, s.ln1p0, s.lnp1, s.ln1p1, s.trans
  FROM kb_grid g JOIN kb_sc s ON s.etype = g.etype),
kb_f AS (
  SELECT etype, t,
         CAST(-(r * lnp0 + (d - r) * ln1p0) AS BIGINT) AS c0,
         CAST(-(r * lnp1 + (d - r) * ln1p1) + trans AS BIGINT) AS c1,
         -1 AS b0, -1 AS b1
  FROM kb_in WHERE t = 0
  UNION ALL
  SELECT i.etype, i.t,
         CAST(-(i.r * i.lnp0 + (i.d - i.r) * i.ln1p0)
              + LEAST(f.c0, f.c1) AS BIGINT) AS c0,
         CAST(-(i.r * i.lnp1 + (i.d - i.r) * i.ln1p1)
              + LEAST(f.c0 + i.trans, f.c1) AS BIGINT) AS c1,
         CASE WHEN f.c0 <= f.c1 THEN 0 ELSE 1 END AS b0,
         CASE WHEN f.c0 + i.trans <= f.c1 THEN 0 ELSE 1 END AS b1
  FROM kb_f f JOIN kb_in i ON i.etype = f.etype AND i.t = f.t + 1),
kb_fm AS MATERIALIZED (SELECT * FROM kb_f),
kb_last AS MATERIALIZED (
  SELECT f.etype, f.t,
         CASE WHEN f.c0 <= f.c1 THEN 0 ELSE 1 END AS state,
         LEAST(f.c0, f.c1) AS total
  FROM kb_fm f JOIN kb_tot tt
    ON tt.etype = f.etype AND f.t = tt.t_len - 1),
kb_b AS (
  SELECT etype, t, state FROM kb_last
  UNION ALL
  SELECT b.etype, f.t - 1 AS t,
         CASE WHEN b.state = 0 THEN f.b0 ELSE f.b1 END AS state
  FROM kb_b b JOIN kb_fm f ON f.etype = b.etype AND f.t = b.t
  WHERE f.t > 0)""")


# ---------------------------------------------------------------------------
# Continuation batch 64: Allen interval-algebra profile over the SCD2
# validity intervals (operators/triples.allen_relation_profile) —
# same-claim pairing as interval_conflicts, the 13-way CASE replayed
# verbatim (the WHEN order IS the trichotomy proof; both engines
# evaluate it top-down).

ORACLE["allen_relations"] = f"""
WITH iv AS MATERIALIZED ({ORACLE["triple_snapshots"]})
SELECT a.pred,
       CASE
         WHEN COALESCE(a.valid_to, {_IV_INF}) < b.valid_from
           THEN 'before'
         WHEN COALESCE(a.valid_to, {_IV_INF}) = b.valid_from
           THEN 'meets'
         WHEN COALESCE(b.valid_to, {_IV_INF}) < a.valid_from
           THEN 'after'
         WHEN COALESCE(b.valid_to, {_IV_INF}) = a.valid_from
           THEN 'met_by'
         WHEN a.valid_from = b.valid_from
              AND COALESCE(a.valid_to, {_IV_INF})
                = COALESCE(b.valid_to, {_IV_INF}) THEN 'equals'
         WHEN a.valid_from = b.valid_from
              AND COALESCE(a.valid_to, {_IV_INF})
                < COALESCE(b.valid_to, {_IV_INF}) THEN 'starts'
         WHEN a.valid_from = b.valid_from THEN 'started_by'
         WHEN COALESCE(a.valid_to, {_IV_INF})
                = COALESCE(b.valid_to, {_IV_INF})
              AND a.valid_from > b.valid_from THEN 'finishes'
         WHEN COALESCE(a.valid_to, {_IV_INF})
                = COALESCE(b.valid_to, {_IV_INF}) THEN 'finished_by'
         WHEN a.valid_from > b.valid_from
              AND COALESCE(a.valid_to, {_IV_INF})
                < COALESCE(b.valid_to, {_IV_INF}) THEN 'during'
         WHEN a.valid_from < b.valid_from
              AND COALESCE(a.valid_to, {_IV_INF})
                > COALESCE(b.valid_to, {_IV_INF}) THEN 'contains'
         WHEN a.valid_from < b.valid_from THEN 'overlaps'
         ELSE 'overlapped_by'
       END AS relation,
       CAST(COUNT(*) AS BIGINT) AS n_pairs
FROM iv a JOIN iv b
  ON a.url = b.url AND a.subj = b.subj AND a.pred = b.pred
 AND a.obj < b.obj
GROUP BY 1, 2"""


# ---------------------------------------------------------------------------
# Continuation batch 65: V-optimal histogram DP over the token-length
# domain (functions/sketches.v_optimal_histogram, B = 6).  Per-bucket
# SSE is floored once via SSE*C = A*C - B^2 (all BIGINT); the DP
# levels are chained CTEs with the argmin tie broken to the smallest
# split (ORDER BY cost, j), the same scan order as the Python DP.

_VOPT_B = 6


def _vopt_sql() -> str:
    parts = ["""
vo_vals AS MATERIALIZED (
  SELECT CAST(n_tokens AS BIGINT) AS val,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM qual GROUP BY 1),
vo_idx AS (
  SELECT val, cnt, ROW_NUMBER() OVER (ORDER BY val) AS i FROM vo_vals),
vo_pre AS MATERIALIZED (
  SELECT i, val,
         SUM(cnt) OVER (ORDER BY i) AS pc,
         SUM(cnt * val) OVER (ORDER BY i) AS ps,
         SUM(cnt * val * val) OVER (ORDER BY i) AS ps2
  FROM vo_idx),
vo_sse AS MATERIALIZED (
  SELECT lo.i AS j, hi.i AS i, lo.val AS lo_val, hi.val AS hi_val,
         hi.pc - COALESCE(l2.pc, 0) AS c,
         ((hi.ps2 - COALESCE(l2.ps2, 0)) * (hi.pc - COALESCE(l2.pc, 0))
          - (hi.ps - COALESCE(l2.ps, 0)) * (hi.ps - COALESCE(l2.ps, 0)))
         * 1000000 // (hi.pc - COALESCE(l2.pc, 0)) AS sse
  FROM vo_pre hi JOIN vo_pre lo ON lo.i <= hi.i
  LEFT JOIN vo_pre l2 ON l2.i = lo.i - 1),
vo_e1 AS MATERIALIZED (
  SELECT i, sse AS cost, j FROM vo_sse WHERE j = 1)"""]
    for b in range(2, _VOPT_B + 1):
        parts.append(f""",
vo_e{b} AS MATERIALIZED (
  SELECT i, cost, j FROM (
    SELECT s.i, p.cost + s.sse AS cost, s.j,
           ROW_NUMBER() OVER (PARTITION BY s.i
                              ORDER BY p.cost + s.sse, s.j) AS rk
    FROM vo_sse s JOIN vo_e{b - 1} p ON p.i = s.j - 1)
  WHERE rk = 1)""")
    parts.append(f""",
vo_b{_VOPT_B} AS (
  SELECT e.i, e.j FROM vo_e{_VOPT_B} e
  WHERE e.i = (SELECT MAX(i) FROM vo_pre))""")
    for b in range(_VOPT_B - 1, 0, -1):
        parts.append(f""",
vo_b{b} AS (
  SELECT e.i, e.j FROM vo_e{b} e
  JOIN vo_b{b + 1} nxt ON e.i = nxt.j - 1)""")
    return "".join(parts)


_VOPT_UNION = "\n  UNION ALL\n".join(
    f"  SELECT {b} AS bucket, j, i FROM vo_b{b}"
    for b in range(1, _VOPT_B + 1))

ORACLE["vopt_histogram"] = _assemble(
    GAZ, toks_ctes(), QUALITY_CTES, _vopt_sql().strip().lstrip(","),
    select=f"""
SELECT CAST(b.bucket AS INT) AS bucket, s.lo_val, s.hi_val,
       CAST(s.c AS BIGINT) AS n_items, CAST(s.sse AS BIGINT) AS sse_micro6
FROM (
{_VOPT_UNION}) b
JOIN vo_sse s ON s.j = b.j AND s.i = b.i""")


# ---------------------------------------------------------------------------
# Continuation batch 66: consecutive session trigram patterns
# (operators/events.session_trigrams) — sessionize's island CTEs plus
# two leads and one grouped count; support is exact integer division
# by the 1-row session total.

ORACLE["session_trigrams"] = """
WITH s0 AS (
  SELECT user_id, event_id, ts, event_type,
         CASE WHEN lag_ts IS NULL
              OR (epoch_us(ts) // 1000000)
                 - (epoch_us(lag_ts) // 1000000) > 1800
              THEN 1 ELSE 0 END AS new_sess
  FROM (SELECT user_id, event_id, ts, event_type,
               LAG(ts) OVER (PARTITION BY user_id
                             ORDER BY ts, event_id) AS lag_ts
        FROM events)
),
s1 AS MATERIALIZED (
  SELECT *, CAST(SUM(new_sess) OVER (
      PARTITION BY user_id ORDER BY ts, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1 AS INT)
      AS session_id
  FROM s0
),
tri AS (
  SELECT user_id, session_id, event_type AS t1,
         LEAD(event_type, 1) OVER w AS t2,
         LEAD(event_type, 2) OVER w AS t3
  FROM s1
  WINDOW w AS (PARTITION BY user_id, session_id
               ORDER BY ts, event_id)
),
cnt AS (
  SELECT t1, t2, t3, CAST(COUNT(*) AS BIGINT) AS n_occurrences,
         CAST(COUNT(DISTINCT user_id || ':' || session_id) AS BIGINT)
             AS n_sessions
  FROM tri WHERE t3 IS NOT NULL GROUP BY 1, 2, 3
),
tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n FROM (
    SELECT DISTINCT user_id, session_id FROM s1)
)
SELECT c.t1, c.t2, c.t3, c.n_occurrences, c.n_sessions,
       CAST(c.n_sessions * 1000000 // t.n AS BIGINT) AS support_micro6
FROM cnt c CROSS JOIN tot t"""


# ---------------------------------------------------------------------------
# Continuation batch 68: weighted interval scheduling / timeline
# repair (operators/triples.timeline_repair).  Forward DP as a
# recursive CTE carrying the per-claim f-list (DuckDB list_append),
# backtrack as a descending cursor that jumps to p(i) on take —
# take iff STRICTLY better, the same tie-break as the Python DP.

ORACLE["timeline_repair"] = f"""
WITH RECURSIVE iv AS MATERIALIZED ({ORACLE["triple_snapshots"]}),
tl_iv AS (
  SELECT url, subj, pred, obj,
         CAST(valid_from AS BIGINT) AS s,
         COALESCE(CAST(valid_to AS BIGINT), {_IV_INF}) AS e,
         CAST(n_snaps AS BIGINT) AS w,
         ROW_NUMBER() OVER (PARTITION BY url, subj, pred
                            ORDER BY COALESCE(valid_to, {_IV_INF}),
                                     valid_from, obj) AS i
  FROM iv),
tl_ivp AS MATERIALIZED (
  SELECT a.*, COALESCE((
    SELECT MAX(b.i) FROM tl_iv b
    WHERE b.url = a.url AND b.subj = a.subj AND b.pred = a.pred
      AND b.i < a.i AND b.e <= a.s), 0) AS p
  FROM tl_iv a),
tl_keys AS MATERIALIZED (
  SELECT url, subj, pred, CAST(MAX(i) AS BIGINT) AS n
  FROM tl_iv GROUP BY 1, 2, 3),
tl_f AS (
  SELECT k.url, k.subj, k.pred, CAST(0 AS BIGINT) AS i,
         [CAST(0 AS BIGINT)] AS fl
  FROM tl_keys k
  UNION ALL
  SELECT f.url, f.subj, f.pred, v.i,
         list_append(f.fl,
           CASE WHEN v.w + f.fl[CAST(v.p + 1 AS INT)]
                     > f.fl[CAST(f.i + 1 AS INT)]
                THEN v.w + f.fl[CAST(v.p + 1 AS INT)]
                ELSE f.fl[CAST(f.i + 1 AS INT)] END)
  FROM tl_f f
  JOIN tl_ivp v ON v.url = f.url AND v.subj = f.subj
               AND v.pred = f.pred AND v.i = f.i + 1),
tl_fm AS MATERIALIZED (
  SELECT f.url, f.subj, f.pred, f.fl
  FROM tl_f f JOIN tl_keys k
    ON k.url = f.url AND k.subj = f.subj AND k.pred = f.pred
   AND f.i = k.n),
tl_b AS (
  SELECT url, subj, pred, n AS i FROM tl_keys
  UNION ALL
  SELECT b.url, b.subj, b.pred,
         CASE WHEN v.w + m.fl[CAST(v.p + 1 AS INT)]
                   > m.fl[CAST(v.i AS INT)]
              THEN v.p ELSE b.i - 1 END AS i
  FROM tl_b b
  JOIN tl_ivp v ON v.url = b.url AND v.subj = b.subj
               AND v.pred = b.pred AND v.i = b.i
  JOIN tl_fm m ON m.url = b.url AND m.subj = b.subj
              AND m.pred = b.pred
  WHERE b.i > 0)
SELECT v.url, v.subj, v.pred, v.obj,
       CAST(v.s AS BIGINT) AS valid_from,
       CAST(CASE WHEN v.e = {_IV_INF} THEN NULL ELSE v.e END
            AS BIGINT) AS valid_to,
       CAST(v.w AS BIGINT) AS weight,
       CAST(m.fl[CAST(k.n + 1 AS INT)] AS BIGINT) AS claim_weight
FROM tl_b b
JOIN tl_ivp v ON v.url = b.url AND v.subj = b.subj
             AND v.pred = b.pred AND v.i = b.i
JOIN tl_fm m ON m.url = b.url AND m.subj = b.subj
            AND m.pred = b.pred
JOIN tl_keys k ON k.url = b.url AND k.subj = b.subj
              AND k.pred = b.pred
WHERE b.i > 0
  AND v.w + m.fl[CAST(v.p + 1 AS INT)] > m.fl[CAST(v.i AS INT)]"""


# ---------------------------------------------------------------------------
# Continuation batch 69: Dunning-LLR distinctive shingles per source
# (functions/textstats.distinctive_terms over operators/dedup.shingles)
# — four single-ln cell terms, each floored to micro6 BEFORE the
# obs multiply, summed as integers.

_HT_CELL = ("CASE WHEN {o} > 0 THEN {o} * CAST(FLOOR(ln("
            "CAST({o} * n AS DOUBLE) / CAST({e} AS DOUBLE)) * 1000000)"
            " AS BIGINT) ELSE 0 END")

_HT_LLR = " + ".join([
    _HT_CELL.format(o="a", e="rg * ct"),
    _HT_CELL.format(o="(rg - a)", e="rg * (n - ct)"),
    _HT_CELL.format(o="(ct - a)", e="(n - rg) * ct"),
    _HT_CELL.format(o="(n - rg - ct + a)", e="(n - rg) * (n - ct)"),
])

ORACLE["host_terms"] = _assemble(
    GAZ, toks_ctes(),
    """sh AS (
  SELECT DISTINCT doc_id, token || ' ' || t1 || ' ' || t2 AS shingle
  FROM (SELECT doc_id, token,
          LEAD(token, 1) OVER (PARTITION BY doc_id ORDER BY tok_idx) AS t1,
          LEAD(token, 2) OVER (PARTITION BY doc_id ORDER BY tok_idx) AS t2
        FROM toks)
  WHERE t1 IS NOT NULL AND t2 IS NOT NULL
),
ht_sh AS MATERIALIZED (
  SELECT s.doc_id, d.source AS grp, s.shingle AS term
  FROM sh s JOIN documents d ON d.doc_id = s.doc_id),
ht_a AS (SELECT grp, term, CAST(COUNT(*) AS BIGINT) AS a
         FROM ht_sh GROUP BY 1, 2),
ht_rg AS (SELECT grp, CAST(COUNT(*) AS BIGINT) AS rg
          FROM ht_sh GROUP BY 1),
ht_ct AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS ct
          FROM ht_sh GROUP BY 1),
ht_n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM ht_sh),
ht_j AS MATERIALIZED (
  SELECT a.grp, a.term, a.a, r.rg, c.ct, t.n
  FROM ht_a a JOIN ht_rg r ON r.grp = a.grp
  JOIN ht_ct c ON c.term = a.term CROSS JOIN ht_n t),
ht_llr AS (
  SELECT grp, term, a, ct,
         2 * (""" + _HT_LLR + """) AS llr
  FROM ht_j WHERE a * n > rg * ct),
ht_rk AS (
  SELECT grp, term, a, ct, llr,
         ROW_NUMBER() OVER (PARTITION BY grp
                            ORDER BY llr DESC, term) AS rk
  FROM ht_llr)""",
    select="""
SELECT grp AS source, CAST(rk AS INT) AS rank, term AS shingle,
       a AS n_grp, ct AS n_corpus, CAST(llr AS BIGINT) AS llr_micro6
FROM ht_rk WHERE rk <= 5""")


# ---------------------------------------------------------------------------
# Continuation batch 70: NDCG@10 of the BM25 ranking
# (functions/textstats.retrieval_ndcg) — graded relevance = raw tf,
# position discounts are DATA-INDEPENDENT micro6 literals baked from
# the same floor(ln2/ln(i+1)*1e6) expression as the Spark constant
# tuple, so the only arithmetic here is integer sums + one exact DIV.

from ..functions.textstats import NDCG_DISCOUNTS_MICRO6  # noqa: E402

_NDCG_DISC_ROWS = ", ".join(
    f"({i + 1}, {d})" for i, d in enumerate(NDCG_DISCOUNTS_MICRO6))

ORACLE["retrieval_ndcg"] = _q("""
SELECT d.term, n.n_matched, d.dcg_micro6, i.idcg_micro6,
       CAST(d.dcg_micro6 * 1000000 // i.idcg_micro6 AS BIGINT)
           AS ndcg_micro6
FROM nd_dcg d JOIN nd_ideal i ON i.term = d.term
JOIN nd_nm n ON n.term = d.term""", BM25_CTES + """,
nd_disc AS (SELECT * FROM (VALUES """ + _NDCG_DISC_ROWS + """)
            AS t(rank, disc)),
nd_ranked AS (
  SELECT term, doc_id, tf,
         ROW_NUMBER() OVER (PARTITION BY term
             ORDER BY score_micro6 DESC, doc_id) AS rank
  FROM bm_scored),
nd_dcg AS (
  SELECT r.term, CAST(SUM(r.tf * d.disc) AS BIGINT) AS dcg_micro6
  FROM nd_ranked r JOIN nd_disc d ON d.rank = r.rank
  WHERE r.rank <= 10 GROUP BY 1),
nd_irank AS (
  SELECT term, doc_id, tf,
         ROW_NUMBER() OVER (PARTITION BY term
             ORDER BY tf DESC, doc_id) AS rank
  FROM bm_tf),
nd_ideal AS (
  SELECT r.term, CAST(SUM(r.tf * d.disc) AS BIGINT) AS idcg_micro6
  FROM nd_irank r JOIN nd_disc d ON d.rank = r.rank
  WHERE r.rank <= 10 GROUP BY 1),
nd_nm AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS n_matched
  FROM bm_tf GROUP BY 1)""")


# ---------------------------------------------------------------------------
# Continuation batch 71: term-proximity read path (functions/textstats.
# term_proximity) — per-doc minimal window span containing both top-2-df
# terms, running-last-position device (nearest preceding partner via a
# CASE-filtered MAX over the cumulative frame), integer positions only.

ORACLE["term_proximity"] = """
WITH tp_ts AS (
  SELECT doc_id, list_filter(string_split_regex(lower(text),
                                                '[\\n \\t]'),
                             t -> t <> '') AS ts
  FROM documents),
tp_toks AS MATERIALIZED (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         CAST(i AS INT) - 1 AS pos, ts[CAST(i AS INT)] AS term
  FROM tp_ts, unnest(generate_series(1, len(ts))) AS t(i)),
tp_sel AS MATERIALIZED (
  SELECT term, ROW_NUMBER() OVER (ORDER BY df DESC, term ASC) AS rk
  FROM (SELECT term, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
        FROM tp_toks GROUP BY 1)
  ORDER BY df DESC, term ASC LIMIT 2),
tp_hit AS MATERIALIZED (
  SELECT h.doc_id, h.pos, s.rk FROM tp_toks h
  JOIN tp_sel s USING (term)),
tp_span AS (
  SELECT doc_id, rk, pos,
         MAX(CASE WHEN rk = 1 THEN pos END) OVER w AS last_a,
         MAX(CASE WHEN rk = 2 THEN pos END) OVER w AS last_b
  FROM tp_hit
  WINDOW w AS (PARTITION BY doc_id ORDER BY pos
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
SELECT doc_id,
       CAST(SUM(CASE WHEN rk = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
       CAST(SUM(CASE WHEN rk = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
       CAST(MIN(CASE WHEN rk = 2 THEN pos - last_a + 1
                     ELSE pos - last_b + 1 END) AS BIGINT) AS min_span
FROM tp_span GROUP BY 1
HAVING MIN(CASE WHEN rk = 2 THEN pos - last_a + 1
                ELSE pos - last_b + 1 END) IS NOT NULL"""


# ---------------------------------------------------------------------------
# Continuation batch 72: query-biased snippet extraction (functions/
# textstats.snippet_windows) — best 8-token window per doc by gazetteer
# hit count (tie -> earliest), one linear frame sum, original-case
# snippet via list slice (both engines clamp frame + slice identically).

ORACLE["snippet_windows"] = _assemble(GAZ, """
sw_ts AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         list_filter(string_split_regex(text, '[\\n \\t]'),
                     t -> t <> '') AS ts
  FROM documents),
sw_toks AS MATERIALIZED (
  SELECT doc_id, CAST(i AS INT) - 1 AS pos,
         CASE WHEN lower(ts[CAST(i AS INT)])
                   IN (SELECT alias FROM gaz) THEN 1 ELSE 0 END AS m
  FROM sw_ts, unnest(generate_series(1, len(ts))) AS t(i)),
sw_sum AS (
  SELECT doc_id, pos,
         CAST(SUM(m) OVER (PARTITION BY doc_id ORDER BY pos
              ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING) AS BIGINT)
             AS n_hits
  FROM sw_toks),
sw_best AS (
  SELECT doc_id, pos, n_hits,
         ROW_NUMBER() OVER (PARTITION BY doc_id
             ORDER BY n_hits DESC, pos ASC) AS rn
  FROM sw_sum)""", select="""
SELECT b.doc_id, CAST(b.pos AS BIGINT) AS win_start, b.n_hits,
       array_to_string(s.ts[b.pos + 1 : b.pos + 8], ' ') AS snippet
FROM sw_best b JOIN sw_ts s ON s.doc_id = b.doc_id
WHERE b.rn = 1 AND b.n_hits > 0""")


# ---------------------------------------------------------------------------
# Continuation batch 73: entity-card fact ranking (operators/triples.
# entity_cards) — top-3 facts per subject by support x BM25-style
# integer idf over the (pred, obj) fact vocabulary; the only float op
# is the single ln of an exact rational (the bm25_entities device).

ORACLE["entity_cards"] = _q("""
SELECT subj, CAST(rank AS INT) AS rank, pred, obj, support, df,
       idf_micro6, score_micro6
FROM (
  SELECT s.*, ROW_NUMBER() OVER (PARTITION BY subj
             ORDER BY score_micro6 DESC, pred, obj) AS rank
  FROM ec_scored s)
WHERE rank <= 3""", """
ec_facts AS MATERIALIZED (
  SELECT subj, pred, obj,
         CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS support
  FROM triples GROUP BY 1, 2, 3),
ec_df AS (
  SELECT pred, obj, CAST(COUNT(*) AS BIGINT) AS df
  FROM ec_facts GROUP BY 1, 2),
ec_n AS (SELECT CAST(COUNT(DISTINCT subj) AS BIGINT) AS n
         FROM ec_facts),
ec_idf AS (
  SELECT pred, obj, df,
         CAST(floor(ln((2 * (SELECT n FROM ec_n) + 2)
                        / (2.0 * df + 1)) * 1000000) AS BIGINT)
             AS idf_micro6
  FROM ec_df),
ec_scored AS (
  SELECT f.subj, f.pred, f.obj, f.support, d.df, d.idf_micro6,
         CAST(f.support * d.idf_micro6 AS BIGINT) AS score_micro6
  FROM ec_facts f JOIN ec_idf d USING (pred, obj))""")


# ---------------------------------------------------------------------------
# Continuation batch 74: Jones-Plassmann greedy graph coloring
# (operators/graph_algos.jp_coloring) — static md5-hex6 priorities,
# per-round local-min winners take the mex of their already-colored
# neighborhood; rounds unrolled as chained CTEs exactly like the
# MIS/kcore/LPA oracles.  Colors assigned in round r are <= r-1, so
# the per-round mex candidate range generate_series(0, r) is complete.


def _jp_sql(n_rounds: int = 8) -> str:
    prio = _qm_hex6("'jp:' || node")
    blocks = [f"""jppr AS MATERIALIZED (
  SELECT node, CAST({prio} AS BIGINT) AS prio FROM cc_nodes),
jpact0 AS MATERIALIZED (SELECT node FROM cc_nodes),
jpcol0 AS MATERIALIZED (
  SELECT node, CAST(0 AS BIGINT) AS color FROM cc_nodes WHERE 1 = 0)"""]
    for r in range(1, n_rounds + 1):
        blocks.append(f"""jpwin{r} AS MATERIALIZED (
  SELECT a.node, p.prio FROM jpact{r - 1} a JOIN jppr p USING (node)
  WHERE NOT EXISTS (
    SELECT 1 FROM com_sym e
    JOIN jpact{r - 1} b ON b.node = e.dst
    JOIN jppr q ON q.node = e.dst
    WHERE e.src = a.node
      AND (q.prio < p.prio
           OR (q.prio = p.prio AND q.node < p.node)))),
jpnew{r} AS MATERIALIZED (
  SELECT w.node,
         (SELECT MIN(t.k) FROM unnest(generate_series(0, {r})) AS t(k)
          WHERE t.k NOT IN (
            SELECT c.color FROM com_sym e
            JOIN jpcol{r - 1} c ON c.node = e.dst
            WHERE e.src = w.node)) AS color
  FROM jpwin{r} w),
jpcol{r} AS MATERIALIZED (
  SELECT node, color FROM jpcol{r - 1}
  UNION ALL
  SELECT node, CAST(color AS BIGINT) AS color FROM jpnew{r}),
jpact{r} AS MATERIALIZED (
  SELECT node FROM jpact{r - 1}
  WHERE node NOT IN (SELECT node FROM jpwin{r}))""")
    return ",\n".join(blocks)


def _jp_select(n_rounds: int = 8) -> str:
    parts = [f"SELECT node, CAST(color AS BIGINT) AS color, "
             f"CAST({r} AS BIGINT) AS decided_round FROM jpnew{r}"
             for r in range(1, n_rounds + 1)]
    parts.append(f"SELECT node, CAST(-1 AS BIGINT) AS color, "
                 f"CAST(0 AS BIGINT) AS decided_round "
                 f"FROM jpact{n_rounds}")
    return " UNION ALL ".join(parts)


ORACLE["graph_coloring"] = _q(_jp_select(8), LINK_CTES,
                              COMENTION_CTES.strip(), _jp_sql(8))


# ---------------------------------------------------------------------------
# Continuation batch 75: LSH candidate-quality evaluation (operators/
# dedup.lsh_dedup_eval) — ground truth here is the DIRECT shingle
# equi-join (complete at oracle scale: any pair with Jaccard > 0
# shares a shingle); the Spark side uses the prefix-filter join, which
# is provably the same set at the threshold.  All counts BIGINT,
# exact integer division, zero-guarded.

ORACLE["lsh_eval"] = _assemble(GAZ, toks_ctes(), DEDUP_CTES, f"""
ev_inter AS MATERIALIZED (
  SELECT x.doc_id AS doc_a, y.doc_id AS doc_b,
         CAST(COUNT(*) AS BIGINT) AS n_inter
  FROM sh x JOIN sh y ON y.shingle = x.shingle
                     AND x.doc_id < y.doc_id
  GROUP BY 1, 2),
ev_truth AS MATERIALIZED (
  SELECT i.doc_a, i.doc_b FROM ev_inter i
  JOIN sh_sizes sa ON sa.doc_id = i.doc_a
  JOIN sh_sizes sb ON sb.doc_id = i.doc_b
  WHERE i.n_inter * 100
        >= (sa.n_sh + sb.n_sh - i.n_inter) * {JACCARD_THRESHOLD_PCT}),
ev_tp AS (
  SELECT c.doc_a, c.doc_b FROM cand c
  JOIN ev_truth t ON t.doc_a = c.doc_a AND t.doc_b = c.doc_b),
ev_row AS (
  SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM ev_truth) AS n_truth,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM cand) AS n_cand,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM ev_tp) AS tp)""",
select="""
SELECT n_truth, n_cand, tp,
       CAST(n_cand - tp AS BIGINT) AS fp,
       CAST(n_truth - tp AS BIGINT) AS fn,
       CAST(CASE WHEN n_cand > 0 THEN tp * 1000000 // n_cand
                 ELSE 0 END AS BIGINT) AS precision_micro6,
       CAST(CASE WHEN n_truth > 0 THEN tp * 1000000 // n_truth
                 ELSE 0 END AS BIGINT) AS recall_micro6
FROM ev_row""")


# ---------------------------------------------------------------------------
# Continuation batch 77: Hamilton largest-remainder crawl-budget
# apportionment (operators/triples.crawl_budget) — exact integer
# quotas over the +1-smoothed extraction-yield utility; the leftover
# goes to the largest remainders (ties by host asc); allocations sum
# exactly to the budget.

ORACLE["crawl_budget"] = _q("""
SELECT host, util, base_alloc, rem,
       CAST(CASE WHEN rk <= (SELECT l FROM cb_left)
                 THEN 1 ELSE 0 END AS BIGINT) AS extra,
       CAST(base_alloc + CASE WHEN rk <= (SELECT l FROM cb_left)
                              THEN 1 ELSE 0 END AS BIGINT) AS alloc
FROM (SELECT s.*, ROW_NUMBER() OVER (ORDER BY rem DESC, host ASC)
          AS rk
      FROM cb_scored s)""", """
cb_util AS MATERIALIZED (
  SELECT d.host,
         CAST(SUM(CASE WHEN t.doc_id IS NULL THEN 0 ELSE 1 END) + 1
              AS BIGINT) AS util
  FROM (SELECT DISTINCT regexp_extract(url, '^https?://([^/]*)', 1)
            AS host, doc_id
        FROM pages) d
  LEFT JOIN (SELECT DISTINCT doc_id FROM triples) t USING (doc_id)
  GROUP BY d.host),
cb_tot AS (SELECT CAST(SUM(util) AS BIGINT) AS u FROM cb_util),
cb_scored AS MATERIALIZED (
  SELECT host, util,
         CAST(10000 * util // (SELECT u FROM cb_tot) AS BIGINT)
             AS base_alloc,
         CAST(10000 * util % (SELECT u FROM cb_tot) AS BIGINT)
             AS rem
  FROM cb_util),
cb_left AS (SELECT CAST(10000 - SUM(base_alloc) AS BIGINT) AS l
            FROM cb_scored)""")


# ---------------------------------------------------------------------------
# Continuation batch 78: type-ahead completion index (functions/
# textstats.completion_index) — per 3-char prefix, top-3 completions
# by corpus tf with the prefix total; pure integer counts.

ORACLE["completions"] = """
WITH ci_tf AS MATERIALIZED (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS tf,
         substr(term, 1, 3) AS prefix
  FROM (SELECT lower(unnest(list_filter(
            string_split_regex(text, '[\\n \\t]'), t -> t <> '')))
            AS term
        FROM documents)
  WHERE length(term) >= 3
  GROUP BY 1),
ci_rk AS (
  SELECT prefix, term, tf,
         CAST(SUM(tf) OVER (PARTITION BY prefix) AS BIGINT)
             AS prefix_tf,
         ROW_NUMBER() OVER (PARTITION BY prefix
             ORDER BY tf DESC, term ASC) AS rank
  FROM ci_tf)
SELECT prefix, CAST(rank AS INT) AS rank, term, tf, prefix_tf
FROM ci_rk WHERE rank <= 3"""


# ---------------------------------------------------------------------------
# Continuation batch 79: critical-path layering of the precedence
# graph's SCC condensation (operators/graph_algos.dag_layers) —
# fixed-round max-plus propagation unrolled as chained CTEs (the
# pagerank_fixed discipline); degrees over the condensation.


def _dag_layers_sql(n_rounds: int = 10) -> str:
    blocks = ["""dl_edges AS MATERIALIZED (
  SELECT DISTINCT sa.scc_id AS a, sb.scc_id AS b
  FROM prec_edges e
  JOIN pscc sa ON sa.node = e.src
  JOIN pscc sb ON sb.node = e.dst
  WHERE sa.scc_id <> sb.scc_id),
dl_comps AS MATERIALIZED (
  SELECT scc_id, CAST(COUNT(*) AS BIGINT) AS n_nodes
  FROM pscc GROUP BY 1),
dl_lvl0 AS MATERIALIZED (
  SELECT scc_id, CAST(0 AS BIGINT) AS level FROM dl_comps)"""]
    for r in range(1, n_rounds + 1):
        blocks.append(f"""dl_lvl{r} AS MATERIALIZED (
  SELECT l.scc_id,
         CAST(GREATEST(l.level, COALESCE(u.cand, 0)) AS BIGINT)
             AS level
  FROM dl_lvl{r - 1} l LEFT JOIN (
    SELECT e.b AS scc_id, MAX(p.level) + 1 AS cand
    FROM dl_edges e JOIN dl_lvl{r - 1} p ON p.scc_id = e.a
    GROUP BY 1) u ON u.scc_id = l.scc_id)""")
    return ",\n".join(blocks)


ORACLE["dag_layers"] = _q("""
SELECT c.scc_id, c.n_nodes, l.level,
       CAST(COALESCE(i.d, 0) AS BIGINT) AS indeg,
       CAST(COALESCE(o.d, 0) AS BIGINT) AS outdeg
FROM dl_comps c JOIN dl_lvl10 l USING (scc_id)
LEFT JOIN (SELECT b AS scc_id, CAST(COUNT(*) AS BIGINT) AS d
           FROM dl_edges GROUP BY 1) i USING (scc_id)
LEFT JOIN (SELECT a AS scc_id, CAST(COUNT(*) AS BIGINT) AS d
           FROM dl_edges GROUP BY 1) o USING (scc_id)""",
                          LINK_CTES, PREC_CTES, _dag_layers_sql(10))


# ---------------------------------------------------------------------------
# Continuation batch 80: locally-dominant-edge weighted matching
# (operators/graph_algos.dominant_matching) over the symmetrized
# precedence graph — rounds unrolled as chained CTEs; the per-node max
# incident key is a ROW_NUMBER pick ordered (w DESC, a DESC, b DESC),
# exactly Spark's max(struct(w, a, b)).


def _dm_sql(n_rounds: int = 6) -> str:
    blocks = ["""dm_e0 AS MATERIALIZED (
  SELECT CASE WHEN src < dst THEN src ELSE dst END AS src,
         CASE WHEN src < dst THEN dst ELSE src END AS dst,
         CAST(SUM(n_pages) AS BIGINT) AS weight
  FROM prec_edges GROUP BY 1, 2)"""]
    for r in range(1, n_rounds + 1):
        blocks.append(f"""dm_best{r} AS MATERIALIZED (
  SELECT node, w, a, b FROM (
    SELECT node, w, a, b,
           ROW_NUMBER() OVER (PARTITION BY node
               ORDER BY w DESC, a DESC, b DESC) AS rn
    FROM (SELECT src AS node, weight AS w, src AS a, dst AS b
          FROM dm_e{r - 1}
          UNION ALL
          SELECT dst AS node, weight AS w, src AS a, dst AS b
          FROM dm_e{r - 1}))
  WHERE rn = 1),
dm_m{r} AS MATERIALIZED (
  SELECT e.src, e.dst, e.weight FROM dm_e{r - 1} e
  JOIN dm_best{r} x ON x.node = e.src AND x.w = e.weight
                   AND x.a = e.src AND x.b = e.dst
  JOIN dm_best{r} y ON y.node = e.dst AND y.w = e.weight
                   AND y.a = e.src AND y.b = e.dst),
dm_n{r} AS (SELECT src AS node FROM dm_m{r}
            UNION SELECT dst AS node FROM dm_m{r}),
dm_e{r} AS MATERIALIZED (
  SELECT * FROM dm_e{r - 1}
  WHERE src NOT IN (SELECT node FROM dm_n{r})
    AND dst NOT IN (SELECT node FROM dm_n{r}))""")
    return ",\n".join(blocks)


ORACLE["dominant_matching"] = _q(
    " UNION ALL ".join(
        f"SELECT src, dst, weight, CAST({r} AS BIGINT) "
        f"AS matched_round FROM dm_m{r}" for r in range(1, 7)),
    LINK_CTES, PREC_CTES, _dm_sql(6))


# ---------------------------------------------------------------------------
# Continuation batch 81: multi-probe SRP ANN (operators/similarity.
# srp_multiprobe_topk) — each query probes its own SRP bucket plus all
# Hamming-1 neighbors; exact cosine over the probed candidates, same
# rank device as ann_topk.  DuckDB's ^ is exponent, so bit flips use
# xor().

_SRP_BUCKET_EXPR = " + ".join(
    f"(CASE WHEN list_dot_product(n.v, {plane}::DOUBLE[]) >= 0"
    f" THEN {1 << i} ELSE 0 END)"
    for i, plane in enumerate(srp_planes()))

ORACLE["srp_multiprobe"] = _assemble(
    SIM_CTES.lstrip(",").strip(),
    select="""
, mp_bucketed AS MATERIALIZED (
  SELECT n.vec_id, n.v, n.nrm, CAST(""" + _SRP_BUCKET_EXPR + """ AS INT)
      AS bucket
  FROM normed n),
mp_probes AS (
  SELECT vec_id, v, nrm, bucket AS pbucket FROM mp_bucketed
""" + "".join(
        f"  UNION ALL SELECT vec_id, v, nrm, "
        f"CAST(xor(bucket, {1 << i}) AS INT) FROM mp_bucketed\n"
        for i in range(ANN_SIGN_BITS)) + """)
SELECT query_id, rank, neighbor_id, sim_micro6 FROM (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         CAST(floor(1000000 * list_dot_product(q.v, c.v)
                    / (q.nrm * c.nrm)) AS BIGINT) AS sim_micro6,
         CAST(ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
              CAST(floor(1000000 * list_dot_product(q.v, c.v)
                         / (q.nrm * c.nrm)) AS BIGINT) DESC,
              c.vec_id) AS INT) AS rank
  FROM mp_probes q
  JOIN mp_bucketed c ON q.pbucket = c.bucket AND q.vec_id <> c.vec_id
) WHERE rank <= 3""")


# ---------------------------------------------------------------------------
# Continuation batch 82: content-syndication provenance graph
# (operators/dedup.syndication_edges) — COMPLETE near-dup pairs by
# direct shingle equi-join (the lsh_eval ev_truth device), attributed
# by the doc_id crawl clock: lower doc_id's source published first.

ORACLE["syndication_edges"] = _assemble(
    GAZ, toks_ctes(), DEDUP_CTES, f"""
sy_inter AS MATERIALIZED (
  SELECT x.doc_id AS doc_a, y.doc_id AS doc_b,
         CAST(COUNT(*) AS BIGINT) AS n_inter
  FROM sh x JOIN sh y ON y.shingle = x.shingle
                     AND x.doc_id < y.doc_id
  GROUP BY 1, 2),
sy_truth AS MATERIALIZED (
  SELECT i.doc_a, i.doc_b FROM sy_inter i
  JOIN sh_sizes sa ON sa.doc_id = i.doc_a
  JOIN sh_sizes sb ON sb.doc_id = i.doc_b
  WHERE i.n_inter * 100
        >= (sa.n_sh + sb.n_sh - i.n_inter) * {JACCARD_THRESHOLD_PCT})""",
    select="""
SELECT da.source AS src_first, db.source AS src_later,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(COUNT(DISTINCT t.doc_b) AS BIGINT) AS n_docs_later
FROM sy_truth t
JOIN documents da ON da.doc_id = t.doc_a
JOIN documents db ON db.doc_id = t.doc_b
GROUP BY 1, 2""")


# ---------------------------------------------------------------------------
# Continuation batch 83: dedup-threshold tuning curve (operators/
# dedup.dup_rate_curve) — ground truth by direct shingle equi-join
# (complete for every threshold); one pair table swept over the
# threshold literals; integer cross-multiplication everywhere.

ORACLE["dup_rate_curve"] = _assemble(GAZ, toks_ctes(), DEDUP_CTES, """
dc_ver AS MATERIALIZED (
  SELECT i.doc_a, i.doc_b, i.n_inter,
         CAST(sa.n_sh + sb.n_sh - i.n_inter AS BIGINT) AS n_union
  FROM (SELECT x.doc_id AS doc_a, y.doc_id AS doc_b,
               CAST(COUNT(*) AS BIGINT) AS n_inter
        FROM sh x JOIN sh y ON y.shingle = x.shingle
                           AND x.doc_id < y.doc_id
        GROUP BY 1, 2) i
  JOIN sh_sizes sa ON sa.doc_id = i.doc_a
  JOIN sh_sizes sb ON sb.doc_id = i.doc_b),
dc_th AS (SELECT * FROM (VALUES (30), (50), (70), (90)) t(threshold_pct)),
dc_swept AS MATERIALIZED (
  SELECT t.threshold_pct, v.doc_a, v.doc_b
  FROM dc_th t JOIN dc_ver v
    ON v.n_inter * 100 >= v.n_union * t.threshold_pct),
dc_n AS (SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n
         FROM documents)""", select="""
SELECT t.threshold_pct,
       CAST(COALESCE(p.n_pairs, 0) AS BIGINT) AS n_pairs,
       CAST(COALESCE(d.n_docs_dup, 0) AS BIGINT) AS n_docs_dup,
       CAST(COALESCE(d.n_docs_dup, 0) * 1000000
            // (SELECT n FROM dc_n) AS BIGINT) AS docs_share_micro6
FROM dc_th t
LEFT JOIN (SELECT threshold_pct, CAST(COUNT(*) AS BIGINT) AS n_pairs
           FROM dc_swept GROUP BY 1) p USING (threshold_pct)
LEFT JOIN (SELECT threshold_pct,
                  CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs_dup
           FROM (SELECT threshold_pct, doc_a AS doc_id FROM dc_swept
                 UNION
                 SELECT threshold_pct, doc_b AS doc_id FROM dc_swept)
           GROUP BY 1) d USING (threshold_pct)""")


# ---------------------------------------------------------------------------
# Continuation batch 84: per-(page, entity) evidence snippets
# (operators/linking.evidence_snippets) — first mention by
# (start, end, ent_id), +/-40 chars of context by substr on the page
# text (both engines clamp identically at the edges).

ORACLE["evidence_snippets"] = _q("""
SELECT f.url, f.canonical_id,
       CAST(f.start AS BIGINT) AS start,
       CAST(f."end" AS BIGINT) AS "end",
       f.ent_text,
       substr(p.text, greatest(0, f.start - 40) + 1,
              (f."end" - greatest(0, f.start - 40)) + 40) AS evidence
FROM (
  SELECT url, canonical_id, start, "end", ent_text,
         ROW_NUMBER() OVER (PARTITION BY url, canonical_id
             ORDER BY start, "end", ent_id) AS rn
  FROM linked) f
JOIN pages p ON p.url = f.url
WHERE f.rn = 1""", LINK_CTES)


# ---------------------------------------------------------------------------
# Continuation batch 85: DistMult bilinear scoring + TransE/DistMult
# ranker-agreement profile (operators/kg_embed.distmult_scores,
# scorer_agreement) — both engines parse the SAME generated score
# expression (the transe_scores no-drift device).

from ..operators.kg_embed import distmult_score_sql as _dm_score  # noqa: E402

ORACLE["distmult_scores"] = _q(f"""
SELECT subj, pred, obj,
       CAST({_dm_score('subj', 'pred', 'obj')} AS BIGINT) AS score
FROM (SELECT DISTINCT subj, pred, obj FROM triples)""")

ORACLE["scorer_agreement"] = _q("""
SELECT n.pred, n.n_facts,
       CAST(LEAST(10, n.n_facts) AS BIGINT) AS topk,
       CAST(COALESCE(o.n_overlap, 0) AS BIGINT) AS n_overlap,
       CAST(COALESCE(o.n_overlap, 0) * 1000000
            // LEAST(10, n.n_facts) AS BIGINT) AS overlap_micro6
FROM (SELECT pred, CAST(COUNT(*) AS BIGINT) AS n_facts
      FROM sa_ranked GROUP BY 1) n
LEFT JOIN (SELECT pred, CAST(COUNT(*) AS BIGINT) AS n_overlap
           FROM sa_ranked WHERE rt <= 10 AND rd <= 10
           GROUP BY 1) o USING (pred)""", f"""
sa_ranked AS MATERIALIZED (
  SELECT pred,
         ROW_NUMBER() OVER (PARTITION BY pred
             ORDER BY te ASC, subj, obj) AS rt,
         ROW_NUMBER() OVER (PARTITION BY pred
             ORDER BY dm DESC, subj, obj) AS rd
  FROM (SELECT subj, pred, obj,
               CAST({_te_score('subj', 'pred', 'obj')} AS BIGINT)
                   AS te,
               CAST({_dm_score('subj', 'pred', 'obj')} AS BIGINT)
                   AS dm
        FROM (SELECT DISTINCT subj, pred, obj FROM triples)))""")


# ---------------------------------------------------------------------------
# Continuation batch 86: single-linkage clusters = MSF cut at the
# distance threshold + connected components over the kept forest
# (operators/graph_algos.single_linkage_clusters) — reuses the
# Boruvka round CTEs; the closure runs on the forest (<= n-1 edges).

SL_CUT_COST = 500000  # similarity >= 0.5 <=> cost <= 1e6 - 5e5

ORACLE["single_linkage"] = _q(f"""
SELECT c.node, c.cluster_id,
       CAST(s.cluster_size AS BIGINT) AS cluster_size
FROM sl_comp c
JOIN (SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS cluster_size
      FROM sl_comp GROUP BY 1) s USING (cluster_id)""",
                              _EJ_CTES, _boruvka_sql(6), f"""
sl_forest AS MATERIALIZED (
  {" UNION ALL ".join(f"SELECT src, dst, cost FROM bor_min{r}"
                      for r in range(1, 7))}),
sl_sym AS MATERIALIZED (
  SELECT src AS a, dst AS b FROM sl_forest WHERE cost <= {SL_CUT_COST}
  UNION
  SELECT dst AS a, src AS b FROM sl_forest WHERE cost <= {SL_CUT_COST}),
sl_clos(u, v) AS (
  SELECT node AS u, node AS v FROM bor_lab0
  UNION
  SELECT c.u, e.b AS v FROM sl_clos c JOIN sl_sym e ON e.a = c.v),
sl_comp AS MATERIALIZED (
  SELECT u AS node, MIN(v) AS cluster_id FROM sl_clos GROUP BY 1)""")


# ---------------------------------------------------------------------------
# Continuation batch 87: join-skew hot-key profile — per join-key
# family, exact integer concentration stats (sum of squared per-key
# counts = exact self-equi-join work; max/avg in micro6 = the salting
# alarm).  Mirrors functions/textstats.join_skew_profile over the
# same three families the driver query feeds it.

ORACLE["join_skew"] = _q("""
SELECT family, n_keys, n_rows, max_rows, sum_sq,
       CAST(max_rows * 1000000 // n_rows AS BIGINT) AS top1_share_micro6,
       CAST(max_rows * n_keys * 1000000 // n_rows AS BIGINT)
           AS max_over_avg_micro6
FROM (
  SELECT family,
         CAST(COUNT(*) AS BIGINT) AS n_keys,
         CAST(SUM(c) AS BIGINT) AS n_rows,
         CAST(MAX(c) AS BIGINT) AS max_rows,
         CAST(SUM(c * c) AS BIGINT) AS sum_sq
  FROM (
    SELECT family, key, CAST(COUNT(*) AS BIGINT) AS c
    FROM (
      SELECT 'host_pages' AS family,
             regexp_extract(url, '^https?://([^/]*)', 1) AS key
      FROM pages
      UNION ALL
      SELECT 'link_mention' AS family, lower(ent_text) AS key
      FROM mentions
      UNION ALL
      SELECT 'agg_subj' AS family, subj AS key FROM triples)
    GROUP BY 1, 2)
  GROUP BY 1)""")


# ---------------------------------------------------------------------------
# Continuation batch 88: one-pass GROUPING-SETS fact rollup — leaf
# (host, pred) cells + per-host totals + grand total; GROUPING()
# bitmask matches Spark's grouping_id() (first column = MSB).

ORACLE["fact_rollup"] = _q("""
SELECT COALESCE(host, '(all)') AS host,
       COALESCE(pred, '(all)') AS pred,
       CAST(GROUPING(host, pred) AS BIGINT) AS lvl,
       CAST(COUNT(*) AS BIGINT) AS n_triples,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
FROM (SELECT regexp_extract(url, '^https?://([^/]*)', 1) AS host,
             pred, doc_id
      FROM triples)
GROUP BY ROLLUP (host, pred)""")


# ---------------------------------------------------------------------------
# Continuation batch 89: Bloomjoin semi-join reduction audit — Bloom
# of the hub-entity dim keys (subjects with >= 3 distinct preds),
# every fact subj tested with the same salted md5 nibble primitive as
# bloom_bits; single audited summary row.

ORACLE["bloom_semi_join"] = _q(f"""
, bsj_keys AS MATERIALIZED (
  SELECT subj AS item, CAST(COUNT(*) AS BIGINT) AS c
  FROM triples GROUP BY 1),
bsj_dim AS MATERIALIZED (
  SELECT subj AS item FROM triples
  GROUP BY 1 HAVING COUNT(DISTINCT pred) >= 3),
bsj_words AS MATERIALIZED (
  SELECT pos // 32 AS word,
         bit_or(CAST(1 AS BIGINT) << (pos % 32)) AS bits
  FROM (SELECT {_nib5('_h')} AS pos
        FROM (SELECT md5(CAST(p AS VARCHAR) || ':' || item) AS _h
              FROM bsj_dim, unnest(generate_series(0, 3)) AS g(p)))
  GROUP BY 1),
bsj_verdict AS MATERIALIZED (
  SELECT item,
         MIN(CASE WHEN (COALESCE(w.bits, 0) >> (pos % 32)) & 1 = 1
                  THEN 1 ELSE 0 END) AS maybe
  FROM (SELECT item, pos, pos // 32 AS word
        FROM (SELECT item, {_nib5('_h')} AS pos
              FROM (SELECT k.item,
                           md5(CAST(p AS VARCHAR) || ':' || k.item) AS _h
                    FROM bsj_keys k,
                         unnest(generate_series(0, 3)) AS g(p)))) p
  LEFT JOIN bsj_words w USING (word)
  GROUP BY 1),
bsj_audit AS MATERIALIZED (
  SELECT k.item, k.c, v.maybe,
         CASE WHEN d.item IS NOT NULL THEN 1 ELSE 0 END AS is_true
  FROM bsj_keys k
  JOIN bsj_verdict v USING (item)
  LEFT JOIN bsj_dim d USING (item))
SELECT CAST(SUM(c) AS BIGINT) AS n_fact,
       CAST(COUNT(*) AS BIGINT) AS n_fact_keys,
       CAST((SELECT COUNT(*) FROM bsj_dim) AS BIGINT) AS n_dim_keys,
       CAST(SUM(maybe) AS BIGINT) AS pass_keys,
       CAST(SUM(c * maybe) AS BIGINT) AS pass_rows,
       CAST(SUM(is_true) AS BIGINT) AS true_keys,
       CAST(SUM(c * is_true) AS BIGINT) AS true_rows,
       CAST(SUM(maybe) - SUM(is_true) AS BIGINT) AS fp_keys,
       CAST(SUM(is_true * (1 - maybe)) AS BIGINT) AS false_neg_keys,
       CAST((SUM(c) - SUM(c * maybe)) * 1000000 // SUM(c) AS BIGINT)
           AS reduction_micro6
FROM bsj_audit""")


# ---------------------------------------------------------------------------
# Continuation batch 90: densest subgraph by greedy parallel peeling
# (Bahmani et al.) — the integer peel rule unrolled round-for-round
# over the jac >= 0.2 attribute-similarity graph; best round by
# density micro6, earliest on ties.

def _densest_sql(max_rounds: int = 8, eps_num: int = 11,
                 eps_den: int = 10) -> str:
    blocks = ["""
ds_e0 AS MATERIALIZED (
  SELECT LEAST(subj_a, subj_b) AS a, GREATEST(subj_a, subj_b) AS b
  FROM ej_pairs WHERE jac_micro6 >= 200000 AND subj_a <> subj_b
  GROUP BY 1, 2),
ds_n0 AS MATERIALIZED (
  SELECT DISTINCT node FROM (
    SELECT a AS node FROM ds_e0 UNION ALL SELECT b FROM ds_e0))"""]
    for r in range(max_rounds):
        blocks.append(f"""
ds_cnt{r} AS MATERIALIZED (
  SELECT (SELECT COUNT(*) FROM ds_n{r}) AS n,
         (SELECT COUNT(*) FROM ds_e{r}) AS e),
ds_deg{r} AS MATERIALIZED (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS deg FROM (
    SELECT a AS node FROM ds_e{r} UNION ALL SELECT b FROM ds_e{r})
  GROUP BY 1),
ds_n{r + 1} AS MATERIALIZED (
  SELECT n.node
  FROM ds_n{r} n JOIN ds_deg{r} d USING (node), ds_cnt{r} c
  WHERE d.deg * c.n * {eps_den} > 2 * {eps_num} * c.e),
ds_e{r + 1} AS MATERIALIZED (
  SELECT e.a, e.b FROM ds_e{r} e
  JOIN ds_n{r + 1} x ON e.a = x.node
  JOIN ds_n{r + 1} y ON e.b = y.node)""")
    hist = " UNION ALL ".join(
        f"SELECT {r} AS round, n, e FROM ds_cnt{r}"
        for r in range(max_rounds))
    tags = " UNION ALL ".join(
        f"SELECT {r} AS round, node FROM ds_n{r}"
        for r in range(max_rounds))
    blocks.append(f"""
ds_hist AS MATERIALIZED ({hist}),
ds_best AS MATERIALIZED (
  SELECT round, n, e, e * 1000000 // n AS dens
  FROM ds_hist WHERE n > 0 ORDER BY dens DESC, round ASC LIMIT 1),
ds_tag AS ({tags})""")
    return ",".join(blocks)


ORACLE["densest_subgraph"] = _q("""
SELECT t.node, CAST(b.round AS INT) AS round,
       CAST(b.n AS BIGINT) AS n_nodes,
       CAST(b.e AS BIGINT) AS n_edges,
       CAST(b.dens AS BIGINT) AS density_micro6
FROM ds_tag t JOIN ds_best b USING (round)""",
                                _EJ_CTES, _densest_sql())


# ---------------------------------------------------------------------------
# Continuation batch 91: Z-order vs linear layout pruning audit —
# Morton interleave from the SAME expression text the Spark side
# compiles (plans/layout.interleave_expr), min/max footer stats per
# file, point-query hit counts per layout.

from ..plans.layout import interleave_expr as _zexpr

ORACLE["layout_pruning"] = _q(f"""
, zl_base AS MATERIALIZED (
  SELECT CAST(doc_id % 256 AS INT) AS d,
         CAST((strpos('0123456789abcdef', substring(_mh, 1, 1)) - 1)
              * 16
              + (strpos('0123456789abcdef', substring(_mh, 2, 1)) - 1)
           AS INT) AS b
  FROM (SELECT doc_id,
               md5(regexp_extract(url, '^https?://([^/]*)', 1)) AS _mh
        FROM pages)),
zl_tag AS (
  SELECT 'zorder' AS layout,
         CAST({_zexpr('d', 'b')} * 16 // 65536 AS INT) AS file_id,
         d, b
  FROM zl_base
  UNION ALL
  SELECT 'linear' AS layout,
         CAST((d * 256 + b) * 16 // 65536 AS INT) AS file_id, d, b
  FROM zl_base),
zl_files AS MATERIALIZED (
  SELECT layout, file_id, CAST(COUNT(*) AS BIGINT) AS n_rows,
         MIN(d) AS min_d, MAX(d) AS max_d,
         MIN(b) AS min_b, MAX(b) AS max_b
  FROM zl_tag GROUP BY 1, 2)
SELECT layout,
       CAST(COUNT(*) AS BIGINT) AS n_files,
       CAST(SUM(n_rows) AS BIGINT) AS n_rows,
       CAST(SUM(CASE WHEN min_d <= 17 AND max_d >= 17
                     THEN 1 ELSE 0 END) AS BIGINT) AS hit_files_d,
       CAST(SUM(CASE WHEN min_d <= 17 AND max_d >= 17
                     THEN n_rows ELSE 0 END) AS BIGINT) AS hit_rows_d,
       CAST(SUM(CASE WHEN min_b <= 42 AND max_b >= 42
                     THEN 1 ELSE 0 END) AS BIGINT) AS hit_files_b,
       CAST(SUM(CASE WHEN min_b <= 42 AND max_b >= 42
                     THEN n_rows ELSE 0 END) AS BIGINT) AS hit_rows_b
FROM zl_files GROUP BY 1""")


# ---------------------------------------------------------------------------
# Continuation batch 92: 3-D Pareto-frontier skyline — dominance as
# NOT EXISTS over the per-subject stats; the Spark side computes the
# same frontier via partition-local skylines + merge (the set is
# partition-invariant, which is exactly what this cross-check pins).

ORACLE["skyline_3d"] = _q("""
, sky_stats AS MATERIALIZED (
  SELECT subj,
         CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
         CAST(COUNT(DISTINCT
              regexp_extract(url, '^https?://([^/]*)', 1)) AS BIGINT)
             AS n_hosts,
         CAST(COUNT(DISTINCT pred) AS BIGINT) AS n_preds
  FROM triples GROUP BY 1)
SELECT s.subj, s.n_docs, s.n_hosts, s.n_preds
FROM sky_stats s
WHERE NOT EXISTS (
  SELECT 1 FROM sky_stats t
  WHERE t.n_docs >= s.n_docs AND t.n_hosts >= s.n_hosts
    AND t.n_preds >= s.n_preds
    AND (t.n_docs > s.n_docs OR t.n_hosts > s.n_hosts
         OR t.n_preds > s.n_preds))""")


# ---------------------------------------------------------------------------
# Continuation batch 93: a-priori frequent itemsets (sizes 1-3) over
# doc-grain object-value transactions, min_support 12 — the same
# L1 -> C2 -> L2 -> (pruned) C3 -> L3 lattice as
# operators/itemsets.apriori_itemsets.

ORACLE["apriori_itemsets"] = _q("""
, ap_tx AS MATERIALIZED (
  SELECT DISTINCT doc_id, lower(obj) AS item FROM triples),
ap_l1 AS MATERIALIZED (
  SELECT item, CAST(COUNT(*) AS BIGINT) AS support
  FROM ap_tx GROUP BY 1 HAVING COUNT(*) >= 12),
ap_tf AS MATERIALIZED (
  SELECT t.doc_id, t.item FROM ap_tx t
  JOIN ap_l1 l USING (item)),
ap_p2 AS MATERIALIZED (
  SELECT a.doc_id, a.item AS i1, b.item AS i2
  FROM ap_tf a JOIN ap_tf b
    ON a.doc_id = b.doc_id AND a.item < b.item),
ap_l2 AS MATERIALIZED (
  SELECT i1, i2, CAST(COUNT(*) AS BIGINT) AS support
  FROM ap_p2 GROUP BY 1, 2 HAVING COUNT(*) >= 12),
ap_c3 AS MATERIALIZED (
  SELECT p.i1, p.i2, q.i2 AS i3
  FROM ap_l2 p JOIN ap_l2 q ON p.i1 = q.i1 AND p.i2 < q.i2
  JOIN ap_l2 f ON f.i1 = p.i2 AND f.i2 = q.i2),
ap_l3 AS MATERIALIZED (
  SELECT c.i1, c.i2, c.i3, CAST(COUNT(*) AS BIGINT) AS support
  FROM ap_c3 c
  JOIN ap_p2 p ON p.i1 = c.i1 AND p.i2 = c.i2
  JOIN ap_tf t ON t.doc_id = p.doc_id AND t.item = c.i3
  GROUP BY 1, 2, 3 HAVING COUNT(*) >= 12)
SELECT CAST(1 AS INT) AS k, item AS item1, '' AS item2, '' AS item3,
       support
FROM ap_l1
UNION ALL
SELECT CAST(2 AS INT), i1, i2, '', support FROM ap_l2
UNION ALL
SELECT CAST(3 AS INT), i1, i2, i3, support FROM ap_l3""")


# ---------------------------------------------------------------------------
# Continuation batch 94: LM-quality reliability table — rank-decile
# buckets from the distinct-score value table (the doclen_percentiles
# cumulative device), keep-rate per bucket from the curation gate.
# Reuses the lm_quality statement verbatim as a nested subquery so
# score construction can never drift from its own oracle.

ORACLE["quality_calibration"] = "WITH " + CURATION_CTES + f""",
qc_score AS MATERIALIZED ({ORACLE["lm_quality"]}),
qc AS MATERIALIZED (
  SELECT s.doc_id, s.lm_score_micro6,
         CASE WHEN c.reason = 'ok' THEN 1 ELSE 0 END AS keep
  FROM qc_score s JOIN cr c USING (doc_id)),
qc_vals AS MATERIALIZED (
  SELECT lm_score_micro6, CAST(COUNT(*) AS BIGINT) AS c,
         CAST(SUM(keep) AS BIGINT) AS k
  FROM qc GROUP BY 1),
qc_cum AS MATERIALIZED (
  SELECT lm_score_micro6, c, k,
         COALESCE(SUM(c) OVER (ORDER BY lm_score_micro6
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS cum_before,
         SUM(c) OVER () AS n_total
  FROM qc_vals)
SELECT bucket,
       CAST(SUM(c) AS BIGINT) AS n_docs,
       CAST(SUM(k) AS BIGINT) AS n_keep,
       CAST(SUM(k) * 1000000 // SUM(c) AS BIGINT)
           AS keep_rate_micro6,
       CAST(MIN(lm_score_micro6) AS BIGINT) AS score_lo,
       CAST(MAX(lm_score_micro6) AS BIGINT) AS score_hi
FROM (SELECT *, CAST(cum_before * 10 // n_total AS INT) AS bucket
      FROM qc_cum)
GROUP BY 1"""


# ---------------------------------------------------------------------------
# Continuation batch 95: robust per-host volume outliers — lower
# nearest-rank median + MAD over the per-host table, integer 3.5-MAD
# cut (functions/textstats.host_outliers).

ORACLE["host_outliers"] = """
WITH ho AS (
  SELECT source,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(len(list_filter(string_split_regex(text, '[\\n \\t]'),
             x -> x <> ''))) AS BIGINT) AS total_tokens
  FROM documents GROUP BY 1),
ho1 AS (
  SELECT *,
         ROW_NUMBER() OVER (ORDER BY total_tokens, source) - 1 AS rn,
         COUNT(*) OVER () AS cnt
  FROM ho),
ho2 AS (
  SELECT *,
         MAX(CASE WHEN rn = (cnt - 1) // 2 THEN total_tokens END)
             OVER () AS med_tokens
  FROM ho1),
ho3 AS (
  SELECT *, ABS(total_tokens - med_tokens) AS abs_dev FROM ho2),
ho4 AS (
  SELECT *,
         ROW_NUMBER() OVER (ORDER BY abs_dev, source) - 1 AS rn2
  FROM ho3),
ho5 AS (
  SELECT *,
         MAX(CASE WHEN rn2 = (cnt - 1) // 2 THEN abs_dev END)
             OVER () AS mad_tokens
  FROM ho4)
SELECT source, n_docs, total_tokens,
       CAST(med_tokens AS BIGINT) AS med_tokens,
       CAST(mad_tokens AS BIGINT) AS mad_tokens,
       CAST(abs_dev AS BIGINT) AS abs_dev,
       CAST(CASE WHEN abs_dev * 10 > 35 * mad_tokens
                 THEN 1 ELSE 0 END AS INT) AS is_outlier
FROM ho5"""


# ---------------------------------------------------------------------------
# Continuation batch 96: chi-square gate-fairness audit per source —
# the z-squared two-cell collapse n*(r-p)^2/(p(1-p)) in floor-scaled
# micro6 (functions/textstats.source_gate_chi2).

ORACLE["source_gate_chi2"] = "WITH " + CURATION_CTES + """,
sg AS MATERIALIZED (
  SELECT d.source,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(CASE WHEN c.reason = 'ok' THEN 1 ELSE 0 END)
           AS BIGINT) AS n_keep
  FROM documents d JOIN cr c USING (doc_id)
  GROUP BY 1),
sg1 AS MATERIALIZED (
  SELECT *,
         SUM(n_docs) OVER () AS _N,
         SUM(n_keep) OVER () AS _K,
         CAST(n_keep * 1000000 // n_docs AS BIGINT) AS rate_micro6
  FROM sg),
sg2 AS MATERIALIZED (
  SELECT *,
         CAST(_K * 1000000 // _N AS BIGINT) AS global_rate_micro6
  FROM sg1),
sg3 AS MATERIALIZED (
  SELECT *,
         CAST(CASE
           WHEN global_rate_micro6 = 0 OR global_rate_micro6 = 1000000
           THEN 0
           ELSE (n_docs * (rate_micro6 - global_rate_micro6)
                        * (rate_micro6 - global_rate_micro6))
                // ((global_rate_micro6
                     * (1000000 - global_rate_micro6)) // 1000000)
           END AS BIGINT) AS chi2_micro6
  FROM sg2)
SELECT source, n_docs, n_keep, rate_micro6, global_rate_micro6,
       chi2_micro6,
       CAST(SUM(chi2_micro6) OVER () AS BIGINT) AS chi2_total_micro6
FROM sg3"""


# ---------------------------------------------------------------------------
# Continuation batch 97: targeted-attack robustness — top-3 hubs by
# distinct-neighbor degree, component sizes before/after removal
# (operators/graph_algos.hub_robustness); closures are recursive
# min-member reachability over the symmetrized canonical graph.

ORACLE["hub_robustness"] = _q("""
, ge AS (
  SELECT s.component AS subj_node,
         COALESCE(oc.component, COALESCE(og.canonical_id, 'surface:' || lower(t.obj))) AS obj_node
  FROM triples t
  JOIN linked l ON t.url = l.url AND t.subj_id = l.ent_id
  JOIN components s ON l.canonical_id = s.node
  LEFT JOIN gaz og ON lower(t.obj) = og.alias
  LEFT JOIN components oc
         ON COALESCE(og.canonical_id, 'surface:' || lower(t.obj)) = oc.node
  GROUP BY 1, 2),
rb_und AS MATERIALIZED (
  SELECT LEAST(subj_node, obj_node) AS a,
         GREATEST(subj_node, obj_node) AS b
  FROM ge WHERE subj_node <> obj_node GROUP BY 1, 2),
rb_nodes AS MATERIALIZED (
  SELECT DISTINCT node FROM (
    SELECT a AS node FROM rb_und UNION ALL SELECT b FROM rb_und)),
rb_sym AS MATERIALIZED (
  SELECT a, b FROM rb_und UNION SELECT b, a FROM rb_und),
rb_deg AS MATERIALIZED (
  SELECT a AS node, CAST(COUNT(DISTINCT b) AS BIGINT) AS size
  FROM rb_sym GROUP BY 1),
rb_hubs AS MATERIALIZED (
  SELECT node, size FROM rb_deg ORDER BY size DESC, node ASC LIMIT 3),
rb_clos_b(u, v) AS (
  SELECT node AS u, node AS v FROM rb_nodes
  UNION
  SELECT c.u, e.b FROM rb_clos_b c JOIN rb_sym e ON e.a = c.v),
rb_before AS MATERIALIZED (
  SELECT u AS member, MIN(v) AS comp FROM rb_clos_b GROUP BY 1),
rb_sym_a AS MATERIALIZED (
  SELECT a, b FROM rb_sym
  WHERE a NOT IN (SELECT node FROM rb_hubs)
    AND b NOT IN (SELECT node FROM rb_hubs)),
rb_nodes_a AS MATERIALIZED (
  SELECT node FROM rb_nodes
  WHERE node NOT IN (SELECT node FROM rb_hubs)),
rb_clos_a(u, v) AS (
  SELECT node AS u, node AS v FROM rb_nodes_a
  UNION
  SELECT c.u, e.b FROM rb_clos_a c JOIN rb_sym_a e ON e.a = c.v),
rb_after AS MATERIALIZED (
  SELECT u AS member, MIN(v) AS comp FROM rb_clos_a GROUP BY 1)
SELECT 'hub' AS phase, node, size FROM rb_hubs
UNION ALL
SELECT 'before' AS phase, comp AS node,
       CAST(COUNT(*) AS BIGINT) AS size
FROM rb_before GROUP BY 2
UNION ALL
SELECT 'after' AS phase, comp AS node,
       CAST(COUNT(*) AS BIGINT) AS size
FROM rb_after GROUP BY 2""", LINK_CTES)


# ---------------------------------------------------------------------------
# Continuation batch 98: PII scrubbing — same synthetic contact-line
# wrap, same greedy character-class regex fragment (identical
# semantics in Java regex and RE2), counts + masked-text sha256
# (functions/textstats.pii_scrub).

_PII_EMAIL_SQL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
_PII_IPV4_SQL = ("\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"
                 "\\.[0-9]{1,3}\\b")

ORACLE["pii_scrub"] = f"""
WITH pii_wrapped AS (
  SELECT doc_id,
         CASE WHEN doc_id % 3 = 0 THEN text
              || chr(10) || 'contact: user' || CAST(doc_id AS VARCHAR)
              || '@mail' || CAST(doc_id % 7 AS VARCHAR)
              || '.example.com from 10.'
              || CAST(doc_id % 256 AS VARCHAR) || '.'
              || CAST(doc_id % 13 AS VARCHAR) || '.'
              || CAST(doc_id % 251 AS VARCHAR)
              ELSE text END AS text
  FROM documents)
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{_PII_EMAIL_SQL}'))
         AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(text, '{_PII_IPV4_SQL}'))
         AS BIGINT) AS n_ips,
       sha256(regexp_replace(
           regexp_replace(text, '{_PII_EMAIL_SQL}', '<EMAIL>', 'g'),
           '{_PII_IPV4_SQL}', '<IP>', 'g')) AS scrubbed_sha
FROM pii_wrapped"""


# ---------------------------------------------------------------------------
# Continuation batch 99: one-sided CUSUM drift per event type — the
# prefix-sum closed form S_t = P_t - min(0, min_prefix(P)) as plain
# window SQL (operators/events.cusum_drift, k_den=4, h=3*mu+5).

ORACLE["cusum_drift"] = """
WITH cu_day AS (
  SELECT CAST(epoch_us(ts) // 86400000000 AS INT) AS day_idx,
         event_type AS etype
  FROM events),
cu_spine AS (SELECT DISTINCT day_idx FROM cu_day),
cu_types AS (SELECT DISTINCT etype FROM cu_day),
cu_sparse AS (
  SELECT etype, day_idx, CAST(COUNT(*) AS BIGINT) AS r
  FROM cu_day GROUP BY 1, 2),
cu_grid AS (
  SELECT t.etype, s.day_idx, COALESCE(x.r, 0) AS r
  FROM cu_types t CROSS JOIN cu_spine s
  LEFT JOIN cu_sparse x USING (etype, day_idx)),
cu_mu AS (
  SELECT etype, CAST(SUM(r) // COUNT(*) AS BIGINT) AS mu
  FROM cu_grid GROUP BY 1),
cu_dev AS (
  SELECT g.etype, g.day_idx, g.r, m.mu,
         g.r - m.mu - GREATEST(1, m.mu // 4) AS dev
  FROM cu_grid g JOIN cu_mu m USING (etype)),
cu_win AS (
  SELECT *,
         SUM(dev) OVER (PARTITION BY etype ORDER BY day_idx
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p
  FROM cu_dev),
cu_s AS (
  SELECT *,
         MIN(p) OVER (PARTITION BY etype ORDER BY day_idx
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS minp
  FROM cu_win)
SELECT etype, day_idx, r, mu,
       CAST(p - LEAST(0, minp) AS BIGINT) AS cusum,
       CAST(CASE WHEN p - LEAST(0, minp) > mu * 3 + 5
                 THEN 1 ELSE 0 END AS INT) AS alarm
FROM cu_s"""


# ---------------------------------------------------------------------------
# Continuation batch 100: Heaps-law vocabulary growth at doc-id
# bucket grain (functions/textstats.vocab_growth, bucket 50).

ORACLE["vocab_growth"] = """
WITH vg_toks AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(text, '[\\n \\t]'),
                x -> x <> '')) AS tok
  FROM documents),
vg_vol AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tok
  FROM vg_toks GROUP BY 1),
vg_new AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_new
  FROM (SELECT tok, MIN(doc_id) AS doc_id FROM vg_toks GROUP BY 1)
  GROUP BY 1),
vg_doc AS (
  SELECT d.doc_id, COALESCE(v.n_tok, 0) AS n_tok,
         COALESCE(n.n_new, 0) AS n_new
  FROM documents d
  LEFT JOIN vg_vol v USING (doc_id)
  LEFT JOIN vg_new n USING (doc_id)),
vg_bucket AS (
  SELECT CAST(doc_id // 50 AS INT) AS bucket,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
         CAST(SUM(n_new) AS BIGINT) AS n_new_types
  FROM vg_doc GROUP BY 1)
SELECT bucket, n_docs, n_tokens, n_new_types,
       CAST(SUM(n_tokens) OVER (ORDER BY bucket
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         AS BIGINT) AS cum_tokens,
       CAST(SUM(n_new_types) OVER (ORDER BY bucket
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         AS BIGINT) AS vocab_size
FROM vg_bucket"""


# ---------------------------------------------------------------------------
# Continuation batch 102: Theil-Sen robust trend per event type —
# median pairwise slope; both engines TRUNCATE integer division
# toward zero on negatives (measured), so raw // == Spark DIV
# (operators/events.theil_sen_trend).

ORACLE["theil_sen_trend"] = """
WITH tst_day AS (
  SELECT CAST(epoch_us(ts) // 86400000000 AS INT) AS day_idx,
         event_type AS etype
  FROM events),
tst_spine AS (SELECT DISTINCT day_idx FROM tst_day),
tst_types AS (SELECT DISTINCT etype FROM tst_day),
tst_sparse AS (
  SELECT etype, day_idx, CAST(COUNT(*) AS BIGINT) AS r
  FROM tst_day GROUP BY 1, 2),
tst_grid AS (
  SELECT t.etype, s.day_idx, COALESCE(x.r, 0) AS r
  FROM tst_types t CROSS JOIN tst_spine s
  LEFT JOIN tst_sparse x USING (etype, day_idx)),
tst_pairs AS (
  SELECT a.etype, a.day_idx AS i, b.day_idx AS j,
         CAST(((b.r - a.r) * 1000000) // (b.day_idx - a.day_idx)
           AS BIGINT) AS slope
  FROM tst_grid a JOIN tst_grid b
    ON a.etype = b.etype AND b.day_idx > a.day_idx),
tst_ranked AS (
  SELECT *,
         ROW_NUMBER() OVER (PARTITION BY etype
             ORDER BY slope, i, j) - 1 AS rk,
         COUNT(*) OVER (PARTITION BY etype) AS n
  FROM tst_pairs)
SELECT r.etype,
       CAST((SELECT COUNT(*) FROM tst_spine) AS BIGINT) AS n_days,
       CAST(r.n AS BIGINT) AS n_pairs,
       r.slope AS slope_micro6
FROM tst_ranked r
WHERE r.rk = (r.n - 1) // 2"""


# ---------------------------------------------------------------------------
# Continuation batch 103: Benford first-significant-digit forensics
# per predicate over the numeric literals
# (operators/triples.benford_digits).  Expected shares are the
# floor(log10(1+1/d)*1e6) integer literals baked into the operator —
# no runtime log10 on either engine.

ORACLE["benford_digits"] = _q(r"""
SELECT r.pred, r.digit, r.n_obs, r.n_total,
       CAST(r.n_obs * 1000000 // r.n_total AS BIGINT) AS obs_micro6,
       r.exp_micro6,
       r.dev_micro6,
       m.mad_micro6
FROM bf_row r JOIN (
  SELECT pred, CAST(SUM(dev_micro6) // 9 AS BIGINT) AS mad_micro6
  FROM bf_row GROUP BY pred) m ON m.pred = r.pred""", r"""
bf_d AS (
  SELECT pred,
         CAST(substr(sig, 1, 1) AS INT) AS d
  FROM (
    SELECT pred,
           regexp_replace(regexp_replace(
               regexp_extract(obj,
                   '([0-9][0-9,]*)(\.[0-9]+)?', 0),
               '[^0-9]', '', 'g'), '^0+', '') AS sig
    FROM (SELECT DISTINCT pred, obj FROM (
            SELECT pred, obj FROM triples
            UNION ALL
            SELECT event_type AS pred, props AS obj FROM events)))
  WHERE sig <> '')""", """
bf_digits AS (SELECT UNNEST(generate_series(1, 9)) AS digit)""", """
bf_exp AS (
  SELECT digit,
         CASE digit WHEN 1 THEN 301029 WHEN 2 THEN 176091
                    WHEN 3 THEN 124938 WHEN 4 THEN 96910
                    WHEN 5 THEN 79181 WHEN 6 THEN 66946
                    WHEN 7 THEN 57991 WHEN 8 THEN 51152
                    WHEN 9 THEN 45757 END AS exp_micro6
  FROM bf_digits)""", """
bf_row AS (
  SELECT p.pred, g.digit,
         CAST(COALESCE(c.n, 0) AS BIGINT) AS n_obs,
         p.n_total, g.exp_micro6,
         CAST(abs(COALESCE(c.n, 0) * 1000000 // p.n_total
                  - g.exp_micro6) AS BIGINT) AS dev_micro6
  FROM (SELECT pred, CAST(COUNT(*) AS BIGINT) AS n_total
        FROM bf_d GROUP BY pred) p
  CROSS JOIN bf_exp g
  LEFT JOIN (SELECT pred, d, COUNT(*) AS n FROM bf_d
             GROUP BY pred, d) c
    ON c.pred = p.pred AND c.d = g.digit)""")


# ---------------------------------------------------------------------------
# Continuation batch 104: MMR diversified reranking — the k greedy
# rounds unrolled as chained MATERIALIZED CTEs over the same
# floor(cosine*1e6) integer scores the Spark operator uses
# (operators/similarity.mmr_rerank).

def _mmr_sql(k: int = 10, n_candidates: int = 50,
             lam_pct: int = 70, query_id: int = 0) -> str:
    mu = 100 - lam_pct
    blocks = [f"""
mmr_cand AS MATERIALIZED (
  SELECT c.vec_id,
         CAST(floor(1000000 * list_dot_product(q.v, c.v)
                    / (q.nrm * c.nrm)) AS BIGINT) AS rel
  FROM normed q JOIN normed c ON c.vec_id <> q.vec_id
  WHERE q.vec_id = {query_id}
  ORDER BY rel DESC, c.vec_id LIMIT {n_candidates})""", f"""
mmr_sim AS MATERIALIZED (
  SELECT a.vec_id AS a, b.vec_id AS b,
         CAST(floor(1000000 * list_dot_product(na.v, nb.v)
                    / (na.nrm * nb.nrm)) AS BIGINT) AS s
  FROM mmr_cand a JOIN mmr_cand b ON a.vec_id <> b.vec_id
  JOIN normed na ON na.vec_id = a.vec_id
  JOIN normed nb ON nb.vec_id = b.vec_id)""", f"""
pick1 AS MATERIALIZED (
  SELECT 1 AS pick_rank, vec_id, rel AS rel_micro6,
         CAST(0 AS BIGINT) AS maxsim_micro6,
         CAST({lam_pct} * rel AS BIGINT) AS mmr_score
  FROM mmr_cand ORDER BY rel DESC, vec_id LIMIT 1)"""]
    for r in range(2, k + 1):
        sel = " UNION ALL ".join(
            f"SELECT vec_id FROM pick{i}" for i in range(1, r))
        blocks.append(f"""
pick{r} AS MATERIALIZED (
  SELECT {r} AS pick_rank, c.vec_id, c.rel AS rel_micro6,
         m.maxsim AS maxsim_micro6,
         CAST({lam_pct} * c.rel - {mu} * m.maxsim AS BIGINT)
           AS mmr_score
  FROM mmr_cand c JOIN (
    SELECT s.a AS vec_id, MAX(s.s) AS maxsim FROM mmr_sim s
    WHERE s.b IN ({sel}) GROUP BY s.a) m ON m.vec_id = c.vec_id
  WHERE c.vec_id NOT IN ({sel})
  ORDER BY mmr_score DESC, c.vec_id LIMIT 1)""")
    union = "\nUNION ALL\n".join(
        f"SELECT * FROM pick{i}" for i in range(1, k + 1))
    return ",".join(blocks) + "\n" + union


ORACLE["mmr_rerank"] = _assemble(
    SIM_CTES.lstrip(",").strip(), _mmr_sql(10, 50, 70, 0),
    select="")


# ---------------------------------------------------------------------------
# Continuation batch 105: BPE merge training — the k greedy
# most-frequent-pair rounds unrolled as chained MATERIALIZED CTEs
# over the same paren-delimited symbol strings the Spark operator
# carries (functions/textstats.bpe_merges).

def _bpe_blocks(n_merges: int) -> list:
    blocks = [r"""
bpe_voc AS MATERIALIZED (
  SELECT tok, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM (SELECT unnest(list_filter(string_split_regex(text, '[\n \t]'),
                      x -> x <> '')) AS tok
        FROM documents)
  GROUP BY tok),
bpe_w0 AS MATERIALIZED (
  SELECT cnt, regexp_replace(tok, '(.)', '(\1)', 'g') || '(</w>)' AS s
  FROM bpe_voc)"""]
    for r in range(1, n_merges + 1):
        blocks.append(f"""
bpe_p{r} AS MATERIALIZED (
  SELECT p[1] AS lhs, p[2] AS rhs, CAST(SUM(cnt) AS BIGINT) AS c
  FROM (SELECT cnt,
               unnest(list_zip(syms[1:length(syms)-1],
                               syms[2:length(syms)])) AS p
        FROM (SELECT cnt,
                     string_split(substring(s, 2, length(s)-2),
                                  ')(') AS syms
              FROM bpe_w{r - 1})
        WHERE length(syms) >= 2)
  GROUP BY 1, 2),
bpe_m{r} AS MATERIALIZED (
  SELECT {r} AS merge_rank, lhs, rhs, c AS pair_count,
         lhs || rhs AS new_symbol
  FROM bpe_p{r} ORDER BY c DESC, lhs, rhs LIMIT 1),
bpe_w{r} AS MATERIALIZED (
  SELECT w.cnt,
         replace(w.s, '(' || m.lhs || ')(' || m.rhs || ')',
                 '(' || m.new_symbol || ')') AS s
  FROM bpe_w{r - 1} w, bpe_m{r} m)""")
    return blocks


def _bpe_sql(n_merges: int = 12) -> str:
    union = "\nUNION ALL\n".join(
        f"SELECT * FROM bpe_m{i}" for i in range(1, n_merges + 1))
    return "WITH " + ",".join(_bpe_blocks(n_merges)) + "\n" + union


ORACLE["bpe_merges"] = _bpe_sql(12)


# ---------------------------------------------------------------------------
# Continuation batch 106: BPE compression curve — per-round corpus
# token cost + distinct symbol count over the same chained merge CTEs
# (functions/textstats.bpe_compression).

def _bpe_comp_sql(n_merges: int = 12) -> str:
    stat = """
SELECT {r} AS merge_rank,
       CAST(COALESCE(SUM(cnt), 0) AS BIGINT) AS corpus_symbols,
       CAST(COUNT(DISTINCT sym) AS BIGINT) AS vocab_symbols
FROM (SELECT cnt,
             unnest(string_split(substring(s, 2, length(s)-2),
                                 ')(')) AS sym
      FROM bpe_w{r})"""
    union = "\nUNION ALL\n".join(
        stat.format(r=r) for r in range(0, n_merges + 1))
    return "WITH " + ",".join(_bpe_blocks(n_merges)) + "\n" + union


ORACLE["bpe_compression"] = _bpe_comp_sql(12)


# ---------------------------------------------------------------------------
# Continuation batch 107: Pettitt change-point test per event type —
# U_t via the rank recurrence (U_t - U_{t-1} = T - 2*(rank-1) -
# ties), exact integers, same zero-filled day grid as
# theil_sen_trend (operators/events.pettitt_change).

ORACLE["pettitt_change"] = """
WITH pt_day AS (
  SELECT CAST(epoch_us(ts) // 86400000000 AS INT) AS day_idx,
         event_type AS etype
  FROM events),
pt_spine AS (SELECT DISTINCT day_idx FROM pt_day),
pt_types AS (SELECT DISTINCT etype FROM pt_day),
pt_sparse AS (
  SELECT etype, day_idx, CAST(COUNT(*) AS BIGINT) AS r
  FROM pt_day GROUP BY 1, 2),
pt_grid AS (
  SELECT t.etype, s.day_idx, COALESCE(x.r, 0) AS r
  FROM pt_types t CROSS JOIN pt_spine s
  LEFT JOIN pt_sparse x USING (etype, day_idx)),
pt_v AS (
  SELECT etype, day_idx, r,
         COUNT(*) OVER (PARTITION BY etype) AS t_n,
         CAST(COUNT(*) OVER (PARTITION BY etype)
              - 2 * (RANK() OVER (PARTITION BY etype ORDER BY r) - 1)
              - COUNT(*) OVER (PARTITION BY etype, r)
           AS BIGINT) AS v
  FROM pt_grid),
pt_u AS (
  SELECT etype, day_idx, r, t_n,
         CAST(SUM(v) OVER (PARTITION BY etype ORDER BY day_idx
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS u_t,
         ROW_NUMBER() OVER (PARTITION BY etype
                            ORDER BY day_idx) AS t
  FROM pt_v),
pt_k AS (
  SELECT *,
         CAST(MAX(CASE WHEN t < t_n THEN ABS(u_t) END)
              OVER (PARTITION BY etype) AS BIGINT) AS k_stat
  FROM pt_u)
SELECT etype, day_idx, r, u_t,
       CAST(t_n AS BIGINT) AS n_days, k_stat,
       MIN(CASE WHEN t < t_n AND ABS(u_t) = k_stat
                THEN day_idx END) OVER (PARTITION BY etype)
         AS change_day
FROM pt_k
WHERE t_n >= 2"""


# ---------------------------------------------------------------------------
# Continuation batch 108: RAKE keyword extraction — corpus-level
# degree/frequency word scores over stopword-delimited candidate
# phrases, exact integer scaling (functions/textstats.rake_keywords).

ORACLE["rake_keywords"] = """
WITH rk_raw AS (
  SELECT doc_id, tok, raw_pos
  FROM (SELECT doc_id,
               unnest(string_split_regex(text, '[\\n \\t]')) AS tok,
               generate_subscripts(string_split_regex(text, '[\\n \\t]'), 1) AS raw_pos
        FROM documents)
  WHERE tok <> ''),
rk_toks AS (
  -- positions re-densified AFTER the empty-token filter so runs
  -- match Spark's filter-then-posexplode (consecutive separators
  -- must not split a phrase)
  SELECT doc_id, lower(tok) AS word,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY raw_pos) AS pos
  FROM rk_raw),
rk_words AS (
  SELECT doc_id, pos, word
  FROM rk_toks
  WHERE word NOT IN ('the', 'a', 'of', 'and', 'to', 'in')),
rk_runs AS (
  SELECT doc_id, pos, word,
         CAST(pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos)
              AS INT) AS grp
  FROM rk_words),
rk_occ AS (
  SELECT doc_id, grp,
         string_agg(word, ' ' ORDER BY pos) AS phrase,
         CAST(COUNT(*) AS INT) AS n_words
  FROM rk_runs GROUP BY doc_id, grp),
rk_wrows AS (
  SELECT r.doc_id, r.grp, r.word, o.phrase, o.n_words
  FROM rk_runs r JOIN rk_occ o USING (doc_id, grp)),
rk_wscore AS (
  SELECT word,
         CAST((1000 * SUM(n_words)) // COUNT(*) AS BIGINT)
           AS word_score_x1000
  FROM rk_wrows GROUP BY word),
rk_phr AS (
  SELECT w.doc_id, w.grp, w.phrase, w.n_words,
         CAST(SUM(s.word_score_x1000) AS BIGINT) AS score_x1000
  FROM rk_wrows w JOIN rk_wscore s USING (word)
  GROUP BY w.doc_id, w.grp, w.phrase, w.n_words),
rk_agg AS (
  SELECT phrase,
         CAST(MAX(n_words) AS INT) AS n_words,
         CAST(COUNT(*) AS BIGINT) AS occurrences,
         CAST(MAX(score_x1000) AS BIGINT) AS score_x1000
  FROM rk_phr GROUP BY phrase)
SELECT CAST(ROW_NUMBER() OVER (ORDER BY score_x1000 DESC,
            occurrences DESC, phrase) AS INT) AS rank,
       phrase, n_words, occurrences, score_x1000
FROM rk_agg
ORDER BY score_x1000 DESC, occurrences DESC, phrase
LIMIT 25"""


# ---------------------------------------------------------------------------
# Continuation batch 109: exact tie-aware ROC AUC of the LM quality
# score as an English detector — Mann-Whitney u2 over the score
# histogram, exact integers (functions/textstats.roc_auc).  Reuses
# the lm_quality statement verbatim as a nested subquery.

ORACLE["quality_auc"] = f"""
WITH qa_score AS MATERIALIZED ({ORACLE["lm_quality"]}),
qa AS (
  SELECT s.lm_score_micro6 AS score,
         CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS pos
  FROM qa_score s JOIN documents d USING (doc_id)),
qa_hist AS (
  SELECT score,
         CAST(SUM(pos) AS BIGINT) AS n_pos_s,
         CAST(COUNT(*) - SUM(pos) AS BIGINT) AS n_neg_s
  FROM qa GROUP BY 1),
qa_cum AS (
  SELECT n_pos_s, n_neg_s,
         COALESCE(SUM(n_neg_s) OVER (ORDER BY score
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS neg_below
  FROM qa_hist)
SELECT CAST(SUM(n_pos_s) AS BIGINT) AS n_pos,
       CAST(SUM(n_neg_s) AS BIGINT) AS n_neg,
       CAST(SUM(n_pos_s * (2 * neg_below + n_neg_s)) AS BIGINT) AS u2,
       CAST((1000000 * SUM(n_pos_s * (2 * neg_below + n_neg_s)))
            // (2 * SUM(n_pos_s) * SUM(n_neg_s)) AS BIGINT)
         AS auc_micro6
FROM qa_cum"""


# ---------------------------------------------------------------------------
# Continuation batch 110: Cohen's kappa for the language identifier —
# chance-corrected binary agreement, exact integers
# (functions/textstats.cohen_kappa).  Reuses the lang_id statement
# verbatim as a nested subquery.

ORACLE["langid_kappa"] = f"""
WITH ck_pred AS MATERIALIZED ({ORACLE["lang_id"]}),
ck AS (
  SELECT pred_lang AS a,
         CASE WHEN lang = 'en' THEN 'en' ELSE 'unk' END AS b
  FROM ck_pred),
ck_conf AS (
  SELECT a, b, CAST(COUNT(*) AS BIGINT) AS c
  FROM ck GROUP BY 1, 2),
ck_ra AS (SELECT a, SUM(c) AS ra FROM ck_conf GROUP BY 1),
ck_sb AS (SELECT b, SUM(c) AS sb FROM ck_conf GROUP BY 1),
ck_pe AS (
  SELECT CAST(COALESCE(SUM(ra * sb), 0) AS BIGINT) AS pe_num
  FROM ck_ra JOIN ck_sb ON ck_ra.a = ck_sb.b),
ck_tot AS (
  SELECT CAST(SUM(c) AS BIGINT) AS n_items,
         CAST(SUM(CASE WHEN a = b THEN c ELSE 0 END) AS BIGINT)
           AS n_agree
  FROM ck_conf)
SELECT n_items, n_agree, pe_num,
       CAST(CASE WHEN n_items * n_items = pe_num THEN 1000000
            ELSE (1000000 * (n_items * n_agree - pe_num))
                 // (n_items * n_items - pe_num) END AS BIGINT)
         AS kappa_micro6
FROM ck_tot, ck_pe"""


# ---------------------------------------------------------------------------
# Continuation batch 111: 1D hash edge-cut vs 2D grid vertex-cut
# partitioning audit over the co-mention graph — balance + vertex
# replication factor per strategy, md5-nibble hash (the feat_u16
# device) so both engines agree
# (operators/graph_algos.partition_replication).


def _md5_h16(expr: str) -> str:
    """First 4 hex nibbles of md5(expr) as an integer 0..65535 —
    DuckDB replica of Spark's conv(substring(md5(x),1,4),16,10)."""
    nib = ("(instr('0123456789abcdef', substr(md5({e}), {i}, 1)) - 1)"
           .format)
    return ("(4096 * {0} + 256 * {1} + 16 * {2} + {3})".format(
        nib(e=expr, i=1), nib(e=expr, i=2),
        nib(e=expr, i=3), nib(e=expr, i=4)))


_PR_CTES = f"""
pr_e1 AS MATERIALIZED (
  SELECT CAST({_md5_h16('src')} % 9 AS INT) AS part, src, dst
  FROM comention),
pr_e2 AS MATERIALIZED (
  SELECT CAST(({_md5_h16('src')} % 3) * 3 + ({_md5_h16('dst')} % 3)
              AS INT) AS part, src, dst
  FROM comention),
pr_bal1 AS (
  SELECT CAST(SUM(c) AS BIGINT) AS n_edges,
         CAST(MAX(c) AS BIGINT) AS max_part_edges
  FROM (SELECT part, COUNT(*) AS c FROM pr_e1 GROUP BY 1)),
pr_rep1 AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes,
         CAST(SUM(k) AS BIGINT) AS replicas
  FROM (SELECT node, COUNT(*) AS k
        FROM (SELECT DISTINCT part, src AS node FROM pr_e1
              UNION
              SELECT DISTINCT part, dst AS node FROM pr_e1)
        GROUP BY 1)),
pr_bal2 AS (
  SELECT CAST(SUM(c) AS BIGINT) AS n_edges,
         CAST(MAX(c) AS BIGINT) AS max_part_edges
  FROM (SELECT part, COUNT(*) AS c FROM pr_e2 GROUP BY 1)),
pr_rep2 AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes,
         CAST(SUM(k) AS BIGINT) AS replicas
  FROM (SELECT node, COUNT(*) AS k
        FROM (SELECT DISTINCT part, src AS node FROM pr_e2
              UNION
              SELECT DISTINCT part, dst AS node FROM pr_e2)
        GROUP BY 1))"""

ORACLE["partition_replication"] = _q("""
SELECT 'hash_1d_src' AS strategy, 9 AS n_partitions, n_edges,
       max_part_edges,
       CAST((1000000 * max_part_edges * 9) // n_edges AS BIGINT)
         AS balance_micro6,
       n_nodes, replicas,
       CAST((1000000 * replicas) // n_nodes AS BIGINT)
         AS replication_micro6
FROM pr_bal1, pr_rep1
UNION ALL
SELECT 'grid_2d', 9, n_edges, max_part_edges,
       CAST((1000000 * max_part_edges * 9) // n_edges AS BIGINT),
       n_nodes, replicas,
       CAST((1000000 * replicas) // n_nodes AS BIGINT)
FROM pr_bal2, pr_rep2""",
    LINK_CTES, COMENTION_CTES.strip(), _PR_CTES.strip())


# ---------------------------------------------------------------------------
# Continuation batch 112: isotonic (PAVA) calibration of the quality
# reliability curve — minimax closed form over interval means,
# floor-quantized micro6 (functions/textstats.isotonic_fit).  Reuses
# the quality_calibration statement verbatim as a nested subquery.

ORACLE["isotonic_calibration"] = f"""
WITH iso_b AS MATERIALIZED ({ORACLE["quality_calibration"]}),
iso_c AS MATERIALIZED (
  SELECT bucket, n_docs, n_keep, keep_rate_micro6,
         SUM(n_docs) OVER (ORDER BY bucket
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
         SUM(n_keep) OVER (ORDER BY bucket
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cy
  FROM iso_b),
iso_iv AS (
  SELECT j.bucket AS bj, k.bucket AS bk,
         CAST((1000000 * (k.cy - (j.cy - j.n_keep)))
              // (k.cw - (j.cw - j.n_docs)) AS BIGINT) AS a
  FROM iso_c j JOIN iso_c k ON j.bucket <= k.bucket),
iso_tri AS (
  SELECT i.bucket AS bi, v.bj, MIN(v.a) AS m
  FROM iso_iv v JOIN iso_c i
    ON v.bj <= i.bucket AND i.bucket <= v.bk
  GROUP BY 1, 2),
iso_fit AS (
  SELECT bi AS bucket, CAST(MAX(m) AS BIGINT) AS iso_micro6
  FROM iso_tri GROUP BY 1)
SELECT b.bucket, b.n_docs, b.n_keep, b.keep_rate_micro6,
       f.iso_micro6
FROM iso_b b JOIN iso_fit f USING (bucket)"""


# ---------------------------------------------------------------------------
# Continuation batch 113: Kendall ranker concordance (tau-a + gamma,
# exact pair counts) between BM25 and the raw-tf ordering per probe
# term (functions/textstats.ranker_tau).  Reuses the bm25_entities
# statement verbatim as a nested subquery.

ORACLE["ranker_tau"] = f"""
WITH rt_r AS MATERIALIZED ({ORACLE["bm25_entities"]}),
rt_p AS (
  SELECT a.term,
         (CASE WHEN a.score_micro6 > b.score_micro6 THEN 1
               WHEN a.score_micro6 < b.score_micro6 THEN -1
               ELSE 0 END)
       * (CASE WHEN a.tf > b.tf THEN 1
               WHEN a.tf < b.tf THEN -1 ELSE 0 END) AS prod,
         CASE WHEN a.score_micro6 = b.score_micro6 THEN 1 ELSE 0 END
           AS tx,
         CASE WHEN a.tf = b.tf THEN 1 ELSE 0 END AS ty
  FROM rt_r a JOIN rt_r b
    ON a.term = b.term AND a.doc_id < b.doc_id),
rt_n AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS n_items
  FROM rt_r GROUP BY 1),
rt_a AS (
  SELECT term,
         CAST(COUNT(*) AS BIGINT) AS n_pairs,
         CAST(SUM(CASE WHEN prod = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS concordant,
         CAST(SUM(CASE WHEN prod = -1 THEN 1 ELSE 0 END) AS BIGINT)
           AS discordant,
         CAST(SUM(tx * (1 - ty)) AS BIGINT) AS ties_x,
         CAST(SUM(ty * (1 - tx)) AS BIGINT) AS ties_y,
         CAST(SUM(tx * ty) AS BIGINT) AS ties_both
  FROM rt_p GROUP BY 1)
SELECT n.term, n.n_items, a.n_pairs, a.concordant, a.discordant,
       a.ties_x, a.ties_y, a.ties_both,
       CAST((1000000 * (a.concordant - a.discordant)) // a.n_pairs
         AS BIGINT) AS tau_a_micro6,
       CAST(CASE WHEN a.concordant + a.discordant = 0 THEN 0
            ELSE (1000000 * (a.concordant - a.discordant))
                 // (a.concordant + a.discordant) END AS BIGINT)
         AS gamma_micro6
FROM rt_n n JOIN rt_a a USING (term)"""


# ---------------------------------------------------------------------------
# Continuation batch 114: Good-Turing frequency-of-frequencies table
# over unigram type counts, GT-discounted c* in exact integers
# (functions/textstats.good_turing).

ORACLE["good_turing"] = """
WITH gt_toks AS (
  SELECT doc_id, tok,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS p
  FROM (SELECT doc_id,
               unnest(string_split_regex(text, '[\\n \\t]')) AS tok,
               generate_subscripts(string_split_regex(text,
                   '[\\n \\t]'), 1) AS pos
        FROM documents)
  WHERE tok <> ''),
gt_grams AS (
  -- token trigrams; string concat with a NULL lead nulls the gram,
  -- which the WHERE drops (docs shorter than 3 tokens yield none)
  SELECT tok || ' ' || LEAD(tok, 1) OVER w || ' ' || LEAD(tok, 2)
           OVER w AS gram
  FROM gt_toks
  WINDOW w AS (PARTITION BY doc_id ORDER BY p)),
gt_counts AS (
  SELECT gram, CAST(COUNT(*) AS BIGINT) AS c
  FROM gt_grams WHERE gram IS NOT NULL
  GROUP BY 1),
gt_nc AS (
  SELECT c, CAST(COUNT(*) AS BIGINT) AS n_types
  FROM gt_counts WHERE c <= 21 GROUP BY 1)
SELECT a.c, a.n_types,
       CAST(a.c * a.n_types AS BIGINT) AS mass,
       CAST(CASE WHEN b.n_types IS NULL THEN 0 ELSE
            (1000000 * (a.c + 1) * b.n_types) // a.n_types END
         AS BIGINT) AS c_star_micro6
FROM gt_nc a LEFT JOIN gt_nc b ON b.c = a.c + 1
WHERE a.c <= 20"""


# ---------------------------------------------------------------------------
# Continuation batch 115: Zipf rank-doubling ratio curve over the
# trigram vocabulary — exact integer f(r)/f(2r) at power-of-two
# ranks (functions/textstats.zipf_doubling).

ORACLE["zipf_doubling"] = """
WITH zd_toks AS (
  SELECT doc_id, tok,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS p
  FROM (SELECT doc_id,
               unnest(string_split_regex(text, '[\\n \\t]')) AS tok,
               generate_subscripts(string_split_regex(text,
                   '[\\n \\t]'), 1) AS pos
        FROM documents)
  WHERE tok <> ''),
zd_grams AS (
  SELECT tok || ' ' || LEAD(tok, 1) OVER w || ' ' || LEAD(tok, 2)
           OVER w AS gram
  FROM zd_toks
  WINDOW w AS (PARTITION BY doc_id ORDER BY p)),
zd_counts AS (
  SELECT gram, CAST(COUNT(*) AS BIGINT) AS freq
  FROM zd_grams WHERE gram IS NOT NULL GROUP BY 1),
zd_ranked AS (
  SELECT freq,
         ROW_NUMBER() OVER (ORDER BY freq DESC, gram) AS r
  FROM zd_counts)
SELECT CAST(a.r AS BIGINT) AS rank, a.freq AS freq_r,
       b.freq AS freq_2r,
       CAST((1000000 * a.freq) // b.freq AS BIGINT) AS ratio_micro6
FROM zd_ranked a JOIN zd_ranked b ON b.r = 2 * a.r
WHERE a.r IN (1, 2, 4, 8, 16, 32, 64, 128, 256)"""


# ---------------------------------------------------------------------------
# Continuation batch 116: per-event-type inter-arrival gap stats —
# exact integer microseconds, lower nearest-rank percentiles
# (operators/events.interarrival_stats).

ORACLE["interarrival_stats"] = """
WITH ia_t AS (
  SELECT event_type AS etype,
         epoch_us(ts) AS us, event_id AS eid
  FROM events),
ia_g AS (
  SELECT etype, us, eid,
         us - LAG(us) OVER (PARTITION BY etype ORDER BY us, eid)
           AS gap
  FROM ia_t),
ia_r AS (
  SELECT etype, gap,
         ROW_NUMBER() OVER (PARTITION BY etype
             ORDER BY gap, us, eid) - 1 AS rn,
         COUNT(*) OVER (PARTITION BY etype) AS cnt
  FROM ia_g WHERE gap IS NOT NULL)
SELECT etype,
       CAST(COUNT(*) AS BIGINT) AS n_gaps,
       CAST(SUM(gap) // COUNT(*) AS BIGINT) AS mean_us,
       CAST(MAX(CASE WHEN rn = ((cnt - 1) * 50) // 100 THEN gap END)
         AS BIGINT) AS p50_us,
       CAST(MAX(CASE WHEN rn = ((cnt - 1) * 90) // 100 THEN gap END)
         AS BIGINT) AS p90_us,
       CAST(MAX(gap) AS BIGINT) AS max_us
FROM ia_r GROUP BY 1"""


# ---------------------------------------------------------------------------
# Continuation batch 117: Pareto/ABC host-concentration curve —
# smallest top-host set covering each threshold, exact integer test
# (functions/textstats.host_pareto).

ORACLE["host_pareto"] = """
WITH hp_h AS (
  SELECT source AS host, CAST(COUNT(*) AS BIGINT) AS n_docs
  FROM documents GROUP BY 1),
hp_r AS (
  SELECT host, n_docs,
         ROW_NUMBER() OVER (ORDER BY n_docs DESC, host) AS rank,
         SUM(n_docs) OVER (ORDER BY n_docs DESC, host
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum,
         SUM(n_docs) OVER () AS total
  FROM hp_h),
hp_f AS (
  SELECT rank, cum, total,
         unnest([50, 80, 90, 95, 99]) AS threshold_pct
  FROM hp_r),
hp_hit AS (
  SELECT threshold_pct, MIN(rank) AS n_hosts
  FROM hp_f
  WHERE 100 * cum >= threshold_pct * total
  GROUP BY 1)
SELECT CAST(h.threshold_pct AS INT) AS threshold_pct,
       CAST(h.n_hosts AS BIGINT) AS n_hosts,
       r.cum AS covered_docs,
       r.total AS total_docs,
       CAST((1000000 * r.cum) // r.total AS BIGINT) AS share_micro6
FROM hp_hit h JOIN hp_r r ON r.rank = h.n_hosts"""


# ---------------------------------------------------------------------------
# Continuation batch 118: SALSA authority scores via the component-
# weighted stationary closed form — in-degree within authority-chain
# components over the bipartite star graph
# (operators/graph_algos.salsa_scores).  Reuses PREC_CTES' edge
# construction like the cocitation oracle.

ORACLE["salsa_scores"] = _q("""
SELECT a.node, a.in_deg, a.component, c.comp_in_w,
       (SELECT k FROM sa_k) AS n_components,
       CAST((1000000000 * a.in_deg)
            // ((SELECT k FROM sa_k) * c.comp_in_w) AS BIGINT)
         AS salsa_nano
FROM sa_auth a JOIN sa_cw c USING (component)""",
    LINK_CTES, _PREC_EDGE_CTES,
    """
sa_in AS MATERIALIZED (
  SELECT dst AS node, CAST(COUNT(*) AS BIGINT) AS in_deg
  FROM prec_edges GROUP BY 1),
sa_be AS MATERIALIZED (
  SELECT DISTINCT 'h::' || src AS src, 'a::' || dst AS dst
  FROM prec_edges),
sa_sym AS (SELECT src, dst FROM sa_be
           UNION SELECT dst AS src, src AS dst FROM sa_be),
sa_nodes AS MATERIALIZED (
  SELECT DISTINCT node FROM (
    SELECT src AS node FROM sa_be
    UNION ALL SELECT dst FROM sa_be)),
sa_reach(node, comp) AS (
  SELECT node, node AS comp FROM sa_nodes
  UNION
  SELECT e.dst AS node, r.comp
  FROM sa_reach r JOIN sa_sym e ON e.src = r.node),
sa_comp AS MATERIALIZED (
  SELECT node, MIN(comp) AS comp FROM sa_reach GROUP BY node),
sa_auth AS MATERIALIZED (
  SELECT substr(c.node, 4) AS node, i.in_deg,
         substr(c.comp, 4) AS component
  FROM sa_comp c JOIN sa_in i ON substr(c.node, 4) = i.node
  WHERE c.node LIKE 'a::%'),
sa_cw AS MATERIALIZED (
  SELECT component, CAST(SUM(in_deg) AS BIGINT) AS comp_in_w
  FROM sa_auth GROUP BY 1),
sa_k AS MATERIALIZED (
  SELECT CAST(COUNT(*) AS BIGINT) AS k FROM sa_cw)""")


# ---------------------------------------------------------------------------
# Continuation batch 119: Fano factor (index of dispersion) of daily
# counts per event type over the zero-filled day grid — exact
# integers via n*S2 - S1^2 (operators/events.fano_factor).

ORACLE["fano_factor"] = """
WITH ff_day AS (
  SELECT CAST(epoch_us(ts) // 86400000000 AS INT) AS day_idx,
         event_type AS etype
  FROM events),
ff_spine AS (SELECT DISTINCT day_idx FROM ff_day),
ff_types AS (SELECT DISTINCT etype FROM ff_day),
ff_sparse AS (
  SELECT etype, day_idx, CAST(COUNT(*) AS BIGINT) AS r
  FROM ff_day GROUP BY 1, 2),
ff_grid AS (
  SELECT t.etype, s.day_idx, COALESCE(x.r, 0) AS r
  FROM ff_types t CROSS JOIN ff_spine s
  LEFT JOIN ff_sparse x USING (etype, day_idx))
SELECT etype,
       CAST(COUNT(*) AS BIGINT) AS n_days,
       CAST(SUM(r) AS BIGINT) AS total,
       CAST((1000000 * (COUNT(*) * SUM(r * r) - SUM(r) * SUM(r)))
            // (COUNT(*) * SUM(r)) AS BIGINT) AS fano_micro6
FROM ff_grid GROUP BY 1
HAVING SUM(r) > 0"""


# ---------------------------------------------------------------------------
# Continuation batch 120: next-event transition Gini impurity per
# predecessor type within gap sessions — exact integers, modal
# successor ties break to the LARGEST next_type (struct-max rule)
# (operators/events.transition_gini).

ORACLE["transition_gini"] = """
WITH tg_s0 AS (
  SELECT user_id, event_id, ts, event_type,
         CASE WHEN lag_ts IS NULL
              OR (epoch_us(ts) // 1000000)
                 - (epoch_us(lag_ts) // 1000000) > 1800
              THEN 1 ELSE 0 END AS new_sess
  FROM (SELECT user_id, event_id, ts, event_type,
               LAG(ts) OVER (PARTITION BY user_id
                             ORDER BY ts, event_id) AS lag_ts
        FROM events)),
tg_s1 AS MATERIALIZED (
  SELECT *, SUM(new_sess) OVER (
      PARTITION BY user_id ORDER BY ts, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM tg_s0),
tg_tr AS (
  SELECT event_type AS prev_type,
         LEAD(event_type) OVER (PARTITION BY user_id, session_id
             ORDER BY ts, event_id) AS next_type
  FROM tg_s1),
tg_conf AS (
  SELECT prev_type, next_type, CAST(COUNT(*) AS BIGINT) AS c
  FROM tg_tr WHERE next_type IS NOT NULL GROUP BY 1, 2),
tg_top AS (
  SELECT prev_type, next_type AS top_next, c AS top_c
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY prev_type
            ORDER BY c DESC, next_type DESC) AS rn
        FROM tg_conf)
  WHERE rn = 1),
tg_a AS (
  SELECT prev_type,
         CAST(SUM(c) AS BIGINT) AS n_transitions,
         CAST(COUNT(*) AS BIGINT) AS n_successors,
         CAST(SUM(c * c) AS BIGINT) AS c2
  FROM tg_conf GROUP BY 1)
SELECT a.prev_type, a.n_transitions, a.n_successors, t.top_next,
       CAST((1000000 * t.top_c) // a.n_transitions AS BIGINT)
         AS top_share_micro6,
       CAST((1000000 * (a.n_transitions * a.n_transitions - a.c2))
            // (a.n_transitions * a.n_transitions) AS BIGINT)
         AS gini_micro6
FROM tg_a a JOIN tg_top t USING (prev_type)"""


# ---------------------------------------------------------------------------
# Continuation batch 121: Mann-Kendall monotone-trend test per event
# type — exact S over day pairs + tie-corrected variance numerator
# var18 (operators/events.mann_kendall).

ORACLE["mann_kendall"] = """
WITH mk_day AS (
  SELECT CAST(epoch_us(ts) // 86400000000 AS INT) AS day_idx,
         event_type AS etype
  FROM events),
mk_spine AS (SELECT DISTINCT day_idx FROM mk_day),
mk_types AS (SELECT DISTINCT etype FROM mk_day),
mk_sparse AS (
  SELECT etype, day_idx, CAST(COUNT(*) AS BIGINT) AS r
  FROM mk_day GROUP BY 1, 2),
mk_grid AS MATERIALIZED (
  SELECT t.etype, s.day_idx, COALESCE(x.r, 0) AS r
  FROM mk_types t CROSS JOIN mk_spine s
  LEFT JOIN mk_sparse x USING (etype, day_idx)),
mk_s AS (
  SELECT a.etype,
         CAST(SUM(CASE WHEN b.r > a.r THEN 1
                       WHEN b.r < a.r THEN -1 ELSE 0 END) AS BIGINT)
           AS s_stat
  FROM mk_grid a JOIN mk_grid b
    ON a.etype = b.etype AND b.day_idx > a.day_idx
  GROUP BY 1),
mk_t AS (
  SELECT etype,
         CAST(COUNT(*) AS BIGINT) AS n_tie_groups,
         CAST(SUM(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie_sum
  FROM (SELECT etype, r, CAST(COUNT(*) AS BIGINT) AS t
        FROM mk_grid GROUP BY 1, 2)
  GROUP BY 1),
mk_n AS (
  SELECT etype, CAST(COUNT(*) AS BIGINT) AS n_days
  FROM mk_grid GROUP BY 1)
SELECT n.etype, n.n_days, s.s_stat,
       CAST(n.n_days * (n.n_days - 1) * (2 * n.n_days + 5)
            - t.tie_sum AS BIGINT) AS var18,
       t.n_tie_groups
FROM mk_n n JOIN mk_s s USING (etype) JOIN mk_t t USING (etype)"""


# ---------------------------------------------------------------------------
# Continuation batch 122: bipartiteness / odd-cycle census per
# component — bounded min-label BFS (8 hops, matching the Spark
# round count), parity-violation edge count
# (operators/graph_algos.bipartite_check).

ORACLE["bipartite_check"] = _q("""
SELECT n.comp AS component, n.n_nodes, e.n_edges, e.n_violations,
       CAST(CASE WHEN e.n_violations = 0 THEN 1 ELSE 0 END AS INT)
         AS is_bipartite
FROM bp_nn n JOIN bp_ev e USING (comp)""",
    LINK_CTES, COMENTION_CTES.strip(), """
bp_und AS MATERIALIZED (
  SELECT src AS a, dst AS b FROM comention WHERE src <> dst),
bp_sym AS (SELECT a AS src, b AS dst FROM bp_und
           UNION SELECT b AS src, a AS dst FROM bp_und),
bp_reach(node, comp, dist) AS (
  SELECT DISTINCT src AS node, src AS comp, 0 AS dist FROM bp_sym
  UNION
  SELECT e.dst AS node, r.comp, r.dist + 1
  FROM bp_reach r JOIN bp_sym e ON e.src = r.node
  WHERE r.dist < 8),
bp_min AS MATERIALIZED (
  SELECT node, MIN(comp) AS comp FROM bp_reach GROUP BY 1),
bp_state AS MATERIALIZED (
  SELECT r.node, r.comp, CAST(MIN(r.dist) AS INT) AS dist
  FROM bp_reach r JOIN bp_min m
    ON r.node = m.node AND r.comp = m.comp
  GROUP BY 1, 2),
bp_ev AS (
  SELECT sa.comp,
         CAST(COUNT(*) AS BIGINT) AS n_edges,
         CAST(SUM(CASE WHEN (sa.dist + sb.dist) % 2 = 0
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_violations
  FROM bp_und u
  JOIN bp_state sa ON sa.node = u.a
  JOIN bp_state sb ON sb.node = u.b AND sb.comp = sa.comp
  GROUP BY 1),
bp_nn AS (
  SELECT comp, CAST(COUNT(*) AS BIGINT) AS n_nodes
  FROM bp_state GROUP BY 1)""")


# ---------------------------------------------------------------------------
# Continuation batch 123: k-anonymity audit over (host, lang,
# length-decile) quasi-identifiers — exact equivalence-class sizes
# (functions/textstats.k_anonymity).

ORACLE["k_anonymity"] = """
WITH ka_n AS (
  SELECT doc_id, source AS host, lang,
         CAST(len(list_filter(string_split_regex(text, '[\\n \\t]'),
             x -> x <> '')) AS BIGINT) AS n
  FROM documents),
ka_vals AS (
  SELECT n,
         CAST((COALESCE(SUM(c) OVER (ORDER BY n
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               * 10) // SUM(c) OVER () AS INT) AS bucket
  FROM (SELECT n, CAST(COUNT(*) AS BIGINT) AS c
        FROM ka_n GROUP BY 1)),
ka_cls AS (
  SELECT d.host, d.lang, v.bucket,
         CAST(COUNT(*) AS BIGINT) AS size
  FROM ka_n d JOIN ka_vals v USING (n)
  GROUP BY 1, 2, 3),
ka_fan AS (
  SELECT size, unnest([2, 5, 10]) AS k FROM ka_cls)
SELECT CAST(k AS INT) AS k,
       CAST(COUNT(*) AS BIGINT) AS n_classes,
       CAST(SUM(CASE WHEN size < k THEN 1 ELSE 0 END) AS BIGINT)
         AS n_violating_classes,
       CAST(SUM(CASE WHEN size < k THEN size ELSE 0 END) AS BIGINT)
         AS n_exposed_docs,
       CAST((1000000 * SUM(CASE WHEN size < k THEN size ELSE 0 END))
            // SUM(size) AS BIGINT) AS exposed_share_micro6
FROM ka_fan GROUP BY 1"""


# ---------------------------------------------------------------------------
# Continuation batch 124: symmetric-relation detection — per-pred
# reciprocity 2*mutual/edges over the distinct case-folded entity
# pair graph (operators/triples.pred_reciprocity).

ORACLE["pred_reciprocity"] = _q("""
SELECT n.pred, n.n_edges,
       CAST(COALESCE(m.n_mutual_pairs, 0) AS BIGINT)
         AS n_mutual_pairs,
       CAST((2000000 * COALESCE(m.n_mutual_pairs, 0)) // n.n_edges
         AS BIGINT) AS reciprocity_micro6
FROM pr2_n n LEFT JOIN pr2_m m USING (pred)""", """
pr2_e AS MATERIALIZED (
  SELECT DISTINCT pred, lower(subj) AS a, lower(obj) AS b
  FROM triples WHERE lower(subj) <> lower(obj)),
pr2_m AS (
  SELECT x.pred, CAST(COUNT(*) AS BIGINT) AS n_mutual_pairs
  FROM pr2_e x JOIN pr2_e y
    ON x.pred = y.pred AND x.a = y.b AND x.b = y.a
  WHERE x.a < x.b GROUP BY 1),
pr2_n AS (
  SELECT pred, CAST(COUNT(*) AS BIGINT) AS n_edges
  FROM pr2_e GROUP BY 1)""")


# ---------------------------------------------------------------------------
# Continuation batch 125: tokenizer fertility per language — exact
# sub-token/word and char/sub-token ratios
# (functions/textstats.token_fertility).

ORACLE["token_fertility"] = """
WITH tf2_per AS (
  SELECT lang,
         CAST(len(list_filter(string_split_regex(text, '[\\n \\t]'),
             x -> x <> '')) AS BIGINT) AS w,
         CAST(len(regexp_extract_all(text, '[0-9A-Za-z]+'))
              + len(regexp_extract_all(text, '[^0-9A-Za-z \\n\\t]'))
           AS BIGINT) AS t,
         CAST(length(text) AS BIGINT) AS c
  FROM documents)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(w) AS BIGINT) AS n_words,
       CAST(SUM(t) AS BIGINT) AS n_subtokens,
       CAST(SUM(c) AS BIGINT) AS n_chars,
       CAST((1000000 * SUM(t)) // SUM(w) AS BIGINT)
         AS fertility_micro6,
       CAST(CASE WHEN SUM(t) = 0 THEN 0 ELSE
            (1000000 * SUM(c)) // SUM(t) END AS BIGINT)
         AS chars_per_token_micro6
FROM tf2_per GROUP BY 1
HAVING SUM(w) > 0"""


# ---------------------------------------------------------------------------
# Continuation batch 126: daily-count autocorrelation per event type
# at lags 1/2/7 — mean cleared by n-scaling so every intermediate is
# BIGINT (operators/events.autocorrelation).

ORACLE["autocorrelation"] = """
WITH ac_day AS (
  SELECT CAST(epoch_us(ts) // 86400000000 AS INT) AS day_idx,
         event_type AS etype
  FROM events),
ac_spine AS (SELECT DISTINCT day_idx FROM ac_day),
ac_types AS (SELECT DISTINCT etype FROM ac_day),
ac_sparse AS (
  SELECT etype, day_idx, CAST(COUNT(*) AS BIGINT) AS r
  FROM ac_day GROUP BY 1, 2),
ac_grid AS MATERIALIZED (
  SELECT t.etype, s.day_idx, COALESCE(x.r, 0) AS r
  FROM ac_types t CROSS JOIN ac_spine s
  LEFT JOIN ac_sparse x USING (etype, day_idx)),
ac_stats AS (
  SELECT etype, CAST(COUNT(*) AS BIGINT) AS n_days,
         CAST(SUM(r) AS BIGINT) AS s
  FROM ac_grid GROUP BY 1),
ac_c AS MATERIALIZED (
  SELECT g.etype, g.day_idx, st.n_days,
         CAST(st.n_days * g.r - st.s AS BIGINT) AS c
  FROM ac_grid g JOIN ac_stats st USING (etype)),
ac_fan AS (
  SELECT etype, day_idx, n_days, c,
         unnest([1, 2, 7]) AS lag
  FROM ac_c),
ac_num AS (
  SELECT f.etype, f.lag,
         CAST(SUM(f.c * j.c) AS BIGINT) AS num
  FROM ac_fan f JOIN ac_c j
    ON j.etype = f.etype AND j.day_idx = f.day_idx + f.lag
  GROUP BY 1, 2),
ac_den AS (
  SELECT etype, CAST(SUM(c * c) AS BIGINT) AS den
  FROM ac_c GROUP BY 1)
SELECT n.etype, CAST(n.lag AS INT) AS lag, st.n_days, n.num, d.den,
       CAST((1000000 * n.num) // d.den AS BIGINT) AS acf_micro6
FROM ac_num n
JOIN ac_den d USING (etype)
JOIN ac_stats st USING (etype)
WHERE d.den > 0"""


# ---------------------------------------------------------------------------
# Continuation batch 127: count-sketch (signed) vs truth audit —
# column = first 2 nibbles of md5(row ':' item), sign = parity of
# nibble 3, median over 5 rows
# (functions/sketches.count_sketch_estimates).

ORACLE["count_sketch"] = """
WITH cs_ts AS (
  SELECT list_filter(string_split_regex(text, '[\\n \\t]'),
                     t -> t <> '') AS ts
  FROM documents),
cs_tok AS (
  SELECT ts[CAST(i AS INT)] AS item
  FROM cs_ts, unnest(generate_series(1, len(ts))) AS t(i)),
cs_vocab AS MATERIALIZED (
  SELECT item, CAST(COUNT(*) AS BIGINT) AS true_cnt
  FROM cs_tok GROUP BY 1),
cs_keyed AS MATERIALIZED (
  SELECT item, true_cnt, CAST(r AS INT) AS cs_row,
         CAST((strpos('0123456789abcdef', substring(_h, 1, 1)) - 1)
              * 16
            + (strpos('0123456789abcdef', substring(_h, 2, 1)) - 1)
           AS INT) AS cs_col,
         CAST(1 - 2 * ((strpos('0123456789abcdef',
                               substring(_h, 3, 1)) - 1) % 2)
           AS BIGINT) AS sign
  FROM (SELECT item, true_cnt, r,
               md5(CAST(r AS VARCHAR) || ':' || item) AS _h
        FROM cs_vocab, unnest(generate_series(0, 4)) AS g(r))),
cs_sketch AS MATERIALIZED (
  SELECT cs_row, cs_col,
         CAST(SUM(sign * true_cnt) AS BIGINT) AS cell
  FROM cs_keyed GROUP BY 1, 2),
cs_probed AS (
  SELECT k.item, k.true_cnt, k.sign * s.cell AS est
  FROM cs_keyed k JOIN cs_sketch s USING (cs_row, cs_col)),
cs_med AS (
  SELECT item, true_cnt, est,
         ROW_NUMBER() OVER (PARTITION BY item ORDER BY est) AS rn
  FROM cs_probed)
SELECT item, true_cnt, CAST(est AS BIGINT) AS est_cnt,
       CAST(ABS(est - true_cnt) AS BIGINT) AS abs_err
FROM cs_med WHERE rn = 3"""


# ---------------------------------------------------------------------------
# Continuation batch 128: split-balance audit — exact TVD of the
# lang distribution between train/dev/test splits
# (functions/textstats.split_balance).

ORACLE["split_balance"] = """
WITH sb_d AS (
  SELECT CASE WHEN bucket < 204 THEN 'train'
              WHEN bucket < 230 THEN 'dev' ELSE 'test' END AS split,
         lang AS v
  FROM (SELECT lang,
               CAST(16 * (instr('0123456789abcdef',
                        substr(md5(CAST(doc_id AS VARCHAR)), 31, 1))
                        - 1)
                  + (instr('0123456789abcdef',
                        substr(md5(CAST(doc_id AS VARCHAR)), 32, 1))
                        - 1) AS INT) AS bucket
        FROM documents)),
sb_cnt AS MATERIALIZED (
  SELECT split, v, CAST(COUNT(*) AS BIGINT) AS c
  FROM sb_d GROUP BY 1, 2),
sb_grid AS MATERIALIZED (
  SELECT s.split, x.v, COALESCE(c.c, 0) AS c
  FROM (SELECT DISTINCT split FROM sb_cnt) s
  CROSS JOIN (SELECT DISTINCT v FROM sb_cnt) x
  LEFT JOIN sb_cnt c USING (split, v)),
sb_tot AS (
  SELECT split, CAST(SUM(c) AS BIGINT) AS n
  FROM sb_cnt GROUP BY 1),
sb_g AS (
  SELECT g.split, g.v, g.c, t.n
  FROM sb_grid g JOIN sb_tot t USING (split))
SELECT a.split AS split_a, b.split AS split_b,
       CAST(COUNT(*) AS BIGINT) AS attr_values,
       CAST(MAX(a.n) AS BIGINT) AS n_a,
       CAST(MAX(b.n) AS BIGINT) AS n_b,
       CAST((1000000 * SUM(ABS(a.c * b.n - b.c * a.n)))
            // (2 * MAX(a.n) * MAX(b.n)) AS BIGINT) AS tvd_micro6
FROM sb_g a JOIN sb_g b ON a.v = b.v AND a.split < b.split
GROUP BY 1, 2"""


# ---------------------------------------------------------------------------
# Continuation batch 129: cumulative gains / lift curve of the LM
# quality score vs the curation gate — cumulated from the top score
# decile downward (functions/textstats.gains_curve).  Reuses the
# quality_calibration statement verbatim as a nested subquery.

ORACLE["gains_curve"] = f"""
WITH gc_b AS MATERIALIZED (
  SELECT bucket, n_docs, n_keep
  FROM ({ORACLE["quality_calibration"]})),
gc_c AS (
  SELECT bucket, n_docs, n_keep,
         CAST(SUM(n_docs) OVER (ORDER BY bucket DESC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS BIGINT) AS cum_docs,
         CAST(SUM(n_keep) OVER (ORDER BY bucket DESC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS BIGINT) AS cum_keeps,
         SUM(n_docs) OVER () AS td,
         SUM(n_keep) OVER () AS tk
  FROM gc_b)
SELECT bucket, n_docs, n_keep, cum_docs, cum_keeps,
       CAST((1000000 * cum_keeps) // tk AS BIGINT) AS gain_micro6,
       CAST((1000000 * cum_keeps * td) // (cum_docs * tk) AS BIGINT)
         AS lift_micro6
FROM gc_c"""


# ---------------------------------------------------------------------------
# Continuation batch 130: exact eccentricity / radius / diameter —
# bounded BFS closure (8 hops, matching the Spark rounds) over the
# co-mention graph (operators/graph_algos.graph_eccentricity).

ORACLE["graph_eccentricity"] = _q("""
SELECT s AS node, n_reached, ecc,
       MIN(ecc) OVER (PARTITION BY comp) AS radius,
       MAX(ecc) OVER (PARTITION BY comp) AS diameter,
       CAST(ecc = MIN(ecc) OVER (PARTITION BY comp) AS INT)
         AS is_center
FROM ge_ecc""",
    LINK_CTES, COMENTION_CTES.strip(), """
ge_und AS MATERIALIZED (
  SELECT src AS a, dst AS b FROM comention WHERE src <> dst),
ge_sym AS (SELECT a AS src, b AS dst FROM ge_und
           UNION SELECT b AS src, a AS dst FROM ge_und),
ge_reach(s, node, dist) AS (
  SELECT DISTINCT src AS s, src AS node, 0 AS dist FROM ge_sym
  UNION
  SELECT r.s, e.dst AS node, r.dist + 1
  FROM ge_reach r JOIN ge_sym e ON e.src = r.node
  WHERE r.dist < 8),
ge_pairs AS MATERIALIZED (
  SELECT s, node, CAST(MIN(dist) AS INT) AS dist
  FROM ge_reach GROUP BY 1, 2),
ge_ecc AS MATERIALIZED (
  SELECT s, CAST(COUNT(*) AS BIGINT) AS n_reached,
         CAST(MAX(dist) AS INT) AS ecc,
         MIN(node) AS comp
  FROM ge_pairs GROUP BY 1)""")


# ---------------------------------------------------------------------------
# Continuation batch 131: exact two-sample KS + Wasserstein-1 doc-
# length drift between splits (functions/textstats.doclen_drift).

ORACLE["doclen_drift"] = """
WITH dd_d AS (
  SELECT CASE WHEN bucket < 204 THEN 'train'
              WHEN bucket < 230 THEN 'dev' ELSE 'test' END AS split,
         x
  FROM (SELECT CAST(len(list_filter(string_split_regex(text,
                   '[\\n \\t]'), t -> t <> '')) AS BIGINT) AS x,
               CAST(16 * (instr('0123456789abcdef',
                        substr(md5(CAST(doc_id AS VARCHAR)), 31, 1))
                        - 1)
                  + (instr('0123456789abcdef',
                        substr(md5(CAST(doc_id AS VARCHAR)), 32, 1))
                        - 1) AS INT) AS bucket
        FROM documents)),
dd_cnt AS MATERIALIZED (
  SELECT split, x, CAST(COUNT(*) AS BIGINT) AS c
  FROM dd_d GROUP BY 1, 2),
dd_grid AS MATERIALIZED (
  SELECT s.split, v.x, COALESCE(c.c, 0) AS c
  FROM (SELECT DISTINCT split FROM dd_cnt) s
  CROSS JOIN (SELECT DISTINCT x FROM dd_cnt) v
  LEFT JOIN dd_cnt c USING (split, x)),
dd_g AS MATERIALIZED (
  SELECT split, x,
         CAST(SUM(c) OVER (PARTITION BY split ORDER BY x
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS BIGINT) AS cum,
         CAST(SUM(c) OVER (PARTITION BY split) AS BIGINT) AS n,
         CAST(COALESCE(LEAD(x) OVER (PARTITION BY split ORDER BY x)
                       - x, 0) AS BIGINT) AS gap
  FROM dd_grid)
SELECT a.split AS split_a, b.split AS split_b,
       CAST(MAX(a.n) AS BIGINT) AS n_a,
       CAST(MAX(b.n) AS BIGINT) AS n_b,
       CAST((1000000 * MAX(ABS(a.cum * b.n - b.cum * a.n)))
            // (MAX(a.n) * MAX(b.n)) AS BIGINT) AS ks_micro6,
       CAST((1000000 * SUM(ABS(a.cum * b.n - b.cum * a.n) * a.gap))
            // (MAX(a.n) * MAX(b.n)) AS BIGINT) AS w1_micro6
FROM dd_g a JOIN dd_g b ON a.x = b.x AND a.split < b.split
GROUP BY 1, 2"""


# ---------------------------------------------------------------------------
# Continuation batch 132: weekday-seasonality strength — one-way
# ANOVA share SSB/SST over weekday groups, means cleared by
# n-scaling (operators/events.weekday_seasonality).

ORACLE["weekday_seasonality"] = """
WITH ws_day AS (
  SELECT CAST(epoch_us(ts) // 86400000000 AS INT) AS day_idx,
         event_type AS etype
  FROM events),
ws_spine AS (SELECT DISTINCT day_idx FROM ws_day),
ws_types AS (SELECT DISTINCT etype FROM ws_day),
ws_sparse AS (
  SELECT etype, day_idx, CAST(COUNT(*) AS BIGINT) AS r
  FROM ws_day GROUP BY 1, 2),
ws_grid AS MATERIALIZED (
  SELECT t.etype, s.day_idx, CAST(s.day_idx % 7 AS INT) AS wd,
         COALESCE(x.r, 0) AS r
  FROM ws_types t CROSS JOIN ws_spine s
  LEFT JOIN ws_sparse x USING (etype, day_idx)),
ws_tot AS (
  SELECT etype, CAST(COUNT(*) AS BIGINT) AS n_days,
         CAST(SUM(r) AS BIGINT) AS s
  FROM ws_grid GROUP BY 1),
ws_g AS MATERIALIZED (
  SELECT g.etype, g.wd, g.r, t.n_days, t.s
  FROM ws_grid g JOIN ws_tot t USING (etype)),
ws_sst AS (
  SELECT etype,
         CAST(SUM((n_days * r - s) * (n_days * r - s)) AS BIGINT)
           AS sst_scaled
  FROM ws_g GROUP BY 1),
ws_grp AS (
  SELECT etype, wd, CAST(COUNT(*) AS BIGINT) AS ng,
         CAST(SUM(r) AS BIGINT) AS sg,
         MAX(n_days) AS n, MAX(s) AS stot
  FROM ws_g GROUP BY 1, 2),
ws_ssb AS (
  SELECT etype,
         CAST(SUM(((n * sg - ng * stot) * (n * sg - ng * stot))
                  // ng) AS BIGINT) AS ssb_scaled
  FROM ws_grp GROUP BY 1),
ws_peak AS (
  SELECT etype, CAST(wd AS INT) AS peak_weekday
  FROM (SELECT etype, wd,
               ROW_NUMBER() OVER (PARTITION BY etype
                   ORDER BY -((sg * 10080) // ng), wd) AS rn
        FROM ws_grp)
  WHERE rn = 1)
SELECT t.etype, t.n_days, b.ssb_scaled, s.sst_scaled,
       CAST((1000000 * b.ssb_scaled) // s.sst_scaled AS BIGINT)
         AS strength_micro6,
       p.peak_weekday
FROM ws_tot t
JOIN ws_sst s USING (etype)
JOIN ws_ssb b USING (etype)
JOIN ws_peak p USING (etype)
WHERE s.sst_scaled > 0"""


# ---------------------------------------------------------------------------
# Continuation batch 133: predicate transitivity — chain-closure
# rates per predicate (operators/triples.pred_transitivity).

ORACLE["pred_transitivity"] = _q("""
SELECT n.pred, n.n_edges, c.n_chains,
       CAST(COALESCE(cl.n_closed, 0) AS BIGINT) AS n_closed,
       CAST((1000000 * COALESCE(cl.n_closed, 0)) // c.n_chains
         AS BIGINT) AS closure_micro6
FROM pt2_n n
JOIN pt2_nc c USING (pred)
LEFT JOIN pt2_ncl cl USING (pred)""", LINK_CTES, _PREC_EDGE_CTES, """
pt2_e AS MATERIALIZED (
  SELECT DISTINCT 'precedes' AS pred, lower(src) AS a,
         lower(dst) AS b
  FROM prec_edges WHERE lower(src) <> lower(dst)),
pt2_chains AS MATERIALIZED (
  SELECT DISTINCT x.pred, x.a AS x1, y.b AS y2
  FROM pt2_e x JOIN pt2_e y ON x.pred = y.pred AND x.b = y.a
  WHERE x.a <> y.b),
pt2_n AS (
  SELECT pred, CAST(COUNT(*) AS BIGINT) AS n_edges
  FROM pt2_e GROUP BY 1),
pt2_nc AS (
  SELECT pred, CAST(COUNT(*) AS BIGINT) AS n_chains
  FROM pt2_chains GROUP BY 1),
pt2_ncl AS (
  SELECT c.pred, CAST(COUNT(*) AS BIGINT) AS n_closed
  FROM pt2_chains c
  WHERE EXISTS (SELECT 1 FROM pt2_e e
                WHERE e.pred = c.pred AND e.a = c.x1
                  AND e.b = c.y2)
  GROUP BY 1)""")


# ---------------------------------------------------------------------------
# Continuation batch 134: dictionary-encoding benefit audit — raw
# UTF-8 bytes vs dictionary bytes per column; DuckDB strlen = byte
# length = Spark octet_length
# (functions/textstats.encoding_advisor).


def _enc_col_sql(c: str) -> str:
    return f"""
SELECT '{c}' AS col_name,
       CAST(r.n_rows AS BIGINT) AS n_rows,
       CAST(d.n_distinct AS BIGINT) AS n_distinct,
       CAST(r.raw_bytes AS BIGINT) AS raw_bytes,
       CAST(d.dict_vals + 4 * r.n_rows AS BIGINT) AS dict_bytes,
       CAST((1000000 * (r.raw_bytes - (d.dict_vals + 4 * r.n_rows)))
            // r.raw_bytes AS BIGINT) AS savings_micro6
FROM (SELECT COUNT(*) AS n_rows,
             COALESCE(SUM(strlen({c})), 0) AS raw_bytes
      FROM documents) r,
     (SELECT COUNT(*) AS n_distinct,
             COALESCE(SUM(strlen(v)), 0) AS dict_vals
      FROM (SELECT DISTINCT {c} AS v FROM documents)) d"""


ORACLE["encoding_advisor"] = "\nUNION ALL\n".join(
    _enc_col_sql(c) for c in ("source", "lang", "text"))


# ---------------------------------------------------------------------------
# Continuation batch 135: Simpson's-paradox audit — exact covariance
# numerator of (token count, gate verdict), pooled vs per-lang
# (functions/textstats.simpson_check).  Reuses CURATION_CTES' cr
# verdict table.

ORACLE["simpson_check"] = "WITH " + CURATION_CTES + """,
sp_d AS MATERIALIZED (
  SELECT d.lang AS stratum,
         CAST(c.n_tokens AS BIGINT) AS x,
         CAST(CASE WHEN c.reason = 'ok' THEN 1 ELSE 0 END AS BIGINT)
           AS y
  FROM cr c JOIN documents d USING (doc_id)),
sp_s AS (
  SELECT stratum, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(y) AS BIGINT) AS n_keep,
         CAST(COUNT(*) * SUM(x * y) - SUM(x) * SUM(y) AS BIGINT)
           AS cov_n
  FROM sp_d GROUP BY 1),
sp_p AS (
  SELECT 'ALL' AS stratum, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(y) AS BIGINT) AS n_keep,
         CAST(COUNT(*) * SUM(x * y) - SUM(x) * SUM(y) AS BIGINT)
           AS cov_n
  FROM sp_d),
sp_all AS (
  SELECT * FROM sp_s UNION ALL SELECT * FROM sp_p)
SELECT stratum, n_docs, n_keep, cov_n,
       CAST(SIGN(cov_n) AS INT) AS cov_sign,
       CAST(CASE WHEN SIGN(cov_n) <> 0
                  AND SIGN(cov_n) = -(SELECT SIGN(cov_n) FROM sp_p)
             THEN 1 ELSE 0 END AS INT) AS paradox
FROM sp_all"""


# ---------------------------------------------------------------------------
# Continuation batch 137: uniformity audit of the md5-nibble bucket
# device — exact chi-square numerator vs uniform
# (functions/sketches.hash_uniformity).

ORACLE["hash_uniformity"] = """
WITH hu_occ AS (
  SELECT CAST(16 * (instr('0123456789abcdef',
               substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1)
            + (instr('0123456789abcdef',
               substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1)
           AS INT) AS bucket,
         CAST(COUNT(*) AS BIGINT) AS c0
  FROM documents GROUP BY 1),
hu_full AS (
  SELECT s.bucket, COALESCE(o.c0, 0) AS c
  FROM (SELECT unnest(generate_series(0, 255)) AS bucket) s
  LEFT JOIN hu_occ o USING (bucket)),
hu_n AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM hu_full)
SELECT CAST(COUNT(*) AS BIGINT) AS n_buckets,
       (SELECT n FROM hu_n) AS n_items,
       CAST(SUM(CASE WHEN c > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS occupied,
       CAST(MAX(c) AS BIGINT) AS max_bucket,
       CAST(MIN(c) AS BIGINT) AS min_bucket,
       CAST(SUM((256 * c - (SELECT n FROM hu_n))
                * (256 * c - (SELECT n FROM hu_n))) AS BIGINT)
         AS chi2_num
FROM hu_full"""


# ---------------------------------------------------------------------------
# Continuation batch 138: unary inclusion-dependency discovery over
# the TPC-H side tables (operators/triples.inclusion_deps).


def _ind_pair_sql(ct, cc, pt, pc):
    return f"""
SELECT '{ct}.{cc}' AS child, '{pt}.{pc}' AS parent,
       CAST(n.n AS BIGINT) AS n_child_distinct,
       CAST(m.m AS BIGINT) AS n_contained,
       CAST(CASE WHEN n.n = 0 THEN 0
            ELSE (1000000 * m.m) // n.n END AS BIGINT)
         AS containment_micro6,
       CAST(CASE WHEN m.m = n.n THEN 1 ELSE 0 END AS INT) AS is_ind
FROM (SELECT COUNT(*) AS n
      FROM (SELECT DISTINCT {cc} FROM {ct})) n,
     (SELECT COUNT(*) AS m
      FROM (SELECT DISTINCT {cc} AS v FROM {ct}) c
      WHERE EXISTS (SELECT 1 FROM {pt} p WHERE p.{pc} = c.v)) m"""


ORACLE["inclusion_deps"] = "\nUNION ALL\n".join(
    _ind_pair_sql(*cand) for cand in (
        ("nation", "n_regionkey", "region", "r_regionkey"),
        ("customer", "c_nationkey", "nation", "n_nationkey"),
        ("supplier", "s_nationkey", "nation", "n_nationkey"),
        ("orders", "o_custkey", "customer", "c_custkey"),
        ("lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("lineitem", "l_partkey", "part", "p_partkey"),
        ("orders", "o_orderkey", "customer", "c_custkey"),
    ))


# ---------------------------------------------------------------------------
# Continuation batch 139: float-free TPC-H-Q1-style pricing summary
# — per-row cent quantization then BIGINT everything
# (operators/events.q1_pricing).

ORACLE["q1_pricing"] = """
WITH q1 AS (
  SELECT l_returnflag, l_linestatus,
         CAST(FLOOR(l_quantity) AS BIGINT) AS q,
         CAST(FLOOR(l_extendedprice * 100) AS BIGINT) AS c,
         CAST(FLOOR(l_discount * 100) AS BIGINT) AS dc,
         CAST(FLOOR(l_tax * 100) AS BIGINT) AS tc
  FROM lineitem)
SELECT l_returnflag, l_linestatus,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(q) AS BIGINT) AS sum_qty,
       CAST(SUM(c) AS BIGINT) AS sum_base_cents,
       CAST(SUM(c * (100 - dc)) AS BIGINT) AS sum_disc_x10000,
       CAST(SUM(c * (100 - dc) * (100 + tc)) AS BIGINT)
         AS sum_charge_x1000000,
       CAST((1000000 * SUM(q)) // COUNT(*) AS BIGINT)
         AS avg_qty_micro6,
       CAST(SUM(c) // COUNT(*) AS BIGINT) AS avg_price_cents
FROM q1 GROUP BY 1, 2"""


# ---------------------------------------------------------------------------
# Continuation batch 140: per-dimension embedding health profile —
# floor(x*1e6) quantization then BIGINT moments
# (operators/similarity.embedding_profile).

ORACLE["embedding_profile"] = """
WITH ep_q AS (
  SELECT CAST(dim - 1 AS INT) AS dim,
         CAST(FLOOR(CAST(x AS DOUBLE) * 1000000) AS BIGINT) AS q
  FROM (SELECT unnest(embedding) AS x,
               generate_subscripts(embedding, 1) AS dim
        FROM embeddings))
SELECT dim,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(q) AS BIGINT) AS sum_q,
       CAST(COUNT(*) * SUM(q * q) - SUM(q) * SUM(q) AS BIGINT)
         AS var_num,
       CAST(MIN(q) AS BIGINT) AS min_q,
       CAST(MAX(q) AS BIGINT) AS max_q,
       CAST(SUM(CASE WHEN q = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_zero
FROM ep_q GROUP BY 1"""


# ---------------------------------------------------------------------------
# Continuation batch 141: per-dimension label separability — ANOVA
# share over label groups, quantized embeddings
# (operators/similarity.label_separation).

ORACLE["label_separation"] = """
WITH ls_q AS (
  SELECT label, CAST(dim - 1 AS INT) AS dim,
         CAST(FLOOR(CAST(x AS DOUBLE) * 1000) AS BIGINT) AS q
  FROM (SELECT label, unnest(embedding) AS x,
               generate_subscripts(embedding, 1) AS dim
        FROM embeddings)),
ls_tot AS MATERIALIZED (
  SELECT dim, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(q) AS BIGINT) AS s,
         CAST(COUNT(*) * SUM(q * q) - SUM(q) * SUM(q) AS BIGINT)
           AS sst_scaled
  FROM ls_q GROUP BY 1),
ls_grp AS (
  SELECT dim, label, CAST(COUNT(*) AS BIGINT) AS ng,
         CAST(SUM(q) AS BIGINT) AS sg
  FROM ls_q GROUP BY 1, 2),
ls_ssb AS (
  SELECT g.dim, CAST(COUNT(*) AS BIGINT) AS n_labels,
         CAST(SUM(((t.n * g.sg - g.ng * t.s)
                   * (t.n * g.sg - g.ng * t.s)) // (g.ng * t.n))
           AS BIGINT) AS ssb_scaled
  FROM ls_grp g JOIN ls_tot t USING (dim)
  GROUP BY 1)
SELECT t.dim, b.n_labels, b.ssb_scaled, t.sst_scaled,
       CAST(CASE WHEN t.sst_scaled <= 9000000000000
            THEN (1000000 * b.ssb_scaled) // t.sst_scaled
            ELSE b.ssb_scaled // (t.sst_scaled // 1000000) END
         AS BIGINT) AS separation_micro6
FROM ls_tot t JOIN ls_ssb b USING (dim)
WHERE t.sst_scaled > 0"""


# ---------------------------------------------------------------------------
# Continuation batch 142: exact-span NER type-confusion matrix
# between the dict and model mention paths
# (operators/evaluate.ner_confusion).  Reuses both mention
# statements verbatim as nested subqueries.

ORACLE["ner_confusion"] = f"""
WITH nc_a AS MATERIALIZED ({ORACLE["mentions"]}),
nc_b AS MATERIALIZED ({ORACLE["mentions_model"]})
SELECT a.ent_type AS type_a, b.ent_type AS type_b,
       CAST(COUNT(*) AS BIGINT) AS n
FROM nc_a a JOIN nc_b b
  ON a.doc_id = b.doc_id AND a."start" = b."start"
 AND a."end" = b."end"
GROUP BY 1, 2
UNION ALL
SELECT a.ent_type AS type_a, '<none>' AS type_b,
       CAST(COUNT(*) AS BIGINT) AS n
FROM nc_a a
WHERE NOT EXISTS (SELECT 1 FROM nc_b b
                  WHERE b.doc_id = a.doc_id
                    AND b."start" = a."start"
                    AND b."end" = a."end")
GROUP BY 1
UNION ALL
SELECT '<none>' AS type_a, b.ent_type AS type_b,
       CAST(COUNT(*) AS BIGINT) AS n
FROM nc_b b
WHERE NOT EXISTS (SELECT 1 FROM nc_a a
                  WHERE a.doc_id = b.doc_id
                    AND a."start" = b."start"
                    AND a."end" = b."end")
GROUP BY 2"""


# ---------------------------------------------------------------------------
# Continuation batch 143: casing/digit token profile per language —
# exact micro6 shares (functions/textstats.casing_profile).

ORACLE["casing_profile"] = """
WITH cp_per AS (
  SELECT lang,
         CAST(len(ts) AS BIGINT) AS n,
         CAST(len(list_filter(ts,
             t -> regexp_matches(t, '^[A-Z]'))) AS BIGINT) AS u,
         CAST(len(list_filter(ts,
             t -> regexp_matches(t, '^[A-Z]{2,}$'))) AS BIGINT) AS c,
         CAST(len(list_filter(ts,
             t -> regexp_matches(t, '[0-9]'))) AS BIGINT) AS d
  FROM (SELECT lang,
               list_filter(string_split_regex(text, '[\\n \\t]'),
                           x -> x <> '') AS ts
        FROM documents))
SELECT lang,
       CAST(SUM(n) AS BIGINT) AS n_tokens,
       CAST(SUM(u) AS BIGINT) AS n_upper_start,
       CAST(SUM(c) AS BIGINT) AS n_all_caps,
       CAST(SUM(d) AS BIGINT) AS n_digit,
       CAST((1000000 * SUM(u)) // SUM(n) AS BIGINT)
         AS upper_start_micro6,
       CAST((1000000 * SUM(c)) // SUM(n) AS BIGINT)
         AS all_caps_micro6,
       CAST((1000000 * SUM(d)) // SUM(n) AS BIGINT)
         AS digit_micro6
FROM cp_per GROUP BY 1
HAVING SUM(n) > 0"""


# ---------------------------------------------------------------------------
# Continuation batch 144: rich-club coefficient over the co-mention
# graph (operators/graph_algos.rich_club).

ORACLE["rich_club"] = _q("""
SELECT CAST(n.k AS INT) AS k, n.n_rich,
       CAST(COALESCE(e.e_rich, 0) AS BIGINT) AS e_rich,
       CAST((n.n_rich * (n.n_rich - 1)) // 2 AS BIGINT)
         AS possible_pairs,
       CAST((2000000 * COALESCE(e.e_rich, 0))
            // (n.n_rich * (n.n_rich - 1)) AS BIGINT) AS phi_micro6
FROM rc_nk n LEFT JOIN rc_ek e USING (k)
WHERE n.n_rich >= 2""",
    LINK_CTES, COMENTION_CTES.strip(), """
rc_und AS MATERIALIZED (
  SELECT src AS a, dst AS b FROM comention WHERE src <> dst),
rc_deg AS MATERIALIZED (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS deg
  FROM (SELECT a AS node FROM rc_und
        UNION ALL SELECT b FROM rc_und)
  GROUP BY 1),
rc_club AS MATERIALIZED (
  SELECT k, node
  FROM rc_deg, unnest([1, 2, 4, 8]) AS t(k)
  WHERE deg > k),
rc_nk AS (
  SELECT k, CAST(COUNT(*) AS BIGINT) AS n_rich
  FROM rc_club GROUP BY 1),
rc_ek AS (
  SELECT ca.k, CAST(COUNT(*) AS BIGINT) AS e_rich
  FROM rc_und u
  JOIN rc_club ca ON ca.node = u.a
  JOIN rc_club cb ON cb.node = u.b AND cb.k = ca.k
  GROUP BY 1)""")


# ---------------------------------------------------------------------------
# Continuation batch 145: cross-type co-burst covariance on the
# shared day spine (operators/events.type_covariance).

ORACLE["type_covariance"] = """
WITH tc_day AS (
  SELECT CAST(epoch_us(ts) // 86400000000 AS INT) AS day_idx,
         event_type AS etype
  FROM events),
tc_spine AS (SELECT DISTINCT day_idx FROM tc_day),
tc_types AS (SELECT DISTINCT etype FROM tc_day),
tc_sparse AS (
  SELECT etype, day_idx, CAST(COUNT(*) AS BIGINT) AS r
  FROM tc_day GROUP BY 1, 2),
tc_grid AS MATERIALIZED (
  SELECT t.etype, s.day_idx, COALESCE(x.r, 0) AS r
  FROM tc_types t CROSS JOIN tc_spine s
  LEFT JOIN tc_sparse x USING (etype, day_idx)),
tc_stats AS (
  SELECT etype, CAST(COUNT(*) AS BIGINT) AS n_days,
         CAST(SUM(r) AS BIGINT) AS s
  FROM tc_grid GROUP BY 1),
tc_c AS MATERIALIZED (
  SELECT g.etype, g.day_idx, st.n_days,
         CAST(st.n_days * g.r - st.s AS BIGINT) AS c
  FROM tc_grid g JOIN tc_stats st USING (etype)),
tc_var AS (
  SELECT etype, CAST(SUM(c * c) AS BIGINT) AS v
  FROM tc_c GROUP BY 1),
tc_pairs AS (
  SELECT a.etype AS etype_a, b.etype AS etype_b,
         CAST(MAX(a.n_days) AS BIGINT) AS n_days,
         CAST(SUM(a.c * b.c) AS BIGINT) AS cov_n
  FROM tc_c a JOIN tc_c b
    ON a.day_idx = b.day_idx AND a.etype < b.etype
  GROUP BY 1, 2)
SELECT p.etype_a, p.etype_b, p.n_days, p.cov_n,
       CAST(SIGN(p.cov_n) AS INT) AS cov_sign,
       va.v AS var_a, vb.v AS var_b
FROM tc_pairs p
JOIN tc_var va ON va.etype = p.etype_a
JOIN tc_var vb ON vb.etype = p.etype_b"""


# ---------------------------------------------------------------------------
# Continuation batch 146: watermark-sizing lateness audit — per-user
# running high-water mark over arrival order
# (operators/events.lateness_audit).

ORACLE["lateness_audit"] = """
WITH la_l AS (
  SELECT MAX(sec) OVER (PARTITION BY user_id ORDER BY event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         - sec AS late
  FROM (SELECT user_id, event_id,
               epoch_us(ts) // 1000000 AS sec
        FROM events)),
la_fan AS (
  SELECT late, unnest([60, 600, 3600]) AS watermark_s FROM la_l)
SELECT CAST(watermark_s AS INT) AS watermark_s,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CASE WHEN late > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_out_of_order,
       CAST(MAX(late) AS BIGINT) AS max_lateness_s,
       CAST(SUM(CASE WHEN late > watermark_s THEN 1 ELSE 0 END)
         AS BIGINT) AS n_late,
       CAST((1000000 * SUM(CASE WHEN late > watermark_s
                           THEN 1 ELSE 0 END)) // COUNT(*)
         AS BIGINT) AS late_share_micro6
FROM la_fan GROUP BY 1"""


# ---------------------------------------------------------------------------
# Continuation batch 147: Z-order vs user-major layout audit — Morton
# interleave, cumsum file packing, per-day-bucket files touched
# (operators/events.zorder_locality).

ORACLE["zorder_locality"] = """
WITH zl_base AS (
  SELECT event_id,
         CAST(user_id % 16 AS INT) AS ub,
         CAST((epoch_us(ts) // 86400000000) % 16 AS INT) AS db
  FROM events),
zl_z AS (
  SELECT *,
         CAST(((ub // 1) % 2) * 2 + ((ub // 2) % 2) * 8
            + ((ub // 4) % 2) * 32 + ((ub // 8) % 2) * 128
            + ((db // 1) % 2) * 1 + ((db // 2) % 2) * 4
            + ((db // 4) % 2) * 16 + ((db // 8) % 2) * 64 AS INT) AS z
  FROM zl_base),
zl_files AS (
  SELECT db,
         (ROW_NUMBER() OVER (ORDER BY z, event_id) - 1) // 50
           AS z_file,
         (ROW_NUMBER() OVER (ORDER BY ub, db, event_id) - 1) // 50
           AS lex_file
  FROM zl_z)
SELECT db AS day_bucket,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(DISTINCT z_file) AS BIGINT) AS z_files,
       CAST(COUNT(DISTINCT lex_file) AS BIGINT) AS lex_files,
       CAST(MAX(z_file) - MIN(z_file) + 1 AS BIGINT) AS z_span,
       CAST(MAX(lex_file) - MIN(lex_file) + 1 AS BIGINT) AS lex_span
FROM zl_files GROUP BY 1"""


# ---------------------------------------------------------------------------
# Continuation batch 148: zone-map pruning audit — cumsum file packing
# on the (lang, doc_id) clustering, per-file min/max stats, canned
# predicate skip counts (functions/textstats.zonemap_pruning).

ORACLE["zonemap_pruning"] = """
WITH zp_packed AS (
  SELECT doc_id, lang, n_chars,
         COALESCE(SUM(n_chars) OVER (ORDER BY lang, doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           // 8000 AS file_id
  FROM documents),
zp_zones AS (
  SELECT file_id, COUNT(*) AS n_rows,
         MIN(n_chars) AS min_n, MAX(n_chars) AS max_n,
         MIN(lang) AS min_l, MAX(lang) AS max_l,
         SUM(CASE WHEN n_chars >= 400 THEN 1 ELSE 0 END) AS m1,
         SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS m2,
         SUM(CASE WHEN n_chars < 60 THEN 1 ELSE 0 END) AS m3
  FROM zp_packed GROUP BY 1),
zp_fan AS (
  SELECT 'n_chars>=400' AS pred,
         CASE WHEN max_n >= 400 THEN 1 ELSE 0 END AS surv,
         n_rows, m1 AS matched FROM zp_zones
  UNION ALL
  SELECT 'lang=en',
         CASE WHEN min_l <= 'en' AND max_l >= 'en' THEN 1 ELSE 0 END,
         n_rows, m2 FROM zp_zones
  UNION ALL
  SELECT 'n_chars<60',
         CASE WHEN min_n < 60 THEN 1 ELSE 0 END,
         n_rows, m3 FROM zp_zones)
SELECT pred,
       CAST(COUNT(*) AS BIGINT) AS n_files,
       CAST(SUM(1 - surv) AS BIGINT) AS files_skipped,
       CAST(SUM(n_rows * surv) AS BIGINT) AS rows_scanned,
       CAST(SUM(matched) AS BIGINT) AS rows_matched,
       CAST(CASE WHEN SUM(matched) > 0
            THEN (1000000 * SUM(n_rows * surv)) // SUM(matched)
            ELSE 0 END AS BIGINT) AS scan_amp_micro6
FROM zp_fan GROUP BY 1"""


# ---------------------------------------------------------------------------
# Continuation batch 149: topographic peak prominence over per-type
# daily series — nearest-higher bounds + between-mins cols
# (operators/events.peak_prominence).

ORACLE["peak_prominence"] = """
WITH pp_daily AS (
  SELECT event_type AS etype,
         epoch_us(ts) // 86400000000 AS day,
         COUNT(*) AS v
  FROM events GROUP BY 1, 2),
pp_ser AS MATERIALIZED (
  SELECT etype, v,
         ROW_NUMBER() OVER (PARTITION BY etype ORDER BY day) - 1
           AS idx,
         LAG(v) OVER (PARTITION BY etype ORDER BY day) AS pv,
         LEAD(v) OVER (PARTITION BY etype ORDER BY day) AS nv
  FROM pp_daily),
pp_peaks AS MATERIALIZED (
  SELECT etype, idx AS pidx, v AS peak_v FROM pp_ser
  WHERE v > pv AND v > nv),
pp_lb AS (
  SELECT p.etype, p.pidx, MAX(o.idx) AS b
  FROM pp_peaks p JOIN pp_ser o ON o.etype = p.etype
  WHERE o.idx < p.pidx AND o.v > p.peak_v GROUP BY 1, 2),
pp_lcol AS (
  SELECT p.etype, p.pidx, MIN(o.v) AS col_l
  FROM pp_peaks p
  JOIN pp_ser o ON o.etype = p.etype AND o.idx < p.pidx
  LEFT JOIN pp_lb b ON b.etype = p.etype AND b.pidx = p.pidx
  WHERE b.b IS NULL OR o.idx > b.b
  GROUP BY 1, 2),
pp_rb AS (
  SELECT p.etype, p.pidx, MIN(o.idx) AS b
  FROM pp_peaks p JOIN pp_ser o ON o.etype = p.etype
  WHERE o.idx > p.pidx AND o.v > p.peak_v GROUP BY 1, 2),
pp_rcol AS (
  SELECT p.etype, p.pidx, MIN(o.v) AS col_r
  FROM pp_peaks p
  JOIN pp_ser o ON o.etype = p.etype AND o.idx > p.pidx
  LEFT JOIN pp_rb b ON b.etype = p.etype AND b.pidx = p.pidx
  WHERE b.b IS NULL OR o.idx < b.b
  GROUP BY 1, 2)
SELECT p.etype AS event_type,
       CAST(p.pidx AS BIGINT) AS day_idx,
       CAST(p.peak_v AS BIGINT) AS peak_v,
       CAST(GREATEST(l.col_l, r.col_r) AS BIGINT) AS saddle_v,
       CAST(p.peak_v - GREATEST(l.col_l, r.col_r) AS BIGINT)
         AS prominence
FROM pp_peaks p
JOIN pp_lcol l ON l.etype = p.etype AND l.pidx = p.pidx
JOIN pp_rcol r ON r.etype = p.etype AND r.pidx = p.pidx"""


# ---------------------------------------------------------------------------
# Continuation batch 150: Wald-Wolfowitz runs test vs the per-type
# lower-median daily count (operators/events.runs_test).

ORACLE["runs_test"] = """
WITH rt_daily AS MATERIALIZED (
  SELECT event_type AS etype,
         epoch_us(ts) // 86400000000 AS day,
         COUNT(*) AS v
  FROM events GROUP BY 1, 2),
rt_med AS (
  SELECT etype, v AS med FROM (
    SELECT etype, v,
           ROW_NUMBER() OVER (PARTITION BY etype ORDER BY v, day)
             AS rn,
           COUNT(*) OVER (PARTITION BY etype) AS n
    FROM rt_daily)
  WHERE rn = (n + 1) // 2),
rt_signed AS (
  SELECT d.etype, d.day,
         CASE WHEN d.v > m.med THEN 1 ELSE 0 END AS sgn
  FROM rt_daily d JOIN rt_med m ON m.etype = d.etype
  WHERE d.v <> m.med),
rt_chg AS (
  SELECT etype, sgn,
         CASE WHEN sgn IS DISTINCT FROM
              LAG(sgn) OVER (PARTITION BY etype ORDER BY day)
         THEN 1 ELSE 0 END AS chg
  FROM rt_signed),
rt_runs AS (
  SELECT etype, SUM(sgn) AS n1, SUM(1 - sgn) AS n2,
         SUM(chg) AS n_runs
  FROM rt_chg GROUP BY etype)
SELECT etype AS event_type,
       CAST(n1 AS BIGINT) AS n1,
       CAST(n2 AS BIGINT) AS n2,
       CAST(n_runs AS BIGINT) AS n_runs,
       CAST(1000000 + (2000000 * n1 * n2) // (n1 + n2) AS BIGINT)
         AS exp_runs_micro6,
       CAST((1000000 * 2 * n1 * n2 * (2 * n1 * n2 - n1 - n2))
            // ((n1 + n2) * (n1 + n2) * (n1 + n2 - 1)) AS BIGINT)
         AS var_runs_micro6
FROM rt_runs WHERE n1 + n2 >= 2"""


# ---------------------------------------------------------------------------
# Continuation batch 151: McNemar paired-gate disagreement — length
# gate vs stopword-profile gate per language
# (functions/textstats.mcnemar_gates).

ORACLE["mcnemar_gates"] = f"""
WITH mg_toks AS (
  SELECT doc_id,
         unnest(string_split_regex(text, '{SEP_CLASS}')) AS tok
  FROM documents),
mg_counts AS (
  SELECT doc_id, COUNT(*) AS n_tokens,
         SUM(CASE WHEN lower(tok) IN ({_STOP_IN}) THEN 1 ELSE 0 END)
           AS n_stop
  FROM mg_toks WHERE tok <> '' GROUP BY 1),
mg_gated AS (
  SELECT d.lang,
         CASE WHEN length(d.text) >= 200 THEN 1 ELSE 0 END AS a,
         CASE WHEN 20 * COALESCE(c.n_stop, 0)
                   >= COALESCE(c.n_tokens, 0)
              THEN 1 ELSE 0 END AS b
  FROM documents d LEFT JOIN mg_counts c ON c.doc_id = d.doc_id),
mg_cells AS (
  SELECT lang,
         SUM(a * b) AS n11, SUM(a * (1 - b)) AS n10,
         SUM((1 - a) * b) AS n01, SUM((1 - a) * (1 - b)) AS n00
  FROM mg_gated GROUP BY 1)
SELECT lang,
       CAST(n11 AS BIGINT) AS n11, CAST(n10 AS BIGINT) AS n10,
       CAST(n01 AS BIGINT) AS n01, CAST(n00 AS BIGINT) AS n00,
       CAST(CASE WHEN n10 + n01 > 0
            THEN (1000000 * (n10 - n01) * (n10 - n01)) // (n10 + n01)
            ELSE 0 END AS BIGINT) AS mcnemar_micro6
FROM mg_cells"""


# ---------------------------------------------------------------------------
# Continuation batch 152: Matthews correlation for the lang_id
# English detector — exact integer decomposition
# (functions/textstats.mcc_scores).

ORACLE["mcc_scores"] = f"""
WITH mc_toks AS (
  SELECT doc_id,
         unnest(string_split_regex(text, '{SEP_CLASS}')) AS tok
  FROM documents),
mc_counts AS (
  SELECT doc_id, COUNT(*) AS n_tokens,
         SUM(CASE WHEN lower(tok) IN ({_STOP_IN}) THEN 1 ELSE 0 END)
           AS n_stop
  FROM mc_toks WHERE tok <> '' GROUP BY 1),
mc_pg AS (
  SELECT CASE WHEN 20 * COALESCE(c.n_stop, 0)
                   >= COALESCE(c.n_tokens, 0) THEN 1 ELSE 0 END AS p,
         CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS g
  FROM documents d LEFT JOIN mc_counts c ON c.doc_id = d.doc_id),
mc_cells AS (
  SELECT CAST(SUM(p * g) AS BIGINT) AS tp,
         CAST(SUM(p * (1 - g)) AS BIGINT) AS fp,
         CAST(SUM((1 - p) * g) AS BIGINT) AS fn,
         CAST(SUM((1 - p) * (1 - g)) AS BIGINT) AS tn
  FROM mc_pg)
SELECT tp, fp, fn, tn,
       CAST(tp * tn - fp * fn AS BIGINT) AS mcc_num,
       CAST((tp + fp) * (tp + fn) * (tn + fp) * (tn + fn) AS BIGINT)
         AS mcc_den2,
       CAST(SIGN(tp * tn - fp * fn) AS INT) AS mcc_sign,
       CAST(CASE WHEN (tp + fp) * (tp + fn) * (tn + fp) * (tn + fn)
                      > 0
            THEN (CAST(1000000 AS HUGEINT)
                  * (tp * tn - fp * fn) * (tp * tn - fp * fn))
                 // ((tp + fp) * (tp + fn) * (tn + fp) * (tn + fn))
            ELSE 0 END AS BIGINT) AS mcc2_micro6
FROM mc_cells"""


# ---------------------------------------------------------------------------
# Continuation batch 153: l-diversity + t-closeness over the
# (lang, token-decile) release with host as the sensitive attribute
# (functions/textstats.l_diversity).

ORACLE["l_diversity"] = f"""
WITH ld_tok AS (
  SELECT d.doc_id, d.source AS host, d.lang,
         COALESCE(t.n, 0) AS n
  FROM documents d LEFT JOIN (
    SELECT doc_id, COUNT(*) AS n FROM (
      SELECT doc_id,
             unnest(string_split_regex(text, '{SEP_CLASS}')) AS tok
      FROM documents) WHERE tok <> '' GROUP BY doc_id) t
  ON t.doc_id = d.doc_id),
ld_vals AS (
  SELECT n, (COALESCE(SUM(c) OVER (ORDER BY n
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             * 10) // SUM(c) OVER () AS bucket
  FROM (SELECT n, COUNT(*) AS c FROM ld_tok GROUP BY 1)),
ld_b AS MATERIALIZED (
  SELECT t.host, t.lang, v.bucket
  FROM ld_tok t JOIN ld_vals v ON v.n = t.n),
ld_cells AS (
  SELECT lang, bucket, host, COUNT(*) AS ch
  FROM ld_b GROUP BY 1, 2, 3),
ld_ghost AS MATERIALIZED (
  SELECT host, COUNT(*) AS gh FROM ld_b GROUP BY 1),
ld_tot AS (SELECT SUM(gh) AS nn FROM ld_ghost),
ld_per AS (
  SELECT c.lang, c.bucket, c.ch, t.nn,
         SUM(c.ch) OVER (PARTITION BY c.lang, c.bucket) AS ncls,
         g.gh
  FROM ld_cells c JOIN ld_ghost g ON g.host = c.host, ld_tot t),
ld_classes AS (
  SELECT lang, bucket,
         COUNT(*) AS ldiv, SUM(ch) AS sz,
         SUM(ABS(ch * nn - gh * ncls) - gh * ncls) AS tsum,
         MAX(nn) AS nn
  FROM ld_per GROUP BY 1, 2),
ld_tvd AS (
  SELECT ldiv, sz,
         (1000000 * (tsum + sz * nn)) // (2 * sz * nn) AS tvd
  FROM ld_classes),
ld_fan AS (
  SELECT ldiv, sz, tvd, unnest([2, 3, 5]) AS l FROM ld_tvd)
SELECT CAST(l AS INT) AS l,
       CAST(COUNT(*) AS BIGINT) AS n_classes,
       CAST(SUM(CASE WHEN ldiv < l THEN 1 ELSE 0 END) AS BIGINT)
         AS n_violating_classes,
       CAST(SUM(CASE WHEN ldiv < l THEN sz ELSE 0 END) AS BIGINT)
         AS n_exposed_docs,
       CAST((1000000 * SUM(CASE WHEN ldiv < l THEN sz ELSE 0 END))
            // SUM(sz) AS BIGINT) AS exposed_share_micro6,
       CAST(MAX(tvd) AS BIGINT) AS max_tvd_micro6
FROM ld_fan GROUP BY 1"""


# ---------------------------------------------------------------------------
# Continuation batch 154: exact harmonic centrality over the
# co-mention graph — per-term-floor 1e6//d summed over reachable
# others (operators/graph_algos.harmonic_centrality).

ORACLE["harmonic_centrality"] = _q("""
SELECT s AS node,
       CAST(COUNT(*) AS BIGINT) AS n_reached_others,
       CAST(SUM(dist) AS BIGINT) AS dist_sum,
       CAST(SUM(1000000 // dist) AS BIGINT) AS harmonic_floor6
FROM hc_pairs WHERE dist > 0 GROUP BY 1""",
    LINK_CTES, COMENTION_CTES.strip(), """
hc_und AS MATERIALIZED (
  SELECT src AS a, dst AS b FROM comention WHERE src <> dst),
hc_sym AS (SELECT a AS src, b AS dst FROM hc_und
           UNION SELECT b AS src, a AS dst FROM hc_und),
hc_reach(s, node, dist) AS (
  SELECT DISTINCT src AS s, src AS node, 0 AS dist FROM hc_sym
  UNION
  SELECT r.s, e.dst AS node, r.dist + 1
  FROM hc_reach r JOIN hc_sym e ON e.src = r.node
  WHERE r.dist < 8),
hc_pairs AS MATERIALIZED (
  SELECT s, node, CAST(MIN(dist) AS INT) AS dist
  FROM hc_reach GROUP BY 1, 2)""")


# ---------------------------------------------------------------------------
# Continuation batch 155: dyadic (alpha=1/2) truncated-EWMA one-step
# forecast per event type (operators/events.ewma_forecast).

ORACLE["ewma_forecast"] = """
WITH ef_daily AS (
  SELECT event_type AS etype,
         epoch_us(ts) // 86400000000 AS day,
         COUNT(*) AS v
  FROM events GROUP BY 1, 2),
ef_idx AS (
  SELECT etype, v,
         ROW_NUMBER() OVER (PARTITION BY etype ORDER BY day DESC)
           AS i
  FROM ef_daily),
ef_agg AS (
  SELECT etype,
         COUNT(*) AS n_days,
         MAX(CASE WHEN i = 1 THEN v END) AS last_v,
         SUM(CASE WHEN i BETWEEN 2 AND 17
             THEN v * (CAST(1 AS BIGINT) << (17 - i)) END) AS w
  FROM ef_idx GROUP BY 1)
SELECT etype AS event_type,
       CAST(n_days AS BIGINT) AS n_days,
       CAST(last_v AS BIGINT) AS last_v,
       CAST((1000000 * w) // 65535 AS BIGINT) AS ewma_micro6,
       CAST(ABS(1000000 * last_v - (1000000 * w) // 65535) AS BIGINT)
         AS abs_err_micro6
FROM ef_agg WHERE n_days >= 17"""


# ---------------------------------------------------------------------------
# Continuation batch 156: longest strictly increasing / decreasing
# subsequence of the per-type daily series — recursive longest-path
# closure over the i<j, v_i<v_j DAG (operators/events.lis_trend).

ORACLE["lis_trend"] = """
WITH RECURSIVE li_daily AS (
  SELECT event_type AS etype,
         epoch_us(ts) // 86400000000 AS day,
         COUNT(*) AS v
  FROM events GROUP BY 1, 2),
li_idx AS MATERIALIZED (
  SELECT etype, v,
         ROW_NUMBER() OVER (PARTITION BY etype ORDER BY day) AS idx
  FROM li_daily),
li_up(etype, idx, v, len) AS (
  SELECT etype, idx, v, 1 FROM li_idx
  UNION
  SELECT s.etype, e.idx, e.v, s.len + 1
  FROM li_up s JOIN li_idx e
    ON e.etype = s.etype AND e.idx > s.idx AND e.v > s.v),
li_dn(etype, idx, v, len) AS (
  SELECT etype, idx, v, 1 FROM li_idx
  UNION
  SELECT s.etype, e.idx, e.v, s.len + 1
  FROM li_dn s JOIN li_idx e
    ON e.etype = s.etype AND e.idx > s.idx AND e.v < s.v),
li_n AS (SELECT etype, COUNT(*) AS n FROM li_idx GROUP BY 1),
li_lis AS (SELECT etype, MAX(len) AS lis FROM li_up GROUP BY 1),
li_lds AS (SELECT etype, MAX(len) AS lds FROM li_dn GROUP BY 1)
SELECT n.etype AS event_type,
       CAST(n.n AS BIGINT) AS n_days,
       CAST(u.lis AS BIGINT) AS lis_len,
       CAST(d.lds AS BIGINT) AS lds_len,
       CAST((1000000 * u.lis) // n.n AS BIGINT) AS lis_share_micro6
FROM li_n n
JOIN li_lis u ON u.etype = n.etype
JOIN li_lds d ON d.etype = n.etype"""


# ---------------------------------------------------------------------------
# Continuation batch 157: exact root-to-node path counts over the
# precedence SCC condensation — UNION ALL path enumeration vs the
# Spark side's fixed-round semiring propagation
# (operators/graph_algos.dag_path_counts).

ORACLE["dag_path_counts"] = _q("""
SELECT c.scc_id, c.n_nodes,
       CAST(CASE WHEN h.scc_id IS NULL THEN 1 ELSE 0 END AS INT)
         AS is_root,
       CAST(CASE WHEN t.scc_id IS NULL THEN 1 ELSE 0 END AS INT)
         AS is_sink,
       CAST(COALESCE(w.c, 0) AS BIGINT) AS n_paths
FROM dp_comps c
LEFT JOIN (SELECT DISTINCT b AS scc_id FROM dp_edges) h
  ON h.scc_id = c.scc_id
LEFT JOIN (SELECT DISTINCT a AS scc_id FROM dp_edges) t
  ON t.scc_id = c.scc_id
LEFT JOIN dp_cnt w ON w.node = c.scc_id""",
    LINK_CTES, PREC_CTES, """
dp_edges AS MATERIALIZED (
  SELECT DISTINCT sa.scc_id AS a, sb.scc_id AS b
  FROM prec_edges e
  JOIN pscc sa ON sa.node = e.src
  JOIN pscc sb ON sb.node = e.dst
  WHERE sa.scc_id <> sb.scc_id),
dp_comps AS MATERIALIZED (
  SELECT scc_id, CAST(COUNT(*) AS BIGINT) AS n_nodes
  FROM pscc GROUP BY 1),
dp_roots AS MATERIALIZED (
  SELECT scc_id FROM dp_comps
  WHERE scc_id NOT IN (SELECT b FROM dp_edges)),
dp_walk(node) AS (
  SELECT scc_id AS node FROM dp_roots
  UNION ALL
  SELECT e.b AS node FROM dp_walk w
  JOIN dp_edges e ON e.a = w.node),
dp_cnt AS MATERIALIZED (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS c
  FROM dp_walk GROUP BY 1)""")


# ---------------------------------------------------------------------------
# Continuation batch 158: Eulerian circuit/trail feasibility census
# per co-mention component (operators/graph_algos.eulerian_census).

ORACLE["eulerian_census"] = _q("""
SELECT n.component, n.n_nodes, e.n_edges, n.n_odd_nodes,
       CAST(CASE WHEN n.n_odd_nodes = 0 THEN 1 ELSE 0 END AS INT)
         AS has_circuit,
       CAST(CASE WHEN n.n_odd_nodes = 2 THEN 1 ELSE 0 END AS INT)
         AS has_trail
FROM ec_nodes n JOIN ec_edges_c e USING (component)""",
    LINK_CTES, COMENTION_CTES.strip(), """
ec_und AS MATERIALIZED (
  SELECT src AS a, dst AS b FROM comention WHERE src <> dst),
ec_sym AS (SELECT a AS src, b AS dst FROM ec_und
           UNION SELECT b AS src, a AS dst FROM ec_und),
ec_reach(s, node) AS (
  SELECT DISTINCT src AS s, src AS node FROM ec_sym
  UNION
  SELECT r.s, e.dst AS node
  FROM ec_reach r JOIN ec_sym e ON e.src = r.node),
ec_comp AS MATERIALIZED (
  SELECT s, MIN(node) AS component FROM ec_reach GROUP BY 1),
ec_deg AS (
  SELECT src AS s, COUNT(*) AS deg FROM ec_sym GROUP BY 1),
ec_nodes AS (
  SELECT c.component, CAST(COUNT(*) AS BIGINT) AS n_nodes,
         CAST(SUM(d.deg % 2) AS BIGINT) AS n_odd_nodes
  FROM ec_comp c JOIN ec_deg d ON d.s = c.s GROUP BY 1),
ec_edges_c AS (
  SELECT c.component, CAST(COUNT(*) AS BIGINT) AS n_edges
  FROM ec_und u JOIN ec_comp c ON c.s = u.a GROUP BY 1)""")


# ---------------------------------------------------------------------------
# Continuation batch 159: 11-point interpolated precision-recall
# curve of the bigram-LM quality score as an English detector —
# exact rational precision at each recall decile
# (functions/textstats.pr_curve over lm_quality x documents.lang).

ORACLE["pr_curve"] = f"""
WITH pc_score AS MATERIALIZED ({ORACLE["lm_quality"]}),
pc AS (
  SELECT d.doc_id AS id, s.lm_score_micro6 AS score,
         CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS y
  FROM pc_score s JOIN documents d USING (doc_id)),
pc_ranked AS MATERIALIZED (
  SELECT CAST(ROW_NUMBER() OVER (ORDER BY score DESC, id)
           AS BIGINT) AS k,
         CAST(SUM(y) OVER (ORDER BY score DESC, id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS BIGINT) AS tp,
         CAST(SUM(y) OVER () AS BIGINT) AS p
  FROM pc),
pc_fan AS (
  SELECT k, tp, (1000000000000 * tp) // k AS key,
         unnest(range(11)) AS recall_decile
  FROM pc_ranked WHERE p > 0),
pc_pick AS (
  SELECT recall_decile, k, tp,
         ROW_NUMBER() OVER (PARTITION BY recall_decile
             ORDER BY key DESC, k ASC) AS rn
  FROM pc_fan f
  JOIN (SELECT MAX(p) AS p FROM pc_ranked) t ON TRUE
  WHERE 10 * tp >= recall_decile * t.p)
SELECT CAST(recall_decile AS INT) AS recall_decile,
       k, tp, tp AS prec_num, k AS prec_den,
       CAST((1000000 * tp) // k AS BIGINT) AS prec_micro6
FROM pc_pick WHERE rn = 1"""


# ---------------------------------------------------------------------------
# Continuation batch 160: int8 scalar-quantization loss audit per
# embedding dimension (operators/similarity.sq8_audit).

ORACLE["sq8_audit"] = """
WITH s8_v AS (
  SELECT generate_subscripts(CAST(embedding AS DOUBLE[]), 1) - 1
           AS dim,
         unnest(CAST(embedding AS DOUBLE[])) AS x
  FROM embeddings),
s8_q AS (
  SELECT dim,
         CAST(floor(x * 1000000) AS BIGINT) AS q6,
         GREATEST(CAST(-127 AS BIGINT),
                  LEAST(CAST(127 AS BIGINT),
                        CAST(floor(x * 64) AS BIGINT))) AS q8,
         CASE WHEN ABS(CAST(floor(x * 64) AS BIGINT)) > 127
              THEN 1 ELSE 0 END AS sat
  FROM s8_v),
s8_e AS (
  SELECT dim, sat, q6 - 15625 * q8 AS e FROM s8_q)
SELECT CAST(dim AS INT) AS dim,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(sat) AS BIGINT) AS n_saturated,
       CAST(SUM(e * e) AS BIGINT) AS sum_sq_err,
       CAST(MAX(ABS(e)) AS BIGINT) AS max_abs_err,
       CAST((1000000 * SUM(ABS(e))) // COUNT(*) AS BIGINT)
         AS mean_err_micro6
FROM s8_e GROUP BY 1"""


# ---------------------------------------------------------------------------
# Continuation batch 161: crawl-politeness audit — sliding event-time
# RANGE window burst counts per host
# (functions/urls.politeness_audit).

ORACLE["politeness_audit"] = """
WITH pa_pages AS (
  -- sources/pages.py synthesis: url from (source, doc_id),
  -- warc_ts = epoch 1704067200 + doc_id seconds
  SELECT 'https://' || source || '.example.com/'
           || CAST(doc_id AS VARCHAR) AS url,
         1704067200 + doc_id AS sec0
  FROM documents),
pa_base AS (
  SELECT split_part(split_part(url, '//', 2), '/', 1) AS host,
         sec0 AS sec
  FROM pa_pages),
pa_win AS (
  SELECT host,
         COUNT(*) OVER (PARTITION BY host ORDER BY sec
             RANGE BETWEEN 9 PRECEDING AND CURRENT ROW) AS burst,
         sec - LAG(sec) OVER (PARTITION BY host ORDER BY sec)
           AS gap
  FROM pa_base)
SELECT host,
       CAST(COUNT(*) AS BIGINT) AS n_fetches,
       CAST(MAX(burst) AS BIGINT) AS max_burst,
       CAST(COALESCE(MIN(gap), 10) AS BIGINT) AS min_gap_s,
       CAST((1000 * MAX(burst)) // 10 AS BIGINT) AS max_rate_milli
FROM pa_win GROUP BY 1"""


# ---------------------------------------------------------------------------
# Continuation batch 162: Jain's fairness index of the doc
# distribution under host / lang / md5-bucket sharding keys
# (functions/textstats.jain_fairness).

ORACLE["jain_fairness"] = """
WITH jf_host AS (
  SELECT COUNT(*) AS c FROM documents GROUP BY source),
jf_lang AS (
  SELECT COUNT(*) AS c FROM documents GROUP BY lang),
jf_bucket AS (
  SELECT COUNT(*) AS c FROM documents
  GROUP BY instr('0123456789abcdef',
                 substr(md5(CAST(doc_id AS VARCHAR)), 32, 1)) - 1),
jf_all AS (
  SELECT 'host' AS grouping, COUNT(*) AS n_groups,
         SUM(c) AS n_docs, SUM(c * c) AS sum_sq FROM jf_host
  UNION ALL
  SELECT 'lang', COUNT(*), SUM(c), SUM(c * c) FROM jf_lang
  UNION ALL
  SELECT 'md5_bucket', COUNT(*), SUM(c), SUM(c * c) FROM jf_bucket)
SELECT grouping,
       CAST(n_groups AS BIGINT) AS n_groups,
       CAST(n_docs AS BIGINT) AS n_docs,
       CAST(sum_sq AS BIGINT) AS sum_sq,
       CAST((1000000 * n_docs * n_docs) // (n_groups * sum_sq)
         AS BIGINT) AS jain_micro6
FROM jf_all"""


# ---------------------------------------------------------------------------
# Continuation batch 163: tie-aware Spearman rho between the LM
# quality score and doc length — doubled-average-rank Pearson,
# HUGEINT-exact (functions/textstats.spearman_check).

ORACLE["spearman_check"] = f"""
WITH sp_score AS MATERIALIZED ({ORACLE["lm_quality"]}),
sp AS MATERIALIZED (
  SELECT s.lm_score_micro6 AS x, d.n_chars AS y
  FROM sp_score s JOIN documents d USING (doc_id)),
sp_rx AS (
  SELECT x, 2 * COALESCE(SUM(c) OVER (ORDER BY x
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           + c + 1 AS r2x
  FROM (SELECT x, COUNT(*) AS c FROM sp GROUP BY 1)),
sp_ry AS (
  SELECT y, 2 * COALESCE(SUM(c) OVER (ORDER BY y
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           + c + 1 AS r2y
  FROM (SELECT y, COUNT(*) AS c FROM sp GROUP BY 1)),
sp_j AS (
  SELECT rx.r2x, ry.r2y
  FROM sp JOIN sp_rx rx USING (x) JOIN sp_ry ry USING (y)),
sp_m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(r2x) AS BIGINT) AS sx,
         CAST(SUM(r2y) AS BIGINT) AS sy,
         CAST(SUM(r2x * r2x) AS BIGINT) AS sxx,
         CAST(SUM(r2y * r2y) AS BIGINT) AS syy,
         CAST(SUM(r2x * r2y) AS BIGINT) AS sxy
  FROM sp_j)
SELECT n,
       CAST(n * sxy - sx * sy AS BIGINT) AS cov_num,
       CAST(n * sxx - sx * sx AS BIGINT) AS var_x,
       CAST(n * syy - sy * sy AS BIGINT) AS var_y,
       CAST(SIGN(n * sxy - sx * sy) AS INT) AS rho_sign,
       CAST(CASE WHEN n * sxx - sx * sx > 0
                  AND n * syy - sy * sy > 0
            THEN (CAST(1000000 AS HUGEINT)
                  * (n * sxy - sx * sy) * (n * sxy - sx * sy))
                 // (CAST(n * sxx - sx * sx AS HUGEINT)
                     * (n * syy - sy * sy))
            ELSE 0 END AS BIGINT) AS rho2_micro6
FROM sp_m"""


# ---------------------------------------------------------------------------
# Continuation batch 164: quartile-symbol (SAX-style) length-3 motif
# census per event type (operators/events.series_motifs).

ORACLE["series_motifs"] = """
WITH sm_daily AS MATERIALIZED (
  SELECT event_type AS etype,
         epoch_us(ts) // 86400000000 AS day,
         COUNT(*) AS v
  FROM events GROUP BY 1, 2),
sm_hist AS (
  SELECT etype, v, COUNT(*) AS c FROM sm_daily GROUP BY 1, 2),
sm_sym AS (
  SELECT etype, v,
         substr('abcd',
                CAST((4 * COALESCE(SUM(c) OVER (PARTITION BY etype
                       ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                       AND 1 PRECEDING), 0))
                     // SUM(c) OVER (PARTITION BY etype) AS INT) + 1,
                1) AS sym
  FROM sm_hist),
sm_seq AS (
  SELECT d.etype, d.day, s.sym,
         LEAD(s.sym, 1) OVER (PARTITION BY d.etype ORDER BY d.day)
           AS s1,
         LEAD(s.sym, 2) OVER (PARTITION BY d.etype ORDER BY d.day)
           AS s2
  FROM sm_daily d JOIN sm_sym s ON s.etype = d.etype AND s.v = d.v),
sm_motifs AS (
  SELECT etype, sym || s1 || s2 AS motif FROM sm_seq
  WHERE s2 IS NOT NULL),
sm_counts AS (
  SELECT etype, motif, CAST(COUNT(*) AS BIGINT) AS n_windows
  FROM sm_motifs GROUP BY 1, 2)
SELECT etype AS event_type, motif, n_windows,
       CAST((1000000 * n_windows)
            // SUM(n_windows) OVER (PARTITION BY etype) AS BIGINT)
         AS share_micro6
FROM sm_counts"""


# ---------------------------------------------------------------------------
# Continuation batch 165: syllable-complexity (readability) profile
# per language (functions/textstats.readability_profile).

ORACLE["readability_profile"] = f"""
WITH rp_toks AS (
  SELECT lang,
         unnest(string_split_regex(text, '{SEP_CLASS}')) AS tok
  FROM documents),
rp_syl AS (
  SELECT lang,
         GREATEST(1, len(regexp_extract_all(lower(tok),
                                            '[aeiouy]+'))) AS s
  FROM rp_toks WHERE tok <> '')
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_words,
       CAST(SUM(s) AS BIGINT) AS n_syllables,
       CAST(SUM(CASE WHEN s >= 3 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_polysyllabic,
       CAST((1000000 * SUM(s)) // COUNT(*) AS BIGINT)
         AS syll_per_word_micro6,
       CAST((1000000 * SUM(CASE WHEN s >= 3 THEN 1 ELSE 0 END))
            // COUNT(*) AS BIGINT) AS poly_share_micro6
FROM rp_syl GROUP BY 1"""


# ---------------------------------------------------------------------------
# Continuation batch 166: roaring-style run/bitmap/list encoding
# audit of each language's doc_id set
# (functions/textstats.bitmap_runs).

ORACLE["bitmap_runs"] = """
WITH br_runs AS (
  SELECT lang, doc_id - ROW_NUMBER() OVER (PARTITION BY lang
             ORDER BY doc_id) AS grp
  FROM documents),
br_r AS (
  SELECT lang, grp, COUNT(*) AS len
  FROM br_runs GROUP BY 1, 2),
br_per AS (
  SELECT lang, SUM(len) AS n_docs, COUNT(*) AS n_runs,
         MAX(len) AS longest_run
  FROM br_r GROUP BY 1),
br_span AS (
  SELECT lang, MAX(doc_id) - MIN(doc_id) + 1 AS span
  FROM documents GROUP BY 1),
br_out AS (
  SELECT p.lang, p.n_docs, p.n_runs, s.span, p.longest_run,
         (1000 * p.n_docs) // p.n_runs AS avg_run_x1000,
         128 * p.n_runs AS bits_run,
         s.span AS bits_bitmap,
         64 * p.n_docs AS bits_list
  FROM br_per p JOIN br_span s USING (lang))
SELECT lang,
       CAST(n_docs AS BIGINT) AS n_docs,
       CAST(n_runs AS BIGINT) AS n_runs,
       CAST(span AS BIGINT) AS span,
       CAST(longest_run AS BIGINT) AS longest_run,
       CAST(avg_run_x1000 AS BIGINT) AS avg_run_x1000,
       CAST(bits_run AS BIGINT) AS bits_run,
       CAST(bits_bitmap AS BIGINT) AS bits_bitmap,
       CAST(bits_list AS BIGINT) AS bits_list,
       CASE WHEN bits_run <= bits_bitmap AND bits_run <= bits_list
            THEN 'run'
            WHEN bits_bitmap <= bits_list THEN 'bitmap'
            ELSE 'list' END AS verdict
FROM br_out"""


# ---------------------------------------------------------------------------
# Continuation batch 167: sweep-line max concurrency of fact-validity
# intervals per predicate (operators/triples.sweep_concurrency).

ORACLE["sweep_concurrency"] = f"""
WITH sc_iv AS MATERIALIZED ({ORACLE["triple_snapshots"]}),
sc_ev AS (
  SELECT pred, valid_from AS t, 1 AS delta FROM sc_iv
  UNION ALL
  SELECT pred, valid_to AS t, -1 AS delta FROM sc_iv
  WHERE valid_to IS NOT NULL),
sc_run AS (
  SELECT pred, t,
         SUM(delta) OVER (PARTITION BY pred ORDER BY t, delta
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS run
  FROM sc_ev),
sc_max AS (
  SELECT pred,
         CAST(MAX(run) AS BIGINT) AS max_concurrent,
         CAST(MIN(CASE WHEN run = mx THEN t END) AS BIGINT)
           AS t_at_max
  FROM (SELECT pred, t, run,
               MAX(run) OVER (PARTITION BY pred) AS mx
        FROM sc_run) GROUP BY 1),
sc_counts AS (
  SELECT pred, CAST(COUNT(*) AS BIGINT) AS n_intervals,
         CAST(SUM(CASE WHEN valid_to IS NULL THEN 1 ELSE 0 END)
           AS BIGINT) AS n_open_ended
  FROM sc_iv GROUP BY 1)
SELECT c.pred, c.n_intervals, c.n_open_ended, m.max_concurrent,
       m.t_at_max
FROM sc_counts c JOIN sc_max m USING (pred)"""


# ---------------------------------------------------------------------------
# Continuation batch 168: birthday-collision audit of truncated
# token hashes (functions/sketches.hash_collisions).

ORACLE["hash_collisions"] = f"""
WITH hc_vocab AS (
  SELECT DISTINCT lower(tok) AS tok FROM (
    SELECT unnest(string_split_regex(text, '{SEP_CLASS}')) AS tok
    FROM documents) WHERE tok <> ''),
hc_h AS (
  SELECT (instr('0123456789abcdef', substr(md5(tok), 1, 1)) - 1)
           * 4096
       + (instr('0123456789abcdef', substr(md5(tok), 2, 1)) - 1)
           * 256
       + (instr('0123456789abcdef', substr(md5(tok), 3, 1)) - 1)
           * 16
       + (instr('0123456789abcdef', substr(md5(tok), 4, 1)) - 1)
           AS h16
  FROM hc_vocab),
hc_fan AS (
  SELECT h16, unnest([8, 12, 16]) AS w FROM hc_h),
hc_cells AS (
  SELECT w, h16 // (65536 // (1 << w)) AS b, COUNT(*) AS c
  FROM hc_fan GROUP BY 1, 2)
SELECT CAST(w AS INT) AS width,
       CAST(SUM(c) AS BIGINT) AS n_keys,
       CAST(COUNT(*) AS BIGINT) AS n_buckets_used,
       CAST(SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT)
         AS n_colliding_keys,
       CAST(SUM((c * (c - 1)) // 2) AS BIGINT) AS n_collision_pairs,
       CAST((1000000 * SUM(c)) // COUNT(*) AS BIGINT)
         AS keys_per_bucket_micro6
FROM hc_cells GROUP BY 1"""


# ---------------------------------------------------------------------------
# Continuation batch 169: pairwise vocabulary Jaccard between
# languages (functions/textstats.lang_vocab_overlap).

ORACLE["lang_vocab_overlap"] = f"""
WITH lv_vocab AS MATERIALIZED (
  SELECT DISTINCT lang, lower(tok) AS tok FROM (
    SELECT lang,
           unnest(string_split_regex(text, '{SEP_CLASS}')) AS tok
    FROM documents) WHERE tok <> ''),
lv_sizes AS (
  SELECT lang, CAST(COUNT(*) AS BIGINT) AS v
  FROM lv_vocab GROUP BY 1),
lv_common AS (
  SELECT a.lang AS lang_a, b.lang AS lang_b,
         CAST(COUNT(*) AS BIGINT) AS n_common
  FROM lv_vocab a JOIN lv_vocab b
    ON a.tok = b.tok AND a.lang < b.lang
  GROUP BY 1, 2)
SELECT c.lang_a, c.lang_b, sa.v AS v_a, sb.v AS v_b, c.n_common,
       CAST((1000000 * c.n_common) // (sa.v + sb.v - c.n_common)
         AS BIGINT) AS jaccard_micro6,
       CAST((1000000 * c.n_common) // sa.v AS BIGINT)
         AS contain_a_micro6,
       CAST((1000000 * c.n_common) // sb.v AS BIGINT)
         AS contain_b_micro6
FROM lv_common c
JOIN lv_sizes sa ON sa.lang = c.lang_a
JOIN lv_sizes sb ON sb.lang = c.lang_b"""


# ---------------------------------------------------------------------------
# Continuation batch 170: PageRank convergence audit — exact L1/max
# delta between iterations 4 and 5 of the SAME integer recurrence
# (operators/graph_algos reuse; oracle reuses _pagerank_sql's pr4/pr5
# CTEs with a different final SELECT).

def _pagerank_delta_sql() -> str:
    chain = _pagerank_sql(5).rsplit("\nSELECT", 1)[0]
    return chain + """
SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes,
       CAST(SUM(ABS(a.rank_u - b.rank_u)) AS BIGINT) AS l1_delta_u,
       CAST(MAX(ABS(a.rank_u - b.rank_u)) AS BIGINT) AS max_delta_u,
       CAST((1000000 * SUM(ABS(a.rank_u - b.rank_u)))
            // SUM(b.rank_u) AS BIGINT) AS l1_share_micro6
FROM pr4 a JOIN pr5 b ON a.node = b.node"""


ORACLE["pagerank_delta"] = _q(_pagerank_delta_sql(), LINK_CTES)


# ---------------------------------------------------------------------------
# Continuation batch 171: IVF cell-quality audit — per-cell cosine
# tightness + argmax margin to the runner-up centroid
# (operators/similarity.ivf_quality).

ORACLE["ivf_quality"] = _assemble(
    SIM_CTES.lstrip(",").strip(),
    select="""
, iq_cents AS (
  SELECT vec_id AS cell, v AS cv, nrm AS cn
  FROM normed WHERE vec_id < 8),
iq_scored AS (
  SELECT n.vec_id, c.cell,
         CAST(floor(1000000 * list_dot_product(n.v, c.cv)
              / (n.nrm * c.cn)) AS BIGINT) AS s6
  FROM normed n CROSS JOIN iq_cents c),
iq_top2 AS (
  SELECT vec_id, cell, s6, r FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
        ORDER BY s6 DESC, cell) AS r
    FROM iq_scored) WHERE r <= 2),
iq_per AS (
  SELECT vec_id,
         MAX(CASE WHEN r = 1 THEN cell END) AS cell,
         MAX(CASE WHEN r = 1 THEN s6 END) AS own,
         MAX(CASE WHEN r = 2 THEN s6 END) AS alt
  FROM iq_top2 GROUP BY 1)
SELECT CAST(cell AS INT) AS cell,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(own) AS BIGINT) AS sum_own_s6,
       CAST(MIN(own) AS BIGINT) AS min_own_s6,
       CAST(SUM(own - alt) AS BIGINT) AS sum_margin_s6,
       CAST(MIN(own - alt) AS BIGINT) AS min_margin_s6,
       CAST(SUM(own - alt) // COUNT(*) AS BIGINT) AS avg_margin_s6
FROM iq_per GROUP BY 1""")


# ---------------------------------------------------------------------------
# Continuation batch 172: exact Kneedle knee of the host-coverage
# Pareto curve — integer cross-product argmax
# (functions/textstats.pareto_knee).

ORACLE["pareto_knee"] = """
WITH pk_counts AS (
  SELECT source AS host, COUNT(*) AS c FROM documents GROUP BY 1),
pk_curve AS (
  SELECT ROW_NUMBER() OVER (ORDER BY c DESC, host) AS k,
         SUM(c) OVER (ORDER BY c DESC, host
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum,
         COUNT(*) OVER () AS h,
         SUM(c) OVER () AS n
  FROM pk_counts),
pk_area AS (
  SELECT *, ABS(h * cum - n * k) AS area FROM pk_curve),
pk_pick AS (
  SELECT *, ROW_NUMBER() OVER (ORDER BY area DESC, k) AS r
  FROM pk_area)
SELECT CAST(h AS BIGINT) AS n_hosts,
       CAST(n AS BIGINT) AS n_docs,
       CAST(k AS BIGINT) AS knee_rank,
       CAST(cum AS BIGINT) AS knee_cum_docs,
       CAST(area AS BIGINT) AS knee_2area,
       CAST((1000000 * cum) // n AS BIGINT)
         AS knee_coverage_micro6,
       CAST((1000000 * k) // h AS BIGINT)
         AS knee_rank_share_micro6
FROM pk_pick WHERE r = 1"""


# ---------------------------------------------------------------------------
# Continuation batch 173: OOV audit of dev/test vs the train
# vocabulary (functions/textstats.oov_rate).

ORACLE["oov_rate"] = f"""
WITH ov_toks AS MATERIALIZED (
  SELECT CASE WHEN bucket < 204 THEN 'train'
              WHEN bucket < 230 THEN 'dev' ELSE 'test' END AS split,
         lower(tok) AS tok
  FROM (SELECT CAST(16 * (instr('0123456789abcdef',
                   substr(md5(CAST(doc_id AS VARCHAR)), 31, 1)) - 1)
              + (instr('0123456789abcdef',
                   substr(md5(CAST(doc_id AS VARCHAR)), 32, 1)) - 1)
              AS INT) AS bucket,
               unnest(string_split_regex(text, '{SEP_CLASS}')) AS tok
        FROM documents)
  WHERE tok <> ''),
ov_vocab AS MATERIALIZED (
  SELECT DISTINCT tok FROM ov_toks WHERE split = 'train'),
ov_ev AS MATERIALIZED (
  SELECT t.split, t.tok,
         CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END AS oov
  FROM ov_toks t LEFT JOIN ov_vocab v ON v.tok = t.tok
  WHERE t.split <> 'train'),
ov_tok AS (
  SELECT split, CAST(COUNT(*) AS BIGINT) AS n_tokens,
         CAST(SUM(oov) AS BIGINT) AS oov_tokens
  FROM ov_ev GROUP BY 1),
ov_type AS (
  SELECT split, CAST(COUNT(*) AS BIGINT) AS n_types,
         CAST(SUM(oov) AS BIGINT) AS oov_types
  FROM (SELECT DISTINCT split, tok, oov FROM ov_ev) GROUP BY 1)
SELECT t.split, t.n_tokens, y.n_types, t.oov_tokens, y.oov_types,
       CAST((1000000 * t.oov_tokens) // t.n_tokens AS BIGINT)
         AS oov_token_micro6,
       CAST((1000000 * y.oov_types) // y.n_types AS BIGINT)
         AS oov_type_micro6
FROM ov_tok t JOIN ov_type y USING (split)"""


# ---------------------------------------------------------------------------
# Continuation batch 176: truncated Borda-count fusion of the exact
# and ANN rankings (operators/similarity.borda_fusion) — same
# ranking CTEs as rrf_fusion, positional points instead of 1/(60+r).

ORACLE["borda_fusion"] = _assemble(
    SIM_CTES.lstrip(",").strip(),
    select=f"""
, bf_bucketed AS (
  SELECT n.vec_id, n.v, n.nrm, CAST("""
    + " + ".join(f"(CASE WHEN n.v[{i + 1}] >= 0 THEN {1 << i} ELSE 0 END)"
                 for i in range(ANN_SIGN_BITS)) + f""" AS INT) AS bucket
  FROM normed n),
bf_exact AS (
  SELECT query_id, rank, neighbor_id FROM (
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY q.vec_id
               ORDER BY {_RRF_SIM} DESC, c.vec_id) AS rank
    FROM normed q JOIN normed c ON q.vec_id <> c.vec_id
    WHERE q.vec_id < 50) WHERE rank <= {TOPK_NEIGHBORS}),
bf_ann AS (
  SELECT query_id, rank, neighbor_id FROM (
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY q.vec_id
               ORDER BY {_RRF_SIM} DESC, c.vec_id) AS rank
    FROM bf_bucketed q JOIN bf_bucketed c
      ON q.bucket = c.bucket AND q.vec_id <> c.vec_id
    WHERE q.vec_id < 50) WHERE rank <= 3),
bf_u AS (
  SELECT query_id, neighbor_id,
         CAST(MAX(rank) OVER (PARTITION BY query_id)
              - rank + 1 AS BIGINT) AS pts
  FROM bf_exact
  UNION ALL
  SELECT query_id, neighbor_id,
         CAST(MAX(rank) OVER (PARTITION BY query_id)
              - rank + 1 AS BIGINT) AS pts
  FROM bf_ann),
bf_s AS (
  SELECT query_id, neighbor_id,
         CAST(SUM(pts) AS BIGINT) AS borda_points,
         CAST(COUNT(*) AS BIGINT) AS n_lists
  FROM bf_u GROUP BY query_id, neighbor_id)
SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id,
       borda_points, n_lists
FROM (SELECT s.*, ROW_NUMBER() OVER (PARTITION BY query_id
          ORDER BY borda_points DESC, neighbor_id) AS rank
      FROM bf_s s)
WHERE rank <= 5""")


# ---------------------------------------------------------------------------
# Continuation batch 177: exact tie-aware Mann-Whitney U between
# every pair of languages' doc-length distributions
# (functions/textstats.mann_whitney).

ORACLE["mann_whitney"] = """
WITH mw_h AS MATERIALIZED (
  SELECT lang, n_chars AS v, CAST(COUNT(*) AS BIGINT) AS c
  FROM documents GROUP BY lang, n_chars
),
mw_grid AS (
  SELECT l.lang, va.v, COALESCE(h.c, 0) AS c
  FROM (SELECT DISTINCT lang FROM mw_h) l
  CROSS JOIN (SELECT DISTINCT v FROM mw_h) va
  LEFT JOIN mw_h h ON h.lang = l.lang AND h.v = va.v
),
mw_cum AS (
  SELECT lang, v, c,
         COALESCE(SUM(c) OVER (PARTITION BY lang ORDER BY v
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS below
  FROM mw_grid
),
mw_pairrows AS (
  SELECT a.lang AS group_a, b.lang AS group_b,
         a.c * (2 * b.below + b.c) AS u2c,
         a.c AS ca, b.c AS cb,
         (a.c + b.c) * (a.c + b.c) * (a.c + b.c) - (a.c + b.c) AS tie
  FROM mw_cum a JOIN mw_cum b
    ON a.v = b.v AND a.lang < b.lang
),
mw_agg AS (
  SELECT group_a, group_b,
         CAST(SUM(ca) AS BIGINT) AS n_a,
         CAST(SUM(cb) AS BIGINT) AS n_b,
         CAST(SUM(u2c) AS BIGINT) AS u2_a,
         CAST(SUM(tie) AS BIGINT) AS tie_cubes
  FROM mw_pairrows GROUP BY group_a, group_b
)
SELECT group_a, group_b, n_a, n_b, u2_a, tie_cubes,
       CAST(CASE WHEN u2_a > n_a * n_b THEN 1
                 WHEN u2_a < n_a * n_b THEN -1 ELSE 0 END AS INT)
         AS shift_sign,
       CAST(CASE WHEN n_a > 0 AND n_b > 0 AND
                 (CAST(n_a + n_b AS HUGEINT) * (n_a + n_b)
                  * (n_a + n_b) - (n_a + n_b)) - tie_cubes > 0
            THEN (CAST(1000000 AS HUGEINT)
                  * (u2_a - n_a * n_b) * (u2_a - n_a * n_b)
                  * 3 * (n_a + n_b) * (n_a + n_b - 1))
                 // (CAST(n_a AS HUGEINT) * n_b
                     * ((CAST(n_a + n_b AS HUGEINT)
                         * (n_a + n_b) * (n_a + n_b)
                         - (n_a + n_b)) - tie_cubes))
            ELSE 0 END AS BIGINT) AS z2_micro6
FROM mw_agg"""


# ---------------------------------------------------------------------------
# Continuation batch 178: content-defined chunking dedup census
# (operators/dedup.cdc_chunks).

ORACLE["cdc_chunks"] = """
WITH cdc_pos AS (
  SELECT doc_id, text, unnest(range(8, length(text) + 1)) AS i
  FROM documents WHERE length(text) > 0
),
cdc_bnd AS MATERIALIZED (
  SELECT doc_id, i FROM cdc_pos
  WHERE ((CAST(ascii(substr(text, i - 0, 1)) AS BIGINT) * 1 + CAST(ascii(substr(text, i - 1, 1)) AS BIGINT) * 31 + CAST(ascii(substr(text, i - 2, 1)) AS BIGINT) * 961 + CAST(ascii(substr(text, i - 3, 1)) AS BIGINT) * 29791 + CAST(ascii(substr(text, i - 4, 1)) AS BIGINT) * 923521 + CAST(ascii(substr(text, i - 5, 1)) AS BIGINT) * 28629151 + CAST(ascii(substr(text, i - 6, 1)) AS BIGINT) * 887503681 + CAST(ascii(substr(text, i - 7, 1)) AS BIGINT) * 27512614111)
         % 1048576) % 64 = 0
),
cdc_starts AS (
  SELECT doc_id,
         COALESCE(LAG(i) OVER (PARTITION BY doc_id ORDER BY i), 0) + 1
           AS s,
         i AS e
  FROM cdc_bnd
),
cdc_tail AS (
  SELECT d.doc_id, COALESCE(MAX(b.i), 0) + 1 AS s,
         length(d.text) AS e
  FROM documents d LEFT JOIN cdc_bnd b USING (doc_id)
  WHERE length(d.text) > 0
  GROUP BY d.doc_id, length(d.text)
  HAVING length(d.text) >= COALESCE(MAX(b.i), 0) + 1
),
cdc_chunks0 AS (
  SELECT c.doc_id, substr(d.text, c.s, c.e - c.s + 1) AS chunk
  FROM (SELECT doc_id, s, e FROM cdc_starts
        UNION ALL SELECT doc_id, s, e FROM cdc_tail) c
  JOIN documents d USING (doc_id)
),
cdc_per AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS multiplicity,
         CAST(length(chunk) AS BIGINT) AS len
  FROM cdc_chunks0 GROUP BY chunk
)
SELECT multiplicity, CAST(COUNT(*) AS BIGINT) AS n_chunks,
       CAST(SUM(len) AS BIGINT) AS n_bytes
FROM cdc_per GROUP BY multiplicity"""


# ---------------------------------------------------------------------------
# Continuation batch 179: exact Neyman allocation with Hamilton
# largest-remainder rounding (operators/sampling.neyman_allocation).

ORACLE["neyman_allocation"] = """
WITH ny_m AS (
  SELECT lang AS stratum, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(n_chars) AS BIGINT) AS sx,
         CAST(SUM(n_chars * n_chars) AS BIGINT) AS sxx
  FROM documents GROUP BY lang
),
ny_ss AS (
  SELECT stratum, n_docs, n_docs * sxx - sx * sx AS ss FROM ny_m
),
ny_s0 AS (
  SELECT *, CAST(floor(sqrt(CAST(ss AS DOUBLE))) AS BIGINT) AS s0
  FROM ny_ss
),
ny_w AS (
  SELECT stratum, n_docs, ss,
         s0 - CASE WHEN s0 * s0 > ss THEN 1 ELSE 0 END
            + CASE WHEN (s0 + 1) * (s0 + 1) <= ss THEN 1 ELSE 0 END
           AS w
  FROM ny_s0
),
ny_f AS (
  SELECT *, SUM(w) OVER () AS wsum FROM ny_w
),
ny_a AS (
  SELECT stratum, n_docs, ss, w,
         CASE WHEN wsum > 0 THEN (1000 * w) // wsum ELSE 0 END
           AS alloc_floor,
         CASE WHEN wsum > 0 THEN (1000 * w) % wsum ELSE 0 END AS rem,
         wsum
  FROM ny_f
),
ny_r AS (
  SELECT *,
         CASE WHEN wsum > 0
              THEN 1000 - SUM(alloc_floor) OVER () ELSE 0 END AS lft,
         ROW_NUMBER() OVER (ORDER BY rem DESC, stratum) AS rk
  FROM ny_a
)
SELECT stratum, n_docs, ss, w, alloc_floor,
       CAST(alloc_floor
            + CASE WHEN rk <= lft THEN 1 ELSE 0 END AS BIGINT)
         AS alloc
FROM ny_r"""


# ---------------------------------------------------------------------------
# Continuation batch 180: gapped length-2 sequential-pattern support
# (operators/events.seq_patterns).  The oracle uses the QUADRATIC
# pos<pos formulation — independent of the engine's linear
# prefix-count trick, which is the point of the cross-check.

ORACLE["seq_patterns"] = """
WITH sp0 AS (
  SELECT user_id, event_id, ts, event_type,
         CASE WHEN lag_ts IS NULL
              OR (epoch_us(ts) // 1000000)
                 - (epoch_us(lag_ts) // 1000000) > 1800
              THEN 1 ELSE 0 END AS new_sess
  FROM (SELECT user_id, event_id, ts, event_type,
               LAG(ts) OVER (PARTITION BY user_id
                             ORDER BY ts, event_id) AS lag_ts
        FROM events)
),
sp1 AS MATERIALIZED (
  SELECT *, CAST(SUM(new_sess) OVER (
      PARTITION BY user_id ORDER BY ts, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1 AS INT)
      AS session_id
  FROM sp0
),
sp_pos AS MATERIALIZED (
  SELECT user_id, session_id, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id, session_id
                            ORDER BY ts, event_id) AS pos
  FROM sp1
),
sp_pairs AS (
  SELECT a.event_type AS t1, b.event_type AS t2,
         a.user_id, a.session_id
  FROM sp_pos a JOIN sp_pos b
    ON a.user_id = b.user_id AND a.session_id = b.session_id
   AND a.pos < b.pos
),
sp_cnt AS (
  SELECT t1, t2, CAST(COUNT(*) AS BIGINT) AS n_pairs,
         CAST(COUNT(DISTINCT user_id || ':' || session_id) AS BIGINT)
             AS n_sessions
  FROM sp_pairs GROUP BY 1, 2
),
sp_tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n FROM (
    SELECT DISTINCT user_id, session_id FROM sp1)
)
SELECT c.t1, c.t2, c.n_pairs, c.n_sessions,
       CAST(c.n_sessions * 1000000 // t.n AS BIGINT) AS support_micro6
FROM sp_cnt c CROSS JOIN sp_tot t"""


# ---------------------------------------------------------------------------
# Continuation batch 181: ComplEx fact scoring — same no-drift device
# as TransE/DistMult: both engines evaluate the identical generated
# SQL expression string (operators/kg_embed.complex_score_sql).

from ..operators.kg_embed import complex_score_sql as _cx_score  # noqa: E402

ORACLE["complex_scores"] = _q(f"""
SELECT subj, pred, obj,
       CAST({_cx_score('subj', 'pred', 'obj')} AS BIGINT) AS score
FROM (SELECT DISTINCT subj, pred, obj FROM triples)""")


# ---------------------------------------------------------------------------
# Continuation batch 182: exact stress centrality over the co-mention
# graph (operators/graph_algos.stress_centrality).  Min-dist closure
# re-derived independently (recursive CTE), then the sigma recurrence
# unrolled per level as chained CTEs (the _pagerank_sql device), then
# Brandes' counting identity as two equi-joins.


def _stress_blocks(n_rounds: int = 8) -> str:
    parts = ["""
st_und AS MATERIALIZED (
  SELECT src AS a, dst AS b FROM comention WHERE src <> dst),
st_sym AS (SELECT a AS src, b AS dst FROM st_und
           UNION SELECT b AS src, a AS dst FROM st_und),
st_reach(s, node, dist) AS (
  SELECT DISTINCT src AS s, src AS node, 0 AS dist FROM st_sym
  UNION
  SELECT r.s, e.dst AS node, r.dist + 1
  FROM st_reach r JOIN st_sym e ON e.src = r.node
  WHERE r.dist < """ + str(n_rounds) + """),
st_pairs AS MATERIALIZED (
  SELECT s, node, CAST(MIN(dist) AS INT) AS dist
  FROM st_reach GROUP BY 1, 2),
st_sig0 AS (
  SELECT DISTINCT src AS s, src AS node, CAST(0 AS INT) AS dist,
         CAST(1 AS BIGINT) AS sigma
  FROM st_sym)"""]
    for d in range(1, n_rounds + 1):
        parts.append(f"""
st_sig{d} AS (
  SELECT p.s, e.dst AS node, CAST({d} AS INT) AS dist,
         CAST(SUM(p.sigma) AS BIGINT) AS sigma
  FROM st_sig{d - 1} p
  JOIN st_sym e ON e.src = p.node
  JOIN st_pairs m ON m.s = p.s AND m.node = e.dst AND m.dist = {d}
  GROUP BY p.s, e.dst)""")
    union = "\n  UNION ALL\n  ".join(
        f"SELECT * FROM st_sig{d}" for d in range(n_rounds + 1))
    parts.append(f"""
st_sig AS MATERIALIZED (
  {union})""")
    return ",".join(parts)


ORACLE["stress_centrality"] = _q("""
SELECT n.node,
       CAST(COALESCE(t.stress, 0) AS BIGINT) AS stress,
       CAST(COALESCE(t.n_geodesic_pairs, 0) AS BIGINT)
         AS n_geodesic_pairs
FROM (SELECT DISTINCT src AS node FROM st_sym) n
LEFT JOIN (
  SELECT p1.node AS node, SUM(p1.sigma * p2.sigma) AS stress,
         COUNT(*) AS n_geodesic_pairs
  FROM st_sig p1
  JOIN st_sig p2 ON p2.s = p1.node
  JOIN st_pairs p3 ON p3.s = p1.s AND p3.node = p2.node
  WHERE p1.s < p2.node AND p1.node <> p1.s AND p1.node <> p2.node
    AND p1.dist + p2.dist = p3.dist
  GROUP BY p1.node) t USING (node)""",
    LINK_CTES, COMENTION_CTES.strip(), _stress_blocks())


# ---------------------------------------------------------------------------
# Continuation batch 183: exact trimmed/winsorized location audit
# (functions/textstats.robust_location).

ORACLE["robust_location"] = """
WITH rl_h AS MATERIALIZED (
  SELECT lang AS grp, n_chars AS v, CAST(COUNT(*) AS BIGINT) AS c
  FROM documents GROUP BY 1, 2
),
rl_c AS (
  SELECT grp, v, c,
         COALESCE(SUM(c) OVER (PARTITION BY grp ORDER BY v
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS below,
         SUM(c) OVER (PARTITION BY grp) AS n
  FROM rl_h
),
rl_k AS (
  SELECT *, n * 5 // 100 AS k FROM rl_c
),
rl_kept AS (
  SELECT *,
         GREATEST(CAST(0 AS BIGINT),
                  LEAST(below + c, n - k)
                  - GREATEST(below + 1, k + 1) + 1) AS kept
  FROM rl_k
),
rl_agg AS (
  SELECT grp AS "group",
         CAST(MIN(n) AS BIGINT) AS n,
         CAST(MIN(k) AS BIGINT) AS k,
         CAST(MIN(CASE WHEN below + c >= k + 1 THEN v END)
              AS BIGINT) AS lo_cut,
         CAST(MIN(CASE WHEN below + c >= n - k THEN v END)
              AS BIGINT) AS hi_cut,
         CAST(SUM(v * kept) AS BIGINT) AS trimmed_sum
  FROM rl_kept GROUP BY grp
)
SELECT "group", n, k, lo_cut, hi_cut, trimmed_sum,
       CAST(1000000 * trimmed_sum // (n - 2 * k) AS BIGINT)
         AS trimmed_mean_micro6,
       CAST(trimmed_sum + k * (lo_cut + hi_cut) AS BIGINT)
         AS winsor_sum,
       CAST(1000000 * (trimmed_sum + k * (lo_cut + hi_cut)) // n
            AS BIGINT) AS winsor_mean_micro6
FROM rl_agg"""


# ---------------------------------------------------------------------------
# Continuation batch 184: sorted-neighborhood blocking audit
# (operators/linking.sorted_neighborhood).  The oracle ranks with one
# global window and joins on the rank band non-equi — independent of
# the engine's two-pass range-rank + explode-equi-join formulation.

ORACLE["sorted_neighborhood"] = """
WITH snm_r AS MATERIALIZED (
  SELECT doc_id, md5(text) AS h,
         ROW_NUMBER() OVER (ORDER BY substr(text, 1, 40), doc_id)
           AS rnk
  FROM documents
),
snm_p AS (
  SELECT a.h AS h_a, b.h AS h_b
  FROM snm_r a JOIN snm_r b
    ON b.rnk > a.rnk AND b.rnk <= a.rnk + 3
),
snm_s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_candidate_pairs,
         CAST(COALESCE(SUM(CASE WHEN h_a = h_b THEN 1 END), 0)
              AS BIGINT) AS n_captured
  FROM snm_p
),
snm_t AS (
  SELECT CAST(SUM(c * (c - 1) // 2) AS BIGINT) AS n_truth_pairs,
         CAST(SUM(c) AS BIGINT) AS n_records
  FROM (SELECT COUNT(*) AS c FROM documents GROUP BY md5(text))
)
SELECT n_records, CAST(4 AS INT) AS w, n_candidate_pairs,
       n_truth_pairs, n_captured,
       CAST(CASE WHEN n_truth_pairs > 0
            THEN 1000000 * n_captured // n_truth_pairs
            ELSE 0 END AS BIGINT) AS pc_micro6,
       CAST(CASE WHEN n_records > 1
            THEN 1000000 - (1000000 * n_candidate_pairs)
                 // (n_records * (n_records - 1) // 2)
            ELSE 1000000 END AS BIGINT) AS rr_micro6
FROM snm_t CROSS JOIN snm_s"""


# ---------------------------------------------------------------------------
# Continuation batch 185: consistent-hash ring balance audit — the
# ring positions evaluate from the SAME generated SQL string in both
# engines (operators/skew.ring_pos_sql no-drift device).

from ..operators.skew import ring_pos_sql as _ring_pos  # noqa: E402

ORACLE["hash_ring"] = f"""
WITH hr_nodes AS (
  SELECT DISTINCT CAST(source AS VARCHAR) AS node FROM documents
),
hr_vn AS MATERIALIZED (
  SELECT node, i,
         {_ring_pos("concat(node, '#', i)")} AS pos
  FROM hr_nodes, unnest(generate_series(0, 63)) AS g(i)
),
hr_ring AS (
  SELECT node, pos,
         LEAD(pos) OVER (ORDER BY pos, node, i) AS nxt,
         FIRST_VALUE(pos) OVER (ORDER BY pos, node, i
             ROWS BETWEEN UNBOUNDED PRECEDING
             AND UNBOUNDED FOLLOWING) AS fst
  FROM hr_vn
),
hr_arc AS (
  SELECT node,
         CASE WHEN nxt IS NOT NULL THEN nxt - pos
              ELSE fst + 4294967296 - pos END AS arc
  FROM hr_ring
),
hr_per AS (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS n_vnodes,
         CAST(SUM(arc) AS BIGINT) AS arc_sum,
         CAST(MAX(arc) AS BIGINT) AS max_arc
  FROM hr_arc GROUP BY node
),
hr_nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS nn FROM hr_per)
SELECT node, n_vnodes, arc_sum, max_arc,
       CAST(1000000 * arc_sum // 4294967296 AS BIGINT)
         AS share_micro6,
       CAST(1000000 * arc_sum * nn // 4294967296 AS BIGINT)
         AS skew_micro6
FROM hr_per CROSS JOIN hr_nn"""


# ---------------------------------------------------------------------------
# Continuation batch 186: Fagin Threshold-Algorithm depth audit over
# (LM quality x doc length) per language
# (functions/textstats.ta_depth_audit).

ORACLE["ta_depth_audit"] = f"""
WITH ta_score AS MATERIALIZED ({ORACLE["lm_quality"]}),
ta_base AS MATERIALIZED (
  SELECT d.lang AS grp, s.doc_id,
         CAST(s.lm_score_micro6 AS BIGINT) AS s1,
         CAST(d.n_chars AS BIGINT) AS s2,
         ROW_NUMBER() OVER (PARTITION BY d.lang
             ORDER BY s.lm_score_micro6 DESC, s.doc_id) AS r1,
         ROW_NUMBER() OVER (PARTITION BY d.lang
             ORDER BY d.n_chars DESC, s.doc_id) AS r2
  FROM ta_score s JOIN documents d USING (doc_id)
),
ta_m AS MATERIALIZED (
  SELECT *, LEAST(r1, r2) AS m, s1 + s2 AS comb FROM ta_base
),
ta_t AS (
  SELECT grp, depth,
         CAST(MAX(CASE WHEN r1 = depth THEN s1 END)
              + MAX(CASE WHEN r2 = depth THEN s2 END) AS BIGINT)
           AS threshold
  FROM ta_m CROSS JOIN (SELECT unnest([1, 2, 4, 8, 16, 32, 64, 128, 256, 512]) AS depth) dd
  GROUP BY grp, depth
),
ta_j AS (
  SELECT b.grp, t.depth, t.threshold,
         CASE WHEN b.m <= t.depth THEN 1 ELSE 0 END AS seen,
         CASE WHEN t.threshold IS NULL THEN NULL
              WHEN b.m <= t.depth AND b.comb >= t.threshold THEN 1
              ELSE 0 END AS above
  FROM ta_m b JOIN ta_t t ON t.grp = b.grp
)
SELECT grp AS "group", CAST(depth AS INT) AS depth, threshold,
       CAST(SUM(seen) AS BIGINT) AS n_seen,
       CAST(SUM(above) AS BIGINT) AS n_above,
       CAST(CASE WHEN MAX(threshold) IS NULL
                 OR SUM(above) >= 5 THEN 1 ELSE 0 END AS INT)
         AS stopped
FROM ta_j GROUP BY grp, depth, threshold"""


# ---------------------------------------------------------------------------
# Continuation batch 187: running-record census of per-type daily
# volumes (operators/events.record_census).

ORACLE["record_census"] = """
WITH rc_daily AS MATERIALIZED (
  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
         CAST(COUNT(*) AS BIGINT) AS v
  FROM events GROUP BY 1, 2
),
rc_f AS (
  SELECT event_type, v,
         MAX(v) OVER (PARTITION BY event_type ORDER BY day
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS pmax,
         MIN(v) OVER (PARTITION BY event_type ORDER BY day
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS pmin,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day)
           AS i
  FROM rc_daily
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_days,
       CAST(SUM(CASE WHEN pmax IS NULL OR v > pmax THEN 1 ELSE 0 END)
            AS BIGINT) AS n_record_highs,
       CAST(SUM(CASE WHEN pmin IS NULL OR v < pmin THEN 1 ELSE 0 END)
            AS BIGINT) AS n_record_lows,
       CAST(SUM(1000000 // i) AS BIGINT) AS expected_micro6
FROM rc_f GROUP BY event_type"""


# ---------------------------------------------------------------------------
# Continuation batch 188: exact tie-aware Kruskal-Wallis H across
# language length distributions (functions/textstats.kruskal_wallis).

ORACLE["kruskal_wallis"] = """
WITH kw_hist AS MATERIALIZED (
  SELECT lang AS grp, n_chars AS v, CAST(COUNT(*) AS BIGINT) AS c
  FROM documents GROUP BY 1, 2
),
kw_pooled AS MATERIALIZED (
  SELECT v, CAST(SUM(c) AS BIGINT) AS ct FROM kw_hist GROUP BY v
),
kw_r2 AS MATERIALIZED (
  SELECT v,
         CAST(2 * COALESCE(SUM(ct) OVER (ORDER BY v
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             + ct + 1 AS BIGINT) AS r2,
         CAST(ct * ct * ct - ct AS BIGINT) AS tie,
         ct
  FROM kw_pooled
),
kw_pg AS MATERIALIZED (
  SELECT grp, CAST(SUM(c) AS BIGINT) AS n,
         CAST(SUM(c * r2) AS BIGINT) AS r2_sum
  FROM kw_hist h JOIN kw_r2 USING (v) GROUP BY grp
),
kw_tot AS MATERIALIZED (
  SELECT CAST(SUM(ct) AS BIGINT) AS n_total,
         CAST(SUM(tie) AS BIGINT) AS tie_cubes
  FROM kw_r2
),
kw_g AS MATERIALIZED (
  SELECT grp, n, r2_sum, n_total, tie_cubes,
         CAST((CAST(1000000 AS HUGEINT) * r2_sum) // n AS BIGINT)
           AS mean_r2_micro6,
         CAST((CAST(3000000 AS HUGEINT) * r2_sum * r2_sum)
              // (CAST(n_total AS HUGEINT) * (n_total + 1) * n)
              AS BIGINT) AS term
  FROM kw_pg, kw_tot
),
kw_h AS (
  SELECT CAST(SUM(term) - 3 * (MAX(n_total) + 1) * 1000000
              AS BIGINT) AS h_micro6,
         MAX(n_total) AS nt, MAX(tie_cubes) AS tc
  FROM kw_g
),
kw_h2 AS (
  SELECT h_micro6,
         CASE WHEN (CAST(nt AS HUGEINT) * nt * nt - nt) - tc > 0
           THEN CAST((CAST(h_micro6 AS HUGEINT)
                      * (CAST(nt AS HUGEINT) * nt * nt - nt))
                     // ((CAST(nt AS HUGEINT) * nt * nt - nt) - tc)
                     AS BIGINT)
           ELSE h_micro6 END AS h_corr_micro6
  FROM kw_h
)
SELECT grp AS "group", n, r2_sum, mean_r2_micro6, n_total,
       tie_cubes, h_micro6, h_corr_micro6
FROM kw_g, kw_h2"""


# ---------------------------------------------------------------------------
# Continuation batch 189: paired Wilcoxon signed-rank activity-shift
# test (operators/events.wilcoxon_signed).

ORACLE["wilcoxon_signed"] = """
WITH ws_ev AS MATERIALIZED (
  SELECT user_id, epoch_us(ts) AS us FROM events
),
ws_mid AS MATERIALIZED (
  SELECT (MIN(us) + MAX(us)) // 2 AS mid FROM ws_ev
),
ws_d AS MATERIALIZED (
  SELECT user_id,
         CAST(SUM(CASE WHEN us > mid THEN 1 ELSE 0 END)
              - SUM(CASE WHEN us <= mid THEN 1 ELSE 0 END)
              AS BIGINT) AS d
  FROM ws_ev, ws_mid GROUP BY user_id
),
ws_hist AS MATERIALIZED (
  SELECT ABS(d) AS ad, CAST(COUNT(*) AS BIGINT) AS c,
         CAST(SUM(CASE WHEN d > 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS cp
  FROM ws_d GROUP BY 1
),
ws_nz AS MATERIALIZED (
  SELECT ad, c, cp,
         COALESCE(SUM(c) OVER (ORDER BY ad
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS below
  FROM ws_hist WHERE ad > 0
),
ws_agg AS (
  SELECT CAST(COALESCE(SUM(c), 0) AS BIGINT) AS n_used,
         CAST(COALESCE(SUM(cp * (2 * below + c + 1)), 0) AS BIGINT)
           AS w2_plus,
         CAST(COALESCE(SUM(c * c * c - c), 0) AS BIGINT)
           AS tie_cubes
  FROM ws_nz
),
ws_zero AS (
  SELECT CAST(COALESCE(SUM(c), 0) AS BIGINT) AS n_zero
  FROM ws_hist WHERE ad = 0
)
SELECT CAST(n_used + n_zero AS BIGINT) AS n_pairs, n_zero, n_used,
       w2_plus, tie_cubes,
       CAST(SIGN(2 * w2_plus - n_used * (n_used + 1)) AS INT)
         AS shift_sign,
       CASE WHEN n_used > 0 AND
                 2 * n_used * (n_used + 1) * (2 * n_used + 1)
                 - tie_cubes > 0
         THEN CAST((CAST(3000000 AS HUGEINT)
                    * (2 * w2_plus - n_used * (n_used + 1))
                    * (2 * w2_plus - n_used * (n_used + 1)))
                   // (CAST(2 AS HUGEINT) * n_used * (n_used + 1)
                       * (2 * n_used + 1) - tie_cubes) AS BIGINT)
         ELSE CAST(0 AS BIGINT) END AS z2_micro6
FROM ws_agg, ws_zero"""


# ---------------------------------------------------------------------------
# Continuation batch 190: Brier score + Murphy decomposition of the
# LM quality score as an English-detector forecast
# (functions/textstats.brier_decomposition over lm_quality x lang).
# Reuses the lm_quality statement verbatim as a nested subquery.

ORACLE["brier_decomposition"] = f"""
WITH bd_score AS MATERIALIZED ({ORACLE["lm_quality"]}),
bd_sc AS MATERIALIZED (
  SELECT q.lm_score_micro6 AS score,
         CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS pos
  FROM bd_score q JOIN documents d USING (doc_id)
),
bd_vals AS MATERIALIZED (
  SELECT score, CAST(COUNT(*) AS BIGINT) AS c,
         CAST(SUM(pos) AS BIGINT) AS s
  FROM bd_sc GROUP BY score
),
bd_b AS MATERIALIZED (
  SELECT score, c, s,
         COALESCE(SUM(c) OVER (ORDER BY score
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS cb,
         SUM(c) OVER () AS nt
  FROM bd_vals
),
bd_per AS MATERIALIZED (
  SELECT CAST(cb * 10 // nt AS INT) AS bucket,
         CAST(SUM(c) AS BIGINT) AS n,
         CAST(SUM(s) AS BIGINT) AS n_pos
  FROM bd_b GROUP BY 1
),
bd_tot AS MATERIALIZED (
  SELECT CAST(SUM(n) AS BIGINT) AS n_total,
         CAST(SUM(n_pos) AS BIGINT) AS n_pos_total
  FROM bd_per
),
bd_g AS MATERIALIZED (
  SELECT bucket, CAST(2 * bucket + 1 AS BIGINT) AS f20, n, n_pos,
         n_total, n_pos_total,
         CAST(1000000 * n_pos // n AS BIGINT) AS obar_micro6,
         CAST(n_pos * (2 * bucket + 1 - 20) * (2 * bucket + 1 - 20)
              + (n - n_pos) * (2 * bucket + 1) * (2 * bucket + 1)
              AS HUGEINT) AS bnum,
         CAST((CAST(1000000 AS HUGEINT)
               * (n * (2 * bucket + 1) - 20 * n_pos)
               * (n * (2 * bucket + 1) - 20 * n_pos))
              // (CAST(400 AS HUGEINT) * n_total * n) AS BIGINT)
           AS rel,
         CAST((CAST(1000000 AS HUGEINT)
               * (n_pos * n_total - n_pos_total * n)
               * (n_pos * n_total - n_pos_total * n))
              // (CAST(n_total AS HUGEINT) * n_total * n_total * n)
              AS BIGINT) AS res
  FROM bd_per, bd_tot
),
bd_sum AS (
  SELECT CAST((CAST(1000000 AS HUGEINT) * SUM(bnum))
              // (CAST(400 AS HUGEINT) * MAX(n_total)) AS BIGINT)
           AS brier_micro6,
         CAST(SUM(rel) AS BIGINT) AS reliability_micro6,
         CAST(SUM(res) AS BIGINT) AS resolution_micro6,
         CAST((CAST(1000000 AS HUGEINT) * MAX(n_pos_total)
               * (MAX(n_total) - MAX(n_pos_total)))
              // (CAST(MAX(n_total) AS HUGEINT) * MAX(n_total))
              AS BIGINT) AS uncertainty_micro6
  FROM bd_g
)
SELECT bucket, f20, n, n_pos, obar_micro6, n_total, n_pos_total,
       brier_micro6, reliability_micro6, resolution_micro6,
       uncertainty_micro6
FROM bd_g, bd_sum"""


# ---------------------------------------------------------------------------
# Continuation batch 191: fixed-point stationary distribution of the
# session transition chain (operators/events.markov_stationary) —
# the n_iter rounds unrolled as chained CTEs (the pagerank_fixed
# oracle device); every division floors, so the chain is bit-exact
# cross-engine.

def _markov_stationary_sql(n_iter: int = 5,
                           scale: int = 10**12) -> str:
    rounds = []
    prev = "ms_v0"
    for k in range(1, n_iter + 1):
        rounds.append(f"""
ms_f{k} AS (
  SELECT tr.next_t AS t,
         CAST(SUM((v.mass * tr.c) // o.n_i) AS BIGINT) AS in_u
  FROM ms_tr tr JOIN ms_out o ON tr.prev_t = o.prev_t
       JOIN {prev} v ON v.t = tr.prev_t
  GROUP BY 1),
ms_d{k} AS (
  SELECT CAST(COALESCE(SUM(v.mass), 0) AS BIGINT) AS dang
  FROM {prev} v LEFT JOIN ms_out o ON v.t = o.prev_t
  WHERE o.prev_t IS NULL),
ms_v{k} AS MATERIALIZED (
  SELECT ty.t,
         CAST(COALESCE(f.in_u, 0) + d.dang // mm.m AS BIGINT)
           AS mass
  FROM ms_types ty LEFT JOIN ms_f{k} f ON ty.t = f.t,
       ms_d{k} d, ms_mm mm)""")
        prev = f"ms_v{k}"
    return f"""
WITH ms_s0 AS (
  SELECT user_id, event_id, ts, event_type,
         CASE WHEN lag_ts IS NULL
              OR (epoch_us(ts) // 1000000)
                 - (epoch_us(lag_ts) // 1000000) > 1800
              THEN 1 ELSE 0 END AS new_sess
  FROM (SELECT user_id, event_id, ts, event_type,
               LAG(ts) OVER (PARTITION BY user_id
                             ORDER BY ts, event_id) AS lag_ts
        FROM events)),
ms_s1 AS MATERIALIZED (
  SELECT *, SUM(new_sess) OVER (
      PARTITION BY user_id ORDER BY ts, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    AS session_id
  FROM ms_s0),
ms_tr0 AS (
  SELECT event_type AS prev_t,
         LEAD(event_type) OVER (PARTITION BY user_id, session_id
             ORDER BY ts, event_id) AS next_t
  FROM ms_s1),
ms_tr AS MATERIALIZED (
  SELECT prev_t, next_t, CAST(COUNT(*) AS BIGINT) AS c
  FROM ms_tr0 WHERE next_t IS NOT NULL GROUP BY 1, 2),
ms_out AS MATERIALIZED (
  SELECT prev_t, CAST(SUM(c) AS BIGINT) AS n_i
  FROM ms_tr GROUP BY 1),
ms_emp AS MATERIALIZED (
  SELECT event_type AS t, CAST(COUNT(*) AS BIGINT) AS n_events
  FROM events GROUP BY 1),
ms_mm AS MATERIALIZED (SELECT COUNT(*) AS m FROM ms_emp),
ms_types AS MATERIALIZED (SELECT t FROM ms_emp),
ms_v0 AS MATERIALIZED (
  SELECT t, CAST({scale} // m AS BIGINT) AS mass
  FROM ms_types, ms_mm),{",".join(rounds)},
ms_tot AS (SELECT CAST(SUM(n_events) AS BIGINT) AS nt FROM ms_emp)
SELECT e.t AS event_type, e.n_events,
       CAST(1000000 * e.n_events // t2.nt AS BIGINT) AS emp_micro6,
       v.mass AS mass_u,
       CAST(v.mass // {scale // 10**6} AS BIGINT) AS stat_micro6
FROM ms_emp e JOIN ms_v{n_iter} v ON e.t = v.t, ms_tot t2"""


ORACLE["markov_stationary"] = _markov_stationary_sql()


# ---------------------------------------------------------------------------
# Continuation batch 192: resource-allocation link-prediction index
# over the entity co-mention graph
# (graph_algos.resource_allocation) — link_pred's wedge/anti-join
# shape with the pivot's degree folded in wedge-side as a per-term
# 1e6 // deg floor.

ORACLE["resource_allocation"] = _q(
    """
SELECT src, dst, cn, ra_micro6
FROM ra_cand c
WHERE NOT EXISTS (SELECT 1 FROM comention e
                  WHERE e.src = c.src AND e.dst = c.dst)""",
    LINK_CTES, COMENTION_CTES.strip(), """
ra_deg AS MATERIALIZED (
  SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS deg
  FROM com_sym GROUP BY src),
ra_cand AS MATERIALIZED (
  SELECT e1.dst AS src, e2.dst AS dst,
         CAST(COUNT(*) AS BIGINT) AS cn,
         CAST(SUM(1000000 // d.deg) AS BIGINT) AS ra_micro6
  FROM com_sym e1 JOIN com_sym e2
    ON e1.src = e2.src AND e1.dst < e2.dst
  JOIN ra_deg d ON d.node = e1.src
  GROUP BY 1, 2)""".strip())


# ---------------------------------------------------------------------------
# Continuation batch 193: Chao1 vocabulary-richness + Good's
# coverage per language (functions/textstats.chao1_richness).

ORACLE["chao1_richness"] = """
WITH ch_tc AS MATERIALIZED (
  SELECT lang, lower(tok) AS w, CAST(COUNT(*) AS BIGINT) AS c
  FROM (SELECT lang,
               unnest(list_filter(
                   string_split_regex(text, '[\\n \\t]'),
                   x -> x <> '')) AS tok
        FROM documents)
  GROUP BY 1, 2
)
SELECT lang,
       CAST(SUM(c) AS BIGINT) AS n_tokens,
       CAST(COUNT(*) AS BIGINT) AS vocab,
       CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
       CAST(SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2,
       CAST(1000 * COUNT(*)
            + (CAST(1000 AS HUGEINT)
               * SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END)
               * (SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) - 1))
              // (2 * (SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END) + 1))
            AS BIGINT) AS chao1_milli3,
       CAST(1000000 * (SUM(c)
            - SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END)) // SUM(c)
            AS BIGINT) AS coverage_micro6
FROM ch_tc GROUP BY lang"""


# ---------------------------------------------------------------------------
# Continuation batch 194: lead-lag cross-covariance between
# event-type daily series (operators/events.lead_lag) — the
# fano_factor dense grid, an equi-join on the shifted day index.

ORACLE["lead_lag"] = """
WITH ll_day AS (
  SELECT CAST(epoch_us(ts) // 86400000000 AS INT) AS day_idx,
         event_type AS etype
  FROM events),
ll_spine AS (SELECT DISTINCT day_idx FROM ll_day),
ll_types AS (SELECT DISTINCT etype FROM ll_day),
ll_sparse AS (
  SELECT etype, day_idx, CAST(COUNT(*) AS BIGINT) AS r
  FROM ll_day GROUP BY 1, 2),
ll_grid AS MATERIALIZED (
  SELECT t.etype, s.day_idx, COALESCE(x.r, 0) AS r
  FROM ll_types t CROSS JOIN ll_spine s
  LEFT JOIN ll_sparse x USING (etype, day_idx)),
ll_b AS (
  SELECT etype AS type_b, day_idx - lag AS day_a, r AS y,
         CAST(lag AS INT) AS lag
  FROM ll_grid, unnest(generate_series(0, 3)) AS t(lag)),
ll_j AS (
  SELECT a.etype AS type_a, b.type_b, b.lag, a.r AS x, b.y
  FROM ll_grid a JOIN ll_b b ON a.day_idx = b.day_a
  WHERE a.etype <> b.type_b),
ll_per AS (
  SELECT type_a, type_b, lag,
         CAST(COUNT(*) AS BIGINT) AS n_days,
         CAST(SUM(x) AS BIGINT) AS sx,
         CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * y) AS BIGINT) AS sxy
  FROM ll_j GROUP BY 1, 2, 3),
ll_c AS (
  SELECT *,
         CAST(CAST(n_days AS HUGEINT) * sxy
              - CAST(sx AS HUGEINT) * sy AS BIGINT) AS cov_num
  FROM ll_per)
SELECT type_a, type_b, lag, n_days, sx, sy, sxy, cov_num,
       CAST(CASE WHEN ROW_NUMBER() OVER (
                PARTITION BY type_a, type_b
                ORDER BY cov_num DESC, lag ASC) = 1
            THEN 1 ELSE 0 END AS INT) AS is_best
FROM ll_c"""


# ---------------------------------------------------------------------------
# Continuation batch 195: dominant principal component by integer
# power iteration (operators/similarity.embedding_pca) — rounds
# unrolled as chained CTEs, HUGEINT accumulation, truncating
# renormalization (both engines truncate toward zero).

def _embedding_pca_sql(n_iter: int = 4, qscale: int = 1024,
                       vscale: int = 10**6) -> str:
    rounds = []
    prev = "pc_v0"
    for k in range(1, n_iter + 1):
        rounds.append(f"""
pc_t{k} AS MATERIALIZED (
  SELECT x.vec_id, CAST(SUM(x.xq * v.vu) AS BIGINT) AS t
  FROM pc_x x JOIN {prev} v USING (dim) GROUP BY 1),
pc_w{k} AS (
  SELECT x.dim, SUM(CAST(x.xq AS HUGEINT) * t.t) AS w
  FROM pc_x x JOIN pc_t{k} t USING (vec_id) GROUP BY 1),
pc_sv{k} AS (
  SELECT SUM(CAST(s.sxd AS HUGEINT) * v.vu) AS sv
  FROM {prev} v JOIN pc_sx s USING (dim)),
pc_c{k} AS MATERIALIZED (
  SELECT w.dim,
         (SELECT n FROM pc_n) * w.w
         - CAST(s.sxd AS HUGEINT) * (SELECT sv FROM pc_sv{k})
           AS cvd
  FROM pc_w{k} w JOIN pc_sx s USING (dim)),
pc_m{k} AS (SELECT MAX(ABS(cvd)) AS m FROM pc_c{k}),
pc_v{k} AS MATERIALIZED (
  SELECT dim,
         CASE WHEN (SELECT m FROM pc_m{k}) > 0
           THEN CAST((cvd * {vscale})
                     // (SELECT m FROM pc_m{k}) AS BIGINT)
           ELSE CAST(0 AS BIGINT) END AS vu
  FROM pc_c{k})""")
        prev = f"pc_v{k}"
    return f"""
WITH pc_x AS MATERIALIZED (
  SELECT vec_id,
         generate_subscripts(CAST(embedding AS DOUBLE[]), 1) - 1
           AS dim,
         CAST(floor(unnest(CAST(embedding AS DOUBLE[]))
                    * {qscale}) AS BIGINT) AS xq
  FROM embeddings),
pc_n AS (SELECT CAST(COUNT(DISTINCT vec_id) AS HUGEINT) AS n
         FROM pc_x),
pc_sx AS MATERIALIZED (
  SELECT dim, CAST(SUM(xq) AS BIGINT) AS sxd
  FROM pc_x GROUP BY dim),
pc_v0 AS MATERIALIZED (
  SELECT dim,
         CAST(CASE WHEN dim = 0 THEN {vscale} ELSE 0 END AS BIGINT)
           AS vu
  FROM pc_sx),{",".join(rounds)}
SELECT CAST(dim AS INT) AS dim_idx, CAST(vu AS BIGINT) AS v_u
FROM pc_v{n_iter}"""


ORACLE["embedding_pca"] = _embedding_pca_sql()


# ---------------------------------------------------------------------------
# Continuation batch 196: MRR / Hits@k / top-5 overlap of the BM25
# ranking vs the ideal raw-tf ordering
# (functions/textstats.mrr_eval) — BM25_CTES reused verbatim.

ORACLE["mrr_eval"] = _q("""
SELECT p.term, p.best_doc, p.best_rank, p.rr_micro6, p.hit1,
       p.hit5, p.overlap5, s.n_terms, s.mrr_micro6,
       s.hits1_micro6, s.hits5_micro6
FROM mr_per p, mr_sum s""", BM25_CTES + """,
mr_ranked AS MATERIALIZED (
  SELECT term, doc_id,
         ROW_NUMBER() OVER (PARTITION BY term
             ORDER BY score_micro6 DESC, doc_id) AS rank
  FROM bm_scored),
mr_ideal AS MATERIALIZED (
  SELECT term, doc_id,
         ROW_NUMBER() OVER (PARTITION BY term
             ORDER BY tf DESC, doc_id) AS irank
  FROM bm_tf),
mr_best AS (
  SELECT term, doc_id AS best_doc FROM mr_ideal WHERE irank = 1),
mr_br AS (
  SELECT b.term, b.best_doc,
         CAST(COALESCE(r.rank, 0) AS INT) AS best_rank
  FROM mr_best b LEFT JOIN mr_ranked r
    ON r.term = b.term AND r.doc_id = b.best_doc
       AND r.rank <= 10),
mr_ov AS (
  SELECT r.term, CAST(COUNT(*) AS BIGINT) AS overlap5
  FROM mr_ranked r JOIN mr_ideal i
    ON i.term = r.term AND i.doc_id = r.doc_id
  WHERE r.rank <= 5 AND i.irank <= 5 GROUP BY 1),
mr_per AS MATERIALIZED (
  SELECT br.term, br.best_doc, br.best_rank,
         CAST(CASE WHEN br.best_rank > 0
              THEN 1000000 // br.best_rank ELSE 0 END AS BIGINT)
           AS rr_micro6,
         CAST(CASE WHEN br.best_rank = 1 THEN 1 ELSE 0 END AS INT)
           AS hit1,
         CAST(CASE WHEN br.best_rank BETWEEN 1 AND 5
              THEN 1 ELSE 0 END AS INT) AS hit5,
         CAST(COALESCE(o.overlap5, 0) AS BIGINT) AS overlap5
  FROM mr_br br LEFT JOIN mr_ov o USING (term)),
mr_sum AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_terms,
         CAST(SUM(rr_micro6) // COUNT(*) AS BIGINT) AS mrr_micro6,
         CAST(1000000 * SUM(hit1) // COUNT(*) AS BIGINT)
           AS hits1_micro6,
         CAST(1000000 * SUM(hit5) // COUNT(*) AS BIGINT)
           AS hits5_micro6
  FROM mr_per)""")


# ---------------------------------------------------------------------------
# Continuation batch 197: local clustering coefficients + global
# transitivity over the entity co-mention graph
# (graph_algos.clustering_coeffs).

ORACLE["clustering_coeffs"] = _q(
    """
SELECT p.node, p.degree, p.n_triangles, p.cc_micro6,
       t.n_nodes, t.trans_micro6
FROM cc_per p, cc_tot t""",
    LINK_CTES, COMENTION_CTES.strip(), """
cc_deg AS MATERIALIZED (
  SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS degree
  FROM com_sym GROUP BY src),
cc_tri3 AS (
  SELECT e1.src AS x, e1.dst AS y, e3.dst AS z
  FROM comention e1
  JOIN comention e2 ON e2.src = e1.dst
  JOIN comention e3 ON e3.src = e1.src AND e3.dst = e2.dst),
cc_cnt AS (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS n_triangles
  FROM (SELECT x AS node FROM cc_tri3
        UNION ALL SELECT y FROM cc_tri3
        UNION ALL SELECT z FROM cc_tri3)
  GROUP BY node),
cc_per AS MATERIALIZED (
  SELECT d.node, d.degree,
         CAST(COALESCE(c.n_triangles, 0) AS BIGINT) AS n_triangles,
         CAST(CASE WHEN d.degree > 1
              THEN (1000000 * 2 * COALESCE(c.n_triangles, 0))
                   // (d.degree * (d.degree - 1))
              ELSE 0 END AS BIGINT) AS cc_micro6
  FROM cc_deg d LEFT JOIN cc_cnt c USING (node)),
cc_tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes,
         CAST(CASE WHEN SUM(degree * (degree - 1)) > 0
              THEN (CAST(1000000 AS HUGEINT) * SUM(n_triangles))
                   // (SUM(degree * (degree - 1)) // 2)
              ELSE 0 END AS BIGINT) AS trans_micro6
  FROM cc_per)""".strip())


# ---------------------------------------------------------------------------
# Continuation batch 198: Cochran's Q omnibus across the three cheap
# curation gates (functions/textstats.cochran_q).

ORACLE["cochran_q"] = f"""
WITH cq_toks AS (
  SELECT doc_id,
         unnest(string_split_regex(text, '{SEP_CLASS}')) AS tok
  FROM documents),
cq_counts AS (
  SELECT doc_id, COUNT(*) AS n_tokens,
         SUM(CASE WHEN lower(tok) IN ({_STOP_IN}) THEN 1 ELSE 0 END)
           AS n_stop,
         COUNT(DISTINCT tok) AS n_dist
  FROM cq_toks WHERE tok <> '' GROUP BY 1),
cq_g AS MATERIALIZED (
  SELECT d.lang,
         CASE WHEN length(d.text) >= 200 THEN 1 ELSE 0 END AS a,
         CASE WHEN 20 * COALESCE(c.n_stop, 0)
                   >= COALESCE(c.n_tokens, 0)
              THEN 1 ELSE 0 END AS b,
         CASE WHEN 3 * COALESCE(c.n_dist, 0)
                   >= COALESCE(c.n_tokens, 0)
              THEN 1 ELSE 0 END AS c
  FROM documents d LEFT JOIN cq_counts c ON c.doc_id = d.doc_id),
cq_a AS (
  SELECT lang,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(a) AS BIGINT) AS c_len,
         CAST(SUM(b) AS BIGINT) AS c_stop,
         CAST(SUM(c) AS BIGINT) AS c_div,
         CAST(SUM(a + b + c) AS BIGINT) AS sum_r,
         CAST(SUM((a + b + c) * (a + b + c)) AS BIGINT) AS sum_r2
  FROM cq_g GROUP BY lang)
SELECT lang, n_docs, c_len, c_stop, c_div, sum_r, sum_r2,
       CASE WHEN 3 * sum_r - sum_r2 > 0 THEN
         CAST((CAST(2000000 AS HUGEINT)
               * (3 * (CAST(c_len AS HUGEINT) * c_len
                       + CAST(c_stop AS HUGEINT) * c_stop
                       + CAST(c_div AS HUGEINT) * c_div)
                  - CAST(c_len + c_stop + c_div AS HUGEINT)
                    * (c_len + c_stop + c_div)))
              // (3 * sum_r - sum_r2) AS BIGINT)
       ELSE CAST(0 AS BIGINT) END AS q_micro6
FROM cq_a"""


# ---------------------------------------------------------------------------
# Continuation batch 199: Kendall's W concordance across the three
# cheap quality rankers (functions/textstats.kendall_w).

ORACLE["kendall_w"] = f"""
WITH kw3_toks AS (
  SELECT doc_id,
         unnest(string_split_regex(text, '{SEP_CLASS}')) AS tok
  FROM documents),
kw3_counts AS (
  SELECT doc_id,
         COUNT(DISTINCT tok) AS n_dist,
         SUM(CASE WHEN lower(tok) IN ({_STOP_IN}) THEN 1 ELSE 0 END)
           AS n_stop
  FROM kw3_toks WHERE tok <> '' GROUP BY 1),
kw3_f AS MATERIALIZED (
  SELECT d.lang, d.doc_id,
         CAST(length(d.text) AS BIGINT) AS v1,
         CAST(COALESCE(c.n_dist, 0) AS BIGINT) AS v2,
         CAST(COALESCE(c.n_stop, 0) AS BIGINT) AS v3
  FROM documents d LEFT JOIN kw3_counts c ON c.doc_id = d.doc_id),
kw3_h1 AS MATERIALIZED (
  SELECT lang, v1 AS v, CAST(COUNT(*) AS BIGINT) AS c,
         CAST(2 * COALESCE(SUM(COUNT(*)) OVER (PARTITION BY lang
             ORDER BY v1 ROWS BETWEEN UNBOUNDED PRECEDING
             AND 1 PRECEDING), 0) + COUNT(*) + 1 AS BIGINT) AS r2,
         CAST(COUNT(*) * COUNT(*) * COUNT(*) - COUNT(*) AS BIGINT)
           AS tie
  FROM kw3_f GROUP BY lang, v1),
kw3_h2 AS MATERIALIZED (
  SELECT lang, v2 AS v, CAST(COUNT(*) AS BIGINT) AS c,
         CAST(2 * COALESCE(SUM(COUNT(*)) OVER (PARTITION BY lang
             ORDER BY v2 ROWS BETWEEN UNBOUNDED PRECEDING
             AND 1 PRECEDING), 0) + COUNT(*) + 1 AS BIGINT) AS r2,
         CAST(COUNT(*) * COUNT(*) * COUNT(*) - COUNT(*) AS BIGINT)
           AS tie
  FROM kw3_f GROUP BY lang, v2),
kw3_h3 AS MATERIALIZED (
  SELECT lang, v3 AS v, CAST(COUNT(*) AS BIGINT) AS c,
         CAST(2 * COALESCE(SUM(COUNT(*)) OVER (PARTITION BY lang
             ORDER BY v3 ROWS BETWEEN UNBOUNDED PRECEDING
             AND 1 PRECEDING), 0) + COUNT(*) + 1 AS BIGINT) AS r2,
         CAST(COUNT(*) * COUNT(*) * COUNT(*) - COUNT(*) AS BIGINT)
           AS tie
  FROM kw3_f GROUP BY lang, v3),
kw3_t AS (
  SELECT lang,
         (SELECT SUM(tie) FROM kw3_h1 h WHERE h.lang = t.lang)
         + (SELECT SUM(tie) FROM kw3_h2 h WHERE h.lang = t.lang)
         + (SELECT SUM(tie) FROM kw3_h3 h WHERE h.lang = t.lang)
           AS tie_cubes
  FROM (SELECT DISTINCT lang FROM kw3_f) t),
kw3_r AS (
  SELECT f.lang,
         h1.r2 + h2.r2 + h3.r2 AS r2
  FROM kw3_f f
  JOIN kw3_h1 h1 ON h1.lang = f.lang AND h1.v = f.v1
  JOIN kw3_h2 h2 ON h2.lang = f.lang AND h2.v = f.v2
  JOIN kw3_h3 h3 ON h3.lang = f.lang AND h3.v = f.v3),
kw3_a AS (
  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(r2 * r2) AS BIGINT) AS sum_r2_sq
  FROM kw3_r GROUP BY lang)
SELECT a.lang, a.n_docs, a.sum_r2_sq,
       CAST(t.tie_cubes AS BIGINT) AS tie_cubes,
       CASE WHEN a.n_docs > 1 AND
                 9 * (CAST(a.n_docs AS HUGEINT) * a.n_docs
                      * a.n_docs - a.n_docs)
                 - 3 * t.tie_cubes > 0 THEN
         CAST((CAST(3000000 AS HUGEINT)
               * (CAST(a.n_docs AS HUGEINT) * a.sum_r2_sq
                  - (CAST(3 AS HUGEINT) * a.n_docs * (a.n_docs + 1))
                    * (CAST(3 AS HUGEINT) * a.n_docs
                       * (a.n_docs + 1))))
              // (CAST(a.n_docs AS HUGEINT)
                  * (9 * (CAST(a.n_docs AS HUGEINT) * a.n_docs
                          * a.n_docs - a.n_docs)
                     - 3 * t.tie_cubes)) AS BIGINT)
       ELSE CAST(0 AS BIGINT) END AS w_micro6
FROM kw3_a a JOIN kw3_t t USING (lang)"""


# ---------------------------------------------------------------------------
# Continuation batch 200: American-Soundex phonetic blocking profile
# (operators/linking.soundex_blocks) — the char-level pipeline
# replayed relationally (h/w drop BEFORE the run-collapse LAG, vowel
# rows break runs but emit nothing).

ORACLE["soundex_blocks"] = _q(
    """
SELECT b.sdx, b.n_tokens, b.n_entities,
       CAST(CASE WHEN b.n_entities > 50 THEN 1 ELSE 0 END AS INT)
         AS purged
FROM sb_blocks b""",
    LINK_CTES, """
sb_ents AS (SELECT DISTINCT lower(subj) AS ent FROM triples),
sb_toks AS MATERIALIZED (
  SELECT DISTINCT ent, tok FROM (
    SELECT ent, unnest(string_split_regex(ent, '[^a-z]+')) AS tok
    FROM sb_ents)
  WHERE regexp_full_match(tok, '[a-z]+')),
sb_tk AS (SELECT DISTINCT tok FROM sb_toks),
sb_ch AS (
  SELECT tok, CAST(i AS INT) AS i, substr(tok, CAST(i AS INT), 1)
           AS ch
  FROM sb_tk, unnest(generate_series(1, length(tok))) AS t(i)),
sb_coded AS (
  SELECT tok, i,
         CASE WHEN ch IN ('a','e','i','o','u','y') THEN '0'
              WHEN ch IN ('h','w') THEN NULL
              ELSE translate(ch, 'bfpvcgjkqsxzdtlmnr',
                             '111122222222334556') END AS code
  FROM sb_ch),
sb_kept AS (
  SELECT * FROM sb_coded WHERE code IS NOT NULL OR i = 1),
sb_run AS (
  SELECT * FROM (
    SELECT tok, i, code,
           LAG(code) OVER (PARTITION BY tok ORDER BY i) AS prev
    FROM sb_kept)
  WHERE prev IS NULL OR code IS NULL OR code <> prev),
sb_dd AS (
  SELECT * FROM (
    SELECT tok, i, code,
           ROW_NUMBER() OVER (PARTITION BY tok ORDER BY i) AS rn
    FROM sb_run
    WHERE i > 1 AND code IS NOT NULL AND code <> '0')
  WHERE rn <= 3),
sb_d AS (
  SELECT tok, string_agg(code, '' ORDER BY i) AS d
  FROM sb_dd GROUP BY tok),
sb_sdx AS MATERIALIZED (
  SELECT k.tok,
         upper(substr(k.tok, 1, 1))
         || rpad(COALESCE(d.d, ''), 3, '0') AS sdx
  FROM sb_tk k LEFT JOIN sb_d d ON d.tok = k.tok),
sb_blocks AS (
  SELECT s.sdx,
         CAST(COUNT(DISTINCT t.tok) AS BIGINT) AS n_tokens,
         CAST(COUNT(DISTINCT t.ent) AS BIGINT) AS n_entities
  FROM sb_toks t JOIN sb_sdx s ON s.tok = t.tok
  GROUP BY s.sdx)""".strip())


# ---------------------------------------------------------------------------
# Continuation batch 201: MAD-scaled Burrows' Delta between host
# styles (functions/textstats.stylometric_delta).

ORACLE["stylometric_delta"] = """
WITH sd_tc AS MATERIALIZED (
  SELECT source, lower(tok) AS w, CAST(COUNT(*) AS BIGINT) AS c
  FROM (SELECT source,
               unnest(list_filter(
                   string_split_regex(text, '[\\n \\t]'),
                   x -> x <> '')) AS tok
        FROM documents)
  GROUP BY 1, 2),
sd_tot AS (
  SELECT source, CAST(SUM(c) AS BIGINT) AS n FROM sd_tc GROUP BY 1),
sd_topk AS MATERIALIZED (
  SELECT w FROM (
    SELECT w, ROW_NUMBER() OVER (ORDER BY SUM(c) DESC, w) AS rk
    FROM sd_tc GROUP BY w)
  WHERE rk <= 30),
sd_grid AS MATERIALIZED (
  SELECT t.source, k.w,
         CAST(1000000 * COALESCE(c.c, 0) // t.n AS BIGINT) AS rate
  FROM sd_tot t CROSS JOIN sd_topk k
  LEFT JOIN sd_tc c ON c.source = t.source AND c.w = k.w),
sd_med AS (
  SELECT w, MAX(CASE WHEN rn = (m - 1) // 2 + 1 THEN rate END)
           AS med
  FROM (SELECT w, rate,
               ROW_NUMBER() OVER (PARTITION BY w
                   ORDER BY rate, source) AS rn,
               COUNT(*) OVER (PARTITION BY w) AS m
        FROM sd_grid)
  GROUP BY w),
sd_ad AS MATERIALIZED (
  SELECT g.source, g.w, g.rate, d.med,
         ABS(g.rate - d.med) AS ad
  FROM sd_grid g JOIN sd_med d USING (w)),
sd_mad AS (
  SELECT w, MAX(CASE WHEN rn = (m - 1) // 2 + 1 THEN ad END) AS mad
  FROM (SELECT w, ad,
               ROW_NUMBER() OVER (PARTITION BY w
                   ORDER BY ad, source) AS rn,
               COUNT(*) OVER (PARTITION BY w) AS m
        FROM sd_ad)
  GROUP BY w),
sd_prof AS MATERIALIZED (
  SELECT a.source, a.w,
         CAST((1000000 * (a.rate - a.med)) // (m.mad + 1)
              AS BIGINT) AS s
  FROM sd_ad a JOIN sd_mad m USING (w))
SELECT a.source AS source_a, b.source AS source_b,
       CAST(COUNT(*) AS BIGINT) AS n_tokens_used,
       CAST(SUM(ABS(a.s - b.s)) // COUNT(*) AS BIGINT)
         AS delta_micro6
FROM sd_prof a JOIN sd_prof b
  ON a.w = b.w AND a.source < b.source
GROUP BY 1, 2"""


# ---------------------------------------------------------------------------
# Continuation batch 202: winnowing fingerprint near-dup candidates
# (operators/dedup.winnow_dups) — Schleimer/Wilkerson/Aiken window
# minima with the rightmost-tie rule.

ORACLE["winnow_dups"] = """
WITH wn_toks AS (
  SELECT doc_id, lower(tok) AS t,
         ROW_NUMBER() OVER (PARTITION BY doc_id
             ORDER BY piece_idx) - 1 AS i
  FROM (SELECT doc_id,
               unnest(string_split_regex(text, '[\\n \\t]')) AS tok,
               generate_subscripts(
                   string_split_regex(text, '[\\n \\t]'), 1)
                 AS piece_idx
        FROM documents)
  WHERE tok <> ''),
wn_g0 AS (
  SELECT doc_id, i,
         t || ' ' || LEAD(t, 1) OVER w || ' '
           || LEAD(t, 2) OVER w AS g,
         LEAD(t, 2) OVER w AS ok
  FROM wn_toks
  WINDOW w AS (PARTITION BY doc_id ORDER BY i)),
wn_grams AS MATERIALIZED (
  SELECT doc_id,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY i) - 1
           AS gi,
         md5(g) AS h,
         COUNT(*) OVER (PARTITION BY doc_id) AS ng
  FROM wn_g0 WHERE ok IS NOT NULL),
wn_mn AS MATERIALIZED (
  SELECT * FROM (
    SELECT doc_id, gi, ng,
           MIN(h) OVER (PARTITION BY doc_id ORDER BY gi
               ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS mn
    FROM wn_grams)
  WHERE gi <= ng - 4),
wn_fp AS (
  SELECT s.doc_id, s.mn AS fp, MAX(g.gi) AS fp_pos
  FROM wn_mn s JOIN wn_grams g
    ON g.doc_id = s.doc_id AND g.gi BETWEEN s.gi AND s.gi + 3
       AND g.h = s.mn
  GROUP BY s.doc_id, s.gi, s.mn),
wn_sel AS MATERIALIZED (
  SELECT DISTINCT doc_id, fp FROM wn_fp),
wn_nfp AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n
  FROM wn_sel GROUP BY 1),
wn_cold AS MATERIALIZED (
  SELECT * FROM wn_sel
  WHERE fp IN (SELECT fp FROM wn_sel GROUP BY fp
               HAVING COUNT(*) <= 50)),
wn_pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         CAST(COUNT(*) AS BIGINT) AS n_shared
  FROM wn_cold a JOIN wn_cold b
    ON a.fp = b.fp AND a.doc_id < b.doc_id
  GROUP BY 1, 2)
SELECT p.doc_a, p.doc_b, p.n_shared,
       na.n AS n_a, nb.n AS n_b,
       CAST(1000000 * p.n_shared // LEAST(na.n, nb.n) AS BIGINT)
         AS overlap_micro6
FROM wn_pairs p
JOIN wn_nfp na ON na.doc_id = p.doc_a
JOIN wn_nfp nb ON nb.doc_id = p.doc_b"""


# ---------------------------------------------------------------------------
# Continuation batch 203: one-way ANOVA F + eta-squared on doc
# length by language (functions/textstats.anova_f).

ORACLE["anova_f"] = """
WITH af_per AS MATERIALIZED (
  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(n_chars) AS BIGINT) AS s,
         CAST(SUM(n_chars * n_chars) AS BIGINT) AS s2
  FROM documents GROUP BY lang),
af_a AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k_groups,
         CAST(SUM(n) AS BIGINT) AS n_total,
         CAST(SUM(s) AS BIGINT) AS st,
         CAST(SUM(s2) AS BIGINT) AS s2t,
         SUM((CAST(1000000 AS HUGEINT) * s * s) // n) AS q
  FROM af_per),
af_b AS (
  SELECT k_groups, n_total,
         q - (CAST(1000000 AS HUGEINT) * st * st) // n_total
           AS ssb,
         CAST(1000000 AS HUGEINT) * s2t - q AS ssw
  FROM af_a)
SELECT k_groups, n_total,
       CAST(ssb AS BIGINT) AS ssb_x1e6,
       CAST(ssw AS BIGINT) AS ssw_x1e6,
       CASE WHEN k_groups > 1 AND ssw > 0 THEN
         CAST((CAST(1000 AS HUGEINT) * ssb * (n_total - k_groups))
              // (ssw * (k_groups - 1)) AS BIGINT)
       ELSE CAST(0 AS BIGINT) END AS f_milli3,
       CASE WHEN ssb + ssw > 0 THEN
         CAST((CAST(1000000 AS HUGEINT) * ssb) // (ssb + ssw)
              AS BIGINT)
       ELSE CAST(0 AS BIGINT) END AS eta2_micro6
FROM af_b"""


# ---------------------------------------------------------------------------
# Continuation batch 204: Brown-Forsythe variance-homogeneity test
# (functions/textstats.levene_test).

ORACLE["levene_test"] = """
WITH lv_hist AS MATERIALIZED (
  SELECT lang AS g, n_chars AS v, CAST(COUNT(*) AS BIGINT) AS c
  FROM documents GROUP BY 1, 2),
lv_c AS (
  SELECT g, v, c,
         SUM(c) OVER (PARTITION BY g ORDER BY v
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum,
         SUM(c) OVER (PARTITION BY g) AS n
  FROM lv_hist),
lv_med AS (
  SELECT g, v AS med FROM lv_c
  WHERE cum - c <= (n - 1) // 2 AND cum > (n - 1) // 2),
lv_z AS (
  SELECT h.g, ABS(h.v - m.med) AS z, h.c
  FROM lv_hist h JOIN lv_med m USING (g)),
lv_per AS (
  SELECT g, CAST(SUM(c) AS BIGINT) AS n,
         CAST(SUM(z * c) AS BIGINT) AS s,
         CAST(SUM(z * z * c) AS BIGINT) AS s2
  FROM lv_z GROUP BY g),
lv_a AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k_groups,
         CAST(SUM(n) AS BIGINT) AS n_total,
         CAST(SUM(s) AS BIGINT) AS st,
         CAST(SUM(s2) AS BIGINT) AS s2t,
         SUM((CAST(1000000 AS HUGEINT) * s * s) // n) AS q
  FROM lv_per),
lv_b AS (
  SELECT k_groups, n_total,
         q - (CAST(1000000 AS HUGEINT) * st * st) // n_total
           AS ssb,
         CAST(1000000 AS HUGEINT) * s2t - q AS ssw
  FROM lv_a)
SELECT k_groups, n_total,
       CAST(ssb AS BIGINT) AS ssb_z_x1e6,
       CAST(ssw AS BIGINT) AS ssw_z_x1e6,
       CASE WHEN k_groups > 1 AND ssw > 0 THEN
         CAST((CAST(1000 AS HUGEINT) * ssb
               * (n_total - k_groups))
              // (ssw * (k_groups - 1)) AS BIGINT)
       ELSE CAST(0 AS BIGINT) END AS w_milli3
FROM lv_b"""


# ---------------------------------------------------------------------------
# Continuation batch 205: exact OLS trend per event-type daily
# series (operators/events.ols_trend) — the fano_factor dense grid.

ORACLE["ols_trend"] = """
WITH ot_day AS (
  SELECT CAST(epoch_us(ts) // 86400000000 AS INT) AS day_idx,
         event_type AS etype
  FROM events),
ot_spine AS (SELECT DISTINCT day_idx FROM ot_day),
ot_types AS (SELECT DISTINCT etype FROM ot_day),
ot_sparse AS (
  SELECT etype, day_idx, CAST(COUNT(*) AS BIGINT) AS r
  FROM ot_day GROUP BY 1, 2),
ot_grid AS (
  SELECT t.etype, s.day_idx, COALESCE(x.r, 0) AS r
  FROM ot_types t CROSS JOIN ot_spine s
  LEFT JOIN ot_sparse x USING (etype, day_idx)),
ot_x AS (
  SELECT etype,
         CAST(day_idx - MIN(day_idx) OVER (PARTITION BY etype)
              AS BIGINT) AS x,
         r
  FROM ot_grid),
ot_per AS (
  SELECT etype,
         CAST(COUNT(*) AS BIGINT) AS n_days,
         CAST(SUM(x) AS BIGINT) AS sx,
         CAST(SUM(r) AS BIGINT) AS sum_y,
         CAST(SUM(x * r) AS BIGINT) AS sxy,
         CAST(SUM(x * x) AS BIGINT) AS sxx,
         CAST(SUM(r * r) AS BIGINT) AS syy
  FROM ot_x GROUP BY etype)
SELECT etype, n_days, sum_y,
       CASE WHEN n_days * sxx - sx * sx > 0 THEN
         CAST((CAST(1000000 AS HUGEINT)
               * (n_days * sxy - sx * sum_y))
              // (n_days * sxx - sx * sx) AS BIGINT)
       ELSE CAST(0 AS BIGINT) END AS slope_micro6,
       CASE WHEN n_days * sxx - sx * sx > 0 THEN
         CAST((CAST(1000000 AS HUGEINT)
               * (sum_y * sxx - sx * sxy))
              // (n_days * sxx - sx * sx) AS BIGINT)
       ELSE CAST(0 AS BIGINT) END AS intercept_micro6,
       CASE WHEN n_days * sxx - sx * sx > 0 AND
                 n_days * syy - sum_y * sum_y > 0 THEN
         CAST((CAST(1000000 AS HUGEINT)
               * (n_days * sxy - sx * sum_y)
               * (n_days * sxy - sx * sum_y))
              // (CAST(n_days * sxx - sx * sx AS HUGEINT)
                  * (n_days * syy - sum_y * sum_y)) AS BIGINT)
       ELSE CAST(0 AS BIGINT) END AS r2_micro6
FROM ot_per"""


# ---------------------------------------------------------------------------
# Continuation batch 206: Fleiss' kappa across the three curation
# gates as raters (functions/textstats.fleiss_kappa).

ORACLE["fleiss_kappa"] = f"""
WITH fk_toks AS (
  SELECT doc_id,
         unnest(string_split_regex(text, '{SEP_CLASS}')) AS tok
  FROM documents),
fk_counts AS (
  SELECT doc_id, COUNT(*) AS n_tokens,
         SUM(CASE WHEN lower(tok) IN ({_STOP_IN}) THEN 1 ELSE 0 END)
           AS n_stop,
         COUNT(DISTINCT tok) AS n_dist
  FROM fk_toks WHERE tok <> '' GROUP BY 1),
fk_r AS MATERIALIZED (
  SELECT d.lang,
         CAST(CASE WHEN length(d.text) >= 200 THEN 1 ELSE 0 END
              + CASE WHEN 20 * COALESCE(c.n_stop, 0)
                          >= COALESCE(c.n_tokens, 0)
                     THEN 1 ELSE 0 END
              + CASE WHEN 3 * COALESCE(c.n_dist, 0)
                          >= COALESCE(c.n_tokens, 0)
                     THEN 1 ELSE 0 END AS BIGINT) AS r
  FROM documents d LEFT JOIN fk_counts c ON c.doc_id = d.doc_id),
fk_a AS (
  SELECT lang,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(r) AS BIGINT) AS sum_r,
         CAST(SUM(r * (r - 1) + (3 - r) * (2 - r)) AS BIGINT)
           AS agree_num
  FROM fk_r GROUP BY lang)
SELECT lang, n_docs, sum_r, agree_num,
       CASE WHEN 9 * CAST(n_docs AS HUGEINT) * n_docs
                 - (CAST(sum_r AS HUGEINT) * sum_r
                    + CAST(3 * n_docs - sum_r AS HUGEINT)
                      * (3 * n_docs - sum_r)) > 0 THEN
         CAST((CAST(1000000 AS HUGEINT)
               * (3 * CAST(n_docs AS HUGEINT) * agree_num
                  - 2 * (CAST(sum_r AS HUGEINT) * sum_r
                     + CAST(3 * n_docs - sum_r AS HUGEINT)
                       * (3 * n_docs - sum_r))))
              // (2 * (9 * CAST(n_docs AS HUGEINT) * n_docs
                  - (CAST(sum_r AS HUGEINT) * sum_r
                     + CAST(3 * n_docs - sum_r AS HUGEINT)
                       * (3 * n_docs - sum_r)))) AS BIGINT)
       ELSE CAST(0 AS BIGINT) END AS kappa_micro6
FROM fk_a"""


# ---------------------------------------------------------------------------
# Continuation batch 207: Lincoln-Petersen / Chapman crawl-coverage
# estimate (functions/textstats.capture_recapture) — the
# triple_snapshots md5-presence device as two capture passes.

ORACLE["capture_recapture"] = """
WITH cr_f AS MATERIALIZED (
  SELECT source,
         CASE WHEN instr('0123456789abcdef', substr(md5(
                  '0' || '|' || CAST(doc_id AS VARCHAR)), 1, 1))
                  - 1 >= 3 THEN 1 ELSE 0 END AS c1,
         CASE WHEN instr('0123456789abcdef', substr(md5(
                  '1' || '|' || CAST(doc_id AS VARCHAR)), 1, 1))
                  - 1 >= 3 THEN 1 ELSE 0 END AS c2
  FROM documents),
cr_a AS (
  SELECT source,
         CAST(COUNT(*) AS BIGINT) AS n_true,
         CAST(SUM(c1) AS BIGINT) AS n_cap1,
         CAST(SUM(c2) AS BIGINT) AS n_cap2,
         CAST(SUM(c1 * c2) AS BIGINT) AS n_both
  FROM cr_f GROUP BY source)
SELECT source, n_true, n_cap1, n_cap2, n_both,
       CASE WHEN n_both > 0
         THEN CAST(n_cap1 * n_cap2 // n_both AS BIGINT)
         ELSE CAST(0 AS BIGINT) END AS lp_est,
       CAST((n_cap1 + 1) * (n_cap2 + 1) // (n_both + 1) - 1
            AS BIGINT) AS chapman_est
FROM cr_a"""


# ---------------------------------------------------------------------------
# Continuation batch 208: exact decision-stump split search over the
# three cheap signals (functions/textstats.stump_split).

def _stump_block(name: str, vexpr: str) -> str:
    return f"""
sp_h_{name} AS (
  SELECT v, CAST(COUNT(*) AS BIGINT) AS c,
         CAST(SUM(y) AS BIGINT) AS p
  FROM (SELECT {vexpr} AS v, y FROM sp_f) GROUP BY v),
sp_g_{name} AS (
  SELECT *, CAST(n - nl AS BIGINT) AS nr,
         CAST(pt - pl AS BIGINT) AS pr
  FROM (
    SELECT v,
           CAST(SUM(c) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
               PRECEDING AND CURRENT ROW) AS BIGINT) AS nl,
           CAST(SUM(p) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
               PRECEDING AND CURRENT ROW) AS BIGINT) AS pl,
           CAST(SUM(c) OVER () AS BIGINT) AS n,
           CAST(SUM(p) OVER () AS BIGINT) AS pt
    FROM sp_h_{name})
  WHERE nl < n),
sp_b_{name} AS (
  SELECT '{name}' AS feature, v AS best_threshold,
         nl AS n_left, pl AS pos_left, nr AS n_right,
         pr AS pos_right, cost_micro6,
         CAST((CAST(1000000 AS HUGEINT)
               * (n * n - pt * pt - (n - pt) * (n - pt))) // n
              AS BIGINT) AS root_micro6
  FROM (
    SELECT *,
           CAST((CAST(1000000 AS HUGEINT)
                 * (nl * nl - pl * pl - (nl - pl) * (nl - pl)))
                // nl
                + (CAST(1000000 AS HUGEINT)
                   * (nr * nr - pr * pr - (nr - pr) * (nr - pr)))
                // nr AS BIGINT) AS cost_micro6,
           ROW_NUMBER() OVER (ORDER BY
             CAST((CAST(1000000 AS HUGEINT)
                 * (nl * nl - pl * pl - (nl - pl) * (nl - pl)))
                // nl
                + (CAST(1000000 AS HUGEINT)
                   * (nr * nr - pr * pr - (nr - pr) * (nr - pr)))
                // nr AS BIGINT), v) AS rk
    FROM sp_g_{name})
  WHERE rk = 1)"""


ORACLE["stump_split"] = f"""
WITH sp_toks AS (
  SELECT doc_id,
         unnest(string_split_regex(text, '{SEP_CLASS}')) AS tok
  FROM documents),
sp_counts AS (
  SELECT doc_id,
         COUNT(DISTINCT tok) AS n_dist,
         SUM(CASE WHEN lower(tok) IN ({_STOP_IN}) THEN 1 ELSE 0 END)
           AS n_stop
  FROM sp_toks WHERE tok <> '' GROUP BY 1),
sp_f AS MATERIALIZED (
  SELECT CAST(length(d.text) AS BIGINT) AS n_chars,
         CAST(COALESCE(c.n_dist, 0) AS BIGINT) AS n_distinct,
         CAST(COALESCE(c.n_stop, 0) AS BIGINT) AS n_stop,
         CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS y
  FROM documents d LEFT JOIN sp_counts c ON c.doc_id = d.doc_id),
{_stump_block('n_chars', 'n_chars')},
{_stump_block('n_distinct', 'n_distinct')},
{_stump_block('n_stop', 'n_stop')}
SELECT feature, best_threshold, n_left, pos_left, n_right,
       pos_right, cost_micro6, root_micro6,
       CAST(root_micro6 - cost_micro6 AS BIGINT) AS gain_micro6
FROM (SELECT * FROM sp_b_n_chars
      UNION ALL SELECT * FROM sp_b_n_distinct
      UNION ALL SELECT * FROM sp_b_n_stop)"""


# ---------------------------------------------------------------------------
# Continuation batch 209: Bradley-Terry host abilities by quantized
# MM iterations (functions/textstats.bradley_terry) — rounds
# unrolled as chained CTEs, per-pair floors, max-renormalized.

def _bradley_terry_sql(n_iter: int = 5, scale: int = 10**6) -> str:
    rounds = []
    prev = "bt_g0"
    for k in range(1, n_iter + 1):
        rounds.append(f"""
bt_d{k} AS (
  SELECT p.a,
         CAST(SUM((p.n_ij * CAST({scale * scale} AS HUGEINT))
                  // (ga.g + gb.g)) AS BIGINT) AS den
  FROM bt_pair p
  JOIN {prev} ga ON ga.h = p.a
  JOIN {prev} gb ON gb.h = p.b
  GROUP BY p.a),
bt_r{k} AS MATERIALIZED (
  SELECT w.a AS h,
         CASE WHEN d.den > 0 THEN
           CAST((w.wins * CAST({scale * scale} AS HUGEINT))
                // d.den AS BIGINT)
         ELSE CAST(0 AS BIGINT) END AS gr
  FROM bt_per w JOIN bt_d{k} d ON d.a = w.a),
bt_g{k} AS MATERIALIZED (
  SELECT h,
         CASE WHEN (SELECT MAX(gr) FROM bt_r{k}) > 0 THEN
           CAST((gr * {scale})
                // (SELECT MAX(gr) FROM bt_r{k}) AS BIGINT)
         ELSE CAST(0 AS BIGINT) END AS g
  FROM bt_r{k})""")
        prev = f"bt_g{k}"
    return f"""
WITH bt_hist AS (
  SELECT lang, source AS h, n_chars AS v,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM documents GROUP BY 1, 2, 3),
bt_c AS (
  SELECT lang, h, v, c,
         SUM(c) OVER (PARTITION BY lang, h ORDER BY v
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum,
         SUM(c) OVER (PARTITION BY lang, h) AS n
  FROM bt_hist),
bt_med AS MATERIALIZED (
  SELECT lang, h, v AS med FROM bt_c
  WHERE cum - c <= (n - 1) // 2 AND cum > (n - 1) // 2),
bt_games AS (
  SELECT a.h AS a, b.h AS b,
         CASE WHEN a.med > b.med THEN 1 ELSE 0 END AS win
  FROM bt_med a JOIN bt_med b
    ON a.lang = b.lang AND a.h <> b.h AND a.med <> b.med),
bt_pair AS MATERIALIZED (
  SELECT a, b, CAST(COUNT(*) AS BIGINT) AS n_ij,
         CAST(SUM(win) AS BIGINT) AS w_ij
  FROM bt_games GROUP BY a, b),
bt_per AS MATERIALIZED (
  SELECT a, CAST(SUM(w_ij) AS BIGINT) AS wins,
         CAST(SUM(n_ij) AS BIGINT) AS matches
  FROM bt_pair GROUP BY a),
bt_g0 AS MATERIALIZED (
  SELECT a AS h, CAST({scale} AS BIGINT) AS g FROM bt_per),{",".join(rounds)}
SELECT p.a AS source, p.wins, p.matches,
       CAST(g.g AS BIGINT) AS gamma_u
FROM bt_per p JOIN bt_g{n_iter} g ON g.h = p.a"""


ORACLE["bradley_terry"] = _bradley_terry_sql()


# ---------------------------------------------------------------------------
# Continuation batch 210: empirical-Bayes shrinkage of per-host gate
# pass-rates (functions/textstats.eb_shrinkage).

ORACLE["eb_shrinkage"] = """
WITH eb_per AS MATERIALIZED (
  SELECT source,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(CASE WHEN length(text) >= 200 THEN 1 ELSE 0 END)
              AS BIGINT) AS n_keep
  FROM documents GROUP BY source),
eb_r AS MATERIALIZED (
  SELECT *, CAST(1000000 * n_keep // n_docs AS BIGINT)
           AS rate_micro6
  FROM eb_per),
eb_p0 AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS h,
         CAST(SUM(rate_micro6) AS BIGINT) AS sr,
         CAST(SUM(rate_micro6 * rate_micro6) AS BIGINT) AS sr2
  FROM eb_r),
eb_p1 AS (
  SELECT CAST(sr // h AS BIGINT) AS m_u,
         CASE WHEN h > 1 THEN
           CAST((CAST(h AS HUGEINT) * sr2
                 - CAST(sr AS HUGEINT) * sr)
                // (CAST(h AS HUGEINT) * (h - 1)) AS BIGINT)
         ELSE CAST(0 AS BIGINT) END AS v_u
  FROM eb_p0),
eb_p AS (
  SELECT m_u,
         CASE WHEN v_u > 0 THEN
           LEAST(CAST(100000 AS BIGINT), GREATEST(
             CAST(0 AS BIGINT),
             CAST((CAST(m_u AS HUGEINT) * (1000000 - m_u)) // v_u
                  - 1 AS BIGINT)))
         ELSE CAST(100000 AS BIGINT) END AS tau
  FROM eb_p1)
SELECT r.source, r.n_docs, r.n_keep, r.rate_micro6, p.m_u, p.tau,
       CAST((CAST(1000000 AS HUGEINT)
             * (r.n_keep + (p.tau * p.m_u) // 1000000))
            // (r.n_docs + p.tau) AS BIGINT) AS shrunk_micro6
FROM eb_r r, eb_p p"""


# ---------------------------------------------------------------------------
# Continuation batch 211: site-section path rollup
# (functions/urls.path_rollup).

ORACLE["path_rollup"] = """
WITH pr_p AS MATERIALIZED (
  SELECT source, n_chars,
         COALESCE(NULLIF(
           string_split(regexp_replace(
             'https://' || source || '.example.com/'
             || (['news','blog','shop','docs'])
                [CAST((instr('0123456789abcdef', substr(
                    md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) % 4
                  AS INT) + 1]
             || '/p/' || CAST(doc_id // 120 AS VARCHAR),
             '^https?://[^/]+', ''), '/')[2], ''),
           '(root)') AS section
  FROM documents),
pr_a AS (
  SELECT source, section,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(n_chars) AS BIGINT) AS total_chars
  FROM pr_p GROUP BY 1, 2)
SELECT source, section, n_docs, total_chars,
       CAST(1000000 * n_docs
            // SUM(n_docs) OVER (PARTITION BY source) AS BIGINT)
         AS doc_share_micro6,
       CAST(CASE WHEN SUM(total_chars) OVER (PARTITION BY source)
                 > 0
         THEN 1000000 * total_chars
              // SUM(total_chars) OVER (PARTITION BY source)
         ELSE 0 END AS BIGINT) AS char_share_micro6
FROM pr_a"""


# ---------------------------------------------------------------------------
# Continuation batch 213: quantile-normalization mapping table
# across host length distributions
# (functions/textstats.quantile_normalize).

ORACLE["quantile_normalize"] = """
WITH qn_hist AS MATERIALIZED (
  SELECT source AS h, n_chars AS v, CAST(COUNT(*) AS BIGINT) AS c
  FROM documents GROUP BY 1, 2),
qn_hc AS (
  SELECT h, v, c,
         SUM(c) OVER (PARTITION BY h ORDER BY v
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum,
         SUM(c) OVER (PARTITION BY h) AS n
  FROM qn_hist),
qn_hq AS MATERIALIZED (
  SELECT h, q, v AS qv
  FROM qn_hc, unnest(generate_series(0, 10)) AS t(q)
  WHERE cum - c <= ((n - 1) * q) // 10
    AND cum > ((n - 1) * q) // 10),
qn_pool AS (
  SELECT v, CAST(SUM(c) AS BIGINT) AS c FROM qn_hist GROUP BY v),
qn_pc AS (
  SELECT v, c,
         SUM(c) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
             AND CURRENT ROW) AS cum,
         SUM(c) OVER () AS n
  FROM qn_pool),
qn_pq AS MATERIALIZED (
  SELECT q, v AS pv
  FROM qn_pc, unnest(generate_series(0, 10)) AS t(q)
  WHERE cum - c <= ((n - 1) * q) // 10
    AND cum > ((n - 1) * q) // 10)
SELECT h.h AS source, CAST(h.q AS INT) AS q,
       CAST(h.qv AS BIGINT) AS host_value,
       CAST(p.pv AS BIGINT) AS pooled_value,
       CAST(p.pv - h.qv AS BIGINT) AS shift
FROM qn_hq h JOIN qn_pq p USING (q)"""


# ---------------------------------------------------------------------------
# Continuation batch 214: exact weighted (bag) Jaccard verify over
# the LSH candidate pairs (operators/dedup.weighted_jaccard).
# Reuses the near_duplicates oracle's candidate CTEs (everything up
# to and including `cand`), then computes sum-min / sum-max over
# token frequencies.

_ND = ORACLE["near_duplicates"]
# prefix = everything before the verify half — located via the named
# constant itself, so a CTE rename inside either half moves with it
_WJ_PREFIX = _ND[:_ND.index(DEDUP_VERIFY_CTES)]

ORACLE["weighted_jaccard"] = _WJ_PREFIX + """
wj_tf AS MATERIALIZED (
  SELECT doc_id, lower(tok) AS w, CAST(COUNT(*) AS BIGINT) AS tf
  FROM (SELECT doc_id,
               unnest(string_split_regex(text, '[\n \t]')) AS tok
        FROM documents)
  WHERE tok <> '' GROUP BY 1, 2),
wj_tot AS (
  SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS tot
  FROM wj_tf GROUP BY 1),
wj_inter AS (
  SELECT c.doc_a, c.doc_b,
         CAST(SUM(LEAST(a.tf, b.tf)) AS BIGINT) AS inter_w
  FROM cand c
  JOIN wj_tf a ON a.doc_id = c.doc_a
  JOIN wj_tf b ON b.doc_id = c.doc_b AND b.w = a.w
  GROUP BY 1, 2)
SELECT c.doc_a, c.doc_b,
       CAST(COALESCE(i.inter_w, 0) AS BIGINT) AS inter_w,
       CAST(ta.tot + tb.tot - COALESCE(i.inter_w, 0) AS BIGINT)
         AS union_w,
       CAST(CASE WHEN ta.tot + tb.tot - COALESCE(i.inter_w, 0) > 0
         THEN 1000000 * COALESCE(i.inter_w, 0)
              // (ta.tot + tb.tot - COALESCE(i.inter_w, 0))
         ELSE 0 END AS BIGINT) AS wjaccard_micro6
FROM cand c
JOIN wj_tot ta ON ta.doc_id = c.doc_a
JOIN wj_tot tb ON tb.doc_id = c.doc_b
LEFT JOIN wj_inter i ON i.doc_a = c.doc_a AND i.doc_b = c.doc_b"""


# ---------------------------------------------------------------------------
# Continuation batch 215: eigenvector centrality by quantized power
# iteration over the co-mention graph
# (graph_algos.eigen_centrality) — rounds unrolled as chained CTEs.

def _eigen_centrality_sql(n_iter: int = 5, scale: int = 10**6) -> str:
    rounds = []
    prev = "ec_v0"
    for k in range(1, n_iter + 1):
        rounds.append(f"""
ec_n{k} AS MATERIALIZED (
  SELECT s.src AS node, CAST(SUM(v.v) AS BIGINT) AS raw
  FROM com_sym s JOIN {prev} v ON v.node = s.dst
  GROUP BY 1),
ec_m{k} AS (SELECT MAX(raw) AS mx FROM ec_n{k}),
ec_v{k} AS MATERIALIZED (
  SELECT d.node,
         CASE WHEN (SELECT mx FROM ec_m{k}) > 0 THEN
           CAST((COALESCE(n.raw, 0) * {scale})
                // (SELECT mx FROM ec_m{k}) AS BIGINT)
         ELSE CAST(0 AS BIGINT) END AS v
  FROM ec_deg d LEFT JOIN ec_n{k} n USING (node))""")
        prev = f"ec_v{k}"
    return (
        "SELECT d.node, d.degree, CAST(v.v AS BIGINT) AS cent_u,\n"
        f"       CAST(1000 * (SELECT mx FROM ec_m{n_iter})"
        f" // {scale} AS BIGINT) AS lambda_milli3\n"
        f"FROM ec_deg d JOIN ec_v{n_iter} v USING (node)",
        ",".join(rounds))


_EC_SELECT, _EC_ROUNDS = _eigen_centrality_sql()

ORACLE["eigen_centrality"] = _q(
    _EC_SELECT,
    LINK_CTES, COMENTION_CTES.strip(), """
ec_deg AS MATERIALIZED (
  SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS degree
  FROM com_sym GROUP BY src),
ec_v0 AS MATERIALIZED (
  SELECT node, CAST(1000000 AS BIGINT) AS v FROM ec_deg)""".strip()
    + "," + _EC_ROUNDS)


# ---------------------------------------------------------------------------
# Continuation batch 216: sparse tf-idf lexical top-k similarity
# join with rare-term blocking (functions/textstats.lexical_topk).

ORACLE["lexical_topk"] = """
WITH lx_tf AS MATERIALIZED (
  SELECT doc_id, lower(tok) AS w, CAST(COUNT(*) AS BIGINT) AS tf
  FROM (SELECT doc_id,
               unnest(string_split_regex(text, '[\\n \\t]')) AS tok
        FROM documents)
  WHERE tok <> '' GROUP BY 1, 2),
lx_df AS (
  SELECT w, CAST(COUNT(*) AS BIGINT) AS df FROM lx_tf GROUP BY w),
lx_n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
lx_idf AS MATERIALIZED (
  SELECT w, df,
         CAST(FLOOR(ln(CAST(2 * (SELECT n FROM lx_n) + 2 AS DOUBLE)
                       / (2 * df + 1)) * 1000000) AS BIGINT)
           AS idf
  FROM lx_df),
lx_tv AS MATERIALIZED (
  SELECT t.doc_id, t.w, i.df,
         CAST(t.tf * i.idf AS BIGINT) AS tvv
  FROM lx_tf t JOIN lx_idf i USING (w)),
lx_norm AS MATERIALIZED (
  SELECT doc_id, SUM(CAST(tvv AS HUGEINT) * tvv) AS n2
  FROM lx_tv GROUP BY 1),
lx_cand AS MATERIALIZED (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM lx_tv a JOIN lx_tv b
    ON a.w = b.w AND a.doc_id < b.doc_id
  WHERE a.df BETWEEN 2 AND 20),
lx_dot AS (
  SELECT c.doc_a, c.doc_b,
         SUM(CAST(a.tvv AS HUGEINT) * b.tvv) AS dot
  FROM lx_cand c
  JOIN lx_tv a ON a.doc_id = c.doc_a
  JOIN lx_tv b ON b.doc_id = c.doc_b AND b.w = a.w
  GROUP BY 1, 2),
lx_sc AS (
  SELECT d.doc_a, d.doc_b,
         CAST((CAST(2000000 AS HUGEINT) * d.dot)
              // (na.n2 + nb.n2) AS BIGINT) AS sim_micro6
  FROM lx_dot d
  JOIN lx_norm na ON na.doc_id = d.doc_a
  JOIN lx_norm nb ON nb.doc_id = d.doc_b)
SELECT doc_a, doc_b, sim_micro6, CAST(rank AS INT) AS rank
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_a
          ORDER BY sim_micro6 DESC, doc_b) AS rank
      FROM lx_sc)
WHERE rank <= 5"""
