"""Shared deterministic parameters for the engine AND the oracle.

Everything the pipeline's semantics depend on lives here so the Spark
engine, the pure-Python oracle and the DuckDB SQL generator can never
drift apart.

The entity/relation type system generalizes the reference's closed enums
(reference: Track2-evaluate-ver4.py:433-437 — 1 hub type ``Drug`` + 8
attribute types, relations built as ``f"{ent2.name}-Drug"`` at
utils.py:468).  Web instantiation: hub ``Topic`` + 8 attribute types,
relations ``<Attr>-Topic``.
"""

from __future__ import annotations

# --------------------------------------------------------------------------
# Type system (mirrors reference's 1-hub + 8-attribute closed enum)
# --------------------------------------------------------------------------
HUB_TYPE = "Topic"
ATTR_TYPES = (
    "Quantity",
    "Date",
    "Location",
    "Org",
    "Money",
    "Percent",
    "Event",
    "Misc",
)
ENTITY_TYPES = (HUB_TYPE,) + ATTR_TYPES

#: IOB2 label set: 19 = 9 types x {B-, I-} + O (reference generate_data.py:11-13)
IOB2_LABELS = tuple(
    [f"{p}-{t}" for t in ENTITY_TYPES for p in ("B", "I")] + ["O"]
)

# --------------------------------------------------------------------------
# Gazetteer (generalizes DictNER.fit, rule_based_ner/dict_ner.py:48-80).
# (alias, ent_type, canonical_id).  Aliases are lowercase, len > 1
# (reference drops len-1 aliases, dict_ner.py:70-72).  Several aliases
# share a canonical_id so entity linking / connected-components
# canonicalization has real merge work to do.
#
# INVARIANT relied on by the SQL oracle: within one ent_type, no alias is
# a token-subsequence of another alias of the same type, so same-type
# matches can never overlap (the reference's per-type ``re.finditer`` is
# non-overlapping; this keeps engine and oracle trivially aligned).
# --------------------------------------------------------------------------
GAZETTEER: tuple[tuple[str, str, str], ...] = (
    ("spark", "Topic", "topic:spark"),
    ("customer", "Topic", "topic:customer"),
    ("vector", "Topic", "topic:vector"),
    ("big", "Topic", "topic:spark"),  # alias of spark -> CC merge case
    ("table", "Org", "org:table"),
    ("window", "Org", "org:window"),
    ("order", "Date", "date:order"),
    ("sort", "Date", "date:sort"),
    ("line", "Location", "loc:line"),
    ("column", "Location", "loc:column"),
    ("row", "Location", "loc:line"),  # alias of line -> CC merge case
    ("value", "Money", "money:value"),
    ("key", "Money", "money:key"),
    ("part", "Percent", "pct:part"),
    ("dup", "Misc", "misc:dup"),
    ("fast key", "Event", "event:fastkey"),  # bigram alias
    ("slow merge", "Event", "event:slowmerge"),  # bigram alias
)

#: Pattern-typed entities (reference hard-codes the Strength regex
#: ``\d+[ ]*(?:mg|mcg)`` at dict_ner.py:78).  Matched with the same
#: whitespace-boundary rule as dictionary aliases.
PATTERN_RULES: tuple[tuple[str, str], ...] = (
    (r"\d+ ?(?:kg|km|usd|mg|mcg)", "Quantity"),
)

# --------------------------------------------------------------------------
# Sharding (reference: HealthRecord.get_split_points, ehr.py:353-432;
# BioBERT path uses max_len=126, predict.py:31,204).  We use a small
# shard length so the synthetic corpus (docs of ~10-100 tokens) actually
# exercises multi-shard documents.
# --------------------------------------------------------------------------
MAX_LEN_TOKENS = 16

# --------------------------------------------------------------------------
# Rule relation classifier (deterministic stand-in for the BioBERT RE
# stage behind the same contract, predict.py:376-377): a hub/attr pair
# inside one shard is positive iff the char gap between the two spans is
# <= MAX_PAIR_GAP_CHARS.
# --------------------------------------------------------------------------
MAX_PAIR_GAP_CHARS = 60

#: Negative down-sampling keep-rate numerator (reference keeps negatives
#: with p=0.25 via seeded random.random(), biobert_re/utils_re.py:272-274;
#: we use the partition-stable hash form: md5-bucket < 25 of 100).
NEG_SAMPLE_PCT = 25

# --------------------------------------------------------------------------
# Evaluation fixtures: the "system under evaluation" for the E1-E6
# operators is the same pipeline run with a perturbed gazetteer
# (dropped aliases -> false negatives, added alias -> false positives),
# evaluated against the full-gazetteer run as gold.
# --------------------------------------------------------------------------
EVAL_DROP_ALIASES = ("big", "row")

#: Fuzzy alias discovery (SURVEY §7.1 step 4, the "long tail" linking
#: path): out-of-gazetteer corpus tokens are matched to aliases via a
#: character-trigram posting-list join; candidates kept at or above this
#: trigram-Jaccard percentage (integers only — no float comparisons).
MIN_FUZZY_JACCARD_PCT = 25
#: Acceptance gate for the second linking pass: rank-1 fuzzy candidates
#: at/above this Jaccard percentage are fed back into the gazetteer as
#: new aliases (the "human-in-the-loop accept" reduced to a
#: deterministic rule so the oracle can replicate it).
ACCEPT_FUZZY_JACCARD_PCT = 30
#: Hard bound on the accepted-alias set collected to the driver when
#: expanding the gazetteer (expanded_gazetteer / apply_alias_reviews).
#: The set is gazetteer-shaped by construction (distinct corpus
#: surfaces near a gazetteer alias), but the bound is ENFORCED, not
#: assumed: a blowup (e.g. a degenerate threshold accepting the whole
#: vocabulary) raises instead of OOM-ing the driver.
ACCEPTED_ALIAS_CAP = 100_000
EVAL_ADD_ALIASES = (("merge", "Topic", "topic:merge"),)


def perturbed_gazetteer() -> tuple[tuple[str, str, str], ...]:
    kept = tuple(g for g in GAZETTEER if g[0] not in EVAL_DROP_ALIASES)
    return kept + EVAL_ADD_ALIASES


# --------------------------------------------------------------------------
# Dedup / similarity parameters
# --------------------------------------------------------------------------
SHINGLE_K = 3  # token n-gram size for minhash / jaccard
MINHASH_PERMS = 12  # number of md5-keyed min-hashes
LSH_BANDS = 4  # bands of size MINHASH_PERMS / LSH_BANDS
JACCARD_THRESHOLD_PCT = 50  # near-dup verify threshold (percent)
SIMHASH_BITS = 16
TOPK_NEIGHBORS = 5
ANN_SIGN_BITS = 8  # sign-of-first-k-dims bucketing for ANN


def srp_planes(bits: int = ANN_SIGN_BITS, dim: int = 64) -> list[list[int]]:
    """Deterministic signed-random-projection hyperplanes: integer
    weights in [-8, 8] derived from md5(plane:dim) — the proper
    data-independent SRP family (generalizes the axis-aligned
    sign-bucket 'planes').  Driver-side and tiny (bits x dim ints),
    shipped as literals into both engines."""
    import hashlib

    return [[int(hashlib.md5(f"{i}:{d}".encode()).hexdigest()[:4], 16)
             % 17 - 8 for d in range(dim)]
            for i in range(bits)]

#: Stopword list for quality scoring / language-id heuristics.
STOPWORDS = ("the", "a", "of", "and", "to", "in")

#: Training-mixture rates: per-source keep percentage for the corpus
#: sampler (sources not listed use the default).  Deterministic
#: md5-bucket sampling — never rand() — so the mixture is stable under
#: repartition and re-runs.
MIXTURE_RATES: dict[str, int] = {"src0": 100, "src1": 50, "src2": 10}
MIXTURE_DEFAULT_PCT = 30

# --------------------------------------------------------------------------
# Table names for checkpointed stage boundaries (reference's pickle
# caches utils.py:644-677 become write-once stage tables).
# --------------------------------------------------------------------------
STAGES = ("pages", "shards", "mentions", "candidates", "relations", "triples", "nodes", "edges")


def hub_aliases() -> list[tuple[str, str, str]]:
    return [g for g in GAZETTEER if g[1] == HUB_TYPE]


def attr_aliases() -> list[tuple[str, str, str]]:
    return [g for g in GAZETTEER if g[1] != HUB_TYPE]
CONTAINMENT_THRESHOLD_PCT = 80  # shingle-containment near-dup verify threshold (percent)
