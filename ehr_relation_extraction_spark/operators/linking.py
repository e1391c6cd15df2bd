"""Entity linking + canonicalization (reference G5 generalized; SURVEY §7.1
steps 4-5).

The reference's only canonicalization is grouping all mention rows that
share a ``drug_id`` into one graph node (utils.py:195-201).  At web
scale that generalizes to:

1. **link**: mention surface -> canonical_id via the broadcast alias
   dictionary (exact lowercased match; the gazetteer is small, so Spark
   picks a broadcast hash join — asserted in tests).  Unlinked mentions
   get a deterministic surface id.
2. **canonicalize**: connected components over an entity-similarity
   edge set.  Here the edge source is span-overlap co-reference: two
   mentions of different canonical entities whose spans overlap in the
   same document (e.g. the Event bigram "fast key" overlapping the
   Money unigram "key") assert that the entities refer to linked
   surface forms and are merged — mirroring the reference's merging of
   overlapping spans into one node.
3. **materialize**: ``nodes`` (component representative per canonical
   entity, with type + mention count) and ``edges`` (canonicalized
   triple aggregates with weights).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..config import (ACCEPT_FUZZY_JACCARD_PCT, ACCEPTED_ALIAS_CAP,
                      GAZETTEER, MIN_FUZZY_JACCARD_PCT)


def _collect_bounded_aliases(df: DataFrame, cap: int = ACCEPTED_ALIAS_CAP):
    """Collect an alias dimension with the bound ENFORCED: fetch at
    most cap+1 rows and raise if the cap is exceeded, so a degenerate
    acceptance threshold fails loudly instead of OOM-ing the driver.
    (Round-2 review asked for the bound to be checked, not argued.)"""
    rows = df.limit(cap + 1).collect()
    if len(rows) > cap:
        raise ValueError(
            f"accepted-alias set exceeds ACCEPTED_ALIAS_CAP={cap}; "
            "the acceptance threshold is admitting a corpus-sized set "
            "— raise the threshold or the cap before broadcasting")
    return rows


def gazetteer_df(spark) -> DataFrame:
    return spark.createDataFrame(
        [(a, t, c) for a, t, c in GAZETTEER],
        "alias string, ent_type string, canonical_id string",
    )


def link_mentions(mentions: DataFrame, gaz: DataFrame) -> DataFrame:
    """Attach canonical ids via a broadcast join on the lowercased
    surface + type; unlinked mentions get ``surface:<lower>``."""
    m = mentions.withColumn("_surface", F.lower(F.col("ent_text")))
    g = F.broadcast(gaz.select(F.col("alias").alias("_surface"),
                               F.col("ent_type"),
                               F.col("canonical_id").alias("_canon")))
    out = m.join(g, ["_surface", "ent_type"], "left")
    return out.withColumn(
        "canonical_id",
        F.coalesce(F.col("_canon"), F.concat(F.lit("surface:"), F.col("_surface"))),
    ).drop("_surface", "_canon")


def _char_trigrams(s: str) -> list[str]:
    return sorted({s[i:i + 3] for i in range(len(s) - 2)})


def gazetteer_trigrams_df(spark, gazetteer=GAZETTEER) -> DataFrame:
    """Gazetteer-side trigram posting list, built driver-side (the
    dictionary is the small dimension) and broadcast into the join."""
    rows = []
    for alias, etype, canon in gazetteer:
        tris = _char_trigrams(alias)
        for t in tris:
            rows.append((alias, etype, canon, t, len(tris)))
    return spark.createDataFrame(
        rows,
        "alias string, ent_type string, canonical_id string, "
        "tri string, n_gaz_tri int")


def fuzzy_alias_candidates(tokens: DataFrame,
                           gazetteer=GAZETTEER,
                           min_jaccard_pct: int = MIN_FUZZY_JACCARD_PCT,
                           ) -> DataFrame:
    """Long-tail linking (SURVEY §7.1 step 4): discover out-of-gazetteer
    corpus tokens that are near-matches of known aliases.

    Blocking is a character-trigram posting-list equi-join (the
    scalable standard for fuzzy string matching): the corpus vocabulary
    shuffles once on the trigram key, the gazetteer side is a broadcast
    posting list, so no O(vocab x aliases) cross product ever
    materializes.  Scoring is exact trigram Jaccard in scaled integers
    (floor(n_inter * 1e6 / n_union)) — deterministic on both engines.

    Input: token rows from ``ner.tokenize_df`` (column ``token``).
    Output: one row per (surface, alias) candidate at or above the
    threshold, ranked per surface by score desc then alias asc.

    All trigram generation is JVM-side (``sequence``/``transform``/
    ``substring`` inside whole-stage codegen) — no Python in the path.
    """
    from pyspark.sql import Window

    spark = tokens.sparkSession
    vocab = (tokens.select(F.lower("token").alias("surface"))
             .where(F.length("surface") >= 3)
             .groupBy("surface")
             .agg(F.count(F.lit(1)).cast("long").alias("n_occur")))
    gaz_alias = spark.createDataFrame(
        [(a,) for a, _, _ in gazetteer], "surface string")
    tail = vocab.join(F.broadcast(gaz_alias), "surface", "left_anti")

    tris = F.array_distinct(F.expr(
        "transform(sequence(1, length(surface) - 2), "
        "i -> substring(surface, i, 3))"))
    tail_tri = (tail.select("surface", "n_occur", tris.alias("tris"))
                .withColumn("n_tri", F.size("tris").cast("int"))
                .select("surface", "n_occur", "n_tri",
                        F.explode("tris").alias("tri")))

    g = F.broadcast(gazetteer_trigrams_df(spark, gazetteer))
    inter = (tail_tri.join(g, "tri")
             .groupBy("surface", "n_occur", "n_tri",
                      "alias", "ent_type", "canonical_id", "n_gaz_tri")
             .agg(F.count(F.lit(1)).cast("int").alias("n_inter")))

    scored = (inter
              .withColumn("n_union",
                          (F.col("n_tri") + F.col("n_gaz_tri")
                           - F.col("n_inter")).cast("int"))
              .withColumn("jaccard_micro6",
                          F.floor(F.col("n_inter") * F.lit(1_000_000)
                                  / F.col("n_union")).cast("long"))
              .where(F.col("jaccard_micro6")
                     >= F.lit(min_jaccard_pct * 10_000)))
    w = Window.partitionBy("surface").orderBy(
        F.col("jaccard_micro6").desc(), F.col("alias"))
    return (scored
            .withColumn("cand_rank", F.row_number().over(w).cast("int"))
            .select("surface", "n_occur", "alias", "ent_type",
                    "canonical_id", "n_inter", "n_union",
                    "jaccard_micro6", "cand_rank"))


def accepted_fuzzy_aliases(fuzzy: DataFrame,
                           accept_pct: int = ACCEPT_FUZZY_JACCARD_PCT,
                           ) -> DataFrame:
    """The accept gate of the second linking pass: keep each surface's
    rank-1 fuzzy candidate when its trigram Jaccard clears the
    acceptance threshold.  Deterministic (rank ties broken by alias
    order inside ``fuzzy_alias_candidates``) so the DuckDB oracle can
    replicate the exact accepted set."""
    return (fuzzy
            .where((F.col("cand_rank") == 1)
                   & (F.col("jaccard_micro6") >= accept_pct * 10_000))
            .select("surface", "ent_type", "canonical_id"))


def expanded_gazetteer(fuzzy: DataFrame,
                       base=GAZETTEER,
                       accept_pct: int = ACCEPT_FUZZY_JACCARD_PCT,
                       ) -> tuple:
    """Feed accepted fuzzy aliases back into the gazetteer (the second
    linking pass of SURVEY §7.1 step 4 / roadmap item 4).

    The accepted set is a tiny dimension — bounded by the number of
    distinct corpus surfaces near a gazetteer alias, i.e. gazetteer-
    sized, not corpus-sized — so collecting it driver-side is the same
    broadcast-dictionary pattern the base gazetteer uses (reference
    DictNER.fit builds its alternation from a driver-local dict,
    rule_based_ner/dict_ner.py:48-80).  Surfaces are single corpus
    tokens by construction, so each new entry is a unigram alias.
    The bound is enforced (ACCEPTED_ALIAS_CAP), not assumed.
    """
    rows = _collect_bounded_aliases(accepted_fuzzy_aliases(fuzzy, accept_pct))
    extra = tuple(sorted((r["surface"], r["ent_type"], r["canonical_id"])
                         for r in rows))
    return tuple(base) + extra


def review_queue(fuzzy: DataFrame,
                 accept_pct: int = ACCEPT_FUZZY_JACCARD_PCT,
                 band_pct: int = 15) -> DataFrame:
    """The human-review queue for the second linking pass: rank-1
    fuzzy candidates in the GRAY band just below the auto-accept
    threshold — high enough to be plausible, too low to auto-accept.
    Auto-accepted and clearly-rejected pairs never reach a human.
    Output: (surface, alias, ent_type, canonical_id, jaccard_micro6),
    ordered for triage by descending score."""
    lo = (accept_pct - band_pct) * 10_000
    hi = accept_pct * 10_000
    return (fuzzy
            .where((F.col("cand_rank") == 1)
                   & (F.col("jaccard_micro6") >= lo)
                   & (F.col("jaccard_micro6") < hi))
            .select("surface", "alias", "ent_type", "canonical_id",
                    "jaccard_micro6")
            .orderBy(F.col("jaccard_micro6").desc(), "surface"))


def apply_alias_reviews(fuzzy: DataFrame, decisions: DataFrame,
                        base=GAZETTEER,
                        accept_pct: int = ACCEPT_FUZZY_JACCARD_PCT,
                        ) -> tuple:
    """Merge human review decisions into the expanded gazetteer:
    ``decisions`` is (surface, ent_type, decision 'accept'|'reject').
    A reviewed 'accept' joins the gazetteer even below the auto
    threshold; a reviewed 'reject' removes the pair even when the
    automatic rule would accept it; unreviewed surfaces fall back to
    the automatic rank-1 + threshold gate.  Same bounded-broadcast
    contract as expanded_gazetteer (decisions are human-sized)."""
    auto = accepted_fuzzy_aliases(fuzzy, accept_pct)
    d = decisions.select("surface", "ent_type", "decision")
    rejected = d.where(F.col("decision") == "reject") \
        .select("surface", "ent_type")
    kept_auto = auto.join(rejected, ["surface", "ent_type"], "left_anti")
    accepted_rows = (d.where(F.col("decision") == "accept")
                     .join(fuzzy.where(F.col("cand_rank") == 1)
                           .select("surface", "ent_type", "canonical_id"),
                           ["surface", "ent_type"])
                     .select("surface", "ent_type", "canonical_id"))
    rows = _collect_bounded_aliases(
        kept_auto.unionByName(accepted_rows).dropDuplicates())
    extra = tuple(sorted((r["surface"], r["ent_type"], r["canonical_id"])
                         for r in rows))
    return tuple(base) + extra


def overlap_edges(linked_mentions: DataFrame) -> DataFrame:
    """Undirected similarity edges: overlapping spans in one doc that
    link to different canonical entities.  Self-join on url with a
    strict interval-overlap predicate; emitted once per unordered pair
    (src < dst) and deduplicated globally."""
    a = linked_mentions.alias("a")
    b = linked_mentions.alias("b")
    pairs = a.join(
        b,
        (F.col("a.url") == F.col("b.url"))
        & (F.col("a.start") < F.col("b.end"))
        & (F.col("b.start") < F.col("a.end"))
        & (F.col("a.canonical_id") < F.col("b.canonical_id")),
    ).select(
        F.col("a.canonical_id").alias("src"),
        F.col("b.canonical_id").alias("dst"),
    )
    return pairs.dropDuplicates(["src", "dst"])


def connected_components(edges: DataFrame, nodes: DataFrame,
                         max_iter: int = 25) -> DataFrame:
    """Large-star / small-star connected components (Kiveris et al.,
    "Connected Components in MapReduce and Beyond", SoCC'14) — the
    O(log n)-round, shuffle-only formulation that survives web-scale
    graphs, written as plain DataFrame joins (no GraphFrames jar
    needed; SURVEY §4.2.3).

    ``edges``: (src, dst) string node ids, undirected (either order).
    ``nodes``: (node) — all node ids incl. isolated ones.
    Returns (node, component) where component is the lexicographic
    minimum node id of the component.

    Each round materializes via ``localCheckpoint`` to cut lineage —
    the iterative-join equivalent of checkpointed stage boundaries.
    """
    spark = edges.sparkSession
    # Checkpoint the INPUT edge set before the loop (the same
    # discipline as hits_fixed / bellman_ford_fixed): star() self-joins
    # its frame and the first round nests two stars, so an
    # uncheckpointed upstream — e.g. attr_merge_clusters' blocked
    # Jaccard over the NER pipeline — would be re-evaluated 4+ times in
    # round 1 alone (observed: 51k tasks and a 1g-heap OOM on a 500-doc
    # fixture before this cut).
    e = (edges.select("src", "dst")
         .where(F.col("src") != F.col("dst"))
         .dropDuplicates()).localCheckpoint()

    def sym(df: DataFrame) -> DataFrame:
        # r06: establish HashPartitioning(src) once — the dedup here,
        # the min-aggregate, the m-join and the star-output dedup all
        # cluster on src-prefixed keys, so with subset co-partitioning
        # (session.py) ONE exchange serves the whole star instead of
        # four (guide §2.4).
        return (df.union(df.select(F.col("dst").alias("src"),
                                   F.col("src").alias("dst")))
                .repartition("src").dropDuplicates())

    def star(df: DataFrame, large: bool) -> DataFrame:
        # m(u) = min over gamma+(u); attach neighbors to m(u)
        g = sym(df)
        m = (g.groupBy("src").agg(F.min("dst").alias("_mn"))
             .select("src", F.least("_mn", F.col("src")).alias("m")))
        joined = g.join(m, "src")
        if large:
            out = joined.where(F.col("dst") > F.col("src")).select(
                F.col("dst").alias("src"), F.col("m").alias("dst"))
        else:
            out = joined.where(F.col("dst") <= F.col("src")).select(
                F.col("dst").alias("src"), F.col("m").alias("dst"))
            out = out.union(joined.select("src", F.col("m").alias("dst")))
        return (out.where(F.col("src") != F.col("dst"))
                .dropDuplicates())

    def checksum(df: DataFrame) -> tuple[int, int]:
        # modular sum: ANSI mode (Spark 4 default) raises on long overflow
        h = F.pmod(F.xxhash64("src", "dst"), F.lit(1_000_000_007))
        row = df.agg(F.count(F.lit(1)).alias("c"),
                     F.coalesce(F.sum(h), F.lit(0)).alias("h")).first()
        return int(row["c"]), int(row["h"])

    prev = None
    for _ in range(max_iter):
        e = star(star(e, large=True), large=False).localCheckpoint()
        cur = checksum(e)
        if cur == prev:
            break
        prev = cur

    comp = sym(e).groupBy("src").agg(F.min("dst").alias("component"))
    comp = comp.select(F.col("src").alias("node"),
                       F.least("component", "node").alias("component"))
    return (nodes.select("node").dropDuplicates()
            .join(comp, "node", "left")
            .withColumn("component", F.coalesce("component", "node")))


def canonical_components(linked_mentions: DataFrame) -> DataFrame:
    nodes = linked_mentions.select(
        F.col("canonical_id").alias("node")).dropDuplicates()
    return connected_components(overlap_edges(linked_mentions), nodes)


def materialize_nodes(linked_mentions: DataFrame,
                      components: DataFrame) -> DataFrame:
    """nodes table: one row per canonical entity with its component
    representative, dominant type and mention count."""
    m = linked_mentions.join(
        components.withColumnRenamed("node", "canonical_id"), "canonical_id")
    return (m.groupBy("canonical_id", "component")
            .agg(F.min("ent_type").alias("ent_type"),
                 F.count(F.lit(1)).cast("long").alias("n_mentions")))


def materialize_edges(triples: DataFrame, linked_mentions: DataFrame,
                      components: DataFrame, gaz: DataFrame) -> DataFrame:
    """edges table: canonicalized triple aggregates.

    The subject is re-linked through its mention's canonical id and
    rewritten to the component representative.  The object has no
    mention id in the long table (the reference keeps only its text,
    utils.py:520-524), so it is linked by surface through the broadcast
    dictionary, falling back to a surface node.  weight = triple count.
    """
    comp = components.withColumnRenamed("node", "canonical_id")
    link = (linked_mentions.join(comp, "canonical_id")
            .select("url", "ent_id", "component"))
    t = triples.join(
        link.withColumnRenamed("ent_id", "subj_id")
            .withColumnRenamed("component", "subj_node"),
        ["url", "subj_id"])
    g = F.broadcast(
        gaz.select(F.col("alias"), F.col("canonical_id").alias("_oc")))
    t = (t.withColumn("_os", F.lower(F.col("obj")))
         .join(g, F.col("_os") == F.col("alias"), "left")
         .withColumn("_ocanon", F.coalesce(
             F.col("_oc"), F.concat(F.lit("surface:"), F.col("_os")))))
    t = (t.join(comp.withColumnRenamed("canonical_id", "_ocanon")
                    .withColumnRenamed("component", "obj_node"),
                "_ocanon", "left")
         .withColumn("obj_node", F.coalesce("obj_node", "_ocanon")))
    return (t.groupBy("subj_node", "pred", "obj_node")
            .agg(F.count(F.lit(1)).cast("long").alias("weight")))


def entity_centroids(linked_mentions: DataFrame, emb: DataFrame) -> DataFrame:
    """Mean document embedding per canonical entity — the bridge
    between the KG and the vector index: an entity's centroid is the
    quantized mean of the embeddings of the docs that mention it
    (vec_id keys the same corpus ids as doc_id, TESTDATA.md).

    Integer micro-unit quantization BEFORE summing makes the per-dim
    sums order-independent (exact under any partitioning, exact SQL
    oracle) — same contract as similarity.ivf_centroid_update.
    Output: (canonical_id, dim, n_docs, sum_q6, mean_q6).

    Scale: mention->doc pairs are distinct-projected before the join
    (one row per (entity, doc)); the explode emits dim rows per pair
    and the aggregate is map-side combinable on (canonical_id, dim).
    """
    pairs = linked_mentions.select("canonical_id", "doc_id").dropDuplicates()
    q = emb.select(
        F.col("vec_id").alias("doc_id"),
        F.posexplode(F.transform(
            F.col("embedding").cast("array<double>"),
            lambda x: F.floor(x * 1000000).cast("long")))
        .alias("dim", "q6"))
    return (pairs.join(q, "doc_id")
            .groupBy("canonical_id", "dim")
            .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
                 F.sum("q6").cast("long").alias("sum_q6"))
            .withColumn("mean_q6",
                        F.floor(F.col("sum_q6") / F.col("n_docs"))
                        .cast("long"))
            .select("canonical_id", F.col("dim").cast("int").alias("dim"),
                    "n_docs", "sum_q6", "mean_q6"))


def entity_neighbors(centroids: DataFrame, top_k: int = 5) -> DataFrame:
    """Top-k most similar entities per entity by centroid cosine —
    'related entities' for KG curation/entity-resolution review.

    All similarity math is INTEGER (dot products and squared norms of
    the quantized mean_q6 centroids are exact in int64), so the SQL
    oracle matches bit-for-bit; only the final rank ORDER uses the
    float cosine, computed identically in both engines from the same
    integers (IEEE division of exact ints), with (cos desc, ent_b)
    tie-break.

    Scale note: this is the exact all-pairs form for REVIEW-sized
    entity sets (the canonical-entity dimension, gazetteer-bounded —
    not corpus-sized).  For open-domain entity counts, route through
    the ANN bucket path (operators/similarity.srp_buckets) instead.
    Output: (ent_a, ent_b, dot_q, norm_a_q, norm_b_q, rank).
    """
    from pyspark.sql import Window

    vec = (centroids.groupBy("canonical_id")
           .agg(F.transform(
               F.sort_array(F.collect_list(F.struct("dim", "mean_q6"))),
               lambda s: s["mean_q6"]).alias("_v")))
    a = vec.select(F.col("canonical_id").alias("ent_a"),
                   F.col("_v").alias("_va"))
    b = vec.select(F.col("canonical_id").alias("ent_b"),
                   F.col("_v").alias("_vb"))
    dot = F.aggregate(F.zip_with("_va", "_vb", lambda x, y: x * y),
                      F.lit(0).cast("long"), lambda acc, v: acc + v)
    nrm = lambda c: F.aggregate(  # noqa: E731
        F.transform(c, lambda x: x * x),
        F.lit(0).cast("long"), lambda acc, v: acc + v)
    pairs = (a.join(b, F.col("ent_a") != F.col("ent_b"))
             .select("ent_a", "ent_b", dot.alias("dot_q"),
                     nrm(F.col("_va")).alias("norm_a_q"),
                     nrm(F.col("_vb")).alias("norm_b_q")))
    cos = (F.col("dot_q")
           / F.sqrt(F.col("norm_a_q").cast("double")
                    * F.col("norm_b_q").cast("double")))
    w = Window.partitionBy("ent_a").orderBy(cos.desc(), F.col("ent_b"))
    return (pairs.withColumn("rank", F.row_number().over(w).cast("int"))
            .where(F.col("rank") <= top_k)
            .select("ent_a", "ent_b", "dot_q", "norm_a_q", "norm_b_q",
                    "rank"))


def entity_first_seen(linked_mentions: DataFrame) -> DataFrame:
    """New canonical entities per crawl day — the KG growth curve
    (day from the synthetic crawl clock, warc_ts = CRAWL_EPOCH +
    doc_id seconds).  Output: (first_day, n_new_entities)."""
    day = F.expr("(1704067200 + doc_id) div 86400")
    first = (linked_mentions
             .groupBy("canonical_id")
             .agg(F.min(day).cast("long").alias("first_day")))
    return (first.groupBy("first_day")
            .agg(F.count(F.lit(1)).cast("long").alias("n_new_entities")))


def synth_typo_surfaces(spark, gazetteer=GAZETTEER) -> DataFrame:
    """Deterministically-synthesized typo'd OOV surfaces derived from
    the gazetteer — the fixture-gap pattern (url_canonical,
    boilerplate_strip): the corpus vocabulary contains no typo-class
    neighbors of any alias, so the edit-distance linking stage
    synthesizes its observations IN THE QUERY from md5 arithmetic the
    DuckDB oracle replays bit-for-bit.  Two single-edit corruptions
    per alias: delete the character at the md5-chosen position, and
    duplicate it (one deletion typo, one insertion typo — both at
    levenshtein distance exactly 1 from the source alias).
    Output: (surface) — distinct, >= 3 chars, never an exact alias.
    """
    gaz = spark.createDataFrame([(a,) for a, _, _ in gazetteer],
                                "alias string")
    pos = ("((instr('0123456789abcdef', substring(md5(alias), 1, 1)) - 1)"
           " % length(alias)) + 1")
    dele = F.expr(f"concat(substring(alias, 1, {pos} - 1),"
                  f" substring(alias, {pos} + 1))")
    dupe = F.expr(f"concat(substring(alias, 1, {pos}),"
                  f" substring(alias, {pos}, 1),"
                  f" substring(alias, {pos} + 1))")
    out = (gaz.select(F.explode(F.array(dele, dupe)).alias("surface"))
           .where(F.length("surface") >= 3)
           .dropDuplicates())
    return out.join(gaz.select(F.col("alias").alias("surface")),
                    "surface", "left_anti")


def edit_verified_aliases(tokens: DataFrame,
                          gazetteer=GAZETTEER,
                          max_dist: int = 1) -> DataFrame:
    """Edit-distance alias linking: candidate-then-verify with
    levenshtein as the verifier (the second opinion to trigram
    Jaccard — Jaccard scores n-gram overlap, edit distance scores
    typo closeness; a transposed/dropped character can score low
    Jaccard yet be one edit away).

    Observed OOV surfaces = the corpus tail vocabulary (lowercased
    tokens >= 3 chars not in the gazetteer) UNION the deterministic
    synthetic typos of :func:`synth_typo_surfaces`.  Blocking is the
    same broadcast character-trigram posting-list equi-join as
    ``fuzzy_alias_candidates`` — levenshtein runs ONLY on blocked
    (surface, alias) pairs, never the vocab x gazetteer product.
    ASCII surfaces only: Spark's levenshtein counts codepoints,
    DuckDB's counts bytes — identical on ASCII, so the guard pins
    both engines to the shared domain.

    Output: (surface, alias, ent_type, canonical_id, edit_dist),
    one row per verified link with edit_dist <= ``max_dist``.
    """
    spark = tokens.sparkSession
    gaz_alias = spark.createDataFrame(
        [(a,) for a, _, _ in gazetteer], "surface string")
    vocab = (tokens.select(F.lower("token").alias("surface"))
             .where(F.length("surface") >= 3)
             .dropDuplicates()
             .join(F.broadcast(gaz_alias), "surface", "left_anti"))
    surfaces = (vocab.unionByName(synth_typo_surfaces(spark, gazetteer))
                .dropDuplicates()
                .where(F.col("surface").rlike("^[ -~]+$")))

    tris = F.array_distinct(F.expr(
        "transform(sequence(1, length(surface) - 2), "
        "i -> substring(surface, i, 3))"))
    s_tri = surfaces.select(
        "surface", F.explode(tris).alias("tri"))
    g = F.broadcast(gazetteer_trigrams_df(spark, gazetteer)
                    .select("tri", "alias", "ent_type", "canonical_id"))
    cand = (s_tri.join(g, "tri")
            .select("surface", "alias", "ent_type", "canonical_id")
            .dropDuplicates())
    return (cand
            .withColumn("edit_dist",
                        F.levenshtein("surface", "alias").cast("int"))
            .where(F.col("edit_dist") <= max_dist)
            .select("surface", "alias", "ent_type", "canonical_id",
                    "edit_dist"))


def entity_salience(linked: DataFrame, pages: DataFrame) -> DataFrame:
    """Per-(doc, canonical entity) salience — which entities a page is
    ABOUT, the gate that decides what enters the KG node table vs what
    was mentioned in passing.  Integer early-and-often score:

        salience_micro6 = n_mentions * (text_len - first_start) * 1e6
                          DIV (n_doc_mentions * text_len)

    = (share of the doc's mentions) x (how early the entity first
    appears), floor-scaled — deterministic, no floats.  Output:
    (doc_id, url, canonical_id, n_mentions, first_start, last_end,
    text_len, salience_micro6).

    Plan: two hash-aggregates over the linked-mention table (both on
    doc-keyed groupings, map-side combinable) + one join against the
    page-length projection — no new scan of text beyond length()."""
    per = (linked.groupBy("doc_id", "url", "canonical_id")
           .agg(F.count(F.lit(1)).cast("long").alias("n_mentions"),
                F.min("start").cast("int").alias("first_start"),
                F.max("end").cast("int").alias("last_end")))
    tot = (linked.groupBy("doc_id")
           .agg(F.count(F.lit(1)).cast("long").alias("n_doc_mentions")))
    lens = pages.select("doc_id",
                        F.length("text").cast("int").alias("text_len"))
    return (per.join(tot, "doc_id").join(lens, "doc_id")
            .select("doc_id", "url", "canonical_id", "n_mentions",
                    "first_start", "last_end", "text_len",
                    F.expr("CAST((n_mentions * (text_len - first_start)"
                           " * 1000000) DIV (n_doc_mentions * text_len)"
                           " AS BIGINT)").alias("salience_micro6")))


def entity_associations(linked: DataFrame,
                        min_docs_ab: int = 3) -> DataFrame:
    """Entity association mining over the linked-mention table: which
    canonical entities co-occur in documents more often than chance?
    (ent_a, ent_b, n_docs_a, n_docs_b, n_docs_ab, lift_micro6) with
    lift = n_docs_ab * N / (n_docs_a * n_docs_b) over the N documents
    carrying at least one mention — the exact-integer-division PMI
    device (cooccurrence_pmi / pred_cooccurrence) applied to the
    entity layer; the statistical sibling of the co-mention graph's
    raw edge counts.

    Plan shape: one distinct (doc, entity) projection, a per-doc a<b
    pair self-join (bounded by per-doc distinct-entity count), two
    joins against the per-entity doc counts, and the ``min_docs_ab``
    support filter pruning the tail before the wide output."""
    de = (linked.select("doc_id", F.col("canonical_id").alias("ent"))
          .dropDuplicates())
    df_ent = de.groupBy("ent").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs_ent"))
    n = de.select(F.countDistinct("doc_id").alias("n")).first()["n"]
    a, b = de.alias("a"), de.alias("b")
    pairs = (a.join(b, (F.col("a.doc_id") == F.col("b.doc_id"))
                    & (F.col("a.ent") < F.col("b.ent")))
             .groupBy(F.col("a.ent").alias("ent_a"),
                      F.col("b.ent").alias("ent_b"))
             .agg(F.count(F.lit(1)).cast("long").alias("n_docs_ab"))
             .where(F.col("n_docs_ab") >= min_docs_ab))
    out = (pairs
           .join(df_ent.select(F.col("ent").alias("ent_a"),
                               F.col("n_docs_ent").alias("n_docs_a")),
                 "ent_a")
           .join(df_ent.select(F.col("ent").alias("ent_b"),
                               F.col("n_docs_ent").alias("n_docs_b")),
                 "ent_b"))
    return out.select(
        "ent_a", "ent_b", "n_docs_a", "n_docs_b", "n_docs_ab",
        F.expr(f"CAST((n_docs_ab * {n} * 1000000)"
               " DIV (n_docs_a * n_docs_b) AS BIGINT)")
        .alias("lift_micro6"))


def entity_type_election(linked: DataFrame) -> DataFrame:
    """Node typing by majority vote — every canonical entity gets the
    type most of its linked mentions carry (the node-level counterpart
    of the predicate-domain election in triples.pred_violations), with
    a purity score flagging entities whose mention types disagree —
    the canonicalization-quality alarm at the node granularity.

    Ties break on the type NAME (deterministic, oracle-exact).  Plan:
    one (canonical_id, ent_type) aggregate, one canonical_id roll-up,
    one row_number window partitioned by canonical_id — every shuffle
    on the entity key, bounded state per key (the type alphabet)."""
    from pyspark.sql import Window

    cnt = linked.groupBy("canonical_id", "ent_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"))
    tot = cnt.groupBy("canonical_id").agg(
        F.sum("n").cast("long").alias("n_mentions"))
    w = (Window.partitionBy("canonical_id")
         .orderBy(F.desc("n"), "ent_type"))
    major = (cnt.withColumn("_rk", F.row_number().over(w))
             .where(F.col("_rk") == 1))
    return (major.join(tot, "canonical_id")
            .select("canonical_id",
                    F.col("ent_type").alias("major_type"),
                    "n_mentions",
                    F.col("n").alias("n_major"),
                    F.expr("CAST(n * 1000000 DIV n_mentions AS BIGINT)")
                    .alias("purity_micro6")))


def schema_graph(edges: DataFrame, linked: DataFrame,
                 components: DataFrame) -> DataFrame:
    """Ontology induction by graph summarization (the SNAP-style
    typed quotient graph): collapse the node-level KG edge table onto
    TYPE-level edges (subj_type, pred, obj_type) with edge and weight
    totals — the schema a 10^12-triple KG actually exhibits, readable
    at a glance and the input to domain/range constraint mining.

    A component's type is elected by majority vote over its members'
    linked mentions (ties on the type name — the entity_type_election
    device lifted to components); object nodes without a component
    type (surface literals) summarize as 'literal'.

    Plan: one (component, ent_type) aggregate + per-component window
    for the election, then the edge table joins the (small) component-
    type side twice and collapses onto the type triple — output rows
    are bounded by |types|^2 * |preds| no matter the corpus size."""
    from pyspark.sql import Window

    cnt = (linked.join(components.withColumnRenamed("node",
                                                    "canonical_id"),
                       "canonical_id")
           .groupBy("component", "ent_type")
           .agg(F.count(F.lit(1)).cast("long").alias("n")))
    w = (Window.partitionBy("component")
         .orderBy(F.desc("n"), "ent_type"))
    ctype = (cnt.withColumn("_rk", F.row_number().over(w))
             .where(F.col("_rk") == 1)
             .select("component", F.col("ent_type").alias("major_type")))
    st = ctype.select(F.col("component").alias("subj_node"),
                      F.col("major_type").alias("subj_type"))
    ot = ctype.select(F.col("component").alias("obj_node"),
                      F.col("major_type").alias("_ot"))
    return (edges.join(st, "subj_node")
            .join(ot, "obj_node", "left")
            .groupBy("subj_type", "pred",
                     F.coalesce("_ot", F.lit("literal")).alias("obj_type"))
            .agg(F.count(F.lit(1)).cast("long").alias("n_edges"),
                 F.sum("weight").cast("long").alias("w_sum")))


def trending_entities(linked: DataFrame, batch_docs: int = 50,
                      top_k: int = 3) -> DataFrame:
    """Per-crawl-batch trending entities — the entity-level twin of
    the predicate drift report: within each micro-batch (batch =
    doc_id DIV ``batch_docs``, the synthetic crawl clock), the
    ``top_k`` most-mentioned canonical entities, each with its burst
    lift vs the corpus-wide mention share:

        lift = (n / b_tot) / (e_tot / n_all)
        lift_micro6 = n * n_all * 1e6 DIV (b_tot * e_tot)   (floor)

    Plan: one (batch, entity) count, one batch total, one entity
    total, one 1-row corpus total kept lazy as a crossJoin, then a
    per-batch row_number window for the top-k — bounded state per
    batch, every shuffle on a real key.

    Numeric envelope: the lift numerator is n_mentions * n_all * 1e6,
    int64-safe while n_mentions * n_all <= 9.2e12 (comfortable for
    any per-batch top-k at crawl-batch granularity; a corpus where a
    single entity's batch count times the GLOBAL mention total passes
    1e13 should promote the expression to DECIMAL(38,0) — Spark's ANSI
    mode raises on overflow rather than wrapping, so the failure is
    loud)."""
    cnt = (linked
           .select(F.expr(f"CAST(doc_id DIV {batch_docs} AS INT)")
                   .alias("batch"), "canonical_id")
           .groupBy("batch", "canonical_id")
           .agg(F.count(F.lit(1)).cast("long").alias("n_mentions")))
    return trending_from_counts(cnt, top_k=top_k)


def trending_from_counts(cnt: DataFrame, top_k: int = 3) -> DataFrame:
    """The ranking/lift half of :func:`trending_entities`, split out
    so the STREAMING twin can reuse it verbatim: the stream maintains
    the additive (batch, canonical_id, n_mentions) counts as its
    bounded state, and this pure batch post-process turns any such
    counts table — batch-built or stream-built — into the same top-k
    + burst-lift report."""
    from pyspark.sql import Window

    b_tot = cnt.groupBy("batch").agg(
        F.sum("n_mentions").cast("long").alias("b_tot"))
    e_tot = cnt.groupBy("canonical_id").agg(
        F.sum("n_mentions").cast("long").alias("e_tot"))
    n_all = cnt.agg(F.sum("n_mentions").cast("long").alias("n_all"))
    w = (Window.partitionBy("batch")
         .orderBy(F.desc("n_mentions"), "canonical_id"))
    return (cnt.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= top_k)
            .join(b_tot, "batch").join(e_tot, "canonical_id")
            .crossJoin(n_all)  # 1-row frame: stays lazy/distributed
            .select("batch", "canonical_id", "n_mentions",
                    F.col("rank").cast("int").alias("rank"),
                    F.expr("CAST(n_mentions * n_all * 1000000"
                           " DIV (b_tot * e_tot) AS BIGINT)")
                    .alias("lift_micro6")))


def host_entity_overlap(linked: DataFrame,
                        max_entity_fanout: int = 50) -> DataFrame:
    """Host-pair correlation by shared canonical entities — the
    source-level projection of the KG: two hosts whose entity sets
    overlap heavily are mirrors, syndicators, or spam farms; crawl
    dedup and source weighting both key on this table.

    Blocked candidate generation (the entity_jaccard device lifted to
    hosts): hosts meet ONLY through a shared canonical entity, and
    entities present on more than ``max_entity_fanout`` hosts are
    dropped from the universe first — a celebrity entity would
    otherwise square into fanout^2 host pairs.  Jaccard is exact over
    the pruned entity universe.  Output per (host_a < host_b):
    n_shared, n_union, jac_micro6."""
    he = (linked.select(
        F.regexp_extract("url", r"^https?://([^/]*)", 1).alias("host"),
        "canonical_id").dropDuplicates())
    ok = (he.groupBy("canonical_id")
          .agg(F.count(F.lit(1)).cast("long").alias("fan"))
          .where(F.col("fan") <= max_entity_fanout)
          .select("canonical_id"))
    f = he.join(ok, "canonical_id")
    sizes = f.groupBy("host").agg(
        F.count(F.lit(1)).cast("long").alias("n_ents"))
    a, b = f.alias("a"), f.alias("b")
    inter = (a.join(b, (F.col("a.canonical_id")
                        == F.col("b.canonical_id"))
                    & (F.col("a.host") < F.col("b.host")))
             .groupBy(F.col("a.host").alias("host_a"),
                      F.col("b.host").alias("host_b"))
             .agg(F.count(F.lit(1)).cast("long").alias("n_shared")))
    return (inter
            .join(sizes.select(F.col("host").alias("host_a"),
                               F.col("n_ents").alias("na")), "host_a")
            .join(sizes.select(F.col("host").alias("host_b"),
                               F.col("n_ents").alias("nb")), "host_b")
            .select("host_a", "host_b", "n_shared",
                    F.expr("CAST(na + nb - n_shared AS BIGINT)")
                    .alias("n_union"))
            .withColumn("jac_micro6",
                        F.expr("CAST(n_shared * 1000000 DIV n_union"
                               " AS BIGINT)")))


def alias_collisions(linked: DataFrame) -> DataFrame:
    """Linker ambiguity report: surface forms that map to MORE THAN
    ONE canonical entity across the corpus — the collisions a
    context-sensitive disambiguator would have to resolve, and the
    first thing to audit when canonicalization quality drops.

        (surface, n_canonicals, n_mentions, canonical_ids)

    canonical_ids is the sorted '|'-joined id list (bounded by the
    alias table's collision degree, not the corpus).  One grouped
    aggregate on the lowercased surface."""
    return (linked
            .groupBy(F.lower(F.col("ent_text")).alias("surface"))
            .agg(F.countDistinct("canonical_id").cast("long")
                 .alias("n_canonicals"),
                 F.count(F.lit(1)).cast("long").alias("n_mentions"),
                 F.array_join(F.array_sort(
                     F.collect_set("canonical_id")), "|")
                 .alias("canonical_ids"))
            .where(F.col("n_canonicals") >= 2))


def _entity_block_tokens(triples: DataFrame) -> DataFrame:
    """Schema-agnostic token blocking universe: every entity (distinct
    lowercased subject) lands in one block per distinct token of its
    name OR of any of its attribute values — the standard
    schema-agnostic scheme, which finds co-referent entities whose
    NAMES share nothing but whose attribute values do."""
    facts = (triples.select(F.lower("subj").alias("ent"),
                            F.lower("obj").alias("val"))
             .dropDuplicates())
    return (facts.select("ent", F.explode(F.split(
        F.concat_ws(" ", "ent", "val"), "[^a-z0-9]+")).alias("token"))
        .where(F.col("token") != "")
        .dropDuplicates())


def token_blocks(triples: DataFrame, max_block: int = 50) -> DataFrame:
    """Token blocking for entity resolution (Papadakis et al.'s
    blocking stage), schema-agnostic: every lowercased subject lands
    in one block per distinct token of its name or attribute values;
    blocks larger than ``max_block`` are PURGED (kept in the profile,
    excluded from pair generation) — the standard block-purging skew
    guard, since a block of size s generates s(s-1)/2 candidate
    pairs.

        (token, n_entities, purged)

    One explode + one grouped count; the profile is what an ER
    operator tunes max_block against before paying for the pair
    join."""
    toks = _entity_block_tokens(triples)
    return (toks.groupBy("token")
            .agg(F.count(F.lit(1)).cast("long").alias("n_entities"))
            .withColumn("purged",
                        F.when(F.col("n_entities") > max_block, 1)
                        .otherwise(0).cast("int")))


def meta_block_edges(triples: DataFrame,
                     max_block: int = 50) -> DataFrame:
    """Meta-blocking with CBS weights and weighted-node pruning
    (Papadakis et al.): candidate entity pairs sharing >= 1
    non-purged token block, weighted by Common-Blocks-Scheme (number
    of shared blocks), then pruned by the WNP rule — an edge SURVIVES
    iff its weight reaches the average edge weight of EITHER
    endpoint.

    The average test is evaluated as the exact integer
    cross-multiplication  cbs * n_edges(v) >= sum_cbs(v)  — no
    division, so the DuckDB oracle is bit-exact (the repo's
    signed-division-avoidance device).

        (ent_a, ent_b, cbs, keep)

    Plan: block-key equi-join bounded by the purge cap (never
    all-pairs over the entity set), one pair aggregate, one node
    roll-up, two endpoint equi-joins.  Keeping pruned edges with
    keep=0 makes the operator auditable — production callers filter
    keep=1."""
    toks = _entity_block_tokens(triples)
    kept = (toks.groupBy("token")
            .agg(F.count(F.lit(1)).alias("n"))
            .where(F.col("n") <= max_block)
            .select("token"))
    tk = toks.join(kept, "token")
    a = tk.select("token", F.col("ent").alias("ent_a"))
    b = tk.select(F.col("token").alias("token_b"),
                  F.col("ent").alias("ent_b"))
    pairs = (a.join(b, (F.col("token") == F.col("token_b"))
                    & (F.col("ent_a") < F.col("ent_b")))
             .groupBy("ent_a", "ent_b")
             .agg(F.count(F.lit(1)).cast("long").alias("cbs")))
    sides = pairs.select(F.col("ent_a").alias("ent"), "cbs").unionAll(
        pairs.select(F.col("ent_b").alias("ent"), "cbs"))
    stats = (sides.groupBy("ent")
             .agg(F.count(F.lit(1)).cast("long").alias("n_edges"),
                  F.sum("cbs").cast("long").alias("sum_cbs")))
    return (pairs
            .join(stats.select(F.col("ent").alias("ent_a"),
                               F.col("n_edges").alias("_na"),
                               F.col("sum_cbs").alias("_sa")), "ent_a")
            .join(stats.select(F.col("ent").alias("ent_b"),
                               F.col("n_edges").alias("_nb"),
                               F.col("sum_cbs").alias("_sb")), "ent_b")
            .select("ent_a", "ent_b", "cbs",
                    F.when((F.col("cbs") * F.col("_na") >= F.col("_sa"))
                           | (F.col("cbs") * F.col("_nb")
                              >= F.col("_sb")), 1)
                    .otherwise(0).cast("int").alias("keep")))


def precedence_edges(linked_mentions: DataFrame) -> DataFrame:
    """Directed narrative-precedence graph over canonical entities:
    edge src -> dst when a mention of ``src`` ends at or before a
    mention of ``dst`` starts on the SAME page, weighted by how many
    (page, mention-pair) contexts exhibit that order.

    Unlike overlap_edges (undirected, same-span), this graph is
    directed and naturally CYCLIC across the corpus (A before B on one
    page, B before A on another), which is what the SCC / bowtie
    analyses below consume — the entity-level analogue of the classic
    web-link bowtie (Broder et al., WWW 2000).

    Scale: the self-join is url-equi (co-partitioned by page); the
    per-page pair product is bounded by the same per-shard mention
    cap that bounds candidate pairs (R2) — a page contributes at most
    (mentions-per-page choose 2) rows before the global dedup-agg.
    One shuffle for the join, one for the (src, dst) aggregate.
    """
    a = linked_mentions.alias("a")
    b = linked_mentions.alias("b")
    pairs = (a.join(
        b,
        (F.col("a.url") == F.col("b.url"))
        & (F.col("a.end") <= F.col("b.start"))
        & (F.col("a.canonical_id") != F.col("b.canonical_id")))
        .select(F.col("a.url").alias("url"),
                F.col("a.canonical_id").alias("src"),
                F.col("b.canonical_id").alias("dst"))
        .dropDuplicates())
    return (pairs.groupBy("src", "dst")
            .agg(F.count(F.lit(1)).cast("long").alias("n_pages")))


def rdfs_type_inference(triples: DataFrame, linked: DataFrame,
                        gaz: DataFrame) -> DataFrame:
    """RDFS-style schema materialization — the missing-type repair
    pass every KG build runs after extraction: induce each
    predicate's rdfs:domain / rdfs:range from the data (plurality
    type with at-least-half support, ties broken by type name), then
    materialize the types those axioms entail for every subject /
    linked object, alongside the declared types.

    domain(p) = the plurality subject type among p's linked-subject
    triples, kept only when 2 * n_major >= n_total; range(p) is the
    same election over objects that link into the gazetteer by
    lowercased surface (data-property objects never vote).

    Output: (canonical_id, ent_type, source, is_new) distinct, where
    source in ('declared', 'domain', 'range') and is_new = 1 iff an
    inferred row's (entity, type) pair is NOT among the declared
    pairs — the rows the inference actually added.

    Scale: the per-pred elections aggregate to a handful of rows
    (predicate vocabulary is single digits), so both axiom maps join
    back in as broadcasts; the only wide shuffles are the
    (url, subj_id) subject link and the distincts, all keyed.
    """
    from pyspark.sql import Window

    subj = triples.join(
        linked.select("url", F.col("ent_id").alias("subj_id"),
                      "canonical_id", "ent_type"),
        ["url", "subj_id"]).select("pred", "canonical_id", "ent_type")
    obj = (triples.select("pred", F.lower(F.col("obj")).alias("alias"))
           .join(F.broadcast(gaz.select("alias", "canonical_id",
                                        "ent_type")), "alias")
           .select("pred", "canonical_id", "ent_type"))

    def _elect(side: DataFrame) -> DataFrame:
        per = side.groupBy("pred", "ent_type").agg(
            F.count(F.lit(1)).cast("long").alias("n"))
        w = Window.partitionBy("pred").orderBy(F.desc("n"),
                                               F.asc("ent_type"))
        return (per
                .withColumn("_tot", F.sum("n").over(
                    Window.partitionBy("pred")))
                .withColumn("_rk", F.row_number().over(w))
                .where((F.col("_rk") == 1)
                       & (F.lit(2) * F.col("n") >= F.col("_tot")))
                .select("pred", F.col("ent_type").alias("axiom_type")))

    declared = linked.select("canonical_id", "ent_type").dropDuplicates()
    inferred = (subj.join(F.broadcast(_elect(subj)), "pred")
                .select("canonical_id",
                        F.col("axiom_type").alias("ent_type"),
                        F.lit("domain").alias("source"))
                .dropDuplicates()
                .unionByName(
                    obj.join(F.broadcast(_elect(obj)), "pred")
                    .select("canonical_id",
                            F.col("axiom_type").alias("ent_type"),
                            F.lit("range").alias("source"))
                    .dropDuplicates()))
    return (declared.select("canonical_id", "ent_type",
                            F.lit("declared").alias("source"),
                            F.lit(0).cast("int").alias("is_new"))
            .unionByName(
                inferred.join(
                    declared.withColumn("_dec", F.lit(1)),
                    ["canonical_id", "ent_type"], "left")
                .select("canonical_id", "ent_type", "source",
                        F.when(F.col("_dec").isNull(), F.lit(1))
                        .otherwise(F.lit(0)).cast("int")
                        .alias("is_new"))))


def sorted_neighborhood_pairs(mentions: DataFrame,
                              window: int = 3) -> DataFrame:
    """Sorted-neighborhood blocking (Hernandez & Stolfo, SIGMOD'95) —
    the classic entity-resolution candidate generator that meta-
    blocking's token blocks complement: sort each (host, ent_type)
    block's distinct lowercased surfaces and pair every record with
    its ``window - 1`` successors in sort order, so near-identical
    names (shared prefixes, typos past the first characters) land in
    the same sliding window without any pairwise comparison.

    Output: (host, ent_type, surf_a, surf_b, pos_gap) with surf_a <
    surf_b (sort order) and 1 <= pos_gap <= window - 1.

    Scale: the sort is PER BLOCK — ``row_number``/``lead`` over a
    (host, ent_type) window, never a global sort — and the pairing is
    two ``lead`` columns, no self-join; blocks are host-bounded so
    the skew cap is a single host's distinct-surface count.
    """
    from pyspark.sql import Window

    host = F.substring_index(
        F.substring_index("url", "//", -1), "/", 1)
    recs = (mentions.select(host.alias("host"), "ent_type",
                            F.lower(F.col("ent_text")).alias("surface"))
            .dropDuplicates())
    w = Window.partitionBy("host", "ent_type").orderBy("surface")
    leads = recs.select(
        "host", "ent_type", F.col("surface").alias("surf_a"),
        *[F.lead("surface", g).over(w).alias(f"_l{g}")
          for g in range(1, window)])
    out = None
    for g in range(1, window):
        part = (leads.where(F.col(f"_l{g}").isNotNull())
                .select("host", "ent_type", "surf_a",
                        F.col(f"_l{g}").alias("surf_b"),
                        F.lit(g).cast("int").alias("pos_gap")))
        out = part if out is None else out.unionByName(part)
    return out


def blocking_quality(triples: DataFrame, truth: DataFrame) -> DataFrame:
    """Blocking-quality evaluation (Christen's ER survey metrics):
    pair completeness PC = |candidates ∩ truth| / |truth| (the recall
    the blocker can still achieve) and reduction ratio RR = 1 -
    |candidates| / all-pairs (how much of the quadratic comparison
    space it pruned) — the two numbers every blocking scheme is
    tuned on, here scoring the meta-blocking WNP survivors against a
    supplied truth pair set.

    ``truth``: (ent_a, ent_b) lowercased, ent_a < ent_b.  Output: one
    row (n_entities, n_all_pairs, n_cand, n_truth, n_hit, pc_micro6,
    rr_micro6), all integers (floor-scaled ratios, zero guards).

    Scale: the candidate set comes from the already-bounded
    meta-blocking join; the metrics themselves are four global counts
    unioned into ONE final aggregate — no cross join, no scalar
    subquery fan-in on the Spark side.
    """
    cand = (meta_block_edges(triples).where(F.col("keep") == 1)
            .select("ent_a", "ent_b"))
    ents = triples.select(F.lower("subj").alias("ent")).dropDuplicates()
    hit = cand.join(truth, ["ent_a", "ent_b"], "semi")
    labeled = (ents.agg(F.count(F.lit(1)).cast("long").alias("v"))
               .select(F.lit("ents").alias("k"), "v")
               .unionByName(cand.agg(F.count(F.lit(1)).cast("long")
                                     .alias("v"))
                            .select(F.lit("cand").alias("k"), "v"))
               .unionByName(truth.agg(F.count(F.lit(1)).cast("long")
                                      .alias("v"))
                            .select(F.lit("truth").alias("k"), "v"))
               .unionByName(hit.agg(F.count(F.lit(1)).cast("long")
                                    .alias("v"))
                            .select(F.lit("hit").alias("k"), "v")))
    one = labeled.groupBy().agg(
        F.sum(F.when(F.col("k") == "ents", F.col("v"))).cast("long")
        .alias("n_entities"),
        F.sum(F.when(F.col("k") == "cand", F.col("v"))).cast("long")
        .alias("n_cand"),
        F.sum(F.when(F.col("k") == "truth", F.col("v"))).cast("long")
        .alias("n_truth"),
        F.sum(F.when(F.col("k") == "hit", F.col("v"))).cast("long")
        .alias("n_hit"))
    ap = F.expr("n_entities * (n_entities - 1) div 2")
    return one.select(
        "n_entities", ap.cast("long").alias("n_all_pairs"),
        "n_cand", "n_truth", "n_hit",
        F.when(F.col("n_truth") > 0,
               F.floor(F.col("n_hit") * F.lit(1000000)
                       / F.col("n_truth")))
        .otherwise(F.lit(0)).cast("long").alias("pc_micro6"),
        F.when(ap > 0,
               F.lit(1000000) - F.floor(F.col("n_cand")
                                        * F.lit(1000000) / ap))
        .otherwise(F.lit(0)).cast("long").alias("rr_micro6"))


def mention_concentration(linked: DataFrame) -> DataFrame:
    """Corpus concentration profile of entity attention — the exact
    Gini coefficient of per-entity mention counts plus the top
    entity's share: the popularity-skew alarm a crawl pipeline
    watches (a Gini drifting toward 1 means the extractor is
    collapsing onto head entities; near 0 means the gazetteer tail
    is dead weight).

    Gini via the sorted-rank identity G = (2*sum(i*x_i) - (n+1)*
    sum(x)) / (n*sum(x)) with ranks ascending by (count, entity) —
    deterministic under ties — floor-scaled to micro6 with ONE
    division.  Output: one row (n_entities, total_mentions,
    gini_micro6, top1_share_micro6).

    Scale: the rank window runs over the per-ENTITY count table (the
    aggregate of the corpus, bounded by the entity vocabulary —
    never the mention stream), so the single-partition sort is a
    bounded dimension, same class as the other vocabulary-sized
    windows.
    """
    from pyspark.sql import Window

    cnt = linked.groupBy("canonical_id").agg(
        F.count(F.lit(1)).cast("long").alias("x"))
    ranked = cnt.withColumn(
        "i", F.row_number().over(
            Window.orderBy(F.asc("x"), F.asc("canonical_id")))
        .cast("long"))
    return (ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n_entities"),
        F.sum("x").cast("long").alias("total_mentions"),
        F.sum(F.col("i") * F.col("x")).cast("long").alias("_s1"),
        F.max("x").cast("long").alias("_xmax"))
        .select("n_entities", "total_mentions",
                F.floor((F.lit(2) * F.col("_s1")
                         - (F.col("n_entities") + 1)
                         * F.col("total_mentions"))
                        * F.lit(1000000)
                        / (F.col("n_entities")
                           * F.col("total_mentions")))
                .cast("long").alias("gini_micro6"),
                F.floor(F.col("_xmax") * F.lit(1000000)
                        / F.col("total_mentions")).cast("long")
                .alias("top1_share_micro6")))


# ---------------------------------------------------------------------------
# Fellegi-Sunter probabilistic record linkage (continuation batch 57)

FS_FEATURES = ("first_char", "len_diff_le2", "same_n_tokens",
               "shared_token")


def fs_labeled_pairs(mentions: DataFrame, gaz: DataFrame,
                     window: int = 3) -> DataFrame:
    """Comparison vectors for Fellegi-Sunter record linkage (JASA
    1969): sorted-neighborhood candidate pairs of mention surfaces,
    each with four binary agreement features and a gold label from
    the gazetteer canonicalization (both surfaces resolve to the same
    canonical id; out-of-gazetteer surfaces get their unique
    ``surface:<lower>`` id, so they never spuriously match).

    Features (all JVM expressions, no Python):
      first_char     first characters agree
      len_diff_le2   length difference <= 2
      same_n_tokens  same space-token count
      shared_token   the token sets intersect

    Scale: pair generation is the windowed sorted-neighborhood scan
    (no self-join); the gazetteer side is broadcast twice.
    """
    pairs = sorted_neighborhood_pairs(mentions, window)
    canon = gaz.select(F.col("alias").alias("_surf"), "ent_type",
                       F.col("canonical_id").alias("_canon"))
    ca = canon.withColumnRenamed("_surf", "surf_a").withColumnRenamed(
        "_canon", "_ca")
    cb = canon.withColumnRenamed("_surf", "surf_b").withColumnRenamed(
        "_canon", "_cb")
    lab = (pairs
           .join(F.broadcast(ca), ["surf_a", "ent_type"], "left")
           .join(F.broadcast(cb), ["surf_b", "ent_type"], "left")
           .withColumn(
               "label",
               (F.coalesce(F.col("_ca"),
                           F.concat(F.lit("surface:"), F.col("surf_a")))
                == F.coalesce(F.col("_cb"),
                              F.concat(F.lit("surface:"),
                                       F.col("surf_b")))).cast("int"))
           .drop("_ca", "_cb"))
    ta, tb = F.split("surf_a", " ", -1), F.split("surf_b", " ", -1)
    return (lab
            .withColumn("first_char",
                        (F.substring("surf_a", 1, 1)
                         == F.substring("surf_b", 1, 1)).cast("int"))
            .withColumn("len_diff_le2",
                        (F.abs(F.length("surf_a") - F.length("surf_b"))
                         <= 2).cast("int"))
            .withColumn("same_n_tokens",
                        (F.size(ta) == F.size(tb)).cast("int"))
            .withColumn("shared_token",
                        F.arrays_overlap(ta, tb).cast("int")))


def _fs_counts(lp: DataFrame) -> DataFrame:
    """One-row global aggregate of the FS sufficient statistics:
    match/unmatch totals plus per-feature agreement counts."""
    exprs = [F.sum("label").cast("long").alias("nm"),
             (F.count(F.lit(1)) - F.sum("label")).cast("long").alias("nu")]
    for f in FS_FEATURES:
        exprs.append(F.sum(F.col(f) * F.col("label")).cast("long")
                     .alias(f"am_{f}"))
        exprs.append(F.sum(F.col(f) * (1 - F.col("label"))).cast("long")
                     .alias(f"au_{f}"))
    return lp.agg(*exprs)


def _fs_w_agree(am, au, nm, nu):
    """floor(1e6 * ln(m/u)) with +1/+2 Laplace smoothing: m =
    (am+1)/(nm+2), u = (au+1)/(nu+2).  Integer products first, ONE
    double division, ONE ln — the repo's single-ln device, identical
    in DuckDB."""
    return F.floor(F.log(((am + 1) * (nu + 2)).cast("double")
                         / ((nm + 2) * (au + 1)).cast("double"))
                   * F.lit(1000000)).cast("long")


def _fs_w_disagree(am, au, nm, nu):
    """floor(1e6 * ln((1-m)/(1-u))) under the same smoothing."""
    return F.floor(F.log(((nm + 1 - am) * (nu + 2)).cast("double")
                         / ((nm + 2) * (nu + 1 - au)).cast("double"))
                   * F.lit(1000000)).cast("long")


def fs_linkage_weights(mentions: DataFrame, gaz: DataFrame,
                       window: int = 3) -> DataFrame:
    """Per-feature Fellegi-Sunter m/u estimates and integer log-odds
    weights from the labeled sorted-neighborhood pairs.

    Output: (feature, n_match, n_unmatch, n_agree_match,
    n_agree_unmatch, w_agree_micro6, w_disagree_micro6) — one row per
    feature in FS_FEATURES.

    Scale: ONE global aggregate over the candidate pairs (map-side
    combinable sums), then a 4-row stack — no shuffle beyond the
    aggregate."""
    cnt = _fs_counts(fs_labeled_pairs(mentions, gaz, window))
    stack_args = ", ".join(
        f"'{f}', am_{f}, au_{f}" for f in FS_FEATURES)
    long = cnt.selectExpr(
        "nm", "nu",
        f"stack({len(FS_FEATURES)}, {stack_args}) AS (feature, am, au)")
    am, au = F.col("am"), F.col("au")
    nm, nu = F.col("nm"), F.col("nu")
    return long.select(
        "feature",
        nm.alias("n_match"), nu.alias("n_unmatch"),
        am.alias("n_agree_match"), au.alias("n_agree_unmatch"),
        _fs_w_agree(am, au, nm, nu).alias("w_agree_micro6"),
        _fs_w_disagree(am, au, nm, nu).alias("w_disagree_micro6"))


def fs_linkage_scores(mentions: DataFrame, gaz: DataFrame,
                      window: int = 3) -> DataFrame:
    """Fellegi-Sunter match score per candidate pair: the sum over
    features of the agreement (or disagreement) log-odds weight —
    the classic linkage decision variable, here as an exact integer.

    Output: (host, ent_type, surf_a, surf_b, pos_gap, <4 feature
    bits>, label, score_micro6).

    Scale: the 1-row weight frame stays lazy and is crossJoined onto
    the pairs (a broadcast of one row), so scoring is a single
    map-side projection."""
    lp = fs_labeled_pairs(mentions, gaz, window)
    cnt = _fs_counts(lp)
    nm, nu = F.col("nm"), F.col("nu")
    wides = []
    for f in FS_FEATURES:
        am, au = F.col(f"am_{f}"), F.col(f"au_{f}")
        wides.append(_fs_w_agree(am, au, nm, nu).alias(f"_wa_{f}"))
        wides.append(_fs_w_disagree(am, au, nm, nu).alias(f"_wd_{f}"))
    w = cnt.select(*wides)  # 1-row frame: stays fully lazy/distributed
    score = None
    for f in FS_FEATURES:
        term = F.when(F.col(f) == 1, F.col(f"_wa_{f}")).otherwise(
            F.col(f"_wd_{f}"))
        score = term if score is None else score + term
    return (lp.crossJoin(w)
            .select("host", "ent_type", "surf_a", "surf_b", "pos_gap",
                    *FS_FEATURES, "label",
                    score.cast("long").alias("score_micro6")))


def evidence_snippets(linked_mentions: DataFrame, pages: DataFrame,
                      ctx: int = 40) -> DataFrame:
    """Per-(page, entity) evidence snippet — the provenance read path
    a KG UI serves next to every fact: the FIRST mention of the
    entity on the page (min (start, end, ent_id), deterministic) with
    ``ctx`` characters of context either side, cut straight from the
    page text by char offsets (both engines' substring clamps
    identically at the text edges).

    Output: (url, canonical_id, start, end, ent_text, evidence) —
    one row per (url, canonical_id).

    Scale: one windowed first-mention pick keyed by (url, entity) +
    one keyed join against pages; the snippet is a substring
    expression, no tokenization pass."""
    from pyspark.sql import Window

    w = Window.partitionBy("url", "canonical_id").orderBy(
        "start", "end", "ent_id")
    first = (linked_mentions.withColumn(
        "_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select("url", "canonical_id", "start", "end", "ent_text"))
    snippet = F.expr(
        f"substring(text, greatest(0, `start` - {ctx}) + 1, "
        f"(`end` - greatest(0, `start` - {ctx})) + {ctx})")
    return (first.join(pages.select("url", "text"), "url")
            .select("url", "canonical_id",
                    F.col("start").cast("long").alias("start"),
                    F.col("end").cast("long").alias("end"),
                    "ent_text", snippet.alias("evidence")))


def sorted_neighborhood(docs: DataFrame, window: int = 4,
                        key_len: int = 40,
                        n_ranges: int = 32) -> DataFrame:
    """Sorted-neighborhood (SNM, Hernandez-Stolfo) candidate
    generation audit — the third blocking family next to standard
    blocking (token_blocks) and meta-blocking (meta_block_edges):
    sort all records by a content key (here the first ``key_len``
    chars of text), then only records within ``window`` positions of
    each other become candidate pairs, so the comparison space is
    O(n * w) regardless of block-size skew — the property plain
    blocking loses when one key value collects a million records.

    The global rank is computed the SCALABLE way, not with a
    single-partition window: repartitionByRange on the sort key
    gives ordered ranges, a window per range computes local ranks,
    and the bounded per-range counts cumulate into offsets that are
    broadcast back (the classic two-pass distributed sort-rank).
    The output is invariant to where the sampled range boundaries
    land because rank only depends on the total order
    (key, doc_id).  Candidate pairs come from exploding each record
    to its ``window - 1`` successor ranks and ONE equi-join on rank
    — never a rank-band non-equi join.

    Quality is scored against the exact-duplicate truth (identical
    md5(text), the dedup_exact relation): pair completeness =
    captured / truth pairs, reduction ratio = 1 - candidates /
    C(n, 2), both floor-scaled micro6.

    Output (one row): (n_records, w, n_candidate_pairs,
    n_truth_pairs, n_captured, pc_micro6, rr_micro6).
    """
    from pyspark.sql import Window

    keyed = docs.select(
        F.substring("text", 1, key_len).alias("k"),
        F.col("doc_id").cast("long").alias("doc_id"),
        F.md5("text").alias("h"))
    rp = (keyed.repartitionByRange(n_ranges, "k", "doc_id")
          .withColumn("_pid", F.spark_partition_id()))
    wloc = Window.partitionBy("_pid").orderBy("k", "doc_id")
    loc = rp.withColumn("_lr", F.row_number().over(wloc))
    cnts = (loc.groupBy("_pid")
            .agg(F.count(F.lit(1)).cast("long").alias("_c")))
    woff = (Window.orderBy("_pid")
            .rowsBetween(Window.unboundedPreceding, -1))
    offs = cnts.withColumn(
        "_off", F.coalesce(F.sum("_c").over(woff), F.lit(0)))
    ranked = (loc.join(F.broadcast(offs.select("_pid", "_off")),
                       "_pid")
              .select("doc_id", "h",
                      (F.col("_off") + F.col("_lr")).cast("long")
                      .alias("rank")))
    succ = ranked.select(
        F.col("h").alias("h_a"), F.col("rank").alias("_r0"),
        F.explode(F.array(*[F.col("rank") + F.lit(d)
                            for d in range(1, window)])).alias("rank"))
    pairs = succ.join(
        ranked.select(F.col("h").alias("h_b"), "rank"), "rank")
    stats = pairs.agg(
        F.count(F.lit(1)).cast("long").alias("n_candidate_pairs"),
        F.sum((F.col("h_a") == F.col("h_b")).cast("long"))
        .cast("long").alias("n_captured"))
    truth = (keyed.groupBy("h")
             .agg(F.count(F.lit(1)).alias("_c"))
             .agg(F.sum(F.expr("_c * (_c - 1) div 2")).cast("long")
                  .alias("n_truth_pairs"),
                  F.sum("_c").cast("long").alias("n_records")))
    return (truth.crossJoin(stats)
            .select("n_records",
                    F.lit(window).cast("int").alias("w"),
                    "n_candidate_pairs", "n_truth_pairs", "n_captured",
                    F.expr("CAST(CASE WHEN n_truth_pairs > 0 THEN"
                           " 1000000 * n_captured div n_truth_pairs"
                           " ELSE 0 END AS BIGINT)").alias("pc_micro6"),
                    F.expr("CAST(CASE WHEN n_records > 1 THEN 1000000"
                           " - (1000000 * n_candidate_pairs) div"
                           " (n_records * (n_records - 1) div 2)"
                           " ELSE 1000000 END AS BIGINT)")
                    .alias("rr_micro6")))


def soundex_blocks(triples: DataFrame, max_block: int = 50) -> DataFrame:
    """Phonetic (American Soundex) blocking profile for entity
    resolution — the sound-alike companion to :func:`token_blocks`:
    exact token blocks can never pair "smith" with "smyth" or
    "jackson" with "jacksen", phonetic keys are the classic cheap
    recall lever for exactly that typo/transliteration class, and
    the profile (with the same block-purging flag) is what an ER
    pipeline tunes before paying for the pair join.

    Soundex is computed CHAR-LEVEL from relational primitives so
    the DuckDB oracle replays it bit-for-bit (no reliance on either
    engine's built-in, whose H/W edge cases differ): letters map
    b f p v->1, c g j k q s x z->2, d t->3, l->4, m n->5, r->6,
    vowels/y->0; H and W rows are DROPPED before the run-collapse
    window (so same-coded letters separated by h/w collapse — the
    official rule), runs collapse via LAG over the remaining
    sequence, vowel rows then separate (code 0 breaks runs but
    emits nothing), and the key is the uppercased first letter plus
    the first three surviving digits right-padded with 0.

    Output: (sdx, n_tokens, n_entities, purged) — one row per
    phonetic block over the entity-NAME token universe (letters-only
    tokens; phonetics on attribute values or digit strings is
    noise).

    Scale shape: the char explosion runs over DISTINCT name tokens
    (vocabulary-sized, not corpus-sized); windows partition by
    token (bounded length); one block aggregate.
    """
    ents = (triples.select(F.lower("subj").alias("ent"))
            .dropDuplicates())
    toks = (ents.select("ent", F.explode(
                F.split("ent", "[^a-z]+")).alias("token"))
            .where(F.col("token").rlike("^[a-z]+$"))
            .dropDuplicates())
    from pyspark.sql import Window

    tk = toks.select("token").dropDuplicates()
    ch = (tk.select("token",
                    F.explode(F.sequence(
                        F.lit(1), F.char_length("token")))
                    .alias("i"))
          .select("token", "i",
                  F.expr("substring(token, i, 1)").alias("ch")))
    coded = ch.withColumn(
        "code",
        F.expr("CASE WHEN ch IN ('a','e','i','o','u','y') THEN '0'"
               " WHEN ch IN ('h','w') THEN NULL"
               " ELSE translate(ch, 'bfpvcgjkqsxzdtlmnr',"
               " '111122222222334556') END"))
    kept = coded.where(F.col("code").isNotNull() | (F.col("i") == 1))
    w = Window.partitionBy("token").orderBy("i")
    run = (kept.withColumn("_prev", F.lag("code").over(w))
           .where(F.col("_prev").isNull()
                  | (F.col("code") != F.col("_prev"))
                  | F.col("code").isNull()))
    digits = (run.where((F.col("i") > 1) & (F.col("code") != "0")
                        & F.col("code").isNotNull())
              .withColumn("_rn", F.row_number().over(w))
              .where(F.col("_rn") <= 3))
    dig = (digits.groupBy("token")
           .agg(F.array_join(
               F.transform(
                   F.array_sort(F.collect_list(
                       F.struct("i", "code"))),
                   lambda x: x["code"]), "").alias("_d")))
    sdx = (tk.join(dig, "token", "left")
           .select("token",
                   F.concat(F.upper(F.expr(
                       "substring(token, 1, 1)")),
                       F.rpad(F.coalesce(F.col("_d"), F.lit("")),
                              3, "0")).alias("sdx")))
    blocks = (toks.join(sdx, "token")
              .groupBy("sdx")
              .agg(F.countDistinct("token").cast("long")
                   .alias("n_tokens"),
                   F.countDistinct("ent").cast("long")
                   .alias("n_entities")))
    return blocks.withColumn(
        "purged",
        F.when(F.col("n_entities") > max_block, 1)
        .otherwise(0).cast("int"))
