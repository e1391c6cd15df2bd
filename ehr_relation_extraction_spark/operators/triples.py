"""Triple emit + aggregation (reference G1-G4).

G1 (utils.py:497-530): the long (subj, pred, obj) table, arg order
normalized so the hub is always the subject; ``pred`` is the relation
type head (``split(rel_type, '-')[0]``, utils.py:527).  In our pair
representation the hub is already arg1, so normalization is a direct
projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def long_triple_table(relations: DataFrame) -> DataFrame:
    """G1: (url, subj_id, subj, pred, obj)."""
    return relations.select(
        "doc_id",
        "url",
        F.col("hub_id").alias("subj_id"),
        F.col("hub_text").alias("subj"),
        F.split(F.col("rel_type"), "-").getItem(0).alias("pred"),
        F.col("attr_text").alias("obj"),
    )


def dedup_triples(triples: DataFrame) -> DataFrame:
    """G2: drop_duplicates on the long table (utils.py:553)."""
    return triples.dropDuplicates(["url", "subj_id", "subj", "pred", "obj"])


def wide_table(triples: DataFrame) -> DataFrame:
    """G3: groupby (subj_id, subj, pred) -> newline-joined obj list
    (utils.py:561-569).  The reference's list order is pandas insertion
    order after a shuffle — non-deterministic — so we sort the list
    (SURVEY G3 note) for stable comparisons."""
    return (
        triples.groupBy("url", "subj_id", "subj", "pred")
        .agg(F.array_join(F.array_sort(F.collect_list("obj")), "\n").alias("obj_texts"),
             F.count(F.lit(1)).cast("long").alias("n_objs"))
    )


def distinct_subjects(triples: DataFrame) -> DataFrame:
    """G4: sorted distinct subject ids (utils.py:185)."""
    return triples.select("url", "subj_id", "subj").distinct()


def kg_support(triples: DataFrame) -> DataFrame:
    """Evidence scoring per canonical triple — the KG-construction
    step after dedup: how broadly is (subj, pred, obj) attested?
    (n_docs, n_hosts, first_day, last_day) per triple; n_hosts is the
    anti-spam signal (one host repeating a claim 1M times is weaker
    evidence than 100 hosts saying it once).

    day derives from the synthetic crawl clock (warc_ts = CRAWL_EPOCH
    + doc_id seconds, sources/pages.py) so the aggregate needs no side
    join.  One hash-aggregate, map-side combinable, single shuffle on
    the triple key.
    """
    host = F.regexp_extract("url", r"^https?://([^/]*)", 1)
    day = F.expr("(1704067200 + doc_id) div 86400")
    return (triples
            .groupBy("subj", "pred", "obj")
            .agg(F.countDistinct("doc_id").cast("long").alias("n_docs"),
                 F.countDistinct(host).cast("long").alias("n_hosts"),
                 F.min(day).cast("long").alias("first_day"),
                 F.max(day).cast("long").alias("last_day")))


def triple_history(deltas: DataFrame) -> DataFrame:
    """SCD2 validity intervals for a versioned KG: fold the (+/-)
    delta stream (streaming/stateful.recrawl_diff's output contract)
    into one row per presence interval of each triple —
    (url, subj, pred, obj, seq_from, seq_to, is_current), seq_to = -1
    for intervals still open.

    recrawl_diff emits only STATE CHANGES per key (a '+' is always
    followed by '-' or nothing), so each '+' pairs with the next event
    on its key: a single window lead() per key, one shuffle, no
    interval self-join.
    """
    from pyspark.sql import Window

    key = ["url", "subj", "pred", "obj"]
    w = Window.partitionBy(*key).orderBy("crawl_seq")
    ev = (deltas
          .withColumn("_nop", F.lead("op").over(w))
          .withColumn("_nseq", F.lead("crawl_seq").over(w)))
    return (ev.where(F.col("op") == "+")
            .select(*key,
                    F.col("crawl_seq").cast("long").alias("seq_from"),
                    F.when(F.col("_nop") == "-", F.col("_nseq"))
                    .otherwise(F.lit(-1)).cast("long").alias("seq_to"))
            .withColumn("is_current",
                        (F.col("seq_to") == -1).cast("int")))


def synth_crawl_deltas(triples: DataFrame) -> DataFrame:
    """Deterministic delta fixture for triple_history's oracle: every
    distinct triple appears ('+') at seq = min(doc_id) % 5; the
    quarter of triples whose key-md5 starts with 0-3 is retracted
    ('-') two crawls later.  Both engines synthesize identically."""
    base = (triples.groupBy("url", "subj", "pred", "obj")
            .agg(F.min("doc_id").alias("_d")))
    keymd5 = F.md5(F.concat_ws("|", "url", "subj", "pred", "obj"))
    base = base.withColumn("_seq0", F.pmod(F.col("_d"), F.lit(5)).cast("int")) \
               .withColumn("_retract", F.substring(keymd5, 1, 1)
                           .isin("0", "1", "2", "3"))
    plus = base.select("url", "subj", "pred", "obj",
                       F.lit("+").alias("op"),
                       F.col("_seq0").alias("crawl_seq"))
    minus = base.where("_retract").select(
        "url", "subj", "pred", "obj", F.lit("-").alias("op"),
        (F.col("_seq0") + 2).cast("int").alias("crawl_seq"))
    return plus.unionByName(minus)


def triple_intervals(obs: DataFrame, snapshots: DataFrame) -> DataFrame:
    """SCD2 validity intervals across crawl snapshots — the temporal-KG
    step after dedup: WHEN was each (url, subj, pred, obj) claim live?

    ``obs``: one row per triple observation per crawl snapshot
    (url, snap_id, subj, pred, obj); ``snap_id`` is the url's dense
    crawl index (0, 1, 2, ...).  ``snapshots``: the url's full crawl
    schedule (url, snap_id, snap_ts) — needed to CLOSE an interval
    when the next recrawl no longer emits the triple.

    Runs of consecutive snapshots collapse to one interval row
    (gaps-and-islands: island = snap_id - row_number per triple key):
    valid_from = ts of the run's first snapshot, valid_to = ts of the
    url's next snapshot after the run (NULL = the run reaches the
    url's latest crawl = the triple is CURRENT), n_snaps = run length.
    A triple that disappears and later returns gets two rows — that is
    SCD2, not a bug.

    Plan: one window + one aggregate partitioned by the triple key,
    then two (url, snap_id) equi-joins against the schedule — every
    shuffle is on a high-cardinality key, nothing driver-side, so the
    shape survives a 10^12-page crawl history.
    """
    from pyspark.sql import Window

    w = (Window.partitionBy("url", "subj", "pred", "obj")
         .orderBy("snap_id"))
    isl = obs.withColumn(
        "_isl", F.col("snap_id") - F.row_number().over(w))
    runs = (isl.groupBy("url", "subj", "pred", "obj", "_isl")
            .agg(F.min("snap_id").alias("_g0"),
                 F.max("snap_id").alias("_g1"),
                 F.count(F.lit(1)).cast("long").alias("n_snaps")))
    s_from = snapshots.select(
        "url", F.col("snap_id").alias("_g0"),
        F.col("snap_ts").alias("valid_from"))
    s_to = snapshots.select(
        "url", (F.col("snap_id") - 1).alias("_g1"),
        F.col("snap_ts").alias("valid_to"))
    return (runs.join(s_from, ["url", "_g0"])
            .join(s_to, ["url", "_g1"], "left")
            .select("url", "subj", "pred", "obj",
                    F.col("valid_from").cast("long"),
                    F.col("valid_to").cast("long"), "n_snaps"))


def pred_cooccurrence(triples: DataFrame,
                      min_subjects_ab: int = 1) -> DataFrame:
    """Predicate co-occurrence lift — schema induction over the
    emitted KG: which predicate PAIRS attach to the same subject more
    often than chance?  (pred_a, pred_b, n_subj_a, n_subj_b,
    n_subj_ab, lift_micro6) with lift = P(a,b)/(P(a)P(b)) =
    n_subj_ab * N / (n_subj_a * n_subj_b) over N distinct (url, subj)
    subjects, floor-scaled by exact integer division (the
    cooccurrence_pmi device applied to the triple table).

    Scale shape: one distinct projection, a per-subject a<b pair
    self-join (bounded by the per-subject distinct-predicate count —
    single digits in any real schema), two joins against the
    per-predicate subject counts, and the support filter pruning the
    tail before the wide output."""
    subs = triples.select(
        F.concat_ws("\t", "url", "subj").alias("sid"),
        "pred").dropDuplicates()
    n_pred = subs.groupBy("pred").agg(
        F.count(F.lit(1)).cast("long").alias("n_subj"))
    n = subs.select(F.countDistinct("sid").alias("n")).first()["n"]
    a, b = subs.alias("a"), subs.alias("b")
    pairs = (a.join(b, (F.col("a.sid") == F.col("b.sid"))
                    & (F.col("a.pred") < F.col("b.pred")))
             .groupBy(F.col("a.pred").alias("pred_a"),
                      F.col("b.pred").alias("pred_b"))
             .agg(F.count(F.lit(1)).cast("long").alias("n_subj_ab"))
             .where(F.col("n_subj_ab") >= min_subjects_ab))
    out = (pairs
           .join(n_pred.select(F.col("pred").alias("pred_a"),
                               F.col("n_subj").alias("n_subj_a")),
                 "pred_a")
           .join(n_pred.select(F.col("pred").alias("pred_b"),
                               F.col("n_subj").alias("n_subj_b")),
                 "pred_b"))
    return out.select(
        "pred_a", "pred_b", "n_subj_a", "n_subj_b", "n_subj_ab",
        F.expr(f"CAST((n_subj_ab * {n} * 1000000)"
               " DIV (n_subj_a * n_subj_b) AS BIGINT)")
        .alias("lift_micro6"))


def kg_negative_samples(triples: DataFrame, n_neg: int = 2,
                        n_nib: int = 1) -> DataFrame:
    """Filtered negative sampling for KG-embedding training (the
    corrupt-the-object device of TransE-style trainers, Bordes et al.
    NIPS'13), fully deterministic and bucketed — no cross product.

    For each (url, subj, pred, obj) and each j in [0, n_neg): the
    corruption target bucket is the first ``n_nib`` md5 nibbles of
    (j|subj|pred|obj); candidates are the DISTINCT corpus objects
    hashing into that bucket (equi-join on the bucket key, so the
    triple stream meets 1/16^n_nib of the object vocabulary, never
    all of it); the winner is the md5-argmin candidate (the hash IS
    the uniform draw — the random_walks device).  Negatives equal to
    the true object are excluded in-bucket, and candidates that form
    a TRUE corpus triple (same subj, pred) are anti-joined away —
    "filtered" sampling, so no false negatives reach the trainer.
    A (triple, j) whose bucket holds no admissible candidate emits
    nothing (deterministic; the oracle replays it).

    Output: (url, subj, pred, obj, neg_j, neg_obj).

    Plan: one distinct-object projection + bucket equi-join + one
    per-(triple, j) argmin window + one anti-join — every shuffle is
    keyed (bucket, triple key, or (subj, pred, obj)), and the window
    partition count is n_neg x |triples|, never |vocab|."""
    from pyspark.sql import Window

    hexpr = ("instr('0123456789abcdef', substring(md5({v}), {i}, 1)) - 1")

    def _nib(v: str, n: int):
        out = None
        for i in range(1, n + 1):
            t = F.expr(hexpr.format(v=v, i=i))
            out = t if out is None else out * 16 + t
        return out.cast("int")

    pool = (triples.select(F.col("obj").alias("neg_obj")).dropDuplicates()
            .withColumn("bucket", _nib("neg_obj", n_nib)))
    tj = (triples.select("url", "subj", "pred", "obj")
          .dropDuplicates()
          .select("*", F.explode(F.sequence(
              F.lit(0), F.lit(n_neg - 1))).alias("neg_j"))
          .withColumn("bucket", _nib(
              "concat(neg_j, '|', subj, '|', pred, '|', obj)", n_nib)))
    cand = (tj.join(pool, "bucket")
            .where(F.col("neg_obj") != F.col("obj"))
            .withColumn("_draw", F.md5(F.concat_ws(
                "|", "neg_obj", "neg_j", "subj", "pred", "obj"))))
    w = Window.partitionBy("url", "subj", "pred", "obj", "neg_j") \
        .orderBy("_draw")
    picked = (cand.withColumn("_rn", F.row_number().over(w))
              .where(F.col("_rn") == 1)
              .select("url", "subj", "pred", "obj",
                      F.col("neg_j").cast("int").alias("neg_j"),
                      "neg_obj"))
    truth = (triples.select("subj", "pred",
                            F.col("obj").alias("neg_obj"))
             .dropDuplicates())
    return picked.join(truth, ["subj", "pred", "neg_obj"], "left_anti") \
        .select("url", "subj", "pred", "obj", "neg_j", "neg_obj")


def pred_signatures(triples: DataFrame, linked: DataFrame) -> DataFrame:
    """Predicate type signatures — domain-constraint induction over
    the emitted KG: for each predicate, the distribution of SUBJECT
    entity types it attaches to.  (pred, subj_type, n_triples,
    share_micro6) with share = n_triples / total-per-pred,
    floor-scaled.  A predicate whose signature concentrates on one
    type yields a domain constraint ("Date attaches to Topic
    subjects"); drift in the signature across crawls is a schema-
    quality alarm.

    Plan: one (url, subj_id) equi-join against the linked-mention
    table (both sides doc-keyed), one hash-aggregate, one per-pred
    window sum — the window partition count is the predicate
    vocabulary, single digits in any real schema."""
    from pyspark.sql import Window

    j = triples.join(
        linked.select("url", F.col("ent_id").alias("subj_id"),
                      F.col("ent_type").alias("subj_type")),
        ["url", "subj_id"])
    per = (j.groupBy("pred", "subj_type")
           .agg(F.count(F.lit(1)).cast("long").alias("n_triples")))
    w = Window.partitionBy("pred")
    return (per.withColumn("_tot", F.sum("n_triples").over(w))
            .select("pred", "subj_type", "n_triples",
                    F.expr("CAST(n_triples * 1000000 DIV _tot"
                           " AS BIGINT)").alias("share_micro6")))


def pred_obj_linkage(triples: DataFrame, gaz: DataFrame) -> DataFrame:
    """Range-side schema induction, the object twin of
    :func:`pred_signatures`: per predicate, how often the OBJECT
    surface links into the entity dictionary (an entity-valued
    predicate) vs staying a literal string.  (pred, n_triples,
    n_linked_obj, linked_share_micro6), share floor-scaled.

    A share near 1e6 marks an object-property (both ends are KG
    nodes — edges the graph materializer canonicalizes); near 0 a
    data-property (literal attributes).  Plan: one broadcast left
    join on the lowercased object surface + one per-pred aggregate —
    map-side combinable, single keyed shuffle."""
    from pyspark.sql.functions import broadcast

    g = broadcast(gaz.select(F.lower(F.col("alias")).alias("_obj_l"))
                  .dropDuplicates()
                  .withColumn("_hit", F.lit(1)))
    t = triples.select("pred", F.lower(F.col("obj")).alias("_obj_l"))
    return (t.join(g, "_obj_l", "left")
            .groupBy("pred")
            .agg(F.count(F.lit(1)).cast("long").alias("n_triples"),
                 F.sum(F.coalesce(F.col("_hit"), F.lit(0)))
                 .cast("long").alias("n_linked_obj"))
            .select("pred", "n_triples", "n_linked_obj",
                    F.expr("CAST(n_linked_obj * 1000000 DIV n_triples"
                           " AS BIGINT)").alias("linked_share_micro6")))


def pred_violations(triples: DataFrame, linked: DataFrame) -> DataFrame:
    """Domain-constraint ENFORCEMENT over the induced schema — the
    consumer of :func:`pred_signatures`: for each predicate, elect the
    majority subject type (ties broken by type name, deterministic)
    and count the triples that violate it.  (pred, major_type,
    n_triples, n_violations, viol_micro6) with viol = (total -
    majority) / total, floor-scaled — the schema-quality alarm a
    crawl-over-crawl KG build gates on.

    Plan: the pred_signatures (url, subj_id) equi-join + one
    hash-aggregate, then two windows partitioned by pred (predicate
    vocabulary is single digits) and one pred-keyed self-join —
    every shuffle keyed, all map-side combinable."""
    from pyspark.sql import Window

    j = triples.join(
        linked.select("url", F.col("ent_id").alias("subj_id"),
                      F.col("ent_type").alias("subj_type")),
        ["url", "subj_id"])
    per = (j.groupBy("pred", "subj_type")
           .agg(F.count(F.lit(1)).cast("long").alias("n")))
    w = Window.partitionBy("pred").orderBy(F.desc("n"), F.asc("subj_type"))
    major = (per.withColumn("_rk", F.row_number().over(w))
             .where(F.col("_rk") == 1)
             .select("pred", F.col("subj_type").alias("major_type"),
                     F.col("n").alias("_n_major")))
    tot = per.groupBy("pred").agg(
        F.sum("n").cast("long").alias("n_triples"))
    return (major.join(tot, "pred")
            .select("pred", "major_type", "n_triples",
                    (F.col("n_triples") - F.col("_n_major"))
                    .cast("long").alias("n_violations"),
                    F.expr("CAST((n_triples - _n_major) * 1000000 DIV "
                           "n_triples AS BIGINT)").alias("viol_micro6")))


def pred_drift(triples: DataFrame, batch_docs: int = 50) -> DataFrame:
    """Temporal schema drift — predicate mix per crawl batch vs the
    corpus-wide mix.  batch = doc_id // batch_docs is the synthetic
    micro-batch index a rolling crawl commits (the doc_id-derived
    crawl clock of triples_daily is too coarse to split the small-SF
    fixtures, so drift uses the batch index; at production scale the
    caller passes the real ingest-batch id).  Output (batch, pred,
    n_triples, share_batch_micro6, share_all_micro6, drift_micro6)
    with drift = |share_batch - share_all|, exact integer floors.

    Plan: one hash-aggregate on (batch, pred), two roll-up aggregates
    (per batch, per pred), the grand total taken as an UNPARTITIONED
    window over the per-pred roll-up — that relation is predicate-
    vocabulary-sized (single digits at any corpus scale), so the
    one-partition window is a constant-cost hop, not a data funnel,
    and it avoids the 1-row NL-join shape the plan lint bans — then
    two keyed equi-joins, everything map-side combinable."""
    from pyspark.sql import Window
    from pyspark.sql.functions import broadcast

    pd = triples.select(
        F.expr(f"CAST(doc_id DIV {int(batch_docs)} AS INT)").alias("batch"),
        "pred")
    cnt = (pd.groupBy("batch", "pred")
           .agg(F.count(F.lit(1)).cast("long").alias("n_triples")))
    btot = cnt.groupBy("batch").agg(
        F.sum("n_triples").cast("long").alias("_b_tot"))
    # predicate-vocabulary-sized frame: the empty-partition window is
    # a deliberate tiny-relation total, not a corpus shuffle
    ptot = (cnt.groupBy("pred")
            .agg(F.sum("n_triples").cast("long").alias("_p_tot"))
            .withColumn("_n_all",
                        F.sum("_p_tot").over(Window.partitionBy()))
            .select("pred",
                    F.expr("CAST(_p_tot * 1000000 DIV _n_all AS BIGINT)")
                    .alias("share_all_micro6")))
    return (cnt.join(btot, "batch").join(broadcast(ptot), "pred")
            .select("batch", "pred", "n_triples",
                    F.expr("CAST(n_triples * 1000000 DIV _b_tot AS BIGINT)")
                    .alias("share_batch_micro6"),
                    "share_all_micro6")
            .withColumn("drift_micro6",
                        F.abs(F.col("share_batch_micro6")
                              - F.col("share_all_micro6")).cast("long")))


def ntriples_export(triples: DataFrame) -> DataFrame:
    """KG materialization as RDF 1.1 N-Triples lines (the neutral
    interchange the graph tables load into any triple store) —
    entity/predicate IRIs minted from slugged surfaces under a fixed
    namespace, object kept a literal with the spec's string escapes
    (backslash first, then quote, LF, CR, TAB; UTF-8 passthrough is
    legal N-Triples).  Output (nt, n_docs): one row per distinct
    serialized line with its provenance breadth — the dedup the wide
    graph tables already apply, restated at the export boundary.

    Plan: pure codegen string expressions + ONE hash-aggregate on the
    line itself (map-side combinable count-distinct on doc_id); no
    joins, no windows — the shape that survives a 10^12-doc export."""
    def slug(c):
        return F.regexp_replace(F.lower(c), "[^a-z0-9]+", "_")

    esc = F.col("obj")
    for s, r in (("\\", "\\\\"), ('"', '\\"'),
                 ("\n", "\\n"), ("\r", "\\r"), ("\t", "\\t")):
        esc = F.replace(esc, F.lit(s), F.lit(r))
    nt = F.concat(
        F.lit("<http://kg.example/e/"), slug(F.col("subj")),
        F.lit("> <http://kg.example/p/"), slug(F.col("pred")),
        F.lit('> "'), esc, F.lit('" .'))
    return (triples.select(F.col("doc_id"), nt.alias("nt"))
            .groupBy("nt")
            .agg(F.countDistinct("doc_id").cast("long").alias("n_docs")))


def pred_cardinality(triples: DataFrame) -> DataFrame:
    """Cardinality profile per predicate — the functional-vs-multi
    classification every KG schema validator starts from (a predicate
    whose subjects each carry exactly one object is a functional
    property; AMIE and PARIS both key their pruning on this).  Over
    the DISTINCT fact set (subj, pred, obj):

        n_subjs           distinct subjects carrying the predicate
        n_objs            distinct object values
        n_facts           distinct (subj, obj) instantiations
        max_objs_per_subj the cardinality bound actually observed
        avg_objs_micro6   n_facts * 1e6 DIV n_subjs (floor)
        is_functional     1 iff max_objs_per_subj == 1

    Plan: one distinct projection, one (pred, subj) aggregate, one
    pred roll-up — two shuffles on low-cardinality keys, all counts
    map-side combinable; no joins against the fact table itself."""
    facts = triples.select("subj", "pred", "obj").dropDuplicates()
    per_subj = facts.groupBy("pred", "subj").agg(
        F.count(F.lit(1)).cast("long").alias("n_o"),
        F.countDistinct("obj").cast("long").alias("n_do"))
    return (per_subj.groupBy("pred")
            .agg(F.count(F.lit(1)).cast("long").alias("n_subjs"),
                 F.sum("n_o").cast("long").alias("n_facts"),
                 F.max("n_do").cast("long").alias("max_objs_per_subj"))
            .join(facts.groupBy("pred").agg(
                F.countDistinct("obj").cast("long").alias("n_objs")),
                "pred")
            .select("pred", "n_subjs", "n_objs", "n_facts",
                    "max_objs_per_subj",
                    F.expr("CAST(n_facts * 1000000 DIV n_subjs AS BIGINT)")
                    .alias("avg_objs_micro6"),
                    F.expr("CAST(CASE WHEN max_objs_per_subj = 1 "
                           "THEN 1 ELSE 0 END AS INT)")
                    .alias("is_functional")))


def shared_object_rules(triples: DataFrame,
                        max_obj_fanout: int = 50,
                        min_body: int = 2) -> DataFrame:
    """AMIE-style rule mining, shaped for attribute-valued KGs: mine
    rules  p1(x, o) AND p2(z, o)  =>  comention(x, z)  — "two subjects
    sharing an object value under (p1, p2) tend to co-occur in a
    document".  Classic chain rules (p1(x,y) AND p2(y,z) => p3(x,z))
    are empty here because objects are literals (dates/money/percent)
    that never re-appear as subjects, so the object-mediated form IS
    the meaningful Horn rule family for this schema; the head relation
    is the co-mention evidence the canonicalizer already trusts.

    Per unordered predicate pair (pred_a <= pred_b):
        n_body     distinct subject pairs (x < z) sharing >=1 object
                   value under the pair
        n_supported  of those, pairs also attested as subjects in one
                   common document (the head)
        conf_micro6  n_supported * 1e6 DIV n_body

    Skew guard (the AMIE functionality-pruning device): object values
    carried by more than ``max_obj_fanout`` distinct subjects are
    dropped BEFORE the pair join — a heavy literal like a bare year
    would otherwise square into fanout^2 pair rows per value.  With
    the cap, the self-join output is bounded by n_objs * cap^2 and
    every join is a hash/sort-merge equi-join; nothing is all-pairs."""
    facts = triples.select("subj", "pred", "obj").dropDuplicates()
    ok = (facts.groupBy("obj")
          .agg(F.countDistinct("subj").cast("long").alias("fan"))
          .where(F.col("fan") <= max_obj_fanout)
          .select("obj"))
    f = facts.join(ok, "obj")
    a, b = f.alias("a"), f.alias("b")
    body = (a.join(b, (F.col("a.obj") == F.col("b.obj"))
                   & (F.col("a.subj") < F.col("b.subj")))
            .select(F.least("a.pred", "b.pred").alias("pred_a"),
                    F.greatest("a.pred", "b.pred").alias("pred_b"),
                    F.col("a.subj").alias("x"),
                    F.col("b.subj").alias("z"))
            .dropDuplicates())
    ds = triples.select("doc_id", "subj").dropDuplicates()
    da, db = ds.alias("da"), ds.alias("db")
    head = (da.join(db, (F.col("da.doc_id") == F.col("db.doc_id"))
                    & (F.col("da.subj") < F.col("db.subj")))
            .select(F.col("da.subj").alias("x"),
                    F.col("db.subj").alias("z"))
            .dropDuplicates())
    sup = (body.join(head, ["x", "z"], "left_semi")
           .groupBy("pred_a", "pred_b")
           .agg(F.count(F.lit(1)).cast("long").alias("n_supported")))
    return (body.groupBy("pred_a", "pred_b")
            .agg(F.count(F.lit(1)).cast("long").alias("n_body"))
            .where(F.col("n_body") >= min_body)
            .join(sup, ["pred_a", "pred_b"], "left")
            .select("pred_a", "pred_b", "n_body",
                    F.coalesce("n_supported", F.lit(0))
                    .cast("long").alias("n_supported"))
            .withColumn("conf_micro6",
                        F.expr("CAST(n_supported * 1000000 DIV n_body"
                               " AS BIGINT)")))


def entity_attr_jaccard(triples: DataFrame,
                        max_attr_fanout: int = 50) -> DataFrame:
    """Entity similarity by attribute overlap — exact Jaccard over
    each subject's set of (pred, obj) attribute pairs, the structured
    cousin of the text-shingle near-dup pass (two subjects with the
    same dates/amounts/locations are merge candidates the surface-form
    linker can't see).

    Candidate generation is BLOCKED, never all-pairs: only subject
    pairs sharing >=1 attribute meet, via an equi-join on the
    (pred, obj) key.  Attributes carried by more than
    ``max_attr_fanout`` subjects are dropped from the universe FIRST
    (both from blocking and from set sizes), so the join output is
    bounded by n_attrs * cap^2 and the Jaccard stays exact over the
    pruned attribute universe — the frequency cap is part of the
    similarity's definition, not a silent approximation.

    Output per (subj_a < subj_b): n_inter, n_union, jac_micro6 =
    n_inter * 1e6 DIV n_union."""
    attrs = triples.select("subj", "pred", "obj").dropDuplicates()
    ok = (attrs.groupBy("pred", "obj")
          .agg(F.countDistinct("subj").cast("long").alias("fan"))
          .where(F.col("fan") <= max_attr_fanout)
          .select("pred", "obj"))
    f = attrs.join(ok, ["pred", "obj"])
    sizes = f.groupBy("subj").agg(
        F.count(F.lit(1)).cast("long").alias("n_attrs"))
    a, b = f.alias("a"), f.alias("b")
    inter = (a.join(b, (F.col("a.pred") == F.col("b.pred"))
                    & (F.col("a.obj") == F.col("b.obj"))
                    & (F.col("a.subj") < F.col("b.subj")))
             .groupBy(F.col("a.subj").alias("subj_a"),
                      F.col("b.subj").alias("subj_b"))
             .agg(F.count(F.lit(1)).cast("long").alias("n_inter")))
    return (inter
            .join(sizes.select(F.col("subj").alias("subj_a"),
                               F.col("n_attrs").alias("na")), "subj_a")
            .join(sizes.select(F.col("subj").alias("subj_b"),
                               F.col("n_attrs").alias("nb")), "subj_b")
            .select("subj_a", "subj_b", "n_inter",
                    F.expr("CAST(na + nb - n_inter AS BIGINT)")
                    .alias("n_union"))
            .withColumn("jac_micro6",
                        F.expr("CAST(n_inter * 1000000 DIV n_union"
                               " AS BIGINT)")))


def kg_asof(intervals: DataFrame, ts: int) -> DataFrame:
    """Point-in-time KG reconstruction — the temporal-KG read path
    over the SCD2 intervals :func:`triple_intervals` emits: the facts
    LIVE at timestamp ``ts`` are exactly the rows whose validity
    window contains it (valid_from <= ts < valid_to, NULL valid_to =
    still current).  One codegen filter over the interval table — at
    10^12 scale the intervals live in a partitioned store and this
    predicate prunes on the partition column before scanning."""
    return (intervals
            .where((F.col("valid_from") <= ts)
                   & (F.col("valid_to").isNull()
                      | (F.col("valid_to") > ts)))
            .select("url", "subj", "pred", "obj", "n_snaps"))


def interval_conflicts(intervals: DataFrame) -> DataFrame:
    """Temporal conflict detection — concurrent contradictory claims:
    pairs of DIFFERENT object values for the same (url, subj, pred)
    whose validity windows OVERLAP (both were live at once).  This is
    the range-join form of KG consistency checking: the join is an
    EQUI-join on the (url, subj, pred) claim key with the interval
    overlap as a post-filter, so the shuffle key is high-cardinality
    and the per-key pair fanout is bounded by the url's snapshot count
    — never an all-pairs interval product.

    Output per conflicting pair (obj_a < obj_b): the overlap window
    (overlap_to NULL = both claims still current)."""
    inf = 1 << 62
    cols = ["url", "subj", "pred", "obj", "valid_from", "valid_to"]
    a = intervals.select(*cols).alias("a")
    b = intervals.select(*cols).alias("b")
    a_to = F.coalesce(F.col("a.valid_to"), F.lit(inf))
    b_to = F.coalesce(F.col("b.valid_to"), F.lit(inf))
    return (a.join(b, (F.col("a.url") == F.col("b.url"))
                   & (F.col("a.subj") == F.col("b.subj"))
                   & (F.col("a.pred") == F.col("b.pred"))
                   & (F.col("a.obj") < F.col("b.obj"))
                   & (F.col("a.valid_from") < b_to)
                   & (F.col("b.valid_from") < a_to))
            .select(F.col("a.url").alias("url"),
                    F.col("a.subj").alias("subj"),
                    F.col("a.pred").alias("pred"),
                    F.col("a.obj").alias("obj_a"),
                    F.col("b.obj").alias("obj_b"),
                    F.greatest("a.valid_from", "b.valid_from")
                    .cast("long").alias("overlap_from"),
                    F.when(F.col("a.valid_to").isNull()
                           & F.col("b.valid_to").isNull(), F.lit(None))
                    .otherwise(F.least(a_to, b_to))
                    .cast("long").alias("overlap_to")))


def star_query_coverage(triples: DataFrame, top_k: int = 10,
                        min_match: int = 2) -> DataFrame:
    """Conjunctive (star-shaped) pattern coverage — the SPARQL-BGP
    read path over the attribute KG: take the ``top_k`` globally
    most-attested (pred, obj) attribute patterns (ties broken by
    name), then return every subject matching at least ``min_match``
    of them with its match count and provenance breadth.

    Plan: the pattern table is a distributed top-k
    (TakeOrderedAndProject — never a global single-partition window),
    then a BROADCAST equi-join of the fact stream against the k-row
    pattern side and one subject aggregate.  At 10^12 scale the
    broadcast side stays k rows no matter the corpus."""
    facts = triples.select("subj", "pred", "obj").dropDuplicates()
    pat = (facts.groupBy("pred", "obj")
           .agg(F.count(F.lit(1)).cast("long").alias("n"))
           .orderBy(F.desc("n"), "pred", "obj")
           .limit(top_k)
           .select("pred", "obj"))
    return (triples.join(F.broadcast(pat), ["pred", "obj"])
            .groupBy("subj")
            .agg(F.countDistinct("pred", "obj").cast("long")
                 .alias("n_matched"),
                 F.countDistinct("doc_id").cast("long").alias("n_docs"))
            .where(F.col("n_matched") >= min_match))


def attr_merge_clusters(triples: DataFrame,
                        min_jac_micro6: int = 500000,
                        max_attr_fanout: int = 50) -> DataFrame:
    """Attribute-based entity merging — the similarity pass promoted
    to a merge PROPOSAL: connected components over the
    :func:`entity_attr_jaccard` graph thresholded at ``min_jac``
    (default 0.5), so subjects whose attribute sets substantially
    agree land in one cluster even when their surface forms share no
    alias.  This closes the canonicalization loop the alias linker
    starts: surface-form CC merges spellings, attribute CC merges
    co-referent entities with different names.

    Output (subj, cluster): cluster = lexicographic min subject of the
    component (the same convention as canonical_components).  Plan:
    the blocked Jaccard join (never all-pairs), one filter, then the
    log-round large/small-star CC — every round a key equi-join."""
    from .linking import connected_components

    jac = entity_attr_jaccard(triples, max_attr_fanout=max_attr_fanout)
    edges = (jac.where(F.col("jac_micro6") >= min_jac_micro6)
             .select(F.col("subj_a").alias("src"),
                     F.col("subj_b").alias("dst")))
    facts = triples.select("subj", "pred", "obj").dropDuplicates()
    ok = (facts.groupBy("pred", "obj")
          .agg(F.countDistinct("subj").cast("long").alias("fan"))
          .where(F.col("fan") <= max_attr_fanout)
          .select("pred", "obj"))
    nodes = (facts.join(ok, ["pred", "obj"])
             .select(F.col("subj").alias("node")).dropDuplicates())
    return (connected_components(edges, nodes)
            .select(F.col("node").alias("subj"),
                    F.col("component").alias("cluster")))


def kg_churn(intervals: DataFrame, ts1: int, ts2: int) -> DataFrame:
    """KG churn between two point-in-time cuts — per predicate, how
    many claims were ADDED, REMOVED, and STABLE between the KGs live
    at ``ts1`` and ``ts2``: the drift report a recrawl pipeline emits
    per crawl generation.

    A fact is live at a cut iff ANY of its SCD2 interval rows contains
    it (a fact can have several runs).  Plan: one pass over the
    interval table computing both liveness flags per row, one
    fact-level max-aggregate, one predicate roll-up — two shuffles,
    both map-side combinable."""
    def live(ts: int):
        return F.when((F.col("valid_from") <= ts)
                      & (F.col("valid_to").isNull()
                         | (F.col("valid_to") > ts)), 1).otherwise(0)

    per_fact = (intervals
                .select("url", "subj", "pred", "obj",
                        live(ts1).alias("l1"), live(ts2).alias("l2"))
                .groupBy("url", "subj", "pred", "obj")
                .agg(F.max("l1").alias("l1"), F.max("l2").alias("l2")))
    return (per_fact.groupBy("pred")
            .agg(F.sum(F.expr("CASE WHEN l1 = 0 AND l2 = 1 THEN 1 "
                              "ELSE 0 END")).cast("long").alias("n_added"),
                 F.sum(F.expr("CASE WHEN l1 = 1 AND l2 = 0 THEN 1 "
                              "ELSE 0 END")).cast("long")
                 .alias("n_removed"),
                 F.sum(F.expr("CASE WHEN l1 = 1 AND l2 = 1 THEN 1 "
                              "ELSE 0 END")).cast("long")
                 .alias("n_stable")))


def hapax_objects(triples: DataFrame) -> DataFrame:
    """Open-IE noise indicator per predicate: the share of object
    values attested by exactly ONE distinct fact (hapax legomena of
    the object vocabulary).  A predicate whose objects are mostly
    hapax is extraction noise or free text; one whose objects repeat
    is a real vocabulary.  (pred, n_objs, n_hapax,
    hapax_share_micro6) — two hash-aggregates over the distinct fact
    set, no joins against the corpus."""
    facts = triples.select("subj", "pred", "obj").dropDuplicates()
    per_obj = facts.groupBy("pred", "obj").agg(
        F.count(F.lit(1)).cast("long").alias("n"))
    return (per_obj.groupBy("pred")
            .agg(F.count(F.lit(1)).cast("long").alias("n_objs"),
                 F.sum(F.expr("CASE WHEN n = 1 THEN 1 ELSE 0 END"))
                 .cast("long").alias("n_hapax"))
            .withColumn("hapax_share_micro6",
                        F.expr("CAST(n_hapax * 1000000 DIV n_objs"
                               " AS BIGINT)")))


def jaccard_best_match(triples: DataFrame,
                       max_attr_fanout: int = 50) -> DataFrame:
    """Reciprocal-best-match entity alignment — the classic entity-
    resolution acceptance rule on top of :func:`entity_attr_jaccard`:
    keep a candidate pair only when each side is the OTHER's single
    best match (ties broken by neighbor name), the mutual-argmax
    filter that turns a similarity table into high-precision merge
    proposals without any threshold tuning.

    Plan: symmetrize the (already blocked) pair table, one per-node
    row_number window to pick each node's best neighbor, then a
    self-equi-join on the ordered pair key to keep mutual winners —
    no new join class over the Jaccard pass itself."""
    from pyspark.sql import Window

    jac = entity_attr_jaccard(triples, max_attr_fanout=max_attr_fanout)
    sym = (jac.select(F.col("subj_a").alias("me"),
                      F.col("subj_b").alias("other"), "jac_micro6")
           .union(jac.select(F.col("subj_b").alias("me"),
                             F.col("subj_a").alias("other"),
                             "jac_micro6")))
    w = Window.partitionBy("me").orderBy(F.desc("jac_micro6"), "other")
    best = (sym.withColumn("_rk", F.row_number().over(w))
            .where(F.col("_rk") == 1)
            .select("me", "other", "jac_micro6"))
    a = best.where(F.col("me") < F.col("other"))
    b = best.select(F.col("other").alias("me"),
                    F.col("me").alias("other"))
    return (a.join(b, ["me", "other"], "left_semi")
            .select(F.col("me").alias("subj_a"),
                    F.col("other").alias("subj_b"), "jac_micro6"))


def pred_jaccard(triples: DataFrame) -> DataFrame:
    """Predicate similarity by SUBJECT-set overlap — the schema-
    matching companion to :func:`pred_cooccurrence` (which scores
    lift): exact Jaccard between the sets of subjects each predicate
    attaches to, the signal ontology-alignment uses to propose that
    two predicates mean the same thing.

    Candidates are blocked on the shared subject (per-subject distinct
    predicate count is single digits in any real schema, so the
    self-join is bounded per subject, never |preds|^2 over the
    vocabulary).  Output per (pred_a < pred_b): n_inter, n_union,
    jac_micro6."""
    ps = triples.select("subj", "pred").dropDuplicates()
    sizes = ps.groupBy("pred").agg(
        F.count(F.lit(1)).cast("long").alias("n_subj"))
    a, b = ps.alias("a"), ps.alias("b")
    inter = (a.join(b, (F.col("a.subj") == F.col("b.subj"))
                    & (F.col("a.pred") < F.col("b.pred")))
             .groupBy(F.col("a.pred").alias("pred_a"),
                      F.col("b.pred").alias("pred_b"))
             .agg(F.count(F.lit(1)).cast("long").alias("n_inter")))
    return (inter
            .join(sizes.select(F.col("pred").alias("pred_a"),
                               F.col("n_subj").alias("na")), "pred_a")
            .join(sizes.select(F.col("pred").alias("pred_b"),
                               F.col("n_subj").alias("nb")), "pred_b")
            .select("pred_a", "pred_b", "n_inter",
                    F.expr("CAST(na + nb - n_inter AS BIGINT)")
                    .alias("n_union"))
            .withColumn("jac_micro6",
                        F.expr("CAST(n_inter * 1000000 DIV n_union"
                               " AS BIGINT)")))


def pred_ifp(triples: DataFrame) -> DataFrame:
    """Inverse-functional predicate detection — the transpose of
    :func:`pred_cardinality`: a predicate whose object values each
    belong to exactly ONE subject is an identity KEY (OWL's
    InverseFunctionalProperty — emails, registration numbers), the
    strongest entity-resolution signal a KG carries: two subjects
    sharing an IFP object ARE the same entity.

        n_objs                distinct object values
        n_subjs               distinct subjects
        n_facts               distinct (subj, obj) instantiations
        max_subjs_per_obj     the observed key violation bound
        avg_subjs_micro6      n_facts * 1e6 DIV n_objs (floor)
        is_inverse_functional 1 iff max_subjs_per_obj == 1

    Same two-aggregate plan shape as pred_cardinality."""
    facts = triples.select("subj", "pred", "obj").dropDuplicates()
    per_obj = facts.groupBy("pred", "obj").agg(
        F.count(F.lit(1)).cast("long").alias("n_s"),
        F.countDistinct("subj").cast("long").alias("n_ds"))
    return (per_obj.groupBy("pred")
            .agg(F.count(F.lit(1)).cast("long").alias("n_objs"),
                 F.sum("n_s").cast("long").alias("n_facts"),
                 F.max("n_ds").cast("long").alias("max_subjs_per_obj"))
            .join(facts.groupBy("pred").agg(
                F.countDistinct("subj").cast("long").alias("n_subjs")),
                "pred")
            .select("pred", "n_objs", "n_subjs", "n_facts",
                    "max_subjs_per_obj",
                    F.expr("CAST(n_facts * 1000000 DIV n_objs AS BIGINT)")
                    .alias("avg_subjs_micro6"),
                    F.expr("CAST(CASE WHEN max_subjs_per_obj = 1 "
                           "THEN 1 ELSE 0 END AS INT)")
                    .alias("is_inverse_functional")))


def url_recrawl_priority(intervals: DataFrame) -> DataFrame:
    """Churn-driven recrawl scheduling — per url, how often do its
    claims change across crawl snapshots?  A url whose SCD2 intervals
    keep CLOSING (claims appearing/disappearing between crawls) earns
    recrawl budget; a url whose intervals all run to the latest crawl
    is static and can be demoted.  The crawl-ops read path over the
    temporal KG:

        n_claims      distinct (subj, pred, obj) ever observed
        n_intervals   SCD2 interval rows (>= n_claims; re-appearing
                      claims add rows)
        n_closed      intervals closed by a later crawl (= changes)
        churn_micro6  n_closed * 1e6 DIV n_intervals

    One grouped aggregate over the interval table — the shape that
    survives a 10^12-url crawl history."""
    return (intervals.groupBy("url")
            .agg(F.countDistinct("subj", "pred", "obj").cast("long")
                 .alias("n_claims"),
                 F.count(F.lit(1)).cast("long").alias("n_intervals"),
                 F.sum(F.expr("CASE WHEN valid_to IS NULL THEN 0 "
                              "ELSE 1 END")).cast("long")
                 .alias("n_closed"))
            .withColumn("churn_micro6",
                        F.expr("CAST(n_closed * 1000000 DIV n_intervals"
                               " AS BIGINT)")))


def merge_cluster_stats(triples: DataFrame,
                        min_jac_micro6: int = 500000,
                        max_attr_fanout: int = 50) -> DataFrame:
    """Quality report for the ATTRIBUTE-merge proposal: the
    community_stats conductance/volume accounting applied to the
    thresholded Jaccard graph under the :func:`attr_merge_clusters`
    partition — low conductance means the proposed merge cluster is
    denser inside than at its boundary and is safe to apply; a
    high-conductance cluster is a chaining artifact the pipeline
    should hold for review.  The same generic operator serves both
    the LPA communities and this merge partition — graph + labels in,
    quality out."""
    from .graph_algos import community_stats

    jac = entity_attr_jaccard(triples, max_attr_fanout=max_attr_fanout)
    edges = (jac.where(F.col("jac_micro6") >= min_jac_micro6)
             .select(F.col("subj_a").alias("src"),
                     F.col("subj_b").alias("dst")))
    labels = (attr_merge_clusters(triples,
                                  min_jac_micro6=min_jac_micro6,
                                  max_attr_fanout=max_attr_fanout)
              .select(F.col("subj").alias("node"),
                      F.col("cluster").alias("label")))
    return community_stats(edges, labels)


def truth_finding(triples: DataFrame, n_rounds: int = 3,
                  scale: int = 10**6) -> "tuple[DataFrame, DataFrame]":
    """Truth finding / knowledge fusion (the Sums device of
    TruthFinder-family data fusion, Yin et al. / Dong et al.): iterate
    SOURCE TRUST <-> CLAIM BELIEF over the bipartite host-claim
    attestation graph —

        trust_i(host)   = (Σ belief of its claims) * scale // max
        belief_i(claim) = (Σ trust of attesting hosts) * scale // max

    A claim attested by many trusted hosts is believable; a host whose
    claims are believable is trusted — the circular definition the
    fixed-point resolves, and the principled replacement for raw
    attestation counts when sources copy each other or spam.

    Same integer max-normalized discipline as hits_fixed (sums of
    BIGINTs, floor divisions, localCheckpoint per round) so the
    unrolled-CTE DuckDB oracle matches bit-exactly.  Returns
    (claim_beliefs, source_trust): (subj, pred, obj, belief_u) and
    (host, trust_u), both in units of 1/scale with column max = scale.

    Plan per round: two bipartite equi-joins + two grouped sums + two
    lazy 1-row MAX scalars — no driver sync in the loop."""
    host = F.regexp_extract("url", r"^https?://([^/]*)", 1)
    e = (triples.select(host.alias("host"), "subj", "pred", "obj")
         .dropDuplicates()).localCheckpoint()
    claims = e.select("subj", "pred", "obj").dropDuplicates() \
        .localCheckpoint()
    hosts = e.select("host").dropDuplicates().localCheckpoint()
    belief = claims.withColumn("b", F.lit(scale).cast("long"))
    trust = None
    key = ["subj", "pred", "obj"]
    for _ in range(n_rounds):
        t_raw = (e.join(belief, key)
                 .groupBy("host")
                 .agg(F.sum("b").cast("long").alias("raw")))
        t_all = (hosts.join(t_raw, "host", "left")
                 .select("host", F.coalesce("raw", F.lit(0))
                         .cast("long").alias("raw")))
        t_mx = t_all.agg(F.max("raw").alias("mx"))
        trust = (t_all.crossJoin(t_mx)  # 1-row frame: stays lazy
                 .select("host",
                         F.expr(f"CAST((raw * {scale}) DIV mx"
                                " AS BIGINT)").alias("t"))
                 ).localCheckpoint()
        b_raw = (e.join(trust, "host")
                 .groupBy(*key)
                 .agg(F.sum("t").cast("long").alias("raw")))
        b_all = (claims.join(b_raw, key, "left")
                 .select(*key, F.coalesce("raw", F.lit(0))
                         .cast("long").alias("raw")))
        b_mx = b_all.agg(F.max("raw").alias("mx"))
        belief = (b_all.crossJoin(b_mx)
                  .select(*key,
                          F.expr(f"CAST((raw * {scale}) DIV mx"
                                 " AS BIGINT)").alias("b"))
                  ).localCheckpoint()
    return (belief.select(*key, F.col("b").alias("belief_u")),
            trust.select("host", F.col("t").alias("trust_u")))


def kg_resolved(triples: DataFrame, n_rounds: int = 3,
                beliefs: DataFrame | None = None) -> DataFrame:
    """Conflict-resolved KG — the truth-finding capstone: for every
    (subj, pred) slot, elect the object value with the HIGHEST fused
    belief (ties on the object value), replacing the naive
    majority-vote resolution with source-trust-weighted evidence.
    This is the step that turns the long attestation table into the
    single-valued KG a downstream application reads.

        (subj, pred, obj, belief_u, n_alternatives)

    n_alternatives counts the competing object values the winner beat
    (1 = uncontested).  Plan: the truth_finding rounds, then one
    per-(subj, pred) row_number window over the belief table — the
    window partitions are slot-sized (a handful of candidate values),
    never corpus-wide."""
    from pyspark.sql import Window

    if beliefs is None:
        beliefs, _ = truth_finding(triples, n_rounds=n_rounds)
    w = (Window.partitionBy("subj", "pred")
         .orderBy(F.desc("belief_u"), "obj"))
    n = (beliefs.groupBy("subj", "pred")
         .agg(F.count(F.lit(1)).cast("long").alias("n_alternatives")))
    return (beliefs.withColumn("_rk", F.row_number().over(w))
            .where(F.col("_rk") == 1)
            .join(n, ["subj", "pred"])
            .select("subj", "pred", "obj", "belief_u",
                    "n_alternatives"))


def host_error_rate(triples: DataFrame, n_rounds: int = 3,
                    beliefs: DataFrame | None = None) -> DataFrame:
    """Source error rate — the fusion diagnostic that closes the
    truth-finding loop: for every host, the share of its attestations
    whose object value LOST the belief-argmax for its (subj, pred)
    slot.  A high error rate marks a host that systematically asserts
    values the trusted consensus rejects — the input to crawl
    blocklisting and source weighting.

        (host, n_attested, n_wrong, err_micro6)

    n_attested counts the host's distinct claim attestations; n_wrong
    those whose object differs from the resolved winner.  Plan: the
    truth_finding rounds, the slot-argmax window, then ONE equi-join
    of the attestation edges against the winner table on the slot key
    and a host roll-up."""
    winners = (kg_resolved(triples, n_rounds=n_rounds,
                           beliefs=beliefs)
               .select("subj", "pred", F.col("obj").alias("_win")))
    host = F.regexp_extract("url", r"^https?://([^/]*)", 1)
    e = (triples.select(host.alias("host"), "subj", "pred", "obj")
         .dropDuplicates())
    return (e.join(winners, ["subj", "pred"])
            .groupBy("host")
            .agg(F.count(F.lit(1)).cast("long").alias("n_attested"),
                 F.sum(F.expr("CASE WHEN obj = _win THEN 0 ELSE 1 END"))
                 .cast("long").alias("n_wrong"))
            .withColumn("err_micro6",
                        F.expr("CAST(n_wrong * 1000000 DIV n_attested"
                               " AS BIGINT)")))


def literal_profiles(triples: DataFrame) -> DataFrame:
    """Numeric-literal range induction per predicate — the
    literal-side schema profile: parse the first numeric magnitude
    out of each object literal ("$1,234.56" -> 1234560000 micro) and
    aggregate min/max/sum per predicate, plus the numeric share.  The
    validator this feeds flags a claim whose magnitude falls outside
    its predicate's observed range (a Percent of 4,700 is extraction
    noise).

    Parsing is pure string algebra so both engines agree exactly:
    integer part = first [0-9][0-9,]* run (commas stripped),
    fraction = the following .[0-9]+ if present, micro value =
    int * 1e6 + first-6-digits-right-padded fraction.  No float ever
    materializes.

    Output: (pred, n_values, n_numeric, min_micro, max_micro,
    sum_micro) over the distinct fact set; min/max/sum are NULL for
    predicates with no numeric literal."""
    facts = triples.select("pred", "obj").dropDuplicates()
    intpart = F.regexp_replace(
        F.regexp_extract("obj", r"([0-9][0-9,]*)(\.[0-9]+)?", 1),
        ",", "")
    frac = F.regexp_extract("obj", r"([0-9][0-9,]*)(\.[0-9]+)?", 2)
    frac6 = F.substring(F.rpad(F.regexp_replace(frac, r"\.", ""),
                               6, "0"), 1, 6)
    micro = F.when(
        intpart != "",
        intpart.cast("long") * 1000000 + frac6.cast("long"))
    return (facts.select("pred", micro.alias("_m"))
            .groupBy("pred")
            .agg(F.count(F.lit(1)).cast("long").alias("n_values"),
                 F.count("_m").cast("long").alias("n_numeric"),
                 F.min("_m").cast("long").alias("min_micro"),
                 F.max("_m").cast("long").alias("max_micro"),
                 F.sum("_m").cast("long").alias("sum_micro")))


# floor(log10(1 + 1/d) * 1e6) for d = 1..9: the Benford expected
# first-digit shares as exact integer literals, identical on both
# engines (no runtime log10 — floats never materialize).
_BENFORD_MICRO6 = (301029, 176091, 124938, 96910, 79181,
                   66946, 57991, 51152, 45757)


def benford_digits(triples: DataFrame) -> DataFrame:
    """Benford first-significant-digit forensics per predicate — the
    extraction-noise detector for numeric literals: natural magnitude
    data (Money, population-like Counts) follows Benford's law, while
    template artifacts, unit-confused parses, or fabricated fills show
    up as digit spikes (a wall of "$9.99" prices, a scraper that
    duplicates "2024" into Money slots).

    Digit extraction is pure string algebra shared with
    ``literal_profiles``: take the first numeric run (int part +
    optional fraction), strip commas/dot, strip leading zeros, first
    remaining char is the first significant digit.  Rows with no
    nonzero digit are excluded (a literal "0.00" has no Benford
    digit).

    Output: one row per (pred, digit 1..9) — zero-count digits
    included, so the 9-row profile is always complete —

        (pred, digit, n_obs, n_total, obs_micro6, exp_micro6,
         dev_micro6, mad_micro6)

    where obs_micro6 = n_obs*1e6 DIV n_total, exp_micro6 is the
    Benford table constant, dev = |obs - exp|, and mad_micro6 (the
    standard Benford MAD conformity score, repeated on each of the
    pred's 9 rows) = sum(dev over 9 digits) DIV 9.

    Plan: distinct fact projection, ONE pred-keyed aggregate building
    the 9 conditional counts as an array, then posexplode + row-local
    integer algebra — the only shuffles are the fact distinct and a
    |preds|-row aggregate."""
    facts = triples.select("pred", "obj").dropDuplicates()
    digits = F.regexp_replace(
        F.regexp_replace(
            F.regexp_extract("obj", r"([0-9][0-9,]*)(\.[0-9]+)?", 0),
            r"[^0-9]", ""),
        r"^0+", "")
    d = F.when(digits != "", F.substring(digits, 1, 1).cast("int"))
    counts = (facts.select("pred", d.alias("_d"))
              .where(F.col("_d").isNotNull())
              .groupBy("pred")
              .agg(F.array(*[
                  F.sum(F.when(F.col("_d") == i, 1).otherwise(0))
                  .cast("long")
                  for i in range(1, 10)]).alias("_c")))
    exp_arr = F.array(*[F.lit(c).cast("long")
                        for c in _BENFORD_MICRO6])
    row = (counts
           .withColumn("n_total", F.expr(
               "aggregate(_c, CAST(0 AS BIGINT), (a, x) -> a + x)"))
           .withColumn("_exp", exp_arr)
           .select("pred", "n_total",
                   F.posexplode("_c").alias("_i", "n_obs"),
                   F.col("_exp"))
           .withColumn("digit", (F.col("_i") + 1).cast("int"))
           .withColumn("obs_micro6", F.expr(
               "CAST(n_obs * 1000000 DIV n_total AS BIGINT)"))
           .withColumn("exp_micro6",
                       F.element_at("_exp", F.col("digit"))))
    row = row.withColumn(
        "dev_micro6",
        F.abs(F.col("obs_micro6") - F.col("exp_micro6")).cast("long"))
    mad = (row.groupBy("pred")
           .agg(F.expr("CAST(SUM(dev_micro6) DIV 9 AS BIGINT)")
                .alias("mad_micro6")))
    return (row.join(mad, "pred")
            .select("pred", "digit", "n_obs", "n_total", "obs_micro6",
                    "exp_micro6", "dev_micro6", "mad_micro6"))


def kg_completeness(triples: DataFrame) -> DataFrame:
    """Per-subject schema completeness — the recall-style KG KPI: how
    many of the corpus's predicates does each subject carry?  The
    per-entity gap report that drives targeted re-extraction ("we
    know this org's Location but not its Date").

        (subj, n_preds, n_schema, completeness_micro6)

    n_schema is the 1-row global predicate-vocabulary count kept lazy
    as a crossJoin (the dangling-mass device; schema-sized, never
    corpus-sized).  One distinct projection + one subject aggregate."""
    ps = triples.select("subj", "pred").dropDuplicates()
    n_schema = ps.agg(
        F.countDistinct("pred").cast("long").alias("n_schema"))
    return (ps.groupBy("subj")
            .agg(F.count(F.lit(1)).cast("long").alias("n_preds"))
            .crossJoin(n_schema)  # 1-row frame: stays lazy
            .withColumn("completeness_micro6",
                        F.expr("CAST(n_preds * 1000000 DIV n_schema"
                               " AS BIGINT)")))


def extraction_yield(pages: DataFrame, triples: DataFrame) -> DataFrame:
    """Extraction yield per host — the crawl-ops KPI: what share of a
    host's fetched pages produced at least one triple?  A host with
    near-zero yield is boilerplate, paywall, or a template the
    extractor can't read — either way, crawl budget to reclaim.

        (host, n_docs, n_docs_with_triples, yield_micro6)

    One distinct projection per side + one host equi-join + one host
    roll-up."""
    host = F.regexp_extract("url", r"^https?://([^/]*)", 1)
    docs = pages.select(host.alias("host"), "doc_id").dropDuplicates()
    got = (triples.select("doc_id").dropDuplicates()
           .withColumn("_has", F.lit(1)))
    return (docs.join(got, "doc_id", "left")
            .groupBy("host")
            .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
                 F.coalesce(F.sum("_has"), F.lit(0)).cast("long")
                 .alias("n_docs_with_triples"))
            .withColumn("yield_micro6",
                        F.expr("CAST(n_docs_with_triples * 1000000"
                               " DIV n_docs AS BIGINT)")))


def optional_query(triples: DataFrame) -> DataFrame:
    """SPARQL OPTIONAL (left-outer BGP) read path over the attribute
    KG: for the corpus's most-attested predicate P_req (the required
    pattern) and its runner-up P_opt (the optional one), return every
    subject matching P_req with its required fact count, its optional
    fact count (0 when absent), and the has_opt presence flag — the
    canonical "name, and address if we have one" projection a KG
    serving layer answers constantly.

    P_req/P_opt are elected from the distinct fact set (count desc,
    name asc) via a 2-row bounded collect (schema-sized: the predicate
    vocabulary, never the corpus).  Plan: two predicate-filtered
    scans, one subject aggregate each, ONE left equi-join on subj —
    the OPTIONAL becomes exactly Spark's left join, no fanout."""
    facts = triples.select("subj", "pred", "obj").dropDuplicates()
    # 2-row bounded collect: predicate election (schema-sized).
    top = (facts.groupBy("pred")
           .agg(F.count(F.lit(1)).alias("n"))
           .orderBy(F.desc("n"), "pred").limit(2).collect())
    p_req = top[0]["pred"]
    p_opt = top[1]["pred"] if len(top) > 1 else None
    req = (facts.where(F.col("pred") == p_req)
           .groupBy("subj")
           .agg(F.count(F.lit(1)).cast("long").alias("n_req")))
    opt_src = (facts.where(F.col("pred") == p_opt)
               if p_opt is not None else facts.where(F.lit(False)))
    opt = (opt_src.groupBy("subj")
           .agg(F.count(F.lit(1)).cast("long").alias("_n_opt")))
    return (req.join(opt, "subj", "left")
            .select("subj", "n_req",
                    F.coalesce("_n_opt", F.lit(0)).cast("long")
                    .alias("n_opt"),
                    F.when(F.col("_n_opt").isNull(), 0).otherwise(1)
                    .cast("int").alias("has_opt")))


def negation_query(triples: DataFrame) -> DataFrame:
    """SPARQL NOT-EXISTS (negation) read path: per predicate p, how
    many subjects carry p, and how many of those LACK the corpus's
    anchor predicate (the most-attested one — the same election as
    optional_query's P_req).  This is the "orgs with a Location but
    no Date" gap query; as a per-predicate profile it reports which
    attributes systematically appear on under-described entities.

    Plan: one distinct (subj, pred) projection, the anchor subject
    set as a second filtered distinct, ONE left equi-join on subj
    (the NOT EXISTS becomes a null-flag left join, which unlike a
    per-predicate anti-join runs in a single shuffle), one predicate
    roll-up."""
    facts = triples.select("subj", "pred", "obj").dropDuplicates()
    # 1-row bounded collect: anchor-predicate election (schema-sized).
    anchor = (facts.groupBy("pred")
              .agg(F.count(F.lit(1)).alias("n"))
              .orderBy(F.desc("n"), "pred").limit(1)
              .collect())[0]["pred"]
    sp = triples.select("subj", "pred").dropDuplicates()
    has = (facts.where(F.col("pred") == anchor)
           .select("subj").dropDuplicates()
           .withColumn("_h", F.lit(1)))
    return (sp.join(has, "subj", "left")
            .groupBy("pred")
            .agg(F.count(F.lit(1)).cast("long").alias("n_subj"),
                 F.sum(F.when(F.col("_h").isNull(), 1).otherwise(0))
                 .cast("long").alias("n_without_anchor"))
            .withColumn("miss_micro6",
                        F.expr("CAST(n_without_anchor * 1000000"
                               " DIV n_subj AS BIGINT)")))


def entity_skyline(triples: DataFrame) -> DataFrame:
    """EXACT 2-D Pareto skyline of entities over (provenance breadth,
    attribute richness): the subjects not dominated by any other
    subject on (n_docs, n_facts) — the frontier a curation UI shows
    as "best-attested, best-described entities", and the classic
    skyline operator the reference's single-node stack never needed.

    2-D skylines need NO pair enumeration: group points by x
    (= n_docs), keep each x's max y, then a running max over the
    DISTINCT-x table ordered by x desc — a point survives iff its
    x-group's ymax strictly exceeds every ymax at larger x (ties on
    both coordinates survive together: equal points do not dominate
    each other).  The single-partition window runs over the
    distinct-VALUE table (bounded by the degree domain, ~thousands),
    never over the corpus-sized point set — the same discipline as
    the percentile operators.

    Output: (subj, n_docs, n_facts) — skyline members only."""
    from pyspark.sql import Window

    pts = (triples.groupBy("subj")
           .agg(F.countDistinct("doc_id").cast("long").alias("n_docs"),
                F.countDistinct("pred", "obj").cast("long")
                .alias("n_facts")))
    xmax = pts.groupBy("n_docs").agg(F.max("n_facts").alias("ymax"))
    w = (Window.orderBy(F.desc("n_docs"))
         .rowsBetween(Window.unboundedPreceding, -1))
    frontier = (xmax.withColumn("prev_max", F.max("ymax").over(w))
                .where(F.col("prev_max").isNull()
                       | (F.col("ymax") > F.col("prev_max")))
                .select("n_docs", F.col("ymax").alias("n_facts")))
    return pts.join(frontier, ["n_docs", "n_facts"]).select(
        "subj", "n_docs", "n_facts")


def pred_fds(triples: DataFrame) -> DataFrame:
    """Approximate FUNCTIONAL DEPENDENCIES between predicates (TANE's
    g3-style measure): for every ordered predicate pair (A, B), how
    well does a subject's A-value determine its B-value?  The schema
    profiler this feeds marks "Capital -> Country" style constraints
    for the validator, and near-FDs expose extraction noise (the
    violating subjects).

    Each subject contributes ONE value per predicate (its
    lexicographic min lowercased object — a deterministic election,
    since web extraction is multi-valued).  Over the subjects having
    both A and B:  n_kept = Σ_a max_b |{subj: A=a, B=b}|  (the rows a
    repair would keep — TANE's g3 complement), conf = n_kept /
    n_common as an exact floored micro6, is_exact = 1 iff no
    violation.

    Plan: one (subj, pred) value election, ONE subj equi-join whose
    per-key fanout is the subject's predicate count (schema-bounded,
    never corpus-bounded), two grouped aggregates.  Output:
    (pred_a, pred_b, n_common, n_kept, conf_micro6, is_exact)."""
    vals = (triples.groupBy("subj", "pred")
            .agg(F.min(F.lower("obj")).alias("val")))
    a = vals.select("subj", F.col("pred").alias("pred_a"),
                    F.col("val").alias("va"))
    b = vals.select(F.col("subj").alias("subj_b"),
                    F.col("pred").alias("pred_b"),
                    F.col("val").alias("vb"))
    pairs = a.join(b, (F.col("subj") == F.col("subj_b"))
                   & (F.col("pred_a") != F.col("pred_b")))
    g1 = (pairs.groupBy("pred_a", "pred_b", "va", "vb")
          .agg(F.count(F.lit(1)).cast("long").alias("cnt")))
    g2 = (g1.groupBy("pred_a", "pred_b", "va")
          .agg(F.sum("cnt").cast("long").alias("n"),
               F.max("cnt").cast("long").alias("best")))
    return (g2.groupBy("pred_a", "pred_b")
            .agg(F.sum("n").cast("long").alias("n_common"),
                 F.sum("best").cast("long").alias("n_kept"))
            .withColumn("conf_micro6",
                        F.expr("CAST(n_kept * 1000000 DIV n_common"
                               " AS BIGINT)"))
            .withColumn("is_exact",
                        F.when(F.col("n_kept") == F.col("n_common"),
                               1).otherwise(0).cast("int")))


def fact_runs(intervals: DataFrame, horizon_ts: int) -> DataFrame:
    """Temporal run profile per fact over its SCD2 validity intervals
    — the KG-store health view: how many distinct liveness RUNS a
    claim has had, its total uptime, whether it is current, and the
    longest downtime gap between runs.  Facts that flap (many runs,
    long gaps) mark unstable extractions or genuinely volatile
    claims; both feed recrawl prioritization and validator
    confidence.

    ``horizon_ts`` closes open runs (valid_to NULL = current) for the
    uptime sum; callers pass a timestamp at or after the last crawl
    in the store (documented invariant — uptime would go negative
    otherwise).  An open run is always a fact's LAST run (SCD2 closes
    earlier runs by construction), so the lead-based gap never reads
    a NULL valid_to.

    Output: (url, subj, pred, obj, n_runs, first_from, live_s,
    is_current, max_gap_s).  Plan: one fact-keyed window (lead) + one
    fact-keyed aggregate — the same two-shuffle shape as
    triple_history, no joins."""
    from pyspark.sql import Window

    key = ["url", "subj", "pred", "obj"]
    w = Window.partitionBy(*key).orderBy("valid_from")
    gaps = (intervals
            .withColumn("_next_from", F.lead("valid_from").over(w))
            .withColumn("_gap",
                        F.coalesce(F.col("_next_from")
                                   - F.col("valid_to"), F.lit(0))))
    return (gaps.groupBy(*key)
            .agg(F.count(F.lit(1)).cast("long").alias("n_runs"),
                 F.min("valid_from").cast("long").alias("first_from"),
                 F.sum(F.coalesce("valid_to", F.lit(horizon_ts))
                       - F.col("valid_from")).cast("long")
                 .alias("live_s"),
                 F.max(F.when(F.col("valid_to").isNull(), 1)
                       .otherwise(0)).cast("int").alias("is_current"),
                 F.max("_gap").cast("long").alias("max_gap_s")))


def rpq_reach(triples: DataFrame, max_hops: int = 4) -> DataFrame:
    """Bounded regular-path-query reachability — the SPARQL 1.1
    property path ``p{1,4}`` read path: all (src, dst) pairs
    connected by 1..max_hops edges of the corpus's most-attested
    predicate (ties broken by predicate name), computed by PREFIX
    DOUBLING: R_2 = R_1 ∪ R_1∘R_1, R_4 = R_2 ∪ R_2∘R_2 — log2(hops)
    join rounds instead of hops, the device that makes bounded
    closures affordable on wide graphs.

    Output: (src, dst) distinct pairs (src may equal dst when a
    cycle closes within the bound).

    Scale: the predicate pick is a 1-row broadcast (never a
    collect); each doubling round is one keyed equi-join + distinct,
    and the state never exceeds the bounded closure itself.
    """
    facts = triples.select("pred", "subj", "obj").dropDuplicates()
    top = (facts.groupBy("pred")
           .agg(F.count(F.lit(1)).cast("long").alias("n"))
           .orderBy(F.desc("n"), F.asc("pred")).limit(1)
           .select("pred"))
    e = (facts.join(F.broadcast(top), "pred")
         .select(F.col("subj").alias("src"), F.col("obj").alias("dst"))
         .dropDuplicates().localCheckpoint())
    r = e
    hops = 1
    while hops < max_hops:
        comp = (r.alias("a")
                .join(r.alias("b"),
                      F.col("a.dst") == F.col("b.src"))
                .select(F.col("a.src").alias("src"),
                        F.col("b.dst").alias("dst")))
        r = r.unionByName(comp).dropDuplicates().localCheckpoint()
        hops *= 2
    return r


# ---------------------------------------------------------------------------
# Allen interval algebra profile (continuation batch 64)

ALLEN_RELATIONS = (
    "before", "meets", "overlaps", "starts", "during", "finishes",
    "equals", "finished_by", "contains", "started_by",
    "overlapped_by", "met_by", "after")


def allen_relation_profile(intervals: DataFrame) -> DataFrame:
    """Allen's interval algebra (CACM'83) over the SCD2 validity
    intervals: classify every same-claim interval pair — two validity
    runs of DIFFERENT object values for one (url, subj, pred) — into
    exactly one of the 13 temporal relations, and profile the counts
    per predicate.  This is the full temporal taxonomy behind
    interval_conflicts (which keeps only the overlap bucket): "was
    value B a clean successor of value A (meets/before), a concurrent
    contradiction (overlaps/during/equals), or a flap-back?"

    Pairs are oriented obj_a < obj_b, so the 6 inverse relations
    appear as their own labels and the map is total: endpoints are
    integers, valid_to NULL = still-current (+inf sentinel shared
    with interval_conflicts), and the 13 cases are mutually exclusive
    and exhaustive by trichotomy on each endpoint comparison.

    Scale: the pairing is the interval_conflicts shape — an EQUI-join
    on the high-cardinality (url, subj, pred) claim key with bounded
    per-key fanout (the url's snapshot count) — then one grouped
    count; no interval cross product anywhere.

    Output: (pred, relation, n_pairs)."""
    inf = 1 << 62
    cols = ["url", "subj", "pred", "obj", "valid_from", "valid_to"]
    a = intervals.select(*cols).alias("a")
    b = intervals.select(*cols).alias("b")
    sa, sb = F.col("a.valid_from"), F.col("b.valid_from")
    ea = F.coalesce(F.col("a.valid_to"), F.lit(inf))
    eb = F.coalesce(F.col("b.valid_to"), F.lit(inf))
    rel = (
        F.when(ea < sb, "before")
        .when(ea == sb, "meets")
        .when(eb < sa, "after")
        .when(eb == sa, "met_by")
        # from here both overlap: sa < eb and sb < ea
        .when((sa == sb) & (ea == eb), "equals")
        .when((sa == sb) & (ea < eb), "starts")
        .when((sa == sb), "started_by")            # ea > eb
        .when((ea == eb) & (sa > sb), "finishes")
        .when((ea == eb), "finished_by")           # sa < sb
        .when((sa > sb) & (ea < eb), "during")
        .when((sa < sb) & (ea > eb), "contains")
        .when((sa < sb), "overlaps")               # sa < sb < ea < eb
        .otherwise("overlapped_by"))               # sb < sa < eb < ea
    return (a.join(b, (F.col("a.url") == F.col("b.url"))
                   & (F.col("a.subj") == F.col("b.subj"))
                   & (F.col("a.pred") == F.col("b.pred"))
                   & (F.col("a.obj") < F.col("b.obj")))
            .groupBy(F.col("a.pred").alias("pred"),
                     rel.alias("relation"))
            .agg(F.count(F.lit(1)).cast("long").alias("n_pairs")))


# ---------------------------------------------------------------------------
# Weighted interval scheduling: timeline repair (continuation batch 68)

TIMELINE_SCHEMA = ("url string, subj string, pred string, obj string, "
                   "valid_from long, valid_to long, weight bigint, "
                   "claim_weight bigint")
_TL_INF = 1 << 62


def _timeline_dp(pdf):
    """Classic weighted-interval-scheduling DP per claim key:
    intervals sorted by (end, start, obj); f[i] = max(f[i-1],
    w[i] + f[p(i)]) with p(i) = last interval ending at or before
    start[i].  Ties prefer SKIPPING interval i (the backtrack is then
    unambiguous and SQL-replayable: take iff strictly better).  All
    integers; NULL valid_to = +inf sentinel (conflicts with every
    later start)."""
    import pandas as pd

    pdf = pdf.copy()
    pdf["_end"] = [int(v) if v == v and v is not None else _TL_INF
                   for v in pdf.valid_to]
    pdf = pdf.sort_values(["_end", "valid_from", "obj"]) \
        .reset_index(drop=True)
    n = len(pdf)
    starts = [int(v) for v in pdf.valid_from]
    ends = [int(v) for v in pdf._end]
    ws = [int(v) for v in pdf.weight]
    # p(i): rightmost j < i with ends[j] <= starts[i] (ends sorted)
    import bisect
    p = [bisect.bisect_right(ends, starts[i], 0, i) - 1
         for i in range(n)]
    f = [0] * (n + 1)
    take = [False] * n
    for i in range(n):
        with_i = ws[i] + f[p[i] + 1]
        if with_i > f[i]:
            f[i + 1] = with_i
            take[i] = True
        else:
            f[i + 1] = f[i]
    kept = []
    i = n - 1
    while i >= 0:
        if take[i]:
            kept.append(i)
            i = p[i]
        else:
            i -= 1
    kept.reverse()
    out = pdf.iloc[kept]
    return pd.DataFrame({
        "url": out.url, "subj": out.subj, "pred": out.pred,
        "obj": out.obj,
        "valid_from": [int(v) for v in out.valid_from],
        "valid_to": [None if e == _TL_INF else e for e in out._end],
        "weight": [int(v) for v in out.weight],
        "claim_weight": f[n]})


def timeline_repair(intervals: DataFrame) -> DataFrame:
    """Timeline repair for flapping facts: per claim (url, subj,
    pred), the MAX-WEIGHT set of non-overlapping validity intervals —
    the best single consistent story a temporally-contradicted KG can
    tell, with weight = n_snaps (how many crawls attested the run).
    Weighted interval scheduling (the textbook DP), run per claim key
    in one applyInPandas: per-key interval counts are bounded by the
    url's snapshot schedule, so the DP group is tiny while the claim
    keyspace carries the scale.

    Intervals [valid_from, valid_to) with NULL = still-current
    (shared +inf sentinel); intervals touching at an endpoint do NOT
    conflict.  Output: the kept intervals + the claim's total kept
    weight (same value on each of its rows)."""
    cols = intervals.select(
        "url", "subj", "pred", "obj",
        F.col("valid_from").cast("long").alias("valid_from"),
        F.col("valid_to").cast("long").alias("valid_to"),
        F.col("n_snaps").cast("long").alias("weight"))
    return cols.groupBy("url", "subj", "pred").applyInPandas(
        _timeline_dp, TIMELINE_SCHEMA)


def entity_cards(triples: DataFrame, k: int = 3) -> DataFrame:
    """Entity-card fact ranking — the KG read path that renders an
    entity summary page: per subject, the top-k (pred, obj) facts by
    support x informativeness, so "spark — topic:vector (47 docs)"
    outranks a boilerplate fact every subject shares.

    support = distinct attesting docs per fact; df = distinct subjects
    attesting the same (pred, obj); idf_micro6 =
    floor(ln((2N+2)/(2df+1)) * 1e6) with N = distinct subjects (the
    BM25-idf integer device already proven cross-engine by
    bm25_entities/top_terms_tfidf); score_micro6 = support *
    idf_micro6, ties broken (pred, obj) asc so the ranking is
    deterministic.

    Output: (subj, rank, pred, obj, support, df, idf_micro6,
    score_micro6), rank 1..k per subject.

    Scale: two hash-aggregates over the fact table, one broadcast-
    sized (pred, obj)->df join, one window partitioned by subject.
    N is a bounded 1-row aggregate (subject-universe size), collected
    once on the driver by design."""
    from pyspark.sql import Window

    facts = (triples.groupBy("subj", "pred", "obj")
             .agg(F.countDistinct("doc_id").cast("long")
                  .alias("support")))
    df_ = facts.groupBy("pred", "obj").agg(
        F.count(F.lit(1)).cast("long").alias("df"))
    n_subj = facts.select(
        F.countDistinct("subj").alias("n")).first()["n"]
    idf = F.floor(
        F.log(F.lit(2 * n_subj + 2) / (2 * F.col("df") + 1))
        * 1000000).cast("long")
    scored = (facts.join(df_, ["pred", "obj"])
              .withColumn("idf_micro6", idf)
              .withColumn("score_micro6",
                          (F.col("support") * F.col("idf_micro6"))
                          .cast("long")))
    w = Window.partitionBy("subj").orderBy(
        F.col("score_micro6").desc(), F.col("pred"), F.col("obj"))
    return (scored.withColumn("rank",
                              F.row_number().over(w).cast("int"))
            .where(F.col("rank") <= k)
            .select("subj", "rank", "pred", "obj", "support", "df",
                    "idf_micro6", "score_micro6"))


def crawl_budget(pages: DataFrame, triples: DataFrame,
                 budget: int = 10000) -> DataFrame:
    """Next-cycle crawl-budget apportionment per host — Hamilton's
    largest-remainder method (the classic exact integer apportionment,
    house-seat style) over the extraction-yield utility: hosts that
    produced triples get proportionally more fetch slots, every host
    keeps a +1-smoothed trickle so dead hosts stay probeable, and the
    allocations sum EXACTLY to the budget (what proportional-floor
    alone cannot do).

    util = n_docs_with_triples + 1; base = budget*util DIV U;
    rem = budget*util MOD U; the leftover budget - sum(base) slots go
    to the largest remainders (ties by host asc).  Output: (host,
    util, base_alloc, rem, extra, alloc); sum(alloc) == budget.

    Scale: one host roll-up (extraction_yield's join), two bounded
    1-row aggregates collected on the driver by design (the utility
    total and the leftover count), and the leftover selection is a
    distributed top-L (orderBy.limit, L <= budget — never a global
    window)."""
    ey = extraction_yield(pages, triples).select(
        "host", (F.col("n_docs_with_triples") + 1).cast("long")
        .alias("util"))
    u_tot = int(ey.agg(F.sum("util")).first()[0])
    scored = ey.select(
        "host", "util",
        F.expr(f"CAST({budget} * util DIV {u_tot} AS BIGINT)")
        .alias("base_alloc"),
        F.expr(f"CAST({budget} * util % {u_tot} AS BIGINT)")
        .alias("rem"))
    leftover = budget - int(scored.agg(F.sum("base_alloc")).first()[0])
    top = (scored.orderBy(F.col("rem").desc(), F.col("host").asc())
           .limit(leftover).select("host", F.lit(1).alias("_x")))
    return (scored.join(top, "host", "left")
            .select("host", "util", "base_alloc", "rem",
                    F.coalesce("_x", F.lit(0)).cast("long")
                    .alias("extra"),
                    (F.col("base_alloc")
                     + F.coalesce("_x", F.lit(0))).cast("long")
                    .alias("alloc")))


def fact_rollup(triples: DataFrame) -> DataFrame:
    """OLAP rollup of the triple fact table over the (host, pred)
    dimension hierarchy — the serving-layer aggregate an analytics
    user asks of a KG ("triples per host per predicate, with host
    and grand totals") answered in ONE pass via GROUPING SETS
    instead of three separate scans.

    Output: (host, pred, lvl, n_triples, n_docs) where rolled-up
    dimension values surface as '(all)' and lvl is the standard
    grouping_id bitmask (0 = leaf cell, 1 = per-host total,
    3 = grand total).  CUBE is the same plan shape with one more
    grouping set.

    Scale: Spark compiles ROLLUP to a single Expand (3 rows per
    input row here) feeding ONE partial-then-final hash aggregate —
    no self-union of scans, map-side combine intact; the distinct
    doc count adds one more expand inside the same stage.  At 100 TB
    this is strictly cheaper than the 3-query alternative."""
    host = F.regexp_extract("url", r"^https?://([^/]*)", 1)
    base = triples.select(host.alias("host"), "pred", "doc_id")
    return (base.rollup("host", "pred")
            .agg(F.count(F.lit(1)).cast("long").alias("n_triples"),
                 F.countDistinct("doc_id").cast("long").alias("n_docs"),
                 F.grouping_id().cast("long").alias("lvl"))
            .select(F.coalesce("host", F.lit("(all)")).alias("host"),
                    F.coalesce("pred", F.lit("(all)")).alias("pred"),
                    "lvl", "n_triples", "n_docs"))


def pred_reciprocity(triples: DataFrame) -> DataFrame:
    """Symmetric-relation detection per predicate: over the distinct
    directed entity-pair graph of each predicate (case-folded surface
    forms, self-loops excluded), count the mutual pairs — (a, b) and
    (b, a) both asserted — and report reciprocity = 2 * mutual /
    edges, exact micro6.  Reciprocity near 1e6 says the predicate is
    symmetric in practice (schema-induction: candidates for an OWL
    SymmetricProperty axiom); near 0 says it is directional.

    Output: (pred, n_edges, n_mutual_pairs, reciprocity_micro6).

    Scale shape: one dedup aggregate to the simple directed graph,
    one self-equi-join keyed on (pred, pair) for mutuals (each mutual
    counted once via a < b), two bounded per-predicate aggregates.
    """
    e = (triples.select(
        "pred", F.lower("subj").alias("a"), F.lower("obj").alias("b"))
        .where(F.col("a") != F.col("b")).dropDuplicates())
    m = (e.alias("x").join(
        e.alias("y"),
        (F.col("x.pred") == F.col("y.pred"))
        & (F.col("x.a") == F.col("y.b"))
        & (F.col("x.b") == F.col("y.a")))
        .where(F.col("x.a") < F.col("x.b"))
        .groupBy(F.col("x.pred").alias("pred"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_mutual_pairs")))
    n = e.groupBy("pred").agg(
        F.count(F.lit(1)).cast("long").alias("n_edges"))
    return (n.join(m, "pred", "left")
            .fillna(0, ["n_mutual_pairs"])
            .select("pred", "n_edges",
                    F.col("n_mutual_pairs").cast("long"),
                    F.expr("(2000000 * n_mutual_pairs) div n_edges")
                    .cast("long").alias("reciprocity_micro6")))


def pred_transitivity(triples: DataFrame) -> DataFrame:
    """Transitive-relation detection per predicate — the
    OWL TransitiveProperty companion to pred_reciprocity's symmetry
    axiom: over each predicate's distinct case-folded entity-pair
    graph, count the composable chains a->b->c (a != c) and how many
    are closed by an asserted a->c edge; closure near 1e6 says the
    predicate behaves transitively in the data.

    Output: (pred, n_edges, n_chains, n_closed, closure_micro6) —
    predicates with zero chains are dropped (closure undefined).

    Scale shape: one dedup aggregate to the simple graph, one
    self-equi-join on (pred, mid-node) for chains — fanout bounded
    by per-node degree within a predicate, the pred_lift class — and
    one left-semi-style join against the edge set for closure.
    """
    e = (triples.select(
        "pred", F.lower("subj").alias("a"), F.lower("obj").alias("b"))
        .where(F.col("a") != F.col("b")).dropDuplicates()
        .localCheckpoint())
    x = e.select("pred", F.col("a").alias("x1"), F.col("b").alias("m"))
    y = e.select("pred", F.col("a").alias("m"), F.col("b").alias("y2"))
    chains = (x.join(y, ["pred", "m"])
              .where(F.col("x1") != F.col("y2"))
              .select("pred", "x1", "y2").dropDuplicates())
    closed = chains.join(
        e.select("pred", F.col("a").alias("x1"),
                 F.col("b").alias("y2")),
        ["pred", "x1", "y2"], "left_semi")
    n = e.groupBy("pred").agg(
        F.count(F.lit(1)).cast("long").alias("n_edges"))
    nc = chains.groupBy("pred").agg(
        F.count(F.lit(1)).cast("long").alias("n_chains"))
    ncl = closed.groupBy("pred").agg(
        F.count(F.lit(1)).cast("long").alias("n_closed"))
    return (n.join(nc, "pred").join(ncl, "pred", "left")
            .fillna(0, ["n_closed"])
            .select("pred", "n_edges", "n_chains",
                    F.col("n_closed").cast("long"),
                    F.expr("(1000000 * n_closed) div n_chains")
                    .cast("long").alias("closure_micro6")))


def inclusion_deps(frames: dict, candidates=None) -> DataFrame:
    """Unary inclusion-dependency discovery (the SPIDER/Bell-
    Brockhausen profiling pass that induces foreign keys before any
    ingestion job trusts a join path): for each candidate pair
    child.column <= parent.column, the exact share of distinct child
    values contained in the parent's distinct value set; an IND holds
    iff containment is total.

    ``frames``: name -> DataFrame; ``candidates``: (child_table,
    child_col, parent_table, parent_col) tuples — a bounded literal
    list (profiling candidates come from type/name heuristics, not a
    cross product of all columns).

    Output: (child, parent, n_child_distinct, n_contained,
    containment_micro6, is_ind).

    Scale shape: per candidate TWO distinct-value aggregates and one
    left-semi join on the value — each side collapses to its distinct
    set before any join, so the comparison never touches row counts.
    """
    if candidates is None:
        candidates = (
            ("nation", "n_regionkey", "region", "r_regionkey"),
            ("customer", "c_nationkey", "nation", "n_nationkey"),
            ("supplier", "s_nationkey", "nation", "n_nationkey"),
            ("orders", "o_custkey", "customer", "c_custkey"),
            ("lineitem", "l_orderkey", "orders", "o_orderkey"),
            ("lineitem", "l_partkey", "part", "p_partkey"),
            # deliberate negative control: order keys are NOT
            # customer keys
            ("orders", "o_orderkey", "customer", "c_custkey"),
        )
    outs = []
    for ct, cc, pt, pc in candidates:
        child = frames[ct].select(F.col(cc).alias("v")) \
            .dropDuplicates()
        parent = frames[pt].select(F.col(pc).alias("v")) \
            .dropDuplicates()
        n = child.agg(F.count(F.lit(1)).cast("long")
                      .alias("n_child_distinct"))
        m = (child.join(parent, "v", "left_semi")
             .agg(F.count(F.lit(1)).cast("long")
                  .alias("n_contained")))
        outs.append(
            n.crossJoin(m)  # two 1-row frames
            .select(F.lit(f"{ct}.{cc}").alias("child"),
                    F.lit(f"{pt}.{pc}").alias("parent"),
                    "n_child_distinct", "n_contained",
                    F.expr("CASE WHEN n_child_distinct = 0 THEN 0"
                           " ELSE (1000000 * n_contained)"
                           " div n_child_distinct END").cast("long")
                    .alias("containment_micro6"),
                    (F.col("n_contained")
                     == F.col("n_child_distinct")).cast("int")
                    .alias("is_ind")))
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def sweep_concurrency(intervals: DataFrame) -> DataFrame:
    """Sweep-line maximum concurrency of fact-validity intervals per
    predicate — the load-profile question interval_conflicts'
    pairwise overlap join cannot answer: how many claims about this
    predicate were simultaneously valid at the WORST moment, and
    when was it?  (Pairwise overlap is quadratic evidence; the sweep
    is the linear witness.)

    Classic +1/-1 event sweep over the half-open [valid_from,
    valid_to) windows: at equal timestamps the -1 closes BEFORE the
    +1 opens (delta ascending), so touching intervals never
    double-count; NULL valid_to is open-ended and never emits a
    close.  All integer epoch seconds.

    Output per pred: (pred, n_intervals, n_open_ended,
    max_concurrent, t_at_max = earliest sweep time attaining the
    max).

    Scale shape: one union + ONE keyed window over (pred)-partitioned
    event points + two keyed aggregates — the sweep never leaves the
    predicate partition.
    """
    from pyspark.sql import Window

    opens = intervals.select(
        "pred", F.col("valid_from").alias("t"),
        F.lit(1).alias("delta"))
    closes = (intervals.where(F.col("valid_to").isNotNull())
              .select("pred", F.col("valid_to").alias("t"),
                      F.lit(-1).alias("delta")))
    ev = opens.unionByName(closes)
    w = (Window.partitionBy("pred").orderBy("t", "delta")
         .rowsBetween(Window.unboundedPreceding, 0))
    swept = ev.withColumn("_run", F.sum("delta").over(w))
    wp = Window.partitionBy("pred")
    at_max = (swept.withColumn("_mx", F.max("_run").over(wp))
              .where(F.col("_run") == F.col("_mx"))
              .groupBy("pred")
              .agg(F.max("_mx").cast("long").alias("max_concurrent"),
                   F.min("t").cast("long").alias("t_at_max")))
    counts = intervals.groupBy("pred").agg(
        F.count(F.lit(1)).cast("long").alias("n_intervals"),
        F.sum(F.col("valid_to").isNull().cast("int")).cast("long")
        .alias("n_open_ended"))
    return counts.join(at_max, "pred").select(
        "pred", "n_intervals", "n_open_ended", "max_concurrent",
        "t_at_max")
