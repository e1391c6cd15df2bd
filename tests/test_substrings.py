"""Exact substring dedup + distributed suffix ranking vs brute-force
Python oracles (round-3 roadmap item 8)."""

from __future__ import annotations

from ehr_relation_extraction_spark.functions.text import (
    tokenize_with_offsets)


def _toks(text: str) -> list[str]:
    return [t for t, _, _ in tokenize_with_offsets(text)]


def _brute_regions(texts: dict[int, str], L: int):
    """Position-coverage oracle: for each doc, the maximal contiguous
    runs of token positions covered by some L-window whose content
    occurs at >= 2 (doc, offset) sites corpus-wide."""
    toks = {d: _toks(t) for d, t in texts.items()}
    occ: dict[tuple, list] = {}
    for d, ts in toks.items():
        for i in range(len(ts) - L + 1):
            occ.setdefault(tuple(ts[i:i + L]), []).append((d, i))
    covered: dict[int, set] = {d: set() for d in texts}
    for sites in occ.values():
        # cross-DOC contract (matches passage_dups' countDistinct(doc_id))
        if len({d for d, _ in sites}) >= 2:
            for d, i in sites:
                covered[d].update(range(i, i + L))
    spans = {}
    for d, pos in covered.items():
        runs, run = [], []
        for p in sorted(pos):
            if run and p != run[-1] + 1:
                runs.append((run[0], run[-1] + 1))
                run = []
            run.append(p)
        if run:
            runs.append((run[0], run[-1] + 1))
        spans[d] = runs
    return toks, spans


def _fixture_texts():
    shared = " ".join(f"dup{i:02d}" for i in range(14))  # 14-token repeat
    own = " ".join(f"own{i:02d}" for i in range(14))
    uniq = lambda tag, n: " ".join(f"{tag}{i:03d}" for i in range(n))
    return {
        # repeat at head of doc 1, mid of doc 2 (NOT stride-aligned:
        # offsets 0 vs 7 — the case win=stride>1 misses and stride-1
        # must catch)
        1: shared + " " + uniq("a", 20),
        2: uniq("b", 7) + " " + shared + " " + uniq("c", 9),
        # an 8-token repeat, shorter than min_len=10 -> must NOT fire
        3: " ".join(f"sm{i}" for i in range(8)) + " " + uniq("d", 12),
        4: uniq("e", 5) + " " + " ".join(f"sm{i}" for i in range(8)),
        # internal self-repeat within one doc (two sites, same doc,
        # passage absent elsewhere) — cross-doc dedup must NOT fire
        5: own + " " + uniq("f", 3) + " " + own,
    }


def test_substring_dups_exact_vs_bruteforce(spark):
    from ehr_relation_extraction_spark.operators.substrings import (
        substring_dups)

    texts = _fixture_texts()
    L = 10
    _, want = _brute_regions(texts, L)
    docs = spark.createDataFrame(list(texts.items()),
                                 "doc_id long, text string")
    got: dict[int, list] = {d: [] for d in texts}
    for r in substring_dups(docs, min_len=L).collect():
        got[r["doc_id"]].append((r["span_start"], r["span_end"]))
    for d in texts:
        assert sorted(got[d]) == want[d], (d, sorted(got[d]), want[d])
    # the misaligned repeat was found at exact boundaries ...
    assert want[2] == [(7, 21)]
    # ... and the sub-threshold repeat did not fire
    assert want[3] == [] and want[4] == []
    # within-doc self-repeat is not a cross-doc duplicate
    assert want[5] == []


def test_cut_substring_dups_exact_vs_bruteforce(spark):
    """Cut oracle: non-first holders lose exactly the covered
    positions of windows whose keeper is another doc."""
    from ehr_relation_extraction_spark.operators.substrings import (
        cut_substring_dups)

    texts = _fixture_texts()
    L = 10
    toks = {d: _toks(t) for d, t in texts.items()}
    occ: dict[tuple, list] = {}
    for d, ts in toks.items():
        for i in range(len(ts) - L + 1):
            occ.setdefault(tuple(ts[i:i + L]), []).append((d, i))
    cut: dict[int, set] = {d: set() for d in texts}
    for sites in occ.values():
        if len({d for d, _ in sites}) >= 2:
            keeper = min(d for d, _ in sites)
            for d, i in sites:
                if d != keeper:
                    cut[d].update(range(i, i + L))
    want = {d: (" ".join(t for j, t in enumerate(ts) if j not in cut[d]),
                len(cut[d]))
            for d, ts in toks.items()}
    docs = spark.createDataFrame(list(texts.items()),
                                 "doc_id long, text string")
    got = {r["doc_id"]: (r["text_clean"], r["n_cut_tokens"])
           for r in cut_substring_dups(docs, min_len=L).collect()}
    assert got == want
    # keeper (doc 1) kept its text; doc 2 lost exactly the repeat
    assert got[1][1] == 0 and got[2][1] == 14
    # the within-doc self-repeat (doc 5) has no cross-doc holder
    # -> nothing cut (self-repeats are repetition features' domain)
    assert got[5][1] == 0


def test_suffix_ranks_vs_bruteforce(spark):
    """Distributed prefix-doubling ranks == brute-force generalized
    suffix ordering: equal rank iff identical suffix content, and the
    rank ORDER of distinct contents matches Python's sorted order."""
    from ehr_relation_extraction_spark.operators.substrings import (
        suffix_ranks)

    texts = _fixture_texts()
    toks = {d: _toks(t) for d, t in texts.items()}
    suffixes = {(d, i): tuple(ts[i:])
                for d, ts in toks.items() for i in range(len(ts))}
    docs = spark.createDataFrame(list(texts.items()),
                                 "doc_id long, text string")
    rows = suffix_ranks(docs).collect()
    assert len(rows) == len(suffixes)
    rank_of = {(r["doc_id"], r["tok_idx"]): r["rank"] for r in rows}
    # (a) equal rank <-> identical content
    by_content: dict[tuple, set] = {}
    for key, content in suffixes.items():
        by_content.setdefault(content, set()).add(rank_of[key])
    for content, ranks in by_content.items():
        assert len(ranks) == 1, (content[:3], ranks)
    ranks_by_content = {c: next(iter(rs)) for c, rs in by_content.items()}
    assert len(set(ranks_by_content.values())) == len(ranks_by_content)
    # (b) order matches lexicographic suffix order (shorter-prefix
    # sorts first, matching the end-of-doc sentinel rule)
    ordered = sorted(ranks_by_content, key=lambda c: ranks_by_content[c])
    assert ordered == sorted(ranks_by_content)


def test_suffix_ranks_detects_cross_doc_repeat(spark):
    """Adjacent equal-prefix suffixes across docs surface the shared
    passage: the two suffixes starting the planted repeat share their
    first 14 tokens, so their ranks are closer than any
    non-repeat-related pair — checked via the rank-sorted suffix
    sequence placing (1, 0) and (2, 7) adjacently."""
    from ehr_relation_extraction_spark.operators.substrings import (
        suffix_ranks)

    texts = {1: _fixture_texts()[1], 2: _fixture_texts()[2]}
    docs = spark.createDataFrame(list(texts.items()),
                                 "doc_id long, text string")
    rows = sorted(suffix_ranks(docs).collect(), key=lambda r: r["rank"])
    order = [(r["doc_id"], r["tok_idx"]) for r in rows]
    i, j = order.index((1, 0)), order.index((2, 7))
    assert abs(i - j) == 1, (i, j)


def test_adjacent_lcp_vs_bruteforce(spark):
    """adjacent_lcp == brute force: sort all suffixes by (content,
    doc_id, tok_idx), pair neighbors, LCP each — the Spark pair SET
    with lifted LCPs must match exactly."""
    from ehr_relation_extraction_spark.operators.substrings import (
        adjacent_lcp)

    texts = _fixture_texts()
    toks = {d: _toks(t) for d, t in texts.items()}
    sufs = sorted(((tuple(ts[i:]), d, i)
                   for d, ts in toks.items() for i in range(len(ts))))

    def lcp(a, b):
        n = 0
        for x, y in zip(a, b):
            if x != y:
                break
            n += 1
        return n

    want = {(sufs[k][1], sufs[k][2], sufs[k + 1][1], sufs[k + 1][2],
             lcp(sufs[k][0], sufs[k + 1][0]))
            for k in range(len(sufs) - 1)}
    docs = spark.createDataFrame(list(texts.items()),
                                 "doc_id long, text string")
    got = {(r["doc_a"], r["idx_a"], r["doc_b"], r["idx_b"], r["lcp"])
           for r in adjacent_lcp(docs).collect()}
    assert got == want


def test_maximal_repeats_finds_planted_passage(spark):
    """The 14-token planted repeat surfaces as an adjacent pair with
    lcp exactly 14 (and nothing >= 14 appears between unrelated
    docs)."""
    from ehr_relation_extraction_spark.operators.substrings import (
        maximal_repeats)

    texts = _fixture_texts()
    docs = spark.createDataFrame(list(texts.items()),
                                 "doc_id long, text string")
    hits = [(r["doc_a"], r["idx_a"], r["doc_b"], r["idx_b"], r["lcp"])
            for r in maximal_repeats(docs, min_len=14).collect()]
    assert ((1, 0, 2, 7, 14) in hits) or ((2, 7, 1, 0, 14) in hits)
    # the within-doc self-repeat (doc 5's own passage) also surfaces —
    # suffix structure sees ALL repeats, incl. same-doc ones the
    # cross-doc window dedup deliberately skips
    assert any(a == b == 5 and l >= 14 for a, _, b, _, l in hits)


def test_substrings_plans_have_no_cartesians(spark):
    """Plan hygiene for the (unregistered) substrings operators, same
    rule as the registry-wide lint: no CartesianProduct or
    BroadcastNestedLoopJoin — every join is an equi-join by
    construction.  (The window ops' plans are checked end-to-end; the
    suffix path's per-round plans sit behind localCheckpoint
    boundaries, so for adjacent_lcp this covers the pairing + lifting
    tail, the only stages with joins beyond the ranking rounds'
    already-identical join shape.)"""
    from ehr_relation_extraction_spark.operators.substrings import (
        adjacent_lcp, cut_substring_dups, substring_dups)

    texts = _fixture_texts()
    docs = spark.createDataFrame(list(texts.items()),
                                 "doc_id long, text string")
    for frame in (substring_dups(docs, min_len=10),
                  cut_substring_dups(docs, min_len=10),
                  adjacent_lcp(docs)):
        plan = frame._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan, plan
        assert "BroadcastNestedLoopJoin" not in plan, plan


def test_suffix_ranks_pathological_repetition(spark):
    """Termination + correctness on maximally repetitive input: one
    doc of a single repeated token (every suffix a prefix of every
    longer one) and a second doc sharing the repeated block — prefix
    doubling must rank all suffixes strictly by length without
    blowing the round budget."""
    from ehr_relation_extraction_spark.operators.substrings import (
        suffix_ranks)

    texts = {1: " ".join(["rep"] * 200),
             2: " ".join(["rep"] * 50) + " tail"}
    docs = spark.createDataFrame(list(texts.items()),
                                 "doc_id long, text string")
    rows = suffix_ranks(docs).collect()
    assert len(rows) == 200 + 51
    rank_of = {(r["doc_id"], r["tok_idx"]): r["rank"] for r in rows}
    # doc 1: strictly shorter all-'rep' suffix sorts strictly first
    for i in range(199):
        assert rank_of[(1, i)] > rank_of[(1, i + 1)]
    # ordering across docs: 'rep...tail' sorts after the same-count
    # all-rep prefix (end-of-doc < any token), and since 'rep' < 'tail'
    # it also sorts after EVERY all-rep suffix regardless of length
    assert rank_of[(2, 0)] > rank_of[(1, 150)]  # 50 reps+tail > 50 reps
    assert rank_of[(2, 0)] > rank_of[(1, 0)]    # ... > 200 reps too
    # doc 2's own suffixes: strictly longer rep-runs before tail sort
    # LATER ('rep' < 'tail' puts the extra rep first)? no — shorter
    # rep-run means 'tail' arrives earlier, and 'rep' < 'tail', so
    # more leading reps sorts FIRST:
    for i in range(49):
        assert rank_of[(2, i)] < rank_of[(2, i + 1)]
