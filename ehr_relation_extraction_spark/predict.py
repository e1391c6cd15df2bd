"""Single-document prediction — the reference's serving entry point
(fast_api.py:29-56 ``get_ehr_predictions``) as a pure-Python function.

Runs the identical kernels the Spark pipeline runs (ONE code path for
both), so a served prediction always equals the distributed result for
the same text.  No Spark session needed: per-document work is
driver-side trivial; the cluster exists for corpora, not requests.

Returns the reference's response shape: tagged entities, the kept
relations, the long triple table (utils.py:497-530) and a per-subject
adjacency ("graph") dict mirroring display_knowledge_graph's grouping
(utils.py:195-214).
"""

from __future__ import annotations

from .config import MAX_LEN_TOKENS, MAX_PAIR_GAP_CHARS
from .functions.ner_kernel import gazetteer_by_ngram
from .functions.text import tokenize_with_offsets
from .plans.fused import relations_for_doc


def predict_document(text: str,
                     max_len: int = MAX_LEN_TOKENS,
                     max_gap: int = MAX_PAIR_GAP_CHARS,
                     model_choice: str = "rule",
                     model=None) -> dict:
    """``model_choice`` mirrors the reference API's (ehr_text,
    model_choice) request shape (fast_api.py:29-56, front-end POST):

    - "rule" (default): the deterministic gazetteer detector.
    - "model": a learned detector — pass a trained
      ``functions.perceptron.PerceptronTagger`` as ``model`` (or any
      object with a ``label_fn()``); mentions come from its labels via
      the shared chunk-decode path, and the SAME pairing/RE stages run
      downstream (the cascade, biobert_re/README.md:66).
    """
    from .functions.ner_kernel import detect_mentions

    toks = tokenize_with_offsets(text)
    if model_choice == "rule":
        raw = detect_mentions(text, toks)
    elif model_choice == "model":
        from .functions.ner_kernel import ALNUM_RE, pattern_spans
        from .operators.model_ner import (chunks_to_char_spans,
                                          decode_chunks, teacher_labels)

        fn = model.label_fn() if model is not None else teacher_labels
        spans = set(chunks_to_char_spans(toks, decode_chunks(fn(text, toks))))
        # the deterministic pattern rules run BESIDE the model, exactly
        # as in the Spark cascade (mid-token quirk spans are
        # unlearnable by any token-aligned tagger)
        spans |= {(t, s, e) for (t, s, e) in pattern_spans(text)
                  if ALNUM_RE.search(text[s:e])}
        # T-id parity with the Spark model path: (start, end, type) order
        raw = sorted(((t, s, e, text[s:e]) for (t, s, e) in spans),
                     key=lambda m: (m[1], m[2], m[0]))
    else:
        raise ValueError(f"unknown model_choice: {model_choice!r}")
    mentions = [
        {"ent_id": f"T{i + 1}", "ent_type": t, "start": s, "end": e,
         "text": surf}
        for i, (t, s, e, surf) in enumerate(raw)
    ]
    rel_rows = relations_for_doc(0, "local", text, max_len, max_gap,
                                 mentions=raw)
    relations = [
        {"rel_id": r[3], "rel_type": r[4], "arg1_id": r[5], "arg2_id": r[9]}
        for r in rel_rows
    ]
    triples = sorted({(r[5], r[6], r[4].split("-")[0], r[11])
                      for r in rel_rows})
    long_table = [{"subj_id": s_id, "subj": s, "pred": p, "obj": o}
                  for (s_id, s, p, o) in triples]
    graph: dict[str, dict[str, list[str]]] = {}
    for (_, subj, pred, obj) in triples:
        graph.setdefault(subj, {}).setdefault(pred, []).append(obj)
    return {"entities": mentions, "relations": relations,
            "triples": long_table, "graph": graph}


__all__ = ["predict_document", "gazetteer_by_ngram"]
