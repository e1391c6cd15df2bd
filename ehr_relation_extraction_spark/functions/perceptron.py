"""Averaged structured perceptron NER tagger (Collins, EMNLP 2002) —
a REAL learned sequence model for the pluggable model-NER stage
(reference N3, bilstm_crf_ner; SURVEY §2.3), torch-free.

The reference's neural detectors reduce to: tokens -> per-token scores
-> constrained sequence decode -> IOB2 labels.  This module supplies
the learned-scores half with pure numpy:

- features per token: hashed surface/prefix/suffix/shape/context
  strings (stable md5 buckets — no vocab files);
- emissions: sum of learned weights over active features;
- decode: the existing ``functions.crf.viterbi_decode`` with learned
  transition weights on top of the hard IOB2-grammar mask;
- training: structured perceptron updates on Viterbi mistakes, with
  the standard lazy-averaging trick (O(#updates), not O(D*K) per doc).

Everything is deterministic: fixed document iteration order, no RNG,
integer weight updates — retraining bit-reproduces the weights, so the
stage is resume-safe and oracle-friendly.

Scale posture: training runs driver-side on a SAMPLE (exactly how a
100 TB pipeline trains its distilled tagger — you never train on the
full corpus); the learned arrays (a few MB) ship to executors inside
the ``label_fn`` closure and score Arrow batches with vectorized numpy
— no per-row Python beyond the batch loop that every mapInPandas
stage has.
"""

from __future__ import annotations

import hashlib

import numpy as np

from ..config import IOB2_LABELS
from .crf import iob2_transition_matrix, viterbi_decode

D_BUCKETS = 1 << 15


def _bucket(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16) % D_BUCKETS


def _shape(tok: str) -> str:
    if tok.isdigit():
        return "d"
    if tok.isalpha():
        return "a" if tok.islower() else "A"
    return "x"


def token_features(tokens: list[str], i: int) -> list[int]:
    """Hashed feature indices for position i (surface, affixes, shape,
    +/-1 context words and a context bigram)."""
    tok = tokens[i].lower()
    prev = tokens[i - 1].lower() if i > 0 else "<s>"
    nxt = tokens[i + 1].lower() if i + 1 < len(tokens) else "</s>"
    feats = [
        "w=" + tok,
        "p3=" + tok[:3],
        "s3=" + tok[-3:],
        "sh=" + _shape(tokens[i]),
        "pw=" + prev,
        "nw=" + nxt,
        "pb=" + prev + "|" + tok,
    ]
    return [_bucket(f) for f in feats]


class PerceptronTagger:
    """Weights: ``w_em`` (D_BUCKETS, K) emission, ``w_tr`` (K, K)
    transition (added to the hard IOB2-grammar mask).  ``finalize``
    produces the averaged weights used for inference."""

    def __init__(self, labels: tuple[str, ...] = IOB2_LABELS):
        self.labels = labels
        k = len(labels)
        self.k = k
        self.w_em = np.zeros((D_BUCKETS, k))
        self.w_tr = np.zeros((k, k))
        self._u_em = np.zeros((D_BUCKETS, k))
        self._u_tr = np.zeros((k, k))
        self._q = 0
        self._grammar = iob2_transition_matrix(labels)
        self._lab_idx = {lab: i for i, lab in enumerate(labels)}
        self.avg_em: np.ndarray | None = None
        self.avg_tr: np.ndarray | None = None

    # -- scoring ---------------------------------------------------------
    def _emissions(self, feats: list[list[int]],
                   em: np.ndarray) -> np.ndarray:
        out = np.empty((len(feats), self.k))
        for t, fs in enumerate(feats):
            out[t] = em[fs].sum(axis=0)
        return out

    def _decode(self, feats: list[list[int]], em: np.ndarray,
                tr: np.ndarray) -> list[int]:
        return viterbi_decode(self._emissions(feats, em),
                              self._grammar + tr)

    # -- training --------------------------------------------------------
    def _bump_em(self, f: int, y: int, v: float) -> None:
        self.w_em[f, y] += v
        self._u_em[f, y] += self._q * v

    def _bump_tr(self, a: int, b: int, v: float) -> None:
        self.w_tr[a, b] += v
        self._u_tr[a, b] += self._q * v

    def train(self, docs: list[list[str]], gold: list[list[str]],
              epochs: int = 5) -> "PerceptronTagger":
        """docs: token lists; gold: aligned IOB2 label lists.
        Deterministic: documents visited in the given order each epoch."""
        for _ in range(epochs):
            for tokens, labels in zip(docs, gold):
                if not tokens:
                    continue
                feats = [token_features(tokens, i)
                         for i in range(len(tokens))]
                y_gold = [self._lab_idx[lab] for lab in labels]
                y_pred = self._decode(feats, self.w_em, self.w_tr)
                self._q += 1
                if y_pred == y_gold:
                    continue
                for t, fs in enumerate(feats):
                    if y_pred[t] != y_gold[t]:
                        for f in fs:
                            self._bump_em(f, y_gold[t], 1.0)
                            self._bump_em(f, y_pred[t], -1.0)
                for t in range(1, len(y_gold)):
                    if (y_gold[t - 1], y_gold[t]) != (y_pred[t - 1], y_pred[t]):
                        self._bump_tr(y_gold[t - 1], y_gold[t], 1.0)
                        self._bump_tr(y_pred[t - 1], y_pred[t], -1.0)
        self.finalize()
        return self

    def finalize(self) -> None:
        """Lazy averaging: avg = w - u / q (Collins' trick)."""
        q = max(self._q, 1)
        self.avg_em = self.w_em - self._u_em / q
        self.avg_tr = self.w_tr - self._u_tr / q

    # -- inference -------------------------------------------------------
    def predict(self, tokens: list[str]) -> list[str]:
        if not tokens:
            return []
        em = self.avg_em if self.avg_em is not None else self.w_em
        tr = self.avg_tr if self.avg_tr is not None else self.w_tr
        feats = [token_features(tokens, i) for i in range(len(tokens))]
        return [self.labels[i] for i in self._decode(feats, em, tr)]

    def label_fn(self):
        """A ``model_ner.model_mentions_df`` label_fn: the averaged
        arrays are captured in the closure and ship to each executor
        once per task (a few MB), scoring whole Arrow batches."""
        def fn(text: str, toks: list[tuple[str, int, int]]) -> list[str]:
            return self.predict([t for t, _, _ in toks])
        return fn


class PairClassifier:
    """Averaged binary perceptron for the RE stage (reference R8,
    biobert_re sequence classifier) — the learned counterpart of
    ``operators.relations.classify_rule``, behind the same contract
    (candidate row -> pred in {0, 1}).

    Features are hashed strings of the pair row (types, exact and
    bucketed gap, surfaces, argument order); weights are one (D,)
    vector.  Deterministic training (fixed order, no RNG) with the
    same lazy-averaging trick as the tagger."""

    FIELDS = ("rel_type", "gap", "hub_text", "attr_text",
              "hub_start", "attr_start")

    def __init__(self):
        self.w = np.zeros(D_BUCKETS)
        self._u = np.zeros(D_BUCKETS)
        self._q = 0
        self.avg: np.ndarray | None = None

    @staticmethod
    def pair_features(rel_type: str, gap: int, hub_text: str,
                      attr_text: str, hub_start: int,
                      attr_start: int) -> list[int]:
        feats = [
            "rt=" + rel_type,
            "g=" + str(gap),
            "gb=" + str(gap // 10),
            "ht=" + hub_text.lower(),
            "at=" + attr_text.lower(),
            "ord=" + ("ha" if hub_start < attr_start else "ah"),
        ]
        return [_bucket(f) for f in feats]

    def _score(self, fs: list[int], w: np.ndarray) -> float:
        return float(w[fs].sum())

    def train(self, rows: list[tuple], labels: list[int],
              epochs: int = 5) -> "PairClassifier":
        """rows: tuples in FIELDS order; labels: teacher 0/1."""
        for _ in range(epochs):
            for row, y in zip(rows, labels):
                fs = self.pair_features(*row)
                self._q += 1
                pred = 1 if self._score(fs, self.w) > 0 else 0
                if pred != y:
                    v = 1.0 if y == 1 else -1.0
                    self.w[fs] += v
                    self._u[fs] += self._q * v
        self.avg = self.w - self._u / max(self._q, 1)
        return self

    def predict(self, row: tuple) -> int:
        w = self.avg if self.avg is not None else self.w
        return 1 if self._score(self.pair_features(*row), w) > 0 else 0


def train_pair_classifier(candidates_rows: list[dict], epochs: int = 5
                          ) -> PairClassifier:
    """Train from candidate-row dicts against the rule teacher
    (gap <= MAX_PAIR_GAP_CHARS) — the distillation setup for the RE
    stage; sampled driver-side exactly like the tagger."""
    from ..config import MAX_PAIR_GAP_CHARS

    rows = [tuple(r[f] for f in PairClassifier.FIELDS)
            for r in candidates_rows]
    labels = [1 if r["gap"] <= MAX_PAIR_GAP_CHARS else 0
              for r in candidates_rows]
    return PairClassifier().train(rows, labels, epochs=epochs)


def train_on_teacher(pages_rows: list[tuple[str]], epochs: int = 5
                     ) -> PerceptronTagger:
    """Train from raw texts against the deterministic teacher labels
    (the gazetteer detector) — the distillation setup: rule-based
    teacher -> learned student that generalizes to unseen surfaces."""
    from ..functions.text import tokenize_with_offsets
    from ..operators.model_ner import teacher_labels

    docs, gold = [], []
    for (text,) in pages_rows:
        toks = tokenize_with_offsets(text)
        if not toks:
            continue
        docs.append([t for t, _, _ in toks])
        gold.append(teacher_labels(text, toks))
    return PerceptronTagger().train(docs, gold, epochs=epochs)
