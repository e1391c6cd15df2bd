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

D_BUCKETS = 1 << 17


def _bucket(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16) % D_BUCKETS


def _shape(tok: str) -> str:
    if tok.isdigit():
        return "d"
    if tok.isalpha():
        return "a" if tok.islower() else "A"
    return "x"


def token_features(tokens: list[str], i: int) -> list[int]:
    """Hashed feature indices for position i: surface, char-ngram
    affixes (3/4), shape, +/-1 context words and a context bigram
    (affix set and bucket width grid-searched on held-out span F1:
    2/len-bucket features and 2^15 buckets both cost ~1 F1 point via
    hash collisions; 3+4-grams at 2^17 measured best).  The char-ngram affixes are what let the student
    generalize to unseen surfaces sharing morphology with gazetteer
    aliases (the BiLSTM-CRF's char-CNN plays this role in the
    reference, bilstm_crf_ner/model/ner_model.py)."""
    tok = tokens[i].lower()
    prev = tokens[i - 1].lower() if i > 0 else "<s>"
    nxt = tokens[i + 1].lower() if i + 1 < len(tokens) else "</s>"
    feats = [
        "w=" + tok,
        "p3=" + tok[:3],
        "p4=" + tok[:4],
        "s3=" + tok[-3:],
        "s4=" + tok[-4:],
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
              epochs: int = 5,
              feats_list: list[list[list[int]]] | None = None
              ) -> "PerceptronTagger":
        """docs: token lists; gold: aligned IOB2 label lists.
        Deterministic: documents visited in the given order each epoch.
        ``feats_list`` lets callers hash features once and share them
        across epochs/channels (the md5 hashing dominates otherwise)."""
        if feats_list is None:
            feats_list = [[token_features(tokens, i)
                           for i in range(len(tokens))] for tokens in docs]
        for _ in range(epochs):
            for tokens, labels, feats in zip(docs, gold, feats_list):
                if not tokens:
                    continue
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


def channel_names(ent_types: tuple[str, ...],
                  n_layers: int = 1) -> tuple[str, ...]:
    """Channel naming: plain type names for single-layer taggers
    (back-compat), ``Type#k`` for layered nested-NER channels."""
    types = sorted(ent_types)
    if n_layers == 1:
        return tuple(types)
    return tuple(f"{t}#{k}" for t in types for k in range(n_layers))


def channel_base_type(channel: str) -> str:
    return channel.partition("#")[0]


def split_span_layers(spans: list[tuple[str, int, int]],
                      n_layers: int) -> list[list[tuple[str, int, int]]]:
    """Greedy interval layering (the classic nested-NER reduction):
    sort spans by (start, end), place each in the LOWEST layer whose
    previous span it doesn't overlap.  Every layer is overlap-free, so
    each projects losslessly into one IOB2 sequence; spans nested
    deeper than ``n_layers`` are dropped (the only remaining encoding
    loss).  Deterministic — pure sorted-order greedy."""
    layers: list[list[tuple[str, int, int]]] = [[] for _ in range(n_layers)]
    last_end = [-1] * n_layers
    for sp in sorted(spans, key=lambda x: (x[1], x[2])):
        for k in range(n_layers):
            if sp[1] >= last_end[k]:
                layers[k].append(sp)
                last_end[k] = sp[2]
                break
    return layers


class MultiChannelTagger:
    """One binary IOB2 perceptron per CHANNEL — a channel is an entity
    type, or a (type, layer) pair for nested same-type mentions.

    Why: a single IOB2 sequence cannot encode overlapping cross-type
    mentions (one label per token), and that encoding limit — not
    learning error — was the measured ceiling of the cascaded pipeline
    (triple F1 ~0.87 with span F1 0.997).  Per-type channels make
    cross-type overlaps representable (measured ceiling 0.958);
    same-type overlaps are recovered by LAYERED channels (``Type#k``,
    :func:`split_span_layers`) — each layer is overlap-free, so two
    layers encode any depth-2 nesting and lift the ceiling to 1.0 on
    the fixture.  Each channel's Viterbi is over 3 labels instead of
    2*T+1, so T channels cost about the same decode work as one joint
    tagger (T*9 vs (2T+1)^2 transitions)."""

    def __init__(self, channels: tuple[str, ...]):
        self.ent_types = tuple(sorted(channels))
        self.taggers = {
            c: PerceptronTagger(
                ("O", "B-" + channel_base_type(c), "I-" + channel_base_type(c)))
            for c in self.ent_types}

    def chunks(self, tokens: list[str]) -> list[tuple[str, int, int]]:
        from ..operators.model_ner import decode_chunks

        if not tokens:
            return []
        feats = [token_features(tokens, i) for i in range(len(tokens))]
        out: set[tuple[str, int, int]] = set()
        for t in self.ent_types:
            tg = self.taggers[t]
            em = tg.avg_em if tg.avg_em is not None else tg.w_em
            tr = tg.avg_tr if tg.avg_tr is not None else tg.w_tr
            labs = [tg.labels[i] for i in tg._decode(feats, em, tr)]
            out.update(decode_chunks(labs))
        return sorted(out)

    def chunk_fn(self):
        """A ``model_ner.model_mentions_df`` chunk_fn: token-range
        chunks straight from the per-channel decodes (bypasses the
        single-sequence label contract that can't carry overlaps)."""
        def fn(text: str, toks: list[tuple[str, int, int]]
               ) -> list[tuple[str, int, int]]:
            return self.chunks([t for t, _, _ in toks])
        return fn


def teacher_channel_labels(text: str, toks, channel: str,
                           n_layers: int = 1) -> list[str]:
    """Per-channel teacher: IOB2 labels from that channel's gazetteer
    spans — the distillation target.  A plain type name takes ALL the
    type's spans (overlaps overwrite in sorted order, the original
    single-layer behavior); a layered ``Type#k`` channel takes layer k
    of the overlap-free greedy layering, so the projection is
    lossless within the layer."""
    from ..functions.ner_kernel import detect_mentions
    from ..operators.model_ner import iob2_labels_for_doc

    base, _, layer = channel.partition("#")
    spans = [(t, s, e) for (t, s, e, _) in detect_mentions(text, toks)
             if t == base]
    if layer:
        spans = split_span_layers(spans, n_layers)[int(layer)]
    return iob2_labels_for_doc(text, toks, spans)


def train_multi_on_teacher(pages_rows: list[tuple[str]], epochs: int = 5,
                           ent_types: tuple[str, ...] | None = None,
                           n_layers: int = 1) -> MultiChannelTagger:
    """Serial multi-channel distillation (the driver-side counterpart
    of ``train_distributed(channels=...)``): features hashed once per
    doc, shared by every channel and epoch.  ``n_layers >= 2`` trains
    layered ``Type#k`` channels (nested same-type mentions)."""
    from ..config import GAZETTEER
    from .text import tokenize_with_offsets

    if ent_types is None:
        ent_types = tuple(sorted({g[1] for g in GAZETTEER}))
    mt = MultiChannelTagger(channel_names(ent_types, n_layers))
    docs, texts_toks = [], []
    for (text,) in pages_rows:
        toks = tokenize_with_offsets(text)
        if not toks:
            continue
        docs.append([t for t, _, _ in toks])
        texts_toks.append((text, toks))
    feats_list = [[token_features(tokens, i) for i in range(len(tokens))]
                  for tokens in docs]
    for t in mt.ent_types:
        gold = [teacher_channel_labels(text, toks, t, n_layers)
                for text, toks in texts_toks]
        mt.taggers[t].train(docs, gold, epochs=epochs,
                            feats_list=feats_list)
    return mt


class PairClassifier:
    """Averaged binary perceptron for the RE stage (reference R8,
    biobert_re sequence classifier) — the learned counterpart of
    ``operators.relations.classify_rule``, behind the same contract
    (candidate row -> pred in {0, 1}).

    Features are hashed strings of the pair row: types, exact and
    bucketed gap, full surfaces, argument order, PLUS char-ngram
    affixes and shapes of both surfaces (round-2 roadmap thread —
    the same morphology features that let the NER perceptron
    generalize; a surface-dependent teacher rule transfers to UNSEEN
    surfaces sharing affixes, which full-surface features cannot do,
    tests/test_round3_fixes.py).  Weights are one (D,) vector.
    Deterministic training (fixed order, no RNG) with the same
    lazy-averaging trick as the tagger."""

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
            "rtgb=" + rel_type + "|" + str(gap // 10),
        ]
        for t, pre in ((hub_text, "h"), (attr_text, "a")):
            tl = t.lower()
            feats += [pre + "p3=" + tl[:3], pre + "p4=" + tl[:4],
                      pre + "s3=" + tl[-3:], pre + "s4=" + tl[-4:],
                      pre + "sh=" + _shape(t)]
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


def train_distributed(pages_df, epochs: int = 5, n_parts: int = 8,
                      rounds: int = 2,
                      labels: tuple[str, ...] = IOB2_LABELS,
                      channels: tuple[str, ...] | None = None,
                      n_layers: int = 1
                      ) -> "PerceptronTagger | MultiChannelTagger":
    """Distributed perceptron training by iterative parameter mixing
    (McDonald, Hall & Mann, NAACL 2010): shard the teacher sample
    deterministically by ``pmod(doc_id, n_parts)``, train an averaged
    perceptron per shard FROM the current mixed weights inside ONE
    ``applyInPandas`` pass, then doc-count-weight-average the shard
    weights on the driver; repeat for ``rounds``.

    The driver never collects corpus text — only the (sparse, bounded)
    nonzero weight entries each shard emits, a few MB total.  Training
    is deterministic end-to-end: shard membership is a doc_id hash,
    docs are sorted by doc_id inside each shard, and the driver-side
    mix accumulates rows in sorted (part, ch, kind, i, j) order, so
    repeated runs bit-reproduce the weights (same guarantee the serial
    trainer gives, now partition-count-invariant too).

    ``channels``: entity-type tuple -> trains a ``MultiChannelTagger``
    (one binary IOB2 perceptron per type, overlapping cross-type
    mentions representable); all channels of a shard train in the SAME
    applyInPandas task, sharing one feature-hash pass per doc.

    ``pages_df`` needs (doc_id, text) columns; pass a bounded sample
    (e.g. ``.where("doc_id < 200")``) — distillation trains on a
    sample even at 100 TB, but now the sample never funnels through
    the driver.
    """
    import pandas as pd
    from pyspark.sql import functions as F

    spark = pages_df.sparkSession
    ch_names: tuple[str, ...]
    if channels is not None:
        ch_names = channel_names(channels, n_layers)
        ch_labels = {c: ("O", "B-" + channel_base_type(c),
                         "I-" + channel_base_type(c)) for c in ch_names}
    else:
        ch_names = ("",)
        ch_labels = {"": labels}
    sample = pages_df.select("doc_id", "text").withColumn(
        "part", F.pmod(F.col("doc_id"), F.lit(n_parts)).cast("int"))
    schema = ("part int, ch string, kind string, i long, j long, "
              "v double, n_docs long")

    seeds = {c: (np.zeros((D_BUCKETS, len(ch_labels[c]))),
                 np.zeros((len(ch_labels[c]),) * 2)) for c in ch_names}
    for _ in range(rounds):
        bc = spark.sparkContext.broadcast(seeds)

        def _train_part(pdf: "pd.DataFrame") -> "pd.DataFrame":
            from .text import tokenize_with_offsets
            from ..operators.model_ner import teacher_labels

            pdf = pdf.sort_values("doc_id")
            part = int(pdf["part"].iloc[0])
            docs, texts_toks = [], []
            for text in pdf["text"]:
                toks = tokenize_with_offsets(text)
                if not toks:
                    continue
                docs.append([t for t, _, _ in toks])
                texts_toks.append((text, toks))
            feats_list = [[token_features(tokens, i)
                           for i in range(len(tokens))] for tokens in docs]
            rows = [(part, "", "n", 0, 0, 0.0, len(docs))]
            for c in ch_names:
                tagger = PerceptronTagger(ch_labels[c])
                em0, tr0 = bc.value[c]
                tagger.w_em = em0.copy()
                tagger.w_tr = tr0.copy()
                if c:
                    gold = [teacher_channel_labels(text, toks, c, n_layers)
                            for text, toks in texts_toks]
                else:
                    gold = [teacher_labels(text, toks)
                            for text, toks in texts_toks]
                tagger.train(docs, gold, epochs=epochs,
                             feats_list=feats_list)
                ii, jj = np.nonzero(tagger.avg_em)
                rows += [(part, c, "em", int(a), int(b),
                          float(tagger.avg_em[a, b]), len(docs))
                         for a, b in zip(ii, jj)]
                ii, jj = np.nonzero(tagger.avg_tr)
                rows += [(part, c, "tr", int(a), int(b),
                          float(tagger.avg_tr[a, b]), len(docs))
                         for a, b in zip(ii, jj)]
            return pd.DataFrame(
                rows,
                columns=["part", "ch", "kind", "i", "j", "v", "n_docs"])

        rows = (sample.groupBy("part")
                .applyInPandas(_train_part, schema).collect())
        counts = {r["part"]: r["n_docs"] for r in rows if r["kind"] == "n"}
        total = sum(counts.values())
        mixed = {c: (np.zeros_like(seeds[c][0]), np.zeros_like(seeds[c][1]))
                 for c in ch_names}
        for r in sorted((r for r in rows if r["kind"] != "n"),
                        key=lambda r: (r["part"], r["ch"], r["kind"],
                                       r["i"], r["j"])):
            em, tr = mixed[r["ch"]]
            tgt = em if r["kind"] == "em" else tr
            tgt[r["i"], r["j"]] += r["v"] * counts[r["part"]]
        if total > 0:
            for c in ch_names:
                mixed[c][0][:] /= total
                mixed[c][1][:] /= total
        seeds = mixed
        bc.unpersist()

    if channels is not None:
        mt = MultiChannelTagger(ch_names)
        for c in ch_names:
            tg = mt.taggers[c]
            tg.w_em, tg.w_tr = seeds[c]
            tg.avg_em, tg.avg_tr = seeds[c]
        return mt
    out = PerceptronTagger(labels)
    out.w_em, out.w_tr = seeds[""]
    out.avg_em, out.avg_tr = seeds[""]
    return out


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


def save_multichannel(mt: MultiChannelTagger, path: str) -> None:
    """Persist a trained multi-channel tagger as one .npz: per channel
    the SPARSE nonzero (i, j, v) triplets of the averaged emission
    matrix plus the dense (K, K) transitions — a few MB, the artifact
    a cluster training job ships to the serving/inference job."""
    arrs: dict[str, np.ndarray] = {
        "channels": np.array(list(mt.ent_types), dtype=object)}
    for c, tg in mt.taggers.items():
        em = tg.avg_em if tg.avg_em is not None else tg.w_em
        tr = tg.avg_tr if tg.avg_tr is not None else tg.w_tr
        ii, jj = np.nonzero(em)
        arrs[f"{c}__i"] = ii
        arrs[f"{c}__j"] = jj
        arrs[f"{c}__v"] = em[ii, jj]
        arrs[f"{c}__tr"] = tr
    np.savez_compressed(path, **arrs)


def load_multichannel(path: str) -> MultiChannelTagger:
    """Rebuild a :func:`save_multichannel` artifact; the loaded tagger
    predicts BIT-IDENTICALLY to the saved one (dense arrays are
    reconstructed exactly from the sparse triplets)."""
    data = np.load(path, allow_pickle=True)
    channels = tuple(str(c) for c in data["channels"])
    mt = MultiChannelTagger(channels)
    for c in channels:
        tg = mt.taggers[c]
        em = np.zeros_like(tg.w_em)
        em[data[f"{c}__i"], data[f"{c}__j"]] = data[f"{c}__v"]
        tg.avg_em = em
        tg.avg_tr = data[f"{c}__tr"]
    return mt
