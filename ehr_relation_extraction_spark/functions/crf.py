"""Viterbi CRF decoding in numpy (reference N4,
bilstm_crf_ner/model/crf.py:229-281) — the sequence-decode half of the
BiLSTM-CRF detector, torch-free.

``viterbi_decode`` maximizes
``score(y) = sum_t emissions[t, y_t] + sum_t transitions[y_{t-1}, y_t]
           + start[y_0] + end[y_T]``
exactly like the reference's ``_viterbi_decode`` (same recurrence:
broadcast previous scores + transition matrix + emission row, argmax
backpointers, best-last-tag backtrack).

No model weights ship in this sandbox; ``hash_emissions`` provides a
deterministic stand-in emission matrix so the full decode path
(emissions -> viterbi -> IOB2 labels -> chunks -> spans) can run and be
property-tested against brute-force enumeration.
"""

from __future__ import annotations

import hashlib

import numpy as np

from ..config import IOB2_LABELS


def viterbi_decode(emissions: np.ndarray,
                   transitions: np.ndarray,
                   start: np.ndarray | None = None,
                   end: np.ndarray | None = None) -> list[int]:
    """emissions: (T, K); transitions: (K, K) trans[i, j] = score i->j.
    Returns the argmax tag sequence (length T)."""
    t_len, k = emissions.shape
    if start is None:
        start = np.zeros(k)
    if end is None:
        end = np.zeros(k)
    score = start + emissions[0]
    history: list[np.ndarray] = []
    for t in range(1, t_len):
        # (K_prev, 1) + (K_prev, K_next) -> max over prev
        total = score[:, None] + transitions + emissions[t][None, :]
        history.append(np.argmax(total, axis=0))
        score = np.max(total, axis=0)
    score = score + end
    best = int(np.argmax(score))
    path = [best]
    for back in reversed(history):
        best = int(back[best])
        path.append(best)
    path.reverse()
    return path


def brute_force_decode(emissions: np.ndarray,
                       transitions: np.ndarray,
                       start: np.ndarray | None = None,
                       end: np.ndarray | None = None) -> list[int]:
    """Exponential reference implementation for property tests."""
    import itertools

    t_len, k = emissions.shape
    if start is None:
        start = np.zeros(k)
    if end is None:
        end = np.zeros(k)
    best_score, best_path = -np.inf, None
    for path in itertools.product(range(k), repeat=t_len):
        s = start[path[0]] + end[path[-1]]
        s += sum(emissions[t, path[t]] for t in range(t_len))
        s += sum(transitions[path[t - 1], path[t]] for t in range(1, t_len))
        if s > best_score:
            best_score, best_path = s, list(path)
    return best_path


def hash_emissions(tokens: list[str], labels: tuple[str, ...] = IOB2_LABELS
                   ) -> np.ndarray:
    """Deterministic stand-in emission scores: md5(token, label) -> a
    float in [0, 1).  Pure function of the inputs (resume-safe)."""
    out = np.empty((len(tokens), len(labels)))
    for i, tok in enumerate(tokens):
        for j, lab in enumerate(labels):
            h = hashlib.md5(f"{tok}|{lab}".encode()).hexdigest()
            out[i, j] = int(h[:8], 16) / 0xFFFFFFFF
    return out


def iob2_transition_matrix(labels: tuple[str, ...] = IOB2_LABELS,
                           forbid: float = -1e4) -> np.ndarray:
    """IOB2 grammar constraints as transition scores: I-X may only
    follow B-X or I-X (the CRF's learned equivalent; here hard)."""
    k = len(labels)
    t = np.zeros((k, k))
    for j, to in enumerate(labels):
        if to.startswith("I-"):
            typ = to[2:]
            for i, frm in enumerate(labels):
                if frm not in (f"B-{typ}", f"I-{typ}"):
                    t[i, j] = forbid
    return t


def crf_label_fn(text: str, toks: list[tuple[str, int, int]]) -> list[str]:
    """A label_fn for operators.model_ner.model_mentions_df: hash
    emissions + IOB2-grammar transitions -> viterbi -> labels.  Not a
    trained model — the decode plumbing with deterministic weights."""
    tokens = [t for t, _, _ in toks]
    if not tokens:
        return []
    em = hash_emissions(tokens)
    path = viterbi_decode(em, iob2_transition_matrix())
    return [IOB2_LABELS[i] for i in path]
