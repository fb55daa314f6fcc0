"""Self-contained ROUGE implementation (rouge1 / rouge2 / rougeL).

The reference depends on the `rouge-score` pip package
(/root/reference/src/evaluation/rouge.py:5-11); that package is not in this
environment, so the scorer is implemented here from the ROUGE definitions:

* tokenize: lowercase, non-alphanumeric -> space, split;
* optional Porter stemming (classic Porter 1980 algorithm) of tokens longer
  than 3 characters, matching rouge-score's behavior;
* rouge1/rouge2: clipped n-gram overlap precision/recall/F1;
* rougeL: longest-common-subsequence precision/recall/F1.

`RougeEvaluator` keeps the reference's interface: per-pair scores averaged
into {rouge_type: {precision, recall, fmeasure}}.
"""

from __future__ import annotations

import re
from collections import Counter
from typing import Dict, List


# ---------------------------------------------------------------------------
# Classic Porter stemmer (Porter, 1980 — "An algorithm for suffix stripping")
# ---------------------------------------------------------------------------

_VOWELS = "aeiou"


def _is_cons(word: str, i: int) -> bool:
    c = word[i]
    if c in _VOWELS:
        return False
    if c == "y":
        return i == 0 or not _is_cons(word, i - 1)
    return True


def _measure(stem: str) -> int:
    """Number of VC sequences in the stem."""
    m = 0
    prev_cons = True
    started = False
    for i in range(len(stem)):
        cons = _is_cons(stem, i)
        if started and cons and not prev_cons:
            m += 1
        if not cons:
            started = True
        prev_cons = cons
    return m


def _has_vowel(stem: str) -> bool:
    return any(not _is_cons(stem, i) for i in range(len(stem)))


def _ends_double_cons(word: str) -> bool:
    return (
        len(word) >= 2
        and word[-1] == word[-2]
        and _is_cons(word, len(word) - 1)
    )


def _cvc(word: str) -> bool:
    if len(word) < 3:
        return False
    if not (
        _is_cons(word, len(word) - 3)
        and not _is_cons(word, len(word) - 2)
        and _is_cons(word, len(word) - 1)
    ):
        return False
    return word[-1] not in "wxy"


def porter_stem(word: str) -> str:
    """Stem one lowercase word with the classic Porter algorithm."""
    if len(word) <= 2:
        return word
    w = word

    # Step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif w.endswith("ss"):
        pass
    elif w.endswith("s"):
        w = w[:-1]

    # Step 1b
    flag_1b = False
    if w.endswith("eed"):
        if _measure(w[:-3]) > 0:
            w = w[:-1]
    elif w.endswith("ed"):
        if _has_vowel(w[:-2]):
            w = w[:-2]
            flag_1b = True
    elif w.endswith("ing"):
        if _has_vowel(w[:-3]):
            w = w[:-3]
            flag_1b = True
    if flag_1b:
        if w.endswith(("at", "bl", "iz")):
            w += "e"
        elif _ends_double_cons(w) and not w.endswith(("l", "s", "z")):
            w = w[:-1]
        elif _measure(w) == 1 and _cvc(w):
            w += "e"

    # Step 1c
    if w.endswith("y") and _has_vowel(w[:-1]):
        w = w[:-1] + "i"

    # Step 2
    step2 = [
        ("ational", "ate"), ("tional", "tion"), ("enci", "ence"), ("anci", "ance"),
        ("izer", "ize"), ("abli", "able"), ("alli", "al"), ("entli", "ent"),
        ("eli", "e"), ("ousli", "ous"), ("ization", "ize"), ("ation", "ate"),
        ("ator", "ate"), ("alism", "al"), ("iveness", "ive"), ("fulness", "ful"),
        ("ousness", "ous"), ("aliti", "al"), ("iviti", "ive"), ("biliti", "ble"),
    ]
    for suf, rep in step2:
        if w.endswith(suf):
            if _measure(w[: -len(suf)]) > 0:
                w = w[: -len(suf)] + rep
            break

    # Step 3
    step3 = [
        ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
        ("ical", "ic"), ("ful", ""), ("ness", ""),
    ]
    for suf, rep in step3:
        if w.endswith(suf):
            if _measure(w[: -len(suf)]) > 0:
                w = w[: -len(suf)] + rep
            break

    # Step 4
    step4 = [
        "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
        "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive", "ize",
    ]
    for suf in step4:
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if _measure(stem) > 1:
                if suf == "ion":
                    if stem and stem[-1] in "st":
                        w = stem
                else:
                    w = stem
            break

    # Step 5a
    if w.endswith("e"):
        stem = w[:-1]
        m = _measure(stem)
        if m > 1 or (m == 1 and not _cvc(stem)):
            w = stem
    # Step 5b
    if _measure(w) > 1 and _ends_double_cons(w) and w.endswith("l"):
        w = w[:-1]

    return w


# ---------------------------------------------------------------------------
# ROUGE
# ---------------------------------------------------------------------------

_TOKEN_RE = re.compile(r"[^a-z0-9]+")


def rouge_tokenize(text: str, use_stemmer: bool = True) -> List[str]:
    toks = [t for t in _TOKEN_RE.split(text.lower()) if t]
    if use_stemmer:
        toks = [porter_stem(t) if len(t) > 3 else t for t in toks]
    return toks


def _ngrams(tokens: List[str], n: int) -> Counter:
    return Counter(tuple(tokens[i : i + n]) for i in range(len(tokens) - n + 1))


def _prf(overlap: int, n_pred: int, n_ref: int) -> Dict[str, float]:
    p = overlap / n_pred if n_pred else 0.0
    r = overlap / n_ref if n_ref else 0.0
    f = 2 * p * r / (p + r) if (p + r) else 0.0
    return {"precision": p, "recall": r, "fmeasure": f}


def _intern_pair(a: List[str], b: List[str]):
    """Map the union vocabulary of two token lists to int32 ids."""
    vocab: Dict[str, int] = {}
    def ids(toks):
        out = []
        for t in toks:
            if t not in vocab:
                vocab[t] = len(vocab)
            out.append(vocab[t])
        return out
    return ids(a), ids(b)


def _lcs_len(a: List[str], b: List[str]) -> int:
    if not a or not b:
        return 0
    # Native C++ DP when the runtime library is available (the O(n*m) LCS is
    # the host-side hot spot of summarization evaluation).
    try:
        from ..runtime.build import native_lcs_len

        a_ids, b_ids = _intern_pair(a, b)
        n = native_lcs_len(a_ids, b_ids)
        if n is not None:
            return n
    except Exception:
        pass
    prev = [0] * (len(b) + 1)
    for x in a:
        cur = [0] * (len(b) + 1)
        for j, y in enumerate(b, 1):
            cur[j] = prev[j - 1] + 1 if x == y else max(prev[j], cur[j - 1])
        prev = cur
    return prev[-1]


def score_pair(
    reference: str, prediction: str, rouge_types: List[str], use_stemmer: bool = True
) -> Dict[str, Dict[str, float]]:
    ref = rouge_tokenize(reference, use_stemmer)
    pred = rouge_tokenize(prediction, use_stemmer)
    out = {}
    for rt in rouge_types:
        if rt == "rougeL":
            lcs = _lcs_len(pred, ref)
            out[rt] = _prf(lcs, len(pred), len(ref))
        else:
            n = int(rt.replace("rouge", ""))
            pg, rg = _ngrams(pred, n), _ngrams(ref, n)
            overlap = sum(min(c, rg[g]) for g, c in pg.items())
            out[rt] = _prf(overlap, sum(pg.values()), sum(rg.values()))
    return out


class RougeEvaluator:
    """Interface-compatible with the reference's RougeEvaluator
    (/root/reference/src/evaluation/rouge.py:14-91), self-contained."""

    def __init__(self, rouge_types: List[str] = None, use_stemmer: bool = True):
        self.rouge_types = rouge_types or ["rouge1", "rouge2", "rougeL"]
        self.use_stemmer = use_stemmer

    def compute_rouge(
        self, predictions: List[str], references: List[str]
    ) -> Dict[str, Dict[str, float]]:
        assert len(predictions) == len(references), (
            f"Mismatch: {len(predictions)} predictions vs {len(references)} references"
        )
        sums = {
            rt: {"precision": 0.0, "recall": 0.0, "fmeasure": 0.0}
            for rt in self.rouge_types
        }
        for pred, ref in zip(predictions, references):
            s = score_pair(ref, pred, self.rouge_types, self.use_stemmer)
            for rt in self.rouge_types:
                for k in sums[rt]:
                    sums[rt][k] += s[rt][k]
        n = max(len(predictions), 1)
        return {
            rt: {k: v / n for k, v in sums[rt].items()} for rt in self.rouge_types
        }

    def format_scores(self, scores: Dict[str, Dict[str, float]]) -> str:
        lines = []
        for rouge_type, metrics in scores.items():
            lines.append(f"{rouge_type.upper()}:")
            lines.append(f"  Precision: {metrics['precision']:.4f}")
            lines.append(f"  Recall:    {metrics['recall']:.4f}")
            lines.append(f"  F-measure: {metrics['fmeasure']:.4f}")
        return "\n".join(lines)
