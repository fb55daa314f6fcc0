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
# Porter stemmer, NLTK_EXTENSIONS behavior (what `rouge_score` uses via
# nltk.stem.porter.PorterStemmer() — its default mode). The extensions over
# Porter 1980: an irregular-forms pool (dying→die, news→news, ...), special
# ies/ied handling for 4-letter words, the consonant-y step-1c condition,
# the alli-then-recurse / bli / fulli / logi step-2 rules, and the
# vowel-consonant *o extension for 2-letter stems. Behavior verified
# token-exactly against nltk + rouge_score in tests/test_rouge_golden.py.
# ---------------------------------------------------------------------------

_VOWELS = "aeiou"

# Irregular forms drawn to Porter's attention over the years (NLTK pool).
_IRREGULAR = {
    "sky": "sky",
    "skies": "sky",
    "dying": "die",
    "lying": "lie",
    "tying": "tie",
    "news": "news",
    "innings": "inning",
    "inning": "inning",
    "outings": "outing",
    "outing": "outing",
    "cannings": "canning",
    "canning": "canning",
    "howe": "howe",
    "proceed": "proceed",
    "exceed": "exceed",
    "succeed": "succeed",
}


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
    if len(word) >= 3 and (
        _is_cons(word, len(word) - 3)
        and not _is_cons(word, len(word) - 2)
        and _is_cons(word, len(word) - 1)
        and word[-1] not in "wxy"
    ):
        return True
    # NLTK extension: a 2-letter vowel-consonant stem also counts as *o
    return len(word) == 2 and not _is_cons(word, 0) and _is_cons(word, 1)


def _rules(w: str, rules) -> str:
    """First matching suffix wins; a failed condition stops the list."""
    for suf, rep, cond in rules:
        if w.endswith(suf):
            stem = w[: -len(suf)] if suf else w
            return stem + rep if (cond is None or cond(stem)) else w
    return w


def porter_stem(word: str) -> str:
    """Stem one lowercase word, matching NLTK's default-mode PorterStemmer."""
    if word in _IRREGULAR:
        return _IRREGULAR[word]
    if len(word) <= 2:
        return word
    w = word

    # Step 1a ('ties'/'dies' keep the e — 4-letter NLTK extension)
    if w.endswith("ies") and len(w) == 4:
        w = w[:-1]
    elif w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif w.endswith("ss"):
        pass
    elif w.endswith("s"):
        w = w[:-1]

    # Step 1b ('died'→'die' but 'spied'→'spi' — NLTK extension)
    if w.endswith("ied"):
        w = w[:-1] if len(w) == 4 else w[:-2]
    elif w.endswith("eed"):
        if _measure(w[:-3]) > 0:
            w = w[:-1]
    else:
        flag_1b = False
        if w.endswith("ed") and _has_vowel(w[:-2]):
            w = w[:-2]
            flag_1b = True
        elif w.endswith("ing") and _has_vowel(w[:-3]):
            w = w[:-3]
            flag_1b = True
        if flag_1b:
            if w.endswith(("at", "bl", "iz")):
                w += "e"
            elif _ends_double_cons(w):
                if w[-1] not in "lsz":
                    w = w[:-1]
                # double l/s/z: matched rule with failed condition -> stop
            elif _measure(w) == 1 and _cvc(w):
                w += "e"

    # Step 1c: y→i only after a consonant in a >1-char stem (NLTK condition:
    # 'happy'→'happi' but 'enjoy'→'enjoy', 'say' stays)
    if w.endswith("y"):
        stem = w[:-1]
        if len(stem) > 1 and _is_cons(stem, len(stem) - 1):
            w = stem + "i"

    # Step 2 (NLTK: 'alli' strips first then re-runs; 'bli'→'ble' replaces
    # the paper's 'abli'→'able'; 'fulli' and 'logi' rules added)
    if w.endswith("alli") and _measure(w[:-4]) > 0:
        return porter_stem(w[:-4] + "al")
    m_pos = lambda s: _measure(s) > 0  # noqa: E731
    w_snapshot = w
    w = _rules(w, [
        ("ational", "ate", m_pos), ("tional", "tion", m_pos),
        ("enci", "ence", m_pos), ("anci", "ance", m_pos),
        ("izer", "ize", m_pos), ("bli", "ble", m_pos),
        ("alli", "al", m_pos), ("entli", "ent", m_pos),
        ("eli", "e", m_pos), ("ousli", "ous", m_pos),
        ("ization", "ize", m_pos), ("ation", "ate", m_pos),
        ("ator", "ate", m_pos), ("alism", "al", m_pos),
        ("iveness", "ive", m_pos), ("fulness", "ful", m_pos),
        ("ousness", "ous", m_pos), ("aliti", "al", m_pos),
        ("iviti", "ive", m_pos), ("biliti", "ble", m_pos),
        ("fulli", "ful", m_pos),
        # the 'l' stays with the stem so 'geologi' works like 'archaeologi'
        ("logi", "log", lambda s: _measure(w_snapshot[:-3]) > 0),
    ])

    # Step 3
    w = _rules(w, [
        ("icate", "ic", m_pos), ("ative", "", m_pos), ("alize", "al", m_pos),
        ("iciti", "ic", m_pos), ("ical", "ic", m_pos), ("ful", "", m_pos),
        ("ness", "", m_pos),
    ])

    # Step 4
    m_gt1 = lambda s: _measure(s) > 1  # noqa: E731
    w = _rules(w, [
        ("al", "", m_gt1), ("ance", "", m_gt1), ("ence", "", m_gt1),
        ("er", "", m_gt1), ("ic", "", m_gt1), ("able", "", m_gt1),
        ("ible", "", m_gt1), ("ant", "", m_gt1), ("ement", "", m_gt1),
        ("ment", "", m_gt1), ("ent", "", m_gt1),
        ("ion", "", lambda s: _measure(s) > 1 and bool(s) and s[-1] in "st"),
        ("ou", "", m_gt1), ("ism", "", m_gt1), ("ate", "", m_gt1),
        ("iti", "", m_gt1), ("ous", "", m_gt1), ("ive", "", m_gt1),
        ("ize", "", m_gt1),
    ])

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
