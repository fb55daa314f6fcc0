"""Native C++ runtime library vs pure-Python references."""

import numpy as np
import pytest

from efficient_llm_inference_tpu.runtime.build import (
    build_native,
    native_lcs_len,
    native_ngram_overlap,
)


def _py_lcs(a, b):
    prev = [0] * (len(b) + 1)
    for x in a:
        cur = [0] * (len(b) + 1)
        for j, y in enumerate(b, 1):
            cur[j] = prev[j - 1] + 1 if x == y else max(prev[j], cur[j - 1])
        prev = cur
    return prev[-1]


def _py_overlap(a, b, n):
    from collections import Counter

    ga = Counter(tuple(a[i : i + n]) for i in range(len(a) - n + 1))
    gb = Counter(tuple(b[i : i + n]) for i in range(len(b) - n + 1))
    return sum(min(c, gb[g]) for g, c in ga.items())


@pytest.fixture(scope="module")
def lib_ok():
    if build_native() is None:
        pytest.skip("g++ unavailable — native runtime not built")
    return True


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_native_lcs_matches_python(lib_ok, seed):
    rng = np.random.default_rng(seed)
    a = rng.integers(0, 20, rng.integers(0, 200)).tolist()
    b = rng.integers(0, 20, rng.integers(0, 200)).tolist()
    assert native_lcs_len(a, b) == _py_lcs(a, b)


@pytest.mark.parametrize("order", [1, 2, 3])
def test_native_ngram_overlap_matches_python(lib_ok, order):
    rng = np.random.default_rng(7)
    a = rng.integers(0, 10, 150).tolist()
    b = rng.integers(0, 10, 180).tolist()
    assert native_ngram_overlap(a, b, order) == _py_overlap(a, b, order)


def test_rouge_uses_native_consistently(lib_ok):
    """rougeL through the evaluator must be identical with/without native."""
    from efficient_llm_inference_tpu.evaluation import rouge as r

    pred = "the quick brown fox jumps over the lazy dog near the river bank"
    ref = "a quick fox jumped over a lazy dog by the river"
    with_native = r.score_pair(ref, pred, ["rougeL"])
    # force pure python by pointing the import at a broken name
    orig = r._lcs_len
    def py_only(a, b):
        prev = [0] * (len(b) + 1)
        for x in a:
            cur = [0] * (len(b) + 1)
            for j, y in enumerate(b, 1):
                cur[j] = prev[j - 1] + 1 if x == y else max(prev[j], cur[j - 1])
            prev = cur
        return prev[-1]
    r._lcs_len = py_only
    try:
        without = r.score_pair(ref, pred, ["rougeL"])
    finally:
        r._lcs_len = orig
    assert with_native == without
