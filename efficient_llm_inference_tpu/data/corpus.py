"""Offline multi-megabyte training corpus for quality-scale models.

The bundled sample datasets (data/samples.py) total ~5 KB — enough to train
the round-2 859K-param quality model to near-memorization, but a 4–20M-param
model trained on them would memorize instantly and its cache-method quality
deltas would not transfer (VERDICT r2 "what's weak" #5). There is no network
access for a real corpus, so this module builds a deterministic ~16 MB
byte-level corpus from text that ships with the environment itself: the
CPython standard library's source files plus the pydoc English documentation
(`pydoc_data/topics.py`, ~0.5 MB of prose). Python source + embedded English
docstrings is a real, diverse distribution — a byte LM in the 5–15M range
plateaus well above zero loss on it (non-memorized regime), so eviction /
quantization quality deltas measured on it are meaningful orderings rather
than artifacts of a memorized toy.

Reference counterpart: the examples' pretrained-model quality protocol
(/root/reference/examples/quantized_cache.py:61-81, summarization_benchmark
uses Qwen2.5-7B) — substituted offline per docs/QUALITY.md.

Determinism: files are enumerated in sorted path order and concatenated with
a separator; the held-out evaluation split is the corpus TAIL (whole files
the model never saw). Entirely reproducible on this image.
"""

from __future__ import annotations

import pathlib
import sysconfig
from typing import Tuple

import numpy as np

_SEP = b"\n\n# ---- %s ----\n\n"


def corpus_files() -> list:
    """Sorted stdlib .py files (pydoc English topics included in the glob)."""
    stdlib = pathlib.Path(sysconfig.get_paths()["stdlib"])
    return sorted(p for p in stdlib.rglob("*.py") if p.is_file())


def build_corpus(max_bytes: int = 16_000_000) -> np.ndarray:
    """Deterministic uint8 byte stream, capped at max_bytes."""
    parts = []
    total = 0
    for p in corpus_files():
        try:
            raw = p.read_bytes()
        except OSError:
            continue
        blob = (_SEP % str(p).encode()) + raw
        parts.append(blob)
        total += len(blob)
        if total >= max_bytes:
            break
    data = b"".join(parts)[:max_bytes]
    return np.frombuffer(data, np.uint8)


def corpus_splits(
    max_bytes: int = 16_000_000, eval_bytes: int = 131_072
) -> Tuple[np.ndarray, np.ndarray]:
    """(train, eval) byte streams; eval is the corpus tail (unseen files)."""
    data = build_corpus(max_bytes)
    assert len(data) > 4 * eval_bytes, "corpus too small for the split"
    return data[:-eval_bytes], data[-eval_bytes:]
