"""Held-out task sets mined from the offline corpus (harness quality signal).

Round-4 verdict #3: the reference's task harnesses exist to RANK cache
methods by ROUGE / letter-answer accuracy on real text
(/root/reference/src/benchmarking/summarization.py:210-248,
/root/reference/src/benchmarking/mmlu.py:308-334), but the bundled news /
MMLU samples share zero n-grams with what a stdlib-trained byte LM can
produce — every method scored 0.000 and the ordering evidence traced to a
memorized toy. This module mines tasks IN the distribution the scale
models were trained on, from stdlib files BEYOND the 16 MB training cap
(never seen, not even as the NLL eval tail):

* Docstring summarization (ROUGE): article = a function's source with its
  docstring removed, reference = the docstring. Pairs are filtered so the
  docstring's content words overlap the body (>= min_overlap), so a model
  that retains the code context can echo identifier n-grams — and eviction
  that drops the body context loses exactly that signal. Evaluated through
  the reference's own prompt template and RougeEvaluator.

* Module multiple choice (MMLU extraction tiers): "Which module defines
  the function 'X'?" with four module-basename choices. Balanced answer
  letters; evaluated through the reference's MMLU prompt template,
  4-tier answer extraction, and identical-answer diagnosis.

Both return instances of the bundled dataset classes (data/loaders.py) via
`from_records`, so SummarizationBenchmark / MMLUBenchmark run unchanged.
Deterministic: files in sorted order, fixed RNG seed.
"""

from __future__ import annotations

import ast
import pathlib
import re
from typing import List, Optional, Tuple

import numpy as np

from .corpus import _SEP, corpus_files
from .loaders import MMLUDataset, SummarizationDataset

_WORD = re.compile(r"[A-Za-z_]{3,}")


def heldout_files(
    max_bytes: int = 16_000_000, eval_bytes: int = 131_072
) -> List[pathlib.Path]:
    """Files the scale models never TRAINED on.

    Two sources, mirroring data/corpus.py corpus_splits's accounting:
    files whose corpus blob starts inside the eval tail (the final
    `eval_bytes` of the built corpus — the held-out NLL split), and files
    strictly beyond the byte cap. A file straddling the train/eval
    boundary is excluded (partially trained)."""
    files = corpus_files()
    # replicate build_corpus's accounting EXACTLY (read_bytes, skip
    # unreadable files before their separator counts) so the boundary
    # cannot misclassify a partially-trained file as held-out
    spans = []  # (start, file) for files that contribute bytes
    total = 0
    capped_at = len(files)
    for i, p in enumerate(files):
        try:
            n = len(p.read_bytes())
        except OSError:
            continue
        spans.append((total, p))
        total += len(_SEP % str(p).encode()) + n
        if total >= max_bytes:
            capped_at = i + 1
            break
    # the eval tail is the final eval_bytes of the BUILT corpus (which is
    # min(total, max_bytes) long)
    boundary = min(total, max_bytes) - eval_bytes
    out = [p for start, p in spans if start >= boundary]
    out.extend(files[capped_at:])
    return out


def _content_words(text: str) -> set:
    return {w.lower() for w in _WORD.findall(text)}


def mine_docstring_pairs(
    n: int = 16,
    min_doc: int = 60,
    max_doc: int = 600,
    min_body: int = 150,
    max_body: int = 1400,
    min_overlap: float = 0.25,
    seed: int = 0,
) -> List[Tuple[str, str]]:
    """(article, docstring) pairs from held-out stdlib functions."""
    pairs = []
    for path in heldout_files():
        try:
            src = path.read_text(encoding="utf-8", errors="ignore")
            tree = ast.parse(src)
        except (OSError, SyntaxError, ValueError):
            continue
        for node in ast.walk(tree):
            if not isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
                continue
            doc = ast.get_docstring(node)
            if not doc or not (min_doc <= len(doc) <= max_doc):
                continue
            seg = ast.get_source_segment(src, node)
            if seg is None:
                continue
            # cut the docstring statement's lines out of the segment
            first = node.body[0]
            lo = first.lineno - node.lineno
            hi = first.end_lineno - node.lineno
            lines = seg.split("\n")
            body = "\n".join(lines[:lo] + lines[hi + 1:])
            if not (min_body <= len(body) <= max_body):
                continue
            dw = _content_words(doc)
            bw = _content_words(body)
            if not dw or len(dw & bw) / len(dw) < min_overlap:
                continue
            pairs.append((body, doc))
    rng = np.random.default_rng(seed)
    rng.shuffle(pairs)
    return pairs[:n]


def _module_name(path: pathlib.Path) -> str:
    """Dotted module name relative to the stdlib root (so a package's
    __init__.py names the PACKAGE, not the meaningless '__init__')."""
    import sysconfig

    stdlib = pathlib.Path(sysconfig.get_paths()["stdlib"])
    try:
        rel = path.relative_to(stdlib)
    except ValueError:
        rel = pathlib.Path(path.name)
    parts = list(rel.with_suffix("").parts)
    if parts and parts[-1] == "__init__":
        parts = parts[:-1]
    return ".".join(parts) or path.stem


def mine_module_mc(
    n: int = 16, seed: int = 0
) -> List[Tuple[str, List[str], int]]:
    """(question, choices, answer) — which module defines function X?"""
    per_file: List[Tuple[str, List[str]]] = []
    seen_mods = set()
    for path in heldout_files():
        try:
            src = path.read_text(encoding="utf-8", errors="ignore")
            tree = ast.parse(src)
        except (OSError, SyntaxError, ValueError):
            continue
        names = [
            node.name
            for node in tree.body
            if isinstance(node, (ast.FunctionDef, ast.ClassDef))
            and not node.name.startswith("_")
        ]
        mod = _module_name(path)
        if names and mod not in seen_mods:
            seen_mods.add(mod)
            per_file.append((mod, names))
    rng = np.random.default_rng(seed)
    records = []
    if len(per_file) < 4:
        return records
    for i in range(n):
        idxs = rng.choice(len(per_file), size=4, replace=False)
        ans = int(i % 4)  # balanced answer letters
        mod, names = per_file[int(idxs[ans])]
        fn = names[int(rng.integers(len(names)))]
        choices = [per_file[int(j)][0] for j in idxs]
        assert len(set(choices)) == 4  # modules deduped above
        records.append(
            (f"Which Python module defines '{fn}'?", choices, ans)
        )
    return records


def docstring_dataset(
    n: int = 16, max_samples: Optional[int] = None, **kw
) -> SummarizationDataset:
    """Held-out docstring-summarization set as a SummarizationDataset."""
    records = mine_docstring_pairs(n=n, **kw)
    if max_samples is not None:
        records = records[:max_samples]
    return SummarizationDataset.from_records(
        records, name="stdlib_docstrings"
    )


def module_mc_dataset(n: int = 16, **kw) -> MMLUDataset:
    """Held-out module-MC set as an MMLUDataset."""
    return MMLUDataset.from_records(mine_module_mc(n=n, **kw))
