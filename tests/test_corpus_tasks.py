"""Held-out corpus-mined task sets (data/corpus_tasks.py)."""

import numpy as np

from efficient_llm_inference_tpu.data.corpus import corpus_files
from efficient_llm_inference_tpu.data.corpus_tasks import (
    docstring_dataset,
    heldout_files,
    mine_docstring_pairs,
    mine_module_mc,
    module_mc_dataset,
)


def test_heldout_files_never_trained():
    """Held-out files are disjoint from the training prefix: every one
    either starts inside the eval tail or lies beyond the byte cap."""
    held = heldout_files()
    assert held, "corpus cap should leave held-out files"
    files = corpus_files()
    # the held-out list is a suffix of the sorted file list
    idx = [files.index(p) for p in held]
    assert idx == sorted(idx)
    assert idx[-1] == len(files) - 1


def test_mining_is_deterministic():
    a = mine_docstring_pairs(n=6)
    b = mine_docstring_pairs(n=6)
    assert a == b
    assert mine_module_mc(n=8) == mine_module_mc(n=8)


def test_docstring_pairs_shape_and_overlap():
    pairs = mine_docstring_pairs(n=8)
    assert len(pairs) >= 4
    for body, doc in pairs:
        assert "def " in body
        assert '"""' not in doc  # the docstring text itself, not the quotes
        assert len(doc) >= 60


def test_datasets_wrap_reference_interfaces():
    ds = docstring_dataset(n=4)
    arts, refs = ds.get_samples(4)
    prompts = ds.create_prompts(arts)
    assert all(p.endswith("\n\nSummary:") for p in prompts)

    mds = module_mc_dataset(n=8)
    qs, chs, ans = mds.get_samples(8)
    assert all(len(c) == 4 for c in chs)
    # balanced answer letters (i % 4 construction)
    assert sorted(set(ans)) == [0, 1, 2, 3]
    mp = mds.create_prompts(qs, chs)
    assert all(p.endswith("\nAnswer:") for p in mp)
    assert all("Choices:\nA. " in p for p in mp)
