"""Declarative method dispatch shared by the task harnesses.

Both harnesses (summarization, mmlu) route generation through the engine's
reference-compatible `generate_with_*` methods with per-method kwarg
defaults (the reference hardcodes the same routing as if/elif ladders,
summarization.py:87-113 and mmlu.py:89-144; here it is one table).
"""

from __future__ import annotations

from typing import Tuple

# method name -> (engine method, ((kwarg, default), ...))
METHOD_TABLE: dict[str, Tuple[str, Tuple[Tuple[str, object], ...]]] = {
    "no_cache": ("generate_no_cache", ()),
    "full_cache": ("generate_with_cache", ()),
    "sliding_window": (
        "generate_with_sliding_window",
        (("window_size", 256),),
    ),
    "prefix_window": (
        "generate_with_prefix_window",
        (("window_size", 256), ("prefix_len", 32)),
    ),
    "strided_cache": (
        "generate_with_strided_cache",
        (("window_size", 256), ("stride", 4), ("prefix_len", 0)),
    ),
    "block_cache": (
        "generate_with_block_cache",
        (
            ("window_size", 256),
            ("block_size", 64),
            ("keep_per_block", 8),
            ("prefix_len", 0),
        ),
    ),
    "budget_cache": (
        "generate_with_budget_cache",
        (("window_size", 256), ("old_budget", 64), ("prefix_len", 0)),
    ),
    "paged_attention": ("generate_with_paged_attention", (("block_size", 64),)),
    "chunked_cache": (
        "generate_with_chunked_cache",
        (("chunk_size", 64), ("keep_last", 256)),
    ),
}


def generate_with_method(
    engine, prompt: str, method: str, max_new_tokens: int, **overrides
) -> str:
    """Generate text with any registry method; returns the decoded text.

    The engine methods return heterogenous tuples (text first in all of
    them — reference signatures); unknown kwargs in `overrides` are
    ignored, matching the harnesses' `.get(..., default)` behavior.
    """
    if method.startswith("quant_"):
        return engine.generate_with_quantized_kv(
            prompt, max_new_tokens, mode=method.replace("quant_", "")
        )[0]
    if method not in METHOD_TABLE:
        raise ValueError(f"Unknown method: {method}")
    attr, kwspec = METHOD_TABLE[method]
    kwargs = {name: overrides.get(name, default) for name, default in kwspec}
    return getattr(engine, attr)(prompt, max_new_tokens, **kwargs)[0]
