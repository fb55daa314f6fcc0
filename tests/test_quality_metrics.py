"""Quality metrics vs HF/torch oracles.

compute_perplexity must reproduce the reference's teacher-forcing protocol
(labels=input_ids, HF internal shift, token-count weighting — reference
quality.py:11-57); compute_sliding_window_nll must match a torch loop with
per-token window trimming (quality.py:60-121).
"""

import math

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from efficient_llm_inference_tpu.data.tokenizer import ByteTokenizer
from efficient_llm_inference_tpu.evaluation.quality import (
    compute_perplexity,
    compute_sliding_window_nll,
    text_similarity,
    token_agreement_rate,
)
from efficient_llm_inference_tpu.models.gpt2 import (
    GPT2Config,
    params_from_hf_state_dict,
)
from efficient_llm_inference_tpu.models.registry import gpt2_spec


@pytest.fixture(scope="module")
def setup():
    from transformers import GPT2Config as HFConfig
    from transformers import GPT2LMHeadModel

    torch.manual_seed(11)
    hf_cfg = HFConfig(
        vocab_size=300, n_positions=128, n_embd=32, n_layer=2, n_head=2,
        attn_implementation="eager",
    )
    hf = GPT2LMHeadModel(hf_cfg).eval()
    cfg = GPT2Config(vocab_size=300, n_positions=128, n_embd=32, n_layer=2, n_head=2)
    params = params_from_hf_state_dict(hf.state_dict(), cfg, jnp.float32)
    return hf, gpt2_spec(cfg), params


def test_perplexity_matches_hf(setup):
    hf, spec, params = setup
    tok = ByteTokenizer()
    texts = [
        "The sun rose over the quiet valley this morning.",
        "Seven ships sailed south toward warmer waters.",
    ]

    total_nll, total_tokens = 0.0, 0
    with torch.no_grad():
        for t in texts:
            ids = torch.tensor([tok.encode(t)])
            out = hf(input_ids=ids, labels=ids)
            n = ids.numel()
            total_nll += float(out.loss) * n
            total_tokens += n
    ref_nll = total_nll / total_tokens

    avg_nll, ppl = compute_perplexity(spec, params, tok, texts)
    assert abs(avg_nll - ref_nll) < 2e-4
    assert abs(ppl - math.exp(ref_nll)) / ppl < 1e-3


def test_sliding_window_nll_matches_torch_loop(setup):
    hf, spec, params = setup
    tok = ByteTokenizer()
    text = "A small stream winds through the forest, feeding the old mill pond."
    W = 16

    ids = tok.encode(text)
    total_nll = 0.0
    with torch.no_grad():
        past = None
        prev = torch.tensor([[ids[0]]])
        for i in range(1, len(ids)):
            out = hf(input_ids=prev, use_cache=True, past_key_values=past)
            logits = out.logits[:, -1, :]
            legacy = out.past_key_values.to_legacy_cache()
            trimmed = tuple(
                (k[:, :, -W:, :], v[:, :, -W:, :]) if k.size(2) > W else (k, v)
                for k, v in legacy
            )
            from transformers import DynamicCache

            past = DynamicCache.from_legacy_cache(trimmed)
            logp = torch.log_softmax(logits, dim=-1)
            total_nll += float(-logp[0, ids[i]])
            prev = torch.tensor([[ids[i]]])
    ref_nll = total_nll / (len(ids) - 1)

    avg_nll, ppl = compute_sliding_window_nll(spec, params, tok, text, window_size=W)
    assert abs(avg_nll - ref_nll) < 5e-4


def test_similarity_and_agreement():
    assert text_similarity("abcdef", "abcdef") == 1.0
    assert 0.0 < text_similarity("abcdef", "abcxyz") < 1.0
    assert token_agreement_rate([1, 2, 3], [1, 2, 4]) == pytest.approx(2 / 3)
    assert token_agreement_rate([], [1]) == 0.0
