"""End-to-end parity of every cache method vs a torch+HF oracle.

The oracle re-derives the reference's decode protocol from its documented
behavior (/root/reference/src/benchmarking/benchmarker.py §3.2/3.3 call
stacks): HF model forward, legacy-cache round-trip, trim/quantize between
steps, greedy argmax, position ids from the trimmed cache length. Matching
token streams here means our static-shape TPU implementation reproduces the
reference's emergent semantics (re-striding, summary-of-summary, per-token
quantization error) — not just its components.

fp32 accumulation differs between backends (~1e-4 logits drift), so with a
random-init model occasional argmax flips are possible; assertions require
exact agreement on an initial window and high agreement overall.
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from efficient_llm_inference_tpu.core.config import Config
from efficient_llm_inference_tpu.engine.engine import InferenceEngine
from efficient_llm_inference_tpu.evaluation.quality import token_agreement_rate
from efficient_llm_inference_tpu.models.gpt2 import GPT2Config, params_from_hf_state_dict
from efficient_llm_inference_tpu.models.registry import gpt2_spec

N_NEW = 12
EXACT_PREFIX = 6


@pytest.fixture(scope="module")
def setup():
    from transformers import GPT2Config as HFConfig
    from transformers import GPT2LMHeadModel

    torch.manual_seed(7)
    hf_cfg = HFConfig(
        vocab_size=251,
        n_positions=256,
        n_embd=32,
        n_layer=2,
        n_head=2,
        attn_implementation="eager",
    )
    hf = GPT2LMHeadModel(hf_cfg).eval()
    cfg = GPT2Config(vocab_size=251, n_positions=256, n_embd=32, n_layer=2, n_head=2)
    params = params_from_hf_state_dict(hf.state_dict(), cfg, jnp.float32)
    eng = InferenceEngine(
        gpt2_spec(cfg),
        params,
        config=Config(model_name="tiny", device="cpu", dtype=jnp.float32),
    )
    prompt = (
        "In a distant valley surrounded by tall mountains, a small village kept "
        "an old tradition alive for generations, gathering each autumn to "
        "celebrate the harvest with music and lanterns."
    )
    ids = eng.tokenizer.encode(prompt)
    return hf, eng, prompt, ids


def _oracle_decode(hf, ids, n_new, transform):
    """Greedy decode with a cache-transform applied after prefill and after
    every step — the reference's universal loop shape (benchmarker.py:155-207).

    transform: legacy_tuple -> legacy_tuple (identity for full_cache).
    """
    from transformers import DynamicCache

    out_ids = list(ids)
    with torch.no_grad():
        out = hf(input_ids=torch.tensor([ids]), use_cache=True)
        logits = out.logits[:, -1, :]
        pkv = out.past_key_values
        legacy = pkv.to_legacy_cache() if hasattr(pkv, "to_legacy_cache") else pkv
        legacy = transform(legacy)
        past = DynamicCache.from_legacy_cache(legacy)
        for _ in range(n_new):
            nxt = torch.argmax(logits, dim=-1, keepdim=True)
            out_ids.append(int(nxt))
            out = hf(input_ids=nxt, use_cache=True, past_key_values=past)
            logits = out.logits[:, -1, :]
            pkv = out.past_key_values
            legacy = pkv.to_legacy_cache() if hasattr(pkv, "to_legacy_cache") else pkv
            legacy = transform(legacy)
            past = DynamicCache.from_legacy_cache(legacy)
    return out_ids


# ---- torch-side transforms, re-derived from documented reference semantics --


def _t_sliding(W):
    def f(legacy):
        return tuple(
            (k[:, :, -W:, :], v[:, :, -W:, :]) if k.size(2) > W else (k, v)
            for k, v in legacy
        )

    return f


def _t_prefix_window(P, W):
    def f(legacy):
        out = []
        for k, v in legacy:
            T = k.size(2)
            if T <= P + W:
                out.append((k, v))
            else:
                out.append(
                    (
                        torch.cat([k[:, :, :P], k[:, :, -W:]], dim=2),
                        torch.cat([v[:, :, :P], v[:, :, -W:]], dim=2),
                    )
                )
        return tuple(out)

    return f


def _t_strided(W, stride, P):
    def f(legacy):
        out = []
        for k, v in legacy:
            T = k.size(2)
            if T <= P + W:
                out.append((k, v))
                continue
            ts = max(P, T - W)
            idx = list(range(P)) + list(range(P, ts, stride)) + list(range(ts, T))
            idx_t = torch.tensor(idx)
            out.append((k.index_select(2, idx_t), v.index_select(2, idx_t)))
        return tuple(out)

    return f


def _t_block(W, bs, kpb, P):
    def f(legacy):
        out = []
        for k, v in legacy:
            T = k.size(2)
            if T <= P + W:
                out.append((k, v))
                continue
            ts = max(P, T - W)
            idx = list(range(P))
            start = P
            while start < ts:
                end = min(start + bs, ts)
                idx += list(range(max(start, end - kpb), end))
                start = end
            idx += list(range(ts, T))
            idx_t = torch.tensor(idx)
            out.append((k.index_select(2, idx_t), v.index_select(2, idx_t)))
        return tuple(out)

    return f


def _t_budget(W, budget, P):
    def f(legacy):
        out = []
        for k, v in legacy:
            T = k.size(2)
            if T <= P + W:
                out.append((k, v))
                continue
            ts = max(P, T - W)
            old_len = ts - P
            idx = list(range(P))
            if old_len > 0 and budget > 0:
                if old_len <= budget:
                    idx += list(range(P, ts))
                else:
                    lin = torch.unique_consecutive(
                        torch.linspace(P, ts - 1, steps=budget).long()
                    )
                    idx += lin.tolist()
            idx += list(range(ts, T))
            idx_t = torch.tensor(idx)
            out.append((k.index_select(2, idx_t), v.index_select(2, idx_t)))
        return tuple(out)

    return f


def _t_chunked(chunk, keep):
    def f(legacy):
        out = []
        for k, v in legacy:
            B, H, T, D = k.shape
            keep_eff = min(keep, T)
            old_len = T - keep_eff
            if old_len <= 0:
                out.append((k, v))
                continue
            pad = (-old_len) % chunk
            k_old = torch.cat(
                [k[:, :, :old_len], torch.zeros(B, H, pad, D, dtype=k.dtype)], dim=2
            )
            v_old = torch.cat(
                [v[:, :, :old_len], torch.zeros(B, H, pad, D, dtype=v.dtype)], dim=2
            )
            n = k_old.size(2) // chunk
            k_s = k_old.view(B, H, n, chunk, D).mean(dim=3)
            v_s = v_old.view(B, H, n, chunk, D).mean(dim=3)
            out.append(
                (
                    torch.cat([k_s, k[:, :, old_len:]], dim=2),
                    torch.cat([v_s, v[:, :, old_len:]], dim=2),
                )
            )
        return tuple(out)

    return f


def _t_quant(mode):
    def q8(x):
        x32 = x.float()
        s = (x32.abs().max() / 127.0).clamp(min=1e-8)
        q = torch.clamp((x32 / s).round(), -127, 127)
        return (q * s).to(x.dtype)

    def q4(x):
        x32 = x.float()
        s = (x32.abs().max() / 7.0).clamp(min=1e-8)
        q = torch.clamp((x32 / s).round(), -8, 7)
        return (q * s).to(x.dtype)

    kf = q8 if mode in ("int8", "mixed") else q4
    vf = q8 if mode == "int8" else q4

    def f(legacy):
        # The reference quantizes each token slice independently and keeps
        # the current (still-uncached) token fp — token t is only quantized
        # once it has entered the cache, so per-token round-trip is the
        # exact effect on past keys/values.
        out = []
        for k, v in legacy:
            T = k.size(2)
            kq = torch.cat([kf(k[:, :, t : t + 1]) for t in range(T)], dim=2)
            vq = torch.cat([vf(v[:, :, t : t + 1]) for t in range(T)], dim=2)
            out.append((kq, vq))
        return tuple(out)

    return f


CASES = [
    ("full_cache", None, {}),
    ("sliding_window", _t_sliding(32), {"window_size": 32}),
    ("prefix_window", _t_prefix_window(8, 24), {"prefix_len": 8, "window_size": 24}),
    (
        "strided_cache",
        _t_strided(24, 3, 4),
        {"window_size": 24, "stride": 3, "prefix_len": 4},
    ),
    (
        "block_cache",
        _t_block(24, 8, 3, 4),
        {"window_size": 24, "block_size": 8, "keep_per_block": 3, "prefix_len": 4},
    ),
    (
        "budget_cache",
        _t_budget(24, 10, 4),
        {"window_size": 24, "old_budget": 10, "prefix_len": 4},
    ),
    ("chunked_cache", _t_chunked(8, 24), {"chunk_size": 8, "keep_last": 24}),
    ("quant_int8", _t_quant("int8"), {}),
    ("quant_int4", _t_quant("int4"), {}),
    ("quant_mixed", _t_quant("mixed"), {}),
]


@pytest.mark.parametrize("method,transform,kw", CASES, ids=[c[0] for c in CASES])
def test_method_matches_oracle(setup, method, transform, kw):
    hf, eng, prompt, ids = setup
    ref_ids = _oracle_decode(hf, ids, N_NEW, transform or (lambda x: x))

    if method.startswith("quant_"):
        got_ids = eng.generate_ids(prompt, method, N_NEW)
    else:
        got_ids = eng.generate_ids(prompt, method, N_NEW, **kw)

    ref_new = ref_ids[len(ids):]
    got_new = got_ids[len(ids):]
    assert len(got_new) == N_NEW
    assert got_new[:EXACT_PREFIX] == ref_new[:EXACT_PREFIX], (
        f"{method}: first tokens diverge: {got_new} vs {ref_new}"
    )
    assert token_agreement_rate(got_new, ref_new) >= 0.75, (
        f"{method}: {got_new} vs {ref_new}"
    )


def test_paged_attention_matches_full_cache(setup):
    """Paged layout must be numerically identical to full cache."""
    hf, eng, prompt, ids = setup
    t_full, _ = eng.generate_with_cache(prompt, N_NEW)
    t_paged, n_new, alloc_mb, used_mb, nblocks = eng.generate_with_paged_attention(
        prompt, N_NEW, block_size=16
    )
    assert t_paged == t_full
    assert n_new == N_NEW
    assert alloc_mb >= used_mb > 0
    # allocation slack strictly less than one block per layer
    total = len(ids) + N_NEW
    import math

    assert nblocks == math.ceil(total / 16) * eng.model.n_layer
