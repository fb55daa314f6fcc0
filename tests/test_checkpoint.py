"""Checkpoint save/restore round-trip (orbax or npz fallback)."""

import pathlib
import tempfile

import numpy as np

import jax
import jax.numpy as jnp

from efficient_llm_inference_tpu.models import gpt2 as gpt2_mod
from efficient_llm_inference_tpu.utils.checkpoint import load_params, save_params


def test_roundtrip():
    cfg = gpt2_mod.GPT2Config.tiny()
    params = gpt2_mod.init_gpt2_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    with tempfile.TemporaryDirectory() as td:
        path = save_params(params, str(pathlib.Path(td) / "ck"))
        restored = load_params(path, like=params)
        for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(restored)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_convert_and_cache_hf_local_serves_token_exact():
    """Local HF checkpoint -> convert -> serve, token-exact vs HF greedy.

    The reference's model-loading surface is hub `from_pretrained`
    (/root/reference/examples/basic_benchmark.py:20-28); offline here, so
    an HF GPT-2 built from config is `save_pretrained` to a local dir,
    converted through convert_and_cache_hf, and served by the engine. The
    second call must restore from the disk cache without touching HF.
    """
    import torch
    from transformers import GPT2Config as HFConfig
    from transformers import GPT2LMHeadModel

    from efficient_llm_inference_tpu.core.config import Config
    from efficient_llm_inference_tpu.engine.engine import InferenceEngine
    from efficient_llm_inference_tpu.utils.checkpoint import (
        convert_and_cache_hf,
    )

    tiny = gpt2_mod.GPT2Config.tiny()
    torch.manual_seed(0)
    hf = GPT2LMHeadModel(
        HFConfig(
            vocab_size=tiny.vocab_size,
            n_positions=tiny.n_positions,
            n_embd=tiny.n_embd,
            n_layer=tiny.n_layer,
            n_head=tiny.n_head,
            attn_implementation="eager",
        )
    ).eval()

    prompt = "offline hf conversion parity"
    n_new = 12

    def hf_greedy(ids):
        out_ids = list(ids)
        with torch.no_grad():
            out = hf(input_ids=torch.tensor([ids]), use_cache=True)
            past, logits = out.past_key_values, out.logits[:, -1, :]
            for _ in range(n_new):
                nxt = torch.argmax(logits, dim=-1, keepdim=True)
                out_ids.append(int(nxt))
                out = hf(input_ids=nxt, use_cache=True, past_key_values=past)
                past, logits = out.past_key_values, out.logits[:, -1, :]
        return out_ids

    with tempfile.TemporaryDirectory() as td:
        hf_dir = pathlib.Path(td) / "hf_gpt2"
        hf.save_pretrained(str(hf_dir))
        cache_dir = pathlib.Path(td) / "params"

        params, spec = convert_and_cache_hf(
            "gpt2-tiny", cache_dir=str(cache_dir), hf_path=str(hf_dir)
        )
        eng = InferenceEngine(
            spec, params, config=Config(dtype=jnp.float32, device="cpu")
        )
        # ByteTokenizer ids are < 256 == the tiny vocab: the same id
        # sequence drives both models
        got = eng.generate_ids(prompt, "full_cache", max_new_tokens=n_new)
        assert got == hf_greedy(eng.tokenizer.encode(prompt))

        # second call restores from the params cache (HF dir removed)
        import shutil

        shutil.rmtree(hf_dir)
        params2, _ = convert_and_cache_hf(
            "gpt2-tiny", cache_dir=str(cache_dir), hf_path=str(hf_dir)
        )
        for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(params2)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
