"""QuantizedKV fused-kernel path vs the reference-numerics path, end-to-end.

On CPU the fused path runs the Pallas kernel in interpret mode; tokens must
match the unfused path (both implement: past dequantized, current token fp).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from efficient_llm_inference_tpu.cache.kvcache import QuantizedKV
from efficient_llm_inference_tpu.engine.generate import make_decode, make_prefill
from efficient_llm_inference_tpu.models import gpt2 as gpt2_mod
from efficient_llm_inference_tpu.models.registry import gpt2_spec


@pytest.mark.parametrize("mode", ["int8", "int4", "mixed"])
@pytest.mark.parametrize("granularity", ["per_token", "per_head"])
def test_fused_matches_unfused(mode, granularity):
    cfg = gpt2_mod.GPT2Config(
        vocab_size=211, n_positions=128, n_embd=32, n_layer=2, n_head=2
    )
    spec = gpt2_spec(cfg)
    params = gpt2_mod.init_gpt2_params(jax.random.PRNGKey(1), cfg, jnp.float32)
    ids = np.random.default_rng(2).integers(0, 211, 24).tolist()
    n_new = 10

    outs = {}
    for fused in (False, True):
        strategy = QuantizedKV(
            n_layer=cfg.n_layer,
            n_head=cfg.n_head,
            head_dim=cfg.head_dim,
            capacity=64,
            mode=mode,
            granularity=granularity,
            fused=fused,
        )
        prefill = make_prefill(spec, strategy, None)
        decode = make_decode(spec, strategy, None, n_new)
        buf = np.zeros((1, 32), np.int32)
        buf[0, : len(ids)] = ids
        cache, last = prefill(params, jnp.asarray(buf), jnp.int32(len(ids)))
        toks, _ = decode(params, cache, last)
        outs[fused] = np.asarray(toks)[0].tolist()

    assert outs[True] == outs[False], (mode, granularity, outs)
