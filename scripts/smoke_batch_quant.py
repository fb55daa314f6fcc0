"""Smoke: batched quant megakernel vs per-row single-stream quant kernel."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from efficient_llm_inference_tpu.cache.kvcache import QuantizedKV  # noqa: E402
from efficient_llm_inference_tpu.models import gpt2 as gpt2_mod  # noqa: E402
from efficient_llm_inference_tpu.ops.pallas.megakernel import pack_gpt2_mega  # noqa: E402
from efficient_llm_inference_tpu.ops.pallas.megakernel_quant import (  # noqa: E402
    _kv_kinds,
    gpt2_megastep_quant,
    to_mega_quant_layout,
)
from efficient_llm_inference_tpu.ops.pallas.megakernel_batch_quant import (  # noqa: E402
    gpt2_megabatch_quant,
    mega_batch_quant_supported,
)

CFG = gpt2_mod.GPT2Config(
    vocab_size=300, n_positions=256, n_embd=256, n_layer=2, n_head=2
)
params = gpt2_mod.init_gpt2_params(jax.random.PRNGKey(0), CFG, jnp.float32)
packed = pack_gpt2_mega(params, CFG)
C = 48
B = 3
lens = [7, 12, 5]
rng = np.random.default_rng(0)

for kv_mode in ("int8", "int4", "mixed"):
    assert mega_batch_quant_supported(CFG, C, params, B, kv_mode), kv_mode
    k_kind, v_kind = _kv_kinds(kv_mode)
    rows = []
    for b in range(B):
        strat = QuantizedKV(
            n_layer=CFG.n_layer, n_head=CFG.n_head, head_dim=CFG.head_dim,
            capacity=C, batch=1, dtype=jnp.float32, mode=kv_mode, fused=False,
        )
        T0 = lens[b]
        toks = jnp.asarray(rng.integers(1, 299, size=(1, T0)), jnp.int32)
        pos = jnp.arange(T0, dtype=jnp.int32)[None]
        cache = strat.init()
        logits, cache = gpt2_mod.gpt2_forward(
            params, CFG, toks, pos, cache, strat)
        cache = strat.set_length(cache, T0)
        tok0 = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
        rows.append((cache, tok0))

    kb = jnp.stack(
        [to_mega_quant_layout(c["k"], k_kind) for c, _ in rows], axis=1)
    vb = jnp.stack(
        [to_mega_quant_layout(c["v"], v_kind) for c, _ in rows], axis=1)
    ks = jnp.stack([c["k_scale"] for c, _ in rows], axis=1)  # [L, B, C]
    vs = jnp.stack([c["v_scale"] for c, _ in rows], axis=1)
    tok0s = jnp.concatenate([t for _, t in rows])
    x_emb = params["wte"][tok0s] + params["wpe"][jnp.asarray(lens)]
    toks_b, k2b, v2b, ks2b, vs2b = gpt2_megabatch_quant(
        packed, kb, vb, ks, vs, jnp.asarray(lens, jnp.int32), x_emb,
        cfg=CFG, capacity=C, kv_mode=kv_mode, interpret=True,
    )
    # per-row single-stream reference
    for b in range(B):
        cache, tok0 = rows[b]
        tok_s, k2, v2, ks2, vs2 = gpt2_megastep_quant(
            packed,
            to_mega_quant_layout(cache["k"], k_kind),
            to_mega_quant_layout(cache["v"], v_kind),
            cache["k_scale"], cache["v_scale"],
            jnp.int32(lens[b]), x_emb[b:b + 1],
            cfg=CFG, capacity=C, kv_mode=kv_mode, interpret=True,
        )
        assert int(toks_b[b]) == int(tok_s), (kv_mode, b)
        np.testing.assert_array_equal(np.asarray(k2b[:, b]), np.asarray(k2))
        np.testing.assert_array_equal(np.asarray(v2b[:, b]), np.asarray(v2))
        np.testing.assert_allclose(
            np.asarray(ks2b[:, b]), np.asarray(ks2), rtol=1e-6)
        np.testing.assert_allclose(
            np.asarray(vs2b[:, b]), np.asarray(vs2), rtol=1e-6)
    print(f"{kv_mode}: OK tokens={np.asarray(toks_b)}")
print("smoke passed")
