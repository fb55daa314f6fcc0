"""int8 weight quantization (serving mode) + scan-unroll equivalence.

Weight quantization is a TPU-native extension beyond the reference (which
only quantizes KV): per-output-channel symmetric int8, dequantized inside
the dot by XLA (no HBM materialization). Unrolling the layer scan must be
numerically identical to the rolled loop.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from efficient_llm_inference_tpu.cache.kvcache import DenseKV
from efficient_llm_inference_tpu.core.config import Config
from efficient_llm_inference_tpu.engine.engine import InferenceEngine
from efficient_llm_inference_tpu.models import gpt2 as gpt2_mod
from efficient_llm_inference_tpu.models import llama as llama_mod
from efficient_llm_inference_tpu.models.registry import gpt2_spec


def _logits(spec, params, tokens):
    strat = DenseKV(
        n_layer=spec.n_layer,
        n_head=spec.n_kv_head,
        head_dim=spec.head_dim,
        capacity=tokens.shape[1] + 4,
        batch=1,
        dtype=jnp.float32,
    )
    pos = jnp.broadcast_to(
        jnp.arange(tokens.shape[1], dtype=jnp.int32)[None], tokens.shape
    )
    logits, _ = spec.forward(params, tokens, pos, strat.init(), strat, None)
    return np.asarray(logits)


@pytest.mark.parametrize("family", ["gpt2", "llama"])
def test_int8_weights_close_to_fp(family):
    if family == "gpt2":
        cfg = gpt2_mod.GPT2Config.tiny()
        spec = gpt2_spec(cfg)
        params = gpt2_mod.init_gpt2_params(jax.random.PRNGKey(0), cfg, jnp.float32)
        qparams = gpt2_mod.quantize_gpt2_weights(params)
    else:
        cfg = llama_mod.LlamaConfig.tiny()
        spec = llama_mod.llama_spec(cfg)
        params = llama_mod.init_llama_params(jax.random.PRNGKey(0), cfg, jnp.float32)
        qparams = llama_mod.quantize_llama_weights(params)

    toks = jnp.asarray(
        np.random.default_rng(0).integers(0, cfg.vocab_size, (1, 16)), jnp.int32
    )
    fp = _logits(spec, params, toks)
    q8 = _logits(spec, qparams, toks)
    # int8 per-channel round-off: logits stay close in a relative sense
    denom = np.abs(fp).max()
    assert np.abs(q8 - fp).max() / denom < 0.05
    # and greedy decisions mostly agree on random-init tiny models
    agree = (fp.argmax(-1) == q8.argmax(-1)).mean()
    assert agree >= 0.75, agree


def test_engine_weight_quant_int8_generates():
    eng = InferenceEngine.from_model_name(
        "gpt2-tiny",
        config=Config(
            model_name="t", device="cpu", dtype=jnp.float32, weight_quant="int8"
        ),
    )
    text, n = eng.generate_with_cache("Hello world.", max_new_tokens=4)
    assert n == 4 and isinstance(text, str)


def test_scan_unroll_token_exact():
    cfg = gpt2_mod.GPT2Config.tiny()
    params = gpt2_mod.init_gpt2_params(jax.random.PRNGKey(1), cfg, jnp.float32)
    outs = []
    for unroll in (1, 2):
        eng = InferenceEngine.from_model_name(
            "gpt2-tiny",
            params=params,
            config=Config(
                model_name="t", device="cpu", dtype=jnp.float32, scan_unroll=unroll
            ),
        )
        outs.append(eng.generate_ids("The river flows", method="full_cache",
                                     max_new_tokens=8))
    assert outs[0] == outs[1]


@pytest.mark.parametrize("family", ["gpt2", "llama"])
def test_int4_weights_close_to_fp(family):
    """Grouped int4 weights: coarser than int8 but logits stay usable."""
    if family == "gpt2":
        cfg = gpt2_mod.GPT2Config.tiny()
        spec = gpt2_spec(cfg)
        params = gpt2_mod.init_gpt2_params(jax.random.PRNGKey(0), cfg, jnp.float32)
        qparams = gpt2_mod.quantize_gpt2_weights(params, mode="int4")
        assert qparams["blocks"]["fc_w"]["q4"].dtype == jnp.uint8
        assert "lm_q4" in qparams and "lm_q" not in qparams
    else:
        cfg = llama_mod.LlamaConfig.tiny()
        spec = llama_mod.llama_spec(cfg)
        params = llama_mod.init_llama_params(jax.random.PRNGKey(0), cfg, jnp.float32)
        qparams = llama_mod.quantize_llama_weights(params, mode="int4")
        assert qparams["blocks"]["w_up"]["q4"].dtype == jnp.uint8

    toks = jnp.asarray(
        np.random.default_rng(0).integers(0, cfg.vocab_size, (1, 16)), jnp.int32
    )
    fp = _logits(spec, params, toks)
    q4 = _logits(spec, qparams, toks)
    denom = np.abs(fp).max()
    assert np.abs(q4 - fp).max() / denom < 0.25
    agree = (fp.argmax(-1) == q4.argmax(-1)).mean()
    assert agree >= 0.5, agree


def test_int4_grouping_roundtrip():
    """quantize_int4_weights: nibble-packed, [-8, 7] values, per-group scales."""
    w = jnp.asarray(np.random.default_rng(1).normal(size=(256, 32)), jnp.float32)
    d = gpt2_mod.quantize_int4_weights(w, group=128)
    assert d["q4"].shape == (2, 64, 32) and d["q4"].dtype == jnp.uint8
    assert d["s"].shape == (2, 1, 32)
    lo, hi = gpt2_mod._unpack_nibbles(d["q4"])
    q = np.empty((2, 128, 32), np.int8)
    q[:, 0::2], q[:, 1::2] = np.asarray(lo), np.asarray(hi)
    assert q.min() >= -8 and q.max() <= 7
    recon = (q.astype(np.float32) * np.asarray(d["s"])).reshape(256, 32)
    err = np.abs(recon - np.asarray(w)).max()
    # max error bounded by half a quantization step per group
    step = np.asarray(d["s"]).max()
    assert err <= 0.5001 * step


def test_engine_weight_quant_int4_generates_and_skips_megakernel():
    eng = InferenceEngine.from_model_name(
        "gpt2-tiny",
        config=Config(
            model_name="t", device="cpu", dtype=jnp.float32,
            weight_quant="int4", megakernel=True,
        ),
    )
    text, n = eng.generate_with_cache("Hello world.", max_new_tokens=4)
    assert n == 4 and isinstance(text, str)
    # gpt2-tiny (E=64): int4 halves pairing would split the scale group,
    # so the engine must fall back to XLA (E >= 256 takes the kernel)
    assert eng._mega_spec(48, None) is None


def test_llama_int4_megakernel_gating():
    """Grouped-int4 Llama weights are packable into the megakernel's
    biased-nibble tile stream (round 2: in-kernel int4 tiles)."""
    from efficient_llm_inference_tpu.ops.pallas.megakernel_llama import (
        mega_supported as llama_mega_supported,
        pack_llama_mega,
    )

    cfg = llama_mod.LlamaConfig(
        vocab_size=300, hidden_size=256, intermediate_size=512, n_layer=2,
        n_head=4, n_kv_head=2, tie_embeddings=True,
    )
    params = llama_mod.init_llama_params(jax.random.PRNGKey(2), cfg, jnp.float32)
    q4 = llama_mod.quantize_llama_weights(params, mode="int4")
    assert llama_mega_supported(cfg, 48, q4)
    packed = pack_llama_mega(q4, cfg)
    assert packed is not None and packed["wstack"].dtype == jnp.int8
    # per-tile scale panes ride along the weight stream, one per tile
    assert packed["w4scale"].shape[0] == packed["wstack"].shape[0]


def test_host_quantized_init_matches_device_path():
    """init_quantized_llama_params == init-then-quantize (same PRNG stream)."""
    cfg = llama_mod.LlamaConfig.tiny()
    key = jax.random.PRNGKey(5)
    a = llama_mod.init_quantized_llama_params(key, cfg, mode="int8",
                                              dtype=jnp.float32)
    b = llama_mod.quantize_llama_weights(
        llama_mod.init_llama_params(key, cfg, jnp.float32), mode="int8"
    )
    fa, _ = jax.tree_util.tree_flatten(a)
    fb, _ = jax.tree_util.tree_flatten(b)
    assert len(fa) == len(fb)
    for x, y in zip(fa, fb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_param_bytes_estimate():
    cfg = llama_mod.LlamaConfig.llama3_8b()
    est = llama_mod.param_bytes_estimate(cfg)  # ~16 GiB bf16
    assert 14 * 1024**3 < est < 18 * 1024**3
    tiny = llama_mod.param_bytes_estimate(llama_mod.LlamaConfig.tiny())
    assert tiny < 1024**2


def test_int4w8_tile_dot_fast_path_matches_dense():
    """_int4_tile_dot with ONE group per half-tile (n_gh == 1, the int4w8
    fast path) == dense dequantized matmul, to fp32 tolerance."""
    from efficient_llm_inference_tpu.ops.pallas.megakernel_llama import (
        _int4_tile_dot,
        _pack_halves,
    )

    rng = np.random.default_rng(7)
    TR, TC = 32, 16
    q = rng.integers(-8, 8, size=(1, TR, TC)).astype(np.int8)
    s_lo = rng.uniform(0.01, 0.1, size=TC).astype(np.float32)
    s_hi = rng.uniform(0.01, 0.1, size=TC).astype(np.float32)
    x = rng.normal(size=(3, TR)).astype(np.float32)

    w_deq = q[0].astype(np.float32) * np.concatenate(
        [np.tile(s_lo, (TR // 2, 1)), np.tile(s_hi, (TR // 2, 1))]
    )
    expected = x @ w_deq

    pk = _pack_halves(jnp.asarray(q), TR)[0]
    st = jnp.stack([jnp.asarray(s_lo), jnp.asarray(s_hi) / 16.0])
    gsel = jnp.ones((TR // 2, 1), jnp.float32)
    got = _int4_tile_dot(
        jnp.asarray(x), pk, st, gsel, TR, TR // 2, 1, jnp.float32
    )
    np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-5,
                               atol=1e-4)


def test_engine_weight_quant_int4w8_half_tile_groups():
    """weight_quant='int4w8' quantizes with G = TR/2 (one scale per
    half-tile), stays megakernel-packable, and generates."""
    from efficient_llm_inference_tpu.ops.pallas.megakernel_llama import (
        _q4_group,
        _tile_geometry,
    )

    cfg = llama_mod.LlamaConfig(
        vocab_size=300, hidden_size=256, intermediate_size=512, n_layer=2,
        n_head=4, n_kv_head=2, tie_embeddings=True,
    )
    params = llama_mod.init_llama_params(jax.random.PRNGKey(2), cfg,
                                         jnp.float32)
    spec = llama_mod.llama_spec(cfg)
    TR = _tile_geometry(cfg)[0]
    q = llama_mod.quantize_llama_weights(params, mode="int4", group=TR // 2)
    assert _q4_group(q["blocks"]["wq"]) == TR // 2

    eng2 = InferenceEngine(
        spec, q,
        config=Config(model_name="t", device="cpu", dtype=jnp.float32),
    )
    ref = InferenceEngine(
        spec, params,
        config=Config(model_name="t", device="cpu", dtype=jnp.float32),
    )
    prompt = "the tides turn at dawn"
    out_q = eng2.generate(prompt, "full_cache", 4)
    assert isinstance(out_q, str) and len(out_q) > len(prompt) - 1
    # logits stay close to fp (coarser groups than int4-128 but bounded)
    spec_ = spec
    toks = jnp.asarray(
        np.random.default_rng(0).integers(0, cfg.vocab_size, (1, 16)),
        jnp.int32,
    )
    fp = _logits(spec_, params, toks)
    q4 = _logits(spec_, q, toks)
    assert np.abs(q4 - fp).max() / np.abs(fp).max() < 0.35


def test_engine_int4w8_from_model_name_routes_group():
    """from_model_name with weight_quant='int4w8' quantizes at G = TR/2 and
    the engine still generates (gpt2 family: uniform [E, E] tiles)."""
    from efficient_llm_inference_tpu.ops.pallas.megakernel_llama import (
        _q4_group,
    )

    eng = InferenceEngine.from_model_name(
        "gpt2-tiny",
        config=Config(model_name="t", device="cpu", dtype=jnp.float32,
                      weight_quant="int4w8"),
    )
    E = eng.model.config.n_embd
    assert _q4_group(eng.params["blocks"]["fc_w"]) == E // 2
    text, n = eng.generate_with_cache("Hello world.", max_new_tokens=3)
    assert n == 3 and isinstance(text, str)


def test_int4w8_padded_ffn_spec_routing_and_kernel():
    """int4w8 on a geometry whose FFN width the half-tile group does not
    divide: the serving spec pads intermediate_size to the tile
    geometry's Ip (zeros exact through SwiGLU), groups come out uniform
    at TR/2, the megakernel packs on the n_gh==1 fast path, and decode
    is token-exact vs the XLA path on the padded model."""
    from efficient_llm_inference_tpu.engine.engine import _int4w8_llama_spec
    from efficient_llm_inference_tpu.ops.pallas.megakernel_llama import (
        _q4_group,
        _tile_geometry,
        mega_supported,
        pack_llama_mega,
    )

    cfg = llama_mod.LlamaConfig(
        vocab_size=300, hidden_size=512, intermediate_size=1408, n_layer=2,
        n_head=4, n_kv_head=1, tie_embeddings=True,
    )
    spec = llama_mod.llama_spec(cfg)
    TR, TC, Ip = _tile_geometry(cfg)
    assert (TR, Ip) == (512, 1536) and cfg.intermediate_size % (TR // 2)
    spec2, g = _int4w8_llama_spec(spec, allow_pad=True)
    assert g == TR // 2 and spec2.config.intermediate_size == Ip

    params = llama_mod.init_llama_params(
        jax.random.PRNGKey(4), spec2.config, jnp.float32
    )
    q = llama_mod.quantize_llama_weights(params, mode="int4", group=g)
    assert _q4_group(q["blocks"]["w_gate"]) == g
    packed = pack_llama_mega(q, spec2.config)
    assert packed is not None
    assert packed["w4scale"].shape[1] == 2  # n_gh == 1 fast path
    assert "s4g" not in packed
    assert mega_supported(spec2.config, 48, q)

    prompt = "the tides turn at dawn"
    outs = {}
    for mega in (False, True):
        eng = InferenceEngine(
            spec2, q,
            config=Config(model_name="t", device="cpu", dtype=jnp.float32,
                          megakernel=mega, weight_quant="int4"),
        )
        outs[mega] = eng.generate_ids(prompt, "full_cache", max_new_tokens=8)
        if mega:
            assert eng._mega_packed is not None
    assert outs[True] == outs[False]


def test_pad_llama_ffn_exact_and_engine_pads_provided_params():
    """pad_llama_ffn is logit-exact (zeros through SwiGLU), and
    from_model_name(..., params=fp_checkpoint) pads provided
    full-precision params alongside the int4w8 spec."""
    from efficient_llm_inference_tpu.engine.engine import _int4w8_llama_spec

    cfg = llama_mod.LlamaConfig(
        vocab_size=300, hidden_size=512, intermediate_size=1408, n_layer=2,
        n_head=4, n_kv_head=1, tie_embeddings=True,
    )
    params = llama_mod.init_llama_params(jax.random.PRNGKey(6), cfg,
                                         jnp.float32)
    spec = llama_mod.llama_spec(cfg)
    spec2, g = _int4w8_llama_spec(spec, allow_pad=True)
    cfg2 = spec2.config
    assert cfg2.intermediate_size == 1536
    padded = llama_mod.pad_llama_ffn(params, 1536)
    assert padded["blocks"]["w_gate"].shape[-1] == 1536

    from efficient_llm_inference_tpu.cache.kvcache import DenseKV

    toks = jnp.asarray(
        np.random.default_rng(1).integers(0, 300, (1, 12)), jnp.int32
    )
    pos = jnp.arange(12, dtype=jnp.int32)[None]

    def logits(c, p):
        strat = DenseKV(n_layer=c.n_layer, n_head=c.n_kv_head,
                        head_dim=c.head_dim, capacity=16, batch=1,
                        dtype=jnp.float32)
        lg, _ = llama_mod.llama_forward(p, c, toks, pos, strat.init(), strat)
        return np.asarray(lg)

    np.testing.assert_array_equal(logits(cfg, params), logits(cfg2, padded))
