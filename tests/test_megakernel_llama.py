"""Llama whole-step decode megakernel (ops/pallas/megakernel_llama.py).

Runs the kernel in Pallas interpret mode on CPU (fp32): one step must
reproduce the XLA step's token and cache writeback, and a forced-megakernel
engine must be token-exact against the default engine end-to-end — for both
full-precision and int8-quantized weights.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from efficient_llm_inference_tpu.cache.kvcache import DenseKV
from efficient_llm_inference_tpu.core.config import Config
from efficient_llm_inference_tpu.engine.engine import InferenceEngine
from efficient_llm_inference_tpu.models import llama as llama_mod
from efficient_llm_inference_tpu.models.llama import (
    LlamaConfig,
    llama_spec,
    rope_cos_sin,
)
from efficient_llm_inference_tpu.ops.pallas.megakernel_llama import (
    llama_megastep,
    mega_supported,
    pack_llama_mega,
    to_mega_layout,
)

# TR = 256, TC = 128, KW = 128 — 128-lane aligned so the engine-side
# eligibility check accepts it; vocab 300 exercises LM-tile padding.
CFG = LlamaConfig(
    vocab_size=300,
    hidden_size=256,
    intermediate_size=512,
    n_layer=2,
    n_head=4,
    n_kv_head=2,
    n_positions=512,
    rope_theta=10000.0,
    tie_embeddings=True,
)


@pytest.fixture(scope="module")
def params():
    return llama_mod.init_llama_params(jax.random.PRNGKey(0), CFG, jnp.float32)


def test_llama_megastep_matches_xla_step(params):
    packed = pack_llama_mega(params, CFG)
    assert packed is not None
    C = 48
    strat = DenseKV(
        n_layer=CFG.n_layer, n_head=CFG.n_kv_head, head_dim=CFG.head_dim,
        capacity=C, batch=1, dtype=jnp.float32,
    )
    T0 = 7
    toks = jnp.array([[3, 5, 250, 9, 1, 42, 7]], jnp.int32)
    pos = jnp.arange(T0, dtype=jnp.int32)[None]
    cache = strat.init()
    logits, cache = llama_mod.llama_forward(params, CFG, toks, pos, cache, strat)
    cache = strat.set_length(cache, T0)

    tok0 = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
    pos1 = jnp.full((1, 1), T0, jnp.int32)
    logits1, cache1 = llama_mod.llama_forward(
        params, CFG, tok0[:, None], pos1, cache, strat
    )
    tok_xla = int(jnp.argmax(logits1[0, 0]))

    x_emb = params["embed"][tok0]
    cos, sin = rope_cos_sin(pos1, CFG.head_dim, CFG.rope_theta)  # [1, 1, D]
    cos_q = jnp.tile(cos[0], (1, CFG.n_head))
    sin_q = jnp.tile(sin[0], (1, CFG.n_head))
    tok_mega, k2, v2 = llama_megastep(
        packed, to_mega_layout(cache["k"]), to_mega_layout(cache["v"]),
        jnp.int32(T0), x_emb, cos_q, sin_q, cfg=CFG, capacity=C,
        interpret=True,
    )
    assert int(tok_mega) == tok_xla

    k_ref = to_mega_layout(cache1["k"])
    v_ref = to_mega_layout(cache1["v"])
    np.testing.assert_allclose(
        np.asarray(k2[:, T0]), np.asarray(k_ref[:, T0]), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(v2[:, T0]), np.asarray(v_ref[:, T0]), atol=1e-5
    )
    # prior rows untouched by the read-modify-write group
    np.testing.assert_array_equal(
        np.asarray(k2[:, :T0]), np.asarray(k_ref[:, :T0])
    )


def test_engine_llama_megakernel_token_exact(params):
    """Forced-megakernel engine == default engine, end to end (greedy)."""
    spec = llama_spec(CFG)
    prompt = "the quick brown fox jumps over the lazy dog"
    outs = {}
    for mega in (False, True):
        eng = InferenceEngine(
            spec, params,
            config=Config(dtype=jnp.float32, megakernel=mega, device="cpu"),
        )
        outs[mega] = eng.generate_ids(prompt, "full_cache", max_new_tokens=9)
        if mega:
            assert eng._mega_packed is not None
    assert outs[True] == outs[False]


def test_engine_llama_megakernel_int8_weights_token_exact(params):
    """int8-weight Llama megakernel == int8 XLA path."""
    spec = llama_spec(CFG)
    qparams = llama_mod.quantize_llama_weights(params)
    assert pack_llama_mega(qparams, CFG) is not None
    assert mega_supported(CFG, 48, qparams)
    prompt = "the quick brown fox jumps over the lazy dog"
    outs = {}
    for mega in (False, True):
        eng = InferenceEngine(
            spec, qparams,
            config=Config(dtype=jnp.float32, megakernel=mega, device="cpu",
                          weight_quant="int8"),
        )
        outs[mega] = eng.generate_ids(prompt, "full_cache", max_new_tokens=9)
    assert outs[True] == outs[False]


def test_llama_megastep_int4_matches_xla_step(params):
    """Grouped-int4 tile stream: one megakernel step vs the XLA int4 path.

    Not bit-exact (the kernel's halves-paired nibble dot reassociates the
    f32 contraction vs models/gpt2.py:_int4_dot) — token must match and
    cache rows agree to f32 reassociation tolerance.
    """
    qparams = llama_mod.quantize_llama_weights(params, "int4")
    packed = pack_llama_mega(qparams, CFG)
    assert packed is not None
    assert packed["wstack"].dtype == jnp.int8
    C = 48
    strat = DenseKV(
        n_layer=CFG.n_layer, n_head=CFG.n_kv_head, head_dim=CFG.head_dim,
        capacity=C, batch=1, dtype=jnp.float32,
    )
    T0 = 7
    toks = jnp.array([[3, 5, 250, 9, 1, 42, 7]], jnp.int32)
    pos = jnp.arange(T0, dtype=jnp.int32)[None]
    cache = strat.init()
    logits, cache = llama_mod.llama_forward(
        qparams, CFG, toks, pos, cache, strat
    )
    cache = strat.set_length(cache, T0)

    tok0 = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
    pos1 = jnp.full((1, 1), T0, jnp.int32)
    logits1, cache1 = llama_mod.llama_forward(
        qparams, CFG, tok0[:, None], pos1, cache, strat
    )
    tok_xla = int(jnp.argmax(logits1[0, 0]))

    x_emb = qparams["embed"][tok0]
    cos, sin = rope_cos_sin(pos1, CFG.head_dim, CFG.rope_theta)
    cos_q = jnp.tile(cos[0], (1, CFG.n_head))
    sin_q = jnp.tile(sin[0], (1, CFG.n_head))
    tok_mega, k2, v2 = llama_megastep(
        packed, to_mega_layout(cache["k"]), to_mega_layout(cache["v"]),
        jnp.int32(T0), x_emb, cos_q, sin_q, cfg=CFG, capacity=C,
        interpret=True,
    )
    assert int(tok_mega) == tok_xla

    k_ref = to_mega_layout(cache1["k"])
    v_ref = to_mega_layout(cache1["v"])
    np.testing.assert_allclose(
        np.asarray(k2[:, T0]), np.asarray(k_ref[:, T0]), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(v2[:, T0]), np.asarray(v_ref[:, T0]), atol=1e-5
    )
    np.testing.assert_array_equal(
        np.asarray(k2[:, :T0]), np.asarray(k_ref[:, :T0])
    )


def test_engine_llama_megakernel_int4_weights_token_exact(params):
    """int4-weight Llama megakernel == int4 XLA path, end to end (greedy).

    Deterministic fixture: the two paths differ only by f32 reassociation,
    which does not flip any greedy argmax on this model/prompt.
    """
    spec = llama_spec(CFG)
    qparams = llama_mod.quantize_llama_weights(params, "int4")
    assert mega_supported(CFG, 48, qparams)
    prompt = "the quick brown fox jumps over the lazy dog"
    outs = {}
    for mega in (False, True):
        eng = InferenceEngine(
            spec, qparams,
            config=Config(dtype=jnp.float32, megakernel=mega, device="cpu",
                          weight_quant="int4"),
        )
        outs[mega] = eng.generate_ids(prompt, "full_cache", max_new_tokens=9)
        if mega:
            assert eng._mega_packed is not None
    assert outs[True] == outs[False]


def test_int4_scale_ring_mode_matches(params, monkeypatch):
    """Forced scale-pane DMA ring (the big-model path) == VMEM-table mode.

    Small configs always pick the VMEM-resident scale table; Llama-3-8B's
    117 MB table takes the per-tile ring — keep that path exercised.
    """
    import efficient_llm_inference_tpu.ops.pallas.megakernel_llama as mk

    qparams = llama_mod.quantize_llama_weights(params, "int4")
    packed = pack_llama_mega(qparams, CFG)
    strat = DenseKV(
        n_layer=CFG.n_layer, n_head=CFG.n_kv_head, head_dim=CFG.head_dim,
        capacity=56, batch=1, dtype=jnp.float32,
    )
    T0 = 5
    toks = jnp.array([[3, 5, 250, 9, 1]], jnp.int32)
    pos = jnp.arange(T0, dtype=jnp.int32)[None]
    cache = strat.init()
    logits, cache = llama_mod.llama_forward(
        qparams, CFG, toks, pos, cache, strat
    )
    cache = strat.set_length(cache, T0)
    tok0 = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
    pos1 = jnp.full((1, 1), T0, jnp.int32)
    x_emb = qparams["embed"][tok0]
    cos, sin = rope_cos_sin(pos1, CFG.head_dim, CFG.rope_theta)
    cos_q = jnp.tile(cos[0], (1, CFG.n_head))
    sin_q = jnp.tile(sin[0], (1, CFG.n_head))

    def step(capacity):
        cache56 = to_mega_layout(cache["k"]), to_mega_layout(cache["v"])
        return llama_megastep(
            packed, cache56[0][:, :capacity], cache56[1][:, :capacity],
            jnp.int32(T0), x_emb, cos_q, sin_q, cfg=CFG, capacity=capacity,
            interpret=True,
        )

    tok_vmem, k_a, v_a = step(56)
    monkeypatch.setattr(mk, "_S4_RING_ONLY", True)
    # different static capacity -> fresh trace under the forced ring
    tok_ring, k_b, v_b = step(48)
    assert int(tok_vmem) == int(tok_ring)
    np.testing.assert_array_equal(np.asarray(k_a[:, :48]), np.asarray(k_b))
    np.testing.assert_array_equal(np.asarray(v_a[:, :48]), np.asarray(v_b))


def test_int4_host_pack_matches_device_pack(params):
    """The host (numpy) packer for big streams must produce the same tile
    stream as the device packer (Llama-3-8B packs host-side to avoid the
    transient unpacked grid OOMing next to the resident params)."""
    from efficient_llm_inference_tpu.ops.pallas.megakernel_llama import (
        _layer_tile_plan,
        _pack_llama_mega_int4_host,
        _q4_group,
        _tile_geometry,
    )

    qparams = llama_mod.quantize_llama_weights(params, "int4")
    dev = pack_llama_mega(qparams, CFG)
    TR, TC, Ip = _tile_geometry(CFG)
    host = _pack_llama_mega_int4_host(
        qparams, CFG, TR, TC, Ip, _layer_tile_plan(CFG, TR, TC, Ip),
        _q4_group(qparams["blocks"]["wq"]),
    )
    for key in dev:
        np.testing.assert_array_equal(
            np.asarray(dev[key]), np.asarray(host[key]), err_msg=key
        )


def test_llama_mega_gating(params):
    # capacity must be a multiple of 8 (aligned RMW group)
    assert not mega_supported(CFG, 47, params)
    assert mega_supported(CFG, 48, params)
    # KV lane width below 128 is rejected (Hkv * D = 64)
    narrow = LlamaConfig(
        vocab_size=300, hidden_size=256, intermediate_size=512, n_layer=2,
        n_head=4, n_kv_head=1, tie_embeddings=True,
    )
    nparams = llama_mod.init_llama_params(
        jax.random.PRNGKey(1), narrow, jnp.float32
    )
    assert not mega_supported(narrow, 48, nparams)
    # real geometries are eligible (VMEM fit at serving capacities);
    # bf16 3B is gated by the packed-duplicate HBM bound (6.4 GiB tile
    # stream + originals won't share a 16 GiB chip), int8 3B is in
    names = ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down")

    def fake(int8):
        blocks = {
            n: ({"q": jnp.zeros((1,), jnp.int8), "s": 1.0} if int8 else None)
            for n in names
        }
        p = {"embed": jnp.zeros((1,), jnp.bfloat16), "blocks": blocks}
        if int8:
            p["lm_q"] = 1.0
        return p

    assert mega_supported(LlamaConfig.llama3_1b(), 1024, fake(False))
    assert mega_supported(LlamaConfig.llama3_3b(), 512, fake(True))
    assert not mega_supported(LlamaConfig.llama3_3b(), 512, fake(False))
    # 8B int8: the 7 GiB packed stream next to 8.6 GiB of params is gated
    assert not mega_supported(LlamaConfig.llama3_8b(), 320, fake(True))

    # int4: the ~3.9 GiB stream + ~4.2 GiB originals DO share a 16 GiB
    # chip, so 8B int4 takes the kernel path (the capacity play)
    def fake4():
        # group 128 -> q4 panes are [.., Kg, 64, F]
        blocks = {
            n: {"q4": jnp.zeros((1, 1, 64, 1), jnp.uint8), "s": 1.0}
            for n in names
        }
        return {
            "embed": jnp.zeros((1,), jnp.bfloat16),
            "blocks": blocks,
            "lm_q4": jnp.zeros((1, 64, 1), jnp.uint8),
        }

    assert mega_supported(LlamaConfig.llama3_8b(), 320, fake4())
    assert mega_supported(LlamaConfig.llama3_1b(), 1024, fake4())


# FFN width 2944 is not a multiple of E=256: the packed stream pads it to
# 3072 (4.3%), growing the tile 128x128 -> 256x128 (Qwen2.5-geometry path).
PCFG = LlamaConfig(
    vocab_size=300, hidden_size=256, intermediate_size=2944, n_layer=2,
    n_head=4, n_kv_head=2, n_positions=512, rope_theta=10000.0,
    tie_embeddings=True, qkv_bias=True, rms_eps=1e-6,
)


def test_padded_ffn_geometry():
    from efficient_llm_inference_tpu.ops.pallas.megakernel_llama import (
        _tile_geometry,
    )

    TR, TC, Ip = _tile_geometry(PCFG)
    assert (TR, TC, Ip) == (256, 128, 3072)
    # real Qwen2.5 geometries adopt padding (previously self-gated to XLA)
    TR, TC, Ip = _tile_geometry(LlamaConfig.qwen25_15b())
    assert (TR, TC, Ip) == (1536, 256, 9216)
    TR, TC, Ip = _tile_geometry(LlamaConfig.qwen25_7b())
    assert (TR, TC, Ip) == (1792, 512, 21504)
    # multiples of E stay unpadded
    TR, TC, Ip = _tile_geometry(LlamaConfig.llama3_1b())
    assert (TR, TC, Ip) == (2048, 512, 8192)


@pytest.mark.parametrize("wq", [None, "int8", "int4"])
def test_engine_padded_ffn_megakernel_token_exact(wq):
    """Padded-FFN tile stream == XLA path, end to end, all weight modes.

    Zero pad is exact through SwiGLU: silu(0)*0 contributes nothing and
    padded w_down rows multiply those zeros.
    """
    pparams = llama_mod.init_llama_params(
        jax.random.PRNGKey(3), PCFG, jnp.float32
    )
    if wq:
        pparams = llama_mod.quantize_llama_weights(pparams, wq)
    assert mega_supported(PCFG, 48, pparams)
    spec = llama_spec(PCFG)
    outs = {}
    for mega in (False, True):
        eng = InferenceEngine(
            spec, pparams,
            config=Config(dtype=jnp.float32, megakernel=mega, device="cpu",
                          weight_quant=wq),
        )
        outs[mega] = eng.generate_ids(
            "padded ffn geometry check", "full_cache", max_new_tokens=8
        )
        if mega:
            assert eng._mega_packed is not None
    assert outs[True] == outs[False]


# TR = 768, G = 128 -> 6 scale groups per tile (3 per half-plane): the
# half-planes are NOT 8-aligned, so the packers must produce the padded
# 16-row scale stack + `s4g` marker. This is the small-scale mirror of
# Qwen2.5-7B's 1792-row tiles (14 groups at G=128), whose unpadded pane
# Mosaic cannot DMA-slice (docs/BENCHMARKS.md "Qwen2.5-7B").
SCFG = LlamaConfig(
    vocab_size=300, hidden_size=768, intermediate_size=1536, n_layer=2,
    n_head=6, n_kv_head=1, n_positions=512, rope_theta=10000.0,
    tie_embeddings=True,
)


@pytest.fixture(scope="module")
def sparams():
    p = llama_mod.init_llama_params(jax.random.PRNGKey(2), SCFG, jnp.float32)
    return llama_mod.quantize_llama_weights(p, "int4")  # G=128, n_gh=3


def test_padded_scale_stack_pack(sparams):
    """Unaligned half-planes pack to 8-aligned rows with the s4g marker,
    identically on the device and host packers."""
    from efficient_llm_inference_tpu.ops.pallas.megakernel_llama import (
        _layer_tile_plan,
        _pack_llama_mega_int4_host,
        _q4_group,
        _s4_geom,
        _tile_geometry,
    )

    TR, TC, Ip = _tile_geometry(SCFG)
    assert (TR, TC) == (768, 128)
    dev = pack_llama_mega(sparams, SCFG)
    assert dev is not None
    assert dev["w4scale"].shape[1] == 16  # 2 halves x 8-aligned rows
    assert dev["s4g"].shape == (3,)
    assert _s4_geom(TR, dev) == (128, 3, 8)
    # padded rows are zero (they contribute nothing through gsel)
    w4 = np.asarray(dev["w4scale"])
    assert (w4[:, 3:8] == 0).all() and (w4[:, 11:16] == 0).all()
    assert (w4[:, :3] != 0).any() and (w4[:, 8:11] != 0).any()
    host = _pack_llama_mega_int4_host(
        sparams, SCFG, TR, TC, Ip, _layer_tile_plan(SCFG, TR, TC, Ip),
        _q4_group(sparams["blocks"]["wq"]),
    )
    assert set(dev) == set(host)
    for key in dev:
        np.testing.assert_array_equal(
            np.asarray(dev[key]), np.asarray(host[key]), err_msg=key
        )


def test_llama_megastep_padded_scales_matches_xla(sparams):
    packed = pack_llama_mega(sparams, SCFG)
    assert mega_supported(SCFG, 48, sparams)
    C = 48
    strat = DenseKV(
        n_layer=SCFG.n_layer, n_head=SCFG.n_kv_head, head_dim=SCFG.head_dim,
        capacity=C, batch=1, dtype=jnp.float32,
    )
    T0 = 7
    toks = jnp.array([[3, 5, 250, 9, 1, 42, 7]], jnp.int32)
    pos = jnp.arange(T0, dtype=jnp.int32)[None]
    cache = strat.init()
    logits, cache = llama_mod.llama_forward(
        sparams, SCFG, toks, pos, cache, strat
    )
    cache = strat.set_length(cache, T0)
    tok0 = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
    pos1 = jnp.full((1, 1), T0, jnp.int32)
    logits1, cache1 = llama_mod.llama_forward(
        sparams, SCFG, tok0[:, None], pos1, cache, strat
    )
    tok_xla = int(jnp.argmax(logits1[0, 0]))
    x_emb = sparams["embed"][tok0]
    cos, sin = rope_cos_sin(pos1, SCFG.head_dim, SCFG.rope_theta)
    cos_q = jnp.tile(cos[0], (1, SCFG.n_head))
    sin_q = jnp.tile(sin[0], (1, SCFG.n_head))
    tok_mega, k2, v2 = llama_megastep(
        packed, to_mega_layout(cache["k"]), to_mega_layout(cache["v"]),
        jnp.int32(T0), x_emb, cos_q, sin_q, cfg=SCFG, capacity=C,
        interpret=True,
    )
    assert int(tok_mega) == tok_xla
    k_ref = to_mega_layout(cache1["k"])
    np.testing.assert_allclose(
        np.asarray(k2[:, T0]), np.asarray(k_ref[:, T0]), atol=1e-5
    )


def test_engine_padded_scales_token_exact(sparams, monkeypatch):
    """Padded-stack engine == XLA int4 path end to end, in both the
    VMEM-resident-table and the forced scale-pane-ring modes, plus the
    quant-KV composition (llama_megastep_quant shares _s4_geom)."""
    import efficient_llm_inference_tpu.ops.pallas.megakernel_llama as mk

    spec = llama_spec(SCFG)
    prompt = "the quick brown fox jumps over the lazy dog"

    def run(mega, method="full_cache"):
        eng = InferenceEngine(
            spec, sparams,
            config=Config(dtype=jnp.float32, megakernel=mega, device="cpu",
                          weight_quant="int4"),
        )
        return eng.generate_ids(prompt, method, max_new_tokens=9)

    want = run(False)
    assert run(True) == want
    monkeypatch.setattr(mk, "_S4_RING_ONLY", True)
    assert run(True) == want
    monkeypatch.setattr(mk, "_S4_RING_ONLY", False)
    assert run(True, "quant_int8") == run(False, "quant_int8")


def test_llama_megastep_multi_chunk_attention(params):
    """capacity > _ATTN_CHUNK (512): the chunked cache walk must agree with
    the XLA step (scores/softmax merge across chunk boundaries)."""
    C = 1024  # 2 chunks of 512
    strat = DenseKV(
        n_layer=CFG.n_layer, n_head=CFG.n_kv_head, head_dim=CFG.head_dim,
        capacity=C, batch=1, dtype=jnp.float32,
    )
    rng = np.random.default_rng(3)
    T0 = 600  # past spans both chunks
    toks = jnp.asarray(rng.integers(0, CFG.vocab_size, (1, T0)), jnp.int32)
    pos = jnp.arange(T0, dtype=jnp.int32)[None]
    cache = strat.init()
    logits, cache = llama_mod.llama_forward(params, CFG, toks, pos, cache, strat)
    cache = strat.set_length(cache, T0)

    tok0 = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
    pos1 = jnp.full((1, 1), T0, jnp.int32)
    logits1, _ = llama_mod.llama_forward(
        params, CFG, tok0[:, None], pos1, cache, strat
    )
    tok_xla = int(jnp.argmax(logits1[0, 0]))

    packed = pack_llama_mega(params, CFG)
    x_emb = params["embed"][tok0]
    cos, sin = rope_cos_sin(pos1, CFG.head_dim, CFG.rope_theta)
    cos_q = jnp.tile(cos[0], (1, CFG.n_head))
    sin_q = jnp.tile(sin[0], (1, CFG.n_head))
    tok_mega, _, _ = llama_megastep(
        packed, to_mega_layout(cache["k"]), to_mega_layout(cache["v"]),
        jnp.int32(T0), x_emb, cos_q, sin_q, cfg=CFG, capacity=C,
        interpret=True,
    )
    assert int(tok_mega) == tok_xla
