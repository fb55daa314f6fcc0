"""Explicit-collective shard_map TP decode (parallel/tp_decode.py).

On the 8-virtual-device CPU mesh: the hand-placed all-gather /
reduce-scatter decode must be token-exact vs the unsharded XLA decode
(psum partial sums reassociate; greedy argmax must not flip on the f32
fixture), and the head-aligned TP relayout must round-trip.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from efficient_llm_inference_tpu.cache.kvcache import DenseKV
from efficient_llm_inference_tpu.engine.generate import make_decode, make_prefill
from efficient_llm_inference_tpu.models import gpt2 as gpt2_mod
from efficient_llm_inference_tpu.models.registry import gpt2_spec
from efficient_llm_inference_tpu.parallel.mesh import make_mesh
from efficient_llm_inference_tpu.parallel.tp_decode import (
    make_tp_decode,
    shard_gpt2_tp,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)

CFG = gpt2_mod.GPT2Config(
    vocab_size=331, n_positions=128, n_embd=64, n_layer=2, n_head=8
)


@pytest.fixture(scope="module")
def setup():
    params = gpt2_mod.init_gpt2_params(jax.random.PRNGKey(6), CFG, jnp.float32)
    return gpt2_spec(CFG), params


def _reference_decode(spec, params, ids, n_new, capacity):
    strategy = DenseKV(
        n_layer=spec.n_layer, n_head=spec.n_head, head_dim=spec.head_dim,
        capacity=capacity,
    )
    prefill = make_prefill(spec, strategy, None)
    decode = make_decode(spec, strategy, None, n_new)
    buf = np.zeros((1, 32), np.int32)
    buf[0, : len(ids)] = ids
    cache, last = prefill(params, jnp.asarray(buf), jnp.int32(len(ids)))
    # snapshot before decode: the decode scan donates the cache buffers
    k_np = np.asarray(cache["k"])
    v_np = np.asarray(cache["v"])
    last_np = np.asarray(last)
    toks, _ = decode(params, cache, last)
    return np.asarray(toks)[0].tolist(), k_np, v_np, last_np


@pytest.mark.parametrize("mp", [8, 4])
def test_tp_decode_token_exact(setup, mp):
    spec, params = setup
    mesh = make_mesh((len(jax.devices()) // mp, mp), ("data", "model"))
    ids = np.random.default_rng(0).integers(0, CFG.vocab_size, 20).tolist()
    n_new, C = 12, 48

    want, k_np, v_np, last_np = _reference_decode(spec, params, ids, n_new, C)

    # seed the sharded cache from the unsharded prefill: [L, 1, H, C, D]
    # -> [L, H, C, D], heads sharded over "model"
    from jax.sharding import NamedSharding, PartitionSpec as P

    kv_sh = NamedSharding(mesh, P(None, "model", None, None))
    k0 = jax.device_put(jnp.asarray(k_np[:, 0]), kv_sh)
    v0 = jax.device_put(jnp.asarray(v_np[:, 0]), kv_sh)
    tok0 = jnp.argmax(jnp.asarray(last_np[0])).astype(jnp.int32)

    tp_params = shard_gpt2_tp(params, CFG, mesh, "model")
    decode = make_tp_decode(CFG, mesh, n_new, C, "model")
    toks, k2, v2, length = decode(
        tp_params, k0, v0, jnp.int32(len(ids)), tok0
    )
    assert np.asarray(toks).tolist() == want
    assert int(length) == len(ids) + n_new

    # prefill region of the sharded cache untouched by the decode loop
    np.testing.assert_array_equal(
        np.asarray(k2)[:, :, : len(ids)], k_np[:, 0, :, : len(ids)]
    )
    np.testing.assert_array_equal(
        np.asarray(v2)[:, :, : len(ids)], v_np[:, 0, :, : len(ids)]
    )


def test_tp_relayout_roundtrip(setup):
    """Head-aligned attn relayout preserves every weight."""
    spec, params = setup
    mesh = make_mesh((1, 8), ("data", "model"))
    tp = shard_gpt2_tp(params, CFG, mesh, "model")
    L, E, H, D = CFG.n_layer, CFG.n_embd, CFG.n_head, CFG.head_dim
    back = (
        np.asarray(tp["attn_w"]).reshape(L, E, H, 3, D)
        .transpose(0, 1, 3, 2, 4).reshape(L, E, 3 * E)
    )
    np.testing.assert_array_equal(
        back, np.asarray(params["blocks"]["attn_w"])
    )
    np.testing.assert_array_equal(
        np.asarray(tp["wte_tp"])[: CFG.vocab_size], np.asarray(params["wte"])
    )


# ---------------------------------------------------------------------------
# Llama/GQA explicit-TP decode, fp and int8-pane caches (round 4).
# ---------------------------------------------------------------------------

from efficient_llm_inference_tpu.cache.kvcache import QuantizedKV  # noqa: E402
from efficient_llm_inference_tpu.models import llama as llama_mod  # noqa: E402
from efficient_llm_inference_tpu.parallel.tp_decode import (  # noqa: E402
    make_llama_tp_decode,
    shard_llama_tp,
)

LCFG = llama_mod.LlamaConfig(
    vocab_size=331, n_positions=128, hidden_size=64, intermediate_size=128,
    n_layer=2, n_head=8, n_kv_head=4, rope_theta=10000.0,
    tie_embeddings=True,
)


@pytest.fixture(scope="module")
def lsetup():
    params = llama_mod.init_llama_params(
        jax.random.PRNGKey(7), LCFG, jnp.float32
    )
    return llama_mod.llama_spec(LCFG), params


def _llama_reference_decode(spec, params, ids, n_new, capacity, quant):
    if quant:
        strategy = QuantizedKV(
            n_layer=spec.n_layer, n_head=spec.n_kv_head,
            head_dim=spec.head_dim, capacity=capacity, mode="int8",
            granularity="per_head",
        )
    else:
        strategy = DenseKV(
            n_layer=spec.n_layer, n_head=spec.n_kv_head,
            head_dim=spec.head_dim, capacity=capacity,
        )
    prefill = make_prefill(spec, strategy, None)
    decode = make_decode(spec, strategy, None, n_new)
    buf = np.zeros((1, 32), np.int32)
    buf[0, : len(ids)] = ids
    cache, last = prefill(params, jnp.asarray(buf), jnp.int32(len(ids)))
    snap = {k_: np.asarray(v_) for k_, v_ in cache.items()}
    last_np = np.asarray(last)
    toks, _ = decode(params, cache, last)
    return np.asarray(toks)[0].tolist(), snap, last_np


@pytest.mark.parametrize("mp", [4, 2])
def test_llama_tp_decode_token_exact(lsetup, mp):
    """Head-sharded GQA TP decode (fp cache) == unsharded XLA decode."""
    spec, params = lsetup
    mesh = make_mesh((len(jax.devices()) // mp, mp), ("data", "model"))
    ids = np.random.default_rng(1).integers(0, LCFG.vocab_size, 20).tolist()
    n_new, C = 12, 48

    want, snap, last_np = _llama_reference_decode(
        spec, params, ids, n_new, C, quant=False
    )
    from jax.sharding import NamedSharding, PartitionSpec as P

    kv_sh = NamedSharding(mesh, P(None, "model", None, None))
    k0 = jax.device_put(jnp.asarray(snap["k"][:, 0]), kv_sh)
    v0 = jax.device_put(jnp.asarray(snap["v"][:, 0]), kv_sh)
    tok0 = jnp.argmax(jnp.asarray(last_np[0])).astype(jnp.int32)

    tp_params = shard_llama_tp(params, LCFG, mesh, "model")
    decode = make_llama_tp_decode(LCFG, mesh, n_new, C, "model")
    toks, k2, v2, length = decode(
        tp_params, k0, v0, jnp.int32(len(ids)), tok0
    )
    assert np.asarray(toks).tolist() == want
    assert int(length) == len(ids) + n_new
    np.testing.assert_array_equal(
        np.asarray(k2)[:, :, : len(ids)], snap["k"][:, 0, :, : len(ids)]
    )


@pytest.mark.parametrize("mp", [4, 2])
def test_llama_tp_decode_int8_panes_token_exact(lsetup, mp):
    """TP x quantized KV: head-sharded int8 panes + per-(head, token)
    scales == unsharded QuantizedKV(granularity='per_head') decode,
    token-exact — the two north-star axes composed."""
    spec, params = lsetup
    mesh = make_mesh((len(jax.devices()) // mp, mp), ("data", "model"))
    ids = np.random.default_rng(2).integers(0, LCFG.vocab_size, 20).tolist()
    n_new, C = 12, 48

    want, snap, last_np = _llama_reference_decode(
        spec, params, ids, n_new, C, quant=True
    )
    from jax.sharding import NamedSharding, PartitionSpec as P

    kv_sh = NamedSharding(mesh, P(None, "model", None, None))
    sc_sh = NamedSharding(mesh, P(None, "model", None))
    k0 = jax.device_put(jnp.asarray(snap["k"][:, 0]), kv_sh)
    v0 = jax.device_put(jnp.asarray(snap["v"][:, 0]), kv_sh)
    ks0 = jax.device_put(jnp.asarray(snap["k_scale"]), sc_sh)
    vs0 = jax.device_put(jnp.asarray(snap["v_scale"]), sc_sh)
    tok0 = jnp.argmax(jnp.asarray(last_np[0])).astype(jnp.int32)

    tp_params = shard_llama_tp(params, LCFG, mesh, "model")
    decode = make_llama_tp_decode(LCFG, mesh, n_new, C, "model",
                                  kv_mode="int8")
    toks, k2, v2, ks2, vs2, length = decode(
        tp_params, k0, v0, ks0, vs0, jnp.int32(len(ids)), tok0
    )
    assert np.asarray(toks).tolist() == want
    assert int(length) == len(ids) + n_new
    # int8 stores + scales of the prompt region untouched, decode region
    # filled with the same quantized values the unsharded path would write
    assert np.asarray(k2).dtype == np.int8
    np.testing.assert_array_equal(
        np.asarray(k2)[:, :, : len(ids)], snap["k"][:, 0, :, : len(ids)]
    )


def test_llama_tp_relayout_roundtrip(lsetup):
    spec, params = lsetup
    mesh = make_mesh((2, 4), ("data", "model"))
    tp = shard_llama_tp(params, LCFG, mesh, "model")
    np.testing.assert_array_equal(
        np.asarray(tp["wq"]), np.asarray(params["blocks"]["wq"])
    )
    np.testing.assert_array_equal(
        np.asarray(tp["embed_tp"])[: LCFG.vocab_size],
        np.asarray(params["embed"]),
    )


def test_tp_generate_end_to_end(lsetup):
    """Public tp_generate (prefill -> reshard -> shard_map decode) matches
    the unsharded decode for both families, incl. int8 panes."""
    from efficient_llm_inference_tpu.parallel.tp_decode import tp_generate

    spec, params = lsetup
    mesh = make_mesh((2, 4), ("data", "model"))
    ids = np.random.default_rng(3).integers(0, LCFG.vocab_size, 18).tolist()
    n_new = 10

    want, _, _ = _llama_reference_decode(spec, params, ids, n_new, 48,
                                         quant=False)
    got = tp_generate(spec, params, mesh, ids, n_new)
    assert got == want

    want_q, _, _ = _llama_reference_decode(spec, params, ids, n_new, 48,
                                           quant=True)
    got_q = tp_generate(spec, params, mesh, ids, n_new, kv_mode="int8")
    assert got_q == want_q

    # gpt2 family through the same entry
    gspec = gpt2_spec(CFG)
    gparams = gpt2_mod.init_gpt2_params(jax.random.PRNGKey(6), CFG,
                                        jnp.float32)
    gwant, _, _, _ = _reference_decode(gspec, gparams, ids, n_new, 48)
    ggot = tp_generate(gspec, gparams, mesh, ids, n_new)
    assert ggot == gwant


# ---------------------------------------------------------------------------
# Round 5: quant panes across both families and all modes via tp_generate.
# ---------------------------------------------------------------------------


def _oracle_decode(spec, params, ids, n_new, capacity, mode=None):
    """Unsharded XLA greedy decode with the matching cache strategy."""
    if mode:
        strategy = QuantizedKV(
            n_layer=spec.n_layer, n_head=spec.n_kv_head,
            head_dim=spec.head_dim, capacity=capacity, mode=mode,
            granularity="per_head", fused=False,
        )
    else:
        strategy = DenseKV(
            n_layer=spec.n_layer, n_head=spec.n_kv_head,
            head_dim=spec.head_dim, capacity=capacity,
        )
    prefill = make_prefill(spec, strategy, None)
    decode = make_decode(spec, strategy, None, n_new)
    buf = np.zeros((1, 32), np.int32)
    buf[0, : len(ids)] = ids
    cache, last = prefill(params, jnp.asarray(buf), jnp.int32(len(ids)))
    toks, _ = decode(params, cache, last)
    return np.asarray(toks)[0].tolist()


@pytest.mark.parametrize("kv_mode", ["int4", "mixed"])
def test_llama_tp_generate_int4_mixed_panes(lsetup, kv_mode):
    """TP x packed-int4 / mixed KV panes == unsharded per-head QuantizedKV
    (scales shard over heads exactly like int8 — round-5 extension)."""
    from efficient_llm_inference_tpu.parallel.tp_decode import tp_generate

    spec, params = lsetup
    mesh = make_mesh((2, 4), ("data", "model"))
    ids = np.random.default_rng(4).integers(0, LCFG.vocab_size, 17).tolist()
    n_new = 10
    want = _oracle_decode(spec, params, ids, n_new, 40, mode=kv_mode)
    got = tp_generate(spec, params, mesh, ids, n_new, kv_mode=kv_mode)
    assert got == want


@pytest.mark.parametrize("kv_mode", ["int8", "int4", "mixed"])
def test_gpt2_tp_generate_quant_panes(setup, kv_mode):
    """GPT-2 (MHA) TP decode with quantized per-head panes — the same
    scheme as the Llama path (Hkv == Hq), all three modes."""
    from efficient_llm_inference_tpu.parallel.tp_decode import tp_generate

    spec, params = setup
    mesh = make_mesh((2, 4), ("data", "model"))
    ids = np.random.default_rng(5).integers(0, CFG.vocab_size, 19).tolist()
    n_new = 9
    want = _oracle_decode(spec, params, ids, n_new, 40, mode=kv_mode)
    got = tp_generate(spec, params, mesh, ids, n_new, kv_mode=kv_mode)
    assert got == want


def test_engine_tp_routing(setup, lsetup):
    """Config.tp routes benchmark_method / generate_ids through the
    explicit-TP decode — token-exact vs the tp=0 engine, incl. quant
    modes, with the same metric-dict schema."""
    from efficient_llm_inference_tpu.core.config import Config
    from efficient_llm_inference_tpu.engine.engine import InferenceEngine

    for (spec, params) in (setup, lsetup):
        eng0 = InferenceEngine(
            spec, params,
            config=Config(dtype=jnp.float32, megakernel=False, device="cpu"),
        )
        eng4 = InferenceEngine(
            spec, params,
            config=Config(dtype=jnp.float32, megakernel=False, device="cpu",
                          tp=4),
        )
        prompt = "the quick brown fox jumps over"
        for method in ("full_cache", "quant_int8", "quant_mixed"):
            # tp quant uses per_head granularity (TPU-native), the
            # single-device quant_* methods per_token (reference parity):
            # compare against the per_head oracle instead
            want_ids = eng0.generate_ids(prompt, "full_cache",
                                         max_new_tokens=8)
            got_ids = eng4.generate_ids(prompt, method, max_new_tokens=8)
            if method == "full_cache":
                assert got_ids == want_ids
            else:
                mode = method.replace("quant_", "")
                ids = eng0._encode(prompt, method)
                oracle = _oracle_decode(spec, params, ids, 8, 40, mode=mode)
                assert got_ids == list(ids) + oracle
        r = eng4.benchmark_method([prompt], method="quant_int8",
                                  max_new_tokens=8, warmup=False)
        assert r["method"] == "quant_int8"
        assert r["total_new_tokens"] == 8
        assert r["est_kv_cache_mb_avg"] > 0

    # indivisible degree fails loudly
    spec, params = lsetup  # n_kv_head = 4
    eng3 = InferenceEngine(
        spec, params,
        config=Config(dtype=jnp.float32, megakernel=False, device="cpu",
                      tp=3),
    )
    with pytest.raises(ValueError):
        eng3.generate_ids("hello world", "full_cache", max_new_tokens=4)


def test_tp_rejects_weight_quantized_params(setup):
    """Config.tp with weight-quantized params fails loudly (weight-quant
    TP sharding is not implemented; quant KV panes ARE)."""
    from efficient_llm_inference_tpu.core.config import Config
    from efficient_llm_inference_tpu.engine.engine import InferenceEngine

    spec, params = setup
    qparams = gpt2_mod.quantize_gpt2_weights(params)
    eng = InferenceEngine(
        spec, qparams,
        config=Config(dtype=jnp.float32, megakernel=False, device="cpu",
                      tp=4),
    )
    with pytest.raises(ValueError, match="weight-quantized"):
        eng.generate_ids("hello world", "full_cache", max_new_tokens=4)
