"""Continuous batching engine vs single-stream full_cache decode.

The paged pool + batched decode must reproduce the single-stream engine's
greedy tokens for every request (paged attention is numerically the same
masked softmax), and the allocator must recycle blocks across requests.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from efficient_llm_inference_tpu.core.config import Config
from efficient_llm_inference_tpu.engine.batching import (
    ContinuousBatchingEngine,
    PoolConfig,
    Request,
)
from efficient_llm_inference_tpu.engine.engine import InferenceEngine
from efficient_llm_inference_tpu.models import gpt2 as gpt2_mod
from efficient_llm_inference_tpu.models.registry import gpt2_spec


@pytest.fixture(scope="module")
def setup():
    cfg = gpt2_mod.GPT2Config(
        vocab_size=197, n_positions=256, n_embd=32, n_layer=2, n_head=2
    )
    spec = gpt2_spec(cfg)
    params = gpt2_mod.init_gpt2_params(jax.random.PRNGKey(4), cfg, jnp.float32)
    eng = InferenceEngine(
        spec, params, config=Config(model_name="t", device="cpu", dtype=jnp.float32)
    )
    return spec, params, eng


def test_batched_matches_single_stream(setup):
    spec, params, eng = setup
    prompts = [
        "The weather in the mountains changes quickly during spring.",
        "A library is a collection of books and other materials.",
        "Rivers flow from the hills down to the distant sea.",
        "Engineers design bridges to withstand heavy loads.",
    ]
    n_new = 12

    singles = [eng.generate_ids(p, "full_cache", n_new)[-n_new:] for p in prompts]

    cbe = ContinuousBatchingEngine(
        spec,
        params,
        PoolConfig(n_slots=4, block_size=16, n_blocks=32, max_blocks_per_seq=8,
                   prompt_bucket=64),
        dtype=jnp.float32,
    )
    reqs = [
        Request(rid=i, prompt_ids=eng.tokenizer.encode(p), max_new_tokens=n_new)
        for i, p in enumerate(prompts)
    ]
    cbe.run(reqs)

    for i, req in enumerate(reqs):
        assert req.done
        assert req.out_ids == singles[i], (i, req.out_ids, singles[i])


@pytest.mark.parametrize("quant", ["int8", "int4"])
def test_quantized_pool_batching(setup, quant):
    """int8/int4 paged pools: requests complete and tokens track the fp pool
    closely (quantization error can flip late tokens with a random model)."""
    from efficient_llm_inference_tpu.evaluation.quality import token_agreement_rate

    spec, params, eng = setup
    prompts = [
        "The weather in the mountains changes quickly during spring.",
        "Rivers flow from the hills down to the distant sea.",
    ]
    n_new = 10
    outs = {}
    for q in ("none", quant):
        cbe = ContinuousBatchingEngine(
            spec,
            params,
            PoolConfig(n_slots=2, block_size=16, n_blocks=24, max_blocks_per_seq=8,
                       prompt_bucket=64, quant=q),
            dtype=jnp.float32,
        )
        reqs = [
            Request(rid=i, prompt_ids=eng.tokenizer.encode(p), max_new_tokens=n_new)
            for i, p in enumerate(prompts)
        ]
        cbe.run(reqs)
        assert all(r.done and len(r.out_ids) == n_new for r in reqs)
        outs[q] = [r.out_ids for r in reqs]
    for a, b in zip(outs["none"], outs[quant]):
        # staging stays full-precision and the fused kernel reads the pool
        # at reference numerics, so agreement is near-perfect; slack only
        # for quantization flipping a genuine near-tie
        assert token_agreement_rate(a, b) >= 0.9, (a, b)


def test_llama_int4_paged_batching():
    """North-star smoke: Llama-family model with INT4 paged KV pool under
    continuous batching (BASELINE.json config 5, single-chip slice)."""
    import jax as _jax

    from efficient_llm_inference_tpu.models import llama as llama_mod

    cfg = llama_mod.LlamaConfig.tiny()
    spec = llama_mod.llama_spec(cfg)
    params = llama_mod.init_llama_params(_jax.random.PRNGKey(3), cfg, jnp.float32)
    cbe = ContinuousBatchingEngine(
        spec,
        params,
        PoolConfig(n_slots=2, block_size=16, n_blocks=16, max_blocks_per_seq=4,
                   prompt_bucket=32, quant="int4"),
        dtype=jnp.float32,
    )
    from efficient_llm_inference_tpu.data.tokenizer import ByteTokenizer

    tok = ByteTokenizer()
    reqs = [
        Request(rid=i, prompt_ids=tok.encode(f"prompt {i} about rivers"),
                max_new_tokens=8)
        for i in range(4)
    ]
    cbe.run(reqs)
    assert all(r.done and len(r.out_ids) == 8 for r in reqs)


def test_prefix_cache_shares_blocks_and_matches(setup):
    """Identical prompts share full prompt blocks; divergent suffixes get
    their own blocks; outputs equal the non-cached engine exactly."""
    spec, params, eng = setup
    bs = 16
    common = list(range(1, bs + 1)) * 2  # 32 tokens = 2 full shared blocks
    prompts = [
        common + [60, 61, 62],
        common + [70, 71, 72],   # same 2-block prefix, different tail
        common + [60, 61, 62],   # fully identical to request 0
    ]
    n_new = 8

    def run(enable):
        cbe = ContinuousBatchingEngine(
            spec, params,
            PoolConfig(n_slots=3, block_size=bs, n_blocks=32,
                       max_blocks_per_seq=8, prompt_bucket=64),
            dtype=jnp.float32,
            enable_prefix_cache=enable,
        )
        reqs = [Request(i, list(p), n_new) for i, p in enumerate(prompts)]
        cbe.run(reqs)
        return cbe, [r.out_ids for r in reqs]

    cbe_off, outs_off = run(False)
    cbe_on, outs_on = run(True)
    assert outs_on == outs_off

    # accounting: without sharing each request allocates ceil((35+8)/16)=3
    # blocks (9 total); with sharing the 2-block prefix is stored once
    # (2 shared + 3 requests x 1 tail = 5 concurrent)
    assert cbe_on.allocator.n_free == 32  # all released or parked (LRU)
    # registered prefix blocks stay PARKED for cross-wave reuse: every
    # registry entry must point at a parked (cached) block
    for blk in cbe_on._block_prefix:
        assert blk in cbe_on.allocator.cached
    assert set(cbe_on._prefix_map.values()) == set(cbe_on._block_prefix)


def test_prefix_cache_concurrent_accounting(setup):
    """While identical requests are live, shared blocks are held once."""
    spec, params, eng = setup
    bs = 16
    prompt = list(range(1, 2 * bs + 1))  # exactly 2 full blocks, aligned
    cbe = ContinuousBatchingEngine(
        spec, params,
        PoolConfig(n_slots=2, block_size=bs, n_blocks=16,
                   max_blocks_per_seq=8, prompt_bucket=64),
        dtype=jnp.float32,
        enable_prefix_cache=True,
    )
    reqs = [Request(i, list(prompt), 4) for i in range(2)]
    cbe._admit_wave(list(reqs))  # admit both, no decoding yet
    # per request: ceil((32+4)/16) = 3 blocks; sharable prefix = 1 block
    # (the LAST prompt block stays un-cached so admission has >=1 suffix
    # token to compute logits from) -> concurrent = 1 shared + 2x2 = 5
    assert 16 - cbe.allocator.n_free == 5
    assert cbe.allocator.refcount[cbe.slot_blocks[0][0]] == 2


def test_blocks_recycled_across_waves(setup):
    spec, params, eng = setup
    # pool only fits ~2 concurrent requests; 5 requests must run in waves
    cbe = ContinuousBatchingEngine(
        spec,
        params,
        PoolConfig(n_slots=2, block_size=16, n_blocks=12, max_blocks_per_seq=6,
                   prompt_bucket=64),
        dtype=jnp.float32,
    )
    prompts = [f"Request number {i} asks about the tides." for i in range(5)]
    reqs = [
        Request(rid=i, prompt_ids=eng.tokenizer.encode(p), max_new_tokens=8)
        for i, p in enumerate(prompts)
    ]
    cbe.run(reqs)
    assert all(r.done for r in reqs)
    assert all(len(r.out_ids) == 8 for r in reqs)
    assert cbe.allocator.n_free == 12  # all blocks returned


@pytest.mark.parametrize("quant", ["none", "int8"])
def test_sharded_engine_matches_unsharded(setup, quant):
    """(data, model)-meshed serving: heads shard over "model", slots over
    "data"; tokens must equal the single-device engine's exactly (einsum
    reduction dims are unsharded, so no cross-shard accumulation reorder)."""
    from jax.sharding import Mesh

    spec, params, eng = setup
    devices = np.array(jax.devices()[:8]).reshape(2, 4)  # n_head=2 -> model=2
    mesh = Mesh(devices.reshape(4, 2), ("data", "model"))
    prompts = [
        "The weather in the mountains changes quickly.",
        "Rivers flow from the hills down to the sea.",
        "Engineers design bridges to withstand loads.",
    ]
    n_new = 10
    pool = PoolConfig(n_slots=4, block_size=16, n_blocks=24,
                      max_blocks_per_seq=8, prompt_bucket=64, quant=quant)
    outs = {}
    for m in (None, mesh):
        cbe = ContinuousBatchingEngine(spec, params, pool,
                                       dtype=jnp.float32, mesh=m)
        reqs = [Request(i, eng.tokenizer.encode(p), n_new)
                for i, p in enumerate(prompts)]
        cbe.run(reqs)
        outs[m is None] = [r.out_ids for r in reqs]
    if quant == "none":
        assert outs[True] == outs[False]
    else:
        # sharded quant mode runs the jnp dequant path vs the fused kernel
        # single-device: same math, different f32 accumulation order
        from efficient_llm_inference_tpu.evaluation.quality import (
            token_agreement_rate,
        )

        for a, b in zip(outs[True], outs[False]):
            assert token_agreement_rate(a, b) >= 0.9, (a, b)


def test_suffix_prefill_cross_wave_exact():
    """Compute-saving prefix prefill: a LATER wave reusing committed prefix
    blocks must produce exactly the tokens of the prefix-cache-off engine.
    Uses the trained quality model (sharp predictions) so stale/wrong past
    KV would visibly change tokens — a random model can mask such bugs."""
    import pathlib

    ckpt = (pathlib.Path(__file__).resolve().parent.parent
            / "artifacts" / "quality_gpt2.npz")
    if not ckpt.exists():
        pytest.skip("quality checkpoint not trained")
    from examples.train_quality_model import load_quality_model

    spec, params = load_quality_model()
    from efficient_llm_inference_tpu.data.samples import SUMMARIZATION_SAMPLES

    art, _ = SUMMARIZATION_SAMPLES["cnn_dailymail"][0]
    ids = [min(b, 255) for b in art.encode("utf-8")][:150]
    bs = 32
    prompts = [ids + [10, 65, 66], ids + [10, 67, 68]]  # shared 4-block prefix

    def run(enable):
        cbe = ContinuousBatchingEngine(
            spec, params,
            PoolConfig(n_slots=1, block_size=bs, n_blocks=32,
                       max_blocks_per_seq=8, prompt_bucket=256, max_chunk=4),
            dtype=jnp.float32,
            enable_prefix_cache=enable,
        )
        # n_slots=1 forces two waves: wave 2's prefix is COMMITTED by wave 1
        reqs = [Request(i, list(p), 8) for i, p in enumerate(prompts)]
        cbe.run(reqs)
        return [r.out_ids for r in reqs]

    off = run(False)
    on = run(True)
    assert on == off, (on, off)


def test_suffix_prefill_in_wave_twins_exact():
    """Same-wave identical prompts: memory is shared but compute is NOT
    skipped (their blocks are written by this very dispatch); tokens must
    still match the non-cached engine exactly."""
    import pathlib

    ckpt = (pathlib.Path(__file__).resolve().parent.parent
            / "artifacts" / "quality_gpt2.npz")
    if not ckpt.exists():
        pytest.skip("quality checkpoint not trained")
    from examples.train_quality_model import load_quality_model

    spec, params = load_quality_model()
    from efficient_llm_inference_tpu.data.samples import SUMMARIZATION_SAMPLES

    art, _ = SUMMARIZATION_SAMPLES["cnn_dailymail"][1]
    ids = [min(b, 255) for b in art.encode("utf-8")][:100]
    bs = 32
    prompts = [ids + [10, 65], ids + [10, 65], ids + [10, 70]]

    def run(enable):
        cbe = ContinuousBatchingEngine(
            spec, params,
            PoolConfig(n_slots=3, block_size=bs, n_blocks=32,
                       max_blocks_per_seq=8, prompt_bucket=128, max_chunk=4),
            dtype=jnp.float32,
            enable_prefix_cache=enable,
        )
        reqs = [Request(i, list(p), 8) for i, p in enumerate(prompts)]
        cbe.run(reqs)
        return [r.out_ids for r in reqs]

    assert run(True) == run(False)


def test_prefix_blocks_survive_retirement_lru(setup):
    """Parked prefix blocks serve LATER waves with no live holder, and are
    evicted (registry pruned) only under allocation pressure."""
    spec, params, eng = setup
    bs = 16
    prefix = list(range(1, 2 * bs + 2))  # 33 tokens: 2 full blocks + 1
    cbe = ContinuousBatchingEngine(
        spec, params,
        PoolConfig(n_slots=1, block_size=bs, n_blocks=8,
                   max_blocks_per_seq=8, prompt_bucket=64),
        dtype=jnp.float32,
        enable_prefix_cache=True,
    )
    # wave 1: registers + parks 2 prefix blocks on retirement
    cbe.run([Request(0, list(prefix), 4)])
    assert len(cbe.allocator.cached) == 2
    assert len(cbe._prefix_map) == 2

    # wave 2 (no live holders): reuses the parked blocks -> committed skip
    # (run() fuses admission with the first chunk: spy on _admit_chunk and
    # check the wave went through the suffix-prefill variant)
    captured = {}
    orig = cbe._admit_chunk

    def spy(suffix, n_steps, n_past):
        if suffix is not None:
            captured["args"] = suffix
        return orig(suffix, n_steps, n_past)

    cbe._admit_chunk = spy
    out2 = [Request(1, list(prefix), 4)]
    cbe.run(out2)
    assert captured, "suffix prefill path not taken"
    assert out2[0].done

    # exactness vs the cache-off engine
    cbe_off = ContinuousBatchingEngine(
        spec, params,
        PoolConfig(n_slots=1, block_size=bs, n_blocks=8,
                   max_blocks_per_seq=8, prompt_bucket=64),
        dtype=jnp.float32,
    )
    ref = [Request(2, list(prefix), 4)]
    cbe_off.run(ref)
    assert out2[0].out_ids == ref[0].out_ids

    # pressure: a large non-matching request forces eviction of parked
    # blocks and prunes the registry
    big = [200 + i for i in range(60)]
    cbe.run([Request(3, list(big), 40)])  # needs ceil(100/16)=7 blocks
    assert len(cbe.allocator.cached) + len(cbe.allocator.free) >= 0
    for blk in cbe._block_prefix:
        assert blk in cbe.allocator.cached or blk in cbe.allocator.refcount


def test_pipelined_multichunk_eos_exact(setup):
    """The dispatch-pipelined scheduler (speculative chunk in flight) must
    produce the same tokens as a single-chunk-per-generation config, with
    mid-stream EOS honored and zombie overshoot tokens discarded."""
    spec, params, eng = setup
    prompts = [
        "The tide rises and the tide falls.",
        "A different prompt about mountain weather.",
        "Short one.",
    ]
    ids = [eng.tokenizer.encode(p) for p in prompts]
    n_new = 24

    def run(max_chunk, eos_id):
        cbe = ContinuousBatchingEngine(
            spec, params,
            PoolConfig(n_slots=2, block_size=16, n_blocks=24,
                       max_blocks_per_seq=8, prompt_bucket=64,
                       max_chunk=max_chunk),
            dtype=jnp.float32, eos_id=eos_id,
        )
        reqs = [Request(i, list(x), n_new) for i, x in enumerate(ids)]
        cbe.run(reqs)
        assert all(r.done for r in reqs)
        assert cbe.allocator.n_free == 24  # all blocks recycled
        return [r.out_ids for r in reqs]

    # multi-chunk (4 steps/chunk -> depth-1 speculation engages) vs
    # one-chunk-per-generation; no EOS
    assert run(4, None) == run(n_new, None)

    # with an EOS id that actually occurs: pick it from the no-EOS stream so
    # at least one request stops early
    baseline = run(4, None)
    eos = baseline[0][len(baseline[0]) // 2]
    out_a = run(4, eos)
    out_b = run(n_new, eos)
    assert out_a == out_b
    assert any(len(o) < n_new for o in out_a)  # someone stopped early
    for o in out_a:
        assert eos not in o[:-1]  # nothing after EOS
