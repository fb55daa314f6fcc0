"""Pipeline parallelism: stage-sharded forward vs single-device forward."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from efficient_llm_inference_tpu.cache.kvcache import NoCacheKV
from efficient_llm_inference_tpu.models import gpt2 as gpt2_mod
from efficient_llm_inference_tpu.models.registry import gpt2_spec
from efficient_llm_inference_tpu.parallel.pipeline import (
    make_pipeline_forward,
    pipeline_greedy_step,
    place_pipeline_params,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 4, reason="needs 4 virtual devices"
)


@pytest.fixture(scope="module")
def setup():
    cfg = gpt2_mod.GPT2Config(
        vocab_size=211, n_positions=64, n_embd=32, n_layer=4, n_head=2
    )
    params = gpt2_mod.init_gpt2_params(jax.random.PRNGKey(8), cfg, jnp.float32)
    mesh = Mesh(np.array(jax.devices()[:4]), ("stage",))
    return cfg, params, mesh


def _reference_logits(cfg, params, tokens, seq_mask):
    spec = gpt2_spec(cfg)
    strategy = NoCacheKV(n_layer=cfg.n_layer, n_head=cfg.n_head, head_dim=cfg.head_dim)
    B, T = tokens.shape
    pos = jnp.minimum(
        jax.lax.broadcasted_iota(jnp.int32, (B, T), 1), cfg.n_positions - 1
    )
    logits, _ = spec.forward(params, tokens, pos, strategy.init(), strategy, seq_mask)
    return logits


def test_pipeline_forward_matches_reference(setup):
    cfg, params, mesh = setup
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.integers(0, 211, (2, 16)), jnp.int32)
    seq_mask = jnp.ones((2, 16), bool)

    ref = _reference_logits(cfg, params, tokens, seq_mask)

    staged = place_pipeline_params(params, mesh, n_stages=4)
    fwd = make_pipeline_forward(cfg, mesh, n_stages=4)
    with mesh:
        got = fwd(staged, tokens, seq_mask)

    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4
    )
    assert (np.asarray(got).argmax(-1) == np.asarray(ref).argmax(-1)).all()


def test_gpipe_forward_matches_reference(setup):
    """GPipe microbatch schedule must be numerically identical to the
    sequential pipeline and the single-device forward."""
    from efficient_llm_inference_tpu.parallel.pipeline import make_gpipe_forward

    cfg, params, mesh = setup
    rng = np.random.default_rng(2)
    B, T, M = 8, 12, 4
    tokens = jnp.asarray(rng.integers(0, 211, (B, T)), jnp.int32)
    # varied per-row lengths exercise the per-microbatch masks
    lens = rng.integers(4, T + 1, B)
    seq_mask = jnp.asarray(np.arange(T)[None, :] < lens[:, None])

    ref = _reference_logits(cfg, params, tokens, seq_mask)

    staged = place_pipeline_params(params, mesh, n_stages=4)
    fwd = make_gpipe_forward(cfg, mesh, n_stages=4, n_microbatches=M)
    with mesh:
        got = fwd(staged, tokens, seq_mask)

    got_np, ref_np = np.asarray(got), np.asarray(ref)
    # compare at real positions only (pad positions hold garbage in both)
    m = np.asarray(seq_mask)
    np.testing.assert_allclose(got_np[m], ref_np[m], rtol=1e-4, atol=1e-4)


def test_pipeline_greedy_step(setup):
    cfg, params, mesh = setup
    rng = np.random.default_rng(1)
    ids = rng.integers(0, 211, 12).tolist()
    buf = np.zeros((1, 16), np.int32)
    buf[0, : len(ids)] = ids

    ref = _reference_logits(
        cfg, params, jnp.asarray(buf),
        jnp.asarray(np.arange(16)[None, :] < len(ids)),
    )
    ref_tok = int(np.asarray(ref)[0, len(ids) - 1].argmax())

    staged = place_pipeline_params(params, mesh, n_stages=4)
    step = pipeline_greedy_step(cfg, mesh, n_stages=4)
    with mesh:
        tok = step(staged, jnp.asarray(buf), jnp.int32(len(ids)))
    assert int(np.asarray(tok)[0]) == ref_tok


def test_pipeline_generate_token_exact(setup):
    """KV-cached pipelined greedy decode == single-device engine tokens."""
    from efficient_llm_inference_tpu.core.config import Config
    from efficient_llm_inference_tpu.engine.engine import InferenceEngine
    from efficient_llm_inference_tpu.parallel.pipeline import (
        make_pipeline_generate,
    )

    cfg, params, mesh = setup
    spec = gpt2_spec(cfg)
    eng = InferenceEngine(
        spec, params,
        config=Config(model_name="t", device="cpu", dtype=jnp.float32),
    )
    prompt = "Rivers flow to the sea."
    n_new = 8
    want = eng.generate_ids(prompt, "full_cache", n_new)[-n_new:]

    ids = eng.tokenizer.encode(prompt)
    bucket = 32
    buf = np.zeros((1, bucket), np.int32)
    buf[0, : len(ids)] = ids
    staged = place_pipeline_params(params, mesh, 4)
    gen = make_pipeline_generate(cfg, mesh, 4, n_new, capacity=bucket + n_new)
    with mesh:
        toks = gen(staged, jnp.asarray(buf), jnp.int32(len(ids)))
    assert np.asarray(toks)[0].tolist() == want


def test_pipeline_generate_batched(setup):
    """Batched pipelined decode: per-row tokens match per-row single-stream."""
    from efficient_llm_inference_tpu.parallel.pipeline import (
        make_pipeline_generate,
    )

    cfg, params, mesh = setup
    rng = np.random.default_rng(0)
    B, T, n_new = 2, 16, 6
    true_len = 12
    buf = np.zeros((B, T), np.int32)
    buf[:, :true_len] = rng.integers(1, 200, (B, true_len))
    staged = place_pipeline_params(params, mesh, 4)
    gen = make_pipeline_generate(cfg, mesh, 4, n_new, capacity=T + n_new)
    with mesh:
        toks = np.asarray(gen(staged, jnp.asarray(buf), jnp.int32(true_len)))
    assert toks.shape == (B, n_new)

    # single-device reference: DenseKV prefill+decode on the same buffers
    from efficient_llm_inference_tpu.cache.kvcache import DenseKV
    from efficient_llm_inference_tpu.engine.generate import make_generate

    spec = gpt2_spec(cfg)
    strat = DenseKV(n_layer=cfg.n_layer, n_head=cfg.n_head,
                    head_dim=cfg.head_dim, capacity=T + n_new, batch=B,
                    dtype=jnp.float32)
    ref, _ = make_generate(spec, strat, None, n_new)(
        params, jnp.asarray(buf), jnp.int32(true_len)
    )
    assert np.array_equal(toks, np.asarray(ref))
