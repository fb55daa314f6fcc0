"""Tree speculation greedy-equivalence (engine/speculative.py tree verifier).

Same defining property as linear speculation: the greedy output stream is
IDENTICAL to plain target greedy decoding no matter what the draft proposes
or what the tree shape is — branching only changes speed. Verified with an
unrelated random draft (low acceptance, deep mismatch walks), the target as
its own draft (full acceptance every round), a degenerate (1,)*k tree
(must equal the linear verifier), and a Llama/GQA target.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from efficient_llm_inference_tpu.core.config import Config
from efficient_llm_inference_tpu.engine.engine import InferenceEngine
from efficient_llm_inference_tpu.engine.speculative import (
    _build_topology,
    make_speculative_generate,
    make_tree_speculative_generate,
)
from efficient_llm_inference_tpu.models import gpt2 as gpt2_mod
from efficient_llm_inference_tpu.models import llama as llama_mod
from efficient_llm_inference_tpu.models.llama import LlamaConfig, llama_spec
from efficient_llm_inference_tpu.models.registry import gpt2_spec


@pytest.fixture(scope="module")
def setup():
    t_cfg = gpt2_mod.GPT2Config(
        vocab_size=173, n_positions=256, n_embd=32, n_layer=3, n_head=2
    )
    d_cfg = gpt2_mod.GPT2Config(
        vocab_size=173, n_positions=256, n_embd=16, n_layer=1, n_head=2
    )
    t_params = gpt2_mod.init_gpt2_params(jax.random.PRNGKey(10), t_cfg, jnp.float32)
    d_params = gpt2_mod.init_gpt2_params(jax.random.PRNGKey(11), d_cfg, jnp.float32)
    eng = InferenceEngine(
        gpt2_spec(t_cfg), t_params,
        config=Config(model_name="t", device="cpu", dtype=jnp.float32),
    )
    return t_cfg, d_cfg, t_params, d_params, eng


def _run_tree(t_spec, d_spec, t_params, d_params, ids, n_new, branching):
    gen = make_tree_speculative_generate(
        t_spec, d_spec, n_new, branching=branching, prompt_bucket=64
    )
    buf = np.zeros((1, 64), np.int32)
    buf[0, : len(ids)] = ids
    out, n = gen(t_params, d_params, jnp.asarray(buf), jnp.int32(len(ids)))
    return np.asarray(out)[: int(n)].tolist()


def test_topology():
    t = _build_topology((2, 3, 1))
    assert t.sizes == (1, 2, 6, 6)
    assert t.offs == (0, 1, 3, 9)
    assert t.n_nodes == 15
    # node 5 = third child of node 1 (level-1 node 0)
    assert t.parent[5] == 1 and t.depth[5] == 2
    assert t.ancestor[5, 0] and t.ancestor[5, 1] and t.ancestor[5, 5]
    assert not t.ancestor[5, 2] and not t.ancestor[5, 3]


@pytest.mark.parametrize("branching", [(2, 2), (3, 2, 1), (2, 1, 1, 1)])
def test_unrelated_draft_matches_target_greedy(setup, branching):
    t_cfg, d_cfg, t_params, d_params, eng = setup
    prompt = "A gentle breeze moved across the field toward the old barn."
    ids = eng.tokenizer.encode(prompt)
    n_new = 14

    ref = eng.generate_ids(prompt, "full_cache", n_new)[-n_new:]
    got = _run_tree(
        gpt2_spec(t_cfg), gpt2_spec(d_cfg), t_params, d_params, ids, n_new,
        branching,
    )
    assert got == ref, (got, ref)


def test_self_draft_full_acceptance(setup):
    t_cfg, _, t_params, _, eng = setup
    prompt = "Numbers and letters filled the page from margin to margin."
    ids = eng.tokenizer.encode(prompt)
    n_new = 12

    ref = eng.generate_ids(prompt, "full_cache", n_new)[-n_new:]
    got = _run_tree(
        gpt2_spec(t_cfg), gpt2_spec(t_cfg), t_params, t_params, ids, n_new,
        (2, 2, 2),
    )
    assert got == ref, (got, ref)


def test_degenerate_tree_equals_linear(setup):
    """(1,)*k tree == linear verifier == plain greedy, token for token."""
    t_cfg, d_cfg, t_params, d_params, eng = setup
    prompt = "the tides turn at dawn"
    ids = eng.tokenizer.encode(prompt)
    n_new = 13

    lin = make_speculative_generate(
        gpt2_spec(t_cfg), gpt2_spec(d_cfg), n_new, k=3, prompt_bucket=64
    )
    buf = np.zeros((1, 64), np.int32)
    buf[0, : len(ids)] = ids
    out_l, n_l = lin(t_params, d_params, jnp.asarray(buf), jnp.int32(len(ids)))
    got_lin = np.asarray(out_l)[: int(n_l)].tolist()

    got_tree = _run_tree(
        gpt2_spec(t_cfg), gpt2_spec(d_cfg), t_params, d_params, ids, n_new,
        (1, 1, 1),
    )
    ref = eng.generate_ids(prompt, "full_cache", n_new)[-n_new:]
    assert got_tree == ref
    assert got_lin == ref


def test_llama_gqa_target(setup):
    """Tree verification through a GQA target (Hq != Hkv attention fold)."""
    _, d_cfg, _, d_params, _ = setup
    cfg = LlamaConfig(
        vocab_size=173, hidden_size=64, intermediate_size=128, n_layer=2,
        n_head=4, n_kv_head=2, n_positions=256, rope_theta=10000.0,
        tie_embeddings=True,
    )
    params = llama_mod.init_llama_params(jax.random.PRNGKey(3), cfg, jnp.float32)
    spec = llama_spec(cfg)
    eng = InferenceEngine(
        spec, params, config=Config(device="cpu", dtype=jnp.float32)
    )
    prompt = "every model tells a story"
    ids = eng.tokenizer.encode(prompt)
    n_new = 12
    ref = eng.generate_ids(prompt, "full_cache", n_new)[-n_new:]
    got = _run_tree(
        spec, gpt2_spec(d_cfg), params, d_params, ids, n_new, (2, 2)
    )
    assert got == ref, (got, ref)
