"""Tensor/data-parallel sharding on the virtual 8-device CPU mesh.

SURVEY.md §4 plan item (d): the same Mesh code path that runs on real chips
executes on --xla_force_host_platform_device_count devices, so sharded
decode / training are testable without a TPU. TP-sharded decode must be
token-identical to unsharded decode.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from efficient_llm_inference_tpu.cache.kvcache import DenseKV
from efficient_llm_inference_tpu.engine.generate import make_decode, make_prefill
from efficient_llm_inference_tpu.models import gpt2 as gpt2_mod
from efficient_llm_inference_tpu.models.registry import gpt2_spec
from efficient_llm_inference_tpu.parallel import sharding as rules
from efficient_llm_inference_tpu.parallel.mesh import auto_mesh_shape, make_mesh, shard_params
from efficient_llm_inference_tpu.parallel.train import make_train_step, shard_train_state

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


@pytest.fixture(scope="module")
def setup():
    cfg = gpt2_mod.GPT2Config(
        vocab_size=331, n_positions=128, n_embd=64, n_layer=2, n_head=8
    )
    spec = gpt2_spec(cfg)
    params = gpt2_mod.init_gpt2_params(jax.random.PRNGKey(6), cfg, jnp.float32)
    return spec, params


def test_tp_sharded_decode_token_exact(setup):
    spec, params = setup
    ids = np.random.default_rng(0).integers(0, 331, 20).tolist()
    n_new = 10

    def run(params_in, mesh=None):
        strategy = DenseKV(
            n_layer=spec.n_layer, n_head=spec.n_head, head_dim=spec.head_dim,
            capacity=48,
        )
        prefill = make_prefill(spec, strategy, None)
        decode = make_decode(spec, strategy, None, n_new)
        buf = np.zeros((1, 32), np.int32)
        buf[0, : len(ids)] = ids
        ctx = mesh if mesh is not None else _null()
        with ctx:
            cache, last = prefill(params_in, jnp.asarray(buf), jnp.int32(len(ids)))
            toks, _ = decode(params_in, cache, last)
        return np.asarray(toks)[0].tolist()

    import contextlib

    def _null():
        return contextlib.nullcontext()

    base = run(params)

    mesh = make_mesh((2, 4), devices=jax.devices()[:8])
    sharded = shard_params(params, rules.gpt2_param_specs(), mesh)
    got = run(sharded, mesh)
    assert got == base


def test_sharded_train_step_runs_and_shards(setup):
    spec, params = setup
    dp, tp = auto_mesh_shape(8, prefer_model=4)
    mesh = make_mesh((dp, tp), devices=jax.devices()[:8])
    init_fn, step_fn = make_train_step(spec)
    with mesh:
        sparams, opt_state = shard_train_state(spec, params, init_fn, mesh)
        tokens = jax.device_put(
            jnp.asarray(
                np.random.default_rng(1).integers(0, 331, (dp * 2, 16)), jnp.int32
            ),
            NamedSharding(mesh, rules.token_spec()),
        )
        step = jax.jit(step_fn)
        sparams2, opt_state, loss = step(sparams, opt_state, tokens)
    assert np.isfinite(float(loss))
    # attention QKV weights stay sharded over "model" after the update
    spec_set = sparams2["blocks"]["attn_w"].sharding.spec
    assert spec_set == P(None, None, "model")


def test_mesh_factorization():
    assert auto_mesh_shape(8, prefer_model=4) == (2, 4)
    assert auto_mesh_shape(8) == (1, 8)
    assert auto_mesh_shape(6) == (3, 2)
    assert auto_mesh_shape(1) == (1, 1)
