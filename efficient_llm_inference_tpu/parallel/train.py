"""Sharded training step (dp x tp) for the multi-chip dry-run and finetuning.

The framework is inference-first, but the functional model makes a full
training step (next-token CE loss -> grads -> adamw update) a few lines; it
doubles as the driver's multi-chip compile/execute validation surface
(__graft_entry__.dryrun_multichip): params tensor-sharded over "model",
batch over "data", XLA inserting the psums for row-parallel matmuls and the
gradient all-reduce over "data".
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding

from ..cache.kvcache import NoCacheKV
from ..models.registry import ModelSpec
from . import sharding
from .mesh import shard_params


def next_token_loss(model: ModelSpec, params, tokens: jax.Array) -> jax.Array:
    """Mean causal-LM cross-entropy over a [B, T] batch."""
    strategy = NoCacheKV(
        n_layer=model.n_layer, n_head=model.n_kv_head, head_dim=model.head_dim
    )
    B, T = tokens.shape
    pos = jnp.minimum(
        jax.lax.broadcasted_iota(jnp.int32, (B, T), 1), model.n_positions - 1
    )
    logits, _ = model.forward(params, tokens, pos, strategy.init(), strategy, None)
    logp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), axis=-1)
    tgt = tokens[:, 1:]
    nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    return jnp.mean(nll)


def make_train_step(model: ModelSpec, learning_rate: float = 1e-4):
    """Returns (init_fn, step_fn): jittable adamw training step."""
    tx = optax.adamw(learning_rate)

    def init_fn(params):
        return tx.init(params)

    def step_fn(params, opt_state, tokens):
        loss, grads = jax.value_and_grad(lambda p: next_token_loss(model, p, tokens))(
            params
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return init_fn, step_fn


def shard_train_state(model: ModelSpec, params, init_fn, mesh: Mesh):
    """Place params on the mesh with TP specs; build optimizer state under
    jit from the sharded params so mu/nu inherit the param shardings via
    XLA's propagation (no manual spec tree for optimizer internals)."""
    specs = sharding.param_specs_for(model.name, model.config)
    params = shard_params(params, specs, mesh)
    opt_state = jax.jit(init_fn)(params)
    return params, opt_state
