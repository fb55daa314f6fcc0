"""Mixtral-style MoE model: Llama attention + top-k routed expert MLPs.

Completes the parallelism matrix with expert parallelism (EP): expert
weight stacks carry a leading expert axis sharded over the mesh's "model"
axis, every device computes its experts' contribution for all tokens
(gates zero out non-selected experts) and XLA's psum combines — the
standard dense-MoE SPMD formulation, ideal for small expert counts on TPU
(no all-to-all dispatch needed, MXU stays on large dense einsums).

Numerics match HF MixtralForCausalLM: softmax over ALL router logits,
top-k selection, renormalization over the selected k (modeling_mixtral's
routing), SwiGLU experts (w1 gate / w3 up / w2 down).
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .llama import _rms_norm, apply_rope, rope_cos_sin


@dataclasses.dataclass(frozen=True)
class MixtralConfig:
    vocab_size: int = 32000
    hidden_size: int = 4096
    intermediate_size: int = 14336
    n_layer: int = 32
    n_head: int = 32
    n_kv_head: int = 8
    n_experts: int = 8
    top_k: int = 2
    n_positions: int = 8192
    rope_theta: float = 1e6
    rms_eps: float = 1e-5

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.n_head

    @staticmethod
    def tiny(vocab_size: int = 256) -> "MixtralConfig":
        return MixtralConfig(
            vocab_size=vocab_size,
            hidden_size=64,
            intermediate_size=128,
            n_layer=2,
            n_head=4,
            n_kv_head=2,
            n_experts=4,
            top_k=2,
            n_positions=512,
            rope_theta=10000.0,
        )


def init_mixtral_params(key: jax.Array, cfg: MixtralConfig, dtype=jnp.float32) -> dict:
    E, L = cfg.hidden_size, cfg.n_layer
    D, Hq, Hkv = cfg.head_dim, cfg.n_head, cfg.n_kv_head
    I, X = cfg.intermediate_size, cfg.n_experts
    keys = jax.random.split(key, 12)
    std = 0.02

    def nrm(k, shape):
        return (jax.random.normal(k, shape, jnp.float32) * std).astype(dtype)

    return {
        "embed": nrm(keys[0], (cfg.vocab_size, E)),
        "blocks": {
            "ln1": jnp.ones((L, E), dtype),
            "wq": nrm(keys[1], (L, E, Hq * D)),
            "wk": nrm(keys[2], (L, E, Hkv * D)),
            "wv": nrm(keys[3], (L, E, Hkv * D)),
            "wo": nrm(keys[4], (L, Hq * D, E)) / math.sqrt(2 * L),
            "ln2": jnp.ones((L, E), dtype),
            "router": nrm(keys[5], (L, E, X)),
            # expert stacks: [L, X, ...] — EP shards the X axis
            "w_gate": nrm(keys[6], (L, X, E, I)),
            "w_up": nrm(keys[7], (L, X, E, I)),
            "w_down": nrm(keys[8], (L, X, I, E)) / math.sqrt(2 * L),
        },
        "ln_f": jnp.ones((E,), dtype),
        "lm_head": nrm(keys[9], (E, cfg.vocab_size)),
    }


def _moe_mlp(x: jax.Array, bp: dict, cfg: MixtralConfig) -> jax.Array:
    """Top-k routed SwiGLU experts, dense-compute formulation.

    x: [B, T, E] -> [B, T, E]. HF routing semantics: softmax over all
    experts, take top-k, renormalize over the k selected.
    """
    B, T, E = x.shape
    X, k = cfg.n_experts, cfg.top_k

    logits = (x @ bp["router"]).astype(jnp.float32)  # [B, T, X]
    probs = jax.nn.softmax(logits, axis=-1)
    topv, topi = jax.lax.top_k(probs, k)  # [B, T, k]
    topv = topv / jnp.sum(topv, axis=-1, keepdims=True)
    gates = jnp.zeros((B, T, X), jnp.float32)
    b_idx = jnp.arange(B)[:, None, None]
    t_idx = jnp.arange(T)[None, :, None]
    gates = gates.at[b_idx, t_idx, topi].set(topv)  # [B, T, X]

    # every expert applied to every token, gate-weighted (zero for
    # non-selected); with the expert axis sharded this IS expert
    # parallelism: each device computes its experts, psum combines.
    h_gate = jnp.einsum(
        "bte,xei->btxi", x, bp["w_gate"], preferred_element_type=jnp.float32
    )
    h_up = jnp.einsum(
        "bte,xei->btxi", x, bp["w_up"], preferred_element_type=jnp.float32
    )
    h = jax.nn.silu(h_gate) * h_up  # [B, T, X, I]
    h = h * gates[..., None]
    out = jnp.einsum(
        "btxi,xie->bte", h.astype(x.dtype), bp["w_down"],
        preferred_element_type=jnp.float32,
    )
    return out.astype(x.dtype)


def mixtral_forward(
    params: dict,
    cfg: MixtralConfig,
    tokens: jax.Array,
    positions: jax.Array,
    cache,
    strategy,
    seq_mask: Optional[jax.Array] = None,
):
    B, T = tokens.shape
    Hq, Hkv, D = cfg.n_head, cfg.n_kv_head, cfg.head_dim

    x = params["embed"][tokens]
    if seq_mask is not None:
        x = jnp.where(seq_mask[..., None], x, jnp.zeros_like(x))
    cos, sin = rope_cos_sin(positions, D, cfg.rope_theta)

    blocks = params["blocks"]
    layer_caches = strategy.cache_layer_slices(cache)

    def layer_body(x, layer_in):
        bp, layer_cache = layer_in
        h = _rms_norm(x, bp["ln1"], cfg.rms_eps)
        q = (h @ bp["wq"]).reshape(B, T, Hq, D).transpose(0, 2, 1, 3)
        k = (h @ bp["wk"]).reshape(B, T, Hkv, D).transpose(0, 2, 1, 3)
        v = (h @ bp["wv"]).reshape(B, T, Hkv, D).transpose(0, 2, 1, 3)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        attn_out, layer_cache = strategy.layer_attend(
            layer_cache, cache, q, k, v, seq_mask
        )
        a = attn_out.transpose(0, 2, 1, 3).reshape(B, T, Hq * D).astype(x.dtype)
        x = x + a @ bp["wo"]

        h2 = _rms_norm(x, bp["ln2"], cfg.rms_eps)
        x = x + _moe_mlp(h2, bp, cfg)
        return x, layer_cache

    x, new_layer_caches = jax.lax.scan(layer_body, x, (blocks, layer_caches))
    cache = strategy.cache_with_layer_slices(cache, new_layer_caches, T)

    x = _rms_norm(x, params["ln_f"], cfg.rms_eps)
    logits = jnp.einsum(
        "bte,ev->btv", x, params["lm_head"], preferred_element_type=jnp.float32
    )
    return logits, cache


def mixtral_spec(cfg: MixtralConfig):
    from .registry import ModelSpec

    return ModelSpec(
        name="mixtral",
        config=cfg,
        forward=partial(_fwd, cfg),
        vocab_size=cfg.vocab_size,
        n_positions=cfg.n_positions,
        n_layer=cfg.n_layer,
        n_head=cfg.n_head,
        head_dim=cfg.head_dim,
        n_kv_head=cfg.n_kv_head,
    )


def _fwd(cfg, params, tokens, positions, cache, strategy, seq_mask=None):
    return mixtral_forward(params, cfg, tokens, positions, cache, strategy, seq_mask)


def expert_parallel_specs(cfg: MixtralConfig) -> dict:
    """PartitionSpecs for EP: expert axes sharded over "model"."""
    from jax.sharding import PartitionSpec as P

    return {
        "embed": P(None, None),
        "blocks": {
            "ln1": P(None, None),
            "wq": P(None, None, None),
            "wk": P(None, None, None),
            "wv": P(None, None, None),
            "wo": P(None, None, None),
            "ln2": P(None, None),
            "router": P(None, None, None),
            "w_gate": P(None, "model", None, None),
            "w_up": P(None, "model", None, None),
            "w_down": P(None, "model", None, None),
        },
        "ln_f": P(None),
        "lm_head": P(None, None),
    }


def params_from_hf_state_dict(state_dict, cfg: MixtralConfig, dtype=jnp.float32) -> dict:
    """Convert HF MixtralForCausalLM weights (nn.Linear [out, in] -> [in, out])."""

    def g(name, transpose=False):
        a = np.asarray(state_dict[name].detach().cpu().numpy())
        if transpose:
            a = a.T
        return jnp.asarray(a, dtype)

    def stack(fmt, transpose=False):
        return jnp.stack([g(fmt.format(i), transpose) for i in range(cfg.n_layer)])

    def stack_experts(fmt, transpose=False):
        return jnp.stack(
            [
                jnp.stack(
                    [g(fmt.format(l, e), transpose) for e in range(cfg.n_experts)]
                )
                for l in range(cfg.n_layer)
            ]
        )

    return {
        "embed": g("model.embed_tokens.weight"),
        "blocks": {
            "ln1": stack("model.layers.{}.input_layernorm.weight"),
            "wq": stack("model.layers.{}.self_attn.q_proj.weight", True),
            "wk": stack("model.layers.{}.self_attn.k_proj.weight", True),
            "wv": stack("model.layers.{}.self_attn.v_proj.weight", True),
            "wo": stack("model.layers.{}.self_attn.o_proj.weight", True),
            "ln2": stack("model.layers.{}.post_attention_layernorm.weight"),
            "router": stack("model.layers.{}.block_sparse_moe.gate.weight", True),
            "w_gate": stack_experts(
                "model.layers.{}.block_sparse_moe.experts.{}.w1.weight", True
            ),
            "w_up": stack_experts(
                "model.layers.{}.block_sparse_moe.experts.{}.w3.weight", True
            ),
            "w_down": stack_experts(
                "model.layers.{}.block_sparse_moe.experts.{}.w2.weight", True
            ),
        },
        "ln_f": g("model.norm.weight"),
        "lm_head": g("lm_head.weight", True),
    }
