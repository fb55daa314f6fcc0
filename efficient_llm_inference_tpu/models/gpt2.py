"""GPT-2 implemented natively in JAX (scan-over-layers, static shapes).

The reference never implements a model — it injects a HuggingFace
AutoModelForCausalLM and manipulates its `past_key_values` from the outside
(/root/reference/src/benchmarking/benchmarker.py:44-59). Here the model is a
first-class TPU-native component:

* pure functional: params are a pytree, forward is a jit-friendly function;
* per-layer parameters are stacked along a leading layer axis and the
  transformer body runs under `jax.lax.scan` — one compiled layer body
  regardless of depth (fast compiles, XLA-fusable);
* the KV cache is externalized behind a strategy object (see
  efficient_llm_inference_tpu/cache/kvcache.py) so every cache policy of the
  reference's matrix plugs into the same model body;
* numerics match HuggingFace GPT2LMHeadModel (tanh-GELU, 1/sqrt(d) attention
  scale, fp32 layer-norm/softmax) so greedy decode is token-exact vs HF.
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class GPT2Config:
    vocab_size: int = 50257
    n_positions: int = 1024
    n_embd: int = 768
    n_layer: int = 12
    n_head: int = 12
    layer_norm_epsilon: float = 1e-5
    # lax.scan unroll factor for the layer loop: on runtimes with high
    # per-iteration overhead, unrolling trades compile time for step latency
    scan_unroll: int = 1

    @property
    def head_dim(self) -> int:
        return self.n_embd // self.n_head

    @staticmethod
    def small() -> "GPT2Config":
        return GPT2Config()

    @staticmethod
    def medium() -> "GPT2Config":
        return GPT2Config(n_embd=1024, n_layer=24, n_head=16)

    @staticmethod
    def large() -> "GPT2Config":
        return GPT2Config(n_embd=1280, n_layer=36, n_head=20)

    @staticmethod
    def tiny(vocab_size: int = 256) -> "GPT2Config":
        """Small config for tests (CPU-runnable, fast compile)."""
        return GPT2Config(
            vocab_size=vocab_size, n_positions=512, n_embd=64, n_layer=2, n_head=4
        )


def init_gpt2_params(key: jax.Array, cfg: GPT2Config, dtype=jnp.float32) -> dict:
    """Random-init parameters in the stacked-layer layout.

    Layout: every per-layer tensor has a leading `n_layer` axis so the
    transformer body can `lax.scan` over layers. Linear weights use the
    HF Conv1D convention `y = x @ W + b` with W of shape [in, out].
    """
    E, L, H = cfg.n_embd, cfg.n_layer, cfg.n_head
    keys = jax.random.split(key, 16)
    std = 0.02

    def nrm(k, shape):
        return (jax.random.normal(k, shape, jnp.float32) * std).astype(dtype)

    params = {
        "wte": nrm(keys[0], (cfg.vocab_size, E)),
        "wpe": nrm(keys[1], (cfg.n_positions, E)),
        "blocks": {
            "ln1_g": jnp.ones((L, E), dtype),
            "ln1_b": jnp.zeros((L, E), dtype),
            "attn_w": nrm(keys[2], (L, E, 3 * E)),
            "attn_b": jnp.zeros((L, 3 * E), dtype),
            "attn_proj_w": nrm(keys[3], (L, E, E)) / math.sqrt(2 * L),
            "attn_proj_b": jnp.zeros((L, E), dtype),
            "ln2_g": jnp.ones((L, E), dtype),
            "ln2_b": jnp.zeros((L, E), dtype),
            "fc_w": nrm(keys[4], (L, E, 4 * E)),
            "fc_b": jnp.zeros((L, 4 * E), dtype),
            "fc_proj_w": nrm(keys[5], (L, 4 * E, E)) / math.sqrt(2 * L),
            "fc_proj_b": jnp.zeros((L, E), dtype),
        },
        "lnf_g": jnp.ones((E,), dtype),
        "lnf_b": jnp.zeros((E,), dtype),
    }
    return params


def quantize_int8_weights(w):
    """Per-output-channel symmetric int8: {"q": int8 [.., K, F], "s": f32}."""
    w32 = jnp.asarray(w, jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(w32), axis=-2, keepdims=True) / 127.0, 1e-8)
    return {
        "q": jnp.clip(jnp.round(w32 / s), -127, 127).astype(jnp.int8),
        "s": s,
    }


def quantize_int4_weights(w, group: int = 128):
    """Group-wise symmetric int4 weights: {"q4": packed uint8, "s": f32}.

    One scale per (input group, output channel) — per-channel alone is too
    coarse at 4 bits. q4 is [.., K/G, G/2, F] uint8 with TWO nibbles per
    byte: even in-group input positions in the low nibble, odd in the high
    (so HBM weight traffic halves again vs int8). Nibble packing rather
    than jnp.int4 because the remote TPU runtime cannot relayout S4 arrays
    at dispatch (device_put recursion); scale math mirrors the reference's
    int4 KV convention (max/7, [-8, 7] clamp, fp32 scales —
    /root/reference/src/quantization/ops.py:33-65), applied along the
    input dim instead of per tensor.
    """
    K = w.shape[-2]
    g = group if K % group == 0 else K
    if g % 2:  # nibble pairing needs an even group
        g = K
    assert g % 2 == 0, f"int4 weight quant needs an even input dim, got {K}"
    w32 = jnp.asarray(w, jnp.float32)
    lead = w.shape[:-2]
    wg = w32.reshape(*lead, K // g, g, w.shape[-1])
    s = jnp.maximum(jnp.max(jnp.abs(wg), axis=-2, keepdims=True) / 7.0, 1e-8)
    q = jnp.clip(jnp.round(wg / s), -8, 7).astype(jnp.int8)
    lo = (q[..., 0::2, :] & 0xF).astype(jnp.uint8)
    hi = (q[..., 1::2, :] & 0xF).astype(jnp.uint8)
    return {"q4": lo | (hi << 4), "s": s}


def _unpack_nibbles(q: jax.Array):
    """Packed uint8 -> (even, odd) sign-extended int8 nibbles."""
    lo = jnp.bitwise_and(q, 0xF).astype(jnp.int8)
    hi = jnp.right_shift(q, 4).astype(jnp.int8)
    # two's-complement sign extension of a 4-bit value: (v ^ 8) - 8
    return (lo ^ 8) - 8, (hi ^ 8) - 8


def _int4_dot(x: jax.Array, q: jax.Array, s: jax.Array) -> jax.Array:
    """x [.., K] @ packed-int4 (q [Kg, G/2, F], s [Kg, 1, F]) -> [.., F].

    Splits the contraction into even/odd in-group input positions so each
    nibble plane dots WITHOUT an interleave (x is tiny; strided-slicing it
    is free, re-interleaving the weight tensor would materialize it).
    """
    Kg, Gh, F = q.shape
    xg = x.reshape(*x.shape[:-1], Kg, 2 * Gh)
    lo, hi = _unpack_nibbles(q)
    y = jnp.einsum(
        "...kg,kgf->...kf", xg[..., 0::2], lo.astype(x.dtype),
        preferred_element_type=jnp.float32,
    ) + jnp.einsum(
        "...kg,kgf->...kf", xg[..., 1::2], hi.astype(x.dtype),
        preferred_element_type=jnp.float32,
    )
    return jnp.einsum("...kf,kf->...f", y, s[:, 0, :])


def quantize_gpt2_weights(params: dict, mode: str = "int8",
                          group: int = 128) -> dict:
    """Weight quantization for serving (mode "int8" or "int4").

    Beyond the reference (which only quantizes KV): batch-1 decode is
    weight-bandwidth bound, so int8 weights nearly halve step time (measured
    548 GB/s of int8 bytes through XLA's fused convert+dot on v5e — the
    convert does NOT materialize in HBM) and int4 halves the stream again.
    Returns a params pytree where every large matmul weight is replaced by
    {"q": int8, "s"} (per output channel) or {"q4": packed uint8, "s"}
    (group-wise, quantize_int4_weights); embeddings/norms/biases stay in the original
    dtype. `wte` additionally gets a quantized lm-head copy (`lm_q`/`lm_s`
    or `lm_q4`/`lm_s4`) while the bf16 table is kept for the (tiny)
    embedding lookups.
    """
    if mode == "int8":
        q = quantize_int8_weights
    else:
        q = partial(quantize_int4_weights, group=group)

    blocks = dict(params["blocks"])
    for name in ("attn_w", "attn_proj_w", "fc_w", "fc_proj_w"):
        blocks[name] = q(blocks[name])
    out = dict(params)
    out["blocks"] = blocks
    lm = q(params["wte"].T)  # [E, V]
    if mode == "int8":
        out["lm_q"], out["lm_s"] = lm["q"], lm["s"]
    else:
        out["lm_q4"], out["lm_s4"] = lm["q4"], lm["s"]
    return out


def _mm(x: jax.Array, w, b=None) -> jax.Array:
    """x @ w (+ b) where w is a dense array or an int8 {"q", "s"} dict.

    The int8 path multiplies in the compute dtype and scales the f32
    accumulator per output channel; XLA fuses the convert into the dot (no
    dequantized copy in HBM).
    """
    if isinstance(w, dict) and "q4" in w:
        y = _int4_dot(x, w["q4"], w["s"])
    elif isinstance(w, dict):
        y = jnp.dot(
            x, w["q"].astype(x.dtype), preferred_element_type=jnp.float32
        ) * w["s"]
    else:
        y = jnp.dot(x, w, preferred_element_type=jnp.float32)
    if b is not None:
        y = y + b.astype(jnp.float32)
    return y.astype(x.dtype)


def _layer_norm(x: jax.Array, g: jax.Array, b: jax.Array, eps: float) -> jax.Array:
    """LayerNorm with fp32 statistics (matches HF under bf16 weights)."""
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return (y * g.astype(jnp.float32) + b.astype(jnp.float32)).astype(x.dtype)


def _gelu_new(x: jax.Array) -> jax.Array:
    """HF "gelu_new" tanh approximation (transformers activations.NewGELU)."""
    x32 = x.astype(jnp.float32)
    y = 0.5 * x32 * (
        1.0 + jnp.tanh(math.sqrt(2.0 / math.pi) * (x32 + 0.044715 * x32**3))
    )
    return y.astype(x.dtype)


def gpt2_forward(
    params: dict,
    cfg: GPT2Config,
    tokens: jax.Array,  # [B, T] int32
    positions: jax.Array,  # [B, T] int32 — caller controls (HF position quirk)
    cache,  # strategy cache state (or None for cache-free forward)
    strategy,  # KVCacheStrategy (see cache/kvcache.py)
    seq_mask: Optional[jax.Array] = None,  # [B, T] bool, True = real token
) -> Tuple[jax.Array, Any]:
    """One forward pass (prefill T>1 or decode T=1) through all layers.

    Returns (logits [B, T, vocab] float32, updated cache state).

    The attention-over-cache computation is delegated to
    `strategy.layer_attend(...)`, which receives this layer's q/k/v and the
    per-layer cache slice; the model body is identical for every cache policy
    (dense, quantized, paged, trimmed — the trim itself runs between steps in
    the engine, reproducing /root/reference/src/benchmarking/benchmarker.py:188-207).
    """
    B, T = tokens.shape
    E, H, D = cfg.n_embd, cfg.n_head, cfg.head_dim

    wte = params["wte"]
    wpe = params["wpe"]
    x = wte[tokens] + wpe[positions]  # [B, T, E]
    if seq_mask is not None:
        x = jnp.where(seq_mask[..., None], x, jnp.zeros_like(x))

    blocks = params["blocks"]
    layer_caches = strategy.cache_layer_slices(cache)

    def layer_body(x, layer_in):
        bp, layer_cache = layer_in
        h = _layer_norm(x, bp["ln1_g"], bp["ln1_b"], cfg.layer_norm_epsilon)
        qkv = _mm(h, bp["attn_w"], bp["attn_b"])  # [B, T, 3E]
        q, k, v = jnp.split(qkv, 3, axis=-1)
        # [B, T, H, D] -> [B, H, T, D]
        q = q.reshape(B, T, H, D).transpose(0, 2, 1, 3)
        k = k.reshape(B, T, H, D).transpose(0, 2, 1, 3)
        v = v.reshape(B, T, H, D).transpose(0, 2, 1, 3)

        attn_out, layer_cache = strategy.layer_attend(
            layer_cache, cache, q, k, v, seq_mask
        )  # [B, H, T, D]

        a = attn_out.transpose(0, 2, 1, 3).reshape(B, T, E).astype(x.dtype)
        a = _mm(a, bp["attn_proj_w"], bp["attn_proj_b"])
        x = x + a

        h2 = _layer_norm(x, bp["ln2_g"], bp["ln2_b"], cfg.layer_norm_epsilon)
        m = _gelu_new(_mm(h2, bp["fc_w"], bp["fc_b"]))
        m = _mm(m, bp["fc_proj_w"], bp["fc_proj_b"])
        x = x + m
        return x, layer_cache

    x, new_layer_caches = jax.lax.scan(
        layer_body, x, (blocks, layer_caches), unroll=cfg.scan_unroll
    )
    cache = strategy.cache_with_layer_slices(cache, new_layer_caches, T)

    x = _layer_norm(x, params["lnf_g"], params["lnf_b"], cfg.layer_norm_epsilon)
    # Keep operands in the weight dtype (bf16 on TPU: MXU-native, half the
    # HBM traffic of an fp32 upcast) and accumulate in fp32.
    if "lm_q" in params:  # int8 weight-quantized lm head (serving mode)
        logits = jnp.dot(
            x, params["lm_q"].astype(x.dtype), preferred_element_type=jnp.float32
        ) * params["lm_s"]
    elif "lm_q4" in params:  # grouped-int4 lm head
        logits = _int4_dot(x, params["lm_q4"], params["lm_s4"])
    else:
        logits = jnp.einsum(
            "bte,ve->btv", x, wte, preferred_element_type=jnp.float32
        )  # [B, T, V]
    return logits, cache


# ---------------------------------------------------------------------------
# HuggingFace weight conversion
# ---------------------------------------------------------------------------

def params_from_hf_state_dict(state_dict, cfg: GPT2Config, dtype=jnp.float32) -> dict:
    """Convert a HF GPT2LMHeadModel state_dict to the stacked-layer layout.

    Works offline: the HF model can be built from config with random init
    (`GPT2LMHeadModel(GPT2Config(...))`) — no hub access required. HF Conv1D
    already stores weights as [in, out], matching our `y = x @ W + b`.
    """

    def g(name):
        t = state_dict[name]
        return jnp.asarray(np.asarray(t.detach().cpu().numpy()), dtype)

    def stack(fmt):
        return jnp.stack([g(fmt.format(i)) for i in range(cfg.n_layer)])

    return {
        "wte": g("transformer.wte.weight"),
        "wpe": g("transformer.wpe.weight"),
        "blocks": {
            "ln1_g": stack("transformer.h.{}.ln_1.weight"),
            "ln1_b": stack("transformer.h.{}.ln_1.bias"),
            "attn_w": stack("transformer.h.{}.attn.c_attn.weight"),
            "attn_b": stack("transformer.h.{}.attn.c_attn.bias"),
            "attn_proj_w": stack("transformer.h.{}.attn.c_proj.weight"),
            "attn_proj_b": stack("transformer.h.{}.attn.c_proj.bias"),
            "ln2_g": stack("transformer.h.{}.ln_2.weight"),
            "ln2_b": stack("transformer.h.{}.ln_2.bias"),
            "fc_w": stack("transformer.h.{}.mlp.c_fc.weight"),
            "fc_b": stack("transformer.h.{}.mlp.c_fc.bias"),
            "fc_proj_w": stack("transformer.h.{}.mlp.c_proj.weight"),
            "fc_proj_b": stack("transformer.h.{}.mlp.c_proj.bias"),
        },
        "lnf_g": g("transformer.ln_f.weight"),
        "lnf_b": g("transformer.ln_f.bias"),
    }


def param_bytes(params) -> int:
    return sum(
        int(np.prod(p.shape)) * jnp.dtype(p.dtype).itemsize
        for p in jax.tree.leaves(params)
    )
