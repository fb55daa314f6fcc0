"""Llama model family implemented natively in JAX (RoPE, RMSNorm, GQA, SwiGLU).

The reference never implements a model (it injects HF AutoModelForCausalLM,
/root/reference/src/benchmarking/benchmarker.py:44-59); Llama support is the
BASELINE.json north-star extension ("Llama-3-8B paged INT4 KV-cache...").
Same stacked-layer + lax.scan layout and cache-strategy interface as
models/gpt2.py; numerics match HF LlamaForCausalLM (rotate-half RoPE, fp32
RMSNorm, 1/sqrt(d) attention scale).

Qwen2/Qwen2.5 (the model the reference's summarization example actually
runs, /root/reference/examples/summarization_benchmark.py:13) is served by
this same family: identical architecture plus q/k/v projection biases
(`LlamaConfig.qkv_bias`); numerics match HF Qwen2ForCausalLM
(tests/test_qwen_parity.py).
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .gpt2 import _mm


@dataclasses.dataclass(frozen=True)
class LlamaConfig:
    vocab_size: int = 128256
    hidden_size: int = 4096
    intermediate_size: int = 14336
    n_layer: int = 32
    n_head: int = 32
    n_kv_head: int = 8
    n_positions: int = 8192  # max_position_embeddings
    rope_theta: float = 500000.0
    rms_eps: float = 1e-5
    tie_embeddings: bool = False
    scan_unroll: int = 1  # see gpt2.GPT2Config.scan_unroll
    qkv_bias: bool = False  # Qwen2 adds bias to q/k/v projections only

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.n_head

    @staticmethod
    def llama3_8b() -> "LlamaConfig":
        return LlamaConfig()

    @staticmethod
    def llama3_1b() -> "LlamaConfig":
        # Llama-3.2-1B geometry
        return LlamaConfig(
            hidden_size=2048,
            intermediate_size=8192,
            n_layer=16,
            n_head=32,
            n_kv_head=8,
            tie_embeddings=True,
        )

    @staticmethod
    def llama3_3b() -> "LlamaConfig":
        # Llama-3.2-3B geometry
        return LlamaConfig(
            hidden_size=3072,
            intermediate_size=8192,
            n_layer=28,
            n_head=24,
            n_kv_head=8,
            tie_embeddings=True,
        )

    @staticmethod
    def tiny(vocab_size: int = 256) -> "LlamaConfig":
        return LlamaConfig(
            vocab_size=vocab_size,
            hidden_size=64,
            intermediate_size=128,
            n_layer=2,
            n_head=4,
            n_kv_head=2,
            n_positions=512,
            rope_theta=10000.0,
        )

    # Qwen2/Qwen2.5 is the llama architecture + q/k/v projection biases
    # (the reference's flagship example runs Qwen2.5-7B through
    # AutoModelForCausalLM — /root/reference/examples/summarization_benchmark.py:13).
    @staticmethod
    def qwen25_7b() -> "LlamaConfig":
        return LlamaConfig(
            vocab_size=152064, hidden_size=3584, intermediate_size=18944,
            n_layer=28, n_head=28, n_kv_head=4, n_positions=32768,
            rope_theta=1000000.0, rms_eps=1e-6, qkv_bias=True,
        )

    @staticmethod
    def qwen25_15b() -> "LlamaConfig":
        return LlamaConfig(
            vocab_size=151936, hidden_size=1536, intermediate_size=8960,
            n_layer=28, n_head=12, n_kv_head=2, n_positions=32768,
            rope_theta=1000000.0, rms_eps=1e-6, tie_embeddings=True,
            qkv_bias=True,
        )

    @staticmethod
    def qwen25_05b() -> "LlamaConfig":
        return LlamaConfig(
            vocab_size=151936, hidden_size=896, intermediate_size=4864,
            n_layer=24, n_head=14, n_kv_head=2, n_positions=32768,
            rope_theta=1000000.0, rms_eps=1e-6, tie_embeddings=True,
            qkv_bias=True,
        )

    @staticmethod
    def qwen_tiny(vocab_size: int = 256) -> "LlamaConfig":
        return dataclasses.replace(
            LlamaConfig.tiny(vocab_size), qkv_bias=True, rms_eps=1e-6
        )

    @staticmethod
    def by_name(name: str) -> "LlamaConfig":
        table = {
            "llama-3-8b": LlamaConfig.llama3_8b,
            "llama3-8b": LlamaConfig.llama3_8b,
            "llama-3-1b": LlamaConfig.llama3_1b,
            "llama-3-3b": LlamaConfig.llama3_3b,
            "llama-tiny": LlamaConfig.tiny,
            "qwen2.5-7b": LlamaConfig.qwen25_7b,
            "qwen/qwen2.5-7b": LlamaConfig.qwen25_7b,
            "qwen2.5-1.5b": LlamaConfig.qwen25_15b,
            "qwen2.5-0.5b": LlamaConfig.qwen25_05b,
            "qwen-tiny": LlamaConfig.qwen_tiny,
        }
        key = name.lower()
        if key not in table:
            raise ValueError(f"Unknown llama variant: {name}")
        return table[key]()


def init_llama_params(key: jax.Array, cfg: LlamaConfig, dtype=jnp.float32) -> dict:
    E, L = cfg.hidden_size, cfg.n_layer
    D, Hq, Hkv, I = cfg.head_dim, cfg.n_head, cfg.n_kv_head, cfg.intermediate_size
    keys = jax.random.split(key, 10)
    std = 0.02

    def nrm(k, shape):
        return (jax.random.normal(k, shape, jnp.float32) * std).astype(dtype)

    params = {
        "embed": nrm(keys[0], (cfg.vocab_size, E)),
        "blocks": {
            "ln1": jnp.ones((L, E), dtype),
            "wq": nrm(keys[1], (L, E, Hq * D)),
            "wk": nrm(keys[2], (L, E, Hkv * D)),
            "wv": nrm(keys[3], (L, E, Hkv * D)),
            "wo": nrm(keys[4], (L, Hq * D, E)) / math.sqrt(2 * L),
            "ln2": jnp.ones((L, E), dtype),
            "w_gate": nrm(keys[5], (L, E, I)),
            "w_up": nrm(keys[6], (L, E, I)),
            "w_down": nrm(keys[7], (L, I, E)) / math.sqrt(2 * L),
        },
        "ln_f": jnp.ones((E,), dtype),
    }
    if cfg.qkv_bias:
        bkeys = jax.random.split(keys[9], 3)
        params["blocks"]["bq"] = nrm(bkeys[0], (L, Hq * D))
        params["blocks"]["bk"] = nrm(bkeys[1], (L, Hkv * D))
        params["blocks"]["bv"] = nrm(bkeys[2], (L, Hkv * D))
    if not cfg.tie_embeddings:
        params["lm_head"] = nrm(keys[8], (E, cfg.vocab_size))
    return params


def _rms_norm(x: jax.Array, g: jax.Array, eps: float) -> jax.Array:
    x32 = x.astype(jnp.float32)
    var = jnp.mean(x32 * x32, axis=-1, keepdims=True)
    y = x32 * jax.lax.rsqrt(var + eps)
    # HF casts the normalized value back to the weight dtype before scaling.
    return (y.astype(x.dtype) * g).astype(x.dtype)


def rope_cos_sin(positions: jax.Array, head_dim: int, theta: float):
    """cos/sin tables for HF rotate-half RoPE; positions [B, T] -> [B, T, D]."""
    inv_freq = 1.0 / (
        theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim)
    )  # [D/2]
    freqs = positions.astype(jnp.float32)[..., None] * inv_freq  # [B, T, D/2]
    emb = jnp.concatenate([freqs, freqs], axis=-1)  # [B, T, D]
    return jnp.cos(emb), jnp.sin(emb)


def _rotate_half(x):
    d = x.shape[-1] // 2
    return jnp.concatenate([-x[..., d:], x[..., :d]], axis=-1)


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """x: [B, H, T, D]; cos/sin: [B, T, D]."""
    c = cos[:, None].astype(jnp.float32)
    s = sin[:, None].astype(jnp.float32)
    x32 = x.astype(jnp.float32)
    return ((x32 * c) + (_rotate_half(x32) * s)).astype(x.dtype)


def llama_forward(
    params: dict,
    cfg: LlamaConfig,
    tokens: jax.Array,  # [B, T]
    positions: jax.Array,  # [B, T]
    cache,
    strategy,
    seq_mask: Optional[jax.Array] = None,
):
    B, T = tokens.shape
    E, Hq, Hkv, D = cfg.hidden_size, cfg.n_head, cfg.n_kv_head, cfg.head_dim

    x = params["embed"][tokens]
    if seq_mask is not None:
        x = jnp.where(seq_mask[..., None], x, jnp.zeros_like(x))

    cos, sin = rope_cos_sin(positions, D, cfg.rope_theta)

    blocks = params["blocks"]
    layer_caches = strategy.cache_layer_slices(cache)

    def layer_body(x, layer_in):
        bp, layer_cache = layer_in
        h = _rms_norm(x, bp["ln1"], cfg.rms_eps)
        q = _mm(h, bp["wq"], bp.get("bq")).reshape(B, T, Hq, D).transpose(0, 2, 1, 3)
        k = _mm(h, bp["wk"], bp.get("bk")).reshape(B, T, Hkv, D).transpose(0, 2, 1, 3)
        v = _mm(h, bp["wv"], bp.get("bv")).reshape(B, T, Hkv, D).transpose(0, 2, 1, 3)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)

        attn_out, layer_cache = strategy.layer_attend(
            layer_cache, cache, q, k, v, seq_mask
        )
        a = attn_out.transpose(0, 2, 1, 3).reshape(B, T, Hq * D).astype(x.dtype)
        x = x + _mm(a, bp["wo"])

        h2 = _rms_norm(x, bp["ln2"], cfg.rms_eps)
        gate = jax.nn.silu(_mm(h2, bp["w_gate"]).astype(jnp.float32)).astype(x.dtype)
        up = _mm(h2, bp["w_up"])
        x = x + _mm(gate * up, bp["w_down"])
        return x, layer_cache

    x, new_layer_caches = jax.lax.scan(
        layer_body, x, (blocks, layer_caches), unroll=cfg.scan_unroll
    )
    cache = strategy.cache_with_layer_slices(cache, new_layer_caches, T)

    x = _rms_norm(x, params["ln_f"], cfg.rms_eps)
    # bf16 operands + fp32 accumulation (MXU-native, half the HBM traffic).
    if "lm_q" in params:  # int8 weight-quantized lm head (serving mode)
        logits = jnp.dot(
            x, params["lm_q"].astype(x.dtype), preferred_element_type=jnp.float32
        ) * params["lm_s"]
    elif "lm_q4" in params:  # grouped-int4 lm head
        from .gpt2 import _int4_dot

        logits = _int4_dot(x, params["lm_q4"], params["lm_s4"])
    elif cfg.tie_embeddings:
        logits = jnp.einsum(
            "bte,ve->btv", x, params["embed"], preferred_element_type=jnp.float32
        )
    else:
        logits = jnp.einsum(
            "bte,ev->btv", x, params["lm_head"], preferred_element_type=jnp.float32
        )
    return logits, cache


def quantize_llama_weights(params: dict, mode: str = "int8",
                           group: int = 128) -> dict:
    """Weight quantization for serving (mode "int8" or "int4").

    Same scheme as models/gpt2.py:quantize_gpt2_weights: every matmul weight
    becomes {"q": int8, "s"} (per output channel) or {"q4": int4, "s"}
    (group-wise, gpt2.quantize_int4_weights); embed/norms stay full
    precision; the lm head (tied or untied) gets a quantized copy under
    `lm_q`/`lm_s` (int8) or `lm_q4`/`lm_s4` (int4).
    """
    from functools import partial as _partial

    from .gpt2 import quantize_int4_weights, quantize_int8_weights

    if mode == "int8":
        q = quantize_int8_weights
    else:
        q = _partial(quantize_int4_weights, group=group)

    blocks = dict(params["blocks"])
    for name in ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down"):
        blocks[name] = q(blocks[name])
    out = dict(params)
    out["blocks"] = blocks
    head = params["lm_head"] if "lm_head" in params else params["embed"].T
    lm = q(head)
    out.pop("lm_head", None)
    if mode == "int8":
        out["lm_q"], out["lm_s"] = lm["q"], lm["s"]
    else:
        out["lm_q4"], out["lm_s4"] = lm["q4"], lm["s"]
    return out


def param_bytes_estimate(cfg: LlamaConfig, dtype=jnp.bfloat16) -> int:
    """Rough full-precision parameter footprint (drives host-init routing)."""
    E, I, L = cfg.hidden_size, cfg.intermediate_size, cfg.n_layer
    QW = cfg.n_head * cfg.head_dim
    KW = cfg.n_kv_head * cfg.head_dim
    per_layer = E * QW + 2 * E * KW + QW * E + 3 * E * I
    n = cfg.vocab_size * E + L * per_layer
    if not cfg.tie_embeddings:
        n += E * cfg.vocab_size
    return n * jnp.dtype(dtype).itemsize


def init_quantized_llama_params(
    key: jax.Array, cfg: LlamaConfig, mode: str = "int8",
    dtype=jnp.bfloat16, group: int = 128,
) -> dict:
    """Random-init + weight-quantize ON THE HOST CPU, then place only the
    quantized tensors on the accelerator.

    Lets models whose full-precision weights exceed device HBM be served
    from quantized weights on ONE chip — Llama-3-8B is 16 GiB bf16 (doesn't
    fit a 16 GiB v5e) but 9.3 GiB as int8 / 5.1 GiB as grouped int4
    (BASELINE.json config #5 names Llama-3-8B explicitly). Same PRNG
    stream as init_llama_params (threefry is backend-deterministic), so
    small-model results are bit-identical to quantize-after-device-init.
    """
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        params = init_llama_params(key, cfg, dtype)
        q = quantize_llama_weights(params, mode=mode, group=group)
        del params
    # explicit target: device_put with device=None is an IDENTITY for
    # already-committed arrays, which would leave the weights on the host
    # and silently run the whole generation on CPU
    return jax.device_put(q, jax.devices()[0])


def llama_spec(cfg: LlamaConfig):
    from .registry import ModelSpec

    return ModelSpec(
        name="llama",
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
    return llama_forward(params, cfg, tokens, positions, cache, strategy, seq_mask)


def pad_llama_ffn(params: dict, new_I: int) -> dict:
    """Zero-pad the FFN width of full-precision Llama params to new_I.

    gate/up gain zero output columns, down gains zero input rows —
    exact through SwiGLU (silu(0)*0 contributes nothing and zero down
    rows add nothing), prefill and decode alike. Serves checkpoints on
    the int4w8 padded-FFN geometry (engine._int4w8_llama_spec): pad
    BEFORE quantization so the half-tile scale groups come out uniform.
    """
    b = dict(params["blocks"])
    old_I = b["w_gate"].shape[-1]
    if new_I == old_I:
        return params
    assert new_I > old_I, (old_I, new_I)
    pad = new_I - old_I
    b["w_gate"] = jnp.pad(b["w_gate"], ((0, 0), (0, 0), (0, pad)))
    b["w_up"] = jnp.pad(b["w_up"], ((0, 0), (0, 0), (0, pad)))
    b["w_down"] = jnp.pad(b["w_down"], ((0, 0), (0, pad), (0, 0)))
    out = dict(params)
    out["blocks"] = b
    return out


def params_from_hf_state_dict(state_dict, cfg: LlamaConfig, dtype=jnp.float32) -> dict:
    """Convert HF LlamaForCausalLM weights (offline from-config works too).

    HF nn.Linear stores [out, in]; transposed here to our [in, out] layout.
    """

    def g(name, transpose=False):
        t = state_dict[name]
        a = np.asarray(t.detach().cpu().numpy())
        if transpose:
            a = a.T
        return jnp.asarray(a, dtype)

    def stack(fmt, transpose=False):
        return jnp.stack(
            [g(fmt.format(i), transpose) for i in range(cfg.n_layer)]
        )

    params = {
        "embed": g("model.embed_tokens.weight"),
        "blocks": {
            "ln1": stack("model.layers.{}.input_layernorm.weight"),
            "wq": stack("model.layers.{}.self_attn.q_proj.weight", True),
            "wk": stack("model.layers.{}.self_attn.k_proj.weight", True),
            "wv": stack("model.layers.{}.self_attn.v_proj.weight", True),
            "wo": stack("model.layers.{}.self_attn.o_proj.weight", True),
            "ln2": stack("model.layers.{}.post_attention_layernorm.weight"),
            "w_gate": stack("model.layers.{}.mlp.gate_proj.weight", True),
            "w_up": stack("model.layers.{}.mlp.up_proj.weight", True),
            "w_down": stack("model.layers.{}.mlp.down_proj.weight", True),
        },
        "ln_f": g("model.norm.weight"),
    }
    if cfg.qkv_bias:  # Qwen2 checkpoints carry q/k/v biases, same HF names
        params["blocks"]["bq"] = stack("model.layers.{}.self_attn.q_proj.bias")
        params["blocks"]["bk"] = stack("model.layers.{}.self_attn.k_proj.bias")
        params["blocks"]["bv"] = stack("model.layers.{}.self_attn.v_proj.bias")
    if not cfg.tie_embeddings:
        params["lm_head"] = g("lm_head.weight", True)
    return params
