"""Jitted prefill / decode-loop builders.

TPU-native replacement for the reference's per-step Python decode loops
(/root/reference/src/benchmarking/benchmarker.py:63-639). The whole
generation runs device-side:

* prefill: one forward over the bucket-padded prompt, cache written in place;
* decode: `jax.lax.scan` over max_new_tokens with a donated cache — one
  compiled step, zero host round-trips, eviction applied in-graph each step;
* no_cache baseline: `lax.while_loop` re-feeding the whole sequence with EOS
  early-exit (the only path with an EOS check, mirroring benchmarker.py:94-96).

Positional quirk preserved for parity: the new token's position index equals
the *current (post-trim) cache length* — exactly what HF computes from
`past_key_values.get_seq_length()` when the reference shrinks the cache
between steps.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ..models.registry import ModelSpec


@dataclasses.dataclass(frozen=True)
class SamplingParams:
    """Decode-time sampling (beyond the reference, which is greedy-only).

    temperature == 0 selects greedy argmax (exact reference behavior);
    top_k == 0 disables top-k; top_p == 1.0 disables nucleus filtering.
    """

    temperature: float = 0.0
    top_k: int = 0
    top_p: float = 1.0
    seed: int = 0

    @property
    def greedy(self) -> bool:
        return self.temperature <= 0.0


def sample_token(logits: jax.Array, key: jax.Array, sp: SamplingParams) -> jax.Array:
    """Sample next token ids from [B, V] logits under SamplingParams."""
    if sp.greedy:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    x = logits.astype(jnp.float32) / sp.temperature
    if sp.top_k and sp.top_k > 0:
        kth = jnp.sort(x, axis=-1)[:, -sp.top_k][:, None]
        x = jnp.where(x >= kth, x, -jnp.inf)
    if sp.top_p < 1.0:
        sorted_x = jnp.sort(x, axis=-1)[:, ::-1]
        probs = jax.nn.softmax(sorted_x, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # keep tokens until cumulative prob exceeds top_p (always >= 1 token)
        cutoff_idx = jnp.sum((cum < sp.top_p).astype(jnp.int32), axis=-1)
        cutoff = jnp.take_along_axis(sorted_x, cutoff_idx[:, None], axis=-1)
        x = jnp.where(x >= cutoff, x, -jnp.inf)
    return jax.random.categorical(key, x, axis=-1).astype(jnp.int32)


def make_prefill(model: ModelSpec, strategy, trim_fn: Optional[Callable] = None):
    """Build jitted prefill: (params, tokens [B,Tpad], true_len) -> (cache, last_logits)."""

    def prefill(params, tokens, true_len):
        B, Tpad = tokens.shape
        cache = strategy.init()
        pos = jnp.minimum(
            jax.lax.broadcasted_iota(jnp.int32, (B, Tpad), 1), model.n_positions - 1
        )
        seq_mask = jax.lax.broadcasted_iota(jnp.int32, (B, Tpad), 1) < true_len
        logits, cache = model.forward(params, tokens, pos, cache, strategy, seq_mask)
        cache = strategy.set_length(cache, true_len)
        if trim_fn is not None:
            cache = trim_fn(cache)
        idx = jnp.broadcast_to((true_len - 1)[None, None, None], (B, 1, 1))
        last = jnp.take_along_axis(logits, idx, axis=1)[:, 0]
        return cache, last

    return jax.jit(prefill)


def make_decode(
    model: ModelSpec,
    strategy,
    trim_fn: Optional[Callable],
    max_new_tokens: int,
):
    """Build jitted decode loop: (params, cache, last_logits) -> (tokens [B,N], cache).

    Greedy argmax with vocab clamp every step (benchmarker.py:136-139); no EOS
    check (matching every cached path of the reference).
    """

    def decode(params, cache, last_logits):
        B = last_logits.shape[0]

        pos_of = getattr(strategy, "position", lambda c: c["length"])

        def step(carry, _):
            cache, logits = carry
            tok = jnp.clip(
                jnp.argmax(logits, axis=-1).astype(jnp.int32), 0, model.vocab_size - 1
            )  # [B]
            pos = jnp.minimum(pos_of(cache), model.n_positions - 1)
            pos = jnp.broadcast_to(pos[None, None], (B, 1)).astype(jnp.int32)
            logits2, cache = model.forward(
                params, tok[:, None], pos, cache, strategy, None
            )
            cache = strategy.set_length(cache, cache["length"] + 1)
            if trim_fn is not None:
                cache = trim_fn(cache)
            return (cache, logits2[:, 0]), tok

        (cache, _), toks = jax.lax.scan(
            step, (cache, last_logits), None, length=max_new_tokens
        )
        return toks.T, cache  # [B, max_new_tokens]

    return jax.jit(decode, donate_argnums=(1,))


def make_no_cache_loop(
    model: ModelSpec,
    strategy,
    max_new_tokens: int,
    total_cap: int,
    eos_id: Optional[int] = None,
):
    """Build the no-cache baseline loop (benchmarker.py:63-100).

    Re-feeds the entire growing sequence each step; stops early after
    generating EOS (EOS is counted in n_new, as in the reference where the
    break comes after the append).
    """

    def run(params, tokens, true_len):  # tokens: [B, total_cap] right-padded
        B = tokens.shape[0]
        pos = jnp.minimum(
            jax.lax.broadcasted_iota(jnp.int32, (B, total_cap), 1),
            model.n_positions - 1,
        )
        col = jax.lax.broadcasted_iota(jnp.int32, (B, total_cap), 1)

        def cond(state):
            _, _, n_new, done = state
            return jnp.logical_and(~done, n_new < max_new_tokens)

        def body(state):
            gen, length, n_new, done = state
            seq_mask = col < length
            logits, _ = model.forward(
                params, gen, pos, strategy.init(), strategy, seq_mask
            )
            idx = jnp.broadcast_to((length - 1)[None, None, None], (B, 1, 1))
            last = jnp.take_along_axis(logits, idx, axis=1)[:, 0]
            tok = jnp.clip(
                jnp.argmax(last, axis=-1).astype(jnp.int32), 0, model.vocab_size - 1
            )
            gen = jax.lax.dynamic_update_slice(gen, tok[:, None], (0, length))
            if eos_id is not None:
                done = tok[0] == eos_id
            return gen, length + 1, n_new + 1, done

        init = (tokens, true_len, jnp.zeros((), jnp.int32), jnp.zeros((), bool))
        gen, length, n_new, _ = jax.lax.while_loop(cond, body, init)
        return gen, n_new

    return jax.jit(run)


def make_generate(
    model: ModelSpec,
    strategy,
    trim_fn: Optional[Callable],
    max_new_tokens: int,
    sampling: Optional[SamplingParams] = None,
    mega: Optional[dict] = None,
):
    """Single-dispatch generation: prefill + decode scan in ONE jit call.

    Device dispatch through the remote runtime has a fixed per-call cost
    (~tens of ms via the axon relay); one call per generation instead of two
    (prefill, decode) halves it. Returns (tokens [B, N], final_cache_length).

    When `mega` is given (a dict with "packed" weights, "cfg", "capacity",
    "interpret" — see engine._mega_spec), each decode step runs as ONE
    whole-step Pallas program instead of the XLA layer scan
    (ops/pallas/megakernel.py). Prefill keeps the XLA path.
    """
    prefill = _prefill_body(model, strategy, trim_fn)
    if mega is not None:
        # The packed tile stream rides in as a runtime argument under
        # "__mega_packed__" (engine attaches it) — closure-capturing GiB-scale
        # device arrays turns them into traced constants, which ballooned the
        # Llama-1B compile from seconds to >30 min through the remote relay.
        decode_body = _mega_decode_body(model, max_new_tokens, mega)

        def generate(params, tokens, true_len):
            params = dict(params)
            packed = params.pop("__mega_packed__")
            cache, last = prefill(params, tokens, true_len)
            toks, cache = decode_body(params, packed, cache, last)
            return toks, cache["length"]

    else:
        decode_body = _decode_body(
            model, strategy, trim_fn, max_new_tokens, sampling
        )

        def generate(params, tokens, true_len):
            cache, last = prefill(params, tokens, true_len)
            toks, cache = decode_body(params, cache, last)
            return toks, cache["length"]

    return jax.jit(generate)


def _mega_decode_body(model: ModelSpec, max_new_tokens: int, mega: dict):
    """Decode loop over whole-step megakernel calls (greedy, batch 1)."""
    if mega.get("kv_mode"):
        return _mega_quant_decode_body(model, max_new_tokens, mega)
    if mega.get("kind") == "llama":
        return _llama_mega_decode_body(model, max_new_tokens, mega)
    from ..ops.pallas.megakernel import gpt2_megastep, to_mega_layout

    cfg = mega["cfg"]
    capacity = mega["capacity"]
    interpret = mega.get("interpret", False)

    def decode(params, packed, cache, last_logits):
        wte, wpe = params["wte"], params["wpe"]

        def step(carry, _):
            k, v, length, tok = carry
            pos = jnp.minimum(length, model.n_positions - 1)
            x = (wte[tok][None] + wpe[pos][None]).astype(wte.dtype)  # [1, E]
            tok2, k, v = gpt2_megastep(
                packed, k, v, length, x,
                cfg=cfg, capacity=capacity, interpret=interpret,
            )
            tok2 = jnp.clip(tok2, 0, model.vocab_size - 1)
            return (k, v, length + 1, tok2), tok

        tok0 = jnp.clip(
            jnp.argmax(last_logits[0]).astype(jnp.int32), 0,
            model.vocab_size - 1,
        )
        init = (
            to_mega_layout(cache["k"]),
            to_mega_layout(cache["v"]),
            cache["length"],
            tok0,
        )
        (_, _, length, _), toks = jax.lax.scan(
            step, init, None, length=max_new_tokens
        )
        return toks[None, :], {"length": length}

    return decode


def _mega_quant_decode_body(model: ModelSpec, max_new_tokens: int, mega: dict):
    """Decode loop over quantized-KV whole-step megakernel calls.

    The scan carry holds the quantized panes (int8 [L, C, E] / packed-int4
    uint8 [L, C, E/2]) plus the [L, C] fp32 per-token scale tables — the
    QuantizedKV prefill cache converts once (ops/pallas/megakernel_quant.py
    `to_mega_quant_layout`)."""
    if mega.get("kind") == "llama":
        return _llama_mega_quant_decode_body(model, max_new_tokens, mega)
    from ..ops.pallas.megakernel_quant import (
        _kv_kinds,
        gpt2_megastep_quant,
        to_mega_quant_layout,
    )

    cfg = mega["cfg"]
    capacity = mega["capacity"]
    interpret = mega.get("interpret", False)
    kv_mode = mega["kv_mode"]
    eps = mega.get("eps", 1e-8)
    k_kind, v_kind = _kv_kinds(kv_mode)

    def decode(params, packed, cache, last_logits):
        wte, wpe = params["wte"], params["wpe"]

        def step(carry, _):
            k, v, ks, vs, length, tok = carry
            pos = jnp.minimum(length, model.n_positions - 1)
            x = (wte[tok][None] + wpe[pos][None]).astype(wte.dtype)  # [1, E]
            tok2, k, v, ks, vs = gpt2_megastep_quant(
                packed, k, v, ks, vs, length, x,
                cfg=cfg, capacity=capacity, kv_mode=kv_mode, eps=eps,
                interpret=interpret,
            )
            tok2 = jnp.clip(tok2, 0, model.vocab_size - 1)
            return (k, v, ks, vs, length + 1, tok2), tok

        tok0 = jnp.clip(
            jnp.argmax(last_logits[0]).astype(jnp.int32), 0,
            model.vocab_size - 1,
        )
        init = (
            to_mega_quant_layout(cache["k"], k_kind),
            to_mega_quant_layout(cache["v"], v_kind),
            cache["k_scale"],
            cache["v_scale"],
            cache["length"],
            tok0,
        )
        (_, _, _, _, length, _), toks = jax.lax.scan(
            step, init, None, length=max_new_tokens
        )
        return toks[None, :], {"length": length}

    return decode


def _llama_mega_quant_decode_body(
    model: ModelSpec, max_new_tokens: int, mega: dict
):
    """Llama decode loop over quantized-KV whole-step megakernel calls."""
    from ..models.llama import rope_cos_sin
    from ..ops.pallas.megakernel_quant import (
        _kv_kinds,
        llama_megastep_quant,
        to_mega_quant_layout,
    )

    cfg = mega["cfg"]
    capacity = mega["capacity"]
    interpret = mega.get("interpret", False)
    kv_mode = mega["kv_mode"]
    eps = mega.get("eps", 1e-8)
    k_kind, v_kind = _kv_kinds(kv_mode)

    def decode(params, packed, cache, last_logits):
        embed = params["embed"]

        def step(carry, _):
            k, v, ks, vs, length, tok = carry
            pos = jnp.minimum(length, model.n_positions - 1)
            x = embed[tok][None].astype(embed.dtype)  # [1, E]
            cos, sin = rope_cos_sin(
                pos[None, None], cfg.head_dim, cfg.rope_theta
            )  # [1, 1, D] each
            cos_q = jnp.tile(cos[0], (1, cfg.n_head))  # [1, Hq*D]
            sin_q = jnp.tile(sin[0], (1, cfg.n_head))
            tok2, k, v, ks, vs = llama_megastep_quant(
                packed, k, v, ks, vs, length, x, cos_q, sin_q,
                cfg=cfg, capacity=capacity, kv_mode=kv_mode, eps=eps,
                interpret=interpret,
            )
            tok2 = jnp.clip(tok2, 0, model.vocab_size - 1)
            return (k, v, ks, vs, length + 1, tok2), tok

        tok0 = jnp.clip(
            jnp.argmax(last_logits[0]).astype(jnp.int32), 0,
            model.vocab_size - 1,
        )
        init = (
            to_mega_quant_layout(cache["k"], k_kind),
            to_mega_quant_layout(cache["v"], v_kind),
            cache["k_scale"],
            cache["v_scale"],
            cache["length"],
            tok0,
        )
        (_, _, _, _, length, _), toks = jax.lax.scan(
            step, init, None, length=max_new_tokens
        )
        return toks[None, :], {"length": length}

    return decode


def _llama_mega_decode_body(model: ModelSpec, max_new_tokens: int, mega: dict):
    """Llama decode loop over whole-step megakernel calls (greedy, batch 1)."""
    from ..models.llama import rope_cos_sin
    from ..ops.pallas.megakernel_llama import llama_megastep, to_mega_layout

    cfg = mega["cfg"]
    capacity = mega["capacity"]
    interpret = mega.get("interpret", False)

    def decode(params, packed, cache, last_logits):
        embed = params["embed"]

        def step(carry, _):
            k, v, length, tok = carry
            pos = jnp.minimum(length, model.n_positions - 1)
            x = embed[tok][None].astype(embed.dtype)  # [1, E]
            cos, sin = rope_cos_sin(
                pos[None, None], cfg.head_dim, cfg.rope_theta
            )  # [1, 1, D] each
            cos_q = jnp.tile(cos[0], (1, cfg.n_head))  # [1, Hq*D]
            sin_q = jnp.tile(sin[0], (1, cfg.n_head))
            tok2, k, v = llama_megastep(
                packed, k, v, length, x, cos_q, sin_q,
                cfg=cfg, capacity=capacity, interpret=interpret,
            )
            tok2 = jnp.clip(tok2, 0, model.vocab_size - 1)
            return (k, v, length + 1, tok2), tok

        tok0 = jnp.clip(
            jnp.argmax(last_logits[0]).astype(jnp.int32), 0,
            model.vocab_size - 1,
        )
        init = (
            to_mega_layout(cache["k"]),
            to_mega_layout(cache["v"]),
            cache["length"],
            tok0,
        )
        (_, _, length, _), toks = jax.lax.scan(
            step, init, None, length=max_new_tokens
        )
        return toks[None, :], {"length": length}

    return decode


def make_generate_batch(model: ModelSpec, strategy, max_new_tokens: int,
                        mega: dict):
    """Static-batch generation: B prompts decode TOGETHER in one dispatch.

    Prefill is one batched forward with per-row lengths (per-row seq_mask,
    per-row last-logit gather); every decode step is ONE batched whole-step
    megakernel program (ops/pallas/megakernel_batch.py), so the dominant
    per-step weight stream is paid once for B tokens. Greedy only. Returns
    (tokens [B, N], final per-row lengths [B]).
    """
    from ..ops.pallas.megakernel_batch import (
        gpt2_megabatch,
        llama_megabatch,
        to_mega_layout_batch,
    )

    cfg = mega["cfg"]
    capacity = mega["capacity"]
    interpret = mega.get("interpret", False)
    llama = mega.get("kind") == "llama"
    kv_mode = mega.get("kv_mode")
    if kv_mode:
        return _make_generate_batch_quant(model, strategy, max_new_tokens,
                                          mega)
    if llama:
        from ..models.llama import rope_cos_sin

    def generate(params, tokens, true_lens):
        params = dict(params)
        packed = params.pop("__mega_packed__")
        B, Tpad = tokens.shape
        cache = strategy.init()
        pos = jnp.minimum(
            jax.lax.broadcasted_iota(jnp.int32, (B, Tpad), 1),
            model.n_positions - 1,
        )
        col = jax.lax.broadcasted_iota(jnp.int32, (B, Tpad), 1)
        seq_mask = col < true_lens[:, None]
        logits, cache = model.forward(
            params, tokens, pos, cache, strategy, seq_mask
        )
        last = jnp.take_along_axis(
            logits, (true_lens - 1)[:, None, None], axis=1
        )[:, 0]  # [B, V] — row b's logits at its own last prompt token
        tok0 = jnp.clip(
            jnp.argmax(last, axis=-1).astype(jnp.int32), 0,
            model.vocab_size - 1,
        )
        kb = to_mega_layout_batch(cache["k"])
        vb = to_mega_layout_batch(cache["v"])

        if llama:
            embed = params["embed"]

            def step(carry, _):
                kb, vb, lengths, tok = carry
                pos = jnp.minimum(lengths, model.n_positions - 1)
                x = embed[tok].astype(embed.dtype)  # [B, E]
                cos, sin = rope_cos_sin(
                    pos[:, None], cfg.head_dim, cfg.rope_theta
                )  # [B, 1, D]
                cos_q = jnp.tile(cos[:, 0], (1, cfg.n_head))  # [B, Hq*D]
                sin_q = jnp.tile(sin[:, 0], (1, cfg.n_head))
                tok2, kb, vb = llama_megabatch(
                    packed, kb, vb, lengths, x, cos_q, sin_q,
                    cfg=cfg, capacity=capacity, interpret=interpret,
                )
                tok2 = jnp.clip(tok2, 0, model.vocab_size - 1)
                return (kb, vb, lengths + 1, tok2), tok

        else:
            wte, wpe = params["wte"], params["wpe"]

            def step(carry, _):
                kb, vb, lengths, tok = carry
                pos = jnp.minimum(lengths, model.n_positions - 1)
                x = (wte[tok] + wpe[pos]).astype(wte.dtype)  # [B, E]
                tok2, kb, vb = gpt2_megabatch(
                    packed, kb, vb, lengths, x,
                    cfg=cfg, capacity=capacity, interpret=interpret,
                )
                tok2 = jnp.clip(tok2, 0, model.vocab_size - 1)
                return (kb, vb, lengths + 1, tok2), tok

        init = (kb, vb, true_lens.astype(jnp.int32), tok0)
        (_, _, lengths, _), toks = jax.lax.scan(
            step, init, None, length=max_new_tokens
        )
        return toks.T, lengths  # [B, max_new_tokens], [B]

    return jax.jit(generate)


def _make_generate_batch_quant(model: ModelSpec, strategy,
                               max_new_tokens: int, mega: dict):
    """Batched generation over QUANTIZED KV panes.

    Prefill stays on the fast dense XLA path; the dense panes quantize once
    (per-(slot, token) scales, reference math) and every decode step is ONE
    batched quant-KV whole-step megakernel program
    (ops/pallas/megakernel_batch_quant.py). Per-row semantics equal the
    engine's single-stream quant_{int8,int4,mixed} methods.
    """
    from ..ops.pallas.megakernel_batch import to_mega_layout_batch
    from ..ops.pallas.megakernel_batch_quant import (
        gpt2_megabatch_quant,
        llama_megabatch_quant,
        quantize_panes_batch,
    )

    cfg = mega["cfg"]
    capacity = mega["capacity"]
    interpret = mega.get("interpret", False)
    kv_mode = mega["kv_mode"]
    eps = mega.get("eps", 1e-8)
    llama = mega.get("kind") == "llama"
    if llama:
        from ..models.llama import rope_cos_sin

    def generate(params, tokens, true_lens):
        params = dict(params)
        packed = params.pop("__mega_packed__")
        B, Tpad = tokens.shape
        cache = strategy.init()
        pos = jnp.minimum(
            jax.lax.broadcasted_iota(jnp.int32, (B, Tpad), 1),
            model.n_positions - 1,
        )
        col = jax.lax.broadcasted_iota(jnp.int32, (B, Tpad), 1)
        seq_mask = col < true_lens[:, None]
        logits, cache = model.forward(
            params, tokens, pos, cache, strategy, seq_mask
        )
        last = jnp.take_along_axis(
            logits, (true_lens - 1)[:, None, None], axis=1
        )[:, 0]
        tok0 = jnp.clip(
            jnp.argmax(last, axis=-1).astype(jnp.int32), 0,
            model.vocab_size - 1,
        )
        kb, vb, ks, vs = quantize_panes_batch(
            to_mega_layout_batch(cache["k"]),
            to_mega_layout_batch(cache["v"]),
            kv_mode, eps,
        )

        if llama:
            embed = params["embed"]

            def step(carry, _):
                kb, vb, ks, vs, lengths, tok = carry
                pos = jnp.minimum(lengths, model.n_positions - 1)
                x = embed[tok].astype(embed.dtype)  # [B, E]
                cos, sin = rope_cos_sin(
                    pos[:, None], cfg.head_dim, cfg.rope_theta
                )
                cos_q = jnp.tile(cos[:, 0], (1, cfg.n_head))
                sin_q = jnp.tile(sin[:, 0], (1, cfg.n_head))
                tok2, kb, vb, ks, vs = llama_megabatch_quant(
                    packed, kb, vb, ks, vs, lengths, x, cos_q, sin_q,
                    cfg=cfg, capacity=capacity, kv_mode=kv_mode, eps=eps,
                    interpret=interpret,
                )
                tok2 = jnp.clip(tok2, 0, model.vocab_size - 1)
                return (kb, vb, ks, vs, lengths + 1, tok2), tok

        else:
            wte, wpe = params["wte"], params["wpe"]

            def step(carry, _):
                kb, vb, ks, vs, lengths, tok = carry
                pos = jnp.minimum(lengths, model.n_positions - 1)
                x = (wte[tok] + wpe[pos]).astype(wte.dtype)  # [B, E]
                tok2, kb, vb, ks, vs = gpt2_megabatch_quant(
                    packed, kb, vb, ks, vs, lengths, x,
                    cfg=cfg, capacity=capacity, kv_mode=kv_mode, eps=eps,
                    interpret=interpret,
                )
                tok2 = jnp.clip(tok2, 0, model.vocab_size - 1)
                return (kb, vb, ks, vs, lengths + 1, tok2), tok

        init = (kb, vb, ks, vs, true_lens.astype(jnp.int32), tok0)
        (_, _, _, _, lengths, _), toks = jax.lax.scan(
            step, init, None, length=max_new_tokens
        )
        return toks.T, lengths  # [B, max_new_tokens], [B]

    return jax.jit(generate)


def _prefill_body(model, strategy, trim_fn):
    def prefill(params, tokens, true_len):
        B, Tpad = tokens.shape
        cache = strategy.init()
        pos = jnp.minimum(
            jax.lax.broadcasted_iota(jnp.int32, (B, Tpad), 1), model.n_positions - 1
        )
        seq_mask = jax.lax.broadcasted_iota(jnp.int32, (B, Tpad), 1) < true_len
        logits, cache = model.forward(params, tokens, pos, cache, strategy, seq_mask)
        cache = strategy.set_length(cache, true_len)
        if trim_fn is not None:
            cache = trim_fn(cache)
        idx = jnp.broadcast_to((true_len - 1)[None, None, None], (B, 1, 1))
        last = jnp.take_along_axis(logits, idx, axis=1)[:, 0]
        return cache, last

    return prefill


def _decode_body(model, strategy, trim_fn, max_new_tokens, sampling=None):
    sp = sampling or SamplingParams()

    def decode(params, cache, last_logits):
        B = last_logits.shape[0]
        key0 = jax.random.PRNGKey(sp.seed)

        pos_of = getattr(strategy, "position", lambda c: c["length"])

        def step(carry, _):
            cache, logits, key = carry
            key, sub = jax.random.split(key)
            tok = jnp.clip(sample_token(logits, sub, sp), 0, model.vocab_size - 1)
            pos = jnp.minimum(pos_of(cache), model.n_positions - 1)
            pos = jnp.broadcast_to(pos[None, None], (B, 1)).astype(jnp.int32)
            logits2, cache = model.forward(
                params, tok[:, None], pos, cache, strategy, None
            )
            cache = strategy.set_length(cache, cache["length"] + 1)
            if trim_fn is not None:
                cache = trim_fn(cache)
            return (cache, logits2[:, 0], key), tok

        (cache, _, _), toks = jax.lax.scan(
            step, (cache, last_logits, key0), None, length=max_new_tokens
        )
        return toks.T, cache

    return decode


def bucket_for(
    length: int, buckets=(16, 32, 64, 128, 256, 512, 1024, 2048, 4096, 8192)
) -> int:
    """Smallest bucket >= length (bounds XLA recompiles across prompt sizes).

    The table extends to 8192 so long-context models (llama/mixtral allow
    n_positions=8192) can take >1024-token prompts on the non-truncating
    methods; the engine clamps the chosen bucket to model.n_positions.
    """
    for b in buckets:
        if length <= b:
            return b
    return buckets[-1]
