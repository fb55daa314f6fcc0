"""Speculative greedy decoding: draft-propose, target-verify.

Beyond-reference capability (docs/ROADMAP.md #6): a cheap draft model
proposes k tokens autoregressively; the target verifies all k in ONE
forward pass (one weight-streaming pass instead of k), accepting the
longest matching prefix and emitting the target's own token at the first
mismatch. With greedy acceptance the output stream is IDENTICAL to plain
target greedy decoding for ANY draft — the draft only changes speed, never
tokens (tests/test_speculative.py asserts this with an unrelated random
draft).

Single jitted dispatch per generation: a while_loop over speculation
rounds, each round = one scanned draft burst + one k-token target verify,
with both caches rolled back to the accepted prefix (static-shape buffers
make rollback a pure length update).

Numerics caveat: the identity is exact in fp32 (property-tested). Under
bf16 the verify pass computes logits with [k, E] matmul shapes while plain
decoding uses [1, E], so accumulation order differs and near-tie argmax
positions can flip — the same benign drift class as XLA-vs-torch fp32
differences, not a scheduling bug. Measured on one v5e chip: k=4 with a
3-layer truncated draft reaches ~958 tok/s single-stream vs ~650 for
plain decode (1.47x).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..cache.kvcache import DenseKV
from ..models.registry import ModelSpec


def make_self_draft(spec: ModelSpec, params: dict, n_layers: int):
    """Truncated self-draft: the target's own first `n_layers` layers.

    Free draft model (no extra training, shares embeddings/lm head).
    Measured on v5e with GPT-2 small: a 1-LAYER self-draft at k=4 reaches
    1615 tok/s single-stream vs 1323 plain (1.22x) even against the
    unrolled fast decode path; deeper drafts lose because their extra
    per-round cost outweighs acceptance gains on this model.
    """
    import dataclasses

    from ..models.registry import spec_with_config

    cfg = dataclasses.replace(
        spec.config, n_layer=n_layers,
        scan_unroll=min(n_layers, getattr(spec.config, "scan_unroll", 1) or 1),
    )
    dspec = spec_with_config(spec, cfg)
    import jax as _jax

    dparams = dict(params)
    dparams["blocks"] = _jax.tree.map(lambda x: x[:n_layers], params["blocks"])
    return dspec, dparams


def make_speculative_generate(
    target: ModelSpec,
    draft: ModelSpec,
    max_new_tokens: int,
    k: int = 4,
    prompt_bucket: int = 128,
):
    """Build jitted (t_params, d_params, tokens [1,bucket], true_len) ->
    (out_tokens [max_new + k], n_emitted).

    Batch 1, greedy everywhere. Target and draft must share the tokenizer
    space (vocab ids); geometries may differ arbitrarily.
    """
    assert target.vocab_size == draft.vocab_size
    cap = prompt_bucket + max_new_tokens + k + 1

    t_strategy = DenseKV(
        n_layer=target.n_layer, n_head=target.n_kv_head,
        head_dim=target.head_dim, capacity=cap,
    )
    d_strategy = DenseKV(
        n_layer=draft.n_layer, n_head=draft.n_kv_head,
        head_dim=draft.head_dim, capacity=cap,
    )
    OUT = max_new_tokens + k  # emit buffer (a round may overshoot by < k)

    def _prefill(spec, strategy, params, tokens, true_len):
        B, Tpad = tokens.shape
        cache = strategy.init()
        pos = jnp.minimum(
            jax.lax.broadcasted_iota(jnp.int32, (B, Tpad), 1),
            spec.n_positions - 1,
        )
        seq_mask = jax.lax.broadcasted_iota(jnp.int32, (B, Tpad), 1) < true_len
        logits, cache = spec.forward(params, tokens, pos, cache, strategy, seq_mask)
        cache = strategy.set_length(cache, true_len)
        idx = jnp.broadcast_to((true_len - 1)[None, None, None], (B, 1, 1))
        last = jnp.take_along_axis(logits, idx, axis=1)[:, 0]
        return cache, jnp.argmax(last[0]).astype(jnp.int32)

    def _greedy(logits):  # [V] -> scalar id
        return jnp.argmax(logits).astype(jnp.int32)

    def generate(t_params, d_params, tokens, true_len):
        t_cache, first = _prefill(target, t_strategy, t_params, tokens, true_len)
        d_cache, _ = _prefill(draft, d_strategy, d_params, tokens, true_len)

        out = jnp.zeros((OUT,), jnp.int32)
        out = out.at[0].set(first)

        def cond(state):
            _, _, _, n_emitted = state
            return n_emitted < max_new_tokens

        def body(state):
            t_cache, d_cache, out, n_emitted = state
            current = out[n_emitted - 1]

            # --- draft burst: k greedy proposals ------------------------
            def d_step(carry, _):
                d_cache, tok = carry
                pos = jnp.minimum(d_cache["length"], draft.n_positions - 1)
                logits, d_cache = draft.forward(
                    d_params, tok[None, None],
                    pos[None, None].astype(jnp.int32),
                    d_cache, d_strategy, None,
                )
                d_cache = d_strategy.set_length(d_cache, d_cache["length"] + 1)
                nxt = _greedy(logits[0, 0])
                return (d_cache, nxt), nxt

            (d_cache, _), proposals = jax.lax.scan(
                d_step, (d_cache, current), None, length=k
            )  # proposals: [k]

            # --- target verify: one forward over [current, p_1..p_{k-1}] --
            verify_in = jnp.concatenate([current[None], proposals[:-1]])[None]  # [1,k]
            t_len0 = t_cache["length"]
            pos = jnp.minimum(
                t_len0 + jnp.arange(k, dtype=jnp.int32), target.n_positions - 1
            )[None]
            logits, t_cache = target.forward(
                t_params, verify_in, pos, t_cache, t_strategy, None
            )
            t_cache = t_strategy.set_length(t_cache, t_len0 + k)
            greedy_t = jnp.argmax(logits[0], axis=-1).astype(jnp.int32)  # [k]

            # longest accepted prefix: proposals[i] == greedy_t[i]
            agree = proposals == greedy_t
            n_acc = jnp.argmin(
                jnp.concatenate([agree, jnp.zeros((1,), bool)]).astype(jnp.int32)
            ).astype(jnp.int32)  # first False (== k when all True)

            # emit accepted proposals then the target's own token at the
            # mismatch (when n_acc == k there is no correction: greedy_t[k-1]
            # == proposals[k-1] already emitted, so only k tokens land)
            emitted = jnp.where(
                jnp.arange(k + 1) < n_acc,
                jnp.concatenate([proposals, jnp.zeros((1,), jnp.int32)]),
                jnp.where(
                    jnp.arange(k + 1) == n_acc,
                    jnp.concatenate([greedy_t, greedy_t[-1:]]),
                    0,
                ),
            )  # [k+1]
            # accepted + correction, except full acceptance emits exactly k
            n_new = jnp.where(n_acc == k, k, n_acc + 1)

            out = jax.lax.dynamic_update_slice(out, emitted[:k], (n_emitted,))
            # overwrite any slots beyond n_new with zeros is unnecessary —
            # they are rewritten by later rounds or ignored via n_emitted
            n_emitted = n_emitted + n_new

            # --- rollback both caches to the accepted prefix --------------
            # target computed KV for [current, p1..p_{k-1}]: keep current +
            # accepted proposals = 1 + n_acc entries (capped at k)
            t_keep = jnp.minimum(1 + n_acc, k)
            t_cache = t_strategy.set_length(t_cache, t_len0 + t_keep)
            # draft computed KV for the same count of new tokens
            d_len0 = d_cache["length"] - k
            d_cache = d_strategy.set_length(d_cache, d_len0 + t_keep)

            return (t_cache, d_cache, out, n_emitted)

        t_cache, d_cache, out, n_emitted = jax.lax.while_loop(
            cond, body, (t_cache, d_cache, out, jnp.ones((), jnp.int32))
        )
        return out, jnp.minimum(n_emitted, max_new_tokens)

    return jax.jit(generate)
