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

Three proposal sources, one acceptance rule (exact greedy equivalence for
ANY proposals): a draft model (make_speculative_generate), a token tree
(make_tree_speculative_generate), and draft-free prompt-lookup n-gram
matching (make_ngram_speculative_generate). Each can verify through the
XLA forward or through the k-row verify MEGAKERNEL (mega=..., one
weight-streaming Pallas pass per round — ops/pallas/megakernel.py
gpt2_megaverify / megakernel_llama.py llama_megaverify).

Numerics caveat: the identity is exact in fp32 (property-tested). Under
bf16 the verify pass computes logits with [k, E] matmul shapes while plain
decoding uses [1, E], so accumulation order differs and near-tie argmax
positions can flip — the same benign drift class as XLA-vs-torch fp32
differences, not a scheduling bug. Measured on one v5e chip: k=4 with a
3-layer truncated draft reaches ~958 tok/s single-stream vs ~650 for
plain decode (1.47x); see docs/BENCHMARKS.md for the megakernel-verify
numbers.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

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
    mega: Optional[dict] = None,
    dtype: Any = jnp.float32,
    stats: bool = False,
    draft_mega: Optional[dict] = None,
):
    """Build jitted (t_params, d_params, tokens [1,bucket], true_len) ->
    (out_tokens [max_new + k], n_emitted) — or, with `stats=True`,
    (out_tokens, n_emitted, n_rounds): the verify-round count, from which
    the mean emitted tokens/round = (n_emitted - 1) / n_rounds (each round
    emits 1..k tokens; accepted draft proposals/round is that minus 1
    except on full-accept rounds).

    Batch 1, greedy everywhere. Target and draft must share the tokenizer
    space (vocab ids); geometries may differ arbitrarily.

    When `mega` is given (an engine._mega_spec-style dict: "packed",
    "cfg", "kind", "interpret"), the target's k-row verify forward runs as
    ONE whole-step Pallas pass (ops/pallas/megakernel.py:gpt2_megaverify):
    the weight stream dominates the step, so verifying k rows costs ~one
    decode step and the speculative win multiplies the megakernel's. The
    packed tile stream must ride in as t_params["__mega_packed__"] (a
    closure-captured GiB array becomes a traced constant — see
    engine/generate.py).

    `draft_mega` (same dict shape, requires `mega`) additionally runs
    EACH DRAFT STEP as a whole-step megakernel program (round 4: on
    weight-bound GQA targets the k sequential XLA draft forwards came to
    dominate the round — 4.48 tok/round accepted yet 0.93x end-to-end —
    so the draft gets the same treatment as the target). Draft packed
    streams are small (the draft is small by definition), so they ride as
    closure constants.
    """
    assert target.vocab_size == draft.vocab_size
    assert draft_mega is None or mega is not None, \
        "draft_mega requires the mega verify path"
    cap = prompt_bucket + max_new_tokens + k + 1
    if mega is not None:
        assert mega.get("kind", "gpt2") in ("gpt2", "llama")
        assert k <= 8, "mega verify block must fit one 16-row RMW window"
        # kernel RMW needs an aligned 16-row window below capacity
        cap = -(-cap // 8) * 8 + 8

    t_strategy = DenseKV(
        n_layer=target.n_layer, n_head=target.n_kv_head,
        head_dim=target.head_dim, capacity=cap, dtype=dtype,
    )
    d_strategy = DenseKV(
        n_layer=draft.n_layer, n_head=draft.n_kv_head,
        head_dim=draft.head_dim, capacity=cap, dtype=dtype,
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
            _, _, _, n_emitted, _ = state
            return n_emitted < max_new_tokens

        def body(state):
            t_cache, d_cache, out, n_emitted, n_rounds = state
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

            return (t_cache, d_cache, out, n_emitted, n_rounds + 1)

        t_cache, d_cache, out, n_emitted, n_rounds = jax.lax.while_loop(
            cond, body,
            (t_cache, d_cache, out, jnp.ones((), jnp.int32),
             jnp.zeros((), jnp.int32)),
        )
        n_out = jnp.minimum(n_emitted, max_new_tokens)
        return (out, n_out, n_rounds) if stats else (out, n_out)

    def generate_mega(t_params, d_params, tokens, true_len):
        from ..ops.pallas.megakernel import to_mega_layout

        kind = mega.get("kind", "gpt2")
        if kind == "gpt2":
            from ..ops.pallas.megakernel import gpt2_megaverify as _verify
        else:
            from ..models.llama import rope_cos_sin
            from ..ops.pallas.megakernel_llama import (
                llama_megaverify as _verify,
            )

        dkind = (draft_mega or {}).get("kind", "gpt2")
        use_burst = False
        if draft_mega is not None:
            if dkind == "gpt2":
                from ..ops.pallas.megakernel import (
                    gpt2_megastep as _draft_step_kernel,
                )
                from ..ops.pallas.megakernel_draft import (
                    gpt2_draft_burst as _burst_kernel,
                    gpt2_draft_burst_supported as _burst_sup,
                )
            else:
                from ..models.llama import rope_cos_sin as _rcs
                from ..ops.pallas.megakernel_llama import (
                    llama_megastep as _draft_step_kernel,
                )
                from ..ops.pallas.megakernel_draft import (
                    llama_draft_burst as _burst_kernel,
                    llama_draft_burst_supported as _burst_sup,
                )
            # prefer the ONE-program burst (k in-kernel steps) when the
            # draft fits VMEM: a speculation round is then draft-burst +
            # verify = TWO programs instead of k+1
            use_burst = (
                draft_mega.get("burst_packed") is not None
                and _burst_sup(draft_mega["cfg"], cap, dtype)
            )

        t_params = dict(t_params)
        packed = t_params.pop("__mega_packed__")
        cfg = mega["cfg"]
        interpret = mega.get("interpret", False)

        t_cache, first = _prefill(target, t_strategy, t_params, tokens, true_len)
        d_cache, _ = _prefill(draft, d_strategy, d_params, tokens, true_len)
        tk = to_mega_layout(t_cache["k"])
        tv = to_mega_layout(t_cache["v"])
        t_len0_all = t_cache["length"]
        if kind == "gpt2":
            wte, wpe = t_params["wte"], t_params["wpe"]
        else:
            embed = t_params["embed"]

        if draft_mega is not None:
            # draft cache also lives in mega layout; its packed stream is
            # small (drafts are small), so it rides as a closure constant
            dk0 = to_mega_layout(d_cache["k"])
            dv0 = to_mega_layout(d_cache["v"])
            dlen0 = d_cache["length"]
            dpacked = draft_mega["packed"]
            dpacked_burst = draft_mega.get("burst_packed")
            dcfg = draft_mega["cfg"]
            dinterp = draft_mega.get("interpret", False)

            def draft_burst(dk, dv, dlen, current):
                if use_burst:
                    props, dk, dv = _burst_kernel(
                        dpacked_burst, dk, dv, dlen, current,
                        cfg=dcfg, capacity=cap, k=k, interpret=dinterp,
                    )
                    props = jnp.clip(props, 0, draft.vocab_size - 1)
                    return dk, dv, dlen + k, props

                def d_step(carry, _):
                    dk, dv, dlen, tok = carry
                    pos = jnp.minimum(dlen, draft.n_positions - 1)
                    if dkind == "gpt2":
                        x = (d_params["wte"][tok]
                             + d_params["wpe"][pos])[None]
                        x = x.astype(d_params["wte"].dtype)
                        nxt, dk, dv = _draft_step_kernel(
                            dpacked, dk, dv, dlen, x,
                            cfg=dcfg, capacity=cap, interpret=dinterp,
                        )
                    else:
                        x = d_params["embed"][tok][None]
                        x = x.astype(d_params["embed"].dtype)
                        cos, sin = _rcs(
                            pos[None, None], dcfg.head_dim, dcfg.rope_theta
                        )  # [1, 1, D]
                        cos_q = jnp.tile(cos[0], (1, dcfg.n_head))
                        sin_q = jnp.tile(sin[0], (1, dcfg.n_head))
                        nxt, dk, dv = _draft_step_kernel(
                            dpacked, dk, dv, dlen, x, cos_q, sin_q,
                            cfg=dcfg, capacity=cap, interpret=dinterp,
                        )
                    # clip before the embedding lookup (as the mega decode
                    # body does) rather than relying on the kernels' padded
                    # lm-head NEG_INF masking
                    nxt = jnp.clip(nxt, 0, draft.vocab_size - 1)
                    return (dk, dv, dlen + 1, nxt), nxt

                (dk, dv, dlen, _), proposals = jax.lax.scan(
                    d_step, (dk, dv, dlen, current), None, length=k
                )
                return dk, dv, dlen, proposals

        out = jnp.zeros((OUT,), jnp.int32)
        out = out.at[0].set(first)

        def cond(state):
            return state[5] < max_new_tokens

        def body(state):
            tk, tv, t_len, d_cache, out, n_emitted, n_rounds = state
            current = out[n_emitted - 1]

            if draft_mega is not None:
                dk, dv, dlen = d_cache
                dk, dv, dlen, proposals = draft_burst(dk, dv, dlen, current)
                d_cache = (dk, dv, dlen)
            else:

                def d_step(carry, _):
                    d_cache, tok = carry
                    pos = jnp.minimum(
                        d_cache["length"], draft.n_positions - 1
                    )
                    logits, d_cache = draft.forward(
                        d_params, tok[None, None],
                        pos[None, None].astype(jnp.int32),
                        d_cache, d_strategy, None,
                    )
                    d_cache = d_strategy.set_length(
                        d_cache, d_cache["length"] + 1
                    )
                    nxt = _greedy(logits[0, 0])
                    return (d_cache, nxt), nxt

                (d_cache, _), proposals = jax.lax.scan(
                    d_step, (d_cache, current), None, length=k
                )

            # --- target verify: ONE whole-step Pallas pass over k rows ----
            verify_in = jnp.concatenate([current[None], proposals[:-1]])  # [k]
            pos = jnp.minimum(
                t_len + jnp.arange(k, dtype=jnp.int32),
                target.n_positions - 1,
            )
            if kind == "gpt2":
                x = (wte[verify_in] + wpe[pos]).astype(wte.dtype)  # [k, E]
                greedy_t, tk, tv = _verify(
                    packed, tk, tv, t_len, x,
                    cfg=cfg, capacity=cap, interpret=interpret,
                )
            else:
                x = embed[verify_in].astype(embed.dtype)  # [k, E]
                cos, sin = rope_cos_sin(
                    pos[None], cfg.head_dim, cfg.rope_theta
                )  # [1, k, D]
                cos_q = jnp.tile(cos[0], (1, cfg.n_head))  # [k, Hq*D]
                sin_q = jnp.tile(sin[0], (1, cfg.n_head))
                greedy_t, tk, tv = _verify(
                    packed, tk, tv, t_len, x, cos_q, sin_q,
                    cfg=cfg, capacity=cap, interpret=interpret,
                )

            agree = proposals == greedy_t
            n_acc = jnp.argmin(
                jnp.concatenate([agree, jnp.zeros((1,), bool)]).astype(jnp.int32)
            ).astype(jnp.int32)
            emitted = jnp.where(
                jnp.arange(k + 1) < n_acc,
                jnp.concatenate([proposals, jnp.zeros((1,), jnp.int32)]),
                jnp.where(
                    jnp.arange(k + 1) == n_acc,
                    jnp.concatenate([greedy_t, greedy_t[-1:]]),
                    0,
                ),
            )
            n_new = jnp.where(n_acc == k, k, n_acc + 1)
            out = jax.lax.dynamic_update_slice(out, emitted[:k], (n_emitted,))
            n_emitted = n_emitted + n_new

            # rollback = pure length update: rows beyond the accepted
            # prefix stay masked (col < len) and are overwritten by the
            # next round's verify rows
            t_keep = jnp.minimum(1 + n_acc, k)
            t_len = t_len + t_keep
            if draft_mega is not None:
                dk, dv, dlen = d_cache
                d_cache = (dk, dv, dlen - k + t_keep)
            else:
                d_len0 = d_cache["length"] - k
                d_cache = d_strategy.set_length(d_cache, d_len0 + t_keep)

            return (tk, tv, t_len, d_cache, out, n_emitted, n_rounds + 1)

        d_state = (
            (dk0, dv0, dlen0) if draft_mega is not None else d_cache
        )
        state = (tk, tv, t_len0_all, d_state, out, jnp.ones((), jnp.int32),
                 jnp.zeros((), jnp.int32))
        tk, tv, t_len, d_cache, out, n_emitted, n_rounds = jax.lax.while_loop(
            cond, body, state
        )
        n_out = jnp.minimum(n_emitted, max_new_tokens)
        return (out, n_out, n_rounds) if stats else (out, n_out)

    return jax.jit(generate_mega if mega is not None else generate)


# ---------------------------------------------------------------------------
# Prompt-lookup (n-gram) speculation: draft-free proposals.
# ---------------------------------------------------------------------------


def make_ngram_speculative_generate(
    target: ModelSpec,
    max_new_tokens: int,
    k: int = 8,
    ngram: int = 2,
    prompt_bucket: int = 128,
    mega: Optional[dict] = None,
    dtype: Any = jnp.float32,
    stats: bool = False,
):
    """Prompt-lookup decoding: proposals are mined from the sequence itself.

    Each round finds the most recent earlier position whose trailing
    `ngram` tokens match the current tail and proposes the k tokens that
    followed it — ZERO draft-model cost (one vectorized match over the
    static sequence buffer). Greedy acceptance keeps the output stream
    identical to plain target greedy decoding for ANY proposal source, so
    correctness is unconditional; the match heuristic only sets the
    acceptance rate (high on repetitive text — the classic
    prompt-lookup / assisted-generation trick).

    With `mega` (engine._mega_spec-style dict), the k-row verify runs as
    one whole-step Pallas pass (gpt2_megaverify / llama_megaverify): a
    round then costs ~ONE decode step for up to k accepted tokens.
    Returns jitted (t_params, tokens [1, bucket], true_len) ->
    (out_tokens [max_new + k], n_emitted) — or, with `stats=True`,
    (out_tokens, n_emitted, n_rounds), where n_rounds counts verify
    passes (mean emitted tokens/round = (n_emitted - 1) / n_rounds).
    With mega, pass the packed stream as t_params["__mega_packed__"].
    """
    cap = prompt_bucket + max_new_tokens + k + 1
    kind = (mega or {}).get("kind", "gpt2")
    if mega is not None:
        assert kind in ("gpt2", "llama")
        assert k <= 8, "mega verify block must fit one 16-row RMW window"
        cap = -(-cap // 8) * 8 + 8
    S = cap  # sequence buffer: prompt + emitted tokens

    t_strategy = DenseKV(
        n_layer=target.n_layer, n_head=target.n_kv_head,
        head_dim=target.head_dim, capacity=cap, dtype=dtype,
    )
    OUT = max_new_tokens + k

    def _prefill(params, tokens, true_len):
        B, Tpad = tokens.shape
        cache = t_strategy.init()
        pos = jnp.minimum(
            jax.lax.broadcasted_iota(jnp.int32, (B, Tpad), 1),
            target.n_positions - 1,
        )
        seq_mask = jax.lax.broadcasted_iota(jnp.int32, (B, Tpad), 1) < true_len
        logits, cache = target.forward(
            params, tokens, pos, cache, t_strategy, seq_mask
        )
        cache = t_strategy.set_length(cache, true_len)
        idx = jnp.broadcast_to((true_len - 1)[None, None, None], (B, 1, 1))
        last = jnp.take_along_axis(logits, idx, axis=1)[:, 0]
        return cache, jnp.argmax(last[0]).astype(jnp.int32)

    def _propose(seq, L):
        """k proposals for positions L..L+k-1 from the latest n-gram match.

        Falls back to repeating the last token when no earlier match
        exists (any proposal is correct; acceptance just drops).
        """
        idx = jnp.arange(S, dtype=jnp.int32)
        valid = (idx >= ngram - 1) & (idx < L - 1)
        match = jnp.ones((S,), bool)
        for j in range(ngram):
            # seq[p - j] == seq[L - 1 - j]
            shifted = jnp.roll(seq, j)
            match = match & (shifted == seq[L - 1 - j])
        match = match & valid
        q = jnp.max(jnp.where(match, idx, -1))  # latest match, -1 if none
        found = q >= 0
        base = jnp.where(found, q + 1, jnp.int32(0))
        cont = jax.lax.dynamic_slice(seq, (base,), (k,))
        return jnp.where(found, cont, jnp.full((k,), seq[L - 1], jnp.int32))

    def _accept_and_emit(proposals, greedy_t, out, n_emitted):
        agree = proposals == greedy_t
        n_acc = jnp.argmin(
            jnp.concatenate([agree, jnp.zeros((1,), bool)]).astype(jnp.int32)
        ).astype(jnp.int32)
        emitted = jnp.where(
            jnp.arange(k + 1) < n_acc,
            jnp.concatenate([proposals, jnp.zeros((1,), jnp.int32)]),
            jnp.where(
                jnp.arange(k + 1) == n_acc,
                jnp.concatenate([greedy_t, greedy_t[-1:]]),
                0,
            ),
        )
        n_new = jnp.where(n_acc == k, k, n_acc + 1)
        out = jax.lax.dynamic_update_slice(out, emitted[:k], (n_emitted,))
        return emitted, n_new, n_acc, out

    def _init_seq(tokens, true_len, first):
        seq = jnp.zeros((S,), jnp.int32)
        w = min(S, tokens.shape[1])
        seq = jax.lax.dynamic_update_slice(seq, tokens[0, :w], (0,))
        return jax.lax.dynamic_update_slice(seq, first[None], (true_len,))

    if mega is None:

        def generate(t_params, tokens, true_len):
            t_cache, first = _prefill(t_params, tokens, true_len)
            out = jnp.zeros((OUT,), jnp.int32).at[0].set(first)
            seq = _init_seq(tokens, true_len, first)

            def cond(state):
                return state[3] < max_new_tokens

            def body(state):
                t_cache, seq, out, n_emitted, n_rounds = state
                L = true_len + n_emitted
                proposals = _propose(seq, L)
                verify_in = jax.lax.dynamic_slice(seq, (L - 1,), (1,))
                verify_in = jnp.concatenate([verify_in, proposals[:-1]])[None]
                t_len0 = t_cache["length"]
                pos = jnp.minimum(
                    t_len0 + jnp.arange(k, dtype=jnp.int32),
                    target.n_positions - 1,
                )[None]
                logits, t_cache = target.forward(
                    t_params, verify_in, pos, t_cache, t_strategy, None
                )
                t_cache = t_strategy.set_length(t_cache, t_len0 + k)
                greedy_t = jnp.argmax(logits[0], axis=-1).astype(jnp.int32)
                emitted, n_new, n_acc, out = _accept_and_emit(
                    proposals, greedy_t, out, n_emitted
                )
                seq = jax.lax.dynamic_update_slice(seq, emitted[:k], (L,))
                n_emitted = n_emitted + n_new
                t_keep = jnp.minimum(1 + n_acc, k)
                t_cache = t_strategy.set_length(t_cache, t_len0 + t_keep)
                return (t_cache, seq, out, n_emitted, n_rounds + 1)

            state = (t_cache, seq, out, jnp.ones((), jnp.int32),
                     jnp.zeros((), jnp.int32))
            _, _, out, n_emitted, n_rounds = jax.lax.while_loop(
                cond, body, state
            )
            n_out = jnp.minimum(n_emitted, max_new_tokens)
            return (out, n_out, n_rounds) if stats else (out, n_out)

        return jax.jit(generate)

    from ..ops.pallas.megakernel import to_mega_layout

    if kind == "gpt2":
        from ..ops.pallas.megakernel import gpt2_megaverify as _verify
    else:
        from ..models.llama import rope_cos_sin
        from ..ops.pallas.megakernel_llama import llama_megaverify as _verify

    def generate_mega(t_params, tokens, true_len):
        t_params = dict(t_params)
        packed = t_params.pop("__mega_packed__")
        cfg = mega["cfg"]
        interpret = mega.get("interpret", False)

        t_cache, first = _prefill(t_params, tokens, true_len)
        tk = to_mega_layout(t_cache["k"])
        tv = to_mega_layout(t_cache["v"])
        out = jnp.zeros((OUT,), jnp.int32).at[0].set(first)
        seq = _init_seq(tokens, true_len, first)

        def cond(state):
            return state[5] < max_new_tokens

        def body(state):
            tk, tv, t_len, seq, out, n_emitted, n_rounds = state
            L = true_len + n_emitted
            proposals = _propose(seq, L)
            verify_in = jax.lax.dynamic_slice(seq, (L - 1,), (1,))
            verify_in = jnp.concatenate([verify_in, proposals[:-1]])  # [k]
            pos = jnp.minimum(
                t_len + jnp.arange(k, dtype=jnp.int32),
                target.n_positions - 1,
            )
            if kind == "gpt2":
                x = (t_params["wte"][verify_in]
                     + t_params["wpe"][pos]).astype(dtype)
                greedy_t, tk, tv = _verify(
                    packed, tk, tv, t_len, x,
                    cfg=cfg, capacity=cap, interpret=interpret,
                )
            else:
                x = t_params["embed"][verify_in].astype(dtype)
                cos, sin = rope_cos_sin(
                    pos[None], cfg.head_dim, cfg.rope_theta
                )
                cos_q = jnp.tile(cos[0], (1, cfg.n_head))
                sin_q = jnp.tile(sin[0], (1, cfg.n_head))
                greedy_t, tk, tv = _verify(
                    packed, tk, tv, t_len, x, cos_q, sin_q,
                    cfg=cfg, capacity=cap, interpret=interpret,
                )
            emitted, n_new, n_acc, out = _accept_and_emit(
                proposals, greedy_t, out, n_emitted
            )
            seq = jax.lax.dynamic_update_slice(seq, emitted[:k], (L,))
            n_emitted = n_emitted + n_new
            t_len = t_len + jnp.minimum(1 + n_acc, k)
            return (tk, tv, t_len, seq, out, n_emitted, n_rounds + 1)

        state = (tk, tv, t_cache["length"], seq, out,
                 jnp.ones((), jnp.int32), jnp.zeros((), jnp.int32))
        tk, tv, t_len, seq, out, n_emitted, n_rounds = jax.lax.while_loop(
            cond, body, state
        )
        n_out = jnp.minimum(n_emitted, max_new_tokens)
        return (out, n_out, n_rounds) if stats else (out, n_out)

    return jax.jit(generate_mega)


# ---------------------------------------------------------------------------
# Tree speculation (multi-draft): docs/ROADMAP.md #6.
# ---------------------------------------------------------------------------

NEG_INF = float(jnp.finfo(jnp.float32).min)


@dataclasses.dataclass(frozen=True)
class _Topology:
    """Static speculation-tree topology for branching factors (b_1..b_d).

    Combined node numbering is BFS with the round's *current* token as node
    0: level i (1-based) holds prod(b_1..b_i) nodes; `offs[i]` is the
    combined index of the first level-i node; `ancestor[i, j]` is True iff
    node j is node i or one of its ancestors (the tree attention mask).
    """

    branching: Tuple[int, ...]
    sizes: Tuple[int, ...]  # per level, level 0 == 1 (current)
    offs: Tuple[int, ...]
    n_nodes: int  # includes the current token (node 0)
    parent: Tuple[int, ...]
    depth: Tuple[int, ...]
    ancestor: Any  # np.ndarray [n, n] bool


def _build_topology(branching: Tuple[int, ...]) -> _Topology:
    sizes = [1]
    for b in branching:
        sizes.append(sizes[-1] * b)
    offs = [0]
    for s in sizes[:-1]:
        offs.append(offs[-1] + s)
    n = sum(sizes)
    parent = [-1] * n
    depth = [0] * n
    for lvl in range(1, len(sizes)):
        b = branching[lvl - 1]
        for m in range(sizes[lvl]):
            node = offs[lvl] + m
            parent[node] = offs[lvl - 1] + m // b
            depth[node] = lvl
    anc = np.eye(n, dtype=bool)
    for node in range(1, n):
        anc[node] |= anc[parent[node]]
    return _Topology(
        branching=tuple(branching),
        sizes=tuple(sizes),
        offs=tuple(offs),
        n_nodes=n,
        parent=tuple(parent),
        depth=tuple(depth),
        ancestor=anc,
    )


@dataclasses.dataclass(frozen=True)
class _TreeKV:
    """DenseKV variant whose query block carries a tree attention mask.

    The block of T new tokens is written at column `length + write_off`
    (cache["length"] stays at the round's base through every tree call) and
    query row t may attend: (a) every prefix column < length, and (b) tree
    column j (at absolute column length + j) iff the static ancestor mask
    `block_mask[t, j]` allows it. Everything else mirrors DenseKV.
    """

    n_layer: int
    n_head: int
    head_dim: int
    capacity: int
    write_off: int  # static: tree columns already written this round
    block_mask: Any  # bool [T, write_off + T] ancestor mask
    batch: int = 1
    dtype: Any = jnp.float32

    def init(self) -> dict:
        shape = (self.n_layer, self.batch, self.n_head, self.capacity,
                 self.head_dim)
        return {
            "k": jnp.zeros(shape, self.dtype),
            "v": jnp.zeros(shape, self.dtype),
            "length": jnp.zeros((), jnp.int32),
        }

    def cache_layer_slices(self, cache: dict):
        return (cache["k"], cache["v"])

    def cache_with_layer_slices(self, cache: dict, new_slices, T: int) -> dict:
        k, v = new_slices
        return {"k": k, "v": v, "length": cache["length"]}

    def set_length(self, cache: dict, length) -> dict:
        return {**cache, "length": jnp.asarray(length, jnp.int32)}

    def layer_attend(self, layer_cache, cache, q, k_new, v_new, seq_mask):
        k_l, v_l = layer_cache
        length = cache["length"]
        B, Hq, T, D = q.shape
        Hkv, C = k_l.shape[1], k_l.shape[2]
        G = Hq // Hkv
        col_w = length + self.write_off
        k_l = jax.lax.dynamic_update_slice(
            k_l, k_new.astype(k_l.dtype), (0, 0, col_w, 0)
        )
        v_l = jax.lax.dynamic_update_slice(
            v_l, v_new.astype(v_l.dtype), (0, 0, col_w, 0)
        )
        scale = 1.0 / jnp.sqrt(jnp.float32(D))
        qg = q.reshape(B, Hkv, G, T, D)
        scores = jnp.einsum(
            "bkgtd,bkcd->bkgtc", qg, k_l, preferred_element_type=jnp.float32
        ) * scale
        col = jax.lax.broadcasted_iota(jnp.int32, (T, C), 1)
        block = jnp.zeros((T, C), bool)
        block = jax.lax.dynamic_update_slice(
            block, jnp.asarray(self.block_mask, bool), (0, length)
        )
        mask = (col < length) | block
        scores = jnp.where(mask[None, None, None], scores, NEG_INF)
        probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
        out = jnp.einsum(
            "bkgtc,bkcd->bkgtd", probs, v_l, preferred_element_type=jnp.float32
        )
        return out.reshape(B, Hq, T, D), (k_l, v_l)

    def est_bytes(self, length: int) -> float:
        per_tok = self.batch * self.n_head * self.head_dim
        itemsize = jnp.dtype(self.dtype).itemsize
        return 2.0 * self.n_layer * length * per_tok * itemsize


def _move_rows(buf, moves):
    """Apply [(src_col, dst_col)] row moves to a [L,B,H,C,D] cache buffer."""
    L, B, H, C, D = buf.shape
    for src, dst in moves:
        row = jax.lax.dynamic_slice(
            buf, (0, 0, 0, src, 0), (L, B, H, 1, D)
        )
        buf = jax.lax.dynamic_update_slice(buf, row, (0, 0, 0, dst, 0))
    return buf


def make_tree_speculative_generate(
    target: ModelSpec,
    draft: ModelSpec,
    max_new_tokens: int,
    branching: Tuple[int, ...] = (2, 2, 1, 1),
    prompt_bucket: int = 128,
    stats: bool = False,
):
    """Tree speculation: the draft proposes a TOKEN TREE, the target verifies
    every root-to-leaf path in ONE forward pass (SpecInfer-style), accepting
    the longest path whose tokens match the target's own greedy choices.

    Where linear speculation dies at the draft's first wrong guess, the tree
    keeps going if ANY sibling matches — branching (2, 2, 1, 1) proposes 2
    alternatives at the first two positions. The output stream is IDENTICAL
    to plain target greedy decoding for any draft (same greedy-acceptance
    argument as `make_speculative_generate`; property-tested with a random
    unrelated draft). Per round: d draft forwards over tree levels + one
    target verify over all nodes, both with static tree attention masks
    (_TreeKV); accepted rows are compacted in place, so rollback stays a
    pure length update plus <=d-1 row moves. Fully static shapes — one
    compiled program for the whole generation.

    Greedy only, batch 1, full acceptance emits exactly d tokens (no bonus
    token: the level-d node's draft KV does not exist yet, exactly the
    t_keep=k case of the linear verifier).
    """
    assert target.vocab_size == draft.vocab_size
    topo = _build_topology(tuple(branching))
    d = len(branching)
    N = topo.n_nodes  # current + all tree nodes
    cap = prompt_bucket + max_new_tokens + N + 1
    anc = topo.ancestor

    def _kv_kwargs(spec):
        return dict(
            n_layer=spec.n_layer, n_head=spec.n_kv_head,
            head_dim=spec.head_dim, capacity=cap,
        )

    t_strategy = DenseKV(**_kv_kwargs(target))
    d_strategy = DenseKV(**_kv_kwargs(draft))

    # draft call r consumes level r-1 (rows) against everything written so
    # far (columns: nodes 0 .. offs[r-1] + sizes[r-1])
    d_strats = []
    for r in range(1, d + 1):
        lo, M = topo.offs[r - 1], topo.sizes[r - 1]
        w = lo  # columns already written before this call
        blk = anc[lo:lo + M, :lo + M]
        d_strats.append(
            _TreeKV(**_kv_kwargs(draft), write_off=w, block_mask=blk)
        )
    v_strategy = _TreeKV(
        **_kv_kwargs(target), write_off=0, block_mask=anc
    )

    OUT = max_new_tokens + d
    depth_vec = jnp.asarray(topo.depth, jnp.int32)  # [N]

    def _prefill(spec, strategy, params, tokens, true_len):
        B, Tpad = tokens.shape
        cache = strategy.init()
        pos = jnp.minimum(
            jax.lax.broadcasted_iota(jnp.int32, (B, Tpad), 1),
            spec.n_positions - 1,
        )
        seq_mask = jax.lax.broadcasted_iota(jnp.int32, (B, Tpad), 1) < true_len
        logits, cache = spec.forward(params, tokens, pos, cache, strategy,
                                     seq_mask)
        cache = strategy.set_length(cache, true_len)
        idx = jnp.broadcast_to((true_len - 1)[None, None, None], (B, 1, 1))
        last = jnp.take_along_axis(logits, idx, axis=1)[:, 0]
        return cache, jnp.argmax(last[0]).astype(jnp.int32)

    def generate(t_params, d_params, tokens, true_len):
        t_cache, first = _prefill(target, t_strategy, t_params, tokens,
                                  true_len)
        d_cache, _ = _prefill(draft, d_strategy, d_params, tokens, true_len)

        out = jnp.zeros((OUT,), jnp.int32).at[0].set(first)

        def cond(state):
            _, _, _, n_emitted, _ = state
            return n_emitted < max_new_tokens

        def body(state):
            t_cache, d_cache, out, n_emitted, n_rounds = state
            current = out[n_emitted - 1]
            len0 = t_cache["length"]

            # --- draft: grow the tree level by level --------------------
            toks_all = jnp.zeros((N,), jnp.int32).at[0].set(current)
            for r in range(1, d + 1):
                lo, M = topo.offs[r - 1], topo.sizes[r - 1]
                b = branching[r - 1]
                block = jax.lax.dynamic_slice(toks_all, (lo,), (M,))[None]
                pos = jnp.minimum(
                    d_cache["length"] + (r - 1), draft.n_positions - 1
                )
                pos = jnp.full((1, M), pos, jnp.int32)
                logits, d_cache = draft.forward(
                    d_params, block, pos, d_cache, d_strats[r - 1], None
                )
                _, top = jax.lax.top_k(logits[0], b)  # [M, b]
                toks_all = jax.lax.dynamic_update_slice(
                    toks_all, top.reshape(-1).astype(jnp.int32),
                    (topo.offs[r - 1] + M if r == 1 else topo.offs[r],),
                )

            # --- target: verify every node in one forward ----------------
            pos = jnp.minimum(
                len0 + depth_vec, target.n_positions - 1
            )[None]
            logits, t_cache = target.forward(
                t_params, toks_all[None], pos, t_cache, v_strategy, None
            )
            g = jnp.argmax(logits[0], axis=-1).astype(jnp.int32)  # [N]

            # --- walk: longest path matching the target's greedy ---------
            cur = jnp.zeros((), jnp.int32)  # combined node index
            alive = jnp.ones((), bool)
            n_acc = jnp.zeros((), jnp.int32)
            emitted = []
            path = []  # accepted node index per level (garbage when dead)
            for lvl in range(1, d + 1):
                b = branching[lvl - 1]
                t = g[cur]  # target's token at cur's position
                child_base = topo.offs[lvl] + (cur - topo.offs[lvl - 1]) * b
                childs = jax.lax.dynamic_slice_in_dim(toks_all, child_base, b)
                match = childs == t
                found = jnp.any(match)
                idx = jnp.argmax(match).astype(jnp.int32)
                emitted.append(jnp.where(alive, t, 0))
                n_acc = n_acc + jnp.where(alive & found, 1, 0)
                cur = jnp.where(found, child_base + idx, cur)
                alive = alive & found
                path.append(cur)
            emitted = jnp.stack(emitted)  # [d]
            # accepted + correction; full acceptance emits exactly d
            n_new = jnp.where(n_acc == d, d, n_acc + 1)
            n_new = jnp.minimum(n_new, jnp.int32(d))

            out = jax.lax.dynamic_update_slice(out, emitted, (n_emitted,))
            n_emitted = n_emitted + n_new

            # --- compact accepted rows, roll both caches back -------------
            # keep current + accepted path nodes below level d
            m = jnp.minimum(n_acc, d - 1) if d > 1 else jnp.zeros((), jnp.int32)
            moves = []
            for i in range(1, d):
                # row of the accepted level-i node -> i-th slot after current
                src = len0 + path[i - 1]
                moves.append((src, len0 + i))
            t_cache = {
                "k": _move_rows(t_cache["k"], moves),
                "v": _move_rows(t_cache["v"], moves),
                "length": len0 + 1 + m,
            }
            d_cache = {
                "k": _move_rows(d_cache["k"], moves),
                "v": _move_rows(d_cache["v"], moves),
                "length": len0 + 1 + m,
            }
            return (t_cache, d_cache, out, n_emitted, n_rounds + 1)

        t_cache, d_cache, out, n_emitted, n_rounds = jax.lax.while_loop(
            cond, body,
            (t_cache, d_cache, out, jnp.ones((), jnp.int32),
             jnp.zeros((), jnp.int32)),
        )
        n_out = jnp.minimum(n_emitted, max_new_tokens)
        return (out, n_out, n_rounds) if stats else (out, n_out)

    return jax.jit(generate)
