"""Pipeline parallelism: stage-sharded layers with ppermute activation flow.

Completes the parallelism matrix (DP/TP/SP in parallel/sharding.py + the
sequence-sharded forward): the layer stack is split into S stages, each
stage's parameters live on its own device (group), and activations hop
stage-to-stage over ICI via `lax.ppermute` inside `shard_map`.

Three schedules are provided:

* `make_pipeline_forward` — sequential fill-drain forward (cache-free);
* `make_gpipe_forward` — GPipe microbatch overlap: at tick t stage s works
  on microbatch t-s, efficiency M/(M+S-1) vs the sequential form's 1/S;
* `make_pipeline_generate` — KV-CACHED greedy generation: each stage holds
  a DenseKV cache for its own layers (stage-sharded state), prefill writes
  the prompt KV per stage, and the decode scan hops single-token
  activations stage-to-stage — so PP actually serves tokens. This is the
  memory-capacity form of serving: an S-stage mesh decodes a model S×
  larger than one device's HBM, with the KV cache also split S ways.

Embeddings/ln_f/lm_head are replicated (small next to the layer stack).
Works for any stacked-layer model whose per-layer body is exposed through
the strategy-free forward (GPT-2 here); validated on the virtual CPU mesh
(tests/test_pipeline.py) and in the driver dry-run.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models import gpt2 as gpt2_mod


def split_params_into_stages(params: dict, n_stages: int) -> dict:
    """Reshape stacked-layer blocks [L, ...] -> [S, L/S, ...]."""
    L = params["blocks"]["ln1_g"].shape[0]
    assert L % n_stages == 0, (L, n_stages)
    per = L // n_stages
    blocks = {
        k: v.reshape(n_stages, per, *v.shape[1:])
        for k, v in params["blocks"].items()
    }
    return {**params, "blocks": blocks}


def stage_param_specs() -> dict:
    """PartitionSpecs: blocks sharded over "stage" on the leading axis,
    embeddings/final-norm replicated."""
    return {
        "wte": P(),
        "wpe": P(),
        "blocks": {
            k: P("stage")
            for k in (
                "ln1_g", "ln1_b", "attn_w", "attn_b", "attn_proj_w",
                "attn_proj_b", "ln2_g", "ln2_b", "fc_w", "fc_b",
                "fc_proj_w", "fc_proj_b",
            )
        },
        "lnf_g": P(),
        "lnf_b": P(),
    }


def place_pipeline_params(params: dict, mesh: Mesh, n_stages: int) -> dict:
    staged = split_params_into_stages(params, n_stages)
    specs = stage_param_specs()
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), staged, specs
    )


def make_pipeline_forward(cfg: gpt2_mod.GPT2Config, mesh: Mesh, n_stages: int):
    """Build a jitted cache-free forward: (staged_params, tokens) -> logits.

    Inside shard_map each device holds ONE stage's layer block. The
    activation starts on stage 0, runs that stage's layers, ppermutes to
    stage 1, and so on; non-owning stages pass the activation through
    unchanged, so the SPMD program is identical everywhere. After the last
    stage the result is ppermuted back to stage 0 and broadcast (psum of a
    one-hot) so every device returns the same logits.
    """
    from ..cache.kvcache import NoCacheKV

    strategy = NoCacheKV(
        n_layer=cfg.n_layer // n_stages, n_head=cfg.n_head, head_dim=cfg.head_dim
    )

    def local_stage_apply(stage_blocks, x, seq_mask):
        """Run this device's layer block on hidden states x [B, T, E]."""
        B, T = x.shape[:2]

        def layer_body(x, bp):
            h = gpt2_mod._layer_norm(x, bp["ln1_g"], bp["ln1_b"], cfg.layer_norm_epsilon)
            qkv = h @ bp["attn_w"] + bp["attn_b"]
            q, k, v = jnp.split(qkv, 3, axis=-1)
            D = cfg.head_dim
            H = cfg.n_head
            q = q.reshape(B, T, H, D).transpose(0, 2, 1, 3)
            k = k.reshape(B, T, H, D).transpose(0, 2, 1, 3)
            v = v.reshape(B, T, H, D).transpose(0, 2, 1, 3)
            out, _ = strategy.layer_attend(None, None, q, k, v, seq_mask)
            a = out.transpose(0, 2, 1, 3).reshape(B, T, cfg.n_embd).astype(x.dtype)
            x = x + (a @ bp["attn_proj_w"] + bp["attn_proj_b"])
            h2 = gpt2_mod._layer_norm(x, bp["ln2_g"], bp["ln2_b"], cfg.layer_norm_epsilon)
            m = gpt2_mod._gelu_new(h2 @ bp["fc_w"] + bp["fc_b"])
            x = x + (m @ bp["fc_proj_w"] + bp["fc_proj_b"])
            return x, ()

        x, _ = jax.lax.scan(layer_body, x, stage_blocks)
        return x

    def spmd_fn(params, tokens, seq_mask):
        # inside shard_map: blocks have local shape [1, L/S, ...]
        stage_id = jax.lax.axis_index("stage")
        blocks = jax.tree.map(lambda b: b[0], params["blocks"])
        x = params["wte"][tokens] + params["wpe"][
            jnp.minimum(
                jax.lax.broadcasted_iota(jnp.int32, tokens.shape, 1),
                cfg.n_positions - 1,
            )
        ]
        if seq_mask is not None:
            x = jnp.where(seq_mask[..., None], x, jnp.zeros_like(x))
        # activations become stage-varying once stage-local weights touch
        # them; mark the carry as varying for the new shard_map type system
        x = jax.lax.pcast(x, ("stage",), to="varying")

        fwd_perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]
        for s in range(n_stages):
            y = local_stage_apply(blocks, x, seq_mask)
            x = jnp.where(stage_id == s, y, x)  # only the owner transforms
            if s < n_stages - 1:
                x = jax.lax.ppermute(x, "stage", fwd_perm)

        # result lives on the last stage; broadcast to all via psum one-hot
        x = jnp.where(stage_id == n_stages - 1, x, jnp.zeros_like(x))
        x = jax.lax.psum(x, "stage")

        x = gpt2_mod._layer_norm(x, params["lnf_g"], params["lnf_b"], cfg.layer_norm_epsilon)
        logits = jnp.einsum(
            "bte,ve->btv", x, params["wte"], preferred_element_type=jnp.float32
        )
        return logits

    specs = stage_param_specs()
    fn = shard_map(
        spmd_fn,
        mesh=mesh,
        in_specs=(specs, P(), P()),
        out_specs=P(),
    )
    return jax.jit(fn)


def make_gpipe_forward(
    cfg: gpt2_mod.GPT2Config, mesh: Mesh, n_stages: int, n_microbatches: int
):
    """GPipe-scheduled pipeline forward: microbatch overlap across stages.

    The batch splits into M microbatches; at schedule step t, stage s works
    on microbatch t-s, so after the S-step fill every stage is busy every
    step — pipeline efficiency M/(M+S-1) versus the sequential form's 1/S.
    SPMD realization: each step every device (a) takes its input — stage 0
    injects microbatch t, others use the activation received last step —
    (b) applies its local layer block, (c) ppermutes the result ringward;
    the last stage banks finished microbatches into the output buffer.

    Returns a jitted (staged_params, tokens [B,T], seq_mask) -> logits
    with B divisible by n_microbatches.
    """
    from ..cache.kvcache import NoCacheKV

    S, M = n_stages, n_microbatches
    strategy = NoCacheKV(
        n_layer=cfg.n_layer // S, n_head=cfg.n_head, head_dim=cfg.head_dim
    )

    def local_stage_apply(stage_blocks, x, seq_mask_mb):
        B, T = x.shape[:2]

        def layer_body(x, bp):
            h = gpt2_mod._layer_norm(x, bp["ln1_g"], bp["ln1_b"], cfg.layer_norm_epsilon)
            qkv = h @ bp["attn_w"] + bp["attn_b"]
            q, k, v = jnp.split(qkv, 3, axis=-1)
            D, H = cfg.head_dim, cfg.n_head
            q = q.reshape(B, T, H, D).transpose(0, 2, 1, 3)
            k = k.reshape(B, T, H, D).transpose(0, 2, 1, 3)
            v = v.reshape(B, T, H, D).transpose(0, 2, 1, 3)
            out, _ = strategy.layer_attend(None, None, q, k, v, seq_mask_mb)
            a = out.transpose(0, 2, 1, 3).reshape(B, T, cfg.n_embd).astype(x.dtype)
            x = x + (a @ bp["attn_proj_w"] + bp["attn_proj_b"])
            h2 = gpt2_mod._layer_norm(x, bp["ln2_g"], bp["ln2_b"], cfg.layer_norm_epsilon)
            m = gpt2_mod._gelu_new(h2 @ bp["fc_w"] + bp["fc_b"])
            x = x + (m @ bp["fc_proj_w"] + bp["fc_proj_b"])
            return x, ()

        x, _ = jax.lax.scan(layer_body, x, stage_blocks)
        return x

    def spmd_fn(params, tokens, seq_mask):
        stage_id = jax.lax.axis_index("stage")
        blocks = jax.tree.map(lambda b: b[0], params["blocks"])
        B, T = tokens.shape
        Bm = B // M

        x = params["wte"][tokens] + params["wpe"][
            jnp.minimum(
                jax.lax.broadcasted_iota(jnp.int32, (B, T), 1),
                cfg.n_positions - 1,
            )
        ]
        x = jnp.where(seq_mask[..., None], x, jnp.zeros_like(x))
        x_mb = x.reshape(M, Bm, T, cfg.n_embd)
        mask_mb = seq_mask.reshape(M, Bm, T)
        x_mb = jax.lax.pcast(x_mb, ("stage",), to="varying")
        mask_mb = jax.lax.pcast(mask_mb, ("stage",), to="varying")

        fwd_perm = [(i, (i + 1) % S) for i in range(S)]
        n_ticks = M + S - 1
        act0 = jnp.zeros((Bm, T, cfg.n_embd), x.dtype)
        act0 = jax.lax.pcast(act0, ("stage",), to="varying")
        out0 = jnp.zeros((M, Bm, T, cfg.n_embd), x.dtype)
        out0 = jax.lax.pcast(out0, ("stage",), to="varying")
        # each stage tracks the seq_mask of its in-flight microbatch
        m0 = jnp.zeros((Bm, T), bool)
        m0 = jax.lax.pcast(m0, ("stage",), to="varying")

        def tick(t, carry):
            act, act_mask, out = carry
            # stage 0 injects microbatch t (clamped; masked by schedule)
            mb_idx = jnp.clip(t, 0, M - 1)
            inject = jax.lax.dynamic_index_in_dim(x_mb, mb_idx, keepdims=False)
            inject_m = jax.lax.dynamic_index_in_dim(mask_mb, mb_idx, keepdims=False)
            act = jnp.where(stage_id == 0, inject, act)
            act_mask = jnp.where(stage_id == 0, inject_m, act_mask)

            y = local_stage_apply(blocks, act, act_mask)

            # last stage banks microbatch t-(S-1) when it is valid
            done_idx = t - (S - 1)
            valid = (stage_id == S - 1) & (done_idx >= 0)
            slot = jnp.clip(done_idx, 0, M - 1)
            banked = jax.lax.dynamic_update_index_in_dim(out, y, slot, axis=0)
            out = jnp.where(valid, banked, out)

            y = jax.lax.ppermute(y, "stage", fwd_perm)
            act_mask = jax.lax.ppermute(act_mask, "stage", fwd_perm)
            return (y, act_mask, out)

        _, _, out = jax.lax.fori_loop(0, n_ticks, tick, (act0, m0, out0))

        # broadcast the finished activations from the last stage
        out = jnp.where(stage_id == S - 1, out, jnp.zeros_like(out))
        out = jax.lax.psum(out, "stage")
        x = out.reshape(B, T, cfg.n_embd)

        x = gpt2_mod._layer_norm(x, params["lnf_g"], params["lnf_b"], cfg.layer_norm_epsilon)
        logits = jnp.einsum(
            "bte,ve->btv", x, params["wte"], preferred_element_type=jnp.float32
        )
        return logits

    specs = stage_param_specs()
    fn = shard_map(
        spmd_fn,
        mesh=mesh,
        in_specs=(specs, P(), P()),
        out_specs=P(),
    )
    return jax.jit(fn)


def make_pipeline_generate(
    cfg: gpt2_mod.GPT2Config,
    mesh: Mesh,
    n_stages: int,
    max_new_tokens: int,
    capacity: int,
):
    """KV-cached pipelined greedy generation (PP can now SERVE, not just
    forward). Returns a jitted (staged_params, tokens [B, Tpad], true_len)
    -> tokens [B, max_new_tokens], token-exact vs the single-device engine.

    Each stage owns a DenseKV cache for its layer block — stage-sharded
    cache state, the PP memory-capacity story for both weights AND KV.
    Prefill runs the sequential fill-drain over the padded prompt writing
    each stage's cache; the decode scan sends one token's activation around
    the stage ring per step (cache writes gated to the owning stage).
    """
    from ..cache.kvcache import DenseKV

    S = n_stages
    Lp = cfg.n_layer // S
    eps = cfg.layer_norm_epsilon
    strategy = DenseKV(
        n_layer=Lp, n_head=cfg.n_head, head_dim=cfg.head_dim,
        capacity=capacity,
    )

    def stage_apply(blocks, k_st, v_st, length, x, seq_mask):
        """Run this device's layer block with its local KV cache.

        k_st/v_st: [Lp, B, H, C, D]; x: [B, T, E]. Returns (y, k_st, v_st).
        """
        B, T = x.shape[:2]
        D, H, E = cfg.head_dim, cfg.n_head, cfg.n_embd
        cache = {"length": length}

        def layer_body(x, layer_in):
            bp, (k_l, v_l) = layer_in
            h = gpt2_mod._layer_norm(x, bp["ln1_g"], bp["ln1_b"], eps)
            qkv = h @ bp["attn_w"] + bp["attn_b"]
            q, k, v = jnp.split(qkv, 3, axis=-1)
            q = q.reshape(B, T, H, D).transpose(0, 2, 1, 3)
            k = k.reshape(B, T, H, D).transpose(0, 2, 1, 3)
            v = v.reshape(B, T, H, D).transpose(0, 2, 1, 3)
            out, (k_l, v_l) = strategy.layer_attend(
                (k_l, v_l), cache, q, k, v, seq_mask
            )
            a = out.transpose(0, 2, 1, 3).reshape(B, T, E).astype(x.dtype)
            x = x + (a @ bp["attn_proj_w"] + bp["attn_proj_b"])
            h2 = gpt2_mod._layer_norm(x, bp["ln2_g"], bp["ln2_b"], eps)
            m = gpt2_mod._gelu_new(h2 @ bp["fc_w"] + bp["fc_b"])
            x = x + (m @ bp["fc_proj_w"] + bp["fc_proj_b"])
            return x, (k_l, v_l)

        y, (k_st, v_st) = jax.lax.scan(layer_body, x, (blocks, (k_st, v_st)))
        return y, k_st, v_st

    def ring_pass(params, k_st, v_st, x, length, seq_mask, stage_id):
        """One full fill-drain pass over all stages; gated cache commits."""
        fwd_perm = [(i, (i + 1) % S) for i in range(S)]
        blocks = jax.tree.map(lambda b: b[0], params["blocks"])
        for s in range(S):
            y, k_new, v_new = stage_apply(blocks, k_st, v_st, length, x, seq_mask)
            own = stage_id == s
            x = jnp.where(own, y, x)
            k_st = jnp.where(own, k_new, k_st)
            v_st = jnp.where(own, v_new, v_st)
            if s < S - 1:
                x = jax.lax.ppermute(x, "stage", fwd_perm)
        # broadcast the last stage's activation to every device
        x = jnp.where(stage_id == S - 1, x, jnp.zeros_like(x))
        return jax.lax.psum(x, "stage"), k_st, v_st

    def logits_of(params, x):
        x = gpt2_mod._layer_norm(x, params["lnf_g"], params["lnf_b"], eps)
        return jnp.einsum(
            "bte,ve->btv", x, params["wte"], preferred_element_type=jnp.float32
        )

    def spmd_gen(params, tokens, true_len):
        stage_id = jax.lax.axis_index("stage")
        B, Tpad = tokens.shape
        H, D, E = cfg.n_head, cfg.head_dim, cfg.n_embd
        k_st = jnp.zeros((Lp, B, H, capacity, D), jnp.float32)
        v_st = jnp.zeros((Lp, B, H, capacity, D), jnp.float32)
        k_st = jax.lax.pcast(k_st, ("stage",), to="varying")
        v_st = jax.lax.pcast(v_st, ("stage",), to="varying")

        col = jax.lax.broadcasted_iota(jnp.int32, (B, Tpad), 1)
        seq_mask = col < true_len
        pos = jnp.minimum(col, cfg.n_positions - 1)
        x = params["wte"][tokens] + params["wpe"][pos]
        x = jnp.where(seq_mask[..., None], x, jnp.zeros_like(x))
        x = jax.lax.pcast(x, ("stage",), to="varying")

        # PREFILL: cache written at positions 0..Tpad-1, length -> true_len
        x, k_st, v_st = ring_pass(
            params, k_st, v_st, x, jnp.zeros((), jnp.int32), seq_mask, stage_id
        )
        logits = logits_of(params, x)
        idx = jnp.broadcast_to((true_len - 1)[None, None, None], (B, 1, 1))
        last = jnp.take_along_axis(logits, idx, axis=1)[:, 0]

        # DECODE: one token around the ring per step
        def step(carry, _):
            k_st, v_st, logits, length = carry
            tok = jnp.clip(
                jnp.argmax(logits, axis=-1).astype(jnp.int32),
                0, cfg.vocab_size - 1,
            )  # [B]
            p = jnp.minimum(length, cfg.n_positions - 1)
            x = params["wte"][tok][:, None, :] + params["wpe"][p][None, None, :]
            x = jax.lax.pcast(x, ("stage",), to="varying")
            x, k_st, v_st = ring_pass(
                params, k_st, v_st, x, length, None, stage_id
            )
            logits2 = logits_of(params, x)[:, 0]
            return (k_st, v_st, logits2, length + 1), tok

        (_, _, _, _), toks = jax.lax.scan(
            step, (k_st, v_st, last, true_len), None, length=max_new_tokens
        )
        return toks.T  # [B, max_new_tokens]

    specs = stage_param_specs()
    fn = shard_map(
        spmd_gen,
        mesh=mesh,
        in_specs=(specs, P(), P()),
        out_specs=P(),
    )
    return jax.jit(fn)


def pipeline_greedy_step(cfg, mesh, n_stages):
    """(staged_params, tokens [B,T], true_len) -> next token ids [B].

    Cache-free pipelined forward + argmax at the last real position — the
    PP building block the dry-run executes.
    """
    fwd = make_pipeline_forward(cfg, mesh, n_stages)

    def step(params, tokens, true_len):
        B, T = tokens.shape
        seq_mask = jax.lax.broadcasted_iota(jnp.int32, (B, T), 1) < true_len
        logits = fwd(params, tokens, seq_mask)
        idx = jnp.broadcast_to((true_len - 1)[None, None, None], (B, 1, 1))
        last = jnp.take_along_axis(logits, idx, axis=1)[:, 0]
        return jnp.argmax(last, axis=-1).astype(jnp.int32)

    return step
