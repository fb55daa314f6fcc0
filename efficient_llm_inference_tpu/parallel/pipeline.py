"""Pipeline parallelism: stage-sharded layers with ppermute activation flow.

Completes the parallelism matrix (DP/TP/SP in parallel/sharding.py + the
sequence-sharded forward): the layer stack is split into S stages, each
stage's parameters live on its own device (group), and activations hop
stage-to-stage over ICI via `lax.ppermute` inside `shard_map`.

This implementation runs the stages sequentially (fill-drain, no
microbatch overlap yet — GPipe-style overlap is roadmap work); it is the
memory-capacity form of PP: an S-stage mesh holds a model S× larger than
one device's HBM. Embeddings/ln_f/lm_head are replicated (small next to
the layer stack).

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
