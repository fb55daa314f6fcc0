"""Pallas paged attention: block-table indexed decode over a shared pool.

The reference's "paged attention" stitches blocks into a contiguous copy
every step (/root/reference/src/cache/implementations.py:82-106). The jnp
batched engine improves that to one gather; this kernel removes even the
gather: the grid walks each sequence's block table (scalar-prefetched, so
the pipeline DMAs exactly the blocks the table names straight from the
pool) with a flash-style online softmax across blocks.

Pool layout per layer: [Hkv, n_blocks, block_size, D] — a (head, block)
stripe is a contiguous [block_size, D] tile.

Grid: (B, max_blocks_per_seq), last axis fastest, ALL heads fused into each
program (round 1 used a (B, Hkv, blocks) grid whose 16 KB tiles were
DMA-overhead bound — 11.5 vs 8.5 ms/step against the XLA gather at 8 slots,
docs/BENCHMARKS.md; head-fusing makes the per-program tile H× larger).
VMEM scratch carries (m, l, acc) for every head across one slot's block
walk.

Masking is EXCLUSIVE like every other mask in this repo: slot b attends
pool positions p < lengths[b]; pass lengths+1 if the current token's KV is
already in the pool and should be visible.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float(jnp.finfo(jnp.float32).min)


def _make_kernel(bs: int, D: int, G: int, H: int, max_blocks: int):
    scale = 1.0 / (D**0.5)

    def kernel(
        tables_ref,  # scalar-prefetch: [B, max_blocks] int32 (clamped)
        lengths_ref,  # scalar-prefetch: [B] int32 (exclusive)
        q_ref,  # [1, H, G, D]
        k_ref,  # [H, 1, bs, D]  (pool block selected via table)
        v_ref,  # [H, 1, bs, D]
        o_ref,  # [1, H, G, D]
        m_scr,  # VMEM [H * G, 128] f32
        l_scr,  # VMEM [H * G, 128] f32
        acc_scr,  # VMEM [H * G, D] f32
    ):
        b = pl.program_id(0)
        j = pl.program_id(1)
        length = lengths_ref[b]

        @pl.when(j == 0)
        def _():
            m_scr[:, :] = jnp.full_like(m_scr[:, :], NEG_INF)
            l_scr[:, :] = jnp.zeros_like(l_scr[:, :])
            acc_scr[:, :] = jnp.zeros_like(acc_scr[:, :])

        pos = j * bs + jax.lax.broadcasted_iota(jnp.int32, (1, bs), 1)
        pos_ok = pos < length

        def head_body(h, _):
            q = q_ref[0, h].astype(jnp.float32)  # [G, D]
            k = k_ref[h, 0].astype(jnp.float32)  # [bs, D]
            v = v_ref[h, 0].astype(jnp.float32)

            s = (
                jax.lax.dot_general(
                    q, k, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                * scale
            )  # [G, bs]
            s = jnp.where(pos_ok, s, NEG_INF)

            r = h * G
            m_prev = m_scr[pl.ds(r, G), :1]  # [G, 1]
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
            alpha = jnp.exp(m_prev - m_new)
            p = jnp.exp(s - m_new)  # [G, bs]
            l_new = l_scr[pl.ds(r, G), :1] * alpha + jnp.sum(
                p, axis=-1, keepdims=True
            )
            acc = acc_scr[pl.ds(r, G), :] * alpha + jax.lax.dot_general(
                p, v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            m_scr[pl.ds(r, G), :1] = m_new
            l_scr[pl.ds(r, G), :1] = l_new
            acc_scr[pl.ds(r, G), :] = acc

            @pl.when(j == max_blocks - 1)
            def _():
                denom = jnp.maximum(l_scr[pl.ds(r, G), :1], 1e-30)
                o_ref[0, h] = (acc_scr[pl.ds(r, G), :] / denom).astype(
                    o_ref.dtype
                )

            return 0

        jax.lax.fori_loop(0, H, head_body, 0)

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def paged_attention_decode(
    q,  # [B, Hq, D]
    k_pool,  # [Hkv, n_blocks, bs, D]
    v_pool,
    tables,  # [B, max_blocks] int32 (entries may be a >=n_blocks sentinel)
    lengths,  # [B] int32 — EXCLUSIVE visible count: p < lengths[b] attends
    interpret: bool = False,
):
    """Returns [B, Hq, D]. Slot b attends pool positions p < lengths[b]
    along its block table."""
    B, Hq, D = q.shape
    Hkv, n_blocks, bs, _ = k_pool.shape
    G = Hq // Hkv
    max_blocks = tables.shape[1]

    qg = q.reshape(B, Hkv, G, D)
    tables_c = jnp.minimum(tables, n_blocks - 1).astype(jnp.int32)
    lengths = lengths.astype(jnp.int32)

    kernel = _make_kernel(bs, D, G, Hkv, max_blocks)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, max_blocks),
        in_specs=[
            pl.BlockSpec(
                (1, Hkv, G, D), lambda b, j, t, ln: (b, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (Hkv, 1, bs, D), lambda b, j, t, ln: (0, t[b, j], 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (Hkv, 1, bs, D), lambda b, j, t, ln: (0, t[b, j], 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, Hkv, G, D), lambda b, j, t, ln: (b, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((Hkv * G, 128), jnp.float32),
            pltpu.VMEM((Hkv * G, 128), jnp.float32),
            pltpu.VMEM((Hkv * G, D), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hkv, G, D), q.dtype),
        interpret=interpret,
    )(tables_c, lengths, qg, k_pool, v_pool)
    return out.reshape(B, Hq, D)
