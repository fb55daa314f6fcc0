"""Probe: Mosaic capabilities needed for quantized KV panes in the megakernel.

Questions (docs/ROADMAP + VERDICT round-3 item 1):
  1. Does `dot_general` with rhs-transposed contraction (((1,),(1,)),((),()))
     compile in Mosaic? Needed for the [H, C]-oriented score matmul
     u [H, E] x k8 [C, E]^T that makes per-token scales a free lane
     broadcast ([1, C] rows instead of [C, 1] columns).
  2. Can DMA slice an 8-row sublane group of an int8 [L, C, E] HBM array
     (int8 native tile is 32 sublanes)? Needed for the quantize-on-write
     read-modify-write. Falls back to 32-row groups if not.
  3. End-to-end numeric check of the transposed quant attention math vs a
     jnp reference (scores scaled per token, softmax in [H, C], PV via
     [H, C] @ [C, E], head fold via sum(M * selT)).

  python scripts/probe_quant_mega.py
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from efficient_llm_inference_tpu.core.utils import enable_compilation_cache

    enable_compilation_cache()
    print("devices:", jax.devices())

    H, E, C, L = 12, 768, 512, 4
    D = E // H

    # ---- probe 1+3: transposed quant attention in one kernel -------------
    def attn_kernel(q_ref, k8_ref, ks_ref, v8_ref, vs_ref, len_ref, o_ref):
        cur = len_ref[0, 0]
        e_ids = jax.lax.broadcasted_iota(jnp.int32, (E, H), 0) // D
        h_ids = jax.lax.broadcasted_iota(jnp.int32, (E, H), 1)
        selT = (e_ids == h_ids).astype(jnp.float32).T  # [H, E]
        qf = q_ref[:].astype(jnp.float32)  # [1, E]
        u = selT * qf  # [H, E] broadcast over sublanes
        k8f = k8_ref[:].astype(jnp.float32)  # [C, E]
        raw = jax.lax.dot_general(
            u, k8f, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [H, C]  <-- rhs-transposed contraction
        scale = 1.0 / (float(D) ** 0.5)
        st = raw * ks_ref[0:1, :] * scale  # [1, C] lane broadcast
        col = jax.lax.broadcasted_iota(jnp.int32, (H, C), 1)
        st = jnp.where(col < cur, st, -1e30)
        mx = jnp.max(st, axis=1, keepdims=True)
        p = jnp.exp(st - mx)  # [H, C]
        denom = jnp.sum(p, axis=1, keepdims=True)  # [H, 1]
        ps = p * vs_ref[0:1, :]  # fold per-token V scales
        v8f = v8_ref[:].astype(jnp.float32)
        M = jax.lax.dot_general(
            ps, v8f, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [H, E]
        den_e = jnp.sum(selT * denom, axis=0, keepdims=True)  # [1, E]
        o_ref[:] = jnp.sum(M * selT, axis=0, keepdims=True) / den_e

    key = jax.random.PRNGKey(0)
    kq, kk, kv, ks_, vs_ = jax.random.split(key, 5)
    q = jax.random.normal(kq, (1, E), jnp.float32)
    k8 = jax.random.randint(kk, (C, E), -127, 128, jnp.int32).astype(jnp.int8)
    v8 = jax.random.randint(kv, (C, E), -127, 128, jnp.int32).astype(jnp.int8)
    ks = jax.random.uniform(ks_, (1, C), jnp.float32, 0.01, 0.03)
    vs = jax.random.uniform(vs_, (1, C), jnp.float32, 0.01, 0.03)
    cur = 300

    f = pl.pallas_call(
        attn_kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5
        + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, E), jnp.float32),
    )
    try:
        out = np.asarray(
            jax.jit(f)(q, k8, ks, v8, vs, jnp.full((1, 1), cur, jnp.int32))
        )
        # jnp reference
        kf = np.asarray(k8, np.float32) * np.asarray(ks)[0][:, None]
        vf = np.asarray(v8, np.float32) * np.asarray(vs)[0][:, None]
        qn = np.asarray(q)[0]
        ref = np.zeros(E, np.float32)
        for h in range(H):
            sl = slice(h * D, (h + 1) * D)
            s = (kf[:, sl] @ qn[sl]) / np.sqrt(D)
            s[cur:] = -1e30
            p = np.exp(s - s.max())
            p /= p.sum()
            ref[sl] = p @ vf[:, sl]
        err = np.abs(out[0] - ref).max() / (np.abs(ref).max() + 1e-9)
        print(f"PROBE1+3 transposed quant attention: OK, rel err {err:.2e}")
    except Exception as e:  # noqa: BLE001
        print(f"PROBE1+3 FAILED: {type(e).__name__}: {str(e)[:500]}")

    # ---- probe 2: 8-row DMA slice of an int8 HBM array --------------------
    def rmw_kernel(len_ref, k_ref, o_ref, gbuf, gsem):
        cur = len_ref[0, 0]
        gbase = pl.multiple_of((cur // 8) * 8, 8)
        din = pltpu.make_async_copy(
            k_ref.at[:, pl.ds(gbase, 8), :], gbuf, gsem.at[0]
        )
        din.start()
        din.wait()
        gbuf[:] = gbuf[:] + jnp.int8(1)
        dout = pltpu.make_async_copy(
            gbuf, o_ref.at[:, pl.ds(gbase, 8), :], gsem.at[1]
        )
        dout.start()
        dout.wait()

    k3 = jax.random.randint(kk, (L, C, E), -100, 100, jnp.int32).astype(jnp.int8)
    f2 = pl.pallas_call(
        rmw_kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        out_shape=jax.ShapeDtypeStruct((L, C, E), jnp.int8),
        scratch_shapes=[
            pltpu.VMEM((L, 8, E), jnp.int8),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        input_output_aliases={1: 0},
    )
    try:
        out2 = np.asarray(jax.jit(f2)(jnp.full((1, 1), 41, jnp.int32), k3))
        exp = np.asarray(k3).copy()
        exp[:, 40:48, :] += 1
        ok = np.array_equal(out2, exp)
        print(f"PROBE2 int8 8-row RMW DMA: {'OK' if ok else 'WRONG RESULT'}")
    except Exception as e:  # noqa: BLE001
        print(f"PROBE2 FAILED: {type(e).__name__}: {str(e)[:500]}")

    # ---- probe 2b: same for uint8 (packed int4 pane) ----------------------
    k4 = jax.random.randint(kk, (L, C, E // 2), 0, 255, jnp.int32).astype(
        jnp.uint8
    )
    f3 = pl.pallas_call(
        rmw_kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        out_shape=jax.ShapeDtypeStruct((L, C, E // 2), jnp.uint8),
        scratch_shapes=[
            pltpu.VMEM((L, 8, E // 2), jnp.uint8),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        input_output_aliases={1: 0},
    )
    try:
        out3 = np.asarray(jax.jit(f3)(jnp.full((1, 1), 41, jnp.int32), k4))
        exp = np.asarray(k4).copy()
        exp[:, 40:48, :] += 1
        ok = np.array_equal(out3, exp)
        print(f"PROBE2b uint8 8-row RMW DMA: {'OK' if ok else 'WRONG RESULT'}")
    except Exception as e:  # noqa: BLE001
        print(f"PROBE2b FAILED: {type(e).__name__}: {str(e)[:500]}")


if __name__ == "__main__":
    main()
