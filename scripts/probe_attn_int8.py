"""Probe: int8 x int8 attention dots vs the shipped convert+bf16 chain.

Round-4 verdict: the 2048-context quant-KV single-stream loss (~20%) was
profiled to the C-linear int8->bf16 pane convert (~250 us/step), but the
int8 x int8 MXU lever was only refuted on the WEIGHT tile chain
(scripts/probe_int8_dot.py), where the convert is hidden behind the DMA.
This probe times the ATTENTION-shaped chains: [H, E] query block against a
[C, E] int8 pane (rhs-transposed score dot) and [H, C] probs against a
[C, E] int8 pane (PV dot), C-linear and NOT DMA-hidden.

Variants per side:
  score a) shipped: kc.astype(bf16), dot_nt(u_bf16, kc)       (convert paid)
  score b) int8:    dot_nt(u_int8, kc_int8) -> int32, scale   (convert gone)
  pv    c) shipped: vc.astype(bf16), dot_nn(p_bf16, vc)
  pv    d) int8:    dot_nn(p_int8, vc_int8) -> int32, scale

Each variant runs REPS iterations inside ONE kernel via fori_loop
(dispatch-amortized), best of 5 calls, plus a correctness residual for the
int8 dots vs fp32 numpy.

  python scripts/probe_attn_int8.py [--c 2048] [--reps 1024]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--c", type=int, default=2048)
    ap.add_argument("--e", type=int, default=768)
    ap.add_argument("--h", type=int, default=16)
    ap.add_argument("--reps", type=int, default=1024)
    ap.add_argument("--chunk", type=int, default=512)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from efficient_llm_inference_tpu.core.utils import (
        enable_compilation_cache,
    )

    enable_compilation_cache()
    C, E, Hp, R, CH = args.c, args.e, args.h, args.reps, args.chunk

    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    u = jax.random.normal(k1, (Hp, E), jnp.float32)
    u8 = jnp.clip(jnp.round(u * 20.0), -127, 127).astype(jnp.int8)
    k8 = jax.random.randint(k2, (C, E), -127, 128, jnp.int32).astype(jnp.int8)
    p = jax.random.uniform(k3, (Hp, C), jnp.float32)
    p8 = jnp.clip(jnp.round(p * 127.0), 0, 127).astype(jnp.int8)
    v8 = jax.random.randint(k4, (C, E), -127, 128, jnp.int32).astype(jnp.int8)

    def timed(name, f, *xs):
        g = jax.jit(f)
        np.asarray(g(*xs))  # compile + warm
        best = 1e9
        for _ in range(5):
            t0 = time.perf_counter()
            np.asarray(g(*xs))
            best = min(best, time.perf_counter() - t0)
        print(f"  {name:34s}: {best / R * 1e6:8.2f} us/rep "
              f"(total {best * 1e3:.1f} ms)", flush=True)
        return best / R

    def mk(body, n_in, out_shape=None):
        out_shape = out_shape or (Hp, 128)

        def kern(*refs):
            o_ref = refs[-1]

            def it(i, acc):
                return acc + body(i, *refs[:-1])

            o_ref[:] = jax.lax.fori_loop(
                0, R, it, jnp.zeros(out_shape, jnp.float32)
            )

        return pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * n_in,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
        )

    def dot_nt(a, b, pt):
        return jax.lax.dot_general(
            a, b, (((1,), (1,)), ((), ())), preferred_element_type=pt
        )

    def dot_nn(a, b, pt):
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())), preferred_element_type=pt
        )

    # ---- score side: [H, E] x [C, E]^T, chunked in C ----------------------
    def score_bf16(i, u_ref, k_ref):
        ub = (u_ref[:] + i.astype(jnp.float32)).astype(jnp.bfloat16)
        acc = jnp.zeros((Hp, 1), jnp.float32)
        for c0 in range(0, C, CH):
            kc = k_ref[c0:c0 + CH, :].astype(jnp.bfloat16)  # CONVERT
            s = dot_nt(ub, kc, jnp.float32)  # [Hp, CH]
            acc = acc + jnp.sum(s, axis=1, keepdims=True)
        return acc + jnp.zeros((Hp, 128))

    def score_i8(i, u_ref, k_ref):
        # loop-dependence via an i16 add (Mosaic has no i8 vector add)
        ui = (u_ref[:].astype(jnp.int16)
              + i.astype(jnp.int16)).astype(jnp.int8)
        acc = jnp.zeros((Hp, 1), jnp.float32)
        for c0 in range(0, C, CH):
            kc = k_ref[c0:c0 + CH, :]  # raw int8
            s = dot_nt(ui, kc, jnp.int32).astype(jnp.float32) * 0.01
            acc = acc + jnp.sum(s, axis=1, keepdims=True)
        return acc + jnp.zeros((Hp, 128))

    # ---- PV side: [H, C] x [C, E], chunked in C ---------------------------
    def pv_bf16(i, p_ref, v_ref):
        pb = (p_ref[:] + i.astype(jnp.float32)).astype(jnp.bfloat16)
        acc = jnp.zeros((Hp, E), jnp.float32)
        for c0 in range(0, C, CH):
            vc = v_ref[:, c0:c0 + CH] if False else v_ref[c0:c0 + CH, :]
            vc = vc.astype(jnp.bfloat16)  # CONVERT
            acc = acc + dot_nn(pb[:, c0:c0 + CH], vc, jnp.float32)
        return jnp.sum(acc, axis=1, keepdims=True) + jnp.zeros((Hp, 128))

    def pv_i8(i, p_ref, v_ref):
        pi = (p_ref[:].astype(jnp.int16)
              + i.astype(jnp.int16)).astype(jnp.int8)
        acc = jnp.zeros((Hp, E), jnp.float32)
        for c0 in range(0, C, CH):
            vc = v_ref[c0:c0 + CH, :]  # raw int8
            y = dot_nn(pi[:, c0:c0 + CH], vc, jnp.int32)
            acc = acc + y.astype(jnp.float32) * 0.01
        return jnp.sum(acc, axis=1, keepdims=True) + jnp.zeros((Hp, 128))

    # quantize-the-query cost (what the int8 path adds per step): one
    # [H, E] dynamic quantization
    def qquant(i, u_ref):
        x = u_ref[:] + i.astype(jnp.float32)
        amax = jnp.max(jnp.abs(x), axis=1, keepdims=True)
        s = jnp.maximum(amax * (1.0 / 127.0), 1e-8)
        q = jnp.clip(jnp.round(x / s), -127.0, 127.0)
        return jnp.sum(q, axis=1, keepdims=True) + jnp.zeros((Hp, 128))

    print(f"[probe] C={C} E={E} H={Hp} chunk={CH} reps={R}")
    t_a = timed("a) score: convert + bf16 dot_nt", mk(score_bf16, 2), u, k8)
    try:
        t_b = timed("b) score: int8 x int8 dot_nt", mk(score_i8, 2), u8, k8)
    except Exception as e:
        print(f"  b) score int8 FAILED: {type(e).__name__}: {e}")
        t_b = None
    t_c = timed("c) pv: convert + bf16 dot_nn", mk(pv_bf16, 2), p, v8)
    try:
        t_d = timed("d) pv: int8 x int8 dot_nn", mk(pv_i8, 2), p8, v8)
    except Exception as e:
        print(f"  d) pv int8 FAILED: {type(e).__name__}: {e}")
        t_d = None
    t_q = timed("e) query dyn-quant [H, E]", mk(qquant, 1), u)

    if t_b is not None:
        print(f"  score: int8 is {t_a / t_b:.2f}x the convert chain")
    if t_d is not None:
        print(f"  pv:    int8 is {t_c / t_d:.2f}x the convert chain")
    print(f"  per-step delta at L=12 (score+pv both sides): "
          f"{12 * ((t_a - (t_b or t_a)) + (t_c - (t_d or t_c))) * 1e6:.1f} us"
          f" minus 24x quant cost {24 * t_q * 1e6:.1f} us")

    # correctness residual of the int8 dots (values, not perf)
    got = dot_nt(u8, k8[:CH], jnp.int32)
    want = np.asarray(u8, np.int64) @ np.asarray(k8[:CH], np.int64).T
    print(f"  int8 dot_nt exact: {bool((np.asarray(got) == want).all())}")


if __name__ == "__main__":
    main()
