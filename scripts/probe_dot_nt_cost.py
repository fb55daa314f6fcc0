"""Probe: cost of the rhs-transposed score matmul vs the fp-kernel pattern.

Each variant runs REPS iterations inside ONE kernel via fori_loop
(dispatch-amortized; the remote relay costs ~30 ms per call), best of 5
calls. Shapes mirror one GPT-2 layer's attention at capacity C.

  python scripts/probe_dot_nt_cost.py [--c 1024] [--reps 2048]
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
    ap.add_argument("--c", type=int, default=1024)
    ap.add_argument("--e", type=int, default=768)
    ap.add_argument("--h", type=int, default=16)
    ap.add_argument("--reps", type=int, default=2048)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from efficient_llm_inference_tpu.core.utils import (
        enable_compilation_cache,
    )

    enable_compilation_cache()
    C, E, Hp, R = args.c, args.e, args.h, args.reps

    key = jax.random.PRNGKey(0)
    u = jax.random.normal(key, (Hp, E), jnp.float32)
    k8 = jax.random.randint(key, (C, E), -127, 128, jnp.int32).astype(jnp.int8)
    kbf = jax.random.normal(key, (C, E), jnp.bfloat16)
    ps = jax.random.uniform(key, (Hp, C), jnp.float32)
    pct = jax.random.uniform(key, (C, Hp), jnp.float32)
    sel = jax.random.normal(key, (E, Hp), jnp.float32)
    selT = jax.random.normal(key, (Hp, E), jnp.float32)

    def timed(name, f, *xs):
        g = jax.jit(f)
        np.asarray(g(*xs))  # compile + warm
        best = 1e9
        for _ in range(5):
            t0 = time.perf_counter()
            np.asarray(g(*xs))
            best = min(best, time.perf_counter() - t0)
        print(f"  {name:28s}: {best / R * 1e6:8.2f} us/rep "
              f"(total {best * 1e3:.1f} ms)", flush=True)

    def mk(body, n_in):
        def kern(*refs):
            o_ref = refs[-1]

            def it(i, acc):
                return acc + body(i, *refs[:-1])

            o_ref[:] = jax.lax.fori_loop(
                0, R, it, jnp.zeros((Hp, 128), jnp.float32)
            )

        return pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * n_in,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((Hp, 128), jnp.float32),
        )

    def a_body(i, u_ref, k_ref):  # transposed score, int8 pane
        kf = k_ref[:].astype(jnp.float32)
        s = jax.lax.dot_general(
            u_ref[:] + i.astype(jnp.float32), kf, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [Hp, C]
        return jnp.sum(s, axis=1, keepdims=True) + jnp.zeros((Hp, 128))

    timed("a) dot_nt int8 score", mk(a_body, 2), u, k8)

    def a2_body(i, u_ref, k_ref):  # transposed score, bf16 pane
        kf = k_ref[:].astype(jnp.float32)
        s = jax.lax.dot_general(
            u_ref[:] + i.astype(jnp.float32), kf, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return jnp.sum(s, axis=1, keepdims=True) + jnp.zeros((Hp, 128))

    timed("a2) dot_nt bf16 score", mk(a2_body, 2), u, kbf)

    def b_body(i, q_ref, k_ref, sel_ref):  # fp-style score
        kf = k_ref[:].astype(jnp.float32)
        prod = kf * (q_ref[0:1, :] + i.astype(jnp.float32))
        s = jax.lax.dot_general(
            prod, sel_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [C, Hp]
        return jnp.sum(s) + jnp.zeros((Hp, 128))

    timed("b) fp-style int8 score", mk(b_body, 3), u, k8, sel)
    timed("b2) fp-style bf16 score", mk(b_body, 3), u, kbf, sel)

    def c_body(i, p_ref, v_ref):  # transposed PV
        vf = v_ref[:].astype(jnp.float32)
        m = jax.lax.dot_general(
            p_ref[:] + i.astype(jnp.float32), vf, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [Hp, E]
        return jnp.sum(m, axis=1, keepdims=True) + jnp.zeros((Hp, 128))

    timed("c) dot_nn int8 PV", mk(c_body, 2), ps, k8)
    timed("c2) dot_nn bf16 PV", mk(c_body, 2), ps, kbf)

    def d_body(i, p_ref, v_ref, selT_ref):  # fp-style PV
        vf = v_ref[:].astype(jnp.float32)
        pe = jax.lax.dot_general(
            p_ref[:] + i.astype(jnp.float32), selT_ref[:],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [C, E]
        return jnp.sum(pe * vf) + jnp.zeros((Hp, 128))

    timed("d) fp-style bf16 PV", mk(d_body, 3), pct, kbf, selT)

    def e_body(i, k_ref):  # bare int8 -> f32 convert + reduce
        kf = (k_ref[:].astype(jnp.float32) *
              (1.0 + i.astype(jnp.float32)))
        return jnp.sum(kf) + jnp.zeros((Hp, 128))

    timed("e) int8 convert+reduce", mk(e_body, 1), k8)
    timed("e2) bf16 convert+reduce", mk(e_body, 1), kbf)


if __name__ == "__main__":
    main()
