"""Probe: cost of the attention pane convert feeding the score dot.

Hypothesis from probe_dot_nt_cost.py: all orientations cost ~12.5 us/layer
because Mosaic materializes the f32-converted pane; feeding the MXU bf16
operands directly (int8 -> bf16 is value-exact for codes in [-127, 127])
should cut the VMEM traffic in half or avoid the materialization entirely.

  python scripts/probe_attn_convert.py [--c 1024]
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
    u32 = jax.random.normal(key, (Hp, E), jnp.float32)
    ubf = u32.astype(jnp.bfloat16)
    k8 = jax.random.randint(key, (C, E), -127, 128, jnp.int32).astype(jnp.int8)
    kbf = jax.random.normal(key, (C, E), jnp.bfloat16)
    ps32 = jax.random.uniform(key, (Hp, C), jnp.float32)
    psbf = ps32.astype(jnp.bfloat16)

    def timed(name, f, *xs):
        g = jax.jit(f)
        np.asarray(g(*xs))
        best = 1e9
        for _ in range(5):
            t0 = time.perf_counter()
            np.asarray(g(*xs))
            best = min(best, time.perf_counter() - t0)
        print(f"  {name:34s}: {best / R * 1e6:8.2f} us/rep", flush=True)

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

    def nt(a, b):
        return jax.lax.dot_general(
            a, b, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    def nn(a, b):
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    def a_body(i, u_ref, k_ref):  # current kernel: int8 -> f32 then dot
        s = nt(u_ref[:] + i.astype(jnp.float32),
               k_ref[:].astype(jnp.float32))
        return jnp.sum(s, axis=1, keepdims=True) + jnp.zeros((Hp, 128))

    timed("a) int8->f32, f32 dot_nt", mk(a_body, 2), u32, k8)

    def b_body(i, u_ref, k_ref):  # int8 -> bf16, bf16 dot
        ub = (u_ref[:] + i.astype(jnp.bfloat16))
        s = nt(ub, k_ref[:].astype(jnp.bfloat16))
        return jnp.sum(s, axis=1, keepdims=True) + jnp.zeros((Hp, 128))

    timed("b) int8->bf16, bf16 dot_nt", mk(b_body, 2), ubf, k8)

    def c_body(i, u_ref, k_ref):  # bf16 pane direct, no convert
        ub = (u_ref[:] + i.astype(jnp.bfloat16))
        s = nt(ub, k_ref[:])
        return jnp.sum(s, axis=1, keepdims=True) + jnp.zeros((Hp, 128))

    timed("c) bf16 pane, direct bf16 dot_nt", mk(c_body, 2), ubf, kbf)

    def d_body(i, u_ref, k_ref):  # bf16 pane -> f32 (fp kernel today)
        s = nt(u_ref[:] + i.astype(jnp.float32),
               k_ref[:].astype(jnp.float32))
        return jnp.sum(s, axis=1, keepdims=True) + jnp.zeros((Hp, 128))

    timed("d) bf16->f32, f32 dot_nt", mk(d_body, 2), u32, kbf)

    def e_body(i, p_ref, v_ref):  # PV: int8 -> bf16, bf16 dot
        pb = p_ref[:] + i.astype(jnp.bfloat16)
        m = nn(pb, v_ref[:].astype(jnp.bfloat16))
        return jnp.sum(m, axis=1, keepdims=True) + jnp.zeros((Hp, 128))

    timed("e) PV int8->bf16, bf16 dot_nn", mk(e_body, 2), psbf, k8)

    def f_body(i, p_ref, v_ref):  # PV current: int8 -> f32
        m = nn(p_ref[:] + i.astype(jnp.float32),
               v_ref[:].astype(jnp.float32))
        return jnp.sum(m, axis=1, keepdims=True) + jnp.zeros((Hp, 128))

    timed("f) PV int8->f32, f32 dot_nn", mk(f_body, 2), ps32, k8)

    def g_body(i, u_ref, k_ref):  # s8 x s8 -> s32 native MXU int path
        u8 = (u_ref[:] + i).astype(jnp.int8)
        s = jax.lax.dot_general(
            u8, k_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        return (jnp.sum(s, axis=1, keepdims=True).astype(jnp.float32)
                + jnp.zeros((Hp, 128)))

    try:
        timed("g) s8 x s8 -> s32 dot_nt", mk(g_body, 2),
              jax.random.randint(key, (Hp, E), -127, 128, jnp.int32),
              k8)
    except Exception as e:  # noqa: BLE001
        print(f"  g) s8 x s8 -> s32 dot_nt: UNSUPPORTED ({type(e).__name__})")


if __name__ == "__main__":
    main()
