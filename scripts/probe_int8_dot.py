"""Probe: int8 x int8 dot_general -> int32 inside a Pallas TPU kernel.

Decides the w8a8/w4a8 question (docs/ROADMAP.md #2): if the MXU takes
int8 operands directly, the int4/int8 megakernel tiles could skip the
per-weight convert/scale VPU chain by quantizing activations per row and
scaling on the int32 accumulator. Measures a weight-streaming microbench
(dispatch-amortized) against the bf16-convert baseline on the same tiles.

  python scripts/probe_int8_dot.py [--rows 1] [--tiles 24] [--reps 200]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=8)
    ap.add_argument("--k", type=int, default=768)
    ap.add_argument("--n", type=int, default=768)
    ap.add_argument("--tiles", type=int, default=210)
    ap.add_argument("--reps", type=int, default=64)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from efficient_llm_inference_tpu.core.utils import enable_compilation_cache

    enable_compilation_cache()
    R, K, N, T = args.rows, args.k, args.n, args.tiles

    def make(mode):
        def kernel(x_ref, w_ref, o_ref, wbuf, wsem):
            def wdma(slot, t):
                return pltpu.make_async_copy(
                    w_ref.at[t], wbuf.at[slot], wsem.at[slot]
                )

            wdma(0, 0).start()
            acc = jnp.zeros((R, N), jnp.float32)
            for t in range(T):
                if t + 1 < T:
                    wdma((t + 1) % 2, t + 1).start()
                wdma(t % 2, t).wait()
                if mode == "int8dot":
                    xi = x_ref[:]  # int8 activations
                    y = jax.lax.dot_general(
                        xi, wbuf[t % 2],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32,
                    )
                    acc = acc + y.astype(jnp.float32)
                else:  # bf16 convert baseline (the shipped int8-tile path)
                    xb = x_ref[:].astype(jnp.bfloat16)
                    y = jax.lax.dot_general(
                        xb, wbuf[t % 2].astype(jnp.bfloat16),
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    acc = acc + y
            o_ref[:] = acc

        return pl.pallas_call(
            kernel,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),  # x [R, K]
                pl.BlockSpec(memory_space=pltpu.HBM),  # w [T, K, N] int8
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((R, N), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((2, K, N), jnp.int8),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )

    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.integers(-127, 128, (T, K, N)), jnp.int8)
    xi = jnp.asarray(rng.integers(-127, 128, (R, K)), jnp.int8)

    for mode in ("int8dot", "bf16conv"):
        f = make(mode)
        xin = xi

        @jax.jit
        def run(x, w, f=f):
            def body(c, _):
                return c, f(x, w)[0, 0]
            _, outs = jax.lax.scan(body, 0, None, length=args.reps)
            return outs

        try:
            t0 = time.perf_counter()
            out = run(xin, w)
            np.asarray(out)
            compile_s = time.perf_counter() - t0
        except Exception as e:
            print(f"{mode}: FAILED — {str(e)[:300]}")
            continue
        t0 = time.perf_counter()
        out = run(xin, w)
        np.asarray(out)
        dt = time.perf_counter() - t0
        per = dt / args.reps
        gbs = T * K * N / per / 1e9
        print(f"{mode}: {per*1e6:.0f} us/pass, {gbs:.0f} GB/s of int8 bytes "
              f"(compile {compile_s:.0f}s)")

    # numeric check: int8 dot == int32 reference
    f = make("int8dot")
    got = np.asarray(f(xi, w))
    want = sum(
        np.asarray(xi, np.int32) @ np.asarray(w[t], np.int32)
        for t in range(T)
    ).astype(np.float32)
    err = np.abs(got - want).max()
    print(f"int8dot exactness vs int32 numpy: max |err| = {err}")


if __name__ == "__main__":
    main()
