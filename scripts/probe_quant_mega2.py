"""Probe 2 follow-up: isolate the int8 8-row RMW failure.

Variants: (a) pure copy (no arithmetic), (b) int8 add via int32 round-trip,
(c) 32-row group, (d) insert-row via iota select (the real RMW op).

  python scripts/probe_quant_mega2.py
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
    L, C, E = 4, 512, 768
    key = jax.random.PRNGKey(0)
    k3 = jax.random.randint(key, (L, C, E), -100, 100, jnp.int32).astype(
        jnp.int8
    )

    def run(name, rows, body):
        def kern(len_ref, k_ref, o_ref, gbuf, gsem):
            cur = len_ref[0, 0]
            gbase = pl.multiple_of((cur // rows) * rows, rows)
            din = pltpu.make_async_copy(
                k_ref.at[:, pl.ds(gbase, rows), :], gbuf, gsem.at[0]
            )
            din.start()
            din.wait()
            body(gbuf, cur - gbase)
            dout = pltpu.make_async_copy(
                gbuf, o_ref.at[:, pl.ds(gbase, rows), :], gsem.at[1]
            )
            dout.start()
            dout.wait()

        f = pl.pallas_call(
            kern,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.HBM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
            out_shape=jax.ShapeDtypeStruct((L, C, E), jnp.int8),
            scratch_shapes=[
                pltpu.VMEM((L, rows, E), jnp.int8),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            input_output_aliases={1: 0},
        )
        try:
            out = np.asarray(jax.jit(f)(jnp.full((1, 1), 41, jnp.int32), k3))
            print(f"{name}: compiled; changed rows = "
                  f"{int((out != np.asarray(k3)).any(axis=(0, 2)).sum())}")
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:300]}")

    run("a) int8 8-row pure copy", 8, lambda g, off: None)

    def add_i32(g, off):
        g[:] = (g[:].astype(jnp.int32) + 1).astype(jnp.int8)

    run("b) int8 8-row add-via-int32", 8, add_i32)

    def add_i8(g, off):
        g[:] = g[:] + jnp.int8(1)

    run("c) int8 32-row add-int8", 32, add_i8)

    def insert(g, off):
        ridx = jax.lax.broadcasted_iota(jnp.int32, (L, 8, E), 1)
        newrow = jnp.full((L, 1, E), 7, jnp.int8)
        g[:] = jnp.where(ridx == off, jnp.broadcast_to(newrow, (L, 8, E)),
                         g[:])

    run("d) int8 8-row iota-insert", 8, insert)


if __name__ == "__main__":
    main()
