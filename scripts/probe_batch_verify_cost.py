"""Probe: batched verify round cost vs batched step cost on the chip.

Times a scan of N invocations of gpt2_megabatch (one step, B slots) and of
gpt2_megabatch_verify (one round, B x R rows) at serving shapes, both as
ONE dispatch, to isolate the verify kernel's intrinsic cost from server
bookkeeping/fetch effects.

  python scripts/probe_batch_verify_cost.py [--slots 16] [--cap 128]
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
    ap.add_argument("--slots", type=int, default=16)
    ap.add_argument("--cap", type=int, default=128)
    ap.add_argument("--reps", type=int, default=64)
    ap.add_argument("--wq", default="int8", choices=["int8", "none"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from efficient_llm_inference_tpu.core.config import Config
    from efficient_llm_inference_tpu.core.utils import (
        enable_compilation_cache,
    )
    from efficient_llm_inference_tpu.engine.engine import InferenceEngine
    from efficient_llm_inference_tpu.ops.pallas.megakernel import (
        pack_gpt2_mega,
    )
    from efficient_llm_inference_tpu.ops.pallas.megakernel_batch import (
        gpt2_megabatch,
    )
    from efficient_llm_inference_tpu.ops.pallas.megakernel_batch_verify import (
        gpt2_megabatch_verify,
    )

    enable_compilation_cache()
    B, C, N = args.slots, args.cap, args.reps
    cfg_ = Config(model_name="gpt2",
                  weight_quant=None if args.wq == "none" else args.wq)
    eng = InferenceEngine.from_model_name("gpt2", config=cfg_)
    cfg = eng.model.config
    E, L = cfg.n_embd, cfg.n_layer
    packed = pack_gpt2_mega(eng.params, cfg)
    dtype = cfg_.dtype

    rng = np.random.default_rng(0)
    k = jnp.asarray(rng.normal(size=(L, B, C, E)), dtype)
    v = jnp.asarray(rng.normal(size=(L, B, C, E)), dtype)
    lengths = jnp.asarray(rng.integers(16, C - 24, size=B), jnp.int32)
    params = eng.params

    def timed(name, fn, *xs):
        r = fn(*xs)
        jax.tree.map(np.asarray, r)  # warm/compile + sync
        best = 1e9
        for _ in range(4):
            t0 = time.perf_counter()
            r = fn(*xs)
            jax.tree.map(np.asarray, r)
            best = min(best, time.perf_counter() - t0)
        print(f"  {name:34s}: {best / N * 1e3:7.3f} ms/iter "
              f"(total {best * 1e3:.0f} ms)", flush=True)
        return best / N

    @jax.jit
    def steps(k, v, toks):
        def body(carry, _):
            k, v, toks = carry
            x = (params["wte"][toks] + params["wpe"][lengths]).astype(dtype)
            t2, k, v = gpt2_megabatch(
                packed, k, v, lengths, x, cfg=cfg, capacity=C
            )
            return (k, v, t2), ()

        (k, v, toks), _ = jax.lax.scan(body, (k, v, toks), None, length=N)
        return toks

    from functools import partial

    @partial(jax.jit, static_argnames=("R",))
    def rounds(k, v, toks, R):
        pos = lengths[:, None] + jnp.arange(R, dtype=jnp.int32)[None]
        pos = jnp.minimum(pos, cfg.n_positions - 1)

        def body(carry, _):
            k, v, toks = carry
            vin = jnp.broadcast_to(toks[:, None], (B, R))
            x = (params["wte"][vin] + params["wpe"][pos]).astype(dtype)
            g, k, v = gpt2_megabatch_verify(
                packed, k, v, lengths, x.reshape(B * R, E),
                cfg=cfg, capacity=C, rows=R,
            )
            return (k, v, g[:, 0]), ()

        (k, v, toks), _ = jax.lax.scan(body, (k, v, toks), None, length=N)
        return toks

    toks0 = jnp.zeros((B,), jnp.int32)
    print(f"[probe] B={B} C={C} wq={args.wq} reps={N}")
    t_step = timed("gpt2_megabatch step", steps, k, v, toks0)
    for R in (8, 4, 2):
        t_r = timed(f"gpt2_megabatch_verify R={R}",
                    lambda k_, v_, t_, R=R: rounds(k_, v_, t_, R=R),
                    k, v, toks0)
        print(f"    -> round/step = {t_r / t_step:.2f}x "
              f"(break-even acc {t_r / t_step:.2f} tok/round)")


if __name__ == "__main__":
    main()
