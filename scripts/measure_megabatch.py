"""Measure the batched whole-step megakernel on the TPU chip.

Usage:
  python scripts/measure_megabatch.py [--batch 8] [--capacity 512]
      [--wq int8|int4|none] [--steps 128] [--reps 4] [--fill 0]

B independent GPT-2-small streams decode `--steps` tokens inside ONE jitted
lax.scan over gpt2_megabatch; prints us/step and aggregate tok/s per rep.
`--fill` sets the starting cache length (default: capacity - steps - 8, the
worst case where attention spans nearly the whole pane).
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
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--capacity", type=int, default=512)
    ap.add_argument("--wq", default="int8", choices=["int8", "int4", "none"])
    ap.add_argument("--steps", type=int, default=128)
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--fill", type=int, default=0)
    ap.add_argument("--model", default="gpt2",
                    help="gpt2 (small) or a llama registry name "
                         "(e.g. llama-3-1b, qwen2.5-1.5b)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from efficient_llm_inference_tpu.core.utils import enable_compilation_cache

    enable_compilation_cache()
    B, C = args.batch, args.capacity
    dtype = jnp.bfloat16
    llama = args.model != "gpt2"
    if llama:
        from efficient_llm_inference_tpu.models import llama as llama_mod
        from efficient_llm_inference_tpu.models.llama import rope_cos_sin
        from efficient_llm_inference_tpu.models.registry import spec_by_name
        from efficient_llm_inference_tpu.ops.pallas.megakernel_batch import (
            llama_mega_batch_supported,
            llama_megabatch,
        )
        from efficient_llm_inference_tpu.ops.pallas.megakernel_llama import (
            pack_llama_mega,
        )

        cfg = spec_by_name(args.model).config
        params = llama_mod.init_llama_params(jax.random.PRNGKey(0), cfg, dtype)
        if args.wq != "none":
            params = llama_mod.quantize_llama_weights(params, mode=args.wq)
        packed = pack_llama_mega(params, cfg)
        assert packed is not None
        if not llama_mega_batch_supported(cfg, C, params, B):
            print(f"[measure] unsupported at B={B} C={C}", file=sys.stderr)
            return
        L, E = cfg.n_layer, cfg.n_kv_head * cfg.head_dim
    else:
        from efficient_llm_inference_tpu.models import gpt2 as gpt2_mod
        from efficient_llm_inference_tpu.ops.pallas.megakernel import (
            pack_gpt2_mega,
        )
        from efficient_llm_inference_tpu.ops.pallas.megakernel_batch import (
            gpt2_megabatch,
            mega_batch_supported,
        )

        cfg = gpt2_mod.GPT2Config()  # GPT-2 small
        params = gpt2_mod.init_gpt2_params(jax.random.PRNGKey(0), cfg, dtype)
        if args.wq != "none":
            params = gpt2_mod.quantize_gpt2_weights(params, mode=args.wq)
        packed = pack_gpt2_mega(params, cfg)
        assert packed is not None
        if not mega_batch_supported(cfg, C, params, B):
            print(f"[measure] unsupported at B={B} C={C}", file=sys.stderr)
            return
        L, E = cfg.n_layer, cfg.n_embd
    fill = args.fill or max(8, C - args.steps - 8)
    assert fill + args.steps <= C, "cache would overflow"
    print(f"[measure] {args.model} wq={args.wq} B={B} C={C} fill={fill} "
          f"steps={args.steps}", file=sys.stderr)

    key = jax.random.PRNGKey(1)
    kb0 = (jax.random.normal(key, (L, B, C, E), jnp.float32) * 0.05).astype(dtype)
    vb0 = (jax.random.normal(key, (L, B, C, E), jnp.float32) * 0.05).astype(dtype)
    lengths0 = jnp.full((B,), fill, jnp.int32)
    toks0 = jnp.arange(B, dtype=jnp.int32) + 11
    steps = args.steps

    if llama:
        n_pos = cfg.n_positions

        @jax.jit
        def run(packed, embed, kb, vb, lengths, toks):
            def step(carry, _):
                kb, vb, lengths, toks = carry
                pos = jnp.minimum(lengths, n_pos - 1)
                x = embed[toks].astype(embed.dtype)
                cos, sin = rope_cos_sin(pos[:, None], cfg.head_dim,
                                        cfg.rope_theta)
                cos_q = jnp.tile(cos[:, 0], (1, cfg.n_head))
                sin_q = jnp.tile(sin[:, 0], (1, cfg.n_head))
                toks2, kb, vb = llama_megabatch(
                    packed, kb, vb, lengths, x, cos_q, sin_q,
                    cfg=cfg, capacity=C,
                )
                toks2 = jnp.clip(toks2, 0, cfg.vocab_size - 1)
                return (kb, vb, lengths + 1, toks2), toks2

            (kb, vb, lengths, toks), out = jax.lax.scan(
                step, (kb, vb, lengths, toks), None, length=steps
            )
            return out

        run_args = (packed, params["embed"], kb0, vb0, lengths0, toks0)
    else:

        @jax.jit
        def run(packed, wte, wpe, kb, vb, lengths, toks):
            def step(carry, _):
                kb, vb, lengths, toks = carry
                pos = jnp.minimum(lengths, cfg.n_positions - 1)
                x = (wte[toks] + wpe[pos]).astype(wte.dtype)  # [B, E]
                toks2, kb, vb = gpt2_megabatch(
                    packed, kb, vb, lengths, x, cfg=cfg, capacity=C
                )
                toks2 = jnp.clip(toks2, 0, cfg.vocab_size - 1)
                return (kb, vb, lengths + 1, toks2), toks2

            (kb, vb, lengths, toks), out = jax.lax.scan(
                step, (kb, vb, lengths, toks), None, length=steps
            )
            return out

        run_args = (packed, params["wte"], params["wpe"], kb0, vb0,
                    lengths0, toks0)

    t0 = time.perf_counter()
    out = run(*run_args)
    np.asarray(out)  # host read = sync through the relay
    print(f"[measure] warmup (compile) {time.perf_counter() - t0:.1f}s",
          file=sys.stderr)

    best = None
    for i in range(args.reps):
        t0 = time.perf_counter()
        out = run(*run_args)
        np.asarray(out)
        dt = time.perf_counter() - t0
        us = dt / steps * 1e6
        agg = B * steps / dt
        print(f"[rep {i}] {dt*1e3:.1f} ms total, {us:.0f} us/step, "
              f"{agg:.0f} tok/s aggregate", file=sys.stderr)
        best = min(best, dt) if best else dt
    print(f"BEST: {best/steps*1e6:.0f} us/step, "
          f"{B*steps/best:.0f} tok/s aggregate")


if __name__ == "__main__":
    main()
