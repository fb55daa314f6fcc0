"""Measure speculative decoding with the megakernel verify pass (GPT-2).

Compares plain megakernel decode vs speculative (1-layer self-draft) with
the k-row verify megakernel, on the bench protocol (256-token prompt) and
a longer 256-token generation.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="gpt2")
    ap.add_argument("--wq", default="none", choices=["int8", "int4", "none"])
    ap.add_argument("--k", type=int, default=4)
    ap.add_argument("--draft-layers", type=int, default=1)
    ap.add_argument("--ngram", action="store_true",
                    help="prompt-lookup proposals instead of a draft model")
    ap.add_argument("--reps", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from efficient_llm_inference_tpu.core.config import Config
    from efficient_llm_inference_tpu.core.utils import (
        DeviceTimer,
        enable_compilation_cache,
    )
    from efficient_llm_inference_tpu.engine.engine import InferenceEngine
    from efficient_llm_inference_tpu.engine.speculative import (
        make_self_draft,
        make_speculative_generate,
    )

    enable_compilation_cache()
    wq = None if args.wq == "none" else args.wq
    cfg = Config(model_name=args.model, weight_quant=wq, megakernel=True)
    eng = InferenceEngine.from_model_name(args.model, config=cfg)
    spec = eng.model
    dtype = cfg.dtype

    rng = np.random.default_rng(0)
    ids = rng.integers(1, 127, size=256).tolist()
    prompt = "".join(chr(max(1, t % 127)) for t in ids)
    prompt_ids = eng.tokenizer.encode(prompt)

    # plain megakernel baseline through the engine
    for n_new in (64, 256):
        eng.benchmark_method([prompt], method="full_cache",
                             max_new_tokens=n_new, warmup=True)
        best = 0.0
        for _ in range(args.reps):
            t = DeviceTimer().start()
            r = eng.benchmark_method([prompt], method="full_cache",
                                     max_new_tokens=n_new, warmup=False)
            best = max(best, r["total_new_tokens"] / t.stop())
        print(f"[spec-mega] plain mega n_new={n_new}: {best:.1f} tok/s")

    mega = eng._mega_spec(512, None)
    assert mega is not None, "megakernel not eligible"
    dspec, dparams = make_self_draft(spec, eng.params, args.draft_layers)

    buf = np.zeros((1, 256), np.int32)
    buf[0, :len(prompt_ids)] = prompt_ids[:256]
    tb = jnp.asarray(buf)
    tl = jnp.int32(min(len(prompt_ids), 256))
    tp = dict(eng.params, __mega_packed__=mega["packed"])

    if args.ngram:
        from efficient_llm_inference_tpu.engine.speculative import (
            make_ngram_speculative_generate,
        )

        for n_new in (64, 256):
            gen = make_ngram_speculative_generate(
                spec, n_new, k=args.k, prompt_bucket=256,
                mega={**mega, "interpret": False}, dtype=dtype,
            )
            out, n = jax.device_get(gen(tp, tb, tl))  # warmup/compile
            best = 0.0
            for _ in range(args.reps):
                t = DeviceTimer().start()
                out, n = jax.device_get(gen(tp, tb, tl))
                best = max(best, int(n) / t.stop())
            print(f"[spec-mega] ngram(k={args.k}) n_new={n_new}: "
                  f"{best:.1f} tok/s ({int(n)} tokens)")
        return

    for n_new in (64, 256):
        gen = make_speculative_generate(
            spec, dspec, n_new, k=args.k, prompt_bucket=256,
            mega={**mega, "interpret": False}, dtype=dtype,
        )
        out, n = jax.device_get(gen(tp, dparams, tb, tl))  # warmup/compile
        best = 0.0
        for _ in range(args.reps):
            t = DeviceTimer().start()
            out, n = gen(tp, dparams, tb, tl)
            out, n = jax.device_get((out, n))
            dt = t.stop()
            best = max(best, int(n) / dt)
        print(f"[spec-mega] spec(k={args.k}, draft={args.draft_layers}L) "
              f"n_new={n_new}: {best:.1f} tok/s ({int(n)} tokens)")


if __name__ == "__main__":
    main()
