"""Measure the quantized-KV megakernel on the real chip vs full_cache.

Runs the bench.py protocol (GPT-2 small, 256-token prompt, 64 new tokens,
best of N reps) for full_cache / quant_int8 / quant_int4 / quant_mixed, and
a long-context variant where KV reads dominate, printing tok/s and the
per-method est KV bytes.

  python scripts/measure_quant_mega.py [--long]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--prompt-tokens", type=int, default=256)
    ap.add_argument("--max-new", type=int, default=64)
    ap.add_argument("--reps", type=int, default=6)
    ap.add_argument("--long", action="store_true",
                    help="also run a long-prompt protocol (KV-read bound)")
    ap.add_argument("--long-tokens", type=int, default=960,
                    help="prompt length for --long (e.g. 1980 on Llama-1B)")
    ap.add_argument("--methods", default="full_cache,quant_int8,quant_int4,"
                    "quant_mixed")
    ap.add_argument("--weight-quant", default=None)
    ap.add_argument("--model", default="gpt2")
    ap.add_argument("--n-positions", type=int, default=0,
                    help="override the model's context length (random-init "
                         "wpe rows; probes KV scaling past the stock limit)")
    args = ap.parse_args()

    from efficient_llm_inference_tpu.core.config import Config
    from efficient_llm_inference_tpu.core.utils import (
        DeviceTimer,
        enable_compilation_cache,
    )
    from efficient_llm_inference_tpu.engine.engine import InferenceEngine

    enable_compilation_cache()
    cfg = Config(model_name=args.model, weight_quant=args.weight_quant)
    if args.n_positions:
        import dataclasses

        from efficient_llm_inference_tpu.models.registry import (
            spec_by_name,
            spec_with_config,
        )

        from efficient_llm_inference_tpu.models import gpt2 as gpt2_mod
        from efficient_llm_inference_tpu.data.tokenizer import (
            load_tokenizer,
        )

        spec = spec_by_name(args.model)
        unroll = cfg.resolved_scan_unroll(spec.n_layer)
        spec = spec_with_config(
            spec, dataclasses.replace(
                spec.config, n_positions=args.n_positions,
                scan_unroll=unroll,
            )
        )
        if spec.name != "gpt2":
            raise SystemExit("--n-positions only wired for gpt2 here")
        params = gpt2_mod.init_gpt2_params(
            cfg.prng_key(), spec.config, cfg.dtype
        )
        if cfg.weight_quant:
            # mirror InferenceEngine.from_model_name's wq_group routing:
            # int4w8 needs ONE scale group per megakernel half-tile
            wq_group = (
                spec.config.n_embd // 2
                if cfg.weight_quant == "int4w8" else 128
            )
            params = gpt2_mod.quantize_gpt2_weights(
                params, mode={"int4w8": "int4"}.get(
                    cfg.weight_quant, cfg.weight_quant),
                group=wq_group,
            )
        eng = InferenceEngine(spec, params, load_tokenizer(args.model), cfg)
    else:
        eng = InferenceEngine.from_model_name(args.model, config=cfg)

    def run_protocol(n_prompt: int):
        rng = np.random.default_rng(0)
        ids = rng.integers(1, 255, size=n_prompt).tolist()
        prompt = "".join(chr(max(1, t % 127)) for t in ids)
        for method in args.methods.split(","):
            r = eng.benchmark_method(
                [prompt], method=method, max_new_tokens=args.max_new,
                warmup=True,
            )
            best = 0.0
            for _ in range(args.reps):
                timer = DeviceTimer().start()
                r = eng.benchmark_method(
                    [prompt], method=method, max_new_tokens=args.max_new,
                    warmup=False,
                )
                best = max(best, r["total_new_tokens"] / timer.stop())
            kv_mb = r.get("est_kv_cache_mb_avg", float("nan"))
            print(f"  {method:12s}: {best:8.1f} tok/s   kv={kv_mb:.2f} MB",
                  flush=True)

    print(f"[quant-mega] prompt={args.prompt_tokens} new={args.max_new} "
          f"weight_quant={args.weight_quant}")
    run_protocol(args.prompt_tokens)
    if args.long:
        print(f"[quant-mega] LONG prompt={args.long_tokens} "
              f"new={args.max_new}")
        run_protocol(args.long_tokens)


if __name__ == "__main__":
    main()
