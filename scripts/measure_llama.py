"""Measure single-stream Llama decode throughput on the TPU chip.

Usage:
  python scripts/measure_llama.py [--model llama-3-1b] [--wq int4|int8|none]
      [--mega 1|0] [--max-new 64] [--reps 4]

Prints tok/s per rep (bench protocol: 256-token prompt, greedy decode) and
the best rep, plus a dispatch-amortized long-generation number when
--long-new is given.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="llama-3-1b")
    ap.add_argument("--wq", default="int4",
                    choices=["int4", "int4w8", "int8", "none"])
    ap.add_argument("--mega", type=int, default=1)
    ap.add_argument("--max-new", type=int, default=64)
    ap.add_argument("--long-new", type=int, default=0)
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--prompt-tokens", type=int, default=256)
    args = ap.parse_args()

    from efficient_llm_inference_tpu.core.config import Config
    from efficient_llm_inference_tpu.core.utils import (
        DeviceTimer,
        enable_compilation_cache,
    )
    from efficient_llm_inference_tpu.engine.engine import InferenceEngine

    enable_compilation_cache()
    cfg = Config(
        model_name=args.model,
        weight_quant=None if args.wq == "none" else args.wq,
        megakernel=bool(args.mega),
    )
    eng = InferenceEngine.from_model_name(args.model, config=cfg)
    print(f"[measure] {args.model} wq={args.wq} mega={bool(args.mega)} "
          f"dtype={cfg.dtype}", file=sys.stderr)

    rng = np.random.default_rng(0)
    ids = rng.integers(1, 127, size=args.prompt_tokens).tolist()
    prompt = "".join(chr(max(1, t % 127)) for t in ids)

    for n_new in [args.max_new] + ([args.long_new] if args.long_new else []):
        eng.benchmark_method([prompt], method="full_cache",
                             max_new_tokens=n_new, warmup=True)
        best = 0.0
        for i in range(args.reps):
            timer = DeviceTimer().start()
            r = eng.benchmark_method([prompt], method="full_cache",
                                     max_new_tokens=n_new, warmup=False)
            dt = timer.stop()
            tps = r["total_new_tokens"] / dt
            best = max(best, tps)
            print(f"[measure] n_new={n_new} rep{i}: {tps:.1f} tok/s "
                  f"({dt*1e3:.1f} ms)", file=sys.stderr)
        us_per_step = 1e6 / best
        print(f"[measure] BEST n_new={n_new}: {best:.1f} tok/s "
              f"({us_per_step:.0f} us/step incl dispatch)")


if __name__ == "__main__":
    main()
