"""Continuous batching demo: serve a queue of prompts through the paged pool.

TPU-native feature beyond the reference (which is strictly single-stream).
Run: python -m examples.continuous_batching [model] [n_requests]
"""

import sys
import time

import jax.numpy as jnp

import efficient_llm_inference_tpu as elit
from efficient_llm_inference_tpu.core.utils import enable_compilation_cache
from efficient_llm_inference_tpu.engine.batching import (
    ContinuousBatchingEngine,
    PoolConfig,
    Request,
)


def main():
    enable_compilation_cache()
    model = sys.argv[1] if len(sys.argv) > 1 else "gpt2"
    n_requests = int(sys.argv[2]) if len(sys.argv) > 2 else 16

    eng = elit.InferenceEngine.from_model_name(model)
    cbe = ContinuousBatchingEngine(
        eng.model,
        eng.params,
        PoolConfig(n_slots=8, block_size=64, n_blocks=128, max_blocks_per_seq=8,
                   prompt_bucket=128),
        dtype=eng.config.dtype,
        eos_id=getattr(eng.tokenizer, "eos_token_id", None),
    )

    prompts = [
        f"Question {i}: describe the weather pattern over the mountains."
        for i in range(n_requests)
    ]
    reqs = [
        Request(i, eng.tokenizer.encode(p), max_new_tokens=64)
        for i, p in enumerate(prompts)
    ]

    t0 = time.perf_counter()
    cbe.run(reqs)
    dt = time.perf_counter() - t0
    total = sum(len(r.out_ids) for r in reqs)
    print(f"{n_requests} requests, {total} tokens in {dt:.2f}s "
          f"= {total / dt:.0f} tok/s aggregate")
    print("first output:", repr(eng.tokenizer.decode(reqs[0].out_ids)[:60]))


if __name__ == "__main__":
    main()
