"""Speculative decoding demo: draft-model, token-tree, and prompt-lookup.

Beyond the reference (which is plain greedy everywhere): all three
proposal sources share one greedy-acceptance rule, so the output stream
is IDENTICAL to plain full_cache decoding — the draft only changes speed.
On TPU the k-row verify runs as ONE whole-step megakernel pass
(docs/BENCHMARKS.md has the measured numbers); this demo runs anywhere.

    python -m examples.speculative_decoding
"""

import time

import jax

# correctness demo on the tiny model: run on CPU (compiling the
# speculation while_loop through the remote TPU relay takes minutes; the
# measured TPU numbers live in docs/BENCHMARKS.md)
jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from efficient_llm_inference_tpu import InferenceEngine  # noqa: E402
from efficient_llm_inference_tpu.core.config import Config  # noqa: E402
from efficient_llm_inference_tpu.core.utils import (  # noqa: E402
    enable_compilation_cache,
)


def main():
    enable_compilation_cache()
    eng = InferenceEngine.from_model_name(
        "gpt2-tiny",
        config=Config(model_name="gpt2-tiny", device="cpu",
                      dtype=jnp.float32),
    )
    prompt = (
        "The committee reviewed the committee findings and the committee "
        "agreed the committee should review the findings again."
    )
    n_new = 48

    t0 = time.perf_counter()
    ref_text, _ = eng.generate_with_cache(prompt, max_new_tokens=n_new)
    plain_ids = list(eng.last_generation_ids)
    t_plain = time.perf_counter() - t0
    print(f"plain full_cache: {n_new / t_plain:.1f} tok/s")

    for mode, kw in (("ngram", dict(k=8)), ("self_draft", dict(k=4, draft_layers=1))):
        t0 = time.perf_counter()
        text, n, st = eng.generate_speculative(
            prompt, n_new, mode=mode, stats=True, **kw
        )
        dt = time.perf_counter() - t0
        same = eng.last_generation_ids == plain_ids
        print(f"{mode:10s}: {n / dt:.1f} tok/s, "
              f"accept {st['tokens_per_round']:.2f} tok/round "
              f"({st['n_rounds']} verify rounds), "
              f"token-exact vs plain: {same}")

    # trained draft/target pairs (examples/train_scale_models.py) show the
    # real acceptance picture — scripts/measure_spec_accept.py measures
    # them on the chip; docs/BENCHMARKS.md "Speculation acceptance".


if __name__ == "__main__":
    main()
