"""Train a small byte-level GPT-2 in-repo for quality measurements.

The environment has no hub access, so the reference's pretrained-model
quality protocol (/root/reference/examples/quantized_cache.py:61-81 compares
quantized output quality against the full-cache baseline of a REAL model)
can't be reproduced with downloaded weights. Instead this script trains a
small GPT-2 on the bundled offline corpus (data/samples.py) to well below
random loss, producing a model whose predictions are sharp enough that
cache-method degradation (eviction, quantization) shows up as real signal
in perplexity / NLL / ROUGE — see examples/quality_report.py and
docs/QUALITY.md.

Usage: python -m examples.train_quality_model [steps]
Saves: artifacts/quality_gpt2.npz (+ meta in the filename's json sidecar)
"""

from __future__ import annotations

import pathlib
import sys

import numpy as np

import jax
import jax.numpy as jnp

# quality model geometry: big enough to model byte-level English, small
# enough to train on CPU in ~2 minutes
N_EMBD, N_LAYER, N_HEAD, N_POS, VOCAB = 128, 4, 4, 256, 256
ARTIFACT = pathlib.Path(__file__).resolve().parent.parent / "artifacts"


def corpus_text() -> str:
    from efficient_llm_inference_tpu.data.samples import (
        MMLU_SAMPLES,
        SUMMARIZATION_SAMPLES,
    )

    parts = []
    for ds in SUMMARIZATION_SAMPLES.values():
        for art, summ in ds:
            parts.append(art + "\n\nSummary: " + summ + "\n")
    for item in MMLU_SAMPLES if isinstance(MMLU_SAMPLES, list) else []:
        parts.append(str(item))
    return "\n".join(parts)


def quality_model_spec():
    from efficient_llm_inference_tpu.models import gpt2 as gpt2_mod
    from efficient_llm_inference_tpu.models.registry import gpt2_spec

    cfg = gpt2_mod.GPT2Config(
        vocab_size=VOCAB, n_positions=N_POS, n_embd=N_EMBD,
        n_layer=N_LAYER, n_head=N_HEAD,
    )
    return gpt2_spec(cfg)


def train(steps: int = 3000, batch: int = 16, seq: int = 256, lr: float = 3e-4,
          seed: int = 0, log_every: int = 250):
    from efficient_llm_inference_tpu.models import gpt2 as gpt2_mod
    from efficient_llm_inference_tpu.parallel.train import make_train_step

    spec = quality_model_spec()
    params = gpt2_mod.init_gpt2_params(
        jax.random.PRNGKey(seed), spec.config, jnp.float32
    )
    init_fn, step_fn = make_train_step(spec, learning_rate=lr)
    opt_state = init_fn(params)
    step_jit = jax.jit(step_fn, donate_argnums=(0, 1))

    data = np.frombuffer(corpus_text().encode("utf-8"), np.uint8).astype(np.int32)
    data = np.clip(data, 0, VOCAB - 1)
    rng = np.random.default_rng(seed)
    print(f"corpus: {len(data)} byte tokens; model: "
          f"{N_LAYER}L x {N_EMBD}d ({sum(x.size for x in jax.tree.leaves(params)):,} params)")

    loss = None
    for i in range(steps):
        starts = rng.integers(0, len(data) - seq - 1, batch)
        toks = np.stack([data[s: s + seq] for s in starts])
        params, opt_state, loss = step_jit(params, opt_state, jnp.asarray(toks))
        if (i + 1) % log_every == 0 or i == 0:
            print(f"step {i + 1}: loss {float(loss):.4f} "
                  f"(random = {np.log(VOCAB):.2f})")

    ARTIFACT.mkdir(exist_ok=True)
    # single-file npz (git-friendly), same layout as checkpoint.py's fallback
    flat, treedef = jax.tree.flatten(params)
    path = ARTIFACT / "quality_gpt2.npz"
    np.savez(
        path,
        treedef=np.frombuffer(str(treedef).encode(), dtype=np.uint8),
        **{f"leaf_{i}": np.asarray(x) for i, x in enumerate(flat)},
    )
    print(f"saved: {path} (final loss {float(loss):.4f})")
    return params


def load_quality_model():
    """(spec, params) for the trained quality model; trains if missing."""
    from efficient_llm_inference_tpu.models import gpt2 as gpt2_mod
    from efficient_llm_inference_tpu.utils.checkpoint import load_params

    spec = quality_model_spec()
    path = ARTIFACT / "quality_gpt2.npz"
    if not path.exists():
        print("no checkpoint found — training now")
        return spec, train()
    like = gpt2_mod.init_gpt2_params(jax.random.PRNGKey(0), spec.config, jnp.float32)
    return spec, load_params(str(path), like=like)


def main():
    # runs on the default platform (the TPU when available: ~26 ms/dispatch
    # but each step is tiny; the shared host CPU is an order slower here)
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 3000
    train(steps=steps)


if __name__ == "__main__":
    main()
