"""Train quality-scale models (4–20M params, incl. GQA/RoPE) offline.

Round 2's quality tables (docs/QUALITY.md) rest on an 859K-param byte model
trained to PPL 1.04 on a 5 KB corpus — near-memorized, so eviction /
quantization deltas may not transfer, and nothing GQA/RoPE-shaped had
quality numbers at all (VERDICT r2 "what's weak" #5). This script trains
FOUR byte-level models on the ~16 MB offline stdlib corpus
(data/corpus.py), with a held-out tail split for honest NLL:

  scale_gpt2   6L x 256d GPT-2      (~5.0M params)  — quality + spec target
  scale_llama  4L x 512d Llama GQA  (~9.6M params)  — RoPE/GQA quality
  draft_gpt2   2L x 128d GPT-2      (~0.6M params)  — trained spec draft
  draft_llama  1L x 256d Llama GQA  (~0.9M params)  — trained spec draft

Checkpoints land in artifacts/<name>.npz as float16 (halves the git
footprint; all measurements load them back to fp32/bf16). The reference's
pretrained-model protocol this substitutes for:
/root/reference/examples/quantized_cache.py:61-81 (quality vs full-cache
baseline on a real model) and summarization_benchmark.py:13 (Qwen2.5-7B).

Usage: python -m examples.train_scale_models [name ...] [--steps N]
Runs on the default platform (the TPU when available: each step is tiny but
dispatch-bound at ~26 ms; ~3 min per model at the default 4000 steps).
"""

from __future__ import annotations

import argparse
import pathlib
import time

import numpy as np

import jax
import jax.numpy as jnp

ARTIFACT = pathlib.Path(__file__).resolve().parent.parent / "artifacts"
VOCAB, N_POS = 256, 256
SEQ, BATCH = 256, 16


def model_specs():
    from efficient_llm_inference_tpu.models import gpt2 as gpt2_mod
    from efficient_llm_inference_tpu.models import llama as llama_mod
    from efficient_llm_inference_tpu.models.registry import gpt2_spec
    from efficient_llm_inference_tpu.models.llama import llama_spec

    return {
        "scale_gpt2": (
            gpt2_spec(gpt2_mod.GPT2Config(
                vocab_size=VOCAB, n_positions=N_POS, n_embd=256,
                n_layer=6, n_head=8,
            )),
            gpt2_mod.init_gpt2_params,
        ),
        "scale_llama": (
            llama_spec(llama_mod.LlamaConfig(
                vocab_size=VOCAB, n_positions=N_POS, hidden_size=512,
                intermediate_size=1024, n_layer=4, n_head=8, n_kv_head=4,
                rope_theta=10000.0, tie_embeddings=True,
            )),
            llama_mod.init_llama_params,
        ),
        "draft_gpt2": (
            gpt2_spec(gpt2_mod.GPT2Config(
                vocab_size=VOCAB, n_positions=N_POS, n_embd=128,
                n_layer=2, n_head=4,
            )),
            gpt2_mod.init_gpt2_params,
        ),
        # GPT-2-small geometry at byte vocab (~85M params): a WEIGHT-BOUND
        # speculation target (the 5M scale_gpt2 is dispatch/VPU-bound, so
        # even 5 tok/round nets <=1x there — docs/BENCHMARKS.md round 4).
        # Uses draft_gpt2 as its trained draft (same byte vocab).
        "scale_gpt2_big": (
            gpt2_spec(gpt2_mod.GPT2Config(
                vocab_size=VOCAB, n_positions=N_POS, n_embd=768,
                n_layer=12, n_head=12,
            )),
            gpt2_mod.init_gpt2_params,
        ),
        # Weight-bound GQA/RoPE target (~71M): llama_megaverify's
        # weight-bound operating point; draft_llama is its trained draft.
        "scale_llama_big": (
            llama_spec(llama_mod.LlamaConfig(
                vocab_size=VOCAB, n_positions=N_POS, hidden_size=1024,
                intermediate_size=2048, n_layer=8, n_head=16, n_kv_head=4,
                rope_theta=10000.0, tie_embeddings=True,
            )),
            llama_mod.init_llama_params,
        ),
        "draft_llama": (
            llama_spec(llama_mod.LlamaConfig(
                vocab_size=VOCAB, n_positions=N_POS, hidden_size=256,
                intermediate_size=512, n_layer=1, n_head=4, n_kv_head=2,
                rope_theta=10000.0, tie_embeddings=True,
            )),
            llama_mod.init_llama_params,
        ),
    }


def _batches(data: np.ndarray, rng: np.random.Generator):
    starts = rng.integers(0, len(data) - SEQ - 1, BATCH)
    return np.stack([data[s: s + SEQ] for s in starts]).astype(np.int32)


def eval_nll(spec, params, eval_data: np.ndarray, n_batches: int = 8) -> float:
    from efficient_llm_inference_tpu.parallel.train import next_token_loss

    rng = np.random.default_rng(123)
    loss_fn = jax.jit(lambda p, t: next_token_loss(spec, p, t))
    losses = [
        float(loss_fn(params, jnp.asarray(_batches(eval_data, rng))))
        for _ in range(n_batches)
    ]
    return float(np.mean(losses))


def train_one(name: str, steps: int, lr: float = 3e-4, seed: int = 0,
              log_every: int = 500):
    from efficient_llm_inference_tpu.data.corpus import corpus_splits
    from efficient_llm_inference_tpu.parallel.train import make_train_step

    spec, init = model_specs()[name]
    params = init(jax.random.PRNGKey(seed), spec.config, jnp.float32)
    n_params = sum(x.size for x in jax.tree.leaves(params))
    train_data, eval_data = corpus_splits()
    print(f"[{name}] {n_params:,} params; corpus {len(train_data):,} train / "
          f"{len(eval_data):,} eval bytes")

    init_fn, step_fn = make_train_step(spec, learning_rate=lr)
    opt_state = init_fn(params)
    step_jit = jax.jit(step_fn, donate_argnums=(0, 1))
    rng = np.random.default_rng(seed)
    t0 = time.perf_counter()
    for i in range(steps):
        params, opt_state, loss = step_jit(
            params, opt_state, jnp.asarray(_batches(train_data, rng))
        )
        if (i + 1) % log_every == 0 or i == 0:
            print(f"[{name}] step {i + 1}: train loss {float(loss):.4f} "
                  f"({time.perf_counter() - t0:.0f}s)")
    nll = eval_nll(spec, params, eval_data)
    print(f"[{name}] held-out NLL {nll:.4f} (PPL/byte {np.exp(nll):.3f}; "
          f"random {np.log(VOCAB):.2f})")

    ARTIFACT.mkdir(exist_ok=True)
    flat, treedef = jax.tree.flatten(params)
    path = ARTIFACT / f"{name}.npz"
    np.savez_compressed(
        path,
        treedef=np.frombuffer(str(treedef).encode(), dtype=np.uint8),
        **{f"leaf_{i}": np.asarray(x, np.float16) for i, x in enumerate(flat)},
    )
    print(f"[{name}] saved {path} "
          f"({path.stat().st_size / 1e6:.1f} MB, fp16), eval NLL {nll:.4f}")
    return nll


def load_scale_model(name: str, dtype=jnp.float32):
    """(spec, params) for a trained scale model from artifacts/<name>.npz."""
    from efficient_llm_inference_tpu.utils.checkpoint import load_params

    spec, init = model_specs()[name]
    path = ARTIFACT / f"{name}.npz"
    if not path.exists():
        raise FileNotFoundError(
            f"{path} missing — run python -m examples.train_scale_models "
            f"{name}"
        )
    like = init(jax.random.PRNGKey(0), spec.config, jnp.float32)
    params = load_params(str(path), like=like)
    return spec, jax.tree.map(lambda x: jnp.asarray(x, dtype), params)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*", default=None)
    ap.add_argument("--steps", type=int, default=4000)
    args = ap.parse_args()
    names = args.names or list(model_specs())
    for name in names:
        train_one(name, steps=args.steps)


if __name__ == "__main__":
    main()
