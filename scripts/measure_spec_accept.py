"""Speculation acceptance + throughput on TRAINED draft/target pairs.

Round-3 verdict: every positive speculation number came from repetition-
prone random-init streams, and llama_megaverify sat at ~0 acceptance.
This script measures acceptance (mean emitted tokens per verify round,
via the stats=True counter wired through engine.generate_speculative) and
tok/s on the round-4 TRAINED scale models (examples/train_scale_models.py:
scale_gpt2 5M params + draft_gpt2 0.5M; scale_llama 9.6M GQA/RoPE +
draft_llama 0.7M), generating from held-out corpus prompts the models
never saw — a non-degenerate stream with a draft that actually models the
target's distribution.

Modes: plain full_cache baseline, prompt-lookup ngram, trained external
draft (k=4/8), 1-layer self-draft, and token-tree speculation. Megakernel
verify engages automatically when the geometry is eligible (engine's
_mega_spec); the script prints whether it did.

Usage: python scripts/measure_spec_accept.py [--model scale_gpt2]
       [--n-new 96] [--reps 3]
Reference anchor: speculation is north-star work beyond
/root/reference (SURVEY.md §2.3); the quality protocol it must not break
is greedy-stream equivalence (quantized_cache.py:74-80's comparison idea).
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PAIRS = {
    "scale_gpt2": "draft_gpt2",
    "scale_llama": "draft_llama",
    # weight-bound targets (85M GPT-2 geometry / 71M GQA): the regime
    # where acceptance x weight-stream savings must compound
    "scale_gpt2_big": "draft_gpt2",
    "scale_llama_big": "draft_llama",
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default=None,
                    help="scale_gpt2 | scale_llama (default: both)")
    ap.add_argument("--n-new", type=int, default=96)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--dtype", default="float32",
                    choices=["float32", "bfloat16"],
                    help="bfloat16 = serving dtype (the f32 verify kernel "
                         "may not fit VMEM on larger targets)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from efficient_llm_inference_tpu.core.config import Config
    from efficient_llm_inference_tpu.core.utils import (
        DeviceTimer,
        enable_compilation_cache,
    )
    from efficient_llm_inference_tpu.engine.engine import InferenceEngine
    from examples.quality_report_scale import heldout_texts
    from examples.train_scale_models import load_scale_model

    enable_compilation_cache()
    prompts = [t[:160] for t in heldout_texts(n=3, chunk=512)]

    dtype = getattr(jnp, args.dtype)
    for target_name in [args.model] if args.model else list(PAIRS):
        draft_name = PAIRS[target_name]
        tspec, tparams = load_scale_model(target_name, dtype=dtype)
        dpair = load_scale_model(draft_name, dtype=dtype)
        cfg_kw = dict(model_name=target_name, dtype=dtype)
        if args.cpu:
            cfg_kw["device"] = "cpu"
        eng = InferenceEngine(tspec, tparams, config=Config(**cfg_kw))
        mega = eng._mega_spec(256 + args.n_new + 16, None)
        print(f"[spec] {target_name} + {draft_name}: megakernel verify "
              f"{'ENGAGED' if mega is not None else 'not eligible'}",
              file=sys.stderr)

        def timed(fn, label):
            # warmup/compile then best-of-reps wall time over all prompts
            outs = fn()
            best = 0.0
            for _ in range(args.reps):
                timer = DeviceTimer().start()
                outs = fn()
                dt = timer.stop()
                total = sum(o[1] for o in outs)
                best = max(best, total / dt)
            return best, outs

        base_tps, base_out = timed(
            lambda: [(eng.generate(p, "full_cache", args.n_new), args.n_new)
                     for p in prompts],
            "full_cache",
        )
        print(f"[spec] {target_name:<12} full_cache       "
              f"{base_tps:8.1f} tok/s  (baseline)")

        def run_mode(label, **kw):
            def go():
                res = []
                for p in prompts:
                    _, n, st = eng.generate_speculative(
                        p, args.n_new, stats=True, **kw
                    )
                    res.append((None, n, st))
                return res

            tps, outs = timed(go, label)
            tpr = float(np.mean([o[2]["tokens_per_round"] for o in outs]))
            rounds = int(np.sum([o[2]["n_rounds"] for o in outs]))
            print(f"[spec] {target_name:<12} {label:<16} {tps:8.1f} tok/s  "
                  f"accept {tpr:.2f} tok/round over {rounds} rounds  "
                  f"({tps / base_tps:.2f}x)")
            return tps, tpr

        run_mode("ngram_k8", mode="ngram", k=8)
        run_mode("draft_k4", mode="draft", k=4, draft=dpair)
        run_mode("draft_k8", mode="draft", k=8, draft=dpair)
        run_mode("self_draft_k4", mode="self_draft", k=4, draft_layers=1)

        # token-tree speculation (engine-external builder, stats counter)
        from efficient_llm_inference_tpu.engine.speculative import (
            make_tree_speculative_generate,
        )

        branching = (2, 2, 1, 1)
        gen_tree = make_tree_speculative_generate(
            tspec, dpair[0], args.n_new, branching=branching,
            prompt_bucket=256, stats=True,
        )

        def tree_go():
            res = []
            for p in prompts:
                ids = eng._encode(p, "full_cache")
                buf = np.zeros((1, 256), np.int32)
                buf[0, : len(ids)] = ids
                out, n, r = gen_tree(
                    tparams, dpair[1], jnp.asarray(buf),
                    jnp.int32(len(ids)),
                )
                res.append((None, int(n), {"n_rounds": int(r),
                                           "tokens_per_round":
                                           (int(n) - 1) / max(int(r), 1)}))
            return res

        tree_tps, tree_outs = timed(tree_go, "tree")
        tpr = float(np.mean([o[2]["tokens_per_round"] for o in tree_outs]))
        print(f"[spec] {target_name:<12} tree{branching}  "
              f"{tree_tps:8.1f} tok/s  accept {tpr:.2f} tok/round  "
              f"({tree_tps / base_tps:.2f}x)")


if __name__ == "__main__":
    main()
