"""End-to-end MegaBatchServer throughput on the TPU chip.

Replicates the continuous-batching benchmark protocols (docs/BENCHMARKS.md
"Continuous batching") on the dense megakernel server so the two serving
engines compare end to end (prefills + host bookkeeping included):

  python scripts/measure_megaserver.py --slots 16 --requests 32 \
      --max-new 64 --capacity 128 --wq int8 [--model gpt2] [--chunk 32]
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
    ap.add_argument("--model", default="gpt2")
    ap.add_argument("--slots", type=int, default=16)
    ap.add_argument("--requests", type=int, default=32)
    ap.add_argument("--max-new", type=int, default=64)
    ap.add_argument("--capacity", type=int, default=128)
    ap.add_argument("--chunk", type=int, default=32)
    ap.add_argument("--prompt-words", type=int, default=8)
    ap.add_argument("--prompt-tokens", type=int, default=0,
                    help="exact prompt length in tokens (long-context "
                         "protocol); 0 = word-based short prompts")
    ap.add_argument("--wq", default="int8", choices=["int8", "int4", "none"])
    ap.add_argument("--kv", default="none",
                    choices=["none", "int8", "int4", "mixed"],
                    help="quantized KV panes (megakernel_batch_quant)")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--eos", type=int, default=None,
                    help="set an eos_id (exercises speculative bursts)")
    ap.add_argument("--spec", default=None, choices=[None, "ngram"],
                    help="speculative decode chunks (batched verify kernel)")
    ap.add_argument("--spec-k", type=int, default=8)
    ap.add_argument("--ngram-n", type=int, default=2)
    ap.add_argument("--compare", action="store_true",
                    help="run plain AND spec servers in THIS process "
                         "(within-run comparison — the one that matters "
                         "under the +-20%% session drift)")
    ap.add_argument("--shared-prefix", type=int, default=0,
                    help="prompt = SHARED prefix of this many tokens + a "
                         "per-request random suffix (suffix-tokens below); "
                         "runs prefix-cache OFF then ON in this process")
    ap.add_argument("--suffix-tokens", type=int, default=60)
    args = ap.parse_args()

    import efficient_llm_inference_tpu as elit
    from efficient_llm_inference_tpu.core.config import Config
    from efficient_llm_inference_tpu.core.utils import enable_compilation_cache
    from efficient_llm_inference_tpu.engine.batching import Request
    from efficient_llm_inference_tpu.engine.megaserver import (
        MegaBatchServer,
        MegaPoolConfig,
    )

    enable_compilation_cache()
    cfg = Config(
        model_name=args.model,
        weight_quant=None if args.wq == "none" else args.wq,
    )
    eng = elit.InferenceEngine.from_model_name(args.model, config=cfg)
    bucket = min(args.capacity - 8, 256)
    if args.prompt_tokens:
        bucket = min(args.capacity - args.max_new,
                     -(-args.prompt_tokens // 8) * 8)
    if args.shared_prefix:
        bucket = min(
            args.capacity - args.max_new,
            -(-(args.shared_prefix + args.suffix_tokens) // 8) * 8,
        )

    def make_srv(spec, prefix_cache=False):
        return MegaBatchServer(
            eng.model,
            eng.params,
            pool=MegaPoolConfig(
                n_slots=args.slots,
                capacity=args.capacity,
                max_chunk=args.chunk,
                prompt_bucket=bucket,
            ),
            dtype=cfg.dtype,
            eos_id=args.eos,
            kv_mode=None if args.kv == "none" else args.kv,
            spec=spec,
            spec_k=args.spec_k,
            ngram_n=args.ngram_n,
            enable_prefix_cache=prefix_cache,
        )

    rng = np.random.default_rng(0)
    words = ["weather", "mountain", "river", "engine", "tensor", "kernel",
             "stream", "window", "matrix", "garden"]

    shared_prefix = None
    if args.shared_prefix:
        shared_prefix = rng.integers(
            1, eng.model.vocab_size - 1, size=args.shared_prefix
        ).tolist()

    def make_reqs():
        reqs = []
        for i in range(args.requests):
            if shared_prefix is not None:
                suf = rng.integers(
                    1, eng.model.vocab_size - 1, size=args.suffix_tokens
                ).tolist()
                reqs.append(Request(i, shared_prefix + suf,
                                    max_new_tokens=args.max_new))
                continue
            if args.prompt_tokens:
                ids = rng.integers(
                    1, eng.model.vocab_size - 1, size=args.prompt_tokens
                ).tolist()
                reqs.append(Request(i, ids, max_new_tokens=args.max_new))
                continue
            n = max(3, args.prompt_words + int(rng.integers(-2, 3)))
            p = f"Question {i}: " + " ".join(rng.choice(words, n))
            reqs.append(Request(i, eng.tokenizer.encode(p),
                                max_new_tokens=args.max_new))
        return reqs

    print(f"[measure] {args.model} wq={args.wq} kv={args.kv} "
          f"slots={args.slots} cap={args.capacity} chunk={args.chunk} "
          f"reqs={args.requests} max_new={args.max_new} "
          f"prompt_tokens={args.prompt_tokens or 'short'} "
          f"spec={args.spec} k={args.spec_k}",
          file=sys.stderr)

    def bench(srv, label):
        srv.run(make_reqs())  # warmup: compiles prefill buckets + chunk
        best = None
        for i in range(args.reps):
            reqs = make_reqs()
            t0 = time.perf_counter()
            srv.run(reqs)
            dt = time.perf_counter() - t0
            total = sum(len(r.out_ids) for r in reqs)
            extra = ""
            if srv.spec:
                st = srv.spec_stats
                if st["rounds"]:
                    extra = (
                        f"  acc={st['tokens']/st['rounds']:.2f} tok/round "
                        f"({st['rounds']} rounds)")
            print(f"[{label} rep {i}] {total} tokens in {dt:.2f}s = "
                  f"{total/dt:.0f} tok/s aggregate{extra}", file=sys.stderr)
            best = max(best or 0, total / dt)
        return best

    if args.shared_prefix:
        best_off = bench(make_srv(args.spec, prefix_cache=False), "nocache")
        best_on = bench(make_srv(args.spec, prefix_cache=True), "pfxcache")
        print(f"BEST: no-cache {best_off:.0f} | prefix-cache "
              f"{best_on:.0f} tok/s aggregate "
              f"({best_on/best_off - 1:+.1%} within-run)")
    elif args.compare:
        best_plain = bench(make_srv(None), "plain")
        best_spec = bench(make_srv("ngram"), "spec")
        print(f"BEST: plain {best_plain:.0f} | spec {best_spec:.0f} tok/s "
              f"aggregate ({best_spec/best_plain - 1:+.1%} within-run)")
    else:
        print(f"BEST: {bench(make_srv(args.spec), 'rep'):.0f} tok/s "
              "aggregate")


if __name__ == "__main__":
    main()
