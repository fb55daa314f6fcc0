"""Inference engine + KV-cache benchmarker (the reference's user-facing API).

`InferenceEngine` owns a natively-implemented JAX model (the reference
injects an external HF model instead, /root/reference/src/benchmarking/
benchmarker.py:44-59) and exposes the same 10 generation strategies and the
same `benchmark_method` registry/metric schema (benchmarker.py:643-832) —
but every strategy runs as a single jitted prefill + scanned decode loop on
device, with static-shape caches and in-graph eviction.
"""

from __future__ import annotations

import math
import time
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..cache import eviction
from ..cache.kvcache import DenseKV, NoCacheKV, PagedKV, QuantizedKV, RingKV
from ..core.config import Config
from ..core.utils import (
    DeviceTimer,
    get_cpu_mem_mb,
    get_device_peak_mb,
    mb,
    reset_device_peak,
)
from ..data.tokenizer import ByteTokenizer, load_tokenizer
from ..models import gpt2 as gpt2_mod
from ..models.registry import ModelSpec, spec_by_name
from .generate import (
    SamplingParams,
    bucket_for,
    make_generate,
    make_generate_batch,
    make_no_cache_loop,
)

VALID_METHODS = [
    "no_cache",
    "full_cache",
    "sliding_window",
    "quant_int8",
    "quant_int4",
    "quant_mixed",
    "paged_attention",
    "chunked_cache",
    "prefix_window",
    "strided_cache",
    "block_cache",
    "budget_cache",
]

def _int4w8_llama_spec(spec: ModelSpec, allow_pad: bool):
    """(spec', group) for weight_quant="int4w8" on a Llama-family spec.

    group = TR/2 of the megakernel tile geometry: the half-tile scale
    group that collapses the in-kernel dequant to column scaling
    (_int4_tile_dot n_gh==1 fast path). The group must divide EVERY
    matmul contraction dim, or quantize_int4_weights silently widens
    that weight's scale group to the whole column (quality cliff) and
    pack_llama_mega drops the megakernel on the non-uniform groups.

    Geometries whose true FFN width the half-tile group does not divide
    (Qwen2.5-7B: 896 vs 18944) are SERVED AT THE STREAM GEOMETRY'S
    PADDED WIDTH instead: intermediate_size pads up to Ip in the serving
    config, exact through SwiGLU for zero-padded weights (silu(0)*0 = 0
    and zero down-rows add nothing; checkpoint conversion zero-pads,
    random init simply serves the padded variant). Ip is a multiple of
    TR and hence of TR/2, so the quantized groups come out uniform and
    the fast path stays eligible — the cure docs/BENCHMARKS.md
    "Qwen2.5-7B" names for the grouped-int4 VPU bound. Only taken when
    the engine inits the params itself (allow_pad); caller-provided
    params keep their width and degrade LOUDLY to plain grouped int4.
    """
    import dataclasses as _dc

    from ..models.registry import spec_with_config
    from ..ops.pallas.megakernel_llama import _tile_geometry

    c = spec.config
    TR, _, Ip = _tile_geometry(c)
    g = TR // 2
    fixed = (c.hidden_size, c.n_head * c.head_dim)
    if all(d % g == 0 for d in fixed):
        if c.intermediate_size % g == 0:
            return spec, g
        if allow_pad and Ip % g == 0 and Ip != c.intermediate_size:
            return (
                spec_with_config(
                    spec, _dc.replace(c, intermediate_size=Ip)
                ),
                g,
            )
    import warnings

    warnings.warn(
        "weight_quant='int4w8': half-tile group "
        f"{g} does not divide all contraction dims "
        f"{fixed + (c.intermediate_size,)}; falling back to weight_quant="
        "'int4' (group=128)",
        stacklevel=2,
    )
    return spec, 128


# Paths where the reference truncates prompts at 1024
# (/root/reference/src/benchmarking/benchmarker.py:76-78 vs :172,438,510,592).
_TRUNCATING_METHODS = {
    "no_cache",
    "full_cache",
    "prefix_window",
    "strided_cache",
    "block_cache",
    "budget_cache",
}


class InferenceEngine:
    """TPU-native generation engine over a functional JAX model."""

    def __init__(
        self,
        model: ModelSpec,
        params,
        tokenizer=None,
        config: Optional[Config] = None,
    ):
        self.model = model
        self.params = params
        self.tokenizer = tokenizer if tokenizer is not None else ByteTokenizer()
        self.config = config or Config()
        self._fns: Dict = {}
        self._mega_packed = None  # lazy megakernel weight re-layout

    # ------------------------------------------------------------------
    @classmethod
    def from_model_name(
        cls,
        name: str = "gpt2",
        tokenizer=None,
        config: Optional[Config] = None,
        params=None,
    ) -> "InferenceEngine":
        import dataclasses as _dc

        from ..models.registry import spec_with_config

        config = config or Config(model_name=name)
        spec = spec_by_name(name)
        unroll = config.resolved_scan_unroll(spec.n_layer)
        if unroll != getattr(spec.config, "scan_unroll", 1):
            spec = spec_with_config(
                spec, _dc.replace(spec.config, scan_unroll=unroll)
            )
        wq = config.weight_quant
        wq_mode = {"int4w8": "int4"}.get(wq, wq)
        wq_group = 128
        if wq == "int4w8":
            # ONE scale group per megakernel half-tile: the in-kernel
            # dequant collapses to column scaling (_int4_tile_dot n_gh==1
            # fast path). Group = TR/2 of the model's tile geometry.
            if spec.name == "llama":
                # provided FULL-PRECISION params (e.g. a converted
                # checkpoint) can be zero-padded alongside the spec;
                # pre-quantized params keep the loud grouped-int4 fallback
                fp_params = params is None or not isinstance(
                    params.get("blocks", {}).get("wq"), dict
                )
                spec2, wq_group = _int4w8_llama_spec(
                    spec, allow_pad=fp_params
                )
                if spec2 is not spec:
                    if params is not None:
                        from ..models.llama import pad_llama_ffn

                        params = pad_llama_ffn(
                            params, spec2.config.intermediate_size
                        )
                    spec = spec2  # FFN width padded to the tile geometry
            elif spec.name == "gpt2":
                wq_group = spec.config.n_embd // 2  # uniform [E, E] tiles
            else:
                raise ValueError(
                    f"weight_quant=int4w8 not supported for {spec.name}"
                )
        quantized = False
        if params is None:
            if name.startswith("gpt2"):
                params = gpt2_mod.init_gpt2_params(
                    config.prng_key(), spec.config, config.dtype
                )
            else:
                from ..models import llama as llama_mod

                # device init + quantize transiently holds bf16 weights,
                # fp32 temps, AND the quantized copy (~2.3x the bf16
                # size) — past ~4 GiB bf16 that peak OOMs a 16 GiB chip,
                # and Llama-3-8B (16 GiB bf16) doesn't fit at all
                big = llama_mod.param_bytes_estimate(
                    spec.config, config.dtype
                ) > 4 * 1024**3
                if wq_mode in ("int8", "int4") and big:
                    # init + quantize on the host, ship only quantized
                    params = llama_mod.init_quantized_llama_params(
                        config.prng_key(), spec.config,
                        mode=wq_mode, dtype=config.dtype, group=wq_group,
                    )
                    quantized = True
                else:
                    params = llama_mod.init_llama_params(
                        config.prng_key(), spec.config, config.dtype
                    )
        if wq_mode in ("int8", "int4") and not quantized:
            if spec.name == "gpt2":
                params = gpt2_mod.quantize_gpt2_weights(
                    params, mode=wq_mode, group=wq_group
                )
            elif spec.name == "llama":
                from ..models import llama as llama_mod

                params = llama_mod.quantize_llama_weights(
                    params, mode=wq_mode, group=wq_group
                )
            else:
                raise ValueError(
                    f"weight_quant={config.weight_quant} not supported for "
                    f"{spec.name}"
                )
        if tokenizer is None:
            tokenizer = load_tokenizer(name)
        return cls(spec, params, tokenizer, config)

    # ------------------------------------------------------------------
    def _dense_kw(self, capacity: int) -> dict:
        m = self.model
        return dict(
            n_layer=m.n_layer,
            n_head=m.n_kv_head,
            head_dim=m.head_dim,
            capacity=capacity,
            batch=self.config.batch_size,
            dtype=self.config.dtype,
        )

    def _build(self, method: str, bucket: int, max_new: int, kw: dict,
               sampling: Optional[SamplingParams] = None):
        """Build (and cache) the compiled functions for one configuration."""
        key = (method, bucket, max_new, tuple(sorted(kw.items())), sampling)
        if key in self._fns:
            return self._fns[key]

        m = self.model
        trim_fn = None
        mega = None
        if method == "no_cache":
            strategy = NoCacheKV(
                n_layer=m.n_layer,
                n_head=m.n_kv_head,
                head_dim=m.head_dim,
                batch=self.config.batch_size,
                dtype=self.config.dtype,
            )
            total_cap = min(bucket + max_new, m.n_positions)
            fn = make_no_cache_loop(
                m,
                strategy,
                max_new,
                total_cap,
                eos_id=getattr(self.tokenizer, "eos_token_id", None),
            )
            built = ("no_cache", fn, strategy, total_cap)
        else:
            if method == "full_cache":
                cap = bucket + max_new
                mega = self._mega_spec(cap, sampling)
                if mega is not None:
                    cap = mega["capacity"]  # rounded up for aligned DMA
                strategy = DenseKV(**self._dense_kw(cap))
            elif method.startswith("quant_"):
                cap = bucket + max_new
                kv_mode = method.replace("quant_", "")
                mega = self._mega_quant_spec(cap, sampling, kv_mode, kw)
                if mega is not None:
                    cap = mega["capacity"]  # rounded up for aligned DMA
                strategy = QuantizedKV(
                    **self._dense_kw(cap),
                    mode=kv_mode,
                    granularity=kw.get("granularity", "per_token"),
                )
                if mega is not None:
                    mega["eps"] = strategy.eps
            elif method == "paged_attention":
                bs = kw["block_size"]
                strategy = PagedKV(
                    n_layer=m.n_layer,
                    n_head=m.n_kv_head,
                    head_dim=m.head_dim,
                    block_size=bs,
                    max_blocks=-(-(bucket + max_new) // bs),
                    batch=self.config.batch_size,
                    dtype=self.config.dtype,
                )
            elif method == "sliding_window" and kw.get("ring", True):
                # trim-free ring buffer: O(1) eviction, token-identical to
                # the generic trim path (kw ring=False falls back to it)
                strategy = RingKV(
                    n_layer=m.n_layer,
                    n_head=m.n_kv_head,
                    head_dim=m.head_dim,
                    window=kw["window_size"],
                    batch=self.config.batch_size,
                    dtype=self.config.dtype,
                )
            else:  # trim family
                trim_kw = {k_: v_ for k_, v_ in kw.items() if k_ != "ring"}
                cap = eviction.capacity_bound(method, bucket, max_new, trim_kw)
                strategy = DenseKV(**self._dense_kw(cap))
                trim = eviction.TRIM_FNS[method]
                trim_fn = lambda c: trim(c, trim_kw)  # noqa: E731
            if method == "chunked_cache":
                trim = eviction.TRIM_FNS[method]
                trim_fn = lambda c: trim(c, kw)  # noqa: E731

            generate = make_generate(
                m, strategy, trim_fn, max_new, sampling, mega=mega
            )
            built = ("cached", generate, strategy, mega)

        self._fns[key] = built
        return built

    def _mega_spec(
        self, cap: int, sampling: Optional[SamplingParams]
    ) -> Optional[dict]:
        """Whole-step megakernel eligibility for full_cache decode
        (greedy, batch 1, GPT-2 or Llama family, weights packable, fits
        VMEM; ops/pallas/megakernel.py and megakernel_llama.py)."""
        if not self.config.resolved_megakernel():
            return None
        if self.config.batch_size != 1:
            return None
        if sampling is not None and not sampling.greedy:
            return None
        if self.model.name == "gpt2":
            from ..ops.pallas.megakernel import mega_supported, pack_gpt2_mega

            supported, pack = mega_supported, pack_gpt2_mega
        elif self.model.name == "llama":
            from ..ops.pallas.megakernel_llama import (
                mega_supported as supported,
                pack_llama_mega as pack,
            )
        else:
            return None
        cap8 = -(-cap // 8) * 8  # aligned 8-row RMW group needs C % 8 == 0
        if not supported(self.model.config, cap8, self.params):
            return None
        if self._mega_packed is None:
            self._mega_packed = pack(self.params, self.model.config)
        if self._mega_packed is None:
            return None
        return {
            "packed": self._mega_packed,
            "cfg": self.model.config,
            "capacity": cap8,
            "kind": self.model.name,
            "interpret": self.config.device != "tpu",
        }

    def _mega_quant_spec(
        self, cap: int, sampling: Optional[SamplingParams], kv_mode: str,
        kw: dict,
    ) -> Optional[dict]:
        """Quantized-KV whole-step megakernel eligibility for the
        quant_int8/int4/mixed decode methods (greedy, batch 1, per-token
        scales; ops/pallas/megakernel_quant.py). This is the north-star
        composition: int8/int4 KV panes + fused dequant inside the same
        weight-streaming kernel that serves full_cache."""
        if not self.config.resolved_megakernel():
            return None
        if self.config.batch_size != 1:
            return None
        if sampling is not None and not sampling.greedy:
            return None
        if kw.get("granularity", "per_token") != "per_token":
            return None
        if self.model.name == "gpt2":
            from ..ops.pallas.megakernel import pack_gpt2_mega as pack
            from ..ops.pallas.megakernel_quant import (
                mega_quant_supported as supported,
            )
        elif self.model.name == "llama":
            from ..ops.pallas.megakernel_llama import pack_llama_mega as pack
            from ..ops.pallas.megakernel_quant import (
                llama_mega_quant_supported as supported,
            )
        else:
            return None
        cap8 = -(-cap // 8) * 8  # aligned 8-row RMW group needs C % 8 == 0
        if not supported(self.model.config, cap8, self.params, kv_mode):
            return None
        if self._mega_packed is None:
            self._mega_packed = pack(self.params, self.model.config)
        if self._mega_packed is None:
            return None
        return {
            "packed": self._mega_packed,
            "cfg": self.model.config,
            "capacity": cap8,
            "kind": self.model.name,
            "kv_mode": kv_mode,
            "interpret": self.config.device != "tpu",
        }

    def _mega_batch_spec(
        self, cap: int, batch: int, kv_mode: Optional[str] = None
    ) -> Optional[dict]:
        """Batched-megakernel eligibility (greedy, GPT-2/Llama families;
        ops/pallas/megakernel_batch.py, or megakernel_batch_quant.py when a
        kv_mode asks for int8/int4/mixed KV panes)."""
        if not self.config.resolved_megakernel():
            return None
        if self.model.name == "gpt2":
            from ..ops.pallas.megakernel import pack_gpt2_mega as pack

            if kv_mode:
                from ..ops.pallas.megakernel_batch_quant import (
                    mega_batch_quant_supported as q_supported,
                )
            else:
                from ..ops.pallas.megakernel_batch import (
                    mega_batch_supported as supported,
                )
        elif self.model.name == "llama":
            from ..ops.pallas.megakernel_llama import pack_llama_mega as pack

            if kv_mode:
                from ..ops.pallas.megakernel_batch_quant import (
                    llama_mega_batch_quant_supported as q_supported,
                )
            else:
                from ..ops.pallas.megakernel_batch import (
                    llama_mega_batch_supported as supported,
                )
        else:
            return None

        cap8 = -(-cap // 8) * 8
        if kv_mode:
            if not q_supported(self.model.config, cap8, self.params, batch,
                               kv_mode):
                return None
        elif not supported(self.model.config, cap8, self.params, batch):
            return None
        if self._mega_packed is None:
            self._mega_packed = pack(self.params, self.model.config)
        if self._mega_packed is None:
            return None
        spec = {
            "packed": self._mega_packed,
            "cfg": self.model.config,
            "capacity": cap8,
            "kind": self.model.name,
            "interpret": self.config.device != "tpu",
        }
        if kv_mode:
            spec["kv_mode"] = kv_mode
        return spec

    def generate_batch(
        self, prompts: List[str], max_new_tokens: int = 32,
        kv_mode: Optional[str] = None,
        mesh=None, mesh_axis: str = "data",
    ) -> List[str]:
        """Static-batch greedy generation: B prompts decode together.

        Every decode step runs as ONE batched whole-step megakernel program
        (B tokens per weight stream — docs/ROADMAP.md "megakernel batch>1")
        when the model/config is eligible; otherwise falls back to per-prompt
        generation. With `kv_mode` in {"int8", "int4", "mixed"} the panes are
        QUANTIZED (megakernel_batch_quant.py): per-row semantics match
        `generate(p, f"quant_{kv_mode}")` and the pane stream shrinks 2–4x.
        Without kv_mode, per-prompt output is exactly
        `generate(p, "full_cache")` up to the batched matmuls' f32
        reassociation.
        """
        assert prompts, "empty prompt batch"
        # encode with the method this batch emulates: quant_* methods do NOT
        # truncate at prompt_cap (reference parity), so the batched path and
        # its per-prompt fallback must agree on the cap
        method = f"quant_{kv_mode}" if kv_mode else "full_cache"
        ids_list = [self._encode(p, method) for p in prompts]
        true_lens = [len(i) for i in ids_list]
        assert min(true_lens) > 0, "empty prompt"
        B = len(prompts)
        bucket = min(bucket_for(max(true_lens)), self.model.n_positions)
        if mesh is not None:
            return self._generate_batch_sharded(
                prompts, ids_list, true_lens, bucket, max_new_tokens,
                kv_mode, mesh, mesh_axis, method,
            )
        mega = self._mega_batch_spec(bucket + max_new_tokens, B, kv_mode)
        if mega is None:  # correctness fallback: one stream at a time
            return [
                self.generate(p, method, max_new_tokens)
                for p in prompts
            ]
        key = ("batch", B, bucket, max_new_tokens, kv_mode)
        if key not in self._fns:
            strategy = DenseKV(
                n_layer=self.model.n_layer,
                n_head=self.model.n_kv_head,
                head_dim=self.model.head_dim,
                capacity=mega["capacity"],
                batch=B,
                dtype=self.config.dtype,
            )
            self._fns[key] = (
                "batch",
                make_generate_batch(self.model, strategy, max_new_tokens,
                                    mega),
                strategy,
                mega,
            )
        _, fn, _, mega = self._fns[key]
        buf = np.zeros((B, bucket), np.int32)
        for b, ids in enumerate(ids_list):
            buf[b, : len(ids)] = ids
        toks, _ = jax.device_get(
            fn(
                dict(self.params, __mega_packed__=mega["packed"]),
                jnp.asarray(buf),
                jnp.asarray(true_lens, jnp.int32),
            )
        )
        return [
            self.tokenizer.decode(
                ids_list[b] + np.asarray(toks)[b].tolist(),
                skip_special_tokens=True,
            )
            for b in range(B)
        ]

    def _generate_batch_sharded(
        self, prompts, ids_list, true_lens, bucket, max_new_tokens,
        kv_mode, mesh, mesh_axis, method,
    ) -> List[str]:
        """Mesh-sharded batched serving: rows shard over `mesh_axis` and
        each device runs the batched whole-step megakernel on ITS rows
        (data-parallel serving — streams are independent, so shard_map
        needs zero collectives; the weight stream is paid once per DEVICE
        per step instead of once per pool). Per-row outputs are identical
        to the unsharded batched path (the kernel runs at B/n rows —
        per-row math is row-independent). Rows are padded to a multiple
        of the axis size by repeating the last prompt."""
        from jax.sharding import PartitionSpec as P

        from ..parallel.tp_decode import shard_map

        n = mesh.shape[mesh_axis]
        B = len(prompts)
        B_eff = -(-B // n) * n
        ids_eff = ids_list + [ids_list[-1]] * (B_eff - B)
        lens_eff = true_lens + [true_lens[-1]] * (B_eff - B)
        B_local = B_eff // n
        mega = self._mega_batch_spec(
            bucket + max_new_tokens, B_local, kv_mode
        )
        if mega is None:  # correctness fallback: one stream at a time
            return [
                self.generate(p, method, max_new_tokens) for p in prompts
            ]
        key = ("batch_dp", mesh, mesh_axis, B_eff, bucket, max_new_tokens,
               kv_mode)
        if key not in self._fns:
            strategy = DenseKV(
                n_layer=self.model.n_layer,
                n_head=self.model.n_kv_head,
                head_dim=self.model.head_dim,
                capacity=mega["capacity"],
                batch=B_local,
                dtype=self.config.dtype,
            )
            local = make_generate_batch(
                self.model, strategy, max_new_tokens, mega
            )
            fn = jax.jit(shard_map(
                local,
                mesh=mesh,
                in_specs=(P(), P(mesh_axis, None), P(mesh_axis)),
                out_specs=(P(mesh_axis, None), P(mesh_axis)),
                check_vma=False,
            ))
            self._fns[key] = ("batch_dp", fn, None, mega)
        _, fn, _, mega = self._fns[key]
        buf = np.zeros((B_eff, bucket), np.int32)
        for b, ids in enumerate(ids_eff):
            buf[b, : len(ids)] = ids
        toks, _ = jax.device_get(
            fn(
                dict(self.params, __mega_packed__=mega["packed"]),
                jnp.asarray(buf),
                jnp.asarray(lens_eff, jnp.int32),
            )
        )
        return [
            self.tokenizer.decode(
                ids_list[b] + np.asarray(toks)[b].tolist(),
                skip_special_tokens=True,
            )
            for b in range(B)
        ]

    # ------------------------------------------------------------------
    def estimate_kv_bytes(self, method: str, length: int, **kw) -> float:
        """Estimated KV-cache bytes `method` holds at sequence `length`.

        Public counterpart of the per-method estimates benchmark_method
        reports (reference benchmarker.py:707-787 semantics): quantized
        methods count packed stores + scales, paged counts allocated
        blocks incl. slack, trim methods count the post-trim length.
        """
        _, _, strategy, _ = self._build(method, 1, max(length - 1, 1),
                                        dict(kw))
        n = length
        if hasattr(strategy, "window"):  # RingKV sliding window
            n = min(n, strategy.window)
        elif method in eviction.TRIM_FNS:
            trim_kw = {k_: v_ for k_, v_ in kw.items() if k_ != "ring"}
            n = min(n, eviction.len_after(method, length, trim_kw))
        if method == "paged_attention":
            return float(strategy.allocated_bytes(n))
        return float(strategy.est_bytes(n))

    def _encode(self, prompt: str, method: str) -> List[int]:
        ids = self.tokenizer.encode(prompt)
        cap = (
            min(self.config.prompt_cap, self.model.n_positions)
            if method in _TRUNCATING_METHODS
            else self.model.n_positions
        )
        # A prompt of exactly n_positions tokens generates with positions
        # clamped to n_positions-1 (the reference has the same aliasing: HF
        # position_ids saturate when the cache hits the context limit).
        return list(ids[:cap])

    # ------------------------------------------------------------------
    def _tp_mesh(self):
        """("data", "model") mesh for Config.tp, built once per engine."""
        if getattr(self, "_tp_mesh_cache", None) is None:
            from ..parallel.mesh import make_mesh

            tp = self.config.tp
            nd = len(jax.devices())
            if tp > nd:
                raise ValueError(f"Config.tp={tp} but only {nd} devices")
            E = getattr(self.model.config, "hidden_size", None) or getattr(
                self.model.config, "n_embd"
            )
            if self.model.n_kv_head % tp or E % tp:
                raise ValueError(
                    f"Config.tp={tp} does not divide the model's heads/"
                    "hidden — pick a degree that shards head-aligned"
                )
            self._tp_mesh_cache = make_mesh((1, tp), ("data", "model"))
        return self._tp_mesh_cache

    def _run_tp(
        self, ids: List[int], method: str, max_new_tokens: int
    ) -> Tuple[str, int, object, int]:
        """Explicit-TP route for greedy full_cache / quant_* generation
        (Config.tp >= 2): parallel/tp_decode.py tp_generate with the
        sharded weights cached on the engine. Strategy accounting objects
        match the single-device methods' (same est_bytes semantics)."""
        from ..cache.kvcache import DenseKV, QuantizedKV
        from ..parallel.tp_decode import (
            shard_gpt2_tp,
            shard_llama_tp,
            tp_generate,
        )

        mesh = self._tp_mesh()
        kv_mode = (
            None if method == "full_cache" else method.replace("quant_", "")
        )
        blocks = self.params.get("blocks", {})
        if any(isinstance(w, dict) for w in blocks.values()):
            raise ValueError(
                "Config.tp does not support weight-quantized params yet "
                "(quantized KV panes ARE supported via the quant_* "
                "methods); serve full-precision weights with tp, or drop "
                "weight_quant"
            )
        if getattr(self, "_tp_params_cache", None) is None:
            shard = shard_gpt2_tp if self.model.name == "gpt2" else \
                shard_llama_tp
            self._tp_params_cache = shard(
                self.params, self.model.config, mesh, "model"
            )
        toks = tp_generate(
            self.model, self.params, mesh, ids, max_new_tokens,
            kv_mode=kv_mode, tp_params=self._tp_params_cache,
        )
        out_ids = list(ids) + toks
        self.last_generation_ids = out_ids
        n = len(ids)
        cap = n + max_new_tokens + 1
        kw = dict(n_layer=self.model.n_layer, n_head=self.model.n_kv_head,
                  head_dim=self.model.head_dim, capacity=cap,
                  dtype=self.config.dtype)
        strategy = (
            QuantizedKV(**kw, mode=kv_mode, granularity="per_head",
                        fused=False)
            if kv_mode else DenseKV(**kw)
        )
        return (
            self.tokenizer.decode(out_ids, skip_special_tokens=True),
            max_new_tokens,
            strategy,
            n + max_new_tokens,
        )

    def _run(
        self, prompt: str, method: str, max_new_tokens: int,
        sampling: Optional[SamplingParams] = None, **kw
    ) -> Tuple[str, int, object, int]:
        """Core driver: returns (text, n_new, strategy, final_length)."""
        ids = self._encode(prompt, method)
        true_len = len(ids)
        assert true_len > 0, "empty prompt"
        if (
            self.config.tp and self.config.tp > 1 and sampling is None
            and (method == "full_cache" or method.startswith("quant_"))
        ):
            return self._run_tp(ids, method, max_new_tokens)
        bucket = min(bucket_for(true_len), self.model.n_positions)

        kind, fns, strategy, extra = self._build(
            method, bucket, max_new_tokens, kw, sampling
        )

        if kind == "no_cache":
            buf = np.zeros((self.config.batch_size, extra), np.int32)
            buf[0, :true_len] = ids
            gen, n_new = fns(self.params, jnp.asarray(buf), jnp.int32(true_len))
            gen, n_new = jax.device_get((gen, n_new))  # one round-trip
            n_new = int(n_new)
            out_ids = np.asarray(gen)[0, : true_len + n_new].tolist()
            self.last_generation_ids = out_ids
            return (
                self.tokenizer.decode(out_ids, skip_special_tokens=True),
                n_new,
                strategy,
                true_len + n_new,
            )

        generate = fns
        buf = np.zeros((self.config.batch_size, bucket), np.int32)
        buf[0, :true_len] = ids
        # megakernel runs: the packed tile stream is a runtime ARG (a
        # closure-captured GiB array becomes a traced constant and blows up
        # the compile — see make_generate)
        params = (
            dict(self.params, __mega_packed__=extra["packed"])
            if isinstance(extra, dict) else self.params
        )
        toks, final_len = generate(params, jnp.asarray(buf), jnp.int32(true_len))
        n_new = max_new_tokens
        # one host fetch for both results: each device_get is a full
        # round-trip through the remote runtime (~tens of ms)
        toks, final_len = jax.device_get((toks, final_len))
        out_ids = ids + np.asarray(toks)[0].tolist()
        final_len = int(final_len)
        self.last_generation_ids = out_ids  # raw token ids of prompt+generation
        return (
            self.tokenizer.decode(out_ids, skip_special_tokens=True),
            n_new,
            strategy,
            final_len,
        )

    def generate(
        self,
        prompt: str,
        method: str = "full_cache",
        max_new_tokens: int = 32,
        sampling: Optional[SamplingParams] = None,
        **kw,
    ) -> str:
        """Generate text with any cache method and optional sampling
        (temperature / top-k / top-p — greedy when sampling is None,
        matching the reference's argmax-everywhere behavior)."""
        text, _, _, _ = self._run(
            prompt, method, max_new_tokens, sampling=sampling, **kw
        )
        return text

    def generate_ids(
        self, prompt: str, method: str = "full_cache", max_new_tokens: int = 32, **kw
    ) -> List[int]:
        """Raw token ids (prompt + generation) — what quality metrics like
        token_agreement_rate consume; avoids lossy decode/encode round-trips."""
        self._run(prompt, method, max_new_tokens, **kw)
        return list(self.last_generation_ids)

    def generate_speculative_auto(
        self,
        prompt: str,
        max_new_tokens: int = 32,
        draft: Optional[tuple] = None,
        stats: bool = False,
    ):
        """Acceptance-driven speculation: k and proposal mode disappear
        from user space (round-4 verdict #5b).

        Candidates — ngram k=8 / k=4, plus trained-draft k=8 / k=4 when
        `draft=(spec, params)` is given — are each probed once (every
        call runs with the stats hook on), then the engine commits to the
        candidate with the best EXPECTED tokens per round-cost:
        acceptance_EMA / round_cost, where a round costs ~1 target pass
        for ngram and ~1 + k * (draft_params / target_params) for a
        draft. Every 8th call re-probes the runner-up so a drifting
        workload can flip the choice. Output equals plain greedy for any
        candidate (the usual unconditional-acceptance guarantee).
        """
        cands = [("ngram", 8, None), ("ngram", 4, None)]
        if draft is not None:
            cands += [("draft", 8, draft), ("draft", 4, draft)]
        st = getattr(self, "_spec_auto", None)
        if st is None or st["draft_id"] != (
            id(draft[1]) if draft is not None else None
        ):
            st = self._spec_auto = {
                "acc": {},  # (mode, k) -> EMA tokens/round
                "calls": 0,
                "draft_id": id(draft[1]) if draft is not None else None,
            }

        def _width(cfg):
            return getattr(cfg, "hidden_size", None) or getattr(
                cfg, "n_embd", 1
            )

        def cost(mode, k, d):
            if mode == "ngram":
                return 1.0
            dspec = d[0]
            rel = (dspec.n_layer * _width(dspec.config) ** 2) / max(
                self.model.n_layer * _width(self.model.config) ** 2, 1
            )
            return 1.0 + k * max(rel, 0.02)

        unprobed = [c for c in cands if (c[0], c[1]) not in st["acc"]]
        if unprobed:
            mode, k, d = unprobed[0]
        else:
            scored = sorted(
                cands,
                key=lambda c: st["acc"][(c[0], c[1])] / cost(*c),
                reverse=True,
            )
            mode, k, d = (
                scored[1] if st["calls"] % 8 == 7 and len(scored) > 1
                else scored[0]
            )
        st["calls"] += 1
        out = self.generate_speculative(
            prompt, max_new_tokens, mode=mode, k=k, draft=d, stats=True
        )
        text, n_new, s = out
        key = (mode, k)
        prev = st["acc"].get(key)
        obs = s["tokens_per_round"]
        st["acc"][key] = obs if prev is None else 0.5 * prev + 0.5 * obs
        s = dict(s, mode=mode, k=k)
        return (text, n_new, s) if stats else (text, n_new)

    def generate_speculative(
        self,
        prompt: str,
        max_new_tokens: int = 32,
        mode: str = "ngram",
        k: int = 8,
        draft_layers: int = 1,
        draft: Optional[tuple] = None,
        stats: bool = False,
    ):
        """Speculative greedy generation (beyond the reference).

        mode "ngram" = draft-free prompt-lookup proposals; "self_draft" =
        a truncated `draft_layers`-layer self-draft; "draft" = an external
        trained draft passed as `draft=(spec, params)` (must share the
        target's vocab). All verify through the whole-step megakernel when
        the model/config is eligible (engine._mega_spec), else the XLA
        k-row forward. Output is exactly plain full_cache greedy in fp32
        (bf16: the [k, E]-vs-[1, E] reassociation caveat,
        docs/BENCHMARKS.md). Returns (text, n_new) — or, with
        `stats=True`, (text, n_new, {"n_rounds", "tokens_per_round"}),
        where tokens_per_round = (n_new - 1) / n_rounds measures
        acceptance (1.0 = no speculation win, k = every proposal accepted).
        """
        from .speculative import (
            make_ngram_speculative_generate,
            make_self_draft,
            make_speculative_generate,
        )

        ids = self._encode(prompt, "full_cache")
        true_len = len(ids)
        assert true_len > 0, "empty prompt"
        bucket = min(bucket_for(true_len), self.model.n_positions)
        key = ("speculative", mode, bucket, max_new_tokens, k, draft_layers,
               stats, id(draft[1]) if draft is not None else None)

        def _draft_mega_spec(dspec, dparams, mega):
            """Megakernel spec for the DRAFT model (draft-side megastep
            bursts): packed each build — drafts are small by definition."""
            if mega is None:
                return None
            if dspec.name == "gpt2":
                from ..ops.pallas.megakernel import (
                    mega_supported as sup,
                    pack_gpt2_mega as pack,
                )
            elif dspec.name == "llama":
                from ..ops.pallas.megakernel_llama import (
                    mega_supported as sup,
                    pack_llama_mega as pack,
                )
            else:
                return None
            if not sup(dspec.config, mega["capacity"], dparams):
                return None
            packed = pack(dparams, dspec.config)
            if packed is None:
                return None
            out = {
                "packed": packed,
                "cfg": dspec.config,
                "kind": dspec.name,
                "interpret": self.config.device != "tpu",
            }
            # VMEM-resident full-precision drafts additionally get the
            # ONE-program burst (megakernel_draft.py): k draft steps in a
            # single kernel — make_speculative_generate gates on capacity
            # and prefers it
            if dspec.name == "gpt2" and not isinstance(
                dparams["blocks"]["attn_w"], dict
            ):
                from ..ops.pallas.megakernel_draft import pack_gpt2_draft

                out["burst_packed"] = pack_gpt2_draft(dparams, dspec.config)
            elif dspec.name == "llama" and not isinstance(
                dparams["blocks"]["wq"], dict
            ) and dspec.config.tie_embeddings:
                from ..ops.pallas.megakernel_draft import pack_llama_draft

                out["burst_packed"] = pack_llama_draft(dparams, dspec.config)
            return out

        def _build_gen(mega):
            if mode == "ngram":
                return make_ngram_speculative_generate(
                    self.model, max_new_tokens, k=k, prompt_bucket=bucket,
                    mega=mega, dtype=self.config.dtype, stats=stats,
                )
            if mode in ("self_draft", "draft"):
                if mode == "draft":
                    assert draft is not None, \
                        "mode='draft' needs draft=(spec, params)"
                    dspec, dparams = draft
                else:
                    dspec, dparams = make_self_draft(
                        self.model, self.params, draft_layers
                    )
                base = make_speculative_generate(
                    self.model, dspec, max_new_tokens, k=k,
                    prompt_bucket=bucket, mega=mega, dtype=self.config.dtype,
                    stats=stats,
                    draft_mega=_draft_mega_spec(dspec, dparams, mega),
                )

                def gen(tp, tokens, tl, _g=base, _dp=dparams):  # noqa: E731
                    return _g(tp, _dp, tokens, tl)

                return gen
            raise ValueError(f"unknown speculative mode: {mode}")

        if key not in self._fns:
            mega = self._mega_spec(bucket + max_new_tokens + k + 1, None)
            self._fns[key] = ("speculative", _build_gen(mega), mega)
        _, gen, mega = self._fns[key]

        buf = np.zeros((1, bucket), np.int32)
        buf[0, :true_len] = ids
        params = (
            dict(self.params, __mega_packed__=mega["packed"])
            if mega is not None else self.params
        )
        try:
            res = jax.device_get(
                gen(params, jnp.asarray(buf), jnp.int32(true_len))
            )
        except ValueError as e:
            # the R-row verify pass reserves more VMEM than the decode step
            # the eligibility check models; degrade to the XLA k-row verify
            if mega is None or "does not fit VMEM" not in str(e):
                raise
            gen, mega = _build_gen(None), None
            self._fns[key] = ("speculative", gen, mega)
            res = jax.device_get(
                gen(self.params, jnp.asarray(buf), jnp.int32(true_len))
            )
        out, n = res[0], int(res[1])
        out_ids = ids + np.asarray(out)[:n].tolist()
        self.last_generation_ids = out_ids
        text = self.tokenizer.decode(out_ids, skip_special_tokens=True)
        if stats:
            n_rounds = int(res[2])
            return text, n, {
                "n_rounds": n_rounds,
                "tokens_per_round": (n - 1) / max(n_rounds, 1),
            }
        return text, n

    # ------------------------------------------------------------------
    # Generation API (names/signatures/returns mirror benchmarker.py:63-639)
    # ------------------------------------------------------------------
    def generate_no_cache(self, prompt: str, max_new_tokens: int = 32):
        text, n_new, _, _ = self._run(prompt, "no_cache", max_new_tokens)
        return text, n_new

    def generate_with_cache(self, prompt: str, max_new_tokens: int = 32):
        text, n_new, _, _ = self._run(prompt, "full_cache", max_new_tokens)
        return text, n_new

    def generate_with_sliding_window(
        self, prompt: str, max_new_tokens: int = 32, window_size: int = 256
    ):
        text, n_new, _, _ = self._run(
            prompt, "sliding_window", max_new_tokens, window_size=window_size
        )
        return text, n_new

    def generate_with_prefix_window(
        self,
        prompt: str,
        max_new_tokens: int = 32,
        window_size: int = 256,
        prefix_len: int = 32,
    ):
        text, n_new, _, _ = self._run(
            prompt,
            "prefix_window",
            max_new_tokens,
            window_size=window_size,
            prefix_len=prefix_len,
        )
        return text, n_new

    def generate_with_strided_cache(
        self,
        prompt: str,
        max_new_tokens: int = 32,
        window_size: int = 256,
        stride: int = 4,
        prefix_len: int = 0,
    ):
        text, n_new, _, _ = self._run(
            prompt,
            "strided_cache",
            max_new_tokens,
            window_size=window_size,
            stride=stride,
            prefix_len=prefix_len,
        )
        return text, n_new

    def generate_with_block_cache(
        self,
        prompt: str,
        max_new_tokens: int = 32,
        window_size: int = 256,
        block_size: int = 64,
        keep_per_block: int = 8,
        prefix_len: int = 0,
    ):
        text, n_new, _, _ = self._run(
            prompt,
            "block_cache",
            max_new_tokens,
            window_size=window_size,
            block_size=block_size,
            keep_per_block=keep_per_block,
            prefix_len=prefix_len,
        )
        return text, n_new

    def generate_with_budget_cache(
        self,
        prompt: str,
        max_new_tokens: int = 32,
        window_size: int = 256,
        old_budget: int = 64,
        prefix_len: int = 0,
    ):
        text, n_new, _, _ = self._run(
            prompt,
            "budget_cache",
            max_new_tokens,
            window_size=window_size,
            old_budget=old_budget,
            prefix_len=prefix_len,
        )
        return text, n_new

    def generate_with_quantized_kv(
        self, prompt: str, max_new_tokens: int = 32, mode: str = "int8"
    ):
        text, n_new, strategy, final_len = self._run(
            prompt, f"quant_{mode}", max_new_tokens
        )
        return text, n_new, mb(strategy.est_bytes(final_len))

    def generate_with_paged_attention(
        self, prompt: str, max_new_tokens: int = 32, block_size: int = 64
    ):
        text, n_new, strategy, final_len = self._run(
            prompt, "paged_attention", max_new_tokens, block_size=block_size
        )
        return (
            text,
            n_new,
            mb(strategy.allocated_bytes(final_len)),
            mb(strategy.used_bytes(final_len)),
            strategy.num_blocks(final_len) * self.model.n_layer,
        )

    def generate_with_chunked_cache(
        self,
        prompt: str,
        max_new_tokens: int = 32,
        chunk_size: int = 64,
        keep_last: int = 256,
    ):
        text, n_new, strategy, final_len = self._run(
            prompt,
            "chunked_cache",
            max_new_tokens,
            chunk_size=chunk_size,
            keep_last=keep_last,
        )
        return text, n_new, mb(strategy.est_bytes(final_len))

    # ------------------------------------------------------------------
    def benchmark_method(
        self,
        prompts: List[str],
        method: str = "no_cache",
        max_new_tokens: int = 32,
        window_size: int = 256,
        block_size: int = 64,
        chunk_size: int = 64,
        keep_last: int = 256,
        mode: str = "int8",
        prefix_len: int = 32,
        stride: int = 4,
        keep_per_block: int = 8,
        old_budget: int = 64,
        warmup: bool = True,
    ) -> dict:
        """Run one method over a list of prompts; same metric-dict schema as
        /root/reference/src/benchmarking/benchmarker.py:643-832.

        `warmup=True` runs each prompt-bucket once before timing so XLA
        compilation (a one-time cost the eager reference doesn't have) is
        excluded from throughput numbers.
        """
        assert method in VALID_METHODS, f"Invalid method: {method}"

        def run_one(prompt):
            if method == "no_cache":
                _, n_new = self.generate_no_cache(prompt, max_new_tokens)
                return n_new, 0.0
            if method == "full_cache":
                _, n_new = self.generate_with_cache(prompt, max_new_tokens)
                return n_new, float("nan")
            if method == "sliding_window":
                _, n_new = self.generate_with_sliding_window(
                    prompt, max_new_tokens, window_size=window_size
                )
                return n_new, float("nan")
            if method.startswith("quant_"):
                _, n_new, est = self.generate_with_quantized_kv(
                    prompt, max_new_tokens, mode=method.replace("quant_", "")
                )
                return n_new, est
            if method == "paged_attention":
                _, n_new, alloc_mb, _, _ = self.generate_with_paged_attention(
                    prompt, max_new_tokens, block_size=block_size
                )
                return n_new, alloc_mb
            if method == "chunked_cache":
                _, n_new, est = self.generate_with_chunked_cache(
                    prompt, max_new_tokens, chunk_size=chunk_size, keep_last=keep_last
                )
                return n_new, est
            if method == "prefix_window":
                _, n_new = self.generate_with_prefix_window(
                    prompt,
                    max_new_tokens=max_new_tokens,
                    window_size=window_size,
                    prefix_len=prefix_len,
                )
                return n_new, float("nan")
            if method == "strided_cache":
                _, n_new = self.generate_with_strided_cache(
                    prompt,
                    max_new_tokens=max_new_tokens,
                    window_size=window_size,
                    stride=stride,
                    prefix_len=prefix_len,
                )
                return n_new, float("nan")
            if method == "block_cache":
                _, n_new = self.generate_with_block_cache(
                    prompt,
                    max_new_tokens=max_new_tokens,
                    window_size=window_size,
                    block_size=block_size,
                    keep_per_block=keep_per_block,
                    prefix_len=prefix_len,
                )
                return n_new, float("nan")
            if method == "budget_cache":
                _, n_new = self.generate_with_budget_cache(
                    prompt,
                    max_new_tokens=max_new_tokens,
                    window_size=window_size,
                    old_budget=old_budget,
                    prefix_len=prefix_len,
                )
                return n_new, float("nan")
            raise ValueError(method)

        if warmup and prompts:
            seen = set()
            for p in prompts:
                b = bucket_for(len(self._encode(p, method)))
                if b not in seen:
                    seen.add(b)
                    run_one(p)

        reset_device_peak(self.config.device)
        start_cpu = get_cpu_mem_mb()
        timer = DeviceTimer().start()

        total_new_tokens = 0
        est_cache_mbs = []
        for prompt in prompts:
            n_new, est = run_one(prompt)
            total_new_tokens += n_new
            est_cache_mbs.append(est)

        elapsed = timer.stop()
        cpu_used = get_cpu_mem_mb() - start_cpu
        dev_peak = get_device_peak_mb(self.config.device)
        tps = total_new_tokens / elapsed if elapsed > 0 else float("inf")

        finite = [x for x in est_cache_mbs if isinstance(x, float) and not math.isnan(x)]
        est_cache_mb_avg = sum(finite) / len(finite) if finite else float("nan")

        trim_methods = [
            "sliding_window",
            "prefix_window",
            "strided_cache",
            "block_cache",
            "budget_cache",
        ]
        result = {
            "method": method,
            "elapsed_sec": elapsed,
            "total_new_tokens": total_new_tokens,
            "tokens_per_sec": tps,
            "cpu_mem_used_mb": cpu_used,
            "gpu_peak_mb": dev_peak,  # device peak; key kept for schema parity
            "window_size": window_size if method in trim_methods else None,
            "block_size": block_size if method == "paged_attention" else None,
            "chunk_size": chunk_size if method == "chunked_cache" else None,
            "est_kv_cache_mb_avg": est_cache_mb_avg,
            "prefix_len": prefix_len
            if method in ["prefix_window", "strided_cache", "block_cache", "budget_cache"]
            else None,
            "stride": stride if method == "strided_cache" else None,
            "keep_per_block": keep_per_block if method == "block_cache" else None,
            "old_budget": old_budget if method == "budget_cache" else None,
        }
        from ..utils.logging import get_metrics_logger

        get_metrics_logger().log({"event": "benchmark_method", **result})
        return result


class KVCacheBenchmarker(InferenceEngine):
    """Reference-compatible alias (/root/reference/src/benchmarking/
    benchmarker.py:23). Constructed either like the reference —
    `KVCacheBenchmarker(model_spec, params, tokenizer)` — or via
    `KVCacheBenchmarker.from_model_name("gpt2")`.
    """

    def __init__(self, model, params=None, tokenizer=None, device: str = None, **kw):
        if isinstance(model, str):
            eng = InferenceEngine.from_model_name(model, tokenizer=tokenizer)
            super().__init__(eng.model, eng.params, eng.tokenizer, eng.config)
        else:
            cfg = kw.pop("config", None)
            super().__init__(model, params, tokenizer, cfg)
        if device is not None:
            self.config.device = device
