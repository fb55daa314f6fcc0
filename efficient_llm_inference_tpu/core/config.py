"""Core configuration dataclasses.

TPU-native re-design of the reference's config layer
(/root/reference/src/core/config.py:10-84). Same knobs and defaults, but:

* dtype is a jnp dtype (bfloat16 on TPU, float32 on CPU) instead of a torch dtype;
* seeding is explicit JAX PRNGKey threading (JAX has no global seed mutation);
* mesh/topology knobs are first-class from day one (the reference is single-device).
"""

from __future__ import annotations

import random
from dataclasses import dataclass, field
from typing import Literal, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def default_device_kind() -> str:
    """Best available platform: 'tpu' if present, else 'cpu'."""
    try:
        platform = jax.devices()[0].platform
    except RuntimeError:
        return "cpu"
    # The axon tunnel reports platform 'axon' backed by a TPU chip.
    if platform in ("tpu", "axon"):
        return "tpu"
    return platform


def default_dtype() -> jnp.dtype:
    """bfloat16 on TPU (MXU-native), float32 on CPU.

    Mirrors the reference policy of fp16-on-CUDA / fp32-on-CPU
    (/root/reference/src/core/config.py:25-27) with the TPU-native dtype.
    """
    return jnp.bfloat16 if default_device_kind() == "tpu" else jnp.float32


@dataclass
class Config:
    """Main configuration for LLM inference benchmarking.

    Mirrors /root/reference/src/core/config.py:10-37.

    Attributes:
        model_name: Model identifier ("gpt2", "gpt2-medium", "llama-3-8b", ...).
        device: Platform to run inference on ("tpu" or "cpu").
        dtype: Compute dtype for model weights/activations.
        seed: Random seed; converted into a PRNGKey via :meth:`prng_key`.
        max_new_tokens: Default number of tokens to generate.
        batch_size: Batch size for inference.
        prompt_cap: Static prompt-length cap (reference truncates at 1024,
            /root/reference/src/benchmarking/benchmarker.py:76-78). XLA needs
            static shapes, so this also bounds cache capacity.
        scan_unroll: Layer-loop unroll factor; None = auto (full unroll on
            TPU for models up to 16 layers, 1 elsewhere). Unrolling removes
            per-iteration scan overhead from the decode step — measured
            716 -> 542 us/step on GPT-2 small on v5e — at the cost of a
            bigger (cached) compile.
        weight_quant: "int8" quantizes matmul weights per output channel
            (serving mode, beyond the reference; ~1.7x decode speedup at
            batch 1); "int4" uses group-wise 4-bit weights (half the weight
            stream again, larger quality cost — see docs/QUALITY.md);
            "int4w8" is int4 with ONE scale group per megakernel half-tile
            (G = TR/2) — the in-kernel dequant collapses to column scaling
            of the dot results (megakernel_llama._int4_tile_dot fast
            path), trading coarser scale granularity for less VPU work per
            tile. None keeps full-precision weights (token-exact vs HF).
        megakernel: run eligible greedy batch-1 full_cache decode steps as
            ONE Pallas program (ops/pallas/megakernel.py; measured 599 ->
            375 us/step on GPT-2 small on v5e). None = auto (on on TPU);
            False disables; True forces (interpret mode off-TPU — slow,
            test-only).
    """

    model_name: str = "gpt2"
    device: str = field(default_factory=default_device_kind)
    dtype: jnp.dtype = field(default_factory=default_dtype)
    seed: int = 42
    max_new_tokens: int = 64
    batch_size: int = 1
    prompt_cap: int = 1024
    scan_unroll: Optional[int] = None
    weight_quant: Optional[Literal["int8", "int4", "int4w8"]] = None
    megakernel: Optional[bool] = None
    # tensor parallelism degree (0/1 = off). With tp >= 2 the engine routes
    # greedy full_cache / quant_* generation through the explicit-collective
    # shard_map decode (parallel/tp_decode.py) on a ("data", "model") mesh
    # over the first tp*ceil(n/tp) local devices — weights and KV panes
    # shard over heads, quant scales shard with them. Requires n_kv_head %
    # tp == 0 and hidden % tp == 0 (loud ValueError otherwise).
    tp: int = 0

    def resolved_scan_unroll(self, n_layer: int) -> int:
        if self.scan_unroll is not None:
            return self.scan_unroll
        if self.device == "tpu" and n_layer <= 16:
            return n_layer
        return 1

    def resolved_megakernel(self) -> bool:
        if self.megakernel is not None:
            return self.megakernel
        return self.device == "tpu"

    def __post_init__(self):
        # Seed host-side RNGs for anything non-JAX (dataset shuffling etc.).
        random.seed(self.seed)
        np.random.seed(self.seed % (2**32))

    def prng_key(self) -> jax.Array:
        """Explicit PRNGKey derived from the seed (threaded, never global)."""
        return jax.random.PRNGKey(self.seed)


@dataclass
class QuantizationConfig:
    """KV-cache quantization config.

    Mirrors /root/reference/src/core/config.py:40-50. `granularity` is a
    TPU-native extension: "per_token" reproduces the reference's per-tensor
    scale over each appended [B,H,1,D] slice; "per_head" gives one scale per
    (token, head) for better quality at the same bit-width.
    """

    mode: Literal["int8", "int4", "mixed"] = "int8"
    eps: float = 1e-8
    granularity: Literal["per_token", "per_head"] = "per_token"


@dataclass
class CacheConfig:
    """Cache strategy config. Mirrors /root/reference/src/core/config.py:53-67."""

    window_size: int = 256
    block_size: int = 64
    chunk_size: int = 64
    keep_last: int = 256


@dataclass
class BenchmarkConfig:
    """Benchmark sweep config. Mirrors /root/reference/src/core/config.py:70-84."""

    methods: list[str] = field(
        default_factory=lambda: ["no_cache", "full_cache", "sliding_window"]
    )
    window_sizes: list[int] = field(default_factory=lambda: [64, 128, 256, 512])
    block_sizes: list[int] = field(default_factory=lambda: [32, 64, 128])
    chunk_sizes: list[int] = field(default_factory=lambda: [32, 64, 128])


@dataclass
class MeshConfig:
    """Device-mesh topology config (new; the reference is single-device,
    /root/reference/SURVEY §2.3). Axis names follow the scaling-book
    convention: data-parallel over "data", tensor-parallel over "model".
    """

    data: int = 1
    model: int = 1
    axis_names: Sequence[str] = ("data", "model")

    @property
    def shape(self) -> tuple[int, int]:
        return (self.data, self.model)
