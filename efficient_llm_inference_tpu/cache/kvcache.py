"""First-class KV-cache state objects (TPU-native, static shapes).

The single most non-TPU-idiomatic thing about the reference is its
grow-by-concat KV tuples rewritten between steps
(/root/reference/src/benchmarking/benchmarker.py:124-127,177-183). Here the
cache is a preallocated static-shape buffer pytree

    {"k": [L, B, H, C, D], "v": [L, B, H, C, D], "length": int32[]}

plus per-mode extras (quantized scales, packed nibbles). Every policy keeps
XLA shapes fixed: append = dynamic_update_slice at `length`, attention =
masked softmax over the full capacity `C`, eviction (cache/eviction.py) =
mask + stable gather-compaction. This lets the whole decode loop live inside
one `jax.lax.scan` with a donated cache.

A *strategy* object encapsulates storage format + attention math:

* ``DenseKV``      — full-precision buffer (full_cache + all trim policies).
* ``QuantizedKV``  — int8 / packed-int4 / mixed storage with per-token scales;
                     numerics match /root/reference/src/quantization/ops.py
                     exactly (past tokens dequantized, current token fp — see
                     benchmarker.py:465-486).
* ``PagedKV``      — block-granular allocation accounting + block tables
                     (reference simulates this in Python lists,
                     /root/reference/src/cache/implementations.py:10-121).

The model body (models/gpt2.py) is identical for every strategy.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.quantization import (
    dequantize_int4_packed,
    dequantize_int8,
    quantize_int4_packed,
    quantize_int8,
)

# Python literal (not a device array): module-level jnp constants get captured
# into jaxprs and force host transfers at lowering time.
NEG_INF = float(jnp.finfo(jnp.float32).min)


def _attend(
    q: jax.Array,  # [B, Hq, T, D] (query block, fp)
    k_buf: jax.Array,  # [B, Hkv, C, D] (full-capacity key buffer, fp)
    v_buf: jax.Array,  # [B, Hkv, C, D]
    length: jax.Array,  # int32[] — tokens already cached before this block
    softmax_dtype=jnp.float32,
) -> jax.Array:
    """Masked causal attention over a static-capacity buffer.

    Query row i (global position length+i) may attend key slot j iff
    j <= length + i. Right-padded prefill is handled for free: pad keys sit
    at slots after every real query's causal horizon. Supports GQA: when
    Hq > Hkv, query heads are grouped onto shared KV heads (no KV repeat —
    the grouping lives in the einsum, saving KV bandwidth).
    """
    B, Hq, T, D = q.shape
    Hkv, C = k_buf.shape[1], k_buf.shape[2]
    G = Hq // Hkv
    scale = 1.0 / jnp.sqrt(jnp.float32(D))
    qg = q.reshape(B, Hkv, G, T, D)
    scores = jnp.einsum(
        "bkgtd,bkcd->bkgtc", qg, k_buf, preferred_element_type=jnp.float32
    )
    scores = scores * scale
    col = jax.lax.broadcasted_iota(jnp.int32, (T, C), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (T, C), 0)
    mask = col <= (length + row)
    scores = jnp.where(mask[None, None, None], scores, NEG_INF)
    probs = jax.nn.softmax(scores.astype(softmax_dtype), axis=-1)
    out = jnp.einsum(
        "bkgtc,bkcd->bkgtd", probs, v_buf, preferred_element_type=jnp.float32
    )
    return out.reshape(B, Hq, T, D)


@dataclasses.dataclass(frozen=True)
class DenseKV:
    """Full-precision static-capacity KV cache strategy.

    Used for full_cache and as the substrate for every trim policy
    (sliding/prefix/strided/block/budget/chunked), which rewrite the buffer
    between steps via cache/eviction.py.
    """

    n_layer: int
    n_head: int
    head_dim: int
    capacity: int
    batch: int = 1
    dtype: Any = jnp.float32

    def init(self) -> dict:
        shape = (self.n_layer, self.batch, self.n_head, self.capacity, self.head_dim)
        return {
            "k": jnp.zeros(shape, self.dtype),
            "v": jnp.zeros(shape, self.dtype),
            "length": jnp.zeros((), jnp.int32),
        }

    # -- scan plumbing ------------------------------------------------------
    def cache_layer_slices(self, cache: dict):
        return (cache["k"], cache["v"])

    def cache_with_layer_slices(self, cache: dict, new_slices, T: int) -> dict:
        k, v = new_slices
        return {"k": k, "v": v, "length": cache["length"]}

    def set_length(self, cache: dict, length) -> dict:
        return {**cache, "length": jnp.asarray(length, jnp.int32)}

    # -- attention ----------------------------------------------------------
    def layer_attend(
        self,
        layer_cache,  # (k_l [B,H,C,D], v_l [B,H,C,D])
        cache: dict,
        q: jax.Array,  # [B,H,T,D]
        k_new: jax.Array,
        v_new: jax.Array,
        seq_mask: Optional[jax.Array],
    ):
        k_l, v_l = layer_cache
        length = cache["length"]
        k_l = jax.lax.dynamic_update_slice(
            k_l, k_new.astype(k_l.dtype), (0, 0, length, 0)
        )
        v_l = jax.lax.dynamic_update_slice(
            v_l, v_new.astype(v_l.dtype), (0, 0, length, 0)
        )
        out = _attend(q, k_l, v_l, length)
        return out, (k_l, v_l)

    # -- accounting ---------------------------------------------------------
    def est_bytes(self, length: int) -> float:
        per_tok = self.batch * self.n_head * self.head_dim
        itemsize = jnp.dtype(self.dtype).itemsize
        return 2.0 * self.n_layer * length * per_tok * itemsize


@dataclasses.dataclass(frozen=True)
class QuantizedKV:
    """Quantized KV cache: int8 / packed-int4 / mixed (K int8, V int4).

    Storage matches /root/reference/src/quantization/ops.py:136-290:
    per-appended-token symmetric scales (one fp scale per token covering the
    whole [B,H,1,D] slice — `granularity="per_token"`), int8 values or two
    int4 nibbles per uint8 packed along D (even index in the high nibble).
    `granularity="per_head"` is a TPU-native quality upgrade: one scale per
    (head, token).

    Attention semantics match benchmarker.py:465-486: all *past* tokens are
    dequantized, the *current* block stays full-precision, and the current
    block is quantized on write.
    """

    n_layer: int
    n_head: int
    head_dim: int
    capacity: int
    batch: int = 1
    dtype: Any = jnp.float32  # compute dtype for dequantized values
    mode: str = "int8"  # "int8" | "int4" | "mixed"
    granularity: str = "per_token"  # "per_token" | "per_head"
    eps: float = 1e-8
    # Fused Pallas dequant+attention for decode steps (T==1, batch 1): reads
    # the quantized cache directly instead of materializing a dequantized
    # copy. None = auto (on when the default backend is a TPU).
    fused: Any = None

    def __post_init__(self):
        assert self.mode in ("int8", "int4", "mixed"), self.mode
        assert self.head_dim % 2 == 0, "int4 packing requires even head_dim"
        from ..core.config import default_device_kind

        on_tpu = default_device_kind() == "tpu"
        if self.fused is None:
            object.__setattr__(self, "fused", on_tpu)
        # off-TPU the fused kernel runs in Pallas interpret mode (tests)
        object.__setattr__(self, "_interpret", not on_tpu)

    def _bits(self, kind: str) -> int:
        return 8 if kind == "int8" else 4

    def _store_shape(self, kind: str):
        L, B, H, C, D = (
            self.n_layer,
            self.batch,
            self.n_head,
            self.capacity,
            self.head_dim,
        )
        if kind == "int8":
            return (L, B, H, C, D), jnp.int8
        return (L, B, H, C, D // 2), jnp.uint8

    def _scale_shape(self):
        if self.granularity == "per_token":
            return (self.n_layer, self.capacity)
        return (self.n_layer, self.n_head, self.capacity)

    def _k_kind(self) -> str:
        return "int8" if self.mode in ("int8", "mixed") else "int4"

    def _v_kind(self) -> str:
        return "int8" if self.mode == "int8" else "int4"

    def init(self) -> dict:
        k_shape, k_dt = self._store_shape(self._k_kind())
        v_shape, v_dt = self._store_shape(self._v_kind())
        return {
            "k": jnp.zeros(k_shape, k_dt),
            "v": jnp.zeros(v_shape, v_dt),
            "k_scale": jnp.ones(self._scale_shape(), jnp.float32),
            "v_scale": jnp.ones(self._scale_shape(), jnp.float32),
            "length": jnp.zeros((), jnp.int32),
        }

    def cache_layer_slices(self, cache: dict):
        return (cache["k"], cache["v"], cache["k_scale"], cache["v_scale"])

    def cache_with_layer_slices(self, cache: dict, new_slices, T: int) -> dict:
        k, v, ks, vs = new_slices
        return {
            "k": k,
            "v": v,
            "k_scale": ks,
            "v_scale": vs,
            "length": cache["length"],
        }

    def set_length(self, cache: dict, length) -> dict:
        return {**cache, "length": jnp.asarray(length, jnp.int32)}

    # -- quantize one block of new tokens -----------------------------------
    def _scale_axes(self):
        # x_new is [B, H, T, D]; per_token reduces over (B, H, D) per token,
        # reproducing the reference's per-[B,H,1,D]-tensor max
        # (/root/reference/src/quantization/ops.py:26-28); per_head keeps H.
        return (0, 1, 3) if self.granularity == "per_token" else (0, 3)

    def _quantize_block(self, x: jax.Array, kind: str):
        if kind == "int8":
            return quantize_int8(x, axes=self._scale_axes(), eps=self.eps)
        return quantize_int4_packed(x, axes=self._scale_axes(), eps=self.eps)

    def _dequant_buf(self, buf, scale_l, kind: str):
        # scale_l: [C] (per_token) or [H, C] (per_head) -> broadcast [1,.,C,1]
        if self.granularity == "per_token":
            s = scale_l[None, None, :, None]
        else:
            s = scale_l[None, :, :, None]
        if kind == "int8":
            return dequantize_int8(buf, s, self.dtype)
        return dequantize_int4_packed(buf, s, self.dtype)

    def layer_attend(self, layer_cache, cache, q, k_new, v_new, seq_mask):
        k_l, v_l, ks_l, vs_l = layer_cache
        length = cache["length"]

        # Quantize the new block (per-token scales) and store.
        kq, k_scale = self._quantize_block(k_new, self._k_kind())
        vq, v_scale = self._quantize_block(v_new, self._v_kind())
        k_l = jax.lax.dynamic_update_slice(k_l, kq, (0, 0, length, 0))
        v_l = jax.lax.dynamic_update_slice(v_l, vq, (0, 0, length, 0))
        if self.granularity == "per_token":
            ks_l = jax.lax.dynamic_update_slice(ks_l, k_scale, (length,))
            vs_l = jax.lax.dynamic_update_slice(vs_l, v_scale, (length,))
        else:
            ks_l = jax.lax.dynamic_update_slice(ks_l, k_scale, (0, length))
            vs_l = jax.lax.dynamic_update_slice(vs_l, v_scale, (0, length))

        # Fused decode path: one Pallas kernel reads the quantized buffers
        # directly (no dequantized materialization) and merges the fp
        # current token into the same online softmax. Works for any batch
        # (grid is (B, Hkv)); T>1 prefill takes the reference-numerics path.
        T = q.shape[2]
        if self.fused and T == 1:
            from ..ops.pallas.attention import fused_quant_attention_batched

            B, H, C = self.batch, self.n_head, self.capacity
            if self.granularity == "per_token":
                ks2 = jnp.broadcast_to(ks_l[None, None, :], (B, H, C))
                vs2 = jnp.broadcast_to(vs_l[None, None, :], (B, H, C))
            else:
                ks2 = jnp.broadcast_to(ks_l[None], (B, H, C))
                vs2 = jnp.broadcast_to(vs_l[None], (B, H, C))
            out = fused_quant_attention_batched(
                q[:, :, 0],  # [B, Hq, D]
                k_l,
                ks2,
                v_l,
                vs2,
                k_new,  # [B, H, 1, D]
                v_new,
                jnp.broadcast_to(length, (B,)),
                jnp.int32(1),
                k_bits=self._bits(self._k_kind()),
                v_bits=self._bits(self._v_kind()),
                interpret=self._interpret,
            )
            return out[:, :, None, :], (k_l, v_l, ks_l, vs_l)

        # Reference-numerics path: dequantize the whole buffer, then overlay
        # the current block in fp (reference keeps the in-flight token
        # full-precision, benchmarker.py:473-477).
        k_fp = self._dequant_buf(k_l, ks_l, self._k_kind())
        v_fp = self._dequant_buf(v_l, vs_l, self._v_kind())
        k_fp = jax.lax.dynamic_update_slice(
            k_fp, k_new.astype(k_fp.dtype), (0, 0, length, 0)
        )
        v_fp = jax.lax.dynamic_update_slice(
            v_fp, v_new.astype(v_fp.dtype), (0, 0, length, 0)
        )
        out = _attend(q, k_fp, v_fp, length)
        return out, (k_l, v_l, ks_l, vs_l)

    # -- accounting (matches ops.py:271-290 semantics: stored tokens only) ---
    def est_bytes(self, length: int) -> float:
        B, H, D, L = self.batch, self.n_head, self.head_dim, self.n_layer
        per_tok_store = {"int8": B * H * D, "int4": B * H * (D // 2)}
        n_scales = 1 if self.granularity == "per_token" else H
        # scales live in float32 buffers (init() uses jnp.float32), so count
        # them at 4 bytes regardless of the compute dtype
        scale_bytes = n_scales * jnp.dtype(jnp.float32).itemsize
        k_b = per_tok_store[self._k_kind()] + scale_bytes
        v_b = per_tok_store[self._v_kind()] + scale_bytes
        return float(L * length * (k_b + v_b))


@dataclasses.dataclass(frozen=True)
class RingKV:
    """Ring-buffer sliding-window cache: trim-free O(1) eviction.

    Re-applying the reference's sliding-window trim every step
    (implementations.py:124-140) is equivalent to a ring buffer of size W:
    the token written at absolute position t lives in slot t % W, and once
    full every write overwrites the oldest entry. Attention is order-
    invariant over key slots (positions are baked into K before caching for
    both learned-position and rotary models), so no compaction or sort is
    ever needed — the per-step masked-sort gather of the generic trim path
    disappears.

    `length` holds the ABSOLUTE token count; the reference's position quirk
    (next position = trimmed cache length) is exposed via `position()`,
    which saturates at W.
    """

    n_layer: int
    n_head: int
    head_dim: int
    window: int
    batch: int = 1
    dtype: Any = jnp.float32

    @property
    def capacity(self) -> int:
        return self.window

    def init(self) -> dict:
        shape = (self.n_layer, self.batch, self.n_head, self.window, self.head_dim)
        return {
            "k": jnp.zeros(shape, self.dtype),
            "v": jnp.zeros(shape, self.dtype),
            "length": jnp.zeros((), jnp.int32),  # absolute count
        }

    def cache_layer_slices(self, cache: dict):
        return (cache["k"], cache["v"])

    def cache_with_layer_slices(self, cache: dict, new_slices, T: int) -> dict:
        k, v = new_slices
        return {"k": k, "v": v, "length": cache["length"]}

    def set_length(self, cache: dict, length) -> dict:
        return {**cache, "length": jnp.asarray(length, jnp.int32)}

    def position(self, cache: dict) -> jax.Array:
        """Reference position quirk: trimmed length, saturating at W."""
        return jnp.minimum(cache["length"], self.window)

    def layer_attend(self, layer_cache, cache, q, k_new, v_new, seq_mask):
        k_l, v_l = layer_cache
        length = cache["length"]  # absolute count before this block
        B, H, T, D = q.shape
        W = self.window

        if T == 1:
            # decode: write at slot length % W, then attend all valid slots
            slot = length % W
            k_l = jax.lax.dynamic_update_slice(
                k_l, k_new.astype(k_l.dtype), (0, 0, slot, 0)
            )
            v_l = jax.lax.dynamic_update_slice(
                v_l, v_new.astype(v_l.dtype), (0, 0, slot, 0)
            )
            n_valid = jnp.minimum(length + 1, W)
            scale = 1.0 / jnp.sqrt(jnp.float32(D))
            Hkv = k_l.shape[1]
            G = H // Hkv
            qg = q.reshape(B, Hkv, G, T, D)
            s = jnp.einsum(
                "bkgtd,bkcd->bkgtc", qg, k_l, preferred_element_type=jnp.float32
            ) * scale
            col = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1)
            s = jnp.where(col[None, None, None] < n_valid, s, NEG_INF)
            p = jax.nn.softmax(s, axis=-1)
            out = jnp.einsum(
                "bkgtc,bkcd->bkgtd", p, v_l, preferred_element_type=jnp.float32
            )
            return out.reshape(B, H, T, D), (k_l, v_l)

        # prefill: dense causal attention over the block itself; ring-write
        # every token at slot t % W (wrap-around leaves exactly the last W)
        out = _attend(q, k_new, v_new, jnp.zeros((), jnp.int32))
        t_idx = jnp.arange(T, dtype=jnp.int32)
        if seq_mask is not None:
            true_len = jnp.sum(seq_mask[0].astype(jnp.int32))
        else:
            true_len = jnp.asarray(T, jnp.int32)
        # only the last W real tokens survive the window, and writing ONLY
        # those makes every slot a single-writer scatter (duplicate-index
        # scatter order is unspecified in XLA)
        keep = (t_idx < true_len) & (t_idx >= true_len - W)
        slots = jnp.where(keep, t_idx % W, W)  # W = drop sentinel
        k_l = k_l.at[:, :, slots, :].set(k_new.astype(k_l.dtype), mode="drop")
        v_l = v_l.at[:, :, slots, :].set(v_new.astype(v_l.dtype), mode="drop")
        return out, (k_l, v_l)

    def est_bytes(self, length: int) -> float:
        per_tok = self.batch * self.n_head * self.head_dim
        itemsize = jnp.dtype(self.dtype).itemsize
        return 2.0 * self.n_layer * min(length, self.window) * per_tok * itemsize


@dataclasses.dataclass(frozen=True)
class NoCacheKV:
    """Cache-free strategy: causal attention within the forward block only.

    Used by the no_cache baseline (reference benchmarker.py:63-100), which
    re-feeds the whole sequence every step with use_cache=False.
    """

    n_layer: int
    n_head: int
    head_dim: int
    batch: int = 1
    dtype: Any = jnp.float32

    def init(self) -> dict:
        return {"length": jnp.zeros((), jnp.int32)}

    def cache_layer_slices(self, cache: dict):
        return jnp.zeros((self.n_layer,), jnp.int32)  # dummy scan xs

    def cache_with_layer_slices(self, cache: dict, new_slices, T: int) -> dict:
        return cache

    def set_length(self, cache: dict, length) -> dict:
        return {**cache, "length": jnp.asarray(length, jnp.int32)}

    def layer_attend(self, layer_cache, cache, q, k_new, v_new, seq_mask):
        out = _attend(q, k_new, v_new, jnp.zeros((), jnp.int32))
        return out, layer_cache

    def est_bytes(self, length: int) -> float:
        return 0.0


@dataclasses.dataclass(frozen=True)
class PagedKV:
    """Paged KV cache with block-granular allocation accounting.

    The storage is a static pool of `max_blocks` blocks per layer; a block
    table maps logical block index -> pool slot. For the single-sequence
    engine the table is identity, but allocation is still block-granular:
    `allocated_bytes` counts ceil(len/block)·block tokens (slack included)
    and `used_bytes` counts len tokens, matching
    /root/reference/src/cache/implementations.py:108-121. The Pallas paged
    attention kernel (ops/pallas/paged.py) consumes the same layout with a
    real scatter-gather table for continuous batching.
    """

    n_layer: int
    n_head: int
    head_dim: int
    block_size: int
    max_blocks: int
    batch: int = 1
    dtype: Any = jnp.float32

    @property
    def capacity(self) -> int:
        return self.block_size * self.max_blocks

    def init(self) -> dict:
        L, B, H, D = self.n_layer, self.batch, self.n_head, self.head_dim
        shape = (L, B, H, self.max_blocks * self.block_size, D)
        return {
            "k": jnp.zeros(shape, self.dtype),
            "v": jnp.zeros(shape, self.dtype),
            # logical block -> pool slot (identity for single sequence)
            "block_table": jnp.arange(self.max_blocks, dtype=jnp.int32),
            "length": jnp.zeros((), jnp.int32),
        }

    def cache_layer_slices(self, cache: dict):
        return (cache["k"], cache["v"])

    def cache_with_layer_slices(self, cache: dict, new_slices, T: int) -> dict:
        k, v = new_slices
        return {**cache, "k": k, "v": v}

    def set_length(self, cache: dict, length) -> dict:
        return {**cache, "length": jnp.asarray(length, jnp.int32)}

    def layer_attend(self, layer_cache, cache, q, k_new, v_new, seq_mask):
        k_l, v_l = layer_cache
        length = cache["length"]
        k_l = jax.lax.dynamic_update_slice(
            k_l, k_new.astype(k_l.dtype), (0, 0, length, 0)
        )
        v_l = jax.lax.dynamic_update_slice(
            v_l, v_new.astype(v_l.dtype), (0, 0, length, 0)
        )
        out = _attend(q, k_l, v_l, length)
        return out, (k_l, v_l)

    def num_blocks(self, length: int) -> int:
        return -(-int(length) // self.block_size)

    def allocated_bytes(self, length: int) -> float:
        per_tok = 2 * self.batch * self.n_head * self.head_dim
        itemsize = jnp.dtype(self.dtype).itemsize
        return (
            float(self.n_layer)
            * self.num_blocks(length)
            * self.block_size
            * per_tok
            * itemsize
        )

    def used_bytes(self, length: int) -> float:
        per_tok = 2 * self.batch * self.n_head * self.head_dim
        itemsize = jnp.dtype(self.dtype).itemsize
        return float(self.n_layer) * int(length) * per_tok * itemsize
