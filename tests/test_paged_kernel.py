"""Paged attention kernel vs jnp gather reference (interpret mode)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from efficient_llm_inference_tpu.ops.pallas.paged import paged_attention_decode


def _reference(q, k_pool, v_pool, tables, lengths):
    B, Hq, D = q.shape
    Hkv, n_blocks, bs, _ = k_pool.shape
    G = Hq // Hkv
    max_blocks = tables.shape[1]
    Tcap = max_blocks * bs
    t_c = np.minimum(np.asarray(tables), n_blocks - 1)
    k = np.asarray(k_pool)[:, t_c]  # [Hkv, B, max_blocks, bs, D]
    v = np.asarray(v_pool)[:, t_c]
    k = k.reshape(Hkv, B, Tcap, D).transpose(1, 0, 2, 3)
    v = v.reshape(Hkv, B, Tcap, D).transpose(1, 0, 2, 3)
    qg = np.asarray(q, np.float32).reshape(B, Hkv, G, D)
    s = np.einsum("bhgd,bhcd->bhgc", qg, k.astype(np.float32)) / np.sqrt(D)
    pos = np.arange(Tcap)[None, None, None, :]
    # exclusive convention: p < lengths[b] (matches every mask in the repo)
    s = np.where(pos < np.asarray(lengths)[:, None, None, None], s, -1e30)
    s = s - s.max(-1, keepdims=True)
    p = np.exp(s)
    p /= p.sum(-1, keepdims=True)
    out = np.einsum("bhgc,bhcd->bhgd", p, v.astype(np.float32))
    return out.reshape(B, Hq, D)


@pytest.mark.parametrize("Hq,Hkv", [(4, 4), (8, 2)])
def test_paged_attention_matches_reference(Hq, Hkv):
    rng = np.random.default_rng(0)
    B, D, bs, n_blocks, max_blocks = 3, 64, 16, 10, 4
    q = jnp.asarray(rng.normal(size=(B, Hq, D)).astype(np.float32))
    k_pool = jnp.asarray(rng.normal(size=(Hkv, n_blocks, bs, D)).astype(np.float32))
    v_pool = jnp.asarray(rng.normal(size=(Hkv, n_blocks, bs, D)).astype(np.float32))
    # distinct random tables per slot; unused entries sentinel
    tables = np.full((B, max_blocks), n_blocks, np.int32)
    perm = rng.permutation(n_blocks)
    tables[0, :3] = perm[:3]
    tables[1, :4] = perm[3:7]
    tables[2, :2] = perm[7:9]
    lengths = jnp.asarray([37, 60, 20], jnp.int32)

    got = paged_attention_decode(
        q, k_pool, v_pool, jnp.asarray(tables), lengths, interpret=True
    )
    ref = _reference(q, k_pool, v_pool, tables, lengths)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-5, atol=2e-5)
