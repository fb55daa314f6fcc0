"""Checkpoint save/restore round-trip (orbax or npz fallback)."""

import pathlib
import tempfile

import numpy as np

import jax
import jax.numpy as jnp

from efficient_llm_inference_tpu.models import gpt2 as gpt2_mod
from efficient_llm_inference_tpu.utils.checkpoint import load_params, save_params


def test_roundtrip():
    cfg = gpt2_mod.GPT2Config.tiny()
    params = gpt2_mod.init_gpt2_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    with tempfile.TemporaryDirectory() as td:
        path = save_params(params, str(pathlib.Path(td) / "ck"))
        restored = load_params(path, like=params)
        for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(restored)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
