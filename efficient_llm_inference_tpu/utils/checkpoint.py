"""Parameter checkpointing: save/restore converted model weights.

The reference has no checkpointing at all — models are re-downloaded from
the HF hub every run (SURVEY.md §5). Here converted JAX param pytrees are
persisted with orbax (or a msgpack fallback) so multi-host runs restore
locally instead of re-converting/re-downloading.
"""

from __future__ import annotations

import pathlib
from typing import Optional

import jax
import numpy as np


def save_params(params, path: str) -> str:
    """Save a param pytree to `path` (orbax if available, else npz)."""
    p = pathlib.Path(path)
    try:
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        ckptr.save(p.absolute(), params, force=True)
        ckptr.wait_until_finished()
        return str(p)
    except Exception:
        flat, treedef = jax.tree.flatten(params)
        p.parent.mkdir(parents=True, exist_ok=True)
        np.savez(
            str(p) + ".npz",
            treedef=np.frombuffer(str(treedef).encode(), dtype=np.uint8),
            **{f"leaf_{i}": np.asarray(x) for i, x in enumerate(flat)},
        )
        return str(p) + ".npz"


def load_params(path: str, like=None):
    """Restore a param pytree saved by save_params.

    `like`: an abstract/concrete pytree with the target structure (required
    for orbax restore typing; optional for npz).
    """
    p = pathlib.Path(path)
    if p.suffix == ".npz" or pathlib.Path(str(p) + ".npz").exists():
        f = np.load(str(p) if p.suffix == ".npz" else str(p) + ".npz")
        leaves = [f[f"leaf_{i}"] for i in range(len(f.files) - 1)]
        if like is None:
            raise ValueError("npz restore requires `like` pytree for structure")
        _, treedef = jax.tree.flatten(like)
        return jax.tree.unflatten(treedef, leaves)
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    if like is not None:
        abstract = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), like
        )
        return ckptr.restore(p.absolute(), abstract)
    return ckptr.restore(p.absolute())


def convert_and_cache_hf(
    model_name: str,
    cache_dir: str = "~/.cache/elit_params",
    hf_path: Optional[str] = None,
):
    """Convert a HF checkpoint to our layout, caching the result on disk.

    `model_name` picks the model-family spec (models/registry.py);
    `hf_path` optionally points `from_pretrained` at a local directory (a
    `save_pretrained` output) instead of re-resolving `model_name` — the
    fully-offline path (no hub here; the reference's model-loading surface
    is /root/reference/examples/basic_benchmark.py:20-28 minus the hub).
    Works offline when the HF weights are already local; raises otherwise.
    """
    cache = pathlib.Path(cache_dir).expanduser() / model_name.replace("/", "_")
    from ..models import gpt2 as gpt2_mod
    from ..models import llama as llama_mod
    from ..models.registry import spec_by_name

    spec = spec_by_name(model_name)
    if cache.exists() or pathlib.Path(str(cache) + ".npz").exists():
        import jax.numpy as jnp

        key = jax.random.PRNGKey(0)
        if model_name.startswith("gpt2"):
            like = gpt2_mod.init_gpt2_params(key, spec.config, jnp.float32)
        else:
            like = llama_mod.init_llama_params(key, spec.config, jnp.float32)
        return load_params(str(cache), like), spec

    from transformers import AutoModelForCausalLM

    hf = AutoModelForCausalLM.from_pretrained(
        hf_path or model_name, local_files_only=True
    )
    if model_name.startswith("gpt2"):
        params = gpt2_mod.params_from_hf_state_dict(hf.state_dict(), spec.config)
    else:
        params = llama_mod.params_from_hf_state_dict(hf.state_dict(), spec.config)
    save_params(params, str(cache))
    return params, spec
