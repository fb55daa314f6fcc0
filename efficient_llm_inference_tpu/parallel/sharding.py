"""PartitionSpec rules: tensor-parallel weights + sharded KV caches.

Megatron-style TP over the "model" axis, batch over "data":

* attention QKV / MLP up projections: column-parallel (output dim sharded);
* attention output / MLP down projections: row-parallel (input dim sharded)
  — XLA inserts the psum after each row-parallel matmul;
* KV cache [L, B, H, C, D]: heads sharded over "model", batch over "data" —
  the cache lives distributed and attention is local per shard (heads are
  independent), so decode needs no KV collectives at all;
* embeddings/layernorms replicated (small next to the matmul weights).
"""

from __future__ import annotations

from jax.sharding import PartitionSpec as P


def gpt2_param_specs() -> dict:
    """Spec pytree matching models/gpt2.py param layout ([L, in, out])."""
    return {
        "wte": P(None, None),
        "wpe": P(None, None),
        "blocks": {
            "ln1_g": P(None, None),
            "ln1_b": P(None, None),
            "attn_w": P(None, None, "model"),  # column-parallel QKV
            "attn_b": P(None, "model"),
            "attn_proj_w": P(None, "model", None),  # row-parallel
            "attn_proj_b": P(None, None),
            "ln2_g": P(None, None),
            "ln2_b": P(None, None),
            "fc_w": P(None, None, "model"),
            "fc_b": P(None, "model"),
            "fc_proj_w": P(None, "model", None),
            "fc_proj_b": P(None, None),
        },
        "lnf_g": P(None),
        "lnf_b": P(None),
    }


def llama_param_specs(tie_embeddings: bool = False) -> dict:
    specs = {
        "embed": P(None, None),
        "blocks": {
            "ln1": P(None, None),
            "wq": P(None, None, "model"),
            "wk": P(None, None, "model"),
            "wv": P(None, None, "model"),
            "wo": P(None, "model", None),
            "ln2": P(None, None),
            "w_gate": P(None, None, "model"),
            "w_up": P(None, None, "model"),
            "w_down": P(None, "model", None),
        },
        "ln_f": P(None),
    }
    if not tie_embeddings:
        specs["lm_head"] = P(None, None)
    return specs


def param_specs_for(model_name: str, model_config=None) -> dict:
    if model_name.startswith("gpt2"):
        return gpt2_param_specs()
    tie = bool(getattr(model_config, "tie_embeddings", False))
    return llama_param_specs(tie)


def cache_spec() -> P:
    """KV buffers [L, B, H, C, D]: batch over data, heads over model."""
    return P(None, "data", "model", None, None)


def token_spec() -> P:
    """Token batches [B, T]: batch over data."""
    return P("data", None)
