from .gpt2 import GPT2Config, gpt2_forward, init_gpt2_params, params_from_hf_state_dict  # noqa: F401
from .registry import ModelSpec, gpt2_spec, spec_by_name  # noqa: F401
