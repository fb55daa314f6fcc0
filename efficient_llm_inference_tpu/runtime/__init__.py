from .build import build_native, get_native_lib, native_lcs_len, native_ngram_overlap  # noqa: F401
