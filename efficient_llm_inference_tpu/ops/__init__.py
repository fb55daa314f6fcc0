from .quantization import (  # noqa: F401
    dequantize_int4_packed,
    dequantize_int8,
    quantize_int4_packed,
    quantize_int8,
    unpack_int4,
)
