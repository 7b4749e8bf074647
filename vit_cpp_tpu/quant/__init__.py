from vit_cpp_tpu.quant.blocks import (  # noqa: F401
    dequantize,
    quantize,
    quantize_with_hist,
    unpack_soa,
)
from vit_cpp_tpu.quant.qlinear import QuantLinear  # noqa: F401
