from vit_cpp_tpu.ops.core import attention, gelu_tanh, layernorm, linear  # noqa: F401
