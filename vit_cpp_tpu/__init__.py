"""vit_cpp_tpu — a TPU-native Vision Transformer inference engine.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
``staghado/vit.cpp`` (reference layout documented in /root/repo/SURVEY.md):

- ``gguf``   — the legacy-ggml model file format (reader/writer), the on-disk
               contract with timm-converted checkpoints
               (reference: convert-pth-to-ggml.py, vit.cpp:308-712).
- ``quant``  — ggml block-quantization codecs Q4_0/Q4_1/Q5_0/Q5_1/Q8_0
               (reference: quantize.cpp).
- ``models`` — the functional ViT / ViTSTR forward passes as pure jittable
               functions over frozen parameter pytrees
               (reference: vit_encode_image, vit.cpp:718-941).
- ``ops``    — device kernels: fused preprocessing, attention, layernorm and
               dequantizing matmuls (jnp reference paths + Pallas TPU kernels).
- ``parallel`` — jax.sharding meshes and partition specs for data/tensor
               parallel serving and training.
- ``io``     — host-side image decode (PIL fallback + native C++ decoder).
- ``cli``    — `vit`, `quantize`, converter and benchmark tools with the same
               flag surface and console output as the reference
               (reference: main.cpp, quantize.cpp, tests/benchmark.cpp).

The reference engine's graph-builder/allocator/threadpool machinery
(vit.cpp:95-106, 1004-1036) has no analogue here: a pure function under
``jax.jit`` replaces the entire graph construction + two-pass memory planning
+ executor stack.
"""

__version__ = "0.1.0"

from vit_cpp_tpu.hparams import VitHParams  # noqa: F401
