# Native host-side components (C++). `decoder` is importable once the shared
# library has been built via vit_cpp_tpu/native/build.sh; Python falls back to
# PIL when absent (vit_cpp_tpu/io/image.py).
