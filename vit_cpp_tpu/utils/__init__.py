from vit_cpp_tpu.utils.profiling import Timer, trace  # noqa: F401
