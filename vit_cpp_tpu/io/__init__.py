from vit_cpp_tpu.io.image import load_image_rgb  # noqa: F401
