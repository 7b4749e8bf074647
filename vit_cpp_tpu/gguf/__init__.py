from vit_cpp_tpu.gguf.dtypes import GGMLDType  # noqa: F401
from vit_cpp_tpu.gguf.reader import ModelFile, TensorRecord, read_model  # noqa: F401
from vit_cpp_tpu.gguf.writer import write_model  # noqa: F401
