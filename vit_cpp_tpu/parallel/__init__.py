from vit_cpp_tpu.parallel.mesh import make_mesh  # noqa: F401
from vit_cpp_tpu.parallel.sharding import batch_pspec, param_pspecs, shard_params  # noqa: F401
