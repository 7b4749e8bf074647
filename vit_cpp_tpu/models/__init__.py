from vit_cpp_tpu.models.params import QuantLinear, load_params, params_from_state_dict  # noqa: F401
from vit_cpp_tpu.models.vit import forward, predict_probs  # noqa: F401
