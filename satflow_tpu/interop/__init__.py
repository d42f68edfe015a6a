"""Cross-ecosystem checkpoint interop (torch state_dicts -> flax params)."""

from satflow_tpu.interop.torch_weights import (  # noqa: F401
    conv3d_kernel,
    conv_kernel,
    linear_kernel,
    load_torch_convlstm,
    load_torch_perceiver,
    load_torch_state_dict,
)
