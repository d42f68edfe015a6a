"""Model zoo. Importing this package registers every model (reference
satflow/models/__init__.py:1-7 behavior: registry populated at import time)."""

from satflow_tpu.core.registry import (  # noqa: F401
    create_model,
    get_model,
    list_models,
    register_model,
)
from satflow_tpu.models.base import BaseModel  # noqa: F401
from satflow_tpu.models.conv_lstm import ConvLSTMCore, EncoderDecoderConvLSTM  # noqa: F401
from satflow_tpu.models.cloudgan import CloudGAN  # noqa: F401
from satflow_tpu.models.dgmr import DGMRGenerator, NowcastingGAN  # noqa: F401
from satflow_tpu.models.hf_perceiver import HuggingFacePerceiver  # noqa: F401
from satflow_tpu.models.metnet import LitMetNet, MetNetCore  # noqa: F401
from satflow_tpu.models.pix2pix import Pix2Pix  # noqa: F401
from satflow_tpu.models.perceiver import Perceiver, PerceiverSatFlowCore  # noqa: F401
from satflow_tpu.models.pixel_cnn import PixelCNN  # noqa: F401
from satflow_tpu.models.segmentation import FCN, DeeplabV3  # noqa: F401
from satflow_tpu.models.unet_family import (  # noqa: F401
    AttentionRUnet,
    AttentionUnet,
    RUnet,
    Unet,
)
