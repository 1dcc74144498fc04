from .unet3d import UNet3D, ConvBlock, ConvTransposeK2S2, instance_norm
from .ssn_unet3d import SsnUNet3D, LowRankMVN
from .hrnet import HighResolutionNet, get_seg_model
from .ensemble_unet3d import (EnsembleUNet3D, group_member_variables,
                              make_grouped_ensemble_predictor,
                              make_grouped_tta_predictor)

__all__ = ["UNet3D", "ConvBlock", "ConvTransposeK2S2", "instance_norm",
           "SsnUNet3D", "LowRankMVN", "HighResolutionNet", "get_seg_model",
           "EnsembleUNet3D", "group_member_variables",
           "make_grouped_ensemble_predictor", "make_grouped_tta_predictor"]
