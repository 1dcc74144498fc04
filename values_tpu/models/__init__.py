from .unet3d import UNet3D, ConvBlock, ConvTransposeK2S2, instance_norm

__all__ = ["UNet3D", "ConvBlock", "ConvTransposeK2S2", "instance_norm"]
