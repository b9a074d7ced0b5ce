from v2ce_toolbox_tpu.models.v2ce3d import V2ce3d  # noqa: F401
from v2ce_toolbox_tpu.models.unet3d import UNet3D  # noqa: F401
from v2ce_toolbox_tpu.models.unet2d import UNet2D  # noqa: F401
from v2ce_toolbox_tpu.models.unet_plain import UNetPlain3D  # noqa: F401
from v2ce_toolbox_tpu.models.resnet import ResNet, ResNetDiscriminator  # noqa: F401
from v2ce_toolbox_tpu.models.fastflownet import FastFlowNet, OpticalFlowCalculator  # noqa: F401
