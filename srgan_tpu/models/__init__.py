from srgan_tpu.models.mlp import CoefficientGenerator, CoefficientMLP
from srgan_tpu.models.dcgan import DCGANGenerator, ConvRegressor
from srgan_tpu.models.crowd import JointCNN, CrowdDCGenerator

__all__ = [
    "CoefficientGenerator", "CoefficientMLP",
    "DCGANGenerator", "ConvRegressor",
    "JointCNN", "CrowdDCGenerator",
]
