from srgan_tpu.models.mlp import CoefficientGenerator, CoefficientMLP
from srgan_tpu.models.dcgan import DCGANGenerator, ConvRegressor
from srgan_tpu.models.crowd import (CROWD_MODELS, CrowdDCGenerator,
                                    JointCNN, JointDCNN, SpatialPyramidCNN)

__all__ = [
    "CoefficientGenerator", "CoefficientMLP",
    "DCGANGenerator", "ConvRegressor",
    "JointCNN", "JointDCNN", "SpatialPyramidCNN", "CROWD_MODELS",
    "CrowdDCGenerator",
]
