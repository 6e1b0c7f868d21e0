from srgan_tpu.apps.coefficient import CoefficientExperiment
from srgan_tpu.apps.crowd import CrowdExperiment
from srgan_tpu.apps.age import AgeExperiment
from srgan_tpu.apps.driving import DrivingExperiment

__all__ = ["CoefficientExperiment", "CrowdExperiment", "AgeExperiment",
           "DrivingExperiment"]
