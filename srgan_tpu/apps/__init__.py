from srgan_tpu.apps.coefficient import CoefficientExperiment

__all__ = ["CoefficientExperiment"]
