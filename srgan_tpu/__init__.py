"""srgan_tpu — a TPU-native semi-supervised regression GAN (SR-GAN) framework.

A ground-up JAX/XLA/Pallas re-design with the capabilities of the PyTorch
reference ``golmschenk/sr-gan`` (see SURVEY.md): the three-stream SR-GAN
discriminator objective (labeled regression loss, unlabeled feature-matching
loss, fake feature-contrasting loss, WGAN-style gradient penalty) and the
DCGAN-style generator compile into ONE fused ``jax.jit`` training step,
data-parallel over a ``jax.sharding.Mesh``; crowd-counting preprocessing
(Gaussian density-map rendering, patch extraction, normalization) runs as
Pallas TPU kernels.

Public surface mirrors the reference (SURVEY.md §1): construct a
:class:`~srgan_tpu.settings.Settings`, construct an application experiment
(e.g. :class:`~srgan_tpu.apps.coefficient.CoefficientExperiment`), call
``.train()``.
"""

from srgan_tpu.settings import Settings
from srgan_tpu.experiment import Experiment

__version__ = "0.1.0"

__all__ = ["Settings", "Experiment", "__version__"]
