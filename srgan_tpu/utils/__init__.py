from srgan_tpu.utils.seeding import seed_all
from srgan_tpu.utils.scientific import clean_scientific_notation
from srgan_tpu.utils.mixture import MixtureModel
from srgan_tpu.utils.summary import SummaryWriter

__all__ = ["seed_all", "clean_scientific_notation", "MixtureModel",
           "SummaryWriter"]
