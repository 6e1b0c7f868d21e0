from srgan_tpu.ops.density import (density_maps, density_maps_reference)
from srgan_tpu.ops.patches import (extract_patches, extract_patches_reference)

__all__ = ["density_maps", "density_maps_reference",
           "extract_patches", "extract_patches_reference"]
