from srgan_tpu.data.core import (
    ArrayDataset, epoch_batches, cycling_batches, prefetch_to_device,
)

__all__ = ["ArrayDataset", "epoch_batches", "cycling_batches",
           "prefetch_to_device"]
