from srgan_tpu.io.native import (NativeDatasetReader, NativePrefetcher,
                                 native_library_available)

__all__ = ["NativeDatasetReader", "NativePrefetcher",
           "native_library_available"]
