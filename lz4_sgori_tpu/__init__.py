"""lz4_sgori_tpu — a TPU-native LZ4 block codec framework.

Built from scratch in JAX/XLA/Pallas with the capabilities of the reference
project tllvvv/lz4-sgori (a Linux-kernel LZ4 over scatter-gather buffers plus
a verifying proxy block device). See SURVEY.md for the layer map.

Public API (the analog of lz4e.h's LZ4E_compress_default /
LZ4E_decompress_safe plus the lz4e_bdev admin surface):

- ``format``: block-format constants (COMPRESSBOUND, window, token layout)
- ``golden``: scalar oracle codec (pure Python)
- ``compress_blocks`` / ``decompress_blocks``: batched device codecs
- ``ChunkStore``: the block-device analog (map/unmap/read/write/stats)
"""

from . import format  # noqa: F401
from . import golden  # noqa: F401

__version__ = "0.1.0"

__all__ = ["format", "golden", "__version__"]
