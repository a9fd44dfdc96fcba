"""himg_tpu: a TPU-native implementation of the HIMG image codec.

A from-scratch JAX/XLA/Pallas rebuild with the capabilities of the
reference C++ codec (mbitsnbites/himg): 8x8 integer Walsh-Hadamard
transform, shift-only quantization with nonlinear 16<->8-bit companding, a
predictively-coded low-resolution base layer, custom Huffman + zero-RLE
entropy coding, and a RIFF/HIMG container -- bitstream-compatible with the
reference chimg/dhimg tools.

Public API:
    encode(image, quality=50, use_ycbcr=True) -> bytes
    decode(data) -> np.ndarray [H, W, C] uint8
"""

from .pipeline.encode import encode
from .pipeline.decode import decode
from .format.container import FormatError

__all__ = ["encode", "decode", "FormatError"]
__version__ = "0.1.0"
