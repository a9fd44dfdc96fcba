"""chimg: HIMG encoder CLI (drop-in for the reference tool).

Usage: chimg [options] image outfile
Options:
  -q <quality> Set the quality (0-100)        (chimg.cpp:74-77)
  -rgb         Use RGB color space (instead of YCbCr)

Produces byte-identical .himg files to the reference chimg on the same
input image: the reference feeds FreeImage's raw bitmap memory to the
encoder, which on little-endian hosts means *bottom-up scanlines in BGR
channel order* (chimg.cpp:140-152; FreeImage_GetBits layout), so this tool
applies the same layout before encoding.
"""

from __future__ import annotations

import sys

import numpy as np


def load_image(path: str):
    """Load any PIL-supported format with the reference's channel policy:
    grayscale -> 1ch, images with alpha -> 4ch, everything else -> 3ch
    (chimg.cpp:120-133)."""
    from PIL import Image
    im = Image.open(path)
    if im.mode in ("1", "L", "I", "I;16", "F"):
        return np.asarray(im.convert("L"), dtype=np.uint8)[..., None]
    if "A" in im.getbands() or im.mode in ("RGBA", "LA", "PA"):
        return np.asarray(im.convert("RGBA"), dtype=np.uint8)
    return np.asarray(im.convert("RGB"), dtype=np.uint8)


def to_freeimage_layout(img: np.ndarray) -> np.ndarray:
    """Bottom-up scanlines, BGR(A) channel order (little-endian FreeImage)."""
    img = img[::-1]
    if img.shape[-1] >= 3:
        img = np.concatenate([img[..., [2, 1, 0]], img[..., 3:]], axis=-1)
    return np.ascontiguousarray(img)


def main(argv=None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    quality = 50
    use_ycbcr = True
    files = []
    it = iter(range(len(argv)))
    k = 0
    ok = True
    while k < len(argv):
        arg = argv[k]
        if arg.startswith("-"):
            if arg == "-rgb":
                use_ycbcr = False
            elif arg == "-q" and k + 1 < len(argv):
                try:
                    quality = int(argv[k + 1])
                except ValueError:
                    print(f"Invalid integer expression: {argv[k + 1]}")
                    ok = False
                k += 1
                if not 0 <= quality <= 100:
                    print(f"Invalid quality level: {quality}")
                    ok = False
            else:
                print(f"Invalid option: {arg}")
                ok = False
        else:
            files.append(arg)
        k += 1
    if not ok or len(files) != 2:
        print("Usage: chimg [options] image outfile")
        print("Options:")
        print(" -q <quality> Set the quality (0-100)")
        print(" -rgb         Use RGB color space (instead of YCbCr)")
        return 0

    import himg_tpu
    img = to_freeimage_layout(load_image(files[0]))
    data = himg_tpu.encode(img, quality, use_ycbcr)

    # Reference prints the LRES/FRES byte sizes (encoder.cpp:219,334);
    # recover them from the container for output parity.
    from ..format.container import RIFFReader
    r = RIFFReader(data)
    for c in ["FRMT", "LMAP"]:
        r.find_chunk(c)
    print(f"Low resolution data: {len(r.find_chunk('LRES'))} bytes.")
    for c in ["QCFG", "FMAP"]:
        r.find_chunk(c)
    print(f"Full resolution data: {len(r.find_chunk('FRES'))} bytes.")
    print(f"Compressed size: {len(data)}")

    with open(files[1], "wb") as f:
        f.write(data)
    return 0


if __name__ == "__main__":
    sys.exit(main())
