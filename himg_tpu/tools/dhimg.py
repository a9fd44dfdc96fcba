"""dhimg: HIMG decoder CLI (drop-in for the reference tool).

Usage: dhimg image outfile          (dhimg.cpp:19)

Decodes a .himg file and writes a PNG.  The pixel data inside reference-
produced files is in FreeImage raw layout (bottom-up scanlines, BGR
channel order -- see chimg.py), which the reference dhimg undoes via
FreeImage's mask/topdown arguments (dhimg.cpp:52-66); this tool applies
the same un-shuffle before saving.
"""

from __future__ import annotations

import sys

import numpy as np


def from_freeimage_layout(img: np.ndarray) -> np.ndarray:
    img = img[::-1]
    if img.shape[-1] >= 3:
        img = np.concatenate([img[..., [2, 1, 0]], img[..., 3:]], axis=-1)
    return np.ascontiguousarray(img)


def main(argv=None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    if len(argv) < 2:
        print("Usage: dhimg image outfile")
        return 0

    with open(argv[0], "rb") as f:
        data = f.read()
    print(f"File size: {len(data)}")

    import himg_tpu
    try:
        img = himg_tpu.decode(data)
    except himg_tpu.FormatError as e:
        print(f"Unable to decode image. ({e})")
        return -1

    from PIL import Image
    out = from_freeimage_layout(img)
    if out.shape[-1] == 1:
        pil = Image.fromarray(out[..., 0], "L")
    elif out.shape[-1] == 3:
        pil = Image.fromarray(out, "RGB")
    else:
        pil = Image.fromarray(out[..., :4], "RGBA")
    pil.save(argv[1], format="PNG")
    return 0


if __name__ == "__main__":
    sys.exit(main())
