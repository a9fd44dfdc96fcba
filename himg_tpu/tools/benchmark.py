"""benchmark: timing harness (reference-compatible, encode mode implemented).

Usage: benchmark [-d][-e] image      (benchmark.cpp:50-54)
  -d Decode (default)
  -e Encode        (a TODO stub in the reference, benchmark.cpp:137-139)

Protocol: 30 iterations, wall-clock min/max/average in ms
(benchmark.cpp:21,110-154).  HIMG inputs are detected by the RIFF magic;
other formats are decoded through PIL for cross-codec comparison (the
reference uses FreeImage there).
"""

from __future__ import annotations

import io
import sys
import time

NUM_ITERATIONS = 30


def is_himg(buf: bytes) -> bool:
    return (len(buf) >= 12 and buf[:4] == b"RIFF" and buf[8:12] == b"HIMG")


def main(argv=None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    mode = "decode"
    file_name = None
    for arg in argv:
        if arg == "-d":
            mode = "decode"
        elif arg == "-e":
            mode = "encode"
        elif file_name is None:
            file_name = arg
        else:
            file_name = None
            break
    if file_name is None:
        print("Usage: benchmark [-d][-e] image")
        print("  -d Decode (default)")
        print("  -e Encode")
        return 0

    with open(file_name, "rb") as f:
        buffer = f.read()
    print(f"File size: {len(buffer)}")

    import himg_tpu

    if mode == "encode":
        # Prepare pixel data once (I/O excluded, like the decode path).
        if is_himg(buffer):
            image = himg_tpu.decode(buffer)
        else:
            from .chimg import load_image, to_freeimage_layout
            image = to_freeimage_layout(load_image(file_name))
        himg_tpu.encode(image, 50, True)  # warm the compile cache
    elif is_himg(buffer):
        himg_tpu.decode(buffer)  # warm the compile cache

    min_dt = max_dt = -1.0
    total = 0.0
    for it in range(1, NUM_ITERATIONS + 1):
        print(f"Iteration {it}/{NUM_ITERATIONS}")
        t0 = time.perf_counter()
        if mode == "decode":
            if is_himg(buffer):
                himg_tpu.decode(buffer)
            else:
                from PIL import Image
                Image.open(io.BytesIO(buffer)).load()
        else:
            himg_tpu.encode(image, 50, True)
        dt = (time.perf_counter() - t0) * 1000.0
        min_dt = dt if min_dt < 0 or dt < min_dt else min_dt
        max_dt = dt if max_dt < 0 or dt > max_dt else max_dt
        total += dt

    print(f"    Min: {min_dt:g} ms")
    print(f"    Max: {max_dt:g} ms")
    print(f"Average: {total / NUM_ITERATIONS:g} ms")

    if mode == "decode" and is_himg(buffer):
        # Cross-codec row: libjpeg decode of the same image at a matched
        # file size (the comparison the reference benchmark stubs out at
        # benchmark.cpp:126-136 with its libjpeg-turbo TODO).
        from PIL import Image
        img = Image.fromarray(himg_tpu.decode(buffer).squeeze())
        lo, hi = 1, 95
        while lo < hi:
            mid = (lo + hi) // 2
            b = io.BytesIO()
            img.save(b, format="JPEG", quality=mid)
            if len(b.getvalue()) < len(buffer):
                lo = mid + 1
            else:
                hi = mid
        # Re-encode at the converged quality: the last probe inside the
        # loop can be one step below it (the lo = mid + 1 branch).
        b = io.BytesIO()
        img.save(b, format="JPEG", quality=lo)
        jbuf = b.getvalue()
        jt = 0.0
        for _ in range(NUM_ITERATIONS):
            t0 = time.perf_counter()
            Image.open(io.BytesIO(jbuf)).load()
            jt += (time.perf_counter() - t0) * 1000.0
        print(f"JPEG (size-matched, {len(jbuf)} bytes) "
              f"Average: {jt / NUM_ITERATIONS:g} ms")
    return 0


if __name__ == "__main__":
    sys.exit(main())
