"""Interleaved A/B harness for native entropy codec variants.

Host wall-clock on the bench box swings 2x between minute-scale steal
windows (CLAUDE.md), so back-to-back runs of two builds cannot be
compared; this interleaves them call-by-call and reports min-of-N per
build plus byte-identity, the protocol every round-3 native change was
adjudicated with.

    # build the candidate somewhere outside the tree:
    g++ -O3 -std=c++17 -shared -fPIC -march=native \
        -o /tmp/libcand.so <edited entropy.cpp> -lpthread
    # compare against the committed build on captured planes:
    python -m himg_tpu.tools.abnative /tmp/libcand.so [--planes F.npz]
    # measure decode instead of assisted encode:
    python -m himg_tpu.tools.abnative /tmp/libcand.so --decode

The planes file needs arrays "fres" [B, rows, C, 64, cols] uint8 and
"hist" [B, 261]; by default it is regenerated (CPU path) from the
shared synthetic content so receipts are content-stable across rounds.
"""

from __future__ import annotations

import argparse
import ctypes
import sys
import time
from pathlib import Path

import numpy as np


def _load(path: str):
    lib = ctypes.CDLL(path)
    lib.he_max_compressed_size.restype = ctypes.c_int64
    lib.he_max_compressed_size.argtypes = [ctypes.c_int64, ctypes.c_int64]
    lib.he_compress_assisted.restype = ctypes.c_int64
    lib.he_compress_assisted.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64]
    lib.he_decompress.restype = ctypes.c_int32
    lib.he_decompress.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_int32]
    return lib


def _default_planes(n_frames: int):
    """[fres, hist] for n 1080p frames of the canonical bench content,
    via the XLA CPU encode path (slow once; cache with --planes)."""
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from ..pipeline.encode import EncodeTables, _encode_device
    from ..entropy import bitpack
    from ..utils.synth import synth_frames
    h, w, c = 1088, 1920, 3
    et = EncodeTables(50, True, c)
    frames = synth_frames(n_frames, h, w, c)
    fres_all, hists = [], []
    for i in range(n_frames):
        _, _, fres = jax.tree.map(np.asarray, _encode_device(
            jnp.asarray(frames[i]), *et.device_args(), True))
        fres_all.append(fres)
        hists.append(bitpack.histogram_py(
            fres.reshape(-1), fres.shape[-1] * c * 64))
    return np.stack(fres_all), np.stack(hists)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("candidate", help="path to the candidate .so")
    ap.add_argument("--baseline", default=str(
        Path(__file__).resolve().parents[1] / "native" /
        "libhimg_entropy.so"))
    ap.add_argument("--planes", default=None,
                    help=".npz with fres/hist arrays (else regenerated)")
    ap.add_argument("--decode", action="store_true")
    ap.add_argument("--frames", type=int, default=4)
    ap.add_argument("--reps", type=int, default=12)
    args = ap.parse_args(argv)

    if args.planes:
        d = np.load(args.planes)
        fres, hist = d["fres"], d["hist"]
    else:
        print("generating planes via the CPU path (cache with --planes)...",
              file=sys.stderr)
        fres, hist = _default_planes(args.frames)
        np.savez("/tmp/abnative_planes.npz", fres=fres, hist=hist)
        print("saved /tmp/abnative_planes.npz", file=sys.stderr)

    libs = {"baseline": _load(args.baseline), "candidate": _load(args.candidate)}
    nf = min(args.frames, fres.shape[0])
    flats = [np.ascontiguousarray(fres[i]).reshape(-1) for i in range(nf)]
    hists = [np.ascontiguousarray(hist[i], np.int64) for i in range(nf)]
    # fres is [B, rows, C, 64, cols]; a substream block is one block row.
    bs = fres.shape[-1] * fres.shape[2] * 64
    n = flats[0].size
    cap = libs["baseline"].he_max_compressed_size(n, bs)
    outs = {k: np.empty(cap, np.uint8) for k in libs}

    def enc(k, i):
        t0 = time.perf_counter()
        sz = libs[k].he_compress_assisted(
            flats[i].ctypes.data_as(ctypes.c_char_p), n, bs,
            hists[i].ctypes.data, outs[k].ctypes.data, cap)
        return time.perf_counter() - t0, sz

    # Byte-identity gate first.
    blobs = []
    for i in range(nf):
        sa = enc("baseline", i)[1]
        sb = enc("candidate", i)[1]
        if sa != sb or not np.array_equal(outs["baseline"][:sa],
                                          outs["candidate"][:sb]):
            print(f"MISMATCH on frame {i}: {sa} vs {sb} bytes")
            return 1
        blobs.append(outs["baseline"][:sa].copy())  # outs is reused: copy
    print(f"byte-identical on {nf} frames")

    if args.decode:
        dec = {k: np.empty(n, np.uint8) for k in libs}

        def run(k, i):
            t0 = time.perf_counter()
            rc = libs[k].he_decompress(blobs[i].ctypes.data, blobs[i].size,
                                       bs, dec[k].ctypes.data, n, 1)
            assert rc == 0, rc
            return time.perf_counter() - t0

        # Decode-output gate (doubles as the warm pass): both builds
        # must reproduce the original planes exactly.
        for i in range(nf):
            for k in libs:
                run(k, i)
                if not np.array_equal(dec[k], flats[i]):
                    print(f"DECODE MISMATCH ({k}) on frame {i}")
                    return 1
        print(f"decode outputs exact on {nf} frames (both builds)")
    else:
        run = lambda k, i: enc(k, i)[0]  # noqa: E731

    for i in range(nf):
        for k in libs:
            run(k, i)  # warm
    t = {k: [] for k in libs}
    for _ in range(args.reps):
        for i in range(nf):
            for k in libs:
                t[k].append(run(k, i))
    for k in libs:
        print(f"{k}: min {min(t[k])*1000:.2f} ms/frame")
    base, cand = min(t["baseline"]), min(t["candidate"])
    print(f"candidate vs baseline: {(1 - cand / base) * 100:+.1f}%")
    return 0


if __name__ == "__main__":
    sys.exit(main())
