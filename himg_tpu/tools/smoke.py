"""On-TPU smoke test: compile + run every Pallas kernel and both packed
production programs on a small real batch, assert byte-equality against
the XLA paths, and write a pass/fail JSON receipt.

Purpose (round-2 verdict item 7): CI runs the kernels interpret-mode only
(no TPU in CI), so a Mosaic/jax upgrade that breaks real-hardware
compilation would otherwise surface only inside a full benchmark run.
This makes it a one-command diagnosis:

    python -m himg_tpu.tools.smoke            # writes SMOKE_TPU.json

Each check compiles fresh (persistent cache applies), runs on device, and
compares against the independently computed XLA/host result.  Exit code 0
iff every check passes on a real TPU.
"""

from __future__ import annotations

import json
import sys
import time
from functools import partial
from pathlib import Path


def _run_checks(log):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..utils.profiling import enable_persistent_cache
    enable_persistent_cache()

    from ..format import tables
    from ..ops import lowres
    from ..ops import pallas_kernels as pk
    from ..pipeline.decode import _decode_device_planar
    from ..pipeline.encode import EncodeTables, _encode_device
    from ..utils.synth import synth_frames

    checks = []

    def check(name, fn):
        t0 = time.time()
        try:
            fn()
            checks.append({"check": name, "ok": True,
                           "seconds": round(time.time() - t0, 1)})
            log(f"  {name}: ok ({time.time() - t0:.0f}s)")
        except Exception as e:  # noqa: BLE001 - receipt must record, not die
            checks.append({"check": name, "ok": False,
                           "seconds": round(time.time() - t0, 1),
                           "error": f"{type(e).__name__}: {e}"[:500]})
            log(f"  {name}: FAILED {type(e).__name__}: {str(e)[:200]}")

    B, H, W, C, Q = 2, 128, 128, 3, 50
    frames = synth_frames(B, H, W, C)
    et = EncodeTables(Q, True, C)
    targs = et.device_args()
    dargs = (jnp.asarray(et.shift_tables),
             jnp.asarray(et.fr_mapper.positive),
             jnp.asarray(et.lr_mapper.unmap_lut))
    x = jnp.asarray(frames)

    enc = {}
    for use_pallas in (False, True):
        enc[use_pallas] = jax.jit(jax.vmap(
            partial(_encode_device, use_ycbcr=True, use_pallas=use_pallas),
            in_axes=(0, None, None, None, None)))(x, *targs)
        enc[use_pallas] = jax.tree.map(np.asarray, enc[use_pallas])

    def encode_parity():
        for a, b in zip(enc[True], enc[False]):
            np.testing.assert_array_equal(a, b)
    check("encode_pallas_vs_xla", encode_parity)

    pred, delta, fres = enc[False]
    pred_i = jnp.asarray(pred.reshape(B, C, -1))
    dec = {}

    def make_decode(use_pallas):
        def run():
            out = jax.jit(jax.vmap(
                partial(_decode_device_planar, use_ycbcr=True,
                        use_pallas=use_pallas),
                in_axes=(0, 0, 0, None, None, None)))(
                    jnp.asarray(fres), jnp.asarray(delta), pred_i, *dargs)
            dec[use_pallas] = np.asarray(out)
        return run
    check("decode_program_xla", make_decode(False))
    check("decode_program_pallas", make_decode(True))
    check("decode_pallas_vs_xla",
          lambda: np.testing.assert_array_equal(dec[True], dec[False]))

    def fused_frame_decode():
        grids = jax.jit(jax.vmap(jax.vmap(
            lambda d, p: lowres.decode_deltas(
                d, p, dargs[2], (fres.shape[1], fres.shape[-1])))))(
                    jnp.asarray(delta), pred_i)
        shift_zz = et.shift_tables[:, np.asarray(tables.ZIGZAG)]
        out = jax.jit(jax.vmap(
            lambda f, g: pk.decode_frame_raster(
                f, g, jnp.asarray(shift_zz), dargs[1], True)))(
                    jnp.asarray(fres), grids)
        out = np.asarray(out)
        for k in range(C):
            np.testing.assert_array_equal(
                ((out >> (8 * k)) & 0xFF).astype(np.uint8), dec[False][:, k])
    check("fused_frame_decode_raster", fused_frame_decode)

    def fused_frame_encode():
        from ..utils.synth import pack_rgbx
        shift_zz = et.shift_tables[:, np.asarray(tables.ZIGZAG)]
        fres_f, grids_f = jax.jit(lambda p: pk.encode_frames_from_raster(
            p, jnp.asarray(shift_zz),
            jnp.asarray(et.fr_mapper.pack_thresholds), C, True))(
                jnp.asarray(pack_rgbx(frames)))
        np.testing.assert_array_equal(np.asarray(fres_f), fres)
        from ..ops import ycbcr as yc
        chans = jnp.asarray(np.moveaxis(frames, -1, 1))
        ref_grids = jax.jit(jax.vmap(jax.vmap(lowres.sample_image)))(
            jax.vmap(yc.rgb_to_ycbcr_planar)(chans))
        np.testing.assert_array_equal(np.asarray(grids_f),
                                      np.asarray(ref_grids))
    check("fused_frame_encode_raster", fused_frame_encode)

    def fused_odd_geometry():
        # Non-128-lane-multiple width (1000 px -> 125 block cols) and
        # partial edge blocks (35x75): both fused wrappers pad in-graph
        # (pad_raster_to_blocks / lane pad + crop) and must stay
        # byte-identical to the multi-pass XLA path on real hardware.
        from ..utils.synth import pack_rgbx
        shift_zz = jnp.asarray(et.shift_tables[:, np.asarray(tables.ZIGZAG)])
        for (hh, ww) in ((16, 1000), (35, 75)):
            fr = synth_frames(1, hh, ww, C, seed=hh + ww)
            ep, ed, ef = jax.jit(jax.vmap(
                partial(_encode_device, use_ycbcr=True, use_pallas=False),
                in_axes=(0, None, None, None, None)))(jnp.asarray(fr),
                                                      *targs)
            fres_f, _ = jax.jit(lambda p: pk.encode_frames_from_raster(
                p, shift_zz, jnp.asarray(et.fr_mapper.pack_thresholds),
                C, True))(jnp.asarray(pack_rgbx(fr)))
            np.testing.assert_array_equal(np.asarray(fres_f),
                                          np.asarray(ef))
            pi = jnp.asarray(np.asarray(ep).reshape(1, C, -1))
            rows, cols = ef.shape[1], ef.shape[-1]
            grids = jax.jit(jax.vmap(jax.vmap(
                lambda d, p: lowres.decode_deltas(d, p, dargs[2],
                                                  (rows, cols)))))(
                jnp.asarray(ed), pi)
            out = np.asarray(jax.jit(
                lambda f, g: pk.decode_frames_raster(f, g, shift_zz,
                                                     dargs[1], True))(
                jnp.asarray(ef), grids))
            ref = np.asarray(jax.jit(jax.vmap(
                partial(_decode_device_planar, use_ycbcr=True,
                        use_pallas=False),
                in_axes=(0, 0, 0, None, None, None)))(
                jnp.asarray(ef), jnp.asarray(ed), pi, *dargs))
            for k in range(C):
                np.testing.assert_array_equal(
                    ((out >> (8 * k)) & 0xFF).astype(np.uint8), ref[:, k])
    check("fused_odd_geometry_raster", fused_odd_geometry)

    def device_histogram():
        from ..entropy import native
        from ..entropy.device_hist import frame_histograms
        block = fres.shape[-1] * C * 64
        hist_dev = np.asarray(jax.jit(
            lambda f: frame_histograms(f.reshape(f.shape[0], -1), block))(
                jnp.asarray(fres))).astype(np.int64)
        if native.available():
            for i in range(B):
                host = native.histogram(
                    np.ascontiguousarray(fres[i]).reshape(-1), block)
                np.testing.assert_array_equal(hist_dev[i], host)
    check("device_histogram_vs_host", device_histogram)

    def kernel_run_bins():
        # The encode kernel's histogram epilogue (run-class counts +
        # packed-grid literal bins) must reproduce frame_histograms
        # bin-exactly on real hardware (it drives the Huffman tree
        # byte-for-byte).
        from ..entropy.device_hist import assemble_hists, frame_histograms
        from ..utils.synth import pack_rgbx
        shift_zz = jnp.asarray(et.shift_tables[:, np.asarray(tables.ZIGZAG)])
        block = fres.shape[-1] * C * 64

        def prog(p):
            fres_f, _, rb, lit = pk.encode_frames_from_raster(
                p, shift_zz, jnp.asarray(et.fr_mapper.pack_thresholds),
                C, True, with_run_bins=True)
            flat = fres_f.reshape(fres_f.shape[0], -1)
            return (fres_f, assemble_hists(rb, lit),
                    frame_histograms(flat, block))
        fres_f, got, want = jax.jit(prog)(jnp.asarray(pack_rgbx(frames)))
        np.testing.assert_array_equal(np.asarray(fres_f), fres)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    check("kernel_run_bins_vs_xla", kernel_run_bins)

    def full_pipeline_roundtrip():
        import himg_tpu
        blob = himg_tpu.encode(frames[0], Q, True)
        out = himg_tpu.decode(blob)
        expect = np.moveaxis(dec[False][0], 0, -1)[:H, :W]
        np.testing.assert_array_equal(out, expect)
    check("full_pipeline_roundtrip", full_pipeline_roundtrip)

    return checks


def main(argv=None) -> int:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=str(
        Path(__file__).resolve().parents[2] / "SMOKE_TPU.json"))
    args = ap.parse_args(argv)

    def log(msg):
        print(msg, file=sys.stderr, flush=True)

    import jax
    platform = jax.devices()[0].platform
    receipt = {"platform": platform, "jax": jax.__version__,
               "date": time.strftime("%Y-%m-%d %H:%M:%S")}
    if platform not in ("tpu",):
        receipt.update({"ok": False, "skipped": True,
                        "reason": f"needs a real TPU, got {platform}"})
        log(f"smoke: skipped ({platform})")
    else:
        log(f"smoke: running on {jax.devices()[0]}")
        checks = _run_checks(log)
        receipt["checks"] = checks
        receipt["ok"] = all(c["ok"] for c in checks)
        receipt["skipped"] = False
    Path(args.out).write_text(json.dumps(receipt, indent=1) + "\n")
    log(f"smoke: ok={receipt['ok']} -> {args.out}")
    return 0 if receipt["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
