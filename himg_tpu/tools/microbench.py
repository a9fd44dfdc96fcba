"""Microbenchmark receipts: regenerate every measured number the
architecture rests on (docs/ARCHITECTURE.md "TPU-first decisions").

Run on the target TPU:

    python -m himg_tpu.tools.microbench            # all receipts
    python -m himg_tpu.tools.microbench gather scan  # a subset
    python -m himg_tpu.tools.microbench --quick    # tiny shapes (CI smoke)

Prints one JSON line per measurement:
    {"bench": <name>, "value": N, "unit": ..., "note": ...}

The design decisions these numbers justify:
  * gather        -> MapTo8Bit as threshold compares, not a LUT gather
  * onehot        -> UnmapFrom8Bit as one-hot int8 MXU matmul, not a gather
  * scatter       -> entropy bit-packing stays on host (scatter-add cost)
  * scan          -> per-lane-gather scan steps rule out XLA-side Huffman
  * layout        -> plane-major [.., 64, cols] over block-minor [.., 8, 8]
  * packer        -> the device entropy packer (tpu_stage) loses to host
  * stages        -> per-stage split of the full encode/decode programs
"""

from __future__ import annotations

import argparse
import json
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.profiling import device_sync, enable_persistent_cache

enable_persistent_cache()


def _timeit(fn, *args, iters: int = 8, warmup: int = 2,
            rounds: int = 3) -> float:
    """Best-of wall seconds for one fn(*args) with forced completion.

    Dispatches `iters` calls back-to-back and syncs once: on a tunneled
    runtime a single dispatch+sync round-trip costs tens of ms, which
    would floor every per-stage number (the round-1 receipts had this
    flaw).  The residual floor is ~(1 sync)/iters; `sync_floor` below
    measures it for transparency.
    """
    out = None
    for _ in range(warmup):
        out = fn(*args)
    device_sync(jax.tree_util.tree_leaves(out)[0])
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        device_sync(jax.tree_util.tree_leaves(out)[0])
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def _sync_floor() -> float:
    """Measured dispatch+sync round-trip for a trivial program (the
    additive overhead left in every _timeit number, divided by iters)."""
    tiny = jax.jit(lambda x: x + 1)
    return _timeit(tiny, jnp.zeros((8,), jnp.int32), iters=8)


def _emit(bench: str, value: float, unit: str, note: str = "") -> dict:
    rec = {"bench": bench, "value": round(float(value), 3), "unit": unit}
    if note:
        rec["note"] = note
    print(json.dumps(rec), flush=True)
    return rec


# --------------------------------------------------------------------------
# Primitive costs
# --------------------------------------------------------------------------

def bench_gather(quick: bool) -> None:
    """Data-dependent gather cost vs the compare-reduction alternatives."""
    n = 1 << 18 if quick else 1 << 24          # elements
    key = jax.random.PRNGKey(0)
    idx16 = jax.random.randint(key, (n,), 0, 65536, jnp.int32)
    lut16 = jnp.arange(65536, dtype=jnp.int32)
    th = jnp.sort(jax.random.randint(key, (127,), 0, 8039, jnp.int32))

    g16 = jax.jit(lambda i: lut16[i])
    t = _timeit(g16, idx16)
    _emit("gather_65536lut", 1e9 * t / n, "ns/elem",
          "MapTo8Bit as a full-range LUT gather")

    def compare127(x):
        acc = jnp.zeros_like(x)
        for k in range(127):
            acc += (x >= th[k]).astype(jnp.int32)
        return acc
    t = _timeit(jax.jit(compare127), idx16)
    _emit("compare127_reduction", 1e9 * t / n, "ns/elem",
          "MapTo8Bit as 127 threshold compares (production path)")

    idx8 = idx16 & 0xFF
    lut8 = jnp.arange(256, dtype=jnp.int32)
    t = _timeit(jax.jit(lambda i: lut8[i]), idx8)
    _emit("gather_256lut", 1e9 * t / n, "ns/elem",
          "UnmapFrom8Bit as a 256-entry gather")

    def onehot_mxu(x):
        oh = (x[:, None] == jnp.arange(256, dtype=jnp.int32)[None, :]
              ).astype(jnp.int8)
        return jnp.dot(oh, lut8.astype(jnp.int32)[:, None],
                       preferred_element_type=jnp.int32)
    t = _timeit(jax.jit(onehot_mxu), idx8.reshape(-1))
    _emit("onehot_mxu_256", 1e9 * t / n, "ns/elem",
          "UnmapFrom8Bit as one-hot int8 MXU matmul (production path)")


def bench_scatter(quick: bool) -> None:
    """Scatter-add cost (what the device bit-packer is made of)."""
    n = 1 << 16 if quick else 1 << 22
    m = n * 2
    key = jax.random.PRNGKey(1)
    idx = jax.random.randint(key, (n,), 0, m, jnp.int32)
    val = jnp.ones((n,), jnp.int32)
    f = jax.jit(lambda i, v: jnp.zeros(m, jnp.int32).at[i].add(v))
    t = _timeit(f, idx, val)
    _emit("scatter_add", 1e9 * t / n, "ns/elem",
          "random scatter-add, the bit-packer inner op")


def bench_scan(quick: bool) -> None:
    """lax.scan step cost with and without a per-lane gather in the body
    (the shape of any XLA-side sequential Huffman formulation)."""
    lanes = 1 << 10 if quick else 1 << 13
    steps = 16 if quick else 256
    lut = jnp.arange(1024, dtype=jnp.int32)

    def body_gather(carry, _):
        c = lut[carry & 1023] + carry
        return c, None

    def body_alu(carry, _):
        return (carry * 5 + 1) & 1023, None

    init = jnp.arange(lanes, dtype=jnp.int32)
    for name, body in [("scan_step_gather", body_gather),
                       ("scan_step_alu", body_alu)]:
        f = jax.jit(lambda x, body=body: jax.lax.scan(
            body, x, None, length=steps)[0])
        t = _timeit(f, init)
        _emit(name, 1e6 * t / steps, "us/step",
              f"{lanes} lanes, {steps} steps")


# --------------------------------------------------------------------------
# Layout and full-pipeline receipts
# --------------------------------------------------------------------------

def _bench_frames(quick: bool):
    from ..utils.synth import synth_frames
    h, w, c = (272, 480, 3) if quick else (1088, 1920, 3)
    return synth_frames(2 if quick else 16, h, w, c)


def bench_layout(quick: bool) -> None:
    """Plane-major vs block-minor full-res transform stage."""
    from ..format import tables
    from ..ops import blocks as blockops
    from ..ops import hadamard, quantize

    frames = _bench_frames(quick)
    b, h, w, c = frames.shape
    mp = b * h * w / 1e6
    shift, _ = tables.make_quantizer(50, False)
    fr = tables.MappingTable.for_fullres_quality(50)
    shift_zz = jnp.asarray(np.tile(shift, (c, 1))[:, np.asarray(tables.ZIGZAG)])
    th = jnp.asarray(fr.pack_thresholds)
    x = jnp.asarray(np.moveaxis(frames, -1, 1))     # [B, C, H, W]

    def plane_major(img):
        pm = jax.vmap(jax.vmap(blockops.to_plane_major))(img)
        coeffs = hadamard.forward_pm(pm.astype(jnp.int16))
        inter = blockops.pm_to_interleaved(coeffs, axis=3)
        return quantize.pack(inter, shift_zz[None, :, None, :, None], th)

    def block_minor(img):
        blk = jax.vmap(jax.vmap(blockops.to_blocks))(img)
        coeffs = hadamard.forward(blk.astype(jnp.int16))
        q = quantize.pack(
            coeffs.reshape(coeffs.shape[:-2] + (64,)),
            jnp.asarray(np.tile(shift, (c, 1)))[None, :, None, None, :], th)
        return jax.vmap(jax.vmap(blockops.interleave_coefficients))(q)

    t_pm = _timeit(jax.jit(plane_major), x)
    t_bm = _timeit(jax.jit(block_minor), x)
    _emit("planemajor_fullres_stage", mp / t_pm, "MPix/s",
          "[rows, 64, cols] layout (production)")
    _emit("blockminor_fullres_stage", mp / t_bm, "MPix/s",
          "[..., 8, 8] layout")
    _emit("planemajor_speedup", t_bm / t_pm, "x", "encode-side stage ratio")


def bench_packer(quick: bool) -> None:
    """Device entropy packer (tpu_stage) vs the host native codec."""
    from ..entropy import tpu_stage
    from ..format import tables
    from ..pipeline.encode import EncodeTables, _encode_device

    frames = _bench_frames(quick)
    b, h, w, c = frames.shape
    mp = h * w / 1e6
    et = EncodeTables(50, True, c)
    _, _, fres = jax.jit(
        partial(_encode_device, use_ycbcr=True))(
            jnp.asarray(frames[0]), *et.device_args())
    cols = (w + 7) >> 3
    block = cols * c * 64

    t0 = time.perf_counter()
    blob_dev = tpu_stage.compress_device(fres, block)
    t_first = time.perf_counter() - t0
    t0 = time.perf_counter()
    blob_dev = tpu_stage.compress_device(fres, block)
    t_dev = time.perf_counter() - t0
    _emit("device_packer_encode", mp / t_dev, "MPix/s",
          f"tpu_stage.compress_device (first call {t_first:.2f}s)")

    from ..entropy import bitpack
    host_fres = np.asarray(fres).reshape(-1)
    t0 = time.perf_counter()
    blob_host = bitpack.compress(host_fres, block)
    t_host = time.perf_counter() - t0
    assert blob_dev == blob_host, "device packer diverged from host codec"
    _emit("host_native_encode", mp / t_host, "MPix/s",
          "native C++ entropy encode, same data")

    # Device entropy *decode* experiment (lockstep LUT scan).
    from ..entropy import tpu_decode
    try:
        t0 = time.perf_counter()
        got = tpu_decode.decode_device(blob_host, host_fres.size, block)
        t_first = time.perf_counter() - t0
        assert np.array_equal(got, host_fres), "device decoder diverged"
        t0 = time.perf_counter()
        tpu_decode.decode_device(blob_host, host_fres.size, block)
        t_dev = time.perf_counter() - t0
        _emit("device_decoder", mp / t_dev, "MPix/s",
              f"lockstep LUT scan (first call {t_first:.2f}s)")
    except ValueError as e:
        _emit("device_decoder", 0, "MPix/s", f"declined: {e}")
    t0 = time.perf_counter()
    bitpack.decompress(blob_host, host_fres.size, block)
    _emit("host_native_decode", mp / (time.perf_counter() - t0), "MPix/s",
          "native C++ entropy decode, same data")


def bench_entropy(quick: bool) -> None:
    """Host entropy phase split per frame: the receipts behind the
    assisted-encode design (tokenize eliminated by device histograms) and
    the decode-loop numbers.  Runs on real FRES planes; interleaved
    best-of-N because host wall-clock swings +-25% between windows."""
    from ..entropy import native, bitpack
    from ..pipeline.encode import EncodeTables, _encode_device
    from ..entropy.device_hist import block_histograms

    frames = _bench_frames(quick)
    b, h, w, c = frames.shape
    mp = h * w / 1e6
    et = EncodeTables(50, True, c)
    _, _, fres = jax.jit(
        partial(_encode_device, use_ycbcr=True))(
            jnp.asarray(frames[0]), *et.device_args())
    cols = (w + 7) >> 3
    block = cols * c * 64
    data = np.asarray(fres).reshape(-1)
    if not native.available():
        _emit("entropy", 0, "ms", "native codec unavailable")
        return

    hist = native.histogram(data, block)
    hist_dev = np.asarray(block_histograms(
        jnp.asarray(data.reshape(-1, block)))).sum(0).astype(np.int64)
    assert np.array_equal(hist, hist_dev), "device histogram diverged"

    def run(fn, times, phases):
        t0 = time.perf_counter()
        result = fn()
        dt = time.perf_counter() - t0
        if not times or dt < min(times):
            phases.clear()
            phases.update(native.last_phase_ms())
        times.append(dt)
        return result

    n = 3 if quick else 12
    t_full, t_asst, t_dec = [], [], []
    ph_full, ph_asst, ph_dec = {}, {}, {}
    for _ in range(n):
        blob = run(lambda: native.compress(data, block), t_full, ph_full)
        blob2 = run(lambda: native.compress_assisted(data, block, hist),
                    t_asst, ph_asst)
        out = run(lambda: native.decompress(blob, data.size, block),
                  t_dec, ph_dec)
    assert blob2 == blob and np.array_equal(out, data)
    _emit("entropy_encode_full", 1e3 * min(t_full), "ms/frame",
          "tokenize %.1f + tree %.1f + pack %.1f + fixup %.1f" % (
              ph_full["tokenize"], ph_full["tree"], ph_full["pack"],
              ph_full["fixup"]))
    _emit("entropy_encode_assisted", 1e3 * min(t_asst), "ms/frame",
          "device hist -> tree %.1f + fused scan+pack %.1f" % (
              ph_asst["tree"], ph_asst["pack"]))
    _emit("entropy_decode", 1e3 * min(t_dec), "ms/frame",
          "tree+lut %.2f + decode loop %.1f (LUT-width A/B 11..14: "
          "within host noise; 13 kept)" % (
              ph_dec["tree_lut"], ph_dec["decode"]))
    _emit("entropy_encode_assisted_rate", mp / min(t_asst), "MPix/s", "")
    _emit("entropy_decode_rate", mp / min(t_dec), "MPix/s", "")


def bench_stages(quick: bool) -> None:
    """Per-stage split of the full device encode/decode programs."""
    from ..format import tables
    from ..ops import blocks as blockops
    from ..ops import hadamard, lowres, quantize, ycbcr
    from ..ops import pallas_kernels as pk
    from ..pipeline.encode import EncodeTables, _encode_device
    from ..pipeline.decode import _decode_device

    frames = _bench_frames(quick)
    b, h, w, c = frames.shape
    mp = b * h * w / 1e6
    et = EncodeTables(50, True, c)
    targs = et.device_args()
    use_pallas = pk.default_enabled()
    x = jnp.asarray(frames)

    enc = jax.jit(jax.vmap(partial(
        _encode_device, use_ycbcr=True, use_pallas=use_pallas),
        in_axes=(0, None, None, None, None)))
    t = _timeit(enc, x, *targs)
    _emit("encode_program", mp / t, "MPix/s",
          f"full device encode, batch {b}, pallas={use_pallas}")
    pred, delta, fres = enc(x, *targs)

    dec = jax.jit(jax.vmap(partial(
        _decode_device, use_ycbcr=True, use_pallas=use_pallas),
        in_axes=(0, 0, 0, None, None, None)))
    dargs = (jnp.asarray(et.shift_tables),
             jnp.asarray(et.fr_mapper.positive),
             jnp.asarray(et.lr_mapper.unmap_lut))
    pred_i = pred.reshape(b, c, -1)
    t = _timeit(dec, fres, delta, pred_i, *dargs)
    _emit("decode_program", mp / t, "MPix/s",
          "full device decode, [H,W,C] output")

    # Production (packed-u32) forms: planar cores + u32 pack/unpack edges,
    # exactly what BatchCodec(pixel_format="packed") runs.
    from ..pipeline.decode import _decode_device_planar
    from ..pipeline.encode import _encode_device_planar

    def enc_packed(px, *targs):
        chans = jnp.stack(
            [((px >> (8 * k)) & 0xFF).astype(jnp.uint8) for k in range(c)],
            axis=1)
        return jax.vmap(partial(
            _encode_device_planar, use_ycbcr=True, use_pallas=use_pallas),
            in_axes=(0, None, None, None, None))(chans, *targs)

    packed = jnp.asarray(
        frames[..., 0].astype(np.uint32)
        | (frames[..., 1].astype(np.uint32) << 8)
        | (frames[..., 2].astype(np.uint32) << 16))
    t = _timeit(jax.jit(enc_packed), packed, *targs)
    _emit("encode_program_packed", mp / t, "MPix/s",
          "production path: packed-u32 in, planar core")

    def dec_packed(fres, delta, pred, *dargs):
        img = jax.vmap(partial(
            _decode_device_planar, use_ycbcr=True, use_pallas=use_pallas),
            in_axes=(0, 0, 0, None, None, None))(fres, delta, pred, *dargs)
        out = img[:, 0].astype(jnp.uint32)
        for k in range(1, c):
            out = out | (img[:, k].astype(jnp.uint32) << (8 * k))
        return out.reshape(-1)
    t = _timeit(jax.jit(dec_packed), fres, delta, pred_i, *dargs)
    _emit("decode_program_packed", mp / t, "MPix/s",
          "production path: planar core, packed-u32 out")

    # Encode sub-stages (each jitted standalone; sums can exceed the fused
    # program because XLA fuses across stage boundaries).
    chans = jnp.asarray(np.moveaxis(frames, -1, 1))       # [B, C, H, W]
    stages = {}
    f_ycbcr = jax.jit(jax.vmap(ycbcr.rgb_to_ycbcr))
    stages["ycbcr"] = _timeit(f_ycbcr, x)
    f_sample = jax.jit(jax.vmap(jax.vmap(lowres.sample_image)))
    stages["lowres_sample"] = _timeit(f_sample, chans)
    grids = f_sample(chans)
    f_pred = jax.jit(jax.vmap(jax.vmap(lowres.select_predictors)))
    stages["pred_argmin"] = _timeit(f_pred, grids)
    raw_pred = f_pred(grids)
    preds = jnp.where(raw_pred <= 1, 0, raw_pred)
    f_fb = jax.jit(jax.vmap(jax.vmap(
        lambda g, p: lowres.encode_deltas(g, p, targs[2], targs[3]))))
    stages["feedback_scan"] = _timeit(f_fb, grids, preds)
    f_layout = jax.jit(jax.vmap(jax.vmap(
        lambda p: blockops.to_plane_major(blockops.pad_to_blocks(p)))))
    stages["layout_pm"] = _timeit(f_layout, chans)
    pm = f_layout(chans)
    f_ups = jax.jit(jax.vmap(jax.vmap(lowres.upsample_pm)))
    stages["upsample_pm"] = _timeit(f_ups, grids)

    if use_pallas:
        shift_zz = et.shift_tables[:, np.asarray(tables.ZIGZAG)]
        rows = pm.shape[2]
        pmr = pk.pad_cols(pm.reshape(b * c * rows, 64, pm.shape[-1]))
        gr = grids.reshape(b * c, grids.shape[2], grids.shape[3])
        f_kernel = jax.jit(lambda px, g: pk.encode_rows(
            px, g, jnp.asarray(np.tile(shift_zz, (b, 1))),
            jnp.asarray(et.fr_mapper.pack_thresholds)))
        stages["fused_kernel"] = _timeit(f_kernel, pmr, gr)

    for name, t in stages.items():
        _emit(f"enc_stage_{name}", 1e3 * t, "ms",
              f"{mp / t:.0f} MPix/s standalone")


def bench_variants(quick: bool) -> None:
    """Compare implementation variants of the hot low-res/color stages."""
    from ..ops import lowres, ycbcr
    from ..pipeline.encode import EncodeTables

    frames = _bench_frames(quick)
    b, h, w, c = frames.shape
    mp = b * h * w / 1e6
    x = jnp.asarray(frames)
    chans = jnp.asarray(np.moveaxis(frames, -1, 1))

    t = _timeit(jax.jit(jax.vmap(ycbcr.rgb_to_ycbcr)), x)
    _emit("ycbcr_interleaved", 1e3 * t, "ms", f"{mp/t:.0f} MPix/s")
    t = _timeit(jax.jit(jax.vmap(ycbcr.rgb_to_ycbcr_planar)), chans)
    _emit("ycbcr_planar", 1e3 * t, "ms", f"{mp/t:.0f} MPix/s")

    et = EncodeTables(50, True, c)
    targs = et.device_args()
    grids = jax.jit(jax.vmap(jax.vmap(lowres.sample_image)))(chans)
    preds = jax.jit(jax.vmap(jax.vmap(lowres.select_predictors)))(grids)
    preds = jnp.where(preds <= 1, 0, preds)

    def scan_fn(unroll, geval, decode):
        def one(g, p):
            tiles, _ = lowres._to_tiles(g.astype(jnp.int16))
            return lowres._feedback_scan(tiles, p.reshape(-1), decode,
                                         targs[2], targs[3],
                                         unroll=unroll, geval=geval)
        return jax.jit(jax.vmap(jax.vmap(one)))

    for unroll in (False, True):
        for gv in ("bcast", "dot8"):
            t = _timeit(scan_fn(unroll, gv, False), grids, preds)
            _emit(f"enc_scan_unroll{int(unroll)}_{gv}", 1e3 * t, "ms",
                  f"{mp/t:.0f} MPix/s equivalent")
        t = _timeit(scan_fn(unroll, "bcast", True), grids, preds)
        _emit(f"dec_scan_unroll{int(unroll)}", 1e3 * t, "ms",
              f"{mp/t:.0f} MPix/s equivalent")

    # Decode-side reassembly: plane-major -> interleaved image.
    from ..ops import blocks as blockops
    rows, cols = (h + 7) >> 3, (w + 7) >> 3
    pm = jnp.zeros((b, c, rows, 8, 8, cols), jnp.uint8)

    def reassemble(x):
        img = jax.vmap(jax.vmap(blockops.from_plane_major))(x)
        return jnp.moveaxis(img, 1, -1)
    t = _timeit(jax.jit(reassemble), pm)
    _emit("dec_reassemble", 1e3 * t, "ms", f"{mp/t:.0f} MPix/s")
    t = _timeit(jax.jit(lambda x: jnp.moveaxis(x, 1, -1)),
                jnp.zeros((b, c, rows * 8, cols * 8), jnp.uint8))
    _emit("dec_moveaxis_only", 1e3 * t, "ms", "planar->interleaved u8")


BENCHES = {
    "gather": bench_gather,
    "scatter": bench_scatter,
    "scan": bench_scan,
    "layout": bench_layout,
    "packer": bench_packer,
    "entropy": bench_entropy,
    "stages": bench_stages,
    "variants": bench_variants,
}


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("benches", nargs="*", choices=list(BENCHES) + [[]],
                    help="subset to run (default: all)")
    ap.add_argument("--quick", action="store_true",
                    help="tiny shapes for CI smoke runs")
    args = ap.parse_args(argv)
    names = args.benches or list(BENCHES)
    print(json.dumps({"bench": "_platform",
                      "value": 0,
                      "unit": jax.devices()[0].platform,
                      "note": str(jax.devices()[0])}), flush=True)
    _emit("_sync_floor", 1e3 * _sync_floor(), "ms",
          "residual dispatch+sync overhead inside every number below")
    for name in names:
        BENCHES[name](args.quick)


if __name__ == "__main__":
    main()
