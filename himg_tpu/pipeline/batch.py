"""Batched encode/decode for fixed-geometry image streams (config 4).

BatchCodec amortizes device dispatch, compilation, and transfer overheads
over batches of same-shaped frames:

- the transform stages run as one batched (vmapped) device program;
- device outputs cross to the host as two flat buffers per chunk: a small
  one (predictors + low-res deltas, ~1.6 MB/16 frames) and the big FRES
  plane buffer, each already in its natural layout.  Concatenating them
  into one buffer costs a full 100 MB relayout pass on device (~7 ms per
  16x1080p, measured) and saves only one transfer round-trip;
- chunks of the batch are pipelined: while the device transforms chunk
  k+1, the host entropy-codes chunk k (the native codec releases the GIL).

Each frame yields an independent, reference-compatible .himg blob.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .decode import _decode_device_planar, parse_container
from .encode import EncodeTables, _encode_device_planar, assemble_container


class BatchCodec:
    """Encode/decode batches of same-geometry frames at one quality.

    pixel_format:
      - "hwc": frames are [B, H, W, C] uint8 (the reference API layout).
        The u8 channel interleave <-> planar transposes cost ~2.6 ms of
        pure relayout per 1080p frame on a v5e.
      - "packed": channel-packed pixels -- uint32 [B, H, W] with channel k
        in byte k (little-endian) for c in (3, 4), plain uint8 [B, H, W]
        for c == 1.  Packing/unpacking is elementwise shifts (no
        transpose), and decode_batch returns a zero-copy byte view of the
        transferred buffer.  This is the production-throughput path
        (video feeds are commonly RGBX/BGRX already).
    """

    def __init__(self, h: int, w: int, c: int, quality: int = 50,
                 use_ycbcr: bool = True, chunk: int = 4,
                 pixel_format: str = "hwc", host_threads: int = 1,
                 mesh=None):
        if pixel_format not in ("hwc", "packed"):
            raise ValueError(f"unknown pixel_format {pixel_format!r}")
        if pixel_format == "packed" and c not in (1, 3, 4):
            raise ValueError("packed pixel_format supports 1/3/4 channels")
        # mesh: optional 1-axis jax.sharding.Mesh -- frames of each chunk
        # spread over its devices (SURVEY.md §5 config 4 data parallelism
        # at container level).  The transform is embarrassingly batch
        # parallel, so the shard_map bodies need no collectives; chips
        # stream their shards back and the host entropy funnels fan out
        # over host_threads.  chunk must divide by the mesh size.
        self.mesh = mesh
        if mesh is not None:
            n_mesh = int(np.prod(tuple(mesh.shape.values())))
            if len(mesh.axis_names) != 1:
                raise ValueError("BatchCodec mesh must have one axis")
            if chunk % n_mesh:
                raise ValueError(
                    f"chunk ({chunk}) must be a multiple of the mesh size "
                    f"({n_mesh})")
        self.pixel_format = pixel_format
        self.h, self.w, self.c = h, w, c
        self.chunk = chunk
        # Host-stage fan-out: frames of a chunk are entropy-coded/parsed
        # on host_threads workers (the native codec releases the GIL and
        # additionally threads over substreams *within* a frame).  The
        # default of 1 matches the 1-vCPU bench host; production hosts
        # scale the entropy stage across cores with this knob.
        self.host_threads = max(1, int(host_threads))
        self.use_ycbcr = bool(use_ycbcr) and c >= 3
        self.tables = EncodeTables(quality, self.use_ycbcr, c)
        self.rows, self.cols = (h + 7) >> 3, (w + 7) >> 3
        mr, mc = -(-self.rows // 16), -(-self.cols // 16)
        self._shapes = {
            "pred": (c, mr, mc), "delta": (c, self.rows, self.cols),
            "fres": (self.rows, c, 64, self.cols),
        }
        # pred/delta offsets inside the small per-image buffer.
        self._npred = int(np.prod(self._shapes["pred"]))
        self._ndelta = int(np.prod(self._shapes["delta"]))
        self._small = self._npred + self._ndelta

        from ..ops import pallas_kernels as pk
        use_pallas = pk.default_enabled()

        def to_planar(frames):
            """Batch frames in self.pixel_format -> [B, C, H, W] uint8."""
            if self.pixel_format == "hwc":
                return jnp.moveaxis(frames, -1, 1)
            if self.c == 1:
                return frames[:, None]
            return jnp.stack(
                [((frames >> (8 * k)) & 0xFF).astype(jnp.uint8)
                 for k in range(self.c)], axis=1)

        def from_planar(img):
            """[B, C, H8, W8] uint8 -> flat output in self.pixel_format."""
            if self.pixel_format == "hwc":
                return jnp.moveaxis(img, 1, -1).reshape(-1)
            if self.c == 1:
                return img.reshape(-1)
            out = img[:, 0].astype(jnp.uint32)
            for k in range(1, self.c):
                out = out | (img[:, k].astype(jnp.uint32) << (8 * k))
            return out.reshape(-1)

        # Single-pass fused encode (encode_frames_from_raster): unpack,
        # YCbCr, low-res sampling, layout, WHT, quantize and MapTo8Bit run
        # in one Pallas pass over the raster input; only the (tiny)
        # predictor search + feedback scan stay in XLA.
        # Any geometry: the kernel wrapper pads the raster in-graph with
        # the HIMG edge-replication quirks (pad_raster_to_blocks).
        fused_enc = (use_pallas and pixel_format == "packed"
                     and c in (1, 3, 4))

        # Per-frame exact token histograms of the FRES planes ride the
        # encode program as a third output: the host skips its entropy
        # analysis pass (native.compress_assisted) without paying a second
        # program dispatch + sync per chunk (one tunnel round-trip here;
        # one extra kernel launch on PCIe hosts).  Without the native
        # backend the histogram is unused (compress_py retokenizes), so
        # the encode program doesn't compute it at all.
        from ..entropy import native as _native
        from ..entropy.device_hist import assemble_hists, frame_histograms
        block = self.cols * c * 64
        self._use_hist = _native.available()
        # Histograms on the fused path: both the RLE run classes and the
        # literal byte counts come out of the encode kernel's epilogue
        # (the wire bytes are still in VMEM there; the XLA formulations
        # re-read the 100 MB FRES buffer through ~15 materialized boolean
        # passes and push 3.2 GB of one-hots through HBM: +12 ms and
        # +6.6 ms per 16x1080p, VERDICT r4/r5 item 1).
        # HIMG_KERNEL_BINS=0 A/Bs the old XLA-histogram path.
        import os
        kernel_bins = (fused_enc and self._use_hist
                       and self.cols <= 16384
                       and os.environ.get("HIMG_KERNEL_BINS", "1")
                       not in ("0", "false", ""))

        def enc_stage(frames, *targs):
            b = frames.shape[0]
            run_bins = lit = None
            if fused_enc:
                from ..format.tables import ZIGZAG
                from ..ops import lowres
                shift_zz = targs[0][:, np.asarray(ZIGZAG)]
                if kernel_bins:
                    fres, grids, run_bins, lit = \
                        pk.encode_frames_from_raster(
                            frames, shift_zz, targs[1], c, self.use_ycbcr,
                            with_run_bins=True,
                            th_linear49=self.tables.th_linear49)
                else:
                    fres, grids = pk.encode_frames_from_raster(
                        frames, shift_zz, targs[1], c, self.use_ycbcr,
                        th_linear49=self.tables.th_linear49)
                pred = jax.vmap(jax.vmap(lowres.select_predictors))(grids)
                eff = jnp.where(pred <= 1, 0, pred)
                delta = jax.vmap(jax.vmap(
                    lambda g, p: lowres.encode_deltas(g, p, targs[2],
                                                      targs[3])))(grids, eff)
                small = jnp.concatenate(
                    [pred.astype(jnp.uint8).reshape(b, -1),
                     delta.reshape(b, -1)], axis=1)
            else:
                pred, delta, fres = jax.vmap(
                    partial(_encode_device_planar, use_ycbcr=self.use_ycbcr,
                            use_pallas=use_pallas,
                            th_linear49=self.tables.th_linear49),
                    in_axes=(0, None, None, None, None))(to_planar(frames),
                                                         *targs)
                small = jnp.concatenate(
                    [pred.astype(jnp.uint8).reshape(b, -1),
                     delta.reshape(b, -1)], axis=1)
            if self._use_hist:
                if run_bins is not None:
                    hist = assemble_hists(run_bins, lit)
                else:
                    hist = frame_histograms(fres.reshape(b, -1), block)
                return small, fres, hist
            return small, fres

        # Fused full-frame decode (decode_frame_raster): one Pallas pass
        # emits raster channel-packed pixels -- the reassembly, YCbCr and
        # packing XLA passes (a full HBM round-trip each) disappear.
        # Needs the packed pixel format; any width (the kernel pads the
        # block-column axis in-graph and crops the raster back).
        fused_dec = (use_pallas and pixel_format == "packed"
                     and c in (1, 3, 4))

        def dec_stage(small, fres, shift_tables, fr_pos, lr_unmap):
            b = small.shape[0]
            pred = small[:, :self._npred].astype(jnp.int32).reshape(
                b, self.c, -1)
            delta = small[:, self._npred:].reshape(
                (b,) + self._shapes["delta"])
            if fused_dec:
                from ..format.tables import ZIGZAG
                from ..ops import lowres
                grids = jax.vmap(jax.vmap(
                    lambda d, p: lowres.decode_deltas(
                        d, p, lr_unmap, (self.rows, self.cols))))(
                            delta, pred)
                shift_zz = shift_tables[:, np.asarray(ZIGZAG)]
                out = pk.decode_frames_raster(fres, grids, shift_zz,
                                              fr_pos, self.use_ycbcr)
                return out.reshape(-1)
            img = jax.vmap(
                partial(_decode_device_planar, use_ycbcr=self.use_ycbcr,
                        use_pallas=use_pallas),
                in_axes=(0, 0, 0, None, None, None))(
                    fres, delta, pred, shift_tables, fr_pos, lr_unmap)
            return from_planar(img)  # flat for the fast transfer path

        if mesh is None:
            self._enc = jax.jit(enc_stage)
            self._dec = jax.jit(dec_stage)
        else:
            from jax.sharding import PartitionSpec as P
            ax = mesh.axis_names[0]
            enc_out = ((P(ax),) * 3 if self._use_hist else (P(ax),) * 2)
            self._enc = jax.jit(jax.shard_map(
                enc_stage, mesh=mesh,
                in_specs=(P(ax), P(), P(), P(), P()),
                out_specs=enc_out, check_vma=False))
            self._dec = jax.jit(jax.shard_map(
                dec_stage, mesh=mesh,
                in_specs=(P(ax), P(ax), P(), P(), P()),
                out_specs=P(ax), check_vma=False))
        # Standalone histogram program (tools/tests that only have FRES
        # planes); the production path gets it fused into _enc above.
        self._hist = jax.jit(lambda fres: frame_histograms(
            fres.reshape(fres.shape[0], -1), block))

    # -- encode ------------------------------------------------------------

    def _image_views(self, small_row: np.ndarray, fres: np.ndarray):
        """Zero-copy per-image (pred, delta, fres) views."""
        pred = small_row[:self._npred].astype(np.int32).reshape(
            self._shapes["pred"])
        delta = small_row[self._npred:].reshape(self._shapes["delta"])
        return pred, delta, fres.reshape(self._shapes["fres"])

    def _split_outputs(self, small: np.ndarray, fres: np.ndarray, b: int):
        """Host (small, fres) buffers -> stacked (pred, delta, fres)."""
        small = small.reshape(b, self._small)
        pred = small[:, :self._npred].astype(np.int32).reshape(
            (b,) + self._shapes["pred"])
        delta = small[:, self._npred:].reshape(
            (b,) + self._shapes["delta"])
        return pred, delta, fres.reshape((b,) + self._shapes["fres"])

    def _check_input(self, frames: np.ndarray):
        if self.pixel_format == "hwc":
            want_shape, want_dtype = (self.h, self.w, self.c), np.uint8
        else:
            want_shape = (self.h, self.w)
            want_dtype = np.uint8 if self.c == 1 else np.uint32
        if frames.shape[1:] != want_shape:
            raise ValueError(
                f"frame shape {frames.shape[1:]} != {want_shape} for "
                f"pixel_format={self.pixel_format!r}")
        if frames.dtype != want_dtype:
            raise TypeError(
                f"frame dtype {frames.dtype} != {np.dtype(want_dtype)} for "
                f"pixel_format={self.pixel_format!r}")

    def encode_batch(self, frames: np.ndarray) -> list[bytes]:
        """Frame batch (see pixel_format) -> list of B HIMG blobs."""
        b = frames.shape[0]
        self._check_input(frames)
        targs = self.tables.device_args()
        chunks = [frames[i:i + self.chunk] for i in range(0, b, self.chunk)]
        if self.mesh is not None:
            n_mesh = int(np.prod(tuple(self.mesh.shape.values())))
            if any(ch.shape[0] % n_mesh for ch in chunks):
                raise ValueError(
                    f"every chunk (chunk={self.chunk}, batch={b}) must "
                    f"divide by the mesh size ({n_mesh})")

        def entropy_stage(small_dev, fres_dev, hist_dev, nb):
            small = np.asarray(small_dev).reshape(nb, self._small)
            fres = np.asarray(fres_dev).reshape(nb, -1)
            hists = (np.asarray(hist_dev).astype(np.int64)
                     if hist_dev is not None else None)

            def one(i):
                pred, delta, fr = self._image_views(small[i], fres[i])
                return assemble_container(
                    self.w, self.h, self.c, self.tables, pred, delta, fr,
                    fres_hist=None if hists is None else hists[i])
            if self.host_threads > 1:
                with ThreadPoolExecutor(self.host_threads) as frame_pool:
                    return list(frame_pool.map(one, range(nb)))
            return [one(i) for i in range(nb)]

        blobs: list[bytes] = []
        with ThreadPoolExecutor(max_workers=1) as pool:
            pending = None
            for ch in chunks:
                # Mesh mode hands jit the host array so it lands with the
                # batch sharding directly (a committed single-device array
                # would force a gather-reshard first).
                arr = ch if self.mesh is not None else jnp.asarray(ch)
                outs = self._enc(arr, *targs)  # async
                (small, fres), hists = outs[:2], (
                    outs[2] if self._use_hist else None)
                if pending is not None:
                    blobs.extend(pending.result())
                pending = pool.submit(entropy_stage, small, fres, hists,
                                      ch.shape[0])
            blobs.extend(pending.result())
        return blobs

    # -- decode ------------------------------------------------------------

    def decode_batch(self, blobs) -> np.ndarray:
        """List of B same-geometry HIMG blobs -> [B, H, W, C] uint8."""
        targs_holder = {}

        def parse_stage(chunk_blobs):
            if self.host_threads > 1:
                with ThreadPoolExecutor(self.host_threads) as frame_pool:
                    parsed = list(frame_pool.map(parse_container, chunk_blobs))
            else:
                parsed = [parse_container(bl) for bl in chunk_blobs]
            hdr = parsed[0][0]
            if (hdr.height, hdr.width, hdr.num_channels) != \
                    (self.h, self.w, self.c):
                raise ValueError(
                    f"blob geometry {hdr.height}x{hdr.width}x"
                    f"{hdr.num_channels} does not match codec "
                    f"{self.h}x{self.w}x{self.c}")
            if not targs_holder:
                targs_holder["t"] = tuple(
                    jnp.asarray(a) for a in parsed[0][1:4])
            nb = len(parsed)
            small = np.empty((nb, self._small), np.uint8)
            fres = np.empty((nb,) + self._shapes["fres"], np.uint8)
            for i, p in enumerate(parsed):
                small[i, :self._npred] = p[4].astype(np.uint8).reshape(-1)
                small[i, self._npred:] = p[5].reshape(-1)
                fres[i] = p[6]
            return small, fres, nb

        chunks = [blobs[i:i + self.chunk]
                  for i in range(0, len(blobs), self.chunk)]
        if self.mesh is not None:
            n_mesh = int(np.prod(tuple(self.mesh.shape.values())))
            if any(len(ch) % n_mesh for ch in chunks):
                raise ValueError(
                    f"every chunk (chunk={self.chunk}, batch={len(blobs)}) "
                    f"must divide by the mesh size ({n_mesh})")
        with ThreadPoolExecutor(max_workers=1) as pool:
            futures = [pool.submit(parse_stage, ch) for ch in chunks]
            devs = []
            for fut in futures:
                small, fres, nb = fut.result()
                if self.mesh is not None:
                    devs.append(self._dec(small, fres, *targs_holder["t"]))
                else:
                    devs.append(self._dec(jnp.asarray(small),
                                          jnp.asarray(fres),
                                          *targs_holder["t"]))
            outs = [np.asarray(dev) for dev in devs]
        flat = outs[0] if len(outs) == 1 else np.concatenate(outs)
        h8, w8 = self.rows * 8, self.cols * 8
        if self.pixel_format == "hwc":
            img = flat.reshape(-1, h8, w8, self.c)
        elif self.c == 1:
            # Symmetric with the packed c==1 input shape: no channel axis.
            img = flat.reshape(-1, h8, w8)
        else:
            # Byte view of the packed-u32 transfer buffer (zero-copy when
            # contiguous; see decode.py -- the axon client can return a
            # strided view for in-graph-cropped widths).
            img = np.ascontiguousarray(flat).view(np.uint8).reshape(
                -1, h8, w8, 4)[..., :self.c]
        return img[:, :self.h, :self.w]
