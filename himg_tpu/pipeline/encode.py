"""HIMG encoder pipeline: JAX transform stages + host entropy/container.

Mirrors the reference encode sequence (encoder.cpp:59-109) with a TPU-first
split: everything per-pixel -- color transform, low-res analysis, predictor
search, delta feedback scan, block extraction, forward WHT, quantization,
companding, coefficient interleave -- runs inside one jitted device program
over the whole image; the host handles only entropy coding and RIFF
framing (a few bytes per chunk plus the Huffman streams).

Chunk order and all serialization formats are bit-exact with the reference
(verified against chimg in tests/test_parity.py).
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from ..format import tables
from ..format.container import FormatHeader, RIFFWriter
from ..entropy import bitpack
from ..ops import blocks as blockops
from ..ops import hadamard, lowres, quantize, ycbcr


@lru_cache(maxsize=32)
def _stream_order(rows: int, cols: int) -> np.ndarray:
    return lowres.macroblock_stream_order(rows, cols)


@partial(jax.jit,
         static_argnames=("use_ycbcr", "use_pallas", "th_linear49"))
def _encode_device(img, shift_tables, fr_thresholds, lr_map_small, lr_unmap,
                   use_ycbcr: bool, use_pallas: bool = False,
                   th_linear49: bool = False):
    """Device-side encode: [H, W, C] uint8 -> low-res + coefficient planes.

    Returns (pred_ids [C, MR, MC] int32,
             delta_grids [C, R, Cc] uint8,
             fres [rows, C, 64, cols] uint8 interleaved planes).
    th_linear49: host-verified assertion that fr_thresholds[j] == j + 1
    for j <= 48 (EncodeTables.th_linear49); shortens the in-kernel
    MapTo8Bit compare reduction.
    """
    return _encode_device_planar(jnp.moveaxis(img, -1, 0), shift_tables,
                                 fr_thresholds, lr_map_small, lr_unmap,
                                 use_ycbcr, use_pallas,
                                 th_linear49=th_linear49)


def _encode_device_planar(chans, shift_tables, fr_thresholds, lr_map_small,
                          lr_unmap, use_ycbcr: bool, use_pallas: bool = False,
                          th_linear49: bool = False):
    """Planar-input core of _encode_device: chans is [C, H, W] uint8.

    Channel-planar is the TPU-native form (a u8 [H, W, C] -> [C, H, W]
    transpose costs ~1.3 ms/frame of pure relayout); batch callers feed
    packed-u32 frames through channel shifts instead (pipeline.batch).
    """
    if use_ycbcr:
        # Planar conversion: full lane occupancy (C in the lane axis
        # wastes 125/128 of the VPU; tools/microbench receipts).
        chans = ycbcr.rgb_to_ycbcr_planar(chans)

    # Low-res layer (vectorized over channels).
    grids = jax.vmap(lowres.sample_image)(chans)        # [C, R, Cc] uint8
    pred_ids = jax.vmap(lowres.select_predictors)(grids)
    # Reference quirk (downsampled.cpp:33-39 + :44): the predictor byte is
    # stored as (pred - 2) and decoded as (byte + 2) *without masking*, so
    # selections 0 and 1 decode to 256/257 and hit the switch default --
    # the mix formula (case 0).  Both the encoder's feedback loop and the
    # decoder agree on this, so the effective coding predictor is
    # {0->0, 1->0, 2..4 unchanged}.
    effective = jnp.where(pred_ids <= 1, 0, pred_ids)
    delta_grids = jax.vmap(
        lambda g, p: lowres.encode_deltas(g, p, lr_map_small, lr_unmap)
    )(grids, effective)

    # Full-res in plane-major layout [C, rows, 8, 8, cols]: the wide cols
    # axis stays minor through subtract/WHT/quantize so every vector op has
    # full lane occupancy, and the zigzag lands directly in the FRES
    # interleave layout.
    padded = jax.vmap(blockops.pad_to_blocks)(chans)    # [C, H8, W8]
    pm_u8 = jax.vmap(blockops.to_plane_major)(padded)
    # Quantization is per-coefficient elementwise, so it commutes with the
    # interleave; the shift table just needs the same zigzag ordering.
    shift_zz = shift_tables[:, np.asarray(tables.ZIGZAG)]
    c, rows = pm_u8.shape[0], pm_u8.shape[1]
    cols = pm_u8.shape[-1]
    if use_pallas:
        from ..ops import pallas_kernels as pk
        px = pk.pad_cols(pm_u8.reshape(c * rows, 64, cols))
        wire = pk.encode_rows(px, grids, shift_zz, fr_thresholds,
                              th_linear49=th_linear49)
        packed = wire.reshape(c, rows, 64, -1)[..., :cols]
    else:
        pred_pm = jax.vmap(lowres.upsample_pm)(grids)
        coeffs = hadamard.forward_pm(pm_u8.astype(jnp.int16) - pred_pm)
        inter = blockops.pm_to_interleaved(coeffs, axis=2)
        packed = quantize.pack(inter, shift_zz[:, None, :, None],
                               fr_thresholds)
    return pred_ids, delta_grids, jnp.moveaxis(packed, 0, 1)


class EncodeTables:
    """Host-side per-(quality, geometry) encode state, reusable across
    images (and across a batch)."""

    def __init__(self, quality: int, use_ycbcr: bool, c: int):
        self.quality = quality
        self.use_ycbcr = use_ycbcr
        self.lr_mapper = tables.MappingTable.for_lowres_quality(quality)
        self.fr_mapper = tables.MappingTable.for_fullres_quality(quality)
        self.luma_shift, self.chroma_shift = tables.make_quantizer(
            quality, use_ycbcr)
        shift = np.tile(self.luma_shift, (c, 1))
        if use_ycbcr:
            shift[1:3] = self.chroma_shift
        self.shift_tables = shift
        # Host-verified table structure for the kernels' fast paths:
        # FullResMapper is quality-independent and its first 49 pack
        # thresholds are 1..49 (identity low region), but the kernels
        # only assume it when this check passes.
        self.th_linear49 = bool(np.array_equal(
            np.asarray(self.fr_mapper.pack_thresholds)[:49],
            np.arange(1, 50)))

    def device_args(self):
        lr = self.lr_mapper
        return (jnp.asarray(self.shift_tables),
                jnp.asarray(self.fr_mapper.pack_thresholds),
                jnp.asarray(lr.map_lut[32768 - 511:32768 + 512]),
                jnp.asarray(lr.unmap_lut))


def assemble_container(w: int, h: int, c: int, et: EncodeTables,
                       pred_ids: np.ndarray, delta_grids: np.ndarray,
                       fres: np.ndarray, fres_stream: bytes | None = None,
                       fres_hist: np.ndarray | None = None) -> bytes:
    """Entropy-code device outputs and frame the RIFF container.

    fres_stream: optional pre-assembled FRES Huffman stream (the sharded
    path packs substreams per shard and assembles the directory itself);
    when given, `fres` is ignored.
    fres_hist: optional exact 261-bin token histogram of the FRES bytes
    (computed on device, entropy/device_hist.py) -- switches the FRES
    entropy coding to the single-pass assisted path, byte-identically.
    """
    rows, cols = (h + 7) >> 3, (w + 7) >> 3
    # LRES payload: per channel, predictor bytes then deltas in wire order.
    order = _stream_order(rows, cols)
    lres_parts = []
    for chan in range(c):
        pred_bytes = ((pred_ids[chan].reshape(-1) - 2) & 0xFF).astype(np.uint8)
        deltas = delta_grids[chan].reshape(-1)[order]
        lres_parts.append(pred_bytes)
        lres_parts.append(deltas)
    lres_payload = np.concatenate(lres_parts)

    writer = RIFFWriter()
    writer.add_chunk("FRMT", FormatHeader(w, h, c, et.use_ycbcr).serialize())
    writer.add_chunk("LMAP", et.lr_mapper.serialize())
    writer.add_chunk("LRES", bitpack.compress(lres_payload, 0))
    writer.add_chunk("QCFG", tables.pack_quant_config(
        et.luma_shift, et.chroma_shift if et.use_ycbcr else None))
    writer.add_chunk("FMAP", et.fr_mapper.serialize())
    # view=True: the ~2 MB FRES blob goes into the writer's single join
    # as a zero-copy view of the native scratch buffer.
    if fres_stream is not None:
        fres_blob = fres_stream
    elif fres_hist is not None:
        fres_blob = bitpack.compress_assisted(fres.reshape(-1),
                                              cols * c * 64, fres_hist,
                                              view=True)
    else:
        fres_blob = bitpack.compress(fres.reshape(-1), cols * c * 64,
                                     view=True)
    writer.add_chunk("FRES", fres_blob)
    return writer.tobytes()


def encode(image: np.ndarray, quality: int = 50, use_ycbcr: bool = True) -> bytes:
    """Encode an [H, W, C] (or [H, W]) uint8 image to HIMG bytes.

    Same contract as himg::Encoder::Encode (encoder.h:24-34): quality in
    [0, 100], YCbCr used only when the image has >= 3 channels.
    """
    img = np.asarray(image, dtype=np.uint8)
    if img.ndim == 2:
        img = img[..., None]
    h, w, c = img.shape
    use_ycbcr = bool(use_ycbcr) and c >= 3

    from ..ops import pallas_kernels as pk
    et = EncodeTables(quality, use_ycbcr, c)
    pred_ids, delta_grids, fres = _encode_device(
        jnp.asarray(img), *et.device_args(), use_ycbcr,
        use_pallas=pk.default_enabled(), th_linear49=et.th_linear49)
    return assemble_container(w, h, c, et, np.asarray(pred_ids),
                              np.asarray(delta_grids), np.asarray(fres))
