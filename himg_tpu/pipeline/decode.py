"""HIMG decoder pipeline: host entropy/container + JAX transform stages.

Mirrors the reference decode sequence (decoder.cpp:87-138).  The Huffman
streams are expanded on the host (see entropy/), then one jitted device
program performs everything per-pixel: low-res delta integration, bilinear
upsample, coefficient deinterleave, dequantization, inverse WHT, predictor
add, clamp, and the YCbCr inverse.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..format import tables
from ..format.container import FormatHeader, FormatError, RIFFReader
from ..entropy import bitpack
from ..ops import blocks as blockops
from ..ops import hadamard, lowres, quantize, ycbcr
from .encode import _stream_order


@partial(jax.jit, static_argnames=("use_ycbcr", "use_pallas"))
def _decode_device(fres, delta_grids, pred_ids, shift_tables, fr_pos_curve,
                   lr_unmap, use_ycbcr: bool, use_pallas: bool = False):
    """Device-side decode.

    fres: [rows, C, 64, cols] uint8 interleaved planes.
    delta_grids: [C, R, Cc] uint8; pred_ids: [C, MR*MC] int32.
    Returns uint8 [H8, W8, C] (callers crop to the true size).
    """
    img = _decode_device_planar(fres, delta_grids, pred_ids, shift_tables,
                                fr_pos_curve, lr_unmap, use_ycbcr,
                                use_pallas)
    return jnp.moveaxis(img, 0, -1)                      # [H8, W8, C]


def _decode_device_planar(fres, delta_grids, pred_ids, shift_tables,
                          fr_pos_curve, lr_unmap, use_ycbcr: bool,
                          use_pallas: bool = False):
    """Planar core of _decode_device: returns uint8 [C, H8, W8].

    The planar form skips the u8 channel-interleave transpose (~1.3 ms of
    relayout per 1080p frame); batch callers pack channels into u32 pixels
    with shifts instead (pipeline.batch)."""
    c = delta_grids.shape[0]
    r, cc = delta_grids.shape[1], delta_grids.shape[2]

    grids = jax.vmap(
        lambda d, p: lowres.decode_deltas(d, p, lr_unmap, (r, cc))
    )(delta_grids, pred_ids)

    # Plane-major path: dequantize directly in the interleaved layout
    # (elementwise; shift table permuted to zigzag order), then un-zigzag
    # into [C, rows, 8, 8, cols] for the inverse WHT.
    planes = jnp.moveaxis(fres, 1, 0)                    # [C, rows, 64, cols]
    shift_zz = shift_tables[:, np.asarray(tables.ZIGZAG)]
    c, rows = planes.shape[0], planes.shape[1]
    cols = planes.shape[-1]
    if use_pallas:
        from ..ops import pallas_kernels as pk
        wi = pk.pad_cols(planes.reshape(c * rows, 64, cols))
        out = pk.decode_rows(wi, grids, shift_zz, fr_pos_curve)
        pix = out.reshape(c, rows, 8, 8, -1)[..., :cols]
        img = jax.vmap(blockops.from_plane_major)(pix)
    else:
        pred_pm = jax.vmap(lowres.upsample_pm)(grids)
        coeffs = quantize.unpack(planes, shift_zz[:, None, :, None],
                                 fr_pos_curve)
        pm = blockops.interleaved_to_pm(coeffs, axis=2)
        blk = hadamard.inverse_pm(pm)
        restored = blk.astype(jnp.int32) + pred_pm.astype(jnp.int32)
        img = jax.vmap(blockops.from_plane_major)(
            jnp.clip(restored, 0, 255).astype(jnp.uint8))
    if use_ycbcr:
        img = ycbcr.ycbcr_to_rgb_planar(img)             # planar, full lanes
    return img                                           # [C, H8, W8]


def parse_container(data: bytes, max_threads: int = 0):
    """Host side of decode: container walk + entropy expansion.

    max_threads mirrors himg::Decoder(max_threads) (decoder.h:24): the cap
    on worker threads for the per-block-row entropy stage (0 = hardware
    concurrency).

    Returns (header, shift_tables, fr_positive, lr_unmap, pred_ids,
    delta_grids, fres) as NumPy arrays ready for _decode_device.
    Raises FormatError on malformed input (the reference returns false with
    a message, decoder.cpp:96-135).
    """
    try:
        return _parse_container(data, max_threads)
    except FormatError:
        raise
    except ValueError as e:
        # Residual safety net for malformed containers; entropy-stage errors
        # are labeled at their call sites in _entropy_chunk.
        raise FormatError(f"malformed HIMG stream ({e})") from e


# A single token can emit at most a 16662-zero run (huffman_common.h:19-28),
# from >= 15 stream bits, so decompressed size is bounded by ~8886x the
# compressed payload.  16662x per payload *byte* is a safely loose ceiling
# used to reject hostile headers before any allocation happens.
_MAX_EXPANSION = 16662


def _entropy_chunk(chunk: bytes, out_size: int, block_size: int, what: str,
                   max_threads: int = 0) -> np.ndarray:
    """Decompress one Huffman chunk with an allocation budget gate."""
    if out_size > max(len(chunk), 1) * _MAX_EXPANSION:
        raise FormatError(
            f"{what} chunk ({len(chunk)} bytes) cannot expand to "
            f"{out_size} bytes")
    try:
        return bitpack.decompress(chunk, out_size, block_size,
                                  max_threads=max_threads)
    except ValueError as e:
        # Present entropy corruption the way the reference does
        # ("Error: Invalid Huffman data.", decoder.cpp:96-135).
        raise FormatError(f"invalid Huffman data in {what} ({e})") from e


def _parse_container(data: bytes, max_threads: int = 0):
    reader = RIFFReader(bytes(data))
    header = FormatHeader.deserialize(reader.find_chunk("FRMT"))
    w, h, c = header.width, header.height, header.num_channels
    # Sanity-gate dimensions before any size arithmetic or allocation: the
    # wire encodes them as int32/uint8 (decoder.cpp:187-196 trusts them;
    # we do not).  The entropy budget gate below bounds the big buffers
    # against the actual input length.
    if not (1 <= w <= 1 << 24 and 1 <= h <= 1 << 24):
        raise FormatError(f"implausible image dimensions {w}x{h}")
    if c < 1:
        raise FormatError("zero channel count")
    has_chroma = header.use_ycbcr and c >= 3
    rows, cols = (h + 7) >> 3, (w + 7) >> 3

    lr_mapper = tables.MappingTable.deserialize(reader.find_chunk("LMAP"))
    if lr_mapper is None:
        raise FormatError("bad LMAP chunk")

    # LRES: predictor maps + delta bytes, one single-stream Huffman blob.
    channel_size = lowres.block_data_size(rows, cols)
    lres = _entropy_chunk(reader.find_chunk("LRES"), channel_size * c, 0,
                          "LRES")
    mr, mc = -(-rows // lowres.MACRO), -(-cols // lowres.MACRO)
    order = _stream_order(rows, cols)
    inv_order = np.empty_like(order)
    inv_order[order] = np.arange(len(order))
    pred_ids = np.empty((c, mr * mc), dtype=np.int32)
    delta_grids = np.empty((c, rows, cols), dtype=np.uint8)
    for chan in range(c):
        part = lres[chan * channel_size:(chan + 1) * channel_size]
        # DecodePredictor adds 2 without masking (downsampled.cpp:36-39);
        # anything outside switch cases 1..4 falls through to the mix
        # predictor (case 0 / default).
        v = part[:mr * mc].astype(np.int32) + 2
        pred_ids[chan] = np.where((v >= 1) & (v <= 4), v, 0)
        delta_grids[chan] = part[mr * mc:][inv_order].reshape(rows, cols)

    qcfg = tables.unpack_quant_config(reader.find_chunk("QCFG"), has_chroma)
    if qcfg is None:
        raise FormatError("bad QCFG chunk")
    luma_shift, chroma_shift = qcfg
    shift_tables = np.tile(luma_shift, (c, 1))
    if has_chroma:
        shift_tables[1:3] = chroma_shift

    fr_mapper = tables.MappingTable.deserialize(reader.find_chunk("FMAP"))
    if fr_mapper is None:
        raise FormatError("bad FMAP chunk")

    # FRES: per-block-row substreams of interleaved coefficient planes.
    block_size = cols * c * 64
    fres = _entropy_chunk(reader.find_chunk("FRES"), rows * block_size,
                          block_size, "FRES", max_threads=max_threads)
    fres = fres.reshape(rows, c, 64, cols)
    return (header, shift_tables, fr_mapper.positive, lr_mapper.unmap_lut,
            pred_ids, delta_grids, fres)


@partial(jax.jit, static_argnames=("use_ycbcr", "shape"))
def _decode_device_fused(fres, delta_grids, pred_ids, shift_tables,
                         fr_pos_curve, lr_unmap, use_ycbcr: bool, shape):
    """Single-pass fused decode to raster channel-packed pixels
    (pallas_kernels.decode_frame_raster); returns u32 [H8, W8] (u8 for
    C == 1)."""
    from ..ops import pallas_kernels as pk
    grids = jax.vmap(
        lambda d, p: lowres.decode_deltas(d, p, lr_unmap, shape)
    )(delta_grids, pred_ids)
    shift_zz = shift_tables[:, np.asarray(tables.ZIGZAG)]
    return pk.decode_frame_raster(fres, grids, shift_zz, fr_pos_curve,
                                  use_ycbcr)


def decode(data: bytes, max_threads: int = 0) -> np.ndarray:
    """Decode HIMG bytes to an [H, W, C] uint8 image.

    max_threads caps the host entropy worker threads, mirroring
    himg::Decoder(max_threads); 0 means hardware concurrency.
    """
    (header, shift_tables, fr_pos, lr_unmap,
     pred_ids, delta_grids, fres) = parse_container(data, max_threads)
    from ..ops import pallas_kernels as pk
    has_chroma = header.use_ycbcr and header.num_channels >= 3
    c = header.num_channels
    rows, cols = fres.shape[0], fres.shape[-1]
    # Any width takes the fused kernel: decode_frames_raster pads the
    # block-column axis in-graph and crops the raster back, so odd
    # geometries keep full speed (matching decoder.cpp:331-426).
    if pk.default_enabled() and c in (1, 3, 4):
        packed = np.asarray(_decode_device_fused(
            jnp.asarray(fres), jnp.asarray(delta_grids),
            jnp.asarray(pred_ids), jnp.asarray(shift_tables),
            jnp.asarray(fr_pos), jnp.asarray(lr_unmap), has_chroma,
            (rows, cols)))
        if c == 1:
            img = packed[..., None]
        else:
            # Byte view of the packed-u32 raster buffer (zero-copy when
            # contiguous; the axon client hands back a *strided* host view
            # for widths the kernel cropped in-graph, where .view raises --
            # ascontiguousarray no-ops on every other backend/geometry).
            img = np.ascontiguousarray(packed).view(np.uint8).reshape(
                rows * 8, cols * 8, 4)[..., :c]
        return img[:header.height, :header.width, :]
    img = _decode_device(
        jnp.asarray(fres), jnp.asarray(delta_grids), jnp.asarray(pred_ids),
        jnp.asarray(shift_tables), jnp.asarray(fr_pos),
        jnp.asarray(lr_unmap), has_chroma, use_pallas=pk.default_enabled())
    return np.asarray(img)[:header.height, :header.width, :]
