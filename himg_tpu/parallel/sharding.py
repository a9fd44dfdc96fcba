"""Multi-chip sharded encode/decode over a jax.sharding.Mesh.

The HIMG format was designed for hardware parallelism (per-block-row
Huffman substreams, coefficient-major interleave, an up-front low-res
layer); this module maps that structure onto a TPU mesh:

- axis "batch": data parallelism over independent images (config 4's
  256x1080p batches; trivially parallel).
- axis "rows": spatial parallelism over 8-pixel block rows within one
  image (configs 5's 4K/8K single images).  Block rows are independent
  after the low-res layer is known, which is exactly the property the
  format's substream design exists to provide (README.md:27-29).

Collective structure per step (all over ICI):
- 8-row halo exchange (ppermute) for the low-res window sums that peek
  up to 3/4 pixels across a shard edge;
- 1-row ppermute for the phase-compensation blend;
- all_gather of the low-res sample grid (1/64 of the pixels) so the
  macro-block predictive scan -- which crosses row-shard boundaries --
  runs replicated instead of serialized across shards;
- everything heavy (WHT, quantize, companding, interleave) stays local.

Host-side entropy coding then consumes per-shard interleaved planes; the
261-bin histogram reduction is the only global step (psum-shaped, done on
host after a device->host copy of per-row planes).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..ops import blocks as blockops
from ..ops import hadamard, lowres, quantize, ycbcr


def make_mesh(n_batch: int = 1, n_rows: int = 1, devices=None) -> Mesh:
    """Build a (batch, rows) mesh from the available devices."""
    if devices is None:
        devices = jax.devices()
    assert n_batch * n_rows <= len(devices)
    dev = np.asarray(devices[:n_batch * n_rows]).reshape(n_batch, n_rows)
    return Mesh(dev, ("batch", "rows"))


def _sample_rows_sharded(plane, h: int, row_start: int):
    """Low-res sample rows for a local [hL, W] slab with halo exchange.

    Equivalent to lowres.sample_image restricted to this shard's block
    rows; `row_start` is the first global pixel row, h the global height.
    """
    hl, w = plane.shape
    axis = "rows"
    n = jax.lax.axis_size(axis)
    idx = jax.lax.axis_index(axis)

    # 8-row halos (windows reach 3 rows up / 4 rows down).
    up = jax.lax.ppermute(plane[-8:], axis,
                          [(i, (i + 1) % n) for i in range(n)])
    down = jax.lax.ppermute(plane[:8], axis,
                            [(i, (i - 1) % n) for i in range(n)])
    ext = jnp.concatenate([up, plane, down], axis=0)  # [hL+16, W]

    x = ext.astype(jnp.int32)
    ii = jnp.pad(jnp.cumsum(jnp.cumsum(x, axis=0), axis=1), ((1, 0), (1, 0)))

    rl = hl >> 3
    v_global = (row_start >> 3) + jnp.arange(rl)
    # Window rows in ext coordinates (global minus (row_start - 8)).
    y0 = jnp.maximum(0, v_global * 8 - 3) - (row_start - 8)
    y1 = jnp.minimum(h - 1, v_global * 8 + 4) - (row_start - 8)
    # First/last shards have no real halo; clamp into the valid region.
    y0 = jnp.clip(y0, jnp.where(idx == 0, 8, 0), hl + 16)
    y1 = jnp.clip(y1, 0, jnp.where(idx == n - 1, hl + 7, hl + 15))

    # Block rows past the true image height (row padding for even shard
    # division) produce don't-care values; guard the window against
    # degenerate/empty ranges there.
    y1 = jnp.maximum(y1, y0)

    cols = (w + 7) >> 3
    u = jnp.arange(cols)
    x0 = jnp.maximum(0, u * 8 - 3)
    x1 = jnp.minimum(w - 1, u * 8 + 4)
    # Gather the 4 integral-image corners via dynamic row indexing.
    s = (ii[y1 + 1][:, x1 + 1] - ii[y0][:, x1 + 1]
         - ii[y1 + 1][:, x0] + ii[y0][:, x0])
    count = jnp.maximum((y1 - y0 + 1)[:, None] * (x1 - x0 + 1)[None, :], 1)
    avg = (s + (count >> 1)) // count                  # [rL, cols]

    # Phase compensation: left blend locally, up blend needs 1 halo row.
    left = jnp.concatenate([avg[:, :1], avg[:, :-1]], axis=1)
    a = (left + 15 * avg + 8) >> 4
    prev = jax.lax.ppermute(a[-1:], axis, [(i, (i + 1) % n) for i in range(n)])
    prev_rows = jnp.concatenate([jnp.where(idx == 0, a[:1], prev), a[:-1]],
                                axis=0)
    return ((prev_rows + 15 * a + 8) >> 4).astype(jnp.uint8)


def _encode_shard_body(img, shift_tables, fr_thresholds, lr_map_small, lr_unmap,
                       *, h: int, use_ycbcr: bool, rows_true: int = 0):
    """shard_map body: [hL, W, C] slab -> local planes + replicated low-res.

    Returns (fres_local [rL, C, 64, cols], pred_ids [C, MR, MC],
    delta_grid [C, R_true, Cc]) -- the latter two replicated across shards.
    `h` is the true pixel height; when the padded height (for even shard
    division) exceeds ceil(h/8) block rows, `rows_true` limits the low-res
    layer and the extra block rows carry don't-care planes (dropped at
    bitstream assembly).
    """
    axis = "rows"
    n = jax.lax.axis_size(axis)
    idx = jax.lax.axis_index(axis)
    hl = img.shape[0]
    row_start = idx * hl

    chans = jnp.moveaxis(img, -1, 0)                   # [C, hL, W]
    if use_ycbcr:
        chans = ycbcr.rgb_to_ycbcr_planar(chans)

    local_rows = jax.vmap(
        lambda p: _sample_rows_sharded(p, h, row_start))(chans)
    # Full low-res grid everywhere: tiny (1/64 of pixels), and the
    # macro-block feedback scan crosses shard rows.
    grids = jax.lax.all_gather(local_rows, axis, axis=1, tiled=True)
    r_pad = grids.shape[1]
    if not rows_true:
        rows_true = r_pad
    if rows_true < r_pad:
        # Replicate the last true sample row into the padding so edge
        # blocks see exactly the reference's clamped interpolation.
        row_idx = np.minimum(np.arange(r_pad), rows_true - 1)
        grids_up = grids[:, row_idx]
        grids = grids[:, :rows_true]
    else:
        grids_up = grids

    pred_ids = jax.vmap(lowres.select_predictors)(grids)
    effective = jnp.where(pred_ids <= 1, 0, pred_ids)
    delta_grids = jax.vmap(
        lambda g, p: lowres.encode_deltas(g, p, lr_map_small, lr_unmap)
    )(grids, effective)
    grids = grids_up

    # Local full-res path in plane-major layout; predictor blocks sliced
    # from the gathered grid (upsample needs one sample row below the slab).
    rl = hl >> 3
    pred_pm_full = jax.vmap(lowres.upsample_pm)(grids)  # [C, R, 8, 8, cols]
    v0 = row_start >> 3
    pred_pm = jax.lax.dynamic_slice_in_dim(pred_pm_full, v0, rl, 1)

    padded = jax.vmap(blockops.pad_to_blocks)(chans)
    pm = jax.vmap(blockops.to_plane_major)(padded).astype(jnp.int16)
    coeffs = hadamard.forward_pm(pm - pred_pm)
    inter = blockops.pm_to_interleaved(coeffs, axis=2)
    from ..format import tables as _tables
    shift_zz = shift_tables[:, np.asarray(_tables.ZIGZAG)]
    packed = quantize.pack(inter, shift_zz[:, None, :, None], fr_thresholds)
    return jnp.moveaxis(packed, 0, 1), pred_ids, delta_grids


def build_sharded_encode(mesh: Mesh, h: int, w: int, c: int,
                         use_ycbcr: bool):
    """Jitted sharded encode transform for [B, H, W, C] batches.

    B is sharded over mesh axis "batch", H over "rows" (H/n_rows must be a
    multiple of 8; use pad_to_blocks first for odd sizes).  Returns a
    function (imgs, shift_tables, fr_thresholds, lr_map_small, lr_unmap) ->
    (fres [B, rows, C, 64, cols], pred_ids [B, C, MR, MC],
     delta_grids [B, C, R, Cc]).
    """
    n_rows = mesh.shape["rows"]
    assert h % (8 * n_rows) == 0, "height must split into 8-row multiples"

    body = partial(_encode_shard_body, h=h, use_ycbcr=use_ycbcr)
    return _finish_sharded_encode(mesh, body)


def _finish_sharded_encode(mesh, body):
    inner = jax.shard_map(
        jax.vmap(body, in_axes=(0, None, None, None, None)),
        mesh=mesh,
        in_specs=(P("batch", "rows", None, None), P(), P(), P(), P()),
        out_specs=(P("batch", "rows", None, None, None), P("batch"),
                   P("batch")),
        # pred/delta outputs are replicated over "rows" by construction
        # (computed from the all-gathered grid); the static checker cannot
        # prove it, so disable the varying-axes check.
        check_vma=False,
    )
    return jax.jit(inner)


def _decode_shard_body(fres_local, grids, shift_tables, fr_pos_curve,
                       *, use_ycbcr: bool):
    """shard_map body: local interleaved planes -> local pixel slab."""
    axis = "rows"
    idx = jax.lax.axis_index(axis)
    rl = fres_local.shape[0]
    v0 = idx * rl

    planes = jnp.moveaxis(fres_local, 1, 0)            # [C, rL, 64, cols]
    from ..format import tables as _tables
    shift_zz = shift_tables[:, np.asarray(_tables.ZIGZAG)]
    coeffs = quantize.unpack(planes, shift_zz[:, None, :, None], fr_pos_curve)
    pm = blockops.interleaved_to_pm(coeffs, axis=2)
    blk = hadamard.inverse_pm(pm)
    pred_full = jax.vmap(lowres.upsample_pm)(grids)
    pred_pm = jax.lax.dynamic_slice_in_dim(pred_full, v0, rl, 1)
    restored = blk.astype(jnp.int32) + pred_pm.astype(jnp.int32)
    img = jax.vmap(blockops.from_plane_major)(
        jnp.clip(restored, 0, 255).astype(jnp.uint8))
    if use_ycbcr:
        img = ycbcr.ycbcr_to_rgb_planar(img)
    return jnp.moveaxis(img, 0, -1)


def build_sharded_decode(mesh: Mesh, h: int, w: int, c: int,
                         use_ycbcr: bool):
    """Jitted sharded decode transform.

    (fres [B, rows, C, 64, cols] sharded (batch, rows),
     delta_grids [B, C, R, Cc], pred_ids [B, C, MR*MC], shift_tables,
     fr_pos_curve, lr_unmap) -> [B, H8, W8, C] sharded (batch, rows).

    The low-res delta integration runs replicated (it is 1/64 of the data
    and crosses shard rows); the heavy per-block stages stay local.
    """
    n_rows = mesh.shape["rows"]
    assert h % (8 * n_rows) == 0

    def replicated_lowres(delta_grids, pred_ids, lr_unmap):
        r, cc = delta_grids.shape[-2], delta_grids.shape[-1]
        return jax.vmap(
            lambda d, p: lowres.decode_deltas(d, p, lr_unmap, (r, cc))
        )(delta_grids, pred_ids)

    body = partial(_decode_shard_body, use_ycbcr=use_ycbcr)

    rows_pad = ((h + 7) >> 3)

    def shard_fn(fres, delta_grids, pred_ids, shift_tables, fr_pos_curve,
                 lr_unmap):
        def one(fres_b, dg_b, pi_b):
            grids = replicated_lowres(dg_b, pi_b, lr_unmap)
            r_true = grids.shape[1]
            if r_true < rows_pad:
                # Edge-replicate into row padding (== reference clamping).
                row_idx = np.minimum(np.arange(rows_pad), r_true - 1)
                grids = grids[:, row_idx]
            return body(fres_b, grids, shift_tables, fr_pos_curve)
        return jax.vmap(one)(fres, delta_grids, pred_ids)

    inner = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P("batch", "rows", None, None, None), P("batch"),
                  P("batch"), P(), P(), P()),
        out_specs=P("batch", "rows", None, None),
    )
    return jax.jit(inner)


# --------------------------------------------------------------------------
# Whole-image sharded encode/decode (config 5: 4K/8K single images).
# --------------------------------------------------------------------------

def _pad_rows_for_mesh(h: int, n_rows: int) -> int:
    """Padded pixel height: block rows divisible by the row-shard count."""
    rows = (h + 7) >> 3
    rows_pad = -(-rows // n_rows) * n_rows
    return rows_pad * 8


def encode_image_sharded(mesh: Mesh, image, quality: int = 50,
                         use_ycbcr: bool = True) -> bytes:
    """Encode one large [H, W, C] image across the mesh's "rows" axis.

    The transform stages run sharded over 8-pixel block rows (halo
    ppermutes + low-res all_gather, see module docstring); the bitstream is
    then assembled from the per-block-row substreams, which the format
    makes independent (huffman_enc.cpp:342-358) -- the entropy stage
    parallelizes over the same rows on the host.  Output is byte-identical
    to the single-device encoder.
    """
    from ..pipeline.encode import EncodeTables, assemble_container

    img = np.asarray(image, dtype=np.uint8)
    if img.ndim == 2:
        img = img[..., None]
    h, w, c = img.shape
    use_ycbcr = bool(use_ycbcr) and c >= 3
    n_rows = mesh.shape["rows"]
    rows_true = (h + 7) >> 3
    h_pad = _pad_rows_for_mesh(h, n_rows)

    # Host-side pad: reference bottom-pad quirks up to the true block grid,
    # anything (zeros) beyond -- those block rows are dropped below.
    h8, w8 = rows_true * 8, ((w + 7) >> 3) * 8
    padded = np.zeros((h_pad, w8, c), dtype=np.uint8)
    for chan in range(c):
        padded[:h8, :, chan] = np.asarray(
            blockops.pad_to_blocks(jnp.asarray(img[..., chan])))

    et = EncodeTables(quality, use_ycbcr, c)
    lr = et.lr_mapper
    body = partial(_encode_shard_body, h=h, use_ycbcr=use_ycbcr,
                   rows_true=rows_true)
    enc = _finish_sharded_encode(mesh, body)
    args = (padded[None], np.asarray(et.shift_tables),
            np.asarray(et.fr_mapper.pack_thresholds),
            np.asarray(lr.map_lut[32768 - 511:32768 + 512]),
            np.asarray(lr.unmap_lut))
    if jax.process_count() > 1:
        # Every process holds the full input (images are small relative to
        # the mesh); materialize global arrays with the mesh shardings so
        # the jitted shard_map sees one global batch.
        from jax.sharding import NamedSharding
        specs = (P("batch", "rows", None, None), P(), P(), P(), P())
        args = tuple(
            jax.make_array_from_callback(
                a.shape, NamedSharding(mesh, sp), lambda idx, a=a: a[idx])
            for a, sp in zip(args, specs))
    else:
        args = tuple(jnp.asarray(a) for a in args)
    fres, pred_ids, delta_grids = enc(*args)
    cols = (w + 7) >> 3
    fres_stream = _assemble_fres_sharded(fres, rows_true, cols * c * 64)
    return assemble_container(w, h, c, et, np.asarray(pred_ids)[0],
                              np.asarray(delta_grids)[0], None,
                              fres_stream=fres_stream)


def _assemble_fres_sharded(fres, rows_true: int, block_size: int) -> bytes:
    """Per-shard entropy coding of the sharded FRES planes (SURVEY.md §5).

    No host ever materializes the full coefficient array: each row shard's
    planes are copied out and tokenized/packed locally --

      per-shard 261-bin histogram  ->  summed (the psum; on a multi-host
      deployment this is a tiny jax allreduce of 261 ints)
      ->  host tree build (shared code table, broadcast)
      ->  per-shard local pack against the shared table
      ->  directory concatenation + length prefixes + stale-bit replay.

    Byte-identical to the single-host funnel because rows are shard-
    aligned: per-row tokenization is independent (the format property from
    huffman_enc.cpp:342-358) and the shared tree comes from the identical
    global histogram.  Row padding beyond rows_true is dropped per shard.
    """
    from ..entropy import bitpack, native
    from ..entropy.huffman import build_code

    # Row-ordered local pieces: [rows_shard, C, 64, cols] each.  With a
    # single host every shard is addressable; on multi-host each process
    # sees only its row shards -- the 261-bin histogram is summed across
    # processes (the psum of SURVEY.md section 5, 261 ints), every process
    # builds the identical shared tree, packs its local rows against it,
    # and the length-prefixed parts are all-gathered in global row order
    # for the directory concatenation (the TPU-side equivalent of the
    # format's substream independence, huffman_enc.cpp:342-358).
    multihost = not fres.is_fully_addressable
    seen = set()
    shards = []
    for s in fres.addressable_shards:
        r0 = s.index[1].start or 0
        if r0 in seen:          # replicated copies on a >1 "batch" axis
            continue
        seen.add(r0)
        shards.append((r0, s))
    shards.sort(key=lambda t: t[0])
    pieces = []                 # (global_row0, flat bytes) in row order
    for r0, s in shards:
        arr = np.asarray(s.data)[0]           # [rows_shard, C, 64, cols]
        keep = min(arr.shape[0], max(rows_true - r0, 0))
        if keep:
            pieces.append((r0, np.ascontiguousarray(arr[:keep]).reshape(-1)))
    use_native = native.available()
    hist = np.zeros(261, dtype=np.int64)
    for _, p in pieces:
        hist += (native.histogram(p, block_size) if use_native
                 else bitpack.histogram_py(p, block_size))
    total = rows_true * block_size
    if multihost:
        from jax.experimental import multihost_utils as _mh
        hist = np.asarray(_mh.process_allgather(hist)).sum(axis=0)
    code = build_code(hist)
    if use_native:
        parts = [(r0, native.pack_with_code(p, block_size, code.codes,
                                            code.bits))
                 for r0, p in pieces]
    else:
        parts = [(r0, bitpack.pack_with_code_py(p, block_size, code))
                 for r0, p in pieces]
    if multihost:
        parts = _allgather_parts(parts)
    parts = [part for _, part in sorted(parts, key=lambda t: t[0])]
    return bitpack.assemble_parts(code, parts,
                                  use_blocks=block_size < total)


def _allgather_parts(local_parts):
    """All-gather per-shard packed parts across processes (row-tagged).

    Each part is (row0, (payload u8[total], sizes i64[n], bits i64[n])).
    Every process receives the full list; fixed-shape exchange via two
    process_allgather rounds (sizes first, then padded payload bytes).
    """
    from jax.experimental import multihost_utils as _mh

    blobs = []
    for r0, (payload, sizes, bits) in local_parts:
        n = len(sizes)
        head = np.asarray([r0, n, payload.size], dtype=np.int64)
        blobs.append(np.concatenate([
            head.view(np.uint8),
            np.ascontiguousarray(sizes, dtype=np.int64).view(np.uint8),
            np.ascontiguousarray(bits, dtype=np.int64).view(np.uint8),
            np.ascontiguousarray(payload, dtype=np.uint8)]))
    local = (np.concatenate(blobs) if blobs else np.zeros(0, np.uint8))
    counts = np.asarray(_mh.process_allgather(
        np.asarray([len(local_parts), local.size], dtype=np.int64)))
    pad = int(counts[:, 1].max())
    buf = np.zeros(pad, np.uint8)
    buf[:local.size] = local
    gathered = np.asarray(_mh.process_allgather(buf))
    parts = []
    for pi in range(gathered.shape[0]):
        data, pos = gathered[pi], 0
        for _ in range(int(counts[pi, 0])):
            r0, n, psize = data[pos:pos + 24].copy().view(np.int64)
            pos += 24
            sizes = data[pos:pos + 8 * n].copy().view(np.int64)
            pos += 8 * n
            bits = data[pos:pos + 8 * n].copy().view(np.int64)
            pos += 8 * n
            payload = data[pos:pos + psize].copy()
            pos += int(psize)
            parts.append((int(r0), (payload, sizes, bits)))
    return parts


def decode_image_sharded(mesh: Mesh, data: bytes) -> np.ndarray:
    """Decode a HIMG blob with the transform stages sharded over the mesh."""
    from ..pipeline.decode import parse_container

    (header, shift_tables, fr_pos, lr_unmap,
     pred_ids, delta_grids, fres) = parse_container(data)
    h, w, c = header.height, header.width, header.num_channels
    use_ycbcr = header.use_ycbcr and c >= 3
    n_rows = mesh.shape["rows"]
    rows_true = (h + 7) >> 3
    h_pad = _pad_rows_for_mesh(h, n_rows)
    rows_pad = h_pad // 8

    fres_pad = np.zeros((rows_pad,) + fres.shape[1:], dtype=np.uint8)
    fres_pad[:rows_true] = fres
    dec = build_sharded_decode(mesh, h_pad, w, c, use_ycbcr)
    out = dec(jnp.asarray(fres_pad[None]), jnp.asarray(delta_grids[None]),
              jnp.asarray(pred_ids[None]), jnp.asarray(shift_tables),
              jnp.asarray(fr_pos), jnp.asarray(lr_unmap))
    return np.asarray(out)[0, :h, :w, :]
