"""Experimental device-side entropy encode vs the reference spec."""

import numpy as np
import pytest

import jax.numpy as jnp

from himg_tpu.entropy import bitpack, tpu_stage


@pytest.mark.parametrize("n,bs,zf", [
    (4096, 512, 0.5), (8192, 1024, 0.9), (2048, 2048, 0.2),
    (32768, 512, 0.95), (1280, 64, 0.99), (4096, 0, 0.6),
])
def test_device_packer_byte_identical(n, bs, zf):
    rng = np.random.default_rng(13)
    data = np.where(rng.random(n) < zf, 0,
                    rng.integers(0, 256, n)).astype(np.uint8)
    ref = bitpack.compress_py(data, bs)
    got = tpu_stage.compress_device(jnp.asarray(data), bs if bs else n)
    assert got == ref


def test_device_packer_decodes():
    rng = np.random.default_rng(14)
    data = np.where(rng.random(8192) < 0.8, 0,
                    rng.integers(0, 256, 8192)).astype(np.uint8)
    comp = tpu_stage.compress_device(jnp.asarray(data), 512)
    out = bitpack.decompress(comp, 8192, 512)
    assert np.array_equal(out, data)


@pytest.mark.parametrize("n,bs,zf", [
    (12800, 800, 0.7), (4096, 512, 0.95), (2048, 0, 0.3),
    (6400, 64, 0.99), (1600, 400, 1.0),
])
def test_device_decoder_byte_identical(n, bs, zf):
    from himg_tpu.entropy import tpu_decode
    rng = np.random.default_rng(15)
    data = np.where(rng.random(n) < zf, 0,
                    rng.integers(0, 256, n)).astype(np.uint8)
    blob = bitpack.compress(data, bs)
    got = tpu_decode.decode_device(blob, n, bs)
    assert np.array_equal(got, data)


def test_device_decoder_rejects_deep_trees():
    from himg_tpu.entropy import tpu_decode
    # A skewed histogram that forces code lengths past the 16-bit LUT
    # reach must raise (callers fall back to the host codec).
    from himg_tpu.entropy.huffman import build_code
    hist = np.zeros(261, np.int64)
    f = 1
    for s in range(24):
        hist[s] = f
        f = min(f * 2, 1 << 40)
    code = build_code(hist)
    if int(code.bits.max()) > 16:
        with pytest.raises(ValueError):
            tpu_decode.build_lut16(code.codes, code.bits)
