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
