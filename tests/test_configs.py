"""BASELINE.json configs 1 and 2, at their literal sizes."""

import numpy as np

import himg_tpu

from util import make_image, oracle_decode, oracle_encode


def test_config1_512x512_grayscale(oracle_dir, tmp_path):
    """Config 1: 512x512 grayscale, default quality, bit-exact roundtrip."""
    img = make_image(512, 512, 1, seed=101, noise=12)
    ref = oracle_encode(oracle_dir, img, 50, False, tmp_path)
    assert himg_tpu.encode(img, 50, False) == ref
    ref_dec = oracle_decode(oracle_dir, ref, tmp_path)
    assert ref_dec is not None
    assert np.array_equal(himg_tpu.decode(ref), ref_dec)


def test_config2_768x512_rgb_ycbcr(oracle_dir, tmp_path):
    """Config 2: 768x512 RGB with YCbCr, default quality."""
    img = make_image(512, 768, 3, seed=102, noise=12)
    ref = oracle_encode(oracle_dir, img, 50, True, tmp_path)
    assert himg_tpu.encode(img, 50, True) == ref
    ref_dec = oracle_decode(oracle_dir, ref, tmp_path)
    assert ref_dec is not None
    assert np.array_equal(himg_tpu.decode(ref), ref_dec)
