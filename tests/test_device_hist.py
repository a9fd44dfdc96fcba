"""Device-side token histograms + assisted host entropy encode.

The assisted path (entropy/device_hist.py -> native.compress_assisted)
must be byte-identical to the plain encoder for any content: the
histogram drives the Huffman tree, so a single off-by-one bin would
change every code in the stream.  Reference semantics being pinned:
huffman_enc.cpp:246-300 (tokenization) via entropy.cpp TokenizeBlock.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from himg_tpu.entropy import bitpack, native
from himg_tpu.entropy.device_hist import block_histograms

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native codec unavailable")


def _host_block_hists(x: np.ndarray, bs: int) -> np.ndarray:
    return np.stack([native.histogram(x[i * bs:(i + 1) * bs], 0)
                     for i in range(x.size // bs)])


def _cases():
    rng = np.random.default_rng(7)
    cases = []
    for zfrac in (0.0, 0.5, 0.95, 1.0):
        x = rng.integers(0, 256, 2048 * 5, dtype=np.uint8)
        x[rng.random(x.size) < zfrac] = 0
        cases.append((f"zfrac{zfrac}", x, 2048))
    # Runs at every class border and around the kMaxRun chunk cap, at
    # varying alignments relative to the 8-byte words the long-run
    # enumeration works on.
    for run in (1, 2, 3, 6, 7, 8, 22, 23, 24, 278, 279, 280,
                16661, 16662, 16663, 16664, 33325):
        lead = int(rng.integers(0, 17))
        x = np.concatenate([
            rng.integers(1, 256, lead, dtype=np.uint8),
            np.zeros(run, np.uint8),
            rng.integers(1, 256, 64, dtype=np.uint8)])
        bs = x.size + (-x.size) % 8
        x = np.concatenate(
            [x, rng.integers(1, 256, bs - x.size, dtype=np.uint8)])
        cases.append((f"run{run}@{lead}", x, bs))
    x = np.zeros(2048, np.uint8)
    x[:10] = 5
    cases.append(("block_tail_run", x, 1024))
    cases.append(("alternating", np.tile(np.array([0, 7], np.uint8), 1024),
                  2048))
    for seed in range(4):
        r2 = np.random.default_rng(seed + 100)
        x = r2.integers(0, 256, 4096 * 3, dtype=np.uint8)
        for p in r2.integers(0, x.size - 40, 150):
            x[p:p + int(r2.integers(1, 40))] = 0
        cases.append((f"fuzz{seed}", x, 4096))
    return cases


@pytest.mark.parametrize("name,x,bs", _cases(),
                         ids=[c[0] for c in _cases()])
def test_block_histograms_exact(name, x, bs):
    want = _host_block_hists(x, bs).astype(np.int32)
    got = np.asarray(block_histograms(jnp.asarray(x.reshape(-1, bs))))
    assert np.array_equal(got, want)


@pytest.mark.parametrize("name,x,bs", _cases(),
                         ids=[c[0] for c in _cases()])
def test_compress_assisted_byte_identity(name, x, bs):
    hist = native.histogram(x, bs)
    assert native.compress_assisted(x, bs, hist) == native.compress(x, bs)


def test_compress_assisted_single_stream():
    rng = np.random.default_rng(3)
    x = rng.integers(0, 8, 100000, dtype=np.uint8)
    hist = native.histogram(x, 0)
    assert native.compress_assisted(x, 0, hist) == native.compress(x, 0)


def test_compress_assisted_dispatch():
    rng = np.random.default_rng(4)
    x = rng.integers(0, 64, 8192, dtype=np.uint8)
    x[rng.random(x.size) < 0.5] = 0
    hist = np.asarray(block_histograms(
        jnp.asarray(x.reshape(-1, 1024)))).sum(0).astype(np.int64)
    assert bitpack.compress_assisted(x, 1024, hist) == \
        bitpack.compress(x, 1024)


def test_compress_assisted_rejects_bad_args():
    x = np.zeros(100, np.uint8)
    with pytest.raises(ValueError):
        native.compress_assisted(x, 0, np.zeros(5, np.int64))
    with pytest.raises(ValueError):  # inconsistent all-zero histogram
        native.compress_assisted(x, 0, np.zeros(261, np.int64))


def test_block_histograms_rejects_unaligned():
    with pytest.raises(ValueError):
        block_histograms(jnp.zeros((2, 12), jnp.uint8))


def test_batch_codec_input_validation():
    """_check_input raises (not asserts) so 'python -O' stays safe."""
    from himg_tpu.pipeline.batch import BatchCodec
    codec = BatchCodec(16, 16, 3, 50, True, pixel_format="packed")
    with pytest.raises(ValueError):
        codec.encode_batch(np.zeros((1, 16, 8), np.uint32))
    with pytest.raises(TypeError):
        codec.encode_batch(np.zeros((1, 16, 16), np.uint8))
