"""Entropy layer conformance vs the reference oracle + self roundtrips."""

import subprocess

import numpy as np
import pytest

from himg_tpu.entropy import bitpack, rle
from himg_tpu.entropy.huffman import build_code, parse_tree

CASES = [
    # (size, block_size, zero_fraction)
    (4096, 0, 0.5),
    (4096, 512, 0.5),
    (8192, 1024, 0.9),
    (4096, 4096, 0.2),
    (32768, 512, 0.95),
    (100000, 0, 0.99),
    (256, 0, 1.0),          # all zeros
    (70000, 0, 0.999),      # long runs incl. >16662 splits
    (640, 64, 0.97),        # many tiny blocks
]


def _data(n, zero_frac, seed=0):
    rng = np.random.default_rng(seed)
    return np.where(rng.random(n) < zero_frac, 0,
                    rng.integers(0, 256, n)).astype(np.uint8)


@pytest.mark.parametrize("n,bs,zf", CASES)
def test_compress_matches_reference(oracle_dir, tmp_path, n, bs, zf):
    data = _data(n, zf)
    raw = tmp_path / "in.raw"
    out = tmp_path / "ref.bin"
    data.tofile(raw)
    subprocess.run([str(oracle_dir / "oracle_huff"), "enc", str(raw),
                    str(bs), str(out)], check=True)
    assert bitpack.compress(data, bs) == out.read_bytes()


@pytest.mark.parametrize("n,bs,zf", CASES)
def test_roundtrip(n, bs, zf):
    data = _data(n, zf, seed=1)
    comp = bitpack.compress(data, bs)
    dec = bitpack.decompress(comp, n, bs if 0 < bs < n else 0)
    assert np.array_equal(dec, data)


@pytest.mark.parametrize("n,bs,zf", [(4096, 512, 0.5), (8192, 1024, 0.95)])
def test_decode_reference_output(oracle_dir, tmp_path, n, bs, zf):
    data = _data(n, zf, seed=2)
    raw = tmp_path / "in.raw"
    out = tmp_path / "ref.bin"
    data.tofile(raw)
    subprocess.run([str(oracle_dir / "oracle_huff"), "enc", str(raw),
                    str(bs), str(out)], check=True)
    dec = bitpack.decompress(out.read_bytes(), n, bs if 0 < bs < n else 0)
    assert np.array_equal(dec, data)


def test_tree_roundtrip():
    hist = np.zeros(261, dtype=np.int64)
    hist[[0, 17, 255, 256, 260]] = [100, 5, 1, 50, 7]
    code = build_code(hist)
    tree_bytes, _ = bitpack._bits_to_bytes(code.tree_bits)
    codes, bits, _ = parse_tree(bytes(tree_bytes))
    assert np.array_equal(codes, code.codes)
    assert np.array_equal(bits, code.bits)


def test_rle_tokens_cover_input():
    data = _data(2048, 0.9, seed=3).reshape(4, 512)
    sym, extra, ebits, counts = rle.tokenize_rows(data)
    # Reconstruct lengths: literals contribute 1, run symbols their span.
    spans = {256: 2, 257: 3, 258: 7, 259: 23, 260: 279}
    for r in range(4):
        total = 0
        for t in range(counts[r]):
            s = sym[r, t]
            total += spans[int(s)] + int(extra[r, t]) if s >= 256 else 1
        assert total == 512


def test_corrupt_stream_raises():
    data = _data(4096, 0.5, seed=4)
    comp = bytearray(bitpack.compress(data, 0))
    with pytest.raises(ValueError):
        bitpack.decompress(bytes(comp[:10]), 4096, 0)
    comp2 = bytes(comp[:-10])
    with pytest.raises(ValueError):
        bitpack.decompress(comp2, 4096, 0)


def test_native_builds_when_toolchain_present():
    """With g++ on PATH the native codec MUST build: a compile error must
    fail CI loudly, not silently fall back to the NumPy path (a committed
    build break once hid behind the available() skips below)."""
    import shutil
    if shutil.which("g++") is None:
        pytest.skip("no g++ on PATH")
    import os
    if os.environ.get("HIMG_NATIVE", "1") in ("0", "false", ""):
        pytest.skip("native explicitly disabled")
    from himg_tpu.native.build import build
    assert build(force=True) is not None, "native entropy codec failed to compile"
    from himg_tpu.entropy import native
    assert native.available()


def test_native_backend_parity():
    """Native C++ codec must be byte-identical to the NumPy spec."""
    from himg_tpu.entropy import native
    if not native.available():
        pytest.skip("native toolchain unavailable")
    rng = np.random.default_rng(11)
    for (n, bs, zf) in [(4096, 512, 0.6), (8192, 0, 0.95), (256, 0, 1.0),
                        (70000, 0, 0.999), (640, 64, 0.97)]:
        data = np.where(rng.random(n) < zf, 0,
                        rng.integers(0, 256, n)).astype(np.uint8)
        assert native.compress(data, bs) == bitpack.compress_py(data, bs)
        comp = native.compress(data, bs)
        dec = native.decompress(comp, n, bs if 0 < bs < n else 0)
        assert np.array_equal(dec, data)


def test_native_rejects_corrupt():
    from himg_tpu.entropy import native
    if not native.available():
        pytest.skip("native toolchain unavailable")
    rng = np.random.default_rng(12)
    data = np.where(rng.random(4096) < 0.5, 0,
                    rng.integers(0, 256, 4096)).astype(np.uint8)
    comp = native.compress(data, 512)
    with pytest.raises(ValueError):
        native.decompress(comp[:16], 4096, 512)
    with pytest.raises(ValueError):
        native.decompress(comp[:-8], 4096, 512)
    # fuzz: random flips must never crash
    for seed in range(40):
        r2 = np.random.default_rng(seed)
        buf = bytearray(comp)
        for _ in range(8):
            buf[int(r2.integers(0, len(buf)))] = int(r2.integers(0, 256))
        try:
            native.decompress(bytes(buf), 4096, 512)
        except ValueError:
            pass


def test_native_tokenizer_edge_cases():
    """SIMD tokenizer edges: kMaxRun splits, runs straddling the 16/64-byte
    chunk boundaries, worst-case segment density, lone zeros at limits --
    all byte-identical to the NumPy spec."""
    from himg_tpu.entropy import native
    if not native.available():
        pytest.skip("native toolchain unavailable")
    rng = np.random.default_rng(123)
    cases = []
    for n_z in (16661, 16662, 16663, 16664, 33325):  # kMaxRun boundaries
        cases.append((np.concatenate([
            np.array([7], np.uint8), np.zeros(n_z, np.uint8),
            np.array([9], np.uint8)]), 0))
    for off in (62, 63, 64, 65, 127, 128):  # SIMD chunk boundaries
        d = np.full(256, 5, np.uint8)
        d[off:off + 2] = 0
        cases.append((d, 0))
        d2 = np.full(256, 5, np.uint8)
        d2[off] = 0  # lone zero = literal symbol 0
        cases.append((d2, 0))
    w = np.zeros(3072, np.uint8)
    w[::3] = 7  # worst-case segment density: (1 literal, 2 zeros) repeating
    cases.append((w, 0))
    cases.append((np.zeros(2048, np.uint8), 64))
    for zf, bs in [(0.0, 64), (0.9, 333), (0.99, 0), (1.0, 4096)]:
        n = 9990 if bs == 333 else 8192
        cases.append((np.where(rng.random(n) < zf, 0,
                               rng.integers(0, 256, n)).astype(np.uint8), bs))
    for d, bs in cases:
        eff = bs if bs else d.size
        blob = native.compress(d, eff)
        assert blob == bitpack.compress_py(d, eff)
        out = native.decompress(blob, d.size, bs if 0 < bs < d.size else 0)
        assert np.array_equal(out, d)


def test_assisted_tokenizer_single_zero_edges():
    """PackTokenizer's single-zero mask pre-filter corners: lone zeros at
    every position of a 64-byte chunk (incl. bit 63, whose end bit is
    cleared by the open-run rule, and bit 0 continuing an open run),
    singles adjacent to emittable runs, and dense alternation -- the
    assisted single-pass path must stay byte-identical to he_compress,
    whose two-pass tokenizer pins the reference bits."""
    from himg_tpu.entropy import native
    if not native.available():
        pytest.skip("native toolchain unavailable")
    cases = []
    for off in range(0, 64):  # lone zero at every bit of the first chunk
        d = np.full(192, 5, np.uint8)
        d[off] = 0
        cases.append(d)
    for off in (0, 1, 62, 63, 64):  # single right after a 64+ zero run
        d = np.full(256, 9, np.uint8)
        d[16:80] = 0          # open run spanning a chunk border
        d[96 + off] = 0       # lone zero later in the stream
        cases.append(d)
    d = np.full(256, 3, np.uint8)
    d[10:12] = 0   # emittable run
    d[13] = 0      # single immediately after (one literal between)
    d[15:18] = 0   # another run
    d[19] = 0
    cases.append(d)
    alt = np.zeros(512, np.uint8)
    alt[::2] = 7   # every zero is a single: filter strips the whole mask
    cases.append(alt)
    for d in cases:
        hist = native.histogram(d, d.size)
        blob = native.compress_assisted(d, d.size, hist)
        assert blob == native.compress(d, d.size)
        assert np.array_equal(native.decompress(blob, d.size, 0), d)


def test_simd_decode_kill_switch_identical(monkeypatch):
    """HIMG_SIMD_DECODE=0 routes through the scalar substream loop; both
    decoders must produce identical output on content that engages the
    SIMD group path (>= 8 substreams, block_size past the retire window)."""
    from himg_tpu.entropy import native
    if not native.available():
        pytest.skip("native toolchain unavailable")
    for zf, seed in ((0.3, 1), (0.8, 2), (0.97, 3)):
        data = _data(65536, zf, seed=seed)
        blob = native.compress(data, 2048)
        simd = native.decompress(blob, data.size, 2048)
        monkeypatch.setenv("HIMG_SIMD_DECODE", "0")
        scalar = native.decompress(blob, data.size, 2048)
        monkeypatch.delenv("HIMG_SIMD_DECODE")
        assert np.array_equal(simd, scalar)
        assert np.array_equal(simd, data)


@pytest.mark.parametrize("variant,extra_flags", [
    ("sse2", ["-mno-avx512f", "-mno-avx512bw"]),
    ("scalar", ["-DHIMG_FORCE_SCALAR"]),
])
def test_fallback_build_byte_identical(tmp_path, variant, extra_flags):
    """The SSE2 walk (non-AVX512 hosts) and the pure-scalar loops (no-SIMD
    builds) are dead code on this machine's default -march=native build;
    compile each explicitly and byte-check compress/assisted/decompress
    against the default build so the fallbacks cannot rot silently."""
    import ctypes
    import shutil
    import subprocess
    from himg_tpu.entropy import native
    from himg_tpu.native.build import SRC
    if not native.available():
        pytest.skip("native toolchain unavailable")
    if shutil.which("g++") is None:
        pytest.skip("g++ unavailable")
    lib_path = tmp_path / f"libhimg_entropy_{variant}.so"
    try:
        subprocess.run(
            ["g++", "-O2", "-std=c++17", "-shared", "-fPIC",
             "-march=native", *extra_flags,
             "-o", str(lib_path), str(SRC), "-lpthread"],
            check=True, capture_output=True, timeout=300)
    except subprocess.CalledProcessError as e:
        # Non-x86 hosts reject the -mno-avx512* flags; that is the
        # portability case, not a failure of the walk under test.
        pytest.skip(f"{variant} build unavailable: {e.stderr.decode()!r}")
    lib = ctypes.CDLL(str(lib_path))
    from himg_tpu.entropy.native import bind_prototypes
    bind_prototypes(lib)

    cases = [(_data(8192, zf, seed=3), 512) for zf in (0.0, 0.6, 0.95, 1.0)]
    d = np.full(300, 5, np.uint8)
    d[17] = 0          # single zero
    d[40:120] = 0      # run across chunk borders
    d[121] = 0
    cases.append((d, 0))
    for data, bs in cases:
        eff = bs if bs else data.size
        ref = native.compress(data, eff)
        cap = lib.he_max_compressed_size(data.size, eff)
        out = np.empty(cap, np.uint8)
        sz = lib.he_compress(data.ctypes.data_as(ctypes.c_char_p),
                             data.size, eff, out.ctypes.data, cap)
        assert bytes(out[:sz]) == ref
        hist = native.histogram(data, eff)
        h64 = np.ascontiguousarray(hist, np.int64)
        sz2 = lib.he_compress_assisted(
            data.ctypes.data_as(ctypes.c_char_p), data.size, eff,
            h64.ctypes.data, out.ctypes.data, cap)
        assert bytes(out[:sz2]) == ref
        src = np.frombuffer(ref, np.uint8)
        dec = np.empty(data.size, np.uint8)
        rc = lib.he_decompress(src.ctypes.data, src.size,
                               bs if 0 < bs < data.size else 0,
                               dec.ctypes.data, data.size, 1)
        assert rc == 0 and np.array_equal(dec, data)


def test_python_fallback_roundtrip(monkeypatch):
    """HIMG_NATIVE=0 must route through the NumPy/Python spec paths."""
    import himg_tpu.entropy.native as native_mod
    monkeypatch.setattr(native_mod, "_lib", None)
    monkeypatch.setattr(native_mod, "_tried", True)
    assert not native_mod.available()
    data = _data(4096, 0.8, seed=9)
    comp = bitpack.compress(data, 512)
    assert np.array_equal(bitpack.decompress(comp, 4096, 512), data)


def test_native_fuzz_contained():
    """Mutated streams: ValueError or clean decode, never a crash."""
    from himg_tpu.entropy import native
    if not native.available():
        pytest.skip("native toolchain unavailable")
    rng = np.random.default_rng(77)
    data = _data(4096, 0.7, seed=10)
    comp = native.compress(data, 64)
    for _ in range(60):
        buf = bytearray(comp)
        for _ in range(int(rng.integers(1, 10))):
            buf[int(rng.integers(0, len(buf)))] = int(rng.integers(0, 256))
        try:
            native.decompress(bytes(buf), 4096, 64)
        except ValueError:
            pass


def test_simd_decode_tiny_final_substreams_guard_page():
    """Regression: the SIMD group decoder's initial 8-byte read-ahead
    must not read past the input buffer when the final substreams are
    tiny (their spans start within 7 bytes of the buffer end).  The blob
    is placed flush against a PROT_NONE page so an over-read segfaults
    instead of passing silently (production hands the decoder zero-copy
    views whose end is the end of the container bytes)."""
    import ctypes
    import mmap
    from himg_tpu.entropy import native
    if not native.available():
        pytest.skip("native toolchain unavailable")
    bs, nb = 4096, 16  # a multiple of 8 so the last block is in a group
    data = np.zeros(bs * nb, np.uint8)
    data[:bs * 8] = np.random.default_rng(1).integers(
        0, 256, bs * 8, np.uint8)  # noisy half, then all-zero (tiny) half
    comp = native.compress(data, bs)
    page = mmap.PAGESIZE
    npages = -(-len(comp) // page) + 1
    buf = mmap.mmap(-1, npages * page)
    addr = ctypes.addressof(ctypes.c_char.from_buffer(buf))
    start = (npages - 1) * page - len(comp)
    buf[start:start + len(comp)] = comp
    libc = ctypes.CDLL("libc.so.6", use_errno=True)
    assert libc.mprotect(ctypes.c_void_p(addr + (npages - 1) * page),
                         page, 0) == 0  # PROT_NONE
    try:
        view = (ctypes.c_char * len(comp)).from_buffer(buf, start)
        out = native.decompress(memoryview(view), data.size, bs, 1)
        assert np.array_equal(out, data)
    finally:
        libc.mprotect(ctypes.c_void_p(addr + (npages - 1) * page),
                      page, 3)  # PROT_READ|WRITE so munmap/gc is safe
        del view


def test_simd_encode_kill_switch_identical(monkeypatch):
    """HIMG_SIMD_ENCODE=0 routes he_compress_assisted through the scalar
    fused scan+pack; both packers must be byte-identical on content that
    engages the lockstep group path (>= 8 blocks of >= 64 bytes), and
    both must match the two-pass he_compress that pins the reference
    bits.  Content targets the vector step's corners: lone zeros at
    every window phase, runs crossing 8-byte windows, all-zero blocks,
    runs longer than kMaxRun (the capped-piece excursion), and blocks
    ending mid-run (the scalar tail finisher's close)."""
    from himg_tpu.entropy import native
    if not native.available():
        pytest.skip("native toolchain unavailable")
    rng = np.random.default_rng(7)
    cases = []
    for zf, seed in ((0.0, 1), (0.3, 2), (0.8, 3), (0.97, 4)):
        cases.append((_data(8 * 2048, zf, seed=seed), 2048))
    # Lone zeros at every phase of the packer's 8-byte windows.
    d = np.full(8 * 256, 11, np.uint8)
    d[5::17] = 0
    cases.append((d, 256))
    # Runs of every small length at shifting window phases.
    d = rng.integers(1, 256, 8 * 512).astype(np.uint8)
    p = 3
    for run in (2, 3, 5, 7, 8, 9, 15, 17, 23, 31):
        d[p:p + run] = 0
        p += run + 11
    cases.append((d, 512))
    # All-zero blocks next to dense blocks; a >kMaxRun run inside one
    # block (the excursion), and a block ENDING mid-run (tail close).
    d = rng.integers(0, 256, 10 * 20000).astype(np.uint8)
    d[20000:40000] = 0                  # an all-zero block (run 20000 > 16662)
    d[55000:60000] = 0                  # run to a block boundary
    cases.append((d, 20000))
    # Tiny blocks right at the size gate.
    cases.append((_data(16 * 64, 0.7, seed=9), 64))
    for d, bs in cases:
        hist = native.histogram(d, bs)
        simd = native.compress_assisted(d, bs, hist)
        monkeypatch.setenv("HIMG_SIMD_ENCODE", "0")
        scalar = native.compress_assisted(d, bs, hist)
        monkeypatch.delenv("HIMG_SIMD_ENCODE")
        assert simd == scalar
        assert simd == native.compress(d, bs)
        assert np.array_equal(native.decompress(simd, d.size, bs), d)
