"""Exhaustive parity of table constructors vs the reference oracle."""

import subprocess

import numpy as np
import pytest

from himg_tpu.format import tables

QUALITIES = [0, 5, 10, 25, 42, 50, 63, 80, 95, 100]


@pytest.fixture(scope="module", params=QUALITIES)
def oracle_tables(request, oracle_dir, tmp_path_factory):
    q = request.param
    out = tmp_path_factory.mktemp("tab") / "tab.bin"
    subprocess.run([str(oracle_dir / "oracle_tables"), str(q), str(out)],
                   check=True)
    raw = out.read_bytes()
    off = 0

    def take(dtype, n):
        nonlocal off
        a = np.frombuffer(raw, dtype, n, off)
        off += a.nbytes
        return a

    d = {
        "q": q,
        "luma": take(np.uint8, 64),
        "chroma": take(np.uint8, 64),
        "lr_full": take(np.int16, 256),
        "fr_full": take(np.int16, 256),
        "lr_lut": take(np.uint8, 65536),
        "fr_lut": take(np.uint8, 65536),
    }
    for name in ("lr_ser", "fr_ser"):
        n = int(take(np.uint32, 1)[0])
        d[name] = raw[off:off + n]
        off += n
    return d


def test_shift_tables(oracle_tables):
    luma, chroma = tables.make_quantizer(oracle_tables["q"], True)
    assert np.array_equal(luma, oracle_tables["luma"])
    assert np.array_equal(chroma, oracle_tables["chroma"])


def test_quant_config_roundtrip(oracle_tables):
    luma, chroma = tables.make_quantizer(oracle_tables["q"], True)
    packed = tables.pack_quant_config(luma, chroma)
    l2, c2 = tables.unpack_quant_config(packed, True)
    assert np.array_equal(luma, l2) and np.array_equal(chroma, c2)
    packed = tables.pack_quant_config(luma, None)
    l2, c2 = tables.unpack_quant_config(packed, False)
    assert np.array_equal(luma, l2) and c2 is None


def test_mapper_tables(oracle_tables):
    q = oracle_tables["q"]
    lrm = tables.MappingTable.for_lowres_quality(q)
    frm = tables.MappingTable.for_fullres_quality(q)
    # full[0] is uninitialized memory in the reference encoder; skip it.
    assert np.array_equal(lrm.full[1:], oracle_tables["lr_full"][1:])
    assert np.array_equal(frm.full[1:], oracle_tables["fr_full"][1:])


def test_map_to_8bit_exhaustive(oracle_tables):
    q = oracle_tables["q"]
    lrm = tables.MappingTable.for_lowres_quality(q)
    frm = tables.MappingTable.for_fullres_quality(q)
    assert np.array_equal(lrm.map_lut, oracle_tables["lr_lut"])
    assert np.array_equal(frm.map_lut, oracle_tables["fr_lut"])


def test_mapper_serialization(oracle_tables):
    q = oracle_tables["q"]
    lrm = tables.MappingTable.for_lowres_quality(q)
    frm = tables.MappingTable.for_fullres_quality(q)
    assert lrm.serialize() == oracle_tables["lr_ser"]
    assert frm.serialize() == oracle_tables["fr_ser"]
    # Deserialize must reproduce the table (incl. defensive -128 entry).
    rt = tables.MappingTable.deserialize(lrm.serialize())
    assert np.array_equal(rt.full[1:], lrm.full[1:])
    assert rt.full[0] == rt.full[1]


def test_deserialize_rejects_malformed():
    assert tables.MappingTable.deserialize(b"") is None
    assert tables.MappingTable.deserialize(b"\x05abc") is None
    assert tables.unpack_quant_config(b"\x00" * 31, False) is None
    assert tables.unpack_quant_config(b"\x00" * 32, True) is None
