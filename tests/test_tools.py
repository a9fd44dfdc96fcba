"""CLI tools: flag parity, PNG round trips, benchmark protocol."""

import io
import sys
from contextlib import redirect_stdout

import numpy as np
import pytest

from util import make_image


@pytest.fixture()
def png(tmp_path):
    from PIL import Image
    img = make_image(48, 64, 3, seed=9)
    p = tmp_path / "in.png"
    Image.fromarray(img, "RGB").save(p)
    return p, img


def test_chimg_dhimg_roundtrip(png, tmp_path):
    from himg_tpu.tools import chimg, dhimg
    from util import psnr
    p, img = png
    out = tmp_path / "out.himg"
    back = tmp_path / "back.png"

    buf = io.StringIO()
    with redirect_stdout(buf):
        assert chimg.main(["-q", "70", str(p), str(out)]) == 0
    text = buf.getvalue()
    assert "Low resolution data:" in text
    assert "Full resolution data:" in text
    assert "Compressed size:" in text
    assert out.exists()

    buf = io.StringIO()
    with redirect_stdout(buf):
        assert dhimg.main([str(out), str(back)]) == 0
    assert "File size:" in buf.getvalue()

    from PIL import Image
    rt = np.asarray(Image.open(back).convert("RGB"))
    assert rt.shape == img.shape
    assert psnr(rt, img) > 25


def test_chimg_usage_and_bad_flags(capsys):
    from himg_tpu.tools import chimg
    assert chimg.main([]) == 0
    assert "Usage:" in capsys.readouterr().out
    assert chimg.main(["-q", "200", "a", "b"]) == 0
    assert "Invalid quality level" in capsys.readouterr().out
    assert chimg.main(["-bogus", "a", "b"]) == 0
    assert "Invalid option" in capsys.readouterr().out


def test_chimg_matches_reference_cli(oracle_dir, png, tmp_path):
    """chimg output must be byte-identical to reference chimg on the same
    PNG (FreeImage bottom-up BGR layout emulated)."""
    from himg_tpu.tools import chimg
    from util import oracle_encode
    p, img = png
    out = tmp_path / "out.himg"
    with redirect_stdout(io.StringIO()):
        chimg.main(["-q", "60", str(p), str(out)])
    # Reference chimg feeds FreeImage raw bits: bottom-up, BGR.
    fi = np.ascontiguousarray(img[::-1][..., [2, 1, 0]])
    ref = oracle_encode(oracle_dir, fi, 60, True, tmp_path)
    assert out.read_bytes() == ref


def test_benchmark_cli(png, tmp_path, monkeypatch, capsys):
    from himg_tpu.tools import benchmark, chimg
    p, img = png
    out = tmp_path / "out.himg"
    with redirect_stdout(io.StringIO()):
        chimg.main([str(p), str(out)])
    monkeypatch.setattr(benchmark, "NUM_ITERATIONS", 2)
    assert benchmark.main(["-d", str(out)]) == 0
    text = capsys.readouterr().out
    assert "Min:" in text and "Max:" in text and "Average:" in text
    assert benchmark.main(["-e", str(out)]) == 0
    assert "Average:" in capsys.readouterr().out


def test_rdcurve_synthetic(capsys):
    from himg_tpu.tools import rdcurve
    # tiny corpus for speed
    orig = rdcurve.synthetic_corpus
    rdcurve.synthetic_corpus = lambda *a, **k: orig(n=1, h=64, w=64)
    try:
        assert rdcurve.main(["--qualities", "30,70"]) == 0
    finally:
        rdcurve.synthetic_corpus = orig
    out = capsys.readouterr().out
    assert "q= 30" in out and "q= 70" in out
    # bpp should grow with quality
    import re
    bpps = [float(m) for m in re.findall(r"bpp=\s*([\d.]+)", out)]
    assert bpps[1] > bpps[0]
