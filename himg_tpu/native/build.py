"""Build the native entropy codec shared library (g++, no deps)."""

from __future__ import annotations

import subprocess
from pathlib import Path

_DIR = Path(__file__).resolve().parent
SRC = _DIR / "src" / "entropy.cpp"
LIB = _DIR / "libhimg_entropy.so"


def build(force: bool = False) -> Path | None:
    """Compile the shared library if missing/stale; None on failure."""
    if not force and LIB.exists() and LIB.stat().st_mtime >= SRC.stat().st_mtime:
        return LIB
    try:
        subprocess.run(
            ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-march=native",
             "-o", str(LIB), str(SRC), "-lpthread"],
            check=True, capture_output=True, timeout=300)
        return LIB
    except (subprocess.CalledProcessError, subprocess.TimeoutExpired,
            FileNotFoundError):
        return None


if __name__ == "__main__":
    path = build(force=True)
    print(f"built: {path}" if path else "build FAILED")
