"""Packaging: the wheel must build and carry the runtime essentials."""

import subprocess
import sys
import zipfile
from pathlib import Path

import pytest

ROOT = Path(__file__).resolve().parent.parent


@pytest.mark.skipif(
    not (ROOT / "pyproject.toml").exists(), reason="no pyproject"
)
def test_wheel_builds_with_native_sources(tmp_path):
    proc = subprocess.run(
        [sys.executable, "-m", "pip", "wheel", str(ROOT),
         "--no-build-isolation", "--no-index", "--no-deps",
         "-w", str(tmp_path)],
        capture_output=True, text=True, timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    (whl,) = tmp_path.glob("*.whl")
    names = zipfile.ZipFile(whl).namelist()
    # native sources ship and compile on first use
    assert any(n.endswith("native/imgio.cpp") for n in names)
    assert any(n.endswith("native/framering.cpp") for n in names)
    # no build artifacts leak into the wheel
    assert not any(n.endswith(".so") for n in names)
    # console script registered
    assert any(n.endswith("entry_points.txt") for n in names)
    # the tune workflow's harness is packaged (regression: it lived in
    # the unpackaged tools/ directory)
    assert any(n.endswith("utils/microbench.py") for n in names)
