"""ASan/UBSan gate for the native host layer (SURVEY §5 sanitizer row).

Runs tools/native_sanitize.sh — an address+undefined-sanitized build of
colate_tpu/native/*.cpp driven through the native-exercising test files
— as one pytest node so CI-style invocations (`pytest -m sanitize`)
exercise it.  Skipped by default (it re-runs ~30 s of tests under a
second interpreter); the bench/driver runs it via the script directly.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.sanitize
def test_native_layer_under_asan_ubsan():
    if not os.environ.get("COLATE_SANITIZE_TEST"):
        pytest.skip("set COLATE_SANITIZE_TEST=1 (or run tools/native_sanitize.sh)")
    r = subprocess.run(
        ["bash", os.path.join(REPO, "tools", "native_sanitize.sh")],
        capture_output=True,
        text=True,
        timeout=900,
    )
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    assert "native sanitize: OK" in r.stdout
