"""Build and run the C API smoke test (the analog of the reference's
compiled C programs under tfhe/c_api_tests + scripts/c_api_tests.sh)."""

import os
import shutil
import subprocess
import sys
from pathlib import Path

import pytest

ROOT = Path(__file__).resolve().parent.parent
C_API = ROOT / "c_api"


@pytest.mark.skipif(shutil.which("cc") is None, reason="no C compiler")
def test_c_api_build_and_run():
    build = subprocess.run(
        ["make", "-C", str(C_API)], capture_output=True, text=True
    )
    assert build.returncode == 0, build.stderr[-2000:]
    env = dict(os.environ)
    # The embedded CPython links the system libpython; make it see the same
    # site-packages as the interpreter running this suite (e.g. a venv not on
    # PATH), plus the repo root for ``tfhe_tpu`` itself.
    import site

    pkg_dirs = [d for d in site.getsitepackages() if os.path.isdir(d)]
    env["PYTHONPATH"] = ":".join(
        [str(ROOT), *pkg_dirs, env.get("PYTHONPATH", "")]
    ).rstrip(":")
    env["JAX_PLATFORM_NAME"] = "cpu"
    run = subprocess.run(
        [str(C_API / "build" / "c_api_test")],
        capture_output=True, text=True, env=env, timeout=540,
    )
    assert run.returncode == 0, (run.stdout[-1000:], run.stderr[-2000:])
    assert "c_api_test OK" in run.stdout
