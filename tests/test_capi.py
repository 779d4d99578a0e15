"""Build and run the C API (transi-equivalent) end-to-end test.

Mirrors the reference install/transi tests (tests/CMakeLists.txt:13-38,
415-558): compiles a downstream C program against the installed header and
shared library, runs it, and checks the round-trip gate.
"""

import pathlib
import shutil
import subprocess
import sys
import sysconfig

import pytest

ROOT = pathlib.Path(__file__).resolve().parent.parent
CAPI = ROOT / "src" / "capi"


@pytest.mark.skipif(shutil.which("cc") is None and shutil.which("gcc") is None,
                    reason="no C compiler")
def test_capi_roundtrip(tmp_path):
    cc = shutil.which("cc") or shutil.which("gcc")
    cfg = sysconfig.get_config_vars()
    inc = sysconfig.get_path("include")
    libdir = cfg.get("LIBDIR", "")
    pyver = f"python{sys.version_info.major}.{sys.version_info.minor}"
    lib = tmp_path / "libectrans_tpu.so"
    exe = tmp_path / "test_capi"
    link = [f"-L{libdir}", f"-l{pyver}", f"-Wl,-rpath,{libdir}"]
    subprocess.run(
        [cc, "-O2", "-shared", "-fPIC", str(CAPI / "ectrans_tpu_capi.c"),
         f"-I{inc}", f"-I{CAPI}", "-o", str(lib)] + link,
        check=True, capture_output=True,
    )
    subprocess.run(
        [cc, "-O2", str(CAPI / "test_capi.c"), f"-I{CAPI}",
         "-o", str(exe), str(lib), f"-Wl,-rpath,{tmp_path}", "-lm"] + link,
        check=True, capture_output=True,
    )
    site = sysconfig.get_path("purelib")
    env = dict(PYTHONPATH=f"{ROOT}:{site}", JAX_PLATFORMS="cpu",
               ECTRANS_TPU_LEGPOL_DIR="",
               PATH="/usr/bin:/bin", HOME=str(tmp_path))
    out = subprocess.run([str(exe)], capture_output=True, text=True,
                         timeout=600, env=env)
    assert out.returncode == 0, out.stdout + out.stderr
    assert "C API test OK" in out.stdout
