"""Native host-runtime extensions (C), with transparent build-on-first-use.

The compute plane is JAX/XLA; this package holds the scalar host plane's
native kernels (CABAC arithmetic decoding today; syntax parsing next),
mirroring how the reference keeps its host runtime in C++
(source/Lib/DecoderLib).  Falls back to the pure-Python implementations
when no C toolchain is available.
"""

from __future__ import annotations

import os
import subprocess
import sysconfig

_HERE = os.path.dirname(os.path.abspath(__file__))


def _so_path() -> str:
    suffix = sysconfig.get_config_var("EXT_SUFFIX") or ".so"
    return os.path.join(_HERE, "_cabac" + suffix)


def _build() -> bool:
    src = os.path.join(_HERE, "cabac.c")
    out = _so_path()
    if os.path.exists(out) and os.path.getmtime(out) >= os.path.getmtime(src):
        return True
    include = sysconfig.get_paths()["include"]
    cc = os.environ.get("CC", "cc")
    cmd = [cc, "-O2", "-shared", "-fPIC", f"-I{include}", src, "-o", out]
    try:
        r = subprocess.run(cmd, capture_output=True, timeout=120)
        return r.returncode == 0 and os.path.exists(out)
    except Exception:
        return False


_cabac = None
if os.environ.get("VVDEC_TPU_NO_NATIVE") != "1" and _build():
    try:
        import importlib.util

        _spec = importlib.util.spec_from_file_location(
            "vvdec_tpu.native._cabac", _so_path())
        _cabac = importlib.util.module_from_spec(_spec)
        _spec.loader.exec_module(_cabac)
    except Exception:
        _cabac = None


def native_cabac():
    """The _cabac module, or None when unavailable."""
    return _cabac
