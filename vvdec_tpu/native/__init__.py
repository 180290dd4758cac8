"""Native host-runtime extensions (C), with transparent build-on-first-use.

The compute plane is JAX/XLA; this package holds the scalar host plane's
native kernels (CABAC arithmetic decoding, the intra recon engine),
mirroring how the reference keeps its host runtime in C++
(source/Lib/DecoderLib).  Falls back to the pure-Python implementations
when no C toolchain is available.
"""

from __future__ import annotations

import os
import subprocess
import sysconfig

_HERE = os.path.dirname(os.path.abspath(__file__))


def _so_path(name: str, local: bool = False) -> str:
    suffix = sysconfig.get_config_var("EXT_SUFFIX") or ".so"
    return os.path.join(_HERE, name + (".local" if local else "") + suffix)


_DEPS = {"_cabac": ("walk.c", "walk2.c", "walk3.c", "walk4.c", "walk5.c",
                    "walk6.c", "walk7.c", "walk8.c", "walk9.c")}


def _build(name: str) -> str | None:
    """Build (if stale) and return the .so path to load.

    Prefers a machine-local build at -O3 -march=native (the int32 kernels
    auto-vectorize; ~15-20% on the decode loop); the checked-in portable
    -O2 binary is the fallback when no compiler is available."""
    src = os.path.join(_HERE, name.lstrip("_") + ".c")
    out = _so_path(name, local=True)
    src_mtime = max([os.path.getmtime(src)]
                    + [os.path.getmtime(os.path.join(_HERE, d))
                       for d in _DEPS.get(name, ())
                       if os.path.exists(os.path.join(_HERE, d))])
    if os.path.exists(out) and os.path.getmtime(out) >= src_mtime:
        return out
    include = sysconfig.get_paths()["include"]
    cc = os.environ.get("CC", "cc")
    for flags in (["-O3", "-march=native"], ["-O2"]):
        cmd = [cc, *flags, "-shared", "-fPIC", f"-I{include}", src,
               "-o", out]
        try:
            r = subprocess.run(cmd, capture_output=True, timeout=240)
            if r.returncode == 0 and os.path.exists(out):
                return out
        except Exception:
            pass
    # no toolchain: fall back to the checked-in portable binary
    fallback = _so_path(name)
    if os.path.exists(fallback) and os.path.getmtime(fallback) >= src_mtime:
        return fallback
    return None


def _load(name: str):
    if os.environ.get("VVDEC_TPU_NO_NATIVE") == "1":
        return None
    path = _build(name)
    if path is None:
        return None
    try:
        import importlib.util

        spec = importlib.util.spec_from_file_location(
            f"vvdec_tpu.native.{name}", path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod
    except Exception:
        return None


_cabac = _load("_cabac")
_recon = _load("_recon")


def native_cabac():
    """The _cabac module, or None when unavailable."""
    return _cabac


def native_recon():
    """The _recon module, or None when unavailable."""
    return _recon
