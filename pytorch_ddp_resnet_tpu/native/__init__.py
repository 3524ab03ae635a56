"""Native (C++) host-side components.

``_fastimage`` is the data-loader's native decode path: libjpeg JPEG decode
plus a Pillow-bit-exact bilinear resampler, both releasing the GIL
(fastimage.cpp). It fills the role torchvision's native image backends fill
for the reference's ImageFolder pipeline (reference data_util.py:27-38).

The extension is built on demand with the system toolchain into a per-user
cache directory (no build step at install time; the package stays import-
safe on hosts without g++ or libjpeg). Everything degrades gracefully to
the pure-PIL path — ``load()`` returns None on any failure and the
streaming pipeline falls back (data/streaming.py).

Set ``PDRT_NO_NATIVE=1`` to force the PIL path.
"""

from __future__ import annotations

import importlib.util
import os
import subprocess
import sys
import sysconfig
import threading
from typing import Optional

_SOURCE = os.path.join(os.path.dirname(__file__), "fastimage.cpp")
_LOCK = threading.Lock()
_CACHED: Optional[object] = None
_TRIED = False


def _build_dir() -> str:
    root = os.environ.get("PDRT_NATIVE_CACHE") or os.path.join(
        os.path.expanduser("~"), ".cache", "pytorch_ddp_resnet_tpu")
    tag = f"cp{sys.version_info.major}{sys.version_info.minor}"
    return os.path.join(root, f"native-{tag}")


def _so_path() -> str:
    suffix = sysconfig.get_config_var("EXT_SUFFIX") or ".so"
    return os.path.join(_build_dir(), f"_fastimage{suffix}")


def build(verbose: bool = False) -> str:
    """Compile fastimage.cpp into the cache dir; returns the .so path.

    Raises on compiler/linker failure (callers that want the graceful path
    use load()). The build is cheap (~2s) and keyed by source mtime.
    """
    so = _so_path()
    if (os.path.exists(so)
            and os.path.getmtime(so) >= os.path.getmtime(_SOURCE)):
        return so
    os.makedirs(os.path.dirname(so), exist_ok=True)
    include = sysconfig.get_paths()["include"]
    # per-process tmp name: concurrent cold-cache builders (multi-process
    # launch) must not scribble over each other's link output; each links
    # its own file and the os.replace()s are individually atomic
    tmp = f"{so}.tmp.{os.getpid()}.so"
    cmd = [
        "g++", "-O3", "-fPIC", "-shared", "-std=c++17",
        f"-I{include}", _SOURCE, "-o", tmp, "-ljpeg", "-lpng",
    ]
    if verbose:
        print("[native] " + " ".join(cmd))
    try:
        subprocess.run(cmd, check=True, capture_output=not verbose)
        os.replace(tmp, so)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)
    return so


def load(verbose: bool = False):
    """Import the extension, building it if needed. None on any failure."""
    global _CACHED, _TRIED
    if _TRIED:  # lock-free fast path: load() sits on per-sample hot paths
        return _CACHED
    if os.environ.get("PDRT_NO_NATIVE"):
        return None
    with _LOCK:
        if _TRIED:
            return _CACHED
        _TRIED = True
        try:
            so = build(verbose=verbose)
            spec = importlib.util.spec_from_file_location("_fastimage", so)
            mod = importlib.util.module_from_spec(spec)
            spec.loader.exec_module(mod)
            _CACHED = mod
        except Exception as e:  # noqa: BLE001 — by contract: degrade to PIL
            if verbose:
                print(f"[native] _fastimage unavailable ({e}); using PIL")
            _CACHED = None
        return _CACHED
