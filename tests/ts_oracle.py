"""Reference-kernel oracle harness (VERDICT r2 item 6).

Builds torchsparse 1.4.0's CPU backend from the reference's own
`package/torchsparse.zip` (+ sparsehash) into /tmp/tsbuild, and imports
the reference MinkUNet on top of it with unavailable heavy deps
(torchvision/mmcv/nuscenes-devkit/...) stubbed out.  This gives an
executable ground truth for our JAX kernels: the same hash→rulebook→
gather-GEMM-scatter semantics the reference runs on GPU, exercised via
its shipped `*_cpu.cpp` backend (`ts!setup.py:18-23`).

Nothing here ships in the framework — test-only tooling.
"""

from __future__ import annotations

import importlib
import importlib.abc
import importlib.machinery
import os
import subprocess
import sys
import types
from pathlib import Path

BUILD_ROOT = Path(os.environ.get("TASEG_TS_BUILD", "/tmp/tsbuild"))
TS_DIR = BUILD_ROOT / "torchsparse"
SH_INSTALL = BUILD_ROOT / "shinstall"
REF = Path("/root/reference")

_STUB_PREFIXES = (
    "imp", "torchvision", "cv2", "nuscenes", "pyquaternion", "torch_scatter",
    "SharedArray", "petrel_client", "mmcv", "mmseg", "range_utils",
    "spconv", "open3d", "prettytable", "tensorboardX",
)


class _StubLoader(importlib.abc.Loader):
    def create_module(self, spec):
        mod = types.ModuleType(spec.name)
        mod.__path__ = []  # behave as a package so submodules resolve

        class _Anything:
            def __init__(self, *a, **k):
                pass

            def __call__(self, *a, **k):
                return self

            def __getattr__(self, _n):
                return _Anything()

        def _getattr(name):
            if name.startswith("__"):
                raise AttributeError(name)
            return _Anything()

        mod.__getattr__ = _getattr
        return mod

    def exec_module(self, module):
        pass


class _StubFinder(importlib.abc.MetaPathFinder):
    def find_spec(self, fullname, path=None, target=None):
        root = fullname.split(".")[0]
        if root in _STUB_PREFIXES:
            return importlib.machinery.ModuleSpec(
                fullname, _StubLoader(), is_package=True
            )
        return None


def _ensure_built() -> bool:
    """Unzip + build the CPU backend once; cached across test runs."""
    so = list(TS_DIR.glob("torchsparse/backend*.so"))
    if so:
        return True
    if not (REF / "package" / "torchsparse.zip").exists():
        return False
    BUILD_ROOT.mkdir(parents=True, exist_ok=True)
    try:
        subprocess.run(
            ["unzip", "-oq", str(REF / "package" / "torchsparse.zip")],
            cwd=BUILD_ROOT, check=True, timeout=120,
        )
        subprocess.run(
            ["unzip", "-oq", str(REF / "package" / "sparsehash.zip")],
            cwd=BUILD_ROOT, check=True, timeout=120,
        )
        sh_src = BUILD_ROOT / "sparsehash-master"
        if not (SH_INSTALL / "include" / "google").exists():
            subprocess.run(
                ["./configure", f"--prefix={SH_INSTALL}"],
                cwd=sh_src, check=True, timeout=300,
                capture_output=True,
            )
            subprocess.run(
                ["make", "install", "-j4"], cwd=sh_src, check=True,
                timeout=600, capture_output=True,
            )
        env = dict(os.environ)
        env["CPATH"] = str(SH_INSTALL / "include")
        subprocess.run(
            [sys.executable, "setup.py", "build_ext", "--inplace"],
            cwd=TS_DIR, check=True, timeout=900, env=env,
            capture_output=True,
        )
    except (subprocess.CalledProcessError, subprocess.TimeoutExpired):
        return False
    return bool(list(TS_DIR.glob("torchsparse/backend*.so")))


def load_torchsparse():
    """Import the built torchsparse; returns the module or None."""
    if not _ensure_built():
        return None
    if str(TS_DIR) not in sys.path:
        sys.path.insert(0, str(TS_DIR))
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        import torchsparse  # noqa: F401
    return sys.modules["torchsparse"]


def load_reference_class(module: str, cls: str):
    """Import a reference segmentor class (stubs for absent deps), e.g.
    ("minkunet_ms", "MinkUNetMs") or ("minkunet_ms_kd", "MinkUNetMsKd")."""
    if load_torchsparse() is None:
        return None
    if not any(isinstance(f, _StubFinder) for f in sys.meta_path):
        sys.meta_path.insert(0, _StubFinder())
    if str(REF) not in sys.path:
        sys.path.insert(0, str(REF))
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        mod = importlib.import_module(
            f"pcseg.model.segmentor.voxel.minkunet.{module}"
        )
    return getattr(mod, cls)


def load_reference_minkunet():
    """Import the reference MinkUNet class (stubs for absent deps)."""
    return load_reference_class("minkunet", "MinkUNet")
