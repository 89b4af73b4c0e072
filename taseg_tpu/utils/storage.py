"""Storage backend abstraction (local filesystem + optional Petrel/S3).

Counterpart of the reference's Ceph/Petrel client
(`pcseg/data/dataset/ceph.py:52-200`, used for cluster-resident datasets,
pseudo labels and checkpoints).  The local backend is the default and the
only one exercised in this image; the Petrel backend is a thin optional
wrapper that activates when petrel-oss-sdk is importable, keeping the same
byte-level load/save surface.
"""

from __future__ import annotations

import pickle
from pathlib import Path

import numpy as np


class LocalBackend:
    def load_bytes(self, path) -> bytes:
        return Path(path).read_bytes()

    def load_bin(self, path, dtype="float32") -> np.ndarray:
        return np.fromfile(path, dtype=np.dtype(dtype))

    def load_npy(self, path) -> np.ndarray:
        return np.load(path)

    def load_pkl(self, path):
        with open(path, "rb") as f:
            return pickle.load(f)

    def save_bytes(self, path, data: bytes):
        p = Path(path)
        p.parent.mkdir(parents=True, exist_ok=True)
        p.write_bytes(data)

    def save_bin(self, path, arr: np.ndarray):
        Path(path).parent.mkdir(parents=True, exist_ok=True)
        np.asarray(arr).tofile(path)

    def exists(self, path) -> bool:
        return Path(path).exists()

    def listdir(self, path):
        return sorted(p.name for p in Path(path).iterdir())


class PetrelBackend(LocalBackend):
    """Ceph/S3 via petrel-oss-sdk when available; s3:// paths only."""

    def __init__(self, conf_path: str = "~/petreloss.conf"):
        try:
            from petrel_client.client import Client  # type: ignore

            self._client = Client(conf_path)
        except ImportError as e:  # pragma: no cover — sdk not in this image
            raise ImportError(
                "petrel-oss-sdk is not installed; use LocalBackend or "
                "install the SDK for s3:// paths"
            ) from e

    def load_bytes(self, path) -> bytes:  # pragma: no cover
        if str(path).startswith("s3://"):
            return bytes(self._client.get(str(path)))
        return super().load_bytes(path)

    def load_bin(self, path, dtype="float32"):  # pragma: no cover
        if str(path).startswith("s3://"):
            return np.frombuffer(self.load_bytes(path), dtype=np.dtype(dtype))
        return super().load_bin(path, dtype)

    def save_bytes(self, path, data: bytes):  # pragma: no cover
        if str(path).startswith("s3://"):
            self._client.put(str(path), data)
            return
        super().save_bytes(path, data)


def get_backend(path_or_scheme) -> LocalBackend:
    if str(path_or_scheme).startswith("s3://"):
        return PetrelBackend()
    return LocalBackend()
