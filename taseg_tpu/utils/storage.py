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

    def remove(self, path):
        """Remove a file or a directory tree (checkpoint pruning)."""
        import shutil

        p = Path(path)
        if p.is_dir():
            shutil.rmtree(p, ignore_errors=True)
        elif p.exists():
            p.unlink()


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
            # .copy(): np.fromfile parity — callers may mutate in place
            return np.frombuffer(
                self.load_bytes(path), dtype=np.dtype(dtype)
            ).copy()
        return super().load_bin(path, dtype)

    def load_npy(self, path):  # pragma: no cover
        if str(path).startswith("s3://"):
            import io

            return np.load(io.BytesIO(self.load_bytes(path)))
        return super().load_npy(path)

    def load_pkl(self, path):  # pragma: no cover
        if str(path).startswith("s3://"):
            return pickle.loads(self.load_bytes(path))
        return super().load_pkl(path)

    def save_bytes(self, path, data: bytes):  # pragma: no cover
        if str(path).startswith("s3://"):
            self._client.put(str(path), data)
            return
        super().save_bytes(path, data)

    def save_bin(self, path, arr: np.ndarray):  # pragma: no cover
        if str(path).startswith("s3://"):
            self.save_bytes(path, np.asarray(arr).tobytes())
            return
        super().save_bin(path, arr)

    def exists(self, path) -> bool:  # pragma: no cover
        if str(path).startswith("s3://"):
            return bool(self._client.contains(str(path)))
        return super().exists(path)

    def listdir(self, path):  # pragma: no cover
        if str(path).startswith("s3://"):
            # petrel `list` yields keys under the prefix (ceph.py exposes
            # the same surface for its checkpoint pruning)
            prefix = str(path).rstrip("/") + "/"
            return sorted(self._client.list(prefix))
        return super().listdir(path)

    def remove(self, path):  # pragma: no cover
        if str(path).startswith("s3://"):
            self._client.delete(str(path))
            return
        super().remove(path)


_LOCAL = LocalBackend()
_PETREL: PetrelBackend | None = None


def get_backend(path_or_scheme) -> LocalBackend:
    """Backend for a path: s3:// routes to a (cached) Petrel client, all
    else to the local filesystem (reference `ceph.py:52-66` dispatches the
    same way on its `ceph_read` flags)."""
    if str(path_or_scheme).startswith("s3://"):
        global _PETREL
        if _PETREL is None:
            _PETREL = PetrelBackend()
        return _PETREL
    return _LOCAL


# Module-level convenience wrappers — the data readers and tools call
# these instead of np.fromfile/np.load/open so every data path is
# remote-storage capable (reference threads its Petrel client the same
# way through every reader; ceph.py:68-200).
def load_bytes(path) -> bytes:
    return get_backend(path).load_bytes(path)


def load_bin(path, dtype="float32") -> np.ndarray:
    return get_backend(path).load_bin(path, dtype)


def load_npy(path) -> np.ndarray:
    return get_backend(path).load_npy(path)


def load_pkl(path):
    return get_backend(path).load_pkl(path)


def load_image(path):
    """PIL image via the byte backend (TIAF camera frames)."""
    import io

    from PIL import Image

    b = get_backend(path)
    if isinstance(b, PetrelBackend) and str(path).startswith("s3://"):
        return Image.open(io.BytesIO(b.load_bytes(path)))
    return Image.open(path)


def save_bytes(path, data: bytes):
    get_backend(path).save_bytes(path, data)


def save_bin(path, arr: np.ndarray):
    get_backend(path).save_bin(path, arr)


def exists(path) -> bool:
    return get_backend(path).exists(path)


def listdir(path):
    return get_backend(path).listdir(path)


def remove(path):
    get_backend(path).remove(path)


def is_remote(path) -> bool:
    return str(path).startswith("s3://")


class CheckpointIO:
    """Checkpoint save/restore/list/prune over either backend.

    Local directories keep the orbax PyTree layout (unchanged on-disk
    format, so existing checkpoints and the torchsparse converter output
    stay loadable); `s3://` paths serialize the device_get pytree to one
    pickled object per checkpoint, the way the reference torch.saves to
    its Petrel client (`train.py:319-324`, `ceph.py:52-200`)."""

    def __init__(self):
        self._orbax = None

    @property
    def orbax(self):
        if self._orbax is None:
            import orbax.checkpoint as ocp

            self._orbax = ocp.PyTreeCheckpointer()
        return self._orbax

    def save(self, path, payload):
        if is_remote(path):
            save_bytes(path, pickle.dumps(payload))
        else:
            self.orbax.save(Path(path).absolute(), payload, force=True)

    def restore(self, path, item=None):
        if is_remote(path):
            return pickle.loads(load_bytes(path))
        if item is not None:
            return self.orbax.restore(Path(path).absolute(), item=item)
        return self.orbax.restore(Path(path).absolute())

    def list_epochs(self, ckpt_dir):
        """Sorted [(epoch, full_path)] of `checkpoint_epoch_*` under
        ckpt_dir (reference auto-resume scan, train.py:232-242)."""
        found = []
        if is_remote(ckpt_dir):
            names = listdir(ckpt_dir)
        else:
            d = Path(ckpt_dir)
            names = (
                [p.name for p in d.glob("checkpoint_epoch_*")]
                if d.exists()
                else []
            )
        for name in names:
            tail = name.rstrip("/").rsplit("/", 1)[-1]
            if not tail.startswith("checkpoint_epoch_"):
                continue
            try:
                epoch = int(tail.rsplit("_", 1)[1])
            except ValueError:
                continue
            found.append((epoch, f"{str(ckpt_dir).rstrip('/')}/{tail}"))
        return sorted(found)

    def remove(self, path):
        remove(path)
