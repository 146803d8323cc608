"""Storage backends for dataset IO.

Equivalent of reference utils/file_client.py:131 (FileClient with disk /
lmdb / memcached backends, of which the datasets use disk and lmdb). The
disk backend is the default; lmdb is available when the `lmdb` package is
installed (it is not in the TPU image — the backend raises a clear error
then). memcached is intentionally out of scope.
"""

from __future__ import annotations


class DiskBackend:
    def get(self, filepath: str) -> bytes:
        with open(filepath, "rb") as f:
            return f.read()

    def get_text(self, filepath: str) -> str:
        with open(filepath, "r") as f:
            return f.read()


class LmdbBackend:
    """Read values from one or more LMDB databases (reference
    utils/file_client.py:34-90 semantics: client_keys map to db_paths;
    `get(key, client_key)` looks up the raw bytes)."""

    def __init__(self, db_paths, client_keys="default", readonly=True,
                 lock=False, readahead=False, **kwargs):
        try:
            import lmdb
        except ImportError as e:
            raise ImportError(
                "the lmdb backend needs the 'lmdb' package (not bundled in "
                "the TPU image); use the disk backend or install lmdb"
            ) from e
        if isinstance(client_keys, str):
            client_keys = [client_keys]
        if isinstance(db_paths, str):
            db_paths = [db_paths]
        assert len(client_keys) == len(db_paths)
        self._client = {
            k: lmdb.open(p, readonly=readonly, lock=lock,
                         readahead=readahead, **kwargs)
            for k, p in zip(client_keys, db_paths)
        }

    def get(self, filepath: str, client_key: str = "default") -> bytes:
        client = self._client[client_key]
        with client.begin(write=False) as txn:
            return txn.get(str(filepath).encode("ascii"))


class FileClient:
    """Facade dispatching to a storage backend (reference
    utils/file_client.py:131-183)."""

    _backends = {"disk": DiskBackend, "lmdb": LmdbBackend}

    def __init__(self, backend: str = "disk", **kwargs):
        if backend not in self._backends:
            raise ValueError(
                f"backend {backend!r} not supported; choose from "
                f"{sorted(self._backends)}")
        self.backend = backend
        self.client = self._backends[backend](**kwargs)

    def get(self, filepath: str, client_key: str = "default") -> bytes:
        if self.backend == "lmdb":
            return self.client.get(filepath, client_key)
        return self.client.get(filepath)

    def get_text(self, filepath: str) -> str:
        return self.client.get_text(filepath)
