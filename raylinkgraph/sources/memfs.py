"""Picklable in-memory object store (fsspec protocol subset) for
exercising the remote-filesystem loader path without network.

fsspec's stock memory:// keeps its store in per-process class state, so
bytes written on the driver vanish inside Ray workers. This filesystem
carries its files as instance state, which cloudpickle ships with every
read task — a faithful stand-in for a remote object store (the
reference Loader's oss://, hdfs://, s3://, framework/loader.py:94-211).

Usage::

    from pyarrow import fs as pafs
    fs = pafs.PyFileSystem(pafs.FSSpecHandler(
        StaticBytesFS({"bucket/edges.csv": b"0,1\\n1,2\\n"})))
    load_table("bucket/edges.csv#header_row=false", filesystem=fs)
"""

from __future__ import annotations

import io


class StaticBytesFS:
    """Duck-types enough of fsspec.AbstractFileSystem for
    pyarrow.fs.FSSpecHandler: info / ls / open / isdir / isfile."""

    sep = "/"
    async_impl = False
    protocol = "static"

    def __init__(self, files: dict[str, bytes]):
        self._files = {k.lstrip("/"): v for k, v in files.items()}

    def _norm(self, path) -> str:
        return str(path).lstrip("/")

    def info(self, path, **kw) -> dict:
        p = self._norm(path)
        if p in self._files:
            return {"name": p, "size": len(self._files[p]), "type": "file"}
        if any(k.startswith(p + "/") for k in self._files):
            return {"name": p, "size": 0, "type": "directory"}
        raise FileNotFoundError(path)

    def ls(self, path, detail=True, **kw):
        p = self._norm(path)
        names = sorted(k for k in self._files if k == p or k.startswith(p + "/"))
        if not names:
            raise FileNotFoundError(path)
        infos = [self.info(n) for n in names]
        return infos if detail else names

    def open(self, path, mode="rb", **kw) -> io.BytesIO:
        if "w" in mode or "a" in mode:
            raise NotImplementedError("StaticBytesFS is read-only")
        return io.BytesIO(self._files[self._norm(path)])

    def isdir(self, path) -> bool:
        try:
            return self.info(path)["type"] == "directory"
        except FileNotFoundError:
            return False

    def isfile(self, path) -> bool:
        try:
            return self.info(path)["type"] == "file"
        except FileNotFoundError:
            return False
