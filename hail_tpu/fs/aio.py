"""Async filesystem layer (reference `hailtop/aiotools/`):
AsyncFS ABC (`aiotools/fs/fs.py:254`), LocalAsyncFS, RouterAsyncFS
(`router_fs.py:13`), and the parallel copy/delete tools (`copy.py`,
`delete.py`) that power `hailctl fs` and the batch workers."""

from __future__ import annotations

import asyncio
import os
from typing import List, Optional

from .router_fs import FS, FileStatus, RouterFS, get_fs


class AsyncFS:
    """Async facade over a (sync) FS, running blocking IO in the default
    executor — the zero-egress build has no native async cloud clients, so
    this preserves the reference's API shape with thread offload."""

    def __init__(self, fs: Optional[FS] = None):
        self._fs = fs or get_fs()

    async def _run(self, f, *args):
        return await asyncio.get_running_loop().run_in_executor(None, f, *args)

    async def open(self, path: str, mode: str = 'rb'):
        return await self._run(self._fs.open, path, mode)

    async def read(self, path: str) -> bytes:
        def r():
            with self._fs.open(path, 'rb') as f:
                return f.read()
        return await self._run(r)

    async def write(self, path: str, data: bytes) -> None:
        def w():
            with self._fs.open(path, 'wb') as f:
                f.write(data)
        await self._run(w)

    async def exists(self, path: str) -> bool:
        return await self._run(self._fs.exists, path)

    async def isfile(self, path: str) -> bool:
        return await self._run(self._fs.is_file, path)

    async def isdir(self, path: str) -> bool:
        return await self._run(self._fs.is_dir, path)

    async def statfile(self, path: str) -> FileStatus:
        return await self._run(self._fs.stat, path)

    async def listfiles(self, path: str):
        """Async iterator of FileListEntry-likes (the reference's AsyncFS
        contract is `async for x in await fs.listfiles(p)`)."""
        entries = await self._run(self._fs.ls, path)

        async def gen():
            for e in entries:
                yield e
        return gen()

    async def mkdir(self, path: str) -> None:
        await self._run(self._fs.mkdir, path)

    async def remove(self, path: str) -> None:
        await self._run(self._fs.remove, path)

    async def rmtree(self, sema, path: str) -> None:
        await self._run(self._fs.rmtree, path)

    async def copy_file(self, src: str, dest: str) -> None:
        await self._run(self._fs.copy, src, dest)

    async def close(self) -> None:
        pass

    async def __aenter__(self):
        return self

    async def __aexit__(self, *exc):
        await self.close()
        return False


class LocalAsyncFS(AsyncFS):
    def __init__(self):
        from .router_fs import LocalFS
        super().__init__(LocalFS())


class RouterAsyncFS(AsyncFS):
    def __init__(self, filesystems=None, **kwargs):
        super().__init__(RouterFS())


async def copy_files(src_dest_pairs, parallelism: int = 16) -> None:
    """Parallel multi-file copy (reference `aiotools/copy.py` Transfer engine)."""
    fs = AsyncFS()
    sem = asyncio.Semaphore(parallelism)

    async def one(src, dest):
        async with sem:
            if await fs.isdir(src):
                entries = await fs.listfiles(src)
                await asyncio.gather(*[
                    one(e.path, os.path.join(dest, os.path.basename(e.path)))
                    for e in entries])
            else:
                await fs.copy_file(src, dest)

    await asyncio.gather(*[one(s, d) for s, d in src_dest_pairs])


async def delete_files(paths, parallelism: int = 16) -> None:
    """Parallel delete (reference `aiotools/delete.py`)."""
    fs = AsyncFS()
    sem = asyncio.Semaphore(parallelism)

    async def one(p):
        async with sem:
            if await fs.isdir(p):
                await fs.rmtree(None, p)
            elif await fs.exists(p):
                await fs.remove(p)

    await asyncio.gather(*[one(p) for p in paths])


def copy_sync(src_dest_pairs, parallelism: int = 16) -> None:
    asyncio.run(copy_files(src_dest_pairs, parallelism))


def delete_sync(paths, parallelism: int = 16) -> None:
    asyncio.run(delete_files(paths, parallelism))
