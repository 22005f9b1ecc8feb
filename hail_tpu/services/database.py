"""Async Database over sqlite with the reference's call surface
(gear/gear/database.py — there an asyncio MySQL pool with retry; here
sqlite3 driven through the loop's default executor, same method names:
async_init / just_execute / execute_and_fetchall / execute_and_fetchone /
execute_insertone / execute_update / execute_many / async_close)."""

from __future__ import annotations

import asyncio
import sqlite3
import threading
from typing import Any, AsyncIterator, List, Optional, Sequence


class Database:
    def __init__(self):
        self._conn: Optional[sqlite3.Connection] = None
        self._lock = threading.Lock()

    async def async_init(self, path: str = ':memory:') -> 'Database':
        def connect():
            conn = sqlite3.connect(path, check_same_thread=False)
            conn.row_factory = sqlite3.Row
            return conn
        self._conn = await asyncio.get_running_loop().run_in_executor(None, connect)
        return self

    async def _run(self, fn):
        return await asyncio.get_running_loop().run_in_executor(None, fn)

    async def just_execute(self, sql: str, args: Sequence[Any] = ()) -> None:
        def go():
            with self._lock:
                self._conn.execute(sql, args)
                self._conn.commit()
        await self._run(go)

    async def execute_script(self, script: str) -> None:
        def go():
            with self._lock:
                self._conn.executescript(script)
                self._conn.commit()
        await self._run(go)

    async def execute_and_fetchall(self, sql: str,
                                   args: Sequence[Any] = ()) -> AsyncIterator[dict]:
        def go():
            with self._lock:
                return self._conn.execute(sql, args).fetchall()
        for row in await self._run(go):
            yield dict(row)

    async def execute_and_fetchone(self, sql: str,
                                   args: Sequence[Any] = ()) -> Optional[dict]:
        def go():
            with self._lock:
                r = self._conn.execute(sql, args).fetchone()
                return None if r is None else dict(r)
        return await self._run(go)

    async def execute_insertone(self, sql: str, args: Sequence[Any] = ()) -> int:
        def go():
            with self._lock:
                cur = self._conn.execute(sql, args)
                self._conn.commit()
                return cur.lastrowid
        return await self._run(go)

    async def execute_update(self, sql: str, args: Sequence[Any] = ()) -> int:
        def go():
            with self._lock:
                cur = self._conn.execute(sql, args)
                self._conn.commit()
                return cur.rowcount
        return await self._run(go)

    async def execute_many(self, sql: str,
                           args_list: List[Sequence[Any]]) -> None:
        def go():
            with self._lock:
                self._conn.executemany(sql, args_list)
                self._conn.commit()
        await self._run(go)

    async def async_close(self) -> None:
        if self._conn is not None:
            conn, self._conn = self._conn, None
            await self._run(conn.close)

    def transaction(self) -> 'Transaction':
        """Async context manager running statements atomically (reference
        Database.start(): MySQL transaction with commit/rollback)."""
        return Transaction(self)


class Transaction:
    def __init__(self, db: Database):
        self._db = db

    async def __aenter__(self):
        def go():
            self._db._lock.acquire()
            self._db._conn.execute('BEGIN')
        await self._db._run(go)
        return self

    async def __aexit__(self, exc_type, exc, tb):
        def go():
            try:
                if exc_type is None:
                    self._db._conn.commit()
                else:
                    self._db._conn.rollback()
            finally:
                self._db._lock.release()
        await self._db._run(go)
        return False

    async def just_execute(self, sql: str, args: Sequence[Any] = ()) -> None:
        await self._db._run(lambda: self._db._conn.execute(sql, args))

    async def execute_and_fetchone(self, sql: str,
                                   args: Sequence[Any] = ()) -> Optional[dict]:
        def go():
            r = self._db._conn.execute(sql, args).fetchone()
            return None if r is None else dict(r)
        return await self._db._run(go)

    async def execute_insertone(self, sql: str, args: Sequence[Any] = ()) -> int:
        def go():
            return self._db._conn.execute(sql, args).lastrowid
        return await self._db._run(go)


def retry_transient_db_errors(f, max_attempts: int = 5,
                              base_delay_s: float = 0.05):
    """Reference gear.database.retry_transient_mysql_errors: retry the
    retryable error class with exponential backoff — here sqlite's
    'database is locked' / 'database table is locked' OperationalErrors."""
    import functools

    @functools.wraps(f)
    async def wrapped(*args, **kwargs):
        delay = base_delay_s
        for attempt in range(max_attempts):
            try:
                return await f(*args, **kwargs)
            except sqlite3.OperationalError as e:
                if 'locked' not in str(e) or attempt == max_attempts - 1:
                    raise
                await asyncio.sleep(delay)
                delay *= 2
    return wrapped
