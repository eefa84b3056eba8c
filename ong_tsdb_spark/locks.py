"""Cross-process write serialization for sensors (ROADMAP #2).

The engine's read-merge-overwrite upsert (engine.py write_spark_df) is
safe across *threads* via the per-sensor ``threading.Lock`` (reference
parity: ``_get_sensor_lock``, database.py:154-168), but two separate
driver *processes* each hold their own lock registry — their
merge/overwrite cycles could interleave and lose updates.

This module adds the filesystem protocol:

* ``SensorFileLock`` — an exclusive lockfile (``O_CREAT|O_EXCL`` is
  atomic on POSIX) in the sensor directory.  Stale locks (crashed
  writer) are broken after ``stale_after`` seconds; acquisition spins
  with a backoff up to ``timeout``.
* a ``_version`` file bumped atomically (temp + ``os.replace``) after
  every committed write while the lock is held — a monotonic change
  cursor so other processes/readers can cheaply detect that their
  cached view is stale.

On an object store the same protocol maps to conditional PUT
(if-none-match) for the lock and the version object; the local-FS
implementation mirrors the reference's safe_createfile discipline
(fileutils.py:325-376).
"""

from __future__ import annotations

import os
import time


class SensorLockTimeout(TimeoutError):
    pass


LOCK_NAME = "_writer.lock"
VERSION_NAME = "_version"


class SensorFileLock:
    """Exclusive cross-process lock on a sensor directory.

    Reentrant within a single engine call chain is NOT needed (the
    engine acquires it exactly once per write, inside the thread
    lock), so this stays a plain non-reentrant file lock."""

    def __init__(
        self,
        sensor_dir: str,
        timeout: float = 60.0,
        stale_after: float = 300.0,
        poll: float = 0.02,
    ):
        self.path = os.path.join(sensor_dir, LOCK_NAME)
        self.timeout = timeout
        self.stale_after = stale_after
        self.poll = poll

    def acquire(self) -> None:
        deadline = time.monotonic() + self.timeout
        while True:
            try:
                fd = os.open(self.path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                try:
                    os.write(fd, f"{os.getpid()} {time.time()}\n".encode())
                finally:
                    os.close(fd)
                return
            except FileExistsError:
                self._maybe_break_stale()
                if time.monotonic() >= deadline:
                    raise SensorLockTimeout(
                        f"could not acquire sensor write lock {self.path} "
                        f"within {self.timeout}s"
                    ) from None
                time.sleep(self.poll)

    def _maybe_break_stale(self) -> None:
        try:
            age = time.time() - os.stat(self.path).st_mtime
        except FileNotFoundError:
            return  # released between our O_EXCL failure and the stat
        if age > self.stale_after:
            try:
                os.unlink(self.path)  # crashed writer; next acquire wins
            except FileNotFoundError:
                pass

    def release(self) -> None:
        try:
            os.unlink(self.path)
        except FileNotFoundError:
            pass

    def __enter__(self) -> "SensorFileLock":
        self.acquire()
        return self

    def __exit__(self, *exc) -> None:
        self.release()


def read_version(sensor_dir: str) -> int:
    try:
        with open(os.path.join(sensor_dir, VERSION_NAME)) as f:
            return int(f.read().strip() or 0)
    except (FileNotFoundError, ValueError):
        return 0


def bump_version(sensor_dir: str) -> int:
    """Increment the sensor's write version.  MUST be called while
    holding the sensor's SensorFileLock — the read-modify-replace is
    then race-free, and ``os.replace`` keeps readers atomic."""
    path = os.path.join(sensor_dir, VERSION_NAME)
    v = read_version(sensor_dir) + 1
    tmp = f"{path}.{os.getpid()}.tmp"
    with open(tmp, "w") as f:
        f.write(str(v))
    os.replace(tmp, path)
    return v
