"""Cross-process write serialization for sensors (ROADMAP #2).

The engine's read-merge-overwrite upsert (engine.py write_spark_df) is
safe across *threads* via the per-sensor ``threading.Lock`` (reference
parity: ``_get_sensor_lock``, database.py:154-168), but two separate
driver *processes* each hold their own lock registry — their
merge/overwrite cycles could interleave and lose updates.

This module adds the filesystem protocol:

* ``SensorFileLock`` — an exclusive lockfile (``O_CREAT|O_EXCL`` is
  atomic on POSIX) in the sensor directory.  The HOLDER heartbeats the
  lockfile (touches it every ``stale_after/4`` seconds) so a live lock
  never looks stale no matter how long the Spark write takes; waiters
  break a lock only after observing the *identical* payload+mtime
  stale on two consecutive polls, so a heartbeating holder (mtime
  advances) or a freshly re-created lock (new payload) is never
  unlinked.  Acquisition spins with a backoff up to ``timeout``.
* a ``_version`` file bumped atomically (temp + ``os.replace``) after
  every committed write while the lock is held — a monotonic change
  cursor so other processes/readers can cheaply detect that their
  cached view is stale.

Caveat (documented, inherent to unlink-based breaking): plain POSIX has
no compare-and-delete, so between a waiter's final payload check and
its ``unlink`` the holder could release and a third process acquire —
the waiter would then unlink the third process's fresh lock.  The
two-observation protocol shrinks that window to microseconds and the
heartbeat means it only opens at all after a writer has been silent for
``stale_after`` (default 30 min, far beyond any sane Spark write);
stale-breaking therefore implies a *potential* dual-writer window and
``stale_after`` should stay well above worst-case write time.

On an object store the same protocol maps to conditional PUT
(if-none-match) for the lock and the version object; the local-FS
implementation mirrors the reference's safe_createfile discipline
(fileutils.py:325-376).
"""

from __future__ import annotations

import logging
import os
import threading
import time


_LOG = logging.getLogger(__name__)


class SensorLockTimeout(TimeoutError):
    pass


LOCK_NAME = "_writer.lock"
VERSION_NAME = "_version"

#: default stale horizon — 30 min.  Deliberately much longer than any
#: plausible single Spark write; with the holder heartbeat the horizon
#: only matters for genuinely crashed writers.
DEFAULT_STALE_AFTER = 1800.0


class SensorFileLock:
    """Exclusive cross-process lock on a sensor directory.

    Reentrant within a single engine call chain is NOT needed (the
    engine acquires it exactly once per write, inside the thread
    lock), so this stays a plain non-reentrant file lock."""

    def __init__(
        self,
        sensor_dir: str,
        timeout: float = 60.0,
        stale_after: float = DEFAULT_STALE_AFTER,
        poll: float = 0.02,
    ):
        self.path = os.path.join(sensor_dir, LOCK_NAME)
        self.timeout = timeout
        self.stale_after = stale_after
        self.poll = poll
        self.heartbeat_every = max(stale_after / 4.0, 0.05)
        self._hb_stop: threading.Event | None = None
        self._hb_thread: threading.Thread | None = None
        self._payload: bytes | None = None  # written once at acquire
        # last (payload, mtime) a waiter saw stale; break only on a
        # second sighting of the exact same state
        self._observed: tuple[bytes, float] | None = None

    def acquire(self) -> None:
        deadline = time.monotonic() + self.timeout
        while True:
            try:
                fd = os.open(self.path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                payload = f"{os.getpid()} {time.time()} {id(self)}\n".encode()
                try:
                    os.write(fd, payload)
                finally:
                    os.close(fd)
                self._payload = payload
                self._start_heartbeat()
                return
            except FileExistsError:
                self._maybe_break_stale()
                if time.monotonic() >= deadline:
                    raise SensorLockTimeout(
                        f"could not acquire sensor write lock {self.path} "
                        f"within {self.timeout}s"
                    ) from None
                time.sleep(self.poll)

    # -- holder heartbeat --------------------------------------------
    def _start_heartbeat(self) -> None:
        stop = threading.Event()

        def beat() -> None:
            while not stop.wait(self.heartbeat_every):
                try:
                    # ownership check: after a stale break the path may
                    # hold a NEW holder's lock — touching it would keep
                    # someone else's (possibly crashed) lock looking
                    # live forever (code-review r9)
                    with open(self.path, "rb") as f:
                        if f.read() != self._payload:
                            return  # not ours anymore — stand down
                    os.utime(self.path, None)  # live: keep mtime fresh
                except OSError:
                    return  # released (or broken) — nothing to keep alive

        t = threading.Thread(target=beat, name="sensor-lock-heartbeat", daemon=True)
        t.start()
        self._hb_stop, self._hb_thread = stop, t

    # -- waiter-side stale breaking ----------------------------------
    def _lock_state(self) -> tuple[bytes, float] | None:
        try:
            st = os.stat(self.path)
            with open(self.path, "rb") as f:
                return f.read(), st.st_mtime
        except OSError:
            return None  # released between our O_EXCL failure and here

    def _maybe_break_stale(self) -> None:
        state = self._lock_state()
        if state is None or time.time() - state[1] <= self.stale_after:
            self._observed = None  # live (or gone): forget any sighting
            return
        if self._observed == state:
            # Same payload AND same mtime as our previous poll, still
            # past the stale horizon: the holder is not heartbeating
            # and nobody re-created the file — treat as crashed.
            try:
                os.unlink(self.path)
            except FileNotFoundError:
                pass
            self._observed = None
        else:
            self._observed = state  # first sighting: remember, re-check

    def release(self) -> None:
        if self._hb_stop is not None:
            self._hb_stop.set()
            self._hb_thread.join(timeout=2.0)
            self._hb_stop = self._hb_thread = None
        try:
            # unlink ONLY our own lockfile: if this holder stalled past
            # the stale horizon (VM pause/SIGSTOP), a waiter has broken
            # the lock and acquired its own — unconditionally unlinking
            # here would delete the NEW holder's lock and let a third
            # writer in alongside it (code-review r9).  The payload is
            # written once at acquire and never changes (the heartbeat
            # touches mtime only), so it identifies the owner.
            with open(self.path, "rb") as f:
                if f.read() != self._payload:
                    return  # someone else's lock now — leave it alone
        except FileNotFoundError:
            return  # already gone — nothing to release
        except OSError as ex:
            # An unreadable lockfile (EACCES, transient FS error) is
            # indistinguishable from "not ours" — do NOT delete on a
            # guess, and do NOT raise out of release()/__exit__ where
            # it would mask the with-block's real exception (ADVICE
            # r9; the Hadoop twin never raises from release either).
            # The stale horizon reclaims the file if it was ours.
            # logging, not a warning: under -W error / filterwarnings=
            # error the emission itself would become the raise this
            # branch exists to prevent (code-review r10).
            _LOG.warning("lock release: could not read %s: %s", self.path, ex)
            return
        try:
            os.unlink(self.path)
        except FileNotFoundError:
            pass
        except OSError as ex:
            _LOG.warning("lock release: could not delete %s: %s", self.path, ex)

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
