"""Token auth with three roles — behavioral parity with the reference
(``Actions`` enum database.py:35-38; ``_check_auth``
database.py:170-187): the admin key grants everything, a sensor's
write key also grants read on that sensor, comparisons are
constant-time (hmac.compare_digest).  Admin key bootstrap uses
``secrets`` and is returned exactly once, never logged
(database.py:77-103).

Service-layer concern: enforced at the engine façade, not inside
Spark plans.
"""

from __future__ import annotations

import hmac
import secrets
from enum import Enum


class Action(Enum):
    READ = "read"
    WRITE = "write"
    ADMIN = "admin"


class NotAuthorizedError(Exception):
    pass


def generate_token(n_chars: int = 32) -> str:
    alphabet = "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"
    return "".join(secrets.choice(alphabet) for _ in range(n_chars))


def _eq(a: str | None, b: str | None) -> bool:
    if not a or not b:
        return False
    return hmac.compare_digest(str(a), str(b))


def check_auth(
    key: str | None,
    action: Action,
    admin_key: str | None,
    read_key: str | None = None,
    write_key: str | None = None,
) -> bool:
    """admin -> everything; write key -> write+read on its sensor;
    read key -> read only.  Reference parity (_check_auth
    database.py:170-187 with __is_key database.py:142-152): a sensor
    with NO configured key for an action admits ONLY the admin key —
    unset keys are closed, not open.  Auth as a whole is off only
    when the engine has no admin key (engine._auth returns early)."""
    if _eq(key, admin_key):
        return True
    if action == Action.ADMIN:
        return False
    if action == Action.WRITE:
        return _eq(key, write_key)
    # READ: write key implies read (reference: write superset of read)
    return _eq(key, read_key) or _eq(key, write_key)


def require(ok: bool, action: Action, what: str) -> None:
    if not ok:
        raise NotAuthorizedError(f"not authorized for {action.value} on {what}")
