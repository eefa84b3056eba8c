"""Wire-protocol version gate (SURVEY §2 F11).

Behavioral parity with the reference client's handshake (its
``check_versions.py:5-23``): a client refuses to talk to a server whose
RELEASE is older than the client's own; same-or-newer passes.  The
implementation here is original — versions are reduced to a
fixed-width numeric release key so that

* ``'0.2'`` and ``'0.2.0'`` compare equal (components are right-padded
  with zeros instead of compared as ragged tuples), and
* a pre-release like ``'0.3.0rc1'`` keeps its leading digits per
  component (release key ``(0, 3, 0, ...)``) rather than silently
  dropping the component and comparing as an older version.

PEP 440 local labels (``+cpu``) and dash suffixes are ignored, as the
reference does.
"""

from __future__ import annotations

import re

from . import __version__

#: release keys are padded/truncated to this many numeric components
_KEY_WIDTH = 8


class WrongServerVersion(Exception):
    """Server reported a release older than this client."""


def _release_key(version: str) -> tuple[int, ...]:
    """Fixed-width numeric key for ordering release versions."""
    core = re.split(r"[+-]", version, maxsplit=1)[0]
    nums: list[int] = []
    for component in core.split("."):
        digits = re.match(r"\d+", component)
        if digits is None:
            break  # a purely alphabetic component ends the release part
        nums.append(int(digits.group()))
        if len(digits.group()) != len(component):
            break  # '0rc1': keep the 0, suffix ends the release part
        if len(nums) == _KEY_WIDTH:
            break
    return tuple(nums + [0] * (_KEY_WIDTH - len(nums)))


def check_version(server_version: str | None, client_version: str = __version__) -> bool:
    """True when the server's release is the client's or newer."""
    return _release_key(server_version or "0.0.0") >= _release_key(client_version)


def check_version_and_raise(server_version: str | None = None) -> None:
    if not check_version(server_version):
        raise WrongServerVersion(
            f"server reports version {server_version}, older than this "
            f"client ({__version__}) — upgrade the server or downgrade the client"
        )
