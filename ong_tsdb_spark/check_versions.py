"""Client/server version handshake — parity with the reference's
``check_versions.py:5-23``: the client refuses to talk to a server
OLDER than itself (``server >= client``), ignoring PEP 440 local
labels and pre/post/dev suffixes in the comparison.
"""

from __future__ import annotations

from . import __version__


class WrongServerVersion(Exception):
    pass


def _parse_version(version: str) -> tuple:
    version = version.split("+", 1)[0].split("-", 1)[0]
    return tuple(int(p) for p in version.split(".") if p.isdigit())


def check_version(server_version: str | None, client_version: str = __version__) -> bool:
    """True when the server is same-or-newer than the client."""
    server_version = server_version or "0.0.0"
    return _parse_version(server_version) >= _parse_version(client_version)


def check_version_and_raise(server_version: str | None = None) -> None:
    if not check_version(server_version):
        raise WrongServerVersion(
            f"Server version {server_version} do not match client version {__version__}"
        )
