"""Auth-proxy tier: the reference's remote deployment sits behind an
authenticating proxy whose username/password/MFA form the CLIENT
negotiates non-interactively (reference src/ong_tsdb/client.py:95-160
``connect`` and :185-205 ``_request`` — the only interactive part of
the reference's tests/test_remote_server.py is the TEST's ``input()``
calls, so the protocol itself is fully automatable).  Two Spark-free
pieces close that surface hermetically:

* :class:`MfaAuthProxy` — a WSGI middleware playing the proxy in
  front of the Flask façade (``service/server.create_app``): requests
  without a valid session cookie get the reference's challenge shape
  — HTTP 401 with a JSON body ``{"http_code": 407, "url": <login>,
  "form": {...}}`` — and a JSON POST of the form fields (merged with
  the caller's ``proxy_auth_body``) to the login URL mints a session
  cookie when username/password/mfa_code match.

* :func:`negotiate_proxy_auth` — the client side, transport-agnostic
  (takes a ``request`` callable, so it drives urllib3, requests, or a
  Flask test client identically): probe, parse the challenge, POST
  the merged form with the challenge's cookies, adopt the session
  cookie on ``{"http_code": 200}``, raise
  :class:`ProxyNotAuthorizedError` otherwise — step for step the
  reference's ``connect`` loop.

The MFA code is an opaque form field end to end (the reference never
interprets it client-side; its proxy checks it server-side), so the
middleware checks equality against the configured per-user code — a
deterministic stand-in for the TOTP check a production proxy runs.
"""

from __future__ import annotations

import hmac
import json
import secrets
from collections import OrderedDict
from typing import Callable, Mapping

from ..compat import OngTsdbClientBaseError

#: session cookie name the proxy mints (any name works; one constant
#: keeps middleware and tests in sync)
SESSION_COOKIE = "proxy_session"

#: (status, headers, body) of a transport-agnostic response
Response = tuple[int, Mapping[str, str], bytes]
#: request(method, path, headers, json_body_or_None) -> Response
RequestFn = Callable[[str, str, Mapping[str, str], dict | None], Response]


class ProxyNotAuthorizedError(OngTsdbClientBaseError):
    """Proxy authentication required or rejected — the reference's
    ``ProxyNotAuthorizedException`` (exceptions.py:14), raised from
    the 401/json/http_code-407 challenge and from a failed login
    POST.  Carries the triggering response for protocol callers."""

    def __init__(self, msg: str, response: Response | None = None):
        super().__init__(msg)
        self.response = response


def _parse_cookies(header: str) -> dict[str, str]:
    out: dict[str, str] = {}
    for part in header.split(";"):
        if "=" in part:
            k, v = part.split("=", 1)
            out[k.strip()] = v.strip()
    return out


class MfaAuthProxy:
    """WSGI middleware: the authenticating proxy in front of the app.

    ``users`` maps username -> (password, mfa_code).  Sessions are
    in-memory (the proxy tier is stateless-restart like the reference
    deployment's — a restart just re-challenges)."""

    def __init__(
        self,
        app,
        users: dict[str, tuple[str, str]],
        login_path: str = "/proxy_login",
        max_sessions: int = 10_000,
    ):
        self.app = app
        self.users = dict(users)
        self.login_path = login_path
        # bounded FIFO: a client renegotiating per request (which
        # negotiate_proxy_auth makes easy) must not grow state forever
        self.max_sessions = max_sessions
        self._sessions: OrderedDict[str, None] = OrderedDict()

    # -- WSGI ----------------------------------------------------------
    def __call__(self, environ, start_response):
        cookies = _parse_cookies(environ.get("HTTP_COOKIE", ""))
        if environ.get("PATH_INFO") == self.login_path:
            return self._login(environ, start_response)
        if cookies.get(SESSION_COOKIE) in self._sessions:
            return self.app(environ, start_response)
        return self._challenge(start_response)

    def _challenge(self, start_response):
        body = json.dumps(
            {
                "http_code": 407,
                "url": self.login_path,
                "form": {"realm": "ong_tsdb"},
            }
        ).encode()
        start_response(
            "401 Unauthorized",
            [("Content-Type", "application/json"),
             ("Content-Length", str(len(body)))],
        )
        return [body]

    def _login(self, environ, start_response):
        try:
            size = int(environ.get("CONTENT_LENGTH") or 0)
            form = json.loads(environ["wsgi.input"].read(size) or b"{}")
        except (ValueError, KeyError):
            form = {}
        if not isinstance(form, dict):
            # valid JSON but not an object ('[]', '123', 'null') —
            # .get() below would AttributeError into a 500; treat as
            # an empty (failing) form instead
            form = {}
        user = form.get("username")
        expected = self.users.get(user if isinstance(user, str) else "")
        # constant-time compares, like the repo's token auth
        # (auth.py:38) — no credential-prefix timing channel.  BOTH
        # compares run even for unknown usernames (against fixed
        # dummy credentials), then AND with the user-exists flag: a
        # short-circuit would answer unknown users measurably faster,
        # a username-enumeration channel (ADVICE r6).
        pw, mfa = expected if expected is not None else ("?" * 32, "?" * 32)
        pw_ok = hmac.compare_digest(str(form.get("password") or ""), pw)
        mfa_ok = hmac.compare_digest(str(form.get("mfa_code") or ""), mfa)
        ok = (expected is not None) & pw_ok & mfa_ok
        if ok:
            sid = secrets.token_hex(16)
            self._sessions[sid] = None
            while len(self._sessions) > self.max_sessions:
                self._sessions.popitem(last=False)
            body = json.dumps({"http_code": 200}).encode()
            headers = [
                ("Content-Type", "application/json"),
                ("Content-Length", str(len(body))),
                ("Set-Cookie", f"{SESSION_COOKIE}={sid}; HttpOnly"),
            ]
        else:
            # the reference client treats anything but http_code==200
            # as a failed login (client.py:126-139) — the proxy still
            # answers 200 OK at the HTTP layer, like a login form does
            body = json.dumps({"http_code": 401, "error": "bad credentials"}).encode()
            headers = [
                ("Content-Type", "application/json"),
                ("Content-Length", str(len(body))),
            ]
        start_response("200 OK", headers)
        return [body]


def _cookie_header_from(resp_headers: Mapping[str, str]) -> dict[str, str]:
    # case-insensitive: HTTP/2 transports lowercase header names
    set_cookie = next(
        (v for k, v in resp_headers.items() if k.lower() == "set-cookie"), None
    )
    if not set_cookie:
        return {}
    return {"Cookie": set_cookie.split(";", 1)[0]}


def negotiate_proxy_auth(
    request: RequestFn,
    proxy_auth_body: dict,
    headers: Mapping[str, str] | None = None,
    probe_path: str = "/",
    negotiate_json_407: bool = False,
) -> dict[str, str]:
    """Client-side proxy negotiation (reference client.py:95-160):
    probe a protected path; on the 401/json challenge, POST the
    challenge's form fields merged with ``proxy_auth_body`` to the
    challenge URL (carrying its cookies), and return ``headers``
    updated with the minted session cookie.  No challenge -> headers
    unchanged.  Non-JSON challenge or failed login ->
    :class:`ProxyNotAuthorizedError` (carrying the response).

    Raw HTTP 407s match the reference EXACTLY by default: the
    reference raises ProxyNotAuthorizedException on ANY status-407
    response (reference client.py:201), whatever its body.  The
    OPT-IN extension ``negotiate_json_407=True`` (ADVICE r8: default
    must be reference behavior) additionally negotiates a 407 whose
    body carries a parseable JSON challenge exactly like the json-401
    flow — for proxies that both speak the challenge protocol and
    answer with the standards-correct status; bare/non-JSON 407s
    raise either way."""
    hdrs = dict(headers or {})
    status, rh, data = request("GET", probe_path, hdrs, None)
    if status not in (401, 407):
        return hdrs
    if status == 407 and not negotiate_json_407:
        # reference-exact: any raw 407 is a hard refusal
        raise ProxyNotAuthorizedError(
            "proxy authentication required (HTTP 407)",
            response=(status, rh, data),
        )
    # a standards-compliant proxy answers a bare HTTP 407 — run the
    # same challenge parse as the JSON-401 flow so it surfaces as the
    # documented ProxyNotAuthorizedError (reference client.py:201),
    # not as a silent no-challenge success
    rh_l = {k.lower(): v for k, v in rh.items()}
    if not (rh_l.get("content-type") or "").startswith("application/json"):
        raise ProxyNotAuthorizedError(
            "proxy auth response not understood (need json with url+form)",
            response=(status, rh, data),
        )
    try:
        js = json.loads(data)
    except ValueError as ex:
        # LB-generated 401s ship json content-type with empty or
        # truncated bodies — keep the documented error contract
        raise ProxyNotAuthorizedError(
            f"malformed proxy challenge body: {ex}",
            response=(status, rh, data),
        ) from ex
    if js.get("http_code") != 407:
        raise ProxyNotAuthorizedError(
            "unauthorized and not a proxy challenge",
            response=(status, rh, data),
        )
    login_url = js.get("url")
    if not isinstance(login_url, str) or not login_url:
        # challenge without a login URL: malformed — keep the
        # documented error contract (a bare KeyError would escape it)
        raise ProxyNotAuthorizedError(
            "proxy challenge lacks a login url",
            response=(status, rh, data),
        )
    body = dict(js.get("form") or {})
    body.update(proxy_auth_body)
    login_hdrs = dict(hdrs, **_cookie_header_from(rh))
    status2, rh2, data2 = request("POST", login_url, login_hdrs, body)
    ok = False
    rh2_l = {k.lower(): v for k, v in rh2.items()}
    if data2 and (rh2_l.get("content-type") or "").startswith("application/json"):
        try:
            ok = json.loads(data2).get("http_code") == 200
        except ValueError:
            ok = False
    if not ok:
        raise ProxyNotAuthorizedError(
            "proxy login failed", response=(status2, rh2, data2)
        )
    hdrs.update(_cookie_header_from(rh2))
    return hdrs
