"""Proxy/MFA auth tier (service/proxy.py) — the reference's
remote-server surface (tests/test_remote_server.py) made hermetic:
the interactive part of the reference test is only its ``input()``
calls; the PROTOCOL (401 + json http_code 407 challenge, form POST
merged with proxy_auth_body, session cookie, retry) is driven here
end to end through Werkzeug against the real Flask façade."""

from __future__ import annotations

import base64
import json

import pytest
from werkzeug.test import Client

from ong_tsdb_spark import OngTsdbSpark
from ong_tsdb_spark.service.proxy import (
    MfaAuthProxy,
    ProxyNotAuthorizedError,
    negotiate_proxy_auth,
)
from ong_tsdb_spark.service.server import create_app

USERS = {"alice": ("s3cret", "424242")}


@pytest.fixture()
def proxied(spark, tmp_path):
    eng = OngTsdbSpark(spark, str(tmp_path / "pxy_db"), admin_key="admintoken")
    app = create_app(eng)
    app.testing = True
    return Client(MfaAuthProxy(app.wsgi_app, USERS))


def _request_fn(client: Client):
    """Adapt a Werkzeug client to the transport-agnostic callable
    negotiate_proxy_auth drives (what urllib3 would be in prod)."""

    def request(method, path, headers, body):
        kwargs = {"headers": dict(headers)}
        if body is not None:
            kwargs["data"] = json.dumps(body)
            kwargs["headers"]["Content-Type"] = "application/json"
        r = client.open(path, method=method, **kwargs)
        return r.status_code, dict(r.headers), r.data

    return request


def _token_header(token: str) -> dict:
    cred = base64.b64encode(f"token:{token}".encode()).decode()
    return {"Authorization": f"Basic {cred}"}


def test_unauthenticated_gets_reference_challenge_shape(proxied):
    r = proxied.get("/")
    assert r.status_code == 401
    js = json.loads(r.data)
    assert js["http_code"] == 407
    assert js["url"] == "/proxy_login"
    assert "form" in js


def test_negotiation_mints_session_and_passes_through(proxied):
    headers = negotiate_proxy_auth(
        _request_fn(proxied),
        {"username": "alice", "password": "s3cret", "mfa_code": "424242"},
    )
    assert "Cookie" in headers
    # the session now reaches the REAL service routes: create a db
    # with the admin token, then see it listed
    h = dict(headers, **_token_header("admintoken"))
    assert proxied.post("/db/d1", headers=h).status_code in (200, 201)
    r = proxied.get("/db/d1/exist", headers=h)
    assert r.status_code == 200 and json.loads(r.data)["exists"] is True


@pytest.mark.parametrize(
    "body",
    [
        {"username": "alice", "password": "wrong", "mfa_code": "424242"},
        {"username": "alice", "password": "s3cret", "mfa_code": "000000"},
        {"username": "mallory", "password": "s3cret", "mfa_code": "424242"},
        {},
    ],
)
def test_bad_credentials_raise_proxy_not_authorized(proxied, body):
    with pytest.raises(ProxyNotAuthorizedError) as ei:
        negotiate_proxy_auth(_request_fn(proxied), body)
    assert ei.value.response is not None
    # a failed negotiation must NOT leak a session
    assert proxied.get("/").status_code == 401


def test_challenge_form_fields_are_merged_not_replaced(proxied):
    """The login body = challenge form fields UPDATED with
    proxy_auth_body (reference client.py:115-117) — the realm field
    from the challenge must survive the merge."""
    captured = {}
    fn = _request_fn(proxied)

    def spying(method, path, headers, body):
        if method == "POST":
            captured.update(body)
        return fn(method, path, headers, body)

    negotiate_proxy_auth(
        spying,
        {"username": "alice", "password": "s3cret", "mfa_code": "424242"},
    )
    assert captured["realm"] == "ong_tsdb"
    assert captured["username"] == "alice"


def test_no_proxy_is_a_noop(spark, tmp_path):
    """Against the bare service (no proxy tier) the negotiation
    returns the headers unchanged — the reference client connects to
    unproxied servers with the same code path."""
    eng = OngTsdbSpark(spark, str(tmp_path / "plain_db"))
    app = create_app(eng)
    app.testing = True
    c = Client(app.wsgi_app)
    headers = negotiate_proxy_auth(_request_fn(c), {"username": "x"})
    assert "Cookie" not in headers


def test_bare_407_raises_proxy_not_authorized():
    """A standards-compliant proxy answering a plain HTTP 407 (no JSON
    challenge) must surface as ProxyNotAuthorizedError — the
    reference client raises on status 407 (client.py:201); silently
    returning unchanged headers would turn the failure into a
    confusing downstream error (ADVICE r6)."""
    def bare_407(method, path, headers, body):
        return 407, {"Content-Type": "text/html"}, b"Proxy Authentication Required"

    with pytest.raises(ProxyNotAuthorizedError):
        negotiate_proxy_auth(bare_407, {"username": "x", "password": "y"})


def test_login_unknown_user_runs_constant_time_compares(proxied):
    """Unknown usernames answer exactly like wrong passwords (401
    json), and the compare path is exercised for both — the
    enumeration-channel fix keeps behavior identical."""
    c = proxied
    for form in (
        {"username": "nosuchuser", "password": "s3cret", "mfa_code": "424242"},
        {"username": "alice", "password": "wrong", "mfa_code": "424242"},
    ):
        r = c.post("/proxy_login", json=form)
        assert r.status_code == 200
        assert json.loads(r.data)["http_code"] == 401


def test_json_407_reference_default_raises_and_opt_in_negotiates():
    """ADVICE r8: json-carrying 407s are an OPT-IN extension.  Default
    = reference behavior (client.py:201 — ANY raw 407 raises, even
    with a well-formed JSON challenge body); negotiate_json_407=True
    runs the challenge flow instead."""
    import json as _json

    calls = []

    def json_407(method, path, headers, body):
        calls.append((method, path))
        if method == "GET":
            return (
                407,
                {"Content-Type": "application/json"},
                _json.dumps(
                    {"http_code": 407, "url": "/login",
                     "form": {"realm": "ong_tsdb"}}
                ).encode(),
            )
        return (
            200,
            {"Content-Type": "application/json",
             "Set-Cookie": "ong_proxy_session=abc; HttpOnly"},
            _json.dumps({"http_code": 200}).encode(),
        )

    creds = {"username": "x", "password": "y", "mfa_code": "z"}
    with pytest.raises(ProxyNotAuthorizedError):
        negotiate_proxy_auth(json_407, creds)
    assert calls == [("GET", "/")]  # no credentialed POST by default

    calls.clear()
    headers = negotiate_proxy_auth(json_407, creds, negotiate_json_407=True)
    assert ("POST", "/login") in calls
    assert headers.get("Cookie") == "ong_proxy_session=abc"
