"""Salesforce connection/session surface (SURVEY §2 E2).

The reference signs into Salesforce through an Airflow connection
(``hooks/salesforce_hook.py:40-66``): the connection record carries
login/password/host plus a JSON ``Extras`` blob, and ``get_conn`` builds
client kwargs in one of two modes — ``auth_type='password'`` (default;
username + password + security_token) or ``auth_type='direct'``
(instance_url + session_id carried in the password field) — then memoizes
the signed-in client (``:44-46``).

This module reproduces that contract engine-side, decoupled from Airflow:

- :class:`SalesforceConnection` is the connection record (the same four
  fields the hook reads, with ``extras`` as a plain dict).
- :func:`auth_kwargs` is the pure auth_type dispatch — byte-for-byte the
  kwargs shape the reference hands ``simple_salesforce.Salesforce``.
- :class:`SalesforceSession` memoizes the signed-in client per the hook's
  ``if self.sf: return self.sf`` idiom.

The actual API client is INJECTED (``client_factory``) — the container
ships no Salesforce SDK and the conformance environment has no network,
so like the multimodal decode seams the transport is a documented
injection point and everything around it (credential resolution, mode
dispatch, memoization, validation) is real and tested
(tests/test_elt.py). On a cluster, pass
``client_factory=simple_salesforce.Salesforce``.
"""

from __future__ import annotations

from collections.abc import Callable, Mapping
from dataclasses import dataclass, field
from typing import Any


@dataclass(frozen=True)
class SalesforceConnection:
    """The connection record the reference's hook reads (login/password/
    host + extras). ``extras`` holds ``auth_type`` and, for password auth,
    ``security_token`` — exactly the keys the hook pulls from the Airflow
    connection's ``Extras`` JSON (salesforce_hook.py:37,47,59)."""

    login: str | None = None
    password: str | None = None
    host: str | None = None
    extras: Mapping[str, Any] = field(default_factory=dict)


def auth_kwargs(conn: SalesforceConnection) -> dict[str, Any]:
    """The hook's auth dispatch (salesforce_hook.py:47-62) as a pure
    function: ``auth_type='direct'`` maps (host, password) to
    (instance_url, session_id); anything else is password auth with the
    security token from extras. Raises on structurally unusable
    credentials instead of failing deep inside a client library."""
    auth_type = conn.extras.get("auth_type", "password")
    if auth_type == "direct":
        if not conn.host or not conn.password:
            raise ValueError(
                "direct auth needs host (instance_url) and password "
                "(session_id)"
            )
        return {"instance_url": conn.host, "session_id": conn.password}
    if not conn.login or not conn.password:
        raise ValueError("password auth needs login and password")
    return {
        "username": conn.login,
        "password": conn.password,
        "security_token": conn.extras.get("security_token"),
        "instance_url": conn.host,
    }


class SalesforceSession:
    """Memoized Salesforce sign-in (the hook's ``get_conn``,
    salesforce_hook.py:40-66): the first ``client()`` call builds the API
    client from :func:`auth_kwargs`; later calls return the same object.
    ``client_factory`` is the injected transport seam (e.g.
    ``simple_salesforce.Salesforce``); without one, ``client()`` raises
    ``NotImplementedError`` — no SDK or network ships in this container.
    """

    def __init__(
        self,
        conn: SalesforceConnection,
        client_factory: Callable[..., Any] | None = None,
    ) -> None:
        self.conn = conn
        self.client_factory = client_factory
        self._client: Any = None

    def client(self) -> Any:
        if self._client is not None:
            return self._client
        if self.client_factory is None:
            raise NotImplementedError(
                "Salesforce sign-in requires an injected client_factory "
                "(no Salesforce SDK in this environment)"
            )
        self._client = self.client_factory(**auth_kwargs(self.conn))
        return self._client

    def reset(self) -> None:
        """Drop the memoized client (token expiry / credential rotation)."""
        self._client = None
