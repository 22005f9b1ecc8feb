"""Sync client for the AuthService (the shape of reference hailtop/auth:
get_userinfo / service_auth_headers / copy-paste login against
auth/auth/auth.py's routes)."""

from __future__ import annotations

import json
import urllib.request
from typing import Optional

from .tokens import get_token, remove_token, service_auth_headers, set_token  # noqa: F401


def _req(url: str, method: str = 'GET', body: Optional[dict] = None,
         token: Optional[str] = None) -> dict:
    data = None if body is None else json.dumps(body).encode()
    headers = {'Content-Type': 'application/json'}
    if token:
        headers['Authorization'] = f'Bearer {token}'
    req = urllib.request.Request(url, data=data, method=method, headers=headers)
    with urllib.request.urlopen(req, timeout=30) as resp:
        return json.loads(resp.read() or b'{}')


def login(auth_url: str, username: str, namespace: str = 'default') -> str:
    """Obtain a session token for `username` and store it (the zero-egress
    analogue of `hailctl auth login`'s OAuth flow)."""
    out = _req(f'{auth_url.rstrip("/")}/api/v1alpha/login', 'POST',
               {'username': username})
    set_token(out['token'], namespace)
    return out['token']


def logout(auth_url: str, namespace: str = 'default') -> None:
    token = get_token(namespace)
    if token:
        try:
            _req(f'{auth_url.rstrip("/")}/api/v1alpha/logout', 'POST', {},
                 token=token)
        finally:
            remove_token(namespace)


def get_userinfo(auth_url: str, token: Optional[str] = None,
                 namespace: str = 'default') -> dict:
    token = token or get_token(namespace)
    return _req(f'{auth_url.rstrip("/")}/api/v1alpha/userinfo', token=token)


def copy_paste_login(auth_url: str, copy_paste_token: str,
                     namespace: str = 'default') -> str:
    """Exchange a short-lived copy-paste token for a session (reference
    hailtop/auth copy_paste_login)."""
    out = _req(f'{auth_url.rstrip("/")}/api/v1alpha/copy-paste-login', 'POST',
               {'token': copy_paste_token})
    set_token(out['token'], namespace)
    return out['token']
