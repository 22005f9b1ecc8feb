"""Client-side session-token store (reference hailtop/auth/tokens.py:
namespace -> token in ~/.hail/tokens.json, chmod 600)."""

from __future__ import annotations

import json
import os
from typing import Dict, Optional


def tokens_file() -> str:
    return os.environ.get(
        'HAIL_TOKENS_FILE',
        os.path.expanduser('~/.hail_tpu/tokens.json'))


def get_tokens() -> Dict[str, str]:
    path = tokens_file()
    if not os.path.exists(path):
        return {}
    with open(path) as f:
        return json.load(f)


def get_token(namespace: str = 'default') -> Optional[str]:
    return get_tokens().get(namespace)


def set_token(token: str, namespace: str = 'default') -> None:
    path = tokens_file()
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tokens = get_tokens()
    tokens[namespace] = token
    fd = os.open(path, os.O_WRONLY | os.O_CREAT | os.O_TRUNC, 0o600)
    with os.fdopen(fd, 'w') as f:
        json.dump(tokens, f)


def remove_token(namespace: str = 'default') -> None:
    tokens = get_tokens()
    if namespace in tokens:
        del tokens[namespace]
        with open(tokens_file(), 'w') as f:
            json.dump(tokens, f)


def service_auth_headers(namespace: str = 'default') -> Dict[str, str]:
    """Authorization header for service requests (reference
    hailtop/auth/auth.py service_auth_headers)."""
    token = get_token(namespace)
    if token is None:
        return {}
    return {'Authorization': f'Bearer {token}'}
