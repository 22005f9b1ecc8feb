"""Service routing configuration (reference hailtop/config/deploy_config.py):
where a service lives (external DNS / in-cluster k8s / gce-internal) and how
to build URLs to it from each vantage point. Namespaced (non-default)
deployments route through an `internal.` domain with a per-namespace base
path."""

from __future__ import annotations

import json
import os
from typing import Dict, Optional


def env_var_or_default(name: str, default):
    return os.environ.get(f'HAIL_{name.upper()}', default)


class DeployConfig:
    def __init__(self, location: str, default_namespace: str, domain: str,
                 base_path: Optional[str]):
        assert location in ('external', 'k8s', 'gce')
        self._location = location
        self._default_namespace = default_namespace
        self._domain = domain
        self._base_path = base_path

    # -- construction --------------------------------------------------------
    @classmethod
    def from_config(cls, config: Dict[str, str]) -> 'DeployConfig':
        location = env_var_or_default('location', config['location'])
        domain = env_var_or_default('domain', config['domain'])
        ns = env_var_or_default('default_namespace',
                                config['default_namespace'])
        base_path = env_var_or_default('base_path',
                                       config.get('base_path')) or None
        if base_path is None and ns != 'default':
            domain = f'internal.{config["domain"]}'
            base_path = f'/{ns}'
        return cls(location, ns, domain, base_path)

    @classmethod
    def default_config(cls) -> Dict[str, str]:
        from ..config import get_user_config
        return {
            'location': 'external',
            'default_namespace': 'default',
            'domain': get_user_config().get('global', 'domain',
                                            fallback='hail.is'),
        }

    @classmethod
    def from_config_file(cls, config_file=None) -> 'DeployConfig':
        for candidate in (config_file,
                          os.environ.get('HAIL_DEPLOY_CONFIG_FILE'),
                          os.path.expanduser('~/.hail/deploy-config.json'),
                          '/deploy-config/deploy-config.json'):
            if candidate and os.path.isfile(candidate):
                with open(candidate, encoding='utf-8') as f:
                    return cls.from_config(json.load(f))
        return cls.from_config(cls.default_config())

    def get_config(self) -> Dict[str, Optional[str]]:
        return {
            'location': self._location,
            'default_namespace': self._default_namespace,
            'domain': self._domain,
            'base_path': self._base_path,
        }

    # -- derived views --------------------------------------------------------
    def with_default_namespace(self, default_namespace: str) -> 'DeployConfig':
        base_domain = self._domain.removeprefix('internal.')
        if default_namespace == 'default':
            return DeployConfig(self._location, default_namespace,
                                base_domain, None)
        return DeployConfig(self._location, default_namespace,
                            f'internal.{base_domain}',
                            f'/{default_namespace}')

    def with_location(self, location: str) -> 'DeployConfig':
        return DeployConfig(location, self._default_namespace, self._domain,
                            self._base_path)

    def default_namespace(self) -> str:
        return self._default_namespace

    def location(self) -> str:
        return self._location

    def scheme(self, base_scheme: str = 'http') -> str:
        return (base_scheme + 's') if self._location in ('external', 'k8s') \
            else base_scheme

    def domain(self, service: str) -> str:
        ns = self._default_namespace
        if self._location == 'k8s':
            return f'{service}.{ns}'
        if self._location == 'gce':
            if self._base_path is None:
                return f'{service}.hail'
            return 'internal.hail'
        if self._base_path is None:
            return f'{service}.{self._domain}'
        return self._domain

    def base_path(self, service: str) -> str:
        if self._base_path is None:
            return ''
        return f'{self._base_path}/{service}'

    def base_url(self, service: str, base_scheme: str = 'http') -> str:
        # HAIL_<SERVICE>_URL pins a service to an explicit address (the
        # single-node deployment: HAIL_BATCH_URL, HAIL_AUTH_URL, ...)
        override = os.environ.get(
            f'HAIL_{service.upper().replace("-", "_")}_URL')
        if override:
            return override.rstrip('/')
        return (f'{self.scheme(base_scheme)}://{self.domain(service)}'
                f'{self.base_path(service)}')

    def url(self, service: str, path: str, base_scheme: str = 'http') -> str:
        return f'{self.base_url(service, base_scheme=base_scheme)}{path}'

    def auth_session_cookie_name(self) -> str:
        return 'session' if self._default_namespace == 'default' else 'sesh'

    def external_url(self, service: str, path: str,
                     base_scheme: str = 'http') -> str:
        if self._base_path is None:
            if service == 'www':
                return f'{base_scheme}s://{self._domain}{path}'
            return f'{base_scheme}s://{service}.{self._domain}{path}'
        return f'{base_scheme}s://{self._domain}{self._base_path}/{service}{path}'


_deploy_config: Optional[DeployConfig] = None


def get_deploy_config() -> DeployConfig:
    global _deploy_config
    if _deploy_config is None:
        _deploy_config = DeployConfig.from_config_file()
    return _deploy_config
