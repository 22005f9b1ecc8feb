"""User configuration (reference `hailtop/config/`: user config file +
DeployConfig). `hailctl config set/get` persists to
~/.config/hail_tpu/config.ini with the same section/option addressing
(`section/option` paths)."""

from __future__ import annotations

import configparser
import os
from typing import Optional, Tuple

_config = None


def config_path() -> str:
    xdg = os.environ.get('XDG_CONFIG_HOME', os.path.expanduser('~/.config'))
    return os.path.join(xdg, 'hail_tpu', 'config.ini')


def get_user_config() -> configparser.ConfigParser:
    global _config
    if _config is None:
        _config = configparser.ConfigParser()
        p = config_path()
        if os.path.exists(p):
            _config.read(p)
    return _config


def _split(key: str) -> Tuple[str, str]:
    if '/' in key:
        section, option = key.rsplit('/', 1)
    else:
        section, option = 'global', key
    return section, option


def get_config_option(key: str, default: Optional[str] = None) -> Optional[str]:
    cfg = get_user_config()
    section, option = _split(key)
    if cfg.has_option(section, option):
        return cfg.get(section, option)
    return default


def set_config_option(key: str, value: str) -> None:
    cfg = get_user_config()
    section, option = _split(key)
    if not cfg.has_section(section) and section != 'DEFAULT':
        cfg.add_section(section)
    cfg.set(section, option, value)
    p = config_path()
    os.makedirs(os.path.dirname(p), exist_ok=True)
    with open(p, 'w') as f:
        cfg.write(f)


def unset_config_option(key: str) -> None:
    cfg = get_user_config()
    section, option = _split(key)
    if cfg.has_option(section, option):
        cfg.remove_option(section, option)
        with open(config_path(), 'w') as f:
            cfg.write(f)


def list_config() -> dict:
    cfg = get_user_config()
    return {s: dict(cfg.items(s)) for s in cfg.sections()}


# the full service-routing DeployConfig lives in
# services/deploy_config.py; re-exported here for the
# hailtop.config surface
from .services.deploy_config import DeployConfig, get_deploy_config  # noqa: E402,F401


class ConfigVariable(str, __import__('enum').Enum):
    """Known user-config keys (reference `hailtop/config/variables.py`)."""

    DOMAIN = 'domain'
    PROFILE = 'profile'
    GCS_REQUESTER_PAYS_PROJECT = 'gcs_requester_pays/project'
    GCS_REQUESTER_PAYS_BUCKETS = 'gcs_requester_pays/buckets'
    GCS_BUCKET_ALLOW_LIST = 'gcs/bucket_allow_list'
    BATCH_BUCKET = 'batch/bucket'
    BATCH_REMOTE_TMPDIR = 'batch/remote_tmpdir'
    BATCH_REGIONS = 'batch/regions'
    BATCH_BILLING_PROJECT = 'batch/billing_project'
    BATCH_BACKEND = 'batch/backend'
    QUERY_BACKEND = 'query/backend'
    QUERY_BATCH_BACKEND_MAX_READ_PARALLELISM = 'query/batch_backend_max_read_parallelism'
    QUERY_BATCH_DRIVER_CORES = 'query/batch_driver_cores'
    QUERY_BATCH_WORKER_CORES = 'query/batch_worker_cores'
    QUERY_BATCH_DRIVER_MEMORY = 'query/batch_driver_memory'
    QUERY_BATCH_WORKER_MEMORY = 'query/batch_worker_memory'
    QUERY_NAME_PREFIX = 'query/name_prefix'
    QUERY_DISABLE_PROGRESS_BAR = 'query/disable_progress_bar'
    HTTP_TIMEOUT_IN_SECONDS = 'http/timeout_in_seconds'


def configuration_of(config_variable, explicit_argument, fallback, *,
                     deprecated_envvar=None):
    """Explicit arg → user config → fallback (reference
    `hailtop/config/user_config.py:131`)."""
    if explicit_argument is not None:
        return explicit_argument
    key = config_variable.value if isinstance(config_variable, ConfigVariable) \
        else str(config_variable)
    v = get_config_option(key)
    if v is not None:
        return v
    return fallback
