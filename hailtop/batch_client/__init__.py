"""Drop-in alias: hailtop.batch_client -> the hail_tpu batch clients
(hail_tpu/batch_service/{aioclient,sync_client}.py)."""
from . import aioclient, client, globals, parse, types  # noqa: F401
from .aioclient import (  # noqa: F401
    BatchAlreadyCreatedError,
    BatchNotCreatedError,
    JobAlreadySubmittedError,
    JobNotSubmittedError,
)

__all__ = [
    'BatchAlreadyCreatedError',
    'BatchNotCreatedError',
    'JobAlreadySubmittedError',
    'JobNotSubmittedError',
    'aioclient',
    'client',
    'parse',
    'types',
]
