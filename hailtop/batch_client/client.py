from hail_tpu.batch_service.sync_client import (  # noqa: F401
    Batch, BatchClient, Job, JobGroup)
