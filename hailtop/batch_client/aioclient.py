from hail_tpu.batch_service.aioclient import *  # noqa: F401,F403
from hail_tpu.batch_service.aioclient import (  # noqa: F401
    Batch, BatchClient, BatchSubmissionInfo, HailExplicitTokenCredentials,
    Job, JobGroup, SpecBytes, SpecType)
