"""Typed-dict shapes of the client REST responses (reference
hailtop/batch_client/types.py)."""
from typing import Any, Dict, List, Optional, TypedDict


class CostBreakdownEntry(TypedDict):
    resource: str
    cost: float


class GetJobResponseV1Alpha(TypedDict, total=False):
    batch_id: int
    job_id: int
    name: Optional[str]
    user: str
    billing_project: str
    state: str
    exit_code: Optional[int]
    duration: Optional[int]
    cost: float
    msec_mcpu: int
    cost_breakdown: List[CostBreakdownEntry]
    status: Optional[Dict[str, Any]]
    spec: Optional[Dict[str, Any]]
    attributes: Dict[str, str]


class JobListEntryV1Alpha(TypedDict, total=False):
    batch_id: int
    job_id: int
    name: Optional[str]
    user: str
    billing_project: str
    state: str
    exit_code: Optional[int]
    duration: Optional[int]
    cost: float
    msec_mcpu: int
    cost_breakdown: List[CostBreakdownEntry]
    always_run: bool
    display_state: Optional[str]


class GetJobGroupResponseV1Alpha(TypedDict, total=False):
    batch_id: int
    job_group_id: int
    state: str
    complete: bool
    n_jobs: int
    n_completed: int
    n_succeeded: int
    n_failed: int
    n_cancelled: int
    time_created: Optional[str]
    time_completed: Optional[str]
    duration: Optional[int]
    cost: float
    cost_breakdown: List[CostBreakdownEntry]
    attributes: Dict[str, str]


class GetJobsResponseV1Alpha(TypedDict, total=False):
    jobs: List[JobListEntryV1Alpha]
    last_job_id: Optional[int]
