"""`hl.scan.*` — streaming prefix (scan) aggregators.

Parity with reference scan support (`aggregators.py` scan variants lowered by
`LowerTableIR.scala:1607-1660` two-phase prefix). Round-1: exclusive prefix
scans over tables, computed per partition with carried prefix states.
"""

from __future__ import annotations

import numpy as np

from .. import types as ht
from ..ir import agg as A
from ..ir.nodes import AggOp
from .expression import Expression, Indices, construct_expr, to_expr, unify_all


class ScanOp(AggOp):
    """Marker subclass: same aggregator machinery, prefix semantics."""
    is_scan = True


def _scan(aggregator, args, init_args=()) -> Expression:
    exprs = [to_expr(a) for a in args]
    rt = aggregator.result_type([e.dtype for e in exprs], init_args)
    ind = unify_all(*exprs) if exprs else Indices()
    node = ScanOp(aggregator, [e._ir for e in exprs], rt, None, init_args)
    return construct_expr(node, ind)


def count() -> Expression:
    return _scan(A.CountAgg(), [])


def sum(expr) -> Expression:
    return _scan(A.SumAgg(), [expr])


def mean(expr) -> Expression:
    return _scan(A.MeanAgg(), [expr])


def min(expr) -> Expression:
    return _scan(A.MinMaxAgg(True), [expr])


def max(expr) -> Expression:
    return _scan(A.MinMaxAgg(False), [expr])


def count_where(cond) -> Expression:
    return _scan(A.CountWhereAgg(), [cond])


def collect(expr) -> Expression:
    return _scan(A.CollectAgg('collect'), [expr])
