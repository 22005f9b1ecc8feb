"""Axis-scope analysis over expression IR.

The reference tracks, for every expression, which dimensional axes it uses
outside aggregators (its free indices) and which it aggregates over
(`expressions/base_expression.py` indices + `check_*` helpers). Here the
information is recovered by walking the IR: environment references carry the
axis (`va` = row, `sa` = column, `g` = entry, `global` = none), and AggOp
subtrees count as aggregated usage."""

from __future__ import annotations

from typing import FrozenSet, Tuple

from ..ir.nodes import AggOp, Ref

_REF_AXES = {
    'va': frozenset({'row'}),
    'sa': frozenset({'column'}),
    'g': frozenset({'row', 'column'}),
    'global': frozenset(),
}


def axis_usage(ir) -> Tuple[FrozenSet[str], FrozenSet[str]]:
    """(free axes, aggregated axes) of a predicate IR."""
    free, agged = set(), set()

    def walk(node, in_agg):
        if isinstance(node, Ref):
            axes = _REF_AXES.get(node.name)
            if axes:
                (agged if in_agg else free).update(axes)
            return
        if isinstance(node, AggOp):
            for ch in node.args:
                walk(ch, True)
            if node.filter_ir is not None:
                walk(node.filter_ir, True)
            return
        for ch in getattr(node, 'children', ()):
            walk(ch, in_agg)

    walk(ir, False)
    return frozenset(free), frozenset(agged)
