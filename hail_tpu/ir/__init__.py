from . import columns, nodes, arrays, agg
from .nodes import (IR, AggOp, Apply, ApplyBinaryOp, ApplyUnaryOp, ArrayRef,
                    Cast, Coalesce, GetField, GetTupleElement, If, IsMissing,
                    Literal, MakeArray, MakeStruct, MakeTuple, NA, Ref)
from .relational_ir import *  # noqa: F401,F403 — lineage node classes
from . import relational_ir as _rir

__all__ = ['columns', 'nodes', 'arrays', 'agg', 'IR', 'AggOp', 'Apply',
           'ApplyBinaryOp', 'ApplyUnaryOp', 'ArrayRef', 'Cast', 'Coalesce',
           'GetField', 'GetTupleElement', 'If', 'IsMissing', 'Literal',
           'MakeArray', 'MakeStruct', 'MakeTuple', 'NA', 'Ref']
