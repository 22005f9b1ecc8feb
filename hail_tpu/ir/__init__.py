from . import columns, nodes, arrays, agg
from .nodes import (IR, AggOp, Apply, ApplyBinaryOp, ApplyUnaryOp, ArrayRef,
                    Cast, Coalesce, GetField, GetTupleElement, If, IsMissing,
                    Literal, MakeArray, MakeStruct, MakeTuple, NA, Ref)

__all__ = ['columns', 'nodes', 'arrays', 'agg', 'IR', 'AggOp', 'Apply',
           'ApplyBinaryOp', 'ApplyUnaryOp', 'ArrayRef', 'Cast', 'Coalesce',
           'GetField', 'GetTupleElement', 'If', 'IsMissing', 'Literal',
           'MakeArray', 'MakeStruct', 'MakeTuple', 'NA', 'Ref']
