"""Module alias: the reference exposes the checker surface at
`hail.typecheck.check` (reference `hail/typecheck/check.py`)."""

from . import *  # noqa: F401,F403
from . import (TypeChecker, TypecheckFailure, anyfunc, anytype, char,  # noqa: F401
               dictof, enumeration, exactly, func_spec, identity, lazy,
               linked_list, nullable, numeric, oneof, only, sequenceof,
               setof, sized_tupleof, sliceof, transformed, tupleof,
               typecheck, typecheck_method)
