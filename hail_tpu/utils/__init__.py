from .structs import Struct, frozendict, Interval
from .timer import ExecutionTimer, timed

__all__ = ['Struct', 'frozendict', 'Interval', 'ExecutionTimer', 'timed']
