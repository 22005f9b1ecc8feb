from .structs import Struct, frozendict, Interval

__all__ = ['Struct', 'frozendict', 'Interval']
