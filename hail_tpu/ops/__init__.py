from . import regression, ibs

__all__ = ['regression', 'ibs']
