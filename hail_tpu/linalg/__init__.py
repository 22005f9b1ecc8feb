from .blockmatrix import BlockMatrix

__all__ = ['BlockMatrix']
