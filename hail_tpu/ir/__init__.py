from . import columns, nodes, arrays, agg

__all__ = ['columns', 'nodes', 'arrays', 'agg']
