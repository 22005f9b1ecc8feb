from . import expression, functions, aggregators

__all__ = ['expression', 'functions', 'aggregators']
