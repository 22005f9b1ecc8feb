from .structs import Struct, frozendict, Interval
from .timer import ExecutionTimer, timed


def range_table(n, n_partitions=None):
    from ..table import range_table as rt
    return rt(n, n_partitions)


def range_matrix_table(n_rows, n_cols, n_partitions=None):
    from ..matrixtable import range_matrix_table as rmt
    return rmt(n_rows, n_cols, n_partitions)


def genomic_range_table(n, n_partitions=None, reference_genome='default'):
    """Table keyed by locus over global positions [0, n) (reference
    hl.utils.genomic_range_table)."""
    from ..expr import functions as F
    t = range_table(n, n_partitions)
    t = t.key_by(locus=F.locus_from_global_position(
        F.int64(t.idx), reference_genome))
    return t.drop('idx')


__all__ = ['Struct', 'frozendict', 'Interval', 'ExecutionTimer', 'timed',
           'range_table', 'range_matrix_table', 'genomic_range_table']
