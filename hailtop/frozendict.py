"""Module alias: the reference exposes frozendict at `hailtop.frozendict`
(reference `hail/python/hailtop/frozendict.py`)."""

from hail_tpu.utils.structs import frozendict

__all__ = ['frozendict']
