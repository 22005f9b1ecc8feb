"""Immutable list type at the reference's `hailtop.hail_frozenlist` path:
a FrozenList that is frozen on construction."""

from typing import Sequence, TypeVar

from frozenlist import FrozenList

T = TypeVar('T')


class frozenlist(FrozenList, Sequence[T]):  # noqa: N801 - reference name
    def __init__(self, items):
        super().__init__(items)
        self.freeze()

    def __repr__(self) -> str:
        return f'frozenlist({list(self)})'


__all__ = ['frozenlist']
