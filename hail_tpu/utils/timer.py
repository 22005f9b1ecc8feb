"""ExecutionTimer: nested timing tree (reference
`hail/hail/utils/src/is/hail/utils/ExecutionTimer.scala:12` — the timings the
driver returns in the X-Hail-Timings header)."""

from __future__ import annotations

import time
from contextlib import contextmanager
from typing import Dict, List, Optional


class TimerNode:
    def __init__(self, name: str):
        self.name = name
        self.total_s = 0.0
        self.children: List['TimerNode'] = []

    def to_dict(self) -> dict:
        return {'name': self.name, 'total_s': round(self.total_s, 6),
                'children': [c.to_dict() for c in self.children]}

    def render(self, indent: int = 0) -> str:
        lines = [f'{"  " * indent}{self.name}: {self.total_s * 1000:.1f}ms']
        for c in self.children:
            lines.append(c.render(indent + 1))
        return '\n'.join(lines)


class ExecutionTimer:
    def __init__(self, root_name: str = 'execution'):
        self.root = TimerNode(root_name)
        self._stack = [self.root]

    @contextmanager
    def time(self, name: str):
        node = TimerNode(name)
        self._stack[-1].children.append(node)
        self._stack.append(node)
        t0 = time.time()
        try:
            yield node
        finally:
            node.total_s += time.time() - t0
            self._stack.pop()

    def finish(self) -> TimerNode:
        total = sum(c.total_s for c in self.root.children)
        self.root.total_s = total
        return self.root

    def render(self) -> str:
        self.finish()
        return self.root.render()


_current: Optional[ExecutionTimer] = None


def current_timer() -> Optional[ExecutionTimer]:
    return _current


@contextmanager
def timed(name: str = 'execution', log: bool = True):
    """Context manager: `with hl.utils.timed('query'): ...` prints the nested
    timing tree (the `hl.init(_timed)` surface of the reference)."""
    global _current
    prev = _current
    timer = ExecutionTimer(name)
    _current = timer
    try:
        yield timer
    finally:
        _current = prev
        if log:
            print(timer.render())
