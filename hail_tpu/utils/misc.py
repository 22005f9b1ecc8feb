"""General utility helpers (reference hail/utils/misc.py + java.py +
deduplicate.py + tutorial.py)."""

from __future__ import annotations

import json
import os
import subprocess
import tempfile
import time
from typing import Any, Callable, List, Optional, Sequence, Tuple


class HailUserError(Exception):
    """An error caused by invalid user input (reference utils/java.py:16)."""


class FatalError(Exception):
    """An unrecoverable engine error (reference utils/java.py:20)."""


def error(msg: str) -> None:
    """Log an error-level message (reference utils/java.py error)."""
    print(f'ERROR: {msg}')


def warning(msg: str) -> None:
    print(f'WARNING: {msg}')


def info(msg: str) -> None:
    print(msg)


def default_handler():
    """The default display handler for show()-style output."""
    return print


def wrap_to_list(x):
    return x if isinstance(x, list) else [x]


def get_env_or_default(maybe_value, env_var: str, default):
    import os as _os
    return maybe_value if maybe_value is not None else _os.environ.get(env_var, default)


def uri_path(uri: str) -> str:
    if uri.startswith('file://'):
        return uri[7:]
    return uri


def local_path_uri(path: str) -> str:
    return 'file://' + os.path.abspath(path)


def new_temp_file(prefix: Optional[str] = None, extension: Optional[str] = None) -> str:
    """Fresh path in the session temporary directory (reference
    utils/misc.py:178)."""
    from ..context import Env
    tmpdir = Env.hc().tmp_dir if Env.is_initialized() else tempfile.gettempdir()
    import uuid
    name = uuid.uuid4().hex
    if prefix:
        name = f'{prefix}-{name}'
    if extension:
        name = f'{name}.{extension}'
    os.makedirs(tmpdir, exist_ok=True)
    return os.path.join(tmpdir, name)


def new_local_temp_dir(suffix=None, prefix=None, dir=None) -> str:
    return tempfile.mkdtemp(suffix, prefix, dir)


def new_local_temp_file(filename: str = 'temp') -> str:
    d = new_local_temp_dir()
    return os.path.join(d, filename)


class with_local_temp_file:
    """Context manager yielding a local temp file path, removed on exit."""

    def __init__(self, filename: str = 'temp'):
        self.filename = filename

    def __enter__(self) -> str:
        self.path = new_local_temp_file(self.filename)
        return self.path

    def __exit__(self, *exc):
        try:
            if os.path.exists(self.path):
                os.remove(self.path)
        except OSError:
            pass


def run_command(args: List[str]) -> str:
    return subprocess.check_output(args, stderr=subprocess.STDOUT).decode()


def timestamp_path(base: str, suffix: str = '') -> str:
    ts = time.strftime('%Y%m%d-%H%M')
    return f'{base}-{ts}{suffix}'


def guess_cloud_spark_provider() -> Optional[str]:
    """No managed Spark providers exist in this environment."""
    return None


def chunk(size: int, seq: Sequence):
    for i in range(0, len(seq), size):
        yield seq[i:i + size]


def maybe(f: Callable, ma, default=None):
    return f(ma) if ma is not None else default


def no_service_backend(unsupported_feature: str):
    """Raise when a feature is unsupported on the service backend; this build
    has no service backend so it is a no-op guard."""
    return None


def storage_level(level: str = 'MEMORY_AND_DISK') -> str:
    """Spark storage levels have no analogue here; persisted tables live in
    host memory."""
    return level


def deduplicate(ids: Sequence[str], max_attempts: Optional[int] = None,
                already_used: Optional[set] = None) -> Tuple[List[Tuple[str, str]], List[str]]:
    """Append _N suffixes to duplicate identifiers (reference
    utils/deduplicate.py). Returns (renames, new_ids)."""
    used = set(already_used) if already_used is not None else set()
    renames: List[Tuple[str, str]] = []
    out: List[str] = []
    for s in ids:
        if s not in used:
            used.add(s)
            out.append(s)
            continue
        i = 1
        while True:
            cand = f'{s}_{i}'
            if cand not in used:
                break
            i += 1
            if max_attempts is not None and i > max_attempts:
                raise ValueError(f'could not deduplicate {s} in {max_attempts} attempts')
        used.add(cand)
        renames.append((s, cand))
        out.append(cand)
    return renames, out


class LinkedList:
    """Immutable singly-linked list (reference utils/linkedlist.py)."""

    class Node:
        __slots__ = ('value', 'next')

        def __init__(self, value, next_node):
            self.value = value
            self.next = next_node

    def __init__(self, type_):
        self.type = type_
        self.node = None
        self.count = 0

    def push(self, *xs) -> 'LinkedList':
        out = self
        for x in xs:
            new = LinkedList(out.type)
            new.node = LinkedList.Node(x, out.node)
            new.count = out.count + 1
            out = new
        return out

    def empty(self) -> bool:
        return self.node is None

    def __len__(self):
        return self.count

    def __iter__(self):
        n = self.node
        while n is not None:
            yield n.value
            n = n.next

    def __str__(self):
        return 'List(' + ', '.join(str(x) for x in self) + ')'

    def __repr__(self):
        return str(self)

    def __eq__(self, other):
        return isinstance(other, LinkedList) and list(self) == list(other)


class JSONEncoder(json.JSONEncoder):
    """JSON encoder aware of hail values (Struct, Locus, Call, intervals,
    frozendict) — reference utils/misc.py JSONEncoder."""

    def default(self, o: Any) -> Any:
        from .structs import Struct, frozendict, Interval
        from ..genetics.locus import Locus
        from ..genetics.call import Call
        if isinstance(o, Struct):
            return dict(o)
        if isinstance(o, frozendict):
            return dict(o)
        if isinstance(o, Interval):
            return {'start': o.start, 'end': o.end,
                    'includes_start': o.includes_start,
                    'includes_end': o.includes_end}
        if isinstance(o, Locus):
            return {'contig': o.contig, 'position': o.position,
                    'reference_genome': str(o.reference_genome)}
        if isinstance(o, Call):
            return str(o)
        if isinstance(o, (set, frozenset)):
            return sorted(o) if all(isinstance(x, (int, float, str)) for x in o) else list(o)
        import numpy as np
        if isinstance(o, np.generic):
            return o.item()
        if isinstance(o, np.ndarray):
            return o.tolist()
        return super().default(o)


def _dumps_partitions(partitions, row_key_type):
    """Serialize interval partition bounds as JSON (reference misc.py)."""
    return json.dumps([
        {'start': p.start, 'end': p.end,
         'includeStart': p.includes_start, 'includeEnd': p.includes_end}
        for p in partitions
    ], cls=JSONEncoder)


_TUTORIAL_GATED = (
    'tutorial data download requires network access; this build has no '
    'egress. Place the extracted files under the output directory manually '
    'or use your own dataset.'
)


def get_1kg(output_dir: str, overwrite: bool = False) -> None:
    """Download the 1000-genomes tutorial dataset (reference
    utils/tutorial.py:47). Gated: no network egress."""
    raise NotImplementedError('get_1kg: ' + _TUTORIAL_GATED)


def get_hgdp(output_dir: str, overwrite: bool = False) -> None:
    raise NotImplementedError('get_hgdp: ' + _TUTORIAL_GATED)


def get_movie_lens(output_dir: str, overwrite: bool = False) -> None:
    raise NotImplementedError('get_movie_lens: ' + _TUTORIAL_GATED)
