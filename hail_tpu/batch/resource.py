"""Batch resources: files flowing between jobs (reference
`hailtop/batch/resource.py`)."""

from __future__ import annotations

import itertools
from typing import Dict, Optional

_uid_counter = itertools.count()


def _new_uid(prefix: str) -> str:
    return f'__{prefix}_{next(_uid_counter)}__'


class Resource:
    _uid: str

    def _token(self) -> str:
        return '${' + self._uid + '}'

    def __str__(self) -> str:
        return self._token()


class ResourceFile(Resource, str):
    """A single file resource. str-subclass whose value is the substitution
    token, so commands can join/format resources directly (reference
    resource.py:30 ResourceFile(Resource, str))."""

    def __new__(cls, *args, **kwargs):
        uid = _new_uid('RESOURCE_FILE')
        r = str.__new__(cls, '${' + uid + '}')
        r._uid = uid
        return r

    def __init__(self, *args, **kwargs):
        self._source_job = None
        self._output_paths = []
        self._extension = None

    def add_extension(self, ext: str) -> 'ResourceFile':
        if self._extension is not None:
            raise ValueError('resource already has an extension: '
                             f'{self._extension!r}')
        self._extension = ext
        return self

    @property
    def _value(self) -> str:
        # reference resource.py: the generated in-container file name
        return self._uid.strip('_') + (self._extension or '')

    def __str__(self) -> str:
        return self._token()

    def __repr__(self) -> str:
        return f'{type(self).__name__}({self._uid})'


class InputResourceFile(ResourceFile):
    def __init__(self, input_path: str):
        super().__init__()
        self._input_path = input_path

    @property
    def _value(self) -> str:
        import os
        return os.path.basename(self._input_path) + (self._extension or '')


class JobResourceFile(ResourceFile):
    def __init__(self, job):
        super().__init__()
        self._source_job = job


class ResourceGroup(Resource):
    """Named collection of files sharing a root path (e.g. plink
    {bed,bim,fam})."""

    def __init__(self, source_job, **named: str):
        self._uid = _new_uid('GROUP')
        self._source_job = source_job
        self._files: Dict[str, ResourceFile] = {}
        self._templates = dict(named)
        for name in named:
            f = JobResourceFile(source_job) if source_job is not None else ResourceFile()
            f._group = self
            f._group_name = name
            self._files[name] = f

    def __getattr__(self, name):
        if name.startswith('_'):
            raise AttributeError(name)
        if name in self._files:
            return self._files[name]
        raise AttributeError(f'ResourceGroup has no file {name!r}')

    def __getitem__(self, name):
        return self._files[name]


class PythonResult(Resource, str):
    """Handle to a python job call's return value (reference
    resource.py:291 PythonResult(Resource, str))."""

    def __new__(cls, *args, **kwargs):
        uid = _new_uid('PYTHON_RESULT')
        r = str.__new__(cls, '${' + uid + '}')
        r._uid = uid
        return r

    def __init__(self, source_job):
        self._source_job = source_job
        self._json_file = None
        self._str_file = None
        self._repr_file = None

    def as_json(self) -> JobResourceFile:
        if self._json_file is None:
            self._json_file = JobResourceFile(self._source_job)
            self._json_file.add_extension('.json')
        return self._json_file

    def as_str(self) -> JobResourceFile:
        if self._str_file is None:
            self._str_file = JobResourceFile(self._source_job)
            self._str_file.add_extension('.txt')
        return self._str_file

    def as_repr(self) -> JobResourceFile:
        if self._repr_file is None:
            self._repr_file = JobResourceFile(self._source_job)
            self._repr_file.add_extension('.repr')
        return self._repr_file
