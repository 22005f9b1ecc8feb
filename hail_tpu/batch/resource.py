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


class ResourceFile(Resource):
    def __init__(self, uid: Optional[str] = None):
        self._uid = uid or _new_uid('RESOURCE_FILE')
        self._source_job = None
        self._output_paths = []

    def add_extension(self, ext: str) -> 'ResourceFile':
        self._extension = ext
        return self


class InputResourceFile(ResourceFile):
    def __init__(self, input_path: str):
        super().__init__(_new_uid('INPUT'))
        self._input_path = input_path


class JobResourceFile(ResourceFile):
    def __init__(self, job):
        super().__init__(_new_uid('JOB_FILE'))
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


class PythonResult(Resource):
    """Result handle of a PythonJob call (reference PythonResult): usable as
    an input to later python jobs, or rendered to files."""

    def __init__(self, source_job):
        self._uid = _new_uid('PYTHON_RESULT')
        self._source_job = source_job
        self._json_file: Optional[JobResourceFile] = None
        self._str_file: Optional[JobResourceFile] = None
        self._repr_file: Optional[JobResourceFile] = None

    def as_json(self) -> JobResourceFile:
        if self._json_file is None:
            self._json_file = JobResourceFile(self._source_job)
            self._json_file._from_python_result = (self, 'json')
        return self._json_file

    def as_str(self) -> JobResourceFile:
        if self._str_file is None:
            self._str_file = JobResourceFile(self._source_job)
            self._str_file._from_python_result = (self, 'str')
        return self._str_file

    def as_repr(self) -> JobResourceFile:
        if self._repr_file is None:
            self._repr_file = JobResourceFile(self._source_job)
            self._repr_file._from_python_result = (self, 'repr')
        return self._repr_file
