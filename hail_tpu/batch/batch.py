"""The Batch pipeline builder (reference `hailtop/batch/batch.py`)."""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Union

from .job import BashJob, Job, PythonJob
from .resource import (InputResourceFile, JobResourceFile, Resource,
                       ResourceFile, ResourceGroup)


class Batch:
    @staticmethod
    def from_batch_id(batch_id, *args, **kwargs):
        """Reference: attach to an existing service batch by id — requires
        the Batch service backend, absent in this build."""
        raise NotImplementedError(
            'from_batch_id requires the cloud Batch service; this build '
            'runs batches locally only')

    def __init__(self, name: Optional[str] = None, backend=None,
                 attributes: Optional[Dict[str, str]] = None,
                 requester_pays_project: Optional[str] = None,
                 default_image: Optional[str] = None,
                 default_memory: Optional[str] = None,
                 default_cpu: Optional[str] = None,
                 default_storage: Optional[str] = None,
                 default_shell: Optional[str] = None,
                 project: Optional[str] = None,
                 cancel_after_n_failures: Optional[int] = None):
        from .backend import LocalBackend
        self.name = name
        self.attributes = attributes or {}
        self._backend = backend or LocalBackend()
        self._jobs: List[Job] = []
        self._inputs: List[InputResourceFile] = []
        self._outputs: List[tuple] = []
        self._default_image = default_image
        self._default_shell = default_shell or '/bin/bash'
        self._cancel_after_n_failures = cancel_after_n_failures

    # -- construction ------------------------------------------------------
    def new_job(self, name: Optional[str] = None,
                attributes: Optional[Dict[str, str]] = None,
                shell: Optional[str] = None) -> BashJob:
        return self.new_bash_job(name, attributes, shell)

    def new_bash_job(self, name=None, attributes=None, shell=None) -> BashJob:
        j = BashJob(self, name, attributes, shell or self._default_shell)
        self._jobs.append(j)
        return j

    def new_python_job(self, name=None, attributes=None) -> PythonJob:
        j = PythonJob(self, name, attributes)
        self._jobs.append(j)
        return j

    def read_input(self, path: str) -> InputResourceFile:
        f = InputResourceFile(path)
        self._inputs.append(f)
        return f

    def read_input_group(self, **paths: str) -> ResourceGroup:
        rg = ResourceGroup(None, **{k: '{root}' for k in paths})
        if not hasattr(self, '_input_groups'):
            self._input_groups = []
        self._input_groups.append(rg)
        for k, p in paths.items():
            inp = InputResourceFile(p)
            inp._group = rg
            inp._group_name = k
            rg._files[k] = inp
            self._inputs.append(inp)
        return rg

    def write_output(self, resource: Resource, dest: str) -> None:
        self._outputs.append((resource, dest))

    def select_jobs(self, pattern: str) -> List[Job]:
        import re
        pat = re.compile(pattern)
        return [j for j in self._jobs if j.name and pat.search(j.name)]

    def _all_resources(self) -> List[Resource]:
        out: List[Resource] = list(self._inputs)
        out.extend(getattr(self, '_input_groups', []))
        for j in self._jobs:
            for r in j._resources.values():
                out.append(r)
                if isinstance(r, ResourceGroup):
                    out.extend(r._files.values())
            if isinstance(j, PythonJob):
                for _, _, _, res in j._calls:
                    out.append(res)
                    for f in (res._json_file, res._str_file, res._repr_file):
                        if f is not None:
                            out.append(f)
        return out

    # -- execution ---------------------------------------------------------
    def run(self, dry_run: bool = False, verbose: bool = False,
            delete_scratch_on_exit: bool = True, wait: bool = True, **kwargs):
        return self._backend._run(self, dry_run=dry_run, verbose=verbose,
                                  delete_scratch_on_exit=delete_scratch_on_exit,
                                  wait=wait, **kwargs)

    def __repr__(self):
        return f'<Batch {self.name or "unnamed"}: {len(self._jobs)} jobs>'
