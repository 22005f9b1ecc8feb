"""Batch jobs (reference `hailtop/batch/job.py`): BashJob command DSL and
PythonJob with pickled call results."""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Union

from .resource import (JobResourceFile, PythonResult, Resource, ResourceFile,
                       ResourceGroup)


class Job:
    def __init__(self, batch, name: Optional[str] = None,
                 attributes: Optional[Dict[str, str]] = None):
        self._batch = batch
        self.name = name
        self.attributes = attributes or {}
        self._dependencies: List['Job'] = []
        self._image: Optional[str] = None
        self._cpu: Optional[str] = None
        self._memory: Optional[str] = None
        self._storage: Optional[str] = None
        self._always_run = False
        self._env: Dict[str, str] = {}
        self._resources: Dict[str, Resource] = {}
        self._uid = f'job_{len(batch._jobs)}'
        self._state = 'Pending'
        self._error: Optional[str] = None
        # resource introspection (reference job.py): resources this job
        # reads that it does not produce, and resources explicitly
        # referenced in its commands
        self._inputs = set()
        self._mentioned = set()
        self._internal_outputs = set()

    # -- resource declaration ---------------------------------------------
    def declare_resource_group(self, **groups) -> 'Job':
        for name, templates in groups.items():
            if not isinstance(templates, dict):
                templates = {k: f'{{root}}.{k}' for k in templates}
            rg = ResourceGroup(self, **templates)
            self._resources[name] = rg
        return self

    def __getattr__(self, name):
        if name.startswith('_') or name in ('name', 'attributes'):
            raise AttributeError(name)
        if name in self.__dict__.get('_resources', {}):
            return self._resources[name]
        # implicit output file declaration (j.ofile idiom)
        f = JobResourceFile(self)
        self._resources[name] = f
        return f

    def __getitem__(self, name):
        return self.__getattr__(name)

    # -- config ------------------------------------------------------------
    def depends_on(self, *jobs: 'Job') -> 'Job':
        self._dependencies.extend(jobs)
        return self

    def image(self, image: str) -> 'Job':
        self._image = image
        return self

    def cpu(self, cores) -> 'Job':
        self._cpu = str(cores)
        return self

    def memory(self, memory) -> 'Job':
        self._memory = str(memory)
        return self

    def storage(self, storage) -> 'Job':
        self._storage = str(storage)
        return self

    def always_run(self, always_run: bool = True) -> 'Job':
        self._always_run = always_run
        return self

    def timeout(self, timeout) -> 'Job':
        """Wall-clock limit in seconds (reference Job.timeout)."""
        self._timeout = timeout
        return self

    def spot(self, is_spot: bool) -> 'Job':
        """Spot/preemptible instance preference (advisory locally)."""
        self._spot = is_spot
        return self

    def regions(self, regions) -> 'Job':
        """Cloud regions the job may run in (advisory locally)."""
        self._regions = regions
        return self

    def n_max_attempts(self, n: int) -> 'Job':
        self._n_max_attempts = n
        return self

    def always_copy_output(self, always: bool = True) -> 'Job':
        self._always_copy_output = always
        return self

    def cloudfuse(self, bucket: str, mount_point: str) -> 'Job':
        raise NotImplementedError(
            'cloudfuse requires a cloud bucket mount; this build has no '
            'cloud storage. Stage data with input files instead.')

    gcsfuse = cloudfuse

    def env(self, variable: str, value: str) -> 'Job':
        self._env[variable] = value
        return self

    def _all_dependencies(self) -> List['Job']:
        deps = list(self._dependencies)
        for r in self._referenced_resources():
            if r._source_job is not None and r._source_job is not self:
                deps.append(r._source_job)
        return deps

    def _referenced_resources(self) -> List[Resource]:
        return []


class BashJob(Job):
    def __init__(self, batch, name=None, attributes=None, shell: str = '/bin/bash'):
        super().__init__(batch, name, attributes)
        self._commands: List[str] = []
        self._shell = shell
        self._used_resources: List[Resource] = []

    def command(self, command: str) -> 'BashJob':
        if not command.strip():
            import warnings
            warnings.warn('Ignoring empty command.')
            return self
        self._register_references(command)
        self._commands.append(command)
        return self

    def _register_references(self, text: str) -> None:
        from .resource import ResourceGroup
        import re as _re
        uids = set(_re.findall(r'\$\{(__[A-Z_]+_\d+__)\}', text))
        if not uids:
            return
        for r in self._batch._all_resources():
            if r._uid not in uids:
                continue
            # the referenced resource (a group token mentions the group and
            # every member; a member token mentions only itself)
            if isinstance(r, ResourceGroup):
                self._mentioned.add(r)
                members = list(r._files.values())
                self._mentioned.update(members)
            else:
                self._mentioned.add(r)
                group = getattr(r, '_group', None)
                # mentioning one member localizes the whole group (reference:
                # groups travel together) — inputs/outputs cover all members
                members = (list(group._files.values())
                           if group is not None else [r])
            for m in members:
                src = getattr(m, '_source_job', None)
                if src is not self:
                    self._inputs.add(m)
                if src is not None:
                    src._internal_outputs.add(m)

    def _referenced_resources(self):
        # resolved lazily at run time (all resources exist by then): a
        # resource is referenced if its token appears in any command
        out = []
        text = '\n'.join(self._commands)
        for r in self._batch._all_resources():
            if r._token() in text:
                out.append(r)
        return out


class PythonJob(Job):
    def __init__(self, batch, name=None, attributes=None):
        super().__init__(batch, name, attributes)
        self._calls: List[tuple] = []

    def call(self, fn, *args, **kwargs) -> PythonResult:
        result = PythonResult(self)
        self._calls.append((fn, args, kwargs, result))
        return result

    def _referenced_resources(self):
        out = []
        for fn, args, kwargs, result in self._calls:
            for a in list(args) + list(kwargs.values()):
                if isinstance(a, Resource):
                    out.append(a)
        return out
