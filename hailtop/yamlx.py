"""YAML dumping with literal-block multiline strings (reference
hailtop/yamlx.py)."""

from __future__ import annotations

import yaml


class _Dumper(yaml.SafeDumper):
    pass


def _str_representer(dumper, data: str):
    if '\n' in data:
        return dumper.represent_scalar('tag:yaml.org,2002:str', data,
                                       style='|')
    return dumper.represent_scalar('tag:yaml.org,2002:str', data)


_Dumper.add_representer(str, _str_representer)


def dump(obj) -> str:
    return yaml.dump(obj, Dumper=_Dumper, sort_keys=False,
                     default_flow_style=False)
