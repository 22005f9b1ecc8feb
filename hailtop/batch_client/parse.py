"""Resource-string parsing (reference hailtop/batch_client/parse.py
contract: memory/cpu/storage strings -> bytes/mcpu)."""
import re

MEMORY_REGEXPAT = r'[+]?((?:[0-9]*[.])?[0-9]+)([KMGTP][i]?)?'
MEMORY_REGEX = re.compile(MEMORY_REGEXPAT)
CPU_REGEXPAT = r'[+]?((?:[0-9]*[.])?[0-9]+)([m])?'
CPU_REGEX = re.compile(CPU_REGEXPAT)
STORAGE_REGEXPAT = r'[+]?((?:[0-9]*[.])?[0-9]+)([KMGTP][i]?)?(B)?'
STORAGE_REGEX = re.compile(STORAGE_REGEXPAT)

_MULT = {None: 1, 'K': 1000, 'Ki': 1024,
         'M': 1000**2, 'Mi': 1024**2,
         'G': 1000**3, 'Gi': 1024**3,
         'T': 1000**4, 'Ti': 1024**4,
         'P': 1000**5, 'Pi': 1024**5}


def parse_memory_in_bytes(memory_string):
    m = MEMORY_REGEX.fullmatch(memory_string)
    if not m:
        raise ValueError(f'could not parse memory: {memory_string!r}')
    return int(float(m.group(1)) * _MULT[m.group(2)])


def parse_storage_in_bytes(storage_string):
    m = STORAGE_REGEX.fullmatch(storage_string)
    if not m:
        raise ValueError(f'could not parse storage: {storage_string!r}')
    return int(float(m.group(1)) * _MULT[m.group(2)])


def parse_cpu_in_mcpu(cpu_string):
    m = CPU_REGEX.fullmatch(str(cpu_string))
    if not m:
        raise ValueError(f'could not parse cpu: {cpu_string!r}')
    v = float(m.group(1))
    return int(v if m.group(2) == 'm' else v * 1000)
