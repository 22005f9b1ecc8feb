"""Generate markdown API reference from docstrings → docs/api/*.md.

The analogue of the reference's Sphinx docs build
(`hail/python/hail/docs/`): every public name in the hl namespace and the
major classes' public methods, grouped by module, with signatures and
docstrings. Run:  python tools/gen_api_docs.py
"""

from __future__ import annotations

import inspect
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update('jax_platforms', 'cpu')

import hail_tpu as hl

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   'docs', 'api')

SECTIONS = [
    ('methods', 'Methods (statgen, QC, impex, relatedness, PCA)',
     lambda n, o: getattr(o, '__module__', '').startswith('hail_tpu.methods')),
    ('expressions', 'Expression functions',
     lambda n, o: getattr(o, '__module__', '').startswith('hail_tpu.expr')),
    ('genetics', 'Genetics objects',
     lambda n, o: getattr(o, '__module__', '').startswith('hail_tpu.genetics')),
    ('io', 'IO (VCF, BGEN, PLINK, native, Avro)',
     lambda n, o: getattr(o, '__module__', '').startswith('hail_tpu.io')),
    ('core', 'Core (context, Table, MatrixTable, types)',
     lambda n, o: True),
]

CLASS_PAGES = {
    'Table': hl.Table,
    'MatrixTable': hl.MatrixTable,
    'GroupedTable': getattr(hl, 'GroupedTable', None),
    'BlockMatrix': None,   # resolved below
    'Call': hl.Call,
    'Locus': hl.Locus,
    'ReferenceGenome': hl.ReferenceGenome,
    'Struct': hl.Struct,
    'Interval': hl.Interval,
    'Pedigree': getattr(hl, 'Pedigree', None),
    'Trio': getattr(hl, 'Trio', None),
}


def sig_of(obj) -> str:
    try:
        return str(inspect.signature(obj))
    except (ValueError, TypeError):
        return '(...)'


def doc_of(obj) -> str:
    d = inspect.getdoc(obj) or ''
    return d.strip()


def esc(s: str) -> str:
    return s.replace('<', '&lt;').replace('>', '&gt;')


def fn_entry(name: str, obj) -> str:
    out = [f'### `{name}{esc(sig_of(obj))}`\n']
    d = doc_of(obj)
    if d:
        out.append(d + '\n')
    return '\n'.join(out)


def class_page(name: str, cls) -> str:
    out = [f'# {name}\n']
    d = doc_of(cls)
    if d:
        out.append(d + '\n')
    members = []
    for m, obj in sorted(vars(cls).items()):
        if m.startswith('_'):
            continue
        if isinstance(obj, property):
            members.append(f'### `{name}.{m}` *(property)*\n\n'
                           f'{doc_of(obj.fget) or ""}\n')
        elif callable(obj):
            members.append(fn_entry(f'{name}.{m}', obj))
    out.extend(members)
    return '\n'.join(out)


def main():
    os.makedirs(OUT, exist_ok=True)
    from hail_tpu.linalg import BlockMatrix
    CLASS_PAGES['BlockMatrix'] = BlockMatrix

    names = sorted(n for n in (getattr(hl, '__all__', None) or dir(hl))
                   if not n.startswith('_'))
    entries = []
    for n in names:
        o = getattr(hl, n, None)
        if o is None or inspect.ismodule(o):
            continue
        if inspect.isclass(o):
            continue   # classes get their own pages
        if callable(o):
            entries.append((n, o))

    used = set()
    toc = ['# API reference\n', '## Modules\n']
    for key, title, pred in SECTIONS:
        sel = [(n, o) for n, o in entries if n not in used and pred(n, o)]
        used.update(n for n, _ in sel)
        if not sel:
            continue
        path = os.path.join(OUT, f'{key}.md')
        with open(path, 'w') as f:
            f.write(f'# {title}\n\n')
            for n, o in sel:
                f.write(fn_entry(f'hl.{n}', o) + '\n')
        toc.append(f'- [{title}]({key}.md) — {len(sel)} functions')

    toc.append('\n## Classes\n')
    for cname, cls in sorted(CLASS_PAGES.items()):
        if cls is None:
            continue
        with open(os.path.join(OUT, f'{cname}.md'), 'w') as f:
            f.write(class_page(cname, cls))
        toc.append(f'- [{cname}]({cname}.md)')

    sub = [('agg', hl.agg, 'Aggregators'), ('scan', hl.scan, 'Scans'),
           ('nd', hl.nd, 'NDArray functions'),
           ('vds', __import__('hail_tpu.vds', fromlist=['x']), 'VDS'),
           ('experimental', hl.experimental, 'Experimental')]
    toc.append('\n## Namespaces\n')
    for key, mod, title in sub:
        fns = [(n, getattr(mod, n)) for n in sorted(dir(mod))
               if not n.startswith('_') and callable(getattr(mod, n, None))
               and not inspect.isclass(getattr(mod, n))]
        with open(os.path.join(OUT, f'{key}.md'), 'w') as f:
            f.write(f'# hl.{key}: {title}\n\n')
            for n, o in fns:
                f.write(fn_entry(f'hl.{key}.{n}', o) + '\n')
        toc.append(f'- [hl.{key} — {title}]({key}.md) — {len(fns)} functions')

    with open(os.path.join(OUT, 'index.md'), 'w') as f:
        f.write('\n'.join(toc) + '\n')
    total = len(used) + sum(1 for _ in CLASS_PAGES)
    print(f'wrote docs/api: {len(used)} functions, '
          f'{sum(1 for c in CLASS_PAGES.values() if c)} classes')


if __name__ == '__main__':
    main()
