"""PythonJob runner: executes pickled calls inside a service-scheduled job
(the reference runs dill-pickled closures inside worker containers,
`batch/batch/worker/worker.py`). The payload is self-contained: arguments
are ('__value__', v) | ('__path__', p) | ('__result__', result_pickle_path)
markers, so no framework imports are needed here."""

import json
import pickle
import sys


def _resolve(marker):
    kind, v = marker
    if kind == '__value__':
        return v
    if kind == '__path__':
        return v
    if kind == '__result__':
        with open(v, 'rb') as f:
            return pickle.load(f)
    raise ValueError(kind)


def main():
    with open(sys.argv[1], 'rb') as f:
        spec = pickle.load(f)
    for fn, args, kw, result_path, out_files in spec:
        value = fn(*[_resolve(a) for a in args],
                   **{k: _resolve(v) for k, v in kw.items()})
        with open(result_path, 'wb') as fh:
            pickle.dump(value, fh)
        for kind, path in out_files.items():
            with open(path, 'w') as fh:
                if kind == 'json':
                    fh.write(json.dumps(value))
                elif kind == 'str':
                    fh.write(str(value))
                else:
                    fh.write(repr(value))


if __name__ == '__main__':
    main()
