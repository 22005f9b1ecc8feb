"""Benchmark harness (reference `hail/python/benchmark/` pytest suite):
registered workloads run with burn-in + timed iterations under a per-
iteration timeout, and the runner emits one JSONL record per workload with
median/mean/stdev and a bootstrap confidence interval of the mean
(reference `benchmark/tools/statistics.py:43-77` boostrap_confidence_interval,
`benchmark/conftest.py:12-40` burn-in/iteration/timeout knobs).

Run: `python -m benchmarks [--iterations N] [--burn-in N] [--out PATH]
[--filter SUBSTR]` — writes BENCHMARKS.jsonl at the repo root by default.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import traceback
from typing import Callable, Dict, List, Optional

import numpy as np

_REGISTRY: Dict[str, dict] = {}


def benchmark(group: str, *, burn_in: int = 1, iterations: int = 5,
              max_duration: float = 120.0):
    """Register a workload. The function body is one ITERATION."""
    def deco(fn: Callable):
        name = fn.__name__
        _REGISTRY[name] = dict(fn=fn, group=group, burn_in=burn_in,
                               iterations=iterations,
                               max_duration=max_duration)
        return fn
    return deco


def bootstrap_ci(samples: List[float], n_boot: int = 1000,
                 confidence: float = 0.95, seed: int = 0):
    """Percentile-bootstrap CI of the mean (reference statistics.py:63-77)."""
    rng = np.random.default_rng(seed)
    xs = np.asarray(samples)
    means = rng.choice(xs, size=(n_boot, xs.size), replace=True).mean(axis=1)
    lo = (1 - confidence) / 2
    return (float(np.quantile(means, lo)),
            float(np.quantile(means, 1 - lo)))


def run_one(name: str, spec: dict, iterations: Optional[int],
            burn_in: Optional[int]) -> dict:
    fn = spec['fn']
    nb = spec['burn_in'] if burn_in is None else burn_in
    ni = spec['iterations'] if iterations is None else iterations
    times: List[float] = []
    failures = 0
    try:
        for _ in range(nb):
            fn()
        for _ in range(ni):
            t0 = time.perf_counter()
            fn()
            dt = time.perf_counter() - t0
            times.append(dt)
            if dt > spec['max_duration']:
                break
    except Exception:
        failures += 1
        tb = traceback.format_exc(limit=3)
        return dict(name=name, group=spec['group'], failed=True,
                    error=tb.strip().splitlines()[-1])
    xs = np.asarray(times)
    lo, hi = bootstrap_ci(times) if len(times) >= 2 else (float(xs[0]),) * 2
    return dict(
        name=name, group=spec['group'], failed=False,
        iterations=len(times), burn_in=nb,
        mean_s=round(float(xs.mean()), 4),
        median_s=round(float(np.median(xs)), 4),
        stdev_s=round(float(xs.std(ddof=1)) if len(xs) > 1 else 0.0, 4),
        min_s=round(float(xs.min()), 4),
        ci95_mean_s=[round(lo, 4), round(hi, 4)],
        times_s=[round(float(t), 4) for t in times],
    )


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument('--iterations', type=int, default=None)
    ap.add_argument('--burn-in', type=int, default=None, dest='burn_in')
    ap.add_argument('--out', default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        if '__file__' in globals() else '.', 'BENCHMARKS.jsonl'))
    ap.add_argument('--filter', default=None)
    args = ap.parse_args(argv)

    from . import workloads  # noqa: F401  (registers everything)
    import hail_tpu as hl
    hl.init(global_seed=0)

    names = sorted(_REGISTRY)
    if args.filter:
        names = [n for n in names if args.filter in n]
    records = []
    for i, name in enumerate(names):
        spec = _REGISTRY[name]
        print(f'[{i + 1}/{len(names)}] {name} ...', file=sys.stderr,
              flush=True)
        rec = run_one(name, spec, args.iterations, args.burn_in)
        rec['timestamp'] = time.strftime('%Y-%m-%dT%H:%M:%SZ', time.gmtime())
        try:
            import subprocess
            rec['commit'] = subprocess.run(
                ['git', 'rev-parse', '--short', 'HEAD'],
                capture_output=True, text=True,
                cwd=os.path.dirname(os.path.abspath(__file__))
            ).stdout.strip()
        except Exception:
            pass
        records.append(rec)
        status = 'FAIL ' + rec.get('error', '') if rec['failed'] else \
            f"median {rec['median_s']}s"
        print(f'    {status}', file=sys.stderr, flush=True)
    with open(args.out, 'w') as f:
        for rec in records:
            f.write(json.dumps(rec) + '\n')
    n_fail = sum(r['failed'] for r in records)
    print(f'wrote {len(records)} records ({n_fail} failed) to {args.out}',
          file=sys.stderr)
    return 1 if n_fail else 0
