"""Parse a jax.profiler trace dir: device op time attributed to source.

Shared attribution tool for any `jax.profiler.trace` export (bench.py
BENCH_PROFILE, trace_encode.py, ad-hoc captures). Uses the XLA Ops
track's leaf events (skipping `while` wrapper spans, which double-count
their body ops) and groups by the `source` python line each HLO op was
traced from, so "where do the seconds go" maps directly to repo code.

Usage: python scripts/parse_trace.py <logdir> [top_n]
"""
import collections
import glob
import gzip
import json
import os
import sys


def load_trace(logdir):
    files = sorted(glob.glob(logdir + '/**/*.trace.json.gz',
                             recursive=True), key=os.path.getmtime)
    if not files:
        raise SystemExit(f'no trace.json.gz under {logdir}; xplane: '
                         f'{glob.glob(logdir + "/**/*.xplane.pb", recursive=True)}')
    with gzip.open(files[-1], 'rt') as f:
        return json.load(f)


def main():
    logdir = sys.argv[1]
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    trace = load_trace(logdir)
    evs = trace.get('traceEvents', [])
    pid_names = {e['pid']: e['args'].get('name', '')
                 for e in evs if e.get('ph') == 'M'
                 and e.get('name') == 'process_name'}
    tid_names = {(e['pid'], e['tid']): e['args'].get('name', '')
                 for e in evs if e.get('ph') == 'M'
                 and e.get('name') == 'thread_name'}

    by_src = collections.defaultdict(lambda: [0.0, 0, 0.0])  # t, n, GB
    by_op = collections.defaultdict(lambda: [0.0, 0])
    by_cat = collections.defaultdict(float)
    total = 0.0
    while_total = 0.0
    for e in evs:
        if e.get('ph') != 'X':
            continue
        if 'TPU' not in pid_names.get(e.get('pid'), ''):
            continue
        if tid_names.get((e.get('pid'), e.get('tid')), '') != 'XLA Ops':
            continue
        args = e.get('args', {})
        cat = args.get('hlo_category', '?')
        dur = e.get('dur', 0) / 1e6
        if cat == 'while':           # wrapper span: body ops re-appear
            while_total += dur
            continue
        src = args.get('source', '')
        src = src.replace('/root/repo/', '') or '<no source>'
        name = e.get('name', '?')
        gb = int(args.get('bytes_accessed', 0)) / 1e9
        rec = by_src[src]
        rec[0] += dur
        rec[1] += 1
        rec[2] += gb
        o = by_op[(src, name.split('.')[0], cat)]
        o[0] += dur
        o[1] += 1
        by_cat[cat] += dur
        total += dur

    print(f'device leaf-op time {total:.3f}s '
          f'(while wrappers excluded: {while_total:.3f}s)')
    print('\nby hlo_category:')
    for cat, dur in sorted(by_cat.items(), key=lambda kv: -kv[1]):
        print(f'  {dur * 1e3:9.2f} ms  {100 * dur / max(total, 1e-9):5.1f}%  {cat}')
    print(f'\ntop {top_n} source lines (time, count, bytes@HBM-speed):')
    for src, (dur, n, gb) in sorted(by_src.items(),
                                    key=lambda kv: -kv[1][0])[:top_n]:
        bw = f'{gb / dur:6.0f} GB/s' if dur > 0 and gb > 0 else '          '
        print(f'  {dur * 1e3:9.2f} ms  n={n:<5d} {bw}  {src[:95]}')
    print(f'\ntop {top_n} (source, op) pairs:')
    for (src, name, cat), (dur, n) in sorted(
            by_op.items(), key=lambda kv: -kv[1][0])[:top_n]:
        print(f'  {dur * 1e3:9.2f} ms  n={n:<5d} {cat:<18s} {name:<22s}'
              f' {src[:70]}')


if __name__ == '__main__':
    main()
