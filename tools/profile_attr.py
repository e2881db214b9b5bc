"""Op-level profile attribution for jitted functions on the real chip.

The TensorBoard profile plugin is unusable in this container (protobuf
version skew), so this reimplements the essential part directly:
capture a ``jax.profiler`` trace AND the compiled HLO text of the SAME
executable, then join the trace's per-op durations with the HLO metadata
(jax op_name paths + source lines). This is the tool that guided the
round-3 frequency-folding work (see PERFORMANCE.md).

Usage (as a library):

    from tools.profile_attr import profile_attribution
    rows = profile_attribution(jitted_fn, args, iters=8)
    for ms, name, shape, op_path in rows[:40]:
        print(f'{ms:8.4f}  {name:26s} {shape:40s} {op_path[:100]}')

``rows`` are (ms_per_call, hlo_op_name, result_shape, jax_op_path),
sorted descending by time. The first row group usually includes the
outer program event — ignore names that start with 'jit_'.
"""

import collections
import glob
import gzip
import json
import os
import re
import tempfile


def _parse_hlo_metadata(txt):
    meta = {}
    for line in txt.splitlines():
        m = re.match(r'\s*(?:ROOT )?%([\w.\-]+) = (\S+)', line)
        if not m:
            continue
        om = re.search(r'op_name="([^"]+)"', line)
        meta[m.group(1)] = (m.group(2)[:60], om.group(1) if om else '')
    return meta


def profile_attribution(jfn, args, iters=8, warmup=3, trace_dir=None):
    """Run ``jfn(*args)`` under a profiler trace and return per-op rows.

    ``jfn`` must be a ``jax.jit``-wrapped callable; its output must be
    fetchable (a float()-able scalar, or anything block_until_ready
    accepts).
    """
    import jax

    comp = jfn.lower(*args).compile()
    meta = _parse_hlo_metadata(comp.as_text())

    if trace_dir is None:
        trace_dir = tempfile.mkdtemp(prefix='profile_attr_')
    for _ in range(warmup):
        out = jfn(*args)
    jax.block_until_ready(out)
    with jax.profiler.trace(trace_dir):
        for _ in range(iters):
            out = jfn(*args)
        jax.block_until_ready(out)

    traces = glob.glob(os.path.join(
        trace_dir, 'plugins/profile/*/*.trace.json.gz'))
    if not traces:
        raise RuntimeError(f'no trace captured under {trace_dir}')
    with gzip.open(sorted(traces)[-1]) as fh:
        data = json.load(fh)
    pids = {e['pid']: e['args'].get('name') for e in data['traceEvents']
            if e.get('ph') == 'M' and e.get('name') == 'process_name'}
    agg = collections.Counter()
    for e in data['traceEvents']:
        if e.get('ph') == 'X' and 'dur' in e \
                and 'TPU' in str(pids.get(e['pid'], '')):
            agg[e['name']] += e['dur']
    rows = []
    for name, dur in agg.items():
        shape, op = meta.get(name, ('?', '?'))
        rows.append((dur / 1e3 / iters, name, shape, op))
    rows.sort(reverse=True)
    return rows


def print_rows(rows, limit=40):
    total = sum(r[0] for r in rows if not r[1].startswith('jit_'))
    print(f'named-op total {total:.3f} ms/call (includes nested events)')
    for ms, name, shape, op in rows[:limit]:
        print(f'{ms:8.4f}  {name:26s} {shape:44s} {op[:100]}')
