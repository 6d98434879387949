"""Unit tests for the trace-profile parser (semivl_tpu.tools.trace_profile).

The capture side needs the real chip; the parsing/aggregation side is pure
and tested here against a synthetic Chrome-trace file in the layout the
backend emits (plugins/profile/<ts>/<host>.trace.json.gz, device events
carrying hlo_category/model_flops/bytes_accessed args).
"""

import gzip
import json
import os

from semivl_tpu.tools.trace_profile import (_category, load_device_events,
                                            report)


def _write_trace(tmp_path, events):
    d = os.path.join(tmp_path, 'plugins', 'profile', '2026_01_01_00_00_00')
    os.makedirs(d)
    with gzip.open(os.path.join(d, 'vm.trace.json.gz'), 'wt') as f:
        json.dump({'traceEvents': events}, f)


def test_load_and_report(tmp_path, capsys):
    tmp = str(tmp_path)
    _write_trace(tmp, [
        # metadata event — must be ignored
        {'ph': 'M', 'pid': 3, 'name': 'process_name',
         'args': {'name': 'device'}},
        # host event without hlo_category — must be ignored
        {'ph': 'X', 'pid': 1, 'tid': 1, 'name': 'host_thing', 'dur': 9999,
         'args': {}},
        # two device ops over 2 iters: 1000 us fusion + 500 us custom call
        {'ph': 'X', 'pid': 3, 'tid': 3, 'name': 'fusion.1', 'dur': 1000,
         'args': {'hlo_category': 'convolution fusion',
                  'model_flops': 2 * 10 ** 9, 'bytes_accessed': 10 ** 6,
                  'long_name': '%fusion.1 = bf16[4,1025,768]{...} fusion'}},
        {'ph': 'X', 'pid': 3, 'tid': 3, 'name': 'attn_fwd_kernel', 'dur': 500,
         'args': {'hlo_category': 'custom-call', 'model_flops': 0,
                  'bytes_accessed': 0}},
    ])
    events = load_device_events(tmp)
    assert len(events) == 2
    ms = report(events, n_iters=2)
    # (1000 + 500) us over 2 iters = 0.75 ms/iter
    assert abs(ms - 0.75) < 1e-9
    out = capsys.readouterr().out
    assert 'pallas:attention' in out
    # 2 GFLOP in 1000 us = 2 TF/s for the fusion category
    assert '2.0' in out


def test_category_split():
    mk = lambda name, cat: {'name': name, 'args': {'hlo_category': cat}}
    assert _category(mk('attn_fwd', 'custom-call')) == 'pallas:attention'
    assert _category(mk('decode_head_up1', 'custom-call')) == 'pallas:decoder'
    assert _category(mk('fusion.7', 'loop fusion')) == 'loop fusion'
    assert _category(
        mk('mykernel.0', 'custom-call')).startswith('pallas:mykernel')
