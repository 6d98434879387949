"""4-process multi-host matrix (VERDICT round-1 item #8).

Spawns 4 ``jax.distributed`` CPU processes (2 virtual devices each, one
8-device global data mesh) running the REAL train loop via
tests/multihost_train_worker.py, and checks:

- multi-host loader sharding + pmean'd grads (the straight run completes
  with a shared run dir and a collective orbax checkpoint);
- process-sharded eval with global histogram reduction (each epoch end);
- preemption consensus: only host 0 receives the injected signal — the
  other three must stop at the same step via the in-step psum'd flag;
- mid-epoch multi-host resume: preempted+resumed params are bit-identical
  to the uninterrupted run's.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from synth_data import make_synth_dataset

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, 'tests', 'multihost_train_worker.py')
NPROC = 4


@pytest.fixture(scope='module')
def mh_data(tmp_path_factory):
    root = str(tmp_path_factory.mktemp('mhds'))
    # 48 unlabeled / 8 ranks / bs1 -> 6 steps per epoch; 2 epochs = 12 steps
    make_synth_dataset(root, n_labeled=2, n_unlabeled=48, n_val=4,
                       size=(72, 88))
    return root


def _launch(run_dir, data_root, port, preempt_at_step=None):
    # gloo's TCP connect window (~30 s) occasionally times out on a
    # loaded CI host before all 4 processes reach their first
    # collective. The failure happens before (straight run) or is made
    # harmless by (resume is bit-exact from whatever 'latest' exists)
    # any state mutation, so retry on a fresh port up to 2 extra times.
    env = {**os.environ, 'JAX_PLATFORMS': 'cpu',
           'PYTHONPATH': REPO + os.pathsep + os.environ.get('PYTHONPATH', '')}
    env.pop('XLA_FLAGS', None)  # worker sets its own device count
    for attempt in range(3):
        os.makedirs(run_dir, exist_ok=True)
        procs = []
        for i in range(NPROC):
            cmd = [sys.executable, WORKER, '--process-id', str(i),
                   '--num-processes', str(NPROC),
                   '--port', str(port + 100 * attempt),
                   '--run-dir', run_dir, '--data-root', data_root]
            if preempt_at_step is not None:
                cmd += ['--preempt-at-step', str(preempt_at_step)]
            procs.append(subprocess.Popen(cmd, env=env, cwd=REPO))
        rcs = [p.wait(timeout=1200) for p in procs]
        if all(rc == 0 for rc in rcs):
            return
    assert all(rc == 0 for rc in rcs), rcs


def _load_raw(run_dir, name='latest'):
    import orbax.checkpoint as ocp
    path = os.path.abspath(os.path.join(run_dir, 'ckpt', name))
    tree = ocp.StandardCheckpointer().restore(path)
    with open(path + '.extra.json') as f:
        extra = json.load(f)
    return tree, extra


@pytest.mark.slow
def test_4proc_preempt_consensus_and_exact_resume(mh_data, tmp_path):
    d_straight = str(tmp_path / 'straight')
    d_preempt = str(tmp_path / 'preempt')

    _launch(d_straight, mh_data, port=29641)
    tree_a, extra_a = _load_raw(d_straight)
    assert int(np.asarray(tree_a['step'])) == 12

    # host 0 alone gets a simulated preemption after global step 0; the
    # consensus must stop ALL hosts mid-epoch (6 steps/epoch)
    _launch(d_preempt, mh_data, port=29642, preempt_at_step=0)
    tree_b, extra_b = _load_raw(d_preempt)
    stopped_at = int(np.asarray(tree_b['step']))
    assert 0 < stopped_at < 6, stopped_at  # mid-epoch, consensus reached
    assert extra_b['epoch'] == 0.0
    assert extra_b['epoch_step'] == float(stopped_at)

    # resume all four hosts to completion
    _launch(d_preempt, mh_data, port=29643)
    tree_b, extra_b = _load_raw(d_preempt)
    assert int(np.asarray(tree_b['step'])) == 12
    assert extra_a == extra_b

    import jax
    leaves_a, def_a = jax.tree.flatten(tree_a)
    leaves_b, def_b = jax.tree.flatten(tree_b)
    assert def_a == def_b
    for la, lb in zip(leaves_a, leaves_b):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
