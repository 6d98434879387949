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
import shutil
import subprocess
import sys

import numpy as np
import pytest

from synth_data import make_synth_dataset

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, 'tests', 'multihost_train_worker.py')
NPROC = 4

# Signatures of the known-benign launch flake: gloo's ~30 s TCP connect
# window (or the jax.distributed coordination handshake) timing out on a
# loaded CI host before the first collective. Retries are gated on these
# so a genuinely intermittent multi-host bug still fails the test.
_CONNECT_FLAKE_SIGNATURES = (
    'connectFullMesh',
    'Timed out waiting for connection',
    'Gloo connect',
    'connect timed out',
    'DEADLINE_EXCEEDED',
    'failed to connect to coordination service',
    'Coordination service is not enabled',
    'UNAVAILABLE: failed to connect',
)


def _is_connect_flake(log_text):
    """True iff worker output matches the gloo/coordination connect-timeout
    signature — the only failure class the retry loop is allowed to mask."""
    return any(sig in log_text for sig in _CONNECT_FLAKE_SIGNATURES)


@pytest.fixture(scope='module')
def mh_data(tmp_path_factory):
    root = str(tmp_path_factory.mktemp('mhds'))
    # 48 unlabeled / 8 ranks / bs1 -> 6 steps per epoch; 2 epochs = 12 steps
    make_synth_dataset(root, n_labeled=2, n_unlabeled=48, n_val=4,
                       size=(72, 88))
    return root


def _launch(run_dir, data_root, port, preempt_at_step=None, fresh=True):
    """Launch the 4-process run; retry ONLY on the connect-timeout flake.

    ``fresh=True`` wipes ``run_dir`` before every attempt so a retried
    'straight' run stays genuinely uninterrupted (never a silent
    resume-from-latest) and a retried preempt run re-injects its
    preemption (loop.py fires on exact ``cur_step == preempt_at_step``).
    Resume launches pass ``fresh=False`` and must keep the checkpoint.
    """
    env = {**os.environ, 'JAX_PLATFORMS': 'cpu',
           'PYTHONPATH': REPO + os.pathsep + os.environ.get('PYTHONPATH', '')}
    env.pop('XLA_FLAGS', None)  # worker sets its own device count
    log_dir = run_dir.rstrip(os.sep) + '.logs'
    os.makedirs(log_dir, exist_ok=True)
    all_rcs = []
    for attempt in range(3):
        if fresh and os.path.isdir(run_dir):
            shutil.rmtree(run_dir)
        os.makedirs(run_dir, exist_ok=True)
        procs, logs = [], []
        for i in range(NPROC):
            log = open(os.path.join(
                log_dir, f'worker{i}.attempt{attempt}.log'), 'w+')
            cmd = [sys.executable, WORKER, '--process-id', str(i),
                   '--num-processes', str(NPROC),
                   '--port', str(port + 100 * attempt),
                   '--run-dir', run_dir, '--data-root', data_root]
            if preempt_at_step is not None:
                cmd += ['--preempt-at-step', str(preempt_at_step)]
            procs.append(subprocess.Popen(cmd, env=env, cwd=REPO,
                                          stdout=log,
                                          stderr=subprocess.STDOUT))
            logs.append(log)
        try:
            rcs = [p.wait(timeout=1200) for p in procs]
        finally:
            # a hung worker must not leak (it would hold the port) —
            # kill anything still running before re-raising/retrying
            for p in procs:
                if p.poll() is None:
                    p.kill()
            for p in procs:
                if p.poll() is None:
                    p.wait(timeout=60)
        all_rcs.append(rcs)
        text = ''
        for log in logs:
            log.flush()
            log.seek(0)
            text += log.read()
            log.close()
        if all(rc == 0 for rc in rcs):
            return
        if not _is_connect_flake(text):
            break  # real failure — surface it on the first attempt
        sys.stderr.write(
            f'[test_multihost] connect-timeout flake on attempt {attempt} '
            f'(rcs={rcs}); retrying on a fresh port\n')
    tail = text[-4000:]
    raise AssertionError(
        f'multihost launch failed; rcs per attempt: {all_rcs}\n'
        f'--- last attempt worker output (tail) ---\n{tail}')


def _load_raw(run_dir, name='latest'):
    import orbax.checkpoint as ocp
    path = os.path.abspath(os.path.join(run_dir, 'ckpt', name))
    tree = ocp.StandardCheckpointer().restore(path)
    with open(path + '.extra.json') as f:
        extra = json.load(f)
    return tree, extra


def test_retry_gate_rejects_non_flake_failures():
    """The retry loop may only mask the connect-timeout flake: a generic
    crash (assert, shape error, NaN) must NOT match the signature set."""
    assert not _is_connect_flake('')
    assert not _is_connect_flake(
        'Traceback (most recent call last):\n'
        '  File "worker.py", line 10, in <module>\n'
        'AssertionError: params diverged at step 3\n')
    assert not _is_connect_flake(
        'jaxlib.xla_extension.XlaRuntimeError: INVALID_ARGUMENT: '
        'Incompatible shapes')
    # the benign class is matched
    assert _is_connect_flake(
        'RuntimeError: [enforce fail at tcp.cc] connectFullMesh failed')
    assert _is_connect_flake(
        'DEADLINE_EXCEEDED: Barrier timed out. Barrier_id: init')


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

    # resume all four hosts to completion (fresh=False: keep the
    # checkpoint; a retried resume is safe — bit-exact from 'latest')
    _launch(d_preempt, mh_data, port=29643, fresh=False)
    tree_b, extra_b = _load_raw(d_preempt)
    assert int(np.asarray(tree_b['step'])) == 12
    assert extra_a == extra_b

    import jax
    leaves_a, def_a = jax.tree.flatten(tree_a)
    leaves_b, def_b = jax.tree.flatten(tree_b)
    assert def_a == def_b
    for la, lb in zip(leaves_a, leaves_b):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
