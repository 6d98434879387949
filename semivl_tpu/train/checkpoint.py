"""Checkpointing with true resume.

The reference only saves ``best.pth`` (model+optimizer+epoch, semivl.py:
423-433) and has no resume path. Here: orbax checkpoints of
(params, opt_state, step[, ema_params]) with both ``best`` and ``latest``
slots plus a sidecar ``extra.json`` for scalar metadata (epoch,
previous_best) — sidecar because orbax restore is strict about tree
structure and the scalars shouldn't dictate it.
"""

import json
import os
from typing import Optional

import orbax.checkpoint as ocp


_EXTRA_MAXLEN = 1024


def _broadcast_extra(extra):
    """Sync resume metadata from process 0 to all hosts.

    ``extra.json`` is written by process 0 only; on a deployment without a
    shared filesystem the other hosts would read ``{}`` and restart at
    epoch 0 while host 0 resumes mid-epoch — desynchronised data streams
    hang the first collective. Broadcast the JSON payload itself (fixed
    1 KiB uint8 buffer) so every host resumes identically.
    """
    import jax
    if jax.process_count() == 1:
        return extra
    import numpy as np
    from jax.experimental import multihost_utils
    raw = json.dumps(extra).encode()
    assert len(raw) <= _EXTRA_MAXLEN, 'extra.json too large to broadcast'
    buf = np.frombuffer(raw.ljust(_EXTRA_MAXLEN), np.uint8)
    synced = np.asarray(multihost_utils.broadcast_one_to_all(buf))
    return json.loads(synced.tobytes().decode().strip())


class CheckpointManager:
    def __init__(self, save_path):
        self.root = os.path.abspath(os.path.join(save_path, 'ckpt'))
        os.makedirs(self.root, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()

    def _slot(self, name):
        return os.path.join(self.root, name)

    @staticmethod
    def _payload(state):
        payload = {
            'params': state.params,
            'opt_state': state.opt_state,
            'step': state.step,
        }
        if getattr(state, 'ema_params', None) is not None:
            payload['ema_params'] = state.ema_params
        return payload

    def save(self, name, state, extra: Optional[dict] = None):
        """``state``: TrainState; ``extra``: small JSON-able scalars.

        Multi-host: call from EVERY process (orbax saves involve
        cross-process barriers; the primary host writes the arrays)."""
        path = self._slot(name)
        self._ckptr.save(path, self._payload(state), force=True)
        self._ckptr.wait_until_finished()
        import jax
        if jax.process_index() == 0:
            with open(path + '.extra.json', 'w') as f:
                json.dump({k: float(v) for k, v in (extra or {}).items()}, f)

    def restore(self, name, state):
        """Restore into the structure of ``state``; returns (state, extra)."""
        path = self._slot(name)
        restored = self._ckptr.restore(path, self._payload(state))
        new_state = state.replace(
            params=restored['params'],
            opt_state=restored['opt_state'],
            step=restored['step'],
            ema_params=restored.get('ema_params',
                                    getattr(state, 'ema_params', None)))
        extra = {}
        if os.path.isfile(path + '.extra.json'):
            with open(path + '.extra.json') as f:
                extra = json.load(f)
        extra = _broadcast_extra(extra)
        return new_state, extra

    def exists(self, name):
        return os.path.isdir(self._slot(name))
