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
        return new_state, extra

    def exists(self, name):
        return os.path.isdir(self._slot(name))
