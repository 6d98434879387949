"""Checkpointing with true resume.

The reference only saves ``best.pth`` (model+optimizer+epoch, semivl.py:
423-433) and has no resume path. Here: orbax checkpoints of
(params, opt_state, step, epoch, previous_best) with both ``best`` and
``latest`` slots and a restore path — fixing the reference's gap
(SURVEY.md §5).
"""

import os
from typing import Optional

import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, save_path):
        self.root = os.path.abspath(os.path.join(save_path, 'ckpt'))
        os.makedirs(self.root, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()

    def _slot(self, name):
        return os.path.join(self.root, name)

    def save(self, name, state, extra: Optional[dict] = None):
        """``state``: TrainState; ``extra``: small python scalars."""
        payload = {
            'params': state.params,
            'opt_state': state.opt_state,
            'step': state.step,
        }
        if getattr(state, 'ema_params', None) is not None:
            payload['ema_params'] = state.ema_params
        if extra:
            payload['extra'] = {k: np.asarray(v) for k, v in extra.items()}
        path = self._slot(name)
        self._ckptr.save(path, payload, force=True)
        self._ckptr.wait_until_finished()

    def restore(self, name, state):
        """Restore into the structure of ``state``; returns (state, extra)."""
        path = self._slot(name)
        target = {
            'params': state.params,
            'opt_state': state.opt_state,
            'step': state.step,
        }
        if getattr(state, 'ema_params', None) is not None:
            target['ema_params'] = state.ema_params
        # probe whether an extra dict was saved
        try:
            restored = self._ckptr.restore(path, target | {'extra': None})
        except BaseException:
            restored = self._ckptr.restore(path, target)
            restored['extra'] = {}
        new_state = state.replace(
            params=restored['params'],
            opt_state=restored['opt_state'],
            step=restored['step'],
            ema_params=restored.get('ema_params', state.ema_params))
        return new_state, restored.get('extra') or {}

    def exists(self, name):
        return os.path.isdir(self._slot(name))
