"""Optimizer + LR schedule.

Replicates the reference's two optimizer paths (semivl.py:118-125, 330-346):

- mmseg ``AdamW`` with ``paramwise_cfg.custom_keys`` lr/decay multipliers
  (longest-substring-match over the parameter path, first match wins —
  mmseg DefaultOptimizerConstructor semantics);
- the UniMatch 'original' SGD with a backbone/rest split;

plus the poly LR schedule with linear warmup, and the freeze mask
(``freeze_backbone`` + ``exclude_keys`` substring semantics of reference
model/vlm.py:80-88; the frozen guidance encoder never receives updates).

Frozen leaves are excluded from the optimizer entirely via ``optax.masked``
— the TPU-native replacement for ``find_unused_parameters=True``.
"""

from typing import Optional

import jax
import jax.numpy as jnp
import optax


def param_path_strings(params):
    """Pytree of 'a.b.c'-style path strings matching torch naming closely."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def path_str(path):
        return '.'.join(str(getattr(k, 'key', k)) for k in path)

    paths = [path_str(p) for p, _ in flat]
    treedef = jax.tree_util.tree_structure(params)
    return jax.tree_util.tree_unflatten(treedef, paths)


def trainable_mask(params, freeze_backbone, exclude_keys,
                   has_clip_encoder=True):
    """Bool pytree: True = trainable.

    - ``clip_encoder.*`` is always frozen (reference: guidance encoder runs
      under no_grad, vlm.py:90-93);
    - with ``freeze_backbone``, ``backbone.*`` params are frozen unless any
      ``exclude_keys`` string occurs in the param path (vlm.py:80-88).
    """
    def decide(path):
        if path.startswith('clip_encoder'):
            return False
        if freeze_backbone and path.startswith('backbone'):
            if exclude_keys:
                return any(k in path for k in exclude_keys)
            return False
        return True

    return jax.tree.map(decide, param_path_strings(params))


def make_poly_schedule(base_lr, max_iters, warmup_iters=0, warmup_ratio=1e-6,
                       power=0.9):
    """Poly decay with linear warmup (reference semivl.py:330-346)."""
    def sched(step):
        step = jnp.asarray(step, jnp.float32)
        poly = base_lr * jnp.maximum(1.0 - step / max_iters, 0.0) ** power
        if warmup_iters > 0:
            # algebraically equal to base*(1 - (1-s/w)(1-r)) but stable in
            # float32 (no 1-(1-eps) cancellation)
            frac = step / warmup_iters
            warm = base_lr * (frac * (1.0 - warmup_ratio) + warmup_ratio)
            return jnp.where(step < warmup_iters, warm, poly)
        return poly
    return sched


def _custom_key_mults(custom_keys, path):
    """mmseg custom_keys: sort by key length (desc, stable), first substring
    match supplies (lr_mult, decay_mult)."""
    for key in sorted(custom_keys, key=len, reverse=True):
        if key in path:
            spec = custom_keys[key]
            return spec.get('lr_mult', 1.0), spec.get('decay_mult', 1.0)
    return 1.0, 1.0


def _path_str(path):
    return '.'.join(str(getattr(k, 'key', k)) for k in path)


def _scale_by_path(coeff_fn):
    """Scale each update leaf by ``coeff_fn(param_path)``.

    Path-resolved at update time so it composes with optax.masked /
    multi_transform (whose MaskedNode placeholders have no leaves).
    """
    def init(params):
        del params
        return optax.EmptyState()

    def update(updates, state, params=None):
        del params
        new = jax.tree_util.tree_map_with_path(
            lambda path, u: u * coeff_fn(_path_str(path)), updates)
        return new, state

    return optax.GradientTransformation(init, update)


def _add_weighted_decay_by_path(coeff_fn):
    """updates += coeff(param_path) * param (decoupled weight decay)."""
    def init(params):
        del params
        return optax.EmptyState()

    def update(updates, state, params=None):
        assert params is not None
        new = jax.tree_util.tree_map_with_path(
            lambda path, u, p: u + coeff_fn(_path_str(path))
            * p.astype(u.dtype),
            updates, params)
        return new, state

    return optax.GradientTransformation(init, update)


def build_optimizer(cfg, params, total_iters, freeze_backbone=False,
                    exclude_keys=None,
                    scheduler_max_iters: Optional[int] = None):
    """Run-config -> (optax transformation, lr schedule fn, trainable mask)."""
    max_iters = scheduler_max_iters or cfg.get('scheduler_max_iters') \
        or total_iters
    warmup_iters = cfg.get('warmup_iters', 0)
    warmup_ratio = cfg.get('warmup_ratio', 1e-6)
    mask = trainable_mask(params, freeze_backbone, exclude_keys)

    if 'optimizer' in cfg:  # mmseg AdamW path
        opt_cfg = cfg['optimizer']
        assert opt_cfg['type'] == 'AdamW', opt_cfg
        base_lr = opt_cfg['lr']
        wd = opt_cfg.get('weight_decay', 0.01)
        custom_keys = opt_cfg.get('paramwise_cfg', {}).get('custom_keys', {})
        sched = make_poly_schedule(base_lr, max_iters, warmup_iters,
                                   warmup_ratio)
        # torch AdamW: p -= lr*mult * (adam_dir + wd*decay_mult*p)
        tx = optax.chain(
            optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
            _add_weighted_decay_by_path(
                lambda p: wd * _custom_key_mults(custom_keys, p)[1]),
            optax.scale_by_learning_rate(sched),
            _scale_by_path(
                lambda p: _custom_key_mults(custom_keys, p)[0]),
        )
    else:  # UniMatch 'original' SGD (reference semivl.py:119-121)
        base_lr = cfg['lr']
        lr_multi = cfg.get('lr_multi', 1.0)
        sched = make_poly_schedule(base_lr, max_iters, warmup_iters,
                                   warmup_ratio)
        # torch SGD(momentum=0.9, wd=1e-4): wd folded into grad pre-momentum
        tx = optax.chain(
            optax.add_decayed_weights(1e-4),
            optax.trace(decay=0.9, nesterov=False),
            optax.scale_by_learning_rate(sched),
            _scale_by_path(
                lambda p: 1.0 if p.startswith('backbone') else lr_multi),
        )

    return optax.masked(tx, mask), sched, mask
