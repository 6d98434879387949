"""Fused SPMD train steps.

The reference runs 4 model passes + backward per iteration across DDP
processes with explicit barriers (semivl.py:203-328). Here the ENTIRE
iteration — on-device CutMix, teacher pseudo-labeling, MaskCLIP guidance,
both student passes, losses, gradient pmean and the optimizer update — is
ONE jitted SPMD program via ``jax.shard_map`` over the ``data`` mesh axis,
with donated state buffers.

Per-rank loss-normalisation semantics match DDP exactly: each device
normalises by its own valid-pixel counts, then grads are ``pmean``-ed
(SURVEY.md §2.6).
"""

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from semivl_tpu.losses.ce import cross_entropy, ohem_cross_entropy
from semivl_tpu.losses.conf_weight import confidence_weighted_loss


class TrainState(flax.struct.PyTreeNode):
    params: Any
    opt_state: Any
    step: jnp.ndarray
    # Optional EMA of the 'params' collection. The reference trainer keeps
    # no EMA (its released checkpoints do, under 'ema_model' —
    # SURVEY.md §5); enable with cfg['ema_decay'].
    ema_params: Any = None


def _ema_update(old, new, decay):
    return jax.tree.map(
        lambda e, p: decay * e + (1.0 - decay) * p, old, new)


def cutmix_image(img, img_other, box):
    """Paste ``img_other`` under the box (reference train_utils.py:19-21)."""
    return jnp.where(box[..., None] == 1, img_other, img)


def cutmix_mask(mask, mask_other, box):
    """(reference train_utils.py:24-27)"""
    return jnp.where(box == 1, mask_other, mask)


def cutmix_box_from_coords(coords, hw):
    """(B, 4) int32 (y, x, h, w) coords -> (B, hw, hw) {0,1} float masks.

    Compact-transport form of the host-sampled CutMix boxes (the full-res
    box mask is pure transfer waste: 256 KB vs 16 B per box)."""
    y, x, h, w = (coords[:, i][:, None, None] for i in range(4))
    yy = jnp.arange(hw)[None, :, None]
    xx = jnp.arange(hw)[None, None, :]
    return ((yy >= y) & (yy < y + h) & (xx >= x) & (xx < x + w)).astype(
        jnp.float32)


def _unpack_compact(batch):
    """Int32-cast byte-transported label maps and rasterise coord boxes."""
    batch = dict(batch)
    hw = batch['mask_x'].shape[1]
    for k in ('mask_x', 'ignore_mask', 'ignore_mask_other'):
        if k in batch and batch[k].dtype != jnp.int32:
            batch[k] = batch[k].astype(jnp.int32)
    for k in ('cutmix_box1', 'cutmix_box2'):
        if k in batch and batch[k].ndim == 2:
            batch[k] = cutmix_box_from_coords(batch[k], hw)
    return batch


def _softmax_conf_label(logits):
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=1)
    return jnp.max(probs, axis=1), jnp.argmax(probs, axis=1).astype(jnp.int32)


def _freeze_stop_gradient(variables, mask):
    """stop_gradient on frozen param leaves so XLA skips their weight grads.

    ``variables`` is the full flax variables dict; ``mask`` covers the
    'params' collection only.
    """
    out = dict(variables)
    out['params'] = jax.tree.map(
        lambda p, t: p if t else jax.lax.stop_gradient(p),
        variables['params'], mask)
    return out


def _criterion_name(cfg):
    crit = cfg['criterion']
    return crit['name'] if isinstance(crit, dict) else crit


def check_criterion_pairing(cfg, bundle):
    """The 'mmseg' criterion means "use the model's own loss_decode"
    (reference semivl.py:142-164); in the paper grid only the ATM/zegclip
    head configures one (SegLossPlus,
    configs/_base_/models/vlm-zegclip-rd-pt-vitb.py:49-53) — VLG sets
    loss_decode=None and uses CELoss. _labeled_loss hardwires
    mmseg -> SegLossPlus, so reject any other pairing loudly instead of
    silently training with a misassigned loss."""
    names = [_criterion_name(cfg)]
    if 'criterion_u' in cfg:
        names.append(cfg['criterion_u'])
    if 'mmseg' in names:
        head = getattr(bundle.module, 'decode_head_cfg', None) or {}
        assert head.get('type') == 'ATMSingleHeadSeg', (
            "criterion 'mmseg' resolves to SegLossPlus, which only the "
            f"ATM head configures; got head {head.get('type')!r} — use "
            "'CELoss'/'OHEM' for this model")


def _labeled_loss(cfg, logits, mask):
    crit = _criterion_name(cfg)
    if crit == 'CELoss':
        return cross_entropy(logits, mask)
    if crit == 'OHEM':
        kwargs = cfg['criterion'].get('kwargs', {})
        weight = None
        if kwargs.get('use_weight', False):
            # reference ohem.py:17-23: the 19-entry Cityscapes table
            from semivl_tpu.losses.ce import CITYSCAPES_OHEM_WEIGHT
            weight = CITYSCAPES_OHEM_WEIGHT
        return ohem_cross_entropy(
            logits, mask, thresh=kwargs.get('thresh', 0.7),
            min_kept=kwargs.get('min_kept', 200000), weight=weight)
    if crit == 'mmseg':
        # SegLossPlus via the model's loss_decode (reference semivl.py:270).
        # NOTE final-layer only, matching the reference TRAIN LOOP exactly:
        # semivl.py:269 passes {'pred_masks': pred} with no 'aux_outputs'
        # key, so SegPlusCriterion's deep-supervision branch
        # (atm_criterion.py:216-221) never fires there either — the aux
        # plumbing (atm_head return_aux / seg_loss_plus aux_masks) exists
        # for the mmseg-native path and is exercised by tests.
        from semivl_tpu.losses.seg_loss_plus import seg_loss_plus
        return seg_loss_plus(logits, mask, cfg['nclass'], axis_name='data')
    raise NotImplementedError(f'criterion {crit!r}')


def _pmean_trainable(grads, trainable_mask):
    """All-reduce only trainable grads: frozen leaves are structural zeros
    on every device (stop_gradient), so pmean-ing them is pure ICI/DCN
    traffic — ~110M of the flagship's 150M params (SURVEY.md §2.6 notes the
    backbone is mostly frozen)."""
    return jax.tree.map(
        lambda g, t: jax.lax.pmean(g, 'data') if t else g,
        grads, trainable_mask)


def _mc_loss(logits, mc_label, ignore_mask, reduce_mode):
    """MaskCLIP-consistency loss (reference semivl.py:52-58)."""
    if reduce_mode == 'mean':
        return cross_entropy(logits, mc_label)
    ce = cross_entropy(logits, mc_label, reduction='none')
    if reduce_mode == 'mean_valid':
        return jnp.sum(ce) / jnp.maximum(jnp.sum(ignore_mask != 255), 1)
    if reduce_mode == 'mean_all':
        return jnp.sum(ce) / ignore_mask.size
    raise ValueError(reduce_mode)


def make_semivl_train_step(bundle, cfg, tx, mesh: Mesh, total_iters: int,
                           trainable_mask):
    """Build the fused semi-supervised train step (methods semivl/unimatch;
    unimatch is the same program with maskclip_consistency_lambda == 0)."""
    check_criterion_pairing(cfg, bundle)
    module = bundle.module
    # Teacher pseudo-label pass takes no gradients — route it through the
    # fused-decoder forward variant (same params; ops/fused_up.py).
    module_fwd = getattr(bundle, 'module_fwd', None) or module
    text = jnp.asarray(bundle.text_feats)
    mcc_text = (jnp.asarray(bundle.mcc_text_feats)
                if bundle.mcc_text_feats is not None else None)
    mcc_lambda = cfg.get('maskclip_consistency_lambda', 0)
    assert mcc_lambda == 0 or mcc_text is not None, (
        'maskclip_consistency_lambda is set but the model bundle has no '
        'MCC text embeddings — configure clip_encoder (builder.py) or set '
        'the lambda to 0; silently training without the requested '
        'guidance loss would be wrong')
    use_mcc = (mcc_lambda != 0) and mcc_text is not None
    mcc_conf_thresh = cfg.get('mcc_conf_thresh', 0.75)
    mcc_loss_reduce = cfg.get('mcc_loss_reduce', 'mean')
    conf_mode = cfg['conf_mode']
    conf_thresh = cfg['conf_thresh']
    criterion_u = cfg['criterion_u']
    assert cfg.get('use_fp', True), 'reference asserts use_fp (semivl.py:114)'

    def mcc_lambda_at(step):
        if isinstance(mcc_lambda, (list, tuple)):
            a, b = mcc_lambda
            prog = step.astype(jnp.float32) / total_iters
            return a * (1 - prog) + b * prog
        return jnp.asarray(float(mcc_lambda), jnp.float32)

    def unlabeled_loss(logits, pl, conf, ignore):
        if criterion_u == 'CELoss':
            ce = cross_entropy(logits, pl, reduction='none')
            return confidence_weighted_loss(ce, conf, ignore, conf_mode,
                                            conf_thresh)
        if criterion_u == 'mmseg':
            # SegLossPlus on pseudo-labels scaled by the per-rank
            # high-confidence fraction (reference semivl.py:278-282)
            from semivl_tpu.losses.seg_loss_plus import seg_loss_plus
            loss = seg_loss_plus(logits, pl, cfg['nclass'],
                                 axis_name='data')
            valid = (ignore != 255)
            kept = (conf >= conf_thresh) & valid
            ratio = (jnp.sum(kept) /
                     jnp.maximum(jnp.sum(valid), 1)).astype(jnp.float32)
            return loss * ratio
        raise NotImplementedError(f'criterion_u {criterion_u!r}')

    on_device_aug = cfg.get('strong_aug_on_device', False)

    def step_fn(state, batch, rng):
        # Per-step key derived ON DEVICE from the global step counter:
        # callers upload ONE base key and every step folds in state.step
        # (== global step at entry) — the same stream the loop previously
        # produced with a host-side fold_in + per-step device_put of the
        # folded key, which cost an unoverlapped ~30 ms H2D round trip
        # per step on remote-attached devices (round-5 soak finding).
        # Mid-epoch resume stays bit-exact: the stream depends only on
        # (base seed, global step).
        rng = jax.random.fold_in(rng, state.step)
        rng = jax.random.fold_in(rng, jax.lax.axis_index('data'))
        batch = _unpack_compact(batch)
        # Multi-host preemption consensus: each host feeds its local SIGTERM
        # flag; the psum rides the existing collective program, so every
        # host reads the SAME global count at a given step and all hosts
        # stop at the same boundary (a straggler that kept enqueueing while
        # others stopped would hang in this very collective).
        preempt_count = (jax.lax.psum(jnp.sum(batch.pop('preempt')), 'data')
                         if 'preempt' in batch else None)
        b = batch['mask_x'].shape[0]

        if on_device_aug:
            from semivl_tpu.ops.augment import (
                normalize_imagenet, strong_augment)

            def to_unit(x):  # uint8 or [0,1] float transport
                if x.dtype == jnp.uint8:
                    return x.astype(jnp.float32) / 255.0
                return x

            raw = to_unit(batch['img_raw'])
            raw_o = to_unit(batch['img_raw_other'])
            ar = jax.random.split(jax.random.fold_in(rng, 7), 4)
            batch = dict(batch)
            if batch['img_x'].dtype == jnp.uint8:
                x = to_unit(batch['img_x'])
                if cfg.get('labeled_photometric_distortion', False):
                    from semivl_tpu.ops.augment import photometric_distortion
                    x = photometric_distortion(jax.random.fold_in(rng, 8), x)
                batch['img_x'] = normalize_imagenet(x)
            batch['img_w'] = normalize_imagenet(raw)
            batch['img_w_other'] = normalize_imagenet(raw_o)
            batch['img_s1'] = strong_augment(ar[0], raw)
            batch['img_s2'] = strong_augment(ar[1], raw)
            batch['img_s1_other'] = strong_augment(ar[2], raw_o)
            batch['img_s2_other'] = strong_augment(ar[3], raw_o)

        # on-device CutMix of the strong views (semivl.py:224-225)
        img_s1 = cutmix_image(batch['img_s1'], batch['img_s1_other'],
                              batch['cutmix_box1'])
        img_s2 = cutmix_image(batch['img_s2'], batch['img_s2_other'],
                              batch['cutmix_box2'])

        params_sg = _freeze_stop_gradient(state.params, trainable_mask)

        # teacher pseudo-labels for the mixed-in halves (228-232)
        pred_w_other = module_fwd.apply(params_sg, batch['img_w_other'],
                                        text)
        conf_w_other, mask_w_other = _softmax_conf_label(
            jax.lax.stop_gradient(pred_w_other))

        # MaskCLIP guidance labels (234-240)
        if use_mcc:
            mclip_all = module.apply(
                params_sg,
                jnp.concatenate([batch['img_w'], batch['img_w_other']]),
                mcc_text, mcc_conf_thresh, method='forward_maskclip')
            mclip, mclip_other = mclip_all[:b], mclip_all[b:]
            mclip = jnp.where(batch['ignore_mask'] == 255, 255, mclip)
            mclip_other = jnp.where(batch['ignore_mask_other'] == 255, 255,
                                    mclip_other)

        has_bn = 'batch_stats' in state.params
        # NOTE (measured, round 3): merging the two student applies into one
        # b8 [x|w|s1|s2] pass is mathematically identical for BN-free
        # models but measured SLOWER on v5e — the b8 encoder fwd+bwd alone
        # ran 91.9 ms vs 82.4 for 2x b4 (XLA regresses at the larger
        # batch), full step 25.3 vs 29.1 imgs/sec — so the reference's
        # two-pass structure (semivl.py:243-249) is kept.

        def loss_fn(params):
            params = _freeze_stop_gradient(params, trainable_mask)
            rng_fp = jax.random.fold_in(rng, 1)
            out = module.apply(
                params, jnp.concatenate([batch['img_x'], batch['img_w']]),
                text, need_fp=True, train=True, rngs={'fp': rng_fp},
                mutable=['batch_stats'] if has_bn else False)
            if has_bn:
                (preds, preds_fp), upd = out
                params = {**params, **jax.lax.stop_gradient(upd)}
            else:
                preds, preds_fp = out
            pred_x, pred_w = preds[:b], preds[b:]
            pred_w_fp = preds_fp  # fp computed for the w-half only

            out = module.apply(
                params, jnp.concatenate([img_s1, img_s2]), text, train=True,
                mutable=['batch_stats'] if has_bn else False)
            if has_bn:
                pred_s, upd = out
                new_collections = jax.lax.stop_gradient(upd)
            else:
                pred_s = out
                new_collections = {}
            pred_s1, pred_s2 = pred_s[:b], pred_s[b:]

            conf_w, mask_w = _softmax_conf_label(
                jax.lax.stop_gradient(pred_w))

            box1, box2 = batch['cutmix_box1'], batch['cutmix_box2']
            mask_w_m1 = cutmix_mask(mask_w, mask_w_other, box1)
            mask_w_m2 = cutmix_mask(mask_w, mask_w_other, box2)
            conf_w_m1 = cutmix_mask(conf_w, conf_w_other, box1)
            conf_w_m2 = cutmix_mask(conf_w, conf_w_other, box2)
            ign_m1 = cutmix_mask(batch['ignore_mask'],
                                 batch['ignore_mask_other'], box1)
            ign_m2 = cutmix_mask(batch['ignore_mask'],
                                 batch['ignore_mask_other'], box2)

            loss_x = _labeled_loss(cfg, pred_x, batch['mask_x'])
            loss_s1 = unlabeled_loss(pred_s1, mask_w_m1, conf_w_m1, ign_m1)
            loss_s2 = unlabeled_loss(pred_s2, mask_w_m2, conf_w_m2, ign_m2)
            loss_fp = unlabeled_loss(pred_w_fp, mask_w, conf_w,
                                     batch['ignore_mask'])

            loss = (loss_x + loss_s1 * 0.25 + loss_s2 * 0.25
                    + loss_fp * 0.5) / 2.0
            metrics = {'loss_x': loss_x, 'loss_s1': loss_s1,
                       'loss_s2': loss_s2, 'loss_fp': loss_fp}
            if use_mcc:
                lam = mcc_lambda_at(state.step)
                mc_m1 = cutmix_mask(mclip, mclip_other, box1)
                mc_m2 = cutmix_mask(mclip, mclip_other, box2)
                loss_mc_s1 = _mc_loss(pred_s1, mc_m1, ign_m1, mcc_loss_reduce)
                loss_mc_s2 = _mc_loss(pred_s2, mc_m2, ign_m2, mcc_loss_reduce)
                loss_mc_fp = _mc_loss(pred_w_fp, mclip,
                                      batch['ignore_mask'], mcc_loss_reduce)
                loss = loss + lam * (loss_mc_s1 * 0.25 + loss_mc_s2 * 0.25
                                     + loss_mc_fp * 0.5)
                metrics.update({'loss_mc_s1': loss_mc_s1,
                                'loss_mc_s2': loss_mc_s2,
                                'loss_mc_fp': loss_mc_fp})
            metrics['loss_all'] = loss
            return loss, (metrics, new_collections)

        (_, (metrics, new_colls)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        grads = _pmean_trainable(grads['params'], trainable_mask)
        metrics = jax.lax.pmean(metrics, 'data')
        if cfg.get('log_grad_norm'):
            # global grad norm (post-pmean), for kernel A/B validation
            # (tools/decoder_ab_check.py) and drift debugging
            metrics['grad_norm'] = optax.global_norm(grads)
        if preempt_count is not None:
            metrics['preempt_count'] = preempt_count

        updates, new_opt_state = tx.update(grads, state.opt_state,
                                           state.params['params'])
        new_inner = optax.apply_updates(state.params['params'], updates)
        ema = state.ema_params
        if ema is not None:
            ema = _ema_update(ema, new_inner, cfg.get('ema_decay', 0.999))
        new_state = TrainState(
            params={**state.params, **new_colls, 'params': new_inner},
            opt_state=new_opt_state, step=state.step + 1, ema_params=ema)
        return new_state, metrics

    batch_keys_sharded = P('data')
    sharded_step = jax.shard_map(
        step_fn, mesh=mesh,
        in_specs=(P(), batch_keys_sharded, P()),
        out_specs=(P(), P()),
        check_vma=False)
    return jax.jit(sharded_step, donate_argnums=(0,))


def make_supervised_train_step(bundle, cfg, tx, mesh: Mesh, trainable_mask):
    """Labeled-only baseline step (reference supervised.py:273-289)."""
    check_criterion_pairing(cfg, bundle)
    module = bundle.module
    text = jnp.asarray(bundle.text_feats)

    def step_fn(state, batch, rng):
        batch = dict(batch)
        preempt_count = (jax.lax.psum(jnp.sum(batch.pop('preempt')), 'data')
                         if 'preempt' in batch else None)
        if 'img_u8' in batch:  # uint8 transport (strong_aug_on_device)
            # same device-side per-step derivation as the semivl step
            rng = jax.random.fold_in(rng, state.step)
            rng = jax.random.fold_in(rng, jax.lax.axis_index('data'))
            from semivl_tpu.ops.augment import normalize_imagenet
            x = batch.pop('img_u8').astype(jnp.float32) / 255.0
            if cfg.get('labeled_photometric_distortion', False):
                from semivl_tpu.ops.augment import photometric_distortion
                x = photometric_distortion(rng, x)
            batch['img'] = normalize_imagenet(x)
        if batch['mask'].dtype != jnp.int32:  # uint8 label transport
            batch['mask'] = batch['mask'].astype(jnp.int32)
        has_bn = 'batch_stats' in state.params

        def loss_fn(params):
            params = _freeze_stop_gradient(params, trainable_mask)
            out = module.apply(params, batch['img'], text, train=True,
                               mutable=['batch_stats'] if has_bn else False)
            if has_bn:
                pred, upd = out
                new_colls = jax.lax.stop_gradient(upd)
            else:
                pred, new_colls = out, {}
            loss = _labeled_loss(cfg, pred, batch['mask'])
            return loss, ({'loss_all': loss, 'loss_x': loss}, new_colls)

        (_, (metrics, new_colls)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        grads = _pmean_trainable(grads['params'], trainable_mask)
        metrics = jax.lax.pmean(metrics, 'data')
        if cfg.get('log_grad_norm'):
            # global grad norm (post-pmean), for kernel A/B validation
            # (tools/decoder_ab_check.py) and drift debugging
            metrics['grad_norm'] = optax.global_norm(grads)
        if preempt_count is not None:
            metrics['preempt_count'] = preempt_count
        updates, new_opt_state = tx.update(grads, state.opt_state,
                                           state.params['params'])
        new_inner = optax.apply_updates(state.params['params'], updates)
        ema = state.ema_params
        if ema is not None:
            ema = _ema_update(ema, new_inner, cfg.get('ema_decay', 0.999))
        return (TrainState(params={**state.params, **new_colls,
                                   'params': new_inner},
                           opt_state=new_opt_state, step=state.step + 1,
                           ema_params=ema),
                metrics)

    sharded_step = jax.shard_map(
        step_fn, mesh=mesh,
        in_specs=(P(), P('data'), P()),
        out_specs=(P(), P()),
        check_vma=False)
    return jax.jit(sharded_step, donate_argnums=(0,))


def shard_batch(batch, mesh: Mesh):
    """Device-put a host batch with the leading axis over the data mesh."""
    sharding = NamedSharding(mesh, P('data'))
    return {k: jax.device_put(v, sharding) for k, v in batch.items()
            if not isinstance(v, list)}


def replicate(tree, mesh: Mesh):
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)
