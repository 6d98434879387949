"""Training orchestration.

Equivalent of the reference trainer entrypoints (semivl.py:61-433,
third_party/unimatch/supervised.py:167-335) on the TPU-native runtime: one
host process drives an SPMD ``data`` mesh; the per-iteration work is a single
fused jitted step; eval runs the bucketed sliding-window path; checkpoints
(best + latest, with true resume) via orbax.
"""

import math
import os
import pprint
import signal
import time
import uuid
from datetime import datetime

import jax
import jax.numpy as jnp
import numpy as np
import yaml
from jax.sharding import Mesh

from semivl_tpu.data.dataset import SemiDataset, split_path
from semivl_tpu.data.loader import ShardedLoader
from semivl_tpu.datasets.classes import CLASSES
from semivl_tpu.datasets.palettes import get_palette
from semivl_tpu.evaluation.predict import Evaluator, evaluate
from semivl_tpu.models.builder import build_model
from semivl_tpu.train.checkpoint import CheckpointManager
from semivl_tpu.train.optim import build_optimizer
from semivl_tpu.train.step import (
    TrainState,
    make_semivl_train_step,
    make_supervised_train_step,
    replicate,
)
from semivl_tpu.utils.logging_utils import (
    DictAverageMeter,
    MetricWriter,
    add_file_handler,
    init_log,
)
from semivl_tpu.version import __version__


def make_mesh(cfg):
    devices = jax.devices()
    want = cfg.get('n_gpus', 1) * cfg.get('n_nodes', 1)
    n = min(len(devices), want) if cfg.get('respect_n_gpus') else len(devices)
    return Mesh(np.array(devices[:n]), ('data',))


def _maybe_multihost(logger):
    from semivl_tpu.parallel.mesh import setup_multihost
    pidx, pcount = setup_multihost()
    if pcount > 1:
        logger.info('Multi-host: process %d/%d, %d local of %d global '
                    'devices', pidx, pcount, jax.local_device_count(),
                    jax.device_count())
    return pidx, pcount


def setup_run_dir(cfg, args_dict, logger):
    timestr = datetime.now().strftime('%y%m%d-%H%M')
    uid = str(uuid.uuid4())[:5]
    run_name = f'{timestr}_{cfg["name"]}_v{__version__}_{uid}'.replace('.', '-')
    save_path = os.path.join('exp', f'exp-{cfg["exp"]}', run_name)
    os.makedirs(save_path, exist_ok=True)
    add_file_handler(logger, os.path.join(save_path, 'debug.log'))
    all_args = {**cfg, **args_dict, 'run_name': run_name,
                'save_path': save_path, 'exec_version': __version__,
                'n_devices': len(jax.devices())}
    logger.info('%s\n', pprint.pformat(all_args))
    with open(os.path.join(save_path, 'all_args.yaml'), 'w') as f:
        yaml.dump(all_args, f, default_flow_style=None, sort_keys=False,
                  indent=2)
    with open(os.path.join(save_path, 'config.yaml'), 'w') as f:
        yaml.dump(cfg, f, default_flow_style=None, sort_keys=False, indent=2)
    try:
        from semivl_tpu.utils.code_archive import gen_code_archive
        gen_code_archive(save_path)
    except Exception as exc:  # archiving must never kill a run
        logger.warning('code archive failed: %s', exc)
    return run_name, save_path


def init_state(bundle, cfg, total_iters, seed=0, pretrained=None):
    module = bundle.module
    img = jnp.zeros((1, cfg['crop_size'], cfg['crop_size'], 3))
    init_args = [img, jnp.asarray(bundle.text_feats)]
    if bundle.mcc_text_feats is not None:
        init_args.append(jnp.asarray(bundle.mcc_text_feats))
    from semivl_tpu.utils.init_utils import jit_init
    variables = jit_init(
        module,
        {'params': jax.random.PRNGKey(seed), 'fp': jax.random.PRNGKey(seed + 1)},
        *init_args, method='init_variables')
    if pretrained:
        from semivl_tpu.tools.convert_clip_weights import load_pretrained_into
        variables = load_pretrained_into(variables, pretrained,
                                         bundle=bundle)
    tx, sched, mask = build_optimizer(
        cfg, variables['params'],
        total_iters=total_iters,
        freeze_backbone=bundle.freeze_backbone,
        exclude_keys=bundle.exclude_keys,
        scheduler_max_iters=cfg.get('scheduler_max_iters'))
    ema = (jax.tree.map(jnp.array, variables['params'])
           if cfg.get('ema_decay') else None)
    state = TrainState(params=variables,
                       opt_state=tx.init(variables['params']),
                       step=jnp.zeros((), jnp.int32),
                       ema_params=ema)
    return state, tx, sched, mask


def _save_debug_grid_for_batch(cfg, bundle, state, bl, bu, save_path, iters,
                               logger):
    """Reference-style debug panel grid (semivl.py:371-406) for sample 0."""
    from semivl_tpu.utils.plotting import save_debug_grid
    palette = get_palette(cfg['dataset'])
    params_host = jax.device_get(state.params)
    text = jnp.asarray(bundle.text_feats)

    def fwd(img_np):
        return np.asarray(bundle.module.apply(
            params_host, jnp.asarray(img_np), text))

    if 'img' in bl:
        img_x = np.asarray(bl['img'][:1])
    else:  # uint8 transport mode
        from semivl_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD
        img_x = ((np.asarray(bl['img_u8'][:1], np.float32) / 255.0
                  - IMAGENET_MEAN) / IMAGENET_STD).astype(np.float32)
    pred_x = fwd(img_x)
    panels = [('Image L', img_x[0], 'image', None)]
    preds_row = [('Pred L', pred_x[0], 'prediction', palette)]
    gt_row = [('GT L', np.asarray(bl['mask'][0]), 'label', palette)]

    if 'img_w' in bu and 'img_s1' in bu:
        img_w = np.asarray(bu['img_w'][:1])
        img_s1 = np.asarray(bu['img_s1'][:1])
        img_s2 = np.asarray(bu['img_s2'][:1])
        pred_w = fwd(img_w)
        mask_w = pred_w.argmax(axis=1)
        panels += [('Image S1', img_s1[0], 'image', None),
                   ('Image S2', img_s2[0], 'image', None),
                   ('Image W', img_w[0], 'image', None)]
        preds_row += [('Pred S1', fwd(img_s1)[0], 'prediction', palette),
                      ('Pred S2', fwd(img_s2)[0], 'prediction', palette),
                      ('Pred W', pred_w[0], 'prediction', palette)]
        gt_row += [('PL W', mask_w[0], 'label', palette), None, None]
    rows = 3
    cols = max(len(panels), len(preds_row), len(gt_row))

    def padded(row):
        return row + [None] * (cols - len(row))

    grid = padded(panels) + padded(preds_row) + padded(gt_row)

    if bundle.mcc_text_feats is not None and 'img_w' in bu:
        mclip = np.asarray(bundle.module.apply(
            params_host, jnp.asarray(bu['img_w'][:1]),
            jnp.asarray(bundle.mcc_text_feats),
            cfg.get('mcc_conf_thresh', 0.75), method='forward_maskclip'))
        grid += padded([('MC W', mclip[0], 'label', palette)])
        rows += 1
    save_debug_grid(os.path.join(save_path, 'debug', f'{iters:07d}.png'),
                    grid, rows=rows, cols=cols)


def train(cfg, args_dict=None, max_iters_override=None, pretrained=None,
          seed=0, resume_from=None):
    """Run a full training job. Returns (best_mIoU, save_path).

    ``resume_from``: an existing run dir — reuse it and restore the
    'latest' checkpoint (true mid-run resume; the reference has none,
    SURVEY.md §5).
    """
    logger = init_log('global')
    if cfg.get('attention_impl'):
        from semivl_tpu.ops.attention import set_default_impl
        set_default_impl(cfg['attention_impl'])
    method = cfg.get('method', 'semivl')
    pidx, pcount = _maybe_multihost(logger)
    is_main = pidx == 0
    if resume_from:
        save_path = resume_from
        run_name = os.path.basename(os.path.normpath(resume_from))
        add_file_handler(logger, os.path.join(save_path, 'debug.log'))
        logger.info('Resuming run dir %s', save_path)
    else:
        run_name, save_path = setup_run_dir(cfg, args_dict or {}, logger)
    writer = MetricWriter(save_path) if is_main else None
    mesh = make_mesh(cfg)
    world = mesh.devices.size
    logger.info('Data mesh: %d device(s): %s', world, mesh.devices.ravel())

    bundle = build_model(cfg, dtype=jnp.dtype(cfg.get('dtype', 'float32')))

    labeled_id_path = cfg.get('labeled_id_path') or split_path(
        cfg['dataset'], cfg['split'], 'labeled')
    unlabeled_id_path = cfg.get('unlabeled_id_path') or split_path(
        cfg['dataset'], cfg['split'], 'unlabeled')
    val_id_path = cfg.get('val_id_path')

    trainset_u = SemiDataset(cfg, 'train_u', id_path=unlabeled_id_path,
                             seed=seed)
    trainset_l = SemiDataset(cfg, 'train_l', id_path=labeled_id_path,
                             nsample=len(trainset_u.ids), seed=seed + 1)
    valset = SemiDataset(cfg, 'val', id_path=val_id_path)

    bs = cfg['batch_size']
    loader_l = ShardedLoader(trainset_l, bs, world, seed=seed,
                             process_index=pidx, process_count=pcount)
    loader_u = ShardedLoader(trainset_u, bs, world, seed=seed, pair=True,
                             process_index=pidx, process_count=pcount)
    steps_per_epoch = (len(loader_u) if method in ('semivl', 'unimatch')
                       else len(loader_l))

    if cfg.get('iters') is not None:
        assert cfg.get('epochs') is None
        cfg = dict(cfg)
        cfg['epochs'] = math.ceil(cfg['iters'] / steps_per_epoch)
    total_iters = steps_per_epoch * cfg['epochs']
    if max_iters_override:
        total_iters = min(total_iters, max_iters_override)
    logger.info('Train for %d epochs / %d iterations.', cfg['epochs'],
                total_iters)

    state, tx, sched, mask = init_state(bundle, cfg, total_iters, seed,
                                        pretrained)
    if method in ('semivl', 'unimatch'):
        step_fn = make_semivl_train_step(bundle, cfg, tx, mesh, total_iters,
                                         mask)
    elif method == 'supervised':
        step_fn = make_supervised_train_step(bundle, cfg, tx, mesh, mask)
    else:
        raise ValueError(method)

    ckpt = CheckpointManager(save_path)
    previous_best = 0.0
    start_epoch = 0
    if ckpt.exists('latest'):
        state, extra = ckpt.restore('latest', state)
        start_epoch = int(extra.get('epoch', -1)) + 1
        previous_best = float(extra.get('previous_best', 0.0))
        logger.info('Resumed from epoch %d (best %.2f)', start_epoch,
                    previous_best)

    state = replicate(state, mesh)
    evaluator = Evaluator(bundle.module, None, bundle.text_feats, cfg,
                          mesh=mesh)
    rng = jax.random.PRNGKey(seed + 1234)

    # Preemption safety (the reference loses the run on any interruption —
    # SURVEY.md §5): SIGTERM/SIGINT request a 'latest' checkpoint at the
    # next step boundary, then exit cleanly; resume picks it up.
    preempted = {'flag': False}

    def _on_signal(signum, frame):
        del frame
        preempted['flag'] = True

    prev_handlers = {}
    for sig in (signal.SIGTERM, signal.SIGINT):
        try:
            prev_handlers[sig] = signal.signal(sig, _on_signal)
        except ValueError:
            pass  # not the main thread

    log_avg = DictAverageMeter()
    done = False
    for epoch in range(start_epoch, cfg['epochs']):
        if done:
            break
        logger.info('===========> Epoch: %d, LR: %.5f, Previous best: %.2f',
                    epoch, float(sched(int(state.step))), previous_best)
        from semivl_tpu.parallel.mesh import (
            device_prefetch, global_batch_to_device)
        if method in ('semivl', 'unimatch'):
            raw_batches = zip(loader_l.epoch(epoch), loader_u.epoch(epoch))

            def to_device(pair):
                bl, bu = pair
                db = {'img_x': bl.get('img', bl.get('img_u8')),
                      'mask_x': bl['mask'],
                      # the step consumes only the non-other CutMix boxes
                      **{k: v for k, v in bu.items()
                         if not (k.startswith('cutmix_box')
                                 and k.endswith('_other'))}}
                return global_batch_to_device(db, mesh)

            batches = device_prefetch(raw_batches, mesh,
                                      to_device=to_device)
        else:
            batches = device_prefetch(loader_l.epoch(epoch), mesh)

        epoch_start_step = int(state.step)  # one device fetch per epoch
        pending_metrics, iter_times = [], []
        for i, (host_batch, device_batch) in enumerate(batches):
            t0 = time.time()
            # jax.profiler trace window (SURVEY.md §5: reference has none)
            cur_step = epoch_start_step + i
            if cfg.get('profile_dir') and cur_step == cfg.get(
                    'profile_start_step', 10):
                jax.profiler.start_trace(cfg['profile_dir'])
            if cfg.get('profile_dir') and cur_step == cfg.get(
                    'profile_start_step', 10) + cfg.get('profile_steps', 5):
                jax.profiler.stop_trace()
            if method in ('semivl', 'unimatch'):
                bl, bu = host_batch
            rng, step_rng = jax.random.split(rng)
            state, metrics = step_fn(state, device_batch,
                                     replicate(step_rng, mesh))
            # Track the global step on host and defer metric fetches to the
            # logging window: per-step scalar device->host reads would
            # serialise the prefetch pipeline (and cost one link round-trip
            # per scalar on remote-attached devices).
            iters = epoch_start_step + i
            pending_metrics.append(metrics)
            iter_times.append(time.time() - t0)

            if i % 100 == 0:
                stacked = {
                    f'train/{k}': float(np.asarray(jnp.stack(
                        [m[k] for m in pending_metrics]).astype(
                            jnp.float32)).mean())
                    for k in pending_metrics[0]}
                stacked['train/iter_time'] = float(np.mean(iter_times))
                pending_metrics.clear()
                iter_times.clear()
                log_avg.update(stacked)
                logger.info('Iters: %d %s', i, str(log_avg))
                if writer is not None:
                    for k, v in log_avg.avgs.items():
                        writer.add_scalar(k, v, iters)
                log_avg.reset()

            # per-epoch debug grid (reference semivl.py:371-406: images /
            # predictions / pseudo-labels, + MaskCLIP row when mcc is on);
            # a few extra un-jitted forwards on the first sample of the epoch
            if i == 0 and is_main and cfg.get('debug_images', True) \
                    and method in ('semivl', 'unimatch'):
                try:
                    _save_debug_grid_for_batch(
                        cfg, bundle, state, bl, bu, save_path, iters, logger)
                except Exception as exc:
                    logger.warning('debug images failed: %s', exc)
            if preempted['flag'] and is_main:
                host_state = jax.device_get(state)
                ckpt.save('latest', host_state,
                          extra={'epoch': epoch - 1,
                                 'previous_best': previous_best})
                logger.info('Preemption signal: saved latest checkpoint at '
                            'step %d, exiting.', int(state.step))
                if writer is not None:
                    writer.close()
                for sig, h in prev_handlers.items():
                    signal.signal(sig, h)
                return previous_best, save_path
            if iters + 1 >= total_iters:
                done = True
                break

        if (epoch % cfg.get('eval_every_n_epochs', 1) == 0
                or epoch == cfg['epochs'] - 1 or done):
            evaluator.update_params(jax.device_get(state.params))
            eval_mode = cfg['eval_mode']
            miou, iou_class = evaluate(evaluator, valset, eval_mode, cfg,
                                       process_index=pidx,
                                       process_count=pcount)
            logger.info(run_name)
            for cls_idx, iou in enumerate(iou_class):
                logger.info('***** Evaluation ***** >>>> Class [%d %s] '
                            'IoU: %.2f', cls_idx,
                            CLASSES[cfg['dataset']][cls_idx], iou)
            logger.info('***** Evaluation %s ***** >>>> MeanIoU: %.2f\n',
                        eval_mode, miou)
            if writer is not None:
                writer.add_scalar('eval/mIoU', miou, epoch)
                for idx, iou in enumerate(iou_class):
                    writer.add_scalar(
                        f'eval/{CLASSES[cfg["dataset"]][idx]}_IoU', iou,
                        epoch)

            is_best = miou > previous_best
            previous_best = max(miou, previous_best)
            if is_main:
                host_state = jax.device_get(state)
                ckpt.save('latest', host_state,
                          extra={'epoch': epoch,
                                 'previous_best': previous_best})
                if is_best:
                    ckpt.save('best', host_state,
                              extra={'epoch': epoch,
                                     'previous_best': previous_best})

    if writer is not None:
        writer.close()
    return previous_best, save_path
