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


def _make_run_name(cfg):
    timestr = datetime.now().strftime('%y%m%d-%H%M')
    uid = str(uuid.uuid4())[:5]
    return f'{timestr}_{cfg["name"]}_v{__version__}_{uid}'.replace('.', '-')


def _broadcast_run_name(run_name, maxlen=160):
    """All hosts must share one run dir: broadcast main's name (the
    timestamp/uuid parts differ per process otherwise)."""
    from jax.experimental import multihost_utils
    buf = np.frombuffer(run_name.encode()[:maxlen].ljust(maxlen), np.uint8)
    out = multihost_utils.broadcast_one_to_all(buf)
    return bytes(np.asarray(out)).decode().strip()


def setup_run_dir(cfg, args_dict, logger, run_name=None, is_main=True):
    if run_name is None:
        run_name = _make_run_name(cfg)
    save_path = os.path.join('exp', f'exp-{cfg["exp"]}', run_name)
    os.makedirs(save_path, exist_ok=True)
    add_file_handler(logger, os.path.join(save_path, 'debug.log'))
    if not is_main:
        return run_name, save_path
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
    if cfg.get('init_param_overrides'):
        # npz of '/'-joined param paths -> arrays, merged after init (e.g.
        # a pretrained guidance encoder for tools/semi_effect_demo.py)
        loaded = np.load(cfg['init_param_overrides'])
        params = variables['params']
        for key in loaded.files:
            node = params
            parts = key.split('/')
            for p_ in parts[:-1]:
                node = node[p_]
            assert parts[-1] in node, key
            node[parts[-1]] = jnp.asarray(loaded[key])
        variables = {**variables, 'params': params}
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


_DEBUG_FWD_CACHE = {}


def _debug_fwds(bundle, cfg):
    """Jitted single-image forwards for the debug grid, cached per module.

    The grid needs 4-5 model forwards per epoch. Running them eagerly
    with host-fetched params (the obvious translation of reference
    semivl.py:371-406) costs a full-param D2H fetch plus a per-op
    dispatch storm — measured ~250 s/epoch through the remote-TPU relay,
    20x the 100 training steps it decorates (round-5 soak finding). One
    jitted apply with device-resident params makes it milliseconds.
    """
    key = id(bundle.module)
    if key not in _DEBUG_FWD_CACHE:
        text = jnp.asarray(bundle.text_feats)

        @jax.jit
        def fwd(params, img):
            # argmax ON DEVICE: the grid only renders label maps, and a
            # (1, C, H, W) f32 logit fetch is ~22 MB/panel through the
            # relay vs 0.26 MB for the uint8 map
            logits = bundle.module.apply(params, img, text)
            return jnp.argmax(logits, axis=1).astype(jnp.uint8)

        mclip = None
        if bundle.mcc_text_feats is not None:
            mcc = jnp.asarray(bundle.mcc_text_feats)
            thresh = float(cfg.get('mcc_conf_thresh', 0.75))

            @jax.jit
            def mclip(params, img):
                return bundle.module.apply(params, img, mcc, thresh,
                                           method='forward_maskclip')

        _DEBUG_FWD_CACHE[key] = (fwd, mclip)
    return _DEBUG_FWD_CACHE[key]


def _save_debug_grid_for_batch(cfg, bundle, state, bl, bu, save_path, iters,
                               logger):
    """Reference-style debug panel grid (semivl.py:371-406) for sample 0."""
    from semivl_tpu.utils.plotting import save_debug_grid
    palette = get_palette(cfg['dataset'])
    fwd_jit, mclip_jit = _debug_fwds(bundle, cfg)

    def fwd(img_np):
        return np.asarray(fwd_jit(state.params, jnp.asarray(img_np)))

    if 'img' in bl:
        img_x = np.asarray(bl['img'][:1])
    else:  # uint8 transport mode
        from semivl_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD
        img_x = ((np.asarray(bl['img_u8'][:1], np.float32) / 255.0
                  - IMAGENET_MEAN) / IMAGENET_STD).astype(np.float32)
    pred_x = fwd(img_x)  # (1, H, W) device-argmaxed label map
    panels = [('Image L', img_x[0], 'image', None)]
    preds_row = [('Pred L', pred_x[0], 'label', palette)]
    gt_row = [('GT L', np.asarray(bl['mask'][0]), 'label', palette)]

    if 'img_w' in bu and 'img_s1' in bu:
        img_w = np.asarray(bu['img_w'][:1])
        img_s1 = np.asarray(bu['img_s1'][:1])
        img_s2 = np.asarray(bu['img_s2'][:1])
        pred_w = fwd(img_w)
        panels += [('Image S1', img_s1[0], 'image', None),
                   ('Image S2', img_s2[0], 'image', None),
                   ('Image W', img_w[0], 'image', None)]
        preds_row += [('Pred S1', fwd(img_s1)[0], 'label', palette),
                      ('Pred S2', fwd(img_s2)[0], 'label', palette),
                      ('Pred W', pred_w[0], 'label', palette)]
        gt_row += [('PL W', pred_w[0], 'label', palette), None, None]
    rows = 3
    cols = max(len(panels), len(preds_row), len(gt_row))

    def padded(row):
        return row + [None] * (cols - len(row))

    grid = padded(panels) + padded(preds_row) + padded(gt_row)

    if mclip_jit is not None and 'img_w' in bu:
        mclip = np.asarray(mclip_jit(state.params,
                                     jnp.asarray(bu['img_w'][:1])))
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
        os.makedirs(save_path, exist_ok=True)
        add_file_handler(logger, os.path.join(save_path, 'debug.log'))
        logger.info('Resuming run dir %s', save_path)
    else:
        run_name = _make_run_name(cfg)
        if pcount > 1:
            run_name = _broadcast_run_name(run_name)
        run_name, save_path = setup_run_dir(cfg, args_dict or {}, logger,
                                            run_name=run_name,
                                            is_main=is_main)
    writer = MetricWriter(save_path) if is_main else None
    mesh = make_mesh(cfg)
    world = mesh.devices.size
    logger.info('Data mesh: %d device(s): %s', world, mesh.devices.ravel())
    if pcount > 1:
        # Establish the cross-host collective context (gloo on CPU, ICI/DCN
        # on TPU pods) while all processes sit at the same early point:
        # the first collective otherwise happens only after each host's
        # model compile, and hosts that compile slower than the transport's
        # connect timeout (~30 s) would abort the rendezvous.
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices('semivl:pre_build')

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
    resume_skip = 0  # batches already consumed in start_epoch (mid-epoch)
    if ckpt.exists('latest'):
        state, extra = ckpt.restore('latest', state)
        # Host copies: the replicate() below is then a local upload on every
        # process. Restored arrays are committed to specific devices, and a
        # device_put from those onto the global mesh would be a (CPU/DCN-
        # unsupported) cross-host transfer in multi-process runs.
        state = jax.device_get(state)
        saved_epoch = int(extra.get('epoch', -1))
        resume_skip = int(extra.get('epoch_step', 0))
        # epoch_step > 0: the save happened mid-epoch (preemption) — resume
        # INSIDE that epoch at the exact batch boundary. The loader's
        # permutation depends only on (seed, epoch) and the step RNG only
        # on the global step, so the resumed run is bit-identical to an
        # uninterrupted one.
        start_epoch = saved_epoch if resume_skip > 0 else saved_epoch + 1
        previous_best = float(extra.get('previous_best', 0.0))
        logger.info('Resumed at epoch %d, epoch step %d (best %.2f)',
                    start_epoch, resume_skip, previous_best)

    state = replicate(state, mesh)
    # Multi-process: each host evaluates its strided share of the val set
    # on a LOCAL-device mesh (global-mesh eval outputs are not addressable
    # per-process, but a per-host mesh over jax.local_devices() keeps every
    # local chip busy on that host's images); per-class histograms are
    # reduced globally inside ``evaluate`` via process_allgather
    # (reference supervised.py:154-156).
    if pcount == 1:
        eval_mesh = mesh
    else:
        local = jax.local_devices()
        eval_mesh = (Mesh(np.array(local), ('data',))
                     if len(local) > 1 else None)
    evaluator = Evaluator(bundle.module_fwd, None, bundle.text_feats, cfg,
                          mesh=eval_mesh)
    # Per-step RNG = fold_in(base, global_step), derived inside the jitted
    # step from state.step: stateless, so mid-epoch resume reproduces the
    # exact key stream of an uninterrupted run (a split chain could not be
    # fast-forwarded). The base key is uploaded once — per-step host-side
    # folding + device_put cost an unoverlapped H2D round trip per step on
    # remote-attached devices (round-5 soak finding).
    base_rng_dev = replicate(jax.random.PRNGKey(seed + 1234), mesh)

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
    metric_keys = None  # stable order for the windowed metric matrix
    done = False
    step_warmed = False  # multi-host: compile-then-barrier before step 1
    eval_warmed = False  # multi-host: eval compile warmup + barrier
    for epoch in range(start_epoch, cfg['epochs']):
        if done:
            break
        logger.info('===========> Epoch: %d, LR: %.5f, Previous best: %.2f',
                    epoch, float(sched(int(state.step))), previous_best)
        from semivl_tpu.parallel.mesh import (
            device_prefetch, global_batch_to_device)
        skip = resume_skip if epoch == start_epoch else 0
        n_local_dev = world // pcount  # this host's share of the mesh

        def preempt_arr():
            # local SIGTERM/SIGINT flag, one entry per local device so the
            # global array shards 1-per-device over the data axis
            return np.full((n_local_dev,),
                           float(preempted['flag']), np.float32)

        if method in ('semivl', 'unimatch'):
            raw_batches = zip(loader_l.epoch(epoch, start_step=skip),
                              loader_u.epoch(epoch, start_step=skip))

            def to_device(pair):
                bl, bu = pair
                db = {'img_x': bl.get('img', bl.get('img_u8')),
                      'mask_x': bl['mask'],
                      'preempt': preempt_arr(),
                      # the step consumes only the non-other CutMix boxes
                      **{k: v for k, v in bu.items()
                         if not (k.startswith('cutmix_box')
                                 and k.endswith('_other'))}}
                return global_batch_to_device(db, mesh)

            batches = device_prefetch(raw_batches, mesh,
                                      to_device=to_device)
        else:
            def to_device_sup(b):
                return global_batch_to_device(
                    {**b, 'preempt': preempt_arr()}, mesh)

            batches = device_prefetch(loader_l.epoch(epoch, start_step=skip),
                                      mesh, to_device=to_device_sup)

        epoch_start_step = int(state.step)  # one device fetch per epoch
        pending_metrics, iter_times = [], []
        window_t0 = time.time()
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
            if pcount > 1 and not step_warmed:
                # Compile-then-barrier: hosts whose first-step compile is
                # slower than the collective transport's connect window
                # (~30 s for gloo; finite for ICI/DCN rendezvous too) would
                # otherwise abort the first step's collective. AOT-compile
                # (populates the persistent cache), then rendezvous, so
                # every host dispatches step 1 near-simultaneously.
                from jax.experimental import multihost_utils
                step_fn.lower(state, device_batch, base_rng_dev).compile()
                multihost_utils.sync_global_devices('semivl:step_compiled')
                step_warmed = True
            # per-step key = fold_in(base, state.step) INSIDE the jitted
            # step (train/step.py) — no per-step host fold/upload
            state, metrics = step_fn(state, device_batch, base_rng_dev)
            # Track the global step on host and defer metric fetches to the
            # logging window: per-step scalar device->host reads would
            # serialise the prefetch pipeline (and cost one link round-trip
            # per scalar on remote-attached devices).
            iters = epoch_start_step + i
            if metric_keys is None:
                metric_keys = sorted(k for k in metrics
                                     if k != 'preempt_count')
            # One tiny enqueue-only stack per step (overlapped with device
            # compute): the window-end fetch then marshals ~100 vector
            # handles instead of ~800 scalar handles through the device
            # link — on the remote relay, per-handle marshal cost made the
            # 800-handle fetch a measurable slice of the window.
            pending_metrics.append(jnp.stack(
                [metrics[k] for k in metric_keys]).astype(jnp.float32))
            iter_times.append(time.time() - t0)

            if i % 100 == 0:
                # drain first with a single-scalar fetch (waits for the
                # window's last step to EXECUTE — async dispatch returns
                # long before), then fetch the whole (W, K) matrix in one
                # transfer; the split attributes window time to device-lag
                # vs fetch-marshal in every run's log
                fetch_t0 = time.time()
                float(jnp.ravel(pending_metrics[-1])[0])
                drain_s = time.time() - fetch_t0
                mat = np.asarray(jnp.stack(pending_metrics))
                means = mat.mean(axis=0)
                stacked = {f'train/{k}': float(means[j])
                           for j, k in enumerate(metric_keys)}
                stacked['train/window_drain_time'] = drain_s
                stacked['train/metric_fetch_time'] = (
                    time.time() - fetch_t0 - drain_s)
                stacked['train/iter_time'] = float(np.mean(iter_times))
                # Sustained per-chip throughput in the bench unit (labeled
                # + unlabeled imgs/iter = 2*bs for semi-supervised
                # methods). Wall-clock over the window, AFTER the stacked
                # metric fetch above — that fetch barriers on the window's
                # last step, so this includes loader + dispatch + device
                # execution. iter_time alone is enqueue-only on
                # remote-attached devices (async dispatch returns before
                # execution) and overstated throughput 140x in the
                # round-5 soak.
                ipi = (2 if method in ('semivl', 'unimatch') else 1) * bs
                stacked['train/imgs_per_sec_per_chip'] = (
                    ipi * len(iter_times)
                    / max(time.time() - window_t0, 1e-9))
                window_t0 = time.time()
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
            # Fault injection (SURVEY.md §5 — absent in the reference):
            # simulate a preemption signal arriving on THIS host right
            # after the given global step; exercised by the resume and
            # multi-host tests.
            if cfg.get('preempt_at_step') is not None \
                    and cur_step == int(cfg['preempt_at_step']):
                preempted['flag'] = True
            # Preemption: single-process acts on the local flag at once;
            # multi-process reaches consensus through the in-step psum'd
            # flag, checked at IDENTICAL global steps on every host — all
            # hosts therefore stop at the same boundary (a host stopping
            # alone would strand the others in the next step's collectives).
            # The scalar fetch waits for that step, so the check cadence
            # bounds both the pipeline stall and the exit latency.
            stop = False
            if pcount == 1:
                stop = preempted['flag']
            elif cur_step % int(cfg.get('preempt_check_every', 10)) == 0:
                stop = float(np.asarray(metrics['preempt_count']).astype(
                    np.float32)) > 0
            if stop:
                # Every process participates in the save: orbax performs
                # cross-process barriers internally (main-only saving
                # deadlocks under jax.distributed — verified); the primary
                # host does the writing.
                host_state = jax.device_get(state)
                ckpt.save('latest', host_state,
                          extra={'epoch': epoch,
                                 'epoch_step': skip + i + 1,
                                 'previous_best': previous_best})
                logger.info('Preemption signal: saved latest checkpoint at '
                            'step %d (epoch %d, epoch step %d), exiting.',
                            cur_step + 1, epoch, skip + i + 1)
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
            # Single-process: hand over the device-resident params (the
            # eval mesh IS the train mesh — zero transfer). Multi-process:
            # the local eval mesh differs from the global train mesh, so
            # fetch once and let update_params re-pin to the local devices
            # (one upload per eval, not one per predict call).
            evaluator.update_params(state.params if pcount == 1
                                    else jax.device_get(state.params))
            eval_mode = cfg['eval_mode']
            if pcount > 1 and not eval_warmed:
                # Warm every distinct local val-image shape's eval programs
                # (predict has no cross-process collective), then
                # rendezvous: otherwise per-host compile skew at the first
                # eval would exceed the collective transport's ~30 s
                # connect window at the final histogram allgather.
                from jax.experimental import multihost_utils
                seen_shapes = set()
                for vi in range(pidx, len(valset), pcount):
                    img = valset.get(vi)['img']
                    key = (img.shape, img.dtype)
                    if key in seen_shapes:
                        continue
                    seen_shapes.add(key)
                    # dtype must match the real transport (uint8 by
                    # default) or the warmup compiles the wrong programs
                    dummy = np.zeros((1,) + img.shape, img.dtype)
                    evaluator.predict(dummy, img.shape[:2], eval_mode)
                multihost_utils.sync_global_devices('semivl:eval_warmed')
                eval_warmed = True
            eval_t0 = time.time()
            miou, iou_class = evaluate(evaluator, valset, eval_mode, cfg,
                                       process_index=pidx,
                                       process_count=pcount)
            eval_dt = time.time() - eval_t0
            eval_fps = len(valset) / max(eval_dt, 1e-9)
            logger.info('***** Evaluation timing: %d images in %.1fs '
                        '(%.2f imgs/sec)', len(valset), eval_dt, eval_fps)
            logger.info(run_name)
            for cls_idx, iou in enumerate(iou_class):
                logger.info('***** Evaluation ***** >>>> Class [%d %s] '
                            'IoU: %.2f', cls_idx,
                            CLASSES[cfg['dataset']][cls_idx], iou)
            logger.info('***** Evaluation %s ***** >>>> MeanIoU: %.2f\n',
                        eval_mode, miou)
            if writer is not None:
                writer.add_scalar('eval/fps', eval_fps, epoch)
                writer.add_scalar('eval/mIoU', miou, epoch)
                for idx, iou in enumerate(iou_class):
                    writer.add_scalar(
                        f'eval/{CLASSES[cfg["dataset"]][idx]}_IoU', iou,
                        epoch)

            is_best = miou > previous_best
            previous_best = max(miou, previous_best)
            # collective save on all processes (see preemption note above)
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
