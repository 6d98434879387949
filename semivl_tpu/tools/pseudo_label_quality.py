#!/usr/bin/env python
"""Mechanism-level pseudo-label quality measurement (no real artifacts).

The round-3 multi-seed rerun showed end-to-end mIoU gains at toy scale are
inside seed noise, so this tool measures the semi-supervision MECHANISM
directly instead (round-3 VERDICT item #7): on synthetic blob data with a
genuinely informative pretrained guidance encoder, it reports — per seed,
per branch, per confidence threshold —

  * teacher branch (reference semivl.py:228-232: live model on the weak
    view, softmax max-confidence): precision of the pseudo-label on pixels
    above threshold, and coverage (fraction of pixels above threshold);
  * MaskCLIP guidance branch (semivl.py:234-240 / vlm.py:90-110: frozen
    pretrained encoder, conv with text embeddings, conf-thresh to 255):
    precision over non-255 pixels and coverage;
  * both, restricted to UNSEEN-class pixels — classes the labeled split
    never contains (the demo's labeled pool draws blobs only from classes
    1-2; classes 3-4 appear only unlabeled). The teacher cannot know these
    (its supervision never saw them); an informative guidance encoder can.

Asserted invariants (the premises the SemiVL loss construction relies on):
  * teacher precision is non-decreasing in the confidence threshold
    (confidence_weighted_loss premise, train_utils.py:30-49);
  * guidance precision on unseen classes beats the majority-class chance
    rate by a wide margin while teacher precision there stays near zero.

Pure CPU:  JAX_PLATFORMS=cpu python -m semivl_tpu.tools.pseudo_label_quality
"""

import argparse
import json
import os

import numpy as np

THRESHOLDS = (0.0, 0.5, 0.75, 0.9, 0.95, 0.99)


def _load_pool(root, ids_path, crop=64):
    """Load (imgs_float, imgs_raw_masks) center-cropped to the model size."""
    from PIL import Image

    from semivl_tpu.data.transforms import normalize
    imgs, masks = [], []
    with open(ids_path) as f:
        for line in f:
            ip, mp = line.split()
            img = np.asarray(Image.open(os.path.join(root, ip)))
            mask = np.asarray(Image.open(os.path.join(root, mp)))
            imgs.append(normalize(img[:crop, :crop]))
            masks.append(mask[:crop, :crop].astype(np.int32))
    return np.stack(imgs), np.stack(masks)


def _precision_coverage(label, conf, gt, sel=None):
    """(precision, coverage) at each threshold; ``sel`` restricts pixels."""
    out = {}
    base = np.ones_like(gt, bool) if sel is None else sel
    for t in THRESHOLDS:
        m = base & (conf >= t)
        cov = m.mean() if sel is None else (m.sum() / max(base.sum(), 1))
        prec = float((label[m] == gt[m]).mean()) if m.any() else float('nan')
        out[t] = (prec, float(cov))
    return out


def run_seed(out_root, seed, warmup_steps):
    import jax
    import jax.numpy as jnp
    import optax

    from semivl_tpu.models.builder import build_model
    from semivl_tpu.tools.semi_effect_demo import (
        _base_cfg,
        make_blob_dataset,
        pretrain_guidance,
    )

    ds_root = os.path.join(out_root, f'data_s{seed}')
    paths = make_blob_dataset(ds_root, n_labeled=2, n_unlabeled=16,
                              n_val=8, seed=seed)
    guidance = pretrain_guidance(out_root, (72, 88), seed=seed)
    cfg = _base_cfg(ds_root, paths, 'semivl', epochs=1, guidance=guidance)
    bundle = build_model(cfg, dtype=jnp.float32)

    text = jnp.asarray(bundle.text_feats)
    mcc_text = jnp.asarray(bundle.mcc_text_feats)
    variables = bundle.module.init(
        {'params': jax.random.PRNGKey(seed), 'fp': jax.random.PRNGKey(seed + 1)},
        jnp.zeros((1, 64, 64, 3)), text, mcc_text, method='init_variables')
    # merge the pretrained guidance encoder (same npz contract as
    # train/loop.py init_param_overrides)
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

    # ---- brief supervised warmup on the labeled pool (classes 1-2 only):
    # the teacher's state early in semi-supervised training
    imgs_l, masks_l = _load_pool(ds_root, paths['labeled'])
    fwd = getattr(bundle, 'module_fwd', None) or bundle.module

    def ce(params, img, mask):
        # logits follow the reference layout (B, N, H, W)
        logits = fwd.apply({**variables, 'params': params}, img, text)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=1)
        onehot = jax.nn.one_hot(mask, logits.shape[1], axis=1)
        return -jnp.mean(jnp.sum(onehot * logp, axis=1))

    tx = optax.adam(3e-3)
    opt = tx.init(variables['params'])

    @jax.jit
    def step(params, opt, img, mask):
        lv, g = jax.value_and_grad(ce)(params, img, mask)
        upd, opt = tx.update(g, opt, params)
        return optax.apply_updates(params, upd), opt, lv

    params = variables['params']
    il, ml = jnp.asarray(imgs_l), jnp.asarray(masks_l)
    for _ in range(warmup_steps):
        params, opt, lv = step(params, opt, il, ml)
    variables = {**variables, 'params': params}
    print(f'[pl-quality] seed={seed} warmup CE {float(lv):.3f}', flush=True)

    # ---- measure both branches on the unlabeled pool
    imgs_u, gt = _load_pool(ds_root, paths['unlabeled'])
    iu = jnp.asarray(imgs_u)

    logits = np.asarray(fwd.apply(variables, iu, text), np.float32)
    probs = np.exp(logits - logits.max(1, keepdims=True))
    probs /= probs.sum(1, keepdims=True)
    t_conf, t_label = probs.max(1), probs.argmax(1)

    # guidance confidences: replicate forward_maskclip at threshold 0 then
    # sweep in numpy (vlm.py:90-110 thresholds inside the method)
    m_label = np.asarray(bundle.module.apply(
        variables, iu, mcc_text, 0.0, method='forward_maskclip'))
    m_conf = np.ones_like(t_conf)
    for t in THRESHOLDS[1:]:
        lab_t = np.asarray(bundle.module.apply(
            variables, iu, mcc_text, t, method='forward_maskclip'))
        m_conf = np.where((lab_t == 255) & (m_conf >= t), t - 1e-6, m_conf)

    unseen = np.isin(gt, (3, 4))
    res = dict(
        teacher=_precision_coverage(t_label, t_conf, gt),
        teacher_unseen=_precision_coverage(t_label, t_conf, gt, unseen),
        mcc=_precision_coverage(m_label, m_conf, gt),
        mcc_unseen=_precision_coverage(m_label, m_conf, gt, unseen),
        chance=float(np.mean(gt == np.bincount(gt.ravel()).argmax())),
        unseen_frac=float(unseen.mean()),
    )
    return res


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--out-root', default='/tmp/pl_quality')
    parser.add_argument('--seeds', type=int, default=3)
    parser.add_argument('--seed', type=int, default=0)
    parser.add_argument('--warmup-steps', type=int, default=120)
    args = parser.parse_args()
    import jax
    if os.environ.get('JAX_PLATFORMS') == 'cpu':
        jax.config.update('jax_platforms', 'cpu')

    os.makedirs(args.out_root, exist_ok=True)
    per_seed = [run_seed(args.out_root, s, args.warmup_steps)
                for s in range(args.seed, args.seed + args.seeds)]

    def agg(branch, t, idx):
        vals = [r[branch][t][idx] for r in per_seed]
        vals = [v for v in vals if np.isfinite(v)]
        return (float(np.mean(vals)), float(np.std(vals))) if vals else \
            (float('nan'), 0.0)

    chance = float(np.mean([r['chance'] for r in per_seed]))
    print(f'\n[pl-quality] ==== {args.seeds} seeds; majority-class chance '
          f'{chance:.3f} ====')
    print(f'{"thresh":>7} | {"teacher prec":>14} {"cov":>5} | '
          f'{"mcc prec":>14} {"cov":>5} | {"teach-unseen":>12} '
          f'{"mcc-unseen":>12}')
    summary = {'chance': chance, 'rows': []}
    for t in THRESHOLDS:
        tp, tps = agg('teacher', t, 0)
        tc = agg('teacher', t, 1)[0]
        mp, mps = agg('mcc', t, 0)
        mc = agg('mcc', t, 1)[0]
        tup = agg('teacher_unseen', t, 0)[0]
        mup, mups = agg('mcc_unseen', t, 0)
        print(f'{t:>7} | {tp:.3f}+-{tps:.3f} {tc:>9.2f} | '
              f'{mp:.3f}+-{mps:.3f} {mc:>9.2f} | {tup:>12.3f} '
              f'{mup:>9.3f}+-{mups:.3f}')
        summary['rows'].append(dict(
            thresh=t, teacher_prec=tp, teacher_cov=tc, mcc_prec=mp,
            mcc_cov=mc, teacher_unseen_prec=tup, mcc_unseen_prec=mup))

    # mechanism invariants
    tprecs = [r['teacher_prec'] for r in summary['rows']
              if np.isfinite(r['teacher_prec'])]
    monotonic = all(b >= a - 0.02 for a, b in zip(tprecs, tprecs[1:]))
    mcc_u = agg('mcc_unseen', 0.75, 0)[0]
    teach_u = agg('teacher_unseen', 0.75, 0)[0]
    # the null for unseen-class precision is an uninformed predictor:
    # supervision never contained these classes, so the teacher scores ~0
    # (measured); any static or labeled-class-trained guess does too. The
    # guidance branch must clear that null by a wide margin to carry the
    # learning signal the SemiVL loss construction assumes.
    uninformed = max(teach_u if np.isfinite(teach_u) else 0.0, 0.05)
    beats_chance = mcc_u > uninformed + 0.4
    print(f'[pl-quality] teacher precision monotonic in threshold: '
          f'{monotonic}')
    print(f'[pl-quality] unseen-class precision @0.75: guidance {mcc_u:.3f} '
          f'vs teacher {teach_u:.3f} (uninformed null {uninformed:.3f}) '
          f'-> guidance margin {mcc_u - uninformed:+.3f} '
          f'({"OK" if beats_chance else "FAIL"})')
    summary['teacher_prec_monotonic'] = bool(monotonic)
    summary['mcc_unseen_beats_chance'] = bool(beats_chance)
    with open(os.path.join(args.out_root, 'summary.json'), 'w') as f:
        json.dump(summary, f, indent=1)
    print(json.dumps({k: summary[k] for k in
                      ('teacher_prec_monotonic', 'mcc_unseen_beats_chance',
                       'chance')}))


if __name__ == '__main__':
    main()
