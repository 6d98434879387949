#!/usr/bin/env python
"""Standalone checkpoint evaluation CLI.

Parity: reference third_party/unimatch/eval.py — loads a checkpoint (ours:
orbax run dir or converted .npz; theirs: torch best.pth with module./
ema_model handling), runs the configured sliding-window eval, and optionally
dumps paletted PNG predictions and raw logits (.npy).

    python -m semivl_tpu.tools.eval --config <cfg.yaml> \
        --save-path exp/.../ckpt/best [--pred-path out/preds] \
        [--logit-path out/logits] [--ema] [--platform cpu]
"""

import argparse
import logging
import os
import pprint

import numpy as np
import yaml
from PIL import Image


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--config', type=str, required=True)
    parser.add_argument('--save-path', type=str, required=True,
                        help="orbax ckpt dir, converted .npz, reference "
                             ".pth, or 'none' for random init")
    parser.add_argument('--ema', action='store_true')
    parser.add_argument('--pred-path', default=None, type=str)
    parser.add_argument('--logit-path', default=None, type=str)
    parser.add_argument('--platform', default=None)
    args = parser.parse_args()

    if args.platform:
        import jax
        jax.config.update('jax_platforms', args.platform)
    import jax
    import jax.numpy as jnp

    from semivl_tpu.data.dataset import SemiDataset
    from semivl_tpu.datasets.classes import CLASSES
    from semivl_tpu.datasets.palettes import get_palette
    from semivl_tpu.evaluation.metrics import intersection_and_union
    from semivl_tpu.evaluation.predict import Evaluator
    from semivl_tpu.models.builder import build_model
    from semivl_tpu.utils.logging_utils import init_log

    logger = init_log('global', logging.INFO)
    with open(args.config) as f:
        cfg = yaml.load(f, Loader=yaml.Loader)
    # legacy-config support + no guidance encoder at eval (eval.py:90-93)
    cfg.setdefault('text_embedding_variant', 'single')
    cfg.setdefault('pl_text', cfg['text_embedding_variant'])
    cfg['clip_encoder'] = None
    logger.info('%s\n', pprint.pformat({**cfg, **vars(args)}))

    bundle = build_model(cfg)
    variables = bundle.module.init(
        {'params': jax.random.PRNGKey(0), 'fp': jax.random.PRNGKey(1)},
        jnp.zeros((1, cfg['crop_size'], cfg['crop_size'], 3)),
        jnp.asarray(bundle.text_feats), method='init_variables')

    if args.save_path != 'none':
        if args.save_path.endswith('.npz'):
            from semivl_tpu.tools.convert_clip_weights import load_flax_npz
            variables = load_flax_npz(args.save_path)
        elif args.save_path.endswith(('.pth', '.pt')):
            from semivl_tpu.tools.convert_reference_ckpt import (
                convert_vlm_checkpoint, load_reference_checkpoint)
            flat, epoch = load_reference_checkpoint(args.save_path,
                                                    ema=args.ema)
            variables = convert_vlm_checkpoint(flat)
            logger.info('Loaded reference checkpoint (epoch %s)', epoch)
        else:
            import orbax.checkpoint as ocp
            restored = ocp.StandardCheckpointer().restore(
                os.path.abspath(args.save_path))
            variables = restored['params']
            if args.ema and restored.get('ema_params') is not None:
                variables = {**variables, 'params': restored['ema_params']}
                logger.info('Using EMA params')
            logger.info('Loaded orbax checkpoint step %s',
                        restored.get('step'))
    else:
        logger.info('************ WARNING: NO CHECKPOINT SPECIFIED')

    valset = SemiDataset(cfg, 'val', id_path=cfg.get('val_id_path'))
    evaluator = Evaluator(bundle.module_fwd, variables, bundle.text_feats, cfg)
    eval_mode = cfg.get('eval_mode') or (
        'sliding_window' if cfg['dataset'] == 'cityscapes' else 'original')
    palette = get_palette(cfg['dataset'])

    inter_sum = np.zeros(cfg['nclass'], np.float64)
    union_sum = np.zeros(cfg['nclass'], np.float64)
    for i in range(len(valset)):
        sample = valset.get(i)
        mask = sample['mask']
        pred, logits = evaluator.predict(sample['img'][None], mask.shape,
                                         eval_mode, return_logits=True)
        lbl_name = sample['id'].split(' ')[1].split('/')[-1]
        if args.logit_path:
            os.makedirs(args.logit_path, exist_ok=True)
            np.save(os.path.join(args.logit_path,
                                 lbl_name.replace('.png', '.npy')), logits)
        if args.pred_path:
            os.makedirs(args.pred_path, exist_ok=True)
            out = Image.fromarray(pred[0].astype(np.uint8)).convert('P')
            out.putpalette(palette.reshape(-1).tolist())
            out.save(os.path.join(args.pred_path, lbl_name))
        inter, union, _ = intersection_and_union(pred[0], mask, cfg['nclass'])
        inter_sum += inter
        union_sum += union

    iou_class = inter_sum / (union_sum + 1e-10) * 100.0
    miou = float(np.mean(iou_class))
    for cls_idx, iou in enumerate(iou_class):
        logger.info('***** Evaluation ***** >>>> Class [%d %s] IoU: %.2f',
                    cls_idx, CLASSES[cfg['dataset']][cls_idx], iou)
    logger.info('***** Evaluation %s ***** >>>> MeanIoU: %.2f\n',
                eval_mode, miou)


if __name__ == '__main__':
    main()
