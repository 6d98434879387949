#!/usr/bin/env python
"""Export our Flax VLM checkpoint back to the reference's torch naming.

The inverse of ``convert_reference_ckpt.py``: produces a flat state dict with
the reference's parameter names (semivl.py:423-433 ``best.pth`` layout:
``{'model': state_dict, 'epoch': N}``), so checkpoints trained here can be
evaluated or fine-tuned with the reference codebase (its eval.py:130-139
loader strips ``module.`` and ignores missing ``clip_encoder.*`` — we never
export the frozen guidance encoder, matching what it expects).

Covers the same families as the importer: MaskClip-ViT backbone, VLG decode
head, ResNetV1c conv_encoder (params + BN running stats). Flax->torch
conventions are the exact inverses used there: Linear kernels transpose,
conv kernels (H,W,I,O) -> (O,I,H,W), transposed-conv kernels (kH,kW,I,O) ->
(I,O,kH,kW), scale/bias -> weight/bias, batch_stats -> running_mean/var
(+ zero ``num_batches_tracked`` so ``load_state_dict(strict=True)`` works).
"""

import argparse

import numpy as np


def _f(v):
    return np.asarray(v, np.float32)


def _conv(out, key, p):
    out[key + '.weight'] = _f(p['kernel']).transpose(3, 2, 0, 1)
    if 'bias' in p:
        out[key + '.bias'] = _f(p['bias'])


def _dense(out, key, p):
    out[key + '.weight'] = _f(p['kernel']).T
    if 'bias' in p:
        out[key + '.bias'] = _f(p['bias'])


def _norm(out, key, p):
    out[key + '.weight'] = _f(p['scale'])
    out[key + '.bias'] = _f(p['bias'])


def _block(out, pre, p):
    """our TransformerBlock tree -> mmcv TransformerEncoderLayer names."""
    _norm(out, pre + 'ln1', p['ln1'])
    _norm(out, pre + 'ln2', p['ln2'])
    out[pre + 'attn.attn.in_proj_weight'] = _f(p['attn']['in_proj']['kernel']).T
    out[pre + 'attn.attn.in_proj_bias'] = _f(p['attn']['in_proj']['bias'])
    _dense(out, pre + 'attn.attn.out_proj', p['attn']['out_proj'])
    _dense(out, pre + 'ffn.layers.0.0', p['ffn']['fc1'])
    _dense(out, pre + 'ffn.layers.1', p['ffn']['fc2'])


def export_maskclip_vit(out, p, prefix='backbone.'):
    out[prefix + 'cls_token'] = _f(p['cls_token'])
    out[prefix + 'pos_embed'] = _f(p['pos_embed'])
    out[prefix + 'patch_embed.projection.weight'] = _f(
        p['patch_embed']['kernel']).transpose(3, 2, 0, 1)
    _norm(out, prefix + 'ln0', p['ln0'])
    _norm(out, prefix + 'ln1', p['ln1'])
    if 'proj' in p:
        # the reference stores CLIP's visual projection as a 1x1 conv
        # (maskclip_vit.py:405-408 / convert_clip_weights.py)
        out[prefix + 'proj.weight'] = _f(p['proj']['kernel']).T[:, :, None,
                                                                None]
    i = 0
    while f'layers_{i}' in p:
        _block(out, f'{prefix}layers.{i}.', p[f'layers_{i}'])
        i += 1


def _conv_gn(out, conv_key, gn_key, p):
    _conv(out, conv_key, p['conv'])
    _norm(out, gn_key, p['gn'])


def export_vlg_head(out, p, prefix='decode_head.'):
    _conv(out, prefix + 'conv1', p['conv1'])
    _dense(out, prefix + 'text_proj.0', p['text_proj'])
    _conv(out, prefix + 'head', p['head'])
    aspp = p['aspp']
    for i in range(4):
        _conv_gn(out, f'{prefix}aspp.aspp_convs.{i}.0',
                 f'{prefix}aspp.aspp_convs.{i}.1', aspp[f'branch_{i}'])
    _conv_gn(out, prefix + 'aspp.aspp_convs.4.gap.1',
             prefix + 'aspp.aspp_convs.4.gap.2', aspp['pool']['proj'])
    _conv_gn(out, prefix + 'aspp.project.0', prefix + 'aspp.project.1',
             aspp['project'])
    i = 0
    while f'layers_{i}' in p:
        _block(out, f'{prefix}layers.{i}.transformer.',
               p[f'layers_{i}']['transformer'])
        i += 1
    i = 0
    while f'skip_proj_{i}' in p:
        _conv(out, f'{prefix}skip_proj.{i}.0', p[f'skip_proj_{i}'])
        i += 1
    for name in ('up1', 'up2'):
        up = p[name]
        out[f'{prefix}{name}.up.weight'] = _f(up['up_kernel']).transpose(
            2, 3, 0, 1)
        out[f'{prefix}{name}.up.bias'] = _f(up['up_bias'])
        _conv_gn(out, f'{prefix}{name}.conv.0', f'{prefix}{name}.conv.1',
                 up['conv1'])
        _conv_gn(out, f'{prefix}{name}.conv.3', f'{prefix}{name}.conv.4',
                 up['conv2'])


def _conv_bn(out, conv_key, bn_key, p, s):
    _conv(out, conv_key, p['conv'])
    out[bn_key + '.weight'] = _f(p['bn']['scale'])
    out[bn_key + '.bias'] = _f(p['bn']['bias'])
    out[bn_key + '.running_mean'] = _f(s['bn']['mean'])
    out[bn_key + '.running_var'] = _f(s['bn']['var'])
    out[bn_key + '.num_batches_tracked'] = np.zeros((), np.int64)


def export_resnet_v1c(out, p, s, prefix='conv_encoder.'):
    for name, ck, bk in (('stem1', 'stem.0', 'stem.1'),
                         ('stem2', 'stem.3', 'stem.4'),
                         ('stem3', 'stem.6', 'stem.7')):
        _conv_bn(out, prefix + ck, prefix + bk, p[name], s[name])
    for key in sorted(k for k in p if k.startswith('layer')):
        stage, b = key.split('_')
        bp = f'{prefix}{stage}.{b}.'
        for i in (1, 2, 3):
            _conv_bn(out, bp + f'conv{i}', bp + f'bn{i}',
                     p[key][f'conv{i}'], s[key][f'conv{i}'])
        if 'downsample' in p[key]:
            _conv_bn(out, bp + 'downsample.0', bp + 'downsample.1',
                     p[key]['downsample'], s[key]['downsample'])


def export_vlm_checkpoint(variables):
    """our variables dict ({'params', maybe 'batch_stats'}) -> flat
    reference-named state dict (no clip_encoder — the reference loader
    tolerates its absence)."""
    params = variables['params']
    stats = variables.get('batch_stats', {})
    out = {}
    export_maskclip_vit(out, params['backbone'])
    if 'conv1' in params.get('decode_head', {}):
        export_vlg_head(out, params['decode_head'])
    else:
        raise NotImplementedError(
            'only VLG decode heads are auto-exported so far')
    if 'conv_encoder' in params:
        export_resnet_v1c(out, params['conv_encoder'],
                          stats.get('conv_encoder', {}))
    return out


def _load_run_checkpoint(run_dir, slot, ema):
    """Read an orbax checkpoint written by train/checkpoint.py without
    needing a TrainState template."""
    import os

    import orbax.checkpoint as ocp
    path = os.path.join(run_dir, 'ckpt', slot)
    restored = ocp.StandardCheckpointer().restore(path)
    if ema:
        if restored.get('ema_params') is None:
            raise SystemExit('checkpoint has no ema_params')
        variables = dict(restored['params'])
        variables['params'] = restored['ema_params']
        return variables
    return restored['params']


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--run-dir', required=True,
                        help='training run dir (contains ckpt/)')
    parser.add_argument('--slot', default='best', choices=['best', 'latest'])
    parser.add_argument('--out', required=True, help='output .pth')
    parser.add_argument('--ema', action='store_true',
                        help='export the EMA weights as the model')
    args = parser.parse_args()
    import json
    import os

    import torch
    variables = _load_run_checkpoint(args.run_dir, args.slot, args.ema)
    flat = export_vlm_checkpoint(variables)
    extra_path = os.path.join(args.run_dir, 'ckpt',
                              args.slot + '.extra.json')
    epoch = 0
    if os.path.isfile(extra_path):
        with open(extra_path) as f:
            epoch = int(json.load(f).get('epoch', 0))
    torch.save({'model': {k: torch.from_numpy(np.ascontiguousarray(v))
                          for k, v in flat.items()},
                'epoch': epoch}, args.out)
    print(f'wrote {args.out} ({len(flat)} tensors, epoch {epoch})')


if __name__ == '__main__':
    main()
