#!/usr/bin/env python
"""Convert a reference SemiVL checkpoint (torch ``best.pth``) to our Flax
variables, for parity evaluation of released checkpoints.

Handles the reference's checkpoint conventions (third_party/unimatch/
eval.py:130-142): ``module.`` DDP prefixes, the optional ``ema_model`` key of
released checkpoints, and dropping ``clip_encoder.*`` (eval never needs the
guidance encoder).

Covers the VLM + MaskClip-ViT + VLG/DLV3P model families. Torch->Flax
conventions: Linear/1x1-conv weights transpose, conv kernels (O,I,H,W) ->
(H,W,I,O), LN/GN weight/bias -> scale/bias, BN running stats ->
batch_stats.
"""

import argparse

import numpy as np


def _t(v):
    return np.asarray(v, np.float32)


def _conv(flat, key):
    return {'kernel': _t(flat[key + '.weight']).transpose(2, 3, 1, 0),
            **({'bias': _t(flat[key + '.bias'])}
               if key + '.bias' in flat else {})}


def _dense(flat, key):
    return {'kernel': _t(flat[key + '.weight']).T,
            **({'bias': _t(flat[key + '.bias'])}
               if key + '.bias' in flat else {})}


def _norm(flat, key):
    return {'scale': _t(flat[key + '.weight']), 'bias': _t(flat[key + '.bias'])}


def _block(flat, pre):
    """mmcv TransformerEncoderLayer -> our TransformerBlock tree."""
    return {
        'ln1': _norm(flat, pre + 'ln1'),
        'ln2': _norm(flat, pre + 'ln2'),
        'attn': {
            'in_proj': {'kernel': _t(flat[pre + 'attn.attn.in_proj_weight']).T,
                        'bias': _t(flat[pre + 'attn.attn.in_proj_bias'])},
            'out_proj': _dense(flat, pre + 'attn.attn.out_proj'),
        },
        'ffn': {
            'fc1': _dense(flat, pre + 'ffn.layers.0.0'),
            'fc2': _dense(flat, pre + 'ffn.layers.1'),
        },
    }


def convert_maskclip_vit(flat, prefix='backbone.', num_layers=None):
    p = {
        'cls_token': _t(flat[prefix + 'cls_token']),
        'pos_embed': _t(flat[prefix + 'pos_embed']),
        'patch_embed': {'kernel': _t(
            flat[prefix + 'patch_embed.projection.weight'])
            .transpose(2, 3, 1, 0)},
        'ln0': _norm(flat, prefix + 'ln0'),
        'ln1': _norm(flat, prefix + 'ln1'),
    }
    if prefix + 'proj.weight' in flat:
        w = _t(flat[prefix + 'proj.weight'])
        if w.ndim == 4:
            w = w[:, :, 0, 0]
        p['proj'] = {'kernel': w.T}
    if num_layers is None:
        num_layers = 0
        while f'{prefix}layers.{num_layers}.ln1.weight' in flat:
            num_layers += 1
    for i in range(num_layers):
        p[f'layers_{i}'] = _block(flat, f'{prefix}layers.{i}.')
    return p


def _conv_gn(flat, conv_key, gn_key):
    return {'conv': _conv(flat, conv_key), 'gn': _norm(flat, gn_key)}


def convert_vlg_head(flat, prefix='decode_head.', num_layers=None,
                     num_skips=None):
    """reference vlg_head.py param names -> our VLGHead tree."""
    if num_layers is None:
        num_layers = 0
        while f'{prefix}layers.{num_layers}.transformer.ln1.weight' in flat:
            num_layers += 1
    if num_skips is None:
        num_skips = 0
        while f'{prefix}skip_proj.{num_skips}.0.weight' in flat:
            num_skips += 1
    p = {
        'conv1': _conv(flat, prefix + 'conv1'),
        'text_proj': _dense(flat, prefix + 'text_proj.0'),
        'head': _conv(flat, prefix + 'head'),
    }
    aspp = {}
    for i in range(4):
        aspp[f'branch_{i}'] = _conv_gn(
            flat, f'{prefix}aspp.aspp_convs.{i}.0',
            f'{prefix}aspp.aspp_convs.{i}.1')
    aspp['pool'] = {'proj': _conv_gn(
        flat, prefix + 'aspp.aspp_convs.4.gap.1',
        prefix + 'aspp.aspp_convs.4.gap.2')}
    aspp['project'] = _conv_gn(flat, prefix + 'aspp.project.0',
                               prefix + 'aspp.project.1')
    p['aspp'] = aspp
    for i in range(num_layers):
        p[f'layers_{i}'] = {
            'transformer': _block(flat, f'{prefix}layers.{i}.transformer.')}
    for i in range(num_skips):
        p[f'skip_proj_{i}'] = _conv(flat, f'{prefix}skip_proj.{i}.0')
    for name, key in (('up1', 'up1'), ('up2', 'up2')):
        p[name] = {
            'up_kernel': _t(flat[f'{prefix}{key}.up.weight'])
            .transpose(2, 3, 0, 1),
            'up_bias': _t(flat[f'{prefix}{key}.up.bias']),
            'conv1': _conv_gn(flat, f'{prefix}{key}.conv.0',
                              f'{prefix}{key}.conv.1'),
            'conv2': _conv_gn(flat, f'{prefix}{key}.conv.3',
                              f'{prefix}{key}.conv.4'),
        }
    return p


def _conv_bn(flat, conv_key, bn_key):
    """(params, batch_stats) for a Conv+BN pair."""
    params = {'conv': _conv(flat, conv_key),
              'bn': {'scale': _t(flat[bn_key + '.weight']),
                     'bias': _t(flat[bn_key + '.bias'])}}
    stats = {'bn': {'mean': _t(flat[bn_key + '.running_mean']),
                    'var': _t(flat[bn_key + '.running_var'])}}
    return params, stats


def convert_resnet_v1c(flat, prefix='conv_encoder.', num_stages=1,
                       blocks=(3, 4, 23, 3)):
    """mmseg ResNetV1c state dict -> (params, batch_stats) trees
    (the VLG conv_encoder of the Cityscapes models, skr04)."""
    params, stats = {}, {}
    stem_keys = [('stem1', 'stem.0', 'stem.1'), ('stem2', 'stem.3', 'stem.4'),
                 ('stem3', 'stem.6', 'stem.7')]
    for name, ck, bk in stem_keys:
        p, s = _conv_bn(flat, prefix + ck, prefix + bk)
        params[name], stats[name] = p, s
    for stage in range(num_stages):
        n_blocks = blocks[stage]
        while not f'{prefix}layer{stage + 1}.{n_blocks - 1}.conv1.weight' \
                in flat and n_blocks > 1:
            n_blocks -= 1
        for b in range(n_blocks):
            bp = f'{prefix}layer{stage + 1}.{b}.'
            blk_p, blk_s = {}, {}
            for i in (1, 2, 3):
                p, s = _conv_bn(flat, bp + f'conv{i}', bp + f'bn{i}')
                blk_p[f'conv{i}'], blk_s[f'conv{i}'] = p, s
            if bp + 'downsample.0.weight' in flat:
                p, s = _conv_bn(flat, bp + 'downsample.0',
                                bp + 'downsample.1')
                blk_p['downsample'], blk_s['downsample'] = p, s
            params[f'layer{stage + 1}_{b}'] = blk_p
            stats[f'layer{stage + 1}_{b}'] = blk_s
    return params, stats


def load_reference_checkpoint(path, ema=False):
    """torch best.pth -> flat numpy state dict (module. stripped,
    clip_encoder dropped)."""
    import torch
    ckpt = torch.load(path, map_location='cpu', weights_only=False)
    sd = ckpt['ema_model'] if ema and 'ema_model' in ckpt else ckpt['model'] \
        if 'model' in ckpt else ckpt
    flat = {}
    for k, v in sd.items():
        k = k.replace('module.', '')
        if 'clip_encoder' in k:
            continue
        flat[k] = v.float().numpy() if hasattr(v, 'float') else np.asarray(v)
    return flat, ckpt.get('epoch')


def convert_vlm_checkpoint(flat, num_layers=None, vlg_layers=None,
                           num_skips=None):
    """Flat reference VLM state dict -> variables ({'params', maybe
    'batch_stats'})."""
    params = {'backbone': convert_maskclip_vit(flat, 'backbone.', num_layers)}
    stats = {}
    if any(k.startswith('decode_head.conv1') for k in flat):
        params['decode_head'] = convert_vlg_head(
            flat, 'decode_head.', vlg_layers, num_skips)
    else:
        raise NotImplementedError(
            'only VLG decode heads are auto-converted so far')
    if any(k.startswith('conv_encoder.') for k in flat):
        p, s = convert_resnet_v1c(flat)
        params['conv_encoder'] = p
        stats['conv_encoder'] = s
    out = {'params': params}
    if stats:
        out['batch_stats'] = stats
    return out


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--src', required=True, help='reference best.pth')
    parser.add_argument('--out', required=True, help='output .npz')
    parser.add_argument('--ema', action='store_true')
    args = parser.parse_args()
    from semivl_tpu.tools.convert_clip_weights import save_flax_npz
    flat, epoch = load_reference_checkpoint(args.src, ema=args.ema)
    variables = convert_vlm_checkpoint(flat)
    save_flax_npz(args.out, variables)
    print(f'wrote {args.out} (epoch {epoch})')


if __name__ == '__main__':
    main()
