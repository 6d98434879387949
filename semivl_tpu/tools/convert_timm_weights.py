#!/usr/bin/env python
"""Convert a timm ViT checkpoint (torch state dict) to our Flax
TIMMVisionTransformer variables.

The reference's UniMatch-w/-ViT ablation builds ``vit_base_patch16_224``
with IN-1k/21k pretrained weights via timm (model/backbone/timm_vit.py:
28-45); timm handles positional-embedding interpolation on load. Here the
same is done explicitly: the 14x14(+cls) pos grid is bicubic-resized to the
training grid (512/16 = 32x32 by default).

timm naming -> ours: ``blocks.N.{norm1,norm2}`` -> ``layers_N.{ln1,ln2}``,
``attn.qkv/attn.proj`` -> ``attn.in_proj/out_proj``, ``mlp.fc1/fc2`` ->
``ffn.fc1/fc2``, ``patch_embed.proj`` -> ``patch_embed`` (OIHW -> HWIO),
``norm`` -> ``norm``.
"""

import argparse

import numpy as np


def _t(v):
    return np.asarray(v, np.float32)


def resize_timm_pos_embed(pos_embed, grid, src_grid=None):
    """(1, S*S+1, C) -> (1, gh*gw+1, C) by bicubic grid resize (timm
    resize_pos_embed semantics: cls token passed through, grid bicubic,
    align_corners=False)."""
    from semivl_tpu.ops.resize import resize
    import jax.numpy as jnp
    pos_embed = _t(pos_embed)
    n = pos_embed.shape[1] - 1
    if src_grid is None:
        s = int(round(n ** 0.5))
        src_grid = (s, s)
    gh, gw = grid
    if (gh, gw) == tuple(src_grid):
        return pos_embed
    grid_part = pos_embed[:, 1:].reshape(1, *src_grid, -1)
    out = resize(jnp.asarray(grid_part), (gh, gw), mode='bicubic',
                 align_corners=False)
    out = np.asarray(out).reshape(1, gh * gw, -1)
    return np.concatenate([pos_embed[:, :1], out], axis=1)


def convert_timm_vit(flat, grid=(32, 32)):
    """Flat timm state dict (numpy) -> our TIMMVisionTransformer params."""
    p = {
        'cls_token': _t(flat['cls_token']),
        'pos_embed': resize_timm_pos_embed(flat['pos_embed'], grid),
        'patch_embed': {
            'kernel': _t(flat['patch_embed.proj.weight'])
            .transpose(2, 3, 1, 0),
            'bias': _t(flat['patch_embed.proj.bias']),
        },
        'norm': {'scale': _t(flat['norm.weight']),
                 'bias': _t(flat['norm.bias'])},
    }
    i = 0
    while f'blocks.{i}.norm1.weight' in flat:
        pre = f'blocks.{i}.'
        p[f'layers_{i}'] = {
            'ln1': {'scale': _t(flat[pre + 'norm1.weight']),
                    'bias': _t(flat[pre + 'norm1.bias'])},
            'ln2': {'scale': _t(flat[pre + 'norm2.weight']),
                    'bias': _t(flat[pre + 'norm2.bias'])},
            'attn': {
                'in_proj': {'kernel': _t(flat[pre + 'attn.qkv.weight']).T,
                            'bias': _t(flat[pre + 'attn.qkv.bias'])},
                'out_proj': {'kernel': _t(flat[pre + 'attn.proj.weight']).T,
                             'bias': _t(flat[pre + 'attn.proj.bias'])},
            },
            'ffn': {
                'fc1': {'kernel': _t(flat[pre + 'mlp.fc1.weight']).T,
                        'bias': _t(flat[pre + 'mlp.fc1.bias'])},
                'fc2': {'kernel': _t(flat[pre + 'mlp.fc2.weight']).T,
                        'bias': _t(flat[pre + 'mlp.fc2.bias'])},
            },
        }
        i += 1
    return {'params': p}


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--src', required=True,
                        help='timm .pth/.bin state dict')
    parser.add_argument('--out', required=True, help='output .npz')
    parser.add_argument('--img-size', type=int, default=512)
    parser.add_argument('--patch-size', type=int, default=16)
    args = parser.parse_args()
    import torch

    from semivl_tpu.tools.convert_clip_weights import save_flax_npz
    sd = torch.load(args.src, map_location='cpu', weights_only=False)
    if 'model' in sd and isinstance(sd['model'], dict):
        sd = sd['model']
    flat = {k: v.float().numpy() for k, v in sd.items()
            if hasattr(v, 'numpy')}
    g = args.img_size // args.patch_size
    variables = convert_timm_vit(flat, grid=(g, g))
    save_flax_npz(args.out, variables)
    print(f'wrote {args.out} (grid {g}x{g})')


if __name__ == '__main__':
    main()
