#!/usr/bin/env python
"""CLIP ViT-B/16 checkpoint conversion: PyTorch -> Flax param tree.

Handles both source layouts:

- raw OpenAI CLIP checkpoints (``visual.*`` keys; jit archive or plain
  state_dict), the input of the reference's converter
  (third_party/maskclip/convert_clip_weights.py:13-91);
- the reference's converted ``clip2mmseg_ViT16_clip_backbone.pth`` layout
  (cls_token / pos_embed / patch_embed.projection / ln0 / ln1 /
  layers.N.{ln1,ln2,attn.attn,ffn.layers} / proj) so released SemiVL
  checkpoints remain loadable.

The positional embedding is bicubic-resized (PyTorch-parity kernel) to the
model's grid at load time (reference maskclip_vit.py:392-403), and the CLIP
visual projection becomes a bias-free Dense kernel.

CLI:
    python -m semivl_tpu.tools.convert_clip_weights \
        --src pretrained/ViT-B-16.pt --out pretrained/clip_vitb16.npz
"""

import argparse

import numpy as np


def _t(w):
    return np.asarray(w, dtype=np.float32)


def convert_openai_visual(sd):
    """OpenAI CLIP ``visual.*`` state_dict -> mmseg-style flat dict
    (the same key layout the reference converter produces)."""
    out = {}
    for key, val in sd.items():
        if not key.startswith('visual.'):
            continue
        k = key[len('visual.'):]
        if k == 'proj':
            out['proj.weight'] = _t(val).T  # (768,512) -> (512,768)
        elif k == 'class_embedding':
            out['cls_token'] = _t(val)[None, None, :]
        elif k == 'positional_embedding':
            out['pos_embed'] = _t(val)[None]
        elif k == 'conv1.weight':
            out['patch_embed.projection.weight'] = _t(val)
        elif k.startswith('ln_pre'):
            out[k.replace('ln_pre', 'ln0')] = _t(val)
        elif k.startswith('ln_post'):
            out[k.replace('ln_post', 'ln1')] = _t(val)
        elif k.startswith('transformer.resblocks.'):
            nk = 'layers.' + k[len('transformer.resblocks.'):]
            nk = (nk.replace('mlp.c_fc', 'ffn.layers.0.0')
                    .replace('mlp.c_proj', 'ffn.layers.1'))
            if '.attn.' in nk:
                nk = nk.replace('.attn.', '.attn.attn.')
            else:
                nk = nk.replace('.ln_', '.ln')
            out[nk] = _t(val)
    return out


def mmseg_flat_to_flax(flat, num_layers=12):
    """mmseg-style flat dict -> nested Flax params for MaskClipViT."""
    p = {}
    p['cls_token'] = flat['cls_token']
    p['pos_embed'] = flat['pos_embed']
    p['patch_embed'] = {
        'kernel': flat['patch_embed.projection.weight'].transpose(2, 3, 1, 0)}
    for ln in ('ln0', 'ln1'):
        if f'{ln}.weight' in flat:
            p[ln] = {'scale': flat[f'{ln}.weight'],
                     'bias': flat[f'{ln}.bias']}
    if 'proj.weight' in flat:
        w = flat['proj.weight']
        if w.ndim == 4:  # reference stores as 1x1 conv (512,768,1,1)
            w = w[:, :, 0, 0]
        p['proj'] = {'kernel': w.T}  # (512,768) -> (768,512)
    for i in range(num_layers):
        pre = f'layers.{i}.'
        blk = {
            'ln1': {'scale': flat[pre + 'ln1.weight'],
                    'bias': flat[pre + 'ln1.bias']},
            'ln2': {'scale': flat[pre + 'ln2.weight'],
                    'bias': flat[pre + 'ln2.bias']},
            'attn': {
                'in_proj': {
                    'kernel': flat[pre + 'attn.attn.in_proj_weight'].T,
                    'bias': flat[pre + 'attn.attn.in_proj_bias']},
                'out_proj': {
                    'kernel': flat[pre + 'attn.attn.out_proj.weight'].T,
                    'bias': flat[pre + 'attn.attn.out_proj.bias']},
            },
            'ffn': {
                'fc1': {'kernel': flat[pre + 'ffn.layers.0.0.weight'].T,
                        'bias': flat[pre + 'ffn.layers.0.0.bias']},
                'fc2': {'kernel': flat[pre + 'ffn.layers.1.weight'].T,
                        'bias': flat[pre + 'ffn.layers.1.bias']},
            },
        }
        p[f'layers_{i}'] = blk
    return p


def resize_pos_embed(pos_embed, target_len):
    """Bicubic-resize a (1, 1+P, C) pos embed to (1, target_len, C)
    (reference maskclip_vit.py:392-403; PyTorch-parity kernel)."""
    if pos_embed.shape[1] == target_len:
        return pos_embed
    from semivl_tpu.ops.resize import resize_longer_matrix
    old = int(round((pos_embed.shape[1] - 1) ** 0.5))
    new = int(round((target_len - 1) ** 0.5))
    assert old * old + 1 == pos_embed.shape[1], pos_embed.shape
    assert new * new + 1 == target_len, target_len
    import jax.numpy as jnp
    out = resize_longer_matrix(jnp.asarray(pos_embed), (new, new), (old, old))
    return np.asarray(out)


def _flatten(tree, prefix=''):
    flat = {}
    for k, v in tree.items():
        key = f'{prefix}/{k}' if prefix else k
        if isinstance(v, dict):
            flat.update(_flatten(v, key))
        else:
            flat[key] = np.asarray(v)
    return flat


def _unflatten(flat):
    tree = {}
    for key, v in flat.items():
        parts = key.split('/')
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def save_flax_npz(path, tree):
    np.savez(path, **_flatten(tree))


def load_flax_npz(path):
    with np.load(path) as f:
        return _unflatten({k: f[k] for k in f.files})


def load_torch_checkpoint(path):
    """Load a torch .pt/.pth (plain or jit archive) -> flat numpy dict."""
    import torch
    try:
        model = torch.jit.load(path, map_location='cpu')
        sd = model.state_dict()
    except Exception:
        ckpt = torch.load(path, map_location='cpu', weights_only=False)
        sd = ckpt.get('state_dict', ckpt)
    return {k: v.float().numpy() if hasattr(v, 'numpy') else v
            for k, v in sd.items()}


def convert_openai_text(sd, num_layers=12):
    """OpenAI CLIP text-tower state dict -> CLIPTextTransformer params."""
    p = {
        'token_embedding': _t(sd['token_embedding.weight']),
        'positional_embedding': _t(sd['positional_embedding']),
        'ln_final': {'scale': _t(sd['ln_final.weight']),
                     'bias': _t(sd['ln_final.bias'])},
        'text_projection': _t(sd['text_projection']),
    }
    for i in range(num_layers):
        pre = f'transformer.resblocks.{i}.'
        p[f'layers_{i}_ln1'] = {'scale': _t(sd[pre + 'ln_1.weight']),
                                'bias': _t(sd[pre + 'ln_1.bias'])}
        p[f'layers_{i}_ln2'] = {'scale': _t(sd[pre + 'ln_2.weight']),
                                'bias': _t(sd[pre + 'ln_2.bias'])}
        p[f'layers_{i}_attn'] = {
            'in_proj': {'kernel': _t(sd[pre + 'attn.in_proj_weight']).T,
                        'bias': _t(sd[pre + 'attn.in_proj_bias'])},
            'out_proj': {'kernel': _t(sd[pre + 'attn.out_proj.weight']).T,
                         'bias': _t(sd[pre + 'attn.out_proj.bias'])},
        }
        p[f'layers_{i}_ffn'] = {
            'fc1': {'kernel': _t(sd[pre + 'mlp.c_fc.weight']).T,
                    'bias': _t(sd[pre + 'mlp.c_fc.bias'])},
            'fc2': {'kernel': _t(sd[pre + 'mlp.c_proj.weight']).T,
                    'bias': _t(sd[pre + 'mlp.c_proj.bias'])},
        }
    return p


def convert(src_path, out_path, text_out_path=None):
    sd = load_torch_checkpoint(src_path)
    if any(k.startswith('visual.') for k in sd):
        flat = convert_openai_visual(sd)
        if text_out_path and 'text_projection' in sd:
            save_flax_npz(text_out_path, convert_openai_text(sd))
    else:
        flat = {k.replace('backbone.', ''): np.asarray(v, np.float32)
                for k, v in sd.items()}
    tree = mmseg_flat_to_flax(flat)
    save_flax_npz(out_path, tree)
    return tree


def load_pretrained_into(variables, path, bundle=None):
    """Insert a converted backbone tree into model variables, resizing the
    pos embed per scope; the frozen guidance encoder (``clip_encoder``)
    receives the same weights (reference mcvit16.py uses the same ckpt)."""
    tree = load_flax_npz(path) if isinstance(path, str) else path
    params = dict(variables['params'])
    for scope in ('backbone', 'clip_encoder'):
        if scope not in params:
            continue
        tgt = params[scope]
        src = {k: v for k, v in tree.items()}
        src['pos_embed'] = resize_pos_embed(
            src['pos_embed'], tgt['pos_embed'].shape[1])
        # sanity: shapes must line up
        import jax
        jax.tree.map(lambda a, b: None if a.shape == b.shape else
                     (_ for _ in ()).throw(
                         ValueError(f'{scope}: {a.shape} vs {b.shape}')),
                     tgt, src)
        params[scope] = jax.tree.map(
            lambda a, b: np.asarray(b, dtype=a.dtype), tgt, src)
    return {**variables, 'params': params}


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--src', required=True,
                        help='OpenAI CLIP .pt or clip2mmseg .pth')
    parser.add_argument('--out', required=True, help='output .npz')
    parser.add_argument('--text-out', default=None,
                        help='also dump text-encoder params .npz')
    args = parser.parse_args()
    tree = convert(args.src, args.out, text_out_path=args.text_out)
    n = sum(int(np.prod(v.shape)) for v in _flatten(tree).values())
    print(f'wrote {args.out} ({n / 1e6:.1f}M params)')


if __name__ == '__main__':
    main()
