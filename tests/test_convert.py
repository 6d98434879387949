"""CLIP weight converter tests: OpenAI layout -> Flax, end-to-end parity."""

import numpy as np
import torch

import jax.numpy as jnp

from semivl_tpu.tools.convert_clip_weights import (
    _flatten,
    _unflatten,
    convert_openai_visual,
    load_flax_npz,
    mmseg_flat_to_flax,
    resize_pos_embed,
    save_flax_npz,
)

from test_clip_vit import (
    CLIP_DIM,
    EMB,
    IMG,
    LAYERS,
    PATCH,
    TorchViT,
    _flax_model,
)


def _openai_state_dict(tm):
    """Pack the TorchViT weights in OpenAI CLIP ``visual.*`` naming."""
    sd = {
        'visual.class_embedding': tm.cls_token.detach()[0, 0],
        'visual.positional_embedding': tm.pos_embed.detach()[0],
        'visual.conv1.weight': tm.patch.weight.detach(),
        'visual.ln_pre.weight': tm.ln0.weight.detach(),
        'visual.ln_pre.bias': tm.ln0.bias.detach(),
        'visual.ln_post.weight': tm.ln1f.weight.detach(),
        'visual.ln_post.bias': tm.ln1f.bias.detach(),
        'visual.proj': tm.proj.weight.detach().T,  # (in, out) CLIP layout
    }
    for i, blk in enumerate(tm.blocks):
        pre = f'visual.transformer.resblocks.{i}.'
        sd[pre + 'ln_1.weight'] = blk.ln1.weight.detach()
        sd[pre + 'ln_1.bias'] = blk.ln1.bias.detach()
        sd[pre + 'ln_2.weight'] = blk.ln2.weight.detach()
        sd[pre + 'ln_2.bias'] = blk.ln2.bias.detach()
        sd[pre + 'attn.in_proj_weight'] = blk.attn.in_proj_weight.detach()
        sd[pre + 'attn.in_proj_bias'] = blk.attn.in_proj_bias.detach()
        sd[pre + 'attn.out_proj.weight'] = blk.attn.out_proj.weight.detach()
        sd[pre + 'attn.out_proj.bias'] = blk.attn.out_proj.bias.detach()
        sd[pre + 'mlp.c_fc.weight'] = blk.fc1.weight.detach()
        sd[pre + 'mlp.c_fc.bias'] = blk.fc1.bias.detach()
        sd[pre + 'mlp.c_proj.weight'] = blk.fc2.weight.detach()
        sd[pre + 'mlp.c_proj.bias'] = blk.fc2.bias.detach()
    return {k: np.asarray(v) for k, v in sd.items()}


def test_convert_openai_end_to_end(rng):
    torch.manual_seed(7)
    out_indices = [0, LAYERS]
    tm = TorchViT(out_indices).eval()

    flat = convert_openai_visual(_openai_state_dict(tm))
    params = {'params': mmseg_flat_to_flax(flat, num_layers=LAYERS)}

    img = rng.randn(1, IMG, IMG, 3).astype(np.float32)
    with torch.no_grad():
        t_feats, t_g = tm(torch.from_numpy(img).permute(0, 3, 1, 2))
    out = _flax_model(out_indices).apply(params, jnp.asarray(img))
    for got, want in zip(out['feats'], t_feats):
        np.testing.assert_allclose(np.asarray(got), want.numpy(),
                                   rtol=1e-3, atol=3e-4)
    np.testing.assert_allclose(np.asarray(out['global_emb']), t_g.numpy(),
                               rtol=1e-3, atol=3e-4)


def test_npz_roundtrip(tmp_path, rng):
    tree = {'a': {'b': rng.randn(3, 4).astype(np.float32)},
            'c': rng.randn(2).astype(np.float32)}
    path = str(tmp_path / 'w.npz')
    save_flax_npz(path, tree)
    back = load_flax_npz(path)
    np.testing.assert_array_equal(back['a']['b'], tree['a']['b'])
    np.testing.assert_array_equal(back['c'], tree['c'])
    assert _unflatten(_flatten(tree)).keys() == tree.keys()


def test_resize_pos_embed(rng):
    pos = rng.randn(1, 1 + 14 * 14, 8).astype(np.float32)
    out = resize_pos_embed(pos, 1 + 32 * 32)
    assert out.shape == (1, 1 + 32 * 32, 8)
    np.testing.assert_array_equal(out[:, 0], pos[:, 0])  # cls kept
    same = resize_pos_embed(pos, pos.shape[1])
    np.testing.assert_array_equal(same, pos)
