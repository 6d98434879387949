"""Tools tests: reference-checkpoint conversion structure, plotting, code
archive."""

import os

import numpy as np
import pytest

from semivl_tpu.tools.convert_reference_ckpt import convert_vlm_checkpoint
from semivl_tpu.utils.code_archive import gen_code_archive
from semivl_tpu.utils.plotting import colorize_label, denormalize_image


def _reference_flat_state(num_layers=2, emb=32, clip_dim=16, vlg_ch=32,
                          text_ch=32, grid=4, n_skip=2, skip_in=32,
                          skip_ch=(16, 16), up_ch=(32, 16)):
    """Build a fake reference-named state dict with consistent shapes."""
    f = {}

    def add(k, *shape):
        f[k] = np.random.RandomState(0).randn(*shape).astype(np.float32)

    add('backbone.cls_token', 1, 1, emb)
    add('backbone.pos_embed', 1, grid * grid + 1, emb)
    add('backbone.patch_embed.projection.weight', emb, 3, 16, 16)
    for ln in ('ln0', 'ln1'):
        add(f'backbone.{ln}.weight', emb)
        add(f'backbone.{ln}.bias', emb)
    add('backbone.proj.weight', clip_dim, emb, 1, 1)
    for i in range(num_layers):
        p = f'backbone.layers.{i}.'
        add(p + 'ln1.weight', emb)
        add(p + 'ln1.bias', emb)
        add(p + 'ln2.weight', emb)
        add(p + 'ln2.bias', emb)
        add(p + 'attn.attn.in_proj_weight', 3 * emb, emb)
        add(p + 'attn.attn.in_proj_bias', 3 * emb)
        add(p + 'attn.attn.out_proj.weight', emb, emb)
        add(p + 'attn.attn.out_proj.bias', emb)
        add(p + 'ffn.layers.0.0.weight', 2 * emb, emb)
        add(p + 'ffn.layers.0.0.bias', 2 * emb)
        add(p + 'ffn.layers.1.weight', emb, 2 * emb)
        add(p + 'ffn.layers.1.bias', emb)

    d = 'decode_head.'
    add(d + 'conv1.weight', vlg_ch, 1, 3, 3)
    add(d + 'conv1.bias', vlg_ch)
    for i in range(4):
        add(f'{d}aspp.aspp_convs.{i}.0.weight', vlg_ch, vlg_ch,
            1 if i == 0 else 3, 1 if i == 0 else 3)
        add(f'{d}aspp.aspp_convs.{i}.1.weight', vlg_ch)
        add(f'{d}aspp.aspp_convs.{i}.1.bias', vlg_ch)
    add(d + 'aspp.aspp_convs.4.gap.1.weight', vlg_ch, vlg_ch, 1, 1)
    add(d + 'aspp.aspp_convs.4.gap.2.weight', vlg_ch)
    add(d + 'aspp.aspp_convs.4.gap.2.bias', vlg_ch)
    add(d + 'aspp.project.0.weight', vlg_ch, 5 * vlg_ch, 1, 1)
    add(d + 'aspp.project.1.weight', vlg_ch)
    add(d + 'aspp.project.1.bias', vlg_ch)
    dim = vlg_ch + text_ch
    for i in range(1):
        p = f'{d}layers.{i}.transformer.'
        add(p + 'ln1.weight', dim)
        add(p + 'ln1.bias', dim)
        add(p + 'ln2.weight', dim)
        add(p + 'ln2.bias', dim)
        add(p + 'attn.attn.in_proj_weight', 3 * dim, dim)
        add(p + 'attn.attn.in_proj_bias', 3 * dim)
        add(p + 'attn.attn.out_proj.weight', dim, dim)
        add(p + 'attn.attn.out_proj.bias', dim)
        add(p + 'ffn.layers.0.0.weight', 4 * vlg_ch, dim)
        add(p + 'ffn.layers.0.0.bias', 4 * vlg_ch)
        add(p + 'ffn.layers.1.weight', dim, 4 * vlg_ch)
        add(p + 'ffn.layers.1.bias', dim)
    add(d + 'text_proj.0.weight', text_ch, clip_dim)
    add(d + 'text_proj.0.bias', text_ch)
    for i in range(n_skip):
        add(f'{d}skip_proj.{i}.0.weight', skip_ch[i], skip_in, 3, 3)
        add(f'{d}skip_proj.{i}.0.bias', skip_ch[i])
    add(d + 'up1.up.weight', vlg_ch, vlg_ch - skip_ch[0], 2, 2)
    add(d + 'up1.up.bias', vlg_ch - skip_ch[0])
    add(d + 'up1.conv.0.weight', up_ch[0], vlg_ch, 3, 3)
    add(d + 'up1.conv.1.weight', up_ch[0])
    add(d + 'up1.conv.1.bias', up_ch[0])
    add(d + 'up1.conv.3.weight', up_ch[0], up_ch[0], 3, 3)
    add(d + 'up1.conv.4.weight', up_ch[0])
    add(d + 'up1.conv.4.bias', up_ch[0])
    add(d + 'up2.up.weight', up_ch[0], up_ch[0] - skip_ch[1], 2, 2)
    add(d + 'up2.up.bias', up_ch[0] - skip_ch[1])
    add(d + 'up2.conv.0.weight', up_ch[1], up_ch[0], 3, 3)
    add(d + 'up2.conv.1.weight', up_ch[1])
    add(d + 'up2.conv.1.bias', up_ch[1])
    add(d + 'up2.conv.3.weight', up_ch[1], up_ch[1], 3, 3)
    add(d + 'up2.conv.4.weight', up_ch[1])
    add(d + 'up2.conv.4.bias', up_ch[1])
    add(d + 'head.weight', 1, up_ch[1], 3, 3)
    add(d + 'head.bias', 1)
    return f


def test_reference_ckpt_converts_to_our_tree():
    """Converted tree must match the tiny VLM's init structure exactly."""
    import jax
    import jax.numpy as jnp
    from tiny_model import tiny_bundle

    flat = _reference_flat_state()
    variables = convert_vlm_checkpoint(flat, num_layers=2, vlg_layers=1,
                                       num_skips=2)

    bundle = tiny_bundle(with_mcc=False)
    target = jax.eval_shape(
        lambda: bundle.module.init(
            {'params': jax.random.PRNGKey(0), 'fp': jax.random.PRNGKey(1)},
            jnp.zeros((1, 64, 64, 3)), jnp.zeros((21, 16)),
            method='init_variables'))

    tgt_paths = {
        '/'.join(str(getattr(k, 'key', k)) for k in path): leaf.shape
        for path, leaf in jax.tree_util.tree_flatten_with_path(
            target['params'])[0]}
    got_paths = {
        '/'.join(str(getattr(k, 'key', k)) for k in path): leaf.shape
        for path, leaf in jax.tree_util.tree_flatten_with_path(
            variables['params'])[0]}
    assert set(got_paths) == set(tgt_paths), (
        set(tgt_paths) - set(got_paths), set(got_paths) - set(tgt_paths))
    for k, shape in tgt_paths.items():
        assert got_paths[k] == shape, (k, got_paths[k], shape)


def test_plot_helpers(rng):
    img = rng.randn(8, 8, 3).astype(np.float32)
    out = denormalize_image(img)
    assert out.dtype == np.uint8 and out.shape == (8, 8, 3)
    pal = np.zeros((256, 3), np.uint8)
    pal[1] = (255, 0, 0)
    lab = colorize_label(np.array([[0, 1], [255, 1]]), pal)
    assert tuple(lab[0, 1]) == (255, 0, 0)


def test_code_archive(tmp_path):
    archive = gen_code_archive(str(tmp_path))
    assert os.path.getsize(archive) > 10000
    import tarfile
    with tarfile.open(archive) as tar:
        names = tar.getnames()
    assert any(n.endswith('semivl_tpu/models/vlm.py') for n in names)
    # the bundled data assets (splits .txt etc.) are excluded
    assert not any(n.startswith('semivl_tpu/assets') for n in names)


def test_pseudo_label_quality_smoke(tmp_path):
    """run_seed returns the per-branch precision/coverage structure with
    finite teacher stats and in-range coverages (fast: tiny warmup)."""
    from semivl_tpu.tools.pseudo_label_quality import THRESHOLDS, run_seed
    res = run_seed(str(tmp_path), seed=0, warmup_steps=4)
    for branch in ('teacher', 'mcc', 'teacher_unseen', 'mcc_unseen'):
        assert set(res[branch]) == set(THRESHOLDS)
    prec0, cov0 = res['teacher'][0.0]
    assert np.isfinite(prec0) and cov0 == 1.0
    # coverage is non-increasing in threshold
    covs = [res['mcc'][t][1] for t in THRESHOLDS]
    assert all(b <= a + 1e-6 for a, b in zip(covs, covs[1:]))
    assert 0.0 < res['chance'] < 1.0


def test_per_geometry_denominators():
    """tools/reference_denominator: the VOC mid scenario must reproduce the
    adopted 5.8 imgs/sec/A100 denominator (docs/reference_denominator.md),
    and every geometry yields a sane ordered bracket."""
    from semivl_tpu.tools.reference_denominator import (
        GEOMETRIES, denominators)
    voc = denominators('pascal')
    assert abs(voc['mid'] - 5.8) < 0.15, voc
    assert abs(voc['generous'] - 9.6) < 0.5, voc
    for ds in GEOMETRIES:
        r = denominators(ds)
        assert r['conservative'] < r['mid'] < r['generous'], r
        # analytic encoder formula reproduces the 222 GF/img figure at 512
        if r['crop'] == 512:
            from semivl_tpu.tools.reference_denominator import (
                encoder_fwd_gflop_per_img)
            assert abs(encoder_fwd_gflop_per_img(512) - 222) < 5


def test_cutmix_interaction_smoke(tmp_path):
    """pseudo_label_quality's cutmix section: the bit-exact label-path
    identity holds and the loss-share structure is well-formed."""
    from semivl_tpu.tools.pseudo_label_quality import THRESHOLDS, run_seed
    res = run_seed(str(tmp_path), seed=0, warmup_steps=4)
    cm = res['cutmix']
    assert cm['identity_ok']
    assert set(cm['region_prec']) == {'inside', 'boundary', 'outside'}
    for t in THRESHOLDS:
        assert 0.0 <= cm['loss_share'][t]['kept_frac'] <= 1.0
    # kept_frac non-increasing in threshold
    ks = [cm['loss_share'][t]['kept_frac'] for t in THRESHOLDS]
    assert all(b <= a + 1e-6 for a, b in zip(ks, ks[1:]))
