"""ZegCLIP path tests: VPT ViT contract, ATM head, SegLossPlus, and the
mmseg-criterion semivl train step."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F
from jax.sharding import Mesh

from semivl_tpu.losses.seg_loss_plus import seg_loss_plus
from semivl_tpu.models.atm_head import ATMSingleHeadSeg
from semivl_tpu.models.builder import ModelBundle
from semivl_tpu.models.vlm import VLM
from semivl_tpu.models.zegclip_vit import VPTCLIPVisionTransformer

W, LAYERS, HEADS, PATCH, OUT = 32, 2, 4, 16, 16
N_CLS, IMG = 5, 64


def _vpt_cfg():
    return dict(type='VPTCLIPVisionTransformer', input_resolution=IMG,
                patch_size=PATCH, width=W, layers=LAYERS, heads=HEADS,
                output_dim=OUT, num_tokens=3, prompt_dim=W,
                total_d_layer=LAYERS - 1, out_indices=[LAYERS - 1])


@pytest.mark.slow
def test_vpt_vit_contract(rng):
    m = VPTCLIPVisionTransformer(
        input_resolution=IMG, patch_size=PATCH, width=W, layers=LAYERS,
        heads=HEADS, output_dim=OUT, num_tokens=3,
        prompt_dim=W, total_d_layer=LAYERS - 1, out_indices=(LAYERS - 1,))
    x = jnp.asarray(rng.randn(2, IMG, IMG, 3), jnp.float32)
    variables = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(variables, x)
    assert len(out['feats']) == 1
    assert out['feats'][0].shape == (2, 4, 4, OUT)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(out['feats'][0]), axis=-1), 1.0, atol=1e-5)
    assert out['global_emb'].shape == (2, OUT)
    # prompt params carry 'prompt' in their path (freeze exclude_keys)
    names = list(variables['params'].keys())
    assert any('prompt' in n for n in names)


@pytest.mark.slow
def test_atm_head_shapes(rng):
    head = ATMSingleHeadSeg(img_size=IMG, num_classes=N_CLS, in_channels=OUT,
                            embed_dims=OUT, num_layers=2, num_heads=2,
                            use_stages=1, use_proj=False, use_rd=True)
    feats = (jnp.asarray(rng.randn(2, 4, 4, OUT), jnp.float32),)
    text = jnp.asarray(rng.randn(N_CLS, OUT), jnp.float32)
    g = jnp.asarray(rng.randn(2, OUT), jnp.float32)
    variables = head.init(jax.random.PRNGKey(0), feats, text, global_emb=g)
    pred = head.apply(variables, feats, text, global_emb=g)
    assert pred.shape == (2, N_CLS, IMG, IMG)
    pred2, aux = head.apply(variables, feats, text, global_emb=g,
                            return_aux=True)
    assert len(aux) == 2 and aux[0].shape == (2, N_CLS, 4, 4)


def test_seg_loss_plus_vs_torch_reference(rng):
    """Check focal+dice numerics against a literal torch implementation of
    the reference criterion on a case with identity matching."""
    B, C, H = 2, 4, 8
    pred = rng.randn(B, C, H, H).astype(np.float32)
    labels = rng.randint(0, C, (B, H, H)).astype(np.int32)
    labels[0, :2, :2] = 255

    got = float(seg_loss_plus(jnp.asarray(pred), jnp.asarray(labels), C))

    # torch reference (atm_criterion.py math, identity indices)
    tp = torch.from_numpy(pred)
    tl = torch.from_numpy(labels.astype(np.int64))
    num_masks = 0
    tgt_full = torch.zeros(B, C, H * H)
    present = torch.zeros(B, C, dtype=torch.bool)
    for b in range(B):
        flat = tl[b].reshape(-1)
        keep = flat != 255
        idx = torch.arange(H * H)[keep]
        tgt_full[b, flat[keep], idx] = 1
        for c in flat[keep].unique():
            present[b, c] = True
            num_masks += 1
    num_masks = max(num_masks, 1)
    src = tp.reshape(B * C, -1)
    tgt = tgt_full.reshape(B * C, -1)
    ce = F.binary_cross_entropy_with_logits(src, tgt, reduction='none')
    prob = src.sigmoid()
    p_t = prob * tgt + (1 - prob) * (1 - tgt)
    focal = (0.25 * tgt + 0.75 * (1 - tgt)) * ce * (1 - p_t) ** 2
    focal = focal.mean(1).sum() / num_masks
    dice_total = 0.0
    for b in range(B):
        for c in range(C):
            if not present[b, c]:
                continue
            s = tp[b, c].reshape(-1).sigmoid()
            t = (tl[b] == c).float().reshape(-1)
            dice_total += 1 - (2 * (s * t).sum() + 1) / (s.sum() + t.sum() + 1)
    want = float(20.0 * focal + dice_total / num_masks)
    np.testing.assert_allclose(got, want, rtol=1e-4)


@pytest.mark.slow
def test_zegclip_semivl_step(rng):
    """Full semivl step with criterion 'mmseg' (SegLossPlus) on the mesh."""
    from semivl_tpu.train.optim import build_optimizer
    from semivl_tpu.train.step import (
        TrainState, make_semivl_train_step, replicate, shard_batch)

    head_cfg = dict(type='ATMSingleHeadSeg', img_size=IMG,
                    num_classes=N_CLS, in_channels=OUT, embed_dims=OUT,
                    num_layers=2, num_heads=2, use_stages=1, use_proj=False,
                    use_rd=True, align_corners=False, text_embedding_name='')
    module = VLM(backbone_cfg=_vpt_cfg(), decode_head_cfg=head_cfg)
    text = rng.randn(N_CLS, OUT).astype(np.float32)
    bundle = ModelBundle(module=module, text_feats=text, mcc_text_feats=None,
                         num_classes=N_CLS, img_size=IMG, model_cfg={},
                         freeze_backbone=True, exclude_keys=['prompt'])
    variables = module.init(
        {'params': jax.random.PRNGKey(0), 'fp': jax.random.PRNGKey(1)},
        jnp.zeros((1, IMG, IMG, 3)), jnp.asarray(text),
        method='init_variables')

    cfg = dict(conf_mode='pixelwise', conf_thresh=0.95, use_fp=True,
               criterion=dict(name='mmseg'), criterion_u='mmseg', nclass=N_CLS,
               maskclip_consistency_lambda=0, fp_rate=0.5,
               optimizer=dict(type='AdamW', lr=1e-4, weight_decay=0.01,
                              paramwise_cfg=dict(custom_keys={
                                  'backbone': dict(lr_mult=10.0),
                                  'head': dict(lr_mult=10.)})),
               warmup_iters=0, warmup_ratio=1e-6)
    tx, _, mask = build_optimizer(cfg, variables['params'], total_iters=10,
                                  freeze_backbone=True,
                                  exclude_keys=['prompt'])
    # prompts trainable, rest of backbone frozen
    assert mask['backbone']['prompt_embeddings']
    assert not mask['backbone']['layers_0']['attn']['in_proj']['kernel']

    state = TrainState(params=variables,
                       opt_state=tx.init(variables['params']),
                       step=jnp.zeros((), jnp.int32))
    mesh = Mesh(np.array(jax.devices()[:8]), ('data',))
    step_fn = make_semivl_train_step(bundle, cfg, tx, mesh, total_iters=10,
                                     trainable_mask=mask)

    def imgs():
        return rng.randn(8, IMG, IMG, 3).astype(np.float32)

    boxes = np.zeros((8, IMG, IMG), np.float32)
    boxes[:, 8:30, 8:40] = 1
    ign = np.zeros((8, IMG, IMG), np.int32)
    batch = shard_batch(dict(
        img_x=imgs(),
        mask_x=rng.randint(0, N_CLS, (8, IMG, IMG)).astype(np.int32),
        img_w=imgs(), img_s1=imgs(), img_s2=imgs(), ignore_mask=ign,
        cutmix_box1=boxes, cutmix_box2=boxes,
        img_w_other=imgs(), img_s1_other=imgs(), img_s2_other=imgs(),
        ignore_mask_other=ign), mesh)
    new_state, metrics = step_fn(replicate(state, mesh), batch,
                                 replicate(jax.random.PRNGKey(0), mesh))
    assert np.isfinite(np.asarray(metrics['loss_all']))
    assert int(np.asarray(new_state.step)) == 1


def test_promptless_clip_vit(rng):
    from semivl_tpu.models.zegclip_vit import CLIPVisionTransformer
    for embed_v in (False, True):
        m = CLIPVisionTransformer(
            input_resolution=IMG, patch_size=PATCH, width=W, layers=LAYERS,
            heads=HEADS, output_dim=OUT, out_indices=(LAYERS - 1,),
            embed_v=embed_v)
        x = jnp.asarray(rng.randn(1, IMG, IMG, 3), jnp.float32)
        variables = m.init(jax.random.PRNGKey(0), x)
        out = m.apply(variables, x)
        assert out['feats'][0].shape == (1, 4, 4, OUT)
        assert out['global_emb'].shape == (1, OUT)


def test_ohem_matches_reference_semantics(rng):
    """ohem_cross_entropy vs a literal torch ProbOhemCrossEntropy2d
    (reference third_party/unimatch/util/ohem.py:28-57)."""
    from semivl_tpu.losses.ce import ohem_cross_entropy

    B, C, H = 2, 6, 12
    pred = rng.randn(B, C, H, H).astype(np.float32)
    target = rng.randint(0, C, (B, H, H)).astype(np.int64)
    target[0, :3] = 255

    for min_kept in (10, 50, 10_000):
        got = float(ohem_cross_entropy(
            jnp.asarray(pred), jnp.asarray(target.astype(np.int32)),
            thresh=0.7, min_kept=min_kept))

        tp = torch.from_numpy(pred)
        tt = torch.from_numpy(target).view(-1)
        valid = tt.ne(255)
        t0 = tt * valid.long()
        prob = F.softmax(tp, dim=1).permute(1, 0, 2, 3).reshape(C, -1)
        tgt_out = tt.clone()
        if min_kept <= valid.sum():
            prob = prob.masked_fill(~valid, 1)
            mask_prob = prob[t0, torch.arange(len(t0))]
            threshold = 0.7
            index = mask_prob.argsort()
            threshold_index = index[min(len(index), min_kept) - 1]
            if mask_prob[threshold_index] > 0.7:
                threshold = mask_prob[threshold_index]
            kept = mask_prob.le(threshold)
            tgt_out = torch.where(valid & kept, tt, torch.tensor(255))
        want = float(F.cross_entropy(
            tp, tgt_out.view(B, H, H), ignore_index=255))
        np.testing.assert_allclose(got, want, rtol=1e-4, err_msg=str(min_kept))


def test_ohem_use_weight_matches_torch(rng):
    """use_weight=True branch (reference ohem.py:17-23): the 19-entry
    Cityscapes table feeds a weighted CrossEntropyLoss whose 'mean' divides
    by summed kept-pixel weights."""
    from semivl_tpu.losses.ce import CITYSCAPES_OHEM_WEIGHT, ohem_cross_entropy

    B, C, H = 2, 19, 12
    pred = rng.randn(B, C, H, H).astype(np.float32)
    target = rng.randint(0, C, (B, H, H)).astype(np.int64)
    target[1, 5:] = 255

    for min_kept in (25, 10_000):
        got = float(ohem_cross_entropy(
            jnp.asarray(pred), jnp.asarray(target.astype(np.int32)),
            thresh=0.7, min_kept=min_kept,
            weight=CITYSCAPES_OHEM_WEIGHT))

        tp = torch.from_numpy(pred)
        tt = torch.from_numpy(target).view(-1)
        valid = tt.ne(255)
        t0 = tt * valid.long()
        tgt_out = tt.clone()
        if min_kept <= valid.sum():
            prob = F.softmax(tp, dim=1).permute(1, 0, 2, 3).reshape(C, -1)
            prob = prob.masked_fill(~valid, 1)
            mask_prob = prob[t0, torch.arange(len(t0))]
            threshold = 0.7
            index = mask_prob.argsort()
            threshold_index = index[min(len(index), min_kept) - 1]
            if mask_prob[threshold_index] > 0.7:
                threshold = mask_prob[threshold_index]
            kept = mask_prob.le(threshold)
            tgt_out = torch.where(valid & kept, tt, torch.tensor(255))
        want = float(F.cross_entropy(
            tp, tgt_out.view(B, H, H), ignore_index=255,
            weight=torch.tensor(CITYSCAPES_OHEM_WEIGHT)))
        np.testing.assert_allclose(got, want, rtol=1e-4, err_msg=str(min_kept))
