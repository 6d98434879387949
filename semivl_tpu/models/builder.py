"""Model factory.

Replaces the reference's mmseg registry + ``build_segmentor`` + monkey-patch
pipeline (model/builder.py:104-159) with an explicit factory: run-config dict
in, ``ModelBundle`` out (Flax module + device-constant text embeddings).
"""

import dataclasses
import os
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from semivl_tpu.configs.models import get_model_config
from semivl_tpu.models.clip_vit import MaskClipViT
from semivl_tpu.models.vlm import VLM
from semivl_tpu.text.embeddings import load_text_embedding, text_embedding_path


def build_backbone(cfg, dtype):
    kind = cfg['type']
    if kind == 'MaskClipVisionTransformer':
        return MaskClipViT(
            img_size=tuple(cfg['img_size']),
            patch_size=cfg.get('patch_size', 16),
            embed_dims=cfg.get('embed_dims', 768),
            num_layers=cfg.get('num_layers', 12),
            num_heads=cfg.get('num_heads', 12),
            mlp_ratio=cfg.get('mlp_ratio', 4),
            out_indices=cfg.get('out_indices'),
            qkv_bias=cfg.get('qkv_bias', True),
            pre_norm=cfg.get('pre_norm', True),
            final_norm=cfg.get('final_norm', True),
            return_clip_embed=cfg.get('return_clip_embed', True),
            return_qkv=cfg.get('return_qkv', True),
            patch_bias=cfg.get('patch_bias', False),
            skip_last_attn=cfg.get('skip_last_attn', False),
            clip_dim=cfg.get('clip_dim', 512),
            norm_eps=cfg.get('norm_eps', 1e-6),
            remat=cfg.get('with_cp', False),
            # GEMM-tiling token pad (clip_vit docstring); env override for
            # bench/A-B measurement without config edits.
            token_pad_to_multiple=int(
                os.environ.get('SEMIVL_TOKEN_PAD_MULTIPLE',
                               cfg.get('token_pad_to_multiple', 1))),
            ln_stat_barrier=bool(int(
                os.environ.get('SEMIVL_LN_STAT_BARRIER',
                               cfg.get('ln_stat_barrier', 0)))),
            gelu_barrier=bool(int(
                os.environ.get('SEMIVL_GELU_BARRIER',
                               cfg.get('gelu_barrier', 1)))),
            dtype=dtype)
    if kind == 'ResNetV1c':
        from semivl_tpu.models.resnet import ResNetV1c
        return ResNetV1c(
            depth=cfg.get('depth', 101),
            num_stages=cfg.get('num_stages', 1),
            out_indices=tuple(cfg.get('out_indices', (0,))),
            dtype=dtype)
    if kind == 'TIMMVisionTransformer':
        from semivl_tpu.models.timm_vit import TIMMVisionTransformer
        return TIMMVisionTransformer(
            img_size=(cfg['img_size'], cfg['img_size']),
            out_indices=tuple(cfg.get('out_indices', (4, 11))),
            drop_path_rate=cfg.get('drop_path_rate', 0.0),
            dtype=dtype)
    if kind == 'VPTCLIPVisionTransformer':
        from semivl_tpu.models.zegclip_vit import VPTCLIPVisionTransformer
        return VPTCLIPVisionTransformer(
            input_resolution=cfg.get('input_resolution', 512),
            patch_size=cfg.get('patch_size', 16),
            width=cfg.get('width', 768),
            layers=cfg.get('layers', 12),
            heads=cfg.get('heads', 12),
            output_dim=cfg.get('output_dim', 512),
            num_tokens=cfg.get('num_tokens', 10),
            prompt_dim=cfg.get('prompt_dim', 768),
            total_d_layer=cfg.get('total_d_layer', 11),
            out_indices=tuple(cfg.get('out_indices', (11,))),
            drop_path_rate=cfg.get('drop_path_rate', 0.0),
            dtype=dtype)
    raise ValueError(f'Unknown backbone type {kind!r}')


def build_head(cfg, dtype):
    kind = cfg['type']
    if kind == 'VLGHead':
        from semivl_tpu.models.vlg_head import VLGHead
        return VLGHead(
            img_size=cfg['img_size'],
            num_classes=cfg['num_classes'],
            text_in_channels=cfg.get('text_in_channels', 512),
            text_channels=cfg.get('text_channels', 128),
            up_channels=tuple(cfg.get('up_channels', (64, 32))),
            skip_in_channels=tuple(cfg.get('skip_in_channels', (768, 768))),
            skip_channels=tuple(cfg.get('skip_channels', (32, 16))),
            skip_from_conv_feat=cfg.get('skip_from_conv_feat', False),
            num_layers=cfg.get('num_layers', 2),
            num_heads=cfg.get('num_heads', 4),
            channels=cfg.get('channels', 128),
            pool_size=tuple(cfg.get('pool_size', (4, 4))),
            conv1_ksize=cfg.get('conv1_ksize', 7),
            align_corners=cfg.get('align_corners', False),
            text_embedding_name=cfg.get('text_embedding_name', ''),
            decoder_kernel=cfg.get('decoder_kernel', 'xla'),
            semantic_impl=os.environ.get(
                'SEMIVL_SEMANTIC_IMPL', cfg.get('semantic_impl', 'einsum')),
            dtype=dtype)
    if kind == 'DLV3PHead':
        from semivl_tpu.models.dlv3p_head import DLV3PHead
        return DLV3PHead(
            img_size=cfg['img_size'],
            num_classes=cfg['num_classes'],
            in_channels=cfg.get('in_channels', 512),
            channels=cfg.get('channels', 256),
            c1_in_channels=cfg.get('c1_in_channels', 768),
            c1_channels=cfg.get('c1_channels', 48),
            dilations=tuple(cfg.get('dilations', (6, 12, 18))),
            align_corners=cfg.get('align_corners', False),
            dtype=dtype)
    if kind == 'ATMSingleHeadSeg':
        from semivl_tpu.models.atm_head import ATMSingleHeadSeg
        return ATMSingleHeadSeg(
            img_size=cfg['img_size'],
            num_classes=cfg['num_classes'],
            in_channels=cfg.get('in_channels', 512),
            embed_dims=cfg.get('embed_dims', 512),
            num_layers=cfg.get('num_layers', 3),
            num_heads=cfg.get('num_heads', 8),
            use_stages=cfg.get('use_stages', 1),
            use_proj=cfg.get('use_proj', True),
            use_rd=cfg.get('use_rd', True),
            align_corners=cfg.get('align_corners', False),
            text_embedding_name=cfg.get('text_embedding_name', ''),
            dtype=dtype)
    raise ValueError(f'Unknown head type {kind!r}')


@dataclasses.dataclass
class ModelBundle:
    """Everything the train/eval loops need about the model."""
    module: Any                       # VLM flax module
    text_feats: np.ndarray            # (N, 512) main decoder embedding
    mcc_text_feats: Optional[np.ndarray]  # guidance embedding or None
    num_classes: int
    img_size: int
    model_cfg: dict                   # resolved architecture config
    freeze_backbone: bool = False
    exclude_keys: Optional[list] = None
    # Same params, decoder routed through the fused Pallas up-stage
    # kernel — for forward-only passes (teacher pseudo-labels, eval).
    # Equals ``module`` when the head has no fused path.
    module_fwd: Any = None

    def __post_init__(self):
        if self.module_fwd is None:
            self.module_fwd = self.module


def build_model(cfg, dtype=jnp.float32):
    """Run-config dict (experiments.py schema) -> ModelBundle.

    Parity with reference model/builder.py:104-159: resolves the named model
    config, overrides num_classes / img_size from the run config, selects
    text embeddings by dataset prefix + variant, injects the frozen guidance
    encoder when the MaskCLIP-consistency loss is on.
    """
    model_type = cfg['model']
    if 'mmseg.' not in model_type and model_type != 'deeplabv3plus':
        raise ValueError(model_type)
    if model_type == 'deeplabv3plus':
        # original UniMatch baseline (reference builder.py:106-107)
        from semivl_tpu.models.deeplabv3plus import DeepLabV3Plus
        module = DeepLabV3Plus(
            num_classes=cfg['nclass'],
            backbone=cfg['backbone'],
            replace_stride_with_dilation=tuple(
                cfg.get('replace_stride_with_dilation',
                        (False, False, True))),
            dilations=tuple(cfg.get('dilations', (6, 12, 18))),
            fp_rate=cfg.get('fp_rate', 0.5),
            dtype=dtype)
        return ModelBundle(
            module=module,
            text_feats=np.zeros((cfg['nclass'], 1), np.float32),  # unused
            mcc_text_feats=None,
            num_classes=cfg['nclass'],
            img_size=cfg['crop_size'],
            model_cfg={'model': {'type': 'DeepLabV3Plus'}},
            freeze_backbone=False,
            exclude_keys=None)

    name = model_type.replace('mmseg.', '')
    mcfg = get_model_config(name, img_size=cfg['crop_size'])
    model = mcfg['model']
    model['decode_head']['num_classes'] = cfg['nclass']

    dataset = cfg['dataset']
    text_variant = cfg['text_embedding_variant']
    mcc_variant = cfg['mcc_text']
    pl_variant = cfg['pl_text']
    # Reference vlm.py:42 requires pseudo-label text == decoder text.
    assert pl_variant == text_variant, (pl_variant, text_variant)

    text_path = text_embedding_path(dataset, text_variant)
    model['decode_head']['text_embedding_name'] = text_path
    text_feats = load_text_embedding(text_path)

    mcc_text_feats = None
    mcc_text_name = ''
    clip_encoder_cfg = None
    if cfg.get('clip_encoder'):
        enc = get_model_config(cfg['clip_encoder'],
                               img_size=(cfg['crop_size']
                                         if cfg.get('mcc_fix_resize_pos')
                                         else 512))
        clip_encoder_cfg = enc['backbone']
        mcc_text_name = text_embedding_path(dataset, mcc_variant)
        mcc_text_feats = load_text_embedding(mcc_text_name)

    model_args = cfg.get('model_args') or {}
    # Dead reference options asserted off (reference vlm.py:43-44).
    assert model_args.get('maskclip_class_filter') is None
    renorm = bool(model_args.get('renorm_clip_img', False))
    if model_args.get('with_cp') or cfg.get('with_cp'):
        model['backbone']['with_cp'] = True

    module = VLM(
        backbone_cfg=model['backbone'],
        decode_head_cfg=model['decode_head'],
        conv_encoder_cfg=model.get('conv_encoder'),
        clip_encoder_cfg=clip_encoder_cfg,
        renorm_clip_img=renorm,
        fp_rate=cfg.get('fp_rate', 0.5),
        mcc_text_embedding_name=mcc_text_name,
        dtype=dtype)

    # Fused polyphase decoder routing (ops/fused_decoder.py). The
    # forward-only variant ('fused_fwd': teacher pass, eval) gates on the
    # forward kernels' VMEM footprint; the training module ('fused')
    # additionally requires the backward kernels to fit — vlg_head falls
    # back to XLA per-geometry either way. 'auto' enables on TPU only
    # (the kernels interpret on CPU).
    fwd_kernel = cfg.get('decoder_fwd_kernel', 'auto')
    if fwd_kernel == 'auto':
        fwd_kernel = 'fused' if jax.default_backend() == 'tpu' else 'xla'
    module_fwd = None
    if fwd_kernel == 'fused' and model['decode_head']['type'] == 'VLGHead':
        module_fwd = module.clone(decode_head_cfg={
            **model['decode_head'], 'decoder_kernel': 'fused_fwd'})
    train_kernel = cfg.get('decoder_train_kernel', 'auto')
    if train_kernel == 'auto':
        train_kernel = 'fused' if jax.default_backend() == 'tpu' else 'xla'
    if (train_kernel == 'fused'
            and model['decode_head']['type'] == 'VLGHead'):
        module = module.clone(decode_head_cfg={
            **model['decode_head'], 'decoder_kernel': 'fused'})

    return ModelBundle(
        module_fwd=module_fwd,
        module=module,
        text_feats=text_feats,
        mcc_text_feats=mcc_text_feats,
        num_classes=cfg['nclass'],
        img_size=cfg['crop_size'],
        model_cfg=mcfg,
        freeze_backbone=model.get('freeze_backbone', False),
        exclude_keys=model.get('exclude_keys'))
