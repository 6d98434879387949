"""DeepLabV3+ decoder head for the VLM (Flax).

Parity: reference model/decode_heads/dlv3p_head.py:26-65 + the UniMatch
BN-ASPP it builds on (third_party/unimatch/model/semseg/
deeplabv3plus.py:76-126): ASPP (1x1 + three dilated 3x3 + image pooling,
out = in/8) on the 512-d CLIP embedding, 1x1-BN projection of the ViT
layer-4 skip, concat + two 3x3-BN fuse convs, class conv. Used by the
``vlm-dlv3p-*`` ablation models.
"""

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from semivl_tpu.models.resnet import ConvBNReLU
from semivl_tpu.ops.resize import resize

Dtype = Any


class BNASPPModule(nn.Module):
    """UniMatch ASPP (BatchNorm flavour), out_channels = in/8 unless set."""
    dilations: Tuple[int, int, int] = (6, 12, 18)
    out_channels: Optional[int] = None
    axis_name: Optional[str] = 'data'
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        out_c = self.out_channels or x.shape[-1] // 8
        feats = [ConvBNReLU(out_c, 1, axis_name=self.axis_name,
                            dtype=self.dtype, name='b0')(x, train)]
        for i, d in enumerate(self.dilations):
            feats.append(ConvBNReLU(out_c, 3, dilation=d,
                                    axis_name=self.axis_name,
                                    dtype=self.dtype,
                                    name=f'b{i + 1}')(x, train))
        pooled = jnp.mean(x, axis=(1, 2), keepdims=True)
        pooled = ConvBNReLU(out_c, 1, axis_name=self.axis_name,
                            dtype=self.dtype, name='b4')(pooled, train)
        feats.append(jnp.broadcast_to(
            pooled, x.shape[:3] + (out_c,)))
        y = jnp.concatenate(feats, axis=-1)
        return ConvBNReLU(out_c, 1, axis_name=self.axis_name,
                          dtype=self.dtype, name='project')(y, train)


class DLV3PHead(nn.Module):
    img_size: int
    num_classes: int
    in_channels: int = 512
    channels: int = 256
    c1_in_channels: int = 768
    c1_channels: int = 48
    dilations: Tuple[int, int, int] = (6, 12, 18)
    align_corners: bool = False
    axis_name: Optional[str] = 'data'
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feats, text_feats=None, conv_feats=None,
                 output_size=None, train=False, global_emb=None):
        """feats: (c1 = ViT layer-4 skip, c4 = dense CLIP embedding), NHWC.
        text_feats unused (signature-compatible with VLGHead)."""
        del text_feats, conv_feats, global_emb
        c1, c4 = feats[0], feats[1]
        c4 = BNASPPModule(dilations=self.dilations,
                          out_channels=self.in_channels // 8,
                          axis_name=self.axis_name, dtype=self.dtype,
                          name='aspp')(c4.astype(self.dtype), train)
        c1 = ConvBNReLU(self.c1_channels, 1, axis_name=self.axis_name,
                        dtype=self.dtype, name='c1_proj')(
                            c1.astype(self.dtype), train)
        c4 = resize(c4, c1.shape[1:3], mode='bilinear',
                    align_corners=self.align_corners)
        x = jnp.concatenate([c1, c4.astype(c1.dtype)], axis=-1)
        x = ConvBNReLU(256, 3, axis_name=self.axis_name, dtype=self.dtype,
                       name='fuse1')(x, train)
        x = ConvBNReLU(256, 3, axis_name=self.axis_name, dtype=self.dtype,
                       name='fuse2')(x, train)
        x = nn.Conv(self.num_classes, (1, 1), name='classifier',
                    dtype=self.dtype, param_dtype=jnp.float32)(x)

        out_hw = output_size or (self.img_size, self.img_size)
        x = resize(x.astype(jnp.float32), out_hw, mode='bilinear',
                   align_corners=self.align_corners)
        return x.transpose(0, 3, 1, 2)
