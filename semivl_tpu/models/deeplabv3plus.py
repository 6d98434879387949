"""Self-contained UniMatch DeepLabV3+ segmentor (Flax).

Parity: reference third_party/unimatch/model/semseg/deeplabv3plus.py:9-126 —
ResNet-50/101 (UniMatch stem) or Xception-65 backbone, BN-ASPP over c4,
48-channel c1 reduction, fuse convs, classifier; its own feature
perturbation via Dropout2d(0.5) on c1/c4 (deeplabv3plus.py:44-55); all
resizes align_corners=True. Used by ``model='deeplabv3plus'`` (the original
UniMatch baseline, ``dlv3p-r101`` / ``dlv3p-xc65``).

The call contract mirrors VLM (text_feats accepted and ignored) so the same
train/eval steps drive it.
"""

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from semivl_tpu.models.dlv3p_head import BNASPPModule
from semivl_tpu.models.resnet import ConvBNReLU, ResNetV1c
from semivl_tpu.ops.dropout import dropout2d
from semivl_tpu.ops.resize import resize


class DeepLabV3Plus(nn.Module):
    num_classes: int
    backbone: str = 'resnet101'  # 'resnet50' | 'resnet101' | 'xception'
    replace_stride_with_dilation: Sequence[bool] = (False, False, True)
    dilations: Tuple[int, int, int] = (6, 12, 18)
    fp_rate: float = 0.5
    axis_name: Optional[str] = 'data'
    dtype: Any = jnp.float32

    def setup(self):
        if 'resnet' in self.backbone:
            self.encoder = ResNetV1c(
                depth=int(self.backbone.replace('resnet', '')),
                num_stages=4, out_indices=(0, 3),
                replace_stride_with_dilation=self.replace_stride_with_dilation,
                stem_widths=(64, 64, 128),
                axis_name=self.axis_name, dtype=self.dtype)
            self.high_channels = 2048
        elif self.backbone == 'xception':
            from semivl_tpu.models.xception import Xception65
            self.encoder = Xception65(axis_name=self.axis_name,
                                      dtype=self.dtype)
            self.high_channels = 2048
        else:
            raise ValueError(self.backbone)
        self.head = BNASPPModule(dilations=self.dilations,
                                 out_channels=self.high_channels // 8,
                                 axis_name=self.axis_name, dtype=self.dtype)
        self.reduce = ConvBNReLU(48, 1, axis_name=self.axis_name,
                                 dtype=self.dtype)
        self.fuse1 = ConvBNReLU(256, 3, axis_name=self.axis_name,
                                dtype=self.dtype)
        self.fuse2 = ConvBNReLU(256, 3, axis_name=self.axis_name,
                                dtype=self.dtype)
        self.classifier = nn.Dense(self.num_classes, name='classifier_dense',
                                   dtype=self.dtype,
                                   param_dtype=jnp.float32)

    def _decode(self, c1, c4, train):
        c4 = self.head(c4, train)
        c4 = resize(c4, c1.shape[1:3], mode='bilinear', align_corners=True)
        c1 = self.reduce(c1, train)
        x = jnp.concatenate([c1, c4.astype(c1.dtype)], axis=-1)
        x = self.fuse1(x, train)
        x = self.fuse2(x, train)
        return self.classifier(x)  # 1x1 conv == dense over channels

    def __call__(self, img, text_feats=None, need_fp=False, only_fp=False,
                 train=False, fp_slice=None):
        del text_feats
        h, w = img.shape[1:3]
        c1, c4 = self.encoder(img, train=train)

        if need_fp or only_fp:
            rng = self.make_rng('fp')
            r1, r2 = jax.random.split(rng)
            if only_fp:
                out = self._decode(dropout2d(r1, c1, self.fp_rate),
                                   dropout2d(r2, c4, self.fp_rate), train)
                out = resize(out.astype(jnp.float32), (h, w),
                             mode='bilinear', align_corners=True)
                return out.transpose(0, 3, 1, 2)
            # fp decoded for the w slice only (see VLM.__call__ rationale)
            b = img.shape[0]
            lo, hi = fp_slice if fp_slice is not None else (b // 2, b)
            c1_p = dropout2d(r1, c1[lo:hi], self.fp_rate)
            c4_p = dropout2d(r2, c4[lo:hi], self.fp_rate)
            outs = self._decode(jnp.concatenate([c1, c1_p]),
                                jnp.concatenate([c4, c4_p]), train)
            outs = resize(outs.astype(jnp.float32), (h, w), mode='bilinear',
                          align_corners=True).transpose(0, 3, 1, 2)
            return outs[:b], outs[b:]

        out = self._decode(c1, c4, train)
        out = resize(out.astype(jnp.float32), (h, w), mode='bilinear',
                     align_corners=True)
        return out.transpose(0, 3, 1, 2)

    def init_variables(self, img, text_feats=None, mcc_text_feats=None):
        return self(img, text_feats)
