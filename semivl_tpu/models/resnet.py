"""ResNet backbones (Flax, NHWC).

Covers both reference ResNet flavours with one implementation:

- mmseg ``ResNetV1c`` used as the VLG ``conv_encoder`` skip source for
  Cityscapes (1 stage, out_indices=[0]; reference
  configs/_base_/models/vlm-vlg-aspp-s2p4-skr04-ftap-mcvitb.py:50-60) —
  deep 3x3x3 stem, bottleneck stages;
- the UniMatch ResNet-50/101 (third_party/unimatch/model/backbone/
  resnet.py:17-163) with ``replace_stride_with_dilation`` for the
  DeepLabV3+ baseline (``base_forward`` -> c1..c4).

BatchNorm uses flax running stats; cross-replica stat sync (the reference's
SyncBN, semivl.py:136) happens automatically through ``axis_name='data'``
when the step runs under shard_map.
"""

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

Dtype = Any

BN_MOMENTUM = 0.9  # torch momentum 0.1
BN_EPS = 1e-5


class ConvBNReLU(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    dilation: int = 1
    relu: bool = True
    axis_name: Optional[str] = 'data'
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        pad = (self.kernel - 1) // 2 * self.dilation
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    kernel_dilation=(self.dilation, self.dilation),
                    padding=((pad, pad), (pad, pad)), use_bias=False,
                    name='conv', dtype=self.dtype,
                    param_dtype=jnp.float32)(x)
        x = nn.BatchNorm(use_running_average=not train,
                         momentum=BN_MOMENTUM, epsilon=BN_EPS,
                         axis_name=self.axis_name if train else None,
                         name='bn', dtype=jnp.float32,
                         param_dtype=jnp.float32)(x)
        x = x.astype(self.dtype)
        return nn.relu(x) if self.relu else x


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1
    downsample: bool = False
    axis_name: Optional[str] = 'data'
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        identity = x
        out = ConvBNReLU(self.planes, 1, axis_name=self.axis_name,
                         dtype=self.dtype, name='conv1')(x, train)
        out = ConvBNReLU(self.planes, 3, stride=self.stride,
                         dilation=self.dilation, axis_name=self.axis_name,
                         dtype=self.dtype, name='conv2')(out, train)
        out = ConvBNReLU(self.planes * 4, 1, relu=False,
                         axis_name=self.axis_name, dtype=self.dtype,
                         name='conv3')(out, train)
        if self.downsample:
            identity = ConvBNReLU(self.planes * 4, 1, stride=self.stride,
                                  relu=False, axis_name=self.axis_name,
                                  dtype=self.dtype, name='downsample')(
                                      x, train)
        return nn.relu(out + identity)


_DEPTH_BLOCKS = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3)}


class ResNetV1c(nn.Module):
    """Deep-stem bottleneck ResNet; returns features per out_indices
    (stage i output, 256*2^i channels).

    ``stem_widths=(32, 32, 64)`` gives mmseg's ResNetV1c; ``(64, 64, 128)``
    gives the UniMatch/TorchSemiSeg variant (reference third_party/unimatch/
    model/backbone/resnet.py:79-87). Per-block dilation follows torchvision:
    when a stage's stride is replaced by dilation, the first block keeps the
    previous dilation and later blocks use the doubled one.
    """
    depth: int = 101
    num_stages: int = 4
    out_indices: Tuple[int, ...] = (0, 1, 2, 3)
    replace_stride_with_dilation: Sequence[bool] = (False, False, False)
    stem_widths: Tuple[int, int, int] = (32, 32, 64)
    axis_name: Optional[str] = 'data'
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, img, train=False):
        x = img.astype(self.dtype)
        w1, w2, w3 = self.stem_widths
        x = ConvBNReLU(w1, 3, stride=2, axis_name=self.axis_name,
                       dtype=self.dtype, name='stem1')(x, train)
        x = ConvBNReLU(w2, 3, axis_name=self.axis_name, dtype=self.dtype,
                       name='stem2')(x, train)
        x = ConvBNReLU(w3, 3, axis_name=self.axis_name, dtype=self.dtype,
                       name='stem3')(x, train)
        # maxpool 3x3 stride 2, padding 1
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)),
                    constant_values=-jnp.inf)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))

        blocks = _DEPTH_BLOCKS[self.depth]
        outs = []
        dilation = 1
        for stage in range(self.num_stages):
            planes = 64 * 2 ** stage
            stride = 1 if stage == 0 else 2
            prev_dilation = dilation
            if stage > 0 and self.replace_stride_with_dilation[stage - 1]:
                dilation *= stride
                stride = 1
            for b in range(blocks[stage]):
                x = Bottleneck(
                    planes=planes,
                    stride=stride if b == 0 else 1,
                    dilation=prev_dilation if b == 0 else dilation,
                    downsample=(b == 0),
                    axis_name=self.axis_name, dtype=self.dtype,
                    name=f'layer{stage + 1}_{b}')(x, train)
            if stage in self.out_indices:
                outs.append(x)
        return outs
