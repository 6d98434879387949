"""Aligned Xception-65 backbone (Flax).

Parity: reference third_party/unimatch/model/backbone/xception.py — the
DeepLab-style Xception with separable convs (ReLU-first variant), entry
blocks 64->128->256->728, 16 middle blocks at 728, exit block to 1024 and
three separable convs to 2048; ``c1`` is tapped from block2's hook (after
its second separable conv); fixed BN momentum 0.0003 (xception.py:5).
``base_forward`` -> (c1 [256ch, stride 4], c4 [2048ch, os 16]).
"""

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

Dtype = Any

# torch momentum 0.0003 -> flax momentum (1 - 0.0003)
_BN_MOM = 1.0 - 0.0003


class _BN(nn.Module):
    axis_name: Optional[str] = 'data'

    @nn.compact
    def __call__(self, x, train=False):
        return nn.BatchNorm(
            use_running_average=not train, momentum=_BN_MOM, epsilon=1e-5,
            axis_name=self.axis_name if train else None, name='bn',
            dtype=jnp.float32, param_dtype=jnp.float32)(x)


class SeparableConv(nn.Module):
    """relu0? -> depthwise 3x3 -> BN (-> relu) -> pointwise 1x1 -> BN (-> relu)
    (xception.py:9-34)."""
    features: int
    stride: int = 1
    dilation: int = 1
    activate_first: bool = True
    axis_name: Optional[str] = 'data'
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        if self.activate_first:
            x = nn.relu(x)
        c_in = x.shape[-1]
        pad = self.dilation
        x = nn.Conv(c_in, (3, 3), strides=(self.stride, self.stride),
                    kernel_dilation=(self.dilation, self.dilation),
                    padding=((pad, pad), (pad, pad)), feature_group_count=c_in,
                    use_bias=False, name='depthwise', dtype=self.dtype,
                    param_dtype=jnp.float32)(x)
        x = _BN(self.axis_name, name='bn1')(x, train).astype(self.dtype)
        if not self.activate_first:
            x = nn.relu(x)
        x = nn.Conv(self.features, (1, 1), use_bias=False, name='pointwise',
                    dtype=self.dtype, param_dtype=jnp.float32)(x)
        x = _BN(self.axis_name, name='bn2')(x, train).astype(self.dtype)
        if not self.activate_first:
            x = nn.relu(x)
        return x


class XceptionBlock(nn.Module):
    """Three separable convs + (projected) residual (xception.py:37-81).
    Returns (out, hook) where hook is the post-sepconv2 feature."""
    out_filters: int
    stride: int = 1
    atrous: int = 1
    grow_first: bool = True
    axis_name: Optional[str] = 'data'
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        in_filters = x.shape[-1]
        if self.out_filters != in_filters or self.stride != 1:
            skip = nn.Conv(self.out_filters, (1, 1),
                           strides=(self.stride, self.stride), use_bias=False,
                           name='skip', dtype=self.dtype,
                           param_dtype=jnp.float32)(x)
            skip = _BN(self.axis_name, name='skipbn')(skip,
                                                      train).astype(self.dtype)
        else:
            skip = x
        filters = self.out_filters if self.grow_first else in_filters
        y = SeparableConv(filters, dilation=self.atrous,
                          axis_name=self.axis_name, dtype=self.dtype,
                          name='sepconv1')(x, train)
        y = SeparableConv(self.out_filters, dilation=self.atrous,
                          axis_name=self.axis_name, dtype=self.dtype,
                          name='sepconv2')(y, train)
        hook = y
        y = SeparableConv(self.out_filters, stride=self.stride,
                          dilation=self.atrous, axis_name=self.axis_name,
                          dtype=self.dtype, name='sepconv3')(y, train)
        return y + skip, hook


class Xception65(nn.Module):
    output_stride: int = 16
    axis_name: Optional[str] = 'data'
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, img, train=False):
        assert self.output_stride in (8, 16)
        stride_list = (2, 2, 1) if self.output_stride == 16 else (2, 1, 1)
        rate = 16 // self.output_stride

        x = img.astype(self.dtype)
        x = nn.Conv(32, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                    use_bias=False, name='conv1', dtype=self.dtype,
                    param_dtype=jnp.float32)(x)
        x = nn.relu(_BN(self.axis_name, name='bn1')(x, train)
                    .astype(self.dtype))
        x = nn.Conv(64, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
                    name='conv2', dtype=self.dtype,
                    param_dtype=jnp.float32)(x)
        x = nn.relu(_BN(self.axis_name, name='bn2')(x, train)
                    .astype(self.dtype))

        x, _ = XceptionBlock(128, stride=2, axis_name=self.axis_name,
                             dtype=self.dtype, name='block1')(x, train)
        x, c1 = XceptionBlock(256, stride=stride_list[0],
                              axis_name=self.axis_name, dtype=self.dtype,
                              name='block2')(x, train)
        x, _ = XceptionBlock(728, stride=stride_list[1],
                             axis_name=self.axis_name, dtype=self.dtype,
                             name='block3')(x, train)
        for i in range(4, 20):
            x, _ = XceptionBlock(728, atrous=rate, axis_name=self.axis_name,
                                 dtype=self.dtype, name=f'block{i}')(x, train)
        x, _ = XceptionBlock(1024, stride=stride_list[2], atrous=rate,
                             grow_first=False, axis_name=self.axis_name,
                             dtype=self.dtype, name='block20')(x, train)
        x = SeparableConv(1536, dilation=rate, activate_first=False,
                          axis_name=self.axis_name, dtype=self.dtype,
                          name='conv3')(x, train)
        x = SeparableConv(1536, dilation=rate, activate_first=False,
                          axis_name=self.axis_name, dtype=self.dtype,
                          name='conv4')(x, train)
        x = SeparableConv(2048, dilation=rate, activate_first=False,
                          axis_name=self.axis_name, dtype=self.dtype,
                          name='conv5')(x, train)
        return c1, x
