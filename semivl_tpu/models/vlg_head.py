"""Vision-Language-Guided (VLG) decoder head (Flax).

The SemiVL core novelty (reference model/decode_heads/vlg_head.py:140-251):

1. similarity map between the L2-normalised dense CLIP embedding and the
   class/concept text embeddings,
2. spatial reasoning: 7x7 conv + residual GroupNorm-ASPP over each class
   plane (batch folded to B*N),
3. semantic reasoning: transformer layers attending across the *class axis*
   at every 4x4-pooled spatial location, with a projected text token
   concatenated per class,
4. two transposed-conv upsampling stages with encoder skip features repeated
   over the N class planes,
5. per-plane 1-channel head -> (B, N, h, w), optional concept->class max
   aggregation, bilinear resize to image size.

Layout is NHWC; the class-plane folding keeps contractions MXU-shaped.
"""

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

import functools

import numpy as np

from semivl_tpu.models.layers import TransformerBlock, l2_normalize
from semivl_tpu.ops.resize import _axis_weights, resize


@functools.lru_cache(maxsize=64)
def _pool_matrix(out_size, in_size, win):
    """(out, in) matrix applying AvgPool1d(win, stride=win) — VALID
    windows, tail rows dropped exactly as torch nn.AvgPool2d floor mode
    (reference vlg_head.py:44 ``AdaptiveAvgPool`` is actually
    ``nn.AvgPool2d(pool_size)``). Numpy (device array would leak across
    jit scopes, same pattern as ops/resize._axis_weights)."""
    w = np.zeros((out_size, in_size), np.float32)
    for p in range(out_size):
        w[p, p * win:(p + 1) * win] = 1.0 / win
    return w
from semivl_tpu.text.embeddings import (
    aggregate_concept_predictions,
    get_class_to_concept_idxs,
)

Dtype = Any


class ConvGNReLU(nn.Module):
    """Conv -> GroupNorm(ch//16) -> ReLU (reference vlg_head.py:94-99).

    torch GroupNorm eps=1e-5.
    """
    features: int
    kernel: int = 3
    dilation: int = 1
    use_bias: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        pad = (self.kernel - 1) // 2 * self.dilation
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    kernel_dilation=(self.dilation, self.dilation),
                    padding=((pad, pad), (pad, pad)), use_bias=self.use_bias,
                    name='conv', dtype=self.dtype, param_dtype=jnp.float32)(x)
        # stats reduce in fp32 (flax default); normalised output stays in the
        # compute dtype — halves the GN bandwidth on the bf16 path
        x = nn.GroupNorm(num_groups=self.features // 16, epsilon=1e-5,
                         name='gn', dtype=self.dtype,
                         param_dtype=jnp.float32)(x)
        return nn.relu(x).astype(self.dtype)


class ASPPPooling(nn.Module):
    """Image pooling branch (reference vlg_head.py:70-81)."""
    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h, w = x.shape[1:3]
        pooled = jnp.mean(x, axis=(1, 2), keepdims=True)
        pooled = ConvGNReLU(self.features, kernel=1, dtype=self.dtype,
                            name='proj')(pooled)
        # bilinear align_corners=True upsample of a 1x1 map == broadcast
        return jnp.broadcast_to(pooled, (x.shape[0], h, w, self.features))


class ASPPModule(nn.Module):
    """Residual GroupNorm ASPP (reference vlg_head.py:84-113)."""
    atrous_rates: Sequence[int] = (1, 6, 12, 18)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        feats = []
        for i, rate in enumerate(self.atrous_rates):
            ksize = 1 if rate == 1 else 3
            feats.append(ConvGNReLU(c, kernel=ksize, dilation=rate,
                                    dtype=self.dtype, name=f'branch_{i}')(x))
        feats.append(ASPPPooling(c, dtype=self.dtype, name='pool')(x))
        y = jnp.concatenate(feats, axis=-1)
        y = ConvGNReLU(c, kernel=1, dtype=self.dtype, name='project')(y)
        return x + y


def conv_transpose_2x2(x, kernel, bias):
    """Exact torch ConvTranspose2d(k=2, s=2) as an einsum + reshape.

    ``kernel``: (2, 2, in, out). Non-overlapping stride means each input
    pixel expands into an independent 2x2 block — a pure matmul, ideal for
    the MXU (no scatter).
    """
    b, h, w, _ = x.shape
    out = jnp.einsum('bhwc,ijco->bhiwjo', x, kernel.astype(x.dtype))
    out = out.reshape(b, h * 2, w * 2, kernel.shape[-1])
    return out + bias.astype(x.dtype)


class _SplitSkipConv(nn.Module):
    """3x3 conv over concat([planes, skip-repeated-over-planes]) computed as
    two convs on the kernel's channel slices.

    Math-identical to concat+conv (convolution is linear in input channels),
    but the skip half runs once per IMAGE instead of once per class plane —
    a 1/N-fold FLOP cut on that slice (N = 21..150 planes) — and the
    (B*N, H, W, skip_c) repeated-skip tensor is never materialised. The
    single ``kernel`` param keeps the exact layout/naming the torch
    checkpoint converter expects for the fused conv.
    """
    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, skip):
        # x: (B*N, H, W, Cm); skip: (B, H, W, Cs)
        cm, cs = x.shape[-1], skip.shape[-1]
        n_rep = x.shape[0] // skip.shape[0]
        kernel = self.param('kernel', nn.initializers.lecun_normal(),
                            (3, 3, cm + cs, self.features), jnp.float32)
        kernel = kernel.astype(self.dtype)
        dn = ('NHWC', 'HWIO', 'NHWC')
        ym = jax.lax.conv_general_dilated(
            x.astype(self.dtype), kernel[:, :, :cm], (1, 1),
            ((1, 1), (1, 1)), dimension_numbers=dn)
        ys = jax.lax.conv_general_dilated(
            skip.astype(self.dtype), kernel[:, :, cm:], (1, 1),
            ((1, 1), (1, 1)), dimension_numbers=dn)
        b, h, w, _ = ys.shape
        y = ym.reshape(b, n_rep, h, w, self.features) + ys[:, None]
        return y.reshape(b * n_rep, h, w, self.features)


class SplitConvGNReLU(nn.Module):
    """ConvGNReLU whose conv consumes (planes, image-level skip) in split
    form; the param tree ('conv/kernel', 'gn/{scale,bias}') matches
    ``ConvGNReLU`` exactly, so checkpoints are interchangeable."""
    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, skip):
        x = _SplitSkipConv(self.features, dtype=self.dtype,
                           name='conv')(x, skip)
        x = nn.GroupNorm(num_groups=self.features // 16, epsilon=1e-5,
                         name='gn', dtype=self.dtype,
                         param_dtype=jnp.float32)(x)
        return nn.relu(x).astype(self.dtype)


class _ConvParams(nn.Module):
    """Declares conv params (same names/shapes/inits as ``nn.Conv`` /
    ``_SplitSkipConv``) without running the op — lets the fused Pallas
    decoder path (ops/fused_up.py) share one checkpoint-compatible param
    tree with the XLA path."""
    shape: Tuple[int, ...]
    use_bias: bool = False

    @nn.compact
    def __call__(self):
        out = {'kernel': self.param('kernel', nn.initializers.lecun_normal(),
                                    self.shape, jnp.float32)}
        if self.use_bias:
            out['bias'] = self.param('bias', nn.initializers.zeros,
                                     (self.shape[-1],), jnp.float32)
        return out


class _GNParams(nn.Module):
    """GroupNorm scale/bias declaration matching ``nn.GroupNorm``."""
    features: int

    @nn.compact
    def __call__(self):
        return {'scale': self.param('scale', nn.initializers.ones,
                                    (self.features,), jnp.float32),
                'bias': self.param('bias', nn.initializers.zeros,
                                   (self.features,), jnp.float32)}


class _ConvGNParams(nn.Module):
    """(Split)ConvGNReLU param tree ('conv/kernel', 'gn/{scale,bias}')
    without the ops — the shell's param paths are identical to the XLA
    modules', so both decoder paths load the same checkpoints."""
    features: int
    in_ch: int

    @nn.compact
    def __call__(self):
        return {'conv': _ConvParams((3, 3, self.in_ch, self.features),
                                    name='conv')(),
                'gn': _GNParams(self.features, name='gn')()}


class Up(nn.Module):
    """Transposed-conv 2x upsample + skip concat + double conv
    (reference vlg_head.py:116-137). The skip-concat conv is computed in
    split form (see ``_SplitSkipConv``)."""
    out_channels: int
    skip_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, skip=None, declare=False, in_channels=None):
        if declare:
            # Declare the exact same param tree without running any op —
            # the fused chain kernel (ops/fused_decoder.py) consumes it.
            c = in_channels
            up_c = c - self.skip_channels
            return {
                'up_kernel': self.param('up_kernel',
                                        nn.initializers.lecun_normal(),
                                        (2, 2, c, up_c), jnp.float32),
                'up_bias': self.param('up_bias', nn.initializers.zeros,
                                      (up_c,), jnp.float32),
                'conv1': _ConvGNParams(self.out_channels,
                                       up_c + self.skip_channels,
                                       name='conv1')(),
                'conv2': _ConvGNParams(self.out_channels,
                                       self.out_channels, name='conv2')(),
            }
        c = x.shape[-1]
        up_c = c - self.skip_channels
        kernel = self.param('up_kernel', nn.initializers.lecun_normal(),
                            (2, 2, c, up_c), jnp.float32)
        bias = self.param('up_bias', nn.initializers.zeros, (up_c,),
                          jnp.float32)
        x = conv_transpose_2x2(x, kernel, bias)
        if skip is not None:
            skip = resize(skip, x.shape[1:3], mode='bilinear',
                          align_corners=True)
            x = SplitConvGNReLU(self.out_channels, dtype=self.dtype,
                                name='conv1')(x, skip)
        else:
            x = ConvGNReLU(self.out_channels, kernel=3, dtype=self.dtype,
                           name='conv1')(x)
        x = ConvGNReLU(self.out_channels, kernel=3, dtype=self.dtype,
                       name='conv2')(x)
        return x


class SemanticTransformer(nn.Module):
    """Attention across the class axis at pooled spatial locations
    (reference vlg_head.py:27-67)."""
    channels: int
    text_channels: int
    num_heads: int
    pool_size: Tuple[int, int] = (4, 4)
    # 'einsum': pool/unpool as dot contractions against constant pooling/
    # bilinear matrices, with the (B,N,hp,wp,C)<->(B,hp,wp,N,C) transposes
    # folded INTO the dots (MXU work instead of reduce-window + 5D copy
    # fusions — the round-3 trace showed this stage transpose/pool-bound
    # at 4% MXU). 'window': the original nn.avg_pool + transpose + resize
    # path, kept for A/B measurement.
    impl: str = 'einsum'
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, text_tokens):
        # x: (B, N, H, W, C) class-plane features; text_tokens: (B, N, Ct).
        b, n, h, w, c = x.shape
        ph, pw = self.pool_size
        if self.impl == 'einsum':
            hp, wp = h // ph, w // pw
            p_h = jnp.asarray(_pool_matrix(hp, h, ph), x.dtype)
            p_w = jnp.asarray(_pool_matrix(wp, w, pw), x.dtype)
            # pool + layout change in one contraction pair
            tokens = jnp.einsum('ph,qw,bnhwc->bpqnc', p_h, p_w, x)
            tokens = tokens.reshape(b * hp * wp, n, c)
        else:
            x_pool = nn.avg_pool(x.reshape(b * n, h, w, c), (ph, pw),
                                 strides=(ph, pw))
            hp, wp = x_pool.shape[1:3]
            # (B*hp*wp, N, C): sequence over classes at each pooled location
            tokens = (x_pool.reshape(b, n, hp, wp, c)
                      .transpose(0, 2, 3, 1, 4).reshape(b * hp * wp, n, c))
        if text_tokens is not None:
            text = jnp.broadcast_to(
                text_tokens[:, None, None],
                (b, hp, wp, n, self.text_channels)).reshape(
                    b * hp * wp, n, self.text_channels)
            tokens = jnp.concatenate([tokens, text.astype(tokens.dtype)],
                                     axis=-1)
        # mmcv TransformerEncoderLayer with feedforward_channels=4*channels
        # (reference vlg_head.py:34-37)
        tokens, _ = TransformerBlock(
            num_heads=self.num_heads, mlp_hidden=4 * self.channels,
            norm_eps=1e-6, dtype=self.dtype, name='transformer')(tokens)
        tokens = tokens[..., :c]
        # unpool: bilinear align_corners=True back to (h, w), residual add.
        if self.impl == 'einsum':
            # same weight matrices resize() would use, applied with the
            # un-transpose folded into the contraction; fp32 like resize()
            u_h = jnp.asarray(_axis_weights(h, hp, 'bilinear', True,
                                            'float32'))
            u_w = jnp.asarray(_axis_weights(w, wp, 'bilinear', True,
                                            'float32'))
            t5 = tokens.reshape(b, hp, wp, n, c).astype(jnp.float32)
            y = jnp.einsum('hp,wq,bpqnc->bnhwc', u_h, u_w, t5,
                           precision='highest')
            return x + y.astype(x.dtype)
        y = (tokens.reshape(b, hp, wp, n, c).transpose(0, 3, 1, 2, 4)
             .reshape(b * n, hp, wp, c))
        y = resize(y, (h, w), mode='bilinear', align_corners=True)
        return x + y.reshape(b, n, h, w, c)


class VLGHead(nn.Module):
    img_size: int
    num_classes: int
    text_in_channels: int = 512
    text_channels: int = 128
    up_channels: Tuple[int, int] = (64, 32)
    skip_in_channels: Tuple[int, ...] = (768, 768)
    skip_channels: Tuple[int, ...] = (32, 16)
    skip_from_conv_feat: bool = False
    num_layers: int = 2
    num_heads: int = 4
    channels: int = 128
    pool_size: Tuple[int, int] = (4, 4)
    conv1_ksize: int = 7
    align_corners: bool = False
    text_embedding_name: str = ''  # for concept aggregation lookup
    # 'xla' | 'fused' | 'fused_fwd': route the Up stages + head through
    # the fused polyphase Pallas chain (ops/fused_decoder.py). 'fused'
    # is differentiable (training); 'fused_fwd' marks forward-only use
    # (teacher pass, eval) and gates on the smaller forward-kernel VMEM
    # footprint. Param tree is identical either way.
    decoder_kernel: str = 'xla'
    semantic_impl: str = 'einsum'  # see SemanticTransformer.impl
    dtype: Dtype = jnp.float32

    def fused_decoder_ok(self, h, w):
        """Whether the fused polyphase decoder chain
        (ops/fused_decoder.py) can run at this feature geometry: base
        widths w and 2w must fit a 128-lane row stride and both stages'
        per-program VMEM (incl. backward) must fit the scoped limit.
        Unlike the round-2 kernel there is no 128-divisibility gate, so
        801-crop Cityscapes (w=51/102) and float32 512-crop both
        qualify (float32 models run the kernel with bfloat16 internal
        storage — see ops/fused_decoder.py docstring)."""
        from semivl_tpu.ops.fused_decoder import fused_decoder_ok
        return fused_decoder_ok(
            self.channels, self.skip_channels[0], self.up_channels[0],
            self.skip_channels[1], self.up_channels[1], h, w,
            backward=self.decoder_kernel != 'fused_fwd')

    @nn.compact
    def __call__(self, feats, text_feats, conv_feats=None, output_size=None,
                 train=False, global_emb=None):
        """feats: tuple of NHWC maps (pyramid..., dense CLIP embed last);
        text_feats: (N, Ct) or (B, N, Ct); conv_feats: list of NHWC maps.

        Returns (B, num_classes, out_h, out_w) logits (NCHW layout to match
        loss/eval code expecting class-first maps).
        """
        del train, global_emb  # VLG: GroupNorm/LN only, no cls-token use
        img_feats = feats[-1]
        if self.skip_from_conv_feat:
            assert conv_feats is not None
            skip_feats = list(feats[:-1])[::-1] + list(conv_feats)[::-1]
        else:
            skip_feats = list(feats[:-1])[::-1]
        assert len(skip_feats) == len(self.skip_in_channels)

        b, h, w, c = img_feats.shape
        if text_feats.ndim == 2:
            text_feats = jnp.broadcast_to(
                text_feats[None], (b,) + text_feats.shape)
        n = text_feats.shape[1]
        text_feats = text_feats.astype(self.dtype)

        # 1. similarity map (reference vlg_head.py:214-217)
        img_n = l2_normalize(img_feats, axis=-1)
        text_n = l2_normalize(text_feats, axis=-1)
        x = jnp.einsum('bhwc,bnc->bnhw', img_n, text_n)

        # 2. spatial reasoning on (B*N, h, w, 1) planes (218-223)
        x = x.reshape(b * n, h, w, 1)
        pad = (self.conv1_ksize - 1) // 2
        x = nn.Conv(self.channels, (self.conv1_ksize, self.conv1_ksize),
                    padding=((pad, pad), (pad, pad)), name='conv1',
                    dtype=self.dtype, param_dtype=jnp.float32)(
                        x.astype(self.dtype))
        x = ASPPModule(dtype=self.dtype, name='aspp')(x)
        x = x.reshape(b, n, h, w, self.channels)

        # 3. semantic reasoning (226-230); text_proj consumes the
        # *normalised* text features (reference reassigns text_feats at 216)
        text_tokens = nn.Dense(self.text_channels, name='text_proj',
                               dtype=self.dtype,
                               param_dtype=jnp.float32)(text_n)
        text_tokens = nn.relu(text_tokens)
        for i in range(self.num_layers):
            x = SemanticTransformer(
                channels=self.channels, text_channels=self.text_channels,
                num_heads=self.num_heads, pool_size=self.pool_size,
                impl=self.semantic_impl, dtype=self.dtype,
                name=f'layers_{i}')(x, text_tokens)

        # 4. skip projections + upsampling (233-239)
        projected_skips = []
        for i, (f, sc) in enumerate(zip(skip_feats, self.skip_channels)):
            s = nn.Conv(sc, (3, 3), padding=((1, 1), (1, 1)),
                        name=f'skip_proj_{i}', dtype=self.dtype,
                        param_dtype=jnp.float32)(f.astype(self.dtype))
            projected_skips.append(nn.relu(s))

        x = x.reshape(b * n, h, w, self.channels)
        if (self.decoder_kernel in ('fused', 'fused_fwd')
                and self.fused_decoder_ok(h, w)):
            # Fused polyphase chain (ops/fused_decoder.py): up1+up2+head
            # as two Pallas programs per class plane, differentiable
            # (custom VJP), with the exact same param tree as the XLA
            # branch. On CPU (interpret) storage follows the model dtype
            # so outputs are bit-comparable to the XLA branch; on TPU the
            # kernel stores activations in bfloat16 with fp32 stats.
            from semivl_tpu.ops.fused_decoder import fused_vlg_decoder
            head_p = _ConvParams((3, 3, self.up_channels[1], 1),
                                 use_bias=True, name='head')()
            p1 = Up(self.up_channels[0], self.skip_channels[0],
                    dtype=self.dtype, name='up1')(
                        None, declare=True, in_channels=self.channels)
            p2 = Up(self.up_channels[1], self.skip_channels[1],
                    dtype=self.dtype, name='up2')(
                        None, declare=True,
                        in_channels=self.up_channels[0])
            s1 = resize(projected_skips[0], (2 * h, 2 * w),
                        mode='bilinear', align_corners=True)
            s2 = resize(projected_skips[1], (4 * h, 4 * w),
                        mode='bilinear', align_corners=True)
            x_cf = jnp.transpose(x, (0, 3, 1, 2))
            s1_cf = jnp.transpose(s1, (0, 3, 1, 2)).astype(x_cf.dtype)
            s2_cf = jnp.transpose(s2, (0, 3, 1, 2)).astype(x_cf.dtype)
            on_tpu = jax.devices()[0].platform == 'tpu'
            logits = fused_vlg_decoder(
                x_cf, s1_cf, s2_cf, p1, p2, head_p,
                storage=None if on_tpu else self.dtype)
            oh, ow = logits.shape[2:]
            x = logits.reshape(b, n, oh, ow)
        else:
            x = Up(self.up_channels[0], self.skip_channels[0],
                   dtype=self.dtype, name='up1')(x, projected_skips[0])
            x = Up(self.up_channels[1], self.skip_channels[1],
                   dtype=self.dtype, name='up2')(x, projected_skips[1])

            # 5. per-plane head (190, 239-240)
            x = nn.Conv(1, (3, 3), padding=((1, 1), (1, 1)), name='head',
                        dtype=self.dtype, param_dtype=jnp.float32)(x)
            oh, ow = x.shape[1:3]
            x = x.reshape(b, n, oh, ow)

        # 6. concept -> class aggregation (242-244)
        if n != self.num_classes:
            cls2con = get_class_to_concept_idxs(self.text_embedding_name)
            x = aggregate_concept_predictions(x, cls2con)

        # 7. resize to output size (246-249); NCHW -> resize needs NHWC
        out_hw = output_size or (self.img_size, self.img_size)
        x = x.transpose(0, 2, 3, 1)
        x = resize(x.astype(jnp.float32), out_hw, mode='bilinear',
                   align_corners=self.align_corners)
        return x.transpose(0, 3, 1, 2)
