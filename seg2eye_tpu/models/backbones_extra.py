"""Additional DeepLab backbones: Aligned Xception and DRN-D-54.

Parity notes:
  * AlignedXception (reference: refinenet/deeplab/modeling/backbone/
    xception.py): entry 3x3 s2 32 -> 3x3 64, blocks 1-3 (128/256/728 with
    strides 2/2/entry_block3_stride), 16 middle-flow blocks at 728 with
    middle_block_dilation, exit block20 (grow_first=False, is_last) + three
    dilated separable convs to 1536/1536/2048; low-level feature = relu of
    block1 output (128 ch); SeparableConv2d = TF-'same' fixed padding +
    depthwise 3x3 + BN + pointwise (xception.py:8-31).
  * DRN-D-54 (reference: backbone/drn.py:102-234, 377): conv stem (arch 'D'),
    conv layers 1-2, residual Bottleneck layers 3-6 with dilations (1,1,2,4),
    conv layers 7-8 (dil 2,1); channels (16,32,64,128,256,512,512,512);
    low-level feature = layer3 output (256 ch); DeepLab forces output
    stride 8 for drn (deeplab.py:13-14).
"""
from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from seg2eye_tpu.models.layers import TorchBatchNorm


def _kaiming_fan_out(key, shape, dtype=jnp.float32):
    receptive = 1
    for s in shape[:-2]:
        receptive *= s
    fan = shape[-1] * receptive
    return jax.random.normal(key, shape, dtype) * (2.0 / fan) ** 0.5


def _bn(name, train):
    """BatchNorm in f32 (stats + normalize, exact torch train semantics —
    models/layers.py TorchBatchNorm), result cast back to the input's
    compute dtype (a no-op for f32 inputs — bitwise parity preserved)."""
    def apply(x):
        y = TorchBatchNorm(use_running_average=not train, name=name)(x)
        return y.astype(x.dtype)
    return apply


def _conv(feats, k, stride=1, dilation=1, pad=None, name=None, groups=1):
    """Conv whose compute dtype follows the input (bf16 under the models'
    compute_dtype policy — without the explicit dtype flax would promote the
    bf16 activations back to the f32 params and compute in f32)."""
    if pad is None:
        pad = ((k - 1) // 2) * dilation

    def apply(x):
        return nn.Conv(feats, (k, k), strides=(stride, stride),
                       padding=((pad, pad), (pad, pad)),
                       kernel_dilation=(dilation, dilation),
                       feature_group_count=groups, use_bias=False,
                       dtype=x.dtype, kernel_init=_kaiming_fan_out,
                       name=name)(x)
    return apply


class SeparableConv(nn.Module):
    """TF-'same' fixed-padding depthwise 3x3 + BN + pointwise 1x1
    (xception.py:8-31)."""
    features: int
    stride: int = 1
    dilation: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_ch = x.shape[-1]
        k, d = 3, self.dilation
        eff = k + (k - 1) * (d - 1)
        beg = (eff - 1) // 2
        end = eff - 1 - beg
        x = jnp.pad(x, ((0, 0), (beg, end), (beg, end), (0, 0)))
        x = _conv(in_ch, 3, self.stride, d, pad=0, groups=in_ch,
                  name="depthwise")(x)
        x = _bn("bn", train)(x)
        x = _conv(self.features, 1, name="pointwise")(x)
        return x


class XceptionBlock(nn.Module):
    features: int
    reps: int
    stride: int = 1
    dilation: int = 1
    start_with_relu: bool = True
    grow_first: bool = True
    is_last: bool = False

    @nn.compact
    def __call__(self, inp, train: bool = False):
        in_ch = inp.shape[-1]
        if self.features != in_ch or self.stride != 1:
            skip = _conv(self.features, 1, self.stride, name="skip")(inp)
            skip = _bn("skipbn", train)(skip)
        else:
            skip = inp

        x = inp
        first = True
        idx = 0

        def sep(x, feats, stride, dilation):
            nonlocal first, idx
            if not (first and not self.start_with_relu):
                x = nn.relu(x)
            first = False
            x = SeparableConv(feats, stride, dilation,
                              name=f"sep{idx}")(x, train)
            x = _bn(f"sepbn{idx}", train)(x)
            idx += 1
            return x

        filters = in_ch
        if self.grow_first:
            x = sep(x, self.features, 1, self.dilation)
            filters = self.features
        for _ in range(self.reps - 1):
            x = sep(x, filters, 1, self.dilation)
        if not self.grow_first:
            x = sep(x, self.features, 1, self.dilation)
        if self.stride != 1:
            x = sep(x, self.features, 2, 1)
        if self.stride == 1 and self.is_last:
            x = sep(x, self.features, 1, 1)
        return x + skip


class XceptionBackbone(nn.Module):
    output_stride: int = 16

    @nn.compact
    def __call__(self, x, train: bool = False) -> Tuple[jax.Array, jax.Array]:
        if self.output_stride == 16:
            entry3_stride, mid_d, exit_d = 2, 1, (1, 2)
        elif self.output_stride == 8:
            entry3_stride, mid_d, exit_d = 1, 2, (2, 4)
        else:
            raise NotImplementedError(self.output_stride)

        x = _conv(32, 3, 2, name="conv1")(x)
        x = nn.relu(_bn("bn1", train)(x))
        x = _conv(64, 3, 1, name="conv2")(x)
        x = nn.relu(_bn("bn2", train)(x))

        x = XceptionBlock(128, 2, 2, start_with_relu=False,
                          name="block1")(x, train)
        x = nn.relu(x)
        low_level = x
        x = XceptionBlock(256, 2, 2, start_with_relu=False,
                          name="block2")(x, train)
        x = XceptionBlock(728, 2, entry3_stride, is_last=True,
                          name="block3")(x, train)
        for i in range(4, 20):
            x = XceptionBlock(728, 3, 1, mid_d, name=f"block{i}")(x, train)
        x = XceptionBlock(1024, 2, 1, exit_d[0], grow_first=False,
                          is_last=True, name="block20")(x, train)
        x = nn.relu(x)
        x = nn.relu(_bn("bn3", train)(
            SeparableConv(1536, 1, exit_d[1], name="conv3")(x, train)))
        x = nn.relu(_bn("bn4", train)(
            SeparableConv(1536, 1, exit_d[1], name="conv4")(x, train)))
        x = nn.relu(_bn("bn5", train)(
            SeparableConv(2048, 1, exit_d[1], name="conv5")(x, train)))
        return x, low_level


# --------------------------------------------------------------------- #
# DRN-D-54
# --------------------------------------------------------------------- #
class DRNBottleneck(nn.Module):
    planes: int
    stride: int = 1
    dilation: Tuple[int, int] = (1, 1)
    downsample: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        out = _conv(self.planes, 1, name="conv1")(x)
        out = nn.relu(_bn("bn1", train)(out))
        out = _conv(self.planes, 3, self.stride, self.dilation[1],
                    name="conv2")(out)
        out = nn.relu(_bn("bn2", train)(out))
        out = _conv(self.planes * 4, 1, name="conv3")(out)
        out = _bn("bn3", train)(out)
        if self.downsample:
            residual = _bn("down_bn", train)(
                _conv(self.planes * 4, 1, self.stride, name="down")(x))
        return nn.relu(out + residual)


class DRNBackbone(nn.Module):
    """drn_d_54: Bottleneck, layers [1,1,3,4,6,3,1,1], arch 'D'."""
    layers: Sequence[int] = (1, 1, 3, 4, 6, 3, 1, 1)
    channels: Sequence[int] = (16, 32, 64, 128, 256, 512, 512, 512)

    @nn.compact
    def __call__(self, x, train: bool = False) -> Tuple[jax.Array, jax.Array]:
        ch = self.channels

        def conv_layers(x, feats, convs, stride=1, dilation=1, name=""):
            for i in range(convs):
                x = _conv(feats, 3, stride if i == 0 else 1, dilation,
                          name=f"{name}_conv{i}")(x)
                x = nn.relu(_bn(f"{name}_bn{i}", train)(x))
            return x

        def res_layer(x, planes, blocks, stride=1, dilation=1,
                      new_level=True, name=""):
            in_ch = x.shape[-1]
            for i in range(blocks):
                if i == 0:
                    dil = (1, 1) if dilation == 1 else (
                        dilation // 2 if new_level else dilation, dilation)
                    down = stride != 1 or in_ch != planes * 4
                    x = DRNBottleneck(planes, stride, dil, down,
                                      name=f"{name}_0")(x, train)
                else:
                    x = DRNBottleneck(planes, 1, (dilation, dilation),
                                      name=f"{name}_{i}")(x, train)
            return x

        x = _conv(ch[0], 7, 1, name="layer0_conv")(x)
        x = nn.relu(_bn("layer0_bn", train)(x))
        x = conv_layers(x, ch[0], self.layers[0], 1, name="layer1")
        x = conv_layers(x, ch[1], self.layers[1], 2, name="layer2")
        x = res_layer(x, ch[2], self.layers[2], 2, name="layer3")
        low_level = x                                  # 256 ch
        x = res_layer(x, ch[3], self.layers[3], 2, name="layer4")
        x = res_layer(x, ch[4], self.layers[4], 1, 2, new_level=False,
                      name="layer5")
        x = res_layer(x, ch[5], self.layers[5], 1, 4, new_level=False,
                      name="layer6")
        x = conv_layers(x, ch[6], self.layers[6], 1, 2, name="layer7")
        x = conv_layers(x, ch[7], self.layers[7], 1, 1, name="layer8")
        return x, low_level
