"""DeepLabV3+ (backbone -> ASPP -> decoder), TPU-native NHWC flax.

Parity notes (reference: refinenet/deeplab/modeling/):
  * ResNet-101 backbone with output-stride dilation and the multi-grid [1,2,4]
    layer4 (backbone/resnet.py:45-154); os16 -> strides [1,2,2,1],
    dilations [1,1,1,2]; low-level feature = layer1 output.
  * ASPP: 1x1 + three dilated 3x3 branches (6/12/18 at os16) + global average
    pool branch, concat -> 1x1 to 256 + dropout 0.5 (aspp.py:34-95).
  * Decoder: low-level 1x1 -> 48ch, bilinear(align_corners=True) upsample of
    ASPP out, concat 304 -> two 3x3 256 convs with dropout 0.5/0.1 -> 1x1 to
    num_classes (decoder.py:7-57).
  * Final bilinear(align_corners=True) upsample to input size (deeplab.py:31).
  * MobileNetV2 backbone (backbone/mobilenet.py) with dilated last stages;
    low-level feature after the 3rd inverted-residual stage (24ch).
  * All convs bias-free + affine BN (kaiming init, BN gamma=1 beta=0).

TPU-first: BN statistics are plain jnp reductions — under a data-sharded
batch they lower to psum over the mesh ('synchronized BN' for free, replacing
refinenet/deeplab/modeling/sync_batchnorm/).  The reference's torchvision
pretrained-weight load (resnet.py:138-146) is replaced by a from-scratch path
plus an optional converter (tools/convert_torch_resnet.py) since no torch zoo
is reachable from TPU pods.
"""
from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from seg2eye_tpu.models.layers import TorchBatchNorm
from seg2eye_tpu.ops.image import resize_bilinear_ac


def kaiming_init(mode: str = "fan_in") -> Any:
    """torch kaiming_normal_ (gain sqrt(2)); resnet.py:131-134 uses fan_out."""
    def init(key, shape, dtype=jnp.float32):
        receptive = 1
        for s in shape[:-2]:
            receptive *= s
        fan = shape[-2] * receptive if mode == "fan_in" else shape[-1] * receptive
        std = (2.0 / fan) ** 0.5
        return jax.random.normal(key, shape, dtype) * std
    return init


class ConvBN(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    dilation: int = 1
    relu: bool = True
    init_mode: str = "fan_in"

    @nn.compact
    def __call__(self, x, train: bool = False):
        k, d = self.kernel, self.dilation
        pad = ((k - 1) // 2) * d
        # compute dtype follows the input (bf16 under the models'
        # compute_dtype policy): the conv runs on the MXU at bf16 rate while
        # params and BN statistics/normalization stay f32.  Without the
        # explicit dtype flax promotes the bf16 input back to the f32 params
        # and the whole network silently computes in f32.
        dtype = x.dtype
        x = nn.Conv(self.features, (k, k), strides=(self.stride, self.stride),
                    padding=((pad, pad), (pad, pad)),
                    kernel_dilation=(d, d), use_bias=False, dtype=dtype,
                    kernel_init=kaiming_init(self.init_mode), name="conv")(x)
        x = TorchBatchNorm(use_running_average=not train,
                           name="bn")(x).astype(dtype)
        if self.relu:
            x = nn.relu(x)
        return x


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1
    downsample: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        out = ConvBN(self.planes, 1, init_mode="fan_out", name="conv1")(x, train)
        out = ConvBN(self.planes, 3, self.stride, self.dilation,
                     init_mode="fan_out", name="conv2")(out, train)
        out = ConvBN(self.planes * 4, 1, relu=False, init_mode="fan_out",
                     name="conv3")(out, train)
        if self.downsample:
            residual = ConvBN(self.planes * 4, 1, self.stride, relu=False,
                              init_mode="fan_out", name="downsample")(x, train)
        return nn.relu(out + residual)


class ResNetBackbone(nn.Module):
    """ResNet-101 with output-stride dilation + MG unit."""
    layers: Sequence[int] = (3, 4, 23, 3)
    output_stride: int = 16

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.output_stride == 16:
            strides, dilations = [1, 2, 2, 1], [1, 1, 1, 2]
        elif self.output_stride == 8:
            strides, dilations = [1, 2, 1, 1], [1, 1, 2, 4]
        else:
            raise NotImplementedError(self.output_stride)

        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False, kernel_init=kaiming_init("fan_out"),
                    dtype=x.dtype, name="conv1")(x)
        x = TorchBatchNorm(use_running_average=not train,
                           name="bn1")(x).astype(x.dtype)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        def stage(x, planes, blocks, stride, dilation, name, multi_grid=None):
            for i in range(blocks):
                mg = multi_grid[i] if multi_grid else 1
                x = Bottleneck(planes,
                               stride=stride if i == 0 else 1,
                               dilation=dilation * mg,
                               downsample=(i == 0),
                               name=f"{name}_{i}")(x, train)
            return x

        x = stage(x, 64, self.layers[0], strides[0], dilations[0], "layer1")
        low_level = x
        x = stage(x, 128, self.layers[1], strides[1], dilations[1], "layer2")
        x = stage(x, 256, self.layers[2], strides[2], dilations[2], "layer3")
        # MG unit: dilations [1,2,4]*base (resnet.py:100-115)
        x = stage(x, 512, 3, strides[3], dilations[3], "layer4",
                  multi_grid=[1, 2, 4])
        return x, low_level


def _relu6(x):
    return jnp.minimum(jnp.maximum(x, 0), 6)


class InvertedResidual(nn.Module):
    """MobileNetV2 block with dilation (backbone/mobilenet.py:25-67).

    Reference quirk reproduced exactly: ``fixed_padding`` is applied to the
    BLOCK INPUT (mobilenet.py:61), so the padded border passes through the
    1x1 expand conv + BN (where it becomes NONZERO: relu6(beta - gamma*mean/
    sqrt(var))) before the padding-free depthwise conv consumes it — padding
    inside the depthwise conv with zeros instead is numerically different."""
    features: int
    stride: int = 1
    expand: int = 6
    dilation: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_ch = x.shape[-1]
        hidden = in_ch * self.expand
        use_res = self.stride == 1 and in_ch == self.features
        d = self.dilation
        out = jnp.pad(x, ((0, 0), (d, d), (d, d), (0, 0)))   # fixed_padding
        if self.expand != 1:
            out = ConvBN(hidden, 1, relu=False, name="expand")(out, train)
            out = _relu6(out)
        out = nn.Conv(hidden, (3, 3), strides=(self.stride, self.stride),
                      padding=((0, 0), (0, 0)),
                      kernel_dilation=(self.dilation, self.dilation),
                      feature_group_count=hidden, use_bias=False,
                      dtype=out.dtype,
                      kernel_init=kaiming_init("fan_out"), name="dw")(out)
        out = TorchBatchNorm(use_running_average=not train,
                             name="dw_bn")(out).astype(out.dtype)
        out = _relu6(out)
        out = ConvBN(self.features, 1, relu=False, name="project")(out, train)
        return x + out if use_res else out


class MobileNetBackbone(nn.Module):
    output_stride: int = 16

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = [  # t, c, n, s  (MobileNetV2 table, mobilenet.py:76-85)
            (1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2), (6, 64, 4, 2),
            (6, 96, 3, 1), (6, 160, 3, 2), (6, 320, 1, 1)]
        x = ConvBN(32, 3, stride=2, relu=False, name="stem")(x, train)
        x = _relu6(x)                                  # conv_bn ReLU6 stem
        # dilation is fixed PER STAGE with a pre-multiplied rate
        # (mobilenet.py:92-99): once current_stride hits output_stride, a
        # stage's blocks all share dilation=rate, and rate *= s afterwards
        current_stride, rate = 2, 1
        low_level = None
        for bi, (t, c, n, s) in enumerate(cfg):
            if current_stride == self.output_stride:
                stride0, dilation = 1, rate
                rate *= s
            else:
                stride0, dilation = s, 1
                current_stride *= s
            for i in range(n):
                x = InvertedResidual(c, stride0 if i == 0 else 1, t, dilation,
                                     name=f"block{bi}_{i}")(x, train)
            if bi == 1:
                low_level = x  # 24ch (decoder.py:14-15)
        return x, low_level


class ASPP(nn.Module):
    output_stride: int = 16

    @nn.compact
    def __call__(self, x, train: bool = False, deterministic: bool = True):
        d = [1, 6, 12, 18] if self.output_stride == 16 else [1, 12, 24, 36]
        b1 = ConvBN(256, 1, name="aspp1")(x, train)
        b2 = ConvBN(256, 3, dilation=d[1], name="aspp2")(x, train)
        b3 = ConvBN(256, 3, dilation=d[2], name="aspp3")(x, train)
        b4 = ConvBN(256, 3, dilation=d[3], name="aspp4")(x, train)
        # global pool accumulated in f32 (bf16 summation over the plane
        # would lose low bits); result back in the compute dtype
        gp = jnp.mean(x.astype(jnp.float32), axis=(1, 2),
                      keepdims=True).astype(x.dtype)
        gp = ConvBN(256, 1, name="global_pool")(gp, train)
        gp = jnp.broadcast_to(gp, b4.shape)  # 1x1 -> bilinear is a broadcast
        out = jnp.concatenate([b1, b2, b3, b4, gp], axis=-1)
        out = ConvBN(256, 1, name="proj")(out, train)
        out = nn.Dropout(0.5, deterministic=deterministic)(out)
        return out


class Decoder(nn.Module):
    num_classes: int

    @nn.compact
    def __call__(self, x, low_level, train: bool = False,
                 deterministic: bool = True):
        ll = ConvBN(48, 1, name="low_proj")(low_level, train)
        x = resize_bilinear_ac(x, ll.shape[1], ll.shape[2])
        x = jnp.concatenate([x, ll], axis=-1)
        x = ConvBN(256, 3, name="conv1")(x, train)
        x = nn.Dropout(0.5, deterministic=deterministic)(x)
        x = ConvBN(256, 3, name="conv2")(x, train)
        x = nn.Dropout(0.1, deterministic=deterministic)(x)
        x = nn.Conv(self.num_classes, (1, 1), use_bias=True, dtype=x.dtype,
                    kernel_init=kaiming_init(), name="classifier")(x)
        return x


class DeepLab(nn.Module):
    """backbone -> ASPP -> decoder -> align-corners upsample to input size."""
    backbone: str = "resnet"
    output_stride: int = 16
    num_classes: int = 21
    resnet_layers: Tuple[int, ...] = (3, 4, 23, 3)   # ResNet-101 default

    @nn.compact
    def __call__(self, x, train: bool = False, deterministic: bool = True):
        os_ = 8 if self.backbone == "drn" else self.output_stride
        if self.backbone == "resnet":
            feat, low = ResNetBackbone(layers=tuple(self.resnet_layers),
                                       output_stride=os_,
                                       name="backbone")(x, train)
        elif self.backbone == "mobilenet":
            feat, low = MobileNetBackbone(output_stride=os_,
                                          name="backbone")(x, train)
        elif self.backbone == "xception":
            from seg2eye_tpu.models.backbones_extra import XceptionBackbone
            feat, low = XceptionBackbone(output_stride=os_,
                                         name="backbone")(x, train)
        elif self.backbone == "drn":
            from seg2eye_tpu.models.backbones_extra import DRNBackbone
            feat, low = DRNBackbone(name="backbone")(x, train)
        else:
            raise NotImplementedError(f"backbone '{self.backbone}'")
        out = ASPP(output_stride=os_, name="aspp")(feat, train, deterministic)
        out = Decoder(self.num_classes, name="decoder")(
            out, low, train, deterministic)
        return resize_bilinear_ac(out, x.shape[1], x.shape[2])
