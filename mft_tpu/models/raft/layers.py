"""Encoder building blocks: norms, residual blocks, BasicEncoder/SmallEncoder.

Parity notes (reference MFT/RAFT/core/extractor.py):
- fnet uses InstanceNorm (torch InstanceNorm2d: affine=False, eps=1e-5,
  per-sample stats over H,W), cnet uses BatchNorm (eval mode -> running stats).
- All convs use torch-style explicit symmetric padding. We pass explicit
  (low, high) padding to flax so strided convs place their taps exactly like
  torch (XLA 'SAME' centers differ for stride 2).
- Layout is NHWC (TPU-native); weight conversion from torch checkpoints
  transposes OIHW -> HWIO (see convert.py).
"""

import jax
import jax.numpy as jnp
import flax.linen as nn


def _pad(k):
    """torch Conv2d padding=k//2 per spatial dim, as explicit (low, high)."""
    if isinstance(k, int):
        k = (k, k)
    return [(k[0] // 2, k[0] // 2), (k[1] // 2, k[1] // 2)]


class InstanceNorm(nn.Module):
    """torch nn.InstanceNorm2d(affine=False) equivalent: per-sample, per-channel
    normalization over the spatial dims, biased variance, eps=1e-5."""
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        # accumulate statistics in f32 even under bf16 compute
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=(-3, -2), keepdims=True)
        var = jnp.var(x32, axis=(-3, -2), keepdims=True)
        return (((x32 - mean) * jax.lax.rsqrt(var + self.epsilon))
                .astype(x.dtype))


def make_norm(norm_fn: str, features: int, train: bool = False,
              dtype=jnp.float32):
    """Instantiate the norm layer used inside encoder blocks.

    norm_fn in {'group', 'batch', 'instance', 'none'} — reference
    extractor.py:16-38. BatchNorm runs with running averages at inference
    (torch .eval()); group norm uses features//8 groups.
    """
    if norm_fn == "group":
        return nn.GroupNorm(num_groups=features // 8, epsilon=1e-5, dtype=dtype)
    if norm_fn == "batch":
        return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                            epsilon=1e-5, dtype=dtype)
    if norm_fn == "instance":
        return InstanceNorm()
    if norm_fn == "none":
        return lambda x: x
    raise ValueError(f"unknown norm_fn {norm_fn!r}")


class ResidualBlock(nn.Module):
    """Two 3x3 convs with norm+relu and optional strided downsample shortcut.

    Reference parity: extractor.py:6-56.
    """
    planes: int
    norm_fn: str = "group"
    stride: int = 1
    train: bool = False
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(self.planes, (3, 3), strides=self.stride, padding=_pad(3),
                    dtype=self.dtype, name="conv1")(x)
        y = make_norm(self.norm_fn, self.planes, self.train, self.dtype)(y)
        y = nn.relu(y)
        y = nn.Conv(self.planes, (3, 3), padding=_pad(3), dtype=self.dtype,
                    name="conv2")(y)
        y = make_norm(self.norm_fn, self.planes, self.train, self.dtype)(y)
        y = nn.relu(y)

        if self.stride != 1:
            x = nn.Conv(self.planes, (1, 1), strides=self.stride, padding="VALID",
                        dtype=self.dtype, name="downsample_conv")(x)
            x = make_norm(self.norm_fn, self.planes, self.train, self.dtype)(x)
        return nn.relu(x + y)


class BottleneckBlock(nn.Module):
    """1x1 -> 3x3(stride) -> 1x1 bottleneck used by SmallEncoder.

    Reference parity: extractor.py:60-116.
    """
    planes: int
    norm_fn: str = "group"
    stride: int = 1
    train: bool = False
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x):
        p4 = self.planes // 4
        y = nn.Conv(p4, (1, 1), padding="VALID", dtype=self.dtype, name="conv1")(x)
        y = make_norm(self.norm_fn, p4, self.train, self.dtype)(y)
        y = nn.relu(y)
        y = nn.Conv(p4, (3, 3), strides=self.stride, padding=_pad(3),
                    dtype=self.dtype, name="conv2")(y)
        y = make_norm(self.norm_fn, p4, self.train, self.dtype)(y)
        y = nn.relu(y)
        y = nn.Conv(self.planes, (1, 1), padding="VALID", dtype=self.dtype,
                    name="conv3")(y)
        y = make_norm(self.norm_fn, self.planes, self.train, self.dtype)(y)
        y = nn.relu(y)

        if self.stride != 1:
            x = nn.Conv(self.planes, (1, 1), strides=self.stride, padding="VALID",
                        dtype=self.dtype, name="downsample_conv")(x)
            x = make_norm(self.norm_fn, self.planes, self.train, self.dtype)(x)
        return nn.relu(x + y)


class BasicEncoder(nn.Module):
    """Stride-8 residual encoder: 7x7/2 stem, 3 stages (64, 96, 128), 1x1 head.

    Reference parity: extractor.py:118-195 (dropout omitted at inference; the
    training recipe freezes the encoders anyway, train.py:348-364).
    """
    output_dim: int = 128
    norm_fn: str = "batch"
    train: bool = False
    dropout: float = 0.0
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(64, (7, 7), strides=2, padding=_pad(7), dtype=self.dtype,
                    name="conv1")(x)
        x = make_norm(self.norm_fn, 64, self.train, self.dtype)(x)
        x = nn.relu(x)

        for i, (dim, stride) in enumerate([(64, 1), (96, 2), (128, 2)], start=1):
            x = ResidualBlock(dim, self.norm_fn, stride=stride, train=self.train,
                              dtype=self.dtype, name=f"layer{i}_0")(x)
            x = ResidualBlock(dim, self.norm_fn, stride=1, train=self.train,
                              dtype=self.dtype, name=f"layer{i}_1")(x)

        x = nn.Conv(self.output_dim, (1, 1), padding="VALID", dtype=self.dtype,
                    name="conv2")(x)
        if self.train and self.dropout > 0:
            x = nn.Dropout(self.dropout, deterministic=False)(x)
        return x


class SmallEncoder(nn.Module):
    """Bottleneck variant (32, 64, 96) for the 'small' RAFT.

    Reference parity: extractor.py:198-270.
    """
    output_dim: int = 128
    norm_fn: str = "batch"
    train: bool = False
    dropout: float = 0.0
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(32, (7, 7), strides=2, padding=_pad(7), dtype=self.dtype,
                    name="conv1")(x)
        x = make_norm(self.norm_fn, 32, self.train, self.dtype)(x)
        x = nn.relu(x)

        for i, (dim, stride) in enumerate([(32, 1), (64, 2), (96, 2)], start=1):
            x = BottleneckBlock(dim, self.norm_fn, stride=stride, train=self.train,
                                dtype=self.dtype, name=f"layer{i}_0")(x)
            x = BottleneckBlock(dim, self.norm_fn, stride=1, train=self.train,
                                dtype=self.dtype, name=f"layer{i}_1")(x)

        x = nn.Conv(self.output_dim, (1, 1), padding="VALID", dtype=self.dtype,
                    name="conv2")(x)
        if self.train and self.dropout > 0:
            x = nn.Dropout(self.dropout, deterministic=False)(x)
        return x
