"""ResNet50 feature extractor for image-to-image retrieval.

The reference uses torchvision resnet50 minus the FC head as a frozen 2048-d
global feature extractor (reference im2im_retrieval.py:12-42). Same
architecture here in functional JAX (NHWC, lax.conv on the MXU, frozen
inference-mode batchnorm folded to scale/shift). Weights: converted
torchvision checkpoint when available, else seeded init — the retrieval
protocol (cosine top-k over corpus features) is weight-agnostic.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class ResNetConfig:
    stage_sizes: Sequence[int] = (3, 4, 6, 3)     # resnet50
    width: int = 64
    compute_dtype: str = "bfloat16"

    @property
    def feature_dim(self) -> int:
        # final stage channels x bottleneck expansion (2048 for resnet50)
        return self.width * (2 ** (len(self.stage_sizes) - 1)) * 4


RESNET_TEST = ResNetConfig(stage_sizes=(1, 1), width=8)


def _conv_init(key, kh, kw, cin, cout):
    fan_in = kh * kw * cin
    std = (2.0 / fan_in) ** 0.5
    return jax.random.normal(key, (kh, kw, cin, cout)) * std


def _bn_init(c):
    # inference-mode BN folded to scale/shift
    return {"scale": jnp.ones((c,), jnp.float32),
            "shift": jnp.zeros((c,), jnp.float32)}


def _bottleneck_init(key, cin, cmid, stride):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    cout = cmid * 4
    p = {
        "conv1": _conv_init(k1, 1, 1, cin, cmid), "bn1": _bn_init(cmid),
        "conv2": _conv_init(k2, 3, 3, cmid, cmid), "bn2": _bn_init(cmid),
        "conv3": _conv_init(k3, 1, 1, cmid, cout), "bn3": _bn_init(cout),
    }
    if stride != 1 or cin != cout:
        p["proj"] = _conv_init(k4, 1, 1, cin, cout)
        p["bn_proj"] = _bn_init(cout)
    return p


def init_resnet(key: jax.Array, cfg: ResNetConfig = ResNetConfig()) -> dict:
    keys = jax.random.split(key, 1 + sum(cfg.stage_sizes))
    p = {"stem": _conv_init(keys[0], 7, 7, 3, cfg.width),
         "bn_stem": _bn_init(cfg.width), "blocks": []}
    cin = cfg.width
    ki = 1
    for stage, n in enumerate(cfg.stage_sizes):
        cmid = cfg.width * (2 ** stage)
        for b in range(n):
            stride = 2 if (b == 0 and stage > 0) else 1
            p["blocks"].append(
                _bottleneck_init(keys[ki], cin, cmid, stride))
            cin = cmid * 4
            ki += 1
    return p


def block_strides(cfg: ResNetConfig) -> list[int]:
    """Static per-block strides (kept out of the params pytree so params can
    be jit arguments without tracing ints)."""
    out = []
    for stage, n in enumerate(cfg.stage_sizes):
        for b in range(n):
            out.append(2 if (b == 0 and stage > 0) else 1)
    return out


def _conv(x, w, stride=1, dtype=jnp.bfloat16):
    return jax.lax.conv_general_dilated(
        x.astype(dtype), w.astype(dtype),
        window_strides=(stride, stride), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ).astype(dtype)


def _bn(p, x):
    return (x.astype(jnp.float32) * p["scale"] + p["shift"]).astype(x.dtype)


def resnet_features(params: dict, images: jax.Array,
                    cfg: ResNetConfig = ResNetConfig()) -> jax.Array:
    """(B, H, W, 3) normalized float -> (B, feature_dim) f32 global features."""
    dtype = jnp.dtype(cfg.compute_dtype)
    x = _conv(images, params["stem"], stride=2, dtype=dtype)
    x = jax.nn.relu(_bn(params["bn_stem"], x))
    x = jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1), "SAME")
    for p, stride in zip(params["blocks"], block_strides(cfg)):
        r = x
        h = jax.nn.relu(_bn(p["bn1"], _conv(x, p["conv1"], 1, dtype)))
        h = jax.nn.relu(_bn(p["bn2"], _conv(h, p["conv2"], stride, dtype)))
        h = _bn(p["bn3"], _conv(h, p["conv3"], 1, dtype))
        if "proj" in p:
            r = _bn(p["bn_proj"], _conv(x, p["proj"], stride, dtype))
        x = jax.nn.relu(h + r)
    return jnp.mean(x.astype(jnp.float32), axis=(1, 2))


def load_torchvision_state_dict(state_dict: dict,
                                cfg: ResNetConfig = ResNetConfig()) -> dict:
    """Map torchvision resnet50 state dict (numpy values) to our tree,
    folding BN running stats into inference scale/shift."""
    def conv(name):
        w = np.asarray(state_dict[f"{name}.weight"])    # (out, in, kh, kw)
        return jnp.asarray(w.transpose(2, 3, 1, 0))     # HWIO

    def bn(name, eps=1e-5):
        g = np.asarray(state_dict[f"{name}.weight"])
        b = np.asarray(state_dict[f"{name}.bias"])
        mean = np.asarray(state_dict[f"{name}.running_mean"])
        var = np.asarray(state_dict[f"{name}.running_var"])
        scale = g / np.sqrt(var + eps)
        return {"scale": jnp.asarray(scale),
                "shift": jnp.asarray(b - mean * scale)}

    p = {"stem": conv("conv1"), "bn_stem": bn("bn1"), "blocks": []}
    for stage, n in enumerate(cfg.stage_sizes):
        for b in range(n):
            pre = f"layer{stage + 1}.{b}"
            blk = {
                "conv1": conv(f"{pre}.conv1"), "bn1": bn(f"{pre}.bn1"),
                "conv2": conv(f"{pre}.conv2"), "bn2": bn(f"{pre}.bn2"),
                "conv3": conv(f"{pre}.conv3"), "bn3": bn(f"{pre}.bn3"),
            }
            if f"{pre}.downsample.0.weight" in state_dict:
                blk["proj"] = conv(f"{pre}.downsample.0")
                blk["bn_proj"] = bn(f"{pre}.downsample.1")
            p["blocks"].append(blk)
    return p
