"""Hand-derived Pallas backward for the Swinv2 window-attention kernel
(ops/swin_attention._bwd_kernel, interpret mode here): full swin_forward
gradients with fused_attn=True must equal the einsum path's — including
the CPB (continuous position bias) MLP parameters, whose cotangent flows
through the kernel's accumulated dbias output.
"""

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

from mmd_tpu.models import swin as S


def test_swin_fused_bwd_matches_einsum(rng):
    cfg = S.SwinConfig(image_size=64, patch_size=4, embed_dim=128,
                       depths=(2,), num_heads=(4,), window_size=8,
                       pretrained_window_sizes=(0,),
                       compute_dtype="float32")
    assert cfg.stage_window_shift(0, 1)[1] > 0        # shifted block too
    params = S.init_swin(jax.random.key(3), cfg)
    imgs = jnp.asarray(rng.standard_normal((2, 64, 64, 3)), jnp.float32)

    def loss(p, x, fused):
        # fused_train=True selects the differentiable custom_vjp kernel;
        # plain fused_attn=True routes to the serving-only in-kernel-
        # normalize variant, which has no VJP by design (the trainer
        # gates fused_attn off when fine-tuning with fused_train=False).
        c = dataclasses.replace(cfg, fused_attn=fused, fused_train=fused)
        return jnp.sum(S.swin_forward(p, c, x) ** 2)

    lf, gf = jax.value_and_grad(lambda p, x: loss(p, x, True),
                                argnums=(0, 1))(params, imgs)
    lj, gj = jax.value_and_grad(lambda p, x: loss(p, x, False),
                                argnums=(0, 1))(params, imgs)
    np.testing.assert_allclose(float(lf), float(lj), rtol=1e-5)
    import jax.tree_util as jtu
    for (path, a), (_, b) in zip(jtu.tree_flatten_with_path(gf)[0],
                                 jtu.tree_flatten_with_path(gj)[0]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=2e-4,
                                   err_msg=jtu.keystr(path))
