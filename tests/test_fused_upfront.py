"""Exactness test: fused up+conv == upsample2 -> stride-2 conv."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from jarvis_hybridnet_tpu.models.repro import upsample_trilinear
from jarvis_hybridnet_tpu.ops.fused_upfront import fused_up_conv3d


@pytest.mark.parametrize("L,cin,cout", [(8, 3, 5), (12, 4, 4)])
def test_fused_matches_unfused(L, cin, cout):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, L, L, L, cin)).astype(np.float32)
    kernel = rng.standard_normal((3, 3, 3, cin, cout)).astype(np.float32)
    bias = rng.standard_normal((cout,)).astype(np.float32)

    # unfused reference: trilinear 2x upsample then stride-2 pad-1 conv
    up = jnp.moveaxis(
        upsample_trilinear(jnp.moveaxis(jnp.asarray(x), 4, 1), 2 * L), 1, 4
    )
    ref = jax.lax.conv_general_dilated(
        up, jnp.asarray(kernel), window_strides=(2, 2, 2),
        padding=[(1, 1)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    ) + bias

    out = fused_up_conv3d(jnp.asarray(x), jnp.asarray(kernel),
                          jnp.asarray(bias))
    assert out.shape == ref.shape == (2, L, L, L, cout)
    err = np.abs(np.asarray(out) - np.asarray(ref)).max()
    scale = np.abs(np.asarray(ref)).max()
    assert err < 1e-4 * scale, err


def test_fused_vjp_matches_unfused():
    """Gradients of the fused op == gradients of upsample2 -> stride-2 conv.

    Regression test for the 'all'-mode training NaN: the original
    formulation ran the boundary corrections as rank-5 convs with size-1
    spatial dims, whose *input gradient* the TPU backend miscompiles into
    deterministic NaNs (finite forward, all-linear op). The corrections now
    run at squeezed rank; this pins both finiteness and exactness of the
    whole vjp against the unfused composition.
    """
    rng = np.random.default_rng(1)
    L, cin, cout = 10, 3, 4
    x = jnp.asarray(rng.standard_normal((2, L, L, L, cin)).astype(np.float32))
    kernel = jnp.asarray(
        rng.standard_normal((3, 3, 3, cin, cout)).astype(np.float32))
    bias = jnp.asarray(rng.standard_normal((cout,)).astype(np.float32))

    def unfused(xx, kk, bb):
        up = jnp.moveaxis(
            upsample_trilinear(jnp.moveaxis(xx, 4, 1), 2 * L), 1, 4)
        return jax.lax.conv_general_dilated(
            up, kk, window_strides=(2, 2, 2), padding=[(1, 1)] * 3,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        ) + bb

    out_f, vjp_f = jax.vjp(fused_up_conv3d, x, kernel, bias)
    out_u, vjp_u = jax.vjp(unfused, x, kernel, bias)
    ct = jnp.asarray(rng.standard_normal(out_f.shape).astype(np.float32))
    grads_f = jax.jit(vjp_f)(ct)
    grads_u = jax.jit(vjp_u)(ct)
    for gf, gu, name in zip(grads_f, grads_u, ("x", "kernel", "bias")):
        gf, gu = np.asarray(gf), np.asarray(gu)
        assert np.isfinite(gf).all(), f"non-finite d/d{name}"
        scale = max(np.abs(gu).max(), 1.0)
        assert np.abs(gf - gu).max() < 1e-4 * scale, name


def test_hybridnet_half_fused_matches_half(example_dataset):
    """Full HybridNet forward: 'half_fused' == 'half' with shared params."""
    from jarvis_hybridnet_tpu.models.hybridnet import HybridNetBackbone
    from jarvis_hybridnet_tpu.utils.calibration import load_camera_rigs

    rig = load_camera_rigs(str(example_dataset))["12Cam_Ralph"]
    C, J, S, cube, spacing = 4, 3, 64, 32, 2
    rng = np.random.default_rng(0)
    imgs = rng.standard_normal((1, C, S, S, 3)).astype(np.float32)
    center3d = np.array([[4, 100, 500]], np.int32)
    center_hm = np.full((1, C, 2), 512, np.int32)
    P = rig.camera_matrices[None, :C]
    K = rig.intrinsics[None, :C]
    D = rig.distortions[None, :C]

    models = {
        m: HybridNetBackbone(num_joints=J, model_size="small",
                             roi_cube_size=cube, grid_spacing=spacing,
                             repro_mode=m)
        for m in ("half", "half_fused")
    }
    params = jax.jit(models["half"].init)(
        jax.random.PRNGKey(0), imgs, center_hm, center3d, P, K, D
    )["params"]
    # identical parameter trees (fused front conv shares names/shapes)
    init_fused = jax.jit(models["half_fused"].init)(
        jax.random.PRNGKey(0), imgs, center_hm, center3d, P, K, D
    )["params"]
    assert jax.tree.structure(params) == jax.tree.structure(init_fused)

    outs = {
        m: jax.jit(models[m].apply)({"params": params}, imgs, center_hm, center3d,
                           P, K, D)
        for m in models
    }
    pts_a, pts_b = np.asarray(outs["half"][2]), np.asarray(outs["half_fused"][2])
    assert np.abs(pts_a - pts_b).max() < 1e-2, np.abs(pts_a - pts_b).max()
    vol_a = np.asarray(outs["half"][0])
    vol_b = np.asarray(outs["half_fused"][0])
    assert np.abs(vol_a - vol_b).max() < 1e-3 * max(vol_a.max(), 1.0)
