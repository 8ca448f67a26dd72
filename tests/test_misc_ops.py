"""sp_trilinear, encoder factory, trunc_exp, diff-aug, visualization."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from scenedreamer_tpu.ops.encoders import get_encoder, trunc_exp
from scenedreamer_tpu.ops.sp_trilinear import (build_corner_lut,
                                               sp_trilinear_worldcoord)
from scenedreamer_tpu.utils.diff_aug import apply_diff_aug
from scenedreamer_tpu.utils.visualization import (colormap, image_grid,
                                                  tensor2im, tensor2label)


def test_sp_trilinear_matches_dense_reference():
    rng = np.random.default_rng(0)
    voxel = (rng.random((4, 5, 6)) < 0.6).astype(np.int32)
    lut, n = build_corner_lut(voxel)
    feats = jnp.asarray(rng.normal(size=(n + 1, 3)).astype(np.float32))
    pts = rng.uniform(0.2, 3.5, (50, 3)).astype(np.float32)

    out = sp_trilinear_worldcoord(feats, jnp.asarray(lut),
                                  jnp.asarray(pts))

    # dense python reference
    exp = np.zeros((50, 3), np.float32)
    f_np = np.asarray(feats)
    for i, p in enumerate(pts):
        base = np.floor(p).astype(int)
        frac = p - base
        acc = np.zeros(3, np.float32)
        for cy in (0, 1):
            for cx in (0, 1):
                for cz in (0, 1):
                    cc = np.clip(base + [cy, cx, cz], 0,
                                 np.array(lut.shape) - 1)
                    w = ((frac[0] if cy else 1 - frac[0])
                         * (frac[1] if cx else 1 - frac[1])
                         * (frac[2] if cz else 1 - frac[2]))
                    acc += w * f_np[lut[tuple(cc)]]
        exp[i] = acc
    np.testing.assert_allclose(np.asarray(out), exp, rtol=1e-4,
                               atol=1e-5)


def test_sp_trilinear_nan_and_ignzero():
    voxel = np.ones((2, 2, 2), np.int32)
    lut, n = build_corner_lut(voxel)
    feats = jnp.ones((n + 1, 2))
    pts = jnp.asarray([[np.nan, 0.5, 0.5], [0.5, 0.5, 0.5]],
                      jnp.float32)
    out = sp_trilinear_worldcoord(feats, jnp.asarray(lut), pts,
                                  ign_zero=True)
    np.testing.assert_allclose(np.asarray(out[0]), 0.0)
    assert np.asarray(out[1]).max() > 0

    # gradient reaches feats but not coords
    def loss(f, p):
        return jnp.sum(sp_trilinear_worldcoord(f, jnp.asarray(lut), p))
    gf = jax.grad(loss, argnums=0)(feats, pts)
    gp = jax.grad(loss, argnums=1)(feats, pts)
    assert float(jnp.abs(gf).sum()) > 0
    np.testing.assert_allclose(np.asarray(gp), 0.0)


def test_trunc_exp_grad_clamped():
    g = jax.grad(lambda x: trunc_exp(x))(30.0)
    assert np.isfinite(g) and g == pytest.approx(np.exp(15.0))
    assert float(trunc_exp(2.0)) == pytest.approx(np.exp(2.0))


def test_get_encoder_variants():
    fn, dim, spec = get_encoder('frequency', input_dim=3, degree=2)
    out = fn(jnp.ones((4, 3)))
    assert out.shape == (4, dim) and dim == 3 + 3 * 4

    fn, dim, spec = get_encoder('hashgrid', input_dim=3, num_levels=4,
                                level_dim=2, log2_hashmap_size=8,
                                desired_resolution=64)
    table = jnp.zeros((spec.table_size, 2))
    out = fn(table, jnp.zeros((4, 3)))
    assert out.shape == (4, 8)

    fn, dim, spec = get_encoder('None', input_dim=5)
    assert fn(jnp.ones((2, 5))).shape == (2, 5) and dim == 5

    # varhashgrid (`grid.py:158-224` VarGridEncoder): external rows
    # prepended to the owned table must be equivalent to one flat table.
    fn, dim, spec = get_encoder('varhashgrid', input_dim=3, num_levels=4,
                                level_dim=2, log2_hashmap_size=8,
                                desired_resolution=64)
    full_fn, _, _ = get_encoder('hashgrid', input_dim=3, num_levels=4,
                                level_dim=2, log2_hashmap_size=8,
                                desired_resolution=64)
    rng = np.random.default_rng(3)
    full = jnp.asarray(rng.normal(size=(spec.table_size, 2))
                       .astype(np.float32))
    x = jnp.asarray(rng.uniform(-1, 1, (6, 3)).astype(np.float32))
    n_ext = 32
    out_var = fn(full[n_ext:], full[:n_ext], x)
    assert out_var.shape == (6, dim)
    np.testing.assert_allclose(np.asarray(out_var),
                               np.asarray(full_fn(full, x)), rtol=1e-6)


def test_diff_aug_policies():
    x = jnp.asarray(np.random.default_rng(0)
                    .uniform(-1, 1, (2, 16, 16, 3)).astype(np.float32))
    key = jax.random.PRNGKey(0)
    assert apply_diff_aug(x, key, '') is x
    y = apply_diff_aug(x, key, 'color,translation,cutout')
    assert y.shape == x.shape
    assert np.isfinite(np.asarray(y)).all()
    assert np.abs(np.asarray(y) - np.asarray(x)).max() > 0
    # gradients flow through the augmentation
    g = jax.grad(lambda im: jnp.sum(
        apply_diff_aug(im, key, 'color,translation') ** 2))(x)
    assert np.isfinite(np.asarray(g)).all()


def test_visualization_helpers():
    lbl = np.random.default_rng(0).integers(0, 5, (8, 8))
    rgb = tensor2label(lbl, 5)
    assert rgb.shape == (8, 8, 3) and rgb.dtype == np.uint8
    onehot = np.eye(5, dtype=np.float32)[lbl]
    rgb2 = tensor2label(onehot)
    np.testing.assert_array_equal(rgb, rgb2)
    im = tensor2im(np.zeros((4, 4, 3)))
    assert im.dtype == np.uint8 and (im == 127).all()
    d = colormap(np.array([[0.0, 1.0], [np.nan, 0.5]]))
    assert d.shape == (2, 2, 3) and np.isfinite(d).all()
    grid = image_grid([im, im, im], cols=2)
    assert grid.shape == (8, 8, 3)


def test_tensor2flow_colorwheel():
    """Flow -> RGB: zero flow maps to a constant image; pure +x flow and
    pure +y flow get distinct hues; batched input returns a list."""
    from scenedreamer_tpu.utils import visualization as vz
    z = np.zeros((8, 8, 2), np.float32)
    rgb0 = vz.tensor2flow(z)
    assert rgb0.shape == (8, 8, 3) and rgb0.dtype == np.uint8
    ramp = np.linspace(0, 2, 64, dtype=np.float32).reshape(8, 8)
    fx = np.zeros((8, 8, 2), np.float32)
    fx[..., 0] = ramp
    fy = np.zeros((8, 8, 2), np.float32)
    fy[..., 1] = ramp
    rx, ry = vz.tensor2flow(fx), vz.tensor2flow(fy)
    assert not np.array_equal(rx, ry)
    batched = vz.tensor2flow(np.stack([fx, fy]))
    assert isinstance(batched, list) and len(batched) == 2
    assert vz.tensor2flow(None) is None


def test_tensor2pilimage_save_and_keypoints(tmp_path):
    from scenedreamer_tpu.utils import visualization as vz
    img = np.random.default_rng(0).uniform(-1, 1, (16, 12, 3)).astype(
        np.float32)
    pil = vz.tensor2pilimage(img, minus1to1_normalized=True)
    assert pil.size == (12, 16)
    pil2 = vz.tensor2pilimage((img + 1) / 2, width=24, height=32)
    assert pil2.size == (24, 32)
    out = str(tmp_path / 'sub' / 'img.png')
    vz.save_tensor_image(out, img, minus1to1_normalized=True)
    import os
    assert os.path.exists(out)
    base = np.zeros((32, 32, 3), np.uint8)
    drawn = vz.plot_keypoints(base, np.array([[5.0, 7.0], [20.0, 10.0]]))
    assert drawn[7, 5, 1] == 255 and drawn[10, 20, 1] == 255
    assert drawn[31, 31, 1] == 0
