"""Registration tests: scipy/skimage-parity for warp, shift recovery for
phase correlation (reference behavior: process-images.py:515-565)."""

import numpy as np
import jax.numpy as jnp
import pytest
import scipy.ndimage as ndi

from rgnir_tpu.register import (
    align_images,
    bilinear_shift_2d,
    luminance,
    phase_correlation_shift,
    shift_image,
)


def _texture(rng, h=96, w=128):
    base = rng.normal(size=(h // 8, w // 8))
    img = np.kron(base, np.ones((8, 8)))
    img += rng.normal(0, 0.05, size=img.shape)
    return img.astype(np.float32)


class TestWarp:
    @pytest.mark.parametrize("shift", [(0, 0), (3, -5), (0.5, 0.25), (-2.75, 4.5)])
    def test_vs_scipy_2d(self, rng, shift):
        img = _texture(rng)
        got = np.asarray(bilinear_shift_2d(jnp.asarray(img), shift[0], shift[1]))
        want = ndi.shift(img, shift, order=1, mode="reflect")
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_vs_scipy_3d(self, rng):
        """The reference shifts HWC images with a (dy, dx, 0) vector
        (process-images.py:554-559)."""
        img = rng.random((40, 50, 3)).astype(np.float32)
        got = np.asarray(shift_image(jnp.asarray(img), jnp.asarray([1.5, -2.25, 0.0])))
        want = ndi.shift(img, (1.5, -2.25, 0.0), order=1, mode="reflect")
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_large_shift_reflect(self, rng):
        img = _texture(rng, 16, 16)
        got = np.asarray(bilinear_shift_2d(jnp.asarray(img), 20.0, -18.0))
        want = ndi.shift(img, (20.0, -18.0), order=1, mode="reflect")
        np.testing.assert_allclose(got, want, atol=1e-5)


class TestLuminance:
    def test_uint8_parity(self, rgnir_image):
        got = np.asarray(luminance(jnp.asarray(rgnir_image)))
        x = rgnir_image.astype(np.float32) / 255.0
        want = 0.2125 * x[..., 0] + 0.7154 * x[..., 1] + 0.0721 * x[..., 2]
        np.testing.assert_allclose(got, want, atol=1e-6)
        assert got.min() >= 0.0 and got.max() <= 1.0


class TestPhaseCorrelation:
    @pytest.mark.parametrize("dy,dx", [(0, 0), (5, 3), (-7, 11), (20, -15)])
    def test_recovers_integer_shift(self, rng, dy, dx):
        fixed = _texture(rng)
        moving = np.roll(fixed, (-dy, -dx), axis=(0, 1))
        got = np.asarray(phase_correlation_shift(jnp.asarray(fixed), jnp.asarray(moving)))
        assert got[0] == dy and got[1] == dx, (got, (dy, dx))

    def test_subpixel_close(self, rng):
        img = _texture(rng)
        moving = ndi.shift(img, (-2.5, 1.5), order=1, mode="reflect")
        got = np.asarray(
            phase_correlation_shift(
                jnp.asarray(img), jnp.asarray(moving), subpixel=True
            )
        )
        assert abs(got[0] - 2.5) < 0.6 and abs(got[1] + 1.5) < 0.6

    @pytest.mark.parametrize("dy,dx", [(2.3, -1.7), (-0.4, 5.9)])
    def test_upsampled_dft_subpixel(self, rng, dy, dx):
        """skimage upsample_factor capability: recover an exact circular
        subpixel shift (applied as a spectrum phase ramp) to 1/10 px."""
        img = _texture(rng)
        h, w = img.shape
        fy = np.fft.fftfreq(h)[:, None]
        fx = np.fft.fftfreq(w)[None, :]
        ramp = np.exp(-2j * np.pi * (dy * fy + dx * fx))
        moving = np.real(np.fft.ifft2(np.fft.fft2(img) * ramp)).astype(
            np.float32
        )  # moving = img shifted by +(dy,dx); the function returns the
        # shift to APPLY to moving, i.e. -(dy,dx)
        got = np.asarray(
            phase_correlation_shift(
                jnp.asarray(img), jnp.asarray(moving), upsample_factor=10
            )
        )
        assert abs(got[0] + dy) <= 0.1 and abs(got[1] + dx) <= 0.1, got


class TestAlignImages:
    def test_end_to_end(self, rng):
        gray = _texture(rng)
        fixed = np.stack([gray, gray * 0.8, gray * 1.2], axis=-1)
        fixed = np.clip(fixed * 120 + 60, 0, 255).astype(np.uint8)
        moving = np.roll(fixed, (-4, 6), axis=(0, 1))
        aligned, shift = align_images(jnp.asarray(fixed), jnp.asarray(moving))
        assert tuple(np.asarray(shift)) == (4.0, -6.0)
        # interior agrees after alignment (borders reflect-filled)
        a = np.asarray(aligned)[10:-10, 10:-10]
        f = fixed[10:-10, 10:-10].astype(np.float32)
        assert np.abs(a - f).mean() < 1.0


class TestLocalRefinement:
    """Tiled local shift refinement (register.local) — non-rigid
    alignment the reference's single rigid translation cannot express."""

    def test_constant_field_matches_global_warp(self, rng):
        from rgnir_tpu.register import warp_with_field

        img = _texture(rng, 64, 96)
        field = jnp.broadcast_to(jnp.asarray([2.5, -1.25], jnp.float32),
                                 (2, 3, 2))
        got = np.asarray(warp_with_field(jnp.asarray(img), field, (32, 32)))
        want = np.asarray(bilinear_shift_2d(jnp.asarray(img), 2.5, -1.25))
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_field_recovers_piecewise_shift(self, rng):
        from rgnir_tpu.register import local_shift_field

        img = _texture(rng, 128, 128)
        # top half rolled by (2, 1), bottom half by (-3, 2)
        moving = img.copy()
        moving[:64] = np.roll(img[:64], (2, 1), axis=(0, 1))
        moving[64:] = np.roll(img[64:], (-3, 2), axis=(0, 1))
        field = np.asarray(local_shift_field(
            jnp.asarray(img), jnp.asarray(moving), tile=(64, 64)
        ))
        assert field.shape == (2, 2, 2)
        # aligning moving back means shift = -roll per half
        np.testing.assert_array_equal(field[0, 0], [-2.0, -1.0])
        np.testing.assert_array_equal(field[0, 1], [-2.0, -1.0])
        np.testing.assert_array_equal(field[1, 0], [3.0, -2.0])
        np.testing.assert_array_equal(field[1, 1], [3.0, -2.0])

    def test_max_shift_clamps(self, rng):
        from rgnir_tpu.register import local_shift_field

        a = _texture(rng, 64, 64)
        b = _texture(rng, 64, 64)  # unrelated -> junk estimates
        field = np.asarray(local_shift_field(
            jnp.asarray(a), jnp.asarray(b), tile=(32, 32), max_shift=2.0
        ))
        assert np.all(np.abs(field) <= 2.0)

    def test_interpolate_field_hits_centers(self):
        from rgnir_tpu.register.local import interpolate_field

        field = jnp.asarray(
            np.arange(2 * 3 * 2, dtype=np.float32).reshape(2, 3, 2)
        )
        out = np.asarray(interpolate_field(field, 64, 96, (32, 32)))
        # tile centers: rows 15.5/47.5 -> between pixels; check pixel
        # rows 15 and 16 straddle the exact field value
        for tyi, rows in ((0, (15, 16)), (1, (47, 48))):
            for txi, cols in ((0, (15, 16)), (1, (47, 48)), (2, (79, 80))):
                want = np.asarray(field[tyi, txi])
                got = (out[rows[0], cols[0]] + out[rows[1], cols[1]]) / 2
                np.testing.assert_allclose(got, want, atol=0.55)

    def test_align_images_local_nonrigid(self, rng):
        """A smoothly-varying synthetic warp: global alignment leaves
        large residuals, the tiled field recovers them."""
        from rgnir_tpu.register import align_images, align_images_local

        h, w = 256, 256
        img = _texture(rng, h, w)
        # ground-truth smooth field: dy ramps -3 -> +3 down the image,
        # dx constant 2; generate moving by inverse-warping img
        yy = np.arange(h, dtype=np.float32)[:, None]
        dy_true = -3.0 + 6.0 * yy / (h - 1)
        from scipy.ndimage import map_coordinates

        gy, gx = np.mgrid[0:h, 0:w].astype(np.float32)
        # moving[y, x] = img[y + dy_true(y), x + 2]: aligning moving
        # back requires shifting by (dy_true, 2) at each pixel
        moving = map_coordinates(
            img, [gy + dy_true, gx + 2.0], order=1, mode="reflect"
        ).astype(np.float32)

        glob, _ = align_images(jnp.asarray(img), jnp.asarray(moving))
        loc, g, field = align_images_local(
            jnp.asarray(img), jnp.asarray(moving), tile=(64, 64),
        )
        glob = np.asarray(glob)
        loc = np.asarray(loc)
        # Compare interiors (boundary reflect regions differ by design).
        sl = (slice(16, -16), slice(16, -16))
        err_glob = np.abs(glob[sl] - img[sl]).mean()
        err_loc = np.abs(loc[sl] - img[sl]).mean()
        assert err_loc < err_glob * 0.55, (err_loc, err_glob)
        # field rows track the ramp: top tiles near -(-3)? sign check —
        # aligning back means field ~ (dy_true, 2) at tile centers
        f = np.asarray(field)
        assert f[0, 0, 0] < f[-1, 0, 0]  # monotone ramp recovered
        np.testing.assert_allclose(f[..., 1], 2.0, atol=0.75)

    def test_large_global_shift_border_tiles_clean(self, rng):
        """A rigid shift larger than the residual clamp: pre-alignment
        uses reflect indexing, so border tiles see no wrapped content
        and the recovered field is the global shift EVERYWHERE
        (regression: jnp.roll pre-alignment contaminated edge tiles)."""
        from rgnir_tpu.register import align_images_local

        gy, gx = 20, -12
        s = 32
        scene = _texture(rng, 128 + 2 * s, 128 + 2 * s)
        fixed = scene[s:s + 128, s:s + 128]
        # true mapping: moving[y, x] = fixed[y - gy, x - gx]
        moving = scene[s - gy:s - gy + 128, s - gx:s - gx + 128]
        aligned, g, field = align_images_local(
            jnp.asarray(fixed), jnp.asarray(moving), tile=(32, 32)
        )
        # g is the shift to APPLY to moving (scipy convention): the
        # negative of the content displacement baked in above.
        assert tuple(np.asarray(g)) == (float(-gy), float(-gx))
        f = np.asarray(field)
        np.testing.assert_allclose(f[..., 0], -gy, atol=1.0)
        np.testing.assert_allclose(f[..., 1], -gx, atol=1.0)

    def test_nondivisible_shape(self, rng):
        """Tile grid covers edge-padded remainders; output keeps the
        input shape."""
        from rgnir_tpu.register import align_images_local

        img = _texture(rng, 100, 75)  # helper rounds to (96, 72)
        moving = np.roll(img, (2, -1), axis=(0, 1))
        aligned, g, field = align_images_local(
            jnp.asarray(img), jnp.asarray(moving), tile=(32, 32)
        )
        assert aligned.shape == img.shape == (96, 72)
        assert field.shape == (3, 3, 2)  # 72 cols pad up to 3 tiles
        assert tuple(np.asarray(g)) == (-2.0, 1.0)
        interior = np.asarray(aligned)[8:-8, 8:-8] - img[8:-8, 8:-8]
        assert np.abs(interior).max() < 0.35
