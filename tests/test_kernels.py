import numpy as np
import pytest

from greenocr_ray import kernels


def test_grayscale_shapes_and_range():
    rgb = np.random.default_rng(0).integers(0, 256, (10, 12, 3), dtype=np.uint8)
    g = kernels.to_grayscale(rgb)
    assert g.shape == (10, 12) and g.dtype == np.float32
    assert 0.0 <= g.min() and g.max() <= 1.0
    # RGBA composites over white: fully transparent -> white
    rgba = np.zeros((4, 4, 4), dtype=np.uint8)
    assert np.allclose(kernels.to_grayscale(rgba), 1.0)
    # grayscale passthrough
    assert np.allclose(kernels.to_grayscale(np.full((3, 3), 128, np.uint8)), 128 / 255)


def test_resize_keep_aspect():
    img = np.zeros((32, 100), dtype=np.float32)
    out = kernels.resize_keep_aspect(img, target_h=64)
    assert out.shape == (64, 200)  # new_w = w * 64/h (exe_t.py:211-219)


def test_resize_bilinear_identity_and_constant():
    img = np.random.default_rng(1).random((7, 9)).astype(np.float32)
    assert np.array_equal(kernels.resize_bilinear(img, 7, 9), img)
    const = np.full((5, 5), 0.3, np.float32)
    assert np.allclose(kernels.resize_bilinear(const, 11, 13), 0.3, atol=1e-6)


def test_percentile_stretch():
    img = np.linspace(0.4, 0.6, 100, dtype=np.float32).reshape(10, 10)
    out = kernels.percentile_stretch(img)
    assert out.min() == 0.0 and out.max() == 1.0
    # flat image -> zeros (no division blowup)
    assert np.allclose(kernels.percentile_stretch(np.full((5, 5), 0.5)), 0.0)


def test_clahe_improves_contrast_and_stays_bounded():
    rng = np.random.default_rng(2)
    img = (0.45 + 0.1 * rng.random((64, 128))).astype(np.float32)
    out = kernels.clahe(img)
    assert out.shape == img.shape
    assert out.min() >= 0.0 and out.max() <= 1.0
    assert out.std() > img.std()  # contrast expanded


def test_unsharp_sharpens_edges():
    img = np.ones((16, 16), dtype=np.float32)
    img[:, 8:] = 0.0
    out = kernels.unsharp(img)
    assert out.shape == img.shape and out.min() >= 0 and out.max() <= 1


def test_laplacian_flat_is_zero():
    assert np.allclose(kernels.laplacian(np.full((8, 8), 0.5)), 0.0)


def test_otsu_separates_bimodal():
    img = np.concatenate([np.full(500, 0.2), np.full(500, 0.8)]).reshape(20, 50)
    t = kernels.otsu_threshold(img.astype(np.float32))
    assert 0.2 < t < 0.8
    mask = kernels.binarize(img, "otsu")
    assert set(np.unique(mask)) == {0, 1}
    assert mask.sum() == 500  # the dark half is ink


def test_sauvola_binarize_handles_gradient():
    # dark text on a background with a brightness gradient: global Otsu
    # can fail; Sauvola adapts locally
    x = np.linspace(0.5, 0.95, 200, dtype=np.float32)
    img = np.tile(x, (50, 1))
    img[20:30, 10:20] = 0.25  # dark blob left
    img[20:30, 180:190] = 0.6  # dark-vs-local blob right (lighter than left bg!)
    mask = kernels.binarize(img, "sauvola")
    assert mask[25, 15] == 1 and mask[25, 185] == 1
    assert mask[5, 100] == 0


def test_rotate_roundtrip_and_deskew_estimate():
    from greenocr_ray.glyphs import render_line

    img = render_line("deskew me now")
    for true_angle in (-2.0, -0.7, 1.3, 2.5):
        rot = kernels.rotate(img, true_angle, fill=1.0)
        est = kernels.estimate_skew(rot)
        assert abs(est - true_angle) <= 0.25, (true_angle, est)


def test_row_bands_and_column_segments():
    mask = np.zeros((10, 20), dtype=np.uint8)
    mask[2:5, 3:6] = 1
    mask[2:5, 9:12] = 1
    assert kernels.row_bands(mask) == [(2, 5)]
    assert kernels.column_segments(mask, min_gap=1) == [(3, 6), (9, 12)]
    # min_ink guard: single-pixel noise column is not 'on'
    mask2 = mask.copy()
    mask2[7, 15] = 1
    assert kernels.column_segments(mask2, min_gap=1, min_ink=2) == [(3, 6), (9, 12)]


def test_connected_components():
    mask = np.zeros((8, 8), dtype=np.uint8)
    mask[1:3, 1:3] = 1
    mask[5:7, 5:7] = 1
    labels, n = kernels.connected_components(mask)
    assert n == 2
    assert labels[1, 1] != labels[5, 5]
    assert labels[0, 0] == 0
    # U-shape merges into one component via union-find
    u = np.zeros((5, 5), dtype=np.uint8)
    u[:, 0] = 1
    u[:, 4] = 1
    u[4, :] = 1
    _, n2 = kernels.connected_components(u)
    assert n2 == 1


@pytest.mark.parametrize("sigma", [0.3, 0.8, 1.5])
def test_gaussian_blur_preserves_mean(sigma):
    img = np.random.default_rng(3).random((20, 30)).astype(np.float32)
    out = kernels.gaussian_blur(img, sigma)
    assert abs(out.mean() - img.mean()) < 0.01


def test_estimate_skew_multiline_uneven():
    """Multi-line page with a short second line: the centroid seed is
    pulled far off (>0.3 deg) and only the coarse-grid candidates
    recover the true angle — the regression class where a seed-only
    fine scan returned sign-flipped skews."""
    from greenocr_ray.glyphs import render_line

    l1 = render_line("the quick brown fox jumps")
    l2 = render_line("over it")
    H = l1.shape[0] + l2.shape[0] + 20
    W = max(l1.shape[1], l2.shape[1]) + 40
    for true_skew in (3.0, -2.5):
        img = np.ones((H, W), dtype=np.float32)
        img[5 : 5 + l1.shape[0], 10 : 10 + l1.shape[1]] = l1
        img[10 + l1.shape[0] : 10 + l1.shape[0] + l2.shape[0], 10 : 10 + l2.shape[1]] = l2
        pad = np.pad(img, 40, constant_values=np.float32(1.0))
        rot = kernels.rotate(pad, true_skew, fill=1.0)
        est = kernels.estimate_skew(rot)
        assert abs(est - true_skew) < 0.35, (true_skew, est)


def test_cost_stripe_media_equalizes_windows():
    """G1: striped blocks put ~equal total media_bytes in every
    batch_size window (the slices the OCR pool receives); homogeneous
    blocks take the no-copy guard exit; rows are a permutation."""
    import numpy as np
    import pyarrow as pa

    from greenocr_ray.stages.ocr import cost_stripe_media

    rng = np.random.Generator(np.random.PCG64(3))
    n = 320
    cost = np.where(rng.random(n) < 0.1, 60000, 2000)
    t = pa.table(
        {
            "media_ref": [f"m{i}" for i in range(n)],
            "width": pa.array([1] * n, pa.int32()),
            "height": pa.array([1] * n, pa.int32()),
            "pixels": pa.array([b"x" * int(c) for c in cost], pa.binary()),
        }
    )
    out = cost_stripe_media(t, batch_size=32)
    assert sorted(out.column("media_ref").to_pylist()) == sorted(
        t.column("media_ref").to_pylist()
    )
    oc = np.array([len(p) for p in out.column("pixels").to_pylist()])
    win = oc.reshape(-1, 32).sum(axis=1)
    nat = cost.reshape(-1, 32).sum(axis=1)
    assert win.max() < nat.max()  # tail window strictly improves
    assert win.max() - win.min() <= 60000  # within one heavy item of equal

    hom = pa.table(
        {
            "media_ref": [f"m{i}" for i in range(n)],
            "width": pa.array([1] * n, pa.int32()),
            "height": pa.array([1] * n, pa.int32()),
            "pixels": pa.array([b"x" * 2000] * n, pa.binary()),
        }
    )
    assert cost_stripe_media(hom, 32) is hom  # guard exit, no copy
    tiny = hom.slice(0, 8)
    assert cost_stripe_media(tiny, 32) is tiny  # below one window
