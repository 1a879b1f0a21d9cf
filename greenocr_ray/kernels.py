"""Pure-numpy image kernels for the faded-document OCR chain.

Deterministic (fixed float32 op order, no threads) reimplementations of
the reference's per-image transforms plus the north-star additions:

- grayscale               (reference: exe_t.py:509, kornia rgb_to_grayscale)
- resize_keep_aspect      (exe_t.py:211-219, cv2.INTER_CUBIC → bilinear here)
- percentile_stretch      (exe_t.py:253-262,296 — faded-ink contrast fix)
- clahe                   (north-star upgrade of the stretch: tile-wise
                           contrast-limited adaptive histogram equalization)
- unsharp                 (exe_t.py:299-300 — x + 1.5*(x - gauss3x3(x)))
- laplacian               (train.py:629-632 / one_dm/laplace4.py:31-32)
- otsu_threshold          (global inter-class-variance argmax)
- sauvola_threshold       (windowed mean/std via integral images)
- rotate / estimate_skew  (projection-profile deskew; the reference's
                           affine-rotation capability, train.py:461-466)
- segmentation helpers    (row/column ink-projection line & glyph cuts —
                           the geometric left-to-right ordering contract,
                           SURVEY.md §2.6)

All kernels take/return numpy arrays; no Ray, no I/O. They run inside
the OCR actor's ``__call__`` (greenocr_ray/stages/ocr.py).
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------- basics


def to_grayscale(img: np.ndarray) -> np.ndarray:
    """HxWx{1,3,4} uint8/float -> HxW float32 in [0,1]. ITU-R 601 weights."""
    a = np.asarray(img)
    if a.dtype == np.uint8:
        a = a.astype(np.float32) / np.float32(255.0)
    else:
        a = a.astype(np.float32)
    if a.ndim == 2:
        return a
    if a.shape[2] == 1:
        return a[:, :, 0]
    # RGBA: composite over white background first (fixture 'step.png' case)
    if a.shape[2] == 4:
        alpha = a[:, :, 3:4]
        a = a[:, :, :3] * alpha + (np.float32(1.0) - alpha)
    w = np.array([0.299, 0.587, 0.114], dtype=np.float32)
    return a[:, :, :3] @ w


def resize_keep_aspect(img: np.ndarray, target_h: int = 64) -> np.ndarray:
    """Aspect-preserving resize to fixed height (exe_t.py:211-219)."""
    h, w = img.shape[:2]
    new_w = max(1, int(round(w * (target_h / h))))
    return resize_bilinear(img, target_h, new_w)


def resize_bilinear(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Deterministic bilinear resample of an HxW float32 image."""
    img = img.astype(np.float32)
    h, w = img.shape[:2]
    if (h, w) == (out_h, out_w):
        return img
    # pixel-center aligned sampling
    ys = (np.arange(out_h, dtype=np.float32) + 0.5) * (h / out_h) - 0.5
    xs = (np.arange(out_w, dtype=np.float32) + 0.5) * (w / out_w) - 0.5
    ys = np.clip(ys, 0, h - 1)
    xs = np.clip(xs, 0, w - 1)
    y0 = np.floor(ys).astype(np.int64)
    x0 = np.floor(xs).astype(np.int64)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    wy = (ys - y0).astype(np.float32)[:, None]
    wx = (xs - x0).astype(np.float32)[None, :]
    tl = img[np.ix_(y0, x0)]
    tr = img[np.ix_(y0, x1)]
    bl = img[np.ix_(y1, x0)]
    br = img[np.ix_(y1, x1)]
    top = tl * (1 - wx) + tr * wx
    bot = bl * (1 - wx) + br * wx
    return top * (1 - wy) + bot * wy


# ----------------------------------------------------- contrast / enhance


def percentile_stretch(
    img: np.ndarray, lo_pct: float = 1.0, hi_pct: float = 99.0
) -> np.ndarray:
    """Clamp (x - p_lo) / (p_hi - p_lo) to [0,1] (exe_t.py:253-262)."""
    lo = np.percentile(img, lo_pct).astype(np.float32)
    hi = np.percentile(img, hi_pct).astype(np.float32)
    if hi - lo < 1e-6:
        return np.zeros_like(img, dtype=np.float32)
    return np.clip((img - lo) / (hi - lo), 0.0, 1.0).astype(np.float32)


def clahe(
    img: np.ndarray,
    tiles: tuple[int, int] = (4, 8),
    clip_limit: float = 4.0,
    nbins: int = 64,
) -> np.ndarray:
    """Contrast-limited adaptive histogram equalization, pure numpy.

    Tile-wise clipped-histogram CDF mapping with bilinear blending
    between tile centers (standard CLAHE; north-star upgrade of the
    reference's global percentile stretch, exe_t.py:253-262).
    """
    img = np.clip(img.astype(np.float32), 0.0, 1.0)
    h, w = img.shape
    ty, tx = tiles
    ty = max(1, min(ty, h))
    tx = max(1, min(tx, w))
    q = np.minimum((img * nbins).astype(np.int32), nbins - 1)
    # tile boundaries
    ye = np.linspace(0, h, ty + 1).astype(np.int64)
    xe = np.linspace(0, w, tx + 1).astype(np.int64)
    # all tile histograms in ONE bincount: key = tile_id * nbins + bin
    row_tile = (np.searchsorted(ye, np.arange(h), side="right") - 1).clip(
        0, ty - 1
    )
    col_tile = (np.searchsorted(xe, np.arange(w), side="right") - 1).clip(
        0, tx - 1
    )
    tile_id = row_tile[:, None] * tx + col_tile[None, :]
    key = tile_id * nbins + q
    hists = (
        np.bincount(key.ravel(), minlength=ty * tx * nbins)
        .reshape(ty, tx, nbins)
        .astype(np.float32)
    )
    # clipped-CDF LUTs, vectorized across tiles (same per-tile math as
    # the loop form: clip to limit, redistribute excess, normalize)
    n_tile = hists.sum(axis=2, dtype=np.float64)
    limit = (clip_limit * n_tile / nbins)[:, :, None]
    excess = np.maximum(hists - limit, 0.0).sum(axis=2, dtype=np.float64)
    hists = np.minimum(hists, limit) + (excess / nbins)[:, :, None]
    cdf = np.cumsum(hists, axis=2)
    luts = (cdf / cdf[:, :, -1:]).astype(np.float32)
    # bilinear interpolation between the four surrounding tile LUTs
    yc = (ye[:-1] + ye[1:]) / 2.0  # tile centers
    xc = (xe[:-1] + xe[1:]) / 2.0
    yy = np.arange(h, dtype=np.float32)
    xx = np.arange(w, dtype=np.float32)
    iy = np.clip(np.searchsorted(yc, yy) - 1, 0, max(ty - 2, 0))
    ix = np.clip(np.searchsorted(xc, xx) - 1, 0, max(tx - 2, 0))
    if ty > 1:
        fy = np.clip((yy - yc[iy]) / np.maximum(yc[iy + 1] - yc[iy], 1e-6), 0, 1)
    else:
        fy = np.zeros(h, dtype=np.float32)
    if tx > 1:
        fx = np.clip((xx - xc[ix]) / np.maximum(xc[ix + 1] - xc[ix], 1e-6), 0, 1)
    else:
        fx = np.zeros(w, dtype=np.float32)
    iy2 = np.minimum(iy + 1, ty - 1)
    ix2 = np.minimum(ix + 1, tx - 1)
    # blend along y at tile granularity first: a per-pixel-row LUT table
    # (h, tx, nbins) costs h*tx*nbins flops and halves the number of
    # full-image gathers below (2 instead of 4)
    FYt = fy[:, None, None]
    lut_rows = luts[iy] * (1 - FYt) + luts[iy2] * FYt
    rows = np.arange(h)[:, None]
    left = lut_rows[rows, ix[None, :], q]
    right = lut_rows[rows, ix2[None, :], q]
    FX = fx[None, :]
    out = left * (1 - FX) + right * FX
    return out.astype(np.float32)


def gaussian_blur3(img: np.ndarray, sigma: float = 1.0) -> np.ndarray:
    """Separable 3x3 gaussian, reflect padding (exe_t.py:299 semantics)."""
    x = np.array([-1.0, 0.0, 1.0], dtype=np.float32)
    k = np.exp(-(x**2) / (2.0 * sigma * sigma))
    k /= k.sum()
    pad = np.pad(img.astype(np.float32), 1, mode="reflect")
    tmp = k[0] * pad[:, :-2] + k[1] * pad[:, 1:-1] + k[2] * pad[:, 2:]
    out = k[0] * tmp[:-2, :] + k[1] * tmp[1:-1, :] + k[2] * tmp[2:, :]
    return out


def gaussian_blur(img: np.ndarray, sigma: float) -> np.ndarray:
    """Separable gaussian with radius ceil(3*sigma), reflect padding."""
    if sigma <= 0:
        return img.astype(np.float32)
    r = max(1, int(np.ceil(3.0 * sigma)))
    x = np.arange(-r, r + 1, dtype=np.float32)
    k = np.exp(-(x**2) / (2.0 * sigma * sigma))
    k /= k.sum()
    pad = np.pad(img.astype(np.float32), ((0, 0), (r, r)), mode="reflect")
    tmp = np.zeros_like(img, dtype=np.float32)
    for i, kv in enumerate(k):
        tmp += kv * pad[:, i : i + img.shape[1]]
    pad = np.pad(tmp, ((r, r), (0, 0)), mode="reflect")
    out = np.zeros_like(img, dtype=np.float32)
    for i, kv in enumerate(k):
        out += kv * pad[i : i + img.shape[0], :]
    return out


def unsharp(img: np.ndarray, amount: float = 1.5) -> np.ndarray:
    """x + amount*(x - gauss3x3(x)), clamped to [0,1] (exe_t.py:299-300)."""
    blurred = gaussian_blur3(img, sigma=1.0)
    return np.clip(img + amount * (img - blurred), 0.0, 1.0).astype(np.float32)


def sr_enhance(
    img: np.ndarray, iters: int = 12, psf_sigma: float = 1.1
) -> np.ndarray:
    """Deterministic stand-in for the learned super-resolution enhance
    slot (P1): the reference runs Real-ESRGAN RRDBNet x4 with
    ``outscale=1`` — detail RESTORATION at unchanged output size —
    before the aspect resize (exe_t.py:483-505,
    real_esrgan/ENHANCMENT2.py:22-36). Here the learned prior is
    replaced by Richardson-Lucy deconvolution against a gaussian PSF
    (the faded-scan blur model), run on the ink-positive inverse so the
    multiplicative updates favor sparse dark strokes on light paper.
    Same contract as the reference slot: HxW float [0,1] in, same-size
    sharpened image out; recovers heavily blurred text (PSF sigma ~2x
    the fixture degradation cap) that global/CLAHE contrast alone
    cannot (see test_sr_enhance_recovers_blur). A real cluster swaps
    in a torch/ONNX model via ``enhance='external'`` without touching
    this chain."""
    obs = 1.0 - np.clip(img.astype(np.float32), 0.0, 1.0)  # ink-positive
    est = obs + np.float32(1e-3)
    for _ in range(iters):
        conv = np.clip(gaussian_blur(est, psf_sigma), 1e-6, None)
        # gaussian PSF is symmetric: correlation == convolution
        est = est * gaussian_blur(obs / conv, psf_sigma)
    return np.clip(1.0 - est, 0.0, 1.0).astype(np.float32)


def laplacian(img: np.ndarray) -> np.ndarray:
    """3x3 Laplacian, min-max normalized to [0,1] (train.py:629-632)."""
    pad = np.pad(img.astype(np.float32), 1, mode="reflect")
    lap = (
        pad[:-2, 1:-1] + pad[2:, 1:-1] + pad[1:-1, :-2] + pad[1:-1, 2:]
        - 4.0 * pad[1:-1, 1:-1]
    )
    lo, hi = lap.min(), lap.max()
    if hi - lo < 1e-8:
        return np.zeros_like(lap)
    return ((lap - lo) / (hi - lo)).astype(np.float32)


# ------------------------------------------------------------ binarization


def otsu_threshold(img: np.ndarray, nbins: int = 256) -> float:
    """Global Otsu threshold (inter-class variance argmax) on [0,1] image."""
    q = np.minimum((np.clip(img, 0, 1) * nbins).astype(np.int32), nbins - 1)
    hist = np.bincount(q.ravel(), minlength=nbins).astype(np.float64)
    total = hist.sum()
    if total == 0:
        return 0.5
    p = hist / total
    omega = np.cumsum(p)
    mu = np.cumsum(p * np.arange(nbins))
    mu_t = mu[-1]
    denom = omega * (1.0 - omega)
    denom[denom == 0] = np.nan
    sigma_b = (mu_t * omega - mu) ** 2 / denom
    if np.isnan(sigma_b).all():  # constant image: no separating threshold
        return 0.5
    k = int(np.nanargmax(sigma_b))
    return (k + 0.5) / nbins


def _integral(img: np.ndarray) -> np.ndarray:
    s = np.zeros((img.shape[0] + 1, img.shape[1] + 1), dtype=np.float64)
    np.cumsum(np.cumsum(img, axis=0, dtype=np.float64), axis=1, out=s[1:, 1:])
    return s


def sauvola_threshold(
    img: np.ndarray, window: int = 25, k: float = 0.2, r: float = 0.5
) -> np.ndarray:
    """Per-pixel Sauvola threshold T = m*(1 + k*(s/r - 1)) via integral images."""
    h, w = img.shape
    half = window // 2
    ii = _integral(img)
    ii2 = _integral(img.astype(np.float64) ** 2)
    y0 = np.clip(np.arange(h) - half, 0, h)
    y1 = np.clip(np.arange(h) + half + 1, 0, h)
    x0 = np.clip(np.arange(w) - half, 0, w)
    x1 = np.clip(np.arange(w) + half + 1, 0, w)
    area = (y1 - y0)[:, None] * (x1 - x0)[None, :]
    s1 = ii[np.ix_(y1, x1)] - ii[np.ix_(y0, x1)] - ii[np.ix_(y1, x0)] + ii[np.ix_(y0, x0)]
    s2 = (
        ii2[np.ix_(y1, x1)] - ii2[np.ix_(y0, x1)] - ii2[np.ix_(y1, x0)] + ii2[np.ix_(y0, x0)]
    )
    mean = s1 / area
    var = np.maximum(s2 / area - mean**2, 0.0)
    std = np.sqrt(var)
    return (mean * (1.0 + k * (std / r - 1.0))).astype(np.float32)


def binarize(img: np.ndarray, method: str = "otsu") -> np.ndarray:
    """Ink mask: 1 where darker than threshold (ink is dark on light bg)."""
    if method == "otsu":
        t = otsu_threshold(img)
        return (img < t).astype(np.uint8)
    if method == "sauvola":
        t = sauvola_threshold(img)
        return (img < t).astype(np.uint8)
    raise ValueError(f"unknown binarization method {method!r}")


# ---------------------------------------------------------------- deskew


def rotate(img: np.ndarray, angle_deg: float, fill: float = 1.0) -> np.ndarray:
    """Rotate about the image center, bilinear, same canvas, bg fill."""
    if abs(angle_deg) < 1e-9:
        return img.astype(np.float32)
    h, w = img.shape
    theta = np.deg2rad(np.float64(angle_deg))
    c, s = np.cos(theta), np.sin(theta)
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    yy, xx = np.meshgrid(
        np.arange(h, dtype=np.float64), np.arange(w, dtype=np.float64), indexing="ij"
    )
    # inverse map: output (y,x) samples input rotated by -angle
    xs = c * (xx - cx) + s * (yy - cy) + cx
    ys = -s * (xx - cx) + c * (yy - cy) + cy
    valid = (xs >= 0) & (xs <= w - 1) & (ys >= 0) & (ys <= h - 1)
    xs = np.clip(xs, 0, w - 1)
    ys = np.clip(ys, 0, h - 1)
    x0 = np.floor(xs).astype(np.int64)
    y0 = np.floor(ys).astype(np.int64)
    x1 = np.minimum(x0 + 1, w - 1)
    y1 = np.minimum(y0 + 1, h - 1)
    fx = (xs - x0).astype(np.float32)
    fy = (ys - y0).astype(np.float32)
    im = img.astype(np.float32)
    top = im[y0, x0] * (1 - fx) + im[y0, x1] * fx
    bot = im[y1, x0] * (1 - fx) + im[y1, x1] * fx
    out = top * (1 - fy) + bot * fy
    out[~valid] = np.float32(fill)
    return out.astype(np.float32)


def vshear(img: np.ndarray, angle_deg: float, fill: float = 1.0) -> np.ndarray:
    """Vertical shear: column x shifts by tan(angle)*(x-cx), subpixel.

    For the small angles of document skew (<= ~4°) this is the
    cos θ ≈ 1 approximation of a true rotation — and it is exactly the
    transform ``estimate_skew`` scores, so applying it as the
    correction is self-consistent. Two gathers instead of the four a
    bilinear rotation needs, no trig per pixel.
    """
    if abs(angle_deg) < 1e-9:
        return img.astype(np.float32)
    h, w = img.shape
    im = img.astype(np.float32)
    sh = np.tan(np.deg2rad(np.float64(angle_deg))) * (
        np.arange(w, dtype=np.float64) - (w - 1) / 2.0
    )
    k = np.floor(sh).astype(np.int64)  # integer shift per column
    g = (sh - k).astype(np.float32)  # sub-pixel residual in [0,1)
    disp = int(max(abs(k.min()), abs(k.max()))) + 2
    pad = np.full((h + 2 * disp, w), np.float32(fill), dtype=np.float32)
    pad[disp : disp + h] = im
    out = np.empty((h, w), dtype=np.float32)
    # columns group into contiguous runs of equal integer shift (k is
    # monotonic in x): per run, the shear is two row-offset slice reads
    # blended by the per-column residual — no per-pixel gather
    edges = np.nonzero(np.diff(k))[0] + 1
    starts = np.concatenate(([0], edges))
    ends = np.concatenate((edges, [w]))
    for a, b in zip(starts, ends):
        kk = int(k[a])
        gg = g[a:b][None, :]
        lo = pad[disp - kk - 1 : disp - kk - 1 + h, a:b]
        hi_ = pad[disp - kk : disp - kk + h, a:b]
        out[:, a:b] = lo * gg + hi_ * (np.float32(1.0) - gg)
    return out


def estimate_skew_centroid(ink: np.ndarray) -> float:
    """Closed-form skew seed: weighted least-squares slope of the
    column ink centroids. O(H*W), no candidate search. Columns with no
    ink (word gaps) carry zero weight. Returns the CORRECTION angle
    (same sign convention as ``estimate_skew``)."""
    h, w = ink.shape
    colsum = ink.sum(axis=0)
    ymom = (np.arange(h, dtype=np.float64)[:, None] * ink).sum(axis=0)
    wgt = colsum
    total = wgt.sum()
    if total <= 1e-9:
        return 0.0
    with np.errstate(invalid="ignore", divide="ignore"):
        cy = np.where(colsum > 1e-9, ymom / np.maximum(colsum, 1e-9), 0.0)
    x = np.arange(w, dtype=np.float64)
    xm = (wgt * x).sum() / total
    ym = (wgt * cy).sum() / total
    dx = x - xm
    denom = (wgt * dx * dx).sum()
    if denom <= 1e-9:
        return 0.0
    slope = (wgt * dx * (cy - ym)).sum() / denom
    return float(np.rad2deg(np.arctan(slope)))


def estimate_skew(
    img: np.ndarray,
    max_angle: float = 4.0,
    coarse_step: float = 0.5,
    fine_step: float = 0.1,
) -> float:
    """Projection-profile skew estimate (shear approximation).

    Maximizes the variance of the row-ink projection over candidate
    angles (coarse grid then fine refinement) — the deterministic
    stand-in for Hough-line deskew; recovers the reference's ±2.5°
    affine rotations (train.py:461-466).

    For the small angles involved (<= ~4°) the rotation is scored as a
    vertical SHEAR: column x shifts by round((x-cx)*tan θ). The shift
    is monotonic in x, so columns group into contiguous equal-shift
    runs; with a column-prefix-sum each run contributes an O(H) slice
    add, making one candidate O(runs × H) instead of a full bilinear
    rotation.
    """
    ink = 1.0 - img  # dark ink -> high values
    # downsample BOTH axes by the same step (column-only downsampling
    # would change the aspect ratio and hence the apparent skew angle)
    step = max(1, img.shape[1] // 800)
    ink = np.ascontiguousarray(ink[::step, ::step], dtype=np.float32)
    h, w = ink.shape
    disp = int(np.ceil(np.tan(np.deg2rad(max_angle)) * w / 2.0)) + 2
    # column prefix sums: C[:, x] = sum of ink[:, :x]
    csum = np.zeros((h, w + 1), dtype=np.float64)
    np.cumsum(ink, axis=1, out=csum[:, 1:])
    xs = np.arange(w, dtype=np.float64) - (w - 1) / 2.0

    def score(angle: float) -> float:
        shifts = np.rint(xs * np.tan(np.deg2rad(angle))).astype(np.int64)
        acc = np.zeros(h + 2 * disp, dtype=np.float64)
        # contiguous runs of equal shift
        edges = np.nonzero(np.diff(shifts))[0] + 1
        starts = np.concatenate(([0], edges))
        ends = np.concatenate((edges, [w]))
        for a, b in zip(starts, ends):
            s = int(shifts[a]) + disp
            acc[s : s + h] += csum[:, b] - csum[:, a]
        return float(np.var(acc))

    # closed-form centroid seed: one O(H*W) pass usually lands within
    # ~0.2° of the optimum on single-line images — but multi-line or
    # uneven-line-length images can pull the centroid fit arbitrarily
    # far off, so the seed only JOINS a sparse 1° coarse grid rather
    # than replacing it; the variance-max fine scan then refines
    # around whichever candidate scores best. (~2x fewer score() calls
    # than the original 0.5° grid, robust to a bad seed.)
    # (`estimate_skew_centroid` returns the skew; the aligning shear is
    # its negation, which is the domain `score` works in.)
    seed = float(np.clip(-estimate_skew_centroid(ink), -max_angle, max_angle))
    seed = round(seed / fine_step) * fine_step
    candidates = [seed]
    # single-LINE strips (the reference's data model: height-normalized
    # 64 px lines, exe_t.py:71-72) cannot hold a second text line, so
    # the centroid seed is reliable and the coarse grid is skipped;
    # page-height images keep the full grid for multi-line robustness
    if img.shape[0] > 96:
        a = -max_angle
        while a <= max_angle + 1e-9:
            candidates.append(round(a, 6))
            a += 2 * coarse_step
    best = candidates[0]
    best_s = -np.inf
    for c in candidates:
        s = score(c)
        if s > best_s:
            best_s, best = s, c
    lo = max(best - coarse_step, -max_angle)
    hi = min(best + coarse_step, max_angle)
    a = lo
    while a <= hi + 1e-9:
        s = score(a)
        if s > best_s:
            best_s, best = s, a
        a += fine_step
    # `best` is the rotation that ALIGNS the ink (the correction); the
    # skew of the input is its negation: rotate(img, -estimate_skew(img))
    # deskews.
    return float(-best)


def deskew(img: np.ndarray, max_angle: float = 4.0) -> tuple[np.ndarray, float]:
    angle = estimate_skew(img, max_angle=max_angle)
    if abs(angle) < 0.05:  # below interpolation noise: skip the resample
        return img.astype(np.float32), 0.0
    # pad vertically before rotating back so end-of-line glyphs on wide
    # scans can't clip off the canvas (the rotated corners move by
    # ~ w/2 * tan(angle) vertically)
    disp = int(np.ceil(np.tan(np.deg2rad(abs(angle) + 0.2)) * img.shape[1] / 2.0)) + 2
    padded = np.pad(img, ((disp, disp), (0, 0)), constant_values=np.float32(1.0))
    # small-angle correction: vertical shear = the transform the
    # estimator scored; 2x cheaper than a full bilinear rotation
    return vshear(padded, -angle, fill=1.0), angle


# ------------------------------------------------------------ segmentation


def row_bands(mask: np.ndarray, min_ink: int = 1) -> list[tuple[int, int]]:
    """Text-line bands [y0,y1) from the row ink projection of a 0/1 mask."""
    proj = mask.sum(axis=1)
    on = proj >= min_ink
    bands: list[tuple[int, int]] = []
    start = None
    for y, v in enumerate(on):
        if v and start is None:
            start = y
        elif not v and start is not None:
            bands.append((start, y))
            start = None
    if start is not None:
        bands.append((start, len(on)))
    return bands


def column_segments(
    mask: np.ndarray, min_gap: int = 1, min_ink: int = 1
) -> list[tuple[int, int]]:
    """Glyph segments [x0,x1) from the column ink projection of a 0/1 mask.

    Consecutive ink runs separated by >= min_gap blank columns become
    separate segments — geometric left-to-right character order
    (SURVEY.md §2.6 contract (b)).
    """
    proj = mask.sum(axis=0)
    on = proj >= min_ink
    segs: list[tuple[int, int]] = []
    start = None
    gap = 0
    for x, v in enumerate(on):
        if v:
            if start is None:
                start = x
            gap = 0
        else:
            if start is not None:
                gap += 1
                if gap >= min_gap:
                    segs.append((start, x - gap + 1))
                    start = None
                    gap = 0
    if start is not None:
        segs.append((start, len(on)))
    return segs


def connected_components(mask: np.ndarray) -> tuple[np.ndarray, int]:
    """4-connected component labeling, run-based two-pass union-find.

    Vectorized over RUNS, not pixels: horizontal foreground runs are
    extracted with one ``np.diff`` over the whole image, consecutive
    rows' runs are merged with a two-pointer sweep (O(#runs) total, a
    few per text row vs thousands of pixels), and the final labels are
    painted with a single flat scatter. Replaces a per-pixel Python
    loop that was ~100x slower on page-sized masks.

    Returns (labels HxW int32 with 0 = background, n_components),
    components numbered 1..n in raster order of first appearance.
    """
    h, w = mask.shape
    m = np.ascontiguousarray(mask.astype(bool))
    padded = np.zeros((h, w + 2), dtype=np.int8)
    padded[:, 1:-1] = m
    d = np.diff(padded, axis=1)
    run_rows, run_c0 = np.nonzero(d == 1)  # run starts, raster order
    _, run_c1 = np.nonzero(d == -1)  # matching exclusive ends
    n_runs = len(run_rows)
    labels = np.zeros((h, w), dtype=np.int32)
    if n_runs == 0:
        return labels, 0
    parent = np.arange(n_runs, dtype=np.int64)

    def find(x: int) -> int:
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, int(parent[x])
        return root

    # row slices into the run arrays (runs are sorted by row)
    row_start = np.searchsorted(run_rows, np.arange(h + 1))
    for y in range(1, h):
        a0, a1 = int(row_start[y - 1]), int(row_start[y])  # prev row runs
        b0, b1 = int(row_start[y]), int(row_start[y + 1])  # this row runs
        i, j = a0, b0
        while i < a1 and j < b1:  # two-pointer interval overlap
            if run_c1[i] <= run_c0[j]:
                i += 1
            elif run_c1[j] <= run_c0[i]:
                j += 1
            else:
                ra, rb = find(i), find(j)
                if ra != rb:
                    if ra < rb:
                        parent[rb] = ra
                    else:
                        parent[ra] = rb
                # advance the run that ends first (it can't overlap
                # the next run on the other row)
                if run_c1[i] < run_c1[j]:
                    i += 1
                else:
                    j += 1
    roots = np.fromiter((find(i) for i in range(n_runs)), dtype=np.int64)
    uniq, remapped = np.unique(roots, return_inverse=True)
    # renumber roots 1..n in raster order of first appearance
    first_pos = np.full(len(uniq), n_runs, dtype=np.int64)
    np.minimum.at(first_pos, remapped, np.arange(n_runs))
    order = np.argsort(first_pos, kind="stable")
    rank = np.empty(len(uniq), dtype=np.int32)
    rank[order] = np.arange(1, len(uniq) + 1, dtype=np.int32)
    run_label = rank[remapped]
    # paint all runs with one flat scatter
    lengths = (run_c1 - run_c0).astype(np.int64)
    tot = int(lengths.sum())
    flat_starts = run_rows.astype(np.int64) * w + run_c0
    offs = np.arange(tot) - np.repeat(np.cumsum(lengths) - lengths, lengths)
    labels.ravel()[np.repeat(flat_starts, lengths) + offs] = np.repeat(
        run_label, lengths
    )
    return labels, len(uniq)


def component_boxes(labels: np.ndarray, n: int) -> np.ndarray:
    """(n, 5) array per component 1..n: [y0, y1, x0, x1, area]
    (y1/x1 exclusive), vectorized with np.minimum/maximum.at."""
    ys, xs = np.nonzero(labels)
    lbl = labels[ys, xs] - 1
    out = np.zeros((n, 5), dtype=np.int64)
    out[:, 0] = labels.shape[0]
    out[:, 2] = labels.shape[1]
    np.minimum.at(out[:, 0], lbl, ys)
    np.maximum.at(out[:, 1], lbl, ys + 1)
    np.minimum.at(out[:, 2], lbl, xs)
    np.maximum.at(out[:, 3], lbl, xs + 1)
    np.add.at(out[:, 4], lbl, 1)
    return out


def segment_lines_cc(
    mask: np.ndarray, min_area: int = 4
) -> list[list[tuple[int, int, int, int]]]:
    """Connected-component line/word grouping for page layouts the
    projection-profile bands can't serve (multi-column pages, ragged
    baselines — the north star's 'line/word segmentation').

    Components group into lines by vertical-interval overlap with the
    line's running y-range (>=50% of the smaller height); lines sort
    top-to-bottom, components within a line left-to-right (§2.6
    geometric order contract). Returns [[(y0, y1, x0, x1), ...], ...].
    """
    labels, n = connected_components(mask)
    if n == 0:
        return []
    boxes = component_boxes(labels, n)
    boxes = boxes[boxes[:, 4] >= min_area]
    if len(boxes) == 0:
        return []
    order = np.argsort(boxes[:, 0], kind="stable")  # by top edge
    lines: list[dict] = []
    for b in boxes[order]:
        y0, y1 = int(b[0]), int(b[1])
        best = None
        for ln in lines:
            ov = min(y1, ln["y1"]) - max(y0, ln["y0"])
            if ov >= 0.5 * min(y1 - y0, ln["y1"] - ln["y0"]):
                best = ln
                break
        if best is None:
            lines.append({"y0": y0, "y1": y1, "boxes": [b]})
        else:
            best["boxes"].append(b)
            best["y0"] = min(best["y0"], y0)
            best["y1"] = max(best["y1"], y1)
    lines.sort(key=lambda ln: (ln["y0"], ln["y1"]))
    return [
        [
            (int(b[0]), int(b[1]), int(b[2]), int(b[3]))
            for b in sorted(ln["boxes"], key=lambda bb: (int(bb[2]), int(bb[3])))
        ]
        for ln in lines
    ]


# ------------------------------------------------- CTC geometry (P8/P10)


def required_width_for_ctc(
    target_len: int, downsample: int = 32, safety: float = 1.1
) -> int:
    """CTC feasibility: T >= 2U-1 => width >= (2U-1)*downsample
    (train.py:828-830, incl. the 1.1 safety factor)."""
    return int(((2 * target_len - 1) * downsample) * safety)


def pad_to_ctc_safe_width(
    img: np.ndarray,
    target_len: int,
    downsample: int = 32,
    max_width: int | None = 2048,
    pad_value: float = 1.0,
) -> np.ndarray:
    """Right-pad with background so a ``target_len``-char transcript is
    CTC-feasible; width rounds up to a multiple of ``downsample`` and
    clamps at ``max_width`` (train.py:832-844; clamp train.py:310)."""
    h, w = img.shape
    need = required_width_for_ctc(target_len, downsample)
    new_w = max(w, need)
    new_w = ((new_w + downsample - 1) // downsample) * downsample
    if max_width is not None:
        new_w = min(new_w, max_width)
    if new_w <= w:
        return img.astype(np.float32)
    out = np.full((h, new_w), np.float32(pad_value), dtype=np.float32)
    out[:, :w] = img
    return out


def resize_fixed(img: np.ndarray, out_w: int = 128, out_h: int = 64) -> np.ndarray:
    """Fixed-size resample (one_dm/laplace4.py:19-20 semantics, P10)."""
    return resize_bilinear(img, out_h, out_w)
