"""On-device text-line preprocessing: batched, jitted normalize+prepare.

The north-star plan (BASELINE.json) makes "text-line image loading, height
normalization, and transposition an on-device preprocessing stage". This
module is that stage: the full prepare_line pipeline (invert -> dewarp to
``target_height`` -> [0,1] rescale -> transpose time-major -> blank-frame
pad) as ONE jitted function over a padded raw-image batch ``[B, Hmax,
Wmax]`` with per-line true (h, w). Host reference: io/normalize.py +
data/dataset.py prepare_line (scipy); reference C++: extras.cc ≈L1-400
CenterNormalizer (unverified, mount empty — SURVEY.md §0).

Design notes (TPU-first, static shapes):

- The reference/host pipeline has data-dependent intermediate shapes (the
  dewarped strip is [2r, w] with r measured from the ink). Here every
  line maps straight to a fixed ``[out_T, target_height]`` output plus a
  ``length``: the dewarp-then-zoom composition collapses into ONE bilinear
  gather from the inverted raw image, because strip extraction is integer
  row selection: dew[i, x] = inv[center[x] - r + i, x], so
  zoom(dew)[j, t] = sum_{corners} w_y w_x inv[center[x_l] - r + y_k, x_l].
- Gaussian/uniform filtering sigmas depend on the true line height h, so
  kernels are built per line from traced scalars over a STATIC tap range
  (bounded by Hmax) with a dynamic truncation mask — matching scipy's
  truncate=4.0 radius int(4*sigma+0.5) and constant-mode zero padding.
  The y pass is a [Hmax, Hmax] matmul (MXU); the x pass (sigma ~ h) is a
  matmul against a per-line banded Toeplitz built the same way.
- Numerics: scipy accumulates in float64; TPUs are float32. The smoothed
  center curve sits on exact integers wherever the argmax plateau is
  locally constant, and the host pipeline floor-truncates with a +1e-6
  epsilon (io/normalize.py measure). Two measures keep device floor()
  agreeing with the host: plateau columns bypass the weighted sum entirely
  (emitting the exact integer), and elsewhere measured f32-vs-f64 noise is
  ~3e-6, small enough for the host's own 1e-6 epsilon. Residual
  disagreements are rare and +-1px (tests/test_preprocess.py measures the
  parity envelope).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


def _gauss_norm(sigma, max_radius: int):
    """Z = sum of the truncated gaussian kernel over its FULL support
    [-R, R], R = int(4*sigma+0.5) (scipy normalizes the whole kernel; with
    constant-mode zero padding no edge renormalization happens). R can
    exceed the image axis, so Z must be summed over a static range bounded
    by ``max_radius`` >= any possible R, not by the axis length."""
    taps = jnp.arange(-max_radius, max_radius + 1, dtype=jnp.float32)
    radius = jnp.floor(4.0 * sigma + 0.5)
    gz = jnp.exp(-0.5 * (taps / sigma) ** 2)
    gz = jnp.where(jnp.abs(taps) <= radius, gz, 0.0)
    return jnp.sum(gz)


def _gauss_matrix(n: int, sigma, max_radius: int):
    """[n, n] correlation matrix M with M[i, j] = k(j - i): M @ x is
    scipy correlate1d(x, k, mode="constant") on a zero-padded buffer."""
    idx = jnp.arange(n, dtype=jnp.float32)
    off = idx[None, :] - idx[:, None]
    sigma = jnp.maximum(sigma, 1e-6)
    radius = jnp.floor(4.0 * sigma + 0.5)
    g = jnp.exp(-0.5 * (off / sigma) ** 2)
    g = jnp.where(jnp.abs(off) <= radius, g, 0.0)
    return g / _gauss_norm(sigma, max_radius)


def _gauss_conv_x(img, sigma, max_radius: int):
    """Correlate rows of [H, W] with a traced-sigma gaussian, constant
    mode. For moderate widths a per-line Toeplitz matmul rides the MXU —
    measured ~30x faster than a vmapped grouped conv on v5e; the conv path
    remains for very wide buffers where the [W, W] matrix would blow HBM
    under a large vmap batch."""
    H, W = img.shape
    if W <= 1536:
        return img @ _gauss_matrix(W, sigma, max_radius).T
    sigma = jnp.maximum(sigma, 1e-6)
    radius = jnp.floor(4.0 * sigma + 0.5)
    taps = jnp.arange(-max_radius, max_radius + 1, dtype=jnp.float32)
    g = jnp.exp(-0.5 * (taps / sigma) ** 2)
    g = jnp.where(jnp.abs(taps) <= radius, g, 0.0)
    g = g / jnp.sum(g)
    out = jax.lax.conv_general_dilated(
        img[:, None, :], g[None, None, :],
        window_strides=(1,), padding=[(max_radius, max_radius)],
        dimension_numbers=("NCH", "OIH", "NCH"))
    return out[:, 0, :]


def _uniform_axis(x, size, axis: int):
    """scipy uniform_filter1d, constant mode, over a zero-padded buffer.
    Window of traced ``size`` centered with left radius size//2."""
    size = jnp.maximum(size, 1)
    n = x.shape[axis]
    c = jnp.cumsum(x, axis=axis)
    zero = jnp.zeros_like(jnp.take(c, jnp.array([0]), axis=axis))
    c = jnp.concatenate([zero, c], axis=axis)  # c[i] = sum of first i
    i = jnp.arange(n)
    lo_r = size // 2
    hi = jnp.clip(i + (size - lo_r - 1) + 1, 0, n)
    lo = jnp.clip(i - lo_r, 0, n)
    wsum = jnp.take(c, hi, axis=axis) - jnp.take(c, lo, axis=axis)
    return wsum / size.astype(x.dtype)


def _reflect_smooth(a, w, sigma, max_radius: int):
    """gaussian_filter1d(a[:w], sigma, mode='reflect') computed on the
    full static buffer (entries >= w are garbage, callers mask).

    Structure: ONE reflected-extension gather of n+2R elements, then a
    static window stack reduced by a matvec — per-tap dynamic gathers are
    ~30x slower on TPU (the scalar core walks every index)."""
    n = a.shape[0]
    R = max_radius
    sigma = jnp.maximum(sigma, 1e-6)
    radius = jnp.floor(4.0 * sigma + 0.5)
    taps = jnp.arange(-R, R + 1, dtype=jnp.float32)
    kern = jnp.exp(-0.5 * (taps / sigma) ** 2)
    kern = jnp.where(jnp.abs(taps) <= radius, kern, 0.0)
    kern = kern / jnp.sum(kern)

    i = jnp.arange(-R, n + R)
    p = jnp.maximum(2 * w, 1)
    m = jnp.mod(i, p)
    ext = a[jnp.where(m < w, m, p - 1 - m)]          # [n + 2R]
    windows = jnp.stack([ext[j:j + n] for j in range(2 * R + 1)])  # static
    out = kern @ windows
    # Plateau shortcut: where every tap inside the dynamic radius holds the
    # same value, the exact answer is that value — emit it directly instead
    # of the float32 weighted sum, whose noise would flip the downstream
    # floor() on exactly these (integer-valued argmax-plateau) columns.
    # This is where host/device parity is won.
    inside = (jnp.abs(taps) <= radius)[:, None]
    lo = jnp.min(jnp.where(inside, windows, jnp.inf), axis=0)
    hi = jnp.max(jnp.where(inside, windows, -jnp.inf), axis=0)
    ctr = windows[R]
    return jnp.where(lo == hi, ctr, out)


def _align_columns_fft(inv, row_top, n_fft: int):
    """aligned[y, x] = inv_zeropad[(row_top[x] + y) mod n_fft, x]: every
    column circularly shifted so its strip starts at row 0.

    The per-column shift is the step that breaks separability of the
    dewarp+zoom resample; doing it with an FFT phase ramp keeps the whole
    resample gather-free (TPU gathers run on the scalar core). n_fft must
    cover Hmax + the largest |row_top| so the circular wrap only ever
    lands in the zero padding."""
    Hmax, Wmax = inv.shape
    f = jnp.fft.rfft(inv, n=n_fft, axis=0)                 # [K, Wmax] cplx
    k = jnp.arange(f.shape[0], dtype=jnp.float32)[:, None]
    ang = (2.0 * np.pi / n_fft) * k * row_top[None, :].astype(jnp.float32)
    f = f * jax.lax.complex(jnp.cos(ang), jnp.sin(ang))
    return jnp.fft.irfft(f, n=n_fft, axis=0)               # [n_fft, Wmax]


def _interp_matrix(n_out: int, n_in_static: int, n_in, f, offset: int = 0):
    """[n_out, n_in_static] one-hot bilinear matrix: row i holds weights
    (1-frac) at floor((i-offset)*f) and frac at min(floor+1, n_in-1);
    M @ v is the endpoint-aligned order-1 zoom of v[:n_in], with the
    output shifted right by ``offset`` rows (blank-frame pad)."""
    i = jnp.maximum(jnp.arange(n_out, dtype=jnp.float32) - offset, 0.0)
    s = i * f
    i0 = jnp.floor(s).astype(jnp.int32)
    i1 = jnp.minimum(i0 + 1, jnp.maximum(n_in - 1, 0))
    frac = (s - i0)[:, None]
    grid = jnp.arange(n_in_static)[None, :]
    return ((grid == i0[:, None]) * (1.0 - frac)
            + (grid == i1[:, None]) * frac)


def _prepare_one(img, h, w, *, kind: str, th: int, out_T: int, pad: int,
                 params=(4.0, 1.0, 0.3)):
    """One line: raw [Hmax, Wmax] grayscale (ink black on white, [0,1]) ->
    (x [out_T, th], length). Mirrors data/dataset.py prepare_line."""
    Hmax, Wmax = img.shape
    iy = jnp.arange(Hmax)[:, None]
    ix = jnp.arange(Wmax)[None, :]
    valid = (iy < h) & (ix < w)

    mx = jnp.max(jnp.where(valid, img, 0.0))
    inv = jnp.where(valid, mx - img, 0.0)
    hf = h.astype(jnp.float32)

    rng, smooth, extra = params
    if kind == "center":
        # measure(): 2-D gaussian (constant mode) + 0.001*uniform term.
        My = _gauss_matrix(Hmax, hf * 0.5, max_radius=2 * Hmax)
        sm = My @ inv
        sm = _gauss_conv_x(sm, hf * smooth,
                           max_radius=int(4 * smooth * Hmax + 0.5))
        sm = jnp.where(valid, sm, 0.0)
        un = _uniform_axis(_uniform_axis(sm, h // 2, axis=0), w, axis=1)
        sm = sm + 0.001 * un
        a = jnp.argmax(jnp.where(iy < h, sm, -jnp.inf), axis=0)  # [Wmax]
        a = _reflect_smooth(a.astype(jnp.float32), w, hf * extra,
                            max_radius=int(4 * extra * Hmax + 1.5))
        # Same 1e-6 epsilon as the host (io/normalize.py measure): the
        # plateau shortcut in _reflect_smooth makes plateau columns exact
        # integers, and measured f32-vs-f64 noise elsewhere is ~3e-6.
        center = jnp.floor(a + 1e-6).astype(jnp.int32)
        ink = (inv != 0) & valid
        deltas = jnp.abs(iy.astype(jnp.float32)
                         - center[None, :].astype(jnp.float32))
        cnt = jnp.sum(ink)
        mad = jnp.where(cnt > 0, jnp.sum(jnp.where(ink, deltas, 0.0))
                        / jnp.maximum(cnt, 1), hf / 4.0)
        r = (1.0 + rng * mad).astype(jnp.int32)
        # The FFT alignment wraps circularly with period n_fft; rows
        # outside [0, h) must land in the zero padding, which bounds
        # r <= n_fft - Hmax (only pathological inputs hit this clamp).
        n_fft = _next_pow2(4 * Hmax)
        r = jnp.minimum(r, n_fft - Hmax - 1)
        r2 = 2 * r
        row_top = center - r
    elif kind == "mean":
        s = jnp.sum(inv)
        cm = jnp.sum(inv * iy.astype(jnp.float32)) / jnp.maximum(s, 1e-6)
        shift = jnp.floor(hf / 2.0 - cm + 0.5).astype(jnp.int32)
        n_fft = _next_pow2(4 * Hmax)
        r2 = h
        # shifted[y] = inv[y - shift]; strip == shifted rows [0, h)
        row_top = jnp.full((Wmax,), -shift, jnp.int32)
    elif kind == "none":
        n_fft = _next_pow2(2 * Hmax)
        r2 = h
        row_top = jnp.zeros((Wmax,), jnp.int32)
    else:
        raise ValueError(f"unknown normalizer kind: {kind!r}")

    r2f = r2.astype(jnp.float32)
    scale = th / r2f
    out_w = jnp.floor(w.astype(jnp.float32) * scale + 0.5).astype(jnp.int32)
    out_w = jnp.clip(out_w, 1, out_T - 2 * pad)
    # Endpoint-aligned order-1 zoom (scipy grid_mode=False): oh rounds to
    # exactly th, so fix_height is a no-op here.
    fy = jnp.where(th > 1, (r2f - 1.0) / (th - 1), 0.0)
    fx = jnp.where(out_w > 1,
                   (w.astype(jnp.float32) - 1.0)
                   / jnp.maximum(out_w - 1, 1).astype(jnp.float32), 0.0)

    # Gather-free resample: align strips to row 0 (FFT phase ramp), then
    # the bilinear zoom is separable — two one-hot interpolation matmuls.
    aligned = _align_columns_fft(inv, row_top, n_fft)       # [n_fft, Wmax]
    My_i = _interp_matrix(th, n_fft, r2, fy)                # [th, n_fft]
    Mx_i = _interp_matrix(out_T, Wmax, w, fx, offset=pad)   # [out_T, Wmax]
    strip = (My_i @ aligned @ Mx_i.T).T                     # [out_T, th]

    t = jnp.arange(out_T)
    t_img = t - pad
    tvalid = ((t_img >= 0) & (t_img < out_w))[:, None]
    strip = jnp.where(tvalid, strip, 0.0)
    m = jnp.max(strip)
    x = strip / jnp.where(m > 0, m, 1.0)
    length = jnp.minimum(out_w + 2 * pad, out_T)
    return x.astype(jnp.float32), length.astype(jnp.int32)


@functools.partial(jax.jit,
                   static_argnames=("kind", "target_height", "out_T", "pad"))
def prepare_batch_device(imgs, hs, ws, *, kind: str = "center",
                         target_height: int = 48, out_T: int = 1024,
                         pad: int = 16):
    """Batched on-device prepare_line.

    imgs: [B, Hmax, Wmax] raw grayscale lines, ink black on white,
    zero-padded to the buffer — float32 in [0, 1], or uint8 (converted to
    x/255 on device; see pack_raw_images' 8-bit fast path); hs/ws: [B]
    int32 true sizes. Returns (x [B, out_T, target_height], lengths [B])
    ready for apply_net — the full normalize+transpose+pad pipeline in
    one jit.
    """
    if imgs.dtype == jnp.uint8:
        # Exact k/255 conversion needs a TRUE division: XLA rewrites
        # division by a literal constant into reciprocal-multiply, which
        # is 1 ulp off for 126 of the 256 byte values — and the center
        # measurement's argmax amplifies ulp-level pixel noise into ±1px
        # width changes (measured round 5: 12/12 lines shifted). The
        # optimization_barrier makes the denominator opaque, so the
        # compiled code divides: bit-identical to numpy on CPU (IEEE
        # divide — where the host-parity suite runs); on TPU the divide
        # unit itself is <=1 ulp approximate, which is self-consistent
        # pixel noise within the device pipeline.
        den = jax.lax.optimization_barrier(jnp.float32(255.0))
        imgs = imgs.astype(jnp.float32) / den
    fn = functools.partial(_prepare_one, kind=kind, th=target_height,
                           out_T=out_T, pad=pad)
    return jax.vmap(fn)(imgs, hs.astype(jnp.int32), ws.astype(jnp.int32))


def pack_raw_images(images) -> tuple:
    """Host helper: pad a list of [h, w] numpy grayscale images into the
    ([B, Hmax, Wmax], hs, ws) buffers prepare_batch_device expects.

    8-bit fast path: when every pixel is exactly representable as k/255
    (always true for PNG-decoded lines — the source is 8-bit), the buffer
    is returned as uint8 and converted back to x/255 float32 ON DEVICE,
    bit-identical to the float path. Raw pixels are the largest
    host->device transfer of the inference pipeline (4 bytes/px vs the
    source's 1), so this quarters PCIe/link bytes; images that are not
    8-bit-exact (synthetic float renders) keep the exact float32 path."""
    B = len(images)
    Hmax = max(int(im.shape[0]) for im in images)
    Wmax = max(int(im.shape[1]) for im in images)
    buf = np.zeros((B, Hmax, Wmax), np.float32)
    hs = np.zeros(B, np.int32)
    ws = np.zeros(B, np.int32)
    for i, im in enumerate(images):
        h, w = im.shape
        buf[i, :h, :w] = im
        hs[i] = h
        ws[i] = w
    q = np.rint(buf * 255.0)
    if q.max(initial=0.0) <= 255.0 and np.array_equal(
            q.astype(np.float32) / np.float32(255.0), buf):
        return q.astype(np.uint8), hs, ws
    return buf, hs, ws


def estimate_out_T(images, target_height: int, pad: int = 16) -> int:
    """Host-side upper-bound estimate of the normalized width for bucket
    selection (the exact width depends on the measured ink spread r, known
    only on device; the kernel clips to out_T and reports true lengths)."""
    est = 0
    for im in images:
        h, w = im.shape
        est = max(est, int(w * max(target_height / max(h, 1), 1.0) * 1.25))
    return est + 2 * pad


# ---------------------------------------------------------------------------
# On-device train-time augmentation
# ---------------------------------------------------------------------------

def augment_lines(key, x, lengths, strength: float = 1.0):
    """Random per-line distortions of a prepared batch, fully on device.

    A TPU-native addition with no reference equivalent (the reference
    trains on static files): with small corpora (UW3-500 is 500 lines)
    the train set memorizes long before the test CER bottoms out —
    round-2 measurement: train CER 0, test CER stuck at 2.85%.
    Augmentation runs INSIDE the jitted train step (key derived from the
    step counter via fold_in, so no extra inputs or host dispatches) and
    costs a few elementwise passes + one gather over [B, T, H].

    Distortions at strength 1.0: per-line amplitude scale U(0.8, 1.2),
    additive gaussian pixel noise (std 0.05), per-line time shift
    U{-4..4} frames and height shift U{-2..2} rows. Shifts are true
    translations with zero fill (NOT circular rolls — a roll would wrap
    boundary content to the opposite edge). Prepared lines carry 16 blank
    pad frames, so time shifts never clip ink; a height shift can clip
    1-2 edge rows of extreme ascenders/descenders, which is intended
    distortion, not wraparound. Padded frames are re-zeroed afterwards,
    preserving the padding invariants.
    """
    B, T, H = x.shape
    k1, k2, k3, k4 = jax.random.split(key, 4)
    amp = 1.0 + 0.2 * strength * jax.random.uniform(
        k1, (B, 1, 1), minval=-1.0, maxval=1.0)
    noise = 0.05 * strength * jax.random.normal(k2, (B, T, H))

    max_t = max(int(round(4 * strength)), 0)
    max_h = max(int(round(2 * strength)), 0)
    sh_t = jax.random.randint(k3, (B,), -max_t, max_t + 1)
    sh_h = jax.random.randint(k4, (B,), -max_h, max_h + 1)
    t_src = jnp.arange(T)[None, :] - sh_t[:, None]                # [B, T]
    h_src = jnp.arange(H)[None, :] - sh_h[:, None]                # [B, H]
    t_ok = (t_src >= 0) & (t_src < T)
    h_ok = (h_src >= 0) & (h_src < H)
    y = jnp.take_along_axis(x, jnp.clip(t_src, 0, T - 1)[:, :, None], axis=1)
    y = jnp.where(t_ok[:, :, None], y, 0.0)
    y = jnp.take_along_axis(y, jnp.clip(h_src, 0, H - 1)[:, None, :], axis=2)
    y = jnp.where(h_ok[:, None, :], y, 0.0)

    mask = (jnp.arange(T)[None, :] < lengths[:, None])[:, :, None]
    y = jnp.clip(y * amp + noise, 0.0, 1.5)
    return jnp.where(mask, y, 0.0).astype(x.dtype)
