"""Bit-exact, numpy-vectorized ports of Go's math.Sin / Cos / Atan / Atan2.

The reference's golden values (geomath_test.go) assert EXACT float64
equality, and the edge-CSV sha256 parity target formats floats that came
out of these kernels — so our trig must match Go's math package
bit-for-bit, not merely glibc's (which differs by ~1 ulp on some inputs).

Go's kernels are Cephes-derived polynomials (public, BSD-licensed Go
stdlib; ultimately Moshier's Cephes library).  They use only IEEE-exact
operations (+ - * / sqrt and comparisons), so a faithful re-expression in
numpy is bit-identical on every platform.  Inputs here are always small
(|x| ≤ 2π for trig), far below Go's reduceThreshold (1<<29), so the
Payne-Hanek path is not needed.
"""

from __future__ import annotations

import numpy as np

# float64(4/π) with Pi taken at Go's untyped-constant precision.
_M4PI = 1.2732395447351626861510701069801148962756771659236515899813387524
PI = np.pi

_PI4A = 7.85398125648498535156e-1
_PI4B = 3.77489470793079817668e-8
_PI4C = 2.69515142907905952645e-15

_SINP = np.array(
    [
        1.58962301576546568060e-10,
        -2.50507477628578072866e-8,
        2.75573136213857245213e-6,
        -1.98412698295895385996e-4,
        8.33333333332211858878e-3,
        -1.66666666666666307295e-1,
    ]
)
_COSP = np.array(
    [
        -1.13585365213876817300e-11,
        2.08757008419747316778e-9,
        -2.75573141792967388112e-7,
        2.48015872888517179954e-5,
        -1.38888888888730564116e-3,
        4.16666666666665929218e-2,
    ]
)


def _poly(coeffs, zz):
    """(((((c0*zz)+c1)*zz+c2)*zz+c3)*zz+c4)*zz+c5 — Go's nesting exactly."""
    y = coeffs[0] * zz
    y = y + coeffs[1]
    for c in coeffs[2:]:
        y = y * zz + c
    return y


def go_sin(x):
    """math.Sin for |x| < 1<<29 — Go src/math/sin.go."""
    x = np.asarray(x, dtype=np.float64)
    sign = x < 0
    ax = np.abs(x)
    j = np.floor(ax * _M4PI).astype(np.int64)
    y = j.astype(np.float64)
    odd = (j & 1) == 1
    j = np.where(odd, j + 1, j)
    y = np.where(odd, y + 1.0, y)
    j = j & 7
    z = ((ax - y * _PI4A) - y * _PI4B) - y * _PI4C
    flip = j > 3
    sign = sign ^ flip
    j = np.where(flip, j - 4, j)
    zz = z * z
    cos_branch = 1.0 - 0.5 * zz + zz * zz * _poly(_COSP, zz)
    sin_branch = z + z * zz * _poly(_SINP, zz)
    out = np.where((j == 1) | (j == 2), cos_branch, sin_branch)
    out = np.where(sign, -out, out)
    return out if out.ndim else float(out)


def go_cos(x):
    """math.Cos for |x| < 1<<29 — Go src/math/sin.go."""
    x = np.asarray(x, dtype=np.float64)
    ax = np.abs(x)
    j = np.floor(ax * _M4PI).astype(np.int64)
    y = j.astype(np.float64)
    odd = (j & 1) == 1
    j = np.where(odd, j + 1, j)
    y = np.where(odd, y + 1.0, y)
    j = j & 7
    z = ((ax - y * _PI4A) - y * _PI4B) - y * _PI4C
    sign = j > 3
    j = np.where(sign, j - 4, j)
    sign = sign ^ (j > 1)
    zz = z * z
    sin_branch = z + z * zz * _poly(_SINP, zz)
    cos_branch = 1.0 - 0.5 * zz + zz * zz * _poly(_COSP, zz)
    out = np.where((j == 1) | (j == 2), sin_branch, cos_branch)
    out = np.where(sign, -out, out)
    return out if out.ndim else float(out)


# --- Atan (Cephes xatan/satan) — Go src/math/atan.go ---

_ATAN_P = [
    -8.750608600031904122785e-01,
    -1.615753718733365076637e+01,
    -7.500855792314704667340e+01,
    -1.228866684490136173410e+02,
    -6.485021904942025371773e+01,
]
_ATAN_Q = [
    2.485846490142306297962e+01,
    1.650270098316988542046e+02,
    4.328810604912902668951e+02,
    4.853903996359136964868e+02,
    1.945506571482613964425e+02,
]
_MOREBITS = 6.123233995736765886130e-17
_TAN3PIO8 = 2.41421356237309504880


def _xatan(x):
    z = x * x
    num = ((((_ATAN_P[0] * z + _ATAN_P[1]) * z + _ATAN_P[2]) * z + _ATAN_P[3]) * z + _ATAN_P[4])
    den = (((((z + _ATAN_Q[0]) * z + _ATAN_Q[1]) * z + _ATAN_Q[2]) * z + _ATAN_Q[3]) * z + _ATAN_Q[4])
    z = z * num / den
    return x * z + x


def _satan(x):
    """x >= 0 branch selection — Go atan.go satan()."""
    x = np.asarray(x, dtype=np.float64)
    small = x <= 0.66
    big = x > _TAN3PIO8
    mid = ~small & ~big
    out = np.empty_like(x)
    # guard each branch's input to avoid div-by-zero warnings off-branch
    xs = np.where(small, x, 0.5)
    out_small = _xatan(xs)
    xb = np.where(big, x, 3.0)
    out_big = PI / 2.0 - _xatan(1.0 / xb) + _MOREBITS
    xm = np.where(mid, x, 1.0)
    out_mid = PI / 4.0 + _xatan((xm - 1.0) / (xm + 1.0)) + 0.5 * _MOREBITS
    out = np.where(small, out_small, np.where(big, out_big, out_mid))
    return out


def go_atan(x):
    """math.Atan — Go src/math/atan.go."""
    x = np.asarray(x, dtype=np.float64)
    out = np.where(x > 0, _satan(np.where(x > 0, x, 1.0)),
                   np.where(x < 0, -_satan(np.where(x < 0, -x, 1.0)), x))
    return out if out.ndim else float(out)


def go_atan2(y, x):
    """math.Atan2 — Go src/math/atan2.go (finite, nonzero fast path +
    the zero-x / zero-y special cases we can actually hit)."""
    y = np.asarray(y, dtype=np.float64)
    x = np.asarray(x, dtype=np.float64)
    y, x = np.broadcast_arrays(y, x)
    safe_x = np.where(x != 0, x, 1.0)
    q = go_atan(y / safe_x)
    neg_x = x < 0
    q = np.where(neg_x & (np.asarray(q) <= 0), q + PI, np.where(neg_x, q - PI, q))
    # x == 0 special cases (atan2.go): y>0 → +Pi/2, y<0 → -Pi/2, y==0 → ±0/Pi
    q = np.where(x == 0, np.where(y > 0, PI / 2.0, np.where(y < 0, -PI / 2.0, np.where(np.signbit(x), PI, 0.0))), q)
    return q if q.ndim else float(q)
