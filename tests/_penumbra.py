"""THE penumbra-band definition shared by every gradient-equivalence suite
(r3 verdict weak #6: test_train and test_instanced_fused had drifted to two
subtly different bands).

Why a band exists at all: the envelope shadow estimator re-attaches the
gradient at the frozen shadow-march argmin t* (Danskin), and a pixel only
carries that term when its recorded res0 lies strictly inside (0, 1)
(pallas_train._shade_from_frozen `valid`). The fused kernel and the
whole-image XLA graph compile the same math differently, so their marched
points differ at float epsilon and near-tied argmins (or the res==1
lit/penumbra boundary itself) legitimately flip between the two paths —
an O(1)-per-pixel estimator variance, not a bug (FD-validated in
tests/test_shadow_envelope.py; variance quantified in
test_train.test_penumbra_estimator_variance_bounded).

The definition:

- res == 1.0 EXACTLY is fully lit: res = min(1, min_t w*d/t) starts at 1.0
  and only moves by taking a min, so "no sampled step ever dipped below 1"
  reproduces bitwise in any compilation and carries no Danskin term.
- (-0.2, 1.0) is penumbra: an interior minimum exists (in this path), so
  the Danskin term is live and argmin near-ties can flip it.
- res <= -0.2 is deep shadow (the march early-outs below -1): shadow == 0
  on both paths, and max(res, 0) kills the gradient.
- One pixel of spatial DILATION absorbs the boundary cases the band alone
  cannot see: a pixel whose res is exactly 1.0 in THIS path but 1-epsilon
  in the other lies on the lit/penumbra boundary, hence adjacent to a
  detected penumbra pixel (penumbra bands are spatially contiguous).
"""

import numpy as np


def penumbra_pixels(res_planes: np.ndarray, num_lights: int) -> np.ndarray:
    """[H, W] bool: pixels whose gradients are penumbra-argmin dependent.
    `res_planes` are the fused forward's residual planes ([R, H, W], layout
    pallas_train.num_residuals: res0 for light l at plane 4 + 2*l)."""
    res_planes = np.asarray(res_planes)
    h, w = res_planes.shape[-2:]
    pen = np.zeros((h, w), bool)
    for li in range(num_lights):
        r = res_planes[4 + 2 * li]
        pen |= (r > -0.2) & (r < 1.0)
    return _dilate(pen)


def _dilate(mask: np.ndarray) -> np.ndarray:
    """3x3 binary dilation (one-pixel halo), edge-padded."""
    p = np.pad(mask, 1, mode="edge")
    out = np.zeros_like(mask)
    for dy in (0, 1, 2):
        for dx in (0, 1, 2):
            out |= p[dy:dy + mask.shape[0], dx:dx + mask.shape[1]]
    return out
