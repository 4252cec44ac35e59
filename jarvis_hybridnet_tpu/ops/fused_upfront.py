"""Fusion of 2x trilinear upsampling with a stride-2 k3 convolution.

HybridNet upsamples the gathered voxel volume from (G/2)^3 to G^3 (in
'half' repro mode) only for V2VNet's front layer — a stride-2, kernel-3
convolution — to bring it straight back to (G/2)^3. Both ops are linear, so
the composition is exactly a *stride-1* kernel-3 convolution on the half
grid with a transformed kernel, plus rank-deficient corrections on the
volume's faces/edges/corners (where the upsample's edge-clamp and the
conv's zero-padding interact).

Derivation per axis (u = Up2(x) with half-pixel centers and edge clamp;
y[n] = sum_t w[t] u[2n+t], zero-padded):
  interior:  y[n] = v[-1] x[n-1] + v[0] x[n] + v[1] x[n+1]
             (v[-1], v[0], v[1]) =
             (.75 w[-1] + .25 w[0],
              .25 w[-1] + .75 w[0] + .75 w[1],
              .25 w[1])
  face n=0:  + .25 (w[0] - w[-1]) x[0]   (relative to the zero-padded conv)
  face n=L-1:+ .25 w[1] x[L-1]

The face deltas are themselves separable, so the full 3D correction is an
inclusion-style expansion over axis subsets: for each non-empty subset S of
axes, a convolution whose kernel uses the delta pattern on axes in S and
the interior transform on the rest, applied at the corresponding boundary
slice. Verified to match the unfused path to float32 round-off.
"""

from __future__ import annotations

import itertools

import jax
import jax.numpy as jnp
import numpy as np

# interior transform: rows = new tap position (-1, 0, +1),
# cols = original tap (-1, 0, +1)
_T_IN = np.array([
    [0.75, 0.25, 0.0],
    [0.25, 0.75, 0.75],
    [0.0, 0.0, 0.25],
], np.float32)
# boundary deltas: coefficient patterns (over original taps) multiplying the
# boundary slice of x
_D_LO = np.array([-0.25, 0.25, 0.0], np.float32)   # face n = 0
_D_HI = np.array([0.0, 0.0, 0.25], np.float32)     # face n = L-1


def _transform_interior(w: jnp.ndarray, axes=(0, 1, 2)) -> jnp.ndarray:
    """Apply the per-axis interior transform on the given spatial axes of a
    (3,3,3,Cin,Cout) kernel."""
    t = jnp.asarray(_T_IN)
    eqs = ("ab,bjkio->ajkio", "ab,jbkio->jakio", "ab,jkbio->jkaio")
    for a in axes:
        w = jnp.einsum(eqs[a], t, w)
    return w


def _contract_delta(w: jnp.ndarray, axis: int, lo: bool) -> jnp.ndarray:
    """Contract one spatial axis of the kernel with a boundary delta."""
    d = jnp.asarray(_D_LO if lo else _D_HI)
    return jnp.tensordot(d, jnp.moveaxis(w, axis, 0), axes=(0, 0))


# conv dimension_numbers by remaining spatial rank (corrections squeeze the
# contracted axes away — see note in fused_up_conv3d)
_DN_BY_RANK = {
    3: ("NDHWC", "DHWIO", "NDHWC"),
    2: ("NHWC", "HWIO", "NHWC"),
    1: ("NWC", "WIO", "NWC"),
}


def fused_up_conv3d(
    x: jnp.ndarray,      # (B, L, L, L, Cin) half-resolution volume
    kernel: jnp.ndarray,  # (3, 3, 3, Cin, Cout) — the stride-2 front kernel
    bias: jnp.ndarray,    # (Cout,)
    dtype=None,
) -> jnp.ndarray:
    """== conv(stride=2, pad=1)(trilinear_up2(x)) exactly, on the half grid.

    The boundary-correction convolutions SQUEEZE the contracted axes and run
    at the matching rank (2D for faces, 1D for edges, a matmul for corners)
    instead of keeping size-1 spatial dims on a 3D conv. Rank-5 convs with a
    size-1 spatial dim are mathematically identical, but the TPU backend
    miscompiles their *input gradient*: deterministic NaNs appear at interior
    rows of the face grad (reproduced in isolation — finite x/kernel/
    cotangent, all-linear op, NaN d/dx on TPU, clean on CPU). That backward
    is exactly what end-to-end ('all'-mode) HybridNet training
    differentiates through, so the workaround lives in the forward
    formulation where it also removes 36 degenerate conv kernels.
    """
    dtype = dtype or x.dtype

    def conv(inp, w, pads):
        rank = inp.ndim - 2
        return jax.lax.conv_general_dilated(
            inp.astype(dtype), w.astype(dtype), window_strides=(1,) * rank,
            padding=pads, dimension_numbers=_DN_BY_RANK[rank],
        )

    w_in = _transform_interior(kernel)
    y = conv(x, w_in, [(1, 1)] * 3)

    # boundary corrections: for every non-empty subset of axes and each
    # face choice on those axes, convolve the boundary slice with the
    # delta-contracted kernel and add it onto the matching face of y
    for subset_size in (1, 2, 3):
        for axes in itertools.combinations((0, 1, 2), subset_size):
            for faces in itertools.product((True, False), repeat=subset_size):
                # interior transform on the axes NOT in the subset (they
                # behave like Czp), then contract the subset axes with the
                # boundary deltas in ascending order
                w = _transform_interior(
                    kernel, [a for a in (0, 1, 2) if a not in axes]
                )
                consumed = 0
                for a, lo in sorted(zip(axes, faces)):
                    w = _contract_delta(w, a - consumed, lo)
                    consumed += 1
                # slice x at the boundary of each contracted axis, then
                # drop those (now size-1) axes entirely
                sl = [slice(None)] * 5
                out_sl = [slice(None)] * 5
                for a, lo in zip(axes, faces):
                    sl[1 + a] = slice(0, 1) if lo else slice(-1, None)
                    out_sl[1 + a] = slice(0, 1) if lo else slice(-1, None)
                piece = jnp.squeeze(x[tuple(sl)], axis=tuple(1 + a for a in axes))
                if subset_size == 3:
                    # corner: pure channel mixing, w is (Cin, Cout)
                    corr = piece.astype(dtype) @ w.astype(dtype)
                else:
                    # remaining (uncontracted) axes convolve with pad 1
                    pads = [(1, 1)] * (3 - subset_size)
                    corr = conv(piece, w, pads)
                corr = jnp.expand_dims(corr, tuple(1 + a for a in axes))
                y = y.at[tuple(out_sl)].add(corr)

    return y + bias.astype(dtype)
