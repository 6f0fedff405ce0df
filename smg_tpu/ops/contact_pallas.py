"""Pallas TPU kernel for the pairwise contact sweep.

The stepper's hottest op is the dense sphere-sphere sweep: S = N*K object
spheres against T = S + G sources (other objects' spheres + the kinematic
gripper), ~16k pairs/scene x thousands of scenes x thousands of steps. The
XLA formulation materializes ~12 (S, T) matrices per scene in HBM
(~64 MB/matrix at B = 1024) and is bandwidth-bound at ~1.8 ms/step.

This kernel flips the layout: *scenes ride the 128-lane axis*. Every
per-sphere quantity is an (S, B) / (T, B) array; the grid tiles B in
128-lane blocks, and each program loops over the T sources, keeping every
pairwise intermediate in vector registers / VMEM — HBM sees only the
O(S x B) state, never the O(S x T x B) pair terms. Pair validity against
same-owner pairs falls out of the static row/col -> object mapping
(row i belongs to object i // K; gripper columns j >= S).

Outputs per-sphere forces (fx, fy, fz) (S, B); torque arms and per-object
reduction stay in XLA (tiny).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


def _kernel(
    # row (object sphere) state: (S, Bt)
    cx, cy, cz, vx, vy, vz, rad, mrow, live_row,
    # column (source) state: (T, Bt)
    sx, sy, sz, svx, svy, svz, srad, mcol, live_col,
    # outputs: (S, Bt)
    fx_out, fy_out, fz_out,
    *, S: int, K: int, T: int,
    kn: float, zeta: float, share: float, mu: float, mu_grip: float,
    v_eps: float, max_pen: float, max_vn: float,
):
    zero = jnp.zeros(cx.shape, cx.dtype)
    row_owner = jax.lax.broadcasted_iota(jnp.int32, cx.shape, 0) // K

    cxv, cyv, czv = cx[:], cy[:], cz[:]
    vxv, vyv, vzv = vx[:], vy[:], vz[:]
    radv = rad[:]
    mrowv = mrow[:]
    liver = live_row[:]

    def body(j, acc):
        ax, ay, az = acc
        # Source j's per-scene scalars: (1, Bt).
        jx = sx[pl.ds(j, 1), :]
        jy = sy[pl.ds(j, 1), :]
        jz = sz[pl.ds(j, 1), :]
        jvx = svx[pl.ds(j, 1), :]
        jvy = svy[pl.ds(j, 1), :]
        jvz = svz[pl.ds(j, 1), :]
        jrad = srad[pl.ds(j, 1), :]
        jm = mcol[pl.ds(j, 1), :]
        jlive = live_col[pl.ds(j, 1), :]

        dx = cxv - jx
        dy = cyv - jy
        dz = czv - jz
        dist2 = dx * dx + dy * dy + dz * dz
        inv_dist = jax.lax.rsqrt(dist2 + 1e-18)
        pen = (radv + jrad) - dist2 * inv_dist

        is_grip = j >= S
        col_owner = jnp.where(is_grip, -1, j // K)
        ok = (
            (row_owner != col_owner)
            & (liver > 0.0)
            & (jlive > 0.0)
            & (pen > 0.0)
        )

        nx = dx * inv_dist
        ny = dy * inv_dist
        nz = dz * inv_dist
        rvx = vxv - jvx
        rvy = vyv - jvy
        rvz = vzv - jvz
        vn = jnp.clip(rvx * nx + rvy * ny + rvz * nz, -max_vn, max_vn)
        # Effective mass: harmonic for object pairs, m_row for the
        # infinite-mass gripper.
        meff = jnp.where(
            is_grip, mrowv, mrowv * jm / (mrowv + jm)
        )
        cn = 2.0 * zeta * jnp.sqrt(kn * meff / share)
        fn = jnp.maximum(0.0, kn * jnp.minimum(pen, max_pen) - cn * vn)
        fn = jnp.where(ok, fn, zero)

        tx = rvx - vn * nx
        ty = rvy - vn * ny
        tz = rvz - vn * nz
        vt2 = tx * tx + ty * ty + tz * tz
        inv_vt = jax.lax.rsqrt(vt2 + 1e-18)
        mu_j = jnp.where(is_grip, mu_grip, mu)
        ft = mu_j * fn * jnp.tanh(vt2 * inv_vt / v_eps)

        ax = ax + fn * nx - ft * tx * inv_vt
        ay = ay + fn * ny - ft * ty * inv_vt
        az = az + fn * nz - ft * tz * inv_vt
        return ax, ay, az

    ax, ay, az = jax.lax.fori_loop(0, T, body, (zero, zero, zero))
    fx_out[:] = ax
    fy_out[:] = ay
    fz_out[:] = az


def pairwise_forces(
    row_state: tuple,  # 9 arrays (S, B): cx cy cz vx vy vz rad mass live
    col_state: tuple,  # 9 arrays (T, B): sx sy sz svx svy svz srad mass live
    K: int,
    *,
    kn: float, zeta: float, share: float, mu: float, mu_grip: float,
    v_eps: float, max_pen: float, max_vn: float,
    interpret: bool = False,
):
    """Per-sphere contact forces (fx, fy, fz), each (S, B).

    B is padded up to a lane multiple internally (padded lanes carry
    live = 0 so they contribute nothing) and sliced back on return.
    """
    S, B = row_state[0].shape
    T = col_state[0].shape[0]
    if B % LANE != 0:
        pad = LANE - B % LANE
        row_state = tuple(
            jnp.pad(x, ((0, 0), (0, pad))) for x in row_state
        )
        col_state = tuple(
            jnp.pad(x, ((0, 0), (0, pad))) for x in col_state
        )
        fx, fy, fz = pairwise_forces(
            row_state, col_state, K, kn=kn, zeta=zeta, share=share, mu=mu,
            mu_grip=mu_grip, v_eps=v_eps, max_pen=max_pen, max_vn=max_vn,
            interpret=interpret,
        )
        return fx[:, :B], fy[:, :B], fz[:, :B]

    kern = functools.partial(
        _kernel, S=S, K=K, T=T, kn=kn, zeta=zeta, share=share, mu=mu,
        mu_grip=mu_grip, v_eps=v_eps, max_pen=max_pen, max_vn=max_vn,
    )
    grid = (B // LANE,)
    row_spec = pl.BlockSpec((S, LANE), lambda b: (0, b),
                            memory_space=pltpu.VMEM)
    col_spec = pl.BlockSpec((T, LANE), lambda b: (0, b),
                            memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((S, LANE), lambda b: (0, b),
                            memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((S, B), row_state[0].dtype)
    fx, fy, fz = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[row_spec] * 9 + [col_spec] * 9,
        out_specs=(out_spec, out_spec, out_spec),
        out_shape=(out_shape, out_shape, out_shape),
        interpret=interpret,
    )(*row_state, *col_state)
    return fx, fy, fz
