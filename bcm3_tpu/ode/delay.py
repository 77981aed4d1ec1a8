"""Fixed-grid delay-ODE integrator (method of steps, batched).

TPU-native replacement for the reference's CVODE delay variant
(reference: src/odecommon/CVODESolverDelay.{h,cpp}), which keeps the
solution history inside the solver and passes interpolated delayed
states into the derivative callback. Adaptive BDF with a dynamic
history buffer does not vmap; instead we integrate on a fixed uniform
grid with classical RK4 steps, carrying the trajectory-so-far as the
history buffer inside a `lax.scan` — the delayed state is a linear
interpolation into that buffer, exactly the reference's
InterpolateHistory (CVODESolverDelay.cpp) on a static grid. Fixed-step
RK4 on a sufficiently dense grid is the standard batched treatment of
smooth DDEs; non-smooth drug-effect switches should land on grid points
(choose the grid accordingly).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


class DDEResult(NamedTuple):
    ys: jax.Array  # (G, n) solution on the grid
    ok: jax.Array  # () bool


def solve_dde_grid(
    f: Callable,  # f(t, y, y_delayed, args) -> dy/dt
    y0,
    grid,  # (G,) uniform, increasing
    delay: float,
    args=None,
) -> DDEResult:
    """Integrate y'(t) = f(t, y(t), y(t - delay)) on a uniform grid.

    History before the initial time is clamped to y0 (the reference
    starts with an empty history and clamps, CVODESolverDelay
    InterpolateHistory)."""
    G = grid.shape[0]
    n = y0.shape[0]
    dtype = y0.dtype
    t0 = grid[0]
    h = grid[1] - grid[0]

    def lookup(hist, filled, t):
        """Interpolate the history buffer at time t (clamped)."""
        pos = (t - t0) / h
        pos = jnp.clip(pos, 0.0, filled.astype(dtype))
        i0 = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, G - 1)
        i1 = jnp.clip(i0 + 1, 0, G - 1)
        frac = pos - i0
        return hist[i0] * (1.0 - frac) + hist[i1] * frac

    def step(carry, i):
        hist, ok = carry
        t = t0 + (i - 1) * h
        y = hist[i - 1]

        def fd(tt, yy):
            yd = lookup(hist, (i - 1).astype(dtype), tt - delay)
            return f(tt, yy, yd, args)

        k1 = fd(t, y)
        k2 = fd(t + 0.5 * h, y + 0.5 * h * k1)
        k3 = fd(t + 0.5 * h, y + 0.5 * h * k2)
        k4 = fd(t + h, y + h * k3)
        y_new = y + (h / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4)
        ok = ok & jnp.all(jnp.isfinite(y_new))
        y_new = jnp.where(ok, y_new, jnp.nan)
        hist = hist.at[i].set(y_new)
        return (hist, ok), None

    hist0 = jnp.zeros((G, n), dtype=dtype).at[0].set(y0)
    (hist, ok), _ = jax.lax.scan(
        step, (hist0, jnp.asarray(True)), jnp.arange(1, G)
    )
    return DDEResult(ys=hist, ok=ok)


# Bogacki–Shampine 3(2) embedded pair — 4 stages, order 3 with an
# order-2 error estimate; the standard low-order adaptive pair for
# smooth, cheap RHS like the incucyte DDE.
_BS_C = (0.0, 0.5, 0.75, 1.0)
_BS_A = ((), (0.5,), (0.0, 0.75), (2 / 9, 1 / 3, 4 / 9))
_BS_B3 = (2 / 9, 1 / 3, 4 / 9, 0.0)
_BS_B2 = (7 / 24, 1 / 4, 1 / 3, 1 / 8)


def solve_dde_adaptive(
    f: Callable,  # f(t, y, y_delayed, args) -> dy/dt
    y0,
    grid,  # (G,) uniform, increasing — history/output grid
    delay: float,
    args=None,
    rtol: float = 1e-6,
    atol: float = 1e-2,
    trips_per_interval: int = 8,
    min_dt: float = 0.0,
) -> DDEResult:
    """Adaptive method-of-steps DDE integration on a uniform history grid.

    Upgrade of `solve_dde_grid` with true local error control — the role
    of the reference's adaptive CVODESolverDelay (CVODESolverDelay.h:9-35)
    — while keeping the batched static structure: the solution history
    lives on the uniform grid (O(1) interpolated delayed-state lookups,
    the reference's InterpolateHistory), and each grid interval is
    integrated by up to `trips_per_interval` embedded Bogacki–Shampine
    3(2) substeps in a static fori_loop with per-lane step-size control
    (defaults rel 1e-6 / abs 1e-2 = the reference's incucyte tolerances,
    LikelihoodIncucytePopulation.cpp:131).

    Like the reference, delayed lookups assume `delay >= grid spacing`
    (substeps inside interval i only read history up to grid point i-1;
    shorter delays clamp to the newest point). Budget exhaustion or
    non-finite states fail the trajectory (NaN -> -inf -> rejection).
    """
    G = grid.shape[0]
    n = y0.shape[0]
    dtype = y0.dtype
    t0 = grid[0]
    h = grid[1] - grid[0]

    def lookup(hist, hist_dy, filled, t):
        """Cubic-Hermite interpolation of the history at time t (clamped).

        Node derivatives make the delayed-state lookup O(h^4) instead of
        the O(h^2) of linear interpolation, so a coarse output grid does
        not floor the integrator's accuracy — the batched analogue of
        CVODE's polynomial dense output (reference:
        CVODESolverDelay.cpp InterpolateHistory / CVodeGetDky)."""
        pos = (t - t0) / h
        pos = jnp.clip(pos, 0.0, filled.astype(dtype))
        i0 = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, G - 1)
        i1 = jnp.clip(i0 + 1, 0, G - 1)
        s = pos - i0
        y_a, y_b = hist[i0], hist[i1]
        d_a, d_b = hist_dy[i0] * h, hist_dy[i1] * h
        h00 = (1 + 2 * s) * (1 - s) ** 2
        h10 = s * (1 - s) ** 2
        h01 = s * s * (3 - 2 * s)
        h11 = s * s * (s - 1)
        return h00 * y_a + h10 * d_a + h01 * y_b + h11 * d_b

    def interval(carry, i):
        hist, hist_dy, dt, ok = carry
        t_start = t0 + (i - 1) * h
        t_end = t0 + i * h
        y = hist[i - 1]

        def fd(tt, yy):
            yd = lookup(hist, hist_dy, (i - 1).astype(dtype), tt - delay)
            return f(tt, yy, yd, args)

        def substep(_k, c):
            t, y, dt, sok = c
            active = (t < t_end) & sok
            remaining = jnp.maximum(t_end - t, 0.0)
            clipped = dt >= remaining
            dts = jnp.minimum(dt, remaining)
            ks = []
            for s in range(4):
                yi = y
                for j, a in enumerate(_BS_A[s]):
                    yi = yi + dts * a * ks[j]
                ks.append(fd(t + _BS_C[s] * dts, yi))
            y3 = y
            err = jnp.zeros_like(y)
            for s in range(4):
                y3 = y3 + dts * _BS_B3[s] * ks[s]
                err = err + dts * (_BS_B3[s] - _BS_B2[s]) * ks[s]
            scale = atol + rtol * jnp.maximum(jnp.abs(y), jnp.abs(y3))
            err_norm = jnp.sqrt(jnp.mean((err / scale) ** 2))
            err_norm = jnp.where(remaining > 0, err_norm, 0.0)
            accept = (err_norm <= 1.0) & active
            factor = jnp.clip(0.9 * (err_norm + 1e-30) ** (-1 / 3), 0.2, 5.0)
            new_dt = jnp.where(
                active, jnp.where(clipped & accept, dt, dts * factor), dt
            )
            t = jnp.where(accept, jnp.where(clipped, t_end, t + dts), t)
            y = jnp.where(accept, y3, y)
            sok = sok & (
                ~active | (jnp.all(jnp.isfinite(y)) & (new_dt > min_dt))
            )
            return (t, y, new_dt, sok)

        t, y, dt, sok = jax.lax.fori_loop(
            0, trips_per_interval, substep, (t_start, y, dt, ok)
        )
        ok = sok & (t >= t_end)
        y = jnp.where(ok, y, jnp.nan)
        hist = hist.at[i].set(y)
        hist_dy = hist_dy.at[i].set(fd(t_end, y))
        return (hist, hist_dy, dt, ok), None

    hist0 = jnp.zeros((G, n), dtype=dtype).at[0].set(y0)
    dy0 = f(t0, y0, y0, args)  # history before t0 is clamped to y0
    hist_dy0 = jnp.zeros((G, n), dtype=dtype).at[0].set(dy0)
    (hist, hist_dyF, dtF, ok), _ = jax.lax.scan(
        interval,
        (hist0, hist_dy0, jnp.asarray(h, dtype), jnp.asarray(True)),
        jnp.arange(1, G),
    )
    return DDEResult(ys=hist, ok=ok)
