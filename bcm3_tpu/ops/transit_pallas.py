"""Fused Pallas kernel for the transit-model budgeted DP5 integration.

The transit-compartment PopPK likelihood integrates every
(chain, patient) lane through a merged stop-time grid with the budgeted
DP5 solver (bcm3_tpu/ode/dp5.py solve_at_times_budget; reference hot
loop: src/odecommon/ODESolverCVODE.cpp:322-445 via
LikelihoodPopPKTrajectory.cpp:259-444). Profiling the XLA lowering at
large batch showed the per-trip one-hot masked update of the recorded
(S, n) buffer is the dominant memory traffic and lives in HBM — at
8k-chain scale the solve is HBM-bound, and throughput DEGRADES with
batch (measured: 87k evals/s at 8k chains -> 32k at 32k chains).

This kernel runs the whole trip loop inside one Pallas program with the
integrator state in vector registers and the recorded buffer in VMEM:
the masked recording writes hit VMEM bandwidth instead of HBM, so
throughput scales with lanes until the VPU is the limit.

Lane layout: (B chains x P patients) flattened and padded to (R, 128)
row tiles; per-lane parameter vectors are (R, 128) tiles; the per-lane
stop grids/dose amounts are (S, R, 128) with the stop axis major.
Blocks tile the R axis. Falls back to interpreter mode off-TPU so tests
run on CPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Dormand-Prince 5(4) tableau (same constants as ode/dp5.py)
_C = np.array([0.0, 1 / 5, 3 / 10, 4 / 5, 8 / 9, 1.0, 1.0])
_A = np.zeros((7, 7))
_A[1, 0] = 1 / 5
_A[2, :2] = [3 / 40, 9 / 40]
_A[3, :3] = [44 / 45, -56 / 15, 32 / 9]
_A[4, :4] = [19372 / 6561, -25360 / 2187, 64448 / 6561, -212 / 729]
_A[5, :5] = [9017 / 3168, -355 / 33, 46732 / 5247, 49 / 176, -5103 / 18656]
_A[6, :6] = [35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84]
_B5 = np.array([35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84, 0.0])
_B4 = np.array(
    [5179 / 57600, 0.0, 7571 / 16695, 393 / 640, -92097 / 339200, 187 / 2100, 1 / 40]
)
_SAFETY = 0.9
_MIN_FACTOR = 0.2
_MAX_FACTOR = 10.0


def _kernel(S, trips, rtol, atol, min_dt, first_dt,
            ka_ref, ke_ref, kel_ref, kt_ref, nt_ref, dose0_ref,
            grid_ref, amt_ref, out_ref, ok_ref):
    ka = ka_ref[:]
    ke = ke_ref[:]
    kel = kel_ref[:]
    k_transit = kt_ref[:]
    n_transit = nt_ref[:]
    dose0 = dose0_ref[:]
    f32 = ka.dtype

    # Erlang log-normalizer (Stirling), loop-invariant
    log_nfac = (
        0.9189385332046727
        + (n_transit + 0.5) * jnp.log(n_transit)
        - n_transit
        + jnp.log(1.0 + 1.0 / (12.0 * n_transit))
    )

    def deriv(t, gut, cen, lt, dose):
        ts = jnp.maximum(t - lt, 0.0)
        log_t = jnp.log(jnp.maximum(k_transit * ts, 1e-30))
        transit = jnp.exp(n_transit * log_t - k_transit * ts - log_nfac)
        inflow = k_transit * transit * dose
        dgut = inflow - (ka + ke) * gut
        dcen = ka * gut - kel * cen
        return dgut, dcen

    shp = ka.shape
    zero = jnp.zeros(shp, f32)

    # initialize the recorded buffer: stop 0 records the initial state
    out_ref[0] = zero
    for s in range(1, S):
        out_ref[s] = jnp.full(shp, jnp.nan, f32)

    t0 = grid_ref[0]

    def body(_i, carry):
        # ok is carried as a float mask: Mosaic rejects i1 vectors in
        # loop carries (scf.yield layout crash)
        t, gut, cen, lt, dose, dt, seg, okf = carry
        ok = okf > 0.5
        seg_c = jnp.minimum(seg, S - 1)
        # one-hot gathers over the (static) stop axis
        t1 = zero
        amt = zero
        for s in range(S):
            sel = seg_c == s
            t1 = jnp.where(sel, grid_ref[s], t1)
            amt = jnp.where(sel, amt_ref[s], amt)
        active = (seg < S) & ok
        remaining = jnp.maximum(t1 - t, 0.0)
        clipped = dt >= remaining
        h = jnp.minimum(dt, remaining)

        # 7-stage embedded RK5(4)
        kg = []
        kc = []
        for i in range(7):
            gi = gut
            ci = cen
            for j in range(i):
                a = float(_A[i, j])  # python float: no x64 promotion
                if a != 0.0:
                    gi = gi + h * a * kg[j]
                    ci = ci + h * a * kc[j]
            dg, dc = deriv(t + float(_C[i]) * h, gi, ci, lt, dose)
            kg.append(dg)
            kc.append(dc)
        g5 = gut
        c5 = cen
        eg = zero
        ec = zero
        for i in range(7):
            if _B5[i] != 0.0:
                g5 = g5 + h * float(_B5[i]) * kg[i]
                c5 = c5 + h * float(_B5[i]) * kc[i]
            diff = float(_B5[i] - _B4[i])
            if diff != 0.0:
                eg = eg + h * diff * kg[i]
                ec = ec + h * diff * kc[i]

        sc_g = atol + rtol * jnp.maximum(jnp.abs(gut), jnp.abs(g5))
        sc_c = atol + rtol * jnp.maximum(jnp.abs(cen), jnp.abs(c5))
        err2 = 0.5 * ((eg / sc_g) ** 2 + (ec / sc_c) ** 2)
        err_norm = jnp.sqrt(err2)
        err_norm = jnp.where(remaining > 0, err_norm, 0.0)
        accept = (err_norm <= 1.0) & active
        factor = jnp.clip(
            _SAFETY * (err_norm + 1e-30) ** -0.2, _MIN_FACTOR, _MAX_FACTOR
        )
        new_dt = jnp.where(active, jnp.where(clipped & accept, dt, h * factor), dt)
        t_new = jnp.where(accept, jnp.where(clipped, t1, t + h), t)
        gut = jnp.where(accept, g5, gut)
        cen = jnp.where(accept, c5, cen)
        reached = accept & (t_new >= t1)

        # record the central compartment at the stop (VMEM-masked writes)
        for s in range(S):
            m = reached & (seg_c == s)
            out_ref[s] = jnp.where(m, cen, out_ref[s])

        # dose event: last_treatment <- t1 when an amount is given
        fire = reached & (amt > 0)
        lt = jnp.where(fire, t1, lt)
        dose = jnp.where(fire, amt, dose)

        seg = seg + reached.astype(jnp.int32)
        finite = (
            jnp.isfinite(gut) & jnp.isfinite(cen) & (new_dt > min_dt)
        )
        ok = ok & (~active | finite)
        return (t_new, gut, cen, lt, dose, new_dt, seg,
                jnp.where(ok, 1.0, 0.0).astype(f32))

    init = (
        t0,
        zero,
        zero,
        zero,  # last_treatment = 0 (initial dose at t=0)
        dose0,
        jnp.full(shp, first_dt, f32),
        jnp.ones(shp, jnp.int32),
        jnp.ones(shp, f32),
    )
    t, gut, cen, lt, dose, dt, seg, okf = jax.lax.fori_loop(
        0, trips, body, init
    )
    ok = (okf > 0.5) & (seg >= S)
    ok_ref[:] = jnp.where(ok, 1.0, 0.0).astype(f32)
    # wipe failed lanes to NaN
    nanv = jnp.full(shp, jnp.nan, f32)
    for s in range(S):
        out_ref[s] = jnp.where(ok, out_ref[s], nanv)


def _pick_bm(rows: int) -> int:
    for bm in (64, 32, 16, 8, 4, 2, 1):
        if rows % bm == 0:
            return bm
    return 1


@functools.partial(
    jax.jit,
    static_argnames=("trips", "rtol", "atol", "min_dt", "first_dt", "interpret"),
)
def _solve_call(ka, ke, kel, kt, nt, dose0, grid, amt,
                trips, rtol, atol, min_dt, first_dt, interpret):
    R = ka.shape[0]
    S = grid.shape[0]
    bm = _pick_bm(R)
    ngrid = (R // bm,)
    row_spec = pl.BlockSpec((bm, 128), lambda i: (i, 0))
    s_spec = pl.BlockSpec((S, bm, 128), lambda i: (0, i, 0))
    out_shape = [
        jax.ShapeDtypeStruct((S, R, 128), ka.dtype),
        jax.ShapeDtypeStruct((R, 128), ka.dtype),  # ok as f32 mask
    ]
    return pl.pallas_call(
        functools.partial(
            _kernel, S, trips, rtol, atol, min_dt, first_dt
        ),
        grid=ngrid,
        in_specs=[row_spec] * 6 + [s_spec, s_spec],
        out_specs=[s_spec, row_spec],
        out_shape=out_shape,
        interpret=interpret,
    )(ka, ke, kel, kt, nt, dose0, grid, amt)


def transit_solve_pallas(
    params,  # dict of (L,) arrays: ka, ke, kel, k_transit, n_transit, dose0
    grid,  # (L, S) stop times
    dose_amt,  # (L, S) dose amounts (0 where no dose is given)
    trips: int = 768,
    rtol: float = 1e-6,
    atol: float = 1e-4,
    min_dt: float = 1e-5,
    first_dt: float = 1e-2,
    interpret: bool | None = None,
):
    """Batched budgeted-DP5 transit solve. Returns (central (L, S), ok (L,)).

    Semantics identical to the solve_at_times_budget path in
    bcm3_tpu/likelihoods/poppk.py _simulate_transit (same tableau, same
    controller, same soft-fail convention)."""
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    L, S = grid.shape
    R = -(-L // 128)
    pad = R * 128 - L

    def prep(x):
        x = jnp.asarray(x, jnp.float32)
        if pad:
            x = jnp.concatenate([x, jnp.zeros((pad,) + x.shape[1:], x.dtype)])
        return x

    ka = prep(params["ka"]).reshape(R, 128)
    ke = prep(params["ke"]).reshape(R, 128)
    kel = prep(params["kel"]).reshape(R, 128)
    kt = prep(params["k_transit"]).reshape(R, 128)
    # clamp padded lanes to benign values (log(n_transit) must be finite)
    nt = jnp.maximum(prep(params["n_transit"]).reshape(R, 128), 1e-3)
    dose0 = prep(params["dose0"]).reshape(R, 128)
    gridp = jnp.moveaxis(prep(grid).reshape(R, 128, S), -1, 0)  # (S, R, 128)
    amtp = jnp.moveaxis(prep(dose_amt).reshape(R, 128, S), -1, 0)

    central, ok = _solve_call(
        ka, ke, kel, kt, nt, dose0, gridp, amtp,
        trips=trips, rtol=rtol, atol=float(atol), min_dt=min_dt,
        first_dt=first_dt, interpret=bool(interpret),
    )
    central = jnp.moveaxis(central, 0, -1).reshape(R * 128, S)[:L]
    ok = (ok > 0.5).reshape(R * 128)[:L]
    return central, ok
