"""Fused Pallas kernel for the PopPK dosing-interval propagation.

The one-compartment PopPK likelihood propagates every (chain, patient)
lane through K dosing intervals with an exact closed form
(bcm3_tpu/ode/linear_pk.py; reference hot loop:
src/likelihoods/LikelihoodPopPKTrajectory.cpp:259-444 +
src/odecommon/ODESolverCVODE.cpp:322-445). As a `lax.scan`, each of the
K steps is a separate fused XLA kernel whose (B*P, 2) carry round-trips
HBM — ~2*K carry transfers per likelihood evaluation. This kernel runs
the whole K-interval recurrence inside one Pallas program with the carry
held in VMEM/registers, writing only the per-interval start states
(which downstream observation interpolation genuinely needs).

Lane layout: (B chains x P patients) flattened with the patient index
minor. When P divides 128, every 128-lane vector register holds 128/P
whole patient cycles, so per-patient constants (dosing interval, dose
amounts, initial dose) are 128-wide tiles shared by all programs — no
per-lane gathers.

Falls back to interpreter mode off-TPU so tests run on CPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1e-12


def _propagate_kernel(K: int, ka_ref, ke_ref, kel_ref, y0_ref, dt_ref,
                      dose_ref, out_gut_ref, out_cen_ref):
    """One program: (bm, 128) lanes through all K intervals in VMEM."""
    ka = ka_ref[:]
    ke = ke_ref[:]
    kel = kel_ref[:]
    a = ka + ke
    dt = dt_ref[0, :]  # (128,) per-patient dosing interval tile

    # closed-form per-interval factors are loop-invariant: hoist them
    eg = jnp.exp(-a * dt)
    ec = jnp.exp(-kel * dt)
    d = a - kel
    safe_d = jnp.where(jnp.abs(d) < _EPS, _EPS, d)
    ratio = jnp.where(
        jnp.abs(d) < _EPS, dt * ec, (ec - eg) / safe_d
    )
    ka_ratio = ka * ratio

    gut = jnp.broadcast_to(y0_ref[0, :], ka.shape)
    cen = jnp.zeros_like(ka)
    for k in range(K):  # static unroll, K ~ tens
        out_gut_ref[k] = gut
        out_cen_ref[k] = cen
        cen = cen * ec + gut * ka_ratio
        gut = gut * eg + dose_ref[k, :]


def _pick_bm(rows: int) -> int:
    for bm in (256, 128, 64, 32, 16, 8, 4, 2, 1):
        if rows % bm == 0:
            return bm
    return 1


@functools.partial(jax.jit, static_argnames=("interpret",))
def _propagate_call(ka, ke, kel, y0_tile, dt_tile, dose_tile, interpret):
    R = ka.shape[0]
    K = dose_tile.shape[0]
    bm = _pick_bm(R)
    grid = (R // bm,)
    row_spec = pl.BlockSpec((bm, 128), lambda i: (i, 0))
    const_spec = pl.BlockSpec((1, 128), lambda i: (0, 0))
    dose_spec = pl.BlockSpec((K, 128), lambda i: (0, 0))
    out_spec = pl.BlockSpec((K, bm, 128), lambda i: (0, i, 0))
    out_shape = jax.ShapeDtypeStruct((K, R, 128), ka.dtype)
    return pl.pallas_call(
        functools.partial(_propagate_kernel, K),
        grid=grid,
        in_specs=[row_spec, row_spec, row_spec, const_spec, const_spec, dose_spec],
        out_specs=[out_spec, out_spec],
        out_shape=[out_shape, out_shape],
        interpret=interpret,
    )(ka, ke, kel, y0_tile, dt_tile, dose_tile)


def eligible(num_patients: int) -> bool:
    """Lane tiling requires the patient count to divide the 128-lane
    vector register."""
    return num_patients >= 1 and 128 % num_patients == 0


def propagate_intervals_one_compartment(
    ka, ke, kel, initial_dose, interval, dose_amount, interpret=None
):
    """Batched interval-start states for the one-compartment model.

    ka/ke/kel: (B, P); initial_dose/interval: (P,); dose_amount: (P, K).
    Returns (ys_gut, ys_central): (K, B, P) — the state at the START of
    each dosing interval, matching the lax.scan in
    PopPKLikelihood._simulate_linear (poppk.py).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, P = ka.shape
    K = dose_amount.shape[1]
    if not eligible(P) or (B * P) % 128 != 0:
        raise ValueError(
            f"lane layout needs P | 128 and 128 | B*P (got B={B}, P={P})"
        )
    rep = 128 // P
    R = (B * P) // 128
    dtype = ka.dtype

    def lanes(x):
        return x.reshape(R, 128)

    y0_tile = jnp.tile(jnp.asarray(initial_dose, dtype), rep)[None, :]
    dt_tile = jnp.tile(jnp.asarray(interval, dtype), rep)[None, :]
    dose_tile = jnp.tile(jnp.asarray(dose_amount, dtype).T, (1, rep))  # (K,128)

    ys_gut, ys_cen = _propagate_call(
        lanes(ka), lanes(ke), lanes(kel), y0_tile, dt_tile, dose_tile,
        interpret,
    )
    return ys_gut.reshape(K, B, P), ys_cen.reshape(K, B, P)


def propagate_intervals_reference(ka, ke, kel, initial_dose, interval, dose_amount):
    """Pure-jnp scan oracle with identical semantics (for tests)."""
    from bcm3_tpu.ode import linear_pk

    B, P = ka.shape
    K = dose_amount.shape[1]
    y0 = jnp.zeros((B, P, 2), ka.dtype)
    y0 = y0.at[..., 0].set(jnp.asarray(initial_dose, ka.dtype)[None, :])
    dt = jnp.asarray(interval, ka.dtype)[None, :]

    def step(y, k):
        y_start = y
        y_end = linear_pk.propagate_one_compartment(y, dt, ka, ke, kel)
        y_next = y_end.at[..., 0].add(jnp.asarray(dose_amount.T, ka.dtype)[k][None, :])
        return y_next, y_start

    _, ys = jax.lax.scan(step, y0, jnp.arange(K))
    return ys[..., 0], ys[..., 1]
