"""Stiff Rosenbrock solver tests (reference role:
src/odecommon/ODESolverCVODE.cpp)."""

import jax
import jax.numpy as jnp
import numpy as np
from scipy.integrate import solve_ivp

from bcm3_tpu.ode.rosenbrock import solve_at_times_stiff


def test_linear_decay_exact():
    f = lambda t, y, args: -args * y
    ts = jnp.linspace(0.0, 5.0, 11)
    res = solve_at_times_stiff(
        f, jnp.asarray([1.0]), ts, args=jnp.asarray(2.0), rtol=1e-8, atol=1e-12
    )
    assert bool(res.ok)
    np.testing.assert_allclose(
        np.asarray(res.ys)[:, 0], np.exp(-2.0 * np.asarray(ts)), rtol=1e-6
    )


def test_robertson_stiff_vs_scipy():
    """The classic Robertson problem: stiffness ratio ~1e11. An explicit
    solver would need ~1e9 steps; the L-stable Rosenbrock must handle it
    in a few hundred."""

    def f(t, y, args):
        k1, k2, k3 = 0.04, 3e7, 1e4
        r1 = k1 * y[0]
        r2 = k2 * y[1] * y[1]
        r3 = k3 * y[1] * y[2]
        return jnp.array(
            [-r1 + r3, r1 - r2 - r3, r2], dtype=y.dtype
        )

    ts = jnp.asarray([0.0, 1e-2, 1e0, 1e2, 1e4])
    y0 = jnp.asarray([1.0, 0.0, 0.0])
    res = solve_at_times_stiff(f, y0, ts, rtol=1e-7, atol=1e-12)
    assert bool(res.ok)
    assert int(res.n_steps) < 5000

    def f_np(t, y):
        return np.asarray(f(t, jnp.asarray(y), None))

    sol = solve_ivp(
        f_np, (0, 1e4), [1.0, 0.0, 0.0], method="Radau",
        t_eval=np.asarray(ts)[1:], rtol=1e-10, atol=1e-14,
    )
    got = np.asarray(res.ys)[1:]
    np.testing.assert_allclose(got, sol.y.T, rtol=2e-4, atol=1e-10)
    # mass conservation
    np.testing.assert_allclose(got.sum(axis=1), 1.0, rtol=1e-6)


def test_vmap_and_jit():
    def f(t, y, args):
        return jnp.array([-args * y[0] * y[0]], dtype=y.dtype)

    ts = jnp.linspace(0.0, 2.0, 5)
    ks = jnp.asarray([0.5, 5.0, 50.0, 500.0])

    @jax.jit
    def batch(ks):
        return jax.vmap(
            lambda k: solve_at_times_stiff(
                f, jnp.asarray([1.0]), ts, args=k, rtol=1e-8, atol=1e-10
            ).ys
        )(ks)

    ys = np.asarray(batch(ks))
    # exact: y(t) = 1/(1 + k t)
    for i, k in enumerate(np.asarray(ks)):
        np.testing.assert_allclose(
            ys[i, :, 0], 1.0 / (1.0 + k * np.asarray(ts)), rtol=1e-5
        )


def test_events_and_failure():
    # event: add a bolus at each stop
    def f(t, y, args):
        return -y

    def event(i, t, y, args):
        return y + 1.0

    ts = jnp.asarray([0.0, 1.0, 2.0])
    res = solve_at_times_stiff(
        f, jnp.asarray([0.0]), ts, event_fn=event, rtol=1e-10, atol=1e-12
    )
    assert bool(res.ok)
    e = np.exp(-1.0)
    np.testing.assert_allclose(np.asarray(res.ys)[1, 0], e, rtol=1e-7)
    np.testing.assert_allclose(np.asarray(res.ys)[2, 0], (e + 1) * e, rtol=1e-7)

    # step-budget overrun -> NaN + not ok, no exception (the batched
    # analogue of CVODE's max-steps error, ODESolverCVODE.cpp:354-370)
    def frob(t, y, args):
        r1 = 0.04 * y[0]
        r2 = 3e7 * y[1] * y[1]
        r3 = 1e4 * y[1] * y[2]
        return jnp.array([-r1 + r3, r1 - r2 - r3, r2], dtype=y.dtype)

    res2 = solve_at_times_stiff(
        frob,
        jnp.asarray([1.0, 0.0, 0.0]),
        jnp.asarray([0.0, 1e4]),
        rtol=1e-10,
        atol=1e-14,
        max_steps_per_segment=5,
    )
    assert not bool(res2.ok)
    assert np.isnan(np.asarray(res2.ys)[1]).all()


def test_nonautonomous():
    # y' = cos(t) -> y = sin(t); exercises the ft (time-derivative) term
    f = lambda t, y, args: jnp.array([jnp.cos(t)], dtype=y.dtype)
    ts = jnp.linspace(0.0, 3.0, 7)
    res = solve_at_times_stiff(f, jnp.asarray([0.0]), ts, rtol=1e-8, atol=1e-10)
    assert bool(res.ok)
    np.testing.assert_allclose(
        np.asarray(res.ys)[:, 0], np.sin(np.asarray(ts)), atol=1e-6
    )
