"""Differentiable simulation: gradients through the coupled solver."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qpsim_tpu.diff import fit_parameters, make_differentiable_decay

_CFG = dict(
    nx=16,
    num_energy_bins=6,
    energy_max_factor=3.0,
    dt=2.0,
    n_steps=25,
    n0=0.5,
    bath_temperature=0.0,
    phonon_feedback=False,  # phonons escape instantly: recombination is a loss
)


@pytest.fixture(scope="module")
def decay_fn():
    return make_differentiable_decay(**_CFG)


def test_decay_matches_engine(decay_fn):
    # the differentiable path reproduces the engine's frozen-bath physics
    from qpsim_tpu.geometry.mask import extract_edge_segments
    from qpsim_tpu.models.params import BoundaryCondition
    from qpsim_tpu.solver.engine import run_2d_crank_nicolson

    params = {"D0": jnp.asarray(6.0), "tau_s": jnp.asarray(440.0), "tau_r": jnp.asarray(300.0)}
    trace = np.asarray(decay_fn(params))

    mask = np.ones((1, _CFG["nx"]), dtype=bool)
    edges = extract_edge_segments(mask)
    bcs = {e.edge_id: BoundaryCondition(kind="reflective") for e in edges}
    _, _, mass, *_ = run_2d_crank_nicolson(
        mask=mask, edges=edges, edge_conditions=bcs,
        initial_field=np.full(mask.shape, _CFG["n0"]),
        diffusion_coefficient=6.0, dt=_CFG["dt"],
        total_time=_CFG["dt"] * _CFG["n_steps"], dx=1.0, store_every=1,
        energy_gap=180.0, energy_max_factor=3.0, num_energy_bins=6,
        enable_recombination=True, enable_scattering=True,
        tau_s=440.0, tau_r=300.0, bath_temperature=0.0,
        freeze_phonon_dynamics=True,
    )
    np.testing.assert_allclose(trace, mass, rtol=1e-9)
    # the curve visibly decays in this regime
    assert trace[-1] < 0.97 * trace[0]


def test_gradients_match_finite_differences(decay_fn):
    def total_final(params):
        return decay_fn(params)[-1]

    params = {"D0": jnp.asarray(6.0), "tau_s": jnp.asarray(440.0), "tau_r": jnp.asarray(300.0)}
    grads = jax.grad(total_final)(params)
    for key, eps in (("tau_r", 1e-2), ("tau_s", 1e-2)):
        up = dict(params)
        up[key] = params[key] + eps
        dn = dict(params)
        dn[key] = params[key] - eps
        fd = (total_final(up) - total_final(dn)) / (2 * eps)
        assert float(grads[key]) == pytest.approx(float(fd), rel=2e-4), key
    # physical sign: slower recombination (larger tau_r) keeps more QPs
    assert float(grads["tau_r"]) > 0


def test_gap_gradient_matches_finite_differences(decay_fn):
    # the superconducting gap itself is a differentiable parameter: the BCS
    # DOS, both collision kernels and D(E) rebuild from it inside the trace
    def total_final(params):
        return decay_fn(params)[-1]

    params = {
        "D0": jnp.asarray(6.0),
        "tau_s": jnp.asarray(440.0),
        "tau_r": jnp.asarray(300.0),
        "gap": jnp.asarray(172.0),  # below nominal: all bins stay above Δ
    }
    g = jax.grad(total_final)(params)["gap"]
    eps = 1e-3
    up = dict(params, gap=params["gap"] + eps)
    dn = dict(params, gap=params["gap"] - eps)
    fd = (total_final(up) - total_final(dn)) / (2 * eps)
    assert np.isfinite(float(g))
    assert float(g) == pytest.approx(float(fd), rel=2e-4)
    # omitting the gap reproduces the static-gap physics exactly
    p3 = {k: params[k] for k in ("D0", "tau_s", "tau_r")}
    np.testing.assert_allclose(
        np.asarray(decay_fn(dict(p3, gap=jnp.asarray(180.0)))),
        np.asarray(decay_fn(p3)),
        rtol=1e-12,
    )


def test_gap_recovery_by_gradient_fit(decay_fn):
    # recover a suppressed gap from a decay curve (gap extraction — the
    # measurement behind gap-suppression studies)
    observed = decay_fn(
        {
            "D0": jnp.asarray(6.0),
            "tau_s": jnp.asarray(440.0),
            "tau_r": jnp.asarray(300.0),
            "gap": jnp.asarray(168.0),
        }
    )

    def decay_gap(params):
        return decay_fn(
            {"D0": jnp.asarray(6.0), "tau_s": jnp.asarray(440.0), "tau_r": jnp.asarray(300.0), **params}
        )

    fitted = fit_parameters(
        observed,
        {"gap": 178.0},
        decay_fn=decay_gap,
        learning_rate=0.01,
        n_iters=120,
    )
    assert fitted["gap"] == pytest.approx(168.0, rel=0.01)


def test_parameter_recovery_by_gradient_fit(decay_fn):
    # Fit the identifiable parameter: total QP number is insensitive to tau_s
    # (scattering conserves number), so only tau_r is recoverable from this
    # observable — fix the others and recover tau_r from a wrong guess.
    true_params = {"D0": 6.0, "tau_s": 440.0, "tau_r": 250.0}
    observed = decay_fn({k: jnp.asarray(v) for k, v in true_params.items()})

    def decay_tau_r(params):
        return decay_fn({"D0": jnp.asarray(6.0), "tau_s": jnp.asarray(440.0), **params})

    fitted = fit_parameters(
        observed,
        {"tau_r": 600.0},  # wrong guess, 2.4x off
        decay_fn=decay_tau_r,
        learning_rate=0.08,
        n_iters=150,
    )
    assert fitted["tau_r"] == pytest.approx(250.0, rel=0.02)


def test_2d_sim_observables_and_gradients():
    from qpsim_tpu.diff import make_differentiable_sim
    from qpsim_tpu.geometry.mask import extract_edge_segments
    from qpsim_tpu.models.params import BoundaryCondition

    mask = np.ones((6, 10), dtype=bool)
    mask[2:4, 4:6] = False  # cutout: real 2D masked geometry
    edges = extract_edge_segments(mask)
    bcs = {e.edge_id: BoundaryCondition(kind="reflective") for e in edges}
    sim = make_differentiable_sim(
        mask=mask, edges=edges, edge_conditions=bcs,
        num_energy_bins=5, energy_max_factor=3.0, dt=1.0, n_steps=8,
        n0=0.3, bath_temperature=0.0, phonon_feedback=False,
        observables=("total", "spatial", "phonon_spectrum", "phonon_total"),
        store_every=2,
    )
    params = {"D0": jnp.asarray(6.0), "tau_s": jnp.asarray(440.0), "tau_r": jnp.asarray(300.0)}
    out = sim(params)
    assert out["total"].shape == (9,)
    assert out["spatial"].shape == (5, 6, 10)  # t=0 + 4 stored frames
    assert out["phonon_spectrum"].shape[0] > 0
    assert out["phonon_total"].shape == (9,)
    # masked cells stay empty, mass decays with recombination on
    spatial = np.asarray(out["spatial"])
    assert np.abs(spatial[:, 2:4, 4:6]).max() == 0.0
    assert float(out["total"][-1]) < float(out["total"][0])
    # spatial trace integrates to the total trace at stored steps
    np.testing.assert_allclose(
        spatial.reshape(5, -1).sum(axis=1), np.asarray(out["total"])[::2], rtol=1e-12
    )
    # gradients flow through 2D geometry to a spatially-resolved loss
    g = jax.grad(lambda p: jnp.sum(sim(p)["spatial"][-1] ** 2))(params)
    assert all(np.isfinite(float(v)) for v in g.values())
    assert float(jnp.abs(g["tau_r"])) > 0


def test_fit_ensemble_recovers_batch():
    from qpsim_tpu.diff import fit_ensemble

    fn = make_differentiable_decay(**{**_CFG, "n_steps": 15})
    true = {"D0": np.array([6.0, 6.0]), "tau_s": np.array([440.0, 440.0]),
            "tau_r": np.array([250.0, 500.0])}
    observed = np.stack([
        np.asarray(fn({k: jnp.asarray(v[b]) for k, v in true.items()}))
        for b in range(2)
    ])
    fitted = fit_ensemble(
        observed,
        {"D0": np.array([6.0, 6.0]), "tau_s": np.array([440.0, 440.0]),
         "tau_r": np.array([350.0, 350.0])},
        decay_fn=fn, learning_rate=0.1, n_iters=60,
    )
    np.testing.assert_allclose(fitted["tau_r"], true["tau_r"], rtol=0.05)


def test_2d_sim_honors_boundary_sources():
    # dirichlet boundaries inject density: the differentiable sim must agree
    # with the engine (it used to drop the source term and decay to zero)
    from qpsim_tpu.diff import make_differentiable_sim
    from qpsim_tpu.geometry.mask import extract_edge_segments
    from qpsim_tpu.models.params import BoundaryCondition
    from qpsim_tpu.solver.engine import run_2d_crank_nicolson

    g = 2e-5
    mask = np.ones((1, 16), dtype=bool)
    edges = extract_edge_segments(mask)
    bcs = {e.edge_id: BoundaryCondition(kind="dirichlet", value=g) for e in edges}
    sim = make_differentiable_sim(
        mask=mask, edges=edges, edge_conditions=bcs,
        num_energy_bins=4, energy_max_factor=3.0, dt=1.0, n_steps=60,
        n0=0.0, bath_temperature=0.0, phonon_feedback=False)
    out = sim({"D0": jnp.asarray(6.0), "tau_s": jnp.asarray(1e9), "tau_r": jnp.asarray(1e9)})
    total = float(out["total"][-1])
    _, _, mass, *_ = run_2d_crank_nicolson(
        mask=mask, edges=edges, edge_conditions=bcs, initial_field=np.zeros(mask.shape),
        diffusion_coefficient=6.0, dt=1.0, total_time=60.0, dx=1.0, store_every=60,
        energy_gap=180.0, num_energy_bins=4, energy_max_factor=3.0,
        tau_s=1e9, tau_r=1e9, enable_scattering=True, enable_recombination=True,
        bath_temperature=0.0, freeze_phonon_dynamics=True)
    assert total > 0
    np.testing.assert_allclose(total, mass[-1], rtol=1e-3)


def test_pulse_energy_is_differentiable_and_recoverable():
    """Photon pulse energy as a traced parameter: gradient matches finite
    differences and a gradient fit recovers the true rate."""
    import jax
    import jax.numpy as jnp

    from qpsim_tpu.diff import fit_parameters, make_differentiable_sim

    sim = make_differentiable_sim(
        nx=24, num_energy_bins=6, n_steps=24, dt=0.05, n0=1e-6,
        phonon_feedback=False, pulse_window=(0.1, 0.4),
    )
    base = {"D0": 6.0, "tau_s": 440.0, "tau_r": 440.0}

    def total(rate):
        return jnp.sum(sim({**base, "pulse_rate": rate})["total"])

    g = jax.grad(total)(2e-5)
    eps = 1e-9
    fd = (total(2e-5 + eps) - total(2e-5 - eps)) / (2 * eps)
    assert np.isfinite(g) and g > 0
    np.testing.assert_allclose(float(g), float(fd), rtol=1e-5)

    true_rate = 3e-5
    observed = sim({**base, "pulse_rate": true_rate})["total"]
    fitted = fit_parameters(
        observed,
        {"pulse_rate": 1e-5},
        decay_fn=lambda p: sim({**base, **p})["total"],
        learning_rate=0.2,
        n_iters=120,
    )
    assert abs(float(fitted["pulse_rate"]) - true_rate) / true_rate < 0.02


@pytest.mark.slow
def test_remat_modes_agree():
    """Rematerialized backward passes change memory, never results.

    remat=False / remat=True / two-level remat_chunk (with a remainder
    chunk) must produce bit-identical forward observables and gradients
    that agree to roundoff — including through a pulse window, whose
    step index k crosses the chunked scan's reshape.
    """
    from qpsim_tpu.diff import make_differentiable_sim

    field = 1e-4 * (1.0 + np.cos(np.linspace(0, np.pi, 12)))[None, :]
    cfg = dict(
        nx=12, num_energy_bins=5, energy_max_factor=3.0, dt=0.5,
        n_steps=11, n0=1e-4, initial_field=field,  # non-uniform: dD0 ≠ 0
        bath_temperature=0.0, phonon_feedback=True,
        observables=("total", "spatial", "phonon_total"), store_every=3,
        pulse_window=(1.0, 2.0),
    )
    sims = {
        "plain": make_differentiable_sim(**cfg, remat=False),
        "step": make_differentiable_sim(**cfg, remat=True),
        "chunked": make_differentiable_sim(**cfg, remat=True, remat_chunk=4),
    }
    params = {
        "D0": jnp.asarray(6.0), "tau_s": jnp.asarray(440.0),
        "tau_r": jnp.asarray(300.0), "pulse_rate": jnp.asarray(2e-5),
    }

    def loss(sim):
        def fn(p):
            out = sim(p)
            return (
                jnp.sum(out["total"] ** 2)
                + jnp.sum(out["spatial"][-1])
                + out["phonon_total"][-1]
            )
        return fn

    ref_out = sims["plain"](params)
    ref_grad = jax.grad(loss(sims["plain"]))(params)
    for name in ("step", "chunked"):
        out = sims[name](params)
        for key in ref_out:
            np.testing.assert_array_equal(
                np.asarray(out[key]), np.asarray(ref_out[key]),
                err_msg=f"{name}:{key}",
            )
        g = jax.grad(loss(sims[name]))(params)
        for key in ref_grad:
            # backward-pass recomputation re-associates XLA fusions, so
            # gradients agree to roundoff-amplified tolerance, not bitwise
            np.testing.assert_allclose(
                float(g[key]), float(ref_grad[key]), rtol=1e-6,
                err_msg=f"{name}:grad[{key}]",
            )
