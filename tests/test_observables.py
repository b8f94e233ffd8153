"""Mattis–Bardeen resonator observables: analytic thermal limits, response
signs, and the end-to-end pulse → δf/f trace."""

import numpy as np
import pytest
from scipy.special import i0, k0

from qpsim_tpu.constants import K_B_UEV_PER_K
from qpsim_tpu.observables import (
    PLANCK_UEV_PER_GHZ,
    mattis_bardeen_conductivity,
    mkid_response_trace,
    occupation_from_spectral,
)

GAP = 180.0


def _fd(E, T):
    return 1.0 / (np.exp(E / (K_B_UEV_PER_K * T)) + 1.0)


def _fine_grid(n=600, f_max=8.0):
    dE = (f_max - 1.0) * GAP / n
    return GAP + dE * (np.arange(n) + 0.5)


def test_thermal_limit_matches_analytic_approximations():
    """Thermal Fermi–Dirac occupation reproduces the standard
    low-temperature Mattis–Bardeen approximations (Gao 2008 eq. 2.96-2.97):

        σ1/σn = (4Δ/ħω) e^{−Δ/kT} sinh(ξ) K0(ξ)
        σ2/σn = (πΔ/ħω) [1 − 2 e^{−Δ/kT} e^{−ξ} I0(ξ)],  ξ = ħω/2kT

    The approximations themselves are O(e^{−Δ/kT}, ħω/Δ, kT/Δ) accurate,
    so the comparison tolerance is a few percent, not machine precision.
    """
    E = _fine_grid()
    hnu = PLANCK_UEV_PER_GHZ * 5.0  # 5 GHz readout, ~20.7 µeV << 2Δ
    for T in (0.20, 0.25, 0.30):
        kT = K_B_UEV_PER_K * T
        xi = hnu / (2.0 * kT)
        s1, s2 = mattis_bardeen_conductivity(_fd(E, T), E, GAP, hnu)
        s1_ref = 4.0 * GAP / hnu * np.exp(-GAP / kT) * np.sinh(xi) * k0(xi)
        s2_ref = np.pi * GAP / hnu * (1.0 - 2.0 * np.exp(-GAP / kT) * np.exp(-xi) * i0(xi))
        assert s1 == pytest.approx(s1_ref, rel=0.05), (T, s1, s1_ref)
        assert s2 == pytest.approx(s2_ref, rel=0.01), (T, s2, s2_ref)


def test_zero_occupation_baseline():
    """f = 0: no dissipation; σ2 equals the full kinetic-inductance
    baseline ≈ πΔ/ħω (exact to the quadrature, ħω≪Δ corrections small)."""
    E = _fine_grid()
    hnu = PLANCK_UEV_PER_GHZ * 5.0
    s1, s2 = mattis_bardeen_conductivity(np.zeros_like(E), E, GAP, hnu)
    assert s1 == 0.0
    assert s2 == pytest.approx(np.pi * GAP / hnu, rel=0.01)


def test_excess_quasiparticles_shift_down_and_dissipate():
    """More quasiparticles: σ1 rises (dissipation), σ2 falls (inductance
    grows, resonance shifts DOWN) — the universally observed MKID signs."""
    E = _fine_grid()
    hnu = PLANCK_UEV_PER_GHZ * 5.0
    f_th = _fd(E, 0.25)
    # excess nonequilibrium quasiparticles near the gap edge
    f_x = f_th + 1e-4 * np.exp(-(E - GAP) / 30.0)
    s1a, s2a = mattis_bardeen_conductivity(f_th, E, GAP, hnu)
    s1b, s2b = mattis_bardeen_conductivity(f_x, E, GAP, hnu)
    assert s1b > s1a
    assert s2b < s2a


def test_pair_breaking_readout_rejected():
    E = _fine_grid()
    with pytest.raises(ValueError, match="pair-breaking"):
        mattis_bardeen_conductivity(np.zeros_like(E), E, GAP, 2.1 * GAP)
    with pytest.raises(ValueError, match="positive"):
        mattis_bardeen_conductivity(np.zeros_like(E), E, GAP, 0.0)


def test_occupation_from_spectral_shapes():
    E = _fine_grid(n=8)
    n = np.ones((8, 3, 4))
    f = occupation_from_spectral(n, E, GAP)
    assert f.shape == (8, 3, 4)
    # higher DOS near the gap edge -> smaller occupation for equal density
    assert f[0, 0, 0] < f[-1, 0, 0]


def test_mkid_response_trace_end_to_end():
    """A photon pulse produces the canonical MKID signature: δf/f dips
    negative, δ(1/Q) rises, both recover as quasiparticles recombine."""
    import jax

    from qpsim_tpu import run_2d_crank_nicolson
    from qpsim_tpu.geometry.mask import create_intrinsic_geometry, mask_from_lists
    from qpsim_tpu.models.params import BoundaryCondition, ExternalGenerationSpec

    geo = create_intrinsic_geometry(width=16, height=4)
    mask = mask_from_lists(geo.mask)
    bcs = {e.edge_id: BoundaryCondition(kind="reflective") for e in geo.edges}
    times, frames, mass, clim, ef, eb = run_2d_crank_nicolson(
        mask=mask,
        edges=geo.edges,
        edge_conditions=bcs,
        initial_field=np.where(mask, 1e-6, 0.0),
        diffusion_coefficient=6.0,
        dt=0.05,
        total_time=4.0,
        dx=1.0,
        store_every=10,
        energy_gap=GAP,
        energy_max_factor=3.0,
        num_energy_bins=8,
        enable_recombination=True,
        enable_scattering=True,
        bath_temperature=0.0,
        tau_0=60.0,
        freeze_phonon_dynamics=True,
        external_generation=ExternalGenerationSpec(
            mode="pulse", pulse_start=0.1, pulse_duration=0.3, pulse_rate=5e-3
        ),
    )
    resp = mkid_response_trace(ef, eb, GAP, readout_ghz=5.0)
    df = np.asarray(resp["df_over_f"])
    dq = np.asarray(resp["dQ_inv"])
    assert df[0] == 0.0 and dq[0] == 0.0
    i_min = int(df.argmin())
    assert df[i_min] < -1e-12  # downward frequency shift
    assert dq.max() > 1e-12  # added dissipation
    # recovery: |δf| shrinks monotonically after the peak response
    tail = np.abs(df[i_min:])
    assert np.all(np.diff(tail) <= 1e-18)
    # weights concentrate the sensitivity: with a hand-built two-region
    # frame set (left half hot, right half mildly excited), weighting the
    # hot region must deepen the response
    region = np.full((4, 8), np.nan)
    region[1:3, :] = 1.0
    two = lambda left, right: [
        np.concatenate([left * region, right * region], axis=1) for _ in eb
    ]
    f_ref = two(1e-9, 1e-9)
    f_exc = two(2e-4, 4e-9)
    w_hot = np.zeros((4, 16)); w_hot[:, :8] = 1.0
    w_cold = np.zeros((4, 16)); w_cold[:, 8:] = 1.0
    r_hot = mkid_response_trace([f_ref, f_exc], eb, GAP, weights=w_hot)
    r_cold = mkid_response_trace([f_ref, f_exc], eb, GAP, weights=w_cold)
    assert r_hot["df_over_f"][1] < r_cold["df_over_f"][1] < 0


def test_differentiable_mkid_observable():
    """The 'mkid' observable differentiates: d(δf/f)/d(pulse_rate) is
    negative (more photons → deeper dip) and matches finite differences."""
    import jax
    import jax.numpy as jnp

    from qpsim_tpu.diff import make_differentiable_sim

    sim = make_differentiable_sim(
        nx=24,
        num_energy_bins=8,
        energy_max_factor=3.0,
        dt=0.05,
        n_steps=30,
        bath_temperature=0.2,
        pulse_window=(0.1, 0.4),
        observables=("total", "mkid"),
        mkid_readout_ghz=5.0,
        mkid_alpha=0.05,
    )
    params = dict(
        D0=jnp.asarray(6.0),
        tau_s=jnp.asarray(440.0),
        tau_r=jnp.asarray(440.0),
        pulse_rate=jnp.asarray(2e-4),
    )
    out = sim(params)
    df = np.asarray(out["mkid_df"])
    assert df.shape == (31,) and df[0] == 0.0
    assert df.min() < -1e-12  # the dip exists

    def final_df(rate):
        p = dict(params, pulse_rate=rate)
        return sim(p)["mkid_df"][-1]

    g = jax.grad(final_df)(jnp.asarray(2e-4))
    assert float(g) < 0.0  # more photons -> lower frequency
    eps = 1e-8
    fd = (float(final_df(jnp.asarray(2e-4 + eps))) - float(final_df(jnp.asarray(2e-4 - eps)))) / (2 * eps)
    assert float(g) == pytest.approx(fd, rel=1e-4)


def test_traced_matches_numpy_and_gap_gradient_finite():
    """The traced and numpy MB implementations must not drift (same
    quadrature, 1e-10), and gradients through a TRACED GAP stay finite —
    the clamped first cell edge sits exactly at Δ, where a naive sqrt has
    an infinite derivative."""
    import jax

    from qpsim_tpu.observables import mattis_bardeen_conductivity_traced

    E = _fine_grid(n=200)
    f = _fd(E, 0.25)
    hnu = PLANCK_UEV_PER_GHZ * 5.0
    a1, a2 = mattis_bardeen_conductivity(f, E, GAP, hnu)
    b1, b2 = mattis_bardeen_conductivity_traced(f, E, GAP, hnu)
    assert float(b1) == pytest.approx(a1, rel=1e-10)
    assert float(b2) == pytest.approx(a2, rel=1e-10)

    g1 = jax.grad(
        lambda g: mattis_bardeen_conductivity_traced(f, E, g, hnu)[0]
    )(GAP)
    g2 = jax.grad(
        lambda g: mattis_bardeen_conductivity_traced(f, E, g, hnu)[1]
    )(GAP)
    assert np.isfinite(float(g1)) and np.isfinite(float(g2))
    # and slightly above the grid start too (fitted gaps move)
    g1b = jax.grad(
        lambda g: mattis_bardeen_conductivity_traced(f, E, g, hnu)[0]
    )(GAP * 1.01)
    assert np.isfinite(float(g1b))


def test_mkid_observable_rejects_pair_breaking_readout():
    from qpsim_tpu.diff import make_differentiable_sim

    with pytest.raises(ValueError, match="pair-breaking"):
        make_differentiable_sim(
            nx=8, num_energy_bins=4, observables=("mkid",),
            mkid_readout_ghz=100.0,  # hnu ~ 414 ueV > 2*180
        )


def test_cli_view_mkid_response(tmp_path, capsys):
    """`view sim.json --mkid 5` renders the readout-response PNG (saved
    runs and streamed runs), with clean errors when spectra are absent."""
    import sys

    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent))
    from test_runner_cli import _setup

    from qpsim_tpu.cli import main as cli_main
    from qpsim_tpu.io.storage import save_setup

    setup_path = save_setup(_setup(), tmp_path / "s.json")
    sim = tmp_path / "sim.json"
    assert cli_main(["run", str(setup_path), "--output", str(sim)]) == 0
    capsys.readouterr()
    rc = cli_main(["view", str(sim), "--frames", "last", "--no-mass",
                   "--mkid", "5.0", "--mkid-alpha", "0.05"])
    out = capsys.readouterr().out
    assert rc == 0
    png = sim.parent / "sim_frames" / "mkid_response.png"
    assert png.exists() and png.read_bytes()[:8] == b"\x89PNG\r\n\x1a\n"

    # streamed run: same flag, same output
    stream = tmp_path / "stream"
    assert cli_main(["run", str(setup_path), "--no-save",
                     "--stream-dir", str(stream)]) == 0
    capsys.readouterr()
    rc = cli_main(["view", str(stream), "--frames", "last", "--no-mass",
                   "--mkid", "5.0", "--out", str(tmp_path / "sv")])
    assert rc == 0
    assert (tmp_path / "sv" / "mkid_response.png").exists()

    # scalar run (no spectra): clean error, not a traceback
    scalar = _setup(collisions=False)
    scalar.parameters.energy_gap = 0.0
    sp2 = save_setup(scalar, tmp_path / "s2.json")
    sim2 = tmp_path / "sim2.json"
    assert cli_main(["run", str(sp2), "--output", str(sim2)]) == 0
    capsys.readouterr()
    rc = cli_main(["view", str(sim2), "--mkid", "5.0"])
    assert rc == 2
    assert "spectral" in capsys.readouterr().err
