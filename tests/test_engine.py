"""Engine contracts: snapshot semantics, callbacks, Pauli policy, generation."""

import numpy as np
import pytest

from qpsim_tpu.geometry.mask import extract_edge_segments
from qpsim_tpu.models.params import (
    BoundaryCondition,
    ExternalGenerationSpec,
    InitialConditionSpec,
)
from qpsim_tpu.solver.engine import run_2d_crank_nicolson


def _strip(nx=16):
    mask = np.ones((1, nx), dtype=bool)
    edges = extract_edge_segments(mask)
    bcs = {e.edge_id: BoundaryCondition(kind="reflective") for e in edges}
    return mask, edges, bcs


def test_final_time_exact_with_remainder():
    mask, edges, bcs = _strip()
    times, frames, mass, clim, ef, eb = run_2d_crank_nicolson(
        mask=mask,
        edges=edges,
        edge_conditions=bcs,
        initial_field=np.ones(mask.shape),
        diffusion_coefficient=2.0,
        dt=0.1,
        total_time=0.55,
        dx=1.0,
        store_every=2,
    )
    assert times[0] == 0.0
    assert abs(times[-1] - 0.55) < 1e-12
    # stored: t=0, steps 2 & 4 (multiples of 2), and final remainder step 6
    assert len(times) == 4
    assert ef is None and eb is None


def test_store_every_without_remainder_stores_final_partial():
    mask, edges, bcs = _strip()
    times, *_ = run_2d_crank_nicolson(
        mask=mask,
        edges=edges,
        edge_conditions=bcs,
        initial_field=np.ones(mask.shape),
        diffusion_coefficient=2.0,
        dt=0.1,
        total_time=0.5,
        dx=1.0,
        store_every=3,
    )
    # steps: 5 total; stored at step 3 and final step 5
    np.testing.assert_allclose(times, [0.0, 0.3, 0.5], atol=1e-12)


def test_progress_callback_contract():
    mask, edges, bcs = _strip()
    seen = []
    run_2d_crank_nicolson(
        mask=mask,
        edges=edges,
        edge_conditions=bcs,
        initial_field=np.ones(mask.shape),
        diffusion_coefficient=2.0,
        dt=0.1,
        total_time=0.3,
        dx=1.0,
        store_every=1,
        progress_callback=lambda t, frame: seen.append((t, frame.shape)),
    )
    assert [t for t, _ in seen] == pytest.approx([0.0, 0.1, 0.2, 0.3])
    assert all(shape == mask.shape for _, shape in seen)


def test_callback_exceptions_are_swallowed():
    mask, edges, bcs = _strip()

    def bad_callback(t, frame):
        raise RuntimeError("viewer crashed")

    times, *_ = run_2d_crank_nicolson(
        mask=mask,
        edges=edges,
        edge_conditions=bcs,
        initial_field=np.ones(mask.shape),
        diffusion_coefficient=2.0,
        dt=0.1,
        total_time=0.2,
        dx=1.0,
        progress_callback=bad_callback,
    )
    assert len(times) == 3


def test_frames_nan_outside_mask():
    mask = np.ones((4, 6), dtype=bool)
    mask[0, 0] = False
    edges = extract_edge_segments(mask)
    bcs = {e.edge_id: BoundaryCondition(kind="reflective") for e in edges}
    init = np.ones(mask.shape)
    _, frames, mass, clim, _, _ = run_2d_crank_nicolson(
        mask=mask,
        edges=edges,
        edge_conditions=bcs,
        initial_field=init,
        diffusion_coefficient=1.0,
        dt=0.1,
        total_time=0.2,
        dx=1.0,
    )
    for f in frames:
        assert np.isnan(f[0, 0])
        assert np.all(np.isfinite(f[mask]))
    assert clim[0] <= clim[1]


def test_diffusion_disabled_requires_no_bcs():
    mask = np.ones((1, 8), dtype=bool)
    edges = extract_edge_segments(mask)
    times, frames, mass, *_ = run_2d_crank_nicolson(
        mask=mask,
        edges=edges,
        edge_conditions={},  # no BCs assigned at all
        initial_field=np.ones(mask.shape),
        diffusion_coefficient=1.0,
        dt=0.1,
        total_time=0.3,
        dx=1.0,
        energy_gap=180.0,
        num_energy_bins=4,
        energy_max_factor=3.0,
        enable_diffusion=False,
    )
    np.testing.assert_allclose(mass, mass[0], rtol=1e-12)


def test_rejects_unknown_collision_solver():
    mask, edges, bcs = _strip(4)
    with pytest.raises(ValueError, match="Unsupported collision solver"):
        run_2d_crank_nicolson(
            mask=mask,
            edges=edges,
            edge_conditions=bcs,
            initial_field=np.ones(mask.shape),
            diffusion_coefficient=1.0,
            dt=0.1,
            total_time=0.2,
            dx=1.0,
            energy_gap=180.0,
            num_energy_bins=4,
            energy_max_factor=3.0,
            collision_solver="boltzphlow_relaxation",
        )


def test_energy_bins_returned_above_gap():
    mask, edges, bcs = _strip(4)
    *_, eb = run_2d_crank_nicolson(
        mask=mask,
        edges=edges,
        edge_conditions=bcs,
        initial_field=np.ones(mask.shape),
        diffusion_coefficient=1.0,
        dt=0.1,
        total_time=0.2,
        dx=1.0,
        energy_gap=200.0,
        energy_min_factor=1.0,
        energy_max_factor=4.0,
        num_energy_bins=6,
    )
    assert eb is not None and np.all(eb > 200.0)


def test_pulse_injection_adds_mass():
    mask, edges, bcs = _strip(8)
    gen = ExternalGenerationSpec(mode="pulse", pulse_start=0.0, pulse_duration=0.2, pulse_rate=1e-4)
    _, _, mass, *_ = run_2d_crank_nicolson(
        mask=mask,
        edges=edges,
        edge_conditions=bcs,
        initial_field=np.full(mask.shape, 1e-6),
        diffusion_coefficient=1.0,
        dt=0.05,
        total_time=0.4,
        dx=1.0,
        energy_gap=180.0,
        num_energy_bins=4,
        energy_max_factor=3.0,
        external_generation=gen,
    )
    assert mass[-1] > mass[0]


def test_negative_custom_generation_raises():
    mask, edges, bcs = _strip(4)
    gen = ExternalGenerationSpec(mode="custom", custom_body="return 0.0 - 1.0")
    with pytest.raises(ValueError, match="negative"):
        run_2d_crank_nicolson(
            mask=mask,
            edges=edges,
            edge_conditions=bcs,
            initial_field=np.ones(mask.shape),
            diffusion_coefficient=1.0,
            dt=0.1,
            total_time=0.2,
            dx=1.0,
            energy_gap=180.0,
            num_energy_bins=4,
            energy_max_factor=3.0,
            external_generation=gen,
        )


def test_full_custom_qp_initial_state_is_honored():
    mask, edges, bcs = _strip(6)
    spec = InitialConditionSpec(
        qp_full_custom_enabled=True,
        qp_full_custom_body="return 1e-4 * x * np.exp(-E / 400.0)",
    )
    _, _, _, _, ef, eb = run_2d_crank_nicolson(
        mask=mask,
        edges=edges,
        edge_conditions=bcs,
        initial_field=np.ones(mask.shape),
        diffusion_coefficient=1.0,
        dt=0.1,
        total_time=0.1,
        dx=1.0,
        energy_gap=180.0,
        num_energy_bins=4,
        energy_max_factor=3.0,
        enable_diffusion=False,
        initial_condition_spec=spec,
    )
    x = (np.arange(6) + 0.5) / 6
    expected0 = 1e-4 * x * np.exp(-eb[0] / 400.0)
    np.testing.assert_allclose(np.asarray(ef[0][0])[0], expected0, rtol=1e-12)


def test_pauli_error_raises_and_warn_mode_warns():
    mask, edges, bcs = _strip(4)
    # absurdly large initial density drives f = n/rho far above 1
    common = dict(
        mask=mask,
        edges=edges,
        edge_conditions=bcs,
        initial_field=np.full(mask.shape, 1e9),
        diffusion_coefficient=1.0,
        dt=0.05,
        total_time=0.1,
        dx=1.0,
        energy_gap=180.0,
        num_energy_bins=4,
        energy_max_factor=3.0,
        enable_scattering=True,
        bath_temperature=0.1,
    )
    with pytest.raises(ValueError, match="Pauli occupation exceeded"):
        run_2d_crank_nicolson(**common)
    with pytest.warns(UserWarning):
        run_2d_crank_nicolson(**common, enforce_pauli=False)


def test_phonon_history_energy_mode():
    mask, edges, bcs = _strip(4)
    out = {}
    run_2d_crank_nicolson(
        mask=mask,
        edges=edges,
        edge_conditions=bcs,
        initial_field=np.full(mask.shape, 1e-5),
        diffusion_coefficient=1.0,
        dt=0.1,
        total_time=0.2,
        dx=1.0,
        energy_gap=180.0,
        num_energy_bins=4,
        energy_max_factor=3.0,
        enable_recombination=True,
        enable_scattering=True,
        bath_temperature=0.2,
        phonon_history_out=out,
    )
    assert out["phonon_metadata"]["mode"] == "dynamic_local_coupled"
    assert len(out["phonon_frames"]) == 3
    assert out["phonon_energy_bins"].ndim == 1
    nw = out["phonon_energy_bins"].size
    assert len(out["phonon_energy_frames"][0]) == nw


def test_phonon_history_scalar_mode_scaffold():
    mask, edges, bcs = _strip(4)
    out = {}
    run_2d_crank_nicolson(
        mask=mask,
        edges=edges,
        edge_conditions=bcs,
        initial_field=np.ones(mask.shape),
        diffusion_coefficient=1.0,
        dt=0.1,
        total_time=0.2,
        dx=1.0,
        bath_temperature=0.17,
        phonon_history_out=out,
    )
    assert out["phonon_metadata"]["mode"] == "fixed_temperature"
    assert np.allclose(out["phonon_frames"][0][mask], 0.17)


def test_adi_and_dense_backends_agree_on_2d():
    mask = np.ones((8, 9), dtype=bool)
    edges = extract_edge_segments(mask)
    bcs = {e.edge_id: BoundaryCondition(kind="dirichlet", value=0.0) for e in edges}
    init = np.zeros(mask.shape)
    init[4, 4] = 1.0
    kw = dict(
        mask=mask,
        edges=edges,
        edge_conditions=bcs,
        initial_field=init,
        diffusion_coefficient=1.0,
        dt=0.01,
        total_time=0.1,
        dx=1.0,
    )
    _, frames_d, *_ = run_2d_crank_nicolson(diffusion_backend="dense", **kw)
    _, frames_a, *_ = run_2d_crank_nicolson(diffusion_backend="adi", **kw)
    scale = np.nanmax(np.abs(frames_d[-1]))
    assert np.nanmax(np.abs(frames_d[-1] - frames_a[-1])) / scale < 1e-4


def test_pallas_collision_backend_matches_xla():
    mask, edges, bcs = _strip(6)
    kw = dict(
        mask=mask,
        edges=edges,
        edge_conditions=bcs,
        initial_field=np.full(mask.shape, 1e-5),
        diffusion_coefficient=6.0,
        dt=0.05,
        total_time=0.2,
        dx=1.0,
        energy_gap=180.0,
        num_energy_bins=6,
        energy_max_factor=3.0,
        enable_recombination=True,
        enable_scattering=True,
        bath_temperature=0.2,
    )
    _, frames_x, mass_x, _, ef_x, _ = run_2d_crank_nicolson(collision_backend="xla", **kw)
    _, frames_p, mass_p, _, ef_p, _ = run_2d_crank_nicolson(collision_backend="pallas", **kw)
    np.testing.assert_allclose(mass_p, mass_x, rtol=1e-12)
    for a, b in zip(ef_x[-1], ef_p[-1]):
        np.testing.assert_allclose(np.nan_to_num(a), np.nan_to_num(b), atol=1e-18, rtol=1e-10)


@pytest.mark.slow
def test_pallas_collision_backend_matches_xla_above_32_bins():
    # 40 bins stays inside the static pair-unroll envelope (cap 64, which
    # covers the reference's default 50-bin grid, solver.py:999) — same
    # physics, interpret mode on CPU; the fori_loop kernel (NE > 64 /
    # piecewise gap maps) has its own direct parity tests in
    # tests/test_collisions.py
    mask, edges, bcs = _strip(4)
    kw = dict(
        mask=mask,
        edges=edges,
        edge_conditions=bcs,
        initial_field=np.full(mask.shape, 1e-5),
        diffusion_coefficient=6.0,
        dt=0.05,
        total_time=0.1,
        dx=1.0,
        energy_gap=180.0,
        num_energy_bins=40,
        energy_max_factor=3.0,
        enable_recombination=True,
        enable_scattering=True,
        bath_temperature=0.2,
    )
    _, frames_x, mass_x, _, ef_x, _ = run_2d_crank_nicolson(collision_backend="xla", **kw)
    _, frames_p, mass_p, _, ef_p, _ = run_2d_crank_nicolson(collision_backend="pallas", **kw)
    np.testing.assert_allclose(mass_p, mass_x, rtol=1e-12)
    for a, b in zip(ef_x[-1], ef_p[-1]):
        np.testing.assert_allclose(np.nan_to_num(a), np.nan_to_num(b), atol=1e-18, rtol=1e-10)


def test_merged_strang_mode():
    # strang_mode="merged" fuses adjacent collision half-steps within a
    # stored segment: identical at store_every=1, O(dt^2)-close beyond,
    # and the difference shrinks ~4x when dt halves (2nd order)
    mask, edges, bcs = _strip(8)
    base = dict(
        mask=mask,
        edges=edges,
        edge_conditions=bcs,
        initial_field=np.full(mask.shape, 1e-5),
        diffusion_coefficient=6.0,
        dx=1.0,
        energy_gap=180.0,
        num_energy_bins=6,
        energy_max_factor=3.0,
        enable_recombination=True,
        enable_scattering=True,
        bath_temperature=0.2,
    )
    # store_every=1: merged == exact bitwise (same composition)
    kw1 = dict(dt=0.1, total_time=0.4, store_every=1, **base)
    _, _, m_e, _, ef_e, _ = run_2d_crank_nicolson(strang_mode="exact", **kw1)
    _, _, m_m, _, ef_m, _ = run_2d_crank_nicolson(strang_mode="merged", **kw1)
    np.testing.assert_array_equal(np.asarray(m_e), np.asarray(m_m))

    def diff_at(dt):
        kw = dict(dt=dt, total_time=0.8, store_every=int(round(0.8 / dt)), **base)
        _, fr_e, *_ = run_2d_crank_nicolson(strang_mode="exact", **kw)
        _, fr_m, *_ = run_2d_crank_nicolson(strang_mode="merged", **kw)
        a, b = np.nan_to_num(fr_e[-1]), np.nan_to_num(fr_m[-1])
        return np.max(np.abs(a - b)) / np.max(np.abs(a))

    # per-step O(dt^2) composition difference accumulated over T/dt steps
    # -> O(dt) global difference: halving dt should roughly halve it
    d1, d2 = diff_at(0.1), diff_at(0.05)
    assert d1 < 1e-2
    assert d2 < 0.75 * d1


def test_merged_strang_composes_with_generation():
    """Traced generation rides the merged seams (VERDICT r2 item 2a):
    dt·g(t_k) injected at the exact-mode times, bitwise-equal at
    store_every=1, O(dt)-convergent beyond, totals preserved."""
    import pytest

    from qpsim_tpu.models.params import ExternalGenerationSpec

    mask, edges, bcs = _strip(8)
    base = dict(
        mask=mask,
        edges=edges,
        edge_conditions=bcs,
        initial_field=np.full(mask.shape, 1e-5),
        diffusion_coefficient=6.0,
        dx=1.0,
        energy_gap=180.0,
        num_energy_bins=6,
        energy_max_factor=3.0,
        enable_recombination=True,
        enable_scattering=True,
        bath_temperature=0.2,
    )
    pulse = ExternalGenerationSpec(
        mode="pulse", pulse_start=0.1, pulse_duration=0.3, pulse_rate=2e-5
    )

    # store_every=1: every segment is a single step, so merged degenerates
    # to the exact composition — bitwise equal even with the pulse active
    kw1 = dict(dt=0.1, total_time=0.4, store_every=1, external_generation=pulse, **base)
    _, _, m_e, _, _, _ = run_2d_crank_nicolson(strang_mode="exact", **kw1)
    _, _, m_m, _, _, _ = run_2d_crank_nicolson(strang_mode="merged", **kw1)
    np.testing.assert_array_equal(np.asarray(m_e), np.asarray(m_m))

    # multi-step segments: same injected totals (pulse windows evaluated at
    # the same times), states O(dt)-close and converging as dt shrinks
    def diff_at(dt):
        kw = dict(
            dt=dt, total_time=0.8, store_every=int(round(0.8 / dt)),
            external_generation=pulse, **base,
        )
        _, fr_e, mass_e, _, _, _ = run_2d_crank_nicolson(strang_mode="exact", **kw)
        _, fr_m, mass_m, _, _, _ = run_2d_crank_nicolson(strang_mode="merged", **kw)
        # the pulse grew the film, and by the same amount up to O(dt²)·T
        assert mass_e[-1] > mass_e[0] * 2
        assert abs(mass_m[-1] - mass_e[-1]) / mass_e[-1] < 50 * dt * dt
        a, b = np.nan_to_num(fr_e[-1]), np.nan_to_num(fr_m[-1])
        return np.max(np.abs(a - b)) / np.max(np.abs(a))

    d1, d2 = diff_at(0.1), diff_at(0.05)
    assert d1 < 1e-2
    assert d2 < 0.75 * d1

    # host-evaluated custom expressions still cannot merge (no per-step
    # host boundary inside the fused segment)
    host_only = ExternalGenerationSpec(
        mode="custom", custom_body="1e-6 if t >= 0 else 0.0"
    )
    with pytest.raises(ValueError, match="host-evaluated"):
        run_2d_crank_nicolson(
            strang_mode="merged",
            dt=0.1,
            total_time=0.2,
            external_generation=host_only,
            **base,
        )

    # generation-validity flags surface from inside the fused segment too
    negative = ExternalGenerationSpec(mode="custom", custom_body="-1e-6 + 0.0*t")
    with pytest.raises(ValueError, match="negative"):
        run_2d_crank_nicolson(
            strang_mode="merged",
            dt=0.1,
            total_time=0.4,
            store_every=4,
            external_generation=negative,
            **base,
        )


def test_nonuniform_gap_end_to_end():
    # gap map via expression: auto-precompute kicks in, per-pixel kernels and
    # variable-D diffusion run, and the lower-gap half diffuses faster
    mask = np.ones((2, 16), dtype=bool)
    edges = extract_edge_segments(mask)
    bcs = {e.edge_id: BoundaryCondition(kind="reflective") for e in edges}
    init = np.zeros(mask.shape)
    init[:, 7:9] = 1e-4  # central bump
    times, frames, mass, _, ef, eb = run_2d_crank_nicolson(
        mask=mask,
        edges=edges,
        edge_conditions=bcs,
        initial_field=init,
        diffusion_coefficient=6.0,
        dt=0.05,
        total_time=0.5,
        dx=1.0,
        energy_gap=180.0,
        num_energy_bins=6,
        energy_max_factor=3.0,
        enable_recombination=True,
        enable_scattering=True,
        bath_temperature=0.2,
        gap_expression="return 140.0 + 80.0 * x",  # gap rises left->right
    )
    assert np.isfinite(mass).all()
    final = np.nan_to_num(frames[-1])
    # lower gap on the left -> higher D(E) -> more spreading leftwards
    left, right = final[:, :7].sum(), final[:, 9:].sum()
    assert left > right > 0


def test_analytic_gap_collision_backend_matches_xla():
    # continuous gap map (a distinct gap per pixel, G >> 8): the engine
    # routes collision_backend="pallas" to the analytic-gap kernel, which
    # never materialises per-gap tables; parity vs the XLA gather path
    mask = np.ones((2, 10), dtype=bool)
    edges = extract_edge_segments(mask)
    bcs = {e.edge_id: BoundaryCondition(kind="reflective") for e in edges}
    kw = dict(
        mask=mask,
        edges=edges,
        edge_conditions=bcs,
        initial_field=np.full(mask.shape, 1e-5),
        diffusion_coefficient=6.0,
        dt=0.05,
        total_time=0.2,
        dx=1.0,
        energy_gap=180.0,
        num_energy_bins=6,
        energy_max_factor=3.0,
        enable_recombination=True,
        enable_scattering=True,
        bath_temperature=0.2,
        dynes_gamma=0.1,
        gap_expression="return 130.0 + 60.0 * x + 5.0 * y",  # G == Npix
    )
    _, frames_x, mass_x, _, ef_x, _ = run_2d_crank_nicolson(collision_backend="xla", **kw)
    _, frames_p, mass_p, _, ef_p, _ = run_2d_crank_nicolson(collision_backend="pallas", **kw)
    np.testing.assert_allclose(mass_p, mass_x, rtol=1e-10)
    for a, b in zip(ef_x[-1], ef_p[-1]):
        np.testing.assert_allclose(np.nan_to_num(a), np.nan_to_num(b), atol=1e-18, rtol=1e-9)


def test_forced_pallas_backend_raises_when_unsupported():
    # explicit collision_backend="pallas" must not silently fall back
    import pytest

    mask, edges, bcs = _strip(4)
    kw = dict(
        mask=mask,
        edges=edges,
        edge_conditions=bcs,
        initial_field=np.full(mask.shape, 1e-5),
        diffusion_coefficient=6.0,
        dt=0.05,
        total_time=0.1,
        dx=1.0,
        energy_gap=180.0,
        energy_max_factor=3.0,
        enable_recombination=True,
        enable_scattering=True,
        bath_temperature=0.2,
        collision_backend="pallas",
    )
    with pytest.raises(ValueError, match="outside the kernel's envelope"):
        run_2d_crank_nicolson(**kw, num_energy_bins=1)  # single bin unsupported


def test_engine_program_cache_zero_retrace_and_identical_results():
    """A second engine call with the same configuration compiles nothing.

    VERDICT r1 item 2: ``run_2d_crank_nicolson`` used to rebuild its jitted
    segment runners per call (minutes of remote-TPU compile).  The program
    cache must make the second call trace-free and bit-identical.
    """
    from qpsim_tpu.solver import engine

    mask = np.ones((4, 6), dtype=bool)
    edges = extract_edge_segments(mask)
    bcs = {e.edge_id: BoundaryCondition(kind="reflective") for e in edges}
    kwargs = dict(
        mask=mask,
        edges=edges,
        edge_conditions=bcs,
        initial_field=np.full(mask.shape, 0.01),
        diffusion_coefficient=2.0,
        dt=0.05,
        total_time=0.325,  # forces a remainder segment too
        dx=1.0,
        store_every=2,
        energy_gap=180.0,
        num_energy_bins=4,
        energy_max_factor=3.0,
        enable_scattering=True,
        enable_recombination=True,
        tau_s=400.0,
        tau_r=500.0,
        bath_temperature=0.3,
    )
    engine.clear_engine_program_cache()
    out1 = run_2d_crank_nicolson(**kwargs)
    traces_after_first = engine.engine_trace_count()
    assert traces_after_first > 0
    out2 = run_2d_crank_nicolson(**kwargs)
    assert engine.engine_trace_count() == traces_after_first, (
        "second identical engine call re-traced its segment runners"
    )
    for a, b in zip(out1[1], out2[1]):  # frames
        np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(out1[2], out2[2])  # mass

    # a config change (different tau) must NOT hit the same cache entry
    kwargs_changed = dict(kwargs, tau_s=300.0)
    run_2d_crank_nicolson(**kwargs_changed)
    assert engine.engine_trace_count() > traces_after_first


def test_engine_program_cache_distinguishes_boundary_values():
    """Fingerprint must see BC parameter changes (same kinds, different values)."""
    from qpsim_tpu.solver import engine

    mask = np.ones((1, 12), dtype=bool)
    edges = extract_edge_segments(mask)

    def run_with(value):
        bcs = {e.edge_id: BoundaryCondition(kind="dirichlet", value=value) for e in edges}
        _, frames, *_ = run_2d_crank_nicolson(
            mask=mask,
            edges=edges,
            edge_conditions=bcs,
            initial_field=np.full(mask.shape, 0.5),
            diffusion_coefficient=2.0,
            dt=0.1,
            total_time=0.5,
            dx=1.0,
            energy_gap=180.0,
            num_energy_bins=3,
            energy_max_factor=3.0,
        )
        return frames[-1]

    engine.clear_engine_program_cache()
    f_a = run_with(0.0)
    f_b = run_with(1.0)
    # Dirichlet g=1 injects density; g=0 absorbs — results must differ.
    assert not np.allclose(np.nan_to_num(f_a), np.nan_to_num(f_b))


def test_blocked_analytic_backend_matches_xla_above_64_bins_continuous_gap():
    # NE=72 with a continuous gap map (12 unique gaps > the G<=8 table
    # bound): the engine dispatches the block-gridded analytic-gap kernel
    # (the only fast path there — per-unique-gap stacks are (G~Npix,NE,NE)
    # and must never be materialised at production sizes).  At this tiny
    # grid the XLA gather path CAN build its 12-gap stacks and serves as
    # the oracle.
    mask, edges, bcs = _strip(12)
    kw = dict(
        mask=mask,
        edges=edges,
        edge_conditions=bcs,
        initial_field=np.full(mask.shape, 1e-5),
        diffusion_coefficient=6.0,
        dt=0.05,
        total_time=0.1,
        dx=1.0,
        energy_gap=180.0,
        num_energy_bins=72,
        energy_max_factor=4.0,
        enable_recombination=True,
        enable_scattering=True,
        bath_temperature=0.2,
        gap_expression="return 140.0 + 30.0 * x",
    )
    _, frames_x, mass_x, _, ef_x, _ = run_2d_crank_nicolson(collision_backend="xla", **kw)
    _, frames_p, mass_p, _, ef_p, _ = run_2d_crank_nicolson(
        collision_backend="pallas", **kw
    )
    np.testing.assert_allclose(mass_p, mass_x, rtol=1e-9)
    for a, b in zip(ef_x[-1], ef_p[-1]):
        np.testing.assert_allclose(np.nan_to_num(a), np.nan_to_num(b), atol=1e-18, rtol=1e-8)


def test_continuous_gap_stack_explosion_refused_with_guidance():
    # A continuous gap map whose per-unique-gap tables would need >4 GB on
    # the XLA gather path must raise a helpful error, not thrash: here the
    # CPU auto-dispatch would try (G, NE, NE) stacks with G ~ Npix.
    mask = np.ones((96, 96), dtype=bool)
    from qpsim_tpu.geometry.mask import extract_edge_segments

    edges = extract_edge_segments(mask)
    bcs = {e.edge_id: BoundaryCondition(kind="reflective") for e in edges}
    with pytest.raises(ValueError, match="unique gap values"):
        run_2d_crank_nicolson(
            mask=mask,
            edges=edges,
            edge_conditions=bcs,
            initial_field=np.full(mask.shape, 1e-5),
            diffusion_coefficient=6.0,
            dt=0.05,
            total_time=0.05,
            dx=1.0,
            energy_gap=180.0,
            num_energy_bins=200,
            energy_max_factor=4.0,
            enable_recombination=True,
            enable_scattering=True,
            bath_temperature=0.2,
            collision_backend="xla",
            gap_expression="return 120.0 + 60.0 * x + 0.3 * y",
        )


def test_fused_generation_engages_and_matches_xla_path():
    """Constant/pulse generation fuses into the pallas collision kernel:
    the XLA array path (gen.traced_fn) must never be traced on a fusable
    config, and results must match the XLA collision backend."""
    import qpsim_tpu.solver.engine as eng
    import qpsim_tpu.solver.program_build as pb
    from qpsim_tpu.geometry.mask import create_intrinsic_geometry, mask_from_lists

    geo = create_intrinsic_geometry(width=18, height=9)
    mask = mask_from_lists(geo.mask)
    bcs = {e.edge_id: BoundaryCondition(kind="reflective") for e in geo.edges}
    init = np.zeros(mask.shape)
    init[mask] = 1e-5
    gen = ExternalGenerationSpec(
        mode="pulse", pulse_start=0.1, pulse_duration=0.2, pulse_rate=2e-5
    )
    kw = dict(
        mask=mask, edges=geo.edges, edge_conditions=bcs, initial_field=init,
        diffusion_coefficient=6.0, dt=0.05, total_time=0.5, dx=1.0, store_every=5,
        energy_gap=180.0, energy_min_factor=1.0, energy_max_factor=4.0,
        num_energy_bins=9, enable_recombination=True, enable_scattering=True,
        bath_temperature=0.2, external_generation=gen,
    )

    real_builder = pb.build_generation_program
    trips = []

    def trapped_builder(*a, **k):
        prog = real_builder(*a, **k)
        if prog.traced_fn is not None:
            orig = prog.traced_fn

            def boom(t):
                trips.append(t)
                return orig(t)

            prog.traced_fn = boom
        return prog

    eng.clear_engine_program_cache()
    try:
        pb.build_generation_program, saved = trapped_builder, real_builder
        for sm in ("exact", "merged"):
            out_pallas = run_2d_crank_nicolson(
                **kw, strang_mode=sm, collision_backend="pallas"
            )
            assert not trips, f"XLA gen path traced under fusion ({sm})"
    finally:
        pb.build_generation_program = saved
        eng.clear_engine_program_cache()

    out_xla = run_2d_crank_nicolson(
        **kw, strang_mode="merged", collision_backend="xla"
    )
    out_fused = run_2d_crank_nicolson(
        **kw, strang_mode="merged", collision_backend="pallas"
    )
    np.testing.assert_allclose(
        np.asarray(out_fused[2]), np.asarray(out_xla[2]), rtol=1e-12
    )
    np.testing.assert_allclose(
        np.nan_to_num(np.asarray(out_fused[1])),
        np.nan_to_num(np.asarray(out_xla[1])),
        atol=1e-15,
    )


def test_fused_generation_on_analytic_gap_path():
    """Pulse generation fuses into the analytic-gap kernel too (continuous
    gap map, G == Npix): pallas vs xla collision backends agree."""
    mask = np.ones((2, 12), dtype=bool)
    edges = extract_edge_segments(mask)
    bcs = {e.edge_id: BoundaryCondition(kind="reflective") for e in edges}
    kw = dict(
        mask=mask, edges=edges, edge_conditions=bcs,
        initial_field=np.full(mask.shape, 1e-5),
        diffusion_coefficient=6.0, dt=0.05, total_time=0.4, dx=1.0,
        store_every=4, energy_gap=180.0, num_energy_bins=6,
        energy_max_factor=3.0, enable_recombination=True,
        enable_scattering=True, bath_temperature=0.2,
        gap_expression="return 130.0 + 60.0 * x + 5.0 * y",  # G == Npix
        external_generation=ExternalGenerationSpec(
            mode="pulse", pulse_start=0.05, pulse_duration=0.2, pulse_rate=2e-5
        ),
    )
    for sm in ("exact", "merged"):
        a = run_2d_crank_nicolson(**kw, strang_mode=sm, collision_backend="pallas")
        b = run_2d_crank_nicolson(**kw, strang_mode=sm, collision_backend="xla")
        np.testing.assert_allclose(np.asarray(a[2]), np.asarray(b[2]), rtol=1e-11)
        np.testing.assert_allclose(
            np.nan_to_num(np.asarray(a[1])), np.nan_to_num(np.asarray(b[1])), atol=1e-15
        )
