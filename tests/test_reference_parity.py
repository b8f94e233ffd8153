"""Direct parity against the original implementation (when present).

Mirrors the reference's own golden-model pattern — its
``test_old_mkid_simulation_parity.py`` skips unless the legacy simulator is
installed; here the 'legacy' is the reference itself, mounted read-only at
/root/reference during development.  These tests never import reference code
into the package — they only compare numerical outputs.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

_REFERENCE = Path("/root/reference")
pytestmark = pytest.mark.skipif(
    not (_REFERENCE / "qpsim" / "solver.py").exists(),
    reason="reference implementation not mounted",
)

if (_REFERENCE / "qpsim").exists() and str(_REFERENCE) not in sys.path:
    sys.path.append(str(_REFERENCE))


def test_kernel_parity():
    from qpsim import solver as ref  # type: ignore

    from qpsim_tpu.ops.energy_grid import build_energy_grid
    from qpsim_tpu.ops.kernels import (
        recombination_kernel,
        recombination_kernel_base,
        scattering_kernel,
        scattering_kernel_base,
    )
    from qpsim_tpu.ops.dos import dynes_density_of_states

    E, dE = build_energy_grid(180.0, 1.0, 4.0, 24)
    E_ref, dE_ref = ref.build_energy_grid(180.0, 1.0, 4.0, 24)
    np.testing.assert_allclose(E, E_ref, rtol=0)
    assert dE == dE_ref
    for mine, theirs in (
        (scattering_kernel_base(E, 180.0, 440.0, 1.2), ref.scattering_kernel_base(E, 180.0, 440.0, 1.2)),
        (recombination_kernel_base(E, 180.0, 500.0, 1.2), ref.recombination_kernel_base(E, 180.0, 500.0, 1.2)),
        (scattering_kernel(E, 180.0, 440.0, 1.2, 0.3), ref.scattering_kernel(E, 180.0, 440.0, 1.2, 0.3)),
        (recombination_kernel(E, 180.0, 500.0, 1.2, 0.3), ref.recombination_kernel(E, 180.0, 500.0, 1.2, 0.3)),
        (dynes_density_of_states(E, 180.0, 0.18), ref._dynes_density_of_states(E, 180.0, 0.18)),
    ):
        scale = max(1e-30, np.max(np.abs(theirs)))
        assert np.max(np.abs(mine - theirs)) / scale < 1e-13


def test_operator_parity_random_geometry():
    from qpsim.models import BoundaryCondition as RefBC  # type: ignore
    from qpsim.solver import build_laplacian_with_boundaries  # type: ignore

    from qpsim_tpu.geometry.mask import extract_edge_segments
    from qpsim_tpu.models.params import BoundaryCondition
    from qpsim_tpu.ops.diffusion import (
        assemble_dense_operator,
        build_directional_stencils,
        fold_diffusion,
    )

    rng = np.random.default_rng(11)
    kinds = ["reflective", "absorbing", "dirichlet", "neumann", "robin"]
    for _ in range(5):
        ny, nx = rng.integers(3, 9, size=2)
        mask = rng.random((ny, nx)) > 0.35
        mask[ny // 2, nx // 2] = True
        edges = extract_edge_segments(mask)
        dx = float(rng.uniform(0.4, 1.6))
        ref_bcs, my_bcs = {}, {}
        for e in edges:
            k = kinds[int(rng.integers(0, 5))]
            v, av = float(rng.uniform(-1, 1)), float(rng.uniform(-1, 1))
            ref_bcs[e.edge_id] = RefBC(kind=k, value=v, aux_value=av)
            my_bcs[e.edge_id] = BoundaryCondition(kind=k, value=v, aux_value=av)
        L_ref, src_ref, _ = build_laplacian_with_boundaries(mask, edges, ref_bcs, dx)
        xs, ys = build_directional_stencils(mask, edges, my_bcs, dx)
        op = fold_diffusion(xs, ys, mask, dx, 1.0)
        L_mine, src_mine = assemble_dense_operator(op)
        np.testing.assert_allclose(L_mine[0], L_ref.toarray(), atol=1e-13)
        np.testing.assert_allclose(src_mine[0], src_ref, atol=1e-13)


def test_end_to_end_coupled_parity():
    from qpsim.models import BoundaryCondition as RefBC  # type: ignore
    from qpsim.solver import run_2d_crank_nicolson as ref_run  # type: ignore

    from qpsim_tpu.geometry.mask import extract_edge_segments
    from qpsim_tpu.models.params import BoundaryCondition
    from qpsim_tpu.solver.engine import run_2d_crank_nicolson as my_run

    mask = np.ones((3, 8), dtype=bool)
    mask[0, 0] = False
    edges = extract_edge_segments(mask)
    ref_bcs = {e.edge_id: RefBC(kind="reflective") for e in edges}
    my_bcs = {e.edge_id: BoundaryCondition(kind="reflective") for e in edges}
    init = np.zeros(mask.shape)
    init[mask] = np.linspace(0.5, 1.0, int(mask.sum())) * 1e-4
    kw = dict(
        diffusion_coefficient=6.0,
        dt=0.05,
        total_time=0.27,  # exercises the remainder step
        dx=1.0,
        store_every=2,
        energy_gap=180.0,
        energy_min_factor=1.0,
        energy_max_factor=3.0,
        num_energy_bins=6,
        dynes_gamma=0.1,
        enable_recombination=True,
        enable_scattering=True,
        tau_s=440.0,
        tau_r=500.0,
        T_c=1.2,
        bath_temperature=0.2,
    )
    t_r, f_r, m_r, c_r, ef_r, eb_r = ref_run(
        mask=mask, edges=edges, edge_conditions=ref_bcs, initial_field=init, **kw
    )
    t_m, f_m, m_m, c_m, ef_m, eb_m = my_run(
        mask=mask,
        edges=edges,
        edge_conditions=my_bcs,
        initial_field=init,
        diffusion_backend="dense",
        collision_backend="xla",
        strang_mode="exact",  # parity tier: bitwise comparison vs the reference stepping
        **kw,
    )
    np.testing.assert_allclose(t_m, t_r, atol=1e-12)
    np.testing.assert_allclose(eb_m, eb_r, rtol=0)
    np.testing.assert_allclose(m_m, m_r, rtol=1e-10)
    scale = max(np.nanmax(np.abs(f)) for f in f_r)
    for fr, fm in zip(f_r, f_m):
        assert np.nanmax(np.abs(fr - fm)) / scale < 1e-10
    escale = max(np.nanmax(np.abs(np.asarray(t))) for t in ef_r)
    for er, em in zip(ef_r, ef_m):
        assert np.nanmax(np.abs(np.asarray(er) - np.asarray(em))) / escale < 1e-9


def test_randomized_differential_sweep_vs_reference():
    """Fuzz the full solver against the reference on random configurations.

    Ten seeded configs rotating through: random connected masks, all five
    BC kinds with random coefficients, remainder steps, store_every,
    scattering/recombination subsets, Dynes broadening, frozen phonons,
    generation modes (constant/pulse/custom), bath temperatures, and
    phonon-history capture.  Mirrors the reference hot path exactly
    (solver.py:1454-1494) so any behavioural drift shows up as a numeric
    diff, not a missing feature.
    """
    from qpsim.models import BoundaryCondition as RefBC  # type: ignore
    from qpsim.models import ExternalGenerationSpec as RefGen  # type: ignore
    from qpsim.solver import run_2d_crank_nicolson as ref_run  # type: ignore

    from qpsim_tpu.geometry.mask import connected_component_count, extract_edge_segments
    from qpsim_tpu.models.params import BoundaryCondition, ExternalGenerationSpec
    from qpsim_tpu.solver.engine import run_2d_crank_nicolson as my_run

    kinds = ["reflective", "neumann", "dirichlet", "absorbing", "robin"]
    gen_modes = ["none", "constant", "pulse", "custom"]

    def random_mask(rng):
        while True:
            ny, nx = int(rng.integers(2, 5)), int(rng.integers(5, 10))
            mask = np.ones((ny, nx), dtype=bool)
            holes = rng.integers(0, 1 + (ny * nx) // 6)
            for _ in range(holes):
                mask[rng.integers(0, ny), rng.integers(0, nx)] = False
            if mask.sum() >= 4 and connected_component_count(mask) == 1:
                return mask

    for seed in range(10):
        rng = np.random.default_rng(1000 + seed)
        mask = random_mask(rng)
        edges = extract_edge_segments(mask)
        ref_bcs, my_bcs = {}, {}
        for e in edges:
            kind = kinds[rng.integers(0, len(kinds))]
            val = float(np.round(rng.uniform(0, 2e-4), 8)) if kind != "reflective" else None
            aux = float(np.round(rng.uniform(0, 1.0), 6)) if kind == "robin" else None
            if kind == "robin":
                val = float(np.round(rng.uniform(0.1, 2.0), 6))  # beta
            ref_bcs[e.edge_id] = RefBC(kind=kind, value=val, aux_value=aux)
            my_bcs[e.edge_id] = BoundaryCondition(kind=kind, value=val, aux_value=aux)
        init = np.zeros(mask.shape)
        init[mask] = rng.uniform(0.2, 1.0, int(mask.sum())) * 1e-4
        dt = float(rng.choice([0.04, 0.05]))
        n_steps = int(rng.integers(3, 7))
        remainder = float(rng.choice([0.0, 0.6])) * dt
        gm = gen_modes[rng.integers(0, len(gen_modes))]
        gen_kw = dict(mode=gm)
        if gm == "constant":
            gen_kw["rate"] = 3e-6
        elif gm == "pulse":
            gen_kw.update(pulse_start=dt, pulse_duration=2 * dt, pulse_rate=5e-6)
        elif gm == "custom":
            gen_kw["custom_body"] = "return 1e-6 * (1.0 + x) * np.exp(-t)"
        scatter = bool(rng.integers(0, 2))
        recomb = scatter or bool(rng.integers(0, 2))  # at least one channel on
        gap_expr = ""
        if seed >= 6:
            # nonuniform gap: exercises auto-precompute, per-pixel kernel
            # stacks and variable-D (harmonic-mean) diffusion on both sides
            gap_expr = "return 150.0 + 50.0 * x + 10.0 * y"
        kw = dict(
            diffusion_coefficient=float(rng.uniform(3.0, 9.0)),
            dt=dt,
            total_time=n_steps * dt + remainder,
            dx=1.0,
            store_every=int(rng.integers(1, 4)),
            energy_gap=180.0,
            energy_min_factor=1.0,
            energy_max_factor=float(rng.choice([2.5, 4.0])),
            num_energy_bins=int(rng.integers(3, 7)),
            dynes_gamma=float(rng.choice([0.0, 0.15])),
            enable_recombination=recomb,
            enable_scattering=scatter,
            tau_s=440.0,
            tau_r=float(rng.choice([440.0, 500.0])),
            T_c=1.2,
            bath_temperature=float(rng.choice([0.0, 0.2])),
            freeze_phonon_dynamics=bool(rng.integers(0, 2)),
            gap_expression=gap_expr,
        )
        ref_ph, my_ph = {}, {}
        t_r, f_r, m_r, c_r, ef_r, eb_r = ref_run(
            mask=mask, edges=edges, edge_conditions=ref_bcs, initial_field=init,
            external_generation=RefGen(**gen_kw), phonon_history_out=ref_ph, **kw
        )
        t_m, f_m, m_m, c_m, ef_m, eb_m = my_run(
            mask=mask, edges=edges, edge_conditions=my_bcs, initial_field=init,
            external_generation=ExternalGenerationSpec(**gen_kw), phonon_history_out=my_ph,
            diffusion_backend="dense", collision_backend="xla", strang_mode="exact", **kw
        )
        ctx = f"seed={seed} mask={mask.shape} gen={gm} bins={kw['num_energy_bins']}"
        np.testing.assert_allclose(t_m, t_r, atol=1e-12, err_msg=ctx)
        np.testing.assert_allclose(eb_m, eb_r, rtol=0, err_msg=ctx)
        np.testing.assert_allclose(m_m, m_r, rtol=1e-9, atol=1e-18, err_msg=ctx)
        scale = max(1e-30, max(np.nanmax(np.abs(f)) for f in f_r))
        for fr, fm in zip(f_r, f_m):
            assert np.nanmax(np.abs(fr - fm)) / scale < 1e-9, ctx
        escale = max(1e-30, max(np.nanmax(np.abs(np.asarray(t))) for t in ef_r))
        for er, em in zip(ef_r, ef_m):
            assert np.nanmax(np.abs(np.asarray(er) - np.asarray(em))) / escale < 1e-9, ctx
        pf_r, pf_m = ref_ph.get("phonon_frames"), my_ph.get("phonon_frames")
        assert (pf_r is None) == (pf_m is None), ctx
        if pf_r is not None:
            pscale = max(1e-30, max(np.nanmax(np.abs(np.asarray(p))) for p in pf_r))
            for pr, pm_ in zip(pf_r, pf_m):
                # limited by the reference's exp(x)−1 cancellation (we use expm1)
                assert np.nanmax(np.abs(np.asarray(pr) - np.asarray(pm_))) / pscale < 1e-8, ctx


def test_collision_step_parity_vs_reference_pixel_loop():
    from qpsim import solver as ref  # type: ignore

    import jax
    import jax.numpy as jnp

    from qpsim_tpu.ops.collisions import build_collision_plan_arrays, make_collision_step
    from qpsim_tpu.ops.dos import dynes_density_of_states
    from qpsim_tpu.ops.energy_grid import build_energy_grid
    from qpsim_tpu.ops.kernels import recombination_kernel_base, scattering_kernel_base
    from qpsim_tpu.ops.phonon_map import build_phonon_frequency_map

    E, dE = build_energy_grid(180.0, 1.0, 4.0, 10)
    pm = build_phonon_frequency_map(E)
    ob, oid, ois, ds = ref._build_phonon_frequency_map(E)
    np.testing.assert_allclose(pm.omega_bins, ob, rtol=0)

    rho = dynes_density_of_states(E, 180.0, 0.1)
    Ks = scattering_kernel_base(E, 180.0, 440.0, 1.2)
    Kr = recombination_kernel_base(E, 180.0, 500.0, 1.2)
    rng = np.random.default_rng(3)
    P = 9
    state = rng.uniform(0, 0.2, (10, P)) * rho[:, None]
    phon = rng.uniform(0, 0.05, (pm.num_omega, P))
    st_ref, ph_ref = state.copy(), phon.copy()
    ref.apply_collision_step_fischer_catelani_uniform(
        st_ref, ph_ref, Kr, Ks, rho, oid, ois, ds, dE, 0.07,
        enable_recombination=True, enable_scattering=True, update_phonons=True,
    )
    plan = build_collision_plan_arrays(
        dE=dE, rho_by_gap=rho[None], K_r0_by_gap=Kr[None], K_s0_by_gap=Ks[None],
        gap_id=np.zeros((1, P), np.int32), pmap=pm,
        enable_recombination=True, enable_scattering=True, update_phonons=True,
        pixel_chunk=16,
    )
    step = jax.jit(make_collision_step(plan, 0.07))
    qn, pn = step(jnp.asarray(state[:, None, :]), jnp.asarray(phon[:, None, :]))
    # parity limited by the reference's exp(x)−1 cancellation (we use expm1)
    assert np.max(np.abs(np.asarray(qn)[:, 0, :] - st_ref)) / np.max(np.abs(st_ref)) < 1e-10
    assert np.max(np.abs(np.asarray(pn)[:, 0, :] - ph_ref)) / np.max(np.abs(ph_ref)) < 1e-10


@pytest.mark.slow
def test_extended_differential_fuzz_vs_reference():
    """30-seed wide-range differential fuzz (checked-in from round 1's .dev run).

    Wider than the 10-seed sweep above: near-Pauli occupations (up to ~40%
    of the DOS floor), bath temperatures to 0.5 K, dt from 0.01 to 0.2 ns,
    dx in {0.5, 1, 2} µm, gaps in {90, 180, 300} µeV, all generation modes,
    sinusoidal non-uniform gap maps, and Pauli enforcement disabled so both
    sides integrate hot states.  Configs the reference rejects must be
    rejected by us too.
    """
    from qpsim.models import BoundaryCondition as RefBC  # type: ignore
    from qpsim.models import ExternalGenerationSpec as RefGen  # type: ignore
    from qpsim.solver import run_2d_crank_nicolson as ref_run  # type: ignore

    from qpsim_tpu.geometry.mask import connected_component_count, extract_edge_segments
    from qpsim_tpu.models.params import BoundaryCondition, ExternalGenerationSpec
    from qpsim_tpu.solver.engine import run_2d_crank_nicolson as my_run

    kinds = ["reflective", "neumann", "dirichlet", "absorbing", "robin"]
    gen_modes = ["none", "constant", "pulse", "custom"]

    def random_mask(rng):
        while True:
            ny, nx = int(rng.integers(2, 6)), int(rng.integers(4, 12))
            mask = np.ones((ny, nx), dtype=bool)
            for _ in range(int(rng.integers(0, 1 + (ny * nx) // 5))):
                mask[rng.integers(0, ny), rng.integers(0, nx)] = False
            if mask.sum() >= 4 and connected_component_count(mask) == 1:
                return mask

    worst = {}
    for seed in range(30):
        rng = np.random.default_rng(7000 + seed)
        mask = random_mask(rng)
        edges = extract_edge_segments(mask)
        ref_bcs, my_bcs = {}, {}
        for e in edges:
            kind = kinds[rng.integers(0, len(kinds))]
            val = aux = None
            if kind == "robin":
                val = float(rng.uniform(0.05, 3.0))
                aux = float(rng.uniform(0.0, 2e-4))
            elif kind != "reflective":
                val = float(rng.uniform(0, 5e-4))
            ref_bcs[e.edge_id] = RefBC(kind=kind, value=val, aux_value=aux)
            my_bcs[e.edge_id] = BoundaryCondition(kind=kind, value=val, aux_value=aux)
        init = np.zeros(mask.shape)
        # up to ~40% of the DOS floor: exercises Pauli blocking hard
        init[mask] = rng.uniform(0.05, 0.4, int(mask.sum()))
        dt = float(rng.choice([0.01, 0.05, 0.2]))
        n_steps = int(rng.integers(2, 8))
        remainder = float(rng.choice([0.0, 0.3, 0.9])) * dt
        gm = gen_modes[rng.integers(0, len(gen_modes))]
        gen_kw = dict(mode=gm)
        if gm == "constant":
            gen_kw["rate"] = float(rng.uniform(0, 1e-4))
        elif gm == "pulse":
            gen_kw.update(pulse_start=float(rng.uniform(0, 2 * dt)),
                          pulse_duration=float(rng.uniform(0, 3 * dt)),
                          pulse_rate=float(rng.uniform(0, 2e-4)))
        elif gm == "custom":
            gen_kw["custom_body"] = "return 2e-5 * (1.0 + np.sin(6.0*x)) * np.exp(-0.5*t)"
        scatter = bool(rng.integers(0, 2))
        recomb = scatter or bool(rng.integers(0, 2))
        kw = dict(
            diffusion_coefficient=float(rng.uniform(0.5, 20.0)),
            dt=dt,
            total_time=n_steps * dt + remainder,
            dx=float(rng.choice([0.5, 1.0, 2.0])),
            store_every=int(rng.integers(1, 5)),
            energy_gap=float(rng.choice([90.0, 180.0, 300.0])),
            energy_min_factor=1.0,
            energy_max_factor=float(rng.choice([2.0, 4.0, 8.0])),
            num_energy_bins=int(rng.integers(2, 9)),
            dynes_gamma=float(rng.choice([0.0, 0.05, 0.3])),
            enable_recombination=recomb,
            enable_scattering=scatter,
            tau_s=float(rng.uniform(100.0, 1000.0)),
            tau_r=float(rng.uniform(100.0, 1000.0)),
            T_c=float(rng.choice([0.9, 1.2, 2.0])),
            bath_temperature=float(rng.choice([0.0, 0.1, 0.5])),
            freeze_phonon_dynamics=bool(rng.integers(0, 2)),
            gap_expression=(
                "return {:.1f} + {:.1f}*x + {:.1f}*np.sin(3.0*y)".format(
                    kw_gap * 0.8, kw_gap * 0.3, kw_gap * 0.05
                )
                if (seed % 3 == 2) and (kw_gap := float(rng.choice([90.0, 180.0, 300.0])))
                else ""
            ),
            pauli_error_threshold=None,  # tolerate f>1 from hot ICs on both sides
            pauli_warn_threshold=None,
        )
        if kw["gap_expression"]:
            kw["energy_gap"] = kw_gap
        ctx = (
            f"seed={seed} mask={mask.shape} gen={gm} dt={dt} "
            f"bins={kw['num_energy_bins']} gapx={bool(kw['gap_expression'])}"
        )
        try:
            t_r, f_r, m_r, c_r, ef_r, eb_r = ref_run(
                mask=mask, edges=edges, edge_conditions=ref_bcs, initial_field=init,
                external_generation=RefGen(**gen_kw), **kw)
        except Exception as exc:
            # reference rejected the config; ours must reject it too
            with pytest.raises(Exception):
                my_run(mask=mask, edges=edges, edge_conditions=my_bcs, initial_field=init,
                       external_generation=ExternalGenerationSpec(**gen_kw),
                       diffusion_backend="dense", collision_backend="xla",
                       strang_mode="exact", **kw)
            continue
        t_m, f_m, m_m, c_m, ef_m, eb_m = my_run(
            mask=mask, edges=edges, edge_conditions=my_bcs, initial_field=init,
            external_generation=ExternalGenerationSpec(**gen_kw),
            diffusion_backend="dense", collision_backend="xla", strang_mode="exact", **kw)
        scale = max(1e-30, max(np.nanmax(np.abs(f)) for f in f_r))
        d_f = max(
            np.nanmax(np.abs(np.nan_to_num(a) - np.nan_to_num(b)))
            for a, b in zip(f_r, f_m)
        ) / scale
        d_m = float(np.max(
            np.abs(np.asarray(m_m) - np.asarray(m_r)) / np.maximum(np.abs(m_r), 1e-30)
        ))
        worst[ctx] = (d_f, d_m)
    bad = {k: v for k, v in worst.items() if v[0] >= 1e-8 or v[1] >= 1e-8}
    assert not bad, f"{len(bad)} of {len(worst)} configs above 1e-8: {bad}"
