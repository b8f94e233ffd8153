"""Independent 1D numpy oracle crosscheck (the framework's golden test).

A deliberately simple, self-contained 1D energy-resolved solver — dense CN
diffusion via ``np.linalg.solve`` and a direct per-cell collision update —
cross-checked against the full TPU engine on a 1×N strip with generation,
scattering and recombination enabled.  Mirrors the reference's only
asset-free golden test (``tests/test_mkid_crosscheck.py``) in spirit, with
an implementation written from the physics, not from either engine.
"""

import numpy as np

from qpsim_tpu.constants import K_B_UEV_PER_K
from qpsim_tpu.geometry.mask import extract_edge_segments
from qpsim_tpu.models.params import BoundaryCondition, ExternalGenerationSpec
from qpsim_tpu.ops.dos import dynes_density_of_states, thermal_phonon_occupation
from qpsim_tpu.ops.energy_grid import build_energy_grid
from qpsim_tpu.ops.kernels import recombination_kernel_base, scattering_kernel_base
from qpsim_tpu.ops.phonon_map import build_phonon_frequency_map
from qpsim_tpu.solver.engine import run_2d_crank_nicolson

NX = 48
GAP = 180.0
NE = 10
TAU_S = 440.0
TAU_R = 500.0
TC = 1.2
TBATH = 0.25
D0 = 6.0
DT = 0.02
STEPS = 12
GEN_RATE = 2e-6


def oracle_run():
    """Plain-numpy 1D reference: reflective CN diffusion + local collisions."""
    E, dE = build_energy_grid(GAP, 1.0, 4.0, NE)
    rho = dynes_density_of_states(E, GAP, 0.0)
    Ks = scattering_kernel_base(E, GAP, TAU_S, TC)
    Kr = recombination_kernel_base(E, GAP, TAU_R, TC)
    pm = build_phonon_frequency_map(E)
    n_ph0 = thermal_phonon_occupation(pm.omega_bins, TBATH)

    # CN matrices per energy bin: 1D Laplacian with reflective (no-flux) ends.
    L = np.zeros((NX, NX))
    for i in range(NX):
        if i > 0:
            L[i, i] -= 1.0
            L[i, i - 1] += 1.0
        if i < NX - 1:
            L[i, i] -= 1.0
            L[i, i + 1] += 1.0
    D_bins = D0 * np.sqrt(np.maximum(0.0, 1.0 - (GAP / E) ** 2))
    A = [np.eye(NX) - 0.5 * DT * D_bins[k] * L for k in range(NE)]
    B = [np.eye(NX) + 0.5 * DT * D_bins[k] * L for k in range(NE)]

    # initial state: gaussian bump in space × DOS-proportional energy weights
    x = (np.arange(NX) + 0.5) / NX
    spatial = 1e-4 * np.exp(-((x - 0.5) ** 2) / 0.02)
    weights = rho / (rho.sum() * dE)
    n = weights[:, None] * spatial[None, :]
    ph = np.repeat(n_ph0[:, None], NX, axis=1)

    sign = pm.diff_sign

    def collide(n, ph, dt):
        n_new = np.empty_like(n)
        ph_new = np.empty_like(ph)
        for px in range(NX):
            npx = n[:, px]
            phpx = ph[:, px]
            f = npx / np.maximum(rho, 1e-30)
            omf = np.maximum(1.0 - f, 0.0)
            partner = rho * omf
            n_d = phpx[pm.idx_diff]
            n_s = phpx[pm.idx_sum]
            Np = np.where(sign > 0, 1.0 + n_d, np.where(sign < 0, n_d, 0.0))
            Ks_eff = Ks * Np
            gain = dE * partner * (Ks_eff.T @ npx) + 2 * dE * partner * ((Kr * n_s) @ partner)
            loss = dE * (Ks_eff @ partner) + 2 * dE * ((Kr * (1 + n_s)) @ npx)
            mu = np.maximum(loss, 0.0)
            coeff = np.where(mu < 1e-14, dt, -np.expm1(-mu * dt) / np.maximum(mu, 1e-14))
            n_new[:, px] = np.maximum(np.exp(-mu * dt) * npx + coeff * np.maximum(gain, 0), 0)
            # phonon rates
            base_sc = dE * (npx[:, None] * Ks * partner[None, :])
            a = np.zeros_like(phpx)
            b = np.zeros_like(phpx)
            for i in range(NE):
                for j in range(NE):
                    if sign[i, j] > 0:
                        a[pm.idx_diff[i, j]] += base_sc[i, j]
                        b[pm.idx_diff[i, j]] += base_sc[i, j]
                    elif sign[i, j] < 0:
                        b[pm.idx_diff[i, j]] -= base_sc[i, j]
            base_rec = dE * (npx[:, None] * Kr * npx[None, :])
            base_pb = dE * (partner[:, None] * Kr * partner[None, :])
            for i in range(NE):
                for j in range(NE):
                    a[pm.idx_sum[i, j]] += base_rec[i, j]
                    b[pm.idx_sum[i, j]] += base_rec[i, j] - base_pb[i, j]
            xb = np.clip(b * dt, -80, 80)
            safe_b = np.where(np.abs(b) < 1e-14, 1.0, b)
            coeff_b = np.where(np.abs(b) < 1e-14, dt, np.expm1(xb) / safe_b)
            ph_new[:, px] = np.maximum(np.exp(xb) * phpx + coeff_b * a, 0.0)
        return n_new, ph_new

    for _ in range(STEPS):
        n = n + DT * GEN_RATE  # uniform generation
        n, ph = collide(n, ph, 0.5 * DT)
        for k in range(NE):
            n[k] = np.linalg.solve(A[k], B[k] @ n[k])
        n, ph = collide(n, ph, 0.5 * DT)
    return E, dE, spatial, n


def test_engine_matches_independent_oracle():
    E, dE, spatial, n_oracle = oracle_run()
    mask = np.ones((1, NX), dtype=bool)
    edges = extract_edge_segments(mask)
    bcs = {e.edge_id: BoundaryCondition(kind="reflective") for e in edges}
    init = spatial[None, :]

    *_, ef, eb = run_2d_crank_nicolson(
        mask=mask,
        edges=edges,
        edge_conditions=bcs,
        initial_field=init,
        diffusion_coefficient=D0,
        dt=DT,
        total_time=STEPS * DT,
        dx=1.0,
        store_every=STEPS,
        strang_mode="exact",  # parity tier: the oracle composes exact Strang
        energy_gap=GAP,
        energy_min_factor=1.0,
        energy_max_factor=4.0,
        num_energy_bins=NE,
        enable_diffusion=True,
        enable_recombination=True,
        enable_scattering=True,
        tau_s=TAU_S,
        tau_r=TAU_R,
        T_c=TC,
        bath_temperature=TBATH,
        external_generation=ExternalGenerationSpec(mode="constant", rate=GEN_RATE),
        diffusion_backend="dense",
    )
    n_engine = np.array([row[0] for row in ef[-1]])  # (NE, NX)
    scale = np.max(np.abs(n_oracle))
    rel = np.max(np.abs(n_engine - n_oracle)) / scale
    assert rel < 1e-6, f"spectral mismatch {rel:.3e}"
    integ_o = (n_oracle.sum(axis=0) * dE)
    integ_e = (n_engine.sum(axis=0) * dE)
    rel_i = np.max(np.abs(integ_e - integ_o)) / np.max(np.abs(integ_o))
    assert rel_i < 1e-6, f"integrated mismatch {rel_i:.3e}"
