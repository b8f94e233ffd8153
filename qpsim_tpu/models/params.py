"""Typed configuration model for qpsim_tpu.

These dataclasses are the JSON compatibility contract with the reference
simulator (``/root/reference/qpsim/models.py``): field names and defaults
match so that setups, simulations and test suites written by either
implementation load in the other.  Validation is centralised in
``__post_init__`` hooks, exactly as in the reference.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from datetime import datetime, timezone
from typing import Any

__all__ = [
    "BOUNDARY_KINDS",
    "COLLISION_SOLVERS",
    "EXTERNAL_GENERATION_MODES",
    "BoundaryCondition",
    "BoundaryFace",
    "EdgeSegment",
    "GeometryData",
    "InitialConditionSpec",
    "ExternalGenerationSpec",
    "SimulationParameters",
    "SetupData",
    "SimulationResultData",
    "TestCaseResultData",
    "TestGeometryGroupData",
    "TestSuiteData",
    "normalize_collision_solver_name",
    "utc_now_iso",
]

#: Supported per-edge boundary-condition kinds (reference models.py:8-14).
BOUNDARY_KINDS = frozenset({"reflective", "neumann", "dirichlet", "absorbing", "robin"})

#: Registered collision integrators (reference models.py:15).
COLLISION_SOLVERS = frozenset({"fischer_catelani_local"})

#: External quasiparticle generation modes (reference models.py:16).
EXTERNAL_GENERATION_MODES = frozenset({"none", "constant", "pulse", "custom"})


def utc_now_iso() -> str:
    return datetime.now(timezone.utc).isoformat()


def normalize_collision_solver_name(value: str) -> str:
    name = str(value).strip().lower()
    if name not in COLLISION_SOLVERS:
        allowed = ", ".join(sorted(COLLISION_SOLVERS))
        raise ValueError(f"Unsupported collision solver '{value}'. Supported values: {allowed}.")
    return name


@dataclass
class BoundaryCondition:
    """Per-edge boundary condition.

    ``value`` / ``aux_value`` meaning by kind:
      reflective — unused; absorbing — unused;
      dirichlet — value = boundary density g;
      neumann   — value = inward flux q;
      robin     — value = beta (extraction), aux_value = gamma (injection).
    """

    kind: str
    value: float | None = None
    aux_value: float | None = None

    def normalized_kind(self) -> str:
        return self.kind.strip().lower()

    def validate(self) -> None:
        kind = self.normalized_kind()
        if kind not in BOUNDARY_KINDS:
            raise ValueError(f"Unsupported boundary condition kind: {self.kind}")
        if kind in {"neumann", "dirichlet", "robin"} and self.value is None:
            raise ValueError(f"Boundary condition '{kind}' requires a numeric value")


@dataclass
class BoundaryFace:
    """One exposed face of an interior cell (row, col) in direction up/down/left/right."""

    row: int
    col: int
    direction: str


@dataclass
class EdgeSegment:
    """A maximal axis-aligned run of boundary faces sharing one outward normal."""

    edge_id: str
    x0: float
    y0: float
    x1: float
    y1: float
    normal: str
    faces: list[BoundaryFace]


@dataclass
class GeometryData:
    name: str
    source_path: str
    layer: int
    mesh_size: float
    mask: list[list[int]]
    edges: list[EdgeSegment]
    bounds: list[float] | None = None


@dataclass
class InitialConditionSpec:
    """Split spatial × energy initial condition for QPs and phonons.

    Mirrors reference models.py:82-108 field-for-field (JSON contract).
    """

    spatial_kind: str = ""
    spatial_params: dict[str, Any] = field(default_factory=dict)
    spatial_custom_body: str = "return np.exp(-((x-0.5)**2 + (y-0.5)**2) / 0.02)"
    spatial_custom_params: dict[str, Any] = field(default_factory=dict)
    energy_kind: str = ""  # dos / fermi_dirac / uniform / custom
    energy_params: dict[str, Any] = field(default_factory=dict)
    energy_custom_body: str = "return np.ones_like(E)"
    energy_custom_params: dict[str, Any] = field(default_factory=dict)
    qp_full_custom_enabled: bool = False
    qp_full_custom_body: str = (
        "return np.exp(-((x-0.5)**2 + (y-0.5)**2) / 0.02) * np.exp(-E / 500.0)"
    )
    qp_full_custom_params: dict[str, Any] = field(default_factory=dict)
    phonon_spatial_kind: str = ""  # gaussian / uniform / point / custom
    phonon_spatial_params: dict[str, Any] = field(default_factory=dict)
    phonon_spatial_custom_body: str = "return 1.0"
    phonon_spatial_custom_params: dict[str, Any] = field(default_factory=dict)
    phonon_energy_kind: str = ""  # bose_einstein / uniform / custom
    phonon_energy_params: dict[str, Any] = field(default_factory=dict)
    phonon_energy_custom_body: str = "return np.ones_like(E)"
    phonon_energy_custom_params: dict[str, Any] = field(default_factory=dict)
    phonon_full_custom_enabled: bool = False
    phonon_full_custom_body: str = (
        "return np.exp(-((x-0.5)**2 + (y-0.5)**2) / 0.02) * np.exp(-E / 500.0)"
    )
    phonon_full_custom_params: dict[str, Any] = field(default_factory=dict)


@dataclass
class ExternalGenerationSpec:
    """External QP generation g_ext(E, x, y, t) in μeV⁻¹ μm⁻² ns⁻¹."""

    mode: str = "none"
    rate: float = 0.0
    pulse_start: float = 0.0
    pulse_duration: float = 10.0
    pulse_rate: float = 0.0
    custom_body: str = "return 0.0"
    custom_params: dict[str, Any] = field(default_factory=dict)

    def normalized_mode(self) -> str:
        return self.mode.strip().lower()

    def validate(self) -> None:
        mode = self.normalized_mode()
        if mode not in EXTERNAL_GENERATION_MODES:
            allowed = ", ".join(sorted(EXTERNAL_GENERATION_MODES))
            raise ValueError(
                f"Unsupported external generation mode '{self.mode}'. Supported: {allowed}."
            )
        for label, val in (
            ("constant rate", self.rate),
            ("pulse rate", self.pulse_rate),
            ("pulse_duration", self.pulse_duration),
        ):
            if val < 0:
                raise ValueError(f"External generation {label} must be non-negative.")


@dataclass
class SimulationParameters:
    """All physics / numerics parameters for one run.

    Units: lengths μm, time ns, energies μeV, temperatures K, D in μm²/ns.
    ``energy_gap == 0`` selects the legacy scalar (energy-integrated) mode.
    """

    diffusion_coefficient: float
    dt: float
    total_time: float
    mesh_size: float
    store_every: int = 1
    energy_gap: float = 0.0
    energy_min_factor: float = 1.0
    energy_max_factor: float = 10.0
    num_energy_bins: int = 50
    dynes_gamma: float = 0.0
    gap_expression: str = ""
    collision_solver: str = "fischer_catelani_local"
    enable_diffusion: bool = True
    enable_recombination: bool = False
    enable_scattering: bool = False
    tau_0: float = 440.0
    tau_s: float | None = None
    tau_r: float | None = None
    T_c: float = 1.2
    bath_temperature: float = 0.1
    export_phonon_history: bool = False
    external_generation: ExternalGenerationSpec = field(default_factory=ExternalGenerationSpec)

    def __post_init__(self) -> None:
        self.collision_solver = normalize_collision_solver_name(self.collision_solver)
        # tau_0 is a convenience default for tau_s / tau_r; after resolution it
        # is re-synchronised to their mean (reference models.py:168-175).
        if self.tau_s is None:
            self.tau_s = float(self.tau_0)
        if self.tau_r is None:
            self.tau_r = float(self.tau_0)
        self.tau_0 = float(0.5 * (self.tau_s + self.tau_r))

        positives = {"dt": self.dt, "total_time": self.total_time, "mesh_size": self.mesh_size}
        for label, val in positives.items():
            if val <= 0:
                raise ValueError(f"{label} must be positive.")
        if self.bath_temperature < 0:
            raise ValueError("bath_temperature must be non-negative.")
        if self.enable_recombination or self.enable_scattering:
            if self.T_c <= 0:
                raise ValueError(
                    "T_c must be positive when recombination or scattering is enabled."
                )
            if self.tau_s <= 0:
                raise ValueError(
                    "tau_s must be positive when recombination or scattering is enabled."
                )
            if self.tau_r <= 0:
                raise ValueError(
                    "tau_r must be positive when recombination or scattering is enabled."
                )
        if self.energy_gap > 0:
            if self.energy_min_factor < 1.0:
                raise ValueError("energy_min_factor must be >= 1.0 when energy_gap > 0.")
            if self.energy_max_factor <= self.energy_min_factor:
                raise ValueError(
                    "energy_max_factor must be > energy_min_factor when energy_gap > 0."
                )
            if self.num_energy_bins < 2:
                raise ValueError("num_energy_bins must be >= 2 when energy_gap > 0.")
        self.external_generation.validate()


@dataclass
class SetupData:
    setup_id: str
    name: str
    created_at: str
    geometry: GeometryData
    boundary_conditions: dict[str, BoundaryCondition]
    parameters: SimulationParameters
    initial_condition: InitialConditionSpec


@dataclass
class SimulationResultData:
    simulation_id: str
    setup_id: str
    setup_name: str
    created_at: str
    times: list[float]
    frames: list[list[list[float | None]]]
    mass_over_time: list[float]
    color_limits: list[float]
    metadata: dict[str, Any] = field(default_factory=dict)
    energy_frames: list[list[list[list[float | None]]]] | None = None
    phonon_frames: list[list[list[float | None]]] | None = None
    phonon_energy_frames: list[list[list[list[float | None]]]] | None = None
    phonon_energy_bins: list[float] | None = None
    phonon_metadata: dict[str, Any] | None = None
    energy_bins: list[float] | None = None


@dataclass
class TestCaseResultData:
    __test__ = False  # keep pytest from collecting this as a test class
    case_id: str
    title: str
    boundary_label: str
    formula_latex: str
    initial_condition_latex: str
    description: str
    x: list[float]
    times: list[float]
    simulated: list[Any]
    analytic: list[Any]
    metadata: dict[str, Any] = field(default_factory=dict)


@dataclass
class TestGeometryGroupData:
    __test__ = False
    geometry_id: str
    title: str
    description: str
    view_mode: str
    preview_mask: list[list[int]]
    cases: list[TestCaseResultData] = field(default_factory=list)
    case_count: int = 0
    group_file: str | None = None


@dataclass
class TestSuiteData:
    __test__ = False
    suite_id: str
    created_at: str
    cases: list[TestCaseResultData] = field(default_factory=list)
    geometry_groups: list[TestGeometryGroupData] = field(default_factory=list)
    metadata: dict[str, Any] = field(default_factory=dict)
