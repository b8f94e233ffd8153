"""Persistence: setups, simulations, precompute sidecars, test suites.

File-format compatible with the reference (``/root/reference/qpsim/storage.py``):

* setups — JSON, ``data/setups/<slug>_<id12>.json``;
* precompute — ``.precompute.npz`` sidecar next to the setup JSON;
* simulations — JSON with NaN↔null frame encoding;
* test suites — **manifest format v3**: a manifest JSON whose geometry groups
  reference per-group sidecar JSON files in a same-named directory, with a
  path-escape guard; the legacy flat-case format is rejected.
"""

from __future__ import annotations

import json
import re
import uuid
from dataclasses import asdict
from pathlib import Path
from typing import Any

import numpy as np

from ..fields import canonicalize_initial_condition
from ..models.params import (
    BoundaryCondition,
    BoundaryFace,
    EdgeSegment,
    ExternalGenerationSpec,
    GeometryData,
    InitialConditionSpec,
    SetupData,
    SimulationParameters,
    SimulationResultData,
    TestCaseResultData,
    TestGeometryGroupData,
    TestSuiteData,
    utc_now_iso,
)
from .paths import SETUPS_DIR, SIMULATIONS_DIR, TEST_CASES_DIR, ensure_data_dirs

TEST_SUITE_FORMAT_VERSION = 3

__all__ = [
    "TEST_SUITE_FORMAT_VERSION",
    "slugify_name",
    "frame_to_jsonable",
    "frame_from_jsonable",
    "serialize_setup",
    "deserialize_setup",
    "save_setup",
    "load_setup",
    "create_setup_id",
    "precompute_npz_path",
    "save_precomputed",
    "load_precomputed",
    "precomputed_exists",
    "serialize_simulation",
    "deserialize_simulation",
    "save_simulation",
    "load_simulation",
    "list_simulation_files",
    "create_simulation_id",
    "save_test_suite",
    "load_test_suite",
    "load_test_geometry_group",
    "deserialize_test_suite",
    "list_test_suite_files",
    "latest_test_suite_file",
]


def slugify_name(name: str, fallback: str = "item") -> str:
    value = re.sub(r"[^a-zA-Z0-9_-]+", "_", name.strip()).strip("_")
    return value or fallback


def _coerce_bool(val: Any) -> bool:
    if isinstance(val, bool):
        return val
    if isinstance(val, str):
        return val.lower() not in ("false", "0", "no", "")
    return bool(val)


def _write_json(path: Path | str, payload: dict[str, Any]) -> Path:
    ensure_data_dirs()
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_text(json.dumps(payload, indent=2), encoding="utf-8")
    return path


def _read_json(path: Path) -> dict[str, Any]:
    return json.loads(Path(path).read_text(encoding="utf-8"))


def frame_to_jsonable(frame: np.ndarray) -> list[list[float | None]]:
    """2D array → nested lists with NaN encoded as null."""
    return [[None if np.isnan(v) else float(v) for v in row] for row in np.asarray(frame)]


def frame_from_jsonable(frame: list[list[float | None]]) -> np.ndarray:
    return np.array(
        [[np.nan if v is None else float(v) for v in row] for row in frame], dtype=np.float64
    )


# --- setups -----------------------------------------------------------------


def serialize_setup(setup: SetupData) -> dict[str, Any]:
    return asdict(setup)


def _external_generation_from(raw: dict[str, Any] | None) -> ExternalGenerationSpec:
    if raw is None:
        return ExternalGenerationSpec()
    return ExternalGenerationSpec(
        mode=str(raw.get("mode", "none")),
        rate=float(raw.get("rate", 0.0)),
        pulse_start=float(raw.get("pulse_start", 0.0)),
        pulse_duration=float(raw.get("pulse_duration", 10.0)),
        pulse_rate=float(raw.get("pulse_rate", 0.0)),
        custom_body=str(raw.get("custom_body", "return 0.0")),
        custom_params=dict(raw.get("custom_params", {})),
    )


def deserialize_setup(payload: dict[str, Any]) -> SetupData:
    geo_raw = payload["geometry"]
    edges = [
        EdgeSegment(
            edge_id=e["edge_id"],
            x0=e["x0"],
            y0=e["y0"],
            x1=e["x1"],
            y1=e["y1"],
            normal=e["normal"],
            faces=[BoundaryFace(**f) for f in e["faces"]],
        )
        for e in geo_raw["edges"]
    ]
    geometry = GeometryData(
        name=geo_raw["name"],
        source_path=geo_raw["source_path"],
        layer=int(geo_raw["layer"]),
        mesh_size=float(geo_raw["mesh_size"]),
        mask=geo_raw["mask"],
        edges=edges,
        bounds=geo_raw.get("bounds"),
    )
    bc_map = {
        edge_id: BoundaryCondition(
            kind=bc["kind"], value=bc.get("value"), aux_value=bc.get("aux_value")
        )
        for edge_id, bc in payload.get("boundary_conditions", {}).items()
    }
    p = payload["parameters"]
    params = SimulationParameters(
        diffusion_coefficient=float(p["diffusion_coefficient"]),
        dt=float(p["dt"]),
        total_time=float(p["total_time"]),
        mesh_size=float(p["mesh_size"]),
        store_every=int(p.get("store_every", 1)),
        energy_gap=float(p.get("energy_gap", 0.0)),
        energy_min_factor=float(p.get("energy_min_factor", 1.0)),
        energy_max_factor=float(p.get("energy_max_factor", 10.0)),
        num_energy_bins=int(p.get("num_energy_bins", 50)),
        dynes_gamma=float(p.get("dynes_gamma", 0.0)),
        gap_expression=str(p.get("gap_expression", "")),
        collision_solver=str(p.get("collision_solver") or "fischer_catelani_local"),
        enable_diffusion=_coerce_bool(p.get("enable_diffusion", True)),
        enable_recombination=_coerce_bool(p.get("enable_recombination", False)),
        enable_scattering=_coerce_bool(p.get("enable_scattering", False)),
        tau_0=float(p.get("tau_0", 440.0)),
        tau_s=float(p["tau_s"]) if p.get("tau_s") is not None else None,
        tau_r=float(p["tau_r"]) if p.get("tau_r") is not None else None,
        T_c=float(p.get("T_c", 1.2)),
        bath_temperature=float(p.get("bath_temperature", 0.1)),
        export_phonon_history=_coerce_bool(p.get("export_phonon_history", False)),
        external_generation=_external_generation_from(p.get("external_generation")),
    )
    ic_raw = payload.get("initial_condition", {})
    ic = InitialConditionSpec(
        spatial_kind=ic_raw.get("spatial_kind", ""),
        spatial_params=ic_raw.get("spatial_params", {}),
        spatial_custom_body=ic_raw.get("spatial_custom_body", ""),
        spatial_custom_params=ic_raw.get("spatial_custom_params", {}),
        energy_kind=ic_raw.get("energy_kind", ""),
        energy_params=ic_raw.get("energy_params", {}),
        energy_custom_body=ic_raw.get("energy_custom_body", ""),
        energy_custom_params=ic_raw.get("energy_custom_params", {}),
        qp_full_custom_enabled=_coerce_bool(ic_raw.get("qp_full_custom_enabled", False)),
        qp_full_custom_body=ic_raw.get("qp_full_custom_body", ""),
        qp_full_custom_params=ic_raw.get("qp_full_custom_params", {}),
        phonon_spatial_kind=ic_raw.get("phonon_spatial_kind", ""),
        phonon_spatial_params=ic_raw.get("phonon_spatial_params", {}),
        phonon_spatial_custom_body=ic_raw.get("phonon_spatial_custom_body", ""),
        phonon_spatial_custom_params=ic_raw.get("phonon_spatial_custom_params", {}),
        phonon_energy_kind=ic_raw.get("phonon_energy_kind", ""),
        phonon_energy_params=ic_raw.get("phonon_energy_params", {}),
        phonon_energy_custom_body=ic_raw.get("phonon_energy_custom_body", ""),
        phonon_energy_custom_params=ic_raw.get("phonon_energy_custom_params", {}),
        phonon_full_custom_enabled=_coerce_bool(ic_raw.get("phonon_full_custom_enabled", False)),
        phonon_full_custom_body=ic_raw.get("phonon_full_custom_body", ""),
        phonon_full_custom_params=ic_raw.get("phonon_full_custom_params", {}),
    )
    return SetupData(
        setup_id=payload["setup_id"],
        name=payload["name"],
        created_at=payload.get("created_at", utc_now_iso()),
        geometry=geometry,
        boundary_conditions=bc_map,
        parameters=params,
        initial_condition=canonicalize_initial_condition(ic),
    )


def save_setup(setup: SetupData, path: Path | None = None) -> Path:
    if path is None:
        path = SETUPS_DIR / f"{slugify_name(setup.name, 'setup')}_{setup.setup_id}.json"
    return _write_json(path, serialize_setup(setup))




def _deserialize_file(path: Path, what: str, fn):
    """Run a deserializer, reporting structural damage as ValueError.

    Hand-edited or corrupt files otherwise leak KeyError/TypeError/
    AttributeError through the loaders (found by mutation fuzzing), which
    callers with clean-error contracts (the CLI) don't catch.
    """
    try:
        return fn(_read_json(path))
    except ValueError:
        raise
    except (KeyError, TypeError, AttributeError, IndexError) as exc:
        raise ValueError(
            f"Corrupt or invalid {what} file {path}: {type(exc).__name__}: {exc}"
        ) from exc




def load_setup(path: str | Path) -> SetupData:
    return _deserialize_file(Path(path), "setup", deserialize_setup)


def create_setup_id() -> str:
    return uuid.uuid4().hex[:12]


# --- precompute sidecars -----------------------------------------------------


def precompute_npz_path(setup_path: Path) -> Path:
    return Path(setup_path).with_suffix(".precompute.npz")


def save_precomputed(setup_path: Path, arrays: dict) -> Path:
    npz_path = precompute_npz_path(setup_path)
    np.savez(str(npz_path), **arrays)
    return npz_path


def load_precomputed(setup_path: Path) -> dict:
    npz_path = precompute_npz_path(setup_path)
    try:
        return dict(np.load(str(npz_path), allow_pickle=False))
    except (ValueError, FileNotFoundError):
        raise
    except Exception as exc:  # truncated zip etc. (zipfile.BadZipFile)
        raise ValueError(
            f"Corrupt precompute sidecar {npz_path}: {type(exc).__name__}: {exc}"
        ) from exc


def precomputed_exists(setup_path: Path) -> bool:
    return precompute_npz_path(setup_path).exists()


# --- simulations --------------------------------------------------------------


def serialize_simulation(result: SimulationResultData) -> dict[str, Any]:
    return asdict(result)


def deserialize_simulation(payload: dict[str, Any]) -> SimulationResultData:
    return SimulationResultData(
        simulation_id=payload["simulation_id"],
        setup_id=payload["setup_id"],
        setup_name=payload["setup_name"],
        created_at=payload.get("created_at", utc_now_iso()),
        times=[float(v) for v in payload["times"]],
        frames=payload["frames"],
        mass_over_time=[float(v) for v in payload["mass_over_time"]],
        color_limits=[float(v) for v in payload["color_limits"]],
        metadata=payload.get("metadata", {}),
        energy_frames=payload.get("energy_frames"),
        energy_bins=(
            [float(v) for v in payload["energy_bins"]] if payload.get("energy_bins") else None
        ),
        phonon_frames=payload.get("phonon_frames"),
        phonon_energy_frames=payload.get("phonon_energy_frames"),
        phonon_energy_bins=(
            [float(v) for v in payload["phonon_energy_bins"]]
            if payload.get("phonon_energy_bins")
            else None
        ),
        phonon_metadata=payload.get("phonon_metadata"),
    )


def save_simulation(result: SimulationResultData, path: Path | None = None) -> Path:
    if path is None:
        path = (
            SIMULATIONS_DIR
            / f"{slugify_name(result.setup_name, 'simulation')}_{result.simulation_id}.json"
        )
    return _write_json(path, serialize_simulation(result))


def load_simulation(path: str | Path) -> SimulationResultData:
    return _deserialize_file(Path(path), "simulation", deserialize_simulation)


def list_simulation_files() -> list[Path]:
    ensure_data_dirs()
    return sorted(SIMULATIONS_DIR.glob("*.json"))


def create_simulation_id() -> str:
    return uuid.uuid4().hex[:12]


# --- test suites (manifest v3 + per-group sidecars) ----------------------------


def _test_case_from(case: dict[str, Any]) -> TestCaseResultData:
    return TestCaseResultData(
        case_id=case["case_id"],
        title=case["title"],
        boundary_label=case["boundary_label"],
        formula_latex=case["formula_latex"],
        initial_condition_latex=case["initial_condition_latex"],
        description=case["description"],
        x=[float(v) for v in case.get("x", [])],
        times=[float(v) for v in case["times"]],
        simulated=case["simulated"],
        analytic=case["analytic"],
        metadata=case.get("metadata", {}),
    )


def _group_from_inline(group: dict[str, Any]) -> TestGeometryGroupData:
    cases = [_test_case_from(c) for c in group.get("cases", [])]
    return TestGeometryGroupData(
        geometry_id=group["geometry_id"],
        title=group["title"],
        description=group.get("description", ""),
        view_mode=group.get("view_mode", "line1d"),
        preview_mask=[[int(v) for v in row] for row in group.get("preview_mask", [])],
        cases=cases,
        case_count=int(group.get("case_count", len(cases))),
        group_file=group.get("group_file"),
    )


def _sidecar_path(manifest_path: Path, group_file: str) -> Path:
    suite_dir = manifest_path.with_suffix("")
    rel = Path(group_file)
    if rel.is_absolute():
        raise ValueError(f"Geometry group sidecar must be a relative path, got '{group_file}'.")
    resolved = (suite_dir / rel).resolve()
    try:
        resolved.relative_to(suite_dir.resolve())
    except ValueError as exc:
        raise ValueError(
            f"Geometry group sidecar '{group_file}' escapes suite directory '{suite_dir}'."
        ) from exc
    return resolved


def load_test_geometry_group(manifest_path: str | Path, geometry_id: str) -> TestGeometryGroupData:
    manifest_path = Path(manifest_path)
    payload = _read_json(manifest_path)
    raw = next(
        (g for g in payload.get("geometry_groups", []) if g.get("geometry_id") == geometry_id),
        None,
    )
    if raw is None:
        raise ValueError(f"Geometry group '{geometry_id}' not found in suite manifest.")
    if raw.get("cases"):
        return _group_from_inline(raw)
    group_file = raw.get("group_file")
    if not group_file:
        raise ValueError(f"Geometry group '{geometry_id}' has no group file reference.")
    group_payload = _read_json(_sidecar_path(manifest_path, str(group_file)))
    group = _group_from_inline(group_payload.get("group", group_payload))
    if group.case_count <= 0:
        group.case_count = int(raw.get("case_count", len(group.cases)))
    if not group.preview_mask:
        group.preview_mask = [[int(v) for v in row] for row in raw.get("preview_mask", [])]
    group.group_file = group_file
    if group.case_count <= 0:
        group.case_count = len(group.cases)
    return group


def deserialize_test_suite(
    payload: dict[str, Any],
    manifest_path: Path | None = None,
    load_group_cases: bool = True,
) -> TestSuiteData:
    groups_raw = payload.get("geometry_groups")
    if not groups_raw:
        raise ValueError(
            "Test suite manifest missing 'geometry_groups'. "
            "Legacy flat-case suite format is no longer supported."
        )
    groups: list[TestGeometryGroupData] = []
    for raw in groups_raw:
        group = _group_from_inline(raw)
        if load_group_cases and not group.cases and manifest_path is not None and group.group_file:
            try:
                group = load_test_geometry_group(manifest_path, group.geometry_id)
            except Exception as exc:
                raise ValueError(
                    f"Failed to load geometry group '{group.geometry_id}' "
                    f"from sidecar '{group.group_file}'."
                ) from exc
        groups.append(group)
    cases: list[TestCaseResultData] = []
    for group in groups:
        cases.extend(group.cases)
    return TestSuiteData(
        suite_id=payload["suite_id"],
        created_at=payload.get("created_at", utc_now_iso()),
        cases=cases,
        geometry_groups=groups,
        metadata=payload.get("metadata", {}),
    )


def save_test_suite(suite: TestSuiteData, path: Path | None = None) -> Path:
    if path is None:
        path = TEST_CASES_DIR / f"test_suite_{suite.suite_id}.json"
    if not suite.geometry_groups:
        raise ValueError("Test suite must contain at least one geometry group.")
    suite_dir = path.with_suffix("")

    summaries: list[dict[str, Any]] = []
    for group in suite.geometry_groups:
        group_file = f"{slugify_name(group.geometry_id, 'group')}.json"
        full = TestGeometryGroupData(
            geometry_id=group.geometry_id,
            title=group.title,
            description=group.description,
            view_mode=group.view_mode,
            preview_mask=group.preview_mask,
            cases=list(group.cases),
            case_count=len(group.cases),
            group_file=group_file,
        )
        _write_json(suite_dir / group_file, {"suite_id": suite.suite_id, "group": asdict(full)})
        summaries.append(
            {
                "geometry_id": group.geometry_id,
                "title": group.title,
                "description": group.description,
                "view_mode": group.view_mode,
                "preview_mask": group.preview_mask,
                "cases": [],
                "case_count": len(group.cases),
                "group_file": group_file,
            }
        )
    metadata = dict(suite.metadata or {})
    metadata["format_version"] = max(
        TEST_SUITE_FORMAT_VERSION, int(metadata.get("format_version", 0))
    )
    return _write_json(
        path,
        {
            "suite_id": suite.suite_id,
            "created_at": suite.created_at,
            "cases": [],
            "geometry_groups": summaries,
            "metadata": metadata,
        },
    )


def load_test_suite(path: str | Path, load_group_cases: bool = True) -> TestSuiteData:
    path = Path(path)
    return _deserialize_file(
        path,
        "test-suite manifest",
        lambda payload: deserialize_test_suite(
            payload, manifest_path=path, load_group_cases=load_group_cases
        ),
    )


def list_test_suite_files() -> list[Path]:
    ensure_data_dirs()
    return sorted(TEST_CASES_DIR.glob("*.json"))


def latest_test_suite_file() -> Path | None:
    files = list_test_suite_files()
    return max(files, key=lambda p: p.stat().st_mtime) if files else None
