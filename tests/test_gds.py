"""GDS pipeline: writer↔parser round trip, flattening, rasterization."""

import numpy as np
import pytest

from qpsim_tpu.geometry.gds import (
    create_geometry_from_gds,
    discover_gds_layers,
    native_raster_available,
    rasterize_gds_layer,
    read_gds_library,
    read_gds_polygons,
    write_gds,
)
from qpsim_tpu.geometry import gds as gds_mod
from qpsim_tpu.geometry.raster import rasterize_polygons


def _rect(x0, y0, w, h, ccw=True):
    pts = np.array([[x0, y0], [x0 + w, y0], [x0 + w, y0 + h], [x0, y0 + h]], dtype=float)
    return pts if ccw else pts[::-1]


def test_write_read_roundtrip(tmp_path):
    path = write_gds(
        tmp_path / "chip.gds",
        {"TOP": [(1, _rect(0, 0, 30, 12)), (2, _rect(5, 5, 4, 4))]},
    )
    lib = read_gds_library(path)
    assert lib.name == "QPSIMTPU"
    assert abs(lib.unit_user - 1e-3) < 1e-12
    polys = read_gds_polygons(path)
    assert len(polys) == 2
    assert sorted(p.layer for p in polys) == [1, 2]
    rect = next(p for p in polys if p.layer == 1)
    np.testing.assert_allclose(rect.points, _rect(0, 0, 30, 12), atol=1e-9)
    assert discover_gds_layers(path) == [1, 2]


def test_donut_cutout_semantics(tmp_path):
    # reversed-winding inner square carves a hole
    path = write_gds(
        tmp_path / "donut.gds",
        {"TOP": [(1, _rect(0, 0, 20, 20, ccw=True)), (1, _rect(6, 6, 8, 8, ccw=False))]},
    )
    mask, bounds = rasterize_gds_layer(path, layer=1, mesh_size=1.0)
    ny, nx = mask.shape
    assert nx >= 8 and ny >= 8
    # outer ring of padding is empty (explicit boundary ring)
    assert not mask[0].any() and not mask[-1].any()
    # center is carved out
    assert not mask[ny // 2, nx // 2]
    # ring material exists
    assert mask.sum() > 0
    assert bounds[0] == -1.0 and bounds[1] == -1.0  # one-cell padding


def test_create_geometry_rejects_disconnected(tmp_path):
    path = write_gds(
        tmp_path / "two.gds",
        {"TOP": [(1, _rect(0, 0, 5, 5)), (1, _rect(20, 20, 5, 5))]},
    )
    with pytest.raises(ValueError, match="exactly one connected region"):
        create_geometry_from_gds(path, layer=1, mesh_size=1.0)


def test_create_geometry_from_gds(tmp_path):
    path = write_gds(tmp_path / "strip.gds", {"TOP": [(3, _rect(0, 0, 40, 6))]})
    geo = create_geometry_from_gds(path, layer=3, mesh_size=1.0)
    mask = np.asarray(geo.mask, dtype=bool)
    assert mask.sum() == 40 * 6
    assert geo.layer == 3
    assert len(geo.edges) >= 4
    assert geo.name.endswith("_L3")


def test_sref_flattening(tmp_path):
    # build a library with a referenced subcell manually (writer emits
    # BOUNDARY only, so splice an SREF record in by authoring bytes)
    import struct

    from qpsim_tpu.geometry.gds import _ascii_record, _record, _pack_real8

    ts = struct.pack(">12h", 2026, 1, 1, 0, 0, 0, 2026, 1, 1, 0, 0, 0)
    unit_user = 1e-3
    blob = bytearray()
    blob += _record(0x00, 2, struct.pack(">h", 600))
    blob += _record(0x01, 2, ts)
    blob += _ascii_record(0x02, "LIB")
    blob += _record(0x03, 5, _pack_real8(unit_user) + _pack_real8(1e-9))
    # subcell with a unit square on layer 1
    blob += _record(0x05, 2, ts)
    blob += _ascii_record(0x06, "SUB")
    sq = np.rint(_rect(0, 0, 2, 2) / unit_user)
    closed = np.vstack([sq, sq[:1]]).astype(">i4")  # vstack would drop byte order
    blob += _record(0x08, 0)
    blob += _record(0x0D, 2, struct.pack(">h", 1))
    blob += _record(0x0E, 2, struct.pack(">h", 0))
    blob += _record(0x10, 3, closed.tobytes())
    blob += _record(0x11, 0)
    blob += _record(0x07, 0)
    # top cell referencing SUB at (10, 0)
    blob += _record(0x05, 2, ts)
    blob += _ascii_record(0x06, "TOP")
    blob += _record(0x0A, 0)  # SREF
    blob += _ascii_record(0x12, "SUB")
    origin = np.rint(np.array([[10.0, 0.0]]) / unit_user).astype(">i4")
    blob += _record(0x10, 3, origin.tobytes())
    blob += _record(0x11, 0)
    blob += _record(0x07, 0)
    blob += _record(0x04, 0)  # ENDLIB
    path = tmp_path / "ref.gds"
    path.write_bytes(bytes(blob))

    lib = read_gds_library(path)
    assert set(lib.cells) == {"SUB", "TOP"}
    tops = lib.top_level()
    assert [c.name for c in tops] == ["TOP"]
    polys = read_gds_polygons(path)
    assert len(polys) == 1
    np.testing.assert_allclose(polys[0].points, _rect(0, 0, 2, 2) + [10, 0], atol=1e-9)


def test_native_and_numpy_rasterizers_agree(tmp_path):
    if not native_raster_available():
        pytest.skip("native rasterizer not built")
    rng = np.random.default_rng(0)
    angles = np.sort(rng.uniform(0, 2 * np.pi, 9))
    poly = np.column_stack([10 + 6 * np.cos(angles), 8 + 5 * np.sin(angles)])
    path = write_gds(tmp_path / "blob.gds", {"TOP": [(1, poly)]})
    mask_native, _ = rasterize_gds_layer(path, 1, 0.5)

    # force the numpy fallback
    gds_mod._native_checked = True
    saved = gds_mod._native_lib
    gds_mod._native_lib = None
    try:
        mask_numpy, _ = rasterize_gds_layer(path, 1, 0.5)
    finally:
        gds_mod._native_lib = saved
    np.testing.assert_array_equal(mask_native, mask_numpy)


def test_raster_matches_reference_style_winding():
    # rasterize_polygons (numpy) and the GDS grid accumulation agree on a donut
    outer = _rect(0, 0, 16, 16, ccw=True)
    inner = _rect(5, 5, 6, 6, ccw=False)
    xc = np.arange(20) - 1.5
    yc = np.arange(20) - 1.5
    mask = rasterize_polygons([outer, inner], xc + 0.5, yc + 0.5)
    assert mask.any()
    # hole is empty, ring is filled
    def cell(x, y):
        j = int(np.argmin(np.abs((xc + 0.5) - x)))
        i = int(np.argmin(np.abs((yc + 0.5) - y)))
        return mask[i, j]
    assert cell(8.0, 8.0) == False  # noqa: E712 — inside the hole
    assert cell(2.0, 8.0) == True  # noqa: E712 — in the ring


def test_path_straight_flush_and_square_caps(tmp_path):
    from qpsim_tpu.geometry.raster import polygon_signed_area

    # horizontal 20-long, 4-wide wire from (0,0) to (20,0)
    line = np.array([[0.0, 0.0], [20.0, 0.0]])
    path = write_gds(
        tmp_path / "wire.gds",
        {"TOP": [(1, line, 4.0), (2, line, 4.0, 2)]},
    )
    polys = {p.layer: p for p in read_gds_polygons(path)}
    flush = polys[1].points
    square = polys[2].points
    assert polygon_signed_area(flush) > 0  # normalized orientation
    np.testing.assert_allclose(sorted(flush[:, 0]), [0, 0, 20, 20], atol=1e-9)
    np.testing.assert_allclose(sorted(flush[:, 1]), [-2, -2, 2, 2], atol=1e-9)
    # pathtype 2 extends both ends by half the width
    np.testing.assert_allclose(sorted(square[:, 0]), [-2, -2, 22, 22], atol=1e-9)


def test_path_bend_miter_covers_elbow(tmp_path):
    # L-shaped 2-wide wire; the mitred elbow must cover the corner cell
    line = np.array([[1.0, 1.0], [9.0, 1.0], [9.0, 9.0]])
    path = write_gds(tmp_path / "elbow.gds", {"TOP": [(1, line, 2.0)]})
    (poly,) = read_gds_polygons(path)
    from qpsim_tpu.geometry.raster import points_in_polygon

    probes = np.array(
        [
            [5.0, 1.0],  # mid horizontal leg
            [9.0, 5.0],  # mid vertical leg
            [9.5, 1.5],  # outer elbow corner region
            [8.5, 1.5],  # inner elbow
            [5.0, 2.5],  # outside (above the horizontal leg)
            [0.5, 1.0],  # beyond the flush start cap
        ]
    )
    inside = points_in_polygon(poly.points, probes)
    assert inside.tolist() == [True, True, True, True, False, False]


def test_path_round_cap_bulges(tmp_path):
    line = np.array([[0.0, 0.0], [10.0, 0.0]])
    path = write_gds(tmp_path / "round.gds", {"TOP": [(1, line, 4.0, 1)]})
    (poly,) = read_gds_polygons(path)
    from qpsim_tpu.geometry.raster import points_in_polygon

    probes = np.array(
        [
            [11.5, 0.0],   # inside the round cap (r=2 around (10,0))
            [-1.5, 0.0],   # inside the start cap
            [11.7, 1.7],   # outside the circle, inside the square cap's corner
            [5.0, 0.0],
        ]
    )
    inside = points_in_polygon(poly.points, probes)
    assert inside.tolist() == [True, True, False, True]


def test_path_rasterizes_into_mask(tmp_path):
    # a PATH wire alone defines the film; mask semantics match a rectangle
    line = np.array([[2.0, 5.0], [38.0, 5.0]])
    path = write_gds(tmp_path / "filmwire.gds", {"TOP": [(1, line, 6.0)]})
    geo = create_geometry_from_gds(path, layer=1, mesh_size=1.0)
    mask = np.array(geo.mask, dtype=bool)
    assert mask.sum() > 0
    rows = mask.any(axis=1)
    # wire occupies a ~6-cell-tall band, padded by the empty boundary ring
    assert not mask[0].any() and not mask[-1].any()
    assert 4 <= rows.sum() <= 8


def test_include_paths_false_reproduces_reference_behavior(tmp_path):
    # the reference's gdstk pipeline reads only cell.polygons — PATHs are
    # dropped (geometry.py:38); include_paths=False reproduces that
    line = np.array([[0.0, 2.0], [20.0, 2.0]])
    path = write_gds(
        tmp_path / "mixed.gds",
        {"TOP": [(1, _rect(0, 10, 20, 6)), (1, line, 4.0)]},
    )
    with_paths = read_gds_polygons(path)
    without = read_gds_polygons(path, include_paths=False)
    assert len(with_paths) == 2 and len(without) == 1
    assert all(not p.from_path for p in without)
    mask_ref, _ = rasterize_gds_layer(path, 1, 1.0, include_paths=False)
    mask_ext, _ = rasterize_gds_layer(path, 1, 1.0)
    assert mask_ext.sum() > mask_ref.sum()


def test_negative_width_is_absolute(tmp_path):
    # GDSII: negative WIDTH = absolute width of magnitude |width|
    line = np.array([[0.0, 0.0], [10.0, 0.0]])
    path = write_gds(tmp_path / "neg.gds", {"TOP": [(1, line, -4.0)]})
    (poly,) = read_gds_polygons(path)
    np.testing.assert_allclose(sorted(poly.points[:, 1]), [-2, -2, 2, 2], atol=1e-9)


def test_corrupt_stream_raises_value_error(tmp_path):
    # truncated/garbled records must surface as ValueError (the CLI's
    # clean-error contract), never raw struct.error
    import random

    import numpy as np

    from qpsim_tpu.geometry.gds import read_gds_library, write_gds

    sq = np.array([[0.0, 0.0], [4.0, 0.0], [4.0, 3.0], [0.0, 3.0]])
    base = write_gds(tmp_path / "base.gds", {"CELL": [(1, sq)]})
    data = base.read_bytes()
    rng = random.Random(7)
    failures = 0
    for trial in range(300):
        b = bytearray(data)
        mode = trial % 3
        if mode == 0:
            b = b[: rng.randrange(5, len(b))]
        elif mode == 1:
            i = rng.randrange(len(b))
            b[i : i + 8] = rng.randbytes(8)
        else:
            b = bytearray(rng.randbytes(rng.randrange(5, 200)))
        (tmp_path / "fuzz.gds").write_bytes(bytes(b))
        try:
            read_gds_library(tmp_path / "fuzz.gds")
        except ValueError:
            failures += 1
        # any other exception type fails the test by propagating
    assert failures > 20  # the mutations genuinely exercise error paths
