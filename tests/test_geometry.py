"""Geometry layer: edge extraction, components, intrinsic rectangle."""

import numpy as np

from qpsim_tpu.geometry.mask import (
    boundary_face_map,
    connected_component_count,
    create_intrinsic_geometry,
    extract_edge_segments,
    point_to_segment_distance,
)


def test_rectangle_has_four_edges():
    mask = np.ones((4, 6), dtype=bool)
    edges = extract_edge_segments(mask)
    assert len(edges) == 4
    normals = sorted(e.normal for e in edges)
    assert normals == ["down", "left", "right", "up"]
    # every boundary face appears exactly once
    total_faces = sum(len(e.faces) for e in edges)
    assert total_faces == 2 * 4 + 2 * 6


def test_edge_ids_sequential_and_stable():
    mask = np.ones((3, 3), dtype=bool)
    edges = extract_edge_segments(mask)
    assert [e.edge_id for e in edges] == [f"edge_{i:04d}" for i in range(1, len(edges) + 1)]
    again = extract_edge_segments(mask)
    assert [(e.edge_id, e.x0, e.y0, e.x1, e.y1, e.normal) for e in edges] == [
        (e.edge_id, e.x0, e.y0, e.x1, e.y1, e.normal) for e in again
    ]


def test_notched_mask_faces_cover_all_exposures():
    mask = np.ones((5, 7), dtype=bool)
    mask[0:2, 0:3] = False
    edges = extract_edge_segments(mask)
    faces = boundary_face_map(mask)
    expected = int(sum(plane.sum() for plane in faces.values()))
    assert sum(len(e.faces) for e in edges) == expected
    for e in edges:
        for f in e.faces:
            assert mask[f.row, f.col]
            assert faces[f.direction][f.row, f.col]


def test_connected_components():
    mask = np.zeros((5, 5), dtype=bool)
    mask[0, 0] = True
    mask[4, 4] = True
    mask[2, 1:4] = True
    assert connected_component_count(mask) == 3
    assert connected_component_count(np.ones((3, 3), dtype=bool)) == 1
    # diagonal contact is NOT connectivity (4-connected)
    diag = np.eye(3, dtype=bool)
    assert connected_component_count(diag) == 3


def test_intrinsic_geometry_shape_and_margin():
    geo = create_intrinsic_geometry(mesh_size=2.0, width=40, height=20)
    mask = np.asarray(geo.mask, dtype=bool)
    assert mask.shape == (20, 40)
    assert not mask[0].any() and not mask[-1].any()
    assert not mask[:, 0].any() and not mask[:, -1].any()
    assert mask.any()
    assert geo.mesh_size == 2.0
    assert len(geo.edges) >= 4


def test_point_to_segment_distance():
    geo = create_intrinsic_geometry(width=16, height=16)
    edge = geo.edges[0]
    mid_x, mid_y = 0.5 * (edge.x0 + edge.x1), 0.5 * (edge.y0 + edge.y1)
    assert point_to_segment_distance(mid_x, mid_y, edge) == 0.0
    assert point_to_segment_distance(mid_x, mid_y + 2.0, edge) == 2.0


def test_mask_to_polygons_round_trip():
    from qpsim_tpu.geometry.mask import mask_to_polygons
    from qpsim_tpu.geometry.raster import polygon_signed_area, rasterize_polygons

    rng = np.random.default_rng(3)
    # blobby random masks incl. holes and checkerboard corners
    for trial in range(6):
        mask = rng.random((12, 18)) > 0.45
        mask[5:8, 6:12] = True
        mask[6, 8:10] = False  # hole
        polys = mask_to_polygons(mask)
        if not mask.any():
            assert polys == []
            continue
        back = rasterize_polygons(
            polys, np.arange(mask.shape[1]) + 0.5, np.arange(mask.shape[0]) + 0.5
        )
        np.testing.assert_array_equal(back, mask, err_msg=f"trial {trial}")
    # orientation convention: outer CCW (positive), holes CW (negative)
    donut = np.zeros((10, 10), dtype=bool)
    donut[1:9, 1:9] = True
    donut[4:6, 4:6] = False
    polys = mask_to_polygons(donut)
    areas = sorted(polygon_signed_area(p) for p in polys)
    assert areas[0] < 0 < areas[-1]


def test_mask_to_polygons_gds_export_round_trip(tmp_path):
    from qpsim_tpu.geometry.gds import read_gds_polygons, write_gds
    from qpsim_tpu.geometry.mask import mask_to_polygons
    from qpsim_tpu.geometry.raster import rasterize_polygons

    mask = np.zeros((9, 14), dtype=bool)
    mask[2:7, 3:11] = True
    mask[4, 6:8] = False
    path = write_gds(
        tmp_path / "export.gds", {"TOP": [(1, p) for p in mask_to_polygons(mask)]}
    )
    polys = [p.points for p in read_gds_polygons(path)]
    back = rasterize_polygons(
        polys, np.arange(mask.shape[1]) + 0.5, np.arange(mask.shape[0]) + 0.5
    )
    np.testing.assert_array_equal(back, mask)
