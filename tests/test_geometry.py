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
