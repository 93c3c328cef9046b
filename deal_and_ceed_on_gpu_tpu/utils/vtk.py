"""Solution output: VTK rectilinear-grid files (DataOut equivalent,
reference L-18, ``step-64/step-64.cu:560-588``).

Uses the native C++ writer (utils/native.py) when available; otherwise a
pure-Python writer producing byte-identical files.
"""

from __future__ import annotations

import struct

import numpy as np

from . import native

__all__ = ["write_solution_vtr", "write_solution_vts"]


def _write_vtr_py(path, xs, ys, zs, values, field_name="solution"):
    xs, ys, zs = (np.ascontiguousarray(a, np.float64) for a in (xs, ys, zs))
    values = np.ascontiguousarray(values, np.float64)
    nx, ny, nz = xs.size, ys.size, zs.size
    blobs = [values.tobytes(), xs.tobytes(), ys.tobytes(), zs.tobytes()]
    offsets, off = [], 0
    for b in blobs:
        offsets.append(off)
        off += 8 + len(b)
    ext = f"0 {nx-1} 0 {ny-1} 0 {nz-1}"
    hdr = (
        '<?xml version="1.0"?>\n'
        '<VTKFile type="RectilinearGrid" version="1.0" '
        'byte_order="LittleEndian" header_type="UInt64">\n'
        f'<RectilinearGrid WholeExtent="{ext}">\n<Piece Extent="{ext}">\n'
        f'<PointData Scalars="{field_name}">\n'
        f'<DataArray type="Float64" Name="{field_name}" format="appended" '
        f'offset="{offsets[0]}"/>\n</PointData>\n<Coordinates>\n'
        + "".join(
            f'<DataArray type="Float64" Name="{n}" format="appended" '
            f'offset="{o}"/>\n'
            for n, o in zip("xyz", offsets[1:])
        )
        + "</Coordinates>\n</Piece>\n</RectilinearGrid>\n"
        '<AppendedData encoding="raw">\n_'
    )
    with open(path, "wb") as f:
        f.write(hdr.encode())
        for b in blobs:
            f.write(struct.pack("<Q", len(b)))
            f.write(b)
        f.write(b"\n</AppendedData>\n</VTKFile>\n")


def write_solution_vtr(path, space, u, field_name="solution"):
    """Write the FE solution on its nodal grid to ``path`` (.vtr); mapped
    (deformed) meshes are dispatched to the curvilinear .vts writer."""
    if space.mesh.is_mapped:
        return write_solution_vts(path, space, u, field_name)
    xs, ys, zs = space.mesh.node_coords_1d(space.degree, space.basis.nodes)
    values = np.asarray(u, dtype=np.float64).reshape(space.grid_shape)
    if not native.write_vtr(path, xs, ys, zs, values, field_name):
        _write_vtr_py(path, xs, ys, zs, values, field_name)
    return path


def write_solution_vts(path, space, u, field_name="solution"):
    """VTK *structured* grid (.vts) with explicit point coordinates — the
    curvilinear output path for mapped/deformed meshes (reference L-18
    ``DataOut`` handles deformed mappings the same way)."""
    nz, ny, nx = space.grid_shape
    pts = space.node_coords().astype(np.float64)  # [n_dofs, 3], x fastest
    values = np.ascontiguousarray(np.asarray(u, np.float64).reshape(-1))
    blobs = [values.tobytes(), np.ascontiguousarray(pts).tobytes()]
    offsets, off = [], 0
    for b in blobs:
        offsets.append(off)
        off += 8 + len(b)
    ext = f"0 {nx-1} 0 {ny-1} 0 {nz-1}"
    hdr = (
        '<?xml version="1.0"?>\n'
        '<VTKFile type="StructuredGrid" version="1.0" '
        'byte_order="LittleEndian" header_type="UInt64">\n'
        f'<StructuredGrid WholeExtent="{ext}">\n<Piece Extent="{ext}">\n'
        f'<PointData Scalars="{field_name}">\n'
        f'<DataArray type="Float64" Name="{field_name}" format="appended" '
        f'offset="{offsets[0]}"/>\n</PointData>\n<Points>\n'
        f'<DataArray type="Float64" NumberOfComponents="3" '
        f'format="appended" offset="{offsets[1]}"/>\n'
        "</Points>\n</Piece>\n</StructuredGrid>\n"
        '<AppendedData encoding="raw">\n_'
    )
    with open(path, "wb") as f:
        f.write(hdr.encode())
        for b in blobs:
            f.write(struct.pack("<Q", len(b)))
            f.write(b)
        f.write(b"\n</AppendedData>\n</VTKFile>\n")
    return path
