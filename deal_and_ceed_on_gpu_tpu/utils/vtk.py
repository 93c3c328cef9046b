"""Solution output: VTK rectilinear-grid files (DataOut equivalent,
reference L-18, ``step-64/step-64.cu:560-588``).

Uses the native C++ writer (utils/native.py) when available; otherwise a
pure-Python writer producing byte-identical files.
"""

from __future__ import annotations

import struct

import numpy as np

from . import native

__all__ = [
    "write_solution_vtr",
    "write_solution_vts",
    "write_solution_vtu",
    "write_solution_pvtr",
]


def _write_vtr_piece(path, xs, ys, zs, values, whole_ext, piece_ext,
                     field_name="solution"):
    """One .vtr piece whose Extent is a subrange of a global WholeExtent
    (the per-shard piece of a distributed solution)."""
    xs, ys, zs = (np.ascontiguousarray(a, np.float64) for a in (xs, ys, zs))
    values = np.ascontiguousarray(values, np.float64)
    blobs = [values.tobytes(), xs.tobytes(), ys.tobytes(), zs.tobytes()]
    offsets, off = [], 0
    for b in blobs:
        offsets.append(off)
        off += 8 + len(b)
    hdr = (
        '<?xml version="1.0"?>\n'
        '<VTKFile type="RectilinearGrid" version="1.0" '
        'byte_order="LittleEndian" header_type="UInt64">\n'
        f'<RectilinearGrid WholeExtent="{whole_ext}">\n'
        f'<Piece Extent="{piece_ext}">\n'
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


def write_solution_pvtr(path, part, blocks, field_name="solution"):
    """Distributed solution output: one ``.vtr`` piece per shard plus a
    ``.pvtr`` master record tying them together — the reference's
    per-rank-VTU + PVTU scheme (``step-64/step-64.cu:560-588``).

    ``part``: the :class:`~...parallel.partition.BlockPartition` of the
    solve; ``blocks``: the solve's ghosted-blocks array (host or device,
    ``part.flat_grid_shape``). Pieces carry their GLOBAL extents (shared
    boundary planes overlap by one node, as ParaView expects); dead
    padding is clipped off. In the single-controller JAX model the host
    writes all pieces; under multi-host each controller would write the
    pieces of its addressable shards.

    Returns the master path; pieces land next to it as
    ``<stem>_<k>.vtr``."""
    import os

    blocks = np.asarray(blocks).reshape(part.flat_grid_shape)
    nz, ny, nx = part.global_grid_shape
    nzl, nyl, nxl = part.local_grid_shape
    p = part.degree
    xs, ys, zs = part.mesh.node_coords_1d(p, _gll_nodes(p))
    whole = f"0 {nx-1} 0 {ny-1} 0 {nz-1}"
    stem, _ = os.path.splitext(path)
    pieces = []
    k = 0
    sz, sy, sx = part.mz_local * p, part.my_local * p, part.mx_local * p
    for iz in range(part.pz):
        z0, z1 = iz * sz, min(iz * sz + nzl - 1, nz - 1)
        for iy in range(part.py):
            y0, y1 = iy * sy, min(iy * sy + nyl - 1, ny - 1)
            for ix in range(part.px):
                x0, x1 = ix * sx, min(ix * sx + nxl - 1, nx - 1)
                if z1 < z0 or y1 < y0 or x1 < x0:
                    k += 1
                    continue  # fully-dead shard: no physical nodes
                piece_ext = f"{x0} {x1} {y0} {y1} {z0} {z1}"
                vals = blocks[
                    iz * nzl : iz * nzl + (z1 - z0 + 1),
                    iy * nyl : iy * nyl + (y1 - y0 + 1),
                    ix * nxl : ix * nxl + (x1 - x0 + 1),
                ]
                ppath = f"{stem}_{k}.vtr"
                _write_vtr_piece(
                    ppath,
                    xs[x0 : x1 + 1],
                    ys[y0 : y1 + 1],
                    zs[z0 : z1 + 1],
                    vals,
                    whole,
                    piece_ext,
                    field_name,
                )
                pieces.append((piece_ext, os.path.basename(ppath)))
                k += 1
    master = (
        '<?xml version="1.0"?>\n'
        '<VTKFile type="PRectilinearGrid" version="1.0" '
        'byte_order="LittleEndian" header_type="UInt64">\n'
        f'<PRectilinearGrid WholeExtent="{whole}" GhostLevel="0">\n'
        f'<PPointData Scalars="{field_name}">\n'
        f'<PDataArray type="Float64" Name="{field_name}"/>\n'
        "</PPointData>\n<PCoordinates>\n"
        '<PDataArray type="Float64" Name="x"/>\n'
        '<PDataArray type="Float64" Name="y"/>\n'
        '<PDataArray type="Float64" Name="z"/>\n'
        "</PCoordinates>\n"
        + "".join(
            f'<Piece Extent="{ext}" Source="{src}"/>\n' for ext, src in pieces
        )
        + "</PRectilinearGrid>\n</VTKFile>\n"
    )
    with open(path, "w") as f:
        f.write(master)
    return path


def _gll_nodes(p):
    from ..basis import Basis1D

    return Basis1D.make(p, rule="gauss_lobatto").nodes


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


def write_solution_vtu(path, space, u, field_name="solution"):
    """VTK *unstructured* grid (.vtu) for adaptive (hanging-node) meshes:
    every active cell is emitted as p^3 linear sub-hexes over its nodal
    lattice (deal.II ``DataOut`` with ``n_subdivisions = p`` — the
    reference's VTU output path, ``step-64/step-64.cu:560-588``). Nodal
    values are written CONFORMING (``distribute`` applied), so hanging
    nodes carry their interpolated values.
    """
    p = space.degree
    p1 = p + 1
    pts = np.ascontiguousarray(space.node_coords, dtype=np.float64)
    values = np.ascontiguousarray(
        np.asarray(space.distribute(u), dtype=np.float64).reshape(-1)
    )
    dof_map = space._dof_map_np  # [E, p1^3], local (k, j, i) = (z, y, x)

    # sub-hex corner offsets in VTK_HEXAHEDRON order (bottom CCW, top CCW)
    corners = np.array(
        [(0, 0, 0), (1, 0, 0), (1, 1, 0), (0, 1, 0),
         (0, 0, 1), (1, 0, 1), (1, 1, 1), (0, 1, 1)]
    )  # (di, dj, dk)
    k, j, i = np.meshgrid(np.arange(p), np.arange(p), np.arange(p), indexing="ij")
    base = np.stack([i, j, k], axis=-1).reshape(-1, 3)  # [p^3, 3] (i, j, k)
    loc = (
        (base[:, None, 2] + corners[None, :, 2]) * p1
        + (base[:, None, 1] + corners[None, :, 1])
    ) * p1 + (base[:, None, 0] + corners[None, :, 0])  # [p^3, 8]
    conn = dof_map[:, loc].reshape(-1, 8).astype(np.int64)  # [E*p^3, 8]
    n_cells = conn.shape[0]
    offsets = (np.arange(1, n_cells + 1, dtype=np.int64) * 8)
    types = np.full(n_cells, 12, dtype=np.uint8)  # VTK_HEXAHEDRON

    blobs = [
        values.tobytes(),
        pts.tobytes(),
        np.ascontiguousarray(conn).tobytes(),
        offsets.tobytes(),
        types.tobytes(),
    ]
    offs, off = [], 0
    for b in blobs:
        offs.append(off)
        off += 8 + len(b)
    hdr = (
        '<?xml version="1.0"?>\n'
        '<VTKFile type="UnstructuredGrid" version="1.0" '
        'byte_order="LittleEndian" header_type="UInt64">\n'
        "<UnstructuredGrid>\n"
        f'<Piece NumberOfPoints="{pts.shape[0]}" NumberOfCells="{n_cells}">\n'
        f'<PointData Scalars="{field_name}">\n'
        f'<DataArray type="Float64" Name="{field_name}" format="appended" '
        f'offset="{offs[0]}"/>\n</PointData>\n<Points>\n'
        f'<DataArray type="Float64" NumberOfComponents="3" '
        f'format="appended" offset="{offs[1]}"/>\n</Points>\n<Cells>\n'
        f'<DataArray type="Int64" Name="connectivity" format="appended" '
        f'offset="{offs[2]}"/>\n'
        f'<DataArray type="Int64" Name="offsets" format="appended" '
        f'offset="{offs[3]}"/>\n'
        f'<DataArray type="UInt8" Name="types" format="appended" '
        f'offset="{offs[4]}"/>\n'
        "</Cells>\n</Piece>\n</UnstructuredGrid>\n"
        '<AppendedData encoding="raw">\n_'
    )
    with open(path, "wb") as f:
        f.write(hdr.encode())
        for b in blobs:
            f.write(struct.pack("<Q", len(b)))
            f.write(b)
        f.write(b"\n</AppendedData>\n</VTKFile>\n")
    return path
