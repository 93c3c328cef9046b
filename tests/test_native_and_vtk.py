"""Native C++ setup library vs numpy reference, and VTK output writers."""

import numpy as np
import pytest

from deal_and_ceed_on_gpu_tpu import BrickMesh, FESpace
from deal_and_ceed_on_gpu_tpu.utils import native
from deal_and_ceed_on_gpu_tpu.utils.vtk import _write_vtr_py, write_solution_vtr

HAVE_NATIVE = native.available()


@pytest.mark.skipif(not HAVE_NATIVE, reason="no C++ toolchain")
@pytest.mark.parametrize("shape,p", [((2, 3, 4), 2), ((3, 2, 2), 5)])
def test_native_dof_map_matches_numpy(shape, p):
    mesh = BrickMesh(shape)
    mx, my, mz = mesh.n_elements
    got = native.element_dof_map(mx, my, mz, p)
    want = mesh.element_dof_map(p)
    np.testing.assert_array_equal(got, want)


@pytest.mark.skipif(not HAVE_NATIVE, reason="no C++ toolchain")
def test_native_boundary_mask_matches_numpy():
    mesh = BrickMesh((3, 2, 4))
    p = 3
    nx, ny, nz = mesh.n_nodes(p)
    got = native.boundary_mask(nx, ny, nz)
    np.testing.assert_array_equal(got, mesh.boundary_dof_mask(p))


def test_vtr_writers_agree(tmp_path):
    mesh = BrickMesh((2, 2, 2))
    import jax.numpy as jnp

    space = FESpace.create(mesh, 2, dtype=jnp.float64)
    u = np.random.default_rng(0).standard_normal(space.n_dofs)
    xs, ys, zs = mesh.node_coords_1d(2, space.basis.nodes)

    py_path = tmp_path / "py.vtr"
    _write_vtr_py(py_path, xs, ys, zs, u.reshape(space.grid_shape))
    data = py_path.read_bytes()
    assert data.startswith(b"<?xml")
    assert b"RectilinearGrid" in data
    # appended blob sizes: 4 arrays with 8-byte headers
    total = u.size * 8 + 8 + sum(a.size * 8 + 8 for a in (xs, ys, zs))
    assert data.index(b"_") + 1 + total <= len(data)

    if HAVE_NATIVE:
        c_path = tmp_path / "c.vtr"
        assert native.write_vtr(c_path, xs, ys, zs, u.reshape(space.grid_shape))
        assert c_path.read_bytes() == data  # byte-identical writers


def test_write_solution_vtr(tmp_path):
    import jax.numpy as jnp

    mesh = BrickMesh((2, 2, 2))
    space = FESpace.create(mesh, 2, dtype=jnp.float64)
    u = jnp.zeros(space.n_dofs)
    p = write_solution_vtr(tmp_path / "sol.vtr", space, u)
    assert p.exists() if hasattr(p, "exists") else True


def test_write_solution_vts_mapped(tmp_path):
    """Mapped meshes dispatch to the curvilinear .vts writer; the file
    carries the deformed point coordinates and the field values."""
    import jax.numpy as jnp
    import numpy as np

    from deal_and_ceed_on_gpu_tpu import BrickMesh, FESpace, shear_map
    from deal_and_ceed_on_gpu_tpu.utils.vtk import write_solution_vtr

    phi, jac = shear_map(0.3)
    mesh = BrickMesh((2, 2, 2)).deform(phi, jac)
    space = FESpace.create(mesh, 2, dtype=jnp.float64)
    u = np.arange(space.n_dofs, dtype=np.float64)
    path = write_solution_vtr(tmp_path / "sol.vts", space, jnp.asarray(u))
    data = open(path, "rb").read()
    assert b"StructuredGrid" in data
    # values blob is intact after the header marker
    i = data.index(b'<AppendedData encoding="raw">\n_') + len(
        b'<AppendedData encoding="raw">\n_'
    )
    import struct

    nbytes = struct.unpack("<Q", data[i : i + 8])[0]
    vals = np.frombuffer(data[i + 8 : i + 8 + nbytes])
    np.testing.assert_array_equal(vals, u)
    j = i + 8 + nbytes
    npts = struct.unpack("<Q", data[j : j + 8])[0] // 24
    pts = np.frombuffer(data[j + 8 : j + 8 + npts * 24]).reshape(-1, 3)
    np.testing.assert_allclose(pts, space.node_coords(), atol=1e-14)


def test_write_solution_pvtr(tmp_path):
    """Distributed output: per-shard .vtr pieces + .pvtr master whose
    extents tile the global grid; piece payloads reconstruct the field."""
    import re
    import struct

    import jax.numpy as jnp

    from deal_and_ceed_on_gpu_tpu import BrickMesh, FESpace
    from deal_and_ceed_on_gpu_tpu.parallel import BlockPartition
    from deal_and_ceed_on_gpu_tpu.utils.vtk import write_solution_pvtr

    mesh = BrickMesh((3, 4, 5))  # uneven on z with pz=2
    p = 2
    space = FESpace.create(mesh, p, rule="gauss_lobatto", dtype=jnp.float64)
    part = BlockPartition(mesh, p, pz=2, py=2)
    rng = np.random.default_rng(0)
    u = rng.standard_normal(space.grid_shape)
    blocks = part.to_blocks(u)
    master = tmp_path / "sol.pvtr"
    write_solution_pvtr(str(master), part, blocks)

    txt = master.read_text()
    pieces = re.findall(r'<Piece Extent="([^"]+)" Source="([^"]+)"/>', txt)
    assert len(pieces) == 4
    nz, ny, nx = part.global_grid_shape
    covered = np.zeros((nz, ny, nx), dtype=bool)
    recon = np.zeros((nz, ny, nx))
    for ext, src in pieces:
        x0, x1, y0, y1, z0, z1 = (int(v) for v in ext.split())
        raw = (tmp_path / src).read_bytes()
        body = raw.split(b'<AppendedData encoding="raw">\n_', 1)[1]
        (n,) = struct.unpack("<Q", body[:8])
        vals = np.frombuffer(body[8 : 8 + n]).reshape(
            z1 - z0 + 1, y1 - y0 + 1, x1 - x0 + 1
        )
        recon[z0 : z1 + 1, y0 : y1 + 1, x0 : x1 + 1] = vals
        covered[z0 : z1 + 1, y0 : y1 + 1, x0 : x1 + 1] = True
    assert covered.all()
    np.testing.assert_array_equal(recon, u)


def test_write_solution_vtu_adaptive(tmp_path):
    """Adaptive-mesh VTU: p^3 sub-hexes per active cell, conforming point
    data, valid connectivity, and geometry consistent with the nodal
    lattice (corner coordinates of every sub-hex come from the right
    global nodes)."""
    import struct

    import jax.numpy as jnp

    from deal_and_ceed_on_gpu_tpu.adaptive import AdaptiveMesh, AdaptiveSpace
    from deal_and_ceed_on_gpu_tpu.utils.vtk import write_solution_vtu

    p = 2
    amesh = AdaptiveMesh.refine(BrickMesh((2, 2, 2)), (0, 5))
    space = AdaptiveSpace(amesh, p)
    u = np.random.default_rng(3).standard_normal(space.n_dofs)
    path = tmp_path / "amr.vtu"
    write_solution_vtu(path, space, jnp.asarray(u))

    raw = path.read_bytes()
    assert b'type="UnstructuredGrid"' in raw
    n_cells_want = amesh.n_cells * p**3
    assert f'NumberOfCells="{n_cells_want}"'.encode() in raw
    assert f'NumberOfPoints="{space.n_dofs}"'.encode() in raw

    # decode the appended blobs: values, points, connectivity, offsets, types
    body = raw.split(b'<AppendedData encoding="raw">\n_')[1]
    blobs = []
    pos = 0
    for _ in range(5):
        (n,) = struct.unpack_from("<Q", body, pos)
        blobs.append(body[pos + 8 : pos + 8 + n])
        pos += 8 + n
    values = np.frombuffer(blobs[0], np.float64)
    pts = np.frombuffer(blobs[1], np.float64).reshape(-1, 3)
    conn = np.frombuffer(blobs[2], np.int64).reshape(-1, 8)
    types = np.frombuffer(blobs[4], np.uint8)

    np.testing.assert_allclose(
        values, np.asarray(space.distribute(jnp.asarray(u))), rtol=1e-14
    )
    np.testing.assert_allclose(pts, space.node_coords, rtol=1e-14)
    assert conn.shape[0] == n_cells_want
    assert conn.min() >= 0 and conn.max() < space.n_dofs
    assert (types == 12).all()
    # every sub-hex must be a genuine axis-aligned box with positive volume
    c = pts[conn]  # [n_cells, 8, 3]
    dx = c[:, 1, 0] - c[:, 0, 0]
    dy = c[:, 3, 1] - c[:, 0, 1]
    dz = c[:, 4, 2] - c[:, 0, 2]
    assert (dx > 0).all() and (dy > 0).all() and (dz > 0).all()
    np.testing.assert_allclose(c[:, 6], c[:, 0] + np.stack([dx, dy, dz], -1),
                               rtol=1e-13, atol=1e-14)
