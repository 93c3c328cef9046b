import numpy as np
import pytest

from deal_and_ceed_on_gpu_tpu.basis import Basis1D
from deal_and_ceed_on_gpu_tpu.mesh import BrickMesh


def test_bp5_cycle_sweep_matches_reference_sizes():
    # bp5/step-64.cu:629-663: cells = prod(subdiv) * 8^n_refine, unit cells
    for cycle in range(2, 20):
        mesh = BrickMesh.bp5_cycle(cycle)
        n_refine = cycle // 6
        rem = cycle % 6
        subdiv = {0: [1, 1, 1], 1: [3, 2, 2], 2: [2, 1, 1], 3: [3, 1, 1],
                  4: [2, 2, 1], 5: [3, 2, 1]}[rem]
        if rem == 1:
            n_refine -= 1
        expected = subdiv[0] * subdiv[1] * subdiv[2] * 8**n_refine
        assert mesh.n_cells == expected, cycle
        # unit-size cells
        assert np.allclose(mesh.h, 1.0 / 2**n_refine)


def test_dof_counts():
    mesh = BrickMesh((2, 3, 4))
    for p in (1, 2, 5):
        nx, ny, nz = mesh.n_nodes(p)
        assert (nx, ny, nz) == (2 * p + 1, 3 * p + 1, 4 * p + 1)
        assert mesh.n_dofs(p) == nx * ny * nz


@pytest.mark.parametrize("p", [1, 2, 3])
def test_element_dof_map_consistency(p):
    mesh = BrickMesh((2, 2, 2))
    dm = mesh.element_dof_map(p)
    assert dm.shape == (8, (p + 1) ** 3)
    n = mesh.n_dofs(p)
    assert dm.min() == 0 and dm.max() == n - 1
    # every global DoF is touched; total local count = E * (p+1)^3
    counts = np.bincount(dm.reshape(-1), minlength=n)
    assert counts.min() >= 1
    # corner of the mesh belongs to exactly one element; center to 8
    assert counts[0] == 1
    center = n // 2
    nx, ny, nz = mesh.n_nodes(p)
    cidx = p + nx * (p + ny * p)  # node at (p,p,p) = element corner shared by 8
    assert counts[cidx] == 8


@pytest.mark.parametrize("p", [1, 3])
def test_dof_map_matches_node_coords(p):
    """local DoF l of element e must map to the global node with the same
    physical coordinates."""
    mesh = BrickMesh((2, 1, 3), upper=(2.0, 1.0, 3.0))
    basis = Basis1D.make(p)
    dm = mesh.element_dof_map(p)
    cx, cy, cz = mesh.node_coords_1d(p, basis.nodes)
    nx, ny, nz = mesh.n_nodes(p)
    mx, my, mz = mesh.n_elements
    hx, hy, hz = mesh.h
    for e in range(mesh.n_cells):
        ez, rem = divmod(e, my * mx)
        ey, ex = divmod(rem, mx)
        for l in range((p + 1) ** 3):
            k, r = divmod(l, (p + 1) ** 2)
            j, i = divmod(r, p + 1)
            g = dm[e, l]
            gz, grem = divmod(g, nx * ny)
            gy, gx = divmod(grem, nx)
            np.testing.assert_allclose(cx[gx], ex * hx + basis.nodes[i] * hx, atol=1e-13)
            np.testing.assert_allclose(cy[gy], ey * hy + basis.nodes[j] * hy, atol=1e-13)
            np.testing.assert_allclose(cz[gz], ez * hz + basis.nodes[k] * hz, atol=1e-13)


def test_boundary_mask():
    mesh = BrickMesh((2, 2, 2))
    p = 2
    mask = mesh.boundary_dof_mask(p)
    nx, ny, nz = mesh.n_nodes(p)
    assert mask.sum() == nx * ny * nz - (nx - 2) * (ny - 2) * (nz - 2)
