"""VTK writer format tests: VTI/VTU structure, array names/order, PVD."""

import xml.etree.ElementTree as ET

import jax.numpy as jnp
import numpy as np

from pd_mg_pin_corrosion_tpu import Config, build_grid, initialize_state
from pd_mg_pin_corrosion_tpu.amr import build_amr_grid
from pd_mg_pin_corrosion_tpu.io_vtk import VTKWriter

# array names and order must match the reference writer (vtk_writer.cpp:53-139)
VTI_ARRAYS = ["velocity", "pressure", "density", "concentration", "phase",
              "node_type", "grain_id", "D_map", "is_grain_boundary",
              "is_precipitate"]


def small_cfg():
    cfg = Config()
    cfg.R_wire = 20.0e-6
    cfg.L_wire = 100.0e-6
    cfg.R_tube = 60.0e-6
    cfg.L_upstream = 40.0e-6
    cfg.L_downstream = 40.0e-6
    return cfg.compute_derived()


def test_vti_structure(tmp_path):
    cfg = small_cfg()
    grid = build_grid(cfg)
    state = initialize_state(grid, cfg, dtype=jnp.float64)
    w = VTKWriter()
    path = str(tmp_path / "t.vti")
    w.write(path, grid, state, cfg)

    root = ET.parse(path).getroot()
    assert root.get("type") == "ImageData"
    img = root.find("ImageData")
    assert img.get("WholeExtent") == f"0 {grid.Nx - 1} 0 {grid.Ny - 1} 0 0"
    names = [d.get("Name") for d in img.iter("DataArray")]
    assert names == VTI_ARRAYS

    # velocity has 3 components and one line per node
    vel = next(d for d in img.iter("DataArray") if d.get("Name") == "velocity")
    assert vel.get("NumberOfComponents") == "3"
    lines = [l for l in vel.text.strip().splitlines() if l.strip()]
    assert len(lines) == grid.N_total

    # node_type roundtrip
    ntd = next(d for d in img.iter("DataArray") if d.get("Name") == "node_type")
    vals = np.fromstring(" ".join(ntd.text.split()), sep=" ", dtype=float)
    np.testing.assert_array_equal(vals.astype(np.uint8), grid.node_type.ravel())


def test_vtu_structure(tmp_path):
    cfg = small_cfg()
    cfg.use_amr = 1
    cfg.amr_ratio = 2
    cfg.amr_buffer = 30.0e-6
    cfg.compute_derived()
    grid = build_amr_grid(cfg)
    state = initialize_state(grid, cfg, dtype=jnp.float64)
    w = VTKWriter()
    path = str(tmp_path / "t.vtu")
    w.write_vtu(path, grid, state, cfg)

    root = ET.parse(path).getroot()
    assert root.get("type") == "UnstructuredGrid"
    piece = root.find("UnstructuredGrid/Piece")
    n_out = int((grid.node_type != 5).sum())
    assert int(piece.get("NumberOfPoints")) == n_out
    assert int(piece.get("NumberOfCells")) == n_out
    names = [d.get("Name") for d in piece.find("PointData").iter("DataArray")]
    # AMR writer adds grid_level and dx_local (vtk_writer.cpp:292-308)
    assert "grid_level" in names and "dx_local" in names


def test_pvd_crash_safe(tmp_path):
    cfg = small_cfg()
    grid = build_grid(cfg)
    state = initialize_state(grid, cfg, dtype=jnp.float64)
    w = VTKWriter()
    pvd = str(tmp_path / "sim.pvd")
    w.set_pvd_path(pvd)
    for i, t in enumerate((0.0, 1.5, 3.0)):
        f = str(tmp_path / f"s{i}.vti")
        w.write(f, grid, state, cfg)
        w.add_timestep(t, f)
        # PVD is rewritten after EVERY snapshot (crash-safe)
        root = ET.parse(pvd).getroot()
        entries = root.findall("Collection/DataSet")
        assert len(entries) == i + 1
        # relative paths
        assert all("/" not in e.get("file") for e in entries)


def test_vti_binary_roundtrip(tmp_path):
    """cfg.vtk_binary=1 writes VTK XML appended-raw; every array round-trips
    bit-exactly against the ASCII writer's values through vtk_reader."""
    import os
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    from vtk_reader import read_vti

    cfg = small_cfg()
    grid = build_grid(cfg)
    state = initialize_state(grid, cfg, dtype=jnp.float64)
    w = VTKWriter()
    p_ascii = str(tmp_path / "a.vti")
    p_bin = str(tmp_path / "b.vti")
    w.write(p_ascii, grid, state, cfg)
    cfg.vtk_binary = 1
    w.write(p_bin, grid, state, cfg)

    meta_a, f_a = read_vti(p_ascii)
    meta_b, f_b = read_vti(p_bin)
    assert meta_a["nx"] == meta_b["nx"] and meta_a["ny"] == meta_b["ny"]
    assert sorted(f_a) == sorted(f_b) == sorted(VTI_ARRAYS)
    for name in VTI_ARRAYS:
        # ASCII rounds at %.9g (~1e-9 relative); binary is exact
        np.testing.assert_allclose(f_b[name], f_a[name], rtol=1e-8, atol=0,
                                   err_msg=name)
    # binary ints are exact
    np.testing.assert_array_equal(f_b["node_type"].astype(np.uint8),
                                  grid.node_type.ravel())
    # and the binary file is much smaller
    assert os.path.getsize(p_bin) < 0.5 * os.path.getsize(p_ascii)
