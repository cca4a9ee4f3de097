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
