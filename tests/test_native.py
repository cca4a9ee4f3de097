"""Native library tests: build, and equivalence with the Python fallbacks."""

import numpy as np
import pytest

from pd_mg_pin_corrosion_tpu import native


def test_native_builds_and_loads():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("no native toolchain available")
    assert lib is not None


def test_fmt_blocks_match_python():
    rng = np.random.default_rng(0)
    vals = np.concatenate([rng.normal(size=50) * 10.0**rng.integers(-9, 9, 50),
                           [0.0, 1.0, -1.0, 1e-300, 123456789.0]])
    got = native.fmt_scalar_block(vals)
    want = "\n".join("          " + ("%.9g" % v) for v in vals) + "\n"
    assert got == want

    v3 = rng.normal(size=(20, 3))
    got3 = native.fmt_vec3_block(v3)
    want3 = "\n".join("          " + " ".join("%.9g" % v for v in row)
                      for row in v3) + "\n"
    assert got3 == want3

    ints = np.array([0, -5, 7, 2**31, -(2**31)], np.int64)
    goti = native.fmt_int_block(ints)
    wanti = "\n".join("          %d" % v for v in ints) + "\n"
    assert goti == wanti


def test_cell_list_matches_python_builder():
    if native.get_lib() is None:
        pytest.skip("no native toolchain available")
    from pd_mg_pin_corrosion_tpu.amr import build_amr_grid, _build_neighbors_padded
    from pd_mg_pin_corrosion_tpu.config import Config

    cfg = Config()
    cfg.dx = 5e-6
    cfg.R_wire = 0.0
    cfg.L_wire = 0.0
    cfg.R_tube = 100e-6
    cfg.L_upstream = 100e-6
    cfg.L_downstream = 100e-6
    cfg.use_amr = 1
    cfg.amr_ratio = 2
    cfg.amr_buffer = 50e-6
    cfg.compute_derived()
    grid = build_amr_grid(cfg)  # uses native when available

    # Python reference builder on the same node set
    import pd_mg_pin_corrosion_tpu.native as nat
    saved = nat._LIB, nat._TRIED
    try:
        nat._LIB, nat._TRIED = None, True  # force Python fallback
        idx_p, dist_p, evec_p, vol_p = _build_neighbors_padded(
            cfg, grid.pos, grid.node_type, grid.dx_local, grid.delta_local,
            grid.grid_level)
    finally:
        nat._LIB, nat._TRIED = saved

    # same bond SETS per node (order may differ between builders)
    for i in range(0, grid.N_total, 97):
        s_native = {(int(j), round(float(d), 12))
                    for j, d, v in zip(grid.nbr_idx[i], grid.nbr_dist[i],
                                       grid.nbr_vol[i]) if v > 0}
        s_python = {(int(j), round(float(d), 12))
                    for j, d, v in zip(idx_p[i], dist_p[i], vol_p[i]) if v > 0}
        assert s_native == s_python, f"bond set mismatch at node {i}"


def test_voronoi_matches_numpy():
    if native.get_lib() is None:
        pytest.skip("no native toolchain available")
    rng = np.random.default_rng(1)
    pos = rng.normal(size=(500, 2))
    seeds = rng.normal(size=(13, 2))
    got = native.voronoi_assign(pos, seeds)
    want = np.argmin(((pos[:, None, :] - seeds[None]) ** 2).sum(-1), axis=1)
    np.testing.assert_array_equal(got, want)
