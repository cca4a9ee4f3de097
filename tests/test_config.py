"""Config parser tests (reference semantics: src/config.cpp)."""

import math
import os
import tempfile

from pd_mg_pin_corrosion_tpu import Config


def test_defaults_match_reference_header():
    cfg = Config().compute_derived()
    # spot-check defaults from src/config.h:4-94
    assert cfg.dx == 5.0e-6
    assert cfg.m_ratio == 3
    assert cfg.R_wire == 40.0e-6
    assert cfg.gamma_eos == 7.0
    assert cfg.D_precip == 5.0e-15
    assert cfg.C_sat == 0.9
    assert cfg.use_implicit == 1
    assert cfg.implicit_dt_max == 60.0
    assert cfg.corrosion_steps_per_check == 200


def test_derived_quantities():
    cfg = Config().compute_derived()
    assert cfg.delta == cfg.m_ratio * cfg.dx
    U_in = cfg.Q_flow / (math.pi * cfg.R_tube**2)
    assert abs(cfg.U_in - U_in) < 1e-15
    # c0 Mach safeguard: default c0=0.5 exceeds 25*U_in (~5.9), so bumped
    assert cfg.c0 >= 25.0 * cfg.U_in


def test_parse_cfg_format():
    content = """
# comment line
dx = 2.5e-6   # trailing comment
m_ratio=4
R_tube = 2.0e-4
output_dir = my_output
use_amr = 1

unknown_key = 7
"""
    with tempfile.NamedTemporaryFile("w", suffix=".cfg", delete=False) as f:
        f.write(content)
        path = f.name
    try:
        cfg = Config.load(path)
        assert cfg.dx == 2.5e-6
        assert cfg.m_ratio == 4
        assert cfg.R_tube == 2.0e-4
        assert cfg.output_dir == "my_output"
        assert cfg.use_amr == 1
        assert cfg.delta == 4 * 2.5e-6
    finally:
        os.unlink(path)


def test_missing_file_falls_back_to_defaults():
    cfg = Config.load("/nonexistent/params.cfg")
    assert cfg.dx == 5.0e-6
    assert cfg.delta > 0


def test_anchor_fit_roundtrip():
    """scripts/anchor_fit.py: the two-anchor ODE fit recovers (s, l) that
    reproduce both anchors on a synthetic response with known dynamics."""
    import sys
    sys.path.insert(0, "scripts")
    import numpy as np
    from anchor_fit import fit_two_anchor, predict

    # synthetic intrinsic rate: constant-speed shrinking cylinder
    def f0(V):
        return 1e-5 * np.sqrt(np.maximum(1.0 - np.asarray(V), 0.0))

    t1, V1, t2, V2 = 15228.0, 0.2286, 32400.0, 0.50
    s, l, _ = fit_two_anchor(f0, t1, V1, t2, V2, sign=1.0)
    assert abs(predict(f0, s, l, 1.0, t1) - V1) < 2e-4
    assert abs(predict(f0, s, l, 1.0, t2) - V2) < 2e-4
