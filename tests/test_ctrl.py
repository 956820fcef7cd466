"""Control-file parser golden test.

Mirrors the reference's testparse (tests/utils/testparse.cpp, which asserts
the parsed FlowParserOptions of tests/utils/inv-explicit.ctrl field by field
against tests/utils/inv-explicit.testdata).
"""

from fvens_tpu.io_config import parse_control_file


def test_ctrl_parse_golden(refdir):
    cfg = parse_control_file(str(refdir / "tests/utils/inv-explicit.ctrl"))

    # io (inv-explicit.testdata lines 1-4)
    assert cfg.mesh_file.endswith("testcases/2dcylinder/grids/2dcylquad2.msh")

    # flow conditions (EULER / 1.4 / alpha 2.0 / Minf 0.38)
    assert not cfg.physics.viscous
    assert cfg.physics.gamma == 1.4
    assert cfg.physics.aoa_deg == 2.0
    assert cfg.physics.Minf == 0.38

    # bcs: slipwall marker 2, farfield marker 4; output walls (2,)
    bymarker = {b.marker: b.type for b in cfg.bcs}
    assert bymarker == {2: "slipwall", 4: "farfield"}
    assert cfg.wall_markers == (2,)

    # time + spatial (STEADY / LLF / LEASTSQUARES / NONE)
    assert cfg.numerics.flux == "LLF"
    assert cfg.numerics.gradient == "LEASTSQUARES"
    assert cfg.numerics.reconstruction == "LINEAR"   # limiter 'none'
    assert cfg.numerics.order2

    # pseudotime (EXPLICIT / 0.2 0.2 1e-5 500000 / 0.5 0.5 1e-1 5000)
    assert cfg.main.stepping == "explicit"
    assert cfg.main.cfl_init == 0.2 and cfg.main.cfl_fin == 0.2
    assert cfg.main.tol == 1e-5 and cfg.main.maxiter == 500000
    assert cfg.init.cfl_init == 0.5 and cfg.init.cfl_fin == 0.5
    assert cfg.init.tol == 1e-1 and cfg.init.maxiter == 5000


def test_ctrl_parse_viscous_fields(refdir):
    """The viscous north-star ctrl: NS physics + Roe + implicit ramp
    (testcases/visc-naca0012/laminar-implicit.ctrl)."""
    cfg = parse_control_file(
        str(refdir / "testcases/visc-naca0012/laminar-implicit.ctrl"))
    assert cfg.physics.viscous
    assert cfg.physics.Minf == 0.5
    assert cfg.physics.Reinf == 5000.0
    assert cfg.physics.Tinf == 288.15
    assert cfg.numerics.flux == "ROE"
    assert cfg.main.stepping == "implicit"
    assert cfg.main.cfl_init == 500.0 and cfg.main.cfl_fin == 5000.0
    bytype = {b.type for b in cfg.bcs}
    assert "adiabaticwall" in bytype
