"""Smoke tests for the post-processing scripts and mesh utilities
(reference scripts/*.py + compareMeshes, ameshutils.cpp:198-243)."""

import json

import numpy as np


def test_compare_meshes_identity_and_difference():
    from fvens_tpu.mesh import compare_meshes
    from fvens_tpu.mesh.meshgen import cylinder_omesh, unit_square

    m1 = cylinder_omesh(12, 6)
    rep = compare_meshes(m1, cylinder_omesh(12, 6))
    assert all(rep.values())
    rep2 = compare_meshes(m1, unit_square(4))
    assert not all(rep2.values())
    # perturbed coords caught at machine precision
    import dataclasses
    m3 = dataclasses.replace(m1, coords=m1.coords + 1e-12)
    rep3 = compare_meshes(m1, m3)
    assert rep3["inpoel"] and not rep3["coords"]


def test_ploterr_and_speedup_and_walltimes(tmp_path, capsys):
    from fvens_tpu.scripts import computespeedup, ploterr, plotwalltimes

    errf = tmp_path / "errs.dat"
    np.savetxt(errf, np.array([[0.1, 1e-2], [0.05, 2.5e-3], [0.025, 6.2e-4]]))
    out = tmp_path / "e.png"
    assert ploterr.main([str(errf), "--out", str(out)]) == 0
    cap = capsys.readouterr().out
    assert "order" in cap and out.exists()

    tf = tmp_path / "times.dat"
    np.savetxt(tf, np.array([[1, 100.0], [2, 52.0], [4, 27.0]]))
    assert computespeedup.main([str(tf)]) == 0
    cap = capsys.readouterr().out
    assert "speedup" in cap

    wf = tmp_path / "walls.dat"
    wf.write_text("caseA 12.5\ncaseB 8.25\n")
    wout = tmp_path / "w.png"
    assert plotwalltimes.main([str(wf), "--out", str(wout)]) == 0
    assert wout.exists()


def test_plotsurf_strongscale_precinfo(tmp_path):
    from fvens_tpu.scripts import plotprecinfo, plotstrongscale, plotsurfdata

    sf = tmp_path / "surf.dat"
    np.savetxt(sf, np.column_stack([np.linspace(0, 1, 10),
                                    np.zeros(10),
                                    np.random.rand(10),
                                    np.random.rand(10) * 1e-3]))
    p1 = tmp_path / "s.png"
    assert plotsurfdata.main([str(sf), "--out", str(p1)]) == 0
    assert p1.exists()

    sc = tmp_path / "scale.dat"
    np.savetxt(sc, np.array([[1, 60.0], [2, 33.0], [4, 19.0], [8, 11.0]]))
    p2 = tmp_path / "sc.png"
    assert plotstrongscale.main([str(sc), "--out", str(p2)]) == 0
    assert p2.exists()

    pf = tmp_path / "prec.jsonl"
    with open(pf, "w") as f:
        for pc, sw, w, it in [("bcsgs", 1, 9.0, 420), ("bcsgs", 3, 7.5, 300),
                              ("bjacobi", 1, 12.0, 800)]:
            f.write(json.dumps({"pc": pc, "sweeps": sw, "krylov": 30,
                                "avg_wall_s": w, "min_wall_s": w,
                                "steps": 40, "total_lin_iters": it}) + "\n")
    p3 = tmp_path / "p.png"
    assert plotprecinfo.main([str(pf), "--out", str(p3)]) == 0
    assert p3.exists()
