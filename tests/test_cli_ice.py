"""CLI ice-series and form-drag-curve commands."""

import json

import numpy as np

from aerobulk_tpu.cli import main
from aerobulk_tpu import io as abio


def test_cli_cdnf(tmp_path):
    out = str(tmp_path / "cdnf.json")
    main(["cdnf", "--out", out, "--n", "21"])
    with open(out) as fh:
        data = json.load(fh)
    assert len(data["frice"]) == 21
    for k in ("CdN10_f_LU13", "CdN_f_LG15_light", "CdN_f_LG15"):
        arr = np.asarray(data[k])
        assert np.all(np.isfinite(arr)) and np.all(arr >= 0.0), k


def test_cli_ice_series(tmp_path):
    nt = 8
    forcing = str(tmp_path / "ice_forcing.npz")
    np.savez(forcing,
             sst=np.full(nt, 258.0),                 # Ts_ice [K]
             t_air=np.full(nt, 255.0),
             q_air=np.full(nt, 0.0008),
             wndspd=np.linspace(3, 10, nt),
             msl=np.full(nt, 100000.0),
             frice=np.full(nt, 0.85),
             time=np.arange(nt) * 3600.0)
    out = str(tmp_path / "ice_series.nc")
    main(["series", forcing, "--algo", "ice_lg15", "--niter", "5",
          "--out", out])
    back = abio.read_forcing(out)
    assert len(back["Qlat"]) == nt
    assert np.all(np.isfinite(back["Qlat"]))
    assert np.all(np.asarray(back["Cd"]) > 1e-4)


def test_plot_ice_bulk_comp(tmp_path):
    """Multi-algo ice series -> comparison figure (the reference's
    plot_ice_bulk_comp.py workflow: one series file per ice algorithm)."""
    import os

    from aerobulk_tpu import plotting

    nt = 8
    forcing = str(tmp_path / "ice_forcing.npz")
    np.savez(forcing,
             sst=np.full(nt, 258.0),
             t_air=np.full(nt, 255.0),
             q_air=np.full(nt, 0.0008),
             wndspd=np.linspace(3, 10, nt),
             msl=np.full(nt, 100000.0),
             frice=np.full(nt, 0.85),
             time=np.arange(nt) * 3600.0)
    paths = {}
    for algo in ("ice_nemo", "ice_an05", "ice_lg15"):
        out = str(tmp_path / f"series_{algo}.nc")
        main(["series", forcing, "--algo", algo, "--niter", "5",
              "--out", out])
        paths[algo.removeprefix("ice_")] = out

    png = plotting.plot_ice_bulk_comp(
        paths, str(tmp_path / "ice_bulk_comp.png"))
    assert os.path.getsize(png) > 10000


def test_cli_oce_ice_toy(capsys):
    from aerobulk_tpu.cli import main
    main(["oce-ice-toy", "--frice", "0.7", "--niter", "6"])
    out = capsys.readouterr().out
    assert "lg15_io(sim)" in out
    assert "ice_nemo" in out and "ice_an05" in out and "ice_lg15" in out
    import re
    vals = [float(x) for x in re.findall(r"-?\d+\.\d+", out)]
    assert all(abs(v) < 1e4 for v in vals)
