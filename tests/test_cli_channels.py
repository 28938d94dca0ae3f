"""CLI flag surface + run-results channels (Run.csv, Timers.csv, PIPS.csv,
OutputTime schedule, TERMINATE, -nortimes byte-diffable outputs)."""

import json
import os

import numpy as np
import pytest

from dualsphysics_multilayer_tpu import cli
from dualsphysics_multilayer_tpu.io.output import OutputTime
from dualsphysics_multilayer_tpu.utils.runinfo import (TerminateCheck,
                                                       save_res)


def test_normalize_colon_forms():
    out = cli._normalize(["-tmax:1.6", "-partbegin:20", "restartdir",
                          "-svpips:2", "-stable", "-sv:binx,info"])
    assert out == ["-tmax", "1.6", "-partbegin", "20", "restartdir",
                   "-svpips", "2", "-stable", "-sv", "binx,info"]


def test_opt_response_file(tmp_path):
    f = tmp_path / "r.opt"
    f.write_text("-tmax:0.5\n-cfl:0.3\n")
    out = cli._normalize(["-opt", str(f), "-dp", "0.1"])
    assert "-tmax" in out and "0.5" in out and "0.3" in out


def test_output_time_schedule():
    s = OutputTime([(0.0, 0.01), (0.1, 0.5), (0.2, 0.001)])
    assert s.interval(0.0) == 0.01
    assert s.interval(0.05) == 0.01
    assert s.interval(0.1) == 0.5
    assert s.interval(0.35) == 0.001
    with pytest.raises(ValueError):
        OutputTime([(0.5, 0.01)])


def test_terminate_check(tmp_path):
    t = TerminateCheck(str(tmp_path))
    assert t.poll() is None
    (tmp_path / "TERMINATE").write_text("0.25")
    assert t.poll() == 0.25
    assert t.poll() is None          # unchanged -> no retrigger


def test_save_res(tmp_path):
    p = save_res(str(tmp_path), runname="r", appname="a", casenp=100,
                 tsim=1.0, ttot=2.0, timestep=1.0, nstep=500, part=10,
                 nout=0, maxparticles=100, maxcells=64, nbound=10,
                 nfixed=10, dp=0.1, kernelh=0.15)
    lines = open(p).read().splitlines()
    assert lines[0].startswith("#RunName")
    assert lines[1].split(";")[0] == "r"
    save_res(str(tmp_path), runname="r2", appname="a", casenp=1, tsim=1,
             ttot=1, timestep=1, nstep=1, part=1, nout=0, maxparticles=1,
             maxcells=1, nbound=0, nfixed=0, dp=0.1, kernelh=0.15)
    assert len(open(p).read().splitlines()) == 3


def test_cli_ver_info(capsys):
    assert cli.main(["-ver"]) == 0
    v = json.loads(capsys.readouterr().out)
    assert "wcsph" in v["features"]
    assert cli.main(["-info"]) == 0
    info = json.loads(capsys.readouterr().out)
    assert "partvtk" in info["features"]["tools"]


@pytest.mark.slow
def test_cli_end_to_end_channels(tmp_path):
    """Small builtin run exercising -svres/-svtimers/-svpips/-nortimes and
    the tool suite on the produced output."""
    d = str(tmp_path / "out")
    rc = cli.main(["-builtin", "dambreak2d", "-dp", "0.05",
                   "-tmax:0.05", "-tout:0.025", "-dirout", d,
                   "-svtimers", "-svpips:1", "-nortimes", "-svdomainvtk",
                   "-runname", "chan"])
    assert rc == 0
    for f in ("Run.csv", "Timers.csv", "PIPS.csv", "Domain.vtk"):
        assert os.path.exists(os.path.join(d, f)), f
    assert os.path.exists(os.path.join(d, "Part_Head.ibi4"))
    row = open(os.path.join(d, "Run.csv")).read().splitlines()[1]
    assert row.split(";")[0] == "chan"
    # tools run on the produced series
    from dualsphysics_multilayer_tpu.tools import partvtk
    partvtk.main(["-dirin", d, "-savecsv", str(tmp_path / "pv.csv")])
    assert os.path.exists(str(tmp_path / "pv_0000.csv"))


def test_dsphconfig_defaults(tmp_path, monkeypatch):
    """Machine-level DsphConfig.xml feeds the CLI defaults (JDsphConfig)."""
    from dualsphysics_multilayer_tpu import cli
    (tmp_path / "DsphConfig.xml").write_text(
        '<?xml version="1.0"?><dsphconfig><common>'
        '<createdirs v="0"/><csvseparator v="1"/>'
        '</common></dsphconfig>')
    monkeypatch.chdir(tmp_path)
    cfg = cli.load_dsphconfig()
    assert cfg == dict(createdirs=0, csvsep=1)
    p = cli.build_parser()
    p.set_defaults(**cfg)
    args = p.parse_args([])
    assert args.createdirs == 0 and args.csvsep == 1
    # explicit flags still win
    args = p.parse_args(["-csvsep", "0"])
    assert args.csvsep == 0
