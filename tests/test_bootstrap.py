"""Dependency-check bootstrap (reference crt_filter.py:17-47, redesigned
as an explicit diagnostic instead of an import-time pip install)."""

from pythoncrt_tpu.bootstrap import check_deps
from pythoncrt_tpu.cli import main


def test_core_deps_present_here():
    rep = check_deps()
    assert rep.ok, rep.render()


def test_report_mentions_optional_pyside(capsys):
    rc = main(["--check-deps"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "PySide6" in out or "all dependencies present" in out
